"""Spectral core tests: CIE data integrity, sampled wavelengths, spectrum
classes, rgb→spectrum round trip (analog of the reference's spectrum/color
tests plus pbrt-derived invariants)."""

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.color.colorspace import get_named_color_space
from shimmer_tpu.spectra import rgb2spec
from shimmer_tpu.spectra.sampled import (
    N_SPECTRUM_SAMPLES,
    SampledWavelengths,
    ss_average,
)
from shimmer_tpu.spectra import spectrum as spec


class TestCieData:
    def test_y_integral(self):
        y = spec.cie_y_spectrum()
        s = float(np.sum(y.values))
        assert np.isclose(s, spec.CIE_Y_INTEGRAL, rtol=1e-4)

    def test_peaks(self):
        # CIE 1931 y-bar peaks at 555 nm
        y = spec.cie_y_spectrum()
        lam = np.arange(360, 831)
        assert lam[np.argmax(y.get(lam))] in (554, 555, 556)
        assert np.isclose(float(np.max(y.values)), 1.0, atol=0.01)

    def test_dense_sample_device(self):
        y = jnp.asarray(spec.cie_xyz_dense()[1])
        lam = jnp.array([[555.0, 360.0, 830.0, 1000.0]])
        v = np.asarray(spec.dense_sample(y, lam))[0]
        assert v[0] > 0.99
        assert v[3] == 0.0  # out of range


class TestSampledWavelengths:
    def test_uniform(self):
        swl = SampledWavelengths.sample_uniform(jnp.array(0.0))
        lam = np.asarray(swl.lam)
        assert lam.shape == (N_SPECTRUM_SAMPLES,)
        assert np.isclose(lam[0], 360.0)
        np.testing.assert_allclose(np.asarray(swl.pdf), 1.0 / 470.0, rtol=1e-5)
        # wrap-around keeps in range
        swl2 = SampledWavelengths.sample_uniform(jnp.array(0.9))
        lam2 = np.asarray(swl2.lam)
        assert np.all(lam2 >= 360.0) and np.all(lam2 <= 830.0)

    def test_visible(self):
        swl = SampledWavelengths.sample_visible(jnp.array(0.37))
        lam = np.asarray(swl.lam)
        assert np.all(lam >= 360.0) and np.all(lam <= 830.0)
        assert np.all(np.asarray(swl.pdf) > 0.0)

    def test_terminate_secondary(self):
        swl = SampledWavelengths.sample_uniform(jnp.array(0.3))
        t = swl.terminate_secondary()
        assert bool(t.secondary_terminated())
        pdf = np.asarray(t.pdf)
        assert np.all(pdf[1:] == 0.0)
        assert np.isclose(pdf[0], np.asarray(swl.pdf)[0] / 4.0)
        # idempotent
        t2 = t.terminate_secondary()
        np.testing.assert_allclose(np.asarray(t2.pdf), pdf)


class TestSpectra:
    def test_blackbody_wien(self):
        # peak of 6000K blackbody near 483 nm (Wien)
        bb = spec.BlackbodySpectrum(6000.0)
        lam = np.arange(360.0, 831.0)
        v = bb.get(lam)
        assert abs(lam[np.argmax(v)] - 2.8977721e-3 / 6000.0 * 1e9) < 2.0
        assert np.isclose(bb.max_value(), 1.0)
        # device eval matches host
        swl = SampledWavelengths.sample_uniform(jnp.array(0.5))
        dev = np.asarray(bb.sample(swl))
        host = bb.get(np.asarray(swl.lam))
        np.testing.assert_allclose(dev, host, rtol=1e-3)

    def test_piecewise_linear(self):
        s = spec.PiecewiseLinearSpectrum([400.0, 500.0], [0.0, 1.0])
        assert np.isclose(float(s.get(450.0)), 0.5)
        assert float(s.get(360.0)) == 0.0
        assert s.max_value() == 1.0

    def test_named_spectra(self):
        d65 = spec.named_spectrum("stdillum-D65")
        assert d65 is not None
        # normalized: luminance inner product == CIE_Y_INTEGRAL
        assert np.isclose(
            spec.inner_product(d65, spec.cie_y_spectrum()),
            spec.CIE_Y_INTEGRAL,
            rtol=1e-4,
        )
        au = spec.named_spectrum("metal-Au-eta")
        assert au is not None and au.get(500.0) > 0.5
        assert spec.named_spectrum("bogus") is None

    def test_d_illuminant(self):
        d65ish = spec.d_illuminant(6500.0)
        ref = spec.named_spectrum("stdillum-D65")
        lam = np.arange(400.0, 701.0)
        a = d65ish.get(lam)
        b = ref.get(lam)
        # shapes agree up to scale
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99

    def test_swatches(self):
        sw = spec.swatch_reflectances()
        assert len(sw) == 24
        for s in sw:
            v = s.get(np.arange(380.0, 731.0))
            assert np.all(v >= 0.0) and np.all(v <= 1.0)


class TestRgb2Spec:
    def test_round_trip_albedo(self):
        cs = get_named_color_space("srgb")
        rgb = np.array(
            [
                [0.7, 0.2, 0.1],
                [0.1, 0.6, 0.3],
                [0.2, 0.3, 0.9],
                [0.5, 0.5, 0.5],
                [0.05, 0.05, 0.05],
                [0.9, 0.9, 0.05],
            ]
        )
        coeffs = rgb2spec.fit_rgb_coeffs(rgb, cs)
        proj = rgb2spec._get_projection(cs)
        basis = rgb2spec._basis()
        for i in range(len(rgb)):
            s = rgb2spec._sigmoid_np(basis @ coeffs[i].astype(np.float64))
            got = proj @ s
            np.testing.assert_allclose(got, rgb[i], atol=5e-3)

    def test_gray_is_flat(self):
        cs = get_named_color_space("srgb")
        s = rgb2spec.RgbAlbedoSpectrum(cs, [0.5, 0.5, 0.5])
        lam = np.arange(400.0, 701.0, 10.0)
        v = s.get(lam)
        assert np.max(v) - np.min(v) < 0.05

    def test_albedo_bounded(self):
        cs = get_named_color_space("srgb")
        s = rgb2spec.RgbAlbedoSpectrum(cs, [0.9, 0.1, 0.8])
        lam = np.arange(360.0, 831.0)
        v = s.get(lam)
        assert np.all(v >= 0.0) and np.all(v <= 1.0)
        assert s.max_value() <= 1.0

    def test_unbounded_scale(self):
        cs = get_named_color_space("srgb")
        s = rgb2spec.RgbUnboundedSpectrum(cs, [5.0, 3.0, 1.0])
        assert s.max_value() > 1.0

    def test_illuminant_spectrum(self):
        cs = get_named_color_space("srgb")
        s = rgb2spec.RgbIlluminantSpectrum(cs, [1.0, 1.0, 1.0])
        # photometric normalization targets base illuminant
        p = spec.spectrum_to_photometric(s)
        assert np.isclose(p, spec.CIE_Y_INTEGRAL, rtol=1e-3)
        # device sample matches host get
        swl = SampledWavelengths.sample_uniform(jnp.array(0.25))
        dev = np.asarray(s.sample(swl))
        host = s.get(np.asarray(swl.lam))
        np.testing.assert_allclose(dev, host, rtol=2e-2, atol=1e-3)

    def test_sigmoid_device_matches_host(self):
        cs = get_named_color_space("srgb")
        coeffs = rgb2spec.fit_rgb_coeffs(np.array([[0.3, 0.5, 0.7]]), cs)
        lam = jnp.array([[400.0, 500.0, 600.0, 700.0]])
        dev = np.asarray(rgb2spec.sigmoid_poly_sample(jnp.asarray(coeffs[0]), lam))[0]
        x = (np.array([400.0, 500.0, 600.0, 700.0]) - 360.0) / 470.0
        c = coeffs[0].astype(np.float64)
        host = rgb2spec._sigmoid_np((c[0] * x + c[1]) * x + c[2])
        np.testing.assert_allclose(dev, host, atol=1e-5)


class TestColorspace:
    def test_srgb_matrices(self):
        cs = get_named_color_space("srgb")
        # standard sRGB→XYZ matrix (D65)
        ref = np.array(
            [
                [0.4124, 0.3576, 0.1805],
                [0.2126, 0.7152, 0.0722],
                [0.0193, 0.1192, 0.9505],
            ]
        )
        np.testing.assert_allclose(cs.xyz_from_rgb, ref, atol=2e-3)
        np.testing.assert_allclose(cs.rgb_from_xyz @ cs.xyz_from_rgb, np.eye(3), atol=1e-6)

    def test_white_maps_to_ones(self):
        cs = get_named_color_space("srgb")
        w = spec.spectrum_xyz(cs.illuminant)
        rgb = cs.to_rgb(w)
        np.testing.assert_allclose(rgb, 1.0, atol=5e-3)
