"""RGB color spaces (primaries + whitepoint + illuminant).

TPU-native analog of /root/reference/src/colorspace.rs.  Named spaces: sRGB,
Rec2020, ACES2065-1, DCI-P3.  The XYZ↔RGB matrices are derived from the
primaries/whitepoint exactly as the reference does; the rgb→spectrum
coefficient lookup is replaced by an on-demand Gauss-Newton fit
(shimmer_tpu.spectra.rgb2spec) because the reference's precomputed 64^3
tables are external data we regenerate ourselves.
"""

from __future__ import annotations

import functools

import numpy as np

from shimmer_tpu.color.color import xyz_from_xy_y, xyz_to_xy
from shimmer_tpu.spectra.spectrum import (
    Spectrum,
    d_illuminant,
    named_spectrum,
    spectrum_xyz,
)


class RgbColorSpace:
    def __init__(self, r_xy, g_xy, b_xy, illuminant: Spectrum, name: str = ""):
        self.name = name
        self.r = np.asarray(r_xy, np.float64)
        self.g = np.asarray(g_xy, np.float64)
        self.b = np.asarray(b_xy, np.float64)
        self.illuminant = illuminant
        # Whitepoint from the illuminant's XYZ (src/colorspace.rs:17-80).
        w_xyz = spectrum_xyz(illuminant)
        self.w = xyz_to_xy(w_xyz)
        r_xyz = xyz_from_xy_y(self.r)
        g_xyz = xyz_from_xy_y(self.g)
        b_xyz = xyz_from_xy_y(self.b)
        rgb = np.stack([r_xyz, g_xyz, b_xyz], axis=-1)  # columns
        c = np.linalg.solve(rgb, w_xyz)
        self.xyz_from_rgb = rgb @ np.diag(c)
        self.rgb_from_xyz = np.linalg.inv(self.xyz_from_rgb)

    def to_rgb(self, xyz):
        return self.rgb_from_xyz @ np.asarray(xyz)

    def to_xyz(self, rgb):
        return self.xyz_from_rgb @ np.asarray(rgb)

    def to_rgb_coeffs(self, rgb):
        """Sigmoid-polynomial coefficients for an rgb albedo in this space."""
        from shimmer_tpu.spectra.rgb2spec import fit_rgb_coeffs

        return fit_rgb_coeffs(np.asarray(rgb, np.float64)[None, :], self)[0]

    def __repr__(self):
        return f"RgbColorSpace({self.name})"


@functools.cache
def get_named_color_space(name: str) -> RgbColorSpace:
    """Named color spaces (src/colorspace.rs:86-160)."""
    name = name.lower().replace("_", "-")
    if name == "srgb":
        return RgbColorSpace(
            (0.64, 0.33), (0.3, 0.6), (0.15, 0.06),
            named_spectrum("stdillum-D65"), "sRGB",
        )
    if name == "rec2020":
        return RgbColorSpace(
            (0.708, 0.292), (0.170, 0.797), (0.131, 0.046),
            named_spectrum("stdillum-D65"), "Rec2020",
        )
    if name in ("aces2065-1", "aces"):
        return RgbColorSpace(
            (0.7347, 0.2653), (0.0, 1.0), (0.0001, -0.077),
            named_spectrum("illum-acesD60"), "ACES2065-1",
        )
    if name == "dci-p3":
        return RgbColorSpace(
            (0.68, 0.32), (0.265, 0.690), (0.15, 0.06),
            d_illuminant(6300.0), "DCI-P3",
        )
    raise ValueError(f"unknown color space: {name}")
