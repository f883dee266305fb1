"""Layered (coated) BxDFs: CoatedDiffuse and CoatedConductor.

TPU-native analog of /root/reference/src/bxdf.rs LayeredBxDF
(bxdf.rs:883-1700): a dielectric interface over an opaque bottom
(diffuse or conductor), separated by a medium of optical thickness
``thickness`` with single-scattering albedo ``albedo`` and HG asymmetry
``g``.  Evaluation/sampling/pdf are stochastic random walks between the
interfaces (f: bxdf.rs:939-1222; sample_f: :1224-1402; pdf estimate
blended 0.9 with uniform: :1404-1585).

Differences from the reference, by design:

* randoms come from a *counter-based* per-lane hash stream keyed by the
  sampler state — the reference draws from an unseeded ``SmallRng``
  (bxdf.rs:1011,1270), an acknowledged determinism hole (SURVEY.md §7);
  deterministic streams are mandatory for path-replay backprop;
* the walk is a fixed ``max_depth`` unrolled masked loop (lanes die by
  mask), not data-dependent recursion — XLA-friendly control flow;
* both CoatedDiffuse and CoatedConductor have *opaque* bottoms, so the
  layered BSDF is reflection-only and the exit interface is always the
  top; with no participating medium the walk strictly alternates
  bottom/top, which the unrolled loop exploits statically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shimmer_tpu.ops.math import small_gather
from shimmer_tpu.materials import bxdf as bx
from shimmer_tpu.materials import scattering as sc
from shimmer_tpu.materials.bxdf import BSDFSample, select_sample
from shimmer_tpu.materials.conductor_dielectric import (
    conductor_f,
    conductor_pdf,
    conductor_sample,
    dielectric_f,
    dielectric_pdf,
    dielectric_sample,
)
from shimmer_tpu.ops import rng as srng
from shimmer_tpu.ops.sampling import power_heuristic, sample_exponential
from shimmer_tpu.ops.vecmath import abs_cos_theta, same_hemisphere
from shimmer_tpu.spectra.sampled import N_SPECTRUM_SAMPLES

# Walk bounds (pbrt-v4 defaults; the reference reads them from material
# params with the same defaults).
LAYER_MAX_DEPTH = 10
LAYER_N_SAMPLES = 1


class _Rng:
    """Per-lane counter-based uniform stream: every draw hashes
    (key, counter) — order-independent, replay-exact.  The counter may be
    a Python int (unrolled code) or a traced uint32 scalar (scan bodies)."""

    def __init__(self, key, counter=0):
        self.key = jnp.asarray(key, jnp.uint32)
        self.c = counter

    def u1(self):
        self.c = self.c + 1
        c = self.c if not isinstance(self.c, int) else jnp.uint32(self.c)
        return srng.u32_to_unit_float(srng.hash_combine(self.key, c))

    def u2(self):
        return jnp.stack([self.u1(), self.u1()], axis=-1)


def _tr(dz, w):
    """Medium transmittance between depths, sigma_t = 1
    (bxdf.rs Tr helper)."""
    return jnp.exp(-jnp.abs(dz) / jnp.maximum(jnp.abs(w[..., 2]), 1e-9))


class _TopInterface:
    """Dielectric coat interface (top of the layer stack)."""

    def __init__(self, eta, ax, ay):
        self.eta, self.ax, self.ay = eta, ax, ay
        self.specular = sc.effectively_smooth(ax, ay)  # per lane

    def f(self, wo, wi, radiance=True):
        return dielectric_f(self.eta, wo, wi, self.ax, self.ay, radiance=radiance)

    def sample(self, wo, uc, u2, flags=bx.SAMPLE_ALL, radiance=True):
        return dielectric_sample(
            self.eta, wo, u2, uc, self.ax, self.ay,
            sample_flags=flags, radiance=radiance,
        )

    def pdf(self, wo, wi, flags=bx.SAMPLE_ALL):
        return dielectric_pdf(self.eta, wo, wi, self.ax, self.ay, sample_flags=flags)


class _DiffuseBottom:
    def __init__(self, reflectance):
        self.reflectance = reflectance
        self.specular = jnp.zeros(reflectance.shape[:-1], bool)

    def f(self, wo, wi, radiance=True):
        return bx.diffuse_f(self.reflectance, wo, wi)

    def sample(self, wo, uc, u2, flags=bx.SAMPLE_ALL, radiance=True):
        return bx.diffuse_sample_f(self.reflectance, wo, u2, uc)

    def pdf(self, wo, wi, flags=bx.SAMPLE_ALL):
        return bx.diffuse_pdf(wo, wi)


class _ConductorBottom:
    def __init__(self, eta, k, ax, ay):
        self.eta, self.k, self.ax, self.ay = eta, k, ax, ay
        self.specular = sc.effectively_smooth(ax, ay)

    def f(self, wo, wi, radiance=True):
        return conductor_f(self.eta, self.k, wo, wi, self.ax, self.ay)

    def sample(self, wo, uc, u2, flags=bx.SAMPLE_ALL, radiance=True):
        return conductor_sample(self.eta, self.k, wo, u2, self.ax, self.ay)

    def pdf(self, wo, wi, flags=bx.SAMPLE_ALL):
        return conductor_pdf(wo, wi, self.ax, self.ay)


def _sample_ok(s: BSDFSample):
    return s.valid & (s.pdf > 0.0) & (jnp.abs(s.wi[..., 2]) > 1e-9) & (
        jnp.max(s.f, axis=-1) > 0.0
    )


def layered_f(
    top: _TopInterface,
    bottom,
    wo,
    wi,
    rng_key,
    thickness,
    albedo,
    g,
    albedo_present: bool,
    n_samples: int = LAYER_N_SAMPLES,
    max_depth: int = LAYER_MAX_DEPTH,
):
    """Stochastic estimate of the layered BSDF value (bxdf.rs:939-1222).

    All arguments are per-lane arrays except the static ``albedo_present``
    / loop bounds.  Opaque bottom ⇒ reflection only; two-sided ⇒ flip to
    the upper hemisphere."""
    flip = (wo[..., 2] < 0.0)[..., None]
    wo = jnp.where(flip, -wo, wo)
    wi = jnp.where(flip, -wi, wi)
    same = same_hemisphere(wo, wi)
    batch = wo.shape[:-1]

    # Entrance-interface reflection term (bxdf.rs:998-1003).
    f = jnp.where(
        same[..., None], float(n_samples) * top.f(wo, wi), 0.0
    )
    exit_z = thickness  # exit is always the top interface (opaque bottom)

    for s_i in range(n_samples):
        r = _Rng(srng.hash_combine(rng_key, jnp.uint32(1000 + s_i)))
        # Transmit into the layer (bxdf.rs:1014-1022).
        wos = top.sample(wo, r.u1(), r.u2(), flags=bx.SAMPLE_TRANSMISSION)
        # Virtual exit sample from wi, importance transport
        # (bxdf.rs:1024-1033).
        wis = top.sample(
            wi, r.u1(), r.u2(), flags=bx.SAMPLE_TRANSMISSION, radiance=False
        )
        alive0 = same & _sample_ok(wos) & _sample_ok(wis)

        beta0 = wos.f * abs_cos_theta(wos.wi)[..., None] / jnp.maximum(
            wos.pdf, 1e-20
        )[..., None]
        beta_exit = wis.f / jnp.maximum(wis.pdf, 1e-20)[..., None]

        def body(carry, depth):
            f, beta, w, z, alive, c = carry
            # Per-sample stream: same hashed key as the prologue draws
            # (counters stay disjoint — prologue used 0..3, c starts at 4),
            # so n_samples > 1 walks are independent.
            r = _Rng(srng.hash_combine(rng_key, jnp.uint32(1000 + s_i)), counter=c)
            # Russian roulette (bxdf.rs:1050-1060).
            rr_beta = jnp.max(beta, axis=-1)
            q = jnp.maximum(0.0, 1.0 - rr_beta)
            do_rr = (depth > 3) & (rr_beta < 0.25)
            kill = do_rr & (r.u1() < q)
            beta = jnp.where(
                do_rr[..., None],
                beta / jnp.maximum(1.0 - q, 1e-6)[..., None],
                beta,
            )
            alive = alive & ~kill

            at_interface = jnp.ones(batch, bool)
            if albedo_present:
                # Medium flight + possible scattering event
                # (bxdf.rs:1066-1128).
                dz = sample_exponential(
                    r.u1(), 1.0 / jnp.maximum(jnp.abs(w[..., 2]), 1e-9)
                )
                zp = jnp.where(w[..., 2] > 0.0, z + dz, z - dz)
                scatter = alive & (zp > 0.0) & (zp < thickness)
                # NEE from the scattering event toward wis.
                ph = sc.henyey_greenstein(jnp.sum(-w * -wis.wi, axis=-1), g)
                wt = jnp.where(
                    top.specular,
                    1.0,
                    power_heuristic(1.0, wis.pdf, 1.0, ph),
                )
                contrib = (
                    beta
                    * albedo
                    * ph[..., None]
                    * wt[..., None]
                    * _tr(zp - exit_z, wis.wi)[..., None]
                    * beta_exit
                )
                f = f + jnp.where(scatter[..., None], contrib, 0.0)
                # Sample the phase function.
                ws, ps_pdf = sc.sample_henyey_greenstein(-w, g, r.u2())
                ps_ok = (ps_pdf > 0.0) & (jnp.abs(ws[..., 2]) > 1e-9)
                new_beta = beta * albedo * (
                    sc.henyey_greenstein(jnp.sum(-w * ws, axis=-1), g)
                    / jnp.maximum(ps_pdf, 1e-20)
                )[..., None]
                # MIS exit contribution along the phase sample
                # (bxdf.rs:1108-1124): heading toward the exit.
                toward_exit = (zp < exit_z) & (ws[..., 2] > 0.0)
                f_exit = top.f(-ws, wi)
                exit_pdf = top.pdf(-ws, wi, flags=bx.SAMPLE_TRANSMISSION)
                wt2 = power_heuristic(1.0, ps_pdf, 1.0, exit_pdf)
                mis_c = (
                    new_beta * _tr(zp - exit_z, ws)[..., None]
                    * f_exit * wt2[..., None]
                )
                add_mis = scatter & ps_ok & toward_exit & ~top.specular
                f = f + jnp.where(add_mis[..., None], mis_c, 0.0)

                beta = jnp.where(scatter[..., None], new_beta, beta)
                w = jnp.where(scatter[..., None], ws, w)
                z = jnp.where(scatter, zp, jnp.clip(zp, 0.0, thickness))
                alive = alive & jnp.where(scatter, ps_ok, True)
                at_interface = ~scatter
            else:
                # No medium: strict bottom/top alternation with
                # transmittance attenuation (bxdf.rs:1130-1134).
                z = jnp.where(z == thickness, 0.0, thickness)
                beta = beta * _tr(thickness, w)[..., None]

            at_bottom = at_interface & (z == 0.0)

            # --- bottom (non-exit) interface: NEE + reflection sample
            # (bxdf.rs:1160-1212) ---
            bot_active = alive & at_bottom & ~bottom.specular
            wt = jnp.where(
                top.specular,
                1.0,
                power_heuristic(1.0, wis.pdf, 1.0, bottom.pdf(-w, -wis.wi)),
            )
            nee = (
                beta
                * bottom.f(-w, -wis.wi)
                * abs_cos_theta(wis.wi)[..., None]
                * wt[..., None]
                * _tr(thickness, wis.wi)[..., None]
                * beta_exit
            )
            f = f + jnp.where(bot_active[..., None], nee, 0.0)

            bs_b = bottom.sample(-w, r.u1(), r.u2())
            # --- top (exit) interface: sample reflection back down
            # (bxdf.rs:1140-1156) ---
            bs_t = top.sample(-w, r.u1(), r.u2(), flags=bx.SAMPLE_REFLECTION)
            bs = select_sample(at_bottom, bs_b, bs_t)
            step_ok = _sample_ok(bs)
            new_beta = beta * bs.f * (
                abs_cos_theta(bs.wi) / jnp.maximum(bs.pdf, 1e-20)
            )[..., None]
            new_w = bs.wi

            # MIS exit contribution for the fresh bottom sample
            # (bxdf.rs:1196-1210).  When the non-exit (bottom) interface is
            # specular the NEE strategy is zero, so the sampled strategy
            # carries full weight (the reference's
            # !non_exit_interface.is_specular() guard).
            f_exit = top.f(-new_w, wi)
            exit_pdf = top.pdf(-new_w, wi, flags=bx.SAMPLE_TRANSMISSION)
            wt2 = jnp.where(
                bottom.specular,
                1.0,
                power_heuristic(1.0, bs.pdf, 1.0, exit_pdf),
            )
            mis_c = (
                new_beta * _tr(thickness, new_w)[..., None]
                * f_exit * wt2[..., None]
            )
            add_mis = alive & at_bottom & step_ok & ~top.specular
            f = f + jnp.where(add_mis[..., None], mis_c, 0.0)

            upd = (alive & at_interface)[..., None]
            beta = jnp.where(upd, new_beta, beta)
            w = jnp.where(upd, new_w, w)
            alive = alive & jnp.where(at_interface, step_ok, True)
            return (f, beta, w, z, alive, r.c), None

        z0 = jnp.broadcast_to(jnp.asarray(thickness, jnp.float32), batch)
        carry0 = (f, beta0, wos.wi, z0, alive0, jnp.uint32(4))
        (f, _, _, _, _, _), _ = jax.lax.scan(
            body, carry0, jnp.arange(max_depth)
        )

    return f / float(n_samples)


def layered_sample(
    top: _TopInterface,
    bottom,
    wo,
    uc,
    u2,
    rng_key,
    thickness,
    albedo,
    g,
    albedo_present: bool,
    max_depth: int = LAYER_MAX_DEPTH,
) -> BSDFSample:
    """Sample the layered BSDF by an explicit random walk
    (bxdf.rs:1224-1402).  Returned pdf is proportional (the true pdf is
    the stochastic estimate in ``layered_pdf``)."""
    batch = wo.shape[:-1]
    flip = wo[..., 2] < 0.0
    wo_f = jnp.where(flip[..., None], -wo, wo)

    bs0 = top.sample(wo_f, uc, u2)
    ok0 = _sample_ok(bs0)
    is_refl0 = (bs0.flags & bx.REFLECTION) != 0
    # Entrance reflection: return directly (bxdf.rs:1240-1254).
    entrance = BSDFSample(
        f=bs0.f,
        wi=jnp.where(flip[..., None], -bs0.wi, bs0.wi),
        pdf=bs0.pdf,
        flags=bs0.flags,
        eta=jnp.ones(batch, jnp.float32),
        pdf_is_proportional=jnp.ones(batch, bool),
        valid=ok0 & is_refl0,
    )

    def body(carry, depth):
        f, pdf, w, z, specular_path, walking, done, out, c = carry
        r = _Rng(rng_key, counter=c)
        # Russian roulette (bxdf.rs:1282-1292).
        rr_beta = jnp.max(f, axis=-1) / jnp.maximum(pdf, 1e-20)
        q = jnp.maximum(0.0, 1.0 - rr_beta)
        do_rr = (depth > 3) & walking & (rr_beta < 0.25)
        kill = do_rr & (r.u1() < q)
        pdf = jnp.where(do_rr, pdf * jnp.maximum(1.0 - q, 1e-6), pdf)
        walking = walking & ~kill

        at_interface = jnp.ones(batch, bool)
        if albedo_present:
            dz = sample_exponential(
                r.u1(), 1.0 / jnp.maximum(jnp.abs(w[..., 2]), 1e-9)
            )
            zp = jnp.where(w[..., 2] > 0.0, z + dz, z - dz)
            scatter = walking & (zp > 0.0) & (zp < thickness)
            ws, ps_pdf = sc.sample_henyey_greenstein(-w, g, r.u2())
            ps_ok = (ps_pdf > 0.0) & (jnp.abs(ws[..., 2]) > 1e-9)
            ph = sc.henyey_greenstein(jnp.sum(-w * ws, axis=-1), g)
            f = jnp.where(scatter[..., None], f * albedo * ph[..., None], f)
            pdf = jnp.where(scatter, pdf * ps_pdf, pdf)
            specular_path = specular_path & ~scatter
            w = jnp.where(scatter[..., None], ws, w)
            z = jnp.where(scatter, zp, jnp.clip(zp, 0.0, thickness))
            walking = walking & jnp.where(scatter, ps_ok, True)
            at_interface = ~scatter
        else:
            z = jnp.where(z == thickness, 0.0, thickness)
            f = f * _tr(thickness, w)[..., None]

        at_bottom = at_interface & (z == 0.0)
        bs_b = bottom.sample(-w, r.u1(), r.u2())
        bs_t = top.sample(-w, r.u1(), r.u2())
        bs = select_sample(at_bottom, bs_b, bs_t)
        step_ok = _sample_ok(bs)
        walking = walking & jnp.where(at_interface, step_ok, True)

        stepped = walking & at_interface
        f = jnp.where(stepped[..., None], f * bs.f, f)
        pdf = jnp.where(stepped, pdf * bs.pdf, pdf)
        specular_path = specular_path & jnp.where(
            stepped, bs.is_specular(), True
        )
        w = jnp.where(stepped[..., None], bs.wi, w)

        # Transmission through the top = exit (bxdf.rs:1356-1380).
        exits = stepped & ((bs.flags & bx.TRANSMISSION) != 0) & ~at_bottom
        same_out = same_hemisphere(wo_f, w)
        out_flags = jnp.where(
            same_out, bx.REFLECTION, bx.TRANSMISSION
        ) | jnp.where(specular_path, bx.SPECULAR, bx.GLOSSY)
        wi_out = jnp.where(flip[..., None], -w, w)
        cand = BSDFSample(
            f=f,
            wi=wi_out,
            pdf=pdf,
            flags=out_flags.astype(jnp.int32),
            eta=jnp.ones(batch, jnp.float32),
            pdf_is_proportional=jnp.ones(batch, bool),
            valid=exits & (pdf > 0.0),
        )
        commit = exits & ~done
        out = select_sample(commit, cand, out)
        done = done | exits
        walking = walking & ~exits

        # Post-interface cosine factor (bxdf.rs:1388-1392).
        f = jnp.where(
            stepped[..., None] & ~exits[..., None],
            f * abs_cos_theta(bs.wi)[..., None],
            f,
        )
        return (f, pdf, w, z, specular_path, walking, done, out, r.c), None

    carry0 = (
        bs0.f * abs_cos_theta(bs0.wi)[..., None],
        bs0.pdf,
        bs0.wi,
        jnp.broadcast_to(jnp.asarray(thickness, jnp.float32), batch),
        bs0.is_specular(),
        ok0 & ~is_refl0,  # transmitted into the layer
        jnp.zeros(batch, bool),
        BSDFSample.invalid(batch),
        jnp.uint32(0),
    )
    (_, _, _, _, _, _, _, out, _), _ = jax.lax.scan(
        body, carry0, jnp.arange(max_depth)
    )
    return select_sample(ok0 & is_refl0, entrance, out)


def layered_pdf(
    top: _TopInterface,
    bottom,
    wo,
    wi,
    rng_key,
    n_samples: int = LAYER_N_SAMPLES,
):
    """Stochastic pdf estimate blended with a uniform-sphere floor
    (bxdf.rs:1404-1585): 0.9 * estimate + 0.1 / (4 pi)."""
    flip = (wo[..., 2] < 0.0)[..., None]
    wo = jnp.where(flip, -wo, wo)
    wi = jnp.where(flip, -wi, wi)
    same = same_hemisphere(wo, wi)
    batch = wo.shape[:-1]
    # Decorrelate the pdf-estimate stream from layered_sample's walk
    # (both receive the same per-lane rng_key within a bounce).
    r = _Rng(srng.hash_combine(rng_key, jnp.uint32(77777)))

    # Direct top-interface reflection strategy (bxdf.rs:1430-1436).
    pdf_sum = jnp.where(
        same,
        float(n_samples) * top.pdf(wo, wi, flags=bx.SAMPLE_REFLECTION),
        0.0,
    )
    for _s in range(n_samples):
        # TRT estimate (bxdf.rs:1446-1540).
        wos = top.sample(wo, r.u1(), r.u2(), flags=bx.SAMPLE_TRANSMISSION)
        wis = top.sample(
            wi, r.u1(), r.u2(), flags=bx.SAMPLE_TRANSMISSION, radiance=False
        )
        ok = same & _sample_ok(wos) & _sample_ok(wis)
        # Specular top: bottom pdf of the deterministic refraction pair.
        pdf_spec = bottom.pdf(-wos.wi, -wis.wi)
        # Non-specular: MIS-weighted two-strategy estimate.
        rs = bottom.sample(-wos.wi, r.u1(), r.u2())
        rs_ok = _sample_ok(rs)
        r_pdf = bottom.pdf(-wos.wi, -wis.wi)
        wt = power_heuristic(1.0, wis.pdf, 1.0, r_pdf)
        t_pdf = top.pdf(-rs.wi, wi, flags=bx.SAMPLE_TRANSMISSION)
        wt_t = power_heuristic(1.0, rs.pdf, 1.0, t_pdf)
        pdf_nonspec = jnp.where(
            bottom.specular,
            top.pdf(-rs.wi, wi),
            wt * r_pdf + wt_t * t_pdf,
        ) * rs_ok.astype(jnp.float32)
        est = jnp.where(top.specular, pdf_spec, pdf_nonspec)
        pdf_sum = pdf_sum + jnp.where(ok, est, 0.0)

    uniform = 1.0 / (4.0 * jnp.pi)
    return 0.9 * pdf_sum / float(n_samples) + 0.1 * uniform


# ---------------------------------------------------------------------------
# Material-table dispatch glue (called from materials.material).
# ---------------------------------------------------------------------------


def _interfaces(materials, mat_id, kind_is_conductor, swl, spectra_table, tex):
    """Build top/bottom interface closures from material-table rows."""
    from shimmer_tpu.materials.conductor_dielectric import (
        _conductor_eta_k,
        _dielectric_eta,
    )
    from shimmer_tpu.spectra.rgb2spec import sigmoid_poly_sample

    ax = sc.roughness_to_alpha(small_gather(materials.uroughness, mat_id))
    ay = sc.roughness_to_alpha(small_gather(materials.vroughness, mat_id))
    ax, ay = sc.clamp_alpha(ax, ay)
    eta = _dielectric_eta(materials, mat_id, swl, None)
    top = _TopInterface(eta, ax, ay)

    if tex and tex.get("reflectance") is not None:
        refl = tex["reflectance"]
    else:
        refl = sigmoid_poly_sample(small_gather(materials.reflectance, mat_id), swl.lam)
    bot_d = _DiffuseBottom(refl)

    bax = sc.roughness_to_alpha(small_gather(materials.bot_uroughness, mat_id))
    bay = sc.roughness_to_alpha(small_gather(materials.bot_vroughness, mat_id))
    bax, bay = sc.clamp_alpha(bax, bay)
    c_eta, c_k = _conductor_eta_k(materials, mat_id, swl, spectra_table, tex)
    bot_c = _ConductorBottom(c_eta, c_k, bax, bay)
    return top, bot_d, bot_c


def _layer_params(materials, mat_id, swl):
    from shimmer_tpu.spectra.rgb2spec import sigmoid_poly_sample

    thickness = small_gather(materials.thickness, mat_id)
    g = small_gather(materials.hg_g, mat_id)
    albedo = sigmoid_poly_sample(small_gather(materials.albedo, mat_id), swl.lam)
    return thickness, g, albedo


def coated_f(materials, kinds_present, mat_id, kind, wo, wi, swl, f, rng_key, tex=None, spectra_table=None):
    from shimmer_tpu.materials import material as mtl

    albedo_present = bool(getattr(materials, "layer_medium", False))
    thickness, g, albedo = _layer_params(materials, mat_id, swl)
    for mk, is_cond in (
        (mtl.COATED_DIFFUSE, False),
        (mtl.COATED_CONDUCTOR, True),
    ):
        if mk not in kinds_present:
            continue
        top, bot_d, bot_c = _interfaces(
            materials, mat_id, is_cond, swl, spectra_table, tex
        )
        bot = bot_c if is_cond else bot_d
        key = srng.hash_combine(rng_key, jnp.uint32(mk))
        val = layered_f(
            top, bot, wo, wi, key, thickness, albedo, g, albedo_present
        )
        f = jnp.where((kind == mk)[..., None], val, f)
    return f


def coated_sample(materials, kinds_present, mat_id, kind, wo, u2, uc, swl, out, rng_key, tex=None, spectra_table=None):
    from shimmer_tpu.materials import material as mtl

    albedo_present = bool(getattr(materials, "layer_medium", False))
    thickness, g, albedo = _layer_params(materials, mat_id, swl)
    for mk, is_cond in (
        (mtl.COATED_DIFFUSE, False),
        (mtl.COATED_CONDUCTOR, True),
    ):
        if mk not in kinds_present:
            continue
        top, bot_d, bot_c = _interfaces(
            materials, mat_id, is_cond, swl, spectra_table, tex
        )
        bot = bot_c if is_cond else bot_d
        key = srng.hash_combine(rng_key, jnp.uint32(16 + mk))
        s = layered_sample(
            top, bot, wo, uc, u2, key, thickness, albedo, g, albedo_present
        )
        out = select_sample(kind == mk, s, out)
    return out


def coated_pdf(materials, kinds_present, mat_id, kind, wo, wi, swl, pdf, rng_key, tex=None, spectra_table=None):
    from shimmer_tpu.materials import material as mtl

    thickness, g, albedo = _layer_params(materials, mat_id, swl)
    for mk, is_cond in (
        (mtl.COATED_DIFFUSE, False),
        (mtl.COATED_CONDUCTOR, True),
    ):
        if mk not in kinds_present:
            continue
        top, bot_d, bot_c = _interfaces(
            materials, mat_id, is_cond, swl, spectra_table, tex
        )
        bot = bot_c if is_cond else bot_d
        key = srng.hash_combine(rng_key, jnp.uint32(32 + mk))
        val = layered_pdf(top, bot, wo, wi, key)
        pdf = jnp.where(kind == mk, val, pdf)
    return pdf
