"""Monte Carlo sampling library, batched over lanes.

TPU-native analog of /root/reference/src/sampling.rs: MIS heuristics,
canonical warps (sphere / hemisphere / cosine / disk / triangle / bilinear /
spherical triangle / spherical rectangle / linear / tent / exponential /
visible-wavelength), and piecewise-constant 1D/2D distributions whose tables
are built host-side and sampled on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from shimmer_tpu.ops.math import (
    difference_of_products,
    find_interval,
    lerp,
    safe_sqrt,
    sqr,
    sum_of_products,
)
from shimmer_tpu.ops.vecmath import (
    angle_between,
    cross,
    dot,
    gram_schmidt,
    length,
    length_squared,
    normalize,
    vec,
    vec2,
)
from shimmer_tpu.utils.pytree import pytree_dataclass, static_field

INV_PI = 1.0 / np.pi
INV_2PI = 1.0 / (2.0 * np.pi)
INV_4PI = 1.0 / (4.0 * np.pi)
PI_OVER_2 = np.pi / 2.0
PI_OVER_4 = np.pi / 4.0


# --- MIS heuristics (src/sampling.rs:182-199) ---


def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / (nf * f_pdf + ng * g_pdf)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    f = nf * f_pdf
    g = ng * g_pdf
    f2 = sqr(f)
    denom = f2 + sqr(g)
    # Double-where keeps masked lanes' partials finite (no 0·inf NaN in AD).
    w = jnp.where(denom > 0.0, f2 / jnp.where(denom > 0.0, denom, 1.0), 0.0)
    # inf^2 / (inf^2 + x) -> 1 (reference guards the same way).
    return jnp.where(jnp.isinf(f2), 1.0, w)


# --- discrete / 1-D warps ---


def sample_discrete(weights, u):
    """Sample an index from unnormalized weights along the last axis.

    Returns (index, pmf, u_remapped) like the reference's sample_discrete
    (src/sampling.rs:201-240).  ``weights`` is (..., N); ``u`` is (...,).
    """
    total = jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(weights, axis=-1) / jnp.where(total == 0.0, 1.0, total)
    up = u[..., None]
    idx = jnp.sum(jnp.asarray(up >= cdf, jnp.int32), axis=-1)
    n = weights.shape[-1]
    idx = jnp.clip(idx, 0, n - 1)
    pmf = jnp.take_along_axis(weights, idx[..., None], axis=-1)[..., 0] / jnp.where(
        total[..., 0] == 0.0, 1.0, total[..., 0]
    )
    lo = jnp.where(
        idx == 0,
        0.0,
        jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None], axis=-1)[..., 0],
    )
    hi = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    u_remap = jnp.clip((u - lo) / jnp.where(hi == lo, 1.0, hi - lo), 0.0, 1.0)
    return idx, pmf, u_remap


def sample_linear(u, a, b):
    """Sample x in [0,1] ∝ lerp(x, a, b) (src/sampling.rs sample_linear)."""
    zero = (a == 0.0) & (b == 0.0)
    denom = a + jnp.sqrt(lerp(u, sqr(a), sqr(b)))
    x = u * (a + b) / jnp.where(denom == 0.0, 1.0, denom)
    x = jnp.where(zero, u, x)
    return jnp.minimum(x, jnp.float32(1.0 - 1e-7))


def linear_pdf(x, a, b):
    inside = (x >= 0.0) & (x <= 1.0)
    return jnp.where(inside, 2.0 * lerp(x, a, b) / (a + b), 0.0)


def invert_linear_sample(x, a, b):
    return x * (a * (2.0 - x) + b * x) / (a + b)


def sample_tent(u, r):
    """Tent filter sample over [-r, r] (src/sampling.rs sample_tent)."""
    take_neg = u < 0.5
    u1 = jnp.where(take_neg, u * 2.0, (u - 0.5) * 2.0)
    x = sample_linear(u1, 1.0, 0.0)
    return jnp.where(take_neg, -r * (1.0 - x), r * (1.0 - x))


def sample_exponential(u, a):
    return -jnp.log1p(-u) / a


def exponential_pdf(x, a):
    return a * jnp.exp(-a * x)


# --- spherical warps (src/sampling.rs:412-641) ---


def sample_uniform_sphere(u):
    z = 1.0 - 2.0 * u[..., 0]
    r = safe_sqrt(1.0 - sqr(z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


UNIFORM_SPHERE_PDF = INV_4PI


def sample_uniform_hemisphere(u):
    z = u[..., 0]
    r = safe_sqrt(1.0 - sqr(z))
    phi = 2.0 * jnp.pi * u[..., 1]
    return vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


UNIFORM_HEMISPHERE_PDF = INV_2PI


def sample_uniform_disk_concentric(u):
    """Shirley-Chiu concentric disk mapping (src/sampling.rs)."""
    uo = 2.0 * u - 1.0
    x, y = uo[..., 0], uo[..., 1]
    zero = (x == 0.0) & (y == 0.0)
    absx, absy = jnp.abs(x), jnp.abs(y)
    use_x = absx > absy
    r = jnp.where(use_x, x, y)
    safe = lambda d: jnp.where(d == 0.0, 1.0, d)
    theta = jnp.where(
        use_x, PI_OVER_4 * (y / safe(x)), PI_OVER_2 - PI_OVER_4 * (x / safe(y))
    )
    p = r[..., None] * vec2(jnp.cos(theta), jnp.sin(theta))
    return jnp.where(zero[..., None], 0.0, p)


def sample_uniform_disk_polar(u):
    r = jnp.sqrt(u[..., 0])
    theta = 2.0 * jnp.pi * u[..., 1]
    return r[..., None] * vec2(jnp.cos(theta), jnp.sin(theta))


def sample_cosine_hemisphere(u):
    d = sample_uniform_disk_concentric(u)
    z = safe_sqrt(1.0 - length_squared(d))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta * INV_PI


def sample_uniform_cone(u, cos_theta_max):
    cos_theta = (1.0 - u[..., 0]) + u[..., 0] * cos_theta_max
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    phi = 2.0 * jnp.pi * u[..., 1]
    return vec(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (2.0 * jnp.pi * (1.0 - cos_theta_max))


def sample_uniform_triangle(u):
    """Barycentrics uniform over a triangle (src/sampling.rs)."""
    u0, u1 = u[..., 0], u[..., 1]
    flip = u0 < u1
    b0 = jnp.where(flip, u0 / 2.0, u0 - u1 / 2.0)
    b1 = jnp.where(flip, u1 - b0, u1 / 2.0)
    return jnp.stack([b0, b1, 1.0 - b0 - b1], axis=-1)


def invert_uniform_triangle_sample(b):
    b0, b1 = b[..., 0], b[..., 1]
    flip = b0 > b1  # corresponds to the u0 < u1 branch
    u0 = jnp.where(flip, b0 + b1 / 1.0, 2.0 * b0)  # placeholder, fixed below
    # From the forward map: flip (u0<u1): b0=u0/2, b1=u1-u0/2 → u0=2b0, u1=b1+b0
    # else: b0=u0-u1/2, b1=u1/2 → u1=2b1, u0=b0+b1
    u0 = jnp.where(flip, b0 + b1, 2.0 * b0)
    u1 = jnp.where(flip, 2.0 * b1, b0 + b1)
    # flip condition in forward was u0<u1 ⇔ 2b0 < b1+b0 ⇔ b0 < b1
    flip2 = b0 < b1
    u0 = jnp.where(flip2, 2.0 * b0, b0 + b1)
    u1 = jnp.where(flip2, b0 + b1, 2.0 * b1)
    return vec2(u0, u1)


def sample_bilinear(u, w):
    """Sample (u,v) ∝ bilinear interpolation of 4 corner weights w=(...,4)
    laid out [w00, w10, w01, w11] (src/sampling.rs sample_bilinear)."""
    w00, w10, w01, w11 = w[..., 0], w[..., 1], w[..., 2], w[..., 3]
    v = sample_linear(u[..., 1], w00 + w10, w01 + w11)
    uo = sample_linear(u[..., 0], lerp(v, w00, w01), lerp(v, w10, w11))
    return vec2(uo, v)


def bilinear_pdf(p, w):
    w00, w10, w01, w11 = w[..., 0], w[..., 1], w[..., 2], w[..., 3]
    total = w00 + w10 + w01 + w11
    u, v = p[..., 0], p[..., 1]
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    f = (
        (1 - u) * (1 - v) * w00
        + u * (1 - v) * w10
        + (1 - u) * v * w01
        + u * v * w11
    )
    pdf = jnp.where(total <= 0.0, 1.0, 4.0 * f / jnp.where(total <= 0.0, 1.0, total))
    return jnp.where(inside, pdf, 0.0)


def invert_bilinear_sample(p, w):
    w00, w10, w01, w11 = w[..., 0], w[..., 1], w[..., 2], w[..., 3]
    v = invert_linear_sample(p[..., 1], w00 + w10, w01 + w11)
    u = invert_linear_sample(
        p[..., 0], lerp(v, w00, w01), lerp(v, w10, w11)
    )
    return vec2(u, v)


def sample_spherical_triangle(v0, v1, v2, p, u):
    """Uniform solid-angle sampling of a spherical triangle (Arvo 1995 via
    pbrt; reference src/sampling.rs sample_spherical_triangle).

    Returns (barycentrics (...,3), pdf) — pdf = 1/solid_angle, 0 if degenerate.
    """
    a = normalize(v0 - p)
    b = normalize(v1 - p)
    c = normalize(v2 - p)
    n_ab = cross(a, b)
    n_bc = cross(b, c)
    n_ca = cross(c, a)
    bad = (
        (length_squared(n_ab) == 0.0)
        | (length_squared(n_bc) == 0.0)
        | (length_squared(n_ca) == 0.0)
    )
    n_ab_n = normalize(n_ab)
    n_bc_n = normalize(n_bc)
    n_ca_n = normalize(n_ca)
    alpha = angle_between(n_ab_n, -n_ca_n)
    beta = angle_between(n_bc_n, -n_ab_n)
    gamma = angle_between(n_ca_n, -n_bc_n)
    a_pi = alpha + beta + gamma
    solid = a_pi - jnp.pi
    pdf = jnp.where(bad | (solid <= 0.0), 0.0, 1.0 / jnp.where(solid <= 0.0, 1.0, solid))

    # Sample sub-triangle area fraction.
    ap_pi = lerp(u[..., 0], jnp.pi, a_pi)
    # Compute cos/sin of phi' = ap - pi.
    cos_alpha = jnp.cos(alpha)
    sin_alpha = jnp.sin(alpha)
    sin_phi = jnp.sin(ap_pi) * cos_alpha - jnp.cos(ap_pi) * sin_alpha
    cos_phi = jnp.cos(ap_pi) * cos_alpha + jnp.sin(ap_pi) * sin_alpha
    k1 = cos_phi + cos_alpha
    k2 = sin_phi - sin_alpha * dot(a, b)
    cos_bp = (k2 + (difference_of_products(k2, cos_phi, k1, sin_phi)) * cos_alpha) / (
        (sum_of_products(k2, sin_phi, k1, cos_phi)) * sin_alpha
    )
    cos_bp = jnp.clip(cos_bp, -1.0, 1.0)
    sin_bp = safe_sqrt(1.0 - sqr(cos_bp))
    cp = cos_bp[..., None] * a + sin_bp[..., None] * normalize(gram_schmidt(c, a))
    cos_theta = 1.0 - u[..., 1] * (1.0 - dot(cp, b))
    sin_theta = safe_sqrt(1.0 - sqr(cos_theta))
    w = cos_theta[..., None] * b + sin_theta[..., None] * normalize(
        gram_schmidt(cp, b)
    )
    # Barycentrics of intersection of ray (p, w) with the triangle.
    e1 = v1 - v0
    e2 = v2 - v0
    s1 = cross(w, e2)
    div = dot(s1, e1)
    div_ok = jnp.abs(div) > 1e-20
    inv_div = 1.0 / jnp.where(div_ok, div, 1.0)
    s = p - v0
    b1 = dot(s, s1) * inv_div
    b2 = dot(cross(s, e1), w) * inv_div
    b1 = jnp.clip(b1, 0.0, 1.0)
    b2 = jnp.clip(b2, 0.0, 1.0)
    denom = b1 + b2
    over = denom > 1.0
    denom_safe = jnp.where(over, denom, 1.0)
    b1 = jnp.where(over, b1 / denom_safe, b1)
    b2 = jnp.where(over, b2 / denom_safe, b2)
    bary = jnp.stack([1.0 - b1 - b2, b1, b2], axis=-1)
    bary = jnp.where(div_ok[..., None], bary, jnp.array([1 / 3, 1 / 3, 1 / 3]))
    return bary, pdf


def sample_spherical_rectangle(p_ref, s, ex, ey, u):
    """Ureña et al. spherical rectangle sampling (src/sampling.rs
    sample_spherical_rectangle).  Rectangle origin s, edges ex, ey.

    Returns (point (...,3), pdf (1/solid-angle)).
    """
    exl = length(ex)
    eyl = length(ey)
    x_axis = ex / jnp.where(exl == 0, 1.0, exl)[..., None]
    y_axis = ey / jnp.where(eyl == 0, 1.0, eyl)[..., None]
    z_axis = cross(x_axis, y_axis)
    d = s - p_ref
    x0 = dot(d, x_axis)
    y0 = dot(d, y_axis)
    z0 = dot(d, z_axis)
    flip = z0 > 0.0
    z_axis = jnp.where(flip[..., None], -z_axis, z_axis)
    z0 = jnp.where(flip, -z0, z0)
    x1 = x0 + exl
    y1 = y0 + eyl
    # Normals to the four great circles.
    v00 = vec(x0, y0, z0)
    v01 = vec(x0, y1, z0)
    v10 = vec(x1, y0, z0)
    v11 = vec(x1, y1, z0)
    n0 = normalize(cross(v00, v10))
    n1 = normalize(cross(v10, v11))
    n2 = normalize(cross(v11, v01))
    n3 = normalize(cross(v01, v00))
    g0 = angle_between(-n0, n1)
    g1 = angle_between(-n1, n2)
    g2 = angle_between(-n2, n3)
    g3 = angle_between(-n3, n0)
    solid_angle = g0 + g1 + g2 + g3 - 2.0 * jnp.pi
    solid_angle = jnp.maximum(solid_angle, 1e-12)
    pdf = 1.0 / solid_angle

    b0 = n0[..., 2]
    b1 = n2[..., 2]
    au = u[..., 0] * solid_angle + (2.0 * jnp.pi - g2 - g3)
    fu = (jnp.cos(au) * b0 - b1) / jnp.sin(au)
    cu = jnp.copysign(1.0 / jnp.sqrt(sqr(fu) + sqr(b0)), fu)
    cu = jnp.clip(cu, -1.0, 1.0)
    xu = -(cu * z0) / jnp.maximum(jnp.sqrt(1.0 - sqr(cu)), 1e-12)
    xu = jnp.clip(xu, x0, x1)
    dd = jnp.sqrt(sqr(xu) + sqr(z0))
    h0 = y0 / jnp.sqrt(sqr(dd) + sqr(y0))
    h1 = y1 / jnp.sqrt(sqr(dd) + sqr(y1))
    hv = h0 + u[..., 1] * (h1 - h0)
    hv2 = sqr(hv)
    yv = jnp.where(hv2 < 1.0 - 1e-6, (hv * dd) / jnp.sqrt(jnp.maximum(1.0 - hv2, 1e-12)), y1)
    pt = p_ref + xu[..., None] * x_axis + yv[..., None] * y_axis + z0[..., None] * z_axis
    return pt, pdf


# --- wavelength sampling (src/sampling.rs:268-278) ---


def sample_visible_wavelengths(u):
    """Importance-sample visible wavelengths ∝ sech^2 weighting (pbrt)."""
    return 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * u)


def visible_wavelengths_pdf(lam):
    x = jnp.cosh(0.0072 * (lam - 538.0))
    pdf = 0.0039398042 / sqr(x)
    return jnp.where((lam >= 360.0) & (lam <= 830.0), pdf, 0.0)


# --- piecewise-constant distributions (src/sampling.rs:23-180) ---


@pytree_dataclass
class PiecewiseConstant1D:
    """Tabulated 1-D distribution over [min, max].

    func: (..., N) non-negative values; cdf: (..., N+1); integral: (...,).
    Built by :func:`build_piecewise_constant_1d`.
    """

    func: jnp.ndarray
    cdf: jnp.ndarray
    func_int: jnp.ndarray
    domain_min: float = static_field(default=0.0)
    domain_max: float = static_field(default=1.0)

    @property
    def size(self):
        return self.func.shape[-1]

    def sample(self, u):
        """Returns (x, pdf, offset)."""
        n = self.size
        cdf = self.cdf
        if cdf.ndim == 1:
            o = find_interval(cdf, u)
            cdf_o = cdf[o]
            cdf_o1 = cdf[o + 1]
            f_o = self.func[o]
            integral = self.func_int
        else:
            o = jnp.clip(
                jnp.sum(jnp.asarray(u[..., None] >= cdf[..., 1:], jnp.int32), axis=-1),
                0,
                n - 1,
            )
            cdf_o = jnp.take_along_axis(cdf, o[..., None], axis=-1)[..., 0]
            cdf_o1 = jnp.take_along_axis(cdf, (o + 1)[..., None], axis=-1)[..., 0]
            f_o = jnp.take_along_axis(self.func, o[..., None], axis=-1)[..., 0]
            integral = self.func_int
        du = u - cdf_o
        width = cdf_o1 - cdf_o
        du = jnp.where(width > 0.0, du / jnp.where(width > 0.0, width, 1.0), du)
        pdf = jnp.where(integral > 0.0, f_o / jnp.where(integral > 0.0, integral, 1.0), 0.0)
        x = lerp(
            (o.astype(jnp.float32) + du) / n, self.domain_min, self.domain_max
        )
        return x, pdf, o

    def pdf_at(self, x):
        n = self.size
        t = (x - self.domain_min) / (self.domain_max - self.domain_min)
        i = jnp.clip((t * n).astype(jnp.int32), 0, n - 1)
        if self.func.ndim == 1:
            f = self.func[i]
        else:
            f = jnp.take_along_axis(self.func, i[..., None], axis=-1)[..., 0]
        return jnp.where(self.func_int > 0.0, f / jnp.where(self.func_int > 0.0, self.func_int, 1.0), 0.0)


def build_piecewise_constant_1d(func, domain_min=0.0, domain_max=1.0):
    """Build a PiecewiseConstant1D from (..., N) values (host or trace time).

    pdf convention matches the reference: pdf is w.r.t. x over the domain,
    func_int = mean(func) * (max - min) ... actually the reference stores
    cdf[i+1] = cdf[i] + f[i] * (max-min) / n and normalizes; pdf = f/integral.
    """
    func = jnp.abs(jnp.asarray(func, jnp.float32))
    n = func.shape[-1]
    step = (domain_max - domain_min) / n
    cdf = jnp.cumsum(func * step, axis=-1)
    func_int = cdf[..., -1]
    zero = func_int == 0.0
    # Degenerate: uniform.
    ramp = (jnp.arange(1, n + 1, dtype=jnp.float32)) / n
    norm_cdf = jnp.where(
        zero[..., None], ramp, cdf / jnp.where(zero[..., None], 1.0, func_int[..., None])
    )
    cdf_full = jnp.concatenate([jnp.zeros_like(norm_cdf[..., :1]), norm_cdf], axis=-1)
    func_eff = jnp.where(zero[..., None], jnp.ones_like(func), func)
    func_int_eff = jnp.where(zero, step * n, func_int)
    return PiecewiseConstant1D(
        func=func_eff,
        cdf=cdf_full,
        func_int=func_int_eff,
        domain_min=float(domain_min),
        domain_max=float(domain_max),
    )


@pytree_dataclass
class PiecewiseConstant2D:
    """2-D distribution: marginal over rows + conditional per row
    (src/sampling.rs PiecewiseConstant2D).  func is (H, W)."""

    func: jnp.ndarray           # (H, W)
    cond_cdf: jnp.ndarray       # (H, W+1) conditional CDFs p(u|v)
    cond_int: jnp.ndarray       # (H,) row integrals
    marg_cdf: jnp.ndarray       # (H+1,)
    marg_func: jnp.ndarray      # (H,)
    marg_int: jnp.ndarray       # ()
    domain: tuple = static_field(default=((0.0, 0.0), (1.0, 1.0)))

    def sample(self, u):
        """u: (..., 2) → ((..., 2) point, pdf)."""
        (x0, y0), (x1, y1) = self.domain
        h, w = self.func.shape
        # Marginal sample over rows (v).
        uv = u[..., 1]
        ov = jnp.clip(
            jnp.searchsorted(self.marg_cdf, uv, side="right") - 1, 0, h - 1
        )
        c0 = self.marg_cdf[ov]
        c1 = self.marg_cdf[ov + 1]
        dv = jnp.where(c1 > c0, (uv - c0) / jnp.where(c1 > c0, c1 - c0, 1.0), 0.0)
        pdf_v = jnp.where(
            self.marg_int > 0.0, self.marg_func[ov] / self.marg_int, 0.0
        )
        v = (ov.astype(jnp.float32) + dv) / h
        # Conditional sample over columns (u) for the chosen row.
        uu = u[..., 0]
        row_cdf = self.cond_cdf[ov]  # (..., W+1)
        ou = jnp.clip(
            jnp.sum(jnp.asarray(uu[..., None] >= row_cdf[..., 1:], jnp.int32), axis=-1),
            0,
            w - 1,
        )
        c0u = jnp.take_along_axis(row_cdf, ou[..., None], axis=-1)[..., 0]
        c1u = jnp.take_along_axis(row_cdf, (ou + 1)[..., None], axis=-1)[..., 0]
        du = jnp.where(c1u > c0u, (uu - c0u) / jnp.where(c1u > c0u, c1u - c0u, 1.0), 0.0)
        row_int = self.cond_int[ov]
        f = self.func[ov, ou]
        pdf_u = jnp.where(row_int > 0.0, f / jnp.where(row_int > 0.0, row_int, 1.0), 0.0)
        x = lerp((ou.astype(jnp.float32) + du) / w, x0, x1)
        y = lerp(v, y0, y1)
        pdf = pdf_u * pdf_v / ((x1 - x0) * (y1 - y0))
        return vec2(x, y), pdf

    def pdf_at(self, p):
        (x0, y0), (x1, y1) = self.domain
        h, w = self.func.shape
        tx = (p[..., 0] - x0) / (x1 - x0)
        ty = (p[..., 1] - y0) / (y1 - y0)
        ix = jnp.clip((tx * w).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip((ty * h).astype(jnp.int32), 0, h - 1)
        f = self.func[iy, ix]
        total = self.marg_int
        return jnp.where(total > 0.0, f / jnp.where(total > 0.0, total, 1.0), 0.0) / (
            (x1 - x0) * (y1 - y0)
        )

    @property
    def integral(self):
        return self.marg_int


def build_piecewise_constant_2d(func, domain=((0.0, 0.0), (1.0, 1.0))):
    func = jnp.abs(jnp.asarray(func, jnp.float32))
    h, w = func.shape
    (x0, y0), (x1, y1) = domain
    du = (x1 - x0) / w
    dv = (y1 - y0) / h
    # Conditional over columns per row.
    cond_cdf = jnp.cumsum(func * du, axis=-1)
    cond_int = cond_cdf[:, -1]
    zero_row = cond_int == 0.0
    ramp = jnp.broadcast_to(jnp.arange(1, w + 1, dtype=jnp.float32) / w, (h, w))
    cond_norm = jnp.where(
        zero_row[:, None], ramp, cond_cdf / jnp.where(zero_row[:, None], 1.0, cond_int[:, None])
    )
    cond_full = jnp.concatenate([jnp.zeros((h, 1), jnp.float32), cond_norm], axis=-1)
    cond_int_eff = jnp.where(zero_row, du * w, cond_int)
    # Marginal over rows.
    marg_func = cond_int
    marg_cdf = jnp.cumsum(marg_func * dv)
    marg_int = marg_cdf[-1]
    zero = marg_int == 0.0
    marg_ramp = jnp.arange(1, h + 1, dtype=jnp.float32) / h
    marg_norm = jnp.where(zero, marg_ramp, marg_cdf / jnp.where(zero, 1.0, marg_int))
    marg_full = jnp.concatenate([jnp.zeros((1,), jnp.float32), marg_norm])
    marg_func_eff = jnp.where(zero, jnp.ones_like(marg_func) * dv * w, marg_func)
    marg_int_eff = jnp.where(zero, dv * h * du * w, marg_int)
    return PiecewiseConstant2D(
        func=func,
        cond_cdf=cond_full,
        cond_int=cond_int_eff,
        marg_cdf=marg_full,
        marg_func=marg_func_eff,
        marg_int=marg_int_eff,
        domain=tuple(map(tuple, domain)),
    )
