"""Direction samplers, PDF evaluators and the orthonormal-basis builder.

Batched (SoA, lane-parallel) equivalents of the reference's scalar samplers:
- RandomCosineDirectionHemisphere (win32_main.cpp:2258-2268)
- RandomHalfVectorGGX             (win32_main.cpp:2271-2285)
- RandomToSphere                  (win32_main.cpp:2332-2353)
- BuildOrthonormalBasisFromW      (win32_main.cpp:2288-2305)
- PdfValue<COSINE_PDF>            (win32_main.cpp:290-299)
- PdfValue<TO_SPHERE_PDF>         (win32_main.cpp:324-340)
- PdfValueQuad                    (win32_main.cpp:301-322, defined but unused
                                   in the reference; provided for parity)
- BurleyParameterization          (win32_main.cpp:2252-2254)

All functions take uniforms explicitly (counter-based PRNG, utils/prng.py)
instead of pulling from a global generator.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..utils.vec import (
    Vec3, cross, dot, magnitude, magnitude_squared, normalize, where,
)

PI = 3.14159265358979323846264338327


def burley_alpha2(roughness: jnp.ndarray) -> jnp.ndarray:
    """Disney/Burley remap: a2 = roughness^4 (win32_main.cpp:2252-2254)."""
    r2 = roughness * roughness
    return r2 * r2


def cosine_hemisphere(u1: jnp.ndarray, u2: jnp.ndarray) -> Vec3:
    """Cosine-weighted hemisphere sample in tangent space, p(dir)=cos(theta)/pi
    (win32_main.cpp:2258-2268). Returns a unit vector with z >= 0."""
    phi = 2.0 * PI * u1
    sq = jnp.sqrt(u2)
    return Vec3(jnp.cos(phi) * sq, jnp.sin(phi) * sq, jnp.sqrt(1.0 - u2))


def ggx_half_vector(u1: jnp.ndarray, u2: jnp.ndarray, roughness: jnp.ndarray) -> Vec3:
    """GGX-distributed half vector in tangent space (win32_main.cpp:2271-2285).

    theta = acos(sqrt((1-z2)/(1+z2*(a2-1)))); the GGX D term later cancels
    against this sampling PDF (the 1/p(x) is baked into BrdfSpecular,
    win32_main.cpp:767-770).
    """
    a2 = burley_alpha2(roughness)
    phi = 2.0 * PI * u1
    cos_theta = jnp.sqrt((1.0 - u2) / (1.0 + u2 * (a2 - 1.0)))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    return Vec3(jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta)


def to_sphere(
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    sphere_center: Vec3,
    sphere_radius: jnp.ndarray,
    origin: Vec3,
) -> Tuple[Vec3, jnp.ndarray]:
    """Solid-angle sample toward a sphere, in the frame whose +z axis points
    at the sphere center (win32_main.cpp:2332-2353).

    Returns ``(dir, valid)``. The reference returns V3(0,0,0) when ``origin``
    is inside the sphere (term1 < 0); we return ``valid=False`` for those
    lanes (the integrator kills them — the reference instead retries the
    whole estimator draw, win32_main.cpp:700).
    """
    dist2 = magnitude_squared(origin - sphere_center)
    term1 = 1.0 - sphere_radius * sphere_radius / dist2
    valid = term1 >= 0.0
    term1c = jnp.maximum(term1, 0.0)
    z = 1.0 + u2 * (jnp.sqrt(term1c) - 1.0)
    term2 = jnp.maximum(0.0, 1.0 - z * z)
    phi = 2.0 * PI * u1
    s = jnp.sqrt(term2)
    return Vec3(jnp.cos(phi) * s, jnp.sin(phi) * s, z), valid


def orthonormal_basis(w: Vec3) -> Tuple[Vec3, Vec3, Vec3]:
    """Build (tangentX, tangentY, tangentZ=unit w) from a direction
    (win32_main.cpp:2288-2305, after RTRoYL).

    a = (0,1,0) if |unit_w.x| > 0.9 else (1,0,0);
    v = normalize(cross(unit_w, a)); u = cross(unit_w, v).
    Returned as (u, v, unit_w) to mirror the reference's (a=x, b=y, c=z).
    """
    unit_w = normalize(w)
    w_is_x = jnp.abs(unit_w.x) > 0.9
    shape = jnp.shape(unit_w.x)
    a = where(
        w_is_x,
        Vec3(jnp.zeros(shape), jnp.ones(shape), jnp.zeros(shape)),
        Vec3(jnp.ones(shape), jnp.zeros(shape), jnp.zeros(shape)),
    )
    v = normalize(cross(unit_w, a))
    u = cross(unit_w, v)
    return u, v, unit_w


def from_tangent(t: Vec3, tx: Vec3, ty: Vec3, tz: Vec3) -> Vec3:
    """Express a tangent-space vector in world space: t.x*tx + t.y*ty + t.z*tz."""
    return Vec3(
        t.x * tx.x + t.y * ty.x + t.z * tz.x,
        t.x * tx.y + t.y * ty.y + t.z * tz.y,
        t.x * tx.z + t.y * ty.z + t.z * tz.z,
    )


def pdf_cosine(d: Vec3) -> jnp.ndarray:
    """Cosine-hemisphere PDF of a *tangent-space* direction:
    max(0, dot(+z, d)) / pi (win32_main.cpp:290-299)."""
    return jnp.maximum(0.0, d.z) / PI


def pdf_to_sphere(
    hit: jnp.ndarray,
    sphere_center: Vec3,
    sphere_radius: jnp.ndarray,
    origin: Vec3,
) -> jnp.ndarray:
    """Solid-angle PDF of a direction toward a sphere (win32_main.cpp:324-340).

    ``hit`` is a boolean: whether the ray (origin, dir) actually intersects the
    sphere at t > MIN_HIT_DISTANCE (computed by the caller with the shared
    sphere intersector so semantics match RaySphereIntersect exactly).
    Returns 0 where it does not.
    """
    dist2 = magnitude_squared(origin - sphere_center)
    inner = jnp.maximum(0.0, 1.0 - sphere_radius * sphere_radius / dist2)
    cos_theta_max = jnp.sqrt(inner)
    solid_angle = 2.0 * PI * (1.0 - cos_theta_max)
    pdf = jnp.where(solid_angle > 0.0, 1.0 / jnp.maximum(solid_angle, 1e-30), 0.0)
    return jnp.where(hit, pdf, 0.0)


def pdf_quad(
    t: jnp.ndarray,
    hit: jnp.ndarray,
    d: Vec3,
    qu: Vec3,
    qv: Vec3,
) -> jnp.ndarray:
    """Area->solid-angle PDF for a quad light: distance^2 / (cos * area)
    with distance = t*|d|, cos the angle between the ray and the quad
    NORMAL, area = |cross(u,v)|.

    Realizes the reference's dead PdfValueQuad (win32_main.cpp:301-322 —
    defined, never called) with one fix: the reference computes its cosine
    as |dot(dir, N)|/|dir| with N = cross(u,v) UNNORMALIZED, i.e.
    cos*area, which makes the result dist^2/(cos*area^2) — off by a
    factor of area. Dead there, that latent bug never fired; used live as
    an NEE mixture weight it under-weights quad samples by `area` and the
    estimator explodes (measured: 7300x-bright world 6). The cosine here
    divides by |N| as the area->solid-angle Jacobian requires.
    """
    n = cross(qu, qv)
    area = magnitude(n)
    mag = magnitude(d)
    dist2 = t * t * mag * mag
    cosine = jnp.abs(dot(d, n)) / jnp.maximum(mag * area, 1e-30)
    denom = cosine * area
    pdf = jnp.where(denom > 0.0, dist2 / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.where(hit, pdf, 0.0)


def sample_to_quad(
    u1: jnp.ndarray,
    u2: jnp.ndarray,
    qp: Vec3,
    qu: Vec3,
    qv: Vec3,
    origin: Vec3,
) -> Vec3:
    """Direction (UNNORMALIZED) from ``origin`` to a uniform point on the
    quad: qp + u1*qu + u2*qv - origin. The area-sampling counterpart the
    reference's PdfValueQuad (win32_main.cpp:301-322) was written for but
    never got (RandomToSphere has one, :342-365; the quad twin is on the
    unfinished side of that cleanup TODO)."""
    return Vec3(
        qp.x + u1 * qu.x + u2 * qv.x - origin.x,
        qp.y + u1 * qu.y + u2 * qv.y - origin.y,
        qp.z + u1 * qu.z + u2 * qv.z - origin.z,
    )


def henyey_greenstein_sample(u1: jnp.ndarray, u2: jnp.ndarray,
                             g: float) -> Vec3:
    """Henyey-Greenstein phase-function sample in tangent space, +z =
    the propagation direction (forward scattering at g > 0). Inverse-CDF:
    cos_theta = (1 + g^2 - s^2) / (2g) with s = (1-g^2)/(1 - g + 2g*u).
    ``g`` is a static scene constant; |g| < 1e-3 compiles the exact
    isotropic form (cos_theta = 1 - 2u) instead of the 1/(2g) expression.
    Part of the volumetric transport extension (the reference's unrealized
    '"god rays" and fog, both via volumetric light transport' TODO,
    win32_main.cpp:159)."""
    if abs(g) < 1e-3:
        cos_t = 1.0 - 2.0 * u1
    else:
        s = (1.0 - g * g) / (1.0 - g + 2.0 * g * u1)
        cos_t = (1.0 + g * g - s * s) / (2.0 * g)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * PI * u2
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), cos_t)


def pdf_henyey_greenstein(cos_theta: jnp.ndarray, g: float) -> jnp.ndarray:
    """HG phase function value == its solid-angle pdf (normalized):
    (1-g^2) / (4 pi (1 + g^2 - 2 g cos_theta)^{3/2}); 1/(4 pi) at g = 0."""
    if abs(g) < 1e-3:
        return jnp.full(jnp.shape(cos_theta), 1.0 / (4.0 * PI))
    denom = jnp.maximum(1.0 + g * g - 2.0 * g * cos_theta, 1e-12)
    inv = 1.0 / jnp.sqrt(denom)
    return (1.0 - g * g) * inv * inv * inv / (4.0 * PI)


def uniform_hemisphere(u1: jnp.ndarray, u2: jnp.ndarray) -> Vec3:
    """Uniform hemisphere sample in tangent space, p = 1/(2 pi). The
    reference declares RandomDirectionHemisphere (win32_main.cpp:56) but
    never defines or calls it — implemented here so the uniform-sampling
    mode in its TODO list ("uniform sampling in hemisphere", :167) exists."""
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)
