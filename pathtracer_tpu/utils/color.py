"""Color pipeline: exact linear->sRGB transfer, ACES tonemap, BGRA packing.

Mirrors the reference semantics exactly so output bytes match:
- LinearToSRGB: exact piecewise transfer (reference include/ray_math.hpp:320-332)
- TonemapPass: ACES approximation by Krzysztof Narkowicz
  (reference src/win32_main.cpp:1663-1673)
- BGRAPack4x8: (a<<24)|(r<<16)|(g<<8)|b with C float->uint truncation
  (reference include/ray_math.hpp:196-202, usage win32_main.cpp:1175-1181)
"""

from __future__ import annotations

import jax.numpy as jnp

from .vec import Vec3, clamp, hadamard, hadamard_div, splat


def linear_to_srgb(L: jnp.ndarray) -> jnp.ndarray:
    """Exact piecewise linear->sRGB (ray_math.hpp:320-332).

    Clamps to [0, 1] first, then S = 12.92*L below the knee (0.0031308) and
    1.055*L^(1/2.4) - 0.055 above it.
    """
    L = jnp.clip(L, 0.0, 1.0)
    lin = L * 12.92
    # Guard pow against 0 (0**x is fine for x>0 but keep gradients clean).
    gam = 1.055 * jnp.power(jnp.maximum(L, 1e-30), 1.0 / 2.4) - 0.055
    return jnp.where(L > 0.0031308, gam, lin)


def tonemap_aces(color: Vec3) -> Vec3:
    """ACES filmic approximation, Narkowicz constants (win32_main.cpp:1663-1673).

    color = clamp( (c*(a*c+b)) / (e + c*(c*c+d)), 0, 1 ) with
    a=2.51 b=0.03 c=2.43 d=0.59 e=0.4 (note the reference swaps the usual
    denominator constant order: denominator is e + c*(2.43*c + 0.59)).
    """
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.4
    shape = jnp.shape(color.x)
    num = hadamard(color, color * a + splat((b, b, b), shape))
    den = splat((e, e, e), shape) + hadamard(color, color * c + splat((d, d, d), shape))
    mapped = hadamard_div(num, den)
    return clamp(mapped, splat((0.0, 0.0, 0.0), shape), splat((1.0, 1.0, 1.0), shape))


def bgra_pack(color: Vec3) -> jnp.ndarray:
    """Convert linear radiance (already tonemapped) to packed 32-bit BGRA.

    Matches win32_main.cpp:1175-1181: components scaled by 255 after sRGB,
    truncated (C float->unsigned cast), packed (a<<24)|(r<<16)|(g<<8)|b with
    alpha = 255.  Returns uint32 array of the batch shape.
    """
    r = (255.0 * linear_to_srgb(color.x)).astype(jnp.uint32)
    g = (255.0 * linear_to_srgb(color.y)).astype(jnp.uint32)
    b = (255.0 * linear_to_srgb(color.z)).astype(jnp.uint32)
    a = jnp.full(jnp.shape(color.x), 255, jnp.uint32)
    return (a << 24) | (r << 16) | (g << 8) | b
