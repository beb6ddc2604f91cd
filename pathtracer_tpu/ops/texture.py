"""Batched texture sampling (bilinear, wrap) from the device texture stack.

Reference semantics:
- SampleTexture (win32_main.cpp:1680-1709): uv in texel units; abs(uv);
  integer truncation; fractional weights clamped to [0,1]; wraparound on
  both axes; bilinear blend.
- BespokeSampleTexture (win32_main.cpp:1675-1678): world-space planar
  mapping uv_texels = (u * width * 0.5, v * height * 0.5) — the "bespoke"
  scale used by every material texture fetch in the reference
  (win32_main.cpp:613,621,631,640,1604).

The device texture stack is a padded (K, Hmax, Wmax) SoA (Scene.tex_data)
with true extents in tex_w/tex_h; per-lane texture index selects the layer.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.schema import Scene
from ..utils.vec import Vec3


def sample_texture(scene: Scene, layer: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """Bilinear-wrap sample. ``layer`` is the 0-based texture layer per lane,
    (u, v) are texel-space coordinates per lane."""
    w = scene.tex_w[layer]
    h = scene.tex_h[layer]
    u = jnp.abs(u)
    v = jnp.abs(v)
    x1 = u.astype(jnp.int32)
    y1 = v.astype(jnp.int32)
    s = jnp.clip(u - x1.astype(u.dtype), 0.0, 1.0)
    t = jnp.clip(v - y1.astype(v.dtype), 0.0, 1.0)
    x1 = x1 % w
    x2 = (x1 + 1) % w
    y1 = y1 % h
    y2 = (y1 + 1) % h

    def fetch(yy, xx):
        return Vec3(
            scene.tex_data.x[layer, yy, xx],
            scene.tex_data.y[layer, yy, xx],
            scene.tex_data.z[layer, yy, xx],
        )

    c11, c12 = fetch(y1, x1), fetch(y1, x2)
    c21, c22 = fetch(y2, x1), fetch(y2, x2)
    top = Vec3(
        (1 - s) * c11.x + s * c12.x,
        (1 - s) * c11.y + s * c12.y,
        (1 - s) * c11.z + s * c12.z,
    )
    bot = Vec3(
        (1 - s) * c21.x + s * c22.x,
        (1 - s) * c21.y + s * c22.y,
        (1 - s) * c21.z + s * c22.z,
    )
    return Vec3(
        (1 - t) * top.x + t * bot.x,
        (1 - t) * top.y + t * bot.y,
        (1 - t) * top.z + t * bot.z,
    )


def bespoke_sample(scene: Scene, layer: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """BespokeSampleTexture: scale world-plane (u,v) by size/2 then sample."""
    w = scene.tex_w[layer].astype(u.dtype)
    h = scene.tex_h[layer].astype(v.dtype)
    return sample_texture(scene, layer, u * w * 0.5, v * h * 0.5)
