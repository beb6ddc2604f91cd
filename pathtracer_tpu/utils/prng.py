"""Counter-based PRNG discipline for the path tracer.

The reference uses a single global Mersenne-Twister shared (unsynchronized)
across all render threads (reference include/ray_math.hpp:245-248) — a data
race it documents itself. The TPU build replaces it with a *pure counter-based
scheme*: every random number is a deterministic function of

    (seed, pixel_index, sample_index, stream_tag, bounce, slot)

built from threefry ``jax.random.fold_in`` chains. Consequences:

- no shared state, so the renderer is trivially SPMD over any device mesh;
- values are independent of batch shape / tiling / sharding, so a multi-chip
  render is bit-identical to single-chip;
- the CPU scalar oracle (pathtracer_tpu/reference) consumes the *same*
  stream, which is what lets golden tests gate at RMSE ~ float32 noise
  instead of Monte-Carlo noise.

Slot layout per bounce (BOUNCE_SLOTS uniforms in [0,1)):
    0: estimator coin    (bSpecular = u > 0.5, win32_main.cpp:661)
    1: pdf-mixture coin  (bSampleCosine = u > 0.5, win32_main.cpp:678)
    2: direction u1      (phi for cosine/GGX/to-sphere samplers)
    3: direction u2      (radius/theta/z for the samplers)
    4: russian roulette  (reference lists RR as TODO win32_main.cpp:187;
                          north-star requires it)
    5: reserved (refraction)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream tags (fold_in constants). Arbitrary but fixed forever.
TAG_JITTER = 0x4A495454  # "JITT" — sub-pixel jitter
TAG_BOUNCE = 0x424F554E  # "BOUN" — per-bounce estimator draws
TAG_LENS = 0x4C454E53    # "LENS" — thin-lens sensor offsets

BOUNCE_SLOTS = 6


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def path_key(key: jax.Array, pixel_idx: jnp.ndarray, sample_idx) -> jax.Array:
    """Key for one path: fold pixel linear index then sample index.

    ``pixel_idx`` may be an array (vectorized over lanes); fold_in broadcasts.
    """
    k = jax.random.fold_in(key, pixel_idx)
    return jax.random.fold_in(k, sample_idx)


def jitter_uniforms(pkey: jax.Array) -> jnp.ndarray:
    """Two uniforms for stratified sub-pixel jitter (win32_main.cpp:1056-1057)."""
    return jax.random.uniform(jax.random.fold_in(pkey, TAG_JITTER), (2,))


def lens_uniforms(pkey: jax.Array) -> jnp.ndarray:
    """Two uniforms for the thin-lens sensor offset (win32_main.cpp:1116-1119)."""
    return jax.random.uniform(jax.random.fold_in(pkey, TAG_LENS), (2,))


def bounce_uniforms(pkey: jax.Array, bounce) -> jnp.ndarray:
    """BOUNCE_SLOTS uniforms for one bounce of one path."""
    k = jax.random.fold_in(jax.random.fold_in(pkey, TAG_BOUNCE), bounce)
    return jax.random.uniform(k, (BOUNCE_SLOTS,))


# --- vectorized variants used by the wavefront renderer --------------------

def path_keys(key: jax.Array, pixel_idx: jnp.ndarray, sample_idx: jnp.ndarray):
    """Vectorized path keys for arrays of pixel/sample indices (same shape)."""
    fold = jax.vmap(jax.random.fold_in)
    ks = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pixel_idx.ravel())
    ks = fold(ks, jnp.broadcast_to(sample_idx, pixel_idx.shape).ravel())
    return ks


def jitter_uniforms_v(pkeys: jax.Array) -> jnp.ndarray:
    """(N, 2) jitter uniforms for a batch of path keys."""
    fold = jax.vmap(jax.random.fold_in, in_axes=(0, None))
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(fold(pkeys, TAG_JITTER))


def lens_uniforms_v(pkeys: jax.Array) -> jnp.ndarray:
    fold = jax.vmap(jax.random.fold_in, in_axes=(0, None))
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(fold(pkeys, TAG_LENS))


def bounce_uniforms_v(pkeys: jax.Array, bounce) -> jnp.ndarray:
    """(N, BOUNCE_SLOTS) uniforms for one bounce across a batch of paths."""
    fold = jax.vmap(jax.random.fold_in, in_axes=(0, None))
    ks = fold(fold(pkeys, TAG_BOUNCE), bounce)
    return jax.vmap(lambda k: jax.random.uniform(k, (BOUNCE_SLOTS,)))(ks)
