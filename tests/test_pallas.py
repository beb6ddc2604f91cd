"""Fused Pallas kernel == XLA wavefront driver (interpret mode on CPU).

On real TPUs Mosaic's FMA/rounding choices differ from XLA by ulps (one
boundary flip per ~10k paths, same class as the golden-gate flips); in
interpret mode the kernel runs the identical jnp ops and matches bit for
bit. Both are covered: interpret equality here, compiled tolerance on TPU
via bench/verify runs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu import RenderConfig, finalize_world
from pathtracer_tpu.render.pallas_backend import (
    BLOCK, render_chunk_pallas, supports,
)
from pathtracer_tpu.render.renderer import init_accum, render_chunk
from pathtracer_tpu.scene.schema import (
    WORLD_BRDF_TEST, WORLD_CORNELL_BOX, WORLD_DEFAULT, WORLD_MARIO,
)
from pathtracer_tpu.utils import prng


def _run_both(kind, w, h, pp, n_samples):
    scene, cam = finalize_world(kind, w, h)
    cfg = RenderConfig(w, h, pp=pp, seed=0)
    key = prng.base_key(0)
    n = w * h
    ref = render_chunk(scene, cam, cfg, key, jnp.int32(0), n_samples,
                       init_accum(n))
    pal = render_chunk_pallas(scene, cam, cfg, key, jnp.int32(0), n_samples,
                              init_accum(n), jnp.arange(n, dtype=jnp.int32),
                              interpret=True)
    return ref, pal


class TestSupports:
    def test_supported_scenes(self):
        cfg = RenderConfig()
        s3, _ = finalize_world(WORLD_CORNELL_BOX, 8, 8)
        s2, _ = finalize_world(WORLD_BRDF_TEST, 8, 8)
        assert supports(s3, cfg) and supports(s2, cfg)

    def test_unsupported_scenes(self):
        cfg = RenderConfig()
        s1, _ = finalize_world(WORLD_DEFAULT, 8, 8)   # textures -> XLA path
        assert not supports(s1, cfg)
        s3, _ = finalize_world(WORLD_CORNELL_BOX, 8, 8)
        assert not supports(s3, RenderConfig(debug_kind="bounce_count"))
        # grid-traversal scenes fall back (the kernel uses brute force)
        s5g, _ = finalize_world(WORLD_MARIO, 8, 8, use_grid=True)
        assert not supports(s5g, cfg)

    def test_supported_big_tables(self):
        # worlds 4 and 5 unroll inside the kernel (494 spheres / 752 tris)
        from pathtracer_tpu.scene.schema import WORLD_RAYTRACING_ONE_WEEKEND
        cfg = RenderConfig()
        s4, _ = finalize_world(WORLD_RAYTRACING_ONE_WEEKEND, 8, 8)
        assert supports(s4, cfg)
        s5, _ = finalize_world(WORLD_MARIO, 8, 8)
        assert supports(s5, cfg)


class TestInterpretEquality:
    def test_cornell_bit_exact(self):
        # exactly one block
        w, h = 128, BLOCK // 128
        ref, pal = _run_both(WORLD_CORNELL_BOX, w, h, 1, 2)
        np.testing.assert_array_equal(np.asarray(ref.sum.x), np.asarray(pal.sum.x))
        np.testing.assert_array_equal(np.asarray(ref.sum.z), np.asarray(pal.sum.z))
        np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(pal.count))
        assert float(ref.rays_cast) == float(pal.rays_cast)
        assert int(pal.samples_done) == 2

    def test_padding_partial_block(self):
        # 100x7 = 700 pixels: padded to one block; padding trimmed
        ref, pal = _run_both(WORLD_CORNELL_BOX, 100, 7, 1, 1)
        np.testing.assert_array_equal(np.asarray(ref.sum.y), np.asarray(pal.sum.y))
        assert float(ref.rays_cast) == float(pal.rays_cast)

    def test_multi_block(self):
        ref, pal = _run_both(WORLD_CORNELL_BOX, 128, 2 * (BLOCK // 128), 1, 1)
        np.testing.assert_array_equal(np.asarray(ref.sum.x), np.asarray(pal.sum.x))
