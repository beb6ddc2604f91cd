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
    WORLD_BRDF_TEST, WORLD_CORNELL_BOX, WORLD_CORNELL_QUAD, WORLD_DEFAULT,
    WORLD_MARIO,
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

    def test_textured_combined_supported(self):
        # world 1's canonical 4-map set rides the windowed VMEM fetch
        cfg = RenderConfig()
        s1, _ = finalize_world(WORLD_DEFAULT, 8, 8)
        assert s1.tex_combined and supports(s1, cfg)

    def test_unsupported_scenes(self):
        cfg = RenderConfig()
        # a NON-combined texture stack (e.g. mixed sizes) stays on XLA
        s1, _ = finalize_world(WORLD_DEFAULT, 8, 8)
        s1nc = s1.replace(tex_combined=False)
        assert not supports(s1nc, cfg)
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

    def test_cornell_quad_light_tolerance(self):
        """World 6 (quad AREA light) through the kernel.

        Unlike world 3, the quad-light NEE branch (extra dot products and
        the PdfValueQuad division) lands on different XLA:CPU fma
        contractions between the jit driver and the interpret kernel, so a
        few hundred lanes differ by float32 ulps and ~1 per 4096 paths
        flips a light-quad boundary (the same class as the golden-gate
        flips; the compiled-chip gate is bench.py --verify world 6). Gate
        robustly: most lanes bit-equal, flips bounded.
        """
        w, h = 128, BLOCK // 128
        ref, pal = _run_both(WORLD_CORNELL_QUAD, w, h, 1, 2)
        a = np.asarray(ref.sum.x)
        b = np.asarray(pal.sum.x)
        d = np.abs(a - b)
        assert (a == b).mean() > 0.5, f"only {(a == b).mean():.2%} bit-equal"
        assert (d > 1e-2).mean() <= 2e-3, f"flips {(d > 1e-2).mean():.4f}"
        np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(pal.count))
        assert int(pal.samples_done) == 2

    def test_padding_partial_block(self):
        # 100x7 = 700 pixels: padded to one block; padding trimmed
        ref, pal = _run_both(WORLD_CORNELL_BOX, 100, 7, 1, 1)
        np.testing.assert_array_equal(np.asarray(ref.sum.y), np.asarray(pal.sum.y))
        assert float(ref.rays_cast) == float(pal.rays_cast)

    def test_multi_block(self):
        ref, pal = _run_both(WORLD_CORNELL_BOX, 128, 2 * (BLOCK // 128), 1, 1)
        np.testing.assert_array_equal(np.asarray(ref.sum.x), np.asarray(pal.sum.x))

    def test_world1_textured_tolerance(self):
        """World 1 (textured) through the windowed VMEM fetch.

        The fetch itself is bit-identical to the XLA flat gathers (asserted
        word-level below; also verified bit-exact COMPILED on the real chip
        against a pure-numpy reference). Interpret mode compiles the kernel
        body through XLA:CPU, whose fma contraction differs from the XLA
        driver's graph — measured profile on jax 0.9.0: 92.5% bit-equal,
        max |diff| 1.9e-6. (The round-2-era XLA:CPU additionally
        miscompiled the windowed loop to a NEIGHBORING texel ~1e-2 on a
        few lanes; resolved by the jax upgrade — re-test record in
        experiments/interpret_miscompile_repro.py. If this gate ever
        trips at ~1e-2 after a jax bump, that bug is back.) The compiled
        gate on real TPU is bench.py --verify.
        """
        w, h = 128, BLOCK // 128
        ref, pal = _run_both(WORLD_DEFAULT, w, h, 2, 2)
        a = np.asarray(ref.sum.x)
        b = np.asarray(pal.sum.x)
        bit_equal = np.mean(a == b)
        assert bit_equal > 0.8, f"only {bit_equal:.2%} bit-equal"
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(pal.count))
        assert int(pal.samples_done) == 2


class TestWindowedFetchExact:
    def test_windowed_equals_flat(self):
        """ops/texture.bespoke_sample_combined_windowed reproduces the XLA
        flat-gather fetch bit-for-bit for every needed lane (the while-loop
        window iteration finds the same packed words; the blend is shared
        code). Runs the windowed version inside an interpret-mode kernel —
        interpret still lowers through Mosaic, so this also locks in that
        the op set is Mosaic-lowerable."""
        import jax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from pathtracer_tpu.ops import texture as tex

        scene, _ = finalize_world(WORLD_DEFAULT, 8, 8)
        R, C = 8, 128
        rs = np.random.RandomState(7)
        u = jnp.asarray(rs.uniform(-130, 130, (R, C)), jnp.float32)
        v = jnp.asarray(rs.uniform(-130, 130, (R, C)), jnp.float32)
        needs = jnp.asarray(rs.rand(R, C) < 0.8)

        def kernel(u_ref, v_ref, n_ref, tab_ref, *o_refs):
            wa, wb, s, t = tex.bespoke_sample_combined_windowed(
                scene, tab_ref, u_ref[:], v_ref[:], n_ref[:] != 0,
                return_words=True)
            for r, val in zip(o_refs, list(wa) + list(wb)):
                r[:] = val

        outs = pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((R, C), jnp.int32)] * 8,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            interpret=True,
        )(u, v, needs.astype(jnp.int32), scene.tex_tile)

        # expected corner words straight from the flat combined arrays
        from pathtracer_tpu.ops.texture import _combined_coords
        x1, y1, x2, y2, _, _ = _combined_coords(
            scene, u.reshape(-1), v.reshape(-1))
        W = scene.tex_comb_w
        A = np.asarray(scene.tex_comb_a)
        B = np.asarray(scene.tex_comb_b)
        x1, y1, x2, y2 = (np.asarray(a) for a in (x1, y1, x2, y2))
        want = [A[y1 * W + x1], A[y1 * W + x2], A[y2 * W + x1], A[y2 * W + x2],
                B[y1 * W + x1], B[y1 * W + x2], B[y2 * W + x1], B[y2 * W + x2]]
        mask = np.asarray(needs).reshape(-1)
        for got, w_ in zip(outs, want):
            np.testing.assert_array_equal(
                np.asarray(got).reshape(-1)[mask], w_[mask])
