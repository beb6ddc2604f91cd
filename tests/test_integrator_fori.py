"""integrator.trace_fori == integrator.trace (the bounce-loop driver).

trace_fori replaces the Python bounce unroll with lax.fori_loop for the
Pallas lockstep driver (compile-size-bounded: world 1's unrolled kernel
was the tree's biggest Mosaic compile). Per-path arithmetic is the same
expression sequence, so differences between the two jitted graphs are
the usual XLA fusion/fma ulp class — which can flip discrete coins on
isolated lanes (the golden-gate class, CLAUDE.md). Gate like the golden
tests: median exactly 0, bounded outlier fractions, identical path
structure (lane_casts bit-equal).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu import RenderConfig, finalize_world
from pathtracer_tpu.render import integrator as integ
from pathtracer_tpu.render import raygen
from pathtracer_tpu.scene.schema import (
    WORLD_CORNELL_BOX, WORLD_DEFAULT, WORLD_MESH_UV,
)
from pathtracer_tpu.utils import prng


def _trace_pair(kind, rr=False, w=128, h=64):
    scene, camera = finalize_world(kind, w, h)
    pix = jnp.arange(w * h, dtype=jnp.int32)
    half = jnp.full((w * h,), 0.5, jnp.float32)
    o, d = raygen.pinhole_rays(camera, w, h, 1, 0, 0, (half, half), pix)
    stream = prng.PathStream(
        jnp.broadcast_to(jnp.uint32(0), pix.shape),
        pix.astype(jnp.uint32), jnp.zeros(pix.shape, jnp.uint32))
    r1, s1 = jax.jit(lambda: integ.trace(
        scene, o, d, stream, use_russian_roulette=rr))()
    r2, s2 = jax.jit(lambda: integ.trace_fori(
        scene, o, d, stream, use_russian_roulette=rr))()
    a = np.stack([np.asarray(v) for v in (r1.x, r1.y, r1.z)])
    b = np.stack([np.asarray(v) for v in (r2.x, r2.y, r2.z)])
    return a, b, s1, s2


class TestTraceForiEquivalence:
    @pytest.mark.parametrize("kind,rr", [
        (WORLD_CORNELL_BOX, False),
        (WORLD_DEFAULT, False),
        (WORLD_DEFAULT, True),
        # mesh-UV: covers the peeled final bounce's intersect_scene_uv
        # branch (trace_fori.body_last, round 5)
        (WORLD_MESH_UV, False),
    ])
    def test_matches_unrolled(self, kind, rr):
        a, b, s1, s2 = _trace_pair(kind, rr=rr)
        diff = np.abs(a - b)
        assert np.median(diff) == 0.0
        assert (diff > 1e-3).mean() < 0.01, f"{(diff > 1e-3).mean():.4f}"
        assert (diff > 0.1).mean() < 1e-3, f"{(diff > 0.1).mean():.5f}"
        # path structure: the termination coin itself can flip on isolated
        # lanes (measured: 2/8192 on Cornell differ by ONE bounce), so gate
        # the flip fraction, not exact equality
        c1 = np.asarray(s1.lane_casts)
        c2 = np.asarray(s2.lane_casts)
        assert (c1 != c2).mean() < 1e-3, f"{(c1 != c2).mean():.5f}"
        assert np.abs(c1 - c2).max() <= 1.0


class TestKernelBounceFori:
    def test_world1_kernel_fori_vs_xla(self):
        """World 1 through the interpret kernel with the fori driver vs
        the XLA wavefront driver — the same gate as
        test_pallas.test_world1_textured_tolerance (which covers the
        unrolled driver; bounce_fori is a static config field, so the two
        compile as distinct cache entries)."""
        from pathtracer_tpu.render.pallas_backend import (
            BLOCK, render_chunk_pallas,
        )
        from pathtracer_tpu.render.renderer import init_accum, render_chunk

        w, h = 128, BLOCK // 128
        scene, cam = finalize_world(WORLD_DEFAULT, w, h)
        key = prng.base_key(0)
        n = w * h
        cfg = RenderConfig(w, h, pp=2, seed=0, bounce_fori=True)
        ref = render_chunk(scene, cam, cfg, key, jnp.int32(0), 2,
                           init_accum(n))
        pal = render_chunk_pallas(scene, cam, cfg, key, jnp.int32(0), 2,
                                  init_accum(n),
                                  jnp.arange(n, dtype=jnp.int32),
                                  interpret=True)
        a = np.asarray(ref.sum.x)
        b = np.asarray(pal.sum.x)
        bit_equal = np.mean(a == b)
        assert bit_equal > 0.8, f"only {bit_equal:.2%} bit-equal"
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(ref.count),
                                      np.asarray(pal.count))
        assert int(pal.samples_done) == 2
