"""Path-regeneration wavefront driver == unrolled driver, bit for bit."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu import RenderConfig, finalize_world, render_image
from pathtracer_tpu.scene.schema import (
    WORLD_CORNELL_BOX, WORLD_DEFAULT, WORLD_RAYTRACING_ONE_WEEKEND,
)


def _render(kind, mode, w=20, h=12, pp=3, rr=False):
    scene, cam = finalize_world(kind, w, h)
    cfg = RenderConfig(width=w, height=h, pp=pp, seed=0, mode=mode,
                       use_russian_roulette=rr)
    img, _, state = render_image(scene, cam, cfg)
    return np.asarray(img), state


class TestWavefrontEquivalence:
    def test_cornell_identical(self):
        a, sa = _render(WORLD_CORNELL_BOX, "unrolled")
        b, sb = _render(WORLD_CORNELL_BOX, "wavefront")
        np.testing.assert_array_equal(a, b)
        # identical work too: every path traces the same segments
        assert float(sa.rays_cast) == float(sb.rays_cast)

    def test_textured_world_matches(self):
        # The two drivers are different XLA programs, so FMA/fusion choices
        # differ by ulps; texel selection amplifies a few lanes (same effect
        # as the golden-gate boundary flips). Median must be ~exact.
        a, _ = _render(WORLD_DEFAULT, "unrolled", w=12, h=8, pp=2)
        b, _ = _render(WORLD_DEFAULT, "wavefront", w=12, h=8, pp=2)
        d = np.abs(a - b).max(axis=-1)
        assert np.median(d) == 0.0
        assert d.max() < 1e-3

    def test_thin_lens_matches(self):
        a, _ = _render(WORLD_RAYTRACING_ONE_WEEKEND, "unrolled", w=10, h=8, pp=2)
        b, _ = _render(WORLD_RAYTRACING_ONE_WEEKEND, "wavefront", w=10, h=8, pp=2)
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)

    def test_auto_picks_wavefront_for_regular(self):
        assert RenderConfig(mode="auto").resolved_mode() == "wavefront"
        assert RenderConfig(mode="auto", debug_kind="bounce_count").resolved_mode() == "unrolled"


class TestRussianRoulette:
    def test_rr_identical_across_drivers(self):
        a, _ = _render(WORLD_CORNELL_BOX, "unrolled", rr=True)
        b, _ = _render(WORLD_CORNELL_BOX, "wavefront", rr=True)
        np.testing.assert_array_equal(a, b)

    def test_rr_reduces_work_and_stays_unbiased(self):
        scene, cam = finalize_world(WORLD_CORNELL_BOX, 16, 12)
        base = RenderConfig(16, 12, pp=6, seed=0)
        rr = RenderConfig(16, 12, pp=6, seed=0, use_russian_roulette=True)
        img0, _, st0 = render_image(scene, cam, base)
        img1, _, st1 = render_image(scene, cam, rr)
        assert float(st1.rays_cast) < float(st0.rays_cast)
        a, b = np.asarray(img0), np.asarray(img1)
        # unbiased: means agree within Monte-Carlo noise
        assert abs(a.mean() - b.mean()) < 0.05 * max(a.mean(), 1e-6)
