"""Renderer-level behavior: debug kinds, checkpoint/resume, compare tool."""

import os

import numpy as np
import pytest

from pathtracer_tpu import RenderConfig, finalize_world, render_image
from pathtracer_tpu.compare import percentage_similarity, rmse as cmp_rmse
from pathtracer_tpu.io.bmp import write_bmp
from pathtracer_tpu.render.integrator import (
    BOUNCE_COUNT, PRIMARY_RAY_NORMALS, TERMINATION_CONDITION, VARIANCE,
)
from pathtracer_tpu.render.progressive import (
    load_checkpoint, samples_done, save_checkpoint,
)
from pathtracer_tpu.scene.schema import MAX_BOUNCE_COUNT, WORLD_CORNELL_BOX


@pytest.fixture(scope="module")
def cornell():
    return finalize_world(WORLD_CORNELL_BOX, 24, 16)


class TestDebugKinds:
    def test_primary_ray_normals(self, cornell):
        scene, cam = cornell
        cfg = RenderConfig(24, 16, pp=1, debug_kind=PRIMARY_RAY_NORMALS)
        img, _, _ = render_image(scene, cam, cfg)
        img = np.asarray(img)
        # normals encode to [0,1]; rays missing everything give (0.5,0.5,0.5)
        assert img.min() >= -1e-6 and img.max() <= 1.0 + 1e-6
        # [8,12] is dead center = the light sphere, facing the camera (-y ish)
        assert img[8, 12][1] < 0.15
        # right of the sphere hits the back wall: normal (0,-1,0) -> (0.5,0,0.5)
        np.testing.assert_allclose(img[8, 14], [0.5, 0.0, 0.5], atol=1e-5)
        # further right is the green wall: normal (-1,0,0) -> (0, 0.5, 0.5)
        np.testing.assert_allclose(img[8, 17], [0.0, 0.5, 0.5], atol=1e-5)

    def test_bounce_count(self, cornell):
        scene, cam = cornell
        cfg = RenderConfig(24, 16, pp=1, debug_kind=BOUNCE_COUNT)
        img, _, _ = render_image(scene, cam, cfg)
        img = np.asarray(img)
        # quantized to k/MAX_BOUNCE_COUNT, k in 1..4
        vals = np.unique(np.round(img * MAX_BOUNCE_COUNT).astype(int))
        assert vals.min() >= 1 and vals.max() <= MAX_BOUNCE_COUNT
        np.testing.assert_allclose(img * MAX_BOUNCE_COUNT,
                                   np.round(img * MAX_BOUNCE_COUNT), atol=1e-4)

    def test_termination_condition_colors(self, cornell):
        scene, cam = cornell
        cfg = RenderConfig(24, 16, pp=1, debug_kind=TERMINATION_CONDITION)
        img, _, _ = render_image(scene, cam, cfg)
        img = np.asarray(img).reshape(-1, 3)
        allowed = {(0, 0, 0), (0, 0, 1), (0, 1, 0), (1, 0, 0), (1, 1, 0)}
        got = {tuple(px) for px in np.round(img).astype(int)}
        assert got <= allowed, got
        assert (1, 0, 0) in got or (0, 1, 0) in got  # some terminal/light paths

    def test_variance_nonnegative(self, cornell):
        scene, cam = cornell
        cfg = RenderConfig(24, 16, pp=2, debug_kind=VARIANCE)
        img, _, _ = render_image(scene, cam, cfg)
        assert float(np.asarray(img).min()) >= -1e-4


class TestCheckpoint:
    def test_resume_is_exact(self, cornell, tmp_path):
        scene, cam = cornell
        cfg = RenderConfig(24, 16, pp=3, seed=0)
        # full render in one go
        img_full, _, _ = render_image(scene, cam, cfg)
        # render 4 samples, checkpoint, reload, finish
        path = str(tmp_path / "accum.npz")
        _, _, st = render_image(scene, cam, cfg, chunk_samples=4,
                                progress_cb=lambda s, t, state:
                                    save_checkpoint(path, state) if s == 4 else None)
        loaded, found = load_checkpoint(path, 24 * 16)
        assert found and samples_done(loaded) == 4
        img_resumed, _, _ = render_image(scene, cam, cfg, state=loaded)
        np.testing.assert_array_equal(np.asarray(img_full),
                                      np.asarray(img_resumed))

    def test_missing_checkpoint_fresh(self, tmp_path):
        st, found = load_checkpoint(str(tmp_path / "nope.npz"), 10)
        assert not found and samples_done(st) == 0


class TestCompareTool:
    def test_similarity_and_rmse(self, rng):
        a = rng.randint(0, 255, (8, 8, 4), dtype=np.uint8)
        assert percentage_similarity(a, a) == 100.0
        assert cmp_rmse(a, a) == 0.0
        b = a.copy()
        b[..., :3] = np.clip(b[..., :3].astype(int) + 10, 0, 255).astype(np.uint8)
        assert percentage_similarity(a, b) < 100.0
        assert cmp_rmse(a, b) > 0.0

    def test_legacy_bug_semantics(self):
        # reference Magnitude ignores red, counts alpha twice
        # (image_compare.c:121-124): a pure-red difference is invisible
        a = np.zeros((2, 2, 4), np.uint8)
        b = a.copy()
        b[..., 0] = 255  # red-only difference
        assert percentage_similarity(a, b, legacy=True) == 100.0
        assert percentage_similarity(a, b, legacy=False) < 100.0

    def test_cli_roundtrip(self, tmp_path, rng):
        from pathtracer_tpu.compare import main
        img = rng.randint(0, 2**32, (4, 6), dtype=np.uint64).astype(np.uint32)
        p1 = str(tmp_path / "a.bmp")
        p2 = str(tmp_path / "b.bmp")
        write_bmp(p1, img)
        write_bmp(p2, img)
        assert main([p1, p2, "--threshold", "0.001"]) == 0
        assert main([p1, "/nope.bmp"]) == -1


class TestProfiling:
    def test_phase_timer_and_metrics(self):
        import time as _time
        from pathtracer_tpu.utils.profiling import PhaseTimer, RenderMetrics
        t = PhaseTimer()
        with t.phase("a"):
            _time.sleep(0.01)
        assert t.phases["a"] >= 0.01
        assert "a=" in t.report()
        m = RenderMetrics(rays_cast=2e6, wall_seconds=2.0, width=10, height=10,
                          spp=4)
        assert abs(m.mrays_per_sec - 1.0) < 1e-9
        line = m.json_line(vs_baseline_target=500.0)
        import json
        d = json.loads(line)
        assert d["metric"] == "Mrays/sec" and d["unit"] == "Mrays/s"
        assert abs(d["vs_baseline"] - 1.0 / 500.0) < 1e-6

    def test_profiler_trace_capture(self, tmp_path):
        import os
        import jax.numpy as jnp
        from pathtracer_tpu.utils.profiling import profiler_trace
        d = str(tmp_path / "trace")
        with profiler_trace(d):
            jnp.zeros((8,)).block_until_ready()
        assert os.path.isdir(d) and len(list(os.walk(d))) > 0
        with profiler_trace(None):  # no-op path
            pass


class TestExposure:
    def test_exposure_scales_pretonemap(self, cornell):
        import dataclasses
        from pathtracer_tpu.render.renderer import finalize as _finalize
        from pathtracer_tpu.io.bmp import packed_to_rgb
        scene, cam = cornell
        cfg = RenderConfig(24, 16, pp=1, seed=0)
        _, _, st = render_image(scene, cam, cfg)
        dark = packed_to_rgb(np.asarray(
            _finalize(st, dataclasses.replace(cfg, exposure=0.25))))
        base = packed_to_rgb(np.asarray(_finalize(st, cfg)))
        bright = packed_to_rgb(np.asarray(
            _finalize(st, dataclasses.replace(cfg, exposure=4.0))))
        assert dark.astype(int).sum() < base.astype(int).sum() < bright.astype(int).sum()
        # exposure 1.0 is bit-identical to the reference pipeline
        again = packed_to_rgb(np.asarray(
            _finalize(st, dataclasses.replace(cfg, exposure=1.0))))
        np.testing.assert_array_equal(base, again)


class TestAdaptiveLiveChunking:
    def test_adaptive_chunking_is_exact(self, cornell):
        """--live's cadence adaptation (renderer.render_image
        adapt_chunk_s) halves the chunk when a steady-state chunk
        overshoots the target, which must not change results: chunking is
        exact (same samples, same accumulation order). A vanishing target
        forces halving to 1-sample chunks after the first (compile-
        tainted, unadapted) chunk."""
        scene, cam = cornell
        cfg = RenderConfig(width=16, height=12, pp=3, seed=0)  # 9 spp
        full, _, _ = render_image(scene, cam, cfg)
        calls = []
        adap, _, st = render_image(
            scene, cam, cfg, chunk_samples=4,
            progress_cb=lambda s, t, _st: calls.append(s),
            adapt_chunk_s=1e-9)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(adap))
        # chunk 4 (first, unadapted), chunk 4 (adapts 4->2->1), chunk 1
        assert calls == [4, 8, 9]
        assert int(np.asarray(st.samples_done)) == cfg.spp
