"""A-trous denoiser (render/denoise.py — the reference's 'denoising'
TODO, win32_main.cpp:184): synthetic noise-vs-edge behavior plus the
renderer plumbing behind RenderConfig.denoise."""

import numpy as np

import jax.numpy as jnp

from pathtracer_tpu.render.denoise import atrous_denoise
from pathtracer_tpu.render.renderer import RenderConfig, render_image
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder


def _truth(h=48, w=64):
    """Smooth gradient with a hard vertical step edge at w//2."""
    x = np.linspace(0.0, 1.0, w)[None, :, None]
    y = np.linspace(0.0, 1.0, h)[:, None, None]
    img = 0.3 + 0.3 * x + 0.2 * y + np.zeros((h, w, 3))
    img[:, w // 2:, :] += 1.5  # the edge
    return img.astype(np.float32)


class TestAtrous:
    def test_identity_at_zero_iterations(self):
        img = jnp.asarray(_truth())
        out = atrous_denoise(img, iterations=0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_reduces_noise_preserves_edges(self):
        rng = np.random.RandomState(0)
        truth = _truth()
        noisy = truth + rng.randn(*truth.shape).astype(np.float32) * 0.12
        var = np.full(truth.shape[:2], 0.12 ** 2, np.float32)
        out = np.asarray(atrous_denoise(jnp.asarray(noisy), jnp.asarray(var),
                                        iterations=3))
        rmse_noisy = np.sqrt(((noisy - truth) ** 2).mean())
        rmse_out = np.sqrt(((out - truth) ** 2).mean())
        assert rmse_out < 0.5 * rmse_noisy, (rmse_out, rmse_noisy)
        # the step must survive: mean jump across the edge stays >= 80%
        w = truth.shape[1]
        jump = out[:, w // 2 + 2].mean() - out[:, w // 2 - 3].mean()
        assert jump > 0.8 * 1.5, jump

    def test_flat_region_converges_to_mean(self):
        rng = np.random.RandomState(1)
        noisy = (0.5 + rng.randn(32, 32, 3) * 0.05).astype(np.float32)
        out = np.asarray(atrous_denoise(jnp.asarray(noisy), iterations=4))
        assert np.abs(out - 0.5).std() < 0.4 * np.abs(noisy - 0.5).std()


class TestRendererPlumbing:
    def test_denoise_config_runs_and_smooths(self):
        """A 1-spp Cornell render with denoise on: finite, same shape, and
        the packed image differs from the raw one (the filter ran); the
        raw linear image (resolve) is untouched."""
        from pathtracer_tpu.scene.worlds import build_world
        from pathtracer_tpu.scene.schema import WORLD_CORNELL_BOX
        b, cam_d = build_world(WORLD_CORNELL_BOX)
        cam = define_camera(cam_d.pos, cam_d.target, cam_d.fov, 32, 18)
        scene = b.finalize()
        raw_cfg = RenderConfig(width=32, height=18, pp=1, seed=3)
        dn_cfg = RenderConfig(width=32, height=18, pp=1, seed=3, denoise=3)
        img_raw, packed_raw, _ = render_image(scene, cam, raw_cfg)
        img_dn, packed_dn, _ = render_image(scene, cam, dn_cfg)
        np.testing.assert_array_equal(np.asarray(img_raw),
                                      np.asarray(img_dn))  # linear untouched
        assert (np.asarray(packed_raw) != np.asarray(packed_dn)).any()
        assert np.asarray(packed_dn).shape == (18, 32)
