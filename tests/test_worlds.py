"""Scene/world construction and camera derivation tests."""

import math

import numpy as np
import pytest

from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import (
    FIXED_FOCAL_LENGTH, WORLD_BRDF_TEST, WORLD_CORNELL_BOX, WORLD_DEFAULT,
    WORLD_MARIO, WORLD_RAYTRACING_ONE_WEEKEND,
)
from pathtracer_tpu.scene.worlds import build_world, finalize_world


class TestCamera:
    def test_default_world_derivation(self):
        # pos (0,-10,1), target origin, fov 30, pinhole, 1280x720
        cam = define_camera((0, -10, 1), (0, 0, 0), 30.0, 1280, 720)
        assert cam.focal_length == FIXED_FOCAL_LENGTH
        # axisZ = normalize(pos - target)
        az = np.array(cam.axis_z)
        np.testing.assert_allclose(az, np.array([0, -10, 1]) / math.sqrt(101), rtol=1e-6)
        # axisX = normalize(cross((0,0,1), axisZ)), axisY completes
        np.testing.assert_allclose(np.dot(cam.axis_x, cam.axis_z), 0, atol=1e-7)
        np.testing.assert_allclose(np.dot(cam.axis_y, cam.axis_z), 0, atol=1e-7)
        # film: tan(FULL fov)*2*f, aspect-corrected (the reference quirk)
        fw = math.tan(30.0 * math.pi / 180) * 2 * FIXED_FOCAL_LENGTH
        np.testing.assert_allclose(cam.film_width, fw, rtol=1e-6)
        np.testing.assert_allclose(cam.film_height, fw * 720 / 1280, rtol=1e-6)
        np.testing.assert_allclose(cam.half_film_pixel_w, 1 / 1280)
        # frustum center offset opposite axisZ
        fc = np.array(cam.frustum_center)
        np.testing.assert_allclose(
            fc, np.array([0, -10, 1]) - FIXED_FOCAL_LENGTH * az, rtol=1e-6)

    def test_thin_lens_focal_length(self):
        cam = define_camera((0, -10, 1), (0, 0, 0), 30.0, 100, 100,
                            use_pinhole=False, focal_distance=5.0)
        f = 1.0 / (1.0 / FIXED_FOCAL_LENGTH - 1.0 / 5.0)
        np.testing.assert_allclose(cam.focal_length, f, rtol=1e-6)


class TestWorlds:
    def test_world1_layout(self):
        b, cam = build_world(WORLD_DEFAULT)
        # material 0 = sky, 1 = sun light, 2 = textured ground
        assert b.materials[0].emit == (65 / 255.0, 108 / 255.0, 162 / 255.0)
        assert b.materials[1].emit == (15.0, 15.0, 15.0)
        assert b.materials[2].albedo_idx == 1 and b.materials[2].normal_idx == 4
        # spheres[0] is the sun (NEE light)
        assert b.spheres[0] == ((2000.0, 2000.0, 2000.0), 1000.0, 1)
        assert len(b.spheres) == 5
        assert len(b.textures) == 4
        assert cam.fov == 30.0 and cam.pos == (0.0, -10.0, 1.0)

    def test_material_defaults(self):
        b, _ = build_world(WORLD_DEFAULT)
        m = b.materials[3]  # red sphere: roughness explicitly 0
        assert m.roughness == 0.0 and m.ior == 1.0 and m.metalness == 0.0
        # Cornell materials keep the default roughness 1 (ray.hpp:74)
        b, _ = build_world(WORLD_CORNELL_BOX)
        assert b.materials[1].roughness == 1.0

    def test_cornell_layout(self):
        b, cam = build_world(WORLD_CORNELL_BOX)
        assert len(b.quads) == 5 and len(b.spheres) == 1
        c, r, m = b.spheres[0]
        assert c == (400.0, 277.5, 277.5) and r == 65.0
        assert b.materials[m].emit == (15.0, 15.0, 15.0)
        assert cam.fov == 40.0 and cam.pos == (400.0, -800.0, 277.5)
        # sky is black
        assert b.materials[0].emit == (0.0, 0.0, 0.0)

    def test_brdf_grid(self):
        b, cam = build_world(WORLD_BRDF_TEST)
        assert len(b.spheres) == 1 + 121  # sun + 11x11
        assert len(b.planes) == 1
        # sweep: metalness i/10, roughness j/10
        m_last = b.materials[-1]
        assert m_last.metalness == 1.0 and m_last.roughness == 1.0
        assert cam.fov == 50.0

    def test_rtiow(self):
        b, cam = build_world(WORLD_RAYTRACING_ONE_WEEKEND)
        assert not cam.use_pinhole          # forced thin lens
        assert cam.fov == 20.0 and cam.focal_distance == 10.0
        assert b.materials[0].emit == (1.0, 1.0, 1.0)  # white sky
        assert len(b.spheres) > 300          # ~500 random spheres
        # deterministic given the seed
        b2, _ = build_world(WORLD_RAYTRACING_ONE_WEEKEND)
        assert b.spheres == b2.spheres

    def test_mario(self):
        b, cam = build_world(WORLD_MARIO)
        assert b.triangles is not None and len(b.triangles) == 752
        assert len(b.planes) == 1
        assert cam.target == (0.0, 0.0, 1.0) and cam.fov == 30.0
        # gltf appended 6 textureless base-color materials after the 3 built-ins
        assert len(b.materials) == 9

    def test_finalize_shapes(self):
        scene, cam = finalize_world(WORLD_CORNELL_BOX, 64, 36)
        assert scene.n_quads == 5 and scene.n_spheres == 1
        assert scene.sph_mask.shape[0] % 8 == 0
        assert bool(scene.sph_mask[0]) and not bool(scene.sph_mask[1])
        assert scene.world_kind == WORLD_CORNELL_BOX
        assert not scene.just_cosine

    def test_rtiow_just_cosine_flag(self):
        scene, _ = finalize_world(WORLD_RAYTRACING_ONE_WEEKEND, 16, 9)
        assert scene.just_cosine


def test_rtiow_scene_seed_varies_layout():
    """--scene-seed (cli) / rtiow_seed (worlds.build_world): the reference
    seeds MT from the OS so world 4's layout differs per run
    (win32_main.cpp:1966, ray_math.hpp:245-248); our default is fixed for
    reproducibility and the knob restores the per-run-random semantics.
    Different seeds must give different sphere layouts; the same seed the
    identical one."""
    from pathtracer_tpu.scene.schema import WORLD_RAYTRACING_ONE_WEEKEND
    from pathtracer_tpu.scene.worlds import build_world
    b1, _ = build_world(WORLD_RAYTRACING_ONE_WEEKEND)
    b2, _ = build_world(WORLD_RAYTRACING_ONE_WEEKEND, rtiow_seed=1337)
    b3, _ = build_world(WORLD_RAYTRACING_ONE_WEEKEND, rtiow_seed=99)
    c1 = [s[0] for s in b1.spheres]
    c2 = [s[0] for s in b2.spheres]
    c3 = [s[0] for s in b3.spheres]
    assert c1 == c2
    assert c1 != c3
