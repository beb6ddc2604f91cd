"""Grid acceleration structure: binning semantics + traversal == brute force."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.ops.intersect import Hit, intersect_triangles_brute
from pathtracer_tpu.ops.traverse import intersect_triangles_grid
from pathtracer_tpu.scene.accel import (
    CELL_SIZE, GRID_RES, build_uniform_grid, voxel_coords,
)
from pathtracer_tpu.scene.schema import F32_MAX, WORLD_MARIO, WorldBuilder
from pathtracer_tpu.scene.worlds import build_world
from pathtracer_tpu.utils.vec import Vec3


class TestBinning:
    def test_voxel_coords_reference_convention(self):
        # floor(p/sep) + half (win32_main.cpp:1266-1268): -2.5 maps to 0
        half = GRID_RES >> 1
        pts = np.array([[0.0, 0.0, 0.0],
                        [-2.5, -2.5, -2.5],
                        [2.4999, 2.4999, 2.4999]], np.float32)
        c = voxel_coords(pts)
        assert (c[0] == half).all()
        assert (c[1] == 0).all()
        assert (c[2] == GRID_RES - 1).all()

    def test_single_triangle_span(self):
        # a triangle spanning 2 cells in x gets binned into both
        tri = np.array([[[0.01, 0.01, 0.01],
                         [CELL_SIZE * 1.5, 0.01, 0.01],
                         [0.01, 0.02, 0.01]]], np.float32)
        start, count, refs, res = build_uniform_grid(tri)
        assert int(jnp.sum(count)) == 2
        assert (np.asarray(refs)[:2] == 0).all()

    def test_out_of_bounds_raises(self):
        tri = np.array([[[0, 0, 0], [3.0, 0, 0], [0, 1, 0]]], np.float32)
        with pytest.raises(ValueError, match="out of the world bounds"):
            build_uniform_grid(tri)


class TestTraversal:
    def _mario_scene(self, use_grid):
        from pathtracer_tpu.scene.worlds import finalize_world
        scene, cam = finalize_world(WORLD_MARIO, 16, 12, use_grid=use_grid)
        return scene, cam

    def test_grid_matches_brute_force(self, rng):
        scene_g, cam = self._mario_scene(True)
        scene_b, _ = self._mario_scene(False)
        assert scene_g.grid_res == GRID_RES and scene_b.grid_res == 0

        n = 512
        # rays from random origins aimed at points inside the mesh bbox
        # (mario spans roughly [-1.2, 1.2]^2 x [0, 2.4]), plus jitter so a
        # good fraction hit and a good fraction miss
        o_raw = np.stack([
            rng.uniform(-6, 6, n), rng.uniform(-6, 6, n), rng.uniform(-1, 4, n),
        ]).astype(np.float32)
        target = np.stack([
            rng.uniform(-1.2, 1.2, n), rng.uniform(-0.6, 0.6, n),
            rng.uniform(0.0, 2.4, n),
        ]).astype(np.float32)
        d_raw = target - o_raw + 0.5 * rng.randn(3, n).astype(np.float32)
        d_raw /= np.linalg.norm(d_raw, axis=0, keepdims=True)
        o = Vec3(*(jnp.asarray(x) for x in o_raw))
        d = Vec3(*(jnp.asarray(x) for x in d_raw))

        shape = (n,)
        init = Hit(jnp.full(shape, F32_MAX), jnp.zeros(shape, jnp.int32),
                   Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)))
        hg = intersect_triangles_grid(scene_g, o, d, init)
        hb = intersect_triangles_brute(scene_b, o, d, init)

        hit_g = np.asarray(hg.t) < F32_MAX
        hit_b = np.asarray(hb.t) < F32_MAX
        np.testing.assert_array_equal(hit_g, hit_b)
        np.testing.assert_allclose(np.asarray(hg.t)[hit_g],
                                   np.asarray(hb.t)[hit_b], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(hg.mat)[hit_g],
                                      np.asarray(hb.mat)[hit_b])
        assert hit_b.sum() > 10  # the rays actually exercise the mesh
