"""Unit tests: intersectors vs analytic cases (SURVEY.md §4 test pyramid)."""

import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops import intersect as I
from pathtracer_tpu.scene.schema import WorldBuilder, F32_MAX
from pathtracer_tpu.utils.vec import Vec3, vec3, to_stacked


def V(x, y, z):
    return vec3(float(x), float(y), float(z))


class TestSphere:
    def test_head_on(self):
        t, hit, n = I.ray_sphere(V(0, -5, 0), V(0, 1, 0), V(0, 0, 0), 1.0)
        assert bool(hit)
        np.testing.assert_allclose(float(t), 4.0, rtol=1e-6)
        np.testing.assert_allclose(to_stacked(n), [0, -1, 0], atol=1e-6)

    def test_near_root_only(self):
        # origin inside: near root is behind (negative) -> miss per reference
        t, hit, n = I.ray_sphere(V(0, 0, 0), V(0, 1, 0), V(0, 0, 0), 1.0)
        assert not bool(hit)

    def test_miss(self):
        _, hit, _ = I.ray_sphere(V(0, -5, 3), V(0, 1, 0), V(0, 0, 0), 1.0)
        assert not bool(hit)

    def test_min_hit_rejects(self):
        t, hit, _ = I.ray_sphere(V(0, -5, 0), V(0, 1, 0), V(0, 0, 0), 1.0, min_hit=4.5)
        assert not bool(hit)


class TestPlane:
    def test_ground_plane(self):
        t, valid = I.ray_plane(V(0, 0, 5), V(0, 0, -1), V(0, 0, 1), 0.0)
        assert bool(valid)
        np.testing.assert_allclose(float(t), 5.0, rtol=1e-6)

    def test_parallel_invalid(self):
        _, valid = I.ray_plane(V(0, 0, 5), V(1, 0, 0), V(0, 0, 1), 0.0)
        assert not bool(valid)

    def test_negative_t_returned(self):
        # reference returns raw t; caller filters by min_hit
        t, valid = I.ray_plane(V(0, 0, -5), V(0, 0, -1), V(0, 0, 1), 0.0)
        assert bool(valid) and float(t) == -5.0


class TestPlanarShapes:
    def test_quad_inside_outside(self):
        A, u, v = V(0, 0, 0), V(1, 0, 0), V(0, 1, 0)
        t, hit = I.ray_planar_quad(V(0.5, 0.5, 3), V(0, 0, -1), A, u, v)
        assert bool(hit) and abs(float(t) - 3.0) < 1e-6
        _, hit = I.ray_planar_quad(V(1.5, 0.5, 3), V(0, 0, -1), A, u, v)
        assert not bool(hit)

    def test_quad_min_hit_hack(self):
        # the 0.02 Cornell hack (win32_main.cpp:446): hits closer than 0.02 reject
        A, u, v = V(0, 0, 0), V(1, 0, 0), V(0, 1, 0)
        _, hit = I.ray_planar_quad(V(0.5, 0.5, 0.01), V(0, 0, -1), A, u, v)
        assert not bool(hit)

    def test_triangle_barycentric(self):
        A, u, v = V(0, 0, 0), V(1, 0, 0), V(0, 1, 0)
        _, hit = I.ray_planar_triangle(V(0.3, 0.3, 3), V(0, 0, -1), A, u, v)
        assert bool(hit)
        # (0.7, 0.7) is inside the unit quad but outside the triangle
        _, hit = I.ray_planar_triangle(V(0.7, 0.7, 3), V(0, 0, -1), A, u, v)
        assert not bool(hit)


class TestAABB:
    def test_face_hit_and_normal_order(self):
        bmin, bmax = V(-1, -1, -1), V(1, 1, 1)
        t, hit, face = I.ray_aabb_faces(V(0, 0, -5), V(0, 0, 1), bmin, bmax)
        assert bool(hit)
        np.testing.assert_allclose(float(t), 4.0, rtol=1e-6)
        assert int(face) == 0  # z-min face tested first

    def test_inside_origin_hits(self):
        bmin, bmax = V(-1, -1, -1), V(1, 1, 1)
        _, hit, _ = I.ray_aabb_faces(V(0, 0, 0), V(0, 0, 1), bmin, bmax)
        assert bool(hit)

    def test_slab_equiv_boolean(self, rng):
        bmin, bmax = V(-1, -1, -1), V(1, 1, 1)
        o = Vec3(*(jnp.asarray(rng.uniform(-3, 3, 256).astype(np.float32)) for _ in range(3)))
        d_raw = rng.randn(3, 256).astype(np.float32)
        d = Vec3(*(jnp.asarray(x) for x in d_raw))
        _, hit_faces, _ = I.ray_aabb_faces(o, d, bmin, bmax)
        hit_slab = I.ray_aabb_hit(o, d, bmin, bmax)
        np.testing.assert_array_equal(np.asarray(hit_faces), np.asarray(hit_slab))


class TestSceneDispatch:
    def _scene(self):
        b = WorldBuilder()
        b.add_material(emit=(0.1, 0.2, 0.3))        # sky
        m1 = b.add_material(albedo=(1, 0, 0))
        m2 = b.add_material(albedo=(0, 1, 0))
        b.add_sphere((0, 5, 0), 1.0, m1)
        b.add_plane((0, 0, 1), -2.0, m2)            # z = -2 plane
        return b.finalize()

    def test_nearest_hit_and_miss(self):
        s = self._scene()
        o = Vec3(jnp.asarray([0.0, 0.0]), jnp.asarray([0.0, 0.0]), jnp.asarray([0.0, 5.0]))
        d = Vec3(jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0]))
        hit = I.intersect_scene(s, o, d)
        t = np.asarray(hit.t)
        mat = np.asarray(hit.mat)
        assert abs(t[0] - 4.0) < 1e-5 and mat[0] == 1
        assert t[1] == F32_MAX and mat[1] == 0  # straight up: miss -> sky

    def test_category_order_spheres_before_planes(self):
        # coincident sphere surface & plane at same t: sphere (earlier
        # category) must win via strict < (win32_main.cpp:406-473)
        b = WorldBuilder()
        b.add_material(emit=(0, 0, 0))
        m1 = b.add_material(albedo=(1, 0, 0))
        m2 = b.add_material(albedo=(0, 1, 0))
        b.add_sphere((0, 0, 0), 1.0, m1)
        b.add_plane((0, 0, 1), 1.0, m2)  # z = 1 plane tangent at sphere top
        s = b.finalize()
        o = Vec3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([3.0]))
        d = Vec3(jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([-1.0]))
        hit = I.intersect_scene(s, o, d)
        assert int(np.asarray(hit.mat)[0]) == m1
