"""Dielectric transmission (glass) — capability beyond the reference.

The reference lists refraction as in-progress (win32_main.cpp:169 "TODO:
refraction", FindRefractionDirection :1622-1661 written but never called
from RayCast, the F0 comment :600-601). pathtracer_tpu finishes it behind
``HostMaterial.transmission``: a delta reflect/refract lobe driven by a
Schlick-Fresnel coin, TIR falling back to reflection. Opaque scenes
(transmission == 0 everywhere) compile exactly the reference estimator —
``Scene.any_transmissive`` is static.

Correctness anchors: Snell's law unit checks on the refraction helper and
a glass-sphere golden gate against the independent scalar oracle (which
implements the same lobe in scalar numpy, cpu_oracle.refract_np).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracer_tpu import RenderConfig, render_image
from pathtracer_tpu.ops.shade import find_refraction_direction
from pathtracer_tpu.reference.cpu_oracle import refract_np, render_oracle
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder
from pathtracer_tpu.utils.vec import Vec3


def _v(x, y, z):
    return Vec3(jnp.asarray([x], jnp.float32), jnp.asarray([y], jnp.float32),
                jnp.asarray([z], jnp.float32))


class TestRefractNp:
    """The oracle twin must agree with the device helper bit-for-bit-ish."""

    @pytest.mark.parametrize("seed", range(5))
    def test_matches_device_helper(self, seed):
        rng = np.random.RandomState(seed)
        d = rng.randn(3).astype(np.float32)
        d /= np.linalg.norm(d)
        n = rng.randn(3).astype(np.float32)
        n /= np.linalg.norm(n)
        ior = np.float32(1.1 + rng.rand())
        dev, ok = find_refraction_direction(_v(*d), _v(*n), jnp.float32(ior))
        host = refract_np(d.astype(np.float32), n.astype(np.float32), ior)
        if host is None:
            assert not bool(np.asarray(ok)[0])
        else:
            assert bool(np.asarray(ok)[0])
            got = np.array([np.asarray(c)[0] for c in dev])
            np.testing.assert_allclose(got, host, rtol=1e-5, atol=1e-6)

    def test_snell_at_interface(self):
        # straight-down ray into a flat upward-facing surface at 45 deg
        d = np.array([np.sin(np.pi / 4), 0, -np.cos(np.pi / 4)], np.float32)
        n = np.array([0, 0, 1], np.float32)
        out = refract_np(d, n, np.float32(1.5))
        # Snell: n1 sin(t1) = n2 sin(t2); sin(t2) = 1.008*sin(45)/1.5
        sin_t2 = 1.008 * np.sin(np.pi / 4) / 1.5
        got_sin = np.linalg.norm(np.cross(out, -n))
        np.testing.assert_allclose(got_sin, sin_t2, rtol=1e-5)
        # refracted ray continues downward
        assert out[2] < 0

    def test_total_internal_reflection(self):
        # glass-to-air at a grazing angle: TIR
        d = np.array([np.sin(0.9), 0, np.cos(0.9)], np.float32)  # ~52 deg
        n = np.array([0, 0, 1], np.float32)
        assert refract_np(d, n, np.float32(1.5)) is None


class TestTIRMirror:
    """Total internal reflection must stay on the incident side with a unit
    direction. pure_bounce's sign-flipped cosine is only a mirror for front
    faces; the transmissive branch must use the sign-safe d - 2(N.d)N
    (advisor finding, round 2)."""

    def test_tir_reflects_back_inside(self):
        from pathtracer_tpu.ops.intersect import Hit
        from pathtracer_tpu.render.integrator import shade_bounce
        from pathtracer_tpu.utils import prng

        b = _glass_world()
        scene = b.finalize()
        glass_mat = 2  # _glass_world adds sky(0), light(1), glass(2)

        # ray travelling upward inside the glass, hitting the interior
        # surface (outward normal +z) at ~52 deg — past the critical angle
        # for ior 1.5, so TIR is forced regardless of the Fresnel coin
        s, c = np.sin(0.9), np.cos(0.9)
        d = _v(s, 0.0, c)
        o = _v(0.0, 0.0, 0.0)
        hit = Hit(t=jnp.asarray([1.0], jnp.float32),
                  mat=jnp.asarray([glass_mat], jnp.int32),
                  normal=_v(0.0, 0.0, 1.0))
        # u[0] = 0.9 > any plausible Fresnel: would pick refract if it could
        u = tuple(jnp.asarray([v], jnp.float32)
                  for v in (0.9, 0.5, 0.5, 0.5, 0.5))
        out = shade_bounce(scene, o, d, hit, u)
        L = np.array([float(np.asarray(out.L.x)[0]),
                      float(np.asarray(out.L.y)[0]),
                      float(np.asarray(out.L.z)[0])])
        # unit length and on the incident side (back down into the glass)
        np.testing.assert_allclose(np.linalg.norm(L), 1.0, rtol=1e-6)
        assert L[2] < 0.0
        np.testing.assert_allclose(L, [s, 0.0, -c], atol=1e-6)

    def test_oracle_mirror_matches(self):
        # oracle twin: same back-face TIR geometry through refract_np + the
        # mirror formula used in trace_path
        s, c = np.float32(np.sin(0.9)), np.float32(np.cos(0.9))
        d = np.array([s, 0, c], np.float32)
        n = np.array([0, 0, 1], np.float32)
        assert refract_np(d, n, np.float32(1.5)) is None
        mirror = d - n * (np.float32(2.0) * float(d @ n))
        np.testing.assert_allclose(np.linalg.norm(mirror), 1.0, rtol=1e-6)
        assert mirror[2] < 0


def _glass_world():
    b = WorldBuilder()
    b.add_material(emit=(0.35, 0.45, 0.6))  # bright sky (lights the glass)
    light = b.add_material(emit=(8.0, 7.0, 6.0))
    b.add_sphere((3.0, -2.0, 5.0), 1.0, light)  # spheres[0] = NEE light
    glass = b.add_material(albedo=(0.95, 0.97, 0.99), ior=1.5,
                           transmission=1.0)
    b.add_sphere((0.0, 0.0, 1.2), 1.1, glass)
    floor = b.add_material(albedo=(0.6, 0.3, 0.2), roughness=0.9)
    b.add_plane((0, 0, 1), 0.0, floor)
    return b


class TestGlassGolden:
    def test_glass_sphere_matches_oracle(self):
        b = _glass_world()
        w, h, pp = 20, 14, 2
        cam = define_camera((0, -7, 1.5), (0, 0, 1), 35.0, w, h)
        scene = b.finalize()
        assert scene.any_transmissive
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=5)
        img, _, _ = render_image(scene, cam, cfg)
        oracle = render_oracle(b, cam, w, h, pp, seed=5, world_kind=0)
        img = np.asarray(img)
        d = np.abs(img - oracle).max(axis=-1)
        # same robust gate as the built-in worlds: the Fresnel coin and the
        # TIR boundary are discrete choices that can flip on 1-ulp diffs
        assert np.median(d) < 1e-4, float(np.median(d))
        assert (d > 1e-2).mean() < 0.05, float((d > 1e-2).mean())
        assert np.isfinite(img).all()
        assert img.max() > 0

    def test_dispersive_glass_matches_oracle(self):
        """Spectral dispersion (the reference's 'different wavelengths
        refract differently' TODO, win32_main.cpp:169-170): golden vs the
        scalar oracle twin on a strongly dispersive glass sphere."""
        b = _glass_world()
        b.materials[2] = type(b.materials[2])(
            albedo=(0.95, 0.97, 0.99), ior=1.5, transmission=1.0,
            dispersion=0.08)
        w, h, pp = 20, 14, 2
        cam = define_camera((0, -7, 1.5), (0, 0, 1), 35.0, w, h)
        scene = b.finalize()
        assert scene.any_dispersive
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=6)
        img, _, _ = render_image(scene, cam, cfg)
        oracle = render_oracle(b, cam, w, h, pp, seed=6, world_kind=0)
        img = np.asarray(img)
        d = np.abs(img - oracle).max(axis=-1)
        assert np.median(d) < 1e-4, float(np.median(d))
        assert (d > 1e-2).mean() < 0.05, float((d > 1e-2).mean())

    def test_dispersion_bends_channels_apart(self):
        """Unit-level: with the Fresnel coin forced to refract, the three
        channel coins produce three different refraction directions, red
        bending least (smallest ior) and blue most; the throughput masks
        to the selected channel x3."""
        from pathtracer_tpu.ops.intersect import Hit
        from pathtracer_tpu.render.integrator import shade_bounce
        b = _glass_world()
        b.materials[2] = type(b.materials[2])(
            albedo=(1.0, 1.0, 1.0), ior=1.5, transmission=1.0,
            dispersion=0.1)
        scene = b.finalize()
        d = _v(np.sin(0.6), 0.0, -np.cos(0.6))
        o = _v(0.0, 0.0, 2.0)
        hit = Hit(t=jnp.asarray([1.0], jnp.float32),
                  mat=jnp.asarray([2], jnp.int32),
                  normal=_v(0.0, 0.0, 1.0))
        outs = []
        for u6 in (0.1, 0.5, 0.9):  # channels 0 (R), 1 (G), 2 (B)
            u = tuple(jnp.asarray([v], jnp.float32)
                      for v in (0.99, 0.5, 0.5, 0.5, 0.5, 0.5, u6, 0.5))
            out = shade_bounce(scene, o, d, hit, u)
            L = np.array([float(np.asarray(c)[0])
                          for c in (out.L.x, out.L.y, out.L.z)])
            wgt = np.array([float(np.asarray(c)[0])
                            for c in (out.weight.x, out.weight.y,
                                      out.weight.z)])
            outs.append((L, wgt))
        # sin(theta_out) = n_air sin(theta_in) / ior_c: larger ior bends
        # the ray closer to the normal -> smaller |L.x|
        sx = [abs(L[0]) for L, _ in outs]
        assert sx[0] > sx[1] > sx[2], sx
        for c, (_, wgt) in enumerate(outs):
            expect = np.zeros(3)
            expect[c] = 3.0
            np.testing.assert_allclose(wgt, expect, atol=1e-6)

    def test_opaque_scene_unchanged_by_flag_plumbing(self):
        # a transmission=0 scene must not set the static flag (and so
        # compiles the exact reference estimator)
        b = WorldBuilder()
        b.add_material(emit=(0.2, 0.2, 0.2))
        m = b.add_material(albedo=(0.5, 0.5, 0.5))
        b.add_sphere((0, 0, 0), 1.0, m)
        assert not b.finalize().any_transmissive
