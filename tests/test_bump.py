"""Bump (height) maps — the reference's unrealized "bump map" TODO
(win32_main.cpp:173): gradient-tilted normals in the bespoke planar
frame, oracle-twinned."""

import numpy as np

import jax.numpy as jnp

from pathtracer_tpu.ops.intersect import Hit
from pathtracer_tpu.render.integrator import shade_bounce
from pathtracer_tpu.render.renderer import RenderConfig, render_image
from pathtracer_tpu.reference.cpu_oracle import render_oracle
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder
from pathtracer_tpu.utils.vec import Vec3


def _bumpy_world(tex):
    b = WorldBuilder()
    b.add_material(emit=(0.3, 0.35, 0.45))
    light = b.add_material(emit=(6.0, 5.5, 5.0))
    b.add_sphere((3, -3, 6), 1.0, light)
    ti = b.add_texture(tex)
    m = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.8,
                       bump_idx=ti, bump_scale=0.5)
    b.add_plane((0, 0, 1), 0.0, m)
    return b


class TestBump:
    def test_flat_height_leaves_normal(self):
        """A constant height map has zero gradient: the shading normal
        stays the geometric one (checked via primary-ray normals on the
        ground plane)."""
        flat = np.full((8, 8, 3), 0.5, np.float32)
        scene = _bumpy_world(flat).finalize()
        assert scene.any_bump
        o = Vec3(*(jnp.asarray([v], jnp.float32) for v in (0.0, 0.0, 2.0)))
        d = Vec3(*(jnp.asarray([v], jnp.float32) for v in (0.0, 0.0, -1.0)))
        hit = Hit(jnp.asarray([2.0], jnp.float32),
                  jnp.asarray([2], jnp.int32),
                  Vec3(*(jnp.asarray([v], jnp.float32)
                         for v in (0.0, 0.0, 1.0))))
        u = tuple(jnp.asarray([v], jnp.float32)
                  for v in (0.2, 0.2, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5))
        out = shade_bounce(scene, o, d, hit, u)
        n = [float(np.asarray(c)[0]) for c in
             (out.shading_normal.x, out.shading_normal.y,
              out.shading_normal.z)]
        np.testing.assert_allclose(n, (0.0, 0.0, 1.0), atol=1e-6)

    def test_ramp_tilts_against_gradient(self):
        """height rising along +x must tilt the normal toward -x
        (heightfield normal ~ (-dh/dx, -dh/dy, 1))."""
        ramp = np.tile(np.linspace(0.0, 1.0, 64, dtype=np.float32)[None, :, None],
                       (64, 1, 3))
        scene = _bumpy_world(ramp).finalize()
        o = Vec3(*(jnp.asarray([v], jnp.float32) for v in (0.1, 0.1, 2.0)))
        d = Vec3(*(jnp.asarray([v], jnp.float32) for v in (0.0, 0.0, -1.0)))
        hit = Hit(jnp.asarray([2.0], jnp.float32),
                  jnp.asarray([2], jnp.int32),
                  Vec3(*(jnp.asarray([v], jnp.float32)
                         for v in (0.0, 0.0, 1.0))))
        u = tuple(jnp.asarray([v], jnp.float32)
                  for v in (0.2, 0.2, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5))
        out = shade_bounce(scene, o, d, hit, u)
        nx = float(np.asarray(out.shading_normal.x)[0])
        nz = float(np.asarray(out.shading_normal.z)[0])
        assert nx < -0.01 and nz > 0.5, (nx, nz)

    def test_bumpy_floor_matches_oracle(self):
        rng = np.random.RandomState(12)
        tex = np.repeat(rng.rand(16, 16, 1), 3, axis=2).astype(np.float32)
        tex = np.round(tex * 255.0) / 255.0  # 8-bit grid (device packing)
        b = _bumpy_world(tex.astype(np.float32))
        w, h, pp = 16, 12, 2
        cam = define_camera((0, -8, 2), (0, 0, 0), 35.0, w, h)
        scene = b.finalize()
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=6)
        img, _, _ = render_image(scene, cam, cfg)
        oracle = render_oracle(b, cam, w, h, pp, seed=6, world_kind=0)
        img = np.asarray(img)
        d = np.abs(img - oracle).max(axis=-1)
        assert np.median(d) < 1e-4, float(np.median(d))
        assert (d > 1e-2).mean() < 0.05, float((d > 1e-2).mean())

    def test_kernel_supports_bump_via_tiled_stack(self):
        """Bump scenes ride the kernel when the general stack tiles
        (pow2): the three height fetches go through the windowed
        tiled-stack sampler instead of per-lane gathers. Non-pow2 height
        maps still fall back to XLA."""
        from pathtracer_tpu.render.pallas_backend import supports
        cfg = RenderConfig(width=8, height=8, pp=1)
        scene = _bumpy_world(np.full((8, 8, 3), 0.5, np.float32)).finalize()
        assert scene.any_bump and scene.tex_stack_tiled
        assert supports(scene, cfg)
        odd = _bumpy_world(np.full((6, 10, 3), 0.5, np.float32)).finalize()
        assert odd.any_bump and not odd.tex_stack_tiled
        assert not supports(odd, cfg)

    def test_kernel_interpret_matches_xla(self):
        """Bump scene through the interpret-mode kernel (windowed
        tiled-stack height fetches) vs the XLA chunk — the same robust
        gate as the other windowed-fetch equivalence tests."""
        import jax.numpy as jnp
        from pathtracer_tpu.render.pallas_backend import (
            render_chunk_pallas, supports)
        from pathtracer_tpu.render.renderer import init_accum, render_chunk
        from pathtracer_tpu.utils import prng
        rng = np.random.RandomState(12)
        tex = np.repeat(rng.rand(16, 16, 1), 3, axis=2).astype(np.float32)
        tex = (np.round(tex * 255.0) / 255.0).astype(np.float32)
        b = _bumpy_world(tex)
        scene = b.finalize()
        w, h = 16, 12
        cfg = RenderConfig(width=w, height=h, pp=2, seed=6)
        assert supports(scene, cfg)
        cam = define_camera((0, -8, 2), (0, 0, 0), 35.0, w, h)
        n = w * h
        key = prng.base_key(6)
        ref = render_chunk(scene, cam, cfg, key, jnp.int32(0), 2,
                           init_accum(n))
        pal = render_chunk_pallas(scene, cam, cfg, key, jnp.int32(0), 2,
                                  init_accum(n),
                                  jnp.arange(n, dtype=jnp.int32),
                                  interpret=True)
        a, p = np.asarray(ref.sum.x), np.asarray(pal.sum.x)
        # interpret compiles through XLA:CPU, so only fma-contraction
        # rounding separates the paths since jax 0.9.0 (the old
        # neighboring-texel miscompile no longer reproduces —
        # experiments/interpret_miscompile_repro.py). Every lane here
        # shades the bumpy textured plane (3 height fetches/bounce), so
        # the bit-equal fraction is lower than on mesh-UV scenes
        # (measured 54%, max |diff| 3.2e-5) — the tight atol is the
        # detector for the old ~1e-2 class; the compiled-chip gate is
        # bench.py --verify
        assert (a == p).mean() > 0.4, f"bit-equal {(a == p).mean():.2%}"
        np.testing.assert_allclose(a, p, atol=1e-4, rtol=1e-3)
        np.testing.assert_array_equal(np.asarray(ref.count),
                                      np.asarray(pal.count))
