"""Compiled-Mosaic smoke for the round-3 in-kernel surfaces.

Interpret-mode equivalence for each of these already gates in tests/
(test_bump / test_tbn / test_fuzz / test_fog) — but interpret mode
exercises XLA:CPU, not the Mosaic compiler. This runs the SAME
kernel-vs-XLA comparisons COMPILED on the real chip for the new
lowering surfaces:

  bump       — fused 3-point height fetch (bespoke_height3_stack_windowed)
  tbn        — tangent-frame rotation + normal-map stack fetch in-kernel
  fog        — jnp.log distance sampling + HG phase + volume NEE in-kernel
               (on the quad-light world: the god-rays configuration)
  dispersion — per-path RGB channel refraction in-kernel
  everything — fog x dispersive glass x RR x bump floor x UV-textured mesh

Gates: bench.py --verify's flip-fraction thresholds (< 1% of pixels with
|diff| > 1e-3, < 0.1% with |diff| > 0.1). None of these scenes evaluates
an identical expression graph on both backends (windowed fetches /
clustered forms round differently), so bit equality is reported but not
gated.

Usage: python experiments/kernel_surface_smoke.py [WxH] [pp]
One JSON line per surface + a final summary; exit nonzero on any FAIL.
"""

import json
import sys

import numpy as np

from pathtracer_tpu.render.renderer import (
    RenderConfig, init_accum, render_chunk, resolve,
)
from pathtracer_tpu.render.pallas_backend import supports
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WORLD_CORNELL_QUAD, WorldBuilder
from pathtracer_tpu.scene.worlds import build_world
from pathtracer_tpu.utils import prng


def _bump_case():
    rng = np.random.RandomState(12)
    tex = np.repeat(rng.rand(16, 16, 1), 3, axis=2).astype(np.float32)
    tex = (np.round(tex * 255.0) / 255.0).astype(np.float32)
    b = WorldBuilder()
    b.add_material(emit=(0.3, 0.35, 0.45))
    light = b.add_material(emit=(6.0, 5.5, 5.0))
    b.add_sphere((3, -3, 6), 1.0, light)
    m = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.8,
                       bump_idx=b.add_texture(tex), bump_scale=0.5)
    b.add_plane((0, 0, 1), 0.0, m)
    return b.finalize(), ((0, -8, 2), (0, 0, 0), 35.0), {}


def _tbn_case():
    rng = np.random.RandomState(5)
    tex = rng.rand(16, 16, 3).astype(np.float32) * 0.4 + 0.3
    tex[..., 2] = 0.8 + 0.2 * tex[..., 2]
    tex = (np.round(tex * 255.0) / 255.0).astype(np.float32)
    b = WorldBuilder()
    b.add_material(emit=(0.25, 0.3, 0.4))
    light = b.add_material(emit=(7.0, 6.5, 6.0))
    b.add_sphere((4.0, -4.0, 8.0), 1.0, light)
    m = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.7, normal_idx=1)
    n = (0.0, -np.sin(np.pi / 4), np.cos(np.pi / 4))
    b.add_plane(n, 1.0, m)
    b.textures.append(tex)
    b.tbn_normal_maps = True
    return b.finalize(), ((0, -9, 3.0), (0, 0, 0), 35.0), {}


def _fog_case():
    b, cam_d = build_world(WORLD_CORNELL_QUAD)
    b.set_fog(0.0012, albedo=(0.9, 0.9, 0.95), g=0.5)
    return b.finalize(), (cam_d.pos, cam_d.target, cam_d.fov), {}


def _dispersion_case():
    b = WorldBuilder()
    b.add_material(emit=(0.3, 0.35, 0.45))
    light = b.add_material(emit=(8.0, 7.5, 7.0))
    b.add_sphere((4, -4, 7), 1.2, light)
    glass = b.add_material(albedo=(0.95, 0.97, 1.0), ior=1.45,
                           transmission=1.0, dispersion=0.12)
    b.add_sphere((0, 0, 1.0), 1.0, glass)
    floor = b.add_material(albedo=(0.55, 0.5, 0.45), roughness=0.9)
    b.add_plane((0, 0, 1), 0.0, floor)
    return b.finalize(), ((0, -7, 2.0), (0, 0, 0.8), 35.0), {}


def _everything_case():
    rng = np.random.RandomState(12)
    b = WorldBuilder()
    b.add_material(emit=(0.3, 0.3, 0.4))
    light = b.add_material(emit=(7.0, 6.5, 6.0))
    b.add_sphere((3, -4, 6), 1.0, light)
    glass = b.add_material(albedo=(0.92, 0.95, 0.99), ior=1.4,
                           transmission=1.0, dispersion=0.1)
    b.add_sphere((-1.2, 0.5, 0.8), 0.8, glass)
    b.set_fog(0.02, albedo=(0.8, 0.85, 0.9), g=0.4)
    bump_tex = np.repeat(rng.rand(8, 8, 1), 3, 2).astype(np.float32)
    bump_tex = (np.round(bump_tex * 255.0) / 255.0).astype(np.float32)
    bm = b.add_material(albedo=(0.5, 0.45, 0.4), roughness=0.9,
                        bump_idx=b.add_texture(bump_tex), bump_scale=0.3)
    b.add_plane((0, 0, 1), 4.0, bm)
    check = (np.indices((8, 8)).sum(0) % 2)[..., None].repeat(3, 2)
    uv_tex = (np.round((check * 0.7 + 0.2) * 255.0) / 255.0
              ).astype(np.float32)
    um = b.add_material(albedo=(1.0, 0.9, 0.8),
                        albedo_idx=b.add_texture(uv_tex), roughness=0.7)
    pts = np.asarray([[-1, 0, -1], [1, 0, -1], [0, 0, 1.2]], np.float32)
    b.set_mesh(pts, np.full(3, um, np.int32),
               uvs=np.asarray([[0, 0], [2, 0], [1, 2]], np.float32))
    scene = b.finalize()
    assert (scene.any_dispersive and scene.fog_sigma_t > 0
            and scene.any_bump and scene.has_mesh_uvs)
    return scene, ((0, -8, 1), (0, 0, 0), 35.0), {
        "use_russian_roulette": True}


CASES = {
    "bump": _bump_case,
    "tbn": _tbn_case,
    "fog": _fog_case,
    "dispersion": _dispersion_case,
    "everything": _everything_case,
}


def run_case(name, w, h, pp, backend="pallas"):
    scene, (pos, target, fov), cfg_kw = CASES[name]()
    cam = define_camera(pos, target, fov, w, h)
    key = prng.base_key(0)
    cfg_p = RenderConfig(width=w, height=h, pp=pp, seed=0,
                         backend=backend, **cfg_kw)
    if not supports(scene, cfg_p):
        return {"surface": name, "skipped": "unsupported"}
    cfg_x = RenderConfig(width=w, height=h, pp=pp, seed=0,
                         backend="xla", **cfg_kw)
    imgs = {}
    for tag, cfg in (("pallas", cfg_p), ("xla", cfg_x)):
        st = render_chunk(scene, cam, cfg, key, np.int32(0), cfg.spp,
                          init_accum(w * h))
        imgs[tag] = np.asarray(resolve(st, cfg))
    diff = np.abs(imgs["pallas"] - imgs["xla"]).max(axis=2)
    n_pix = diff.size
    f_1e3 = float((diff > 1e-3).sum()) / n_pix
    f_1e1 = float((diff > 0.1).sum()) / n_pix
    ok = f_1e3 < 0.01 and f_1e1 < 0.001 and np.isfinite(
        imgs["pallas"]).all()
    return {"surface": name, "size": f"{w}x{h}", "spp": pp * pp,
            "bit_equal_frac": round(float((diff == 0.0).mean()), 4),
            "frac_gt_1e-3": round(f_1e3, 5),
            "frac_gt_0.1": round(f_1e1, 6), "ok": bool(ok)}


def main(argv):
    # a trailing "interpret" arg runs the XLA:CPU interpret kernel instead
    # (pre-checks the harness off-chip; the documented interpret-mode
    # divergence classes make the gates advisory there)
    backend = "pallas"
    if argv and argv[-1] == "interpret":
        backend, argv = "pallas-interpret", argv[:-1]
    size = argv[1] if len(argv) > 1 else "192x108"
    pp = int(argv[2]) if len(argv) > 2 else 4
    w, h = (int(x) for x in size.split("x"))
    all_ok = True
    for name in CASES:
        rec = run_case(name, w, h, pp, backend)
        print(json.dumps(rec), flush=True)
        all_ok = all_ok and rec.get("ok", True)
    print(json.dumps({"metric": "kernel_surface_smoke", "ok": all_ok}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
