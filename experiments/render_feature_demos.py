"""Render the round-3 feature demo gallery images.

    python experiments/render_feature_demos.py WHICH [SPP] [WxH]

WHICH: godrays | dispersion | denoise
- godrays: world 6 (quad area light Cornell) in forward-scattering fog —
  the reference's '"god rays" and fog' TODO (win32_main.cpp:159).
- dispersion: a high-dispersion glass sphere over a dark floor under a
  small bright light — 'different wavelengths refract differently'
  (:169-170).
- denoise: the Cornell box at 9 spp raw vs the same accumulator through
  the a-trous filter (:184), side by side.
"""
import sys

import numpy as np

from pathtracer_tpu.io.bmp import packed_to_rgb
from pathtracer_tpu.render.renderer import (
    RenderConfig, finalize, init_accum, render_image,
)
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WORLD_CORNELL_QUAD, WorldBuilder
from pathtracer_tpu.scene.worlds import build_world

which = sys.argv[1] if len(sys.argv) > 1 else "godrays"
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 256
size = sys.argv[3] if len(sys.argv) > 3 else "960x540"
w, h = (int(x) for x in size.split("x"))
pp = int(round(spp ** 0.5))


def save(packed, path):
    from PIL import Image
    Image.fromarray(packed_to_rgb(np.asarray(packed))[::-1]).save(path)
    print("wrote", path)


if which == "godrays":
    b, cam_d = build_world(WORLD_CORNELL_QUAD)
    b.set_fog(0.0012, albedo=(0.9, 0.9, 0.95), g=0.55)
    scene = b.finalize()
    cam = define_camera(cam_d.pos, cam_d.target, cam_d.fov, w, h)
    cfg = RenderConfig(width=w, height=h, pp=pp, seed=0)
    _, packed, _ = render_image(scene, cam, cfg, chunk_samples=64)
    save(packed, "images/godrays.png")
elif which == "dispersion":
    b = WorldBuilder()
    b.add_material(emit=(0.02, 0.02, 0.03))          # near-black sky
    light = b.add_material(emit=(60.0, 58.0, 55.0))  # small bright light
    b.add_sphere((2.5, -2.0, 6.0), 0.35, light)
    glass = b.add_material(albedo=(0.99, 0.99, 0.99), ior=1.45,
                           transmission=1.0, dispersion=0.12)
    b.add_sphere((0.0, 0.0, 1.25), 1.2, glass)
    floor = b.add_material(albedo=(0.35, 0.35, 0.37), roughness=0.85)
    b.add_plane((0, 0, 1), 0.0, floor)
    scene = b.finalize()
    cam = define_camera((0, -6.5, 1.6), (0, 0, 1.0), 32.0, w, h)
    cfg = RenderConfig(width=w, height=h, pp=pp, seed=0)
    _, packed, _ = render_image(scene, cam, cfg, chunk_samples=64)
    save(packed, "images/dispersion.png")
elif which == "denoise":
    from pathtracer_tpu.scene.schema import WORLD_CORNELL_BOX
    b, cam_d = build_world(WORLD_CORNELL_BOX)
    scene = b.finalize()
    cam = define_camera(cam_d.pos, cam_d.target, cam_d.fov, w, h)
    raw_cfg = RenderConfig(width=w, height=h, pp=3, seed=0)  # 9 spp
    _, packed_raw, st = render_image(scene, cam, raw_cfg, chunk_samples=9)
    dn_cfg = RenderConfig(width=w, height=h, pp=3, seed=0, denoise=4)
    packed_dn = finalize(st, dn_cfg)  # same accumulator, filtered
    side = np.concatenate([np.asarray(packed_raw), np.asarray(packed_dn)],
                          axis=1)
    save(side, "images/denoise_9spp.png")
else:
    raise SystemExit(f"unknown demo {which!r}")
