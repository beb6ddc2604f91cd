"""Grandparent-level A/B in the LOCALIZED-view regime, single process.

The full-screen surface A/B (BENCH.md round 4) measured a wash: when the
camera sees the whole mesh, nearly every parent must descend, so
shrinking the serial parent sweep moves little. The grandparent level's
actual use case is a localized view (camera near the surface, most
parents behind it / out of frustum) — the regime the reference's octree
upper levels exist for (stack traversal win32_main.cpp:476-526).

This runs BOTH arms in ONE process, alternating, so tunnel weather and
compile-cache effects hit both arms equally: build the sphere-zoom scene
(camera just off a 250k-tri tessellated sphere looking at a patch),
finalize twice (PT_GPARENT_MIN read at finalize, schema.py), then render
A/B/A/B with synced timing. Usage:

    python experiments/gp_localized_ab.py [NTRIS] [SPP] [REPS]
"""
import os
import sys
import time

import numpy as np

ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 250000
spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder
from pathtracer_tpu.render.renderer import RenderConfig, render_image


def tessellated_sphere(n_target, radius=8.0, center=(0.0, 0.0, 0.0)):
    nlat = max(4, int(np.sqrt(n_target / 4.0)))
    nlon = 2 * nlat
    th = np.linspace(0, np.pi, nlat + 1)
    ph = np.linspace(0, 2 * np.pi, nlon + 1)
    P = np.zeros((nlat + 1, nlon + 1, 3), np.float32)
    P[..., 0] = radius * np.outer(np.sin(th), np.cos(ph)) + center[0]
    P[..., 1] = radius * np.outer(np.sin(th), np.sin(ph)) + center[1]
    P[..., 2] = radius * np.outer(np.cos(th), np.ones_like(ph)) + center[2]
    out = []
    for i in range(nlat):
        for j in range(nlon):
            a, b, c, d = P[i, j], P[i + 1, j], P[i + 1, j + 1], P[i, j + 1]
            out.append([a, b, c])
            out.append([a, c, d])
    return np.asarray(out, np.float32)


def build(gparent_min):
    b = WorldBuilder()
    b.add_material(emit=(0.3, 0.4, 0.5))
    light = b.add_material(emit=(6.0, 5.5, 5.0))
    b.add_sphere((8.0, -6.0, 12.0), 1.5, light)
    m = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.8)
    tris = tessellated_sphere(ntris)
    b.set_mesh(tris.reshape(-1, 3), np.full((len(tris) * 3,), m, np.int32))
    floor = b.add_material(albedo=(0.4, 0.4, 0.45), roughness=0.9)
    b.add_plane((0, 0, 1), 10.0, floor)
    os.environ["PT_GPARENT_MIN"] = str(gparent_min)
    return b.finalize(view_origin=cam_pos)


W, H = 640, 360
cam_pos, cam_tgt = (0.0, -10.0, 1.0), (0.0, -7.5, 0.5)
camera = define_camera(cam_pos, cam_tgt, 35.0, W, H)
pp = int(round(spp ** 0.5))
cfg = RenderConfig(width=W, height=H, pp=pp, backend="auto")

scenes = {"gp-on": build(64), "gp-off": build(10 ** 9)}
for name, sc in scenes.items():
    _, _, st = render_image(sc, camera, cfg)  # compile + warm
    float(np.asarray(st.rays_cast))

results = {"gp-on": [], "gp-off": []}
for r in range(reps):
    for name, sc in scenes.items():
        t0 = time.perf_counter()
        _, _, st = render_image(sc, camera, cfg)
        rays = float(np.asarray(st.rays_cast))
        dt = time.perf_counter() - t0
        rate = rays / dt / 1e6
        results[name].append(rate)
        print(f"rep={r} {name} {rate:.1f} Mrays/s", flush=True)

for name, rs in results.items():
    print(f"{name}: best {max(rs):.1f} median {sorted(rs)[len(rs)//2]:.1f}",
          flush=True)
