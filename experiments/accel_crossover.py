"""Measure the clustered-vs-brute crossover on synthetic meshes.

Usage: python experiments/accel_crossover.py NTRIS MODE [SPP] [SHAPE]
MODE: on | off   (scene/clusters.py packet culling vs plain unrolled)
SHAPE: cloud (default) | sphere | sphere-zoom

"sphere-zoom" is the LOCALIZED-view variant: the camera sits close to
the surface looking at a patch, so most clusters/parents are behind the
camera or occluded — the regime the hierarchy's upper levels
(parents/grandparents) exist for (the full-screen "sphere" view must
descend almost everything, which is why the grandparent A/B washes
there, BENCH.md round 4).

Scenes: "cloud" = NTRIS random small triangles uniformly in a 20-unit
cube — the spatial regime packet culling likes LEAST (every scattered
bounce's block-union of ray corridors spans most clusters; an octree
degrades here too). "sphere" = an NTRIS-triangle tessellated sphere
SURFACE — the production regime (every reference mesh is a surface with
empty interior/exterior, win32_main.cpp LoadGLTF). A sky light, an
emissive NEE sphere, a ground plane. 640x360 render, backend="auto":
clustered scenes take the fused kernel (static unroll <= 1024 tris, the
streamed tier above), mode=off falls to the XLA wavefront driver exactly
as production would. Prints synced Mrays/s; BENCH.md records the
crossover.
"""
import sys
import time

import numpy as np

ntris = int(sys.argv[1])
mode = sys.argv[2]
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
shape = sys.argv[4] if len(sys.argv) > 4 else "cloud"

from pathtracer_tpu.scene import clusters as clu

if mode == "off":
    clu.CLUSTER_MIN = 10**9

from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder
from pathtracer_tpu.render.renderer import RenderConfig, render_image

rng = np.random.RandomState(7)
b = WorldBuilder()
b.add_material(emit=(0.3, 0.4, 0.5))
light = b.add_material(emit=(6.0, 5.5, 5.0))
b.add_sphere((8.0, -6.0, 12.0), 1.5, light)
m = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.8)
def tessellated_sphere(n_target, radius=8.0, center=(0.0, 0.0, 0.0)):
    """Lat-long tessellation with ~n_target triangles (a SURFACE mesh)."""
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
            a, bb, c, dd = P[i, j], P[i + 1, j], P[i + 1, j + 1], P[i, j + 1]
            out.append([a, bb, c])
            out.append([a, c, dd])
    return np.asarray(out, np.float32)


if shape == "cloud":
    base = (rng.rand(ntris, 1, 3) - 0.5) * 20.0
    tris = (base + (rng.rand(ntris, 3, 3) - 0.5) * 0.8).astype(np.float32)
else:
    tris = tessellated_sphere(ntris)
    ntris = len(tris)
b.set_mesh(tris.reshape(-1, 3), np.full((ntris * 3,), m, np.int32))
floor = b.add_material(albedo=(0.4, 0.4, 0.45), roughness=0.9)
b.add_plane((0, 0, 1), 10.0, floor)

W, H = 640, 360
# view_origin engages the camera-ordered t-cull exactly as production
# does (worlds.finalize_world passes cam.pos); round-2 numbers omitted it
# and under-measured the shipping configuration
if shape == "sphere-zoom":
    # camera just off the surface (radius 8), looking at a patch near
    # the +y pole region: the localized-view regime
    cam_pos, cam_tgt = (0.0, -10.0, 1.0), (0.0, -7.5, 0.5)
else:
    cam_pos, cam_tgt = (0, -30, 4), (0, 0, 0)
scene = b.finalize(view_origin=cam_pos)
camera = define_camera(cam_pos, cam_tgt, 35.0, W, H)
pp = int(round(spp ** 0.5))
cfg = RenderConfig(width=W, height=H, pp=pp, backend="auto")
_, _, st = render_image(scene, camera, cfg)
float(np.asarray(st.rays_cast))
t0 = time.perf_counter()
_, _, st2 = render_image(scene, camera, cfg)
rays = float(np.asarray(st2.rays_cast))
dt = time.perf_counter() - t0
n_cl = scene.n_stream_clusters if scene.tri_streamed \
    else len(scene.tri_clusters)
tier = ("dma" if scene.tri_dma else "streamed") if scene.tri_streamed \
    else ("static" if n_cl else "brute")
print(f"ntris={ntris} mode={mode} spp={spp} tier={tier} "
      f"clusters={n_cl} {rays/dt/1e6:.1f} Mrays/s", flush=True)
