"""Measure the clustered-vs-brute crossover on synthetic meshes.

Usage: python experiments/accel_crossover.py NTRIS MODE [SPP]
MODE: on | off   (scene/clusters.py packet culling vs plain unrolled)

Scene: NTRIS random small triangles uniformly in a 20-unit cube (the
spatial regime clustering likes least — no large occluders), a sky light,
an emissive NEE sphere, a ground plane. 640x360 render, backend="auto":
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
base = (rng.rand(ntris, 1, 3) - 0.5) * 20.0
tris = (base + (rng.rand(ntris, 3, 3) - 0.5) * 0.8).astype(np.float32)
b.set_mesh(tris.reshape(-1, 3), np.full((ntris * 3,), m, np.int32))
floor = b.add_material(albedo=(0.4, 0.4, 0.45), roughness=0.9)
b.add_plane((0, 0, 1), 10.0, floor)

W, H = 640, 360
scene = b.finalize()
camera = define_camera((0, -30, 4), (0, 0, 0), 35.0, W, H)
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
tier = "streamed" if scene.tri_streamed else ("static" if n_cl else "brute")
print(f"ntris={ntris} mode={mode} spp={spp} tier={tier} "
      f"clusters={n_cl} {rays/dt/1e6:.1f} Mrays/s", flush=True)
