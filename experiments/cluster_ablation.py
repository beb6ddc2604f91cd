"""Ablate the packet-culling pipeline on the real chip.

Usage: python experiments/cluster_ablation.py WORLD MODE [SPP]
MODE: on | off | force
  on    = clusters + lax.cond skipping (the shipping path)
  off   = no clusters at all (plain unrolled brute loops)
  force = clusters present but every cond taken (isolates branch/reduce
          overhead from pruning benefit: force-on == off + overhead)
Prints one line with synced Mrays/s.
"""
import sys
import time

import numpy as np

world = int(sys.argv[1])
mode = sys.argv[2]
spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16

from pathtracer_tpu.scene import clusters as clu
from pathtracer_tpu.ops import intersect as isect

if mode == "off":
    clu.CLUSTER_MIN = 10**9  # nothing clusters
elif mode == "force":
    isect.FORCE_CLUSTERS = True

from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.render.renderer import RenderConfig, render_image

pp = int(round(spp ** 0.5))
scene, camera = finalize_world(world - 1, 1280, 720)
cfg = RenderConfig(width=1280, height=720, pp=pp, backend="pallas")
_, _, st = render_image(scene, camera, cfg)
float(np.asarray(st.rays_cast))
t0 = time.perf_counter()
_, _, st2 = render_image(scene, camera, cfg)
rays2 = float(np.asarray(st2.rays_cast))
dt = time.perf_counter() - t0
print(f"world={world} mode={mode} spp={spp} {rays2/dt/1e6:.1f} Mrays/s",
      flush=True)
