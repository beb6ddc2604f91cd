"""Sweep the block-coherence knobs on the real chip.

Usage: python experiments/coherence_sweep.py WORLD SUB [ROWS] [SPP] [LEAF]
Prints one line: world sub rows spp leaf Mrays/s (synced timing).

Knobs: _SUB_CHUNK_SAMPLES (samples per kernel dispatch; lockstep restart
cadence), block rows, and the cluster leaf size. Run each config in its
own process — the constants bake into the jitted kernel.
"""
import sys
import time

import numpy as np

world = int(sys.argv[1])
sub = int(sys.argv[2])
rows = int(sys.argv[3]) if len(sys.argv) > 3 else 0
spp = int(sys.argv[4]) if len(sys.argv) > 4 else 16
leaf = int(sys.argv[5]) if len(sys.argv) > 5 else 0

from pathtracer_tpu.render import pallas_backend as pb
pb._SUB_CHUNK_SAMPLES = sub
if rows:
    pb._BLOCK_ROWS_TEXTURED = rows
    pb._BLOCK_ROWS = rows
if leaf:
    from pathtracer_tpu.scene import clusters as clu
    clu.LEAF_SIZE = leaf

from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.render.renderer import RenderConfig, render_image

pp = int(round(spp ** 0.5))
scene, camera = finalize_world(world - 1, 1280, 720)
cfg = RenderConfig(width=1280, height=720, pp=pp, backend="pallas")
_, _, st = render_image(scene, camera, cfg)  # compile + warmup
rays = float(np.asarray(st.rays_cast))       # value fetch = sync
t0 = time.perf_counter()
_, _, st2 = render_image(scene, camera, cfg)
rays2 = float(np.asarray(st2.rays_cast))     # sync
dt = time.perf_counter() - t0
print(f"world={world} sub={sub} rows={rows or 'dflt'} spp={spp} "
      f"leaf={leaf or 'dflt'} {rays2/dt/1e6:.1f} Mrays/s", flush=True)
