"""Repro + fix harness for the trace_fori Mosaic relayout crash (round 5).

World 1's lockstep kernel under the round-4 bounce-fori default fails
Mosaic layout inference: 'Invalid relayout: Non-singleton logical
dimension is replicated in destination but not in source' at the
fori-loop carry (integrator.trace_fori). Renders one 320x180/4spp chunk
with the pallas backend and times compile+run; PT_LOCKSTEP_UNROLL=1
selects the old unrolled driver for comparison.

    python experiments/w1_fori_repro.py [WORLD]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

world = int(sys.argv[1]) if len(sys.argv) > 1 else 1

from pathtracer_tpu.render.renderer import (
    RenderConfig, init_accum, render_chunk, resolve,
)
from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.utils import prng

w, h, pp = 320, 180, 2
scene, camera = finalize_world(world - 1, w, h)
key = prng.base_key(0)
cfg = RenderConfig(width=w, height=h, pp=pp, seed=0, backend="pallas")

t0 = time.perf_counter()
st = render_chunk(scene, camera, cfg, key, np.int32(0), cfg.spp,
                  init_accum(w * h))
img = np.asarray(resolve(st, cfg))
dt = time.perf_counter() - t0
print(f"world={world} compile+run {dt:.1f} s  "
      f"mean={img.mean():.6f} finite={np.isfinite(img).all()}", flush=True)
