"""How does world 1's Mosaic compile time scale with unrolled body size?

World 1's kernel is the tree's biggest compile (504 s, VERIFY_r04.json)
— the lockstep sample loop's body is integrator.trace, which unrolls
MAX_BOUNCE_COUNT copies of intersect+shade+windowed-texture-fetch. This
patches integrator.MAX_BOUNCE_COUNT to 1/2/3/4 and times a fresh
compile+run of the 320x180 verify chunk each time (jax.clear_caches()
between runs). Linear scaling => a bounce-fori driver saves ~4x;
superlinear => more. The nb=4 run also re-checks the standing 504 s
figure. Timing includes the (small) run; the compile dominates.

    python experiments/w1_compile_scaling.py [WORLD]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

world = int(sys.argv[1]) if len(sys.argv) > 1 else 1

from pathtracer_tpu.render.renderer import (
    RenderConfig, init_accum, render_chunk,
)
from pathtracer_tpu.render import integrator as integ
from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.utils import prng

w, h, pp = 320, 180, 2
scene, camera = finalize_world(world - 1, w, h)
key = prng.base_key(0)
cfg = RenderConfig(width=w, height=h, pp=pp, seed=0, backend="pallas")

for nb in (1, 2, 3, 4):
    integ.MAX_BOUNCE_COUNT = nb
    jax.clear_caches()
    t0 = time.perf_counter()
    st = render_chunk(scene, camera, cfg, key, np.int32(0), cfg.spp,
                      init_accum(w * h))
    float(np.asarray(st.rays_cast))
    print(f"bounces={nb} compile+run {time.perf_counter() - t0:.1f} s",
          flush=True)
