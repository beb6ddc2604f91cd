"""Benchmark: Mrays/sec on the Cornell box (BASELINE.json headline metric).

Workload: Cornell box (world 3), 1280x720. Measures steady-state ray
throughput of the full wavefront pipeline (raygen -> intersect -> shade ->
accumulate) after a warmup chunk, then prints ONE JSON line:

    {"metric": "Mrays/sec", "value": N, "unit": "Mrays/s", "vs_baseline": R}

vs_baseline is against the 500 Mrays/sec v5e-8 north-star target
(BASELINE.json); on a single chip the pro-rated share of that target is
62.5 Mrays/sec, so vs_baseline > 0.125 on one chip beats the target.
The reference itself publishes no numbers (BASELINE.md).

Flags: --spp N (default 64 measured samples), --full (render the whole
1024-spp north-star workload and also report wall-clock), --world K,
--size WxH.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1024,
                    help="measured samples per pixel (default: the full "
                         "1024-spp north-star workload)")
    ap.add_argument("--full", action="store_true",
                    help="run the full 1024-spp north-star workload")
    ap.add_argument("--world", type=int, default=3, help="1-based world number")
    ap.add_argument("--size", default="1280x720")
    ap.add_argument("--sharded", action="store_true",
                    help="shard over all devices (default: single chip)")
    args = ap.parse_args(argv)

    import jax
    from pathtracer_tpu.render.renderer import (
        RenderConfig, init_accum, render_chunk,
    )
    from pathtracer_tpu.scene.worlds import finalize_world
    from pathtracer_tpu.utils import prng

    w, h = (int(x) for x in args.size.split("x"))
    world = args.world - 1
    scene, camera = finalize_world(world, w, h)

    spp = 1024 if args.full else args.spp
    pp = int(round(spp ** 0.5))
    config = RenderConfig(width=w, height=h, pp=pp, seed=0)
    key = prng.base_key(0)

    if args.sharded and len(jax.devices()) > 1:
        from pathtracer_tpu.parallel.shard import render_image_sharded
        # warmup/compile
        warm_cfg = RenderConfig(width=w, height=h, pp=1, seed=0)
        render_image_sharded(scene, camera, warm_cfg)
        t0 = time.perf_counter()
        img, packed, state = render_image_sharded(scene, camera, config)
        jax.block_until_ready(packed)
        wall = time.perf_counter() - t0
        rays = float(np.asarray(state.rays_cast))
    else:
        # compile the measured chunk size on a throwaway accumulator, then
        # time the steady-state dispatch (donated state, single device call)
        n_meas = config.spp
        warm = render_chunk(scene, camera, config, key, np.int32(0), n_meas,
                            init_accum(w * h))
        float(np.asarray(warm.rays_cast))  # hard sync: compile + first run done
        state = init_accum(w * h)
        t0 = time.perf_counter()
        state = render_chunk(
            scene, camera, config, key, np.int32(0), n_meas, state)
        # hard sync via value fetch (block_until_ready can return early on
        # tunneled platforms)
        rays = float(np.asarray(state.rays_cast))
        wall = time.perf_counter() - t0

    mrays = rays / wall / 1e6
    target = 500.0  # Mrays/sec on v5e-8 (BASELINE.json north star)
    print(json.dumps({
        "metric": "Mrays/sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / target, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
