"""World-7 accel-knob sweep: leaf size / parent group / block rows.

World 7 (mesh-UV, 1472 tris, streamed tier + regen loop) is the one
world below the pro-rated per-chip north star (50.8 vs 62.5 official,
BENCH.md round 4). The structural levers already measured: regen-vs-
lockstep (+47%), row culling (+10%), block rows 32/64/128. This sweeps
the remaining host-side accel knobs — PT_LEAF_SIZE (cluster granularity:
smaller leaves prune more but pay more slab tests + fori iterations),
PT_PARENT_GROUP, PT_BLOCK_ROWS — in ONE process (env is read at
finalize/pallas-call time, bench.bench_world rebuilds per call) so every
config shares tunnel weather. Usage:

    python experiments/w7_sweep.py [SPP] [REPEATS]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import bench

spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

CONFIGS = [
    ("default (leaf96 pg16 rows64)", {}),
    ("leaf32", {"PT_LEAF_SIZE": "32"}),
    ("leaf48", {"PT_LEAF_SIZE": "48"}),
    ("leaf64", {"PT_LEAF_SIZE": "64"}),
    ("leaf144", {"PT_LEAF_SIZE": "144"}),
    ("pg8", {"PT_PARENT_GROUP": "8"}),
    ("pg32", {"PT_PARENT_GROUP": "32"}),
    ("rows96", {"PT_BLOCK_ROWS": "96"}),
    ("leaf48+pg8", {"PT_LEAF_SIZE": "48", "PT_PARENT_GROUP": "8"}),
    # SAH is the DEFAULT; the real A/B is median-split (PT_NO_SAH=1) vs
    # default (the old PT_SAH=1 arms were no-ops measuring the default
    # twice — ADVICE r4)
    ("no-sah (median split)", {"PT_NO_SAH": "1"}),
    ("no-sah+leaf48", {"PT_NO_SAH": "1", "PT_LEAF_SIZE": "48"}),
]

KNOBS = ["PT_LEAF_SIZE", "PT_PARENT_GROUP", "PT_BLOCK_ROWS", "PT_NO_SAH"]
results = []
for name, env in CONFIGS:
    for k in KNOBS:
        os.environ.pop(k, None)
    os.environ.update(env)
    r = bench.bench_world(7, spp, "1280x720", repeats=repeats)
    results.append((name, r))
    print(f"{name}: {r:.1f} Mrays/s", flush=True)

print("--- ranked ---")
for name, r in sorted(results, key=lambda x: -x[1]):
    print(f"{r:7.1f}  {name}")
