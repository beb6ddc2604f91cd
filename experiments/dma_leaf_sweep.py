"""DMA-tier knob sweep at 250k/1M tris, full-screen surface (VERDICT r4
item 6: the roofline says per-tri cost is at the latency floor, so the
scalable lever is visiting fewer triangles — leaf size trades slab/branch
overhead against pruning granularity, SAH against median splits, and
PT_CLUSTER_GROUP pipelines the parent/gparent reduces where most DON'T
descend).

Each arm shells out to experiments/accel_crossover.py (mode=on) with the
knobs in env — one process per arm (knobs are read at build/trace time),
arms back-to-back so tunnel weather is as shared as it gets.

    python experiments/dma_leaf_sweep.py NTRIS [SPP] [SHAPE]

SHAPE: sphere (default, full-screen) | sphere-zoom (localized view).
"""
import os
import re
import subprocess
import sys

ntris = sys.argv[1]
spp = sys.argv[2] if len(sys.argv) > 2 else "4"
shape = sys.argv[3] if len(sys.argv) > 3 else "sphere"

ARMS = [
    ("default (leaf96 sah)", {}),
    ("leaf144", {"PT_LEAF_SIZE": "144"}),
    ("leaf192", {"PT_LEAF_SIZE": "192"}),
    ("leaf64", {"PT_LEAF_SIZE": "64"}),
    ("no-sah", {"PT_NO_SAH": "1"}),
    ("group4 (parent/gparent reduce pipelining)", {"PT_CLUSTER_GROUP": "4"}),
    ("leaf144+group4", {"PT_LEAF_SIZE": "144", "PT_CLUSTER_GROUP": "4"}),
    # front-to-back early-out (round 5): the top-level parent/gparent
    # sweep breaks at the camera-ordered suffix box (bit-equal pruning)
    ("early-out", {"PT_PARENT_EARLY": "1"}),
]
KNOBS = ["PT_LEAF_SIZE", "PT_NO_SAH", "PT_CLUSTER_GROUP", "PT_PARENT_EARLY"]

results = []
for name, envk in ARMS:
    env = dict(os.environ)
    for k in KNOBS:
        env.pop(k, None)
    env.update(envk)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, "experiments/accel_crossover.py", ntris, "on",
         spp, shape],
        capture_output=True, text=True, env=env, timeout=3600)
    m = re.search(r"([0-9.]+) Mrays/s", p.stdout)
    r = float(m.group(1)) if m else float("nan")
    if m is None:
        print(f"{name}: FAILED\n{p.stdout[-300:]}\n{p.stderr[-300:]}",
              flush=True)
    results.append((name, r))
    print(f"{name}: {r:.2f} Mrays/s", flush=True)

print("--- ranked ---")
for name, r in sorted(results, key=lambda x: -(x[1] if x[1] == x[1] else -1)):
    print(f"{r:7.2f}  {name}")
