"""Compiled-Mosaic smoke for the beyond-reference in-kernel surfaces.

Standalone runner over the canonical feature scenes
(pathtracer_tpu/scene/feature_scenes.py — shared with the RECORDED gate,
`bench.py --verify --json`, which appends a feature block to the
VERIFY_r{N} artifact). Interpret-mode equivalence for each surface
already gates in tests/; this exercises the Mosaic compiler on the real
chip.

Gates: bench.py --verify's flip-fraction thresholds (< 1% of pixels with
|diff| > 1e-3, < 0.1% with |diff| > 0.1). None of these scenes evaluates
an identical expression graph on both backends (windowed fetches /
clustered forms round differently), so bit equality is reported but not
gated.

Usage: python experiments/kernel_surface_smoke.py [WxH] [pp] [interpret]
One JSON line per surface + a final summary; exit nonzero on any FAIL.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import _verify_feature  # noqa: E402
from pathtracer_tpu.scene.feature_scenes import FEATURE_CASES  # noqa: E402


def main(argv):
    # a trailing "interpret" arg runs the XLA:CPU interpret kernel instead
    # (pre-checks the harness off-chip; fma-contraction rounding makes the
    # bit-equal fraction advisory there)
    backend = "pallas"
    if argv and argv[-1] == "interpret":
        backend, argv = "pallas-interpret", argv[:-1]
    size = argv[1] if len(argv) > 1 else "192x108"
    pp = int(argv[2]) if len(argv) > 2 else 4
    w, h = (int(x) for x in size.split("x"))
    all_ok = True
    for name in FEATURE_CASES:
        rec = _verify_feature(name, w, h, pp, backend)
        print(json.dumps(rec), flush=True)
        all_ok = all_ok and rec.get("ok", True)
    print(json.dumps({"metric": "kernel_surface_smoke", "ok": all_ok}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
