"""Summarize the round-3 on-chip batch (experiments/r03_onchip.sh) output.

Usage: python experiments/r03_summarize.py [OUTDIR]

Scans OUTDIR (default /tmp/r03) plus VERIFY_r03.json in the repo root and
prints ready-to-paste markdown tables for BENCH.md: per-world officials,
the RR line, the world-1 mips ablation, the crossover series (cloud /
sphere, row-cull + fm-tier ablations), the leaf/rows sweeps, the
surface-smoke gate, and the streamed-tier shootout ranking. Every file is
optional — missing or failed steps print as absent so a partial batch
still summarizes. No TPU needed; this is pure log parsing.
"""
import json
import re
import sys
from pathlib import Path

out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r03")
repo = Path(__file__).resolve().parent.parent


def last_json(path):
    """The last parseable JSON object line in a (possibly noisy) log."""
    try:
        lines = path.read_text(errors="replace").splitlines()
    except OSError:
        return None
    for ln in reversed(lines):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    return None


def cross_lines(path):
    """All 'ntris=N mode=M spp=S tier=T clusters=C X Mrays/s' records."""
    try:
        text = path.read_text(errors="replace")
    except OSError:
        return []
    pat = re.compile(
        r"ntris=(\d+) mode=(\w+) spp=(\d+) tier=(\S+) "
        r"clusters=(\d+) ([\d.]+) Mrays/s")
    return [
        dict(ntris=int(m[1]), mode=m[2], spp=int(m[3]), tier=m[4],
             clusters=int(m[5]), mrays=float(m[6]))
        for m in (pat.match(ln.strip()) for ln in text.splitlines()) if m]


print(f"# r03 on-chip batch summary  (dir: {out})\n")

# --- 1. per-world officials -------------------------------------------
rows = []
for w in range(1, 8):
    rec = last_json(out / f"bench_w{w}.json")
    rows.append((w, rec))
if any(r for _, r in rows):
    print("## Per-world officials (bench.py --world K --spp 64)\n")
    print("| world | Mrays/s | vs_baseline |")
    print("|---|---|---|")
    for w, rec in rows:
        if rec and "error" not in rec:
            print(f"| {w} | {rec['value']:.1f} | {rec['vs_baseline']:.2f}x |")
        else:
            why = (rec or {}).get("error", "absent/failed")
            print(f"| {w} | — | {why} |")
    print()

rr = last_json(out / "bench_rr.json")
if rr:
    tag = "" if "error" not in rr else f"  ({rr['error']})"
    print(f"RR bench (Cornell 720p, --rr): **{rr['value']:.1f} Mrays/s**"
          f" ({rr['vs_baseline']:.2f}x baseline){tag}\n")

mips = last_json(out / "bench_w1_mips.json")
w1 = last_json(out / "bench_w1.json")
if mips and "error" not in mips:
    base = f" vs {w1['value']:.1f} mip-0" if w1 and "error" not in w1 else ""
    print(f"World 1 --mips: **{mips['value']:.1f} Mrays/s**{base}\n")

# --- 2. crossover series ----------------------------------------------
series = [
    ("cloud (row-cull ON, shipping)", "cross_cloud_{n}.log",
     [2048, 8192, 32768, 100000]),
    ("cloud PT_NO_ROW_CULL=1", "cross_cloud_{n}_norow.log",
     [2048, 8192, 32768, 100000]),
    ("cloud PT_FM_TIER=1", "cross_cloud_{n}_fm.log",
     [2048, 8192, 32768, 100000]),
    ("sphere SURFACE (production regime)", "cross_sphere_{n}.log",
     [8192, 32768, 100000, 250000, 500000]),
    ("sphere PT_FM_TIER=1", "cross_sphere_{n}_fm.log",
     [32768, 100000, 250000]),
]
any_cross = False
for title, pattern, ns in series:
    recs = {}
    for n in ns:
        for r in cross_lines(out / pattern.format(n=n)):
            recs[n] = r
    if not recs:
        continue
    if not any_cross:
        print("## Crossover (experiments/accel_crossover.py, 640x360 @4spp)\n")
        any_cross = True
    print(f"### {title}\n")
    print("| ntris | tier | clusters | Mrays/s |")
    print("|---|---|---|---|")
    for n in ns:
        r = recs.get(n)
        if r:
            print(f"| {n} | {r['tier']} | {r['clusters']} "
                  f"| {r['mrays']:.2f} |")
        else:
            print(f"| {n} | — | — | absent/failed |")
    print()

fmleaf = {}
for ls in (124, 248):
    for r in cross_lines(out / f"cross_cloud_32768_fm_leaf{ls}.log"):
        fmleaf[ls] = r
if fmleaf:
    print("### fm tile occupancy (cloud 32768, PT_LEAF_SIZE)\n")
    print("| leaf | Mrays/s |")
    print("|---|---|")
    for ls, r in sorted(fmleaf.items()):
        print(f"| {ls} | {r['mrays']:.2f} |")
    print()

# --- 3. sweeps ----------------------------------------------------------
for title, pat, vals in (
        ("World 2 leaf-size sweep (PT_LEAF_SIZE)", "bench_w2_leaf{v}.json",
         [16, 32, 64, 96]),
        ("World 7 block-rows sweep (PT_BLOCK_ROWS)", "bench_w7_rows{v}.json",
         [32, 64, 128])):
    recs = {v: last_json(out / pat.format(v=v)) for v in vals}
    if any(recs.values()):
        print(f"## {title}\n")
        print("| value | Mrays/s |")
        print("|---|---|")
        for v in vals:
            r = recs[v]
            cell = (f"{r['value']:.1f}" if r and "error" not in r
                    else "absent/failed")
            print(f"| {v} | {cell} |")
        print()

# --- 4. verify gate ------------------------------------------------------
ver = last_json(repo / "VERIFY_r03.json") or last_json(out / "verify.log")
if ver and "worlds" in ver:
    print("## VERIFY_r03.json (bench.py --verify --json)\n")
    print("| world | bit-equal | >1e-3 | >0.1 | identical graph | gate |")
    print("|---|---|---|---|---|---|")
    for r in ver["worlds"]:
        w = r.get("world", "?")
        if "skipped" in r:
            print(f"| {w} | — | — | — | — | SKIP ({r['skipped']}) |")
            continue
        print(f"| {w} | {100 * r.get('bit_equal_frac', 0):.1f}% "
              f"| {100 * r.get('frac_gt_1e-3', 0):.3f}% "
              f"| {100 * r.get('frac_gt_0.1', 0):.4f}% "
              f"| {'yes' if r.get('identical_graph') else 'no'} "
              f"| {'PASS' if r.get('ok') else 'FAIL'} |")
    print(f"\nOverall: {'PASS' if ver.get('ok') else 'FAIL'}"
          f"  (backend={ver.get('backend')}, size={ver.get('size')})\n")

# --- 5. surface smoke + shootout (pass-through) --------------------------
smoke = out / "surface_smoke.json"
if smoke.exists():
    print("## Compiled-Mosaic surface smoke\n```")
    for ln in smoke.read_text(errors="replace").splitlines():
        if ln.strip().startswith("{"):
            print(ln.strip())
    print("```\n")

shoot = out / "stream_shootout.log"
if shoot.exists():
    print("## Streamed-tier inner-loop shootout\n```")
    for ln in shoot.read_text(errors="replace").splitlines():
        if re.search(r"ns/tri|FAILED|A==|A~=", ln):
            print(ln.rstrip())
    print("```\n")

# --- 6. kernel render steps (ok / failed) --------------------------------
print("## One-shot kernel steps\n")
for name, logf, img in (
        ("fog/god-rays kernel (w6)", "fog_kernel.log", "godrays_chip.png"),
        ("mesh-UV kernel (w7)", "meshuv_kernel.log", "meshuv_chip.png"),
        ("fm mesh-UV kernel (w7)", "meshuv_fm.log", "meshuv_fm_chip.png")):
    lp, ip = out / logf, out / img
    if not lp.exists():
        print(f"- {name}: absent")
        continue
    txt = lp.read_text(errors="replace")
    ok = "Done. Image written" in txt and ip.exists()
    tail = txt.strip().splitlines()[-1][:120] if txt.strip() else ""
    print(f"- {name}: {'OK' if ok else 'FAILED'} ({ip if ok else tail})")
print()
