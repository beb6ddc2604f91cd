#!/bin/bash
# Round-4 on-chip batch: everything the round-3 verdict asks for beyond
# the r03 backlog. Run AFTER experiments/r03_onchip.sh has drained (and
# after re-running it once so the fm-tier steps retry with the fixed
# static-chunk slices):
#     bash experiments/r03_onchip.sh /tmp/r03     # drains + fm retries
#     bash experiments/r04_onchip.sh [OUTDIR]     # default /tmp/r04
# Same resumable run_step discipline as r03 (done-markers, tunnel probe,
# priority order).
set -u
OUT=${1:-/tmp/r04}
mkdir -p "$OUT" "$OUT/done"
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

log() { echo "[r04] $(date +%H:%M:%S) $*"; }

tunnel_ok() {
    timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_step() {
    local f=$1 tmo=$2; shift 2
    if [ -e "$OUT/done/$f" ]; then log "skip $f (done)"; return 0; fi
    log "step $f"
    if timeout "$tmo" "$@" > "$OUT/$f" 2>&1; then
        touch "$OUT/done/$f"; log "   $f ok"
    else
        log "   $f FAILED ($OUT/$f)"
        if ! tunnel_ok; then
            log "tunnel DOWN — aborting batch; re-run to resume"; exit 2
        fi
    fi
}

log "0. tunnel check"
tunnel_ok || { echo "tunnel down"; exit 2; }

# ---- priority 1: the round-4 verify artifact (worlds + FEATURE block) --
if [ -e "$OUT/done/verify" ]; then log "skip verify (done)"; else
    log "1. VERIFY_r04.json (7 worlds + bump/tbn/fog/dispersion/everything)"
    if timeout 4800 python bench.py --verify --json \
        > VERIFY_r04.json 2> "$OUT/verify.log"; then
        touch "$OUT/done/verify"; log "   VERIFY_r04.json written (gate ok)"
    else
        log "   VERIFY FAILED (see $OUT/verify.log + VERIFY_r04.json)"
        tunnel_ok || { log "tunnel DOWN — aborting"; exit 2; }
    fi
fi

# ---- priority 2: official 1024-spp per-world table (BENCH.md standard) -
log "2. official 1024-spp per-world numbers (the round-2-table workload)"
for wld in 3 1 2 4 5 6 7; do
    run_step "official_w$wld.json" 3600 python bench.py --world $wld
done

# ---- priority 3: shootout variants individually (clean errors) ---------
log "3. shootout variants one process each (isolate compile-helper 500s)"
for v in outer-sub extract-sls divfree-sls static-row outer-vpu outer-mxu; do
    run_step "shootout_$v.log" 1800 python experiments/stream_extract_micro.py \
        4608 16 "$v"
done
run_step shootout_blk_ref.log 1800 python experiments/stream_extract_micro.py \
    4608 16 extract-blk

# ---- priority 4: mesh scale to the DMA cap (verdict item 3) ------------
log "4. 1M-tri DMA tier (dynamic parents) + the 500k point if r03 missed it"
run_step cross_sphere_500000.log 3000 python experiments/accel_crossover.py \
    500000 on 4 sphere
run_step cross_sphere_1000000.log 3600 python experiments/accel_crossover.py \
    1000000 on 4 sphere

# ---- priority 5: fm tier on chip (fixed static-chunk slices) -----------
log "5. fm tier retry (post-fix) — decisive yes/no on the (R,1) relayout"
run_step fm_cloud_32768.log 1800 env PT_FM_TIER=1 \
    python experiments/accel_crossover.py 32768 on 4
run_step fm_sphere_250000.log 2400 env PT_FM_TIER=1 \
    python experiments/accel_crossover.py 250000 on 4 sphere

# ---- priority 5b: world 7 on the static clustered tier ------------------
# w7 is 1472 tris — just past STREAM_MIN (1024). The clustered static
# tier supports mesh UVs (deferred post-LUT interpolation) and world 5
# (752 tris static) runs 3.6x faster per-world; test whether the static
# tier + raised Mosaic unroll budget beats the streamed tier at w7 scale.
log "5b. world 7 static-tier experiment (PT_STREAM_MIN=2048)"
run_step bench_w7_static.json 3600 env PT_STREAM_MIN=2048 \
    PT_UNROLL_MAX_KERNEL=2048 python bench.py --world 7 --spp 64
run_step bench_w7_default_postrowcull.json 2400 python bench.py --world 7 --spp 64

# ---- priority 6: roofline calibration (verdict item 6) -----------------
log "6. empirical VPU/HBM peaks for the BENCH.md MFU section"
run_step vpu_roofline.log 1800 python experiments/vpu_roofline_micro.py 2048

log "done; results in $OUT + VERIFY_r04.json"
