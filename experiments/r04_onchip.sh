#!/bin/bash
# Round-4 on-chip measurement batch — drains the round-3 measurement debt
# (VERDICT round 3 items 1-4) in priority order. Run from /root/repo with
# the axon TPU tunnel up:
#     bash experiments/r04_onchip.sh [OUTDIR]
# RESUMABLE: each step writes $OUT/done/<file> on success and is skipped
# on re-run. On any step failure the script probes the tunnel and exits 2
# if it is down (re-run when it returns). Output filenames match what
# experiments/r04_summarize.py parses.
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

# ---- priority 1: official 1024-spp per-world table (VERDICT item 1) ----
log "1. per-world OFFICIAL numbers (full 1024-spp north-star workload)"
for wld in 3 1 2 4 5 6 7; do
    run_step "bench_w${wld}_full.json" 2400 python bench.py --world $wld
done

# ---- priority 2: streamed inner-loop ranking (VERDICT item 2) ----------
log "2. streamed-tier inner-loop shootout (rank fm/outer-mxu/record on chip)"
run_step stream_shootout.log 2400 python experiments/stream_extract_micro.py \
    4608 16 extract-blk,extract-sls,divfree-sls,static-row,outer-vpu,outer-mxu,outer-sub

log "3. field-major streamed tier (PT_FM_TIER=1) vs record rows"
for n in 2048 8192 32768 100000; do
    run_step "cross_cloud_${n}_fm.log" 1800 env PT_FM_TIER=1 \
        python experiments/accel_crossover.py $n on 4
done
for n in 32768 100000 250000; do
    run_step "cross_sphere_${n}_fm.log" 2400 env PT_FM_TIER=1 \
        python experiments/accel_crossover.py $n on 4 sphere
done

# ---- priority 3: DMA tier at its cap (VERDICT item 3) -------------------
log "4. SURFACE series (production regime) incl. DMA tier w/ dynamic parents"
for n in 8192 32768 100000 250000 500000 1000000; do
    run_step "cross_sphere_$n.log" 3600 python experiments/accel_crossover.py $n on 4 sphere
done

# ---- priority 4: feature bench lines (round-2 verdict "done" criteria) --
log "5. Russian-roulette + mips bench lines (Cornell / world 1, 64 spp)"
run_step bench_rr.json 2400 python bench.py --rr --spp 64
run_step bench_w1_mips.json 2400 python bench.py --world 1 --spp 64 --mips

# ---- priority 5: compiled-Mosaic smoke for round-3 kernel surfaces ------
log "6. kernel surface smoke (bump/TBN/fog/dispersion/everything, compiled)"
run_step surface_smoke.json 3000 python experiments/kernel_surface_smoke.py 192x108 4

# ---- priority 6: row-cull crossover re-measure (cloud on/off ablation) --
log "7. crossover with the row-cull level (cloud, on/off ablation)"
for n in 2048 8192 32768 100000; do
    run_step "cross_cloud_$n.log" 1800 python experiments/accel_crossover.py $n on 4
    run_step "cross_cloud_${n}_norow.log" 1800 env PT_NO_ROW_CULL=1 \
        python experiments/accel_crossover.py $n on 4
done

# ---- priority 7: tuning sweeps -------------------------------------------
log "8. world-2 leaf-size sweep"
for ls in 16 32 64 96; do
    run_step "bench_w2_leaf$ls.json" 2400 env PT_LEAF_SIZE=$ls \
        python bench.py --world 2 --spp 64
done

log "9. w7 block-rows sweep"
for br in 32 64 128; do
    run_step "bench_w7_rows$br.json" 2400 env PT_BLOCK_ROWS=$br \
        python bench.py --world 7 --spp 64
done

log "10. fm-tier leaf sweep (cloud 32k)"
for ls in 124 248; do
    run_step "cross_cloud_32768_fm_leaf$ls.log" 1800 env PT_FM_TIER=1 PT_LEAF_SIZE=$ls \
        python experiments/accel_crossover.py 32768 on 4
done

log "done; results in $OUT (*.log, *.json)"
