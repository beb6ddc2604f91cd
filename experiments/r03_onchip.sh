#!/bin/bash
# Round-3 on-chip measurement batch (everything that waited out the
# tunnel outage). Run from /root/repo with the axon TPU tunnel up:
#     bash experiments/r03_onchip.sh [OUTDIR]
# RESUMABLE: each step writes $OUT/done/<file> on success and is skipped
# on re-run. The tunnel has been flaky; after any step failure the script
# probes the tunnel and exits 2 if it is down (re-run when it returns)
# instead of burning hours of per-step timeouts. Steps are ordered by
# priority: VERIFY artifact, per-world officials, the fm/shootout
# decisions, then everything else. Output filenames match what
# experiments/r03_summarize.py parses.
set -u
OUT=${1:-/tmp/r03}
mkdir -p "$OUT" "$OUT/done"
cd /root/repo
# keep the axon plugin registered AND make `python experiments/x.py`
# resolve the package from the repo root
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

log() { echo "[r03] $(date +%H:%M:%S) $*"; }

tunnel_ok() {
    timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

# run_step <outfile> <timeout_s> <cmd...> — writes $OUT/<outfile>
# (stdout+stderr), skips if done, and on failure probes the tunnel,
# aborting the whole batch (exit 2) if it is down.
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

# ---- priority 1: the committed verify artifact -------------------------
if [ -e "$OUT/done/verify" ]; then log "skip verify (done)"; else
    log "1. VERIFY artifact (all 7 worlds, kernel-vs-XLA gates)"
    if timeout 3000 python bench.py --verify --json \
        > VERIFY_r03.json 2> "$OUT/verify.log"; then
        touch "$OUT/done/verify"; log "   VERIFY_r03.json written (gate ok)"
    else
        log "   VERIFY FAILED (see $OUT/verify.log + VERIFY_r03.json)"
        tunnel_ok || { log "tunnel DOWN — aborting"; exit 2; }
    fi
fi

# ---- priority 2: per-world official numbers ----------------------------
log "2. per-world official numbers (64 spp; w6/w7 included)"
for wld in 3 1 2 4 5 6 7; do
    run_step "bench_w$wld.json" 2400 python bench.py --world $wld --spp 64
done

# ---- priority 3: the two round-3 decisions (stream shootout + fm tier) --
log "3. streamed-tier inner-loop shootout (fewer ops per pair lever)"
run_step stream_shootout.log 2400 python experiments/stream_extract_micro.py \
    4608 16 extract-blk,extract-sls,divfree-sls,static-row,outer-vpu,outer-mxu,outer-sub

log "4. field-major streamed tier (PT_FM_TIER=1) vs record rows"
for n in 2048 8192 32768 100000; do
    run_step "cross_cloud_${n}_fm.log" 1800 env PT_FM_TIER=1 \
        python experiments/accel_crossover.py $n on 4
done
for n in 32768 100000 250000; do
    run_step "cross_sphere_${n}_fm.log" 2400 env PT_FM_TIER=1 \
        python experiments/accel_crossover.py $n on 4 sphere
done
for ls in 124 248; do
    run_step "cross_cloud_32768_fm_leaf$ls.log" 1800 env PT_FM_TIER=1 PT_LEAF_SIZE=$ls \
        python experiments/accel_crossover.py 32768 on 4
done
run_step meshuv_fm.log 1800 env PT_FM_TIER=1 python -m pathtracer_tpu -w7 -p4 \
    --size 320x180 --out "$OUT/meshuv_fm_chip.png"

# ---- the rest, in the original order ------------------------------------
log "5. Russian-roulette bench (Cornell 720p)"
run_step bench_rr.json 2400 python bench.py --rr --spp 64

log "6. world 1 with mips"
run_step bench_w1_mips.json 2400 python bench.py --world 1 --spp 64 --mips

log "7. crossover with the row-cull level (cloud, on/off ablation)"
for n in 2048 8192 32768 100000; do
    run_step "cross_cloud_$n.log" 1800 python experiments/accel_crossover.py $n on 4
    run_step "cross_cloud_${n}_norow.log" 1800 env PT_NO_ROW_CULL=1 \
        python experiments/accel_crossover.py $n on 4
done

log "8. SURFACE series (the production regime) incl. DMA tier w/ dynamic parents"
for n in 8192 32768 100000 250000 500000; do
    run_step "cross_sphere_$n.log" 2400 python experiments/accel_crossover.py $n on 4 sphere
done

log "9. fog kernel on real Mosaic (jnp.log lowering + god-rays config)"
run_step fog_kernel.log 1800 python -m pathtracer_tpu -w6 -p4 --size 320x180 \
    --fog 0.0012 --fog-g 0.55 --fog-albedo 0.9,0.9,0.95 \
    --out "$OUT/godrays_chip.png"

log "10. gallery-quality feature demos"
run_step demo_godrays.log 3000 python experiments/render_feature_demos.py godrays 1024 960x540
run_step demo_dispersion.log 3000 python experiments/render_feature_demos.py dispersion 1024 960x540
run_step demo_denoise.log 1800 python experiments/render_feature_demos.py denoise 9 960x540

log "11. world-2 leaf-size sweep (tile-coherent pinhole blocks may like small leaves)"
for ls in 16 32 64 96; do
    run_step "bench_w2_leaf$ls.json" 2400 env PT_LEAF_SIZE=$ls \
        python bench.py --world 2 --spp 64
done

log "12. mesh-UV kernel on real Mosaic (windowed uv fetch, streamed uv-row"
log "    cond-in-fori, clustered uv resolve)"
run_step meshuv_kernel.log 1800 python -m pathtracer_tpu -w7 -p4 --size 320x180 \
    --out "$OUT/meshuv_chip.png"

log "13. w7 block-rows sweep (the 128-row textured default was tuned on"
log "    world 1's fetch profile; mesh-UV blocks fetch less per bounce)"
for br in 32 64 128; do
    run_step "bench_w7_rows$br.json" 2400 env PT_BLOCK_ROWS=$br \
        python bench.py --world 7 --spp 64
done

log "14. compiled-Mosaic smoke for the round-3 in-kernel surfaces (bump"
log "    height3 fused fetch, TBN rotation, fog, dispersion, all-at-once)"
run_step surface_smoke.json 3000 python experiments/kernel_surface_smoke.py 192x108 4

log "done; results in $OUT (*.log, *.json) + VERIFY_r03.json + images/"
