#!/bin/bash
# Round-3 on-chip measurement batch (everything that waited out the
# tunnel outage). Run from /root/repo with the axon TPU tunnel up:
#     bash experiments/r03_onchip.sh [OUTDIR]
# Each step logs to OUTDIR (default /tmp/r03) and failures don't stop
# the batch. Re-runnable; steps are independent.
set -u
OUT=${1:-/tmp/r03}
mkdir -p "$OUT"
cd /root/repo
# keep the axon plugin registered AND make `python experiments/x.py`
# resolve the package from the repo root
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

log() { echo "[r03] $(date +%H:%M:%S) $*"; }

log "0. tunnel check"
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "tunnel down"; exit 1; }

log "1. VERIFY artifact (all 7 worlds, kernel-vs-XLA gates)"
timeout 3000 python bench.py --verify --json \
    > VERIFY_r03.json 2> "$OUT/verify.log" \
    && log "   VERIFY_r03.json written (gate ok)" \
    || log "   VERIFY FAILED (see $OUT/verify.log + VERIFY_r03.json)"

log "2. Russian-roulette bench (Cornell 720p)"
timeout 2400 python bench.py --rr --spp 64 > "$OUT/bench_rr.json" 2>&1 \
    || log "   rr bench failed"

log "3. per-world official numbers (64 spp; w6/w7 included)"
for wld in 1 2 3 4 5 6 7; do
    timeout 2400 python bench.py --world $wld --spp 64 \
        > "$OUT/bench_w$wld.json" 2>&1 || log "   world $wld failed"
done

log "4. world 1 with mips"
timeout 2400 python bench.py --world 1 --spp 64 --mips \
    > "$OUT/bench_w1_mips.json" 2>&1 || log "   w1 mips failed"

log "5. crossover with the row-cull level (cloud, on/off ablation)"
for n in 2048 8192 32768 100000; do
    timeout 1800 python experiments/accel_crossover.py $n on 4 \
        > "$OUT/cross_cloud_$n.log" 2>&1 || log "   cloud $n failed"
    PT_NO_ROW_CULL=1 timeout 1800 python experiments/accel_crossover.py \
        $n on 4 > "$OUT/cross_cloud_${n}_norow.log" 2>&1 \
        || log "   cloud $n norow failed"
done

log "6. SURFACE series (the production regime) incl. DMA tier w/ dynamic parents"
for n in 8192 32768 100000 250000 500000; do
    timeout 2400 python experiments/accel_crossover.py $n on 4 sphere \
        > "$OUT/cross_sphere_$n.log" 2>&1 || log "   sphere $n failed"
done

log "7. fog kernel on real Mosaic (jnp.log lowering + god-rays config)"
timeout 1800 python -m pathtracer_tpu -w6 -p4 --size 320x180 \
    --fog 0.0012 --fog-g 0.55 --fog-albedo 0.9,0.9,0.95 \
    --out "$OUT/godrays_chip.png" > "$OUT/fog_kernel.log" 2>&1 \
    && log "   fog kernel ok" || log "   fog kernel FAILED ($OUT/fog_kernel.log)"

log "8. gallery-quality feature demos"
timeout 3000 python experiments/render_feature_demos.py godrays 1024 960x540 \
    > "$OUT/demo_godrays.log" 2>&1 || log "   godrays demo failed"
timeout 3000 python experiments/render_feature_demos.py dispersion 1024 960x540 \
    > "$OUT/demo_dispersion.log" 2>&1 || log "   dispersion demo failed"
timeout 1800 python experiments/render_feature_demos.py denoise 9 960x540 \
    > "$OUT/demo_denoise.log" 2>&1 || log "   denoise demo failed"

log "9. world-2 leaf-size sweep (tile-coherent pinhole blocks may like small leaves)"
for ls in 16 32 64 96; do
    PT_LEAF_SIZE=$ls timeout 2400 python bench.py --world 2 --spp 64 \
        > "$OUT/bench_w2_leaf$ls.json" 2>&1 || log "   w2 leaf $ls failed"
done

log "10. mesh-UV kernel on real Mosaic (new lowering surface: windowed"
log "    uv fetch, streamed uv-row cond-in-fori, clustered uv resolve)"
timeout 1800 python -m pathtracer_tpu -w7 -p4 --size 320x180 \
    --out "$OUT/meshuv_chip.png" > "$OUT/meshuv_kernel.log" 2>&1 \
    && log "   mesh-UV kernel ok" \
    || log "   mesh-UV kernel FAILED ($OUT/meshuv_kernel.log)"

log "11. w7 block-rows sweep (the 128-row textured default was tuned on"
log "    world 1's fetch profile; mesh-UV blocks fetch less per bounce)"
for br in 32 64 128; do
    PT_BLOCK_ROWS=$br timeout 2400 python bench.py --world 7 --spp 64 \
        > "$OUT/bench_w7_rows$br.json" 2>&1 || log "   w7 rows $br failed"
done

log "12. compiled-Mosaic smoke for the round-3 in-kernel surfaces"
log "    (bump height3 fused fetch, TBN rotation, fog, dispersion,"
log "    everything-at-once — interpret equivalence gates exist; this"
log "    is the real-Mosaic lowering check)"
timeout 3000 python experiments/kernel_surface_smoke.py 192x108 4 \
    > "$OUT/surface_smoke.json" 2> "$OUT/surface_smoke.log" \
    && log "   surface smoke ok" \
    || log "   surface smoke FAILED ($OUT/surface_smoke.{json,log})"

log "13. streamed-tier inner-loop shootout (the 'fewer ops per pair'"
log "    lever): outer-vpu (field-major pair tiles), outer-mxu (dot terms"
log "    on the MXU), divfree, static-row — vs the production extract-blk"
timeout 2400 python experiments/stream_extract_micro.py 4608 16 \
    extract-blk,extract-sls,divfree-sls,static-row,outer-vpu,outer-mxu,outer-sub \
    > "$OUT/stream_shootout.log" 2>&1 \
    && log "   shootout ok ($OUT/stream_shootout.log)" \
    || log "   shootout failed"

log "14. field-major streamed tier (PT_FM_TIER=1) vs record rows —"
log "    the production form of the outer-* shootout variants; crossover"
log "    ablation on the cloud + surface series"
for n in 2048 8192 32768 100000; do
    PT_FM_TIER=1 timeout 1800 python experiments/accel_crossover.py $n on 4 \
        > "$OUT/cross_cloud_${n}_fm.log" 2>&1 || log "   fm cloud $n failed"
done
for n in 32768 100000 250000; do
    PT_FM_TIER=1 timeout 2400 python experiments/accel_crossover.py $n on 4 \
        sphere > "$OUT/cross_sphere_${n}_fm.log" 2>&1 \
        || log "   fm sphere $n failed"
done
# fm tile occupancy: default leaf (~62 after median split) leaves half
# of each 128-lane tile as padding; bigger leaves amortize the tile
for ls in 124 248; do
    PT_FM_TIER=1 PT_LEAF_SIZE=$ls timeout 1800 \
        python experiments/accel_crossover.py 32768 on 4 \
        > "$OUT/cross_cloud_32768_fm_leaf$ls.log" 2>&1 \
        || log "   fm leaf $ls failed"
done
PT_FM_TIER=1 timeout 1800 python -m pathtracer_tpu -w7 -p4 --size 320x180 \
    --out "$OUT/meshuv_fm_chip.png" > "$OUT/meshuv_fm.log" 2>&1 \
    && log "   fm mesh-UV kernel ok" || log "   fm mesh-UV kernel FAILED"

log "done; results in $OUT (bench_*.json, cross_*.log) + VERIFY_r03.json + images/"
