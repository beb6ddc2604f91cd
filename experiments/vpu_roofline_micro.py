"""Empirical VPU/HBM roofline calibration for the BENCH.md MFU section.

The round-3 verdict (item 6) asks for a roofline that ties the measured
renderer rates (Cornell's ~1550 Mrays/s, the streamed tier's ~1.5 us/tri
extraction floor) to hardware limits "reviewers can check". Spec sheets
don't give the v5e VPU's sustained f32 issue rate under real operand
mixes, so this measures it:

  fma-peak   : 8 independent (8,128)-vreg fma streams, 8 rounds unrolled
               per rep — the empirical elementwise FLOP ceiling. Live set
               ~12 vregs (v1 of this micro carried (256,128) streams =
               64+ vregs of accumulators and measured SPILLS, not issue).
  isect-mix  : the triangle-test op mix (mul/add/compare/select) on one
               vreg — what intersection code can sustain per op.
  min-reduce : lane-min + compare + select (the deferred-winner pattern).
  hbm-stream : fori_loop of elementwise passes over a 256 MB array (the
               loop defeats pass fusion) — sustained HBM read+write.
               Syncs via a SCALAR fetch (v1 pulled the whole 256 MB back
               through the tunnel and measured the tunnel, not HBM).

Usage: python experiments/vpu_roofline_micro.py [REPS]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = bool(os.environ.get("PT_MICRO_INTERPRET"))  # CPU check mode
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
ROWS, LANES = 8, 128
N = ROWS * LANES  # f32 elements per vreg-shaped op


def _timed(name, call, args, flops_per_rep, unit="FLOP"):
    f = jax.jit(call)
    out = f(*args)
    float(np.asarray(out).sum())  # compile + sync
    t0 = time.perf_counter()
    out = f(*args)
    s = float(np.asarray(out).sum())  # value-fetch sync (tunnel-safe)
    dt = time.perf_counter() - t0
    rate = flops_per_rep * REPS / dt
    print(f"{name:10s}: {dt*1e3:8.2f} ms  {rate/1e12:7.3f} T{unit}/s"
          f"  (sum {s:.3g})", flush=True)
    return rate


def kernel_fma_peak():
    # 8 independent vreg fma streams, 8 rounds each = 64 fmas/elem/rep;
    # live set ~12 vregs so nothing spills.
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(r, accs):
            c = a + r.astype(jnp.float32) * 1e-9
            for _ in range(8):
                accs = tuple(acc * 0.999999 + b * c for acc in accs)
            return accs

        accs = jax.lax.fori_loop(
            0, REPS, body, tuple(a * (1.0 + 0.01 * i) for i in range(8)))
        o_ref[:] = sum(accs)
    return kern, 2 * 64 * N  # 2 FLOP per fma, 8 streams x 8 rounds


def kernel_isect_mix():
    # ~35-op triangle-test shaped mix on one vreg: 12 fma-ish terms,
    # div-free compare/select tail — the realistic per-op rate for
    # intersection code (carries 2 vregs).
    def kern(a_ref, b_ref, o_ref):
        ox = a_ref[:]
        dx = b_ref[:]

        def body(r, cc):
            t_best, w = cc
            f0 = dx * 1.0001 + r.astype(jnp.float32) * 1e-9
            denom = f0 * dx + ox * 0.5
            valid = (denom < -1e-6) | (denom > 1e-6)
            t = (f0 - (f0 * ox + ox)) * jnp.where(valid, denom, 1.0)
            alpha = (f0 * ox - dx) + t * (f0 * dx + ox)
            beta = (dx * ox - f0) + t * (dx * dx + f0)
            hit = (valid & (alpha >= 0.0) & (beta >= 0.0)
                   & ((alpha + beta) <= 1.0) & (t > 1e-4))
            tm = jnp.where(hit, t, jnp.float32(3.4e38))
            imp = tm < t_best
            return jnp.where(imp, tm, t_best), jnp.where(imp, f0, w)

        t_best, w = jax.lax.fori_loop(
            0, REPS, body,
            (jnp.full((ROWS, LANES), 3.4e38, jnp.float32), ox * 0.0))
        o_ref[:] = jnp.where(t_best > 1e30, 0.0, t_best) + w
    # ops in body: ~35 vector ops (count in source)
    return kern, 35 * N


def kernel_min_reduce():
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]

        def body(r, acc):
            tm = a * (1.0 + r.astype(jnp.float32) * 1e-9)
            tb = jnp.min(tm, axis=1, keepdims=True)
            imp = tb < acc[:, :1]
            return jnp.where(imp, tb, acc[:, :1]) + acc * 0.0

        acc = jax.lax.fori_loop(
            0, REPS, body, jnp.full((ROWS, LANES), 3.4e38, jnp.float32))
        o_ref[:] = acc
    return kern, 4 * N  # 1 mul + reduce(~1) + cmp + sel per element


def run_vmem(name, mk):
    kern, flops = mk()
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(ROWS, LANES).astype(np.float32) + 0.5)
    b = jnp.asarray(rng.rand(ROWS, LANES).astype(np.float32) + 0.5)
    call = pl.pallas_call(
        kern,
        interpret=_INTERPRET,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )
    try:
        _timed(name, call, (a, b), flops)
    except Exception as e:  # noqa: BLE001 — record, keep measuring
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def run_hbm_stream():
    # 256 MB array, 64 elementwise passes under lax.fori_loop (the loop
    # boundary defeats XLA pass fusion) = 32 GB of HBM read+write. Sync
    # via a SCALAR fetch so the tunnel moves 4 bytes, not 256 MB.
    n = 64 * 1024 * 1024
    passes = 64
    x = jnp.arange(n, dtype=jnp.float32)

    def sweep(x):
        return jax.lax.fori_loop(0, passes, lambda i, v: v * 1.0000001, x)

    f = jax.jit(sweep)
    float(f(x)[0])  # compile + sync (scalar fetch)
    t0 = time.perf_counter()
    y = f(x)
    float(y[0])
    dt = time.perf_counter() - t0
    bw = passes * 2 * 4 * n / dt
    print(f"hbm-stream: {dt*1e3:8.2f} ms  {bw/1e9:7.1f} GB/s "
          f"({passes}x read+write 256 MB)", flush=True)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}", flush=True)
    run_vmem("fma-peak", kernel_fma_peak)
    run_vmem("isect-mix", kernel_isect_mix)
    run_vmem("min-reduce", kernel_min_reduce)
    run_hbm_stream()
