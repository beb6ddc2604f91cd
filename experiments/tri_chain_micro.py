"""Is the streamed tier's 215 ns/tri ALU throughput or serial latency?

The row_body unroll threads ONE (t, nx, ny, nz, mat) carry through every
triangle: each triangle's 5 selects depend on the previous triangle's.
smem_records_micro showed SMEM scalar records cost the same as VMEM lane
extraction (~215 ns/tri) — so the tax isn't extraction. If it's the serial
select chain, splitting the carry into C independent chains (merged once
per row/cluster) should recover throughput, exactly like the texture
fetch's per-(8,128)-tile min-reduce chains (BENCH.md round 2).

Variants (same fake workload as smem_records_micro, realistic op mix):
  chain1: current shape — one carry through all tris
  chainC: C=2/4/8 interleaved carries, merged at the end
  chain1-full / chain4-full: carry all 5 winner fields, not just t

Usage: python experiments/tri_chain_micro.py [NTRI] [REPS]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TRI = int(sys.argv[1]) if len(sys.argv) > 1 else 576
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ROWS, LANES = 32, 128
F = 13
PER = 9

rng = np.random.RandomState(0)
n_rows = -(-N_TRI // PER)
pack = rng.rand(n_rows, 128).astype(np.float32)

o = rng.rand(ROWS, LANES).astype(np.float32)
d = rng.rand(ROWS, LANES).astype(np.float32) + 0.5


def tri_test(f, ox, dx, oy, dy):
    """Realistic per-triangle op mix: 6 'dots' (here 2-term), div, 2 fma,
    cmps — returns (t, hit)."""
    denom = f(0) * dx + f(1) * dy
    valid = jnp.abs(denom) > 1e-9
    t = (f(3) - (f(0) * ox + f(1) * oy + f(2))) / jnp.where(valid, denom, 1.0)
    alpha = (f(4) * ox + f(5) * oy - f(7)) + t * (f(4) * dx + f(5) * dy)
    beta = (f(8) * ox + f(9) * oy - f(11)) + t * (f(8) * dx + f(10) * dy)
    hit = valid & (alpha >= 0.0) & (beta >= 0.0) & (alpha + beta <= 1.0) \
        & (t > 1e-4)
    return t, hit


def make_kernel(n_chains: int, full_carry: bool, reps: int):
    def kern(o_ref, d_ref, pack_ref, out_ref):
        ox, dx = o_ref[:], d_ref[:]
        oy, dy = ox * 0.5, dx * 0.5
        shape = ox.shape

        def lane(rowb, j):
            idx = jnp.broadcast_to(jnp.asarray(j, jnp.int32), shape)
            return jnp.take_along_axis(rowb, idx, axis=-1)

        big = ox * 0.0 + 1e30
        zero = ox * 0.0

        def rep_body(rr, carry):
            def row_body(r, carry):
                rowb = jnp.broadcast_to(pack_ref[pl.ds(r, 1), :], shape)
                chains = list(carry)
                for jj in range(PER):
                    f = lambda j, base=jj * F: lane(rowb, base + j)
                    t, hit = tri_test(f, ox, dx, oy, dy)
                    ci = jj % n_chains
                    if full_carry:
                        t_r, nx, ny, nz, mf = chains[ci]
                        take = hit & (t < t_r)
                        chains[ci] = (
                            jnp.where(take, t, t_r),
                            jnp.where(take, f(0), nx),
                            jnp.where(take, f(1), ny),
                            jnp.where(take, f(2), nz),
                            jnp.where(take, f(12), mf),
                        )
                    else:
                        t_r = chains[ci]
                        chains[ci] = jnp.where(hit & (t < t_r), t, t_r)
                return tuple(chains)
            return jax.lax.fori_loop(0, n_rows, row_body, carry)

        if full_carry:
            init = tuple((big, zero, zero, zero, zero - 1.0)
                         for _ in range(n_chains))
        else:
            init = tuple(big for _ in range(n_chains))
        carry = jax.lax.fori_loop(0, reps, rep_body, init)
        if full_carry:
            best = carry[0]
            for c in carry[1:]:
                take = c[0] < best[0]
                best = tuple(jnp.where(take, a, b) for a, b in zip(c, best))
            out_ref[:] = best[0] + best[4]
        else:
            acc = carry[0]
            for c in carry[1:]:
                acc = jnp.minimum(acc, c)
            out_ref[:] = acc
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )


def run(name, call, *args):
    try:
        fn = jax.jit(call)
        out = fn(*args)
        float(np.asarray(out).sum())
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(np.asarray(out).sum())
        dt = time.perf_counter() - t0
        per_tri = dt / (REPS * n_rows * PER) * 1e9
        print(f"{name:14s}: {dt*1e3:8.2f} ms  {per_tri:7.1f} ns/tri  (sum {s:.1f})")
        return np.asarray(out)
    except Exception as e:
        print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


a = run("chain1", make_kernel(1, False, REPS), o, d, pack)
for c in (2, 4, 8):
    r = run(f"chain{c}", make_kernel(c, False, REPS), o, d, pack)
    if a is not None and r is not None:
        assert np.allclose(a, r, atol=1e-4), f"chain{c} mismatch"
af = run("chain1-full", make_kernel(1, True, REPS), o, d, pack)
for c in (2, 4, 8):
    r = run(f"chain{c}-full", make_kernel(c, True, REPS), o, d, pack)
