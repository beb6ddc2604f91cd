"""Can streamed triangle records be SCALARS instead of lane extracts?

The streamed tier's per-triangle tax is 13 lane broadcasts per record
(take_along_axis on a VMEM row). If the records instead live in SMEM,
each field is a dynamic SCALAR read that splats into vector ALU for free
— the same cost class as the static tier's baked immediates.

Three kernels over the same (32, 128) block and N fake "triangle" records:
  A) vmem-rows: row_bcast + take_along_axis extraction (current streamed)
  B) smem-input: records as a pltpu.SMEM input, f = rec[k] scalar reads
  C) smem-dma: records in ANY (HBM), per-cluster DMA into SMEM scratch,
     then scalar reads (the >SMEM-capacity tier)
Each does the same dot-products-and-min workload; prints per-variant
wall time on the current backend.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TRI = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
ROWS, LANES = 32, 128
F = 13
PER = 9
CLUSTER = 64  # tris per DMA chunk in variant C

rng = np.random.RandomState(0)
rec = rng.rand(N_TRI, F).astype(np.float32)
# row-packed twin for variant A
n_rows = -(-N_TRI // PER)
pack = np.zeros((n_rows, 128), np.float32)
flat = np.concatenate([rec, np.zeros((n_rows * PER - N_TRI, F), np.float32)])
pack[:, : PER * F] = flat.reshape(n_rows, PER * F)
rec_flat = flat.reshape(-1)  # (n_rows*PER*F,)

o = rng.rand(ROWS, LANES).astype(np.float32)
d = rng.rand(ROWS, LANES).astype(np.float32) + 0.5


def workload(f, ox, dx, t_r):
    """Fake tri test: a few fused ops per record, serial min chain."""
    t = (f(3) - f(0) * ox - f(1) * ox - f(2) * ox) / (f(4) * dx + f(5) * dx + f(6) * dx + 1.0)
    a = f(7) * ox + f(8) * dx
    bb = f(9) * ox + f(10) * dx
    hit = (a >= 0.0) & (bb >= 0.0) & (t > 1e-4) & (a + bb <= f(11) + f(12) + 4.0)
    return jnp.where(hit & (t < t_r), t, t_r)


def kernel_vmem(reps: int):
    def kern(o_ref, d_ref, pack_ref, out_ref):
        ox, dx = o_ref[:], d_ref[:]
        shape = ox.shape

        def lane(rowb, j):
            idx = jnp.broadcast_to(jnp.asarray(j, jnp.int32), shape)
            return jnp.take_along_axis(rowb, idx, axis=-1)

        def rep_body(rr, t_r):
            def row_body(r, t_r):
                rowb = jnp.broadcast_to(pack_ref[pl.ds(r, 1), :], shape)
                for jj in range(PER):
                    f = lambda j, base=jj * F: lane(rowb, base + j)
                    t_r = workload(f, ox, dx, t_r)
                return t_r
            return jax.lax.fori_loop(0, n_rows, row_body, t_r)
        out_ref[:] = jax.lax.fori_loop(0, reps, rep_body, ox * 0.0 + 1e30)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )


def kernel_smem(reps: int):
    def kern(o_ref, d_ref, rec_ref, out_ref):
        ox, dx = o_ref[:], d_ref[:]

        def rep_body(rr, t_r):
            def tri_body(k, t_r):
                f = lambda j: rec_ref[k * F + j]
                return workload(f, ox, dx, t_r)
            return jax.lax.fori_loop(0, N_TRI, tri_body, t_r)
        out_ref[:] = jax.lax.fori_loop(0, reps, rep_body, ox * 0.0 + 1e30)
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )


def kernel_smem_dma(reps: int):
    n_cl = -(-N_TRI // CLUSTER)

    def kern(o_ref, d_ref, rec_ref, out_ref):
        ox, dx = o_ref[:], d_ref[:]

        def body(scratch, sem):
            def get_dma(slot, ci):
                return pltpu.make_async_copy(
                    rec_ref.at[pl.ds(ci * CLUSTER * F, CLUSTER * F)],
                    scratch.at[slot],
                    sem.at[slot],
                )

            def rep_body(rr, t_r):
                get_dma(0, 0).start()

                def cl_body(ci, t_r):
                    slot = ci % 2

                    @pl.when(ci + 1 < n_cl)
                    def _():
                        get_dma((ci + 1) % 2, ci + 1).start()
                    get_dma(slot, ci).wait()

                    def tri_body(k, t_r):
                        f = lambda j: scratch[slot, k * F + j]
                        return workload(f, ox, dx, t_r)
                    return jax.lax.fori_loop(0, CLUSTER, tri_body, t_r)
                return jax.lax.fori_loop(0, n_cl, cl_body, t_r)
            out_ref[:] = jax.lax.fori_loop(0, reps, rep_body, ox * 0.0 + 1e30)

        pl.run_scoped(
            body,
            scratch=pltpu.SMEM((2, CLUSTER * F), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )


def run(name, call, *args):
    try:
        f = jax.jit(call)
        out = f(*args)
        float(np.asarray(out).sum())  # sync
        t0 = time.perf_counter()
        out = f(*args)
        s = float(np.asarray(out).sum())
        dt = time.perf_counter() - t0
        per_tri = dt / (REPS * N_TRI) * 1e9
        print(f"{name:10s}: {dt*1e3:8.2f} ms  {per_tri:7.1f} ns/tri-step  (sum {s:.1f})")
        return out
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


a = run("vmem-rows", kernel_vmem(REPS), o, d, pack)
bres = run("smem-input", kernel_smem(REPS), o, d, rec_flat)
c = run("smem-dma", kernel_smem_dma(REPS), o, d, rec_flat)
if a is not None and bres is not None:
    print("A==B:", bool(np.allclose(np.asarray(a), np.asarray(bres), atol=1e-5)))
if bres is not None and c is not None:
    print("B==C:", bool(np.allclose(np.asarray(bres), np.asarray(c), atol=1e-5)))
