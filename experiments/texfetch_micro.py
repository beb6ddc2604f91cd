"""Round-2 texture design micro-benchmarks (follow-up to gather_micro).

1. Sustained int8 MXU matmul rate in a Pallas fori_loop at fetch-like shapes.
2. dim1 dynamic_gather rate at tall shapes with many reps.
3. XLA-level 1-D gather rates: slice_sizes (1,), (2,), (4,), (8,) per index.

Run: PYTHONPATH=/root/.axon_site python experiments/texfetch_micro.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=10):
    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf[(0,) * leaf.ndim])
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def int8_matmul_sustained(L, K, N, reps):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        def body(i, acc):
            # shift a each iter to defeat CSE, cheap VPU op
            return acc + jax.lax.dot_general(
                a + i.astype(jnp.int8), b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((L, N), jnp.int32))

    a = jnp.asarray(np.random.RandomState(0).randint(0, 2, (L, K)), jnp.int8)
    b = jnp.asarray(np.random.RandomState(1).randint(-128, 127, (K, N)), jnp.int8)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, a, b)
        macs = L * K * N * reps
        print(f"  int8 sustained ({L},{K})@({K},{N}) x{reps}: {dt*1e6:9.1f} us"
              f" -> {macs/dt/1e12:7.1f} T-MAC/s")
    except Exception as e:
        print(f"  int8 sustained ({L},{K})@({K},{N}) x{reps}: FAIL {str(e).splitlines()[0][:120]}")


def bf16_matmul_sustained(L, K, N, reps):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        def body(i, acc):
            return acc + jax.lax.dot_general(
                a + i.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((L, N), jnp.float32))

    a = jnp.asarray(np.random.RandomState(0).rand(L, K), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).rand(K, N), jnp.bfloat16)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, a, b)
        macs = L * K * N * reps
        print(f"  bf16 sustained ({L},{K})@({K},{N}) x{reps}: {dt*1e6:9.1f} us"
              f" -> {macs/dt/1e12:7.1f} T-MAC/s")
    except Exception as e:
        print(f"  bf16 sustained ({L},{K})@({K},{N}) x{reps}: FAIL {str(e).splitlines()[0][:120]}")


def gather_sustained(shape, reps):
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        def body(i, carry):
            acc, idx = carry
            g = jnp.take_along_axis(x, idx, axis=1)
            return acc + g, (idx + g) % shape[1]
        acc, _ = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros(shape, jnp.int32), idx))
        o_ref[:] = acc

    x = jnp.asarray(np.arange(np.prod(shape)) % 97, jnp.int32).reshape(shape)
    idx = jnp.asarray(
        np.random.RandomState(0).randint(0, shape[1], shape), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, x, idx)
        n = np.prod(shape) * reps
        print(f"  dyn_gather dim1 {shape} x{reps}: {dt*1e6:9.1f} us"
              f" -> {n/dt/1e9:7.2f} G-elem/s")
    except Exception as e:
        print(f"  dyn_gather dim1 {shape} x{reps}: FAIL {str(e).splitlines()[0][:120]}")


def xla_gather(n_idx, slice_size, reps=4):
    """XLA (non-Pallas) flat 1-D gather with slice_sizes=(slice_size,)."""
    table = jnp.asarray(np.arange(512 * 512 * 2) % 251, jnp.int32)
    idx = jnp.asarray(
        np.random.RandomState(0).randint(0, table.shape[0] - slice_size, (n_idx, 1)),
        jnp.int32)

    @jax.jit
    def f(table, idx):
        def body(i, acc):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,))
            g = jax.lax.gather(table, (idx + i) % (table.shape[0] - slice_size),
                               dn, slice_sizes=(slice_size,))
            return acc + jnp.sum(g, axis=1, keepdims=False)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((n_idx,), jnp.int32))

    dt = timeit(f, table, idx)
    n = n_idx * reps
    print(f"  XLA gather n={n_idx} slice={slice_size} x{reps}: {dt*1e6:9.1f} us"
          f" -> {n/dt/1e6:8.1f} M-idx/s")


def main():
    print("devices:", jax.devices())
    print("== sustained int8 MXU ==")
    int8_matmul_sustained(1024, 512, 1024, 64)
    int8_matmul_sustained(1024, 2048, 512, 64)
    int8_matmul_sustained(512, 4608, 512, 64)
    int8_matmul_sustained(2048, 512, 512, 64)
    print("== sustained bf16 MXU ==")
    bf16_matmul_sustained(1024, 512, 1024, 64)
    print("== sustained dyn_gather ==")
    gather_sustained((512, 128), 512)
    gather_sustained((2048, 128), 256)
    print("== XLA flat gathers ==")
    for ss in (1, 2, 4, 8):
        xla_gather(1 << 20, ss)


if __name__ == "__main__":
    main()
