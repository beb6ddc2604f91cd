"""Micro-benchmarks for TPU texture-gather candidates (round 2, VERDICT #1).

Measures, on the real chip:
  1. Mosaic tpu.dynamic_gather via jnp.take_along_axis, dim 0 and dim 1,
     at several shapes/dtypes — which forms compile, and how fast.
  2. int8 MXU matmul (one-hot row-fetch design) throughput.
  3. A calibration VPU loop.

Run: PYTHONPATH=/root/.axon_site python experiments/gather_micro.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1, :1]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a[..., :1, :1]), out)
    return (time.perf_counter() - t0) / iters


def try_gather(shape, dtype, axis, reps=64):
    """take_along_axis gather inside a pallas kernel, repeated `reps` times
    with dependency chaining so we see per-op cost past dispatch floor."""
    def kernel(x_ref, idx_ref, o_ref):
        x = x_ref[:]
        idx = idx_ref[:]
        acc = jnp.zeros(shape, dtype)
        def body(i, carry):
            acc, idx = carry
            g = jnp.take_along_axis(x, idx, axis=axis)
            acc = acc + g
            idx = (idx + 1) % shape[axis]
            return acc, idx
        acc, _ = jax.lax.fori_loop(0, reps, body, (acc, idx))
        o_ref[:] = acc

    x = jnp.arange(np.prod(shape), dtype=dtype).reshape(shape) % 101
    idx = jnp.asarray(
        np.random.RandomState(0).randint(0, shape[axis], shape), jnp.int32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        dt = timeit(jax.jit(lambda a, b: f(a, b)), x, idx)
        n_gathered = np.prod(shape) * reps
        print(f"  gather axis={axis} {shape} {dtype.__name__}: "
              f"{dt*1e6:8.1f} us/call, {n_gathered/dt/1e9:8.2f} G-elem/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  gather axis={axis} {shape} {dtype.__name__}: FAIL {msg}")


def try_int8_matmul(L, K, N, reps=8):
    """one-hot row fetch: (L,K)i8 @ (K,N)i8 -> (L,N)i32."""
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.zeros((L, N), jnp.int32)
        def body(i, acc):
            return acc + jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = jax.lax.fori_loop(0, reps, body, acc)

    a = jnp.asarray(np.random.RandomState(0).randint(-3, 3, (L, K)), jnp.int8)
    b = jnp.asarray(np.random.RandomState(1).randint(-3, 3, (K, N)), jnp.int8)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        dt = timeit(jax.jit(lambda x, y: f(x, y)), a, b)
        macs = L * K * N * reps
        print(f"  int8 dot ({L},{K})@({K},{N}): {dt*1e6:8.1f} us/call, "
              f"{macs/dt/1e12:7.2f} T-MAC/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  int8 dot ({L},{K})@({K},{N}): FAIL {msg}")


def try_bf16_matmul(L, K, N, reps=8):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = jnp.zeros((L, N), jnp.float32)
        def body(i, acc):
            return acc + jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, reps, body, acc)

    a = jnp.asarray(np.random.RandomState(0).rand(L, K), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).rand(K, N), jnp.bfloat16)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        dt = timeit(jax.jit(lambda x, y: f(x, y)), a, b)
        macs = L * K * N * reps
        print(f"  bf16 dot ({L},{K})@({K},{N}): {dt*1e6:8.1f} us/call, "
              f"{macs/dt/1e12:7.2f} T-MAC/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  bf16 dot ({L},{K})@({K},{N}): FAIL {msg}")


def main():
    print("devices:", jax.devices())
    print("== dynamic_gather availability/perf ==")
    for axis in (1, 0):
        for shape in [(8, 128), (32, 128), (32, 256), (32, 512),
                      (256, 128), (512, 128), (2048, 128), (256, 512)]:
            for dtype in (jnp.int32, jnp.float32):
                try_gather(shape, dtype, axis)
    print("== int8 matmul ==")
    for lkn in [(512, 512, 512), (1024, 512, 1024), (512, 512, 4096),
                (2048, 512, 1024)]:
        try_int8_matmul(*lkn)
    print("== bf16 matmul (reference point) ==")
    try_bf16_matmul(512, 512, 512)
    try_bf16_matmul(1024, 512, 1024)


if __name__ == "__main__":
    main()
