"""int8 MXU rate probes: Pallas sustained + XLA-level upper bound."""
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


def pallas_int8(L, K, N, reps, variant):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        def body(i, acc):
            if variant == "chain":
                a2 = a ^ jnp.broadcast_to((acc[0:1, 0:1] & 1).astype(jnp.int8), a.shape)
            elif variant == "plain":
                a2 = a
            return acc + jax.lax.dot_general(
                a2, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((L, N), jnp.int32))

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
        print(f"  pallas int8 {variant} ({L},{K})@({K},{N}) x{reps}: "
              f"{dt*1e6:9.1f} us -> {macs/dt/1e12:7.1f} T-MAC/s")
    except Exception as e:
        print(f"  pallas int8 {variant} ({L},{K})@({K},{N}) x{reps}: "
              f"FAIL {str(e).splitlines()[0][:110]}")


def xla_int8(L, K, N):
    a = jnp.asarray(np.random.RandomState(0).randint(0, 2, (L, K)), jnp.int8)
    b = jnp.asarray(np.random.RandomState(1).randint(-128, 127, (K, N)), jnp.int8)

    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    try:
        dt = timeit(f, a, b)
        macs = L * K * N
        print(f"  XLA int8 ({L},{K})@({K},{N}): {dt*1e6:9.1f} us -> "
              f"{macs/dt/1e12:7.1f} T-MAC/s")
    except Exception as e:
        print(f"  XLA int8 ({L},{K})@({K},{N}): FAIL {str(e).splitlines()[0][:110]}")


def xla_bf16(L, K, N):
    a = jnp.asarray(np.random.RandomState(0).rand(L, K), jnp.bfloat16)
    b = jnp.asarray(np.random.RandomState(1).rand(K, N), jnp.bfloat16)

    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dt = timeit(f, a, b)
    macs = L * K * N
    print(f"  XLA bf16 ({L},{K})@({K},{N}): {dt*1e6:9.1f} us -> "
          f"{macs/dt/1e12:7.1f} T-MAC/s")


def main():
    print("devices:", jax.devices())
    print("== XLA upper bounds ==")
    xla_bf16(8192, 2048, 8192)
    xla_int8(8192, 2048, 8192)
    xla_int8(16384, 512, 1024)
    xla_int8(4096, 512, 512)
    print("== pallas sustained ==")
    for variant in ("plain", "chain"):
        pallas_int8(1024, 512, 1024, 64, variant)
    pallas_int8(1024, 512, 512, 64, "chain")
    pallas_int8(2048, 4608, 512, 16, "chain")


if __name__ == "__main__":
    main()
