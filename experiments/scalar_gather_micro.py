"""Can a hand-rolled Mosaic scalar-load loop beat XLA's ~96M gathers/s?

Tests per-element scalar gathers inside a Pallas kernel:
  A. indices as SMEM input, table in VMEM, scalar loads + scalar stores
  B. indices in VMEM (scalar reads from VMEM ref)
  C. dynamic row-slice variant: out rows via table_ref[pl.ds(r,1), :]
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


TAB_ROWS, TAB_COLS = 2048, 128  # 262144-entry int32 table


def variant_smem(n):
    """Indices in SMEM; scalar VMEM loads; scalar stores to VMEM out."""
    def kernel(idx_ref, tab_ref, o_ref):
        def body(i, _):
            f = idx_ref[i]
            r = f // TAB_COLS
            c = f % TAB_COLS
            o_ref[0, i] = tab_ref[r, c]
            return 0
        jax.lax.fori_loop(0, n, body, 0)

    tab = jnp.asarray(np.arange(TAB_ROWS * TAB_COLS) % 97, jnp.int32).reshape(
        TAB_ROWS, TAB_COLS)
    idx = jnp.asarray(np.random.RandomState(0).randint(
        0, TAB_ROWS * TAB_COLS, (n,)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, idx, tab)
        print(f"  A smem-idx scalar gather n={n}: {dt*1e6:9.1f} us -> "
              f"{n/dt/1e6:8.1f} M-elem/s")
    except Exception as e:
        print(f"  A smem-idx scalar gather n={n}: FAIL {str(e).splitlines()[0][:110]}")


def variant_vmem_idx(n):
    """Indices read as scalars from a VMEM ref."""
    def kernel(idx_ref, tab_ref, o_ref):
        def body(i, _):
            f = idx_ref[0, i]
            r = f // TAB_COLS
            c = f % TAB_COLS
            o_ref[0, i] = tab_ref[r, c]
            return 0
        jax.lax.fori_loop(0, n, body, 0)

    tab = jnp.asarray(np.arange(TAB_ROWS * TAB_COLS) % 97, jnp.int32).reshape(
        TAB_ROWS, TAB_COLS)
    idx = jnp.asarray(np.random.RandomState(0).randint(
        0, TAB_ROWS * TAB_COLS, (1, n)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, idx, tab)
        print(f"  B vmem-idx scalar gather n={n}: {dt*1e6:9.1f} us -> "
              f"{n/dt/1e6:8.1f} M-elem/s")
    except Exception as e:
        print(f"  B vmem-idx scalar gather n={n}: FAIL {str(e).splitlines()[0][:110]}")


def variant_rowslice(n):
    """Fetch a (1,128) row per index via dynamic sublane slice, accumulate.
    Measures dynamic row-slice rate (for window-iteration designs)."""
    def kernel(idx_ref, tab_ref, o_ref):
        def body(i, acc):
            r = idx_ref[i]
            return acc + tab_ref[pl.ds(r, 1), :]
        o_ref[:] = jax.lax.fori_loop(
            0, n, body, jnp.zeros((1, TAB_COLS), jnp.int32))

    tab = jnp.asarray(np.arange(TAB_ROWS * TAB_COLS) % 97, jnp.int32).reshape(
        TAB_ROWS, TAB_COLS)
    idx = jnp.asarray(np.random.RandomState(0).randint(
        0, TAB_ROWS, (n,)), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, TAB_COLS), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, idx, tab)
        print(f"  C dyn row-slice n={n}: {dt*1e6:9.1f} us -> "
              f"{n/dt/1e6:8.1f} M-rows/s")
    except Exception as e:
        print(f"  C dyn row-slice n={n}: FAIL {str(e).splitlines()[0][:110]}")


def main():
    print("devices:", jax.devices())
    variant_smem(4096)
    variant_smem(65536)
    variant_vmem_idx(4096)
    variant_vmem_idx(65536)
    variant_rowslice(4096)
    variant_rowslice(65536)


if __name__ == "__main__":
    main()
