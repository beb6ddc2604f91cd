"""Windowed material-table lookup inside a Mosaic kernel.

Sizes the replacement for the O(n_materials) compare/select sweep
(integrator._material_lookup): the table rides VMEM as (M,) values; each
128-wide window is statically sliced, broadcast to the block, and fetched
with take_along_axis (tpu.dynamic_gather) + in-window select.

Questions answered on the real chip:
  1. does take_along_axis on a broadcast SLICE OF A VALUE (not a ref)
     lower under Mosaic?
  2. windowed-gather vs select-sweep runtime at world-2/4 table sizes.

Run: python experiments/mat_window_micro.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 32, 128
N_FIELDS = 16
REPS = 100  # inner repetitions to swamp dispatch overhead


def lookup_windowed(tables, mat):
    """tables: list of (M,) f32 values (M multiple of 128); mat: (ROWS,128)
    int32 indices. Returns list of gathered (ROWS,128) values."""
    M = tables[0].shape[0]
    n_win = M // 128
    outs = []
    for tab in tables:
        acc = jnp.zeros(mat.shape, tab.dtype)
        for w in range(n_win):
            row = jnp.broadcast_to(tab[w * 128:(w + 1) * 128][None, :],
                                   mat.shape)
            idx = jnp.clip(mat - w * 128, 0, 127)
            got = jnp.take_along_axis(row, idx, axis=1)
            hit = (mat >= w * 128) & (mat < (w + 1) * 128)
            acc = jnp.where(hit, got, acc)
        outs.append(acc)
    return outs


def lookup_sweep(tables, mat, n):
    outs = []
    for tab in tables:
        acc = jnp.full(mat.shape, tab[0])
        for i in range(1, n):
            acc = jnp.where(mat == i, tab[i], acc)
        outs.append(acc)
    return outs


def make_kernel(n_mats, mode):
    M = -(-n_mats // 128) * 128

    def kernel(mat_ref, *refs):
        tabs = [r[:] for r in refs[:N_FIELDS]]
        o_ref = refs[N_FIELDS]
        mat0 = mat_ref[:]

        def body(r, acc):
            mat = (mat0 + r) % n_mats
            if mode == "window":
                vals = lookup_windowed(tabs, mat)
            else:
                vals = lookup_sweep(tabs, mat, n_mats)
            return acc + sum(vals)

        o_ref[:] = jax.lax.fori_loop(0, REPS, body, mat0.astype(jnp.float32) * 0.0)

    return kernel, M


def run(n_mats, mode, iters=30):
    kernel, M = make_kernel(n_mats, mode)
    rng = np.random.RandomState(0)
    mat = jnp.asarray(rng.randint(0, n_mats, (ROWS, LANES)), jnp.int32)
    tabs = [jnp.asarray(rng.rand(M), jnp.float32) for _ in range(N_FIELDS)]
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + N_FIELDS),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    r = f(mat, *tabs)
    ref = sum(np.asarray(t)[(np.asarray(mat) + k) % n_mats]
              for k, t in enumerate(tabs[:1]))  # spot sanity only
    float(r[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(mat, *tabs)
    float(r[0, 0])
    us = (time.perf_counter() - t0) / iters * 1e6
    return us, r


def check_correct(n_mats):
    kernel, M = make_kernel(n_mats, "window")
    rng = np.random.RandomState(1)
    mat = jnp.asarray(rng.randint(0, n_mats, (ROWS, LANES)), jnp.int32)
    tabs = [jnp.asarray(rng.rand(M), jnp.float32) for _ in range(N_FIELDS)]
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + N_FIELDS),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(f(mat, *tabs))
    m0 = np.asarray(mat)
    want = np.zeros((ROWS, LANES), np.float32)
    for r in range(REPS):
        midx = (m0 + r) % n_mats
        want += sum(np.asarray(t)[midx] for t in tabs)
    ok = np.allclose(got, want, rtol=1e-5)
    print(f"n={n_mats}: windowed gather correct: {ok}")
    assert ok


if __name__ == "__main__":
    check_correct(424)
    for n in (122, 424, 1024):
        uw, _ = run(n, "window")
        print(f"n_mats={n:5d}: windowed {uw/REPS:7.3f} us/lookup-set "
              f"({uw:.0f} us total)")
        if n <= 424:
            us, _ = run(n, "sweep")
            print(f"             sweep    {us/REPS:7.3f} us/lookup-set "
                  f"({us:.0f} us total)")
