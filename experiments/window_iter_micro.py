"""Simulate the window-iteration texture fetch inner loop at kernel level.

Given per-lane window ids (K distinct) and in-window offsets, loop over
distinct windows: min-reduce -> dynamic row slice -> broadcast ->
dynamic_gather -> masked select. Measures us per distinct window.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 32, 128           # lane block
N_WIN = 4096             # table windows


def timeit(fn, *args, iters=20):
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


def make(k_distinct, seed=0):
    rs = np.random.RandomState(seed)
    wins = rs.choice(N_WIN, size=k_distinct, replace=False)
    win = wins[rs.randint(0, k_distinct, (R, C))].astype(np.int32)
    off = rs.randint(0, 127, (R, C)).astype(np.int32)
    table = (np.arange(N_WIN * C) % 97).astype(np.int32).reshape(N_WIN, C)
    return jnp.asarray(win), jnp.asarray(off), jnp.asarray(table)


def bench(k_distinct, words=2, outer=8):
    def kernel(win_ref, off_ref, tab_ref, o_ref):
        BIG = jnp.int32(1 << 30)
        win0 = win_ref[:]
        off = off_ref[:]

        def one_pass(p, acc):
            win = win0 + p  # different window set per pass, defeats CSE
            def cond(c):
                return jnp.any(c[0] == 0)
            def body(c):
                done, acc = c
                t = jnp.min(jnp.where(done != 0, BIG, win))
                row = tab_ref[pl.ds(t % N_WIN, 1), :]
                b = jnp.broadcast_to(row, (R, C))
                g = jnp.take_along_axis(b, off, axis=1)
                hit = win == t
                acc = acc + jnp.where(hit, g, 0)
                if words == 4:
                    g2 = jnp.take_along_axis(b, (off + 1) % C, axis=1)
                    acc = acc + jnp.where(hit, g2, 0)
                return done | hit.astype(jnp.int32), acc
            _, acc = jax.lax.while_loop(cond, body, (win * 0, acc))
            return acc

        o_ref[:] = jax.lax.fori_loop(0, outer, one_pass, win0 * 0)

    win, off, table = make(k_distinct)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, win, off, table)
        per_win = dt / outer / k_distinct
        print(f"  K={k_distinct:5d} words={words}: {dt*1e6:9.1f} us/call, "
              f"{per_win*1e9:8.1f} ns/window, "
              f"block-fetch {dt/outer*1e6:7.1f} us")
    except Exception as e:
        print(f"  K={k_distinct:5d} words={words}: FAIL {str(e).splitlines()[0][:110]}")


def main():
    print("devices:", jax.devices())
    for k in (16, 64, 256, 1024):
        bench(k, words=2)
    for k in (64, 256):
        bench(k, words=4)


if __name__ == "__main__":
    main()


def bench_pipelined(k_distinct, words=2, outer=8):
    """Software-pipelined: next-tid reduce overlaps current gathers."""
    def kernel(win_ref, off_ref, tab_ref, o_ref):
        BIG = jnp.int32(1 << 30)
        win0 = win_ref[:]
        off = off_ref[:]

        def one_pass(p, acc):
            win = win0 + p
            def cond(c):
                return jnp.any(c[2] != BIG)
            def body(c):
                done, acc, tid_b = c
                hit = (win == tid_b) & (done == 0)
                done = done | hit.astype(jnp.int32)
                nxt = jnp.broadcast_to(
                    jnp.min(jnp.where(done != 0, BIG, win)), (R, C))
                row = tab_ref[pl.ds(tid_b[0, 0] % N_WIN, 1), :]
                b = jnp.broadcast_to(row, (R, C))
                g = jnp.take_along_axis(b, off, axis=1)
                acc = acc + jnp.where(hit, g, 0)
                if words == 4:
                    g2 = jnp.take_along_axis(b, (off + 1) % C, axis=1)
                    acc = acc + jnp.where(hit, g2, 0)
                return done, acc, nxt
            tid0 = jnp.broadcast_to(jnp.min(win), (R, C))
            _, acc, _ = jax.lax.while_loop(
                cond, body, (win * 0, acc, tid0))
            return acc

        o_ref[:] = jax.lax.fori_loop(0, outer, one_pass, win0 * 0)

    win, off, table = make(k_distinct)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        dt = timeit(f, win, off, table)
        per_win = dt / outer / k_distinct
        print(f"  PIPE K={k_distinct:5d} words={words}: {dt*1e6:9.1f} us/call, "
              f"{per_win*1e9:8.1f} ns/window")
    except Exception as e:
        print(f"  PIPE K={k_distinct:5d} words={words}: FAIL {str(e).splitlines()[0][:110]}")

for k in (64, 256, 1024):
    bench_pipelined(k, words=2)
bench_pipelined(256, words=4)
