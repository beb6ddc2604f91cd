"""Bisect which kernel feature crashes the Mosaic compile."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, N_WIN = 32, 128, 4096


def run(name, kernel, extra_tabs=True):
    win = jnp.asarray(np.random.RandomState(0).randint(0, 64, (R, C)), jnp.int32)
    off = jnp.asarray(np.random.RandomState(1).randint(0, C, (R, C)), jnp.int32)
    tab = jnp.asarray((np.arange(N_WIN * C) % 97).reshape(N_WIN, C), jnp.int32)
    args = (win, off, tab)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    ))
    try:
        out = f(*args)
        np.asarray(out[0, 0])
        print(f"  {name}: OK")
    except Exception as e:
        print(f"  {name}: FAIL {str(e).splitlines()[0][:100]}")


# F1: while loop, scalar cond from full reduce, no memory ops
def f1(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    def cond(c):
        return c[0] < BIG
    def body(c):
        t, done, acc = c
        hit = win == t
        acc = acc + jnp.where(hit, 1, 0)
        done = done | hit
        nxt = jnp.min(jnp.where(done, BIG, win))
        return nxt, done, acc
    t0 = jnp.min(win)
    _, _, acc = jax.lax.while_loop(cond, body, (t0, win != win, win * 0))
    o_ref[:] = acc


# F2: + dynamic row slice with the reduced scalar
def f2(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    def cond(c):
        return c[0] < BIG
    def body(c):
        t, done, acc = c
        row = tab_ref[pl.ds(t % N_WIN, 1), :]
        hit = win == t
        acc = acc + jnp.where(hit, row[0, 64], 0)
        done = done | hit
        nxt = jnp.min(jnp.where(done, BIG, win))
        return nxt, done, acc
    t0 = jnp.min(win)
    _, _, acc = jax.lax.while_loop(cond, body, (t0, win != win, win * 0))
    o_ref[:] = acc


# F3: + broadcast row + take_along_axis
def f3(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    off = off_ref[:]
    def cond(c):
        return c[0] < BIG
    def body(c):
        t, done, acc = c
        row = tab_ref[pl.ds(t % N_WIN, 1), :]
        b = jnp.broadcast_to(row, (R, C))
        g = jnp.take_along_axis(b, off, axis=1)
        hit = win == t
        acc = acc + jnp.where(hit, g, 0)
        done = done | hit
        nxt = jnp.min(jnp.where(done, BIG, win))
        return nxt, done, acc
    t0 = jnp.min(win)
    _, _, acc = jax.lax.while_loop(cond, body, (t0, win != win, win * 0))
    o_ref[:] = acc


# F3b: gather on data NOT from a dynamic slice (is the slice+gather combo bad?)
def f3b(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    off = off_ref[:]
    first = tab_ref[0:1, :]
    def cond(c):
        return c[0] < BIG
    def body(c):
        t, done, acc = c
        b = jnp.broadcast_to(first, (R, C)) + t
        g = jnp.take_along_axis(b, off, axis=1)
        hit = win == t
        acc = acc + jnp.where(hit, g, 0)
        done = done | hit
        nxt = jnp.min(jnp.where(done, BIG, win))
        return nxt, done, acc
    t0 = jnp.min(win)
    _, _, acc = jax.lax.while_loop(cond, body, (t0, win != win, win * 0))
    o_ref[:] = acc


# F4: take_along_axis broadcast source outside loop entirely
def f4(win_ref, off_ref, tab_ref, o_ref):
    off = off_ref[:]
    b = jnp.broadcast_to(tab_ref[0:1, :], (R, C))
    g = jnp.take_along_axis(b, off, axis=1)
    o_ref[:] = g


# F5: dynamic slice + broadcast + gather, fori loop (static trip)
def f5(win_ref, off_ref, tab_ref, o_ref):
    off = off_ref[:]
    win = win_ref[:]
    def body(i, acc):
        row = tab_ref[pl.ds(i % N_WIN, 1), :]
        b = jnp.broadcast_to(row, (R, C))
        g = jnp.take_along_axis(b, off, axis=1)
        return acc + jnp.where(win == i, g, 0)
    o_ref[:] = jax.lax.fori_loop(0, 64, body, win * 0)


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("F4 gather of broadcast row (no loop)", f4)
    run("F5 fori + slice + gather", f5)
    run("F1 while + reduce cond", f1)
    run("F2 + dyn row slice", f2)
    run("F3 full", f3)
    run("F3b gather, no dyn slice", f3b)


# F6: no scalar carry; cond = any(~done); t computed in body
def f6(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    off = off_ref[:]
    def cond(c):
        done, _ = c
        return jnp.any(~done)
    def body(c):
        done, acc = c
        t = jnp.min(jnp.where(done, BIG, win))
        row = tab_ref[pl.ds(t % N_WIN, 1), :]
        b = jnp.broadcast_to(row, (R, C))
        g = jnp.take_along_axis(b, off, axis=1)
        hit = win == t
        acc = acc + jnp.where(hit, g, 0)
        return done | hit, acc
    _, acc = jax.lax.while_loop(cond, body, (win != win, win * 0))
    o_ref[:] = acc


# F7: like F6 but no dynamic slice (locate crash if F6 fails)
def f7(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    def cond(c):
        done, _ = c
        return jnp.any(~done)
    def body(c):
        done, acc = c
        t = jnp.min(jnp.where(done, BIG, win))
        hit = win == t
        return done | hit, acc + jnp.where(hit, 1, 0)
    _, acc = jax.lax.while_loop(cond, body, (win != win, win * 0))
    o_ref[:] = acc

run("F6 no scalar carry, full body", f6)
run("F7 no scalar carry, no mem ops", f7)


# F8: like F7 but carry done as int32, not bool
def f8(win_ref, off_ref, tab_ref, o_ref):
    BIG = jnp.int32(1 << 30)
    win = win_ref[:]
    def cond(c):
        done, _ = c
        return jnp.any(done == 0)
    def body(c):
        done, acc = c
        t = jnp.min(jnp.where(done != 0, BIG, win))
        hit = win == t
        return done | hit.astype(jnp.int32), acc + jnp.where(hit, 1, 0)
    _, acc = jax.lax.while_loop(cond, body, (win * 0, win * 0))
    o_ref[:] = acc


# F9: standalone jnp.min reduce, no loop
def f9(win_ref, off_ref, tab_ref, o_ref):
    o_ref[:] = jnp.broadcast_to(jnp.min(win_ref[:]), (R, C))


# F10: while loop, cond any, body uses jnp.max instead of min
def f10(win_ref, off_ref, tab_ref, o_ref):
    win = win_ref[:]
    def cond(c):
        done, _ = c
        return jnp.any(done == 0)
    def body(c):
        done, acc = c
        t = jnp.max(jnp.where(done != 0, -1, win))
        hit = win == t
        return done | hit.astype(jnp.int32), acc + jnp.where(hit, 1, 0)
    _, acc = jax.lax.while_loop(cond, body, (win * 0, win * 0))
    o_ref[:] = acc

run("F8 int32 done carry", f8)
run("F9 standalone min reduce", f9)
run("F10 max variant", f10)
