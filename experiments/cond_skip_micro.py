"""Does a data-dependent scalar branch SKIP work inside a Mosaic kernel?

The cluster-culling design for worlds 4/5 wraps each primitive cluster's
tests in a block-level `lax.cond(any lane hits the cluster AABB)`. This
micro answers, on the real chip:
  1. does lax.cond with vector carries lower under Mosaic inside a
     while_loop body?
  2. does the taken/not-taken branch actually change runtime (i.e. is it a
     real branch, not a select)?

Run: python experiments/cond_skip_micro.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 32, 128
N_CLUSTERS = 16
TRIS_PER = 48  # fake per-cluster workload: TRIS_PER fused mul-adds


def make_kernel(frac_hit: float, use_cond: bool):
    """frac_hit: fraction of clusters whose (synthetic) AABB test passes."""

    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def rep_body(r, acc0):
            acc = acc0

            def cluster_work(c, acc):
                a = acc
                for k in range(TRIS_PER):
                    a = a * 1.0000001 + x * (0.5 + 0.001 * k + 0.01 * c)
                return a

            for c in range(N_CLUSTERS):
                # synthetic per-lane "AABB hit": data-dependent, block-uniform
                hit_lane = (x + c + r * 0) < (N_CLUSTERS * frac_hit)
                any_hit = jnp.any(hit_lane)
                if use_cond:
                    acc = jax.lax.cond(any_hit, lambda a: cluster_work(c, a),
                                       lambda a: a, acc)
                else:
                    acc = cluster_work(c, acc)
            return acc

        o_ref[:] = jax.lax.fori_loop(0, 300, rep_body, x * 0.0)

    return kernel


def run(frac_hit, use_cond, iters=50):
    x = jnp.broadcast_to(jnp.arange(LANES, dtype=jnp.float32) * 0.0,
                         (ROWS, LANES))
    # x == 0 everywhere: cluster c "hits" iff c < N_CLUSTERS*frac_hit
    f = pl.pallas_call(
        make_kernel(frac_hit, use_cond),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    # big grid to get measurable time
    g = jax.jit(lambda x: sum(f(x + i * 0.0) for i in range(1)))
    r = f(x)
    float(r[0, 0])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x)
    float(r[0, 0])
    return (time.perf_counter() - t0) / iters * 1e6


if __name__ == "__main__":
    try:
        us = run(1.0, True, iters=5)
        print(f"lax.cond lowers under Mosaic: yes ({us:.1f} us all-taken)")
    except Exception as e:
        print(f"lax.cond FAILED to lower: {type(e).__name__}: {e}")
        raise SystemExit(1)
    for frac in (1.0, 0.5, 0.125, 0.0):
        tc = run(frac, True)
        print(f"frac_hit={frac:5.3f}: cond={tc:8.1f} us")
    tn = run(1.0, False)
    print(f"no-cond (always work): {tn:8.1f} us")
