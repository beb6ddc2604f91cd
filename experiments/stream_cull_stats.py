"""Diagnose streamed-tier packet culling: how many clusters/parents does a
primary-ray block actually descend?

Replicates the kernel's cull decision (ops/intersect streamed branch) in
numpy for ONE tile-coherent block of primary rays on the accel_crossover
scene: per cluster (in kernel order), relevant = slab-hit & (t_enter <
running best t) any-reduced over the block; descended clusters update the
running t with the true per-lane triangle hits. Prints per-bounce-0
descend counts and the lane best-t distribution. Pure host math — no TPU.

Usage: python experiments/stream_cull_stats.py NTRIS [BLOCK_INDEX]
"""
import sys

import numpy as np

ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
shape_kind = sys.argv[2] if len(sys.argv) > 2 else "cloud"
block_i = None

from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder


def tessellated_sphere(n_target, radius=8.0, center=(0.0, 0.0, 0.0)):
    """Lat-long tessellation with ~n_target triangles — a SURFACE mesh
    (the production regime: every reference mesh is a surface)."""
    nlat = max(4, int(np.sqrt(n_target / 4.0)))
    nlon = 2 * nlat
    th = np.linspace(0, np.pi, nlat + 1)
    ph = np.linspace(0, 2 * np.pi, nlon + 1)
    P = np.zeros((nlat + 1, nlon + 1, 3), np.float32)
    P[..., 0] = radius * np.outer(np.sin(th), np.cos(ph)) + center[0]
    P[..., 1] = radius * np.outer(np.sin(th), np.sin(ph)) + center[1]
    P[..., 2] = radius * np.outer(np.cos(th), np.ones_like(ph)) + center[2]
    tris = []
    for i in range(nlat):
        for j in range(nlon):
            a, b_, c, d = P[i, j], P[i + 1, j], P[i + 1, j + 1], P[i, j + 1]
            tris.append([a, b_, c])
            tris.append([a, c, d])
    return np.asarray(tris, np.float32)


rng = np.random.RandomState(7)
b = WorldBuilder()
b.add_material(emit=(0.3, 0.4, 0.5))
light = b.add_material(emit=(6.0, 5.5, 5.0))
b.add_sphere((8.0, -6.0, 12.0), 1.5, light)
m = b.add_material(albedo=(0.6, 0.5, 0.4), roughness=0.8)
if shape_kind == "cloud":
    base = (rng.rand(ntris, 1, 3) - 0.5) * 20.0
    tris = (base + (rng.rand(ntris, 3, 3) - 0.5) * 0.8).astype(np.float32)
else:
    tris = tessellated_sphere(ntris)
ntris = len(tris)
b.set_mesh(tris.reshape(-1, 3), np.full((ntris * 3,), m, np.int32))
floor = b.add_material(albedo=(0.4, 0.4, 0.45), roughness=0.9)
b.add_plane((0, 0, 1), 10.0, floor)

W, H = 640, 360
scene = b.finalize(view_origin=(0, -30, 4))
camera = define_camera((0, -30, 4), (0, 0, 0), 35.0, W, H)
assert scene.tri_streamed

nc = scene.n_stream_clusters
leaf = scene.stream_leaf
bounds = np.asarray(scene.mtri_bounds)  # (nc,128): mn3 mx3
parents = scene.stream_parents
print(f"ntris={ntris} clusters={nc} leaf={leaf} parents={len(parents)}")

# --- primary rays for tile blocks (pallas_backend._tile_perm_np, rows=32)
rows = 32
from pathtracer_tpu.render.pallas_backend import _tile_perm_np
perm, _ = _tile_perm_np(W, H, rows)
n_blocks = len(perm) // (rows * 128)

# pinhole primary rays at pixel centers (camera math approximated in f64 —
# we only need cull statistics, not bit exactness)
import pathtracer_tpu.render.raygen as raygen
import jax.numpy as jnp


def block_rays(bi):
    pix = jnp.asarray(perm[bi * rows * 128:(bi + 1) * rows * 128])
    half = jnp.full(pix.shape, 0.5, jnp.float32)
    o, d = raygen.pinhole_rays(camera, W, H, 1, 0, 0, (half, half), pix)
    O = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)
    D = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
    return O, D


# per-cluster triangle geometry (cluster-padded flat order): re-derive from
# the pack rows so we test EXACTLY what the kernel tests
pack = np.asarray(scene.mtri_pack)
per = 9
F = 13
stride = -(-leaf // per) * per  # row-aligned records per cluster
flat = pack[:, : per * F].reshape(-1, F)  # (nc*stride, 13)
leaf = stride  # cluster c's records: [c*stride, (c+1)*stride); pads never hit
n_v = flat[:, 0:3]
d_c = flat[:, 3]
e1 = flat[:, 4:7]
a0 = flat[:, 7]
e2 = flat[:, 8:11]
b0 = flat[:, 11]

TOL = 1e-9
MINHIT = 1e-4


def tri_ts(O, D, sl):
    """Per-lane best t over the cluster's triangles. O,D: (L,3)."""
    nn = n_v[sl]
    denom = D @ nn.T                              # (L, C)
    valid = np.abs(denom) > TOL
    t = (d_c[sl][None, :] - O @ nn.T) / np.where(valid, denom, 1.0)
    alpha = (O @ e1[sl].T - a0[sl][None, :]) + t * (D @ e1[sl].T)
    beta = (O @ e2[sl].T - b0[sl][None, :]) + t * (D @ e2[sl].T)
    hit = valid & (alpha >= 0) & (beta >= 0) & (alpha + beta <= 1) & (t > MINHIT)
    t = np.where(hit, t, np.inf)
    return t.min(axis=1)


def slab(O, D, mn, mx):
    inv = 1.0 / np.where(D != 0, D, 1e-30)
    t0 = (mn[None, :] - O) * inv
    t1 = (mx[None, :] - O) * inv
    tmin = np.minimum(t0, t1).max(axis=1)
    tmax = np.maximum(t0, t1).min(axis=1)
    return tmin, (tmax >= tmin) & (tmax >= 0)


def plane_t(O, D):
    # floor plane n=(0,0,1), d=10 (ray_plane: t = (d - n.o)/(n.d))
    denom = D[:, 2]
    valid = np.abs(denom) > TOL
    t = (10.0 - O[:, 2]) / np.where(valid, denom, 1.0)
    return np.where(valid & (t > MINHIT), t, np.inf)


def sweep(O, D, order="static"):
    """Walk the hierarchy as the kernel does; returns (parents_descended,
    clusters_descended, per-lane best t). order="tsort" simulates dynamic
    near-to-far parent ordering by block-min slab entry."""
    t_r = plane_t(O, D)
    desc = pdesc = 0
    plist = list(parents)
    if order == "tsort":
        def keyf(p):
            if p[2] is None:
                return -1.0
            tmin, hb = slab(O, D, np.asarray(p[2]), np.asarray(p[3]))
            return float(tmin[hb].min()) if hb.any() else np.inf
        plist = sorted(plist, key=keyf)
    for (ps, pc, pmn, pmx) in plist:
        if pmn is not None:
            tmin, hb = slab(O, D, np.asarray(pmn), np.asarray(pmx))
            if not (hb & (tmin < t_r)).any():
                continue
        pdesc += 1
        clist = list(range(ps, ps + pc))
        if order == "tsort" and pmn is not None:
            def ckey(c):
                tmin, hb = slab(O, D, bounds[c, 0:3], bounds[c, 3:6])
                return float(tmin[hb].min()) if hb.any() else np.inf
            clist = sorted(clist, key=ckey)
        for c in clist:
            if pmn is not None:
                mn, mx = bounds[c, 0:3], bounds[c, 3:6]
                tmin, hb = slab(O, D, mn, mx)
                if not (hb & (tmin < t_r)).any():
                    continue
            desc += 1
            t_r = np.minimum(t_r, tri_ts(O, D, slice(c * leaf, (c + 1) * leaf)))
    return pdesc, desc, t_r


def cosine_scatter(rng2, O, D, t_r):
    """Approximate bounce-1 rays: hitpoints + cosine directions about +z
    (normals unknown here — direction spread is what matters)."""
    hit = np.isfinite(t_r)
    t = np.where(hit, t_r, 1.0)
    O2 = O + D * t[:, None]
    u1, u2 = rng2.rand(len(O)), rng2.rand(len(O))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    D2 = np.stack([r * np.cos(phi), r * np.sin(phi),
                   np.sqrt(np.maximum(0, 1 - u1))], -1)
    sign = np.where(rng2.rand(len(O)) < 0.5, 1.0, -1.0)
    D2[:, 2] *= sign  # half the lanes bounce downward
    return O2, D2, hit


blocks = [block_i] if block_i is not None else \
    list(range(0, n_blocks, max(1, n_blocks // 8)))
rng2 = np.random.RandomState(11)
for order in ("static", "tsort"):
    r0, r1 = [], []
    for bi in blocks:
        O, D = block_rays(bi)
        p0, d0, t_r = sweep(O, D, order)
        O2, D2, hit = cosine_scatter(rng2, O, D, t_r)
        p1, d1, _ = sweep(O2[hit], D2[hit], order) if hit.any() else (0, 0, 0)
        r0.append((p0, d0))
        r1.append((p1, d1))
    p0m = np.mean([x[0] for x in r0]); d0m = np.mean([x[1] for x in r0])
    p1m = np.mean([x[0] for x in r1]); d1m = np.mean([x[1] for x in r1])
    print(f"[{order:6s}] bounce0: parents {p0m:.1f}/{len(parents)} "
          f"clusters {d0m:.1f}/{nc} | bounce1: parents {p1m:.1f} "
          f"clusters {d1m:.1f}/{nc}")
