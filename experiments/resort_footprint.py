"""Size up per-bounce ray regrouping: if scattered bounce-1 rays were
re-sorted GLOBALLY by (direction octant, position cell) into fresh blocks,
how many clusters would each block descend?

stream_cull_stats.py showed the streamed tier's wall: bounce-0 blocks
descend ~10% of clusters but bounce-1 blocks descend ~70% — the block
any-reduce can't cull when 4096 lanes point every which way. This script
answers whether a global per-bounce resort (the classic wavefront
"ray-sorting" stage, done here as one XLA argsort between kernel bounces)
would fix the footprint, BEFORE we pay for building it.

Pure host numpy. Usage:
  python experiments/resort_footprint.py NTRIS [cloud|sphere] [LANES]
Prints mean clusters descended per block for bounce-1 rays:
  unsorted / octant-sorted / (octant,cell)-sorted
"""
import sys

import numpy as np

ntris = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
shape_kind = sys.argv[2] if len(sys.argv) > 2 else "cloud"
lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder


def tessellated_sphere(n_target, radius=8.0, center=(0.0, 0.0, 0.0)):
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
bounds = np.asarray(scene.mtri_bounds)
parents = scene.stream_parents
print(f"ntris={ntris} clusters={nc} leaf={leaf} parents={len(parents)} "
      f"lanes/block={lanes}")

pack = np.asarray(scene.mtri_pack)
per, F = 9, 13
stride = -(-leaf // per) * per
flat = pack[:, : per * F].reshape(-1, F)
n_v, d_c = flat[:, 0:3], flat[:, 3]
e1, a0 = flat[:, 4:7], flat[:, 7]
e2, b0 = flat[:, 8:11], flat[:, 11]
TOL, MINHIT = 1e-9, 1e-4


def tri_ts(O, D, sl):
    nn = n_v[sl]
    denom = D @ nn.T
    valid = np.abs(denom) > TOL
    t = (d_c[sl][None, :] - O @ nn.T) / np.where(valid, denom, 1.0)
    alpha = (O @ e1[sl].T - a0[sl][None, :]) + t * (D @ e1[sl].T)
    beta = (O @ e2[sl].T - b0[sl][None, :]) + t * (D @ e2[sl].T)
    hit = valid & (alpha >= 0) & (beta >= 0) & (alpha + beta <= 1) & (t > MINHIT)
    return np.where(hit, t, np.inf).min(axis=1)


def slab(O, D, mn, mx):
    inv = 1.0 / np.where(D != 0, D, 1e-30)
    t0 = (mn[None, :] - O) * inv
    t1 = (mx[None, :] - O) * inv
    tmin = np.minimum(t0, t1).max(axis=1)
    tmax = np.maximum(t0, t1).min(axis=1)
    return tmin, (tmax >= tmin) & (tmax >= 0)


def plane_t(O, D):
    denom = D[:, 2]
    valid = np.abs(denom) > TOL
    t = (10.0 - O[:, 2]) / np.where(valid, denom, 1.0)
    return np.where(valid & (t > MINHIT), t, np.inf)


def sweep(O, D):
    """Returns (parents_descended, clusters_descended, best t)."""
    t_r = plane_t(O, D)
    desc = pdesc = 0
    for (ps, pc, pmn, pmx) in parents:
        if pmn is not None:
            tmin, hb = slab(O, D, np.asarray(pmn), np.asarray(pmx))
            if not (hb & (tmin < t_r)).any():
                continue
        pdesc += 1
        for c in range(ps, ps + pc):
            if pmn is not None:
                tmin, hb = slab(O, D, bounds[c, 0:3], bounds[c, 3:6])
                if not (hb & (tmin < t_r)).any():
                    continue
            desc += 1
            t_r = np.minimum(t_r, tri_ts(O, D, slice(c * stride,
                                                     (c + 1) * stride)))
    return pdesc, desc, t_r


# ---- generate a big pool of bounce-1 rays from many primary tiles
from pathtracer_tpu.render.pallas_backend import _tile_perm_np
import pathtracer_tpu.render.raygen as raygen
import jax.numpy as jnp

rows = 32
perm, _ = _tile_perm_np(W, H, rows)
n_blocks = len(perm) // (rows * 128)
rng2 = np.random.RandomState(11)

O1s, D1s = [], []
for bi in range(0, n_blocks, max(1, n_blocks // 16)):
    pix = jnp.asarray(perm[bi * rows * 128:(bi + 1) * rows * 128])
    half = jnp.full(pix.shape, 0.5, jnp.float32)
    o, d = raygen.pinhole_rays(camera, W, H, 1, 0, 0, (half, half), pix)
    O = np.stack([np.asarray(o.x), np.asarray(o.y), np.asarray(o.z)], -1)
    D = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
    _, _, t_r = sweep(O, D)
    hit = np.isfinite(t_r)
    t = np.where(hit, t_r, 1.0)
    O2 = O + D * t[:, None]
    u1, u2 = rng2.rand(len(O)), rng2.rand(len(O))
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    D2 = np.stack([r * np.cos(phi), r * np.sin(phi),
                   np.sqrt(np.maximum(0, 1 - u1))], -1)
    D2[:, 2] *= np.where(rng2.rand(len(O)) < 0.5, 1.0, -1.0)
    O1s.append(O2[hit])
    D1s.append(D2[hit])
O1 = np.concatenate(O1s)
D1 = np.concatenate(D1s)
print(f"bounce-1 pool: {len(O1)} rays")


def mean_footprint(O, D, order=None):
    if order is not None:
        O, D = O[order], D[order]
    ds, ps = [], []
    nb = len(O) // lanes
    for i in range(nb):
        sl = slice(i * lanes, (i + 1) * lanes)
        p, d_, _ = sweep(O[sl], D[sl])
        ps.append(p)
        ds.append(d_)
    return np.mean(ps), np.mean(ds), nb


p0, d0, nb = mean_footprint(O1, D1)
print(f"[unsorted      ] parents {p0:.1f}/{len(parents)} "
      f"clusters {d0:.1f}/{nc}  ({nb} blocks)")

octant = ((D1[:, 0] > 0).astype(int) * 4 + (D1[:, 1] > 0).astype(int) * 2
          + (D1[:, 2] > 0).astype(int))
p1, d1, _ = mean_footprint(O1, D1, np.argsort(octant, kind="stable"))
print(f"[octant        ] parents {p1:.1f}/{len(parents)} clusters {d1:.1f}/{nc}")

# position cell: 4x4x4 grid over the scene bounds
lo, hi = O1.min(axis=0), O1.max(axis=0)
cell = np.clip(((O1 - lo) / np.maximum(hi - lo, 1e-9) * 4).astype(int), 0, 3)
cell_id = cell[:, 0] * 16 + cell[:, 1] * 4 + cell[:, 2]
key = octant * 64 + cell_id
p2, d2, _ = mean_footprint(O1, D1, np.argsort(key, kind="stable"))
print(f"[octant x cell ] parents {p2:.1f}/{len(parents)} clusters {d2:.1f}/{nc}")

# finer: 6 direction buckets per axis-dominant + sign, x 8x8x8 cells
dom = np.argmax(np.abs(D1), axis=1)
sgn = (np.take_along_axis(D1, dom[:, None], 1)[:, 0] > 0).astype(int)
dirb = dom * 2 + sgn
cell8 = np.clip(((O1 - lo) / np.maximum(hi - lo, 1e-9) * 8).astype(int), 0, 7)
cell8_id = (cell8[:, 0] * 64 + cell8[:, 1] * 8 + cell8[:, 2]).astype(int)
key2 = dirb * 512 + cell8_id
p3, d3, _ = mean_footprint(O1, D1, np.argsort(key2, kind="stable"))
print(f"[dir6 x cell8  ] parents {p3:.1f}/{len(parents)} clusters {d3:.1f}/{nc}")
