"""Batched ray-primitive intersection (lane-parallel over rays).

Each function intersects a batch of N rays (SoA Vec3) against ONE primitive
whose parameters are scalars or broadcastable arrays; the scene-level
dispatcher scans the (static-shape, masked) primitive tables with
``lax.fori_loop`` carrying the running nearest hit. Semantics are exact
batched translations of the reference's scalar intersectors:

- RaySphereIntersect           (win32_main.cpp:2355-2379)
- RayIntersectPlane            (ray_math.hpp:334-341)
- RayIntersectPlanarShape<T|Q> (ray_math.hpp:353-381)
- RayIntersectWithAABB2        (ray_math.hpp:398-482, 6-face test)
- RayCastIntersect             (win32_main.cpp:406-556): category order
  spheres -> quads -> planes -> triangles -> aabbs with strict-< updates,
  quads using the hardcoded minHit=0.02 Cornell hack (win32_main.cpp:446),
  miss => hitMatIndex 0 (sky) and hitDistance FLT_MAX.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..scene.schema import (
    F32_MAX, MIN_HIT_DISTANCE, QUAD_MIN_HIT_DISTANCE, Scene, TOLERANCE,
)
from ..utils.vec import Vec3, cross, dot, normalize, where as vwhere


class Hit(NamedTuple):
    """ray_payload_t (ray.hpp:137-141): SoA over the ray batch."""
    t: jnp.ndarray
    mat: jnp.ndarray       # int32
    normal: Vec3


def ray_sphere(
    o: Vec3, d: Vec3, center: Vec3, radius, min_hit: float = MIN_HIT_DISTANCE
) -> Tuple[jnp.ndarray, jnp.ndarray, Vec3]:
    """RaySphereIntersect (win32_main.cpp:2355-2379). Near root only.

    Returns (t, hit, normal); t/normal are meaningful only where hit.
    """
    rel = o - center
    a = dot(d, d)
    b = 2.0 * dot(rel, d)
    c = dot(rel, rel) - radius * radius
    disc = b * b - 4.0 * a * c
    ok = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - root) / (2.0 * a)
    hit = ok & (root > TOLERANCE) & (t > min_hit)
    n = normalize(d * t + rel, eps=1e-30)
    return t, hit, n


def ray_plane(
    o: Vec3, d: Vec3, n: Vec3, d_coef, min_hit: float = MIN_HIT_DISTANCE
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RayIntersectPlane (ray_math.hpp:334-341). Returns (t, valid) where
    valid means |denom| > TOLERANCE; the caller applies the t > min_hit test
    exactly as RayCastIntersect does (win32_main.cpp:468)."""
    denom = dot(n, d)
    valid = (denom < -TOLERANCE) | (denom > TOLERANCE)
    t = (d_coef - dot(n, o)) / jnp.where(valid, denom, 1.0)
    return t, valid


def _planar_coords(o: Vec3, d: Vec3, t, A: Vec3, u: Vec3, v: Vec3):
    """alpha/beta parameterization shared by tri/quad (ray_math.hpp:367-372)."""
    n = cross(u, v)
    p = o + d * t - A
    w = n * (1.0 / dot(n, n))
    alpha = dot(w, cross(p, v))
    beta = dot(w, cross(u, p))
    return alpha, beta


def ray_planar_quad(
    o: Vec3, d: Vec3, A: Vec3, u: Vec3, v: Vec3,
    min_hit: float = QUAD_MIN_HIT_DISTANCE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RayIntersectPlanarShape<PLANAR_QUAD> (ray_math.hpp:357-381) combined
    with the caller's t > min_hit acceptance (win32_main.cpp:448-451)."""
    n = cross(u, v)
    n_unit = normalize(n, eps=1e-30)
    d_coef = dot(A, n_unit)
    t, valid = ray_plane(o, d, n_unit, d_coef, min_hit)
    alpha, beta = _planar_coords(o, d, t, A, u, v)
    inside = (alpha >= 0.0) & (alpha <= 1.0) & (beta >= 0.0) & (beta <= 1.0)
    hit = valid & inside & (t > min_hit)
    return t, hit


def ray_planar_triangle_uv(
    o: Vec3, d: Vec3, A: Vec3, u: Vec3, v: Vec3,
    min_hit: float = MIN_HIT_DISTANCE,
):
    """ray_planar_triangle + its barycentrics (alpha along u, beta along
    v; hitpoint = A + alpha*u + beta*v), for per-vertex attribute
    interpolation at the winning hit."""
    n = cross(u, v)
    n_unit = normalize(n, eps=1e-30)
    d_coef = dot(A, n_unit)
    t, valid = ray_plane(o, d, n_unit, d_coef, min_hit)
    alpha, beta = _planar_coords(o, d, t, A, u, v)
    inside = (alpha >= 0.0) & (beta >= 0.0) & ((alpha + beta) <= 1.0)
    hit = valid & inside & (t > min_hit)
    return t, hit, alpha, beta


def ray_planar_triangle(
    o: Vec3, d: Vec3, A: Vec3, u: Vec3, v: Vec3,
    min_hit: float = MIN_HIT_DISTANCE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RayIntersectPlanarShape<PLANAR_TRIANGLE> (ray_math.hpp:357-381)."""
    t, hit, _, _ = ray_planar_triangle_uv(o, d, A, u, v, min_hit)
    return t, hit


_FACE_NORMALS = (
    (0.0, 0.0, -1.0), (0.0, 0.0, 1.0),
    (-1.0, 0.0, 0.0), (1.0, 0.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, -1.0, 0.0),
)


def ray_aabb_faces(
    o: Vec3, d: Vec3, box_min: Vec3, box_max: Vec3
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RayIntersectWithAABB2 (ray_math.hpp:398-482): test the 6 faces in
    order front(z-)/back(z+)/left(x-)/right(x+)/top(y+)/bottom(y-); the
    FIRST face whose in-plane hit point lies inside the box (t >= 0,
    inclusive bounds) wins — this temporal-stability rule is part of the
    reference contract. Returns (t, hit, face_idx)."""
    def face(j):
        if j in (0, 1):
            axis_o, axis_d = o.z, d.z
            coord = box_min.z if j == 0 else box_max.z
            p = lambda t: (o.x + d.x * t, o.y + d.y * t, coord)
        elif j in (2, 3):
            axis_o, axis_d = o.x, d.x
            coord = box_min.x if j == 2 else box_max.x
            p = lambda t: (coord, o.y + d.y * t, o.z + d.z * t)
        else:
            axis_o, axis_d = o.y, d.y
            coord = box_max.y if j == 4 else box_min.y
            p = lambda t: (o.x + d.x * t, coord, o.z + d.z * t)
        nonzero = axis_d != 0.0
        t = (coord - axis_o) / jnp.where(nonzero, axis_d, 1.0)
        px, py, pz = p(t)
        inb = (
            (px >= box_min.x) & (px <= box_max.x)
            & (py >= box_min.y) & (py <= box_max.y)
            & (pz >= box_min.z) & (pz <= box_max.z)
        )
        return t, nonzero & (t >= 0.0) & inb

    shape = jnp.shape(o.x)
    best_t = jnp.zeros(shape)
    best_face = jnp.zeros(shape, jnp.int32)
    found = jnp.zeros(shape, bool)
    for j in range(6):
        t, ok = face(j)
        take = ok & ~found
        best_t = jnp.where(take, t, best_t)
        best_face = jnp.where(take, j, best_face)
        found = found | ok
    return best_t, found, best_face


def ray_aabb_hit(o: Vec3, d: Vec3, box_min: Vec3, box_max: Vec3) -> jnp.ndarray:
    """Boolean reject used by octree traversal (RayIntersectsWithAABB,
    win32_main.cpp:394-404). Implemented as a slab test, which is
    boolean-equivalent to the 6-face test (touch-at-t>=0) and far cheaper
    on the VPU."""
    inv = Vec3(
        1.0 / jnp.where(d.x != 0.0, d.x, 1e-30),
        1.0 / jnp.where(d.y != 0.0, d.y, 1e-30),
        1.0 / jnp.where(d.z != 0.0, d.z, 1e-30),
    )
    t0x = (box_min.x - o.x) * inv.x
    t1x = (box_max.x - o.x) * inv.x
    t0y = (box_min.y - o.y) * inv.y
    t1y = (box_max.y - o.y) * inv.y
    t0z = (box_min.z - o.z) * inv.z
    t1z = (box_max.z - o.z) * inv.z
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return (tmax >= tmin) & (tmax >= 0.0)


def ray_slab_entry(o: Vec3, d: Vec3, mn, mx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test against a STATIC AABB (python-float corners baked as
    immediates). Returns (t_enter, hit). Any primitive hit inside the box
    has t >= t_enter, so a cluster is prunable when every lane's best t is
    already closer (scene/clusters.py)."""
    inv = Vec3(
        1.0 / jnp.where(d.x != 0.0, d.x, 1e-30),
        1.0 / jnp.where(d.y != 0.0, d.y, 1e-30),
        1.0 / jnp.where(d.z != 0.0, d.z, 1e-30),
    )
    t0x = (mn[0] - o.x) * inv.x
    t1x = (mx[0] - o.x) * inv.x
    t0y = (mn[1] - o.y) * inv.y
    t1y = (mx[1] - o.y) * inv.y
    t0z = (mn[2] - o.z) * inv.z
    t1z = (mx[2] - o.z) * inv.z
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return tmin, (tmax >= tmin) & (tmax >= 0.0)


# experiments/cluster_ablation.py: when True every cluster's tests run
# unconditionally (isolates branch overhead from pruning benefit)
FORCE_CLUSTERS = False


def _intersect_clustered_idx(clusters, test_idx, o: Vec3, d: Vec3, best: Hit,
                             resolve) -> Hit:
    """Packet-culled nearest hit with DEFERRED attribute resolution: per
    cluster, a vectorized slab test + a block-level any-reduce decide
    whether the cluster's (statically unrolled) primitive tests run at all.
    lax.cond is a REAL branch under Mosaic (measured: skipped clusters cost
    ~0.3us of reduce+branch, experiments/cond_skip_micro.py). The unrolled
    per-primitive tests carry only (t, winner index) — two selects per
    primitive instead of five (t, mat, normal.xyz) — and ``resolve``
    reconstructs mat/normal ONCE per bounce from the winning index (a
    windowed lane-LUT over the clustered tables). Nearest-hit semantics are
    order independent (strict < keeps the closest; exact float ties between
    DIFFERENT primitives are the only divergence from reference iteration
    order)."""
    t_run = best.t
    idx_run = jnp.full(jnp.shape(best.t), -1, jnp.int32)
    carry = (t_run, idx_run)
    for (off, cnt, mn, mx) in clusters:
        def tests(c, off=off, cnt=cnt):
            t_r, i_r = c
            for k in range(cnt):
                t, hitm = test_idx(off + k)
                take = hitm & (t < t_r)
                t_r = jnp.where(take, t, t_r)
                i_r = jnp.where(take, off + k, i_r)
            return (t_r, i_r)
        if mn is None or FORCE_CLUSTERS:
            carry = tests(carry)
        else:
            t_enter, hb = ray_slab_entry(o, d, mn, mx)
            relevant = hb & (t_enter < carry[0])
            carry = jax.lax.cond(jnp.any(relevant), tests, lambda c: c, carry)
    t_run, idx_run = carry
    found = idx_run >= 0
    return resolve(t_run, idx_run, found, best)


def _intersect_triangles_streamed(scene: Scene, o: Vec3, d: Vec3,
                                  best: Hit, want_uv: bool = False):
    """Streamed mesh tier: packet culling with DYNAMIC record reads.

    ``want_uv`` (mesh-UV scenes): the carry additionally tracks the
    winner's interpolated texcoord. Each record row's 9 tests also keep
    row-local (winner slot, alpha, beta); when ANY lane improved in the
    row, a real branch loads the PARALLEL uv row (Scene.mtri_uvpack,
    clusters.pack_stream_uv) and selects the interpolated uv — so the
    54-lane uv extraction is paid on winning rows only, not per visit.
    Returns (hit, uvx, uvy, uv_ok) instead of a bare Hit. In DMA mode
    the uv rows ride their OWN double-buffered scratch + semaphore pair
    (stream_uv_scratch/stream_uv_sem): copies start and wait alongside
    the record copies (a wait inside the rare uv branch would unbalance
    the semaphore), and only the rare branch's row read touches them.

    Meshes above the static-unroll budget (scene.tri_streamed,
    clusters.STREAM_MIN) loop a `lax.fori_loop` over clusters: the
    cluster's AABB row and each triangle's 13-field record are read by
    dynamic row index (`pl.ds` on the VMEM ref — the sublane axis slides
    fine; it is the LANE axis that cannot) and broadcast to the block by a
    constant-index lane LUT. Code size is O(1) in mesh size; per-triangle
    cost is ~2x the static unroll's (the extraction tax), which the
    pruning repays at scale (BENCH.md: crossover study). Winner
    attributes resolve INLINE from the loaded record (not the windowed
    post-LUT the static tier uses — that unrolls O(n/128) windows)."""
    from jax.experimental import pallas as pl
    from ..scene import clusters as clu

    shape = jnp.shape(o.x)
    leaf = scene.stream_leaf
    per = clu.STREAM_TRIS_PER_ROW
    F = clu.STREAM_FIELDS
    # field-major layout (PT_FM_TIER=1): mtri_pack holds
    # clusters.pack_stream_fm tiles; record rows and uv rows have
    # DIFFERENT per-cluster row counts (13 vs 6 per 128-tri tile)
    fm = scene.stream_fm
    tpc = clu.fm_tiles_per_cluster(leaf)
    rpc = (clu.fm_rows_per_cluster(leaf) if fm
           else clu.stream_rows_per_cluster(leaf))  # static rows/cluster
    # cluster-field-major uv layout (Scene.stream_uv_cfm, round 5): the
    # winner uv resolves once per descended cluster from 6 field rows
    # (lane = cluster-local tri index) instead of per record row
    cfm_uv = want_uv and scene.stream_uv_cfm and not fm
    rpc_uv = (clu.fm_uv_rows_per_cluster(leaf) if fm
              else (clu.UV_CFM_ROWS if cfm_uv else rpc))
    # DMA mode (scene.tri_dma, > STREAM_MAX tris): the pack rows live in
    # HBM; render/pallas_backend hands the kernel a 2-slot VMEM scratch
    # (2*rpc rows) + DMA semaphore pair through the scene pytree. Only the
    # kernel sets them — the XLA drivers read mtri_pack directly (XLA
    # manages residency itself).
    dma = scene.stream_scratch is not None
    dma_uv = want_uv and dma

    def _dma_copy(c, slot):
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.make_async_copy(
            scene.mtri_pack.at[pl.ds(c * rpc, rpc), :],
            scene.stream_scratch.at[pl.ds(slot * rpc, rpc), :],
            scene.stream_sem.at[slot])

    def _dma_copy_uv(c, slot):
        from jax.experimental.pallas import tpu as pltpu
        return pltpu.make_async_copy(
            scene.mtri_uvpack.at[pl.ds(c * rpc_uv, rpc_uv), :],
            scene.stream_uv_scratch.at[pl.ds(slot * rpc_uv, rpc_uv), :],
            scene.stream_uv_sem.at[slot])

    def _rows_slice(tab, i, n):
        # refs (compiled OR interpret kernels) slide the sublane axis with
        # pl.ds; plain arrays (XLA equivalence-test path) use dynamic_slice
        if "Ref" in type(jax.typeof(tab)).__name__:
            return tab[pl.ds(i, n), :]
        return jax.lax.dynamic_slice_in_dim(tab, i, n, axis=0)

    def row_bcast(tab, i):
        r = _rows_slice(tab, i, 1)
        # fm column space: keep the raw (1, 128) row — lane() broadcasts
        # per-field via a STATIC lane slice (no take_along_axis)
        return r if fm else jnp.broadcast_to(r, shape)

    def lane(rowb, j):
        # fm: shape is (R, 1), so rowb[:, j:j+1] is a (1,1) -> (R,1)
        # SUBLANE-only broadcast, which lowers. For the record loop's
        # (R, 128) blocks the static-slice form needs a (1,1) -> (R,128)
        # broadcast "in both sublanes and lanes" — Mosaic has NO lowering
        # for that (measured decisive negative, BENCH.md round 4; chained
        # single-axis broadcasts get re-fused by XLA and hit the same
        # error), so field extraction stays take_along_axis on the
        # sublane-broadcast row (a lane-uniform dynamic_gather).
        if fm:
            return jnp.broadcast_to(rowb[:, j:j + 1], shape)
        idx = jnp.broadcast_to(jnp.asarray(j, jnp.int32), shape)
        return jnp.take_along_axis(rowb, idx, axis=-1)

    orig_shape = shape
    if fm:
        # Field-major pair layout: rays relayout ONCE per bounce into
        # (R, 1) columns and the WHOLE traversal (slab tests, carries)
        # runs in column space — every (ray, triangle) pair is then a
        # lane of a (chunk, 128) vector op against the tile's (1, 128)
        # field rows: no per-triangle extraction, no per-triangle select
        # chain (the winner is a lane-min reduce). Outputs reshape back
        # at the end. Ray chunks bound the pair temps to ~(1024, 128)
        # f32 so VMEM stays flat.
        R = 1
        for s in shape:
            R *= int(s)
        _col = lambda a: a.reshape(R, 1)
        o = Vec3(_col(o.x), _col(o.y), _col(o.z))
        d = Vec3(_col(d.x), _col(d.y), _col(d.z))
        best = Hit(_col(best.t), _col(best.mat),
                   Vec3(_col(best.normal.x), _col(best.normal.y),
                        _col(best.normal.z)))
        shape = (R, 1)
        # int iota + convert: Mosaic's tpu.iota only produces integer
        # vectors (f32 iota fails MLIR verification); i32->f32 converts
        # fine (it is u32->f32 that has no lowering)
        fm_lane = jax.lax.broadcasted_iota(
            jnp.int32, (1, 128), 1).astype(jnp.float32)
        FM_CH = 1024 if R % 1024 == 0 else R
        fm_nch = R // FM_CH

    t_init = best.t
    # loop-invariant per bounce: hoisted out of the cluster loop
    inv = Vec3(1.0 / jnp.where(d.x != 0.0, d.x, 1e-30),
               1.0 / jnp.where(d.y != 0.0, d.y, 1e-30),
               1.0 / jnp.where(d.z != 0.0, d.z, 1e-30))

    def row_slab_relevant(brow, t_r, base=0):
        # slab test against an AABB row's [mn3 mx3] lanes (at lane offset
        # ``base``) vs the carry's best t — shared by the cluster level,
        # the dynamic parents, and the per-row boxes in the pack rows'
        # spare lanes (clusters.ROW_BOUNDS_LANE)
        mn = [lane(brow, base + k) for k in range(3)]
        mx = [lane(brow, base + 3 + k) for k in range(3)]
        t0x = (mn[0] - o.x) * inv.x
        t1x = (mx[0] - o.x) * inv.x
        t0y = (mn[1] - o.y) * inv.y
        t1y = (mx[1] - o.y) * inv.y
        t0z = (mn[2] - o.z) * inv.z
        t1z = (mx[2] - o.z) * inv.z
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        return (tmax >= tmin) & (tmax >= 0.0) & (tmin < t_r)

    def make_cluster_run(c, slot):
        # The DESCEND body for cluster ``c`` (rows loaded from the DMA
        # scratch ``slot`` when set, else from the resident pack): returns
        # the run(carry) closure. Split from the bounds test so run_range's
        # grouped path can batch the per-cluster relevance reduces.
        if True:  # (keeps the historical indentation of the inner defs)

            def load_row(r):
                # ONE dynamic row read per 9 triangles; record fields
                # extract at STATIC lane offsets (clusters are row-aligned,
                # clusters.pack_stream_clusters). Winner attributes
                # (normal, mat) resolve INLINE from the loaded row: a
                # windowed post-LUT would unroll O(n_tris/128) windows —
                # fine for the static tier's <= 1024 rows, code-size
                # explosion at this tier's 32k+. Padding records have
                # n=0 -> invalid -> never hit.
                if dma:
                    return row_bcast(scene.stream_scratch, slot * rpc + r)
                return row_bcast(scene.mtri_pack, c * rpc + r)

            def row_test(trow, r, cc):
                def test9(cc):
                    t_r2, nx, ny, nz, mf = cc[:5]
                    if cfm_uv:
                        # cluster-local winner (tri index, alpha, beta)
                        # carried ACROSS rows; uv untouched until the
                        # per-cluster resolve (resolve_uv_cfm)
                        uvx, uvy, kw, aw, bw = cc[5:10]
                    elif want_uv:
                        uvx, uvy = cc[5], cc[6]
                        zero = t_r2 * 0.0
                        # row-local winner slot + barycentrics (f32 slot
                        # id: -1 = no winner in this row)
                        jw, aw, bw = zero - 1.0, zero, zero
                    for jj in range(per):  # static 9-way unroll
                        base = jj * F
                        f = lambda j, base=base: lane(trow, base + j)
                        n = Vec3(f(0), f(1), f(2))
                        e1 = Vec3(f(4), f(5), f(6))
                        e2 = Vec3(f(8), f(9), f(10))
                        denom = dot(n, d)
                        valid = (denom < -TOLERANCE) | (denom > TOLERANCE)
                        t = (f(3) - dot(n, o)) / jnp.where(valid, denom, 1.0)
                        alpha = (dot(e1, o) - f(7)) + t * dot(e1, d)
                        beta = (dot(e2, o) - f(11)) + t * dot(e2, d)
                        inside = ((alpha >= 0.0) & (beta >= 0.0)
                                  & ((alpha + beta) <= 1.0))
                        hit = valid & inside & (t > MIN_HIT_DISTANCE)
                        take = hit & (t < t_r2)
                        t_r2 = jnp.where(take, t, t_r2)
                        nx = jnp.where(take, n.x, nx)
                        ny = jnp.where(take, n.y, ny)
                        nz = jnp.where(take, n.z, nz)
                        mf = jnp.where(take, f(12), mf)
                        if cfm_uv:
                            # (r*per + jj): cluster-local tri index — r is
                            # a Python int in the unrolled forms, a traced
                            # scalar in the fori form; *1.0 promotes both
                            kw = jnp.where(take, (r * per + jj) * 1.0, kw)
                            aw = jnp.where(take, alpha, aw)
                            bw = jnp.where(take, beta, bw)
                        elif want_uv:
                            jw = jnp.where(take, jnp.float32(jj), jw)
                            aw = jnp.where(take, alpha, aw)
                            bw = jnp.where(take, beta, bw)
                    if cfm_uv:
                        return (t_r2, nx, ny, nz, mf, uvx, uvy, kw, aw, bw)
                    if not want_uv:
                        return (t_r2, nx, ny, nz, mf)

                    def fetch_uv(uv):
                        # load the PARALLEL uv row only when this record
                        # row improved some lane (takes are rare: the
                        # running min improves a handful of times per
                        # block per bounce). Winner fields come out by
                        # ONE per-lane gather per field (take_along_axis
                        # with the per-lane slot index — the same
                        # 128-lane-window tpu.dynamic_gather the windowed
                        # LUTs use): 6 gathers instead of the old 54
                        # static extracts + 18 selects (~9x fewer vector
                        # ops on the winning-row path, round 5).
                        ux, uy = uv
                        if dma_uv:
                            uvrow = row_bcast(scene.stream_uv_scratch,
                                              slot * rpc + r)
                        else:
                            uvrow = row_bcast(scene.mtri_uvpack, c * rpc + r)
                        ok = jw >= 0.0
                        j6 = (jnp.clip(jw, 0.0, jnp.float32(per - 1))
                              * 6.0).astype(jnp.int32)
                        g = lambda k: jnp.take_along_axis(
                            uvrow, j6 + k, axis=-1)
                        nux = g(0) + aw * g(2) + bw * g(4)
                        nuy = g(1) + aw * g(3) + bw * g(5)
                        return (jnp.where(ok, nux, ux),
                                jnp.where(ok, nuy, uy))

                    import os as _e
                    if _e.environ.get("PT_UV_COND"):
                        # ablation: the round-4 form — skip the fetch under
                        # an any-winner branch. Measured SLOWER once the
                        # fetch shrank to 6 gathers (w7 @64spp: 53.5 cond
                        # vs 55.1 unconditional): the ~470-cycle any-reduce
                        # costs more than the fetch it skips, and it
                        # serializes the row chain.
                        uvx, uvy = jax.lax.cond(jnp.any(jw >= 0.0), fetch_uv,
                                                lambda uv: uv, (uvx, uvy))
                    else:
                        # unconditional: no-winner rows mask to unchanged
                        # (ok all false) — identical values, no reduce
                        uvx, uvy = fetch_uv((uvx, uvy))
                    return (t_r2, nx, ny, nz, mf, uvx, uvy)

                return test9(cc)

            def row_body(r, cc):
                # fori form (rpc above the unroll budget): one row per
                # iteration, cull + test inline
                trow = load_row(r)
                if not scene.stream_row_cull:
                    return row_test(trow, r, cc)
                # Third culling level: the row's own 9-tri AABB rides the
                # spare lanes of the row just loaded (zero extra traffic;
                # clusters.ROW_BOUNDS_LANE). ~40 vector ops + a branch
                # against up to 9 x ~45 ops of triangle tests; rows are
                # spatially tight (clusters.row_order), and all-padding
                # rows pack a far-point box so they skip for free.
                rowrel = row_slab_relevant(trow, cc[0],
                                           base=clu.ROW_BOUNDS_LANE)
                return jax.lax.cond(
                    jnp.any(rowrel),
                    lambda cc: row_test(trow, r, cc),
                    lambda cc: cc, cc)

            def fm_tests(cc):
                # Field-major tiles (clusters.pack_stream_fm): the tile's
                # 13 field rows load once; every (ray, triangle) pair is
                # a lane of a (FM_CH, 128) vector op. The winner is a
                # lane-min reduce; ties pick the lowest lane then the
                # earliest tile/cluster (strict-<), matching the record
                # loop's sequential first-win order. Attributes (and uv)
                # resolve under a rare any-improved branch via a unique
                # one-hot lane mask — no per-lane gathers.
                FMF = clu.FM_FIELDS
                for tl in range(tpc):
                    if dma:
                        rows = scene.stream_scratch[
                            pl.ds(slot * rpc + tl * FMF, FMF), :]
                    else:
                        rows = _rows_slice(scene.mtri_pack,
                                           (c * tpc + tl) * FMF, FMF)

                    def chunk_body(k, cc, rows=rows, tl=tl):
                        # k is a PYTHON int (the chunk loop is unrolled):
                        # Mosaic cannot lower dynamic_slice on register
                        # VALUES (only pl.ds on refs), so the ray-column
                        # slices must be static. miss fill must equal the
                        # carry's init (F32_MAX) so an all-miss tile never
                        # "improves" a miss ray
                        FMBIG = jnp.float32(F32_MAX)
                        NEGBIG = jnp.float32(-3e38)
                        fr = lambda j: rows[j:j + 1, :]
                        s0 = k * FM_CH
                        sl = lambda a: a[s0:s0 + FM_CH, :]
                        ox, oy, oz = sl(o.x), sl(o.y), sl(o.z)
                        dx, dy, dz = sl(d.x), sl(d.y), sl(d.z)
                        denom = fr(0) * dx + fr(1) * dy + fr(2) * dz
                        valid = (denom < -TOLERANCE) | (denom > TOLERANCE)
                        no_ = fr(0) * ox + fr(1) * oy + fr(2) * oz
                        t = (fr(3) - no_) / jnp.where(valid, denom, 1.0)
                        e1o = fr(4) * ox + fr(5) * oy + fr(6) * oz
                        e1d = fr(4) * dx + fr(5) * dy + fr(6) * dz
                        alpha = (e1o - fr(7)) + t * e1d
                        e2o = fr(8) * ox + fr(9) * oy + fr(10) * oz
                        e2d = fr(8) * dx + fr(9) * dy + fr(10) * dz
                        beta = (e2o - fr(11)) + t * e2d
                        hit = (valid & (alpha >= 0.0) & (beta >= 0.0)
                               & ((alpha + beta) <= 1.0)
                               & (t > MIN_HIT_DISTANCE))
                        tm = jnp.where(hit, t, FMBIG)
                        t_best = jnp.min(tm, axis=1, keepdims=True)
                        cur = tuple(sl(x) for x in cc)
                        improved = t_best < cur[0]

                        def resolve(cur):
                            oh = (tm == t_best) & improved
                            wl = jnp.min(jnp.where(oh, fm_lane, FMBIG),
                                         axis=1, keepdims=True)
                            oh1 = oh & (fm_lane == wl)

                            def pick(row):
                                return jnp.max(
                                    jnp.where(oh1, jnp.broadcast_to(
                                        row, tm.shape), NEGBIG),
                                    axis=1, keepdims=True)
                            out = (jnp.where(improved, t_best, cur[0]),
                                   jnp.where(improved, pick(fr(0)), cur[1]),
                                   jnp.where(improved, pick(fr(1)), cur[2]),
                                   jnp.where(improved, pick(fr(2)), cur[3]),
                                   jnp.where(improved, pick(fr(12)), cur[4]))
                            if want_uv:
                                FMU = clu.FM_UV_ROWS
                                if dma_uv:
                                    uvr = scene.stream_uv_scratch[
                                        pl.ds(slot * rpc_uv + tl * FMU,
                                              FMU), :]
                                else:
                                    uvr = _rows_slice(
                                        scene.mtri_uvpack,
                                        (c * tpc + tl) * FMU, FMU)
                                fu = lambda j: uvr[j:j + 1, :]
                                # winner uv: the same interpolation the
                                # record loop applies to (aw, bw) — pick
                                # extracts the winner lane's value
                                up = fu(0) + alpha * fu(2) + beta * fu(4)
                                vp = fu(1) + alpha * fu(3) + beta * fu(5)
                                out += (jnp.where(improved, pick(up),
                                                  cur[5]),
                                        jnp.where(improved, pick(vp),
                                                  cur[6]))
                            return out

                        return jax.lax.cond(jnp.any(improved), resolve,
                                            lambda cur: cur, cur)
                    if fm_nch == 1:
                        cc = chunk_body(0, cc)
                    else:
                        # unrolled chunk loop (fm_nch = R // FM_CH is
                        # static): each chunk owns rows [k*FM_CH,
                        # (k+1)*FM_CH) exactly, so the carry rebuilds by
                        # concatenation — no dynamic_update_slice on
                        # values (un-lowerable in Mosaic)
                        pieces = [chunk_body(k, cc) for k in range(fm_nch)]
                        cc = tuple(jnp.concatenate(ps, axis=0)
                                   for ps in zip(*pieces))
                return cc

            def resolve_uv_cfm(cc):
                # ONE uv resolve per descended cluster (cfm layout): 6
                # field-row loads + 6 per-lane dynamic_gathers on the
                # cluster-local winner index — independent, so they
                # pipeline — under a single any-winner branch (takes are
                # rare: most descended clusters improve nobody and skip
                # the whole resolve for one ~470-cycle reduce). Same
                # interpolation expression order as the row-parallel
                # fetch (g0 + aw*g2 + bw*g4), so winner values are
                # BIT-equal to the old per-row path.
                def do(cc):
                    t_r2, nx, ny, nz, mf, uvx, uvy, kw, aw, bw = cc
                    U = clu.UV_CFM_ROWS
                    if dma_uv:
                        rows6 = [row_bcast(scene.stream_uv_scratch,
                                           slot * U + k) for k in range(U)]
                    else:
                        rows6 = [row_bcast(scene.mtri_uvpack, c * U + k)
                                 for k in range(U)]
                    ok = kw >= 0.0
                    ki = jnp.clip(kw, 0.0, 127.0).astype(jnp.int32)
                    g = lambda k: jnp.take_along_axis(rows6[k], ki, axis=-1)
                    nux = g(0) + aw * g(2) + bw * g(4)
                    nuy = g(1) + aw * g(3) + bw * g(5)
                    return (t_r2, nx, ny, nz, mf,
                            jnp.where(ok, nux, uvx),
                            jnp.where(ok, nuy, uvy), kw, aw, bw)
                return jax.lax.cond(jnp.any(cc[7] >= 0.0), do,
                                    lambda cc: cc, cc)

            def run(cc):
                if cfm_uv:
                    zero = cc[0] * 0.0
                    cc = rows_pass(cc + (zero - 1.0, zero, zero))
                    return resolve_uv_cfm(cc)[:7]
                return rows_pass(cc)

            def rows_pass(cc):
                if fm:
                    return fm_tests(cc)
                if rpc <= _row_unroll_max():
                    # Python-unrolled row loop (rpc is static): the rows'
                    # ~100-op test chains are independent of the carry
                    # until the final merge, but a fori boundary forbids
                    # Mosaic from overlapping row r+1's loads/tests with
                    # row r's latency tail — straight-line code gives the
                    # scheduler that freedom. Measured bit-equal to the
                    # fori form (tests/test_clusters.py row-unroll A/B).
                    if not scene.stream_row_cull:
                        for r in range(rpc):
                            cc = row_test(load_row(r), r, cc)
                        return cc
                    # Round 5: BATCHED row culls. The old interleaved form
                    # (load row -> slab -> any-reduce -> branch -> tests,
                    # per row) put one ~470-cycle any-reduce latency on
                    # the critical path PER ROW (the reduce's result gates
                    # everything after it). Loading every row and
                    # evaluating all row-box slab tests + their reduces
                    # upfront makes the rpc reduces mutually independent —
                    # they pipeline instead of serializing. Predicates
                    # test against the carry t at CLUSTER ENTRY: a
                    # conservative superset of rows passes (pure pruning —
                    # the tests keep the exact running strict-< carry), so
                    # results stay bit-equal to the interleaved form
                    # (gated in tests/test_clusters.py).
                    rows = [load_row(r) for r in range(rpc)]
                    rels = [jnp.any(row_slab_relevant(
                                rows[r], cc[0], base=clu.ROW_BOUNDS_LANE))
                            for r in range(rpc)]
                    for r in range(rpc):
                        cc = jax.lax.cond(
                            rels[r],
                            lambda cc, r=r: row_test(rows[r], r, cc),
                            lambda cc: cc, cc)
                    return cc
                return jax.lax.fori_loop(0, rpc, row_body, cc)

            return run

    def make_cluster_body(hi):
        # fori body over a cluster range ending at hi (one parent's
        # leaves, or the whole list). DMA slot parity is ABSOLUTE (c % 2)
        # so it composes with both static and traced range starts.
        def cluster_body(c, carry):
            t_r = carry[0]
            slot = None
            if dma:
                # Wait on THIS cluster's copy (started by the range
                # prologue or the previous iteration), then immediately
                # start the NEXT cluster's into the other slot so its
                # HBM->VMEM time hides under this cluster's tests. The
                # prefetch is unconditional within a descended parent —
                # a cluster's rows are ~rpc*512 B, noise next to the
                # slab-test + record-extraction cost.
                slot = jax.lax.rem(c, 2)
                _dma_copy(c, slot).wait()
                if dma_uv:
                    _dma_copy_uv(c, slot).wait()

                @pl.when(c + 1 < hi)
                def _prefetch():
                    _dma_copy(c + 1, 1 - slot).start()
                    if dma_uv:
                        _dma_copy_uv(c + 1, 1 - slot).start()
            brow = row_bcast(scene.mtri_bounds, c)
            relevant = row_slab_relevant(brow, t_r)
            return jax.lax.cond(jnp.any(relevant), make_cluster_run(c, slot),
                                lambda cc: cc, carry)
        return cluster_body

    # Grouped cluster/parent culls (PT_CLUSTER_GROUP > 1): measured
    # NEGATIVE as a default — w7 @64spp 41.4 grouped(4) vs 55.0 running-t
    # (BENCH.md round 5): clusters are camera-ordered and the running t
    # from front clusters culls the back ones; group-entry-t conservatism
    # descends them all, costing far more than the pipelined reduces save.
    # (The intra-CLUSTER batched row culls stay default-on: 11 rows share
    # one cluster's t staleness — mild — and measured a clear win.) The
    # knob remains for the localized-view DMA regime where most
    # parents/gparents DON'T descend and their reduces dominate.
    import os as _osmod
    _CLUSTER_GROUP = int(_osmod.environ.get("PT_CLUSTER_GROUP", "1"))

    def run_range(lo, hi, carry):
        # cluster range [lo, hi) — static for the resident tier's parent
        # descriptors, traced for the DMA tier's dynamic parents. In DMA
        # mode, seed the pipeline: first cluster's rows -> its parity slot.
        if dma:
            _dma_copy(lo, lo % 2).start()
            if dma_uv:
                _dma_copy_uv(lo, lo % 2).start()
        elif _CLUSTER_GROUP > 1 and isinstance(lo, int) and isinstance(hi, int):
            # Round 5: GROUPED cluster culls (resident tier). Like the
            # batched row culls, the per-cluster relevance any-reduces
            # (~470 cycles each) serialize when interleaved with the
            # descents; evaluating a GROUP of bounds tests + reduces
            # upfront pipelines them. Members after the first test against
            # the group-entry t — conservative, pure pruning, bit-equal
            # (the descents keep the exact running strict-< carry).
            # Group bodies stay FUNCTIONS under lax.cond (one copy per
            # group member per group-loop iteration is avoided by the
            # traced member index), so kernel code size is O(GROUP), not
            # O(n_clusters).
            n = hi - lo
            G = min(_CLUSTER_GROUP, n)
            n_groups = -(-n // G)

            def group_body(gi, carry):
                base = lo + gi * G
                cs = [base + k for k in range(G)]
                brows = [row_bcast(scene.mtri_bounds,
                                   jnp.minimum(c, hi - 1)) for c in cs]
                rels = [jnp.any(row_slab_relevant(brows[k], carry[0]))
                        & (cs[k] < hi) for k in range(G)]
                for k in range(G):
                    carry = jax.lax.cond(
                        rels[k], make_cluster_run(cs[k], None),
                        lambda cc: cc, carry)
                return carry
            return jax.lax.fori_loop(0, n_groups, group_body, carry)
        return jax.lax.fori_loop(lo, hi, make_cluster_body(hi), carry)

    zero = o.x * 0.0
    mat_sentinel = zero - 1.0  # f32 mat carry; >= 0 marks a real winner
    init = (t_init, zero, zero, zero, mat_sentinel)
    if want_uv:
        init = init + (zero, zero)
    if scene.n_stream_parents > 0:
        # DYNAMIC parent level (DMA tier): parent AABBs are rows read by
        # dynamic index (same form as cluster bounds) and the (start,
        # count) cluster ranges are int32 scalars (SMEM in the kernel —
        # fori bounds must be scalar). Kernel code size is O(1) in parent
        # count, where the resident tier's static immediates compile
        # ~1.2 s/parent in Mosaic (minutes at 250k+ tris). Semantics match
        # the static branch below exactly; the huge cluster's parent packs
        # as an infinite box (always relevant).
        def parent_descend(p):
            def descend(cc):
                ps = scene.mtri_prange[p, 0]
                pc = scene.mtri_prange[p, 1]
                return run_range(ps, ps + pc, cc)
            return descend

        def parent_body(p, carry):
            prow = row_bcast(scene.mtri_parents, p)
            relevant = row_slab_relevant(prow, carry[0])
            return jax.lax.cond(jnp.any(relevant), parent_descend(p),
                                lambda cc: cc, carry)

        def grouped_level(n_items, bounds_tab, descend_of, carry):
            # Grouped culls one level up (same pipelined-reduce trick as
            # run_range's cluster groups): G bounds rows + G any-reduces
            # evaluate upfront per group — the reduces overlap instead of
            # each sitting on the critical path. Members after the first
            # test against the group-entry t: conservative, pure pruning,
            # bit-equal. At the 1M DMA cap most parents/gparents DON'T
            # descend under a localized view, so their serialized reduces
            # dominate the sweep — exactly what this pipelines.
            G = min(_CLUSTER_GROUP, n_items)
            if G <= 1:
                return None
            n_groups = -(-n_items // G)

            def group_body(gi, carry):
                base = gi * G
                idxs = [base + k for k in range(G)]
                rows = [row_bcast(bounds_tab, jnp.minimum(p, n_items - 1))
                        for p in idxs]
                rels = [jnp.any(row_slab_relevant(rows[k], carry[0]))
                        & (idxs[k] < n_items) for k in range(G)]
                for k in range(G):
                    carry = jax.lax.cond(rels[k], descend_of(idxs[k]),
                                         lambda cc: cc, carry)
                return carry
            return jax.lax.fori_loop(0, n_groups, group_body, carry)

        # Front-to-back EARLY-OUT (PT_PARENT_EARLY, VERDICT r4 item 6):
        # the top-level sweep runs as a while loop whose cond tests the
        # SUFFIX union box packed in lanes 6..12 of the current row
        # (clusters.pack_parents) — once no lane's running t can still be
        # beaten by any remaining (camera-ordered, hence farther) item,
        # the sweep breaks. Pure pruning, bit-equal: every skipped item's
        # entry distance is >= the suffix box's >= every lane's best t.
        # Costs one extra row-load + slab + any-reduce per iteration, so
        # it pays where the sweep would mostly NOT descend (localized
        # views over big parent lists) and taxes where it would (full
        # screen) — both regimes measured in BENCH.md round 5.
        _EARLY = _osmod.environ.get("PT_PARENT_EARLY", "0") != "0"

        def level_sweep(n_items, bounds_tab, body_fn, descend_of, init):
            carry = grouped_level(n_items, bounds_tab, descend_of, init)
            if carry is not None:
                return carry
            if _EARLY and n_items > 1:
                def wcond(c):
                    row = row_bcast(bounds_tab,
                                    jnp.minimum(c[0], n_items - 1))
                    return (c[0] < n_items) & jnp.any(row_slab_relevant(
                        row, c[1], base=clu.PSUFFIX_LANE))

                def wbody(c):
                    return (c[0] + 1,) + tuple(body_fn(c[0], c[1:]))

                out = jax.lax.while_loop(wcond, wbody,
                                         (jnp.int32(0),) + tuple(init))
                return out[1:]
            return jax.lax.fori_loop(0, n_items, body_fn, init)

        if scene.n_stream_gparents > 0:
            # GRANDPARENT level (clusters.GPARENT_MIN+): same dynamic
            # form one level up — grandparent AABB rows + (start, count)
            # PARENT ranges — so the serial per-block-bounce term is
            # O(n_gparents + descended parents), not O(n_parents). The
            # log-depth descent the reference octree gets from
            # AdoptChildren (win32_main.cpp:1395-1440), realized as
            # nested cond-in-fori (both lower fine in Mosaic).
            def gparent_descend(g):
                def descend(cc):
                    gs = scene.mtri_gprange[g, 0]
                    gc = scene.mtri_gprange[g, 1]
                    return jax.lax.fori_loop(gs, gs + gc, parent_body, cc)
                return descend

            def gparent_body(g, carry):
                grow = row_bcast(scene.mtri_gparents, g)
                relevant = row_slab_relevant(grow, carry[0])
                return jax.lax.cond(jnp.any(relevant), gparent_descend(g),
                                    lambda cc: cc, carry)
            carry = level_sweep(scene.n_stream_gparents,
                                scene.mtri_gparents, gparent_body,
                                gparent_descend, init)
        else:
            carry = level_sweep(scene.n_stream_parents,
                                scene.mtri_parents, parent_body,
                                parent_descend, init)
    elif scene.stream_parents:
        # Two-level hierarchy (the TPU analog of the reference octree's
        # log-depth descent, win32_main.cpp:476-526): parent AABBs are
        # STATIC immediates, so each parent's slab test is straight-line
        # vector code — no dynamic row read, no lane extraction. Only hit
        # parents descend into the dynamic cluster loop; the serial
        # reduce+branch chain shrinks from O(n_clusters) to O(n_parents)
        # plus the descended work. Parents and their leaves are camera-
        # ordered, so early descents shrink best.t and cull later parents.
        carry = init
        for (pstart, pcnt, pmn, pmx) in scene.stream_parents:
            def descend(cc, pstart=pstart, pcnt=pcnt):
                return run_range(pstart, pstart + pcnt, cc)
            if pmn is None:
                carry = descend(carry)
            else:
                t_enter, hb = ray_slab_entry(o, d, pmn, pmx)
                relevant = hb & (t_enter < carry[0])
                carry = jax.lax.cond(jnp.any(relevant), descend,
                                     lambda cc: cc, carry)
    else:
        carry = run_range(0, scene.n_stream_clusters, init)
    t_run, nx, ny, nz, mf = carry[:5]
    found = mf >= 0.0
    h = Hit(
        t_run,
        jnp.where(found, mf.astype(jnp.int32), best.mat),
        vwhere(found, Vec3(nx, ny, nz), best.normal),
    )
    uvx = carry[5] if want_uv else None
    uvy = carry[6] if want_uv else None
    if fm:
        # column space -> the caller's ray shape
        back = lambda a: a.reshape(orig_shape)
        h = Hit(back(h.t), back(h.mat),
                Vec3(back(h.normal.x), back(h.normal.y), back(h.normal.z)))
        found = back(found)
        if want_uv:
            uvx, uvy = back(uvx), back(uvy)
    if want_uv:
        return h, uvx, uvy, found
    return h


def _windowed_lut(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-lane lookup tab[idx] via 128-wide static windows +
    tpu.dynamic_gather (the only vectorized random access on the VPU; same
    pattern as integrator._material_lookup_windowed). ``idx`` must be
    in-range; tab's length rounds up to a 128 multiple internally."""
    n = tab.shape[0]
    if idx.ndim != 2:
        # XLA/CPU equivalence-test path (1-D ray batches): a plain gather
        return tab[jnp.clip(idx, 0, n - 1)]
    assert n % 128 == 0, "clustered tables pad to 128 (schema.finalize)"
    acc = None
    for w in range(n // 128):
        row = jnp.broadcast_to(tab[w * 128:(w + 1) * 128][None, :],
                               idx.shape)
        got = jnp.take_along_axis(row, jnp.clip(idx - w * 128, 0, 127),
                                  axis=1)
        acc = got if acc is None else jnp.where(idx >= w * 128, got, acc)
    return acc


# ---------------------------------------------------------------------------
# Scene-level nearest hit (RayCastIntersect, win32_main.cpp:406-556)
# ---------------------------------------------------------------------------

def _row_unroll_max() -> int:
    # streamed-tier row-loop unroll budget (rows per cluster); see run()
    # in _intersect_triangles_streamed. 0 disables (pure fori, the
    # round-3 form). Read per call so tests/sweeps can flip it.
    import os
    return int(os.environ.get("PT_ROW_UNROLL", "16"))


_UNROLL_MAX = 192          # XLA drivers: larger unrolls blow up compile
_UNROLL_MAX_KERNEL = 1024  # inside the Pallas kernel: Mosaic compiles
                           # straight-line primitive tests fine (494-sphere
                           # world 4 in ~60s) and has no dynamic_slice
import os as _os
if _os.environ.get("PT_UNROLL_MAX_KERNEL"):  # perf-sweep knob
    _UNROLL_MAX_KERNEL = int(_os.environ["PT_UNROLL_MAX_KERNEL"])
_CHUNK = 16

# Set (at trace time) by render/pallas_backend.py around kernel tracing.
_tracing_pallas_kernel = False


def _unroll_max() -> int:
    return _UNROLL_MAX_KERNEL if _tracing_pallas_kernel else _UNROLL_MAX


def _scan_table(n_items, body, init):
    """Loop over a primitive table (static trip count).

    Small tables unroll with python indices: static slices fuse better, and
    Mosaic (the Pallas TPU compiler, which compiles this same code inside
    render/pallas_backend.py) has no dynamic_slice. Large tables (world 4's
    ~500 spheres) use fori_loop to bound code size.
    """
    if n_items == 0:
        return init
    if n_items <= _unroll_max():
        for i in range(n_items):
            init = body(i, init)
        return init
    return jax.lax.fori_loop(0, n_items, body, init)


def _scan_table_chunked(n_items, tables, body, init):
    """Chunked loop for LARGE primitive tables: one dynamic_slice of _CHUNK
    rows per fori iteration, static indexing within the chunk.

    A per-item fori (one dynamic-slice load per primitive) measured ~50x
    slower than straight-line code on the VPU; full unrolling of ~750-item
    tables explodes compile time. Chunking gets within ~_CHUNK of unrolled
    throughput at 1/_CHUNK the code size. ``tables`` is a dict of (P,)
    arrays (P padded >= n_items); ``body(row_scalars: dict, item_valid, h)``
    processes one primitive.
    """
    if n_items == 0:
        return init
    if n_items <= _unroll_max():
        rows = lambda i: {k: v[i] for k, v in tables.items()}
        for i in range(n_items):
            init = body(rows(i), True, init)
        return init
    n_chunks = -(-n_items // _CHUNK)

    def chunk_body(ci, h):
        base = ci * _CHUNK
        sl = {k: jax.lax.dynamic_slice_in_dim(v, base, _CHUNK)
              for k, v in tables.items()}
        for k in range(_CHUNK):
            valid = base + k < n_items
            h = body({key: v[k] for key, v in sl.items()}, valid, h)
        return h

    return jax.lax.fori_loop(0, n_chunks, chunk_body, init)


def intersect_spheres(scene: Scene, o: Vec3, d: Vec3, best: Hit) -> Hit:
    if scene.sph_clusters and _tracing_pallas_kernel:
        # packet-culled path over the cluster-reordered copy; values equal
        # to the plain loop's (tested in tests/test_clusters.py). Tests
        # carry (t, idx) only; mat and normal resolve once per bounce.
        def test_idx(i):
            center = Vec3(scene.csph_center.x[i], scene.csph_center.y[i],
                          scene.csph_center.z[i])
            rel = o - center
            a = dot(d, d)
            b = 2.0 * dot(rel, d)
            c = dot(rel, rel) - scene.csph_radius[i] * scene.csph_radius[i]
            disc = b * b - 4.0 * a * c
            root = jnp.sqrt(jnp.maximum(disc, 0.0))
            t = (-b - root) / (2.0 * a)
            hit = (disc >= 0.0) & (root > TOLERANCE) & (t > MIN_HIT_DISTANCE)
            return t, hit

        def resolve(t, idx, found, prior):
            cx = _windowed_lut(scene.csph_center.x, idx)
            cy = _windowed_lut(scene.csph_center.y, idx)
            cz = _windowed_lut(scene.csph_center.z, idx)
            n = normalize(Vec3(d.x * t + (o.x - cx), d.y * t + (o.y - cy),
                               d.z * t + (o.z - cz)), eps=1e-30)
            return Hit(
                t,
                jnp.where(found, _windowed_lut(scene.csph_mat, idx),
                          prior.mat),
                vwhere(found, n, prior.normal),
            )
        return _intersect_clustered_idx(scene.sph_clusters, test_idx, o, d,
                                        best, resolve)

    tables = dict(
        cx=scene.sph_center.x, cy=scene.sph_center.y, cz=scene.sph_center.z,
        r=scene.sph_radius, m=scene.sph_mat,
    )

    def body(row, valid, h):
        center = Vec3(row["cx"], row["cy"], row["cz"])
        t, hit, n = ray_sphere(o, d, center, row["r"])
        take = hit & (t < h.t) & valid
        return Hit(
            jnp.where(take, t, h.t),
            jnp.where(take, row["m"], h.mat),
            vwhere(take, n, h.normal),
        )
    return _scan_table_chunked(scene.n_spheres, tables, body, best)


def intersect_quads(scene: Scene, o: Vec3, d: Vec3, best: Hit) -> Hit:
    def body(i, h):
        A = Vec3(scene.quad_point.x[i], scene.quad_point.y[i], scene.quad_point.z[i])
        u = Vec3(scene.quad_u.x[i], scene.quad_u.y[i], scene.quad_u.z[i])
        v = Vec3(scene.quad_v.x[i], scene.quad_v.y[i], scene.quad_v.z[i])
        if scene.quad_n is not None:
            # baked at finalize (schema._bake_quad_normals) — bit-identical
            # to the normalize(cross) this loop used to evaluate per bounce
            n = Vec3(scene.quad_n.x[i], scene.quad_n.y[i], scene.quad_n.z[i])
        else:
            n = normalize(cross(u, v), eps=1e-30)
        t, hit = ray_planar_quad(o, d, A, u, v)
        take = hit & (t < h.t)
        return Hit(
            jnp.where(take, t, h.t),
            jnp.where(take, scene.quad_mat[i], h.mat),
            vwhere(take, n, h.normal),
        )
    return _scan_table(scene.n_quads, body, best)


def intersect_planes(scene: Scene, o: Vec3, d: Vec3, best: Hit) -> Hit:
    def body(i, h):
        n = Vec3(scene.pln_n.x[i], scene.pln_n.y[i], scene.pln_n.z[i])
        t, valid = ray_plane(o, d, n, scene.pln_d[i])
        take = valid & (t > MIN_HIT_DISTANCE) & (t < h.t)
        return Hit(
            jnp.where(take, t, h.t),
            jnp.where(take, scene.pln_mat[i], h.mat),
            vwhere(take, n, h.normal),
        )
    return _scan_table(scene.n_planes, body, best)


def _ctri_test_idx(scene: Scene, o: Vec3, d: Vec3):
    """Per-triangle (t, hit) test over the clustered tables in
    precomputed barycentric form (scene/clusters.py triangle_precompute):
    no per-test normalize/cross, and every per-triangle quantity is a
    baked scalar — the VPU does only the per-lane dots/compares. Same
    geometry as ray_planar_triangle up to f32 rounding
    (tests/test_clusters). Shared by the plain and mesh-UV clustered
    kernel paths."""
    def test_idx(i):
        n = Vec3(scene.ctri_n.x[i], scene.ctri_n.y[i], scene.ctri_n.z[i])
        e1 = Vec3(scene.ctri_e1.x[i], scene.ctri_e1.y[i], scene.ctri_e1.z[i])
        e2 = Vec3(scene.ctri_e2.x[i], scene.ctri_e2.y[i], scene.ctri_e2.z[i])
        denom = dot(n, d)
        valid = (denom < -TOLERANCE) | (denom > TOLERANCE)
        t = (scene.ctri_d[i] - dot(n, o)) / jnp.where(valid, denom, 1.0)
        alpha = (dot(e1, o) - scene.ctri_a0[i]) + t * dot(e1, d)
        beta = (dot(e2, o) - scene.ctri_b0[i]) + t * dot(e2, d)
        inside = (alpha >= 0.0) & (beta >= 0.0) & ((alpha + beta) <= 1.0)
        hit = valid & inside & (t > MIN_HIT_DISTANCE)
        return t, hit
    return test_idx


def intersect_triangles_brute(scene: Scene, o: Vec3, d: Vec3, best: Hit) -> Hit:
    """Nearest hit over all triangles. Semantically identical to the octree
    traversal (win32_main.cpp:476-526): the octree only prunes work, never
    changes the nearest hit. The default triangle path on TPU: per-lane
    divergent DDA walks measured ~70x slower than chunked brute force on
    the VPU at reference mesh sizes (752 tris)."""
    if scene.tri_streamed and _tracing_pallas_kernel:
        return _intersect_triangles_streamed(scene, o, d, best)

    if scene.tri_clusters and _tracing_pallas_kernel:
        test_idx = _ctri_test_idx(scene, o, d)

        def resolve(t, idx, found, prior):
            n = Vec3(_windowed_lut(scene.ctri_n.x, idx),
                     _windowed_lut(scene.ctri_n.y, idx),
                     _windowed_lut(scene.ctri_n.z, idx))
            return Hit(
                t,
                jnp.where(found, _windowed_lut(scene.ctri_mat, idx),
                          prior.mat),
                vwhere(found, n, prior.normal),
            )
        return _intersect_clustered_idx(scene.tri_clusters, test_idx, o, d,
                                        best, resolve)

    tables = dict(
        ax=scene.tri_a.x, ay=scene.tri_a.y, az=scene.tri_a.z,
        ux=scene.tri_u.x, uy=scene.tri_u.y, uz=scene.tri_u.z,
        vx=scene.tri_v.x, vy=scene.tri_v.y, vz=scene.tri_v.z,
        m=scene.tri_mat,
    )

    def body(row, valid, h):
        A = Vec3(row["ax"], row["ay"], row["az"])
        u = Vec3(row["ux"], row["uy"], row["uz"])
        v = Vec3(row["vx"], row["vy"], row["vz"])
        n = normalize(cross(u, v), eps=1e-30)
        t, hit = ray_planar_triangle(o, d, A, u, v)
        take = hit & (t < h.t) & valid
        return Hit(
            jnp.where(take, t, h.t),
            jnp.where(take, row["m"], h.mat),
            vwhere(take, n, h.normal),
        )
    return _scan_table_chunked(scene.n_tris, tables, body, best)


def intersect_boxes(scene: Scene, o: Vec3, d: Vec3, best: Hit) -> Hit:
    """world->aabbs loop (win32_main.cpp:529-553). Dead in the reference
    (aabbs never populated, win32_main.cpp:2039-2045) but implemented for
    parity; normal comes from the first-hit face."""
    normals = jnp.asarray(_FACE_NORMALS, jnp.float32)

    def body(i, h):
        bmin = Vec3(scene.box_min.x[i], scene.box_min.y[i], scene.box_min.z[i])
        bmax = Vec3(scene.box_max.x[i], scene.box_max.y[i], scene.box_max.z[i])
        t, hit, face = ray_aabb_faces(o, d, bmin, bmax)
        take = hit & (t > MIN_HIT_DISTANCE) & (t < h.t)
        n = Vec3(normals[face, 0], normals[face, 1], normals[face, 2])
        return Hit(
            jnp.where(take, t, h.t),
            jnp.where(take, scene.box_mat[i], h.mat),
            vwhere(take, n, h.normal),
        )
    return _scan_table(scene.n_boxes, body, best)


def intersect_scene(scene: Scene, o: Vec3, d: Vec3) -> Hit:
    """RayCastIntersect (win32_main.cpp:406-556): category order with
    strict-< updates; miss => (FLT_MAX, mat 0, normal (0,0,0))."""
    shape = jnp.shape(o.x)
    best = Hit(
        jnp.full(shape, F32_MAX),
        jnp.zeros(shape, jnp.int32),
        Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)),
    )
    best = intersect_spheres(scene, o, d, best)
    best = intersect_quads(scene, o, d, best)
    best = intersect_planes(scene, o, d, best)
    if scene.n_tris:
        if scene.grid_res:
            from .traverse import intersect_triangles_grid
            best = intersect_triangles_grid(scene, o, d, best)
        else:
            best = intersect_triangles_brute(scene, o, d, best)
    best = intersect_boxes(scene, o, d, best)
    return best


def _intersect_triangles_brute_uv(scene: Scene, o: Vec3, d: Vec3, best: Hit):
    """Triangle pass that additionally interpolates the winner's texture
    coordinate IN the loop body (mesh-UV scenes; see intersect_scene_uv):
    uv = uv0 + alpha * (uv1 - uv0) + beta * (uv2 - uv0) — barycentric
    weights (1-a-b, a, b) for vertices (A, B, C) with u = B-A, v = C-A —
    selected at take time. Carrying the interpolated (uvx, uvy) instead
    of (alpha, beta, winner index) costs the same three selects per
    triangle but needs NO per-lane gather afterwards, which is what lets
    this path run inside the Pallas kernel (Mosaic has no vector random
    access) — and drops six gathers from the XLA drivers too. The hit
    decision graph is ray_planar_triangle's exactly, so t/mat/normal
    match intersect_triangles_brute bit-for-bit."""
    shape = jnp.shape(o.x)
    tables = dict(
        ax=scene.tri_a.x, ay=scene.tri_a.y, az=scene.tri_a.z,
        ux=scene.tri_u.x, uy=scene.tri_u.y, uz=scene.tri_u.z,
        vx=scene.tri_v.x, vy=scene.tri_v.y, vz=scene.tri_v.z,
        m=scene.tri_mat,
        u0=scene.tri_uv0u, v0=scene.tri_uv0v,
        du1=scene.tri_uvdu1, dv1=scene.tri_uvdv1,
        du2=scene.tri_uvdu2, dv2=scene.tri_uvdv2,
    )

    def body(row, valid, carry):
        h, cu, cv, took = carry
        A = Vec3(row["ax"], row["ay"], row["az"])
        u = Vec3(row["ux"], row["uy"], row["uz"])
        v = Vec3(row["vx"], row["vy"], row["vz"])
        n = normalize(cross(u, v), eps=1e-30)
        t, hit, alpha, beta = ray_planar_triangle_uv(o, d, A, u, v)
        take = hit & (t < h.t) & valid
        uvx = row["u0"] + alpha * row["du1"] + beta * row["du2"]
        uvy = row["v0"] + alpha * row["dv1"] + beta * row["dv2"]
        return (
            Hit(jnp.where(take, t, h.t),
                jnp.where(take, row["m"], h.mat),
                vwhere(take, n, h.normal)),
            jnp.where(take, uvx, cu),
            jnp.where(take, uvy, cv),
            # int32 flag, not bool: bool while/fori carries crash Mosaic
            jnp.where(take, jnp.int32(1), took),
        )

    init = (best, jnp.zeros(shape), jnp.zeros(shape),
            jnp.zeros(shape, jnp.int32))
    return _scan_table_chunked(scene.n_tris, tables, body, init)


def _intersect_triangles_clustered_uv(scene: Scene, o: Vec3, d: Vec3,
                                      best: Hit):
    """Packet-culled triangle pass for mesh-UV scenes (kernel only):
    carries (t, winner index) exactly like intersect_triangles_brute's
    clustered path — the hot loop is untouched — and the once-per-bounce
    resolve ADDITIONALLY reconstructs the winner's texcoord: alpha/beta
    recompute from the windowed-LUT'd covectors with the SAME f32
    expression the in-loop test used (bit-equal by construction), then
    six more lane-LUTs interpolate the cluster-ordered uv tables
    (Scene.ctri_uv*). Geometry matches ray_planar_triangle up to f32
    rounding (the precomputed-form class, tests/test_clusters.py).
    Returns (hit, uvx, uvy, uv_ok)."""
    out = {}
    test_idx = _ctri_test_idx(scene, o, d)

    def resolve(t, idx, found, prior):
        e1 = Vec3(_windowed_lut(scene.ctri_e1.x, idx),
                  _windowed_lut(scene.ctri_e1.y, idx),
                  _windowed_lut(scene.ctri_e1.z, idx))
        e2 = Vec3(_windowed_lut(scene.ctri_e2.x, idx),
                  _windowed_lut(scene.ctri_e2.y, idx),
                  _windowed_lut(scene.ctri_e2.z, idx))
        alpha = (dot(e1, o) - _windowed_lut(scene.ctri_a0, idx)) \
            + t * dot(e1, d)
        beta = (dot(e2, o) - _windowed_lut(scene.ctri_b0, idx)) \
            + t * dot(e2, d)
        uvx = (_windowed_lut(scene.ctri_uv0u, idx)
               + alpha * _windowed_lut(scene.ctri_uvdu1, idx)
               + beta * _windowed_lut(scene.ctri_uvdu2, idx))
        uvy = (_windowed_lut(scene.ctri_uv0v, idx)
               + alpha * _windowed_lut(scene.ctri_uvdv1, idx)
               + beta * _windowed_lut(scene.ctri_uvdv2, idx))
        # resolve runs once at trace time; stash the extra outputs for
        # the caller (the _intersect_clustered_idx contract returns Hit)
        out["uv"] = (jnp.where(found, uvx, 0.0),
                     jnp.where(found, uvy, 0.0), found)
        n = Vec3(_windowed_lut(scene.ctri_n.x, idx),
                 _windowed_lut(scene.ctri_n.y, idx),
                 _windowed_lut(scene.ctri_n.z, idx))
        return Hit(
            t,
            jnp.where(found, _windowed_lut(scene.ctri_mat, idx), prior.mat),
            vwhere(found, n, prior.normal),
        )

    h = _intersect_clustered_idx(scene.tri_clusters, test_idx, o, d, best,
                                 resolve)
    uvx, uvy, uv_ok = out["uv"]
    return h, uvx, uvy, uv_ok


def intersect_scene_uv(scene: Scene, o: Vec3, d: Vec3):
    """intersect_scene for mesh-UV scenes (scene.has_mesh_uvs): returns
    (hit, uvx, uvy, uv_ok) where (uvx, uvy) is the per-vertex-interpolated
    texture coordinate of the winning triangle and uv_ok marks lanes whose
    winner IS a triangle (triangles are the last live category —
    world->aabbs is never populated, win32_main.cpp:2039-2045, and this
    path asserts it). Shared by the XLA drivers and the Pallas kernel:
    the UV interpolation rides the triangle loop itself (see
    _intersect_triangles_brute_uv), so nothing here gathers per lane.
    In-kernel, render/pallas_backend.supports() gates mesh-UV scenes to
    the static-unroll budget (the chunked fallback dynamic-slices the
    LANE axis, which Mosaic cannot)."""
    assert scene.n_boxes == 0, "mesh-UV path assumes the dead aabbs table"
    shape = jnp.shape(o.x)
    best = Hit(
        jnp.full(shape, F32_MAX),
        jnp.zeros(shape, jnp.int32),
        Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)),
    )
    best = intersect_spheres(scene, o, d, best)
    best = intersect_quads(scene, o, d, best)
    best = intersect_planes(scene, o, d, best)
    if _tracing_pallas_kernel and scene.tri_streamed:
        # streamed tier with UV rows (clusters.pack_stream_uv); in DMA
        # mode the uv rows double-buffer through their own scratch pair
        return _intersect_triangles_streamed(scene, o, d, best,
                                             want_uv=True)
    if _tracing_pallas_kernel and scene.tri_clusters:
        return _intersect_triangles_clustered_uv(scene, o, d, best)
    best, uvx, uvy, took = _intersect_triangles_brute_uv(scene, o, d, best)
    return best, uvx, uvy, took != 0
