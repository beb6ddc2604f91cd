"""Host-side primitive clustering: the TPU-shaped acceleration structure.

The reference accelerates only triangles, with a 64^3 uniform grid merged
bottom-up into an octree that a per-ray stack walks
(GenerateAccelerationStructure win32_main.cpp:1188-1447, traversal
:476-526). Per-lane divergent traversal is the wrong shape for a vector
machine: a grid-DDA port measured ~70x SLOWER than chunked brute force on
the VPU (ops/traverse.py, BENCH.md round 1).

This module is the redesign. Primitives (triangles AND spheres — the
reference's sphere loop win32_main.cpp:418-434 is unaccelerated) are
grouped on host into spatially-tight clusters by recursive longest-axis
median split over centroids. The render kernel then tests one cluster AABB
against the WHOLE 4096-lane block (a vectorized slab test + block-level
any-reduce) and skips the cluster's primitive tests entirely via a real
scalar branch (lax.cond) when no lane can hit it — ray-packet culling at
block granularity, the natural TPU analog of the reference's per-ray
octree walk. Culling correctness: a primitive hit inside an AABB has ray
parameter t >= the AABB entry distance, so a cluster is skippable when
every lane's current-best t is closer than its entry (or the slab test
misses outright).

Primitives whose own AABB spans a large fraction of the scene (world 4's
r=1000 ground sphere, world 1/2's sun sphere) would inflate any cluster
they join until it always hits; they are split out into an unconditional
"huge" cluster tested every time — which costs nothing relative to brute
force, since such primitives are hit-tested by almost every block anyway.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# Primitives per leaf cluster. Swept on worlds 4/5 (see BENCH.md round
# 2b): small leaves prune more but pay one block-reduce + branch per
# cluster; at world-5 scale (752 tris) the sweep reads
# 16/32/64/96/128 -> 41.6/52.8/54-59/62.3/57.7 Mrays/s.
LEAF_SIZE = 96
# Tables at or below this size stay on the plain unrolled path: a handful
# of always-tested primitives is cheaper than any culling overhead.
CLUSTER_MIN = 64
# A primitive whose AABB diagonal exceeds this fraction of the scene
# diagonal goes to the unconditional "huge" cluster.
HUGE_FRAC = 0.3


def _sah_partition(idx: np.ndarray, centroids: np.ndarray,
                   bmin: np.ndarray, bmax: np.ndarray,
                   nbins: int = 16):
    """Binned surface-area-heuristic split of ``idx`` (indices into the
    full primitive tables). Tries ``nbins`` boundaries per axis and picks
    the (axis, boundary) minimizing N_L*area(L) + N_R*area(R) over the
    primitives' own AABBs — tighter child boxes than the longest-axis
    median on irregular meshes (the same cost the reference octree pays
    for implicitly by only adopting occupied cells, win32_main.cpp:1395).
    Returns (left, right) index arrays, or None when degenerate (all
    centroids in one bin) — callers fall back to the median split. Pure
    permutation either way: cluster membership changes, hit results
    don't (strict-< nearest updates are order independent)."""
    c = centroids[idx]
    lo, hi = c.min(axis=0), c.max(axis=0)
    ext = hi - lo
    best = None  # (cost, axis, boundary_bin)
    for axis in range(3):
        if ext[axis] <= 0.0:
            continue
        b = np.minimum(((c[:, axis] - lo[axis]) * (nbins / ext[axis]))
                       .astype(np.int64), nbins - 1)
        counts = np.bincount(b, minlength=nbins)
        if counts.max() == len(idx):
            continue
        binmn = np.full((nbins, 3), np.inf)
        binmx = np.full((nbins, 3), -np.inf)
        np.minimum.at(binmn, b, bmin[idx])
        np.maximum.at(binmx, b, bmax[idx])
        # prefix/suffix box unions + counts -> SAH cost per boundary
        pmn = np.minimum.accumulate(binmn, axis=0)
        pmx = np.maximum.accumulate(binmx, axis=0)
        smn = np.minimum.accumulate(binmn[::-1], axis=0)[::-1]
        smx = np.maximum.accumulate(binmx[::-1], axis=0)[::-1]
        nl = np.cumsum(counts)[:-1]
        nr = len(idx) - nl

        def area(mn, mx):
            d = np.maximum(mx - mn, 0.0)
            return 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                          + d[:, 2] * d[:, 0])

        cost = nl * area(pmn[:-1], pmx[:-1]) + nr * area(smn[1:], smx[1:])
        cost = np.where((nl > 0) & (nr > 0), cost, np.inf)
        k = int(np.argmin(cost))
        if np.isfinite(cost[k]) and (best is None or cost[k] < best[0]):
            best = (float(cost[k]), axis, k, b)
    if best is None:
        return None
    _, axis, k, b = best
    return idx[b <= k], idx[b > k]


def _bounds_of(bmin: np.ndarray, bmax: np.ndarray, idx) -> tuple:
    """Cluster AABB, rounded OUTWARD when lowered from the f64 build math to
    the f32 immediates baked into the kernel's slab test — nearest rounding
    could shrink a face by 1 ulp and falsely cull a grazing hit."""
    mn = np.nextafter(bmin[idx].min(axis=0).astype(np.float32), np.float32(-np.inf))
    mx = np.nextafter(bmax[idx].max(axis=0).astype(np.float32), np.float32(np.inf))
    return (tuple(float(v) for v in mn), tuple(float(v) for v in mx))


def build_clusters(
    bmin: np.ndarray,
    bmax: np.ndarray,
    leaf_size: Optional[int] = None,
    huge_frac: Optional[float] = None,
    sort_origin=None,
) -> Tuple[np.ndarray, tuple]:
    """Cluster primitives by their AABBs.

    Args:
      bmin, bmax: (N, 3) float per-primitive AABB corners.
      leaf_size: max primitives per conditional cluster.
      huge_frac: scene-diagonal fraction above which a primitive is "huge".
      sort_origin: optional (3,) point (the camera); leaf clusters are
        ordered near-to-far from it so primary-ray blocks shrink best.t
        early and later clusters fail the t_enter < best.t cull. Nearest-
        hit results are order independent — this is purely a perf hint.

    Returns:
      (order, clusters): ``order`` is an (N,) permutation — the primitive
      tables must be reordered as table[order] — and ``clusters`` is a
      tuple of (offset, count, mn3 | None, mx3 | None) entries indexing the
      REORDERED tables. The huge cluster (bounds None), if any, comes first.
    """
    import os
    if leaf_size is None:  # perf-sweep knob (experiments/accel_crossover.py)
        leaf_size = int(os.environ.get("PT_LEAF_SIZE", LEAF_SIZE))
    huge_frac = HUGE_FRAC if huge_frac is None else huge_frac
    bmin = np.asarray(bmin, np.float64)
    bmax = np.asarray(bmax, np.float64)
    n = len(bmin)
    assert bmax.shape == bmin.shape and bmin.shape == (n, 3)

    scene_diag = float(np.linalg.norm(bmax.max(axis=0) - bmin.min(axis=0)))
    diag = np.linalg.norm(bmax - bmin, axis=1)
    huge = diag > huge_frac * max(scene_diag, 1e-30)
    huge_idx = np.nonzero(huge)[0]
    rest_idx = np.nonzero(~huge)[0]

    if os.environ.get("PT_NO_CAM_SORT"):  # perf-ablation knob
        sort_origin = None
    # Binned surface-area-heuristic splits (default; PT_NO_SAH=1 falls
    # back to the longest-axis centroid median). Pure permutation either
    # way. Measured on chip (BENCH.md round 4): w7 +3.6%, localized 250k
    # surface +19%, full-screen surface + w5 a wash, never worse; 18%
    # lower summed box area at 2.2x the host build cost (29 s at 1M tris).
    use_sah = not os.environ.get("PT_NO_SAH")
    centroids = (bmin + bmax) * 0.5
    leaves: list[np.ndarray] = []

    def row_order(idx: np.ndarray) -> np.ndarray:
        """Order primitives WITHIN a leaf by recursive median split down to
        record-row granularity (STREAM_TRIS_PER_ROW), so each packed row of
        9 is a spatially tight group — the streamed tier's per-row AABB
        cull (pack_stream_clusters) only pays when rows are tight. Pure
        permutation; near-to-far row order (when sort_origin is given)
        shrinks best.t earliest, like the leaf ordering."""
        if len(idx) <= STREAM_TRIS_PER_ROW:
            return idx
        groups: list[np.ndarray] = []

        def sub(ii: np.ndarray):
            if len(ii) <= STREAM_TRIS_PER_ROW:
                groups.append(ii)
                return
            c = centroids[ii]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            half = len(ii) // 2
            part = np.argpartition(c[:, axis], half)
            sub(ii[part[:half]])
            sub(ii[part[half:]])

        sub(idx)
        if sort_origin is not None:
            org = np.asarray(sort_origin, np.float64)
            groups.sort(key=lambda g: float(
                np.linalg.norm(centroids[g].mean(axis=0) - org)))
        return np.concatenate(groups)

    def split(idx: np.ndarray):
        if len(idx) <= leaf_size:
            leaves.append(row_order(idx))
            return
        if use_sah:
            lr = _sah_partition(idx, centroids, bmin, bmax)
            # reject extreme lopsided splits (recursion-depth guard: a
            # 1-vs-N SAH chain is O(N) deep; median depth is O(log N))
            if lr is not None and min(len(lr[0]), len(lr[1])) >= len(idx) // 16:
                split(lr[0])
                split(lr[1])
                return
        c = centroids[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = len(idx) // 2
        part = np.argpartition(c[:, axis], half)
        split(idx[part[:half]])
        split(idx[part[half:]])

    if len(rest_idx):
        split(rest_idx)

    if sort_origin is not None and leaves:
        org = np.asarray(sort_origin, np.float64)
        leaves.sort(key=lambda idx: float(
            np.linalg.norm(centroids[idx].mean(axis=0) - org)))

    order = np.concatenate([huge_idx] + leaves) if (len(huge_idx) or leaves) \
        else np.zeros((0,), np.int64)
    clusters = []
    off = 0
    if len(huge_idx):
        clusters.append((0, int(len(huge_idx)), None, None))
        off = int(len(huge_idx))
    for leaf in leaves:
        mn, mx = _bounds_of(bmin, bmax, leaf)
        clusters.append((off, int(len(leaf)), mn, mx))
        off += int(len(leaf))
    return order.astype(np.int64), tuple(clusters)


def triangle_precompute(A: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Precomputed barycentric form for the in-kernel cluster test.

    From vertices A and edges u, v (f32, matching the brute tables):
      n_unit = normalize(cross(u, v));  d_coef = A . n_unit
      w  = cross(u, v) / |cross(u, v)|^2
      e1 = cross(v, w);  a0 = e1 . A      (alpha = e1 . hitpoint - a0)
      e2 = cross(w, u);  b0 = e2 . A      (beta  = e2 . hitpoint - b0)
    Algebra: ray_planar_triangle computes alpha = w . cross(p, v) with
    p = hit - A; the scalar triple product rotates to cross(v, w) . p.
    Computed in float32 to track the reference formula's rounding.

    Returns dict of f32 arrays: n (N,3), d (N,), e1 (N,3), e2 (N,3),
    a0 (N,), b0 (N,).
    """
    A = np.asarray(A, np.float32)
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    n = np.cross(u, v).astype(np.float32)
    nn = (n * n).sum(-1).astype(np.float32)
    inv_len = (1.0 / np.sqrt(np.maximum(nn, 1e-30))).astype(np.float32)
    n_unit = (n * inv_len[:, None]).astype(np.float32)
    d_coef = (A * n_unit).sum(-1).astype(np.float32)
    w = (n / np.maximum(nn, 1e-30)[:, None]).astype(np.float32)
    e1 = np.cross(v, w).astype(np.float32)
    e2 = np.cross(w, u).astype(np.float32)
    a0 = (e1 * A).sum(-1).astype(np.float32)
    b0 = (e2 * A).sum(-1).astype(np.float32)
    return dict(n=n_unit, d=d_coef, e1=e1, e2=e2, a0=a0, b0=b0)


# Leaf clusters per parent AABB in the two-level streamed hierarchy (the
# TPU-shaped analog of the reference octree's log-depth descent,
# win32_main.cpp:1395-1440 AdoptChildren merge + :476-526 stack walk).
# Parents are STATIC immediates in the kernel: all parent slab tests are
# straight-line vector code, so a block pays O(n_parents) cheap tests +
# O(hit parents x their leaves) dynamic cluster iterations instead of the
# flat O(n_clusters) serial sweep.
PARENT_GROUP = 16
# Grandparent level (DMA tier only): once the DYNAMIC parent loop has this
# many parents, its O(n_parents) serial slab tests per block-bounce start
# to bind (512 parents at 500k tris, ~1024 at 1M) — regroup the parents
# under grandparent AABBs (build_parents applied to the parent list) so
# the serial term drops to O(n_gparents + descended). Env knob
# PT_GPARENT_MIN (read at finalize, schema.py) for ablation/tests.
GPARENT_MIN = 64


def build_parents(clusters: tuple, group_size: Optional[int] = None,
                  sort_origin=None) -> Tuple[np.ndarray, tuple]:
    """Group leaf clusters under parent AABBs (two-level hierarchy).

    Args:
      clusters: build_clusters output — (offset, count, mn3|None, mx3|None)
        tuples; a bounds-None "huge" cluster, if present, is first.
      group_size: max leaf clusters per parent.
      sort_origin: optional camera position; parents (and leaves within a
        parent) order near-to-far so early descents shrink best.t fastest.

    Returns:
      (perm, parents): ``perm`` permutes CLUSTER indices (the caller must
      reorder ``clusters`` as [clusters[i] for i in perm] before packing —
      parent ranges index the REORDERED cluster list); ``parents`` is a
      tuple of (start, count, mn3|None, mx3|None) in cluster units. The
      huge cluster keeps bounds None (unconditional descent). Pure
      pruning: any permutation of clusters preserves nearest-hit results
      (strict-< updates are order independent up to exact float ties).
    """
    import os
    if group_size is None:  # perf-sweep knob
        group_size = int(os.environ.get("PT_PARENT_GROUP", PARENT_GROUP))
    n = len(clusters)
    huge = [i for i, c in enumerate(clusters) if c[2] is None]
    rest = [i for i, c in enumerate(clusters) if c[2] is not None]
    assert len(huge) <= 1, "at most one unconditional cluster"

    cent = np.array([[(a + b) * 0.5 for a, b in zip(clusters[i][2],
                                                    clusters[i][3])]
                     for i in rest], np.float64).reshape(len(rest), 3)
    groups: list[np.ndarray] = []

    def split(idx: np.ndarray):
        if len(idx) <= group_size:
            groups.append(idx)
            return
        c = cent[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        half = len(idx) // 2
        part = np.argpartition(c[:, axis], half)
        split(idx[part[:half]])
        split(idx[part[half:]])

    if rest:
        split(np.arange(len(rest)))

    if sort_origin is not None and groups:
        org = np.asarray(sort_origin, np.float64)
        groups.sort(key=lambda idx: float(
            np.linalg.norm(cent[idx].mean(axis=0) - org)))
        for g in groups:
            d = np.linalg.norm(cent[g] - org, axis=1)
            g[:] = g[np.argsort(d, kind="stable")]

    perm = list(huge)
    parents = []
    if huge:
        parents.append((0, 1, None, None))
    pos = len(huge)
    for g in groups:
        mnv = np.array([clusters[rest[i]][2] for i in g], np.float32)
        mxv = np.array([clusters[rest[i]][3] for i in g], np.float32)
        mn = tuple(float(v) for v in mnv.min(axis=0))
        mx = tuple(float(v) for v in mxv.max(axis=0))
        parents.append((pos, int(len(g)), mn, mx))
        perm.extend(rest[i] for i in g)
        pos += int(len(g))
    assert len(perm) == n
    return np.asarray(perm, np.int64), tuple(parents)


def pack_parents(parents: tuple):
    """Dynamic-parent tables for the DMA tier: parent bounds as 128-lane
    rows (mn3 mx3, VMEM) and (start, count) cluster ranges as int32 pairs
    (SMEM scalars — ``lax.fori_loop`` bounds must be scalar). The kernel
    loops ``fori`` over parents reading rows by dynamic index, so code
    size is O(1) in parent count — static immediates (the resident tier's
    form) compile ~1.2 s/parent in Mosaic, minutes at 250k+ tris. A
    bounds-None "huge" parent packs as an infinite box (slab test always
    relevant).

    Lanes 6..12 carry the SUFFIX union box — union of boxes[i:] — in the
    same mn3 mx3 layout (``PSUFFIX_LANE``). The kernel's front-to-back
    early-out (ops/intersect, PT_PARENT_EARLY) tests it from the already-
    loaded row: when no lane's running t can still be beaten by ANY
    remaining parent (every remaining entry distance >= best t), the
    camera-ordered sweep breaks — pure pruning, bit-equal (the reference
    octree gets the same effect from its recursive t-sorted descent,
    win32_main.cpp:476-526)."""
    n = len(parents)
    rows = np.zeros((max(n, 1), 128), np.float32)
    rng = np.zeros((max(n, 1), 2), np.int32)
    for i, (start, count, mn, mx) in enumerate(parents):
        if mn is None:
            mn, mx = (-3e37,) * 3, (3e37,) * 3
        rows[i, 0:3] = mn
        rows[i, 3:6] = mx
        rng[i] = (start, count)
    if n:
        rows[:, 6:9] = np.minimum.accumulate(rows[::-1, 0:3], axis=0)[::-1]
        rows[:, 9:12] = np.maximum.accumulate(rows[::-1, 3:6], axis=0)[::-1]
    return rows, rng


# lane offset of the suffix union box in pack_parents rows (mn3 mx3)
PSUFFIX_LANE = 6


# Streamed mesh tier (ops/intersect streamed branch): meshes too large to
# statically unroll in the kernel (> ~1024 tris) pack their precomputed
# records into 128-lane rows read by DYNAMIC row index — code size is
# O(1) in mesh size. 9 triangles x 13 fields = 117 lanes per row; the 11
# spare lanes carry the row's OWN AABB (ROW_BOUNDS_LANE..+5) — a third
# culling level below parents and clusters, tested from the already-
# loaded row at zero extra memory traffic. Rows are spatially tight
# because build_clusters orders within-leaf primitives by recursive
# median split down to row granularity (row_order above). All-padding
# rows pack a far-point box (mn == mx == ROW_EMPTY_FAR) whose slab entry
# always fails the t-cull, so padding rows skip for free.
STREAM_FIELDS = 13  # n(3) d(1) e1(3) a0(1) e2(3) b0(1) mat(1)
STREAM_TRIS_PER_ROW = 9
ROW_BOUNDS_LANE = STREAM_FIELDS * STREAM_TRIS_PER_ROW  # 117: mn3 mx3
ROW_EMPTY_FAR = 3e37  # degenerate far-point box: slab tmin ~ +inf
# Meshes above this switch from the statically-unrolled cluster path to
# the streamed tier (the Mosaic straight-line unroll budget,
# ops/intersect._UNROLL_MAX_KERNEL).
STREAM_MIN = 1024
import os as _os
if _os.environ.get("PT_STREAM_MIN"):  # perf-sweep knob (accel_crossover)
    STREAM_MIN = int(_os.environ["PT_STREAM_MIN"])
# VMEM budget cap for the RESIDENT streamed tables (~8 MB of pack rows).
# Above it the pack rows leave VMEM entirely: the DMA tier keeps them in
# HBM and double-buffers each cluster's rows into a 2-slot VMEM scratch
# with async copies (ops/intersect streamed branch, DMA mode), so only
# the bounds rows (n_clusters x 512 B) stay resident.
STREAM_MAX = 131072
# DMA-tier cap: bounds-row VMEM (~5.5 MB at 1M tris, leaf 96) plus
# parent-descriptor code size set the practical ceiling, not HBM.
DMA_MAX = 1 << 20
# Third culling level (per-row 9-tri AABBs): ON for every streamed mesh.
# Measured both ways on chip (BENCH.md round 4): the only regime where it
# LOSES is the synthetic uniform-volume cloud between ~2k and ~8k tris
# (2048: 3.7 vs 6.0 without — rows never prune when triangles fill the
# view volume), while on real SURFACE meshes it wins (world 7, 1472
# tris: 34.7 vs 31.6 official) and at 8k+ cloud it wins or washes.
# Production meshes are surfaces, so the default follows world 7, and
# PT_NO_ROW_CULL=1 / PT_ROW_CULL_MIN=<n> remain for the cloud regime.
ROW_CULL_MIN = 1024  # == STREAM_MIN: every streamed mesh row-culls


def stream_rows_per_cluster(leaf: int) -> int:
    """Pack rows per cluster: each cluster is ROW-ALIGNED so the kernel
    reads one row per 9 triangles (static unroll within the row) instead
    of re-reading per triangle with a dynamic in-row offset."""
    return -(-leaf // STREAM_TRIS_PER_ROW)


def pack_stream_clusters(pre: dict, mats: np.ndarray,
                         clusters: tuple, leaf: int,
                         tri_bounds: Optional[tuple] = None):
    """Build the streamed-tier tables from triangle_precompute output.

    Every cluster pads to exactly ``stream_rows_per_cluster(leaf)`` FULL
    rows of 9 records (degenerate padding tris have n=0 -> |denom| <
    TOLERANCE -> never hit), so cluster c's rows are the static range
    [c*rpc, (c+1)*rpc) and the kernel's inner loop reads each row ONCE and
    extracts its 9 records at STATIC lane offsets. ``tri_bounds`` is the
    (bmin, bmax) pair in cluster order; when given, each row's spare lanes
    (ROW_BOUNDS_LANE..+5) carry the AABB of its own 9 triangles, rounded
    outward at f32 (all-padding rows get the far-point always-miss box).
    Returns (bounds (nc, 128) f32 rows [mn3 mx3 ...], pack (nc*rpc, 128)
    f32, flat (nc*rpc*9, 13) row-aligned records). ``pre``/``mats`` must
    already be in cluster order (reordered by ``order``); ``clusters``
    indexes that order.
    """
    per = STREAM_TRIS_PER_ROW
    rpc = stream_rows_per_cluster(leaf)
    recs = []
    bounds = []
    row_boxes = []
    for (off, cnt, mn, mx) in clusters:
        rows = np.zeros((rpc * per, STREAM_FIELDS), np.float32)
        sl = slice(off, off + cnt)
        rows[:cnt, 0:3] = pre["n"][sl]
        rows[:cnt, 3] = pre["d"][sl]
        rows[:cnt, 4:7] = pre["e1"][sl]
        rows[:cnt, 7] = pre["a0"][sl]
        rows[:cnt, 8:11] = pre["e2"][sl]
        rows[:cnt, 11] = pre["b0"][sl]
        rows[:cnt, 12] = mats[sl].astype(np.float32)
        recs.append(rows)
        if tri_bounds is not None:
            for r in range(rpc):
                lo = off + r * per
                hi = min(off + (r + 1) * per, off + cnt)
                if lo >= hi:
                    row_boxes.append((ROW_EMPTY_FAR,) * 6)
                else:
                    rmn, rmx = _bounds_of(tri_bounds[0], tri_bounds[1],
                                          np.arange(lo, hi))
                    row_boxes.append(rmn + rmx)
        if mn is None:  # huge cluster: unbounded -> always-hit slab
            mn = (-1e30, -1e30, -1e30)
            mx = (1e30, 1e30, 1e30)
        brow = np.zeros((128,), np.float32)
        brow[0:3] = mn
        brow[3:6] = mx
        bounds.append(brow)
    flat = np.concatenate(recs, axis=0)  # (nc*rpc*9, 13)
    pack = np.zeros((len(flat) // per, 128), np.float32)
    pack[:, : per * STREAM_FIELDS] = flat.reshape(-1, per * STREAM_FIELDS)
    if tri_bounds is not None:
        pack[:, ROW_BOUNDS_LANE:ROW_BOUNDS_LANE + 6] = np.asarray(
            row_boxes, np.float32)
    return np.stack(bounds), pack, flat


def pack_stream_uv(uvt: np.ndarray, clusters: tuple, leaf: int):
    """UV rows PARALLEL to pack_stream_clusters' record rows (mesh-UV
    streamed scenes): row c*rpc + r carries the 6 texel-space uv fields
    (u0 v0 du1 dv1 du2 dv2) of the SAME 9 triangles at lane base jj*6
    (lanes 54-127 zero). The kernel loads a UV row only when its record
    row improved the running hit, so the extraction tax is paid on
    winning rows alone (ops/intersect streamed branch, want_uv).
    ``uvt`` is the (T, 6) per-triangle uv table in cluster order."""
    per = STREAM_TRIS_PER_ROW
    rpc = stream_rows_per_cluster(leaf)
    rows = np.zeros((len(clusters) * rpc, 128), np.float32)
    for ci, (off, cnt, _, _) in enumerate(clusters):
        block = np.zeros((rpc * per, 6), np.float32)
        block[:cnt] = uvt[off:off + cnt]
        rows[ci * rpc:(ci + 1) * rpc, : per * 6] = block.reshape(rpc, per * 6)
    return rows


UV_CFM_ROWS = 6  # u0 v0 du1 dv1 du2 dv2 — one field per row


def pack_stream_uv_cfm(uvt: np.ndarray, clusters: tuple, leaf: int):
    """Cluster-FIELD-MAJOR uv table (round 5, the production mesh-UV
    layout when the leaf fits the lane axis): 6 rows of 128 lanes per
    cluster — row ``c * 6 + k``, lane ``j`` = uv field ``k`` (u0 v0 du1
    dv1 du2 dv2, texel space) of cluster c's j-th triangle. The winner uv
    then resolves ONCE per descended cluster: 6 per-lane dynamic_gathers
    on the cluster-local winner index (tracked through the record loop as
    3 extra carried selects), instead of 6 gathers + interpolation on
    EVERY record row (pack_stream_uv's row-parallel layout — kept as the
    leaf > 128 fallback and the PT_NO_UV_CFM ablation). Also ~2x smaller
    (6 rows vs rows-per-cluster) and cheaper to DMA."""
    assert leaf <= 128, "cfm uv lanes ride the cluster-local tri index"
    rows = np.zeros((max(len(clusters), 1) * UV_CFM_ROWS, 128), np.float32)
    for ci, (off, cnt, _, _) in enumerate(clusters):
        rows[ci * UV_CFM_ROWS:(ci + 1) * UV_CFM_ROWS, :cnt] = \
            uvt[off:off + cnt].T
    return rows


# Field-major ("outer") streamed layout — PT_FM_TIER=1, measured against
# the record-row layout by experiments/stream_extract_micro.py's
# outer-vpu/outer-mxu variants. Per 128-triangle TILE, FM_FIELDS rows of
# 128 lanes: row f holds field f of the tile's 128 triangles (lane =
# triangle). The kernel computes every (ray, triangle) pair as (rays,
# 128) vector ops — triangles ride the lane axis, rays the sublane axis
# — with zero per-triangle extraction and a lane-min winner reduce
# instead of a per-triangle select chain (ops/intersect fm branch).
# Field order matches STREAM_FIELDS: n3 d e1(3) a0 e2(3) b0 mat.
FM_FIELDS = 13
FM_UV_ROWS = 6  # u0 v0 du1 dv1 du2 dv2 (texel space, like pack_stream_uv)


def fm_tiles_per_cluster(leaf: int) -> int:
    return -(-leaf // 128)


def fm_rows_per_cluster(leaf: int) -> int:
    return fm_tiles_per_cluster(leaf) * FM_FIELDS


def fm_uv_rows_per_cluster(leaf: int) -> int:
    return fm_tiles_per_cluster(leaf) * FM_UV_ROWS


def pack_stream_fm(pre: dict, mats: np.ndarray, clusters: tuple,
                   leaf: int) -> np.ndarray:
    """Field-major record rows: cluster c tile tl occupies rows
    [(c*tpc + tl)*FM_FIELDS, ...+FM_FIELDS). Padding lanes stay zero
    (n = 0 -> |denom| < TOLERANCE -> never hit), so tie/order semantics
    match the record-row pack exactly (triangle order is preserved:
    lane = cluster-local index % 128, tile = index // 128)."""
    tpc = fm_tiles_per_cluster(leaf)
    fields = [
        pre["n"][:, 0], pre["n"][:, 1], pre["n"][:, 2], pre["d"],
        pre["e1"][:, 0], pre["e1"][:, 1], pre["e1"][:, 2], pre["a0"],
        pre["e2"][:, 0], pre["e2"][:, 1], pre["e2"][:, 2], pre["b0"],
        mats.astype(np.float32),
    ]
    out = np.zeros((len(clusters) * tpc * FM_FIELDS, 128), np.float32)
    for ci, (off, cnt, _, _) in enumerate(clusters):
        for tl in range(tpc):
            lo = off + tl * 128
            hi = min(off + cnt, lo + 128)
            if lo >= hi:
                continue
            base = (ci * tpc + tl) * FM_FIELDS
            for f, arr in enumerate(fields):
                out[base + f, : hi - lo] = arr[lo:hi]
    return out


def pack_stream_fm_uv(uvt: np.ndarray, clusters: tuple,
                      leaf: int) -> np.ndarray:
    """UV rows parallel to pack_stream_fm's tiles: cluster c tile tl
    occupies rows [(c*tpc + tl)*FM_UV_ROWS, ...+FM_UV_ROWS), row k =
    uv field k of the tile's 128 triangles. Loaded only under the
    improved-winner branch (like pack_stream_uv's rows)."""
    tpc = fm_tiles_per_cluster(leaf)
    out = np.zeros((len(clusters) * tpc * FM_UV_ROWS, 128), np.float32)
    for ci, (off, cnt, _, _) in enumerate(clusters):
        for tl in range(tpc):
            lo = off + tl * 128
            hi = min(off + cnt, lo + 128)
            if lo >= hi:
                continue
            base = (ci * tpc + tl) * FM_UV_ROWS
            for k in range(FM_UV_ROWS):
                out[base + k, : hi - lo] = uvt[lo:hi, k]
    return out


def sphere_bounds(centers: np.ndarray, radii: np.ndarray):
    """Per-sphere AABBs from (N,3) centers and (N,) radii."""
    c = np.asarray(centers, np.float64)
    r = np.asarray(radii, np.float64)[:, None]
    return c - r, c + r


def triangle_bounds(tris: np.ndarray):
    """Per-triangle AABBs from (N, 3, 3) vertex arrays."""
    t = np.asarray(tris, np.float64)
    return t.min(axis=1), t.max(axis=1)
