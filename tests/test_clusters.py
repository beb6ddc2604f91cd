"""Packet-culling clusters + windowed material lookup (round 2 accel).

The cluster path (scene/clusters.py + ops/intersect._intersect_clustered_idx)
must be a pure pruning optimization: identical nearest hits to the brute
loops on every ray. The windowed material lookup must be a pure lookup:
identical records to the select sweep.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracer_tpu.ops import intersect as isect
from pathtracer_tpu.scene import clusters as clu
from pathtracer_tpu.scene.schema import WorldBuilder
from pathtracer_tpu.utils.vec import Vec3


def _random_sphere_builder(rng, n=150, huge=True):
    b = WorldBuilder()
    b.add_material(emit=(0.1, 0.2, 0.3))  # sky
    for k in range(n):
        m = b.add_material(albedo=tuple(rng.rand(3)))
        c = tuple((rng.rand(3) - 0.5) * 20.0)
        b.add_sphere(c, 0.1 + rng.rand() * 0.5, m)
    if huge:
        m = b.add_material(albedo=(0.5, 0.5, 0.5))
        b.add_sphere((0.0, 0.0, -1000.0), 1000.0, m)  # huge outlier
    return b


def _random_tri_builder(rng, n=200):
    b = WorldBuilder()
    b.add_material(emit=(0.1, 0.2, 0.3))
    m = b.add_material(albedo=(0.6, 0.5, 0.4))
    base = (rng.rand(n, 1, 3) - 0.5) * 20.0
    tris = base + (rng.rand(n, 3, 3) - 0.5) * 1.5
    b.set_mesh(tris.reshape(-1, 3).astype(np.float32),
               np.full((n * 3,), m, np.int32))
    return b


def _rays(rng, n=512):
    o = Vec3(*(jnp.asarray((rng.rand(n) - 0.5) * 30.0, jnp.float32)
               for _ in range(3)))
    d_np = rng.randn(3, n).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
    d = Vec3(*(jnp.asarray(x) for x in d_np))
    return o, d


class TestClusterBuilder:
    def test_order_is_permutation_and_bounds_contain(self):
        rng = np.random.RandomState(0)
        centers = (rng.rand(300, 3) - 0.5) * 10
        radii = 0.1 + rng.rand(300)
        bmin, bmax = clu.sphere_bounds(centers, radii)
        order, cl = clu.build_clusters(bmin, bmax)
        assert sorted(order.tolist()) == list(range(300))
        covered = []
        for off, cnt, mn, mx in cl:
            idx = order[off:off + cnt]
            covered.extend(idx.tolist())
            if mn is not None:
                assert (bmin[idx] >= np.asarray(mn) - 1e-5).all()
                assert (bmax[idx] <= np.asarray(mx) + 1e-5).all()
            assert cnt <= clu.LEAF_SIZE or mn is None
        assert sorted(covered) == list(range(300))

    def test_huge_outlier_split_out(self):
        centers = np.zeros((80, 3))
        centers[:, 0] = np.arange(80)
        radii = np.full((80,), 0.5)
        radii[7] = 500.0  # scene-scale outlier
        order, cl = clu.build_clusters(*clu.sphere_bounds(centers, radii))
        off, cnt, mn, mx = cl[0]
        assert mn is None and cnt == 1 and order[off] == 7

    def test_small_tables_not_clustered(self):
        rng = np.random.RandomState(1)
        b = _random_sphere_builder(rng, n=20)
        scene = b.finalize()
        assert scene.sph_clusters == ()


def _assert_same_hits(brute, clustered):
    """Culling must keep the same nearest hits. Bit equality does NOT hold
    between the paths on CPU: the cluster branch bodies compile as one
    XLA unit (lax.cond) whose fma fusion rounds differently from the
    op-by-op brute loop — same sphere/triangle, last-bit t differences.
    Assert identical winners (mat) and t to float32 tolerance."""
    np.testing.assert_array_equal(np.asarray(brute.mat), np.asarray(clustered.mat))
    np.testing.assert_allclose(np.asarray(brute.t), np.asarray(clustered.t),
                               rtol=2e-5, atol=1e-4)


class TestClusteredIntersectEquivalence:
    @pytest.mark.parametrize("huge", [True, False])
    def test_spheres_match_brute(self, huge):
        rng = np.random.RandomState(2)
        scene = _random_sphere_builder(rng, n=150, huge=huge).finalize()
        assert len(scene.sph_clusters) > 1
        o, d = _rays(rng)
        shape = o.x.shape
        best = lambda: isect.Hit(
            jnp.full(shape, isect.F32_MAX), jnp.zeros(shape, jnp.int32),
            Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)))
        brute = isect.intersect_spheres(scene, o, d, best())
        isect._tracing_pallas_kernel = True
        try:
            clustered = isect.intersect_spheres(scene, o, d, best())
        finally:
            isect._tracing_pallas_kernel = False
        _assert_same_hits(brute, clustered)

    def test_triangles_match_brute(self):
        rng = np.random.RandomState(3)
        scene = _random_tri_builder(rng, n=200).finalize()
        assert len(scene.tri_clusters) > 1
        o, d = _rays(rng)
        shape = o.x.shape
        best = lambda: isect.Hit(
            jnp.full(shape, isect.F32_MAX), jnp.zeros(shape, jnp.int32),
            Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)))
        brute = isect.intersect_triangles_brute(scene, o, d, best())
        isect._tracing_pallas_kernel = True
        try:
            clustered = isect.intersect_triangles_brute(scene, o, d, best())
        finally:
            isect._tracing_pallas_kernel = False
        _assert_same_hits(brute, clustered)


class TestSAHSplits:
    """Binned surface-area-heuristic splits (clusters.py _sah_partition,
    the default since round 4; PT_NO_SAH=1 restores the median split)
    must preserve every builder invariant and remain a pure pruning
    optimization — same nearest hits as brute."""

    def test_builder_invariants(self, monkeypatch):
        rng = np.random.RandomState(11)
        centers = (rng.rand(400, 3) - 0.5) * 10
        radii = 0.1 + rng.rand(400)
        bmin, bmax = clu.sphere_bounds(centers, radii)
        order, cl = clu.build_clusters(bmin, bmax)
        assert sorted(order.tolist()) == list(range(400))
        for off, cnt, mn, mx in cl:
            idx = order[off:off + cnt]
            if mn is not None:
                assert (bmin[idx] >= np.asarray(mn) - 1e-5).all()
                assert (bmax[idx] <= np.asarray(mx) + 1e-5).all()
            assert cnt <= clu.LEAF_SIZE or mn is None
        # SAH should not LOOSEN the boxes vs the median split: compare
        # summed surface area (the cost both builders try to minimize)
        monkeypatch.setenv("PT_NO_SAH", "1")
        _, cl_med = clu.build_clusters(bmin, bmax)

        def sa(cl_list):
            tot = 0.0
            for _, _, mn, mx in cl_list:
                if mn is None:
                    continue
                d = np.asarray(mx) - np.asarray(mn)
                tot += 2 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])
            return tot

        assert sa(cl) <= sa(cl_med) * 1.05

    def test_triangles_match_brute(self, monkeypatch):
        # SAH is the default build; make sure no leaked knob disables it
        # (a PT_SAH=1 setenv here used to be a no-op — ADVICE r4)
        monkeypatch.delenv("PT_NO_SAH", raising=False)
        rng = np.random.RandomState(12)
        scene = _random_tri_builder(rng, n=200).finalize()
        assert len(scene.tri_clusters) > 1
        o, d = _rays(rng)
        shape = o.x.shape
        best = lambda: isect.Hit(
            jnp.full(shape, isect.F32_MAX), jnp.zeros(shape, jnp.int32),
            Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)))
        brute = isect.intersect_triangles_brute(scene, o, d, best())
        isect._tracing_pallas_kernel = True
        try:
            clustered = isect.intersect_triangles_brute(scene, o, d, best())
        finally:
            isect._tracing_pallas_kernel = False
        _assert_same_hits(brute, clustered)


class TestWindowedMaterialLookup:
    def _scene(self, n_mats):
        rng = np.random.RandomState(4)
        b = WorldBuilder()
        for k in range(n_mats):
            b.add_material(albedo=tuple(rng.rand(3)), emit=tuple(rng.rand(3)),
                           metalness=float(rng.rand()),
                           roughness=float(rng.rand()),
                           ior=float(1 + rng.rand()),
                           albedo_idx=int(rng.randint(0, 5)))
        b.add_sphere((0, 0, 0), 1.0, 0)
        return b.finalize()

    @pytest.mark.parametrize("n_mats", [129, 424, 1100])
    def test_matches_sweep(self, n_mats):
        from pathtracer_tpu.render import integrator as integ
        scene = self._scene(n_mats)
        rng = np.random.RandomState(5)
        mat = jnp.asarray(rng.randint(0, n_mats, (16, 128)), jnp.int32)
        win = integ._material_lookup_windowed(scene, mat)
        ref = integ._material_lookup(scene, mat.reshape(-1))
        for k, v in win.items():
            r = ref[k]
            if isinstance(v, Vec3):
                for a, b in zip(v, r):
                    np.testing.assert_array_equal(
                        np.asarray(a).reshape(-1), np.asarray(b))
            else:
                np.testing.assert_array_equal(
                    np.asarray(v).reshape(-1), np.asarray(r))


class TestBuildParents:
    """Two-level hierarchy invariants: perm is a cluster permutation,
    parent ranges tile the permuted list, parent bounds contain every
    child cluster's bounds."""

    def _clusters(self, n=500, huge=True, seed=3):
        rng = np.random.RandomState(seed)
        centers = (rng.rand(n, 3) - 0.5) * 40
        radii = 0.05 + rng.rand(n) * 0.4
        if huge:
            centers[0] = (0, 0, 0)
            radii[0] = 100.0
        bmin, bmax = clu.sphere_bounds(centers, radii)
        _, cl = clu.build_clusters(bmin, bmax, leaf_size=8)
        return cl

    @pytest.mark.parametrize("huge", [True, False])
    def test_invariants(self, huge):
        cl = self._clusters(huge=huge)
        perm, parents = clu.build_parents(cl, group_size=4,
                                          sort_origin=(0, -30, 5))
        assert sorted(perm.tolist()) == list(range(len(cl)))
        permuted = [cl[i] for i in perm]
        # parent ranges tile [0, n_clusters) exactly, in order
        pos = 0
        for (start, cnt, mn, mx) in parents:
            assert start == pos and cnt >= 1
            pos += cnt
            if mn is None:
                assert all(permuted[start + k][2] is None for k in range(cnt))
                continue
            for k in range(cnt):
                cmn, cmx = permuted[start + k][2], permuted[start + k][3]
                assert all(p <= c for p, c in zip(mn, cmn))
                assert all(p >= c for p, c in zip(mx, cmx))
        assert pos == len(cl)
        # the huge cluster (bounds None) lives in a bounds-None parent
        none_parents = [p for p in parents if p[2] is None]
        assert len(none_parents) == (1 if huge else 0)

    def test_group_size_bounds_parent_fanout(self):
        cl = self._clusters(huge=False)
        _, parents = clu.build_parents(cl, group_size=8)
        assert all(p[1] <= 8 for p in parents)
        assert len(parents) >= len(cl) // 8


class TestStreamedMeshTier:
    """Meshes above clusters.STREAM_MIN take the dynamically-indexed
    streamed path in the kernel; it must produce the same nearest hits as
    the brute scan."""

    def _scene(self, n):
        rng = np.random.RandomState(6)
        b = WorldBuilder()
        b.add_material(emit=(0.1, 0.2, 0.3))
        m = b.add_material(albedo=(0.6, 0.5, 0.4))
        m2 = b.add_material(albedo=(0.2, 0.6, 0.3))
        base = (rng.rand(n, 1, 3) - 0.5) * 20.0
        tris = base + (rng.rand(n, 3, 3) - 0.5) * 1.2
        mats = np.where(rng.rand(n) < 0.5, m, m2).astype(np.int32)
        b.set_mesh(tris.reshape(-1, 3).astype(np.float32),
                   np.repeat(mats, 3))
        return b.finalize(), rng

    def test_streamed_flag_and_tables(self):
        scene, _ = self._scene(2000)
        assert scene.tri_streamed and scene.tri_clusters == ()
        assert scene.n_stream_clusters >= 2000 // clu.LEAF_SIZE
        assert scene.mtri_bounds.shape[0] == scene.n_stream_clusters
        # winner attributes resolve inline from the pack rows; the flat
        # ctri tables stay dummies (VMEM)
        assert scene.ctri_mat.shape[0] <= 128
        assert scene.mtri_pack.shape[1] == 128

    def test_streamed_matches_brute(self):
        scene, rng = self._scene(2000)
        o1, d1 = _rays(rng, n=1024)
        # kernel-shaped (R, 128) blocks
        rs = lambda a: a.reshape(8, 128)
        o = Vec3(rs(o1.x), rs(o1.y), rs(o1.z))
        d = Vec3(rs(d1.x), rs(d1.y), rs(d1.z))
        shape = o.x.shape
        best = lambda: isect.Hit(
            jnp.full(shape, isect.F32_MAX), jnp.zeros(shape, jnp.int32),
            Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)))
        brute = isect.intersect_triangles_brute(scene, o, d, best())
        isect._tracing_pallas_kernel = True
        try:
            streamed = isect.intersect_triangles_brute(scene, o, d, best())
        finally:
            isect._tracing_pallas_kernel = False
        _assert_same_hits(brute, streamed)

    def test_supports_includes_streamed(self):
        from pathtracer_tpu.render.pallas_backend import supports
        from pathtracer_tpu.render.renderer import RenderConfig
        scene, _ = self._scene(2000)
        assert supports(scene, RenderConfig(width=8, height=8, pp=1))

    def test_dma_tier_bit_equal_to_resident(self):
        """DMA tier (pack rows in HBM, double-buffered async copies into a
        2-slot VMEM scratch) against the VMEM-resident streamed kernel:
        identical arithmetic, only data movement differs, so the
        interpret-mode renders must be BIT-EQUAL."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        scene, _ = self._scene(2000)
        assert not scene.tri_dma
        # forced DMA with STATIC parents, and the full finalize-built DMA
        # form (dynamic parent tables + SMEM scalar ranges)
        scene_dma = scene.replace(tri_dma=True)
        import os
        os.environ["PT_STREAM_DMA"] = "1"
        try:
            scene_dyn, _ = self._scene(2000)
        finally:
            del os.environ["PT_STREAM_DMA"]
        assert scene_dyn.tri_dma and scene_dyn.n_stream_parents > 0
        assert scene_dyn.stream_parents == ()
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=3,
                           backend="pallas-interpret")
        key = prng.base_key(3)
        imgs = []
        for sc in (scene, scene_dma, scene_dyn):
            st = render_chunk(sc, cam, cfg, key, np.int32(0), cfg.spp,
                              init_accum(w * h))
            imgs.append(np.asarray(resolve(st, cfg)))
        np.testing.assert_array_equal(imgs[0], imgs[1])
        np.testing.assert_array_equal(imgs[0], imgs[2])

    def test_gparent_level_bit_equal(self):
        """The GRANDPARENT level (clusters.GPARENT_MIN: parents regroup
        under grandparent AABBs, nested cond-in-fori descent) is pure
        pruning one level up — a grandparent is only skipped when no lane
        can improve inside its box — so the interpret-mode kernel render
        must be BIT-EQUAL with the level forced on vs off."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        import os
        os.environ["PT_STREAM_DMA"] = "1"
        # small parent groups -> many parents -> the gparent level builds
        os.environ["PT_PARENT_GROUP"] = "4"
        try:
            os.environ["PT_GPARENT_MIN"] = "4"
            scene_gp, _ = self._scene(2000)
            os.environ["PT_GPARENT_MIN"] = "100000"
            scene_flat, _ = self._scene(2000)
        finally:
            for k in ("PT_STREAM_DMA", "PT_PARENT_GROUP", "PT_GPARENT_MIN"):
                os.environ.pop(k, None)
        assert scene_gp.tri_dma and scene_gp.n_stream_gparents > 1
        assert scene_flat.n_stream_gparents == 0
        assert scene_flat.n_stream_parents > 0
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=3,
                           backend="pallas-interpret")
        key = prng.base_key(3)
        imgs = []
        for sc in (scene_flat, scene_gp):
            st = render_chunk(sc, cam, cfg, key, np.int32(0), cfg.spp,
                              init_accum(w * h))
            imgs.append(np.asarray(resolve(st, cfg)))
        np.testing.assert_array_equal(imgs[0], imgs[1])

    def test_parent_early_out_bit_equal(self):
        """The front-to-back early-out (PT_PARENT_EARLY: the top-level
        parent/gparent sweep breaks once the camera-ordered SUFFIX union
        box — clusters.PSUFFIX_LANE — can no longer beat any lane's
        running t) is pure pruning: every skipped item's entry distance
        is >= every lane's best t, so renders with it on vs off must be
        BIT-EQUAL. Covers BOTH level_sweep call sites: the parents-only
        DMA form and the grandparent level."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        import os
        os.environ["PT_STREAM_DMA"] = "1"
        os.environ["PT_PARENT_GROUP"] = "4"
        try:
            os.environ["PT_GPARENT_MIN"] = "4"
            scene_gp, _ = self._scene(2000)
            os.environ["PT_GPARENT_MIN"] = "100000"
            scene_flat, _ = self._scene(2000)
        finally:
            for k in ("PT_STREAM_DMA", "PT_PARENT_GROUP", "PT_GPARENT_MIN"):
                os.environ.pop(k, None)
        assert scene_gp.n_stream_gparents > 1
        assert scene_flat.n_stream_gparents == 0
        assert scene_flat.n_stream_parents > 1
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        key = prng.base_key(3)
        for sc in (scene_flat, scene_gp):
            imgs = []
            for early in ("0", "1"):
                os.environ["PT_PARENT_EARLY"] = early
                try:
                    # env knob is read at trace time, not in the jit key
                    jax.clear_caches()
                    cfg = RenderConfig(width=w, height=h, pp=pp, seed=3,
                                       backend="pallas-interpret")
                    st = render_chunk(sc, cam, cfg, key, np.int32(0),
                                      cfg.spp, init_accum(w * h))
                    imgs.append(np.asarray(resolve(st, cfg)))
                finally:
                    os.environ.pop("PT_PARENT_EARLY", None)
            np.testing.assert_array_equal(imgs[0], imgs[1])

    def test_row_cull_bit_equal(self):
        """The third culling level (per-row 9-tri AABBs in the pack rows'
        spare lanes, clusters.ROW_BOUNDS_LANE) is pure pruning: a row is
        only skipped when no lane's best t can be beaten by anything
        inside the row's box, so renders with it on vs off must be
        BIT-EQUAL — on the XLA path and in the interpret-mode kernel."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        # row culling defaults OFF below clusters.ROW_CULL_MIN (measured
        # crossover, BENCH.md round 4) — force it on for the bit-equal gate
        import os
        os.environ["PT_ROW_CULL_MIN"] = "64"
        try:
            scene, _ = self._scene(2000)
        finally:
            os.environ.pop("PT_ROW_CULL_MIN", None)
        assert scene.stream_row_cull
        off = scene.replace(stream_row_cull=False)
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        key = prng.base_key(5)
        for backend in ("xla", "pallas-interpret"):
            cfg = RenderConfig(width=w, height=h, pp=pp, seed=5,
                               backend=backend)
            imgs = []
            for sc in (scene, off):
                st = render_chunk(sc, cam, cfg, key, np.int32(0), cfg.spp,
                                  init_accum(w * h))
                imgs.append(np.asarray(resolve(st, cfg)))
            np.testing.assert_array_equal(imgs[0], imgs[1])

    def test_row_unroll_bit_equal(self):
        """The streamed-tier row loop's Python unroll (PT_ROW_UNROLL,
        default 16) vs the pure fori form (PT_ROW_UNROLL=0) must render
        BIT-EQUAL: the claim in intersect._row_unroll_max is 'bit-exact by
        construction' (same per-row expression tree, only loop structure
        differs), but fma contraction can in principle differ between loop
        and straight-line compiles and flip strict-< winners on ties — so
        gate it like row culling (ADVICE r4). jax caches are cleared
        between arms (the env knob is read at trace time, not in the jit
        key)."""
        import jax
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        import os
        scene, _ = self._scene(2000)
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        key = prng.base_key(7)
        for backend in ("xla", "pallas-interpret"):
            cfg = RenderConfig(width=w, height=h, pp=pp, seed=7,
                               backend=backend)
            imgs = []
            for unroll in ("16", "0"):
                os.environ["PT_ROW_UNROLL"] = unroll
                try:
                    jax.clear_caches()
                    st = render_chunk(scene, cam, cfg, key, np.int32(0),
                                      cfg.spp, init_accum(w * h))
                    imgs.append(np.asarray(resolve(st, cfg)))
                finally:
                    os.environ.pop("PT_ROW_UNROLL", None)
            np.testing.assert_array_equal(imgs[0], imgs[1])

    def test_row_boxes_packed(self):
        """Pack rows carry their own AABB in the spare lanes: real rows'
        boxes contain their triangles; all-padding rows get the far-point
        always-miss box."""
        scene, _ = self._scene(2000)
        pack = np.asarray(scene.mtri_pack)
        L = clu.ROW_BOUNDS_LANE
        mn, mx = pack[:, L:L + 3], pack[:, L + 3:L + 6]
        real = pack[:, 0:3].any(axis=1) | pack[:, 13:16].any(axis=1)
        assert (mn[real] <= mx[real]).all()
        empty = ~(np.abs(pack[:, :L]) > 0).any(axis=1)
        if empty.any():
            assert (mn[empty] == clu.ROW_EMPTY_FAR).all()
            assert (mx[empty] == clu.ROW_EMPTY_FAR).all()

    def test_dma_flag_set_above_stream_max(self):
        """finalize marks meshes above STREAM_MAX (or PT_STREAM_DMA=1)
        as the DMA tier, still streamed."""
        scene, _ = self._scene(2000)
        assert scene.tri_streamed and not scene.tri_dma
        import os
        os.environ["PT_STREAM_DMA"] = "1"
        try:
            forced, _ = self._scene(2000)
        finally:
            del os.environ["PT_STREAM_DMA"]
        assert forced.tri_streamed and forced.tri_dma

    def test_streamed_render_matches_oracle(self):
        """End-to-end: a 1200-tri scene through the interpret-mode kernel
        vs the scalar oracle."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.reference.cpu_oracle import render_oracle
        from pathtracer_tpu.scene.camera import define_camera
        rng = np.random.RandomState(9)
        b = WorldBuilder()
        b.add_material(emit=(0.3, 0.35, 0.45))
        light = b.add_material(emit=(6.0, 5.5, 5.0))
        b.add_sphere((6, -5, 9), 1.2, light)
        m = b.add_material(albedo=(0.6, 0.45, 0.35), roughness=0.8)
        base = (rng.rand(1200, 1, 3) - 0.5) * 16.0
        tris = base + (rng.rand(1200, 3, 3) - 0.5) * 1.0
        b.set_mesh(tris.reshape(-1, 3).astype(np.float32),
                   np.full((3600,), m, np.int32))
        scene = b.finalize()
        assert scene.tri_streamed
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=2,
                           backend="pallas-interpret")
        key = __import__("pathtracer_tpu.utils.prng", fromlist=["prng"]) \
            .base_key(2)
        st = render_chunk(scene, cam, cfg, key, np.int32(0), cfg.spp,
                          init_accum(w * h))
        img = np.asarray(resolve(st, cfg))
        oracle = render_oracle(b, cam, w, h, pp, seed=2, world_kind=0)
        dmax = np.abs(img - oracle).max(axis=-1)
        assert np.median(dmax) < 1e-4, float(np.median(dmax))
        assert (dmax > 1e-2).mean() < 0.05, float((dmax > 1e-2).mean())


class TestManyMaterialsGolden:
    def test_1100_material_scene_matches_oracle(self):
        """A >=1024-material scene must render correctly end-to-end: the
        XLA driver takes the gather path, the kernel (interpret) takes the
        windowed lane-LUT path, and both must match the scalar oracle."""
        from pathtracer_tpu.render.renderer import RenderConfig, render_image
        from pathtracer_tpu.reference.cpu_oracle import render_oracle
        from pathtracer_tpu.scene.camera import define_camera
        rng = np.random.RandomState(11)
        b = WorldBuilder()
        b.add_material(emit=(0.2, 0.25, 0.3))  # sky
        light = b.add_material(emit=(5.0, 4.5, 4.0))
        b.add_sphere((3, -3, 5), 1.0, light)
        mats = [b.add_material(albedo=tuple(rng.rand(3)),
                               roughness=float(rng.rand()))
                for _ in range(1100)]
        for k in range(24):
            b.add_sphere(tuple((rng.rand(3) - 0.5) * 8), 0.4 + rng.rand() * 0.6,
                         mats[rng.randint(len(mats))])
        w, h, pp = 16, 12, 2
        cam = define_camera((0, -12, 1), (0, 0, 0), 35.0, w, h)
        scene = b.finalize()
        assert scene.n_materials >= 1024 and scene.mat_roughness.shape[0] % 128 == 0
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=3)
        img, _, _ = render_image(scene, cam, cfg)
        oracle = render_oracle(b, cam, w, h, pp, seed=3, world_kind=0)
        d = np.abs(np.asarray(img) - oracle).max(axis=-1)
        assert np.median(d) < 1e-4, float(np.median(d))
        assert (d > 1e-2).mean() < 0.05, float((d > 1e-2).mean())


class TestTexelSortPermutation:
    def test_perm_is_valid_and_neutral(self):
        """The texel sort must be a permutation; neutrality on real scenes
        is covered by the world-1 interpret-mode equivalence tests."""
        from pathtracer_tpu.render.pallas_backend import _texel_sort
        from pathtracer_tpu.render.renderer import RenderConfig
        from pathtracer_tpu.scene.worlds import finalize_world
        import pathtracer_tpu.scene.textures as tex_mod
        scene, camera = finalize_world(0, 64, 36)
        if not scene.tex_combined:
            pytest.skip("world 1 textures unavailable")
        cfg = RenderConfig(width=64, height=36, pp=2)
        pix = jnp.arange(64 * 36, dtype=jnp.int32)
        perm = np.asarray(_texel_sort(scene, camera, cfg, pix))
        assert sorted(perm.tolist()) == list(range(64 * 36))


class TestFmTier:
    """Field-major ("outer") streamed layout (PT_FM_TIER=1,
    clusters.pack_stream_fm + ops/intersect fm branch): a pure re-layout
    of the record rows — same covectors, same expression order, winner by
    lane-min with lowest-lane ties (= the record loop's sequential
    first-win order) — so it must produce identical winners and t to f32
    tolerance vs the record-row tier, and be BIT-EQUAL between its own
    resident and DMA forms."""

    def _scene(self, n, fm, dma=False, uv=False):
        import os
        if fm:
            os.environ["PT_FM_TIER"] = "1"
        if dma:
            os.environ["PT_STREAM_DMA"] = "1"
        try:
            rng = np.random.RandomState(6)
            b = WorldBuilder()
            b.add_material(emit=(0.1, 0.2, 0.3))
            if uv:
                check = (np.indices((16, 16)).sum(0) % 2)[..., None]
                tex = (np.round((check.repeat(3, 2) * 0.6 + 0.2) * 255.0)
                       / 255.0).astype(np.float32)
                m = b.add_material(albedo=(1.0, 0.9, 0.8), roughness=0.7,
                                   albedo_idx=b.add_texture(tex))
            else:
                m = b.add_material(albedo=(0.6, 0.5, 0.4))
            m2 = b.add_material(albedo=(0.2, 0.6, 0.3))
            base = (rng.rand(n, 1, 3) - 0.5) * 20.0
            tris = base + (rng.rand(n, 3, 3) - 0.5) * 1.2
            mats = np.where(rng.rand(n) < 0.5, m, m2).astype(np.int32)
            uvs = (rng.rand(n * 3, 2).astype(np.float32) * 2.0
                   if uv else None)
            b.set_mesh(tris.reshape(-1, 3).astype(np.float32),
                       np.repeat(mats, 3), uvs=uvs)
            return b.finalize()
        finally:
            os.environ.pop("PT_FM_TIER", None)
            os.environ.pop("PT_STREAM_DMA", None)

    def test_fm_tables_and_flags(self):
        scene = self._scene(2000, fm=True)
        assert scene.tri_streamed and scene.stream_fm
        assert not scene.stream_row_cull  # n/a: no spare lanes
        tpc = clu.fm_tiles_per_cluster(scene.stream_leaf)
        assert scene.mtri_pack.shape == (
            scene.n_stream_clusters * tpc * clu.FM_FIELDS, 128)

    def test_fm_matches_record_tier(self):
        rec = self._scene(2000, fm=False)
        fms = self._scene(2000, fm=True)
        rng = np.random.RandomState(9)
        o1, d1 = _rays(rng, n=1024)
        rs = lambda a: a.reshape(8, 128)
        o = Vec3(rs(o1.x), rs(o1.y), rs(o1.z))
        d = Vec3(rs(d1.x), rs(d1.y), rs(d1.z))
        shape = o.x.shape
        best = lambda: isect.Hit(
            jnp.full(shape, isect.F32_MAX), jnp.zeros(shape, jnp.int32),
            Vec3(jnp.zeros(shape), jnp.zeros(shape), jnp.zeros(shape)))
        isect._tracing_pallas_kernel = True
        try:
            a = isect.intersect_triangles_brute(rec, o, d, best())
            b = isect.intersect_triangles_brute(fms, o, d, best())
        finally:
            isect._tracing_pallas_kernel = False
        _assert_same_hits(a, b)
        # normals of the winners must match too (same records)
        np.testing.assert_allclose(np.asarray(a.normal.x),
                                   np.asarray(b.normal.x),
                                   rtol=1e-6, atol=1e-6)

    def test_fm_render_matches_record_tier(self):
        """Interpret-mode kernel renders, mesh-UV scene: the fm tier
        carries the winner's interpolated texcoord through the one-hot
        resolve — same estimator, re-layout only (fma-fusion rounding
        class)."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        rec = self._scene(2000, fm=False, uv=True)
        fms = self._scene(2000, fm=True, uv=True)
        assert fms.has_mesh_uvs and fms.stream_fm
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=3,
                           backend="pallas-interpret")
        key = prng.base_key(3)
        imgs = []
        for sc in (rec, fms):
            st = render_chunk(sc, cam, cfg, key, np.int32(0), cfg.spp,
                              init_accum(w * h))
            imgs.append(np.asarray(resolve(st, cfg)))
        dd = np.abs(imgs[0] - imgs[1]).max(axis=-1)
        assert np.median(dd) < 1e-5, float(np.median(dd))
        assert (dd > 1e-2).mean() < 0.05, float((dd > 1e-2).mean())

    def test_fm_dma_bit_equal_to_resident(self):
        """fm resident vs fm DMA (double-buffered fm tiles + uv rows
        through their own scratch): identical arithmetic, data movement
        only — BIT-EQUAL."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        res = self._scene(2000, fm=True, uv=True)
        dyn = self._scene(2000, fm=True, dma=True, uv=True)
        assert dyn.tri_dma and dyn.stream_fm and dyn.n_stream_parents > 0
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=3,
                           backend="pallas-interpret")
        key = prng.base_key(3)
        imgs = []
        for sc in (res, dyn):
            st = render_chunk(sc, cam, cfg, key, np.int32(0), cfg.spp,
                              init_accum(w * h))
            imgs.append(np.asarray(resolve(st, cfg)))
        np.testing.assert_array_equal(imgs[0], imgs[1])
