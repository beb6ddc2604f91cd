"""Pallas TPU backend: the fused wavefront render kernel.

One `pl.pallas_call` renders a whole sample budget: the grid tiles the pixel
batch into VMEM-resident blocks; for each block the kernel runs one of two
drivers entirely on-chip. Untextured scenes use the SAME path-regeneration
loop as render/wavefront.py (_wave_loop — every lane busy every iteration);
textured scenes use a bounce-LOCKSTEP sample loop (_lockstep_loop — all
lanes at the same bounce, which is what keeps the windowed texel fetch's
per-block tile sets small). The XLA wavefront driver carries ~25 (N,)
arrays through HBM on every `lax.while_loop` iteration; here the state never
leaves VMEM and only the final per-pixel accumulator block is written back.

Crucially the kernel body CALLS THE SAME CODE as the XLA drivers —
ops/intersect.intersect_scene and render/integrator.shade_bounce are plain
jnp functions and lower through Mosaic unchanged — so there is no semantic
fork to keep in sync; equivalence with the XLA wavefront driver is asserted
in tests/test_pallas.py.

Supported scene class: scenes with primitive/material tables small enough
to fully unroll/sweep (worlds 2, 3, 4, 5 — the 494-sphere and 752-triangle
tables unroll fine under Mosaic, ~60s compile) plus combined-texture-set
scenes (world 1), whose texel fetches run in-kernel from a VMEM-resident
tiled table via the windowed lane-LUT iteration
(ops/texture.bespoke_sample_combined_windowed), plus EVERY non-combined
textured scene whose per-layer stack tiles (pow2 sizes, VMEM cap):
bespoke planar maps, bump maps, TBN normals and mesh-UV glTF materials
all fetch through the tiled general stack
(ops/texture.sample_texture_stack_windowed over Scene.tex_stack_tile).
Grid-traversal scenes and non-qualifying texture stacks stay on the XLA
path; renderer.render_chunk dispatches automatically. Compiled-TPU equivalence
vs the XLA wavefront (256x144, 4spp): >=50% of pixels bit-equal, <0.1%
with boundary-flip differences, ray counts within a few paths of 278k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.intersect import intersect_scene
from ..scene.camera import Camera
from ..scene.schema import MAX_BOUNCE_COUNT, Scene
from ..utils import prng
from ..utils.vec import Vec3, hadamard, splat, where as vwhere
from . import raygen
from .integrator import REGULAR, VARIANCE, russian_roulette, shade_bounce
from .renderer import AccumState, RenderConfig

# Lanes per block: (rows, 128). 4096 lanes x ~30 live f32 arrays ~ 0.5 MB
# of VMEM. Swept 8/16/32/64 rows on Cornell @64spp: 505/628/928/872 Mrays/s
# — 32 rows best (enough work per grid step to hide loop overhead; 64 rows
# starts spilling). Textured scenes use smaller blocks: the windowed fetch
# costs (distinct tiles) x (ops on the whole block), and distinct tiles
# grow sublinearly with lanes while the per-visit ops grow linearly, so
# fewer rows win once the fetch dominates (swept on world 1).
_BLOCK_ROWS = 32
# Textured scenes run the bounce-lockstep driver whose per-distinct-tile
# serial fetch cost amortizes over the whole block — bigger blocks win
# because distinct tiles grow sublinearly with lanes. Swept 16/32/64/128
# on world 1: 34/43/56/64 Mrays/s (BENCH.md round 2b).
_BLOCK_ROWS_TEXTURED = 128
# Streamed-mesh scenes (>1024 tris) are ISSUE-LATENCY-bound in the
# per-cluster record loop (experiments/stream_extract_micro.py: a static-
# immediates floor with zero loads costs the same ~1.2 us/tri as the real
# extraction, and per-tri cost is nearly flat in block width), so wider
# blocks amortize the serial chain over more rays. Swept 32/64/128 rows on
# the crossover workload: 2k tris 19.6/26.9/22.5, 8k 15.6/21.0/17.9
# Mrays/s — 64 rows best. The STATIC clustered tier keeps 32 (world 5
# swept 94 at 64 rows vs ~105 at 32: the unrolled straight-line code is
# throughput-bound, where bigger blocks only add spills).
_BLOCK_ROWS_STREAMED = 64
_LANES = 128
BLOCK = _BLOCK_ROWS * _LANES
# Samples per kernel dispatch on clustered (untextured) scenes. Measured
# on world 5: short lockstep-restart dispatches do NOT pay for their
# dispatch overhead (sub 4/8/16/64 -> 27.1/28.9/1.3*/29.7 Mrays/s), so
# dispatches stay long. (*outlier run)
_SUB_CHUNK_SAMPLES = 64


def _use_lockstep(scene: Scene) -> bool:
    """Loop choice for the kernel (single source for make_kernel and
    _block_rows). Lockstep trades ~3.6x idle-lane waste for per-bounce
    fetch coherence, which only pays when the texture working set is
    LARGE. Measured (BENCH.md rounds 2b + 4): world 1's combined set
    (5464 rows) wants lockstep (64 vs 34 regen); world 7's 64x64 checker
    stack (32 rows) wants REGEN (46.5 vs 33.9 @64spp, official 44.1 vs
    34.7). Small stacks therefore run regen; PT_LOCKSTEP_STACK_MIN moves
    the row threshold, PT_FORCE_REGEN=1 forces regen, and
    PT_LOCKSTEP_CLUSTERED=1 re-enables the round-2 ablation."""
    import os
    use_tex_ref = scene.tex_combined and scene.n_textures > 0
    use_stack = (scene.n_textures > 0 and scene.tex_stack_tiled
                 and not scene.tex_combined)
    big_stack = use_stack and (scene.tex_stack_tile.shape[0] > int(
        os.environ.get("PT_LOCKSTEP_STACK_MIN", "512")))
    clustered = bool(scene.sph_clusters or scene.tri_clusters
                     or scene.tri_streamed)
    return bool((use_tex_ref or big_stack
                 or (clustered and os.environ.get("PT_LOCKSTEP_CLUSTERED")))
                and not os.environ.get("PT_FORCE_REGEN"))


def _block_rows(scene: Scene) -> int:
    import os
    if os.environ.get("PT_BLOCK_ROWS"):  # perf-sweep knob (experiments/)
        return int(os.environ["PT_BLOCK_ROWS"])
    if scene.n_textures and (scene.tex_combined or scene.tex_stack_tiled):
        # the 128-row textured block was tuned for LOCKSTEP fetch
        # amortization (round 2b); regen-scheduled stack scenes behave
        # like the streamed record loop and want 64 (w7 sweep: 46.5 @64
        # vs 42.5 @32 / 40.4 @128, BENCH.md round 4)
        if not _use_lockstep(scene):
            return (_BLOCK_ROWS_STREAMED if scene.tri_streamed
                    else _BLOCK_ROWS)
        return _BLOCK_ROWS_TEXTURED
    if scene.tri_streamed:
        return _BLOCK_ROWS_STREAMED
    return _BLOCK_ROWS


def supports(scene: Scene, config: RenderConfig) -> bool:
    """The fused kernel covers scenes whose primitive loops fully unroll
    (Mosaic has no dynamic_slice, so the intersect loops must use static
    indices — ops/intersect._scan_table); triangles are covered via the
    (default) brute-force path, not the grid. Textured scenes are covered
    when the canonical combined 4-map set exists (world 1: the combined
    tiled table + bespoke_sample_combined_windowed) OR when the general
    per-layer stack tiles (pow2 sizes, VMEM cap: the tiled stack +
    *_stack_windowed fetches). Non-pow2 stacks stay on the XLA drivers."""
    from ..ops.intersect import _UNROLL_MAX_KERNEL
    # (materials of any count are covered: small tables sweep, large ones
    # use the windowed lane-LUT lookup — integrator._material_lookup)
    # Non-combined textured scenes (bespoke maps of any mix, bump, TBN,
    # mesh-UV) ride the kernel through the tiled general stack
    # (Scene.tex_stack_tile + the *_stack_windowed fetches) when it
    # qualifies (pow2 sizes, VMEM cap).
    stack_ok = scene.tex_stack_tiled and not scene.tex_combined
    return (
        (scene.n_textures == 0 or scene.tex_combined or stack_ok)
        and (scene.n_tris == 0 or scene.grid_res == 0)
        and max(scene.n_spheres, scene.n_quads, scene.n_planes) <= _UNROLL_MAX_KERNEL
        # meshes: static unroll up to the Mosaic budget, then the streamed
        # tier (dynamic record reads, ops/intersect streamed branch)
        and (scene.n_tris <= _UNROLL_MAX_KERNEL or scene.tri_streamed)
        and config.debug_kind in (REGULAR, VARIANCE)
        and not config.just_importance
        # mesh-UV textured scenes: the UV interpolation rides the triangle
        # loops themselves (no per-lane gathers — brute select-at-take,
        # clustered deferred resolve, streamed parallel uv rows; in DMA
        # mode the uv rows double-buffer through their own scratch) and
        # the texel fetch is the windowed iteration over the tiled stack
        # — all tiers covered up to clusters.DMA_MAX
        and (not scene.has_mesh_uvs
             or (stack_ok
                 and (scene.n_tris <= _UNROLL_MAX_KERNEL
                      or scene.tri_streamed)))
        # bump maps fetch through the tiled stack; without it the
        # per-lane height gather has no Mosaic lowering (a combined-set
        # scene carrying a bump map would need the stack built too)
        and (not scene.any_bump or stack_ok)
    )


def _wave_loop(scene: Scene, camera: Camera, config: RenderConfig,
               key, s0, n_samples: int, pixel_idx: jnp.ndarray):
    """The path-regeneration loop on one block of pixels (pure jnp; runs
    inside the kernel). Mirrors render/wavefront.py exactly."""
    shape = pixel_idx.shape
    # Derive constants from the block data: Mosaic's layout inference
    # rejects while-loop carries seeded with replicated splat constants
    # ("Invalid relayout ... replicated in destination but not in source").
    zeros = lambda: pixel_idx.astype(jnp.float32) * 0.0
    zvec = lambda: Vec3(zeros(), zeros(), zeros())

    def primary(s_abs):
        if camera.use_pinhole:
            i, j = s_abs // config.pp, s_abs % config.pp
            stream = prng.PathStream(
                jnp.broadcast_to(jnp.uint32(key), shape),
                pixel_idx.astype(jnp.uint32), s_abs.astype(jnp.uint32))
            jit_u = prng.jitter_uniforms_v(stream)
            return raygen.pinhole_rays(camera, config.width, config.height,
                                       config.pp, i, j, jit_u, pixel_idx)
        ray_index, ray_index2 = s_abs // config.pp, s_abs % config.pp
        lens_stream = prng.PathStream(
            jnp.broadcast_to(jnp.uint32(key), shape),
            pixel_idx.astype(jnp.uint32), ray_index.astype(jnp.uint32))
        lens_u = prng.lens_uniforms_v(lens_stream)
        return raygen.thin_lens_rays(camera, config.width, config.height,
                                     config.pp, ray_index, ray_index2,
                                     lens_u, pixel_idx)

    def cond(carry):
        s_rel = carry[0]
        return jnp.any(s_rel < n_samples)

    def body(carry):
        (s_rel, bounce, o, d, thr, prad, acc_sum, acc_sq, count, nan_c, rays) = carry
        done = s_rel >= n_samples
        active = ~done

        regen = active & (bounce == 0)
        s_abs = s0 + s_rel
        po, pd = primary(s_abs)
        o = vwhere(regen, po, o)
        d = vwhere(regen, pd, d)
        thr = vwhere(regen, splat((1.0, 1.0, 1.0), shape), thr)
        prad = vwhere(regen, zvec(), prad)

        rays = rays + active.astype(jnp.float32)
        if scene.has_mesh_uvs:
            # mirror render/wavefront.py: the winner's interpolated uv
            # rides the triangle loops (no per-lane gathers)
            from ..ops.intersect import intersect_scene_uv
            hit, uvx, uvy, uv_ok = intersect_scene_uv(scene, o, d)
            uv = (uvx, uvy, uv_ok)
        else:
            hit, uv = intersect_scene(scene, o, d), None
        stream = prng.PathStream(
            jnp.broadcast_to(jnp.uint32(key), shape),
            pixel_idx.astype(jnp.uint32), s_abs.astype(jnp.uint32))
        u = prng.bounce_uniforms_v(stream, bounce)
        out = shade_bounce(scene, o, d, hit, u, mip_scale=config.mip_scale,
                           uv=uv)

        contrib = hadamard(thr, out.emit)
        prad = Vec3(
            jnp.where(active, prad.x + contrib.x, prad.x),
            jnp.where(active, prad.y + contrib.y, prad.y),
            jnp.where(active, prad.z + contrib.z, prad.z),
        )

        at_depth_limit = bounce >= MAX_BOUNCE_COUNT - 1
        cont = active & out.cont & ~at_depth_limit
        new_thr = hadamard(thr, out.weight)
        if config.use_russian_roulette:
            survive, rr_thr = russian_roulette(new_thr, u[4])
            rr_applies = bounce >= 1
            cont = cont & (survive | ~rr_applies)
            new_thr = vwhere(rr_applies, rr_thr, new_thr)

        path_end = active & ~cont
        bad = jnp.isnan(prad.x) | jnp.isnan(prad.y) | jnp.isnan(prad.z)
        ok_end = path_end & ~bad
        okf = ok_end.astype(jnp.float32)
        rx = jnp.where(ok_end, prad.x, 0.0)
        ry = jnp.where(ok_end, prad.y, 0.0)
        rz = jnp.where(ok_end, prad.z, 0.0)

        return (
            jnp.where(path_end, s_rel + 1, s_rel),
            jnp.where(path_end, 0, jnp.where(cont, bounce + 1, bounce)),
            vwhere(cont, out.hitpoint, o),
            vwhere(cont, out.L, d),
            vwhere(cont, new_thr, thr),
            prad,
            Vec3(acc_sum.x + rx, acc_sum.y + ry, acc_sum.z + rz),
            Vec3(acc_sq.x + rx * rx, acc_sq.y + ry * ry, acc_sq.z + rz * rz),
            count + okf,
            nan_c + (path_end & bad).astype(jnp.float32),
            rays,
        )

    izeros = lambda: pixel_idx * 0
    ones = lambda: zeros() + 1.0
    init = (
        izeros(), izeros(),
        zvec(), Vec3(zeros(), zeros(), ones()),
        Vec3(ones(), ones(), ones()), zvec(),
        zvec(), zvec(), zeros(), zeros(), zeros(),
    )
    # Check the termination predicate every K body steps, not every step:
    # the while cond's jnp.any is a ~470-cycle serial lane reduce gating
    # everything after it — a large fraction of a small scene's ~2.6 us
    # body (round-5 measurement, Cornell). EXACT: the body is a no-op for
    # done lanes (active masks every update), so up to K-1 trailing
    # all-done steps change nothing. K=4 pays ONLY while the body is
    # small — the kernel carries K copies of the whole unrolled intersect
    # sweep, so big static bodies lose to code size (and streamed bodies
    # make the reduce noise). Measured @64spp, round 5: Cornell (5 quads)
    # +19%, w2 official (122 spheres) +21%; w5 (752 unrolled tris) K=1
    # 123.9 vs K=4 94.1 (-24%), w4 (494 spheres) official -3% with a
    # compile blowup past its budget. Cut: no static triangles and
    # <= 200 spheres.
    import os
    small_body = (not scene.tri_streamed and scene.n_tris == 0
                  and scene.n_spheres <= 200)
    k_unroll = int(os.environ.get(
        "PT_WAVE_UNROLL", "4" if small_body else "1"))

    def body_k(carry):
        for _ in range(max(1, k_unroll)):
            carry = body(carry)
        return carry

    carry = jax.lax.while_loop(cond, body_k, init)
    (_, _, _, _, _, _, acc_sum, acc_sq, count, nan_c, rays) = carry
    return acc_sum, acc_sq, count, nan_c, rays


def _lockstep_loop(scene: Scene, camera: Camera, config: RenderConfig,
                   key, s0, n_samples: int, pixel_idx: jnp.ndarray):
    """Bounce-SYNCHRONIZED sample loop — the kernel driver for textured
    scenes. Path regeneration (_wave_loop) keeps every lane busy but mixes
    bounce depths within a block, which destroys exactly the coherence the
    windowed texture fetch feeds on: the texel-sorted pixel order makes
    bounce-0 fetches span a handful of contiguous tiles, but a regen block
    blends them with scattered bounce-2 tiles every iteration. Here all
    lanes advance through one sample's bounces in lockstep (the single-
    sourced integrator.trace unroll): each bounce's fetch sees only that
    bounce's tiles, and dead lanes contribute no tiles at all (a sky
    block's fetch costs zero). Idle-lane waste is bounded by
    the scene's mean path length; for textured scenes the fetch latency
    dominates that waste by an order of magnitude (BENCH.md round 2).

    Bounce-loop form (PT_BOUNCE_FORI=1): REGULAR/VARIANCE renders run
    integrator.trace_fori — the bounce as a lax.fori_loop, one bounce
    body to compile instead of MAX_BOUNCE_COUNT straight-line copies
    (world 1's unrolled kernel is the tree's biggest compile,
    VERIFY_r04.json 504 s). Debug kinds keep the unrolled trace (their
    per-bounce captures specialize at Python level)."""
    import os
    from .integrator import trace, trace_fori, REGULAR, VARIANCE

    shape = pixel_idx.shape
    zeros = lambda: pixel_idx.astype(jnp.float32) * 0.0

    def primary(s_abs):
        if camera.use_pinhole:
            i, j = s_abs // config.pp, s_abs % config.pp
            stream = prng.PathStream(
                jnp.broadcast_to(jnp.uint32(key), shape),
                pixel_idx.astype(jnp.uint32), s_abs.astype(jnp.uint32))
            jit_u = prng.jitter_uniforms_v(stream)
            return raygen.pinhole_rays(camera, config.width, config.height,
                                       config.pp, i, j, jit_u, pixel_idx)
        ray_index, ray_index2 = s_abs // config.pp, s_abs % config.pp
        lens_stream = prng.PathStream(
            jnp.broadcast_to(jnp.uint32(key), shape),
            pixel_idx.astype(jnp.uint32), ray_index.astype(jnp.uint32))
        lens_u = prng.lens_uniforms_v(lens_stream)
        return raygen.thin_lens_rays(camera, config.width, config.height,
                                     config.pp, ray_index, ray_index2,
                                     lens_u, pixel_idx)

    def cond(carry):
        return jnp.any(carry[0] < n_samples)

    if config.bounce_fori is None:  # auto (see RenderConfig.bounce_fori)
        use_fori = (config.debug_kind in (REGULAR, VARIANCE)
                    and not os.environ.get("PT_LOCKSTEP_UNROLL"))
    else:
        use_fori = (config.bounce_fori
                    and config.debug_kind in (REGULAR, VARIANCE))

    def body(carry):
        (s_rel, acc_sum, acc_sq, count, nan_c, rays) = carry
        # active mask: all lanes advance in lockstep so this is all-true
        # under a step-1 while loop — it exists to make the body a no-op
        # past n_samples, which is what lets body_k below check the
        # termination reduce every K samples instead of every sample
        active = s_rel < n_samples
        s_abs = s0 + s_rel
        o, d = primary(s_abs)
        stream = prng.PathStream(
            jnp.broadcast_to(jnp.uint32(key), shape),
            pixel_idx.astype(jnp.uint32), s_abs.astype(jnp.uint32))
        if use_fori:
            radiance, stats = trace_fori(
                scene, o, d, stream,
                use_russian_roulette=config.use_russian_roulette,
                mip_scale=config.mip_scale,
                unroll=int(os.environ.get("PT_FORI_UNROLL", "1")))
        else:
            radiance, stats = trace(
                scene, o, d, stream, debug_kind=config.debug_kind,
                use_russian_roulette=config.use_russian_roulette,
                mip_scale=config.mip_scale)
        # NaN policy: mask & count (renderer._one_sample)
        bad = (jnp.isnan(radiance.x) | jnp.isnan(radiance.y)
               | jnp.isnan(radiance.z))
        ok = ~bad & active
        okf = ok.astype(jnp.float32)
        rx = jnp.where(ok, radiance.x, 0.0)
        ry = jnp.where(ok, radiance.y, 0.0)
        rz = jnp.where(ok, radiance.z, 0.0)
        actf = active.astype(jnp.float32)
        return (
            s_rel + 1,
            Vec3(acc_sum.x + rx, acc_sum.y + ry, acc_sum.z + rz),
            Vec3(acc_sq.x + rx * rx, acc_sq.y + ry * ry, acc_sq.z + rz * rz),
            count + okf,
            nan_c + (bad & active).astype(jnp.float32),
            rays + stats.lane_casts * actf,
        )

    zvec = lambda: Vec3(zeros(), zeros(), zeros())
    izeros = lambda: pixel_idx * 0
    init = (izeros(), zvec(), zvec(), zeros(), zeros(), zeros())
    # Termination-reduce amortization (see _wave_loop body_k): K samples
    # per while-cond check. Measured a WASH for lockstep (w1 @64spp: 81.7
    # at K=2 vs 81.6 at K=1 — one reduce per FULL 4-bounce textured sample
    # is already noise), so the default keeps the single-sample body; the
    # knob remains for ablation.
    import os
    k_unroll = int(os.environ.get("PT_LOCKSTEP_SAMPLE_UNROLL", "1"))

    def body_k(carry):
        for _ in range(max(1, k_unroll)):
            carry = body(carry)
        return carry

    carry = jax.lax.while_loop(cond, body_k, init)
    (_, acc_sum, acc_sq, count, nan_c, rays) = carry
    return acc_sum, acc_sq, count, nan_c, rays


@functools.lru_cache(maxsize=32)
def _tile_perm_np(width: int, height: int, rows: int):
    """Static pixel permutation grouping (128 x rows) image tiles, so one
    kernel block covers a square-ish screen region instead of a 3-scanline
    strip spanning the full image width. Matters for packet culling: a
    strip block crosses every scene feature on its rows (world 5's Mario
    occupies the middle of EVERY strip), while most square tiles miss the
    mesh entirely and skip all its clusters. Returns (perm, inv) numpy
    index arrays (perm[i] = original pixel at sorted position i)."""
    import numpy as np
    idx = np.arange(width * height, dtype=np.int32).reshape(height, width)
    tiles = []
    for ty in range(0, height, rows):
        for tx in range(0, width, 128):
            tiles.append(idx[ty:ty + rows, tx:tx + 128].ravel())
    perm = np.concatenate(tiles)
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv


def _texel_sort(scene: Scene, camera: Camera, config: RenderConfig,
                pixel_idx: jnp.ndarray) -> jnp.ndarray:
    """Permutation ordering pixels by the texture TILE their primary ray
    fetches (sentinel = pixels that fetch nothing: sky, untextured hits).

    The windowed texture fetch costs ~0.4us per DISTINCT tile a block
    touches, and with row-major pixel order a minified ground plane spreads
    a 2048-lane block over ~130 tiles (BENCH.md round 2). Sorting pixels by
    primary tile id makes blocks tile-coherent for every bounce-0 fetch of
    every sample (each lane keeps its pixel for the whole chunk), cutting
    distinct tiles per block several-fold; bounce>=1 fetches stay scattered.
    The permutation is correctness-neutral: all randomness/geometry is a
    pure function of the linear pixel index, and results are inverse-
    permuted before accumulation."""
    from ..ops import texture as _tex
    from .integrator import _material_lookup
    n = pixel_idx.shape[0]
    half = jnp.full((n,), 0.5, jnp.float32)
    zero = jnp.zeros((n,), jnp.int32)
    if camera.use_pinhole:
        o, d = raygen.pinhole_rays(camera, config.width, config.height,
                                   config.pp, 0, 0, (half, half), pixel_idx)
    else:
        o, d = raygen.thin_lens_rays(camera, config.width, config.height,
                                     config.pp, zero, zero, (half, half),
                                     pixel_idx)
    hit = intersect_scene(scene, o, d)
    mat = _material_lookup(scene, hit.mat)
    hp = o + d * hit.t
    x1, y1, _, _, _, _ = _tex._combined_coords(scene, hp.x, hp.y)
    tile = (y1 >> 3) * scene.tex_tiles_x + (x1 >> 3)
    needs = (hit.mat != 0) & (mat["albedo_idx"] != 0)
    key = jnp.where(needs, tile, jnp.int32(1 << 30))
    return jnp.argsort(key)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "config", "n_samples", "interpret"),
)
def render_chunk_pallas(
    scene: Scene, camera: Camera, config: RenderConfig,
    key, s0, n_samples: int, state: AccumState, pixel_idx: jnp.ndarray,
    interpret: bool = False,
) -> AccumState:
    """Drop-in replacement for the wavefront chunk on supported scenes."""
    n = pixel_idx.shape[0]
    block_rows = _block_rows(scene)
    block = block_rows * _LANES

    # Block-coherence machinery (clustered or textured scenes): the packet
    # culls and the windowed texture fetch only pay off while a block's
    # lanes agree on where they are. Path regeneration desyncs lanes over
    # a long sample budget (each lane advances through its samples at its
    # own pace), so (a) order pixels tile-coherently for textured scenes,
    # and (b) split the sample budget into short per-dispatch sub-chunks
    # that restart every lane at (sample, bounce 0) lockstep — measured on
    # world 5: 29 Mrays/s at 64-sample dispatches vs ~90 at 4.
    use_sort = bool(scene.tex_combined and scene.n_textures)
    # non-combined textured scenes: windowed fetches from the tiled stack
    use_stack = bool(scene.tex_stack_tiled and not scene.tex_combined
                     and scene.n_textures)
    # tri_streamed matters here: streamed scenes have tri_clusters == ()
    # (the descriptors live in stream_parents/mtri_bounds), and omitting
    # them made streamed blocks full-width scanline strips whose frustum
    # crossed the whole mesh — no cluster could ever be culled (round-3
    # fix; the round-2 crossover numbers above 1024 tris paid this).
    coherent = use_sort or use_stack or bool(
        scene.sph_clusters or scene.tri_clusters or scene.tri_streamed)
    perm = inv = None
    if use_sort:
        perm = _texel_sort(scene, camera, config, pixel_idx)
        pixel_idx = pixel_idx[perm]
    elif coherent and n == config.width * config.height:
        p_np, i_np = _tile_perm_np(config.width, config.height, block_rows)
        perm, inv = jnp.asarray(p_np), jnp.asarray(i_np)
        pixel_idx = pixel_idx[perm]
    # textured scenes run the bounce-lockstep driver — every sample is
    # already synchronized, so sub-chunk restarts would only add dispatches
    sub = (_SUB_CHUNK_SAMPLES if (coherent and not use_sort and not use_stack)
           else n_samples)

    n_pad = ((n + block - 1) // block) * block
    pix = jnp.concatenate(
        [pixel_idx.astype(jnp.int32),
         jnp.zeros((n_pad - n,), jnp.int32)]) if n_pad != n else pixel_idx
    pix2d = pix.reshape(-1, _LANES)  # (rows_total, 128)
    rows_total = pix2d.shape[0]
    grid = (rows_total // block_rows,)

    if scene.tex_combined:
        # the kernel fetch reads only the tiled table; drop the flat texel
        # arrays (world 1: 6 MB of VMEM) before they ride into the kernel
        scene = scene.replace(
            tex_packed=jnp.zeros((1,), jnp.int32),
            tex_comb_a=jnp.zeros((1,), jnp.int32),
            tex_comb_b=jnp.zeros((1,), jnp.int32),
        )
    elif use_stack:
        # stack kernels read only tex_stack_tile; the padded flat stack
        # ((K, Hmax, Wmax) words) is dead VMEM weight
        scene = scene.replace(tex_packed=jnp.zeros((1,), jnp.int32))
    if scene.tri_streamed:
        # the streamed tier reads only mtri_bounds/mtri_pack(/uvpack);
        # the brute triangle tables are dead weight in the kernel (~4 MB
        # VMEM at 100k tris) — the XLA drivers keep the ORIGINAL scene
        zv = Vec3(jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1,)))
        z1 = jnp.zeros((1,), jnp.float32)
        scene = scene.replace(
            tri_a=zv, tri_u=zv, tri_v=zv,
            tri_mat=jnp.zeros((1,), jnp.int32),
            tri_mask=jnp.zeros((1,), bool),
            tri_uv0u=z1, tri_uv0v=z1, tri_uvdu1=z1,
            tri_uvdv1=z1, tri_uvdu2=z1, tri_uvdv2=z1,
        )
    scene_leaves, scene_def = jax.tree_util.tree_flatten(scene)
    # tex_tile (and the streamed-mesh tables) stay REFS inside the kernel
    # (dynamic row slices need the memref, not a loaded value); locate
    # their leaf slots by identity
    tex_idx = next(
        (i for i, l in enumerate(scene_leaves) if l is scene.tex_tile), None)
    use_tex_ref = scene.tex_combined and scene.n_textures > 0
    ref_slots = {tex_idx} if use_tex_ref else set()
    stack_idx = None
    if use_stack:
        stack_idx = next(i for i, l in enumerate(scene_leaves)
                         if l is scene.tex_stack_tile)
        ref_slots |= {stack_idx}
    pack_idx = None
    prange_idx = None
    gprange_idx = None
    if scene.tri_streamed:
        ref_slots |= {i for i, l in enumerate(scene_leaves)
                      if l is scene.mtri_bounds or l is scene.mtri_pack
                      or l is scene.mtri_parents or l is scene.mtri_prange
                      or l is scene.mtri_gparents
                      or l is scene.mtri_gprange
                      or (scene.has_mesh_uvs and l is scene.mtri_uvpack)}
        pack_idx = next(i for i, l in enumerate(scene_leaves)
                        if l is scene.mtri_pack)
        prange_idx = next(i for i, l in enumerate(scene_leaves)
                          if l is scene.mtri_prange)
        gprange_idx = next(i for i, l in enumerate(scene_leaves)
                           if l is scene.mtri_gprange)
    # DMA tier: the pack rows stay in HBM (memory_space=ANY); the kernel
    # double-buffers each cluster's rows into a 2-slot VMEM scratch
    # (ops/intersect._intersect_triangles_streamed, dma branch).
    dma_mode = bool(scene.tri_streamed and scene.tri_dma)
    uvpack_idx = None
    if dma_mode and scene.has_mesh_uvs:
        # the uv rows are as large as the pack rows — they stay in HBM
        # too, with their own double-buffer scratch
        uvpack_idx = next(i for i, l in enumerate(scene_leaves)
                          if l is scene.mtri_uvpack)
    sk = jnp.asarray(key, jnp.uint32).reshape(1, 1)

    from ..ops import intersect as _intersect_mod
    from ..ops import texture as _texture_mod
    _intersect_mod._tracing_pallas_kernel = True

    def make_kernel(ns: int):
        def kernel(sk_ref, ss0_ref, pix_ref, *refs):
            scene_refs = refs[: len(scene_leaves)]
            outs = refs[len(scene_leaves): len(scene_leaves) + 9]
            (sumx, sumy, sumz, sqx, sqy, sqz, cnt, nanc, rays) = outs
            vals = [r if i in ref_slots else r[:]
                    for i, r in enumerate(scene_refs)]
            scene_local = jax.tree_util.tree_unflatten(scene_def, vals)
            if dma_mode:
                # scratch refs trail the outputs in the kernel signature
                tail = refs[len(scene_leaves) + 9:]
                scene_local = scene_local.replace(
                    stream_scratch=tail[0], stream_sem=tail[1])
                if uvpack_idx is not None:
                    scene_local = scene_local.replace(
                        stream_uv_scratch=tail[2], stream_uv_sem=tail[3])
            if use_tex_ref:
                _texture_mod.KERNEL_TEX_REF = scene_refs[tex_idx]
            if use_stack:
                _texture_mod.KERNEL_STACK_REF = scene_refs[stack_idx]
            pixel_block = pix_ref[:]
            # loop choice + rationale: _use_lockstep (shared with
            # _block_rows so the block size follows the loop)
            loop = _lockstep_loop if _use_lockstep(scene) else _wave_loop
            acc_sum, acc_sq, count, nan_c, ray_c = loop(
                scene_local, camera, config, sk_ref[0, 0], ss0_ref[0, 0],
                ns, pixel_block)
            sumx[:] = acc_sum.x
            sumy[:] = acc_sum.y
            sumz[:] = acc_sum.z
            sqx[:] = acc_sq.x
            sqy[:] = acc_sq.y
            sqz[:] = acc_sq.z
            cnt[:] = count
            nanc[:] = nan_c
            rays[:] = ray_c
        return kernel

    blk = pl.BlockSpec((block_rows, _LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)

    def full(i, leaf):
        if dma_mode and (i == pack_idx or i == uvpack_idx):
            return pl.BlockSpec(memory_space=pl.ANY)  # stays in HBM
        if i == prange_idx and scene.n_stream_parents > 0:
            # (start, count) scalars: fori bounds read from SMEM
            return pl.BlockSpec(memory_space=pltpu.SMEM)
        if (gprange_idx is not None and i == gprange_idx
                and scene.n_stream_gparents > 0):
            return pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    scratch_shapes = []
    if dma_mode:
        from ..scene import clusters as _clu
        if scene.stream_fm:
            rpc = _clu.fm_rows_per_cluster(scene.stream_leaf)
            rpc_uv = _clu.fm_uv_rows_per_cluster(scene.stream_leaf)
        else:
            rpc = _clu.stream_rows_per_cluster(scene.stream_leaf)
            rpc_uv = (_clu.UV_CFM_ROWS if scene.stream_uv_cfm else rpc)
        scratch_shapes = [pltpu.VMEM((2 * rpc, _LANES), jnp.float32),
                          pltpu.SemaphoreType.DMA((2,))]
        if uvpack_idx is not None:
            scratch_shapes += [pltpu.VMEM((2 * rpc_uv, _LANES),
                                          jnp.float32),
                               pltpu.SemaphoreType.DMA((2,))]
    out_shape = [jax.ShapeDtypeStruct((rows_total, _LANES), jnp.float32)
                 for _ in range(9)]
    calls = {}  # ns -> compiled pallas_call (1-2 distinct tail sizes)

    def run_sub(off: int, ns: int):
        if ns not in calls:
            calls[ns] = pl.pallas_call(
                make_kernel(ns),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    blk,
                ] + [full(i, l) for i, l in enumerate(scene_leaves)],
                out_specs=[blk] * 9,
                out_shape=out_shape,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )
        ss0 = (jnp.asarray(s0, jnp.int32) + off).reshape(1, 1)
        return calls[ns](sk, ss0, pix2d, *scene_leaves)

    try:
        outs = None
        off = 0
        while off < n_samples:
            ns = min(sub, n_samples - off)
            got = run_sub(off, ns)
            outs = got if outs is None else [a + b for a, b in zip(outs, got)]
            off += ns
    finally:
        _intersect_mod._tracing_pallas_kernel = False
        _texture_mod.KERNEL_TEX_REF = None
        _texture_mod.KERNEL_STACK_REF = None

    per_pixel = [a.reshape(-1)[:n] for a in outs[:7]]
    if perm is not None:
        # back to caller pixel order (state is indexed by the caller's
        # pixel_idx): position i of the kernel outputs is position perm[i]
        if inv is None:
            inv = jnp.argsort(perm)
        per_pixel = [a[inv] for a in per_pixel]
    (sumx, sumy, sumz, sqx, sqy, sqz, cnt) = per_pixel
    nanc, rays = outs[7], outs[8]

    return AccumState(
        sum=Vec3(state.sum.x + sumx, state.sum.y + sumy, state.sum.z + sumz),
        sum_sq=Vec3(state.sum_sq.x + sqx, state.sum_sq.y + sqy,
                    state.sum_sq.z + sqz),
        count=state.count + cnt,
        nan_count=state.nan_count + jnp.sum(nanc.reshape(-1)[:n]),
        rays_cast=state.rays_cast + jnp.sum(rays.reshape(-1)[:n]),
        samples_done=state.samples_done + n_samples,
    )
