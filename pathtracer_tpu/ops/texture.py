"""Batched texture sampling (bilinear, wrap) from the device texture stack.

Reference semantics:
- SampleTexture (win32_main.cpp:1680-1709): uv in texel units; abs(uv);
  integer truncation; fractional weights clamped to [0,1]; wraparound on
  both axes; bilinear blend.
- BespokeSampleTexture (win32_main.cpp:1675-1678): world-space planar
  mapping uv_texels = (u * width * 0.5, v * height * 0.5) — the "bespoke"
  scale used by every material texture fetch in the reference
  (win32_main.cpp:613,621,631,640,1604).

Layout: texels are packed RGB8 in ONE flat int32 array (Scene.tex_packed,
linear index (layer*Hmax + y)*Wmax + x). Random-access gathers dominate
textured-scene cost on the VPU; packing turns 3 float gathers per texel
into 1 int32 gather (measured 3x on world 1), and the flat 1-D index avoids
the slow multi-dimensional gather path. Texel floats are exactly the
reference's k/255 values (textures are always 8-bit-sourced: stbi_load ->
/255.f, win32_main.cpp:1736-1739; procedural stand-ins are quantized to the
same grid, scene/textures.quantize8) so the CPU oracle matches bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.schema import Scene
from ..utils.vec import Vec3

_INV255 = 1.0 / 255.0

# Trace-time side channel: the fused Pallas kernel parks the tex_tile REF
# here (render/pallas_backend.py) so shade_bounce — a plain jnp function
# shared by every driver — can dynamic-slice tile rows from VMEM. None
# outside kernel tracing (the XLA drivers then use the flat gathers).
KERNEL_TEX_REF = None
# Same side channel for the tiled general stack (Scene.tex_stack_tile):
# set when the kernel covers a non-combined textured scene
# (scene.tex_stack_tiled) — serves the mesh-UV texel lookups AND the
# bespoke planar fetches (albedo/metalness/roughness/normal/bump).
KERNEL_STACK_REF = None


def _unpack(word: jnp.ndarray) -> Vec3:
    """Packed RGB8 int32 -> float Vec3, the reference's unpack semantics
    (pixel & 0xFF, >>8, >>16 each * 1/255 — win32_main.cpp:1736-1739)."""
    r = (word & 0xFF).astype(jnp.float32) * _INV255
    g = ((word >> 8) & 0xFF).astype(jnp.float32) * _INV255
    b = ((word >> 16) & 0xFF).astype(jnp.float32) * _INV255
    return Vec3(r, g, b)


def sample_texture(scene: Scene, layer: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """Bilinear-wrap sample. ``layer`` is the 0-based texture layer per lane,
    (u, v) are texel-space coordinates per lane."""
    w = scene.tex_w[layer]
    h = scene.tex_h[layer]
    u = jnp.abs(u)
    v = jnp.abs(v)
    x1 = u.astype(jnp.int32)
    y1 = v.astype(jnp.int32)
    s = jnp.clip(u - x1.astype(u.dtype), 0.0, 1.0)
    t = jnp.clip(v - y1.astype(v.dtype), 0.0, 1.0)
    x1 = x1 % w
    x2 = (x1 + 1) % w
    y1 = y1 % h
    y2 = (y1 + 1) % h

    base = layer * (scene.tex_hmax * scene.tex_wmax)

    def fetch(yy, xx):
        return _unpack(scene.tex_packed[base + yy * scene.tex_wmax + xx])

    c11, c12 = fetch(y1, x1), fetch(y1, x2)
    c21, c22 = fetch(y2, x1), fetch(y2, x2)
    return _bilerp_vec3(c11, c12, c21, c22, s, t)


def _bilerp_vec3(c11: Vec3, c12: Vec3, c21: Vec3, c22: Vec3, s, t) -> Vec3:
    """Bilinear blend of four Vec3 corners — the exact f32 expression of
    SampleTexture's blend (win32_main.cpp:1699-1708), shared by the XLA
    gather path and the Pallas windowed path so both are bit-identical."""
    top = Vec3(
        (1 - s) * c11.x + s * c12.x,
        (1 - s) * c11.y + s * c12.y,
        (1 - s) * c11.z + s * c12.z,
    )
    bot = Vec3(
        (1 - s) * c21.x + s * c22.x,
        (1 - s) * c21.y + s * c22.y,
        (1 - s) * c21.z + s * c22.z,
    )
    return Vec3(
        (1 - t) * top.x + t * bot.x,
        (1 - t) * top.y + t * bot.y,
        (1 - t) * top.z + t * bot.z,
    )


def bespoke_sample(scene: Scene, layer: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """BespokeSampleTexture: scale world-plane (u,v) by size/2 then sample."""
    w = scene.tex_w[layer].astype(u.dtype)
    h = scene.tex_h[layer].astype(v.dtype)
    return sample_texture(scene, layer, u * w * 0.5, v * h * 0.5)


def _unpack4(word: jnp.ndarray):
    """Packed RGBX8 int32 -> (r, g, b, x) floats. The >>24 byte survives the
    int32 sign because & 0xFF masks the sign-extension bits."""
    r = (word & 0xFF).astype(jnp.float32) * _INV255
    g = ((word >> 8) & 0xFF).astype(jnp.float32) * _INV255
    b = ((word >> 16) & 0xFF).astype(jnp.float32) * _INV255
    x = ((word >> 24) & 0xFF).astype(jnp.float32) * _INV255
    return r, g, b, x


def _combined_coords(scene: Scene, u: jnp.ndarray, v: jnp.ndarray):
    """Bespoke-scale uv -> bilinear corner coordinates + fractional weights
    (SampleTexture truncation/wrap semantics, win32_main.cpp:1680-1698)."""
    w, h = scene.tex_comb_w, scene.tex_comb_h
    u = jnp.abs(u * (w * 0.5))
    v = jnp.abs(v * (h * 0.5))
    x1 = u.astype(jnp.int32)
    y1 = v.astype(jnp.int32)
    s = jnp.clip(u - x1.astype(u.dtype), 0.0, 1.0)
    t = jnp.clip(v - y1.astype(v.dtype), 0.0, 1.0)
    x1 = x1 % w
    x2 = (x1 + 1) % w
    y1 = y1 % h
    y2 = (y1 + 1) % h
    return x1, y1, x2, y2, s, t


def _mip_select(scene: Scene, lod: jnp.ndarray):
    """Per-lane (row_off, tiles_x, word_off, w, h) for the mip level each
    lane selected — a select sweep over the static pyramid table
    (Scene.tex_mip_meta, ~10 levels): no vector shifts, no gathers, so it
    lowers under Mosaic unchanged."""
    meta = scene.tex_mip_meta
    out = []
    for j in range(5):
        acc = jnp.full(lod.shape, meta[0][j], jnp.int32)
        for l in range(1, len(meta)):
            acc = jnp.where(lod == l, jnp.int32(meta[l][j]), acc)
        out.append(acc)
    return tuple(out)


def _combined_coords_mip(scene: Scene, u: jnp.ndarray, v: jnp.ndarray,
                         lod: jnp.ndarray):
    """Mip-aware twin of :func:`_combined_coords`: same truncation/wrap
    semantics evaluated at each lane's pyramid level (sizes are pow2 —
    schema gates the pyramid on it — so wrap is a mask, not a modulo).
    The bespoke scale uses the LEVEL's size, exactly what the reference's
    BespokeSampleTexture would do handed mips[lod] (win32_main.cpp:1675)."""
    row_off, tiles_x, word_off, w, h = _mip_select(scene, lod)
    u = jnp.abs(u * (w.astype(u.dtype) * 0.5))
    v = jnp.abs(v * (h.astype(v.dtype) * 0.5))
    x1 = u.astype(jnp.int32)
    y1 = v.astype(jnp.int32)
    s = jnp.clip(u - x1.astype(u.dtype), 0.0, 1.0)
    t = jnp.clip(v - y1.astype(v.dtype), 0.0, 1.0)
    wm, hm = w - 1, h - 1
    x1 = x1 & wm
    x2 = (x1 + 1) & wm
    y1 = y1 & hm
    y2 = (y1 + 1) & hm
    return x1, y1, x2, y2, s, t, row_off, tiles_x, word_off, w


def bespoke_sample_combined_mip(scene: Scene, u: jnp.ndarray,
                                v: jnp.ndarray, lod: jnp.ndarray):
    """XLA-driver mip fetch: flat gathers from the concatenated word
    pyramid (level 0 leads, so lod==0 reads the exact mip-0 words)."""
    x1, y1, x2, y2, s, t, _, _, word_off, w = \
        _combined_coords_mip(scene, u, v, lod)

    def corners(plane):
        return (plane[word_off + y1 * w + x1],
                plane[word_off + y1 * w + x2],
                plane[word_off + y2 * w + x1],
                plane[word_off + y2 * w + x2])

    return _blend_combined(corners(scene.tex_comb_a),
                           corners(scene.tex_comb_b), s, t)


def _blend_combined(wa, wb, s, t):
    """Bilinear blend of the 4 corner word-pairs. ``wa``/``wb`` are
    (c11, c12, c21, c22) packed A/B words. Shared verbatim by the XLA
    gather path and the Pallas windowed path so both are bit-identical
    to the oracle. Returns (albedo Vec3, metalness, roughness, normal Vec3)."""

    def bilerp(c11, c12, c21, c22):
        top = (1 - s) * c11 + s * c12
        bot = (1 - s) * c21 + s * c22
        return (1 - t) * top + t * bot

    def blend4(ws):
        ch = [_unpack4(w_) for w_ in ws]
        return tuple(bilerp(ch[0][i], ch[1][i], ch[2][i], ch[3][i])
                     for i in range(4))

    ar, ag, ab, met = blend4(wa)
    nr, ng, nb, rgh = blend4(wb)
    return Vec3(ar, ag, ab), met, rgh, Vec3(nr, ng, nb)


def bespoke_sample_combined(scene: Scene, u: jnp.ndarray, v: jnp.ndarray):
    """Fused bespoke sample of the canonical 4-map set (scene.tex_combined):
    ONE pair of gathers per bilinear corner decodes albedo+metalness and
    normal+roughness together — 8 gathers/bounce instead of 16. Bilinear
    math is the same expression per channel as sample_texture, so values
    are bit-identical to four separate fetches (and to the oracle).

    Returns (albedo Vec3, metalness, roughness, normal Vec3).
    """
    w = scene.tex_comb_w
    x1, y1, x2, y2, s, t = _combined_coords(scene, u, v)

    def corners(plane):
        c11 = plane[y1 * w + x1]
        c12 = plane[y1 * w + x2]
        c21 = plane[y2 * w + x1]
        c22 = plane[y2 * w + x2]
        return c11, c12, c21, c22

    return _blend_combined(corners(scene.tex_comb_a),
                           corners(scene.tex_comb_b), s, t)


def bespoke_sample_combined_windowed(scene: Scene, tab_ref, u, v, needs,
                                      return_words: bool = False, lod=None):
    """The Pallas-kernel twin of :func:`bespoke_sample_combined`.

    The VPU has no random-access load; the only vectorized lookup is
    tpu.dynamic_gather — a 128-entry LUT along lanes. ``tab_ref`` is the
    tiled table (Scene.tex_tile): one 128-word row per 8x8-texel tile with
    the A/B planes interleaved, so one row covers a full bilinear footprint
    unless it straddles a tile edge. The fetch iterates over the DISTINCT
    tiles touched by the block (data-dependent while_loop): min-reduce the
    outstanding tile ids, dynamic-slice that row, lane-LUT all four corners,
    mask-select the lanes it satisfies. Cost is ~0.4us per distinct tile
    (experiments/window_iter_micro.py); a 4096-lane block of world-1 rays
    touches a few hundred tiles (experiments/world1_stats.py) vs the ~33us
    XLA serial-gather floor for the same block.

    ``needs`` masks the lanes that sample at all: sky/emissive/untextured
    lanes contribute no tiles (a primary block looking at sky costs zero).
    Word values and blend are bit-identical to the XLA path. int32 masks
    throughout — bool while-carries crash Mosaic (experiments/bisect_crash).

    ``return_words=True`` returns the raw corner word tuples (wa, wb, s, t)
    instead of the blend — used by tests to pin the fetched words exactly.

    HISTORY (environment, not this code): under the CPU INTERPRET path
    with ``--xla_force_host_platform_device_count`` > 1, the round-2-era
    XLA:CPU miscompiled this loop when only the post-loop float blends
    were live — a small deterministic subset of lanes received a
    neighboring texel (~1e-2 errors). RESOLVED by the jax 0.9.0 upgrade:
    the standing repro (experiments/interpret_miscompile_repro.py,
    re-run 2026-08-19) shows max |diff| 1.2e-7 (pure fma-contraction
    rounding; raw words bit-exact), so the interpret-mode equivalence
    gates were tightened to the rounding scale. Compiled Mosaic on the
    real chip was always bit-exact vs a pure-numpy reference.
    """
    shape = u.shape
    if lod is None:
        tiles_x = scene.tex_tiles_x
        x1, y1, x2, y2, s, t = _combined_coords(scene, u, v)

        def tile_of(y, x):
            return (y >> 3) * tiles_x + (x >> 3)
    else:
        # mip path: per-lane level -> per-lane row offset + row pitch; the
        # iteration below is id-agnostic (any monotone visit order works),
        # so mixed-level blocks just interleave their levels' tile rows
        x1, y1, x2, y2, s, t, row_off, tiles_x_l, _, _ = \
            _combined_coords_mip(scene, u, v, lod)

        def tile_of(y, x):
            return row_off + (y >> 3) * tiles_x_l + (x >> 3)

    def off_of(y, x):
        return (((y & 7) << 3) | (x & 7)) << 1

    corners = ((y1, x1), (y1, x2), (y2, x1), (y2, x2))
    # lanes that never sample sit at the BIG sentinel and contribute no tiles
    BIG = jnp.int32(1 << 30)
    wins = [jnp.where(needs, tile_of(y, x), BIG) for (y, x) in corners]
    offs = [off_of(y, x) for (y, x) in corners]
    words = _windowed_words(tab_ref, wins, offs, shape, nwords=2)
    wa = tuple(w_[0] for w_ in words)
    wb = tuple(w_[1] for w_ in words)
    if return_words:
        return wa, wb, s, t
    return _blend_combined(wa, wb, s, t)


def _windowed_words(tab_ref, wins, offs, shape, nwords: int):
    """Distinct-row iteration core shared by every windowed fetch: visit
    the DISTINCT table rows named by ``wins`` (corner row ids per lane,
    any count; the 1<<30 sentinel marks lanes that fetch nothing),
    lane-LUT ``nwords`` consecutive words at each corner's lane offset,
    and return a len(wins)-tuple (per corner) of ``nwords``-tuples of
    gathered (R, 128) int32 words. ``tab_ref`` is a (rows, 128) VMEM ref
    (or plain array in XLA/interpret equivalence paths). int32 masks
    throughout — bool while-carries crash Mosaic
    (experiments/bisect_crash)."""
    import jax
    from jax.experimental import pallas as pl

    BIG = jnp.int32(1 << 30)
    n_rows = int(tab_ref.shape[0])
    # The loop's cost is SERIAL LATENCY per distinct row (the min-reduce
    # chain), not gather throughput. Splitting the block into one
    # independent chain per (8, 128) register tile lets Mosaic overlap C
    # reduce chains: each 8-row group iterates its own outstanding row
    # set, and total iterations drop toward max-per-group.
    C = shape[0] // 8 if (shape[0] % 8 == 0 and shape[0] > 8) else 1
    rows_per = shape[0] // C

    def chain_min(arr):
        """Per-8-row-group min, broadcast back to (R, 128)."""
        if C == 1:
            return jnp.broadcast_to(jnp.min(arr), shape)
        return jnp.concatenate(
            [jnp.broadcast_to(jnp.min(arr[c * rows_per:(c + 1) * rows_per]),
                              (rows_per, shape[1]))
             for c in range(C)], axis=0)

    # Rows are visited in increasing id order per chain, so no done-masks
    # are needed: a corner fires exactly when its row id equals its
    # chain's current tid, and the next tid is the min over ids strictly
    # greater. The next tid is computed BEFORE the gathers (software
    # pipelining): the serial dependency chain is then compare ->
    # chain-min only; the row slices and lane-LUT gathers hang off it
    # (~40% faster per tile, experiments/window_iter_micro.py).
    def nxt_tid(tid):
        cand = [jnp.where(w_ > tid, w_, BIG) for w_ in wins]
        m = cand[0]
        for c_ in cand[1:]:
            m = jnp.minimum(m, c_)
        return chain_min(m)

    def fetch_rows(tid_b):
        """One table row per chain (exhausted chains clamp to row 0 and
        match no lanes), stacked back to (R, 128)."""
        parts = []
        for c in range(C):
            tid_c = jnp.minimum(tid_b[c * rows_per, 0], n_rows - 1)
            parts.append(jnp.broadcast_to(
                tab_ref[pl.ds(tid_c, 1), :], (rows_per, shape[1])))
        return parts[0] if C == 1 else jnp.concatenate(parts, axis=0)

    def cond(c):
        return jnp.any(c[0] != BIG)

    def body(c):
        tid_b, accs = c
        nxt = nxt_tid(tid_b)
        row = fetch_rows(tid_b)
        new = []
        for w_, o, acc in zip(wins, offs, accs):
            # the != BIG guard keeps sentinel lanes zero after their chain
            # exhausts (tid parks at BIG while other chains still run)
            hit = (w_ == tid_b) & (w_ != BIG)
            new.append(tuple(
                jnp.where(hit, jnp.take_along_axis(row, o + k, axis=1), a)
                for k, a in enumerate(acc)))
        return nxt, tuple(new)

    zero = wins[0] * 0
    tid0 = nxt_tid(zero - 1)  # min over all row ids (ids are >= 0 > -1)
    init = (tid0, tuple(tuple(zero for _ in range(nwords))
                        for _ in range(len(wins))))
    _, words = jax.lax.while_loop(cond, body, init)
    return words


def bespoke_sample_stack_windowed(scene: Scene, tab_ref, layer, u, v,
                                  needs):
    """The Pallas-kernel twin of :func:`bespoke_sample` over the tiled
    general stack: scale the world-plane (u, v) by the per-lane layer's
    size/2 (the bespoke convention, win32_main.cpp:1675-1678) and sample.
    Same f32 expressions as the XLA path (w gathered vs swept — same
    values), so compiled results are bit-identical."""
    return sample_texture_stack_windowed(scene, tab_ref, layer, u, v,
                                         needs, bespoke=True)


def sample_texture_stack_windowed(scene: Scene, tab_ref, layer, u, v,
                                  needs, bespoke: bool = False):
    """The Pallas-kernel twin of :func:`sample_texture` for the general
    per-layer texture stack (every non-combined textured scene: mesh-UV
    texel lookups with ``bespoke=False``, planar material maps through
    :func:`bespoke_sample_stack_windowed`).

    ``tab_ref`` is the tiled stack (Scene.tex_stack_tile): one 128-word
    row per PAIR of horizontally adjacent 8x8-texel tiles (lanes 0-63
    the even tile, 64-127 the odd — no interleave, single RGB8 words).
    Per-lane layer metadata (row offset, row pitch, width, height)
    resolves by a select sweep over the static per-layer table
    (Scene.tex_stack_meta — same pattern as the mip select), and wrap is
    a pow2 mask (schema gates tex_stack_tiled on pow2 sizes; non-pow2
    stacks stay on the XLA drivers). Texel selection and blend are the
    exact expressions of sample_texture, so compiled results match the
    XLA gather path bit for bit. ``needs`` masks lanes that sample at
    all (untextured-material lanes contribute no rows)."""
    wins, offs, s, t = _stack_corners(scene, layer, u, v, needs, bespoke)
    words = _windowed_words(tab_ref, wins, offs, u.shape, nwords=1)
    c11, c12, c21, c22 = (_unpack(w_[0]) for w_ in words)
    return _bilerp_vec3(c11, c12, c21, c22, s, t)


def _stack_corners(scene: Scene, layer, u, v, needs, bespoke: bool):
    """Per-lane bilinear corner (row id, lane offset) lists + fractional
    weights over the tiled stack — the addressing half of
    sample_texture_stack_windowed, shared with the fused multi-point
    fetches (bespoke_height3_stack_windowed)."""
    shape = u.shape
    meta = scene.tex_stack_meta  # ((row_off, pitch, w, h), ...) per layer

    def sweep(j):
        acc = jnp.full(shape, meta[0][j], jnp.int32)
        for l in range(1, len(meta)):
            acc = jnp.where(layer == l, jnp.int32(meta[l][j]), acc)
        return acc

    row_off, pitch, w, h = (sweep(j) for j in range(4))
    if bespoke:
        # BespokeSampleTexture's uv_texels = uv * size * 0.5, in
        # bespoke_sample's exact association order; the wrap below
        # reuses the same swept w/h
        u = u * w.astype(u.dtype) * 0.5
        v = v * h.astype(v.dtype) * 0.5
    u = jnp.abs(u)
    v = jnp.abs(v)
    x1 = u.astype(jnp.int32)
    y1 = v.astype(jnp.int32)
    s = jnp.clip(u - x1.astype(u.dtype), 0.0, 1.0)
    t = jnp.clip(v - y1.astype(v.dtype), 0.0, 1.0)
    wm, hm = w - 1, h - 1
    x1 = x1 & wm
    x2 = (x1 + 1) & wm
    y1 = y1 & hm
    y2 = (y1 + 1) & hm

    def row_of(y, x):
        return row_off + (y >> 3) * pitch + (x >> 4)

    def off_of(y, x):
        return ((y & 7) << 3) | (x & 7) | (((x >> 3) & 1) << 6)

    corners = ((y1, x1), (y1, x2), (y2, x1), (y2, x2))
    BIG = jnp.int32(1 << 30)
    wins = [jnp.where(needs, row_of(y, x), BIG) for (y, x) in corners]
    offs = [off_of(y, x) for (y, x) in corners]
    return wins, offs, s, t


def bespoke_height3_stack_windowed(scene: Scene, tab_ref, layer, points,
                                   needs):
    """Fused 3-point bespoke height fetch for bump mapping (the forward
    difference samples h(p), h(p+eps_x), h(p+eps_y)): the points differ
    by 0.01 world units, so their bilinear footprints share almost every
    tile — ONE windowed iteration over all 12 corners pays the serial
    min-reduce chain once instead of three times per bounce. Returns the
    three height scalars (the .x channel), bit-identical to three
    bespoke_sample_stack_windowed(...).x calls: same corner words, and
    the scalar bilerp is exactly the x-channel expression of
    _bilerp_vec3."""
    all_wins, all_offs, sts = [], [], []
    for (u, v) in points:
        wins, offs, s, t = _stack_corners(scene, layer, u, v, needs,
                                          bespoke=True)
        all_wins += wins
        all_offs += offs
        sts.append((s, t))
    shape = points[0][0].shape
    words = _windowed_words(tab_ref, all_wins, all_offs, shape, nwords=1)
    out = []
    for k, (s, t) in enumerate(sts):
        c11, c12, c21, c22 = (
            (words[4 * k + j][0] & 0xFF).astype(jnp.float32) * _INV255
            for j in range(4))
        top = (1 - s) * c11 + s * c12
        bot = (1 - s) * c21 + s * c22
        out.append((1 - t) * top + t * bot)
    return tuple(out)
