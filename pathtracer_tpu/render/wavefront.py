"""Persistent-wavefront renderer: path regeneration for ~100% lane utilization.

The unrolled integrator (integrator.trace) pays the full lane width at every
bounce although paths terminate early — on the Cornell box the mean path
length is ~1.5 of 4 bounces, so ~60% of lane-bounch work is masked waste
(the SIMD analogue of the reference's "some threads finish all their texels
while others are still working" TODO, win32_main.cpp:193-194).

This driver assigns each lane one PIXEL and keeps it busy: when a lane's
path terminates it folds the path radiance into its accumulator and
immediately regenerates the primary ray of the SAME pixel's next sample,
inside one lax.while_loop. The loop runs until every lane exhausts its
sample budget — total iterations ~ spp * E[path length] instead of
spp * MAX_BOUNCE_COUNT.

Bit-identical results: randomness is a pure function of
(pixel, sample, bounce) (utils/prng.py) and each pixel's samples are
accumulated in the same order as the unrolled driver, so the accumulator
state matches render_chunk exactly (asserted in tests/test_wavefront.py).

Handles REGULAR/VARIANCE only (debug targets use the unrolled driver).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.intersect import intersect_scene
from ..scene.camera import Camera
from ..scene.schema import MAX_BOUNCE_COUNT, Scene
from ..utils import prng
from ..utils.vec import Vec3, hadamard, splat, where as vwhere
from . import raygen
from .integrator import russian_roulette, shade_bounce
from .renderer import AccumState, RenderConfig


class _WaveState(NamedTuple):
    s_rel: jnp.ndarray    # (N,) int32: sample offset within this chunk
    bounce: jnp.ndarray   # (N,) int32: 0 => lane needs a fresh primary ray
    o: Vec3
    d: Vec3
    thr: Vec3
    prad: Vec3            # current path radiance
    sum: Vec3
    sum_sq: Vec3
    count: jnp.ndarray
    nan_count: jnp.ndarray
    rays: jnp.ndarray


def _primary_rays(scene: Scene, camera: Camera, config: RenderConfig,
                  key, pixel_idx: jnp.ndarray, s: jnp.ndarray):
    """Primary ray for per-lane sample indices ``s`` (traced array)."""
    if camera.use_pinhole:
        i, j = s // config.pp, s % config.pp
        stream = prng.PathStream(
            jnp.broadcast_to(jnp.uint32(key), pixel_idx.shape),
            pixel_idx.astype(jnp.uint32), s.astype(jnp.uint32))
        jit_u = prng.jitter_uniforms_v(stream)
        return raygen.pinhole_rays(camera, config.width, config.height,
                                   config.pp, i, j, jit_u, pixel_idx)
    ray_index, ray_index2 = s // config.pp, s % config.pp
    lens_stream = prng.PathStream(
        jnp.broadcast_to(jnp.uint32(key), pixel_idx.shape),
        pixel_idx.astype(jnp.uint32), ray_index.astype(jnp.uint32))
    lens_u = prng.lens_uniforms_v(lens_stream)
    return raygen.thin_lens_rays(camera, config.width, config.height,
                                 config.pp, ray_index, ray_index2, lens_u,
                                 pixel_idx)


def render_chunk_wavefront(
    scene: Scene, camera: Camera, config: RenderConfig,
    key, s0: jnp.ndarray, n_samples: int, state: AccumState,
    pixel_idx: jnp.ndarray,
) -> AccumState:
    """Accumulate ``n_samples`` samples per pixel with path regeneration.
    Drop-in replacement for the sample-loop body of renderer.render_chunk."""
    n = pixel_idx.shape[0]
    shape = (n,)
    zeros = lambda: jnp.zeros(shape)
    zvec = lambda: Vec3(zeros(), zeros(), zeros())

    st = _WaveState(
        s_rel=jnp.zeros(shape, jnp.int32),
        bounce=jnp.zeros(shape, jnp.int32),
        o=zvec(), d=Vec3(zeros(), zeros(), jnp.ones(shape)),
        thr=splat((1.0, 1.0, 1.0), shape), prad=zvec(),
        sum=state.sum, sum_sq=state.sum_sq, count=state.count,
        nan_count=state.nan_count, rays=state.rays_cast,
    )

    def cond(st: _WaveState):
        return jnp.any(st.s_rel < n_samples)

    def body(st: _WaveState) -> _WaveState:
        done = st.s_rel >= n_samples
        active = ~done

        # --- regenerate fresh paths --------------------------------------
        regen = active & (st.bounce == 0)
        s_abs = s0 + st.s_rel
        po, pd = _primary_rays(scene, camera, config, key, pixel_idx, s_abs)
        o = vwhere(regen, po, st.o)
        d = vwhere(regen, pd, st.d)
        thr = vwhere(regen, splat((1.0, 1.0, 1.0), shape), st.thr)
        prad = vwhere(regen, zvec(), st.prad)

        # --- one bounce ----------------------------------------------------
        rays = st.rays + jnp.sum(active.astype(jnp.float32))
        if scene.has_mesh_uvs:
            from ..ops.intersect import intersect_scene_uv
            hit, uvx, uvy, uv_ok = intersect_scene_uv(scene, o, d)
            uv = (uvx, uvy, uv_ok)
        else:
            hit, uv = intersect_scene(scene, o, d), None
        stream = prng.PathStream(
            jnp.broadcast_to(jnp.uint32(key), shape),
            pixel_idx.astype(jnp.uint32), s_abs.astype(jnp.uint32))
        u = prng.bounce_uniforms_v(stream, st.bounce)
        out = shade_bounce(scene, o, d, hit, u,
                           just_importance=config.just_importance,
                           mip_scale=config.mip_scale, uv=uv)

        contrib = hadamard(thr, out.emit)
        prad = Vec3(
            jnp.where(active, prad.x + contrib.x, prad.x),
            jnp.where(active, prad.y + contrib.y, prad.y),
            jnp.where(active, prad.z + contrib.z, prad.z),
        )

        at_depth_limit = st.bounce >= MAX_BOUNCE_COUNT - 1
        cont = active & out.cont & ~at_depth_limit
        new_thr = hadamard(thr, out.weight)
        if config.use_russian_roulette:
            survive, rr_thr = russian_roulette(new_thr, u[4])
            rr_applies = st.bounce >= 1
            cont = cont & (survive | ~rr_applies)
            new_thr = vwhere(rr_applies, rr_thr, new_thr)

        path_end = active & ~cont

        # --- fold finished paths into the accumulator ----------------------
        bad = jnp.isnan(prad.x) | jnp.isnan(prad.y) | jnp.isnan(prad.z)
        ok_end = path_end & ~bad
        okf = ok_end.astype(jnp.float32)
        rx = jnp.where(ok_end, prad.x, 0.0)
        ry = jnp.where(ok_end, prad.y, 0.0)
        rz = jnp.where(ok_end, prad.z, 0.0)

        return _WaveState(
            s_rel=jnp.where(path_end, st.s_rel + 1, st.s_rel),
            bounce=jnp.where(path_end, 0, jnp.where(cont, st.bounce + 1, st.bounce)),
            o=vwhere(cont, out.hitpoint, o),
            d=vwhere(cont, out.L, d),
            thr=vwhere(cont, new_thr, thr),
            prad=prad,
            sum=Vec3(st.sum.x + rx, st.sum.y + ry, st.sum.z + rz),
            sum_sq=Vec3(st.sum_sq.x + rx * rx, st.sum_sq.y + ry * ry,
                        st.sum_sq.z + rz * rz),
            count=st.count + okf,
            nan_count=st.nan_count + jnp.sum((path_end & bad).astype(jnp.float32)),
            rays=rays,
        )

    st = jax.lax.while_loop(cond, body, st)
    return AccumState(
        sum=st.sum, sum_sq=st.sum_sq, count=st.count,
        nan_count=st.nan_count, rays_cast=st.rays,
        samples_done=state.samples_done + n_samples,
    )
