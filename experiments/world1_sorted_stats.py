"""World-1 distinct-tile statistics UNDER the texel-sorted pixel order.

Where does the remaining texture latency come from after sorting pixels by
primary tile id (render/pallas_backend._texel_sort)? Prints distinct 8x8
tiles per lane block per bounce. Run from /root/repo.
"""
import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.render import raygen
from pathtracer_tpu.render.integrator import shade_bounce
from pathtracer_tpu.render.pallas_backend import _texel_sort
from pathtracer_tpu.render.renderer import RenderConfig
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.utils import prng

W, H, PP = 1280, 720, 4
MAX_B = 4


def run(block, sort):
    scene, camera = finalize_world(0, W, H)
    n = W * H
    pixel_idx = jnp.arange(n, dtype=jnp.int32)
    cfg = RenderConfig(width=W, height=H, pp=PP)
    if sort:
        perm = _texel_sort(scene, camera, cfg, pixel_idx)
        pixel_idx = pixel_idx[perm]

    key = jnp.uint32(1234)
    stream = prng.PathStream(
        jnp.broadcast_to(key, (n,)), pixel_idx.astype(jnp.uint32),
        jnp.zeros((n,), jnp.uint32))
    jit_u = prng.jitter_uniforms_v(stream)
    o, d = raygen.pinhole_rays(camera, W, H, PP, jnp.int32(0), jnp.int32(0),
                               jit_u, pixel_idx)

    tex_w = scene.tex_comb_w
    tiles_x = scene.tex_tiles_x
    alive = jnp.ones((n,), bool)
    print(f"--- block={block} sorted={sort}")
    for b in range(MAX_B):
        hit = intersect_scene(scene, o, d)
        u = prng.bounce_uniforms_v(stream, b)
        out = shade_bounce(scene, o, d, hit, u)
        is_surf = ~out.hit_sky & ~out.hit_light
        needs = np.asarray(alive & is_surf)
        hp = out.hitpoint
        x1 = (jnp.abs(hp.x * (tex_w * 0.5)).astype(jnp.int32) % tex_w)
        y1 = (jnp.abs(hp.y * (tex_w * 0.5)).astype(jnp.int32) % tex_w)
        tile = np.asarray((y1 >> 3) * tiles_x + (x1 >> 3))
        distinct, spans = [], []
        for i in range(0, n, block):
            m = needs[i:i + block]
            if m.any():
                tt = tile[i:i + block][m]
                distinct.append(len(np.unique(tt)))
                spans.append(int(tt.max()) - int(tt.min()) + 1)
            else:
                distinct.append(0)
                spans.append(0)
        distinct = np.array(distinct)
        spans = np.array(spans)
        n_alive = int(np.asarray(alive).sum())
        print(f"bounce {b}: alive {n_alive/n:.2f} textured {needs.sum()/max(n_alive,1):.2f} "
              f"tiles/block mean {distinct.mean():.0f} p90 {np.percentile(distinct,90):.0f} "
              f"max {distinct.max()} | span mean {spans.mean():.0f} "
              f"p50 {np.percentile(spans,50):.0f} p90 {np.percentile(spans,90):.0f} "
              f"linear<384 {(spans<384).mean():.2f}")
        alive = alive & out.cont
        o, d = out.hitpoint, out.L


if __name__ == "__main__":
    for sort in (False, True):
        run(2048, sort)
