"""World-1 texture fetch statistics: how many lane-bounces actually sample
textures, and how coherent their 128-texel windows are per 4096-lane block.

Decides the round-2 texture architecture (VERDICT #1).
"""
import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.render import raygen
from pathtracer_tpu.render.integrator import shade_bounce
from pathtracer_tpu.ops.intersect import intersect_scene
from pathtracer_tpu.utils import prng
from pathtracer_tpu.utils.vec import Vec3

W, H, PP = 1280, 720, 4  # 16 spp default workload's first sample
MAX_B = 4
BLOCK = 4096


def main():
    scene, camera = finalize_world(0, W, H)
    n = W * H
    pixel_idx = jnp.arange(n, dtype=jnp.int32)

    key = jnp.uint32(1234)
    stream = prng.PathStream(
        jnp.broadcast_to(key, (n,)), pixel_idx.astype(jnp.uint32),
        jnp.zeros((n,), jnp.uint32))
    jit_u = prng.jitter_uniforms_v(stream)
    o, d = raygen.pinhole_rays(camera, W, H, PP, jnp.int32(0), jnp.int32(0),
                               jit_u, pixel_idx)

    # per-bounce capture
    tex_w = 512
    print(f"world1: n_textures={scene.n_textures} combined={scene.tex_combined}"
          f" comb_w={scene.tex_comb_w}")

    @jax.jit
    def step(o, d, alive, bounce):
        hit = intersect_scene(scene, o, d)
        u = prng.bounce_uniforms_v(stream, bounce)
        out = shade_bounce(scene, o, d, hit, u)
        # which lanes fetched textures: surface hit with any texture map
        # (world 1: ground material has albedo_idx != 0)
        is_surf = ~out.hit_sky & ~out.hit_light
        needs = alive & is_surf
        # bespoke uv of the A-plane (y1,x1) corner
        hp = out.hitpoint
        u_t = jnp.abs(hp.x * (tex_w * 0.5))
        v_t = jnp.abs(hp.y * (tex_w * 0.5))
        x1 = u_t.astype(jnp.int32) % tex_w
        y1 = v_t.astype(jnp.int32) % tex_w
        flat = y1 * tex_w + x1
        cont = alive & out.cont
        return hit.mat, needs, flat, cont, out.hitpoint, out.L

    alive = jnp.ones((n,), bool)
    for b in range(MAX_B):
        mat, needs, flat, cont, hp, L = step(o, d, alive, b)
        needs_np = np.asarray(needs)
        flat_np = np.asarray(flat)
        alive_np = np.asarray(alive)
        n_alive = alive_np.sum()
        n_needs = needs_np.sum()
        # per-4096-block distinct windows (128-texel windows)
        wins = flat_np // 128
        distinct = []
        frac_needs = []
        for i in range(0, n, BLOCK):
            m = needs_np[i:i + BLOCK]
            if m.sum() == 0:
                distinct.append(0)
                frac_needs.append(0.0)
                continue
            distinct.append(len(np.unique(wins[i:i + BLOCK][m])))
            frac_needs.append(m.mean())
        distinct = np.array(distinct)
        print(f"bounce {b}: alive {n_alive} ({n_alive/n:.2f}), "
              f"textured-shades {n_needs} ({n_needs/max(n_alive,1):.2f} of alive)")
        print(f"   distinct windows/block: mean {distinct.mean():.0f} "
              f"p50 {np.percentile(distinct,50):.0f} "
              f"p90 {np.percentile(distinct,90):.0f} max {distinct.max()}")
        o, d, alive = hp, L, cont

    # material histogram at bounce 0 for reference
    print("bounce0 mat histogram:", np.bincount(np.asarray(mat)))


if __name__ == "__main__":
    main()
