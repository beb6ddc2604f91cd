"""Sweep textured-block rows for the world-1 windowed fetch."""
import time
import jax.numpy as jnp

from pathtracer_tpu.render.renderer import RenderConfig, init_accum
from pathtracer_tpu.render import pallas_backend as pb
from pathtracer_tpu.scene.worlds import finalize_world
from pathtracer_tpu.utils import prng


def main():
    w, h, pp = 1280, 720, 4
    scene, cam = finalize_world(0, w, h)
    cfg = RenderConfig(width=w, height=h, pp=pp, seed=0)
    key = prng.base_key(0)
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)
    NS = 16
    for rows in (8, 16, 32):
        pb._BLOCK_ROWS_TEXTURED = rows
        pb.render_chunk_pallas.clear_cache()
        st = pb.render_chunk_pallas(scene, cam, cfg, key, jnp.int32(0), NS,
                                    init_accum(n), pix)
        float(st.rays_cast)
        t0 = time.perf_counter()
        st = pb.render_chunk_pallas(scene, cam, cfg, key, jnp.int32(NS), NS,
                                    init_accum(n), pix)
        rays = float(st.rays_cast)
        dt = time.perf_counter() - t0
        print(f"rows={rows}: {rays/dt/1e6:.1f} Mrays/s ({dt*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
