"""Extended randomized renderer-vs-oracle audit (CPU, no TPU needed).

Usage: python experiments/oracle_fuzz_sweep.py [N_SEEDS] [BASE_SEED] [MODE]

tests/test_fuzz.py runs a handful of fixed seeds in CI; this sweep runs
N random scenes (default 40) through the full randomized FEATURE matrix —
glass (optionally dispersive), volumetric fog, Russian roulette, an
emissive NEE quad light, and (MODE "mesh"/"kernel") a random triangle
blob that exercises the clustered/deferred-resolve mesh tiers — and
gates each against the independent scalar oracle with the same robust
criterion the golden tests use (median |diff| < 1e-4, boundary-flip
fraction < 5%). MODE "kernel" additionally renders each kernel-supported
scene through the interpret-mode Pallas kernel and gates it against the
XLA image at the documented tolerance. Prints one line per seed and a
final PASS/FAIL summary; exits nonzero on any miss. Meant to run once
per round as a background correctness audit.
"""
import sys
import time

import numpy as np

n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 40
base = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
mode = sys.argv[3] if len(sys.argv) > 3 else "plain"

from pathtracer_tpu import RenderConfig, render_image
from pathtracer_tpu.reference.cpu_oracle import render_oracle
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.schema import WorldBuilder


def blob_mesh(rng, n_target):
    """A noisy tessellated sphere: a localized SURFACE mesh (the regime
    the cluster tiers are built for), n_target-ish triangles."""
    nlat = max(3, int(np.sqrt(n_target / 4.0)))
    nlon = 2 * nlat
    th = np.linspace(0, np.pi, nlat + 1)
    ph = np.linspace(0, 2 * np.pi, nlon + 1)
    r = 0.8 + 0.5 * rng.rand()
    P = np.zeros((nlat + 1, nlon + 1, 3), np.float32)
    P[..., 0] = np.outer(np.sin(th), np.cos(ph))
    P[..., 1] = np.outer(np.sin(th), np.sin(ph))
    P[..., 2] = np.outer(np.cos(th), np.ones_like(ph))
    noise = 1.0 + 0.25 * rng.rand(nlat + 1, 1, 1)
    noise[:, -1] = noise[:, 0]  # keep the seam closed
    P *= r * noise
    P += rng.uniform(-2, 2, 3).astype(np.float32)
    out = []
    for i in range(nlat):
        for j in range(nlon):
            a, b, c, d = P[i, j], P[i + 1, j], P[i + 1, j + 1], P[i, j + 1]
            out.append([a, b, c])
            out.append([a, c, d])
    return np.asarray(out, np.float32)


def random_world(seed):
    """A random scene + feature set. Returns (builder, feature string)."""
    rng = np.random.RandomState(seed)
    feats = []
    b = WorldBuilder()
    b.add_material(emit=tuple(rng.rand(3) * (rng.rand() < 0.7)))  # sky
    light = b.add_material(albedo=(0, 0, 0),
                           emit=tuple(2 + 20 * rng.rand(3)))
    b.add_sphere(rng.uniform(-3, 3, 3) + (0, 0, 4),
                 0.5 + rng.rand(), light)

    for _ in range(rng.randint(2, 7)):
        kind = rng.randint(3)
        smooth = rng.rand() < 0.4
        m = b.add_material(
            albedo=tuple(rng.rand(3)),
            metalness=float(rng.rand() * (rng.rand() < 0.5)),
            metal_color=tuple(rng.rand(3)),
            roughness=0.0 if smooth else float(rng.rand()),
            ior=float(1.0 + 0.5 * rng.rand()),
        )
        if kind == 0:
            b.add_sphere(rng.uniform(-3, 3, 3), 0.3 + rng.rand(), m)
        elif kind == 1:
            n = rng.randn(3)
            n /= np.linalg.norm(n)
            b.add_plane(tuple(n), float(rng.uniform(-4, -2)), m)
        else:
            b.add_quad(rng.uniform(-3, 3, 3), rng.uniform(-2, 2, 3),
                       rng.uniform(-2, 2, 3), m)

    if rng.rand() < 0.5:  # glass sphere, sometimes dispersive
        disp = float(rng.rand() < 0.5) * float(0.01 + 0.03 * rng.rand())
        glass = b.add_material(
            albedo=tuple(0.9 + 0.1 * rng.rand(3)),
            ior=float(1.3 + 0.4 * rng.rand()),
            transmission=1.0, roughness=0.0, dispersion=disp)
        b.add_sphere(rng.uniform(-2, 2, 3), 0.5 + 0.7 * rng.rand(), glass)
        feats.append("glass" + ("+disp" if disp else ""))
    if rng.rand() < 0.4:  # homogeneous fog (kept thin: unbiased but noisy)
        b.set_fog(float(0.002 + 0.02 * rng.rand()),
                  albedo=tuple(0.6 + 0.4 * rng.rand(3)),
                  g=float(rng.uniform(-0.5, 0.7)))
        feats.append("fog")
    if rng.rand() < 0.4:  # emissive quad as the NEE target
        lm = b.add_material(albedo=(0, 0, 0),
                            emit=tuple(3 + 10 * rng.rand(3)))
        qi = b.add_quad((-1.0, -1.0, 6.0), (2.0, 0.0, 0.0),
                        (0.0, 2.0, 0.0), lm)
        b.set_quad_light(qi)
        feats.append("quadlight")
    if mode in ("mesh", "kernel") and rng.rand() < 0.7:
        n_target = int(rng.choice([80, 200, 450, 600]))
        tris = blob_mesh(rng, n_target)
        m = b.add_material(albedo=tuple(rng.rand(3)),
                           roughness=float(0.2 + 0.8 * rng.rand()))
        b.set_mesh(tris.reshape(-1, 3),
                   np.full((len(tris) * 3,), m, np.int32))
        feats.append(f"mesh{len(tris)}")
    rr = bool(rng.rand() < 0.5)
    if rr:
        feats.append("rr")
    return b, rr, ",".join(feats) or "plain"


failures = []
for i in range(n_seeds):
    seed = base + i
    if i and i % 6 == 0:
        # Every scene is a fresh compile; XLA:CPU's per-process compiler
        # state has OOM'd/segfaulted long single-CPU runs (see
        # tests/conftest.py) — drop executables periodically like the
        # suite does between modules.
        import jax
        jax.clear_caches()
    b, rr, feats = random_world(seed)
    w, h, pp = 16, 12, 2
    cam = define_camera((0, -8, 1), (0, 0, 0), 35.0, w, h)
    t0 = time.perf_counter()
    cfg = RenderConfig(width=w, height=h, pp=pp, seed=seed,
                       use_russian_roulette=rr)
    scene = b.finalize()
    img, _, _ = render_image(scene, cam, cfg)
    img = np.asarray(img)
    oracle = render_oracle(b, cam, w, h, pp, seed=seed, world_kind=0,
                           use_russian_roulette=rr)
    d = np.abs(img - oracle).max(axis=-1)
    med = float(np.median(d))
    flips = float((d > 1e-2).mean())
    ok = med < 1e-4 and flips < 0.05 and bool(np.isfinite(img).all())

    ktag = ""
    if mode == "kernel":
        from pathtracer_tpu.render.pallas_backend import supports
        cfg_k = RenderConfig(width=w, height=h, pp=pp, seed=seed,
                             use_russian_roulette=rr,
                             backend="pallas-interpret")
        if supports(scene, cfg_k):
            kimg = np.asarray(render_image(scene, cam, cfg_k)[0])
            kd = np.abs(kimg - img).max(axis=-1)
            k_ok = (float((kd > 1e-3).mean()) < 0.01
                    and float((kd > 0.1).mean()) < 0.001)
            ktag = f" kernel {'ok' if k_ok else 'FAIL'}"
            ok = ok and k_ok
        else:
            ktag = " kernel skip"
    if not ok:
        failures.append((seed, feats + ktag, med, flips))
    print(f"seed {seed:6d} [{feats:24s}] median {med:.2e} "
          f"flips {flips:.3f} {'ok' if ok else 'FAIL'}{ktag} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

print(f"\n{n_seeds - len(failures)}/{n_seeds} passed")
for seed, feats, med, flips in failures:
    print(f"  FAIL seed {seed} [{feats}] median {med:.2e} flips {flips:.3f}")
sys.exit(1 if failures else 0)
