"""Unit tests: vector math, color pipeline, PRNG discipline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracer_tpu.utils import vec
from pathtracer_tpu.utils.color import bgra_pack, linear_to_srgb, tonemap_aces
from pathtracer_tpu.utils import prng


def _rand_vec(rng, n=64):
    a = rng.randn(n, 3).astype(np.float32)
    return vec.from_stacked(jnp.asarray(a)), a


class TestVec:
    def test_ops_match_numpy(self, rng):
        va, a = _rand_vec(rng)
        vb, b = _rand_vec(rng)
        np.testing.assert_allclose(vec.to_stacked(va + vb), a + b, rtol=1e-6)
        np.testing.assert_allclose(vec.to_stacked(va - vb), a - b, rtol=1e-6)
        np.testing.assert_allclose(vec.to_stacked(-va), -a, rtol=1e-6)
        np.testing.assert_allclose(vec.to_stacked(va * 2.5), a * 2.5, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(vec.dot(va, vb)),
                                   (a * b).sum(-1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(vec.to_stacked(vec.cross(va, vb)),
                                   np.cross(a, b), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(vec.to_stacked(vec.hadamard(va, vb)),
                                   a * b, rtol=1e-6)

    def test_normalize(self, rng):
        va, a = _rand_vec(rng)
        n = vec.normalize(va)
        np.testing.assert_allclose(np.asarray(vec.magnitude(n)), 1.0, atol=1e-5)

    def test_cross_handedness(self):
        x = vec.vec3(1.0, 0.0, 0.0)
        y = vec.vec3(0.0, 1.0, 0.0)
        z = vec.cross(x, y)
        np.testing.assert_allclose(vec.to_stacked(z), [0, 0, 1], atol=1e-7)

    def test_lerp_clamp(self, rng):
        va, a = _rand_vec(rng)
        vb, b = _rand_vec(rng)
        np.testing.assert_allclose(vec.to_stacked(vec.lerp(va, vb, 0.25)),
                                   0.75 * a + 0.25 * b, rtol=1e-5, atol=1e-6)
        lo = vec.splat((0.0, 0.0, 0.0), (64,))
        hi = vec.splat((1.0, 1.0, 1.0), (64,))
        c = vec.to_stacked(vec.clamp(va, lo, hi))
        assert (np.asarray(c) >= 0).all() and (np.asarray(c) <= 1).all()

    def test_is_nan(self):
        v = vec.Vec3(jnp.asarray([0.0, np.nan]), jnp.asarray([0.0, 0.0]),
                     jnp.asarray([0.0, 0.0]))
        np.testing.assert_array_equal(np.asarray(vec.is_nan(v)), [False, True])


class TestColor:
    def test_linear_to_srgb_exact(self):
        # piecewise transfer, exact reference constants (ray_math.hpp:320-332)
        vals = np.array([0.0, 0.001, 0.0031308, 0.01, 0.5, 1.0, 2.0, -1.0], np.float32)
        got = np.asarray(linear_to_srgb(jnp.asarray(vals)))
        for v, g in zip(vals, got):
            L = min(max(float(v), 0.0), 1.0)
            expect = L * 12.92
            if L > 0.0031308:
                expect = 1.055 * L ** (1 / 2.4) - 0.055
            # float32 pow vs float64: a few ulps of slack
            assert abs(g - expect) < 1e-5, (v, g, expect)

    def test_tonemap_aces_reference_values(self):
        # ACES Narkowicz: x*(2.51x+0.03)/(0.4+x*(2.43x+0.59)), clamped
        for x in [0.0, 0.18, 1.0, 4.0]:
            c = vec.vec3(x, x, x)
            out = np.asarray(vec.to_stacked(tonemap_aces(c)))
            expect = min(max(x * (2.51 * x + 0.03) / (0.4 + x * (2.43 * x + 0.59)), 0.0), 1.0)
            np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)

    def test_bgra_pack(self):
        # In float32, sRGB(1.0) = 1.055f*1.0f - 0.055f = 0.99999994 < 1, so
        # truncation packs pure white as 254 — exactly what the reference's
        # powf + C-cast pipeline produces (ray_math.hpp:329, win32_main.cpp:1175).
        c = vec.vec3(1.0, 0.0, 1.0)
        p = int(np.asarray(bgra_pack(c)))
        assert p == (255 << 24) | (254 << 16) | (0 << 8) | 254

    def test_bgra_truncates_not_rounds(self):
        # C cast truncates: value 254.9 -> 254
        val = (254.9 / 255.0) ** 2.4  # picks a linear value whose sRGB*255 ~ 254.9
        c = vec.vec3(val, val, val)
        p = int(np.asarray(bgra_pack(c)))
        r = (p >> 16) & 0xFF
        assert r in (253, 254)  # never 255


class TestPrng:
    def test_deterministic_and_batch_invariant(self):
        key = prng.base_key(0)
        idx = jnp.arange(100, dtype=jnp.int32)
        k_all = prng.path_keys(key, idx, jnp.zeros(100, jnp.int32))
        u_all = np.stack([np.asarray(x) for x in prng.bounce_uniforms_v(k_all, 2)], -1)
        # same values regardless of batch decomposition
        k_half = prng.path_keys(key, idx[50:], jnp.zeros(50, jnp.int32))
        u_half = np.stack([np.asarray(x) for x in prng.bounce_uniforms_v(k_half, 2)], -1)
        np.testing.assert_array_equal(u_all[50:], u_half)

    def test_scalar_matches_vector(self):
        key = prng.base_key(7)
        pk = prng.path_key(key, jnp.asarray(13), jnp.asarray(5))
        u_scalar = np.asarray(prng.bounce_uniforms(pk, 1))
        ks = prng.path_keys(key, jnp.asarray([13], jnp.int32), jnp.asarray([5], jnp.int32))
        u_vec = np.asarray(prng.bounce_uniforms_v(ks, 1))[:, 0]
        np.testing.assert_array_equal(u_scalar, u_vec)

    def test_streams_distinct(self):
        key = prng.base_key(0)
        pk = prng.path_key(key, jnp.asarray(0), jnp.asarray(0))
        a = np.asarray(prng.jitter_uniforms(pk))
        b = np.asarray(prng.lens_uniforms(pk))
        c = np.asarray(prng.bounce_uniforms(pk, 0))
        assert not np.allclose(a, b)
        assert not np.allclose(a, c[:2])

    def test_uniformity(self):
        # PCG4D statistical sanity: mean ~ 0.5, var ~ 1/12, full range
        key = prng.base_key(0)
        ks = prng.path_keys(key, jnp.arange(100_000, dtype=jnp.int32), 0)
        u = np.asarray(prng.bounce_uniforms_v(ks, 0)).ravel()
        assert abs(u.mean() - 0.5) < 2e-3
        assert abs(u.var() - 1.0 / 12.0) < 1e-3
        assert u.min() < 1e-4 and u.max() > 1 - 1e-4
        assert (u >= 0).all() and (u < 1).all()
        # equidistribution: chi-square over 64 bins, ~6 sigma bound
        counts, _ = np.histogram(u, bins=64, range=(0, 1))
        expect = u.size / 64
        chi2 = ((counts - expect) ** 2 / expect).sum()
        assert chi2 < 64 + 6 * np.sqrt(2 * 64), chi2

    def test_no_adjacent_correlation(self):
        # adjacent pixels / samples / bounces must decorrelate
        key = prng.base_key(0)
        ks = prng.path_keys(key, jnp.arange(50_000, dtype=jnp.int32), 0)
        u0 = np.asarray(prng.bounce_uniforms_v(ks, 0)[2])
        u1 = np.asarray(prng.bounce_uniforms_v(ks, 1)[2])
        assert abs(np.corrcoef(u0, u1)[0, 1]) < 0.02
        assert abs(np.corrcoef(u0[:-1], u0[1:])[0, 1]) < 0.02  # pixel p vs p+1
        ks1 = prng.path_keys(key, jnp.arange(50_000, dtype=jnp.int32), 1)
        v0 = np.asarray(prng.bounce_uniforms_v(ks1, 0)[2])
        assert abs(np.corrcoef(u0, v0)[0, 1]) < 0.02  # sample s vs s+1


class TestNormalSampler:
    def test_moments_and_normality(self):
        """normal_from_uniforms (the RandomNormal role, ray_math.hpp:278-296)
        must produce N(0, stddev^2) from counter uniforms."""
        key = prng.base_key(3)
        pix = jnp.arange(100_000, dtype=jnp.int32)
        ks = prng.path_keys(key, pix, 0)
        u1, u2, *_ = prng.bounce_uniforms_v(ks, 0)
        x = np.asarray(prng.normal_from_uniforms(u1, u2, stddev=2.5))
        assert abs(x.mean()) < 0.03
        assert abs(x.std() - 2.5) < 0.03
        assert np.isfinite(x).all()
        # tail mass: |x| > 2 sigma should be ~4.55%
        frac = (np.abs(x) > 5.0).mean()
        assert 0.035 < frac < 0.056


class TestOraclePrngTwin:
    """The oracle's pure-numpy PCG4D (reference/cpu_oracle.py) must emit
    bit-identical streams to the device implementation (utils/prng.py) —
    this is what extends the golden gates to cover the device PRNG itself."""

    def test_all_streams_bit_identical(self):
        from pathtracer_tpu.reference import cpu_oracle as orc
        seed = 7
        key = prng.base_key(seed)
        pix = np.arange(10_000, dtype=np.uint32) * 13 + 5
        for s in (0, 1, 255):
            ks = prng.path_keys(key, jnp.asarray(pix.astype(np.int32)), s)
            for jax_u, np_u in (
                (prng.jitter_uniforms_v(ks),
                 orc.jitter_uniforms_np(seed, pix, s)),
                (prng.lens_uniforms_v(ks),
                 orc.lens_uniforms_np(seed, pix, s)),
            ):
                for a, b in zip(jax_u, np_u):
                    np.testing.assert_array_equal(np.asarray(a), b)
            for bounce in range(4):
                ja = prng.bounce_uniforms_v(ks, bounce)
                na = orc.bounce_uniforms_np(seed, pix, s, bounce)
                for a, b in zip(ja, na):
                    np.testing.assert_array_equal(np.asarray(a), b)
