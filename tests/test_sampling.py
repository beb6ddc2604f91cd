"""Unit tests: samplers, PDFs, basis construction, BSDF terms."""

import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.ops import sampling as S
from pathtracer_tpu.ops import shade as B
from pathtracer_tpu.utils.vec import Vec3, dot, magnitude, to_stacked, vec3


def _uniforms(rng, n):
    return (jnp.asarray(rng.rand(n).astype(np.float32)),
            jnp.asarray(rng.rand(n).astype(np.float32)))


class TestSamplers:
    def test_cosine_hemisphere_unit_upper(self, rng):
        u1, u2 = _uniforms(rng, 1000)
        d = S.cosine_hemisphere(u1, u2)
        m = np.asarray(magnitude(d))
        np.testing.assert_allclose(m, 1.0, atol=1e-5)
        assert (np.asarray(d.z) >= 0).all()

    def test_cosine_distribution(self, rng):
        # E[cos theta] under p=cos/pi is 2/3
        u1, u2 = _uniforms(rng, 200_000)
        d = S.cosine_hemisphere(u1, u2)
        assert abs(float(np.asarray(d.z).mean()) - 2.0 / 3.0) < 5e-3

    def test_ggx_half_vector_smooth_is_normal(self, rng):
        u1, u2 = _uniforms(rng, 100)
        h = S.ggx_half_vector(u1, u2, jnp.zeros(100))
        # roughness 0 => a2=0 => cos(theta)=1 => +z exactly
        np.testing.assert_allclose(np.asarray(h.z), 1.0, atol=1e-6)

    def test_ggx_rough_spreads(self, rng):
        u1, u2 = _uniforms(rng, 10_000)
        h = S.ggx_half_vector(u1, u2, jnp.full(10_000, 1.0))
        assert float(np.asarray(h.z).mean()) < 0.95
        np.testing.assert_allclose(np.asarray(magnitude(h)), 1.0, atol=1e-5)

    def test_to_sphere_hits_sphere(self, rng):
        u1, u2 = _uniforms(rng, 1000)
        center = vec3(0.0, 0.0, 10.0)
        origin = vec3(0.0, 0.0, 0.0)
        d, valid = S.to_sphere(u1, u2, center, 2.0, origin)
        assert bool(np.asarray(valid).all())
        # all dirs inside cone: z >= cos_theta_max
        ctm = np.sqrt(1 - 4.0 / 100.0)
        assert (np.asarray(d.z) >= ctm - 1e-6).all()

    def test_to_sphere_inside_invalid(self, rng):
        u1, u2 = _uniforms(rng, 4)
        d, valid = S.to_sphere(u1, u2, vec3(0.0, 0.0, 0.0), 5.0, vec3(0.0, 0.0, 1.0))
        assert not bool(np.asarray(valid).any())


class TestBasis:
    def test_orthonormal(self, rng):
        w = Vec3(*(jnp.asarray(rng.randn(100).astype(np.float32)) for _ in range(3)))
        a, b, c = S.orthonormal_basis(w)
        for v in (a, b, c):
            np.testing.assert_allclose(np.asarray(magnitude(v)), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(a, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(b, c)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dot(a, c)), 0.0, atol=1e-5)

    def test_roundtrip(self, rng):
        w = vec3(0.3, -0.2, 0.9)
        a, b, c = S.orthonormal_basis(w)
        t = vec3(0.1, 0.2, 0.97)
        world = S.from_tangent(t, a, b, c)
        np.testing.assert_allclose(float(magnitude(world)),
                                   float(magnitude(t)), atol=1e-5)


class TestPdfs:
    def test_pdf_cosine(self):
        assert abs(float(S.pdf_cosine(vec3(0.0, 0.0, 1.0))) - 1.0 / np.pi) < 1e-6
        assert float(S.pdf_cosine(vec3(0.0, 0.0, -1.0))) == 0.0

    def test_pdf_to_sphere_solid_angle(self):
        center, origin = vec3(0.0, 0.0, 10.0), vec3(0.0, 0.0, 0.0)
        p = float(S.pdf_to_sphere(jnp.asarray(True), center, 2.0, origin))
        ctm = np.sqrt(1 - 4.0 / 100.0)
        expect = 1.0 / (2 * np.pi * (1 - ctm))
        np.testing.assert_allclose(p, expect, rtol=1e-5)
        assert float(S.pdf_to_sphere(jnp.asarray(False), center, 2.0, origin)) == 0.0

    def test_pdf_quad(self):
        # unit quad at distance 5, viewed head-on
        t = jnp.asarray(5.0)
        d = vec3(0.0, 0.0, -1.0)
        p = float(S.pdf_quad(t, jnp.asarray(True), d, vec3(1.0, 0.0, 0.0), vec3(0.0, 1.0, 0.0)))
        np.testing.assert_allclose(p, 25.0, rtol=1e-5)  # d^2/(cos*area) = 25/1
        # Non-unit area pins the fixed Jacobian: the reference's dead
        # PdfValueQuad divides by cos*area^2 (unnormalized-normal cosine,
        # win32_main.cpp:317-320) and would return 25/16 here, not 25/4.
        p = float(S.pdf_quad(t, jnp.asarray(True), d, vec3(2.0, 0.0, 0.0), vec3(0.0, 2.0, 0.0)))
        np.testing.assert_allclose(p, 25.0 / 4.0, rtol=1e-5)
        # Oblique 30-degree incidence on the same quad: cos = 1/2 doubles it.
        d30 = vec3(0.0, np.sqrt(3.0) / 2.0, -0.5)
        p = float(S.pdf_quad(t, jnp.asarray(True), d30, vec3(2.0, 0.0, 0.0), vec3(0.0, 2.0, 0.0)))
        np.testing.assert_allclose(p, 25.0 / 2.0, rtol=1e-5)

    def test_sample_to_quad_lands_on_quad(self, rng):
        # Directions from sample_to_quad, followed to the quad's plane, land
        # exactly at qp + u1*qu + u2*qv (uniform area sampling).
        u1, u2 = _uniforms(rng, 256)
        qp = vec3(-1.0, -1.0, 3.0)
        qu, qv = vec3(2.0, 0.0, 0.0), vec3(0.0, 2.0, 0.0)
        o = vec3(0.3, -0.2, 0.0)
        d = S.sample_to_quad(u1, u2, qp, qu, qv, o)
        # plane z=3: t = (3 - o.z) / d.z; landing xy must match the sample
        t = (3.0 - 0.0) / np.asarray(d.z)
        x = 0.3 + t * np.asarray(d.x)
        y = -0.2 + t * np.asarray(d.y)
        np.testing.assert_allclose(x, -1.0 + 2.0 * np.asarray(u1), atol=1e-5)
        np.testing.assert_allclose(y, -1.0 + 2.0 * np.asarray(u2), atol=1e-5)

    def test_pdf_quad_integrates_to_solid_angle(self):
        # For directions drawn by sample_to_quad (uniform on the quad's
        # area), E[1 / pdf_quad(L)] equals the quad's solid angle — the
        # defining property of an area->solid-angle density. Checked
        # against the closed form for a rectangle seen from a point on its
        # perpendicular axis: 4*atan(ab / sqrt(1+a^2+b^2)), a,b = half-
        # extents / height. The reference's unnormalized-normal bug fails
        # this by the factor area (= 6 here).
        from pathtracer_tpu.ops.intersect import ray_planar_quad
        from pathtracer_tpu.scene.schema import MIN_HIT_DISTANCE
        h, au, av = 4.0, 3.0, 2.0  # height, full extents
        qp = vec3(-au / 2.0, -av / 2.0, h)
        qu, qv = vec3(au, 0.0, 0.0), vec3(0.0, av, 0.0)
        o = vec3(0.0, 0.0, 0.0)
        n = 96
        g = (np.arange(n, dtype=np.float32) + 0.5) / n
        u1 = jnp.asarray(np.repeat(g, n))
        u2 = jnp.asarray(np.tile(g, n))
        import pathtracer_tpu.utils.vec as V
        L = V.normalize(S.sample_to_quad(u1, u2, qp, qu, qv, o), eps=1e-30)
        t, hit = ray_planar_quad(o, L, qp, qu, qv, min_hit=MIN_HIT_DISTANCE)
        p = np.asarray(S.pdf_quad(t, hit, L, qu, qv))
        assert (p > 0).all()
        alpha, beta = au / (2 * h), av / (2 * h)
        omega = 4.0 * np.arctan(alpha * beta / np.sqrt(1 + alpha**2 + beta**2))
        np.testing.assert_allclose((1.0 / p).mean(), omega, rtol=2e-3)

    def test_pdf_quad_matches_oracle_twin(self, rng):
        # The jax pdf_quad and the oracle's independent scalar twin agree on
        # random rays (including misses, where both return 0).
        from pathtracer_tpu.ops.intersect import ray_planar_quad
        from pathtracer_tpu.reference import cpu_oracle as O
        from pathtracer_tpu.scene.schema import MIN_HIT_DISTANCE
        qp = np.array([-1.0, -1.0, 3.0], np.float32)
        qu = np.array([2.0, 0.0, 0.0], np.float32)
        qv = np.array([0.0, 2.0, 0.0], np.float32)
        for _ in range(64):
            o = rng.randn(3).astype(np.float32)
            o[2] = 0.0
            d = rng.randn(3).astype(np.float32)
            ov = vec3(*[float(v) for v in o])
            dv = vec3(*[float(v) for v in d])
            t, hit = ray_planar_quad(ov, dv, vec3(*map(float, qp)),
                                     vec3(*map(float, qu)),
                                     vec3(*map(float, qv)),
                                     min_hit=MIN_HIT_DISTANCE)
            p_jax = float(S.pdf_quad(t, hit, dv, vec3(*map(float, qu)),
                                     vec3(*map(float, qv))))
            p_np = float(O.pdf_quad(o.astype(np.float32), d.astype(np.float32),
                                    qp, qu, qv))
            np.testing.assert_allclose(p_jax, p_np, rtol=1e-4, atol=1e-6)

    def test_burley(self):
        np.testing.assert_allclose(float(S.burley_alpha2(jnp.asarray(0.5))), 0.0625)


class TestBsdf:
    def test_schlick_limits(self):
        # grazing: (1-0)^5 = 1 -> full reflectance
        ks = B.schlick_metal(jnp.asarray(0.04), jnp.asarray(0.0),
                             jnp.asarray(0.0), vec3(1.0, 1.0, 1.0))
        np.testing.assert_allclose(to_stacked(ks), 1.0, atol=1e-6)
        # head-on: F0
        ks = B.schlick_metal(jnp.asarray(0.04), jnp.asarray(1.0),
                             jnp.asarray(0.0), vec3(1.0, 1.0, 1.0))
        np.testing.assert_allclose(to_stacked(ks), 0.04, atol=1e-6)

    def test_schlick_metal_tint(self):
        color = vec3(0.9, 0.6, 0.3)
        ks = B.schlick_metal(jnp.asarray(0.04), jnp.asarray(1.0),
                             jnp.asarray(1.0), color)
        np.testing.assert_allclose(to_stacked(ks), to_stacked(color), atol=1e-6)

    def test_hammon_range(self, rng):
        n = vec3(0.0, 0.0, 1.0)
        for r in (0.1, 0.5, 1.0):
            l = vec3(0.3, 0.0, 0.95)
            v = vec3(-0.3, 0.0, 0.95)
            g = float(B.hammon_masking_shadowing(n, l, v, jnp.asarray(r)))
            assert 0.0 < g <= 2.0

    def test_ggx_d_normalization_shape(self):
        n = vec3(0.0, 0.0, 1.0)
        d_at_n = float(B.ggx_d(n, n, jnp.asarray(0.5)))
        d_off = float(B.ggx_d(n, vec3(0.5, 0.0, 0.8660254), jnp.asarray(0.5)))
        assert d_at_n > d_off  # peaked at the normal

    def test_effectively_smooth(self):
        assert bool(B.effectively_smooth(jnp.asarray(0.005)))
        assert not bool(B.effectively_smooth(jnp.asarray(0.5)))

    def test_refraction_tir(self):
        # glass->air at grazing angle: total internal reflection
        d = vec3(0.99, 0.0, 0.141)
        n = vec3(0.0, 0.0, 1.0)
        _, ok = B.find_refraction_direction(d, n, jnp.asarray(1.5))
        assert not bool(ok)

    def test_refraction_straight_through(self):
        d = vec3(0.0, 0.0, -1.0)
        n = vec3(0.0, 0.0, 1.0)
        out, ok = B.find_refraction_direction(d, n, jnp.asarray(1.5))
        assert bool(ok)
        np.testing.assert_allclose(to_stacked(out), [0, 0, -1], atol=1e-5)


class TestParityHelpers:
    def test_uniform_hemisphere(self, rng):
        u1, u2 = _uniforms(rng, 50_000)
        d = S.uniform_hemisphere(u1, u2)
        np.testing.assert_allclose(np.asarray(magnitude(d)), 1.0, atol=1e-5)
        assert (np.asarray(d.z) >= 0).all()
        # E[z] = 1/2 for uniform hemisphere
        assert abs(float(np.asarray(d.z).mean()) - 0.5) < 5e-3

    def test_vec_parity_helpers(self):
        import jax.numpy as jnp
        from pathtracer_tpu.utils.vec import gaussian, lerp1, m2_inverse, smoothstep
        assert abs(float(lerp1(2.0, 4.0, 0.25)) - 2.5) < 1e-6
        assert abs(float(smoothstep(0.5)) - 0.5) < 1e-6
        assert float(smoothstep(0.0)) == 0.0 and float(smoothstep(1.0)) == 1.0
        g = float(gaussian(jnp.asarray(0.0), 0.5))
        assert g > 0  # peak value
        ok, (ia, ib, ic, id_) = m2_inverse(
            jnp.asarray(2.0), jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(4.0))
        assert bool(ok)
        assert abs(float(ia) - 0.5) < 1e-6 and abs(float(id_) - 0.25) < 1e-6
        ok, _ = m2_inverse(jnp.asarray(1.0), jnp.asarray(2.0),
                           jnp.asarray(2.0), jnp.asarray(4.0))
        assert not bool(ok)  # singular
