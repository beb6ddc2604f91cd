"""Mesh-UV textured materials — the reference's unrealized "load
materials with textures" TODO (win32_main.cpp:172): glTF baseColorTexture
+ TEXCOORD_0 ingestion (gltf.load_gltf_textured), winner-hit UV
interpolation (ops/intersect.intersect_scene_uv), and the
texel-modulates-albedo shading branch, golden-gated against the oracle."""

import io
import json
import struct

import numpy as np
import pytest

from pathtracer_tpu.render.renderer import RenderConfig, render_image
from pathtracer_tpu.reference.cpu_oracle import render_oracle
from pathtracer_tpu.scene.camera import define_camera
from pathtracer_tpu.scene.gltf import load_gltf_textured, load_gltf_triangles
from pathtracer_tpu.scene.schema import WorldBuilder


def _checker(n=8):
    c = np.indices((n, n)).sum(0) % 2
    tex = np.stack([c * (200 / 255.0) + 30 / 255.0] * 3, -1)
    tex[..., 2] *= 0.25
    return tex.astype(np.float32)


def _textured_glb(tmp_path, factor=(1.0, 1.0, 1.0)):
    """Two-triangle quad with TEXCOORD_0 + an embedded PNG texture."""
    from PIL import Image
    pos = np.array([[-2, 0, -1], [2, 0, -1], [2, 0, 3], [-2, 0, 3]],
                   np.float32)
    uv = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    png = io.BytesIO()
    Image.fromarray((_checker() * 255).round().astype(np.uint8)).save(
        png, format="PNG")
    png = png.getvalue()

    blob = pos.tobytes() + uv.tobytes() + idx.tobytes() + png
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
        {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": uv.nbytes},
        {"buffer": 0, "byteOffset": pos.nbytes + uv.nbytes,
         "byteLength": idx.nbytes},
        {"buffer": 0, "byteOffset": pos.nbytes + uv.nbytes + idx.nbytes,
         "byteLength": len(png)},
    ]
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0,
        }]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorTexture": {"index": 0},
            "baseColorFactor": list(factor) + [1.0],
        }}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": views,
        "buffers": [{"byteLength": len(blob)}],
    }
    js = json.dumps(doc).encode()
    js += b" " * (-len(js) % 4)
    blob += b"\0" * (-len(blob) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(blob))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(blob), 0x004E4942) + blob)
    p = str(tmp_path / "tex.glb")
    with open(p, "wb") as f:
        f.write(glb)
    return p


class TestGltfTextured:
    def test_loader_binds_texture_and_uvs(self, tmp_path):
        p = _textured_glb(tmp_path, factor=(0.5, 1.0, 0.25))
        b = WorldBuilder()
        b.add_material(emit=(0.1, 0.1, 0.1))
        b.add_material(emit=(5, 5, 5))
        pts, mats, uvs = load_gltf_textured(p, b)
        assert pts.shape == (6, 3) and uvs.shape == (6, 2)
        assert len(b.textures) == 1
        # vs the PNG's actual 8-bit payload (the checker's blue channel is
        # off the 8-bit grid and rounds at encode time)
        np.testing.assert_allclose(
            b.textures[0], np.round(_checker() * 255.0) / 255.0, atol=1e-7)
        m = b.materials[mats[0]]
        assert m.albedo_idx == 1  # bound to the loaded texture
        np.testing.assert_allclose(m.albedo, (0.5, 1.0, 0.25))
        np.testing.assert_allclose(uvs[:3], [[0, 0], [2, 0], [2, 2]])

    def test_uvs_scale_to_texel_space(self, tmp_path):
        """set_mesh converts glTF [0, 1] UVs to the texel-unit convention
        every sampler uses (SampleTexture wraps texel coords,
        win32_main.cpp:1680-1698): uv (2, 2) on the 8x8 checker must land
        at texel 16 — the texture tiles twice across the quad, not once
        across its first two texels."""
        p = _textured_glb(tmp_path)
        b = WorldBuilder()
        b.add_material(emit=(0.1, 0.1, 0.1))
        b.add_material(emit=(5, 5, 5))
        pts, mats, uvs = load_gltf_textured(p, b)
        b.set_mesh(pts, mats, uvs=uvs)
        np.testing.assert_allclose(b.tri_uvs[0], uvs[:3] * 8.0)
        scene = b.finalize()
        # device tables carry the scaled uv0 + edge deltas
        np.testing.assert_allclose(np.asarray(scene.tri_uv0u)[:2], [0.0, 0.0])
        np.testing.assert_allclose(np.asarray(scene.tri_uvdu1)[0], 16.0)

    def test_plain_loader_keeps_reference_quirk(self, tmp_path):
        """load_gltf_triangles on a textured doc must keep mat_idx = 1
        (the reference default, win32_main.cpp:1504) and load no image."""
        p = _textured_glb(tmp_path)
        b = WorldBuilder()
        b.add_material(emit=(0.1, 0.1, 0.1))
        b.add_material(emit=(5, 5, 5))
        pts, mats = load_gltf_triangles(p, b)
        assert pts.shape == (6, 3)
        assert (mats == 1).all()
        assert len(b.textures) == 0

    def test_end_to_end_matches_oracle(self, tmp_path):
        """Full pipeline: textured GLB -> WorldBuilder -> renderer vs the
        scalar oracle (which interpolates the same per-vertex UVs)."""
        p = _textured_glb(tmp_path, factor=(1.0, 0.9, 0.8))
        b = WorldBuilder()
        b.add_material(emit=(0.3, 0.35, 0.45))
        light = b.add_material(emit=(6.0, 5.5, 5.0))
        b.add_sphere((3, -3, 6), 1.0, light)
        pts, mats, uvs = load_gltf_textured(p, b)
        b.set_mesh(pts, mats, uvs=uvs)
        floor = b.add_material(albedo=(0.5, 0.45, 0.4), roughness=0.9)
        b.add_plane((0, 0, 1), 1.5, floor)
        scene = b.finalize()
        assert scene.has_mesh_uvs
        w, h, pp = 16, 12, 2
        cam = define_camera((0, -8, 1), (0, 0, 1), 35.0, w, h)
        cfg = RenderConfig(width=w, height=h, pp=pp, seed=3)
        img, _, _ = render_image(scene, cam, cfg)
        oracle = render_oracle(b, cam, w, h, pp, seed=3, world_kind=0)
        img = np.asarray(img)
        d = np.abs(img - oracle).max(axis=-1)
        assert np.median(d) < 1e-4, float(np.median(d))
        assert (d > 1e-2).mean() < 0.05, float((d > 1e-2).mean())
        # the checker must actually be visible (texture varies the image)
        assert img.std() > 0.01

    def test_kernel_support_gating(self, tmp_path):
        """Mesh-UV scenes ride the Pallas kernel when the tiled general
        stack qualifies (pow2 textures, VMEM cap); non-pow2 sizes fall
        back to the XLA drivers (schema gates tex_stack_tiled off). A
        texture bound to a non-triangle primitive keeps the bespoke
        planar fetches live but rides the kernel too (windowed stack)."""
        from pathtracer_tpu.render.pallas_backend import supports
        cfg = RenderConfig(width=8, height=8, pp=1)
        p = _textured_glb(tmp_path)
        b = WorldBuilder()
        b.add_material(emit=(0.1, 0.1, 0.1))
        b.add_material(emit=(5, 5, 5))
        pts, mats, uvs = load_gltf_textured(p, b)
        b.set_mesh(pts, mats, uvs=uvs)
        scene = b.finalize()
        assert scene.tex_mesh_only and scene.tex_stack_tiled
        assert supports(scene, cfg)
        # tile-pair rows: the 8x8 checker pads to one 8x16 pair row
        assert scene.tex_stack_tile.shape == (1, 128)
        assert scene.tex_stack_meta == ((0, 1, 8, 8),)

        # non-pow2 texture -> XLA fallback
        b2 = WorldBuilder()
        b2.add_material(emit=(0.1, 0.1, 0.1))
        b2.add_material(emit=(5, 5, 5))
        ti = b2.add_texture(np.full((6, 10, 3), 0.5, np.float32))
        m = b2.add_material(albedo=(1, 1, 1), albedo_idx=ti)
        b2.set_mesh(pts, np.full(len(pts), m, np.int32), uvs=uvs)
        s2 = b2.finalize()
        assert s2.has_mesh_uvs and not s2.tex_stack_tiled
        assert not supports(s2, cfg)

        # texture bound to a PLANE material: the bespoke planar fetches
        # stay live (not mesh-only), but they ride the windowed stack in
        # the kernel too — still supported
        b3 = WorldBuilder()
        b3.add_material(emit=(0.1, 0.1, 0.1))
        b3.add_material(emit=(5, 5, 5))
        pts3, mats3, uvs3 = load_gltf_textured(p, b3)
        b3.set_mesh(pts3, mats3, uvs=uvs3)
        ti3 = b3.add_texture(np.full((8, 8, 3), 0.5, np.float32))
        pm = b3.add_material(albedo=(1, 1, 1), albedo_idx=ti3)
        b3.add_plane((0, 0, 1), 1.5, pm)
        s3 = b3.finalize()
        assert s3.has_mesh_uvs and not s3.tex_mesh_only
        assert s3.tex_stack_tiled and supports(s3, cfg)

    def test_kernel_interpret_matches_xla(self, tmp_path):
        """The mesh-UV scene through the interpret-mode Pallas kernel
        (in-loop UV interpolation + windowed tiled-stack fetch) vs the XLA
        chunk. Not asserted bit-equal: the uv interpolation's mul+add
        chain contracts to fma differently between the two compilations
        (same class as the driver-agreement test below); gate on
        overwhelmingly-bit-equal with tiny residuals."""
        import jax.numpy as jnp
        from pathtracer_tpu.render.pallas_backend import (
            render_chunk_pallas, supports)
        from pathtracer_tpu.render.renderer import init_accum, render_chunk
        from pathtracer_tpu.utils import prng
        p = _textured_glb(tmp_path, factor=(1.0, 0.9, 0.8))
        b = WorldBuilder()
        b.add_material(emit=(0.3, 0.35, 0.45))
        light = b.add_material(emit=(6.0, 5.5, 5.0))
        b.add_sphere((3, -3, 6), 1.0, light)
        pts, mats, uvs = load_gltf_textured(p, b)
        b.set_mesh(pts, mats, uvs=uvs)
        floor = b.add_material(albedo=(0.5, 0.45, 0.4), roughness=0.9)
        b.add_plane((0, 0, 1), 1.5, floor)
        scene = b.finalize()
        w, h = 16, 12
        cfg = RenderConfig(width=w, height=h, pp=2, seed=3)
        assert supports(scene, cfg)
        cam = define_camera((0, -8, 1), (0, 0, 1), 35.0, w, h)
        key = prng.base_key(3)
        n = w * h
        ref = render_chunk(scene, cam, cfg, key, jnp.int32(0), 2,
                           init_accum(n))
        pal = render_chunk_pallas(scene, cam, cfg, key, jnp.int32(0), 2,
                                  init_accum(n),
                                  jnp.arange(n, dtype=jnp.int32),
                                  interpret=True)
        for ch in ("x", "y", "z"):
            a = np.asarray(getattr(ref.sum, ch))
            p_ = np.asarray(getattr(pal.sum, ch))
            d = np.abs(a - p_)
            assert (a == p_).mean() > 0.9, f"{ch}: {(a == p_).mean():.2%}"
            assert (d > 1e-2).mean() == 0.0, f"{ch}: flips {(d > 1e-2).mean()}"
        np.testing.assert_array_equal(np.asarray(ref.count),
                                      np.asarray(pal.count))

    def test_kernel_multi_layer_stack(self):
        """Two textures of DIFFERENT pow2 sizes (16x8 and 32x32) in one
        tiled stack: the per-lane layer metadata select sweep (row offset,
        pair pitch, wrap masks) must route each triangle's lanes to its
        own texture. XLA driver gates bit-exact vs the oracle; the
        interpret kernel gates at the fma-contraction tolerance."""
        import jax.numpy as jnp
        from pathtracer_tpu.render.pallas_backend import (
            render_chunk_pallas, supports)
        from pathtracer_tpu.render.renderer import init_accum, render_chunk
        from pathtracer_tpu.utils import prng
        rng = np.random.default_rng(0)
        b = WorldBuilder()
        b.add_material(emit=(0.3, 0.35, 0.45))
        light = b.add_material(emit=(6.0, 5.5, 5.0))
        b.add_sphere((3, -3, 6), 1.0, light)
        t1 = (np.round(rng.uniform(0, 1, (8, 16, 3)) * 255) / 255
              ).astype(np.float32)
        t2 = (np.round(rng.uniform(0, 1, (32, 32, 3)) * 255) / 255
              ).astype(np.float32)
        m1 = b.add_material(albedo=(1.0, 0.9, 0.8),
                            albedo_idx=b.add_texture(t1), roughness=0.7)
        m2 = b.add_material(albedo=(0.8, 1.0, 0.9),
                            albedo_idx=b.add_texture(t2), roughness=0.4)
        pts = np.array([[-2, 0, -1], [2, 0, -1], [2, 0, 3],
                        [-2, 0, -1], [2, 0, 3], [-2, 0, 3],
                        [-4, 1, -1], [-2.5, 1, -1], [-2.5, 1, 2]],
                       np.float32)
        mats = np.array([m1] * 6 + [m2] * 3, np.int32)
        uvs = np.array([[0, 0], [2, 0], [2, 2], [0, 0], [2, 2], [0, 2],
                        [0, 0], [1, 0], [1, 1]], np.float32)
        b.set_mesh(pts, mats, uvs=uvs)
        floor = b.add_material(albedo=(0.5, 0.45, 0.4), roughness=0.9)
        b.add_plane((0, 0, 1), 1.5, floor)
        scene = b.finalize()
        # layer 0: one 8x16 pair row; layer 1: 4 rows of 2 pairs
        assert scene.tex_stack_meta == ((0, 1, 16, 8), (1, 2, 32, 32))
        assert scene.tex_stack_tile.shape == (9, 128)
        w, h = 16, 12
        cfg = RenderConfig(width=w, height=h, pp=2, seed=3)
        assert supports(scene, cfg)
        cam = define_camera((0, -8, 1), (0, 0, 1), 35.0, w, h)
        img, _, _ = render_image(scene, cam, cfg)
        oracle = render_oracle(b, cam, w, h, 2, seed=3, world_kind=0)
        d = np.abs(np.asarray(img) - oracle).max(axis=-1)
        assert np.median(d) < 1e-4, float(np.median(d))
        key = prng.base_key(3)
        n = w * h
        ref = render_chunk(scene, cam, cfg, key, jnp.int32(0), 2,
                           init_accum(n))
        pal = render_chunk_pallas(scene, cam, cfg, key, jnp.int32(0), 2,
                                  init_accum(n),
                                  jnp.arange(n, dtype=jnp.int32),
                                  interpret=True)
        a, p_ = np.asarray(ref.sum.x), np.asarray(pal.sum.x)
        dd = np.abs(a - p_)
        assert (a == p_).mean() > 0.9 and dd.max() < 1e-3

    def test_malformed_files_no_op(self, tmp_path):
        """Truncated or byte-corrupted containers must silently no-op —
        the reference returns early when cgltf fails (win32_main.cpp:
        1464-1465) — including rolling back any materials/textures
        appended before the failure (a bad embedded image is discovered
        mid-walk)."""
        p = _textured_glb(tmp_path)
        data = open(p, "rb").read()
        rng = np.random.RandomState(0)
        cases = [data[:c] for c in (0, 4, 12, 20, 50, 100,
                                    len(data) // 2, len(data) - 40)]
        for _ in range(25):
            buf = bytearray(data)
            for _ in range(8):
                buf[rng.randint(20, len(buf))] = rng.randint(256)
            cases.append(bytes(buf))
        for i, payload in enumerate(cases):
            q = str(tmp_path / f"fuzz{i}.glb")
            with open(q, "wb") as f:
                f.write(payload)
            b = WorldBuilder()
            b.add_material(emit=(0.1, 0.1, 0.1))
            pts, mats, uvs = load_gltf_textured(q, b)  # must not raise
            if pts is None:
                assert len(b.materials) == 1 and len(b.textures) == 0, \
                    f"builder leak on case {i}"

    def test_cyclic_node_graph_no_ops(self, tmp_path):
        """A node-graph CYCLE (malformed input) must terminate as a
        silent no-op like every other malformed file — non-termination
        would escape the loader's exception-based contract (the visit
        budget raises into the catch-all)."""
        docs = [
            {"asset": {"version": "2.0"}, "scenes": [{"nodes": [0]}],
             "nodes": [{"children": [0]}]},  # self-loop
            {"asset": {"version": "2.0"}, "scenes": [{"nodes": [0]}],
             "nodes": [{"children": [1]}, {"children": [0]}]},  # 2-cycle
        ]
        for i, doc in enumerate(docs):
            p = str(tmp_path / f"cycle{i}.gltf")
            with open(p, "w") as f:
                json.dump(doc, f)
            b = WorldBuilder()
            b.add_material(emit=(0.1, 0.1, 0.1))
            pts, mats, uvs = load_gltf_textured(p, b)  # must return
            assert pts is None
            assert len(b.materials) == 1 and len(b.textures) == 0

    def test_node_transforms_baked(self, tmp_path):
        """apply_transforms bakes the node hierarchy's world matrices —
        the reference's 'instance transforms' TODO (win32_main.cpp:189):
        the same mesh instanced under two nodes (one TRS, one matrix,
        under a translating parent) lands at hand-computed positions;
        OFF keeps the reference's ignore-transforms parity."""
        pos = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        blob = pos.tobytes()
        doc = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [
                {"translation": [10, 0, 0], "children": [1, 2]},
                {"mesh": 0, "scale": [2, 2, 2]},
                # column-major matrix: translate by (0, 5, 0)
                {"mesh": 0, "matrix": [1, 0, 0, 0, 0, 1, 0, 0,
                                       0, 0, 1, 0, 0, 5, 0, 1]},
            ],
            "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
            "accessors": [{"bufferView": 0, "componentType": 5126,
                           "count": 3, "type": "VEC3"}],
            "bufferViews": [{"buffer": 0, "byteOffset": 0,
                             "byteLength": len(blob)}],
            "buffers": [{"byteLength": len(blob)}],
        }
        import base64
        doc["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                    + base64.b64encode(blob).decode())
        p = str(tmp_path / "inst.gltf")
        with open(p, "w") as f:
            json.dump(doc, f)
        from pathtracer_tpu.scene.gltf import load_gltf_textured as lgt
        b = WorldBuilder()
        b.add_material(emit=(0, 0, 0))
        b.add_material(emit=(1, 1, 1))
        pts, _, _ = lgt(p, b, apply_transforms=True)
        assert pts.shape == (6, 3)
        got = {tuple(np.round(v, 5)) for v in pts}
        expect = {tuple(v) for v in
                  np.concatenate([pos * 2 + [10, 0, 0],
                                  pos + [10, 5, 0]])}
        assert got == expect, (got, expect)
        # parity: transforms ignored by default
        pts_raw, _, _ = lgt(p, WorldBuilder())
        assert {tuple(v) for v in pts_raw} == {tuple(v) for v in pos}

    def test_wavefront_matches_unrolled_on_uv_scene(self, tmp_path):
        """Driver agreement on a UV scene. NOT asserted bit-equal: the uv
        interpolation's gather + mul + add chain contracts to fma
        differently between the unrolled and while-loop compilations
        (measured max diff 1 ulp on ~7% of pixels); the oracle golden is
        the absolute gate."""
        p = _textured_glb(tmp_path)
        b = WorldBuilder()
        b.add_material(emit=(0.3, 0.35, 0.45))
        light = b.add_material(emit=(6.0, 5.5, 5.0))
        b.add_sphere((3, -3, 6), 1.0, light)
        pts, mats, uvs = load_gltf_textured(p, b)
        b.set_mesh(pts, mats, uvs=uvs)
        scene = b.finalize()
        cam = define_camera((0, -8, 1), (0, 0, 1), 35.0, 16, 12)
        imgs = []
        for mode in ("unrolled", "wavefront"):
            cfg = RenderConfig(width=16, height=12, pp=2, seed=5, mode=mode)
            img, _, _ = render_image(scene, cam, cfg)
            imgs.append(np.asarray(img))
        np.testing.assert_allclose(imgs[0], imgs[1], atol=2e-7)


def _uv_mesh_builder(n, seed=7, tex_size=16):
    """Random n-triangle mesh with per-vertex UVs + a pow2 texture."""
    rng = np.random.RandomState(seed)
    b = WorldBuilder()
    b.add_material(emit=(0.3, 0.35, 0.45))
    light = b.add_material(emit=(6.0, 5.5, 5.0))
    b.add_sphere((6, -5, 9), 1.2, light)
    tex = (np.round(rng.rand(tex_size, tex_size, 3) * 255) / 255
           ).astype(np.float32)
    m = b.add_material(albedo=(0.9, 0.85, 0.8), roughness=0.8,
                       albedo_idx=b.add_texture(tex))
    base = (rng.rand(n, 1, 3) - 0.5) * 16.0
    tris = base + (rng.rand(n, 3, 3) - 0.5) * 1.0
    uvs = rng.rand(n * 3, 2).astype(np.float32) * 2.0
    b.set_mesh(tris.reshape(-1, 3).astype(np.float32),
               np.full((3 * n,), m, np.int32), uvs=uvs)
    return b


def _kernel_rays(rng, n=1024):
    from pathtracer_tpu.utils.vec import Vec3
    import jax.numpy as jnp
    o1 = [(rng.rand(n) - 0.5) * 24.0 for _ in range(3)]
    d_np = rng.randn(3, n).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
    rs = lambda a: jnp.asarray(np.asarray(a, np.float32).reshape(8, 128))
    return (Vec3(*(rs(x) for x in o1)), Vec3(*(rs(x) for x in d_np)))


class TestMeshUVKernelTiers:
    """The clustered (deferred-resolve) and streamed (parallel uv rows)
    kernel triangle tiers must agree with the brute UV loop: same winners
    (up to the precomputed-barycentric-form f32 rounding class that the
    non-UV cluster tests already accept) and matching interpolated UVs."""

    def _compare_tiers(self, scene):
        from pathtracer_tpu.ops import intersect as isect
        import jax.numpy as jnp
        from pathtracer_tpu.utils.vec import Vec3
        rng = np.random.RandomState(11)
        o, d = _kernel_rays(rng)
        isect._tracing_pallas_kernel = True
        try:
            hk, uk_x, uk_y, ok_k = isect.intersect_scene_uv(scene, o, d)
        finally:
            isect._tracing_pallas_kernel = False
        hb, ub_x, ub_y, ok_b = isect.intersect_scene_uv(scene, o, d)
        t_k, t_b = np.asarray(hk.t), np.asarray(hb.t)
        # same winner for (almost) all lanes: the t values may differ by
        # ulps between the two triangle-test forms
        close = np.isclose(t_k, t_b, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.999, float(close.mean())
        assert (np.asarray(ok_k) == np.asarray(ok_b))[close].all()
        sel = close & np.asarray(ok_b)
        assert sel.any()
        du = np.abs(np.asarray(uk_x) - np.asarray(ub_x))[sel]
        dv = np.abs(np.asarray(uk_y) - np.asarray(ub_y))[sel]
        # uv in texel units (<= 2*16 here); 1e-2 texels ~ f32 rounding of
        # the two barycentric forms
        assert np.median(du) < 1e-3 and np.median(dv) < 1e-3
        assert (du < 3e-2).mean() > 0.999 and (dv < 3e-2).mean() > 0.999

    def test_clustered_tier_matches_brute(self):
        scene = _uv_mesh_builder(200).finalize()
        assert scene.tri_clusters and not scene.tri_streamed
        assert scene.ctri_uv0u.shape[0] >= 200
        self._compare_tiers(scene)

    def test_streamed_tier_matches_brute(self):
        scene = _uv_mesh_builder(1500).finalize()
        assert scene.tri_streamed
        # default layout is cluster-field-major: 6 rows per cluster
        assert scene.stream_uv_cfm
        assert scene.mtri_uvpack.shape == (scene.n_stream_clusters * 6, 128)
        self._compare_tiers(scene)

    def test_streamed_rowpar_layout_matches_brute(self):
        """The row-parallel uv fallback (PT_NO_UV_CFM=1, also the
        leaf > 128 path) against brute — keeps the old layout tested."""
        import os
        os.environ["PT_NO_UV_CFM"] = "1"
        try:
            scene = _uv_mesh_builder(1500).finalize()
        finally:
            del os.environ["PT_NO_UV_CFM"]
        assert scene.tri_streamed and not scene.stream_uv_cfm
        assert scene.mtri_uvpack.shape == scene.mtri_pack.shape
        self._compare_tiers(scene)

    def test_uv_cfm_bit_equal_to_rowpar(self):
        """The cfm layout's once-per-cluster winner resolve must render
        BIT-EQUAL to the row-parallel per-row fetch: same winner, same
        interpolation expression order, only fetch placement differs."""
        import os
        import jax
        from pathtracer_tpu.render.renderer import (
            RenderConfig, init_accum, render_chunk, resolve,
        )
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        scenes = []
        for env in (None, "1"):
            if env:
                os.environ["PT_NO_UV_CFM"] = env
            try:
                scenes.append(_uv_mesh_builder(1500).finalize())
            finally:
                os.environ.pop("PT_NO_UV_CFM", None)
        assert scenes[0].stream_uv_cfm and not scenes[1].stream_uv_cfm
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        key = prng.base_key(9)
        imgs = []
        for sc in scenes:
            jax.clear_caches()
            cfg = RenderConfig(width=w, height=h, pp=pp, seed=9,
                               backend="pallas-interpret")
            st = render_chunk(sc, cam, cfg, key, np.int32(0), cfg.spp,
                              init_accum(w * h))
            imgs.append(np.asarray(resolve(st, cfg)))
        np.testing.assert_array_equal(imgs[0], imgs[1])

    def test_dma_uv_tier_bit_equal_to_resident(self):
        """PT_STREAM_DMA=1 forces the DMA tier on a mesh-UV scene: the uv
        rows double-buffer through their OWN scratch + semaphore pair.
        Same scene, same data, only residency changes — the interpret
        kernel renders must be BIT-EQUAL to the resident tier's."""
        import os
        import jax.numpy as jnp
        from pathtracer_tpu.render.pallas_backend import (
            render_chunk_pallas, supports)
        from pathtracer_tpu.render.renderer import init_accum
        from pathtracer_tpu.utils import prng
        w, h = 16, 8
        cfg = RenderConfig(width=w, height=h, pp=2, seed=4)
        n = w * h
        outs = []
        for force in (False, True):
            if force:
                os.environ["PT_STREAM_DMA"] = "1"
            try:
                scene = _uv_mesh_builder(1500).finalize()
            finally:
                if force:
                    del os.environ["PT_STREAM_DMA"]
            assert scene.tri_dma == force and scene.tex_stack_tiled
            assert supports(scene, cfg)
            from pathtracer_tpu.scene.camera import define_camera
            cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
            st = render_chunk_pallas(scene, cam, cfg, prng.base_key(4),
                                     jnp.int32(0), 2, init_accum(n),
                                     jnp.arange(n, dtype=jnp.int32),
                                     interpret=True)
            outs.append(st)
        np.testing.assert_array_equal(np.asarray(outs[0].sum.x),
                                      np.asarray(outs[1].sum.x))
        np.testing.assert_array_equal(np.asarray(outs[0].sum.z),
                                      np.asarray(outs[1].sum.z))
        np.testing.assert_array_equal(np.asarray(outs[0].count),
                                      np.asarray(outs[1].count))

    def test_uv_mesh_halves_the_resident_cap(self):
        """Mesh-UV scenes carry a PARALLEL uv-row table as large as the
        pack rows, doubling the kernel's resident VMEM footprint —
        finalize must send them to the DMA tier at STREAM_MAX//2 instead
        of STREAM_MAX (schema.py resident_cap)."""
        from pathtracer_tpu.scene import clusters as clu
        saved = clu.STREAM_MAX
        try:
            # 1500 tris > 1400//2: a UV mesh crosses the HALVED cap even
            # though it is under STREAM_MAX itself
            clu.STREAM_MAX = 1400
            assert _uv_mesh_builder(1500).finalize().tri_dma
            # 1500 tris <= 4096//2: under the halved cap -> resident
            clu.STREAM_MAX = 4096
            assert not _uv_mesh_builder(1500).finalize().tri_dma
        finally:
            clu.STREAM_MAX = saved

    def test_streamed_uv_render_matches_oracle(self):
        """End-to-end: a 1500-tri UV-textured mesh through the
        interpret-mode kernel (streamed records + parallel uv rows +
        windowed texel fetch) vs the scalar oracle."""
        from pathtracer_tpu.render.renderer import (
            RenderConfig as RC, init_accum, render_chunk, resolve)
        from pathtracer_tpu.scene.camera import define_camera
        from pathtracer_tpu.utils import prng
        b = _uv_mesh_builder(1500)
        scene = b.finalize()
        assert scene.tri_streamed and scene.tex_stack_tiled
        w, h, pp = 16, 8, 2
        cam = define_camera((0, -24, 2), (0, 0, 0), 35.0, w, h)
        cfg = RC(width=w, height=h, pp=pp, seed=2,
                 backend="pallas-interpret")
        st = render_chunk(scene, cam, cfg, prng.base_key(2), np.int32(0),
                          cfg.spp, init_accum(w * h))
        img = np.asarray(resolve(st, cfg))
        oracle = render_oracle(b, cam, w, h, pp, seed=2, world_kind=0)
        dmax = np.abs(img - oracle).max(axis=-1)
        assert np.median(dmax) < 1e-4, float(np.median(dmax))
        assert (dmax > 1e-2).mean() < 0.05, float((dmax > 1e-2).mean())
