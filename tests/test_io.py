"""BMP writer/reader, texture system, GLB parser."""

import os
import struct

import numpy as np
import pytest

from pathtracer_tpu.io.bmp import packed_to_rgb, read_bmp, write_bmp
from pathtracer_tpu.scene import textures as T
from pathtracer_tpu.scene.gltf import load_glb_triangles, parse_glb
from pathtracer_tpu.scene.schema import WorldBuilder

MARIO = "/root/reference/res/mario.glb"


class TestBmp:
    def test_roundtrip(self, tmp_path, rng):
        img = rng.randint(0, 2**32, (16, 24), dtype=np.uint64).astype(np.uint32)
        p = str(tmp_path / "t.bmp")
        write_bmp(p, img)
        back = read_bmp(p)
        np.testing.assert_array_equal(img, back)

    def test_header_layout(self, tmp_path):
        # byte-for-byte contract with WriteDIBImage (win32_main.cpp:358-391)
        img = np.zeros((2, 3), np.uint32)
        p = str(tmp_path / "t.bmp")
        write_bmp(p, img)
        data = open(p, "rb").read()
        assert len(data) == 58 + 2 * 3 * 4
        assert data[:2] == b"BM"
        fsize, = struct.unpack_from("<I", data, 2)
        assert fsize == len(data)
        offset, = struct.unpack_from("<I", data, 10)
        assert offset == 58
        hsize, w, h = struct.unpack_from("<Iii", data, 14)
        assert (hsize, w, h) == (40, 3, 2)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        assert (planes, bpp) == (1, 32)

    def test_packed_to_rgb(self):
        p = np.array([[(255 << 24) | (10 << 16) | (20 << 8) | 30]], np.uint32)
        rgb = packed_to_rgb(p)
        assert rgb[0, 0].tolist() == [10, 20, 30]


class TestTextures:
    def test_mip_chain_decimation(self):
        tex = np.arange(16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
        chain = T.generate_mipmap_chain(tex)
        assert [c.shape[0] for c in chain] == [16, 8, 4, 2, 1]
        # even-texel decimation (SampleTexture at uv=(2x,2y) has s=t=0)
        np.testing.assert_array_equal(chain[1], tex[::2, ::2])

    def test_sample_texture_wrap_bilinear(self):
        tex = np.zeros((4, 4, 3), np.float32)
        tex[0, 0] = 1.0
        # exact texel
        np.testing.assert_allclose(T.sample_texture(tex, 0, 0), [1, 1, 1])
        # halfway to the next texel
        np.testing.assert_allclose(T.sample_texture(tex, 0.5, 0), [0.5, 0.5, 0.5])
        # wraps at the edge: uv=3.5 blends texel 3 and texel 0
        np.testing.assert_allclose(T.sample_texture(tex, 3.5, 0), [0.5, 0.5, 0.5])

    def test_bespoke_textures_deterministic(self):
        a = T.load_bespoke_textures()
        b = T.load_bespoke_textures()
        assert len(a) == 4
        for x, y in zip(a, b):
            assert x.shape[0] == x.shape[1]  # square
            np.testing.assert_array_equal(x, y)

    def test_real_roughness_png_loads(self):
        # the one rusty-metal map present in the reference mirror
        img = T.load_png("/root/reference/res/rusty-metal_roughness.png")
        if img is None:
            pytest.skip("reference res dir unavailable")
        assert img.ndim == 3 and img.shape[2] == 3
        assert 0.0 <= img.min() and img.max() <= 1.0


class TestGltf:
    def test_parse_glb(self):
        doc, blob = parse_glb(MARIO)
        assert "meshes" in doc and len(blob) > 0

    def test_mario_triangles(self):
        b = WorldBuilder()
        pts, mats = load_glb_triangles(MARIO, b)
        assert pts.shape == (2256, 3)           # 752 triangles
        assert mats.shape == (2256,)
        assert len(b.materials) == 6            # textureless base-color mats
        # vertices inside the reference world volume (WORLD_SIZE=5)
        assert pts.min() > -2.5 and pts.max() < 2.5

    def test_missing_file_is_noop(self):
        b = WorldBuilder()
        pts, mats = load_glb_triangles("/nonexistent.glb", b)
        assert pts is None and mats is None and len(b.materials) == 0


class TestGltfText:
    """Text .gltf coverage (cgltf parity: win32_main.cpp:1454-1593 accepts
    whatever cgltf parses — text documents, external .bin, data URIs,
    sparse accessors)."""

    def test_split_glb_roundtrips_mario(self, tmp_path):
        from pathtracer_tpu.scene.gltf import split_glb, load_gltf_triangles
        out = str(tmp_path / "mario.gltf")
        split_glb(MARIO, out)
        b_glb, b_txt = WorldBuilder(), WorldBuilder()
        pts_glb, mats_glb = load_glb_triangles(MARIO, b_glb)
        pts_txt, mats_txt = load_gltf_triangles(out, b_txt)
        np.testing.assert_array_equal(pts_glb, pts_txt)
        np.testing.assert_array_equal(mats_glb, mats_txt)
        assert [m.albedo for m in b_glb.materials] == \
               [m.albedo for m in b_txt.materials]

    def _doc_with_buffer(self, pos, idx=None, sparse=None):
        import base64 as b64
        blob = np.asarray(pos, np.float32).tobytes()
        views = [{"buffer": 0, "byteOffset": 0, "byteLength": len(blob)}]
        accessors = [{"bufferView": 0, "componentType": 5126,
                      "count": len(pos), "type": "VEC3"}]
        prim = {"attributes": {"POSITION": 0}}
        if sparse is not None:
            s_idx, s_val = sparse
            ib = np.asarray(s_idx, np.uint32).tobytes()
            vb = np.asarray(s_val, np.float32).tobytes()
            views.append({"buffer": 0, "byteOffset": len(blob),
                          "byteLength": len(ib)})
            views.append({"buffer": 0, "byteOffset": len(blob) + len(ib),
                          "byteLength": len(vb)})
            blob += ib + vb
            accessors[0]["sparse"] = {
                "count": len(s_idx),
                "indices": {"bufferView": 1, "componentType": 5125},
                "values": {"bufferView": 2},
            }
        doc = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{"mesh": 0}],
            "meshes": [{"primitives": [prim]}],
            "buffers": [{"byteLength": len(blob),
                         "uri": "data:application/octet-stream;base64,"
                                + b64.b64encode(blob).decode()}],
            "bufferViews": views,
            "accessors": accessors,
        }
        return doc

    def test_data_uri_buffer(self, tmp_path):
        from pathtracer_tpu.scene.gltf import load_gltf_triangles
        pos = np.arange(9, dtype=np.float32).reshape(3, 3)
        doc = self._doc_with_buffer(pos)
        p = str(tmp_path / "tri.gltf")
        import json
        with open(p, "w") as f:
            json.dump(doc, f)
        pts, mats = load_gltf_triangles(p, WorldBuilder())
        np.testing.assert_array_equal(pts, pos)
        assert (mats == 1).all()  # reference default material

    def test_sparse_accessor_overlay(self, tmp_path):
        from pathtracer_tpu.scene.gltf import load_gltf_triangles
        pos = np.zeros((6, 3), np.float32)
        new_rows = np.array([[9, 9, 9], [7, 7, 7]], np.float32)
        doc = self._doc_with_buffer(pos, sparse=([1, 4], new_rows))
        p = str(tmp_path / "sparse.gltf")
        import json
        with open(p, "w") as f:
            json.dump(doc, f)
        pts, _ = load_gltf_triangles(p, WorldBuilder())
        want = pos.copy()
        want[[1, 4]] = new_rows
        np.testing.assert_array_equal(pts, want)

    def test_external_bin_with_escaped_uri(self, tmp_path):
        from pathtracer_tpu.scene.gltf import load_gltf_triangles
        pos = np.arange(9, dtype=np.float32).reshape(3, 3)
        doc = self._doc_with_buffer(pos)
        blob = np.asarray(pos, np.float32).tobytes()
        (tmp_path / "my data.bin").write_bytes(blob)
        doc["buffers"] = [{"byteLength": len(blob), "uri": "my%20data.bin"}]
        p = str(tmp_path / "ext.gltf")
        import json
        with open(p, "w") as f:
            json.dump(doc, f)
        pts, _ = load_gltf_triangles(p, WorldBuilder())
        np.testing.assert_array_equal(pts, pos)


class TestCombinedTextureDetection:
    def test_canonical_set_detected(self):
        from pathtracer_tpu.scene.worlds import finalize_world
        s, _ = finalize_world(0, 8, 8)
        assert s.tex_combined and s.tex_comb_w == s.tex_comb_h > 1

    def test_non_canonical_indices_fall_back(self):
        import numpy as np
        b = WorldBuilder()
        b.add_material()  # sky
        for t in T.load_bespoke_textures():
            b.add_texture(t)
        # material references maps in a NON-canonical order -> no fast path
        b.add_material(albedo_idx=2, metalness_idx=1, roughness_idx=3,
                       normal_idx=4)
        s = b.finalize()
        assert not s.tex_combined

    def test_mixed_sizes_fall_back(self):
        import numpy as np
        b = WorldBuilder()
        b.add_material()
        b.add_texture(np.zeros((8, 8, 3), np.float32))
        b.add_texture(np.zeros((8, 8, 3), np.float32))
        b.add_texture(np.zeros((16, 16, 3), np.float32))
        b.add_texture(np.zeros((8, 8, 3), np.float32))
        b.add_material(albedo_idx=1, metalness_idx=2, roughness_idx=3,
                       normal_idx=4)
        s = b.finalize()
        assert not s.tex_combined
