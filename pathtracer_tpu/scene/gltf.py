"""Minimal GLB (glTF 2.0 binary) ingestion — the LoadGltf role.

Hand-rolled parser (no gltf library in the image) reproducing exactly what
the reference extracts via cgltf (win32_main.cpp:1454-1593):

- DFS over scene nodes via an explicit stack (push scene roots in order,
  pop LIFO, push children in order) — node ORDER is preserved because it
  determines material table order;
- node/mesh TRANSFORMS ARE IGNORED, as in the reference (positions are
  unpacked raw; cgltf_accessor_unpack_floats does not bake node matrices);
- triangles-only primitives; POSITION attribute + optional indices unpacked
  into a flat (T*3, 3) vertex array with one material index per vertex
  (mesh_t convention, ray.hpp:102-106);
- material: if the primitive has pbr_metallic_roughness and NO base-color
  texture, a new textureless material with albedo = base_color_factor.rgb
  is appended; otherwise the material index stays at the default 1 —
  which in world 5 is the sun's emissive material, a reference quirk kept
  as-is (win32_main.cpp:1504-1515).
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Tuple

import numpy as np

_GLB_MAGIC = 0x46546C67  # 'glTF'
_CHUNK_JSON = 0x4E4F534A
_CHUNK_BIN = 0x004E4942

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8,
    5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT2": 4, "MAT3": 9, "MAT4": 16}


def parse_glb(path: str) -> Tuple[dict, bytes]:
    """Split a .glb into (gltf json dict, binary blob)."""
    with open(path, "rb") as f:
        data = f.read()
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != _GLB_MAGIC:
        raise ValueError(f"{path}: not a GLB file")
    if version != 2:
        raise ValueError(f"{path}: unsupported GLB version {version}")
    off = 12
    doc: Optional[dict] = None
    blob = b""
    while off + 8 <= len(data):
        clen, ctype = struct.unpack_from("<II", data, off)
        payload = data[off + 8: off + 8 + clen]
        if ctype == _CHUNK_JSON:
            doc = json.loads(payload.decode("utf-8"))
        elif ctype == _CHUNK_BIN:
            blob = payload
        off += 8 + clen
    if doc is None:
        raise ValueError(f"{path}: missing JSON chunk")
    return doc, blob


def read_accessor(doc: dict, blob: bytes, accessor_idx: int) -> np.ndarray:
    """Unpack an accessor to (count, components) — cgltf_accessor_unpack_*."""
    acc = doc["accessors"][accessor_idx]
    ncomp = _TYPE_COUNTS[acc["type"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    count = acc["count"]
    bv = doc["bufferViews"][acc["bufferView"]]
    base = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = bv.get("byteStride", 0) or ncomp * np.dtype(dtype).itemsize
    elem_size = ncomp * np.dtype(dtype).itemsize
    if stride == elem_size:
        out = np.frombuffer(blob, dtype=dtype, count=count * ncomp, offset=base)
        out = out.reshape(count, ncomp)
    else:
        out = np.zeros((count, ncomp), dtype)
        for i in range(count):
            out[i] = np.frombuffer(blob, dtype=dtype, count=ncomp,
                                   offset=base + i * stride)
    if acc.get("normalized"):
        info = np.iinfo(dtype)
        out = out.astype(np.float32) / info.max
    return out


def load_glb_triangles(path: str, builder) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """LoadGltf (win32_main.cpp:1454-1593): returns (points (T*3,3) float32,
    mat_indices (T*3,) int32) appending any new materials to ``builder``.
    Returns (None, None) when the file is absent/unreadable (the reference
    silently no-ops on parse failure, win32_main.cpp:1464-1465)."""
    try:
        doc, blob = parse_glb(path)
    except (OSError, ValueError):
        return None, None

    points_out = []
    mats_out = []

    stack = []
    for scene in doc.get("scenes", []):
        for ni in scene.get("nodes", []):
            stack.append(ni)

    nodes = doc.get("nodes", [])
    meshes = doc.get("meshes", [])
    materials = doc.get("materials", [])

    while stack:
        ni = stack.pop()
        node = nodes[ni]
        if "mesh" in node:
            mesh = meshes[node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:  # triangles only
                    continue
                mat_idx = 1  # reference default (win32_main.cpp:1504)
                mi = prim.get("material")
                if mi is not None:
                    gmat = materials[mi]
                    pbr = gmat.get("pbrMetallicRoughness")
                    if pbr is not None and "baseColorTexture" not in pbr:
                        f = pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0])
                        mat_idx = builder.add_material(albedo=(f[0], f[1], f[2]))
                attrs = prim.get("attributes", {})
                if "POSITION" not in attrs:
                    continue
                pos = read_accessor(doc, blob, attrs["POSITION"]).astype(np.float32)
                if "indices" in prim:
                    idx = read_accessor(doc, blob, prim["indices"]).reshape(-1).astype(np.int64)
                    tri_pts = pos[idx]  # (3*ntris, 3)
                else:
                    tri_pts = pos[: (len(pos) // 3) * 3]
                points_out.append(tri_pts.reshape(-1, 3))
                mats_out.append(np.full((len(tri_pts),), mat_idx, np.int32))
        for child in node.get("children", []):
            stack.append(child)

    if not points_out:
        return None, None
    return np.concatenate(points_out, 0), np.concatenate(mats_out, 0)
