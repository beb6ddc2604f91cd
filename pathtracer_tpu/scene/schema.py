"""Device-resident scene representation (flat SoA tables).

The reference stores the world as stretchy buffers of structs wired into a
global ``world_t`` (reference include/ray.hpp:36-162, win32_main.cpp:97-108,
2039-2045). The TPU build compiles a scene once on host into padded,
static-shape structure-of-arrays tables that live in HBM; the integrator
scans them with masked lanes instead of pointer-chasing.

Conventions preserved from the reference:
- material 0 is the sky (AddSky pushes it first, win32_main.cpp:2048-2051);
  a ray miss reports hitMatIndex 0 (win32_main.cpp:411-412);
- spheres[0] is the hardcoded important light for NEE
  (win32_main.cpp:683);
- material scalar defaults: alpha=1, ior=1, metalness=0, roughness=1,
  albedo=(0,0,0), emit=(0,0,0), texture indices 0 = "no texture"
  (include/ray.hpp:63-78 default member initializers);
- the ``aabbs`` table exists but is never populated by LoadWorld
  (win32_main.cpp:2039-2045) — kept for parity, always empty.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..utils.vec import Vec3, cross as _vec_cross, normalize as _vec_normalize


def _bake_quad_normals(u: Vec3, v: Vec3) -> Vec3:
    """normalize(cross(u, v)) over the quad table — the exact expression
    intersect_quads evaluated per bounce (win32_main.cpp:437-456 face
    normal), baked once at finalize. Elementwise over the table, so each
    quad's value is bit-identical to the old per-quad scalar compute."""
    return _vec_normalize(_vec_cross(u, v), eps=1e-30)

# Reference constants (win32_main.cpp:86-95).
MAX_BOUNCE_COUNT = 4
MIN_HIT_DISTANCE = 1e-4
QUAD_MIN_HIT_DISTANCE = 0.02  # Cornell-box hack, win32_main.cpp:446
TOLERANCE = 1e-9
WORLD_SIZE = 5.0
LEVELS = 6
N_AIR = 1.003
LIGHT_KIND_DIRECTIONAL = 0
LIGHT_KIND_POINT = 1
LIGHT_KIND_TRIANGLE = 2
FIXED_FOCAL_LENGTH = 0.098
MIN_ROUGHNESS = 0.01
F32_MAX = float(np.finfo(np.float32).max)

WORLD_DEFAULT = 0
WORLD_BRDF_TEST = 1
WORLD_CORNELL_BOX = 2
WORLD_RAYTRACING_ONE_WEEKEND = 3
WORLD_MARIO = 4
# Beyond the reference's five: Cornell box lit by an emissive QUAD, the
# scene the reference's dead PdfValueQuad (win32_main.cpp:301-322) was
# written for. Exercises the quad-light NEE mixture (Scene.quad_light).
WORLD_CORNELL_QUAD = 5
# Our seventh world (-w7): a procedurally UV-mapped sphere mesh with a
# generated pow2 texture — the mesh-UV textured-materials path (the
# reference's "load materials with textures" TODO realized) end-to-end
# through the streamed kernel tier, asset-free and deterministic.
WORLD_MESH_UV = 6
WORLD_KIND_COUNT = 7


def _pad(n: int, multiple: int = 16) -> int:
    """Pad table sizes to a multiple for friendlier TPU layouts (16 = the
    chunk width of ops/intersect._scan_table_chunked)."""
    return max(multiple, ((n + multiple - 1) // multiple) * multiple)


@struct.dataclass
class Scene:
    """All scene data as padded SoA device arrays. A JAX pytree: passing it
    through jit/shard_map/scan is free of host sync."""

    # --- materials (index 0 = sky) --------------------------------------
    mat_albedo: Vec3        # (M,) per component
    mat_emit: Vec3
    mat_metal_color: Vec3
    mat_metalness: jnp.ndarray
    mat_roughness: jnp.ndarray
    mat_ior: jnp.ndarray
    # Dielectric transmission fraction (see HostMaterial.transmission).
    mat_transmission: jnp.ndarray
    # Spectral dispersion half-spread (see HostMaterial.dispersion).
    mat_dispersion: jnp.ndarray
    # material_t.alpha (ray.hpp:63, default 1): defined by the reference but
    # never read by its render path; stored for struct parity.
    mat_alpha: jnp.ndarray
    mat_albedo_idx: jnp.ndarray     # int32, 0 = none else 1-based texture id
    mat_bump_idx: jnp.ndarray       # int32, 0 = none (see HostMaterial.bump_idx)
    mat_bump_scale: jnp.ndarray
    mat_metalness_idx: jnp.ndarray
    mat_roughness_idx: jnp.ndarray
    mat_normal_idx: jnp.ndarray

    # --- spheres (index 0 = NEE important light) -------------------------
    sph_center: Vec3
    sph_radius: jnp.ndarray
    sph_mat: jnp.ndarray
    sph_mask: jnp.ndarray   # bool: valid (non-padding) entries

    # --- quads ------------------------------------------------------------
    quad_point: Vec3
    quad_u: Vec3
    quad_v: Vec3
    quad_mat: jnp.ndarray
    quad_mask: jnp.ndarray

    # --- planes -----------------------------------------------------------
    pln_n: Vec3
    pln_d: jnp.ndarray
    pln_mat: jnp.ndarray
    pln_mask: jnp.ndarray

    # --- triangles (flat; traversed via the accel grid when present) ------
    tri_a: Vec3             # vertex A
    tri_u: Vec3             # B - A
    tri_v: Vec3             # C - A
    tri_mat: jnp.ndarray
    # Per-triangle texture coordinates (mesh-UV scenes, has_mesh_uvs):
    # uv of vertex A plus the edge deltas to B and C, so the winner's uv
    # interpolates directly from the hit barycentrics
    # (ops/intersect.intersect_scene_uv). (1,) dummies otherwise.
    tri_uv0u: jnp.ndarray
    tri_uv0v: jnp.ndarray
    tri_uvdu1: jnp.ndarray
    tri_uvdv1: jnp.ndarray
    tri_uvdu2: jnp.ndarray
    tri_uvdv2: jnp.ndarray
    tri_mask: jnp.ndarray

    # --- clustered (reordered) primitive copies ---------------------------
    # The fused kernel culls primitives per 4096-lane block: host-built
    # spatial clusters (scene/clusters.py) whose AABB slab test fails for
    # every lane are skipped via a real branch. These are the SAME
    # primitives reordered cluster-contiguously; originals stay in reference
    # order (spheres[0] must remain the NEE light, win32_main.cpp:683).
    csph_center: Vec3
    csph_radius: jnp.ndarray
    csph_mat: jnp.ndarray
    # Clustered triangles in PRECOMPUTED barycentric form: unit normal n
    # and plane offset d_coef give t directly; edge covectors e1/e2 with
    # offsets a0/b0 give alpha = e1.p - a0, beta = e2.p - b0 (algebraically
    # equal to ray_planar_triangle's cross-product form, fewer ops and no
    # per-test normalize on the scalar unit). Derivation: clusters.py
    # triangle_precompute.
    ctri_n: Vec3
    ctri_d: jnp.ndarray
    ctri_e1: Vec3
    ctri_e2: Vec3
    ctri_a0: jnp.ndarray
    ctri_b0: jnp.ndarray
    ctri_mat: jnp.ndarray
    # Cluster-ordered twins of the tri_uv* tables (mesh-UV scenes with
    # clusters): the kernel's clustered/deferred triangle path resolves
    # the winner's UV by windowed lane-LUT over these. (1,) dummies
    # otherwise (streamed scenes resolve from mtri_uvpack instead).
    ctri_uv0u: jnp.ndarray
    ctri_uv0v: jnp.ndarray
    ctri_uvdu1: jnp.ndarray
    ctri_uvdv1: jnp.ndarray
    ctri_uvdu2: jnp.ndarray
    ctri_uvdv2: jnp.ndarray

    # --- streamed mesh tier (ntri > clusters.STREAM_MIN) ------------------
    # Meshes too large to statically unroll in the kernel: per-cluster
    # AABB rows + 9-triangle packed record rows, both read by DYNAMIC row
    # index inside the kernel (code size O(1) in mesh size). When active
    # (tri_streamed), the ctri_* tables above hold the cluster-PADDED
    # record layout for deferred resolution. See clusters.py
    # pack_stream_clusters and ops/intersect streamed branch.
    mtri_bounds: jnp.ndarray      # (n_clusters, 128) f32: mn3 mx3 pad
    mtri_pack: jnp.ndarray        # (n_rows, 128) f32: 9 tris x 13 fields
    # Mesh-UV streamed scenes: UV rows PARALLEL to mtri_pack (row
    # c*rpc + r carries the 6 uv fields of the same 9 triangles at lane
    # base jj*6), loaded only when a row improved the running hit
    # (clusters.pack_stream_uv). (1, 128) dummy otherwise.
    mtri_uvpack: jnp.ndarray
    # DMA-tier dynamic parent tables (clusters.pack_parents): parent AABBs
    # as rows (VMEM) + (start, count) cluster ranges as int32 scalars
    # (SMEM in the kernel). The resident tier keeps parents as STATIC
    # immediates (stream_parents below) — measured faster at its scale;
    # static parents compile ~1.2 s each in Mosaic, so the DMA tier's
    # 256+ parents loop a dynamic fori instead (O(1) code size).
    mtri_parents: jnp.ndarray     # (n_parents, 128) f32: mn3 mx3 pad
    mtri_prange: jnp.ndarray      # (n_parents, 2) int32: start, count
    # Third hierarchy level (grandparents) for big DMA meshes: the dynamic
    # parent loop is O(n_parents) serial slab tests per block-bounce, and
    # at 500k-1M tris (512-1024+ parents) that linear term binds. When
    # n_parents >= clusters.GPARENT_MIN, parents regroup under grandparent
    # AABBs (clusters.build_parents applied to the parent list — the same
    # log-depth descent the reference octree gets from AdoptChildren,
    # win32_main.cpp:1395-1440) and the kernel loops grandparents,
    # descending into a parent subrange only when a lane can improve.
    mtri_gparents: jnp.ndarray    # (n_gparents, 128) f32: mn3 mx3 pad
    mtri_gprange: jnp.ndarray     # (n_gparents, 2) int32: start, count (PARENT units)

    # --- axis-aligned boxes (parity with world_t.aabbs; always empty) -----
    box_min: Vec3
    box_max: Vec3
    box_mat: jnp.ndarray
    box_mask: jnp.ndarray

    # --- explicit lights (light_t, ray.hpp:122-135) ------------------------
    # The reference defines directional/point/triangle lights but its only
    # use is commented out (AddSunDirectionalLight, win32_main.cpp:2053-2056);
    # lights are emissive GEOMETRY instead. Table kept for API parity; the
    # integrator, like RayCast, never reads it.
    light_kind: jnp.ndarray   # int32: 0 directional, 1 point, 2 triangle
    light_vec: Vec3           # direction (directional) or position (point)
    light_radiance: Vec3
    light_mask: jnp.ndarray

    # --- acceleration structure (uniform grid over triangles) -------------
    # CSR layout: cell c owns grid_tris[grid_cell_start[c] : +grid_cell_count[c]].
    grid_cell_start: jnp.ndarray   # (ncells,) int32
    grid_cell_count: jnp.ndarray   # (ncells,) int32
    grid_tris: jnp.ndarray         # (total_refs,) int32 triangle indices

    # --- textures (mip level 0 only; the reference samples mips[0]
    #     everywhere, win32_main.cpp:619-640,1601-1605). Texels are packed
    #     RGB8 in a flat int32 array: ONE gather per texel fetch instead of
    #     three float gathers (gathers dominate textured-scene cost).
    tex_packed: jnp.ndarray        # (K*Hmax*Wmax,) int32, r | g<<8 | b<<16
    tex_w: jnp.ndarray             # (K,) int32 actual widths
    tex_h: jnp.ndarray             # (K,) int32 actual heights
    # Combined fast path for the reference's canonical 4-map material set
    # (albedoIdx=1, metalnessIdx=2, roughnessIdx=3, normalIdx=4, all equal
    # size — LoadBespokeTextures, win32_main.cpp:1711-1724): two words per
    # texel halve the per-bounce gather count (8 instead of 16).
    tex_comb_a: jnp.ndarray        # (H*W,) int32: albedo.rgb | metalness.r<<24
    tex_comb_b: jnp.ndarray        # (H*W,) int32: normal.rgb | roughness.r<<24
    # Tiled layout of the SAME combined words for the Pallas kernel: one row
    # per 8x8-texel tile, A/B interleaved at word granularity:
    #   tex_tile[ty*tiles_x + tx, ((y&7)*8 + (x&7))*2 + plane]
    # Random access on the VPU only exists as a 128-wide lane LUT
    # (tpu.dynamic_gather), so the kernel fetch iterates over the DISTINCT
    # tiles touched by a lane block (render/pallas_backend.py); an 8x8
    # footprint minimizes distinct tiles across the bilinear corners.
    tex_tile: jnp.ndarray          # (tiles_y*tiles_x, 128) int32
    tex_hmax: int = struct.field(pytree_node=False, default=1)
    tex_wmax: int = struct.field(pytree_node=False, default=1)
    tex_combined: bool = struct.field(pytree_node=False, default=False)
    tex_comb_w: int = struct.field(pytree_node=False, default=1)
    tex_comb_h: int = struct.field(pytree_node=False, default=1)
    tex_tiles_x: int = struct.field(pytree_node=False, default=1)
    # Combined-set mip pyramid (built for square pow2 sets): per-level
    # (tile_row_offset, tiles_x, word_offset, w, h) statics indexing
    # tex_tile / tex_comb_* — level 0 leads, so mip-0-only consumers (the
    # reference-parity default) never notice. () = no pyramid. Opt-in
    # sampling via RenderConfig.mip_scale (the reference's unfinished
    # "mipmapping" TODO, GenerateMipmapChain win32_main.cpp:2307-2328).
    tex_mip_meta: tuple = struct.field(pytree_node=False, default=())
    # Tiled GENERAL texture stack (per-layer sizes, kernel path): one
    # 128-word row per PAIR of horizontally adjacent 8x8-texel tiles
    # (lanes 0-63 even tile, 64-127 odd; y-major within a tile). Serves
    # every non-combined in-kernel fetch — mesh-UV texel lookups AND the
    # bespoke planar fetches (albedo/metalness/roughness/normal/bump) —
    # via the windowed lane-LUT iteration
    # (ops/texture.sample_texture_stack_windowed). Built when every
    # texture is pow2 (wrap = mask in Mosaic) and the total rows fit the
    # VMEM cap. (1, 128) dummy otherwise.
    tex_stack_tile: jnp.ndarray = None
    # per-layer (row_off, pair_pitch, w, h) for the select sweep
    tex_stack_meta: tuple = struct.field(pytree_node=False, default=())
    tex_stack_tiled: bool = struct.field(pytree_node=False, default=False)
    # every textured material uses ONLY albedo_idx and is referenced only
    # by triangles: shade_bounce then skips the bespoke planar fetches
    # entirely (semantics-neutral — such lanes are always mesh-UV winners)
    tex_mesh_only: bool = struct.field(pytree_node=False, default=False)

    # --- static (compile-time) metadata -----------------------------------
    # Cluster descriptors for the packet-culling path: tuples of
    # (offset, count, bounds_min | None, bounds_max | None) into the
    # clustered tables above; bounds None = unconditional "huge" cluster.
    # Static so bounds bake into the kernel as immediates. Empty = no
    # clustering (small tables run the plain unrolled loops).
    sph_clusters: tuple = struct.field(pytree_node=False, default=())
    tri_clusters: tuple = struct.field(pytree_node=False, default=())
    # streamed mesh tier statics (see mtri_* above)
    tri_streamed: bool = struct.field(pytree_node=False, default=False)
    stream_leaf: int = struct.field(pytree_node=False, default=0)
    n_stream_clusters: int = struct.field(pytree_node=False, default=0)
    # DMA tier (ntri > clusters.STREAM_MAX, or PT_STREAM_DMA=1): the pack
    # rows stay in HBM; the kernel double-buffers each cluster's rows into
    # a 2-slot VMEM scratch with async copies. The XLA drivers ignore the
    # flag (XLA manages residency itself).
    tri_dma: bool = struct.field(pytree_node=False, default=False)
    # > 0 selects the dynamic parent loop (DMA tier); the resident tier
    # uses the static stream_parents tuple instead.
    n_stream_parents: int = struct.field(pytree_node=False, default=0)
    # > 0 adds the grandparent loop above the dynamic parents (DMA tier,
    # n_parents >= clusters.GPARENT_MIN; ranges in PARENT units)
    n_stream_gparents: int = struct.field(pytree_node=False, default=0)
    # Third culling level: per-row 9-tri AABBs ride the pack rows' spare
    # lanes (clusters.ROW_BOUNDS_LANE); the record loop branches past a
    # row when no lane can beat its slab entry. Pure pruning (bit-equal
    # results). Defaults on only at >= clusters.ROW_CULL_MIN tris — below
    # that the ~40-op slab test loses to just testing the 9 tris
    # (measured on-chip crossover, BENCH.md round 4). PT_ROW_CULL_MIN
    # overrides the threshold; PT_NO_ROW_CULL=1 disables for ablation.
    stream_row_cull: bool = struct.field(pytree_node=False, default=False)
    # Field-major ("outer") streamed layout (PT_FM_TIER=1): mtri_pack /
    # mtri_uvpack hold clusters.pack_stream_fm tiles instead of record
    # rows — pairs compute as (rays, 128) vector ops with triangles on
    # the lane axis (ops/intersect fm branch). Same hierarchy, bounds and
    # DMA machinery; row-cull n/a (no spare lanes).
    stream_fm: bool = struct.field(pytree_node=False, default=False)
    # mtri_uvpack holds the cluster-FIELD-MAJOR layout (6 rows/cluster,
    # lane = cluster-local tri index, clusters.pack_stream_uv_cfm): the
    # winner uv resolves once per descended cluster instead of per record
    # row. Auto when the leaf fits the lane axis (<= 128) and not fm;
    # PT_NO_UV_CFM=1 restores the row-parallel layout (ablation).
    stream_uv_cfm: bool = struct.field(pytree_node=False, default=False)
    # normalize(cross(u, v)) per quad, baked at finalize with the SAME jnp
    # expression intersect_quads used to evaluate per bounce (bit-identical
    # values); keeps the per-quad scalar cross/normalize chains out of the
    # kernel's sample loop (round-5 op-count pass). None only in
    # hand-built test Scenes predating the field.
    quad_n: Optional[Vec3] = None
    # Kernel-only plumbing for the DMA tier: render/pallas_backend fills
    # these with the VMEM scratch ref and DMA semaphore array inside the
    # kernel (None everywhere else — None flattens to no pytree leaves).
    stream_scratch: Optional[object] = None
    stream_sem: Optional[object] = None
    # Same plumbing for the mesh-UV parallel uv rows (own scratch +
    # semaphore pair so waits stay balanced with their copies).
    stream_uv_scratch: Optional[object] = None
    stream_uv_sem: Optional[object] = None
    # Two-level hierarchy over the streamed clusters: static
    # (start, count, mn3 | None, mx3 | None) parent descriptors in CLUSTER
    # units (clusters.build_parents). Parent bounds bake into the kernel as
    # immediates — all parent slab tests are straight-line vector code; only
    # hit parents descend into the dynamic per-cluster loop. Empty = flat
    # cluster sweep (small meshes).
    stream_parents: tuple = struct.field(pytree_node=False, default=())
    world_kind: int = struct.field(pytree_node=False, default=WORLD_DEFAULT)
    # World 4 forces cosine-only sampling (win32_main.cpp:654-655).
    just_cosine: bool = struct.field(pytree_node=False, default=False)
    # True iff any material has transmission > 0; static so opaque scenes
    # compile exactly the reference estimator with no dielectric code.
    any_transmissive: bool = struct.field(pytree_node=False, default=False)
    # True iff any transmissive material disperses; static so plain-glass
    # scenes compile the single-ior lobe unchanged.
    any_dispersive: bool = struct.field(pytree_node=False, default=False)
    # True iff any material carries a bump (height) map; static so
    # bump-free scenes compile the exact reference texture pipeline.
    any_bump: bool = struct.field(pytree_node=False, default=False)
    # True iff the mesh carries per-vertex texture coordinates
    # (WorldBuilder.set_mesh uvs / gltf.load_gltf_textured): the XLA
    # drivers then route intersection through intersect_scene_uv and the
    # winner's uv modulates the material albedo by its texture. Static so
    # uv-less scenes compile exactly the reference pipeline.
    has_mesh_uvs: bool = struct.field(pytree_node=False, default=False)
    # Index of the quad the NEE mixture targets, or -1 for the reference
    # default (spheres[0], win32_main.cpp:683). Static so sphere-light
    # scenes compile exactly the reference estimator; >= 0 swaps the
    # to-sphere term for the PdfValueQuad semantics (:301-322) the
    # reference defined but never wired up.
    quad_light: int = struct.field(pytree_node=False, default=-1)
    # Global homogeneous fog (WorldBuilder.set_fog — the reference's
    # unrealized "god rays and fog via volumetric light transport" TODO,
    # win32_main.cpp:159). Static so fog-free scenes compile exactly the
    # reference estimator with zero volume code. sigma_t = extinction,
    # fog_albedo = sigma_s/sigma_t per channel, fog_g = HG anisotropy.
    fog_sigma_t: float = struct.field(pytree_node=False, default=0.0)
    fog_albedo: tuple = struct.field(pytree_node=False,
                                     default=(1.0, 1.0, 1.0))
    fog_g: float = struct.field(pytree_node=False, default=0.0)
    n_spheres: int = struct.field(pytree_node=False, default=0)
    n_quads: int = struct.field(pytree_node=False, default=0)
    n_planes: int = struct.field(pytree_node=False, default=0)
    n_tris: int = struct.field(pytree_node=False, default=0)
    n_boxes: int = struct.field(pytree_node=False, default=0)
    n_materials: int = struct.field(pytree_node=False, default=0)
    # material fields whose column is ONE value across the real rows —
    # the lookup broadcasts row 0 instead of sweeping (bit-identical;
    # round-5 op-count pass, integrator._material_lookup)
    mat_const: tuple = struct.field(pytree_node=False, default=())
    n_textures: int = struct.field(pytree_node=False, default=0)
    grid_res: int = struct.field(pytree_node=False, default=0)
    # Opt-in tangent-frame normal mapping (the reference's "support normal
    # maps applied to surface where the normal is not pointing directly
    # up" TODO, win32_main.cpp:175): decoded map normals rotate into the
    # geometric surface frame instead of replacing N in world space (the
    # reference behavior, :642, kept as the parity default).
    tbn_normal_maps: bool = struct.field(pytree_node=False, default=False)
    # texture enablement flags (-n -m -r CLI flags, win32_main.cpp:2173-2178)
    use_normal_maps: bool = struct.field(pytree_node=False, default=True)
    use_metalness_maps: bool = struct.field(pytree_node=False, default=True)
    use_roughness_maps: bool = struct.field(pytree_node=False, default=True)

    @property
    def has_light_sphere(self) -> bool:
        return self.n_spheres > 0


@dataclasses.dataclass
class HostMaterial:
    """Host-side material mirroring material_t defaults (ray.hpp:63-78)."""
    alpha: float = 1.0
    albedo: tuple = (0.0, 0.0, 0.0)
    emit: tuple = (0.0, 0.0, 0.0)
    metal_color: tuple = (0.0, 0.0, 0.0)
    metalness: float = 0.0
    roughness: float = 1.0
    ior: float = 1.0
    # Dielectric transmission (glass): 0 = opaque (exact reference
    # behavior); > 0 enables the delta reflect/refract lobe the reference
    # left unfinished (win32_main.cpp:169,1622-1661, F0 comment :600-601).
    transmission: float = 0.0
    # Spectral dispersion half-spread for transmissive dielectrics (the
    # reference's "different wavelengths refract differently" TODO,
    # :169-170): per-path channel c in {R,G,B} refracts with
    # ior + dispersion * (c - 1), i.e. red bends least, blue most.
    dispersion: float = 0.0
    albedo_idx: int = 0
    metalness_idx: int = 0
    roughness_idx: int = 0
    normal_idx: int = 0
    # Height (bump) map — the reference's unrealized "bump map" TODO
    # (win32_main.cpp:173): the geometric normal tilts against the
    # height's finite-difference gradient in the bespoke planar frame.
    bump_idx: int = 0
    bump_scale: float = 1.0


class WorldBuilder:
    """Host-side scene assembly (the nc_sbpush role, include/nc_ds.h:12-35)."""

    def __init__(self):
        self.materials: list[HostMaterial] = []
        self.lights: list[tuple] = []       # (kind, vec, radiance)
        self.spheres: list[tuple] = []      # (center, radius, mat)
        self.quads: list[tuple] = []        # (point, u, v, mat)
        self.planes: list[tuple] = []       # (n, d, mat)
        self.triangles: Optional[np.ndarray] = None  # (T, 3, 3) float32
        self.tri_mats: Optional[np.ndarray] = None   # (T,) int32
        self.tri_uvs: Optional[np.ndarray] = None    # (T, 3, 2) float32
        self.textures: list[np.ndarray] = []         # (H, W, 3) float32 each
        self.quad_light: int = -1                    # see set_quad_light
        self.fog: tuple = (0.0, (1.0, 1.0, 1.0), 0.0)  # see set_fog
        self.tbn_normal_maps: bool = False  # see Scene.tbn_normal_maps

    def add_material(self, **kw) -> int:
        self.materials.append(HostMaterial(**kw))
        return len(self.materials) - 1

    def add_light(self, kind, vec, radiance) -> int:
        """light_t push (parity; the reference never renders these)."""
        self.lights.append((int(kind), tuple(vec), tuple(radiance)))
        return len(self.lights) - 1

    def add_sphere(self, center, radius, mat) -> int:
        self.spheres.append((tuple(center), float(radius), int(mat)))
        return len(self.spheres) - 1

    def add_quad(self, point, u, v, mat) -> int:
        self.quads.append((tuple(point), tuple(u), tuple(v), int(mat)))
        return len(self.quads) - 1

    def set_quad_light(self, idx: int):
        """Mark quad ``idx`` as the NEE target (PdfValueQuad semantics,
        win32_main.cpp:301-322). Default -1 keeps spheres[0] (:683)."""
        if not (0 <= idx < len(self.quads)):
            raise ValueError(f"quad light index {idx} out of range")
        self.quad_light = idx

    def set_fog(self, sigma_t: float, albedo=(1.0, 1.0, 1.0), g: float = 0.0):
        """Global homogeneous participating medium (the reference's
        unrealized '"god rays" and fog, both via volumetric light
        transport' TODO, win32_main.cpp:159). ``sigma_t`` is the
        extinction coefficient (1/units of free flight), ``albedo`` the
        single-scatter albedo sigma_s/sigma_t per channel, ``g`` the
        Henyey-Greenstein anisotropy in (-1, 1) (0 = isotropic)."""
        if sigma_t < 0.0 or not (-1.0 < g < 1.0):
            raise ValueError("fog needs sigma_t >= 0 and -1 < g < 1")
        self.fog = (float(sigma_t), tuple(float(a) for a in albedo), float(g))

    def add_plane(self, n, d, mat) -> int:
        self.planes.append((tuple(n), float(d), int(mat)))
        return len(self.planes) - 1

    def set_mesh(self, points: np.ndarray, mat_indices: np.ndarray,
                 uvs: Optional[np.ndarray] = None):
        """points: (T*3, 3) flat vertex array, 3 consecutive verts per tri
        (mesh_t SoA convention, ray.hpp:102-106). ``uvs``: optional
        (T*3, 2) per-vertex texture coordinates in glTF [0, 1] units
        (gltf.load_gltf_textured — the reference's unrealized
        textured-materials TODO, win32_main.cpp:172). They are converted
        HERE to the texel-space convention every sampler in this framework
        uses (SampleTexture takes texel units and wraps, win32_main.cpp:
        1680-1698): each triangle's UVs scale by its material's bound
        albedo-texture size, so uv (2, 2) tiles an 8x8 texture twice.
        Materials and textures must therefore be registered before
        set_mesh; triangles without a bound texture keep scale 1 (their
        UVs are never sampled)."""
        pts = np.asarray(points, np.float32).reshape(-1, 3, 3)
        self.triangles = pts
        self.tri_mats = np.asarray(mat_indices, np.int32).reshape(-1, 3)[:, 0]
        if uvs is None:
            self.tri_uvs = None
            return
        uv = np.asarray(uvs, np.float32).reshape(-1, 3, 2)
        mw = np.ones((len(self.materials),), np.float32)
        mh = np.ones((len(self.materials),), np.float32)
        for j, m in enumerate(self.materials):
            if m.albedo_idx and m.albedo_idx <= len(self.textures):
                mh[j], mw[j] = self.textures[m.albedo_idx - 1].shape[:2]
        scale = np.stack([mw[self.tri_mats], mh[self.tri_mats]],
                         axis=-1)[:, None, :]  # (T, 1, 2)
        self.tri_uvs = (uv * scale).astype(np.float32)

    def add_texture(self, data: np.ndarray) -> int:
        """Returns the 1-based texture index used by material *_idx fields."""
        self.textures.append(np.asarray(data, np.float32))
        return len(self.textures)

    # ------------------------------------------------------------------
    def finalize(self, world_kind: int = WORLD_DEFAULT,
                 use_normal_maps: bool = True,
                 use_metalness_maps: bool = True,
                 use_roughness_maps: bool = True,
                 grid=None, view_origin=None) -> Scene:
        """Compile host lists into a padded device Scene. ``view_origin``
        (the camera position, when known) orders packet-culling clusters
        near-to-far for the primary-ray t cull (scene/clusters.py)."""
        f32, i32 = np.float32, np.int32

        def vec_table(rows, pad_to):
            a = np.zeros((pad_to, 3), f32)
            if rows:
                a[: len(rows)] = np.asarray(rows, f32)
            return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))

        def scalar_table(rows, pad_to, dtype=f32, fill=0):
            a = np.full((pad_to,), fill, dtype)
            if len(rows):
                a[: len(rows)] = np.asarray(rows, dtype)
            return jnp.asarray(a)

        def mask_table(n, pad_to):
            m = np.zeros((pad_to,), bool)
            m[:n] = True
            return jnp.asarray(m)

        # Materials pad to a 128 multiple: the in-kernel windowed lookup
        # (integrator._material_lookup) slices the tables in 128-lane
        # windows for tpu.dynamic_gather.
        M = _pad(len(self.materials), 128)
        mats = self.materials
        S, Q, P = _pad(len(self.spheres)), _pad(len(self.quads)), _pad(len(self.planes))
        ntri = 0 if self.triangles is None else len(self.triangles)
        T = _pad(ntri)

        tri_a = np.zeros((T, 3), f32)
        tri_u = np.zeros((T, 3), f32)
        tri_v = np.zeros((T, 3), f32)
        tri_m = np.zeros((T,), i32)
        if ntri:
            tri_a[:ntri] = self.triangles[:, 0]
            tri_u[:ntri] = self.triangles[:, 1] - self.triangles[:, 0]
            tri_v[:ntri] = self.triangles[:, 2] - self.triangles[:, 0]
            tri_m[:ntri] = self.tri_mats
        has_mesh_uvs = getattr(self, "tri_uvs", None) is not None and ntri > 0
        tri_uvt = np.zeros((T if has_mesh_uvs else 1, 6), f32)
        if has_mesh_uvs:
            uv = self.tri_uvs
            tri_uvt[:ntri, 0:2] = uv[:, 0]
            tri_uvt[:ntri, 2:4] = uv[:, 1] - uv[:, 0]
            tri_uvt[:ntri, 4:6] = uv[:, 2] - uv[:, 0]

        # packet-culling clusters (scene/clusters.py): reordered copies of
        # big sphere/triangle tables, cluster-contiguous; tiny tables skip
        from . import clusters as clu
        sph_clusters: tuple = ()
        csph_c = np.zeros((1, 3), f32)
        csph_r = np.zeros((1,), f32)
        csph_m = np.zeros((1,), i32)
        if len(self.spheres) > clu.CLUSTER_MIN:
            centers = np.asarray([s[0] for s in self.spheres], f32)
            radii = np.asarray([s[1] for s in self.spheres], f32)
            order, sph_clusters = clu.build_clusters(
                *clu.sphere_bounds(centers, radii), sort_origin=view_origin)
            csph_c = centers[order]
            csph_r = radii[order]
            csph_m = np.asarray([s[2] for s in self.spheres], i32)[order]
            # pad to a 128 multiple: the deferred-resolution LUT
            # (ops/intersect._windowed_lut) slices 128-lane windows
            pad = -len(csph_r) % 128
            if pad:
                csph_c = np.concatenate([csph_c, np.zeros((pad, 3), f32)])
                csph_r = np.concatenate([csph_r, np.zeros((pad,), f32)])
                csph_m = np.concatenate([csph_m, np.zeros((pad,), i32)])
        tri_clusters: tuple = ()
        ctri = {k: np.zeros((1, 3) if k in ("n", "e1", "e2") else (1,), f32)
                for k in ("n", "d", "e1", "e2", "a0", "b0")}
        ctri_m = np.zeros((1,), i32)
        ctri_uvt = np.zeros((1, 6), f32)
        mtri_bounds = np.zeros((1, 128), f32)
        mtri_pack = np.zeros((1, 128), f32)
        mtri_uvpack = np.zeros((1, 128), f32)
        mtri_parents = np.zeros((1, 128), f32)
        mtri_prange = np.zeros((1, 2), i32)
        mtri_gparents = np.zeros((1, 128), f32)
        mtri_gprange = np.zeros((1, 2), i32)
        n_stream_gparents = 0
        tri_streamed = False
        tri_dma = False
        stream_fm = False
        stream_uv_cfm = False
        stream_leaf = 0
        n_stream_clusters = 0
        n_stream_parents = 0
        stream_parents: tuple = ()
        if ntri > clu.CLUSTER_MIN:
            order, tri_clusters = clu.build_clusters(
                *clu.triangle_bounds(self.triangles), sort_origin=view_origin)
            ctri = clu.triangle_precompute(
                tri_a[:ntri][order], tri_u[:ntri][order], tri_v[:ntri][order])
            ctri_m = tri_m[:ntri][order]
            if has_mesh_uvs:
                ctri_uvt = tri_uvt[:ntri][order]
            if clu.STREAM_MIN < ntri <= clu.DMA_MAX:
                # streamed tier: dynamic row reads instead of a static
                # unroll; resolve tables switch to the cluster-padded
                # record layout. Clusters regroup under parent AABBs
                # (two-level hierarchy) — a pure permutation of the
                # cluster list; (off, cnt) still index the order-reordered
                # primitive arrays.
                cperm, stream_parents = clu.build_parents(
                    tri_clusters, sort_origin=view_origin)
                tri_clusters = tuple(tri_clusters[i] for i in cperm)
                stream_leaf = max(c[1] for c in tri_clusters)
                bmn, bmx = clu.triangle_bounds(self.triangles)
                mtri_bounds, mtri_pack, flat = clu.pack_stream_clusters(
                    ctri, ctri_m, tri_clusters, stream_leaf,
                    tri_bounds=(bmn[order], bmx[order]))
                import os as _os
                stream_fm = bool(_os.environ.get("PT_FM_TIER"))
                if stream_fm:
                    # field-major layout replaces the record rows (same
                    # bounds/hierarchy; ops/intersect fm branch)
                    mtri_pack = clu.pack_stream_fm(
                        ctri, ctri_m, tri_clusters, stream_leaf)
                if has_mesh_uvs:
                    stream_uv_cfm = (not stream_fm and stream_leaf <= 128
                                     and not _os.environ.get("PT_NO_UV_CFM"))
                    if stream_fm:
                        mtri_uvpack = clu.pack_stream_fm_uv(
                            ctri_uvt, tri_clusters, stream_leaf)
                    elif stream_uv_cfm:
                        mtri_uvpack = clu.pack_stream_uv_cfm(
                            ctri_uvt, tri_clusters, stream_leaf)
                    else:
                        mtri_uvpack = clu.pack_stream_uv(
                            ctri_uvt, tri_clusters, stream_leaf)
                    ctri_uvt = np.zeros((1, 6), f32)
                n_stream_clusters = len(tri_clusters)
                tri_streamed = True
                # DMA tier: pack rows leave VMEM above STREAM_MAX (HBM +
                # double-buffered async copies); PT_STREAM_DMA=1 forces it
                # for any streamed mesh (equivalence tests + ablation).
                import os as _os
                # mesh-UV scenes keep a PARALLEL uv-row table as large as
                # the pack rows, doubling the resident footprint — halve
                # the VMEM threshold so near-cap UV meshes take the DMA
                # tier (HBM + double-buffered scratch) instead of blowing
                # the kernel's VMEM allocation
                resident_cap = (clu.STREAM_MAX // 2 if has_mesh_uvs
                                else clu.STREAM_MAX)
                if stream_fm:
                    # fm tiles pad every cluster to 128 lanes x 13 rows
                    # (~2x the record rows' bytes/tri at typical leaves)
                    resident_cap //= 2
                tri_dma = (ntri > resident_cap
                           or bool(_os.environ.get("PT_STREAM_DMA")))
                if tri_dma:
                    # dynamic parent tables (O(1) kernel code size); the
                    # static tuple is the RESIDENT tier's faster form but
                    # compiles linearly in parent count
                    gmin = int(_os.environ.get("PT_GPARENT_MIN",
                                               clu.GPARENT_MIN))
                    if len(stream_parents) >= gmin:
                        # grandparent level: regroup the PARENTS (a pure
                        # permutation of the parent list; cluster ranges
                        # are absolute and move with their parent)
                        pperm, gparents = clu.build_parents(
                            stream_parents, sort_origin=view_origin)
                        stream_parents = tuple(stream_parents[i]
                                               for i in pperm)
                        mtri_gparents, mtri_gprange = clu.pack_parents(
                            gparents)
                        n_stream_gparents = len(gparents)
                    mtri_parents, mtri_prange = clu.pack_parents(
                        stream_parents)
                    n_stream_parents = len(stream_parents)
                    stream_parents = ()
                tri_clusters = ()
                # the streamed tier resolves winner attributes inline from
                # the pack rows; the flat ctri tables would only waste
                # VMEM (O(n_tris) loaded per kernel) — keep dummies
                ctri = {k: np.zeros((1, 3) if k in ("n", "e1", "e2")
                                    else (1,), f32)
                        for k in ("n", "d", "e1", "e2", "a0", "b0")}
                ctri_m = np.zeros((1,), i32)
            pad = -len(ctri_m) % 128
            if pad:
                ctri = {k: np.concatenate(
                    [np.asarray(v, f32),
                     np.zeros((pad,) + np.asarray(v).shape[1:], f32)])
                    for k, v in ctri.items()}
                ctri_m = np.concatenate([ctri_m, np.zeros((pad,), i32)])
            uvpad = -len(ctri_uvt) % 128
            if uvpad:
                ctri_uvt = np.concatenate(
                    [ctri_uvt, np.zeros((uvpad, 6), f32)])

        # textures: pad to common max extent (mip 0 only on device),
        # packed RGB8 per texel (values are 8-bit-grid floats, textures.py)
        K = max(1, len(self.textures))
        hmax = max([t.shape[0] for t in self.textures], default=1)
        wmax = max([t.shape[1] for t in self.textures], default=1)
        tex = np.zeros((K, hmax, wmax, 3), f32)
        tw = np.ones((K,), i32)
        th = np.ones((K,), i32)
        for k, t in enumerate(self.textures):
            tex[k, : t.shape[0], : t.shape[1]] = t
            th[k], tw[k] = t.shape[0], t.shape[1]
        q = np.clip(np.round(tex * 255.0), 0, 255).astype(np.int64)
        packed = (q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16)).astype(i32)

        # canonical-set detection: exactly 4 equal-size maps and every
        # material's texture indices are all-zero or exactly (1,2,3,4)
        combined = (
            len(self.textures) == 4
            and len({t.shape[:2] for t in self.textures}) == 1
            and all(
                (m.albedo_idx, m.metalness_idx, m.roughness_idx, m.normal_idx)
                in ((0, 0, 0, 0), (1, 2, 3, 4))
                for m in mats
            )
        )
        if combined:
            qa = [np.clip(np.round(t * 255.0), 0, 255).astype(np.int64)
                  for t in self.textures]
            alb, mtl, rgh, nrm = qa
            comb_a = (alb[..., 0] | (alb[..., 1] << 8) | (alb[..., 2] << 16)
                      | (mtl[..., 0] << 24)).astype(np.int64)
            comb_b = (nrm[..., 0] | (nrm[..., 1] << 8) | (nrm[..., 2] << 16)
                      | (rgh[..., 0] << 24)).astype(np.int64)
            # keep within int32 via wraparound-safe cast
            comb_a = comb_a.astype(np.uint32).astype(np.int64).astype(i32)
            comb_b = comb_b.astype(np.uint32).astype(np.int64).astype(i32)
            ch, cw = self.textures[0].shape[:2]
            tiles_x = -(-cw // 8)

            def level_tables(a2, b2):
                """Tiled (rows, 128) + flat word tables for ONE mip level
                (see Scene.tex_tile layout)."""
                hh, ww = a2.shape
                hp, wp = -(-hh // 8) * 8, -(-ww // 8) * 8
                pa = np.zeros((hp, wp), i32)
                pb = np.zeros((hp, wp), i32)
                pa[:hh, :ww], pb[:hh, :ww] = a2, b2
                tx = wp // 8

                def tile64(m):  # (hp, wp) -> (tiles, 64) in tile-major order
                    return (m.reshape(hp // 8, 8, tx, 8)
                            .transpose(0, 2, 1, 3).reshape(-1, 64))

                t = np.zeros((hp // 8 * tx, 128), i32)
                t[:, 0::2] = tile64(pa)
                t[:, 1::2] = tile64(pb)
                return t, tx

            # Mip pyramid of the combined words. The reference's
            # GenerateMipmapChain (win32_main.cpp:2307-2328) samples the
            # parent at uv=(2x,2y) — with SampleTexture's truncation that is
            # exact even-texel decimation, so level l of the 8-bit words is
            # literally comb[::2^l, ::2^l]: no filtering, no re-quantization.
            # Level 0 occupies the leading rows/words, so every mip-0-only
            # consumer (the reference-parity default) is untouched. Built
            # only for square power-of-two sets (the reference asserts
            # square; wrap masks need pow2); ~1/3 extra memory.
            mip_meta = ()
            if ch == cw and ch >= 8 and (ch & (ch - 1)) == 0:
                metas, tiled_parts, a_parts, b_parts = [], [], [], []
                row_off = word_off = 0
                lvl, wl = 0, cw
                while wl:
                    a_l = comb_a[:: 1 << lvl, :: 1 << lvl][:wl, :wl]
                    b_l = comb_b[:: 1 << lvl, :: 1 << lvl][:wl, :wl]
                    t_l, tx_l = level_tables(a_l, b_l)
                    metas.append((row_off, tx_l, word_off, wl, wl))
                    tiled_parts.append(t_l)
                    a_parts.append(a_l.reshape(-1))
                    b_parts.append(b_l.reshape(-1))
                    row_off += t_l.shape[0]
                    word_off += wl * wl
                    lvl, wl = lvl + 1, wl >> 1
                mip_meta = tuple(metas)
                tiled = np.concatenate(tiled_parts)
                comb_a = np.concatenate(a_parts)
                comb_b = np.concatenate(b_parts)
            else:
                tiled, tiles_x = level_tables(comb_a, comb_b)
        else:
            comb_a = np.zeros((1,), i32)
            comb_b = np.zeros((1,), i32)
            ch = cw = 1
            tiled = np.zeros((1, 128), i32)
            tiles_x = 1
            mip_meta = ()

        # Tiled general texture stack (Scene.tex_stack_tile) for the
        # Pallas kernel's windowed fetches (mesh-UV texel lookups AND the
        # bespoke planar fetches — ops/texture.*_stack_windowed). Gated:
        # pow2 sizes (wrap = mask in Mosaic) and a VMEM budget.
        # Non-qualifying scenes keep the XLA gather path.
        non_tri_mats = ({s[2] for s in self.spheres}
                        | {q[3] for q in self.quads}
                        | {p[2] for p in self.planes})
        tex_mesh_only = bool(
            has_mesh_uvs and self.textures
            and all(
                m.metalness_idx == 0 and m.roughness_idx == 0
                and m.normal_idx == 0 and m.bump_idx == 0
                and (m.albedo_idx == 0 or j not in non_tri_mats)
                for j, m in enumerate(mats)))
        _STACK_TILE_MAX_ROWS = 8192  # 128 words/row -> 4 MB of VMEM
        uv_meta: tuple = ()
        uvtile = np.zeros((1, 128), i32)
        tex_stack_tiled = False
        # combined-set scenes fetch through tex_tile — the stack would be
        # dead VMEM weight riding into every kernel (world 1: 4 MB)
        if self.textures and not combined and all(
                (t.shape[0] & (t.shape[0] - 1)) == 0
                and (t.shape[1] & (t.shape[1] - 1)) == 0
                for t in self.textures):
            metas, parts, row_off = [], [], 0
            for k, t in enumerate(self.textures):
                hh, ww = t.shape[:2]
                hp, wp = -(-hh // 8) * 8, -(-ww // 16) * 16
                p = np.zeros((hp, wp), i32)
                p[:hh, :ww] = packed[k, :hh, :ww]
                tx = wp // 8  # tile columns (even by construction)
                t64 = (p.reshape(hp // 8, 8, tx, 8)
                       .transpose(0, 2, 1, 3).reshape(hp // 8, tx, 64))
                rows = np.concatenate([t64[:, 0::2, :], t64[:, 1::2, :]],
                                      axis=-1).reshape(-1, 128)
                metas.append((row_off, tx // 2, ww, hh))
                parts.append(rows)
                row_off += rows.shape[0]
            if row_off <= _STACK_TILE_MAX_ROWS:
                uvtile = np.concatenate(parts).astype(i32)
                uv_meta = tuple(metas)
                tex_stack_tiled = True

        if grid is None:
            grid_start = jnp.zeros((1,), i32)
            grid_count = jnp.zeros((1,), i32)
            grid_tris = jnp.zeros((1,), i32)
            grid_res = 0
        else:
            grid_start, grid_count, grid_tris, grid_res = grid

        # STATIC constancy map for the material lookup (integrator
        # _material_lookup): a field whose column holds ONE value across
        # the real rows broadcasts row 0 instead of sweeping/gathering —
        # bit-identical (pure lookup) and it removes most of the sweep's
        # compare+select chains on scenes with mostly-uniform tables
        # (Cornell: metalness/ior/metal_color and every *_idx are
        # single-valued; round-5 estimator op-count pass).
        def _column(name):
            return [getattr(m, name) for m in mats]

        mat_const = tuple(sorted(
            k for k, col in dict(
                albedo=_column("albedo"), emit=_column("emit"),
                metal_color=_column("metal_color"),
                metalness=_column("metalness"),
                roughness=_column("roughness"), ior=_column("ior"),
                albedo_idx=_column("albedo_idx"),
                metalness_idx=_column("metalness_idx"),
                roughness_idx=_column("roughness_idx"),
                normal_idx=_column("normal_idx"),
                transmission=_column("transmission"),
                dispersion=_column("dispersion"),
                bump_idx=_column("bump_idx"),
                bump_scale=_column("bump_scale"),
            ).items()
            if len({tuple(np.ravel(np.asarray(x, np.float64))) for x in col})
            <= 1))

        return Scene(
            mat_const=mat_const,
            mat_albedo=vec_table([m.albedo for m in mats], M),
            mat_emit=vec_table([m.emit for m in mats], M),
            mat_metal_color=vec_table([m.metal_color for m in mats], M),
            mat_metalness=scalar_table([m.metalness for m in mats], M),
            mat_roughness=scalar_table([m.roughness for m in mats], M, fill=1),
            mat_ior=scalar_table([m.ior for m in mats], M, fill=1),
            mat_transmission=scalar_table(
                [m.transmission for m in mats], M),
            mat_dispersion=scalar_table(
                [m.dispersion for m in mats], M),
            mat_alpha=scalar_table([m.alpha for m in mats], M, fill=1),
            any_transmissive=any(m.transmission > 0.0 for m in mats),
            any_dispersive=any(m.transmission > 0.0 and m.dispersion > 0.0
                               for m in mats),
            mat_albedo_idx=scalar_table([m.albedo_idx for m in mats], M, i32),
            mat_bump_idx=scalar_table([m.bump_idx for m in mats], M, i32),
            mat_bump_scale=scalar_table([m.bump_scale for m in mats], M,
                                        fill=1),
            any_bump=any(m.bump_idx != 0 for m in mats),
            mat_metalness_idx=scalar_table([m.metalness_idx for m in mats], M, i32),
            mat_roughness_idx=scalar_table([m.roughness_idx for m in mats], M, i32),
            mat_normal_idx=scalar_table([m.normal_idx for m in mats], M, i32),
            sph_center=vec_table([s[0] for s in self.spheres], S),
            sph_radius=scalar_table([s[1] for s in self.spheres], S),
            sph_mat=scalar_table([s[2] for s in self.spheres], S, i32),
            sph_mask=mask_table(len(self.spheres), S),
            quad_point=vec_table([q[0] for q in self.quads], Q),
            quad_u=vec_table([q[1] for q in self.quads], Q),
            quad_v=vec_table([q[2] for q in self.quads], Q),
            quad_mat=scalar_table([q[3] for q in self.quads], Q, i32),
            quad_mask=mask_table(len(self.quads), Q),
            quad_n=_bake_quad_normals(
                vec_table([q[1] for q in self.quads], Q),
                vec_table([q[2] for q in self.quads], Q)),
            pln_n=vec_table([p[0] for p in self.planes], P),
            pln_d=scalar_table([p[1] for p in self.planes], P),
            pln_mat=scalar_table([p[2] for p in self.planes], P, i32),
            pln_mask=mask_table(len(self.planes), P),
            tri_a=Vec3(jnp.asarray(tri_a[:, 0]), jnp.asarray(tri_a[:, 1]), jnp.asarray(tri_a[:, 2])),
            tri_u=Vec3(jnp.asarray(tri_u[:, 0]), jnp.asarray(tri_u[:, 1]), jnp.asarray(tri_u[:, 2])),
            tri_v=Vec3(jnp.asarray(tri_v[:, 0]), jnp.asarray(tri_v[:, 1]), jnp.asarray(tri_v[:, 2])),
            tri_mat=jnp.asarray(tri_m),
            tri_mask=mask_table(ntri, T),
            csph_center=Vec3(jnp.asarray(csph_c[:, 0]), jnp.asarray(csph_c[:, 1]),
                             jnp.asarray(csph_c[:, 2])),
            csph_radius=jnp.asarray(csph_r),
            csph_mat=jnp.asarray(csph_m),
            ctri_n=Vec3(jnp.asarray(ctri["n"][:, 0]), jnp.asarray(ctri["n"][:, 1]),
                        jnp.asarray(ctri["n"][:, 2])),
            ctri_d=jnp.asarray(ctri["d"]),
            ctri_e1=Vec3(jnp.asarray(ctri["e1"][:, 0]), jnp.asarray(ctri["e1"][:, 1]),
                         jnp.asarray(ctri["e1"][:, 2])),
            ctri_e2=Vec3(jnp.asarray(ctri["e2"][:, 0]), jnp.asarray(ctri["e2"][:, 1]),
                         jnp.asarray(ctri["e2"][:, 2])),
            ctri_a0=jnp.asarray(ctri["a0"]),
            ctri_b0=jnp.asarray(ctri["b0"]),
            ctri_mat=jnp.asarray(ctri_m),
            ctri_uv0u=jnp.asarray(ctri_uvt[:, 0]),
            ctri_uv0v=jnp.asarray(ctri_uvt[:, 1]),
            ctri_uvdu1=jnp.asarray(ctri_uvt[:, 2]),
            ctri_uvdv1=jnp.asarray(ctri_uvt[:, 3]),
            ctri_uvdu2=jnp.asarray(ctri_uvt[:, 4]),
            ctri_uvdv2=jnp.asarray(ctri_uvt[:, 5]),
            tri_uv0u=jnp.asarray(tri_uvt[:, 0]),
            tri_uv0v=jnp.asarray(tri_uvt[:, 1]),
            tri_uvdu1=jnp.asarray(tri_uvt[:, 2]),
            tri_uvdv1=jnp.asarray(tri_uvt[:, 3]),
            tri_uvdu2=jnp.asarray(tri_uvt[:, 4]),
            tri_uvdv2=jnp.asarray(tri_uvt[:, 5]),
            has_mesh_uvs=has_mesh_uvs,
            mtri_bounds=jnp.asarray(mtri_bounds),
            mtri_pack=jnp.asarray(mtri_pack),
            mtri_uvpack=jnp.asarray(mtri_uvpack),
            mtri_parents=jnp.asarray(mtri_parents),
            mtri_prange=jnp.asarray(mtri_prange),
            mtri_gparents=jnp.asarray(mtri_gparents),
            mtri_gprange=jnp.asarray(mtri_gprange),
            tri_streamed=tri_streamed,
            tri_dma=tri_dma,
            stream_row_cull=(tri_streamed and not stream_fm
                             and ntri >= int(_os.environ.get(
                                 "PT_ROW_CULL_MIN", clu.ROW_CULL_MIN))
                             and not _os.environ.get("PT_NO_ROW_CULL")),
            stream_fm=stream_fm,
            stream_uv_cfm=stream_uv_cfm,
            stream_leaf=stream_leaf,
            n_stream_clusters=n_stream_clusters,
            n_stream_parents=n_stream_parents,
            n_stream_gparents=n_stream_gparents,
            stream_parents=stream_parents,
            sph_clusters=sph_clusters,
            tri_clusters=tri_clusters,
            box_min=vec_table([], 8),
            box_max=vec_table([], 8),
            box_mat=scalar_table([], 8, i32),
            box_mask=mask_table(0, 8),
            light_kind=scalar_table([l[0] for l in self.lights], _pad(len(self.lights)), i32),
            light_vec=vec_table([l[1] for l in self.lights], _pad(len(self.lights))),
            light_radiance=vec_table([l[2] for l in self.lights], _pad(len(self.lights))),
            light_mask=mask_table(len(self.lights), _pad(len(self.lights))),
            grid_cell_start=grid_start,
            grid_cell_count=grid_count,
            grid_tris=grid_tris,
            tex_packed=jnp.asarray(packed.reshape(-1)),
            tex_w=jnp.asarray(tw),
            tex_h=jnp.asarray(th),
            tex_comb_a=jnp.asarray(np.asarray(comb_a).reshape(-1)),
            tex_comb_b=jnp.asarray(np.asarray(comb_b).reshape(-1)),
            tex_tile=jnp.asarray(tiled),
            tex_hmax=hmax,
            tex_wmax=wmax,
            tex_combined=bool(combined),
            tex_comb_w=cw,
            tex_comb_h=ch,
            tex_tiles_x=tiles_x,
            tex_mip_meta=mip_meta,
            tex_stack_tile=jnp.asarray(uvtile),
            tex_stack_meta=uv_meta,
            tex_stack_tiled=tex_stack_tiled,
            tex_mesh_only=tex_mesh_only,
            world_kind=world_kind,
            just_cosine=(world_kind == WORLD_RAYTRACING_ONE_WEEKEND),
            quad_light=self.quad_light,
            tbn_normal_maps=self.tbn_normal_maps,
            fog_sigma_t=self.fog[0],
            fog_albedo=self.fog[1],
            fog_g=self.fog[2],
            n_spheres=len(self.spheres),
            n_quads=len(self.quads),
            n_planes=len(self.planes),
            n_tris=ntri,
            n_boxes=0,
            n_materials=len(mats),
            n_textures=len(self.textures),
            grid_res=grid_res,
            use_normal_maps=use_normal_maps,
            use_metalness_maps=use_metalness_maps,
            use_roughness_maps=use_roughness_maps,
        )
