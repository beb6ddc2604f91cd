// Native uniform-grid builder: the hot host-side scene-compile loop.
//
// Mirrors the reference's GenerateAccelerationStructure binning
// (win32_main.cpp:1188-1447): each triangle is pushed into every voxel
// spanned by the axis-aligned bbox of the voxel coordinates of its three
// vertices, with voxel coord = floor(p/sep) + res/2 (win32_main.cpp:1266-1268).
// The reference does this with per-cell stretchy buffers in O(tris x span)
// pointer pushes; here it's two flat passes (count, fill) producing the CSR
// arrays the device traversal consumes (pathtracer_tpu/ops/traverse.py).
//
// Exposed as a C ABI for ctypes (pathtracer_tpu/native.py). The numpy
// fallback in scene/accel.py computes the identical arrays (tested equal).

#include <cmath>
#include <cstdint>

namespace {

struct Span {
    int lo[3];
    int hi[3];
    bool ok;
};

inline Span tri_span(const float* tri, int res, float cell) {
    Span s;
    const int half = res >> 1;
    for (int a = 0; a < 3; ++a) { s.lo[a] = res + 1; s.hi[a] = -res - 1; }
    s.ok = true;
    for (int v = 0; v < 3; ++v) {
        for (int a = 0; a < 3; ++a) {
            const float p = tri[v * 3 + a];
            const int c = static_cast<int>(std::floor(p / cell)) + half;
            if (c < 0 || c >= res) { s.ok = false; }
            if (c < s.lo[a]) s.lo[a] = c;
            if (c > s.hi[a]) s.hi[a] = c;
        }
    }
    return s;
}

}  // namespace

extern "C" {

// Pass 1: per-cell reference counts. counts must be zeroed, length res^3.
// Returns total references, or -1 if any vertex is outside the world bounds
// (the reference asserts, win32_main.cpp:1284-1286).
int64_t pt_grid_count(const float* tris, int64_t n_tris, int res, float cell,
                      int32_t* counts) {
    int64_t total = 0;
    for (int64_t t = 0; t < n_tris; ++t) {
        const Span s = tri_span(tris + t * 9, res, cell);
        if (!s.ok) return -1;
        for (int z = s.lo[2]; z <= s.hi[2]; ++z)
            for (int y = s.lo[1]; y <= s.hi[1]; ++y)
                for (int x = s.lo[0]; x <= s.hi[0]; ++x) {
                    const int64_t c =
                        (static_cast<int64_t>(z) * res + y) * res + x;
                    ++counts[c];
                    ++total;
                }
    }
    return total;
}

// Pass 2: fill CSR refs. cursors must be a copy of the exclusive prefix sum
// of counts (it is consumed); refs has length = total from pass 1.
// Triangles are visited in order, so each cell's list is ascending — the
// same order the reference's nc_sbpush produces.
int pt_grid_fill(const float* tris, int64_t n_tris, int res, float cell,
                 int64_t* cursors, int32_t* refs) {
    for (int64_t t = 0; t < n_tris; ++t) {
        const Span s = tri_span(tris + t * 9, res, cell);
        if (!s.ok) return -1;
        for (int z = s.lo[2]; z <= s.hi[2]; ++z)
            for (int y = s.lo[1]; y <= s.hi[1]; ++y)
                for (int x = s.lo[0]; x <= s.hi[0]; ++x) {
                    const int64_t c =
                        (static_cast<int64_t>(z) * res + y) * res + x;
                    refs[cursors[c]++] = static_cast<int32_t>(t);
                }
    }
    return 0;
}

// Library version/presence probe for the ctypes loader.
int pt_native_abi_version() { return 1; }

}  // extern "C"
