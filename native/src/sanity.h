// Shared input-plausibility checks for the from-scratch image decoders.
//
// Every loader reads width/height from attacker-controllable header
// fields and sizes its pixel buffers from them; without a cap, a
// 12-byte mangled file can declare a 65535x65535 (17 GB) image and turn
// the compare tool into an OOM/zero-fill hang before the first payload
// byte is validated (found by the truncation/corruption fuzz in
// tests/test_native.py). Two caps, both checked BEFORE any allocation:
//
// - PT_MAX_DIM mirrors stb_image's STBI_MAX_DIMENSIONS default (1<<24):
//   the reference tool inherits that bound via stbi
//   (/root/reference/include/external/stb_image.h).
// - PT_MAX_PIXELS bounds the total pixel count (1<<26 = 67M px, a
//   256 MB BGRA buffer — comfortably past any render this tool
//   compares, far below the OOM regime).
//
// Where a format's encoding has a bounded worst-case expansion ratio,
// loaders additionally reject images whose pixel payload could not
// possibly fit in the remaining file bytes (pt_payload_plausible).

#ifndef PT_SANITY_H_
#define PT_SANITY_H_

namespace {

constexpr long long kPtMaxDim = 1LL << 24;
constexpr long long kPtMaxPixels = 1LL << 26;

inline bool pt_dims_ok(long long w, long long h) {
    return w > 0 && h > 0 && w <= kPtMaxDim && h <= kPtMaxDim &&
           w * h <= kPtMaxPixels;
}

// Could `need_bytes` of decoded payload have come from `have_bytes` of
// input, given the format's maximum expansion factor (1 for raw
// encodings, e.g. 64 for RLE forms whose cheapest packet is 2 bytes for
// a 128-long run)?
inline bool pt_payload_plausible(unsigned long long need_bytes,
                                 unsigned long long have_bytes,
                                 unsigned long long max_expansion) {
    return need_bytes <= have_bytes * max_expansion;
}

}  // namespace

#endif  // PT_SANITY_H_
