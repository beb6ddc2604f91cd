// Standalone image comparison tool — the ImageCompare.exe role
// (reference src/image_compare.c, built by build.bat:4).
//
// Reads two images — 24/32-bit DIB BMPs (the renderer's byte-identical
// output format, io/bmp.py / win32_main.cpp:358-391), 8-bit PNGs
// (decoded here with zlib; gray/RGB/palette/alpha, non-interlaced),
// baseline JPEGs (jpeg_decode.cpp), and TGA/HDR/GIF/PSD/PNM/PIC
// (formats.cpp) — the full stb_image input class of the reference tool
// (image_compare.c:37,47) — and prints the reference's "Percentage
// Similarity" metric (image_compare.c:79-103) plus RMSE (the
// BASELINE.json gate). Rows are normalized to top-down on load so
// cross-format comparisons align.
// The reference's Magnitude has a bug (uses v.a twice and never v.r,
// image_compare.c:121-124); the fixed metric is the default and --legacy
// reproduces the bug bit-for-bit for parity checks.
//
// Usage: image_compare img1 img2 [--legacy] [--threshold X]
// Exit: 0 ok (and RMSE <= threshold if given), 1 over threshold, -1 error.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

#include "sanity.h"

#ifndef PT_NO_MAIN
// Baseline JPEG decoder (jpeg_decode.cpp) — the stbi JPG role.
bool pt_load_jpeg(const char* path, int* out_w, int* out_h,
                  std::vector<uint32_t>* out_px);
// Remaining stbi input formats (formats.cpp).
bool pt_load_tga(const char*, int*, int*, std::vector<uint32_t>*);
bool pt_load_hdr(const char*, int*, int*, std::vector<uint32_t>*);
bool pt_load_gif(const char*, int*, int*, std::vector<uint32_t>*);
bool pt_load_psd(const char*, int*, int*, std::vector<uint32_t>*);
bool pt_load_pnm(const char*, int*, int*, std::vector<uint32_t>*);
bool pt_load_pic(const char*, int*, int*, std::vector<uint32_t>*);
#endif

namespace {

#ifndef PT_NO_MAIN  // loaders are only needed by the standalone tool

struct Image {
    int w = 0, h = 0;
    std::vector<uint32_t> px;  // BGRA packed, row 0 = TOP (normalized)
};

bool load_bmp(const char* path, Image* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    unsigned char hdr[58];
    if (std::fread(hdr, 1, sizeof hdr, f) != sizeof hdr) { std::fclose(f); return false; }
    auto u16 = [&](int o) { return static_cast<uint32_t>(hdr[o]) | (hdr[o + 1] << 8); };
    auto u32 = [&](int o) {
        return static_cast<uint32_t>(hdr[o]) | (hdr[o + 1] << 8) |
               (hdr[o + 2] << 16) | (static_cast<uint32_t>(hdr[o + 3]) << 24);
    };
    const uint32_t bpp = u16(28);
    if (u16(0) != 0x4D42 || (bpp != 32 && bpp != 24)) { std::fclose(f); return false; }
    const uint32_t offset = u32(10);
    const int32_t w = static_cast<int32_t>(u32(18));
    const int32_t h = static_cast<int32_t>(u32(22));
    const bool bottom_up = h >= 0;
    const long long habs = h < 0 ? -static_cast<long long>(h) : h;
    if (!pt_dims_ok(w, habs)) { std::fclose(f); return false; }
    out->w = w;
    out->h = static_cast<int>(habs);
    out->px.resize(static_cast<size_t>(out->w) * out->h);
    const size_t row_bytes = ((static_cast<size_t>(w) * bpp / 8) + 3) & ~size_t(3);
    std::vector<unsigned char> row(row_bytes);
    bool ok = std::fseek(f, static_cast<long>(offset), SEEK_SET) == 0;
    for (int y = 0; ok && y < out->h; ++y) {
        ok = std::fread(row.data(), 1, row_bytes, f) == row_bytes;
        if (!ok) break;
        const int dst_y = bottom_up ? out->h - 1 - y : y;  // normalize top-down
        uint32_t* dst = out->px.data() + static_cast<size_t>(dst_y) * w;
        for (int x = 0; x < w; ++x) {
            const unsigned char* p = row.data() + static_cast<size_t>(x) * bpp / 8;
            const uint32_t a = bpp == 32 ? p[3] : 0xFF;
            dst[x] = static_cast<uint32_t>(p[0]) | (p[1] << 8) |
                     (static_cast<uint32_t>(p[2]) << 16) | (a << 24);
        }
    }
    std::fclose(f);
    return ok;
}

// --- minimal PNG decode (the stbi role): 8-bit depth, color types
// 0/2/3/4/6, non-interlaced, filters 0-4, zlib IDAT ------------------------

int paeth(int a, int b, int c) {
    const int p = a + b - c, pa = std::abs(p - a), pb = std::abs(p - b),
              pc = std::abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    return pb <= pc ? b : c;
}

bool load_png(const char* path, Image* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    const long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<unsigned char> data(static_cast<size_t>(fsize));
    const bool read_ok =
        std::fread(data.data(), 1, data.size(), f) == data.size();
    std::fclose(f);
    static const unsigned char sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (!read_ok || data.size() < 8 || std::memcmp(data.data(), sig, 8) != 0)
        return false;

    auto be32 = [&](size_t o) {
        return (static_cast<uint32_t>(data[o]) << 24) | (data[o + 1] << 16) |
               (data[o + 2] << 8) | data[o + 3];
    };
    uint32_t w = 0, h = 0;
    int color_type = -1;
    std::vector<unsigned char> idat, plte;
    for (size_t off = 8; off + 8 <= data.size();) {
        const uint32_t len = be32(off);
        if (off + 12 + len > data.size()) return false;
        const char* type = reinterpret_cast<const char*>(&data[off + 4]);
        const unsigned char* body = &data[off + 8];
        if (!std::memcmp(type, "IHDR", 4)) {
            w = be32(off + 8);
            h = be32(off + 12);
            const int depth = body[8], interlace = body[12];
            color_type = body[9];
            if (depth != 8 || interlace != 0) return false;
        } else if (!std::memcmp(type, "PLTE", 4)) {
            plte.assign(body, body + len);
        } else if (!std::memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), body, body + len);
        } else if (!std::memcmp(type, "IEND", 4)) {
            break;
        }
        off += 12 + len;
    }
    static const int kChannels[] = {1, 0, 3, 1, 2, 0, 4};
    if (!w || !h || color_type < 0 || color_type > 6 ||
        kChannels[color_type] == 0)
        return false;
    const int ch = kChannels[color_type];
    if (!pt_dims_ok(w, h)) return false;
    const size_t stride = static_cast<size_t>(w) * ch;
    // Deflate expands at most ~1032:1 — IHDR dimensions the IDAT stream
    // could never fill are rejected before sizing the filter buffer.
    if (!pt_payload_plausible((stride + 1) * static_cast<unsigned long long>(h),
                              idat.size(), 1032))
        return false;
    std::vector<unsigned char> raw((stride + 1) * h);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
        raw_len != raw.size())
        return false;

    out->w = static_cast<int>(w);
    out->h = static_cast<int>(h);
    out->px.resize(static_cast<size_t>(w) * h);
    std::vector<unsigned char> prev(stride, 0), cur(stride);
    for (uint32_t y = 0; y < h; ++y) {
        const unsigned char* src = &raw[(stride + 1) * y];
        const int filter = src[0];
        ++src;
        for (size_t i = 0; i < stride; ++i) {
            const int x = src[i];
            const int a = i >= static_cast<size_t>(ch) ? cur[i - ch] : 0;
            const int b = prev[i];
            const int c = i >= static_cast<size_t>(ch) ? prev[i - ch] : 0;
            int v = x;
            switch (filter) {
                case 1: v = x + a; break;
                case 2: v = x + b; break;
                case 3: v = x + (a + b) / 2; break;
                case 4: v = x + paeth(a, b, c); break;
                default: break;
            }
            cur[i] = static_cast<unsigned char>(v & 0xFF);
        }
        uint32_t* dst = out->px.data() + static_cast<size_t>(y) * w;
        for (uint32_t x = 0; x < w; ++x) {
            const unsigned char* p = &cur[static_cast<size_t>(x) * ch];
            unsigned r, g, b2, a2 = 0xFF;
            switch (color_type) {
                case 0: r = g = b2 = p[0]; break;
                case 4: r = g = b2 = p[0]; a2 = p[1]; break;
                case 3: {
                    const size_t pi = static_cast<size_t>(p[0]) * 3;
                    if (pi + 2 >= plte.size()) return false;
                    r = plte[pi]; g = plte[pi + 1]; b2 = plte[pi + 2];
                    break;
                }
                case 6: a2 = p[3];  // fallthrough
                default: r = p[0]; g = p[1]; b2 = p[2]; break;
            }
            dst[x] = b2 | (g << 8) | (r << 16) |
                     (static_cast<uint32_t>(a2) << 24);
        }
        prev.swap(cur);
    }
    return true;
}

bool load_image(const char* path, Image* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    unsigned char magic[2] = {0, 0};
    const size_t got = std::fread(magic, 1, 2, f);
    std::fclose(f);
    if (got != 2) return false;
    if (magic[0] == 137 && magic[1] == 'P') return load_png(path, out);
    if (magic[0] == 0xFF && magic[1] == 0xD8)  // baseline JPEG
        return pt_load_jpeg(path, &out->w, &out->h, &out->px);
    if (magic[0] == 'B' && magic[1] == 'M') return load_bmp(path, out);
    if (magic[0] == 'G' && magic[1] == 'I')
        return pt_load_gif(path, &out->w, &out->h, &out->px);
    if (magic[0] == '8' && magic[1] == 'B')
        return pt_load_psd(path, &out->w, &out->h, &out->px);
    if (magic[0] == '#' && magic[1] == '?')
        return pt_load_hdr(path, &out->w, &out->h, &out->px);
    if (magic[0] == 'P' && (magic[1] == '5' || magic[1] == '6'))
        return pt_load_pnm(path, &out->w, &out->h, &out->px);
    if (magic[0] == 0x53 && magic[1] == 0x80)  // Softimage PIC
        return pt_load_pic(path, &out->w, &out->h, &out->px);
    // TGA has no magic — it is the fallback, as in stb_image.
    return pt_load_tga(path, &out->w, &out->h, &out->px);
}

#endif  // PT_NO_MAIN

// ColorDistance (image_compare.c:105-134). The packed layout here is BGRA
// (b in the low byte); the reference unpacks stbi RGBA — channel ROLES match
// because we name them from our layout.
double color_distance(uint32_t pa, uint32_t pb, bool legacy) {
    const double b1 = (pa & 0xFF) / 255.0, g1 = ((pa >> 8) & 0xFF) / 255.0;
    const double r1 = ((pa >> 16) & 0xFF) / 255.0, a1 = ((pa >> 24) & 0xFF) / 255.0;
    const double b2 = (pb & 0xFF) / 255.0, g2 = ((pb >> 8) & 0xFF) / 255.0;
    const double r2 = ((pb >> 16) & 0xFF) / 255.0, a2 = ((pb >> 24) & 0xFF) / 255.0;
    const double dr = r1 - r2, dg = g1 - g2, db = b1 - b2, da = a1 - a2;
    if (legacy)  // sqrt(a*a + b*b + g*g + a*a): alpha twice, red never
        return std::sqrt(da * da + db * db + dg * dg + da * da);
    return std::sqrt(dr * dr + dg * dg + db * db + da * da);
}

}  // namespace

extern "C" {

// Similarity on raw packed-BGRA buffers (also callable via ctypes).
double pt_percentage_similarity(const uint32_t* a, const uint32_t* b,
                                int64_t n, int legacy) {
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i)
        acc += 1.0 - color_distance(a[i], b[i], legacy != 0);
    return acc / static_cast<double>(n) * 100.0;
}

double pt_rmse(const uint32_t* a, const uint32_t* b, int64_t n) {
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        const double db = (static_cast<double>(a[i] & 0xFF) - (b[i] & 0xFF)) / 255.0;
        const double dg = (static_cast<double>((a[i] >> 8) & 0xFF) - ((b[i] >> 8) & 0xFF)) / 255.0;
        const double dr = (static_cast<double>((a[i] >> 16) & 0xFF) - ((b[i] >> 16) & 0xFF)) / 255.0;
        acc += dr * dr + dg * dg + db * db;
    }
    return std::sqrt(acc / (static_cast<double>(n) * 3.0));
}

}  // extern "C"

#ifndef PT_NO_MAIN
int main(int argc, char** argv) {
    const char* p1 = nullptr;
    const char* p2 = nullptr;
    bool legacy = false;
    double threshold = -1.0;
    for (int i = 1; i < argc; ++i) {
        if (!std::strcmp(argv[i], "--legacy")) legacy = true;
        else if (!std::strcmp(argv[i], "--threshold") && i + 1 < argc)
            threshold = std::atof(argv[++i]);
        else if (!p1) p1 = argv[i];
        else if (!p2) p2 = argv[i];
    }
    if (!p1 || !p2) {
        std::printf("usage: image_compare image_file1 image_file2 "
                    "[--legacy] [--threshold X]\n");
        return 1;
    }
    Image a, b;
    if (!load_image(p1, &a)) { std::printf("Error: '%s' is an invalid file path\n", p1); return -1; }
    if (!load_image(p2, &b)) { std::printf("Error: '%s' is an invalid file path\n", p2); return -1; }
    if (a.w != b.w) {
        std::printf("Error: Images must have same width but they are %d and %d\n", a.w, b.w);
        return -1;
    }
    if (a.h != b.h) {
        std::printf("Error: Images must have same height but they are %d and %d\n", a.h, b.h);
        return -1;
    }
    const int64_t n = static_cast<int64_t>(a.w) * a.h;
    const double sim = pt_percentage_similarity(a.px.data(), b.px.data(), n, legacy);
    const double e = pt_rmse(a.px.data(), b.px.data(), n);
    std::printf("Percentage Similarity: %f %%\n", sim);
    std::printf("RMSE: %.6f\n", e);
    if (threshold >= 0.0 && e > threshold) return 1;
    return 0;
}
#endif
