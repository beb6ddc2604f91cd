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

// --- minimal PNG decode (the stbi role): bit depths 1/2/4/8/16, color
// types 0/2/3/4/6, Adam7 interlace, filters 0-4, zlib IDAT. 16-bit
// samples reduce to 8-bit by taking the high byte (stb's
// stbi__convert_16_to_8 semantics); 1/2/4-bit grayscale expands with
// stb's depth-scale table (x255/x85/x17). Matches the input class the
// reference tool accepts through stbi_load (image_compare.c:37,47). ----

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
    int color_type = -1, depth = 0, interlace = 0;
    std::vector<unsigned char> idat, plte;
    for (size_t off = 8; off + 8 <= data.size();) {
        const uint32_t len = be32(off);
        if (off + 12 + len > data.size()) return false;
        const char* type = reinterpret_cast<const char*>(&data[off + 4]);
        const unsigned char* body = &data[off + 8];
        if (!std::memcmp(type, "IHDR", 4)) {
            w = be32(off + 8);
            h = be32(off + 12);
            depth = body[8];
            interlace = body[12];
            color_type = body[9];
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
        kChannels[color_type] == 0 || interlace > 1)
        return false;
    // legal (depth, color type) pairs per the PNG spec
    const bool d124 = depth == 1 || depth == 2 || depth == 4;
    if (!((depth == 8 || depth == 16) || ((color_type == 0 || color_type == 3)
                                          && d124)))
        return false;
    if (color_type == 3 && depth == 16) return false;
    const int ch = kChannels[color_type];
    if (!pt_dims_ok(w, h)) return false;
    const long bpp_bits = static_cast<long>(ch) * depth;
    auto row_bytes = [&](uint32_t width) {
        return (static_cast<size_t>(width) * bpp_bits + 7) / 8;
    };

    // Adam7 pass geometry (pass 0 == the whole image when non-interlaced)
    static const uint32_t XO[] = {0, 4, 0, 2, 0, 1, 0};
    static const uint32_t YO[] = {0, 0, 4, 0, 2, 0, 1};
    static const uint32_t XS[] = {8, 8, 4, 4, 2, 2, 1};
    static const uint32_t YS[] = {8, 8, 8, 4, 4, 2, 2};
    const int n_pass = interlace ? 7 : 1;
    unsigned long long raw_need = 0;
    for (int p = 0; p < n_pass; ++p) {
        const uint32_t pw = interlace ? (w > XO[p] ? (w - XO[p] + XS[p] - 1) / XS[p] : 0) : w;
        const uint32_t ph = interlace ? (h > YO[p] ? (h - YO[p] + YS[p] - 1) / YS[p] : 0) : h;
        if (pw && ph)
            raw_need += (row_bytes(pw) + 1) * static_cast<unsigned long long>(ph);
    }
    // Deflate expands at most ~1032:1 — IHDR dimensions the IDAT stream
    // could never fill are rejected before sizing the filter buffer.
    if (!pt_payload_plausible(raw_need, idat.size(), 1032)) return false;
    std::vector<unsigned char> raw(static_cast<size_t>(raw_need));
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
        raw_len != raw.size())
        return false;

    out->w = static_cast<int>(w);
    out->h = static_cast<int>(h);
    out->px.assign(static_cast<size_t>(w) * h, 0xFF000000u);
    // stb's depth-scale table: 1-bit x255, 2-bit x85, 4-bit x17
    static const unsigned kScale[] = {0, 0xFF, 0x55, 0, 0x11};
    const size_t fo = static_cast<size_t>(bpp_bits + 7) / 8;  // filter offset

    size_t roff = 0;
    for (int p = 0; p < n_pass; ++p) {
        const uint32_t pw = interlace ? (w > XO[p] ? (w - XO[p] + XS[p] - 1) / XS[p] : 0) : w;
        const uint32_t ph = interlace ? (h > YO[p] ? (h - YO[p] + YS[p] - 1) / YS[p] : 0) : h;
        if (!pw || !ph) continue;
        const size_t stride = row_bytes(pw);
        std::vector<unsigned char> prev(stride, 0), cur(stride);
        for (uint32_t y = 0; y < ph; ++y) {
            const unsigned char* src = &raw[roff];
            roff += stride + 1;
            const int filter = src[0];
            ++src;
            for (size_t i = 0; i < stride; ++i) {
                const int x = src[i];
                const int a = i >= fo ? cur[i - fo] : 0;
                const int b = prev[i];
                const int c = i >= fo ? prev[i - fo] : 0;
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
            // per-channel 8-bit sample at pass-pixel x
            auto sample = [&](uint32_t x, int c) -> unsigned {
                const size_t si = static_cast<size_t>(x) * ch + c;
                if (depth == 16) return cur[si * 2];  // high byte (stb)
                if (depth == 8) return cur[si];
                const size_t bit = si * depth;
                const unsigned v =
                    (cur[bit / 8] >> (8 - depth - bit % 8)) &
                    ((1u << depth) - 1);
                return color_type == 3 ? v : v * kScale[depth];
            };
            const uint32_t oy = interlace ? YO[p] + y * YS[p] : y;
            uint32_t* dst = out->px.data() + static_cast<size_t>(oy) * w;
            for (uint32_t x = 0; x < pw; ++x) {
                const uint32_t ox = interlace ? XO[p] + x * XS[p] : x;
                unsigned r, g, b2, a2 = 0xFF;
                switch (color_type) {
                    case 0: r = g = b2 = sample(x, 0); break;
                    case 4: r = g = b2 = sample(x, 0); a2 = sample(x, 1); break;
                    case 3: {
                        const size_t pi = static_cast<size_t>(sample(x, 0)) * 3;
                        if (pi + 2 >= plte.size()) return false;
                        r = plte[pi]; g = plte[pi + 1]; b2 = plte[pi + 2];
                        break;
                    }
                    case 6: a2 = sample(x, 3);  // fallthrough
                    default:
                        r = sample(x, 0); g = sample(x, 1); b2 = sample(x, 2);
                        break;
                }
                dst[ox] = b2 | (g << 8) | (r << 16) |
                          (static_cast<uint32_t>(a2) << 24);
            }
            prev.swap(cur);
        }
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
