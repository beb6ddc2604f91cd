// Remaining stbi input formats for the native compare tool — the
// reference's ImageCompare.exe accepts anything stb_image reads
// (/root/reference/src/image_compare.c:37,47; stb_image.h supports
// JPG/PNG/BMP/TGA/GIF/PSD/HDR/PNM/PIC). image_compare.cpp carries
// BMP + PNG, jpeg_decode.cpp carries baseline JPEG; this file adds
// TGA, Radiance HDR, GIF (first frame), PSD, binary PNM and Softimage
// PIC, each a from-scratch decoder emitting packed BGRA with row 0 = top.
//
// HDR follows stbi's LDR conversion exactly: component = RGBE mantissa
// scaled by ldexp(1, E-136), then pow(v, 1/2.2)*255+0.5 clamped
// (stb_image.h stbi__hdr_to_ldr defaults).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "sanity.h"

namespace {

struct Bytes {
    std::vector<unsigned char> d;
    size_t pos = 0;
    bool ok = true;

    bool load(const char* path) {
        FILE* f = std::fopen(path, "rb");
        if (!f) return false;
        std::fseek(f, 0, SEEK_END);
        const long n = std::ftell(f);
        std::fseek(f, 0, SEEK_SET);
        d.resize(static_cast<size_t>(n < 0 ? 0 : n));
        const bool r = std::fread(d.data(), 1, d.size(), f) == d.size();
        std::fclose(f);
        return r && !d.empty();
    }
    int u8() {
        if (pos >= d.size()) { ok = false; return 0; }
        return d[pos++];
    }
    int u16le() { const int a = u8(); return a | (u8() << 8); }
    int u16be() { const int a = u8(); return (a << 8) | u8(); }
    uint32_t u32be() {
        const uint32_t a = static_cast<uint32_t>(u16be());
        return (a << 16) | static_cast<uint32_t>(u16be());
    }
    void skip(size_t n) {
        pos = pos + n > d.size() ? (ok = false, d.size()) : pos + n;
    }
};

uint32_t bgra(unsigned r, unsigned g, unsigned b, unsigned a) {
    return b | (g << 8) | (r << 16) | (static_cast<uint32_t>(a) << 24);
}

}  // namespace

// --- TGA: types 1/2/3 (+8 = RLE), 8/15/16/24/32-bit, colormapped, both
// row origins (descriptor bit 5). Pixels are little-endian BGR(A).
bool pt_load_tga(const char* path, int* out_w, int* out_h,
                 std::vector<uint32_t>* out_px) {
    Bytes s;
    if (!s.load(path)) return false;
    const int idlen = s.u8(), cmap_type = s.u8(), image_type = s.u8();
    s.u16le();  // colormap origin (first entry index; 0 in practice)
    const int cmap_len = s.u16le(), cmap_bpp = s.u8();
    s.u16le(); s.u16le();  // x/y origin
    const int w = s.u16le(), h = s.u16le();
    const int bpp = s.u8(), desc = s.u8();
    const bool rle = image_type >= 9;
    const int base = rle ? image_type - 8 : image_type;
    if (!s.ok || !pt_dims_ok(w, h) || base < 1 || base > 3) return false;
    if (base == 1 && (cmap_type != 1 || cmap_len <= 0)) return false;
    s.skip(static_cast<size_t>(idlen));

    // Palette (BGR(A) entries, 15/16/24/32-bit).
    std::vector<uint32_t> pal;
    auto read_color = [&s](int bits) -> uint32_t {
        if (bits == 8) { const unsigned v = s.u8(); return bgra(v, v, v, 255); }
        if (bits == 15 || bits == 16) {  // ARGB1555, alpha bit ignored
            const int v = s.u16le();
            const unsigned r = ((v >> 10) & 31) * 255 / 31;
            const unsigned g = ((v >> 5) & 31) * 255 / 31;
            const unsigned b = (v & 31) * 255 / 31;
            return bgra(r, g, b, 255);
        }
        const unsigned b = s.u8(), g = s.u8(), r = s.u8();
        const unsigned a = bits == 32 ? s.u8() : 255;
        return bgra(r, g, b, a);
    };
    if (cmap_type == 1) {
        pal.resize(static_cast<size_t>(cmap_len));
        for (int i = 0; i < cmap_len; ++i) pal[i] = read_color(cmap_bpp);
    }
    auto read_pixel = [&]() -> uint32_t {
        if (base == 1) {
            const int i = bpp == 16 ? s.u16le() : s.u8();
            if (i < 0 || i >= static_cast<int>(pal.size())) { s.ok = false; return 0; }
            return pal[static_cast<size_t>(i)];
        }
        if (base == 3) { const unsigned v = s.u8(); return bgra(v, v, v, 255); }
        return read_color(bpp);
    };

    // Every pixel costs >= 1 input byte raw, and an RLE packet (2 bytes
    // minimum) covers <= 128 pixels — reject pixel counts the remaining
    // bytes could never produce before sizing the buffer.
    if (!s.ok ||
        !pt_payload_plausible(static_cast<unsigned long long>(w) * h,
                              s.d.size() - s.pos, rle ? 64 : 1))
        return false;
    std::vector<uint32_t> flat(static_cast<size_t>(w) * h);
    size_t i = 0;
    const size_t n = flat.size();
    if (!rle) {
        for (; i < n && s.ok; ++i) flat[i] = read_pixel();
    } else {
        while (i < n && s.ok) {
            const int packet = s.u8();
            const size_t count = static_cast<size_t>(packet & 0x7F) + 1;
            if (packet & 0x80) {  // run
                const uint32_t px = read_pixel();
                for (size_t k = 0; k < count && i < n; ++k) flat[i++] = px;
            } else {
                for (size_t k = 0; k < count && i < n; ++k) flat[i++] = read_pixel();
            }
        }
    }
    if (!s.ok) return false;
    const bool top_down = (desc & 0x20) != 0;
    out_px->resize(n);
    for (int y = 0; y < h; ++y) {
        const int sy = top_down ? y : h - 1 - y;
        std::memcpy(out_px->data() + static_cast<size_t>(y) * w,
                    flat.data() + static_cast<size_t>(sy) * w,
                    static_cast<size_t>(w) * 4);
    }
    *out_w = w;
    *out_h = h;
    return true;
}

// --- Radiance HDR: "#?..." header, "-Y h +X w", RGBE scanlines (flat,
// old-style (1,1,1,shift) repeats, or the adaptive per-component RLE).
// LDR conversion matches stbi_load's default (gamma 2.2, scale 1).
bool pt_load_hdr(const char* path, int* out_w, int* out_h,
                 std::vector<uint32_t>* out_px) {
    Bytes s;
    if (!s.load(path) || s.d.size() < 2 || s.d[0] != '#' || s.d[1] != '?')
        return false;
    auto line = [&s]() -> std::string {
        std::string l;
        while (s.pos < s.d.size()) {
            const char c = static_cast<char>(s.d[s.pos++]);
            if (c == '\n') break;
            l += c;
        }
        return l;
    };
    line();  // magic
    bool valid = false;
    for (std::string l = line(); !l.empty(); l = line())
        if (l.rfind("FORMAT=32-bit_rle_rgbe", 0) == 0) valid = true;
    int w = 0, h = 0;
    if (!valid || std::sscanf(line().c_str(), "-Y %d +X %d", &h, &w) != 2 ||
        !pt_dims_ok(w, h))
        return false;
    // Every scanline consumes >= 4 bytes (an adaptive-RLE header or the
    // row's first flat pixel) — reject declared heights the remaining
    // bytes cannot cover before sizing the RGBE buffer.
    if (s.d.size() - s.pos < static_cast<size_t>(h) * 4) return false;

    std::vector<unsigned char> rgbe(static_cast<size_t>(w) * h * 4);
    for (int y = 0; y < h && s.ok; ++y) {
        unsigned char* row = rgbe.data() + static_cast<size_t>(y) * w * 4;
        const int c0 = s.u8(), c1 = s.u8(), c2 = s.u8(), c3 = s.u8();
        if (c0 == 2 && c1 == 2 && ((c2 << 8) | c3) == w && w >= 8 &&
            w < 32768) {
            // Adaptive RLE: each component plane separately.
            for (int comp = 0; comp < 4 && s.ok; ++comp) {
                int x = 0;
                while (x < w && s.ok) {
                    int count = s.u8();
                    if (count > 128) {  // run
                        const int v = s.u8();
                        count -= 128;
                        if (x + count > w) return false;
                        for (int k = 0; k < count; ++k)
                            row[4 * x++ + comp] = static_cast<unsigned char>(v);
                    } else {
                        if (count == 0 || x + count > w) return false;
                        for (int k = 0; k < count; ++k)
                            row[4 * x++ + comp] = static_cast<unsigned char>(s.u8());
                    }
                }
            }
        } else {
            // Flat scanlines, with the old-style (1,1,1,shift) run marker.
            int px[4] = {c0, c1, c2, c3};
            int shift = 0;
            for (int x = 0; x < w && s.ok;) {
                if (px[0] == 1 && px[1] == 1 && px[2] == 1 && x > 0) {
                    int count = px[3] << shift;
                    if (x + count > w) return false;
                    const unsigned char* prev = row + 4 * (x - 1);
                    for (int k = 0; k < count; ++k, ++x)
                        std::memcpy(row + 4 * x, prev, 4);
                    shift += 8;
                } else {
                    for (int c = 0; c < 4; ++c)
                        row[4 * x + c] = static_cast<unsigned char>(px[c]);
                    ++x;
                    shift = 0;
                }
                if (x < w)
                    for (int c = 0; c < 4; ++c) px[c] = s.u8();
            }
        }
    }
    if (!s.ok) return false;
    out_px->resize(static_cast<size_t>(w) * h);
    for (size_t i = 0; i < out_px->size(); ++i) {
        const unsigned char* p = rgbe.data() + i * 4;
        unsigned c[3] = {0, 0, 0};
        if (p[3] != 0) {
            const float f = std::ldexp(1.0f, p[3] - 136);  // stbi rgbe scale
            for (int k = 0; k < 3; ++k) {
                const float v =
                    std::pow(p[k] * f, 1.0f / 2.2f) * 255.0f + 0.5f;
                c[k] = static_cast<unsigned>(v < 0 ? 0 : v > 255 ? 255 : v);
            }
        }
        (*out_px)[i] = bgra(c[0], c[1], c[2], 255);
    }
    *out_w = w;
    *out_h = h;
    return true;
}

// --- GIF: first frame only (the compare tool's input class), LZW decode,
// global/local palettes, interlace, transparent index -> alpha 0 (stbi).
bool pt_load_gif(const char* path, int* out_w, int* out_h,
                 std::vector<uint32_t>* out_px) {
    Bytes s;
    if (!s.load(path) || s.d.size() < 13 ||
        std::memcmp(s.d.data(), "GIF8", 4) != 0)
        return false;
    s.skip(6);
    const int sw = s.u16le(), sh = s.u16le();
    if (!pt_dims_ok(sw, sh)) return false;  // canvas sizes out_px below
    const int flags = s.u8();
    s.u8(); s.u8();  // background color, aspect
    std::vector<uint32_t> gpal;
    if (flags & 0x80) {
        gpal.resize(size_t(2) << (flags & 7));
        for (auto& p : gpal) {
            const unsigned r = s.u8(), g = s.u8(), b = s.u8();
            p = bgra(r, g, b, 255);
        }
    }
    int transparent = -1;
    while (s.ok) {
        const int block = s.u8();
        if (block == 0x21) {  // extension
            const int label = s.u8();
            for (int len = s.u8(); len > 0 && s.ok; len = s.u8()) {
                if (label == 0xF9 && len == 4) {  // graphic control
                    const int gflags = s.u8();
                    s.u16le();
                    const int tidx = s.u8();
                    if (gflags & 1) transparent = tidx;
                } else {
                    s.skip(static_cast<size_t>(len));
                }
            }
        } else if (block == 0x2C) {  // image descriptor — decode and stop
            const int x0 = s.u16le(), y0 = s.u16le();
            const int w = s.u16le(), h = s.u16le();
            const int iflags = s.u8();
            std::vector<uint32_t> pal = gpal;
            if (iflags & 0x80) {
                pal.assign(size_t(2) << (iflags & 7), 0);
                for (auto& p : pal) {
                    const unsigned r = s.u8(), g = s.u8(), b = s.u8();
                    p = bgra(r, g, b, 255);
                }
            }
            if (w <= 0 || h <= 0 || x0 + w > sw || y0 + h > sh || pal.empty())
                return false;

            const int min_code = s.u8();
            if (min_code < 1 || min_code > 11) return false;
            // Gather the sub-block byte stream.
            std::vector<unsigned char> lzw;
            for (int len = s.u8(); len > 0 && s.ok; len = s.u8()) {
                for (int k = 0; k < len; ++k)
                    lzw.push_back(static_cast<unsigned char>(s.u8()));
            }
            if (!s.ok) return false;

            const int clear = 1 << min_code, end = clear + 1;
            std::vector<int16_t> prefix(4096, -1);
            std::vector<unsigned char> suffix(4096), first(4096);
            int next = end + 1, code_size = min_code + 1, prev = -1;
            for (int i = 0; i < clear; ++i) {
                suffix[i] = static_cast<unsigned char>(i);
                first[i] = static_cast<unsigned char>(i);
            }
            std::vector<unsigned char> indices;
            indices.reserve(static_cast<size_t>(w) * h);
            uint32_t bits = 0;
            int nbits = 0;
            size_t bp = 0;
            std::vector<unsigned char> stack;
            while (indices.size() < static_cast<size_t>(w) * h) {
                while (nbits < code_size && bp < lzw.size()) {
                    bits |= static_cast<uint32_t>(lzw[bp++]) << nbits;
                    nbits += 8;
                }
                if (nbits < code_size) break;  // truncated stream
                const int code = static_cast<int>(bits & ((1u << code_size) - 1));
                bits >>= code_size;
                nbits -= code_size;
                if (code == clear) {
                    next = end + 1;
                    code_size = min_code + 1;
                    prev = -1;
                    continue;
                }
                if (code == end) break;
                if (code > next || (prev < 0 && code >= clear)) return false;
                int cur = code;
                if (code == next) {  // KwKwK case
                    if (prev < 0) return false;
                    stack.push_back(first[prev]);
                    cur = prev;
                }
                for (; cur >= clear; cur = prefix[cur]) stack.push_back(suffix[cur]);
                stack.push_back(suffix[cur]);
                const unsigned char fc = suffix[cur];
                while (!stack.empty()) {
                    indices.push_back(stack.back());
                    stack.pop_back();
                }
                if (prev >= 0 && next < 4096) {
                    prefix[next] = static_cast<int16_t>(prev);
                    suffix[next] = fc;
                    first[next] = first[prev];
                    ++next;
                    if (next == (1 << code_size) && code_size < 12) ++code_size;
                }
                prev = code;
            }
            if (indices.size() < static_cast<size_t>(w) * h) return false;

            out_px->assign(static_cast<size_t>(sw) * sh, bgra(0, 0, 0, 255));
            // Interlace passes: rows 0,8,16.. then 4,12.. then 2,6.. then odd.
            static const int start[4] = {0, 4, 2, 1}, step[4] = {8, 8, 4, 2};
            size_t src_row = 0;
            auto emit_row = [&](int y) {
                uint32_t* dst =
                    out_px->data() + static_cast<size_t>(y0 + y) * sw + x0;
                const unsigned char* src = indices.data() + src_row * w;
                for (int x = 0; x < w; ++x) {
                    const int idx = src[x];
                    if (idx >= static_cast<int>(pal.size())) continue;
                    dst[x] = idx == transparent ? pal[idx] & 0x00FFFFFFu
                                                : pal[idx];
                }
                ++src_row;
            };
            if (iflags & 0x40) {
                for (int pass = 0; pass < 4; ++pass)
                    for (int y = start[pass]; y < h; y += step[pass]) emit_row(y);
            } else {
                for (int y = 0; y < h; ++y) emit_row(y);
            }
            *out_w = sw;
            *out_h = sh;
            return true;
        } else {
            break;  // trailer (0x3B) or junk
        }
    }
    return false;
}

// --- PSD: version-1 "8BPS", 8-bit channels, compression 0 (raw) or
// 1 (PackBits RLE), planar RGB(A) / grayscale; composited image data only.
bool pt_load_psd(const char* path, int* out_w, int* out_h,
                 std::vector<uint32_t>* out_px) {
    Bytes s;
    if (!s.load(path) || s.d.size() < 26 ||
        std::memcmp(s.d.data(), "8BPS", 4) != 0)
        return false;
    s.skip(4);
    if (s.u16be() != 1) return false;  // version
    s.skip(6);
    const int channels = s.u16be();
    const int h = static_cast<int>(s.u32be()), w = static_cast<int>(s.u32be());
    const int depth = s.u16be();
    s.u16be();  // color mode (3=RGB, 1=gray; channel mapping below covers both)
    if (channels < 1 || channels > 16 || depth != 8 || !pt_dims_ok(w, h))
        return false;
    s.skip(s.u32be());  // color mode data
    s.skip(s.u32be());  // image resources
    s.skip(s.u32be());  // layers and masks
    const int compression = s.u16be();
    if (!s.ok || compression > 1) return false;

    const size_t plane = static_cast<size_t>(w) * h;
    // Raw planes need their full byte count; PackBits packets (2 bytes)
    // cover <= 128 output bytes. Checked before sizing the plane buffer.
    if (!pt_payload_plausible(
            static_cast<unsigned long long>(plane) * channels,
            s.d.size() - s.pos, compression == 0 ? 1 : 64))
        return false;
    std::vector<unsigned char> planes(plane * channels);
    if (compression == 0) {
        for (size_t i = 0; i < planes.size(); ++i)
            planes[i] = static_cast<unsigned char>(s.u8());
    } else {
        s.skip(static_cast<size_t>(h) * channels * 2);  // per-row byte counts
        for (int c = 0; c < channels && s.ok; ++c) {
            unsigned char* dst = planes.data() + plane * c;
            size_t i = 0;
            while (i < plane && s.ok) {
                const int n = s.u8();
                if (n < 128) {
                    for (int k = 0; k <= n && i < plane; ++k)
                        dst[i++] = static_cast<unsigned char>(s.u8());
                } else if (n > 128) {
                    const unsigned char v = static_cast<unsigned char>(s.u8());
                    for (int k = 0; k < 257 - n && i < plane; ++k) dst[i++] = v;
                }  // n == 128: no-op
            }
            if (i != plane) return false;
        }
    }
    if (!s.ok) return false;
    out_px->resize(plane);
    for (size_t i = 0; i < plane; ++i) {
        const unsigned r = planes[i];
        const unsigned g = channels >= 3 ? planes[plane + i] : r;
        const unsigned b = channels >= 3 ? planes[2 * plane + i] : r;
        const unsigned a = channels == 2   ? planes[plane + i]
                           : channels >= 4 ? planes[3 * plane + i]
                                           : 255;
        (*out_px)[i] = bgra(r, g, b, a);
    }
    *out_w = w;
    *out_h = h;
    return true;
}

// --- PNM: binary P5 (gray) / P6 (RGB), maxval <= 65535 (16-bit scaled
// down, matching stbi's 8-bit request path).
bool pt_load_pnm(const char* path, int* out_w, int* out_h,
                 std::vector<uint32_t>* out_px) {
    Bytes s;
    if (!s.load(path) || s.d.size() < 2 || s.d[0] != 'P' ||
        (s.d[1] != '5' && s.d[1] != '6'))
        return false;
    const int channels = s.d[1] == '6' ? 3 : 1;
    s.pos = 2;
    auto token = [&s]() -> long {
        while (s.pos < s.d.size()) {
            const char c = static_cast<char>(s.d[s.pos]);
            if (c == '#') {
                while (s.pos < s.d.size() && s.d[s.pos] != '\n') ++s.pos;
            } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
                ++s.pos;
            } else {
                break;
            }
        }
        long v = -1;
        while (s.pos < s.d.size() && s.d[s.pos] >= '0' && s.d[s.pos] <= '9')
            v = (v < 0 ? 0 : v) * 10 + (s.d[s.pos++] - '0');
        return v;
    };
    const long w = token(), h = token(), maxval = token();
    ++s.pos;  // single whitespace after maxval
    if (!pt_dims_ok(w, h) || maxval <= 0 || maxval > 65535) return false;
    const bool wide = maxval > 255;
    // Binary PNM is raw: the sample payload must actually be present.
    if (!pt_payload_plausible(static_cast<unsigned long long>(w) * h *
                                  channels * (wide ? 2 : 1),
                              s.d.size() - std::min(s.pos, s.d.size()), 1))
        return false;
    out_px->resize(static_cast<size_t>(w) * h);
    for (size_t i = 0; i < out_px->size() && s.ok; ++i) {
        unsigned c[3];
        for (int k = 0; k < channels; ++k) {
            const long raw = wide ? s.u16be() : s.u8();
            c[k] = static_cast<unsigned>(raw * 255 / maxval);
        }
        (*out_px)[i] = channels == 3 ? bgra(c[0], c[1], c[2], 255)
                                     : bgra(c[0], c[0], c[0], 255);
    }
    if (!s.ok) return false;
    *out_w = static_cast<int>(w);
    *out_h = static_cast<int>(h);
    return true;
}

// --- Softimage PIC: the last stbi input format (stb_image.h
// stbi__pic_test/_load: 4-byte magic 53 80 F6 34, "PICT" at offset 88,
// u16be width/height, chained 4-byte channel packets, per-row per-packet
// scanlines uncompressed / pure-RLE / mixed-RLE, channel bitmask
// 0x80/0x40/0x20/0x10 = R/G/B/A, result pre-filled 0xFF so absent
// channels read opaque).
bool pt_load_pic(const char* path, int* out_w, int* out_h,
                 std::vector<uint32_t>* out_px) {
    Bytes s;
    static const unsigned char magic[4] = {0x53, 0x80, 0xF6, 0x34};
    if (!s.load(path) || s.d.size() < 100 ||
        std::memcmp(s.d.data(), magic, 4) != 0 ||
        std::memcmp(s.d.data() + 88, "PICT", 4) != 0)
        return false;
    s.pos = 92;
    const int w = s.u16be(), h = s.u16be();
    s.skip(8);  // ratio (f32), fields (u16), pad (u16)
    if (!s.ok || !pt_dims_ok(w, h)) return false;

    struct Packet { int type, channel; };
    Packet packets[10];
    int np = 0;
    for (int chained = 1; chained;) {
        if (np == 10) return false;  // stbi caps at 10 packets
        chained = s.u8();
        const int size = s.u8();
        packets[np].type = s.u8();
        packets[np].channel = s.u8();
        if (!s.ok || size != 8) return false;  // 8-bit channels only
        ++np;
    }
    // Each packet consumes >= 1 byte per scanline (an RLE count byte, or
    // the first sample of an uncompressed row); reject declared heights
    // the file cannot cover before sizing the buffer.
    if (s.d.size() - s.pos < static_cast<size_t>(h) * np) return false;

    std::vector<unsigned char> rgba(static_cast<size_t>(w) * h * 4, 0xFF);
    auto readval = [&s](int channel, unsigned char* dst) {
        for (int i = 0, mask = 0x80; i < 4; ++i, mask >>= 1)
            if (channel & mask) dst[i] = static_cast<unsigned char>(s.u8());
    };
    auto copyval = [](int channel, unsigned char* dst,
                      const unsigned char* src) {
        for (int i = 0, mask = 0x80; i < 4; ++i, mask >>= 1)
            if (channel & mask) dst[i] = src[i];
    };
    for (int y = 0; y < h && s.ok; ++y) {
        for (int p = 0; p < np && s.ok; ++p) {
            const Packet& pk = packets[p];
            unsigned char* dest = rgba.data() + static_cast<size_t>(y) * w * 4;
            if (pk.type == 0) {  // uncompressed
                for (int x = 0; x < w && s.ok; ++x, dest += 4)
                    readval(pk.channel, dest);
            } else if (pk.type == 1) {  // pure RLE (counts clamp to row)
                int left = w;
                while (left > 0 && s.ok) {
                    int count = s.u8();
                    if (count > left) count = left;
                    unsigned char value[4] = {0, 0, 0, 0};
                    readval(pk.channel, value);
                    for (int i = 0; i < count; ++i, dest += 4)
                        copyval(pk.channel, dest, value);
                    left -= count;
                    // count == 0: a no-op packet; stbi tolerates these
                    // (the count byte keeps the loop finite via EOF).
                }
            } else if (pk.type == 2) {  // mixed RLE (counts must fit)
                int left = w;
                while (left > 0 && s.ok) {
                    int count = s.u8();
                    if (count >= 128) {  // repeated
                        count = count == 128 ? s.u16be() : count - 127;
                        if (count > left) return false;
                        unsigned char value[4] = {0, 0, 0, 0};
                        readval(pk.channel, value);
                        for (int i = 0; i < count; ++i, dest += 4)
                            copyval(pk.channel, dest, value);
                    } else {  // raw
                        ++count;
                        if (count > left) return false;
                        for (int i = 0; i < count; ++i, dest += 4)
                            readval(pk.channel, dest);
                    }
                    left -= count;
                    // count == 0 (a 128-marker long run of length 0) is a
                    // tolerated no-op, as in stbi; EOF bounds the loop.
                }
            } else {
                return false;
            }
        }
    }
    if (!s.ok) return false;
    out_px->resize(static_cast<size_t>(w) * h);
    for (size_t i = 0; i < out_px->size(); ++i) {
        const unsigned char* p = rgba.data() + i * 4;
        (*out_px)[i] = bgra(p[0], p[1], p[2], p[3]);
    }
    *out_w = w;
    *out_h = h;
    return true;
}
