// JPEG decoder for the image-compare tool — the remaining slice of the
// vendored-stb_image role (reference include/external/stb_image.h, pulled
// in by src/image_compare.c:37,47: the reference tool accepts any
// stbi-readable format; ours read BMP + PNG natively and this adds JPG).
//
// Scope: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2) —
// spectral selection + successive approximation, DC/AC first and
// refinement scans, EOB runs — 8-bit, grayscale or YCbCr with any 1-2x
// chroma subsampling (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), restart markers,
// multiple DQT/DHT segments (tables may change between scans).
// Arithmetic coding, 12-bit, and CMYK remain out of scope.
//
// Design: a unified coefficient store. Every scan — baseline's single
// interleaved DC+AC scan is just (Ss=0, Se=63, Ah=Al=0) — decodes into
// per-component per-block zigzag-order coefficient arrays; after EOI one
// pass dequantizes, un-zigzags, and IDCTs every block into the sample
// planes, then nearest-neighbor chroma upsample + YCbCr->RGB (BT.601,
// the JFIF convention stbi implements). The AC refinement pass follows
// the classic IJG correction-bit algorithm (JPEG G.1.2.3, the same one
// stb_image implements).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "sanity.h"

namespace ptjpeg {

struct Huff {
    // Canonical Huffman per JPEG Annex C: code lengths 1..16.
    uint16_t mincode[17] = {0};
    int32_t maxcode[18] = {0};   // -1 = no codes of this length
    int32_t valptr[17] = {0};
    uint8_t values[256] = {0};
    bool present = false;

    void build(const uint8_t counts[16], const uint8_t* vals, int nvals) {
        int code = 0, k = 0;
        for (int l = 1; l <= 16; ++l) {
            valptr[l] = k;
            mincode[l] = static_cast<uint16_t>(code);
            code += counts[l - 1];
            k += counts[l - 1];
            maxcode[l] = counts[l - 1] ? code - 1 : -1;
            code <<= 1;
        }
        maxcode[17] = 0x7FFFFFFF;
        std::memcpy(values, vals, static_cast<size_t>(nvals));
        present = true;
    }
};

struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint32_t buf = 0;
    int nbits = 0;
    bool bad = false;

    BitReader(const uint8_t* data, size_t n) : p(data), end(data + n) {}

    int bit() {
        if (nbits == 0) {
            if (p >= end) { bad = true; return 0; }
            uint8_t b = *p++;
            if (b == 0xFF) {
                if (p >= end) { bad = true; return 0; }
                uint8_t m = *p++;
                if (m != 0x00) {  // a real marker terminates entropy data
                    p -= 2;
                    bad = true;
                    return 0;
                }
            }
            buf = b;
            nbits = 8;
        }
        --nbits;
        return (buf >> nbits) & 1;
    }

    int bits(int n) {
        int v = 0;
        for (int i = 0; i < n; ++i) v = (v << 1) | bit();
        return v;
    }

    void align_to_marker() {  // drop partial byte before an RST marker
        nbits = 0;
        while (p < end && *p == 0xFF && p + 1 < end &&
               (p[1] >= 0xD0 && p[1] <= 0xD7))
            p += 2;
        bad = false;
    }
};

int decode_huff(BitReader& br, const Huff& h) {
    int code = br.bit(), l = 1;
    while (code > h.maxcode[l]) {
        code = (code << 1) | br.bit();
        if (++l > 16) return -1;
    }
    if (l > 16 || h.maxcode[l] < 0) return -1;
    return h.values[h.valptr[l] + code - h.mincode[l]];
}

// Receive-and-extend (JPEG F.2.2.1): SIZE bits -> signed coefficient.
int extend(int v, int size) {
    return (size && v < (1 << (size - 1))) ? v - (1 << size) + 1 : v;
}

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

// Separable 8-point float IDCT (AAN-free direct form: clear and exact
// enough — decoder-to-decoder differences live in IDCT rounding anyway).
void idct8x8(const float in[64], uint8_t out[64]) {
    static float c[8][8];
    static bool init = false;
    if (!init) {
        for (int u = 0; u < 8; ++u)
            for (int x = 0; x < 8; ++x)
                c[u][x] = std::cos((2 * x + 1) * u * 3.14159265358979323846f /
                                   16.0f) *
                          (u == 0 ? 0.353553390593f   // sqrt(1/8)
                                  : 0.5f);
        init = true;
    }
    float tmp[64];
    for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
            float s = 0.0f;
            for (int u = 0; u < 8; ++u) s += c[u][x] * in[y * 8 + u];
            tmp[y * 8 + x] = s;
        }
    for (int x = 0; x < 8; ++x)
        for (int y = 0; y < 8; ++y) {
            float s = 0.0f;
            for (int v = 0; v < 8; ++v) s += c[v][y] * tmp[v * 8 + x];
            const int q = static_cast<int>(std::lround(s)) + 128;
            out[y * 8 + x] =
                static_cast<uint8_t>(q < 0 ? 0 : (q > 255 ? 255 : q));
        }
}

struct Component {
    int id = 0, hs = 1, vs = 1, tq = 0, td = 0, ta = 0;
    int dc_pred = 0;
    int bw = 0, bh = 0;     // padded (MCU-grid) plane size in blocks
    int nbw = 0, nbh = 0;   // non-interleaved scan grid (ceil(comp_px/8))
    std::vector<int32_t> coef;       // bw*bh blocks x 64, zigzag order
    std::vector<uint8_t> plane;      // bw*8 x bh*8 samples
};

}  // namespace ptjpeg

// Decodes a baseline or progressive JPEG into packed BGRA (row 0 = top),
// matching the Image layout in image_compare.cpp. Returns false on
// anything outside the supported subset.
bool pt_load_jpeg(const char* path, int* out_w, int* out_h,
                  std::vector<uint32_t>* out_px) {
    using namespace ptjpeg;
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    const long fsize = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> d(static_cast<size_t>(fsize));
    const bool read_ok = std::fread(d.data(), 1, d.size(), f) == d.size();
    std::fclose(f);
    if (!read_ok || d.size() < 4 || d[0] != 0xFF || d[1] != 0xD8) return false;

    uint16_t qt[4][64] = {{0}};
    Huff hdc[4], hac[4];
    Component comp[3];
    int ncomp = 0, W = 0, H = 0, restart_interval = 0;
    int hmax = 1, vmax = 1, mcux = 0, mcuy = 0;
    bool got_sof = false, any_scan = false;

    auto u16 = [&](size_t o) {
        return (static_cast<int>(d[o]) << 8) | d[o + 1];
    };

    // One entropy-coded scan: decodes coefficients for the listed
    // components over [Ss, Se] at approximation (Ah -> Al).
    auto decode_scan = [&](Component* sc[], int ns, int Ss, int Se, int Ah,
                           int Al, size_t off, size_t len) -> bool {
        BitReader br(&d[off], len);
        int eobrun = 0;
        for (int i = 0; i < ns; ++i) sc[i]->dc_pred = 0;

        // first pass (Ah == 0) for one block's [Ss, Se] band
        auto block_first = [&](Component& C, int32_t* cf) -> bool {
            int k = Ss;
            if (Ss == 0) {
                const int s = decode_huff(br, hdc[C.td]);
                if (s < 0 || s > 11) return false;
                C.dc_pred += extend(br.bits(s), s);
                cf[0] = C.dc_pred << Al;
                k = 1;
            }
            if (k > Se) return true;  // DC-only scan
            if (eobrun > 0) { --eobrun; return true; }
            for (; k <= Se;) {
                const int rs = decode_huff(br, hac[C.ta]);
                if (rs < 0) return false;
                const int run = rs >> 4, size = rs & 15;
                if (size == 0) {
                    if (run < 15) {  // EOBn (baseline: run==0 -> plain EOB)
                        eobrun = (1 << run) - 1;
                        if (run) eobrun += br.bits(run);
                        break;
                    }
                    k += 16;  // ZRL
                    continue;
                }
                k += run;
                if (k > 63) return false;
                cf[k] = extend(br.bits(size), size) *
                        (1 << Al);  // coefficient << Al (signed-safe)
                ++k;
            }
            return true;
        };

        // refinement pass (Ah > 0): JPEG G.1.2.3 correction bits (the
        // IJG/stb algorithm)
        auto block_refine = [&](Component& C, int32_t* cf) -> bool {
            if (Ss == 0) {  // DC refinement: one bit
                if (br.bit()) cf[0] |= (1 << Al);
                return true;
            }
            const int bit_val = 1 << Al;
            auto correct = [&](int32_t* p) {
                if (br.bit() && (*p & bit_val) == 0)
                    *p += (*p > 0) ? bit_val : -bit_val;
            };
            if (eobrun > 0) {
                --eobrun;
                for (int k = Ss; k <= Se; ++k)
                    if (cf[k] != 0) correct(&cf[k]);
                return true;
            }
            int k = Ss;
            do {
                int rs = decode_huff(br, hac[C.ta]);
                if (rs < 0) return false;
                int r = rs >> 4;
                const int s = rs & 15;
                int newval = 0;
                if (s == 0) {
                    if (r < 15) {
                        eobrun = (1 << r) - 1;
                        if (r) eobrun += br.bits(r);
                        r = 64;  // flush remaining corrections below
                    }
                    // r == 15: ZRL — skip 16 zero-history coefficients
                } else {
                    if (s != 1) return false;
                    newval = br.bit() ? bit_val : -bit_val;
                }
                while (k <= Se) {
                    int32_t* p = &cf[k++];
                    if (*p != 0) {
                        correct(p);
                    } else {
                        if (r == 0) { if (newval) p[0] = newval; break; }
                        --r;
                    }
                }
                // an EOBn code set r=64: the while above just flushed the
                // rest of THIS block's corrections — the current block is
                // consumed inline, eobrun counts only the FOLLOWING blocks
            } while (k <= Se);
            return true;
        };

        auto block = [&](Component& C, int bx, int by) -> bool {
            int32_t* cf =
                &C.coef[(static_cast<size_t>(by) * C.bw + bx) * 64];
            if (Ss == 0 && !hdc[C.td].present) return false;
            if (Se > 0 && !hac[C.ta].present) return false;
            return Ah == 0 ? block_first(C, cf) : block_refine(C, cf);
        };

        int until_restart = restart_interval ? restart_interval : -1;
        auto restart = [&]() {
            br.align_to_marker();
            for (int i = 0; i < ns; ++i) sc[i]->dc_pred = 0;
            eobrun = 0;
            until_restart = restart_interval;
        };

        if (ns == 1) {
            // non-interleaved: the component's own ceil(px/8) block grid
            Component& C = *sc[0];
            for (int by = 0; by < C.nbh; ++by)
                for (int bx = 0; bx < C.nbw; ++bx) {
                    if (until_restart == 0) restart();
                    if (!block(C, bx, by)) return false;
                    if (until_restart > 0) --until_restart;
                }
        } else {
            for (int my = 0; my < mcuy; ++my)
                for (int mx = 0; mx < mcux; ++mx) {
                    if (until_restart == 0) restart();
                    for (int i = 0; i < ns; ++i) {
                        Component& C = *sc[i];
                        for (int by = 0; by < C.vs; ++by)
                            for (int bx = 0; bx < C.hs; ++bx)
                                if (!block(C, mx * C.hs + bx,
                                           my * C.vs + by))
                                    return false;
                    }
                    if (until_restart > 0) --until_restart;
                }
        }
        return true;
    };

    for (size_t off = 2; off + 4 <= d.size();) {
        if (d[off] != 0xFF) return false;
        const uint8_t m = d[off + 1];
        if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) { off += 2; continue; }
        if (m == 0xD9) break;  // EOI
        const size_t len = static_cast<size_t>(u16(off + 2));
        if (len < 2 || off + 2 + len > d.size()) return false;
        const uint8_t* seg = &d[off + 4];
        const size_t seglen = len - 2;
        if (m == 0xDB) {  // DQT: one or more tables
            for (size_t i = 0; i < seglen;) {
                const int prec = seg[i] >> 4, id = seg[i] & 15;
                if (id > 3) return false;
                ++i;
                if (i + (prec ? 128u : 64u) > seglen) return false;
                for (int k = 0; k < 64; ++k)
                    if (prec) { qt[id][k] = static_cast<uint16_t>(
                                    (seg[i] << 8) | seg[i + 1]); i += 2; }
                    else qt[id][k] = seg[i++];
            }
        } else if (m == 0xC4) {  // DHT: one or more tables
            for (size_t i = 0; i < seglen;) {
                const int cls = seg[i] >> 4, id = seg[i] & 15;
                if (id > 3 || cls > 1) return false;
                ++i;
                if (i + 16 > seglen) return false;
                uint8_t counts[16];
                int nvals = 0;
                for (int k = 0; k < 16; ++k) { counts[k] = seg[i + k];
                                               nvals += counts[k]; }
                i += 16;
                if (nvals > 256 ||
                    i + static_cast<size_t>(nvals) > seglen)
                    return false;
                (cls ? hac : hdc)[id].build(counts, &seg[i], nvals);
                i += static_cast<size_t>(nvals);
            }
        } else if (m == 0xC0 || m == 0xC1 || m == 0xC2) {  // SOF0/1/2
            if (got_sof) return false;
            if (seglen < 6) return false;
            if (seg[0] != 8) return false;   // 8-bit precision only
            H = u16(off + 5);
            W = u16(off + 7);
            ncomp = seg[5];
            if (ncomp != 1 && ncomp != 3) return false;
            if (seglen < 6 + 3 * static_cast<size_t>(ncomp)) return false;
            for (int i = 0; i < ncomp; ++i) {
                comp[i].id = seg[6 + 3 * i];
                comp[i].hs = seg[7 + 3 * i] >> 4;
                comp[i].vs = seg[7 + 3 * i] & 15;
                comp[i].tq = seg[8 + 3 * i];
                if (comp[i].hs < 1 || comp[i].hs > 2 || comp[i].vs < 1 ||
                    comp[i].vs > 2 || comp[i].tq > 3)
                    return false;
            }
            // SOF dimensions size the coefficient stores; cap before
            // allocation (a mangled header can declare 65535x65535).
            if (!W || !H || !pt_dims_ok(W, H)) return false;
            for (int i = 0; i < ncomp; ++i) {
                hmax = comp[i].hs > hmax ? comp[i].hs : hmax;
                vmax = comp[i].vs > vmax ? comp[i].vs : vmax;
            }
            mcux = (W + 8 * hmax - 1) / (8 * hmax);
            mcuy = (H + 8 * vmax - 1) / (8 * vmax);
            for (int i = 0; i < ncomp; ++i) {
                Component& C = comp[i];
                C.bw = mcux * C.hs;
                C.bh = mcuy * C.vs;
                C.nbw = (W * C.hs + 8 * hmax - 1) / (8 * hmax);
                C.nbh = (H * C.vs + 8 * vmax - 1) / (8 * vmax);
                C.coef.assign(static_cast<size_t>(C.bw) * C.bh * 64, 0);
            }
            got_sof = true;
        } else if (m == 0xDD) {  // DRI
            if (seglen < 2) return false;
            restart_interval = u16(off + 4);
        } else if (m == 0xDA) {  // SOS (one of possibly many)
            if (!got_sof || seglen < 1) return false;
            const int ns = seg[0];
            if (ns < 1 || ns > ncomp) return false;
            if (seglen < 1 + 2 * static_cast<size_t>(ns) + 3) return false;
            Component* sc[3] = {nullptr, nullptr, nullptr};
            for (int i = 0; i < ns; ++i) {
                const int cid = seg[1 + 2 * i];
                for (int j = 0; j < ncomp; ++j)
                    if (comp[j].id == cid) {
                        comp[j].td = seg[2 + 2 * i] >> 4;
                        comp[j].ta = seg[2 + 2 * i] & 15;
                        sc[i] = &comp[j];
                    }
                if (!sc[i]) return false;
            }
            const int Ss = seg[1 + 2 * ns];
            const int Se = seg[2 + 2 * ns];
            const int Ah = seg[3 + 2 * ns] >> 4;
            const int Al = seg[3 + 2 * ns] & 15;
            if (Ss > 63 || Se > 63 || Se < Ss || Al > 13) return false;
            if (Ss > 0 && ns != 1) return false;  // AC scans: 1 component
            const size_t scan_off = off + 2 + len;
            size_t e = scan_off;
            while (e + 1 < d.size() &&
                   !(d[e] == 0xFF && d[e + 1] != 0x00 &&
                     !(d[e + 1] >= 0xD0 && d[e + 1] <= 0xD7)))
                ++e;
            if (!decode_scan(sc, ns, Ss, Se, Ah, Al, scan_off,
                             e - scan_off))
                return false;
            any_scan = true;
            off = e;
            continue;
        }
        off += 2 + len;
    }
    if (!got_sof || !any_scan) return false;

    // dequantize + un-zigzag + IDCT every block into the sample planes
    for (int i = 0; i < ncomp; ++i) {
        Component& C = comp[i];
        C.plane.assign(static_cast<size_t>(C.bw) * C.bh * 64, 0);
        for (int by = 0; by < C.bh; ++by)
            for (int bx = 0; bx < C.bw; ++bx) {
                const int32_t* cf =
                    &C.coef[(static_cast<size_t>(by) * C.bw + bx) * 64];
                float blk[64];
                for (int k = 0; k < 64; ++k)
                    blk[kZigzag[k]] =
                        static_cast<float>(cf[k]) * qt[C.tq][k];
                uint8_t px[64];
                idct8x8(blk, px);
                const int ox = bx * 8, oy = by * 8;
                for (int y = 0; y < 8; ++y)
                    std::memcpy(&C.plane[(static_cast<size_t>(oy) + y) *
                                         C.bw * 8 + ox],
                                &px[y * 8], 8);
            }
    }

    out_px->resize(static_cast<size_t>(W) * H);
    *out_w = W;
    *out_h = H;
    for (int y = 0; y < H; ++y)
        for (int x = 0; x < W; ++x) {
            int r, g, b2;
            auto samp = [&](const ptjpeg::Component& C) {
                const int sx = x * C.hs / hmax, sy = y * C.vs / vmax;
                return static_cast<int>(
                    C.plane[static_cast<size_t>(sy) * C.bw * 8 + sx]);
            };
            if (ncomp == 1) {
                r = g = b2 = samp(comp[0]);
            } else {
                const int Y = samp(comp[0]);
                const int cb = samp(comp[1]) - 128;
                const int cr = samp(comp[2]) - 128;
                r = static_cast<int>(std::lround(Y + 1.402 * cr));
                g = static_cast<int>(
                    std::lround(Y - 0.344136 * cb - 0.714136 * cr));
                b2 = static_cast<int>(std::lround(Y + 1.772 * cb));
                r = r < 0 ? 0 : (r > 255 ? 255 : r);
                g = g < 0 ? 0 : (g > 255 ? 255 : g);
                b2 = b2 < 0 ? 0 : (b2 > 255 ? 255 : b2);
            }
            (*out_px)[static_cast<size_t>(y) * W + x] =
                static_cast<uint32_t>(b2) | (g << 8) | (r << 16) |
                (0xFFu << 24);
        }
    return true;
}
