// Standalone image comparison tool — the ImageCompare.exe role
// (reference src/image_compare.c, built by build.bat:4).
//
// Reads two 32-bit bottom-up DIB BMPs (the renderer's byte-identical output
// format, io/bmp.py / win32_main.cpp:358-391) and prints the reference's
// "Percentage Similarity" metric (image_compare.c:79-103) plus RMSE (the
// BASELINE.json gate). The reference's Magnitude has a bug (uses v.a twice
// and never v.r, image_compare.c:121-124); the fixed metric is the default
// and --legacy reproduces the bug bit-for-bit for parity checks.
//
// Usage: image_compare img1.bmp img2.bmp [--legacy] [--threshold X]
// Exit: 0 ok (and RMSE <= threshold if given), 1 over threshold, -1 error.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Image {
    int w = 0, h = 0;
    std::vector<uint32_t> px;  // BGRA packed, row 0 = bottom (as stored)
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
    if (u16(0) != 0x4D42 || u16(28) != 32) { std::fclose(f); return false; }
    const uint32_t offset = u32(10);
    const int32_t w = static_cast<int32_t>(u32(18));
    const int32_t h = static_cast<int32_t>(u32(22));
    out->w = w;
    out->h = h < 0 ? -h : h;
    out->px.resize(static_cast<size_t>(out->w) * out->h);
    if (std::fseek(f, static_cast<long>(offset), SEEK_SET) != 0 ||
        std::fread(out->px.data(), 4, out->px.size(), f) != out->px.size()) {
        std::fclose(f);
        return false;
    }
    std::fclose(f);
    return true;
}

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
    if (!load_bmp(p1, &a)) { std::printf("Error: '%s' is an invalid file path\n", p1); return -1; }
    if (!load_bmp(p2, &b)) { std::printf("Error: '%s' is an invalid file path\n", p2); return -1; }
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
