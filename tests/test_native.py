"""Native C++ components == numpy fallbacks; standalone tool behavior."""

import subprocess

import numpy as np
import pytest

from pathtracer_tpu import native
from pathtracer_tpu.compare import percentage_similarity
from pathtracer_tpu.io.bmp import write_bmp
from pathtracer_tpu.scene.accel import CELL_SIZE, GRID_RES
from pathtracer_tpu.scene.schema import WORLD_MARIO
from pathtracer_tpu.scene.worlds import build_world

needs_native = pytest.mark.skipif(
    not native.available(), reason="native lib not built (make -C native)")


def _numpy_grid(tris):
    """The pure-numpy reference binning (mirrors scene/accel.py fallback)."""
    from pathtracer_tpu.scene.accel import voxel_coords
    T = len(tris)
    coords = voxel_coords(tris.reshape(-1, 3)).reshape(T, 3, 3)
    lo, hi = coords.min(axis=1), coords.max(axis=1)
    counts = np.zeros(GRID_RES ** 3, np.int64)
    spans = []
    for t in range(T):
        zz, yy, xx = np.meshgrid(
            np.arange(lo[t, 2], hi[t, 2] + 1),
            np.arange(lo[t, 1], hi[t, 1] + 1),
            np.arange(lo[t, 0], hi[t, 0] + 1), indexing="ij")
        cells = (zz * GRID_RES * GRID_RES + yy * GRID_RES + xx).ravel()
        spans.append(cells)
        np.add.at(counts, cells, 1)
    starts = np.zeros(GRID_RES ** 3 + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    refs = np.zeros(max(int(starts[-1]), 1), np.int32)
    cursor = starts[:-1].copy()
    for t in range(T):
        refs[cursor[spans[t]]] = t
        cursor[spans[t]] += 1
    return starts[:-1], counts, refs


@needs_native
class TestNativeGrid:
    def test_matches_numpy_on_mario(self):
        b, _ = build_world(WORLD_MARIO)
        tris = b.triangles.astype(np.float32)
        s_n, c_n, r_n = native.grid_build_native(
            tris.reshape(len(tris), 9), GRID_RES, CELL_SIZE)
        s_p, c_p, r_p = _numpy_grid(tris)
        np.testing.assert_array_equal(c_n, c_p)
        np.testing.assert_array_equal(s_n, s_p)
        np.testing.assert_array_equal(r_n, r_p)

    def test_out_of_bounds_raises(self):
        tris = np.array([[[0, 0, 0, 3.0, 0, 0, 0, 1, 0]]], np.float32).reshape(1, 9)
        with pytest.raises(ValueError, match="out of the world bounds"):
            native.grid_build_native(tris, GRID_RES, CELL_SIZE)


@needs_native
class TestNativeCompare:
    def test_similarity_matches_python(self, rng):
        a32 = rng.randint(0, 2**32, (16, 16), dtype=np.uint64).astype(np.uint32)
        b32 = rng.randint(0, 2**32, (16, 16), dtype=np.uint64).astype(np.uint32)

        def unpack(p):
            return np.stack([(p >> 16) & 0xFF, (p >> 8) & 0xFF,
                             p & 0xFF, (p >> 24) & 0xFF], -1).astype(np.uint8)

        for legacy in (False, True):
            py = percentage_similarity(unpack(a32), unpack(b32), legacy=legacy)
            nat = native.percentage_similarity_native(a32, b32, legacy=legacy)
            assert abs(py - nat) < 1e-9

    def test_exe_runs(self, tmp_path, rng):
        exe = native.compare_exe_path()
        assert exe is not None
        img = rng.randint(0, 2**32, (8, 12), dtype=np.uint64).astype(np.uint32)
        p1, p2 = str(tmp_path / "a.bmp"), str(tmp_path / "b.bmp")
        write_bmp(p1, img)
        write_bmp(p2, img)
        out = subprocess.run([exe, p1, p2], capture_output=True, text=True)
        assert out.returncode == 0
        assert "Percentage Similarity: 100.000000 %" in out.stdout
        assert "RMSE: 0.000000" in out.stdout

    def test_exe_reads_png_and_cross_format(self, tmp_path, rng):
        """Any-format input parity with the stbi-based reference tool
        (image_compare.c:37,47): the same image as bottom-up BMP and as
        top-down PNG (plus grayscale and palette PNGs) must compare
        RMSE 0.0."""
        from PIL import Image
        exe = native.compare_exe_path()
        rgb = rng.randint(0, 255, (9, 17, 3)).astype(np.uint8)
        packed = (0xFF000000
                  | (rgb[:, :, 0].astype(np.uint32) << 16)
                  | (rgb[:, :, 1].astype(np.uint32) << 8)
                  | rgb[:, :, 2].astype(np.uint32))
        p_bmp = str(tmp_path / "a.bmp")
        write_bmp(p_bmp, packed)
        p_png = str(tmp_path / "a.png")
        Image.fromarray(rgb[::-1]).save(p_png)  # row 0 = top in PNG
        out = subprocess.run([exe, p_bmp, p_png], capture_output=True,
                             text=True)
        assert out.returncode == 0 and "RMSE: 0.000000" in out.stdout
        for mode, name in (("L", "g.png"), ("P", "p.png")):
            p = str(tmp_path / name)
            Image.fromarray(rgb[::-1]).convert(mode).save(p)
            out = subprocess.run([exe, p, p], capture_output=True, text=True)
            assert out.returncode == 0 and "RMSE: 0.000000" in out.stdout

    def test_exe_reads_jpeg(self, tmp_path, rng):
        """The baseline JPEG decoder (native/src/jpeg_decode.cpp — the
        remaining stbi input-format role, stb_image.h JPG support): the
        tool's own decode of a JPEG vs PIL's decode of the SAME file
        (saved as PNG) must agree to within decoder rounding (IDCT +
        chroma upsampling differ between implementations); grayscale and
        each subsampling mode, including non-MCU-aligned sizes."""
        from PIL import Image
        exe = native.compare_exe_path()
        for i, (w, h, sub, gray) in enumerate(
                [(64, 48, 0, False), (100, 75, 2, False),
                 (33, 17, 1, False), (40, 40, 0, True)]):
            x = np.linspace(0, 1, w)[None, :, None]
            y = np.linspace(0, 1, h)[:, None, None]
            img = (128 + 100 * np.sin(6 * x) * np.cos(4 * y)
                   + rng.randn(h, w, 1) * 8
                   + np.array([10, -5, 20])[None, None, :])
            img = np.clip(img, 0, 255).astype(np.uint8)
            pim = (Image.fromarray(img[..., 0], "L") if gray
                   else Image.fromarray(img, "RGB"))
            p_jpg = str(tmp_path / f"t{i}.jpg")
            pim.save(p_jpg, quality=90, subsampling=sub)
            dec = np.asarray(Image.open(p_jpg).convert("RGB"))
            p_png = str(tmp_path / f"t{i}.png")
            Image.fromarray(dec).save(p_png)
            out = subprocess.run([exe, p_jpg, p_png, "--threshold", "0.005"],
                                 capture_output=True, text=True)
            assert out.returncode == 0, out.stdout
            rmse = float(out.stdout.split("RMSE:")[1].split()[0])
            assert rmse < 0.002, (i, out.stdout)

    def test_exe_reads_tga_gif_pnm(self, tmp_path, rng):
        """TGA (raw + RLE, color + gray), GIF (palettized LZW) and binary
        PNM (P5/P6) decoders (native/src/formats.cpp — the rest of the
        stbi input class, stb_image.h): each format vs a PNG of PIL's
        decode of the SAME file must be pixel-identical."""
        from PIL import Image
        exe = native.compare_exe_path()
        rgb = rng.randint(0, 255, (13, 21, 3)).astype(np.uint8)
        cases = [
            ("t.tga", "RGB", {}),
            ("trle.tga", "RGB", {"compression": "tga_rle"}),
            ("g.tga", "L", {}),
            ("grle.tga", "L", {"compression": "tga_rle"}),
            ("p.tga", "P", {}),  # colormapped (type 1)
            ("t.gif", "P", {}),
            ("t.ppm", "RGB", {}),
            ("g.pgm", "L", {}),
        ]
        for name, mode, kw in cases:
            p = str(tmp_path / name)
            Image.fromarray(rgb).convert(mode).save(p, **kw)
            dec = np.asarray(Image.open(p).convert("RGB"))
            p_png = str(tmp_path / (name + ".png"))
            Image.fromarray(dec).save(p_png)
            out = subprocess.run([exe, p, p_png], capture_output=True,
                                 text=True)
            assert out.returncode == 0 and "RMSE: 0.000000" in out.stdout, (
                name, out.stdout)

    def test_exe_rejects_malformed_jpeg(self, tmp_path, rng):
        """Truncated/short JPEG segments must fail CLEANLY (nonzero exit,
        no crash): each header below declares a segment length that runs
        past EOF or is too short for its payload (the bounds-check class
        in jpeg_decode.cpp's marker parser), and random truncations of a
        real JPEG must never kill the process with a signal."""
        from PIL import Image
        exe = native.compare_exe_path()
        headers = [
            bytes([0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x02]),  # SOF0 len=2 @EOF
            bytes([0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x03, 0x00]),  # short DQT
            bytes([0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x03, 0x00]),  # short DHT
            bytes([0xFF, 0xD8, 0xFF, 0xDD, 0x00, 0x03, 0x00]),  # short DRI
            bytes([0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x03, 0x01]),  # short SOS
        ]
        for i, payload in enumerate(headers):
            p = str(tmp_path / f"bad{i}.jpg")
            with open(p, "wb") as f:
                f.write(payload)
            out = subprocess.run([exe, p, p], capture_output=True, text=True)
            assert out.returncode > 0, (i, out.returncode, out.stdout)
        good = str(tmp_path / "good.jpg")
        img = rng.randint(0, 255, (24, 32, 3)).astype(np.uint8)
        Image.fromarray(img).save(good, quality=85)
        data = open(good, "rb").read()
        for i, cut in enumerate(range(2, len(data), 7)):
            p = str(tmp_path / f"cut{i}.jpg")
            with open(p, "wb") as f:
                f.write(data[:cut])
            out = subprocess.run([exe, p, p], capture_output=True, text=True)
            # graceful outcome either way; a SIGNAL death is the failure
            assert out.returncode >= 0, (cut, out.returncode)

    def test_exe_reads_psd(self, tmp_path, rng):
        """PSD (raw + PackBits RLE, RGB + grayscale), hand-built files:
        PIL reads PSD, so gate vs PIL's decode saved as PNG."""
        import struct
        from PIL import Image
        exe = native.compare_exe_path()

        def packbits(row):
            # Simple PackBits encoder: literals + runs >= 3.
            out = bytearray()
            i = 0
            while i < len(row):
                run = 1
                while (i + run < len(row) and row[i + run] == row[i]
                       and run < 127):
                    run += 1
                if run >= 3:
                    out += bytes([257 - run, row[i]])
                    i += run
                else:
                    j = i + 1
                    while (j < len(row) and j - i < 127
                           and not (j + 2 < len(row) and row[j] == row[j + 1]
                                    == row[j + 2])):
                        j += 1
                    out += bytes([j - i - 1]) + bytes(row[i:j])
                    i = j
            return bytes(out)

        def write_psd(path, arr, compression):
            h, w, ch = arr.shape
            hdr = (b"8BPS" + struct.pack(">H", 1) + b"\0" * 6
                   + struct.pack(">HIIHH", ch, h, w, 8, 3 if ch >= 3 else 1)
                   + struct.pack(">I", 0) * 3 + struct.pack(">H", compression))
            body = b""
            if compression == 0:
                body = arr.transpose(2, 0, 1).tobytes()
            else:
                rows = [packbits(arr[y, :, c].tobytes())
                        for c in range(ch) for y in range(h)]
                body = b"".join(struct.pack(">H", len(r)) for r in rows)
                body += b"".join(rows)
            with open(path, "wb") as f:
                f.write(hdr + body)

        rgb = rng.randint(0, 255, (11, 19, 3)).astype(np.uint8)
        # A flat band makes the RLE run path actually fire.
        rgb[3:6] = 77
        gray = rgb[:, :, :1]
        for i, (arr, comp) in enumerate([(rgb, 0), (rgb, 1), (gray, 1)]):
            p = str(tmp_path / f"t{i}.psd")
            write_psd(p, arr, comp)
            dec = np.asarray(Image.open(p).convert("RGB"))
            p_png = str(tmp_path / f"t{i}.psd.png")
            Image.fromarray(dec).save(p_png)
            out = subprocess.run([exe, p, p_png], capture_output=True,
                                 text=True)
            assert out.returncode == 0 and "RMSE: 0.000000" in out.stdout, (
                i, out.stdout)

    def test_exe_reads_hdr(self, tmp_path, rng):
        """Radiance HDR (flat and adaptive-RLE scanlines), hand-encoded
        RGBE: the tool's LDR conversion must match stbi's formula
        (mantissa * 2^(E-136), gamma 1/2.2, *255+0.5) computed in numpy.
        PIL does not read HDR, so the expectation is the formula itself."""
        from PIL import Image
        exe = native.compare_exe_path()
        w, h = 24, 7
        rgbe = rng.randint(0, 255, (h, w, 4)).astype(np.uint8)
        rgbe[..., 3] = rng.randint(120, 140, (h, w))  # sane exponents
        rgbe[0, 0] = (10, 20, 30, 0)  # E=0 -> black
        rgbe[2, 4:20] = (200, 100, 50, 130)  # a run for the RLE encoding

        f = np.where(rgbe[..., 3:] == 0, 0.0,
                     np.ldexp(1.0, rgbe[..., 3:].astype(np.int32) - 136))
        ldr = np.clip(rgbe[..., :3] * f, 0, None) ** (1 / 2.2) * 255.0 + 0.5
        expect = np.clip(ldr, 0, 255).astype(np.uint8)
        expect[0, 0] = 0
        p_png = str(tmp_path / "expect.png")
        Image.fromarray(expect).save(p_png)

        header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + (
            f"-Y {h} +X {w}\n".encode())
        p_flat = str(tmp_path / "flat.hdr")
        with open(p_flat, "wb") as fh:
            fh.write(header + rgbe.tobytes())
        p_rle = str(tmp_path / "rle.hdr")
        with open(p_rle, "wb") as fh:
            fh.write(header)
            for y in range(h):  # adaptive RLE: 2,2,hi,lo then 4 planes
                fh.write(bytes([2, 2, w >> 8, w & 0xFF]))
                for c in range(4):
                    row = rgbe[y, :, c]
                    x = 0
                    while x < w:
                        run = 1
                        while x + run < w and row[x + run] == row[x] and run < 126:
                            run += 1
                        if run >= 3:
                            fh.write(bytes([128 + run, row[x]]))
                            x += run
                        else:
                            fh.write(bytes([run]) + row[x:x + run].tobytes())
                            x += run
        for p in (p_flat, p_rle):
            out = subprocess.run([exe, p, p_png, "--threshold", "0.01"],
                                 capture_output=True, text=True)
            assert out.returncode == 0, (p, out.stdout)
            rmse = float(out.stdout.split("RMSE:")[1].split()[0])
            # float32 pow vs numpy float64 can differ by 1 ulp at a .5
            # rounding boundary; identical otherwise.
            assert rmse < 0.003, (p, out.stdout)

    def test_exe_reads_pic(self, tmp_path, rng):
        """Softimage PIC (the last stbi input format, stb_image.h
        stbi__pic_*), hand-encoded: uncompressed, pure-RLE and mixed-RLE
        channel packets, RGB and RGBA. PIL does not read PIC, so the
        expectation is the encoded array itself saved as PNG."""
        import struct
        from PIL import Image
        exe = native.compare_exe_path()

        def pic_header(w, h):
            return (bytes([0x53, 0x80, 0xF6, 0x34]) + b"\0" * 84 + b"PICT"
                    + struct.pack(">HH", w, h) + struct.pack(">f", 1.0)
                    + struct.pack(">HH", 3, 0))

        def packet(chained, ptype, channel):
            return bytes([1 if chained else 0, 8, ptype, channel])

        def mixed_rle(row):
            # rows of (n, ch) samples -> stbi mixed-RLE byte stream
            out, i = bytearray(), 0
            n = len(row)
            while i < n:
                run = 1
                while (i + run < n and (row[i + run] == row[i]).all()
                       and run < 120):
                    run += 1
                if run >= 2:
                    if run > 128:
                        out += bytes([128]) + struct.pack(">H", run)
                    else:
                        out += bytes([127 + run])
                    out += row[i].tobytes()
                    i += run
                else:
                    j = i + 1
                    while (j < n and j - i < 128
                           and not (j + 1 < n
                                    and (row[j] == row[j + 1]).all())):
                        j += 1
                    out += bytes([j - i - 1]) + row[i:j].tobytes()
                    i = j
            return bytes(out)

        rgb = rng.randint(0, 255, (9, 17, 3)).astype(np.uint8)
        rgb[2:5, 3:14] = 200  # runs for the RLE forms
        alpha = rng.randint(0, 255, (9, 17, 1)).astype(np.uint8)
        alpha[4:7] = 128
        h, w = rgb.shape[:2]

        cases = {}
        # uncompressed RGB: one packet, row-major interleaved RGB
        cases["raw.pic"] = (pic_header(w, h) + packet(0, 0, 0xE0)
                            + rgb.tobytes(), rgb)
        # pure RLE RGB: [count, R, G, B] covering each row exactly
        body = bytearray()
        for y in range(h):
            x = 0
            while x < w:
                run = 1
                while (x + run < w and (rgb[y, x + run] == rgb[y, x]).all()
                       and run < 255):
                    run += 1
                body += bytes([run]) + rgb[y, x].tobytes()
                x += run
        cases["rle.pic"] = (pic_header(w, h) + packet(0, 1, 0xE0)
                            + bytes(body), rgb)
        # mixed RLE, RGB + separate alpha packet (RGBA result)
        body = bytearray()
        for y in range(h):
            body += mixed_rle(rgb[y])
            body += mixed_rle(alpha[y])
        rgba = np.concatenate([rgb, alpha], axis=-1)
        cases["mixed.pic"] = (pic_header(w, h)
                              + packet(1, 2, 0xE0) + packet(0, 2, 0x10)
                              + bytes(body), rgba)

        for name, (data, expect) in cases.items():
            p = tmp_path / name
            p.write_bytes(data)
            p_png = str(tmp_path / (name + ".png"))
            Image.fromarray(expect).save(p_png)
            out = subprocess.run([exe, str(p), p_png], capture_output=True,
                                 text=True)
            assert out.returncode == 0 and "RMSE: 0.000000" in out.stdout, (
                name, out.returncode, out.stdout, out.stderr)

    def test_compare_py_falls_back_to_native_for_pic(self, tmp_path, rng):
        """The Python tool delegates PIL-unreadable formats (HDR, PIC) to
        the native exe so both tools cover the full stbi input class."""
        import struct
        from PIL import Image

        from pathtracer_tpu.compare import main as compare_main

        rgb = rng.randint(0, 255, (7, 11, 3)).astype(np.uint8)
        h, w = rgb.shape[:2]
        pic = tmp_path / "x.pic"
        pic.write_bytes(bytes([0x53, 0x80, 0xF6, 0x34]) + b"\0" * 84
                        + b"PICT" + struct.pack(">HHfHH", w, h, 1.0, 3, 0)
                        + bytes([0, 8, 0, 0xE0]) + rgb.tobytes())
        png = tmp_path / "x.png"
        Image.fromarray(rgb).save(str(png))
        import io as _io
        from contextlib import redirect_stdout
        buf = _io.StringIO()
        with redirect_stdout(buf):
            rc = compare_main([str(pic), str(png), "--json"])
        import json as _json
        rec = _json.loads(buf.getvalue().strip().splitlines()[-1])
        assert rc == 0 and rec["rmse"] == 0.0, (rc, buf.getvalue())

    def test_exe_error_paths(self, tmp_path, rng):
        exe = native.compare_exe_path()
        img = rng.randint(0, 2**32, (8, 12), dtype=np.uint64).astype(np.uint32)
        p1 = str(tmp_path / "a.bmp")
        write_bmp(p1, img)
        out = subprocess.run([exe, p1, "/nope.bmp"], capture_output=True, text=True)
        assert "invalid file path" in out.stdout
        img2 = rng.randint(0, 2**32, (8, 10), dtype=np.uint64).astype(np.uint32)
        p2 = str(tmp_path / "b.bmp")
        write_bmp(p2, img2)
        out = subprocess.run([exe, p1, p2], capture_output=True, text=True)
        assert "must have same width" in out.stdout

    def test_exe_survives_mutated_inputs(self, tmp_path, rng):
        """Cross-format truncation/corruption fuzz, extending the JPEG
        truncation test to every from-scratch decoder (formats.cpp TGA/
        GIF/PSD/HDR/PNM + the BMP/PNG/JPEG readers): a mangled file must
        fail CLEANLY (any exit code), never die by signal. A 12.6k-case
        sweep of this corpus ran clean under ASan+UBSan; this is the
        fast deterministic regression slice of it."""
        import struct
        from PIL import Image
        exe = native.compare_exe_path()
        rgb = rng.randint(0, 255, (13, 21, 3)).astype(np.uint8)
        rgb[4:7] = 99  # flat band so the RLE encoders emit real runs

        seeds = {}
        for name, mode, kw in [("a.bmp", "RGB", {}), ("a.png", "RGB", {}),
                               ("a.jpg", "RGB", {"quality": 85}),
                               ("a.tga", "RGB", {}),
                               ("r.tga", "RGB", {"rle": True}),
                               ("a.gif", "P", {}), ("a.ppm", "RGB", {}),
                               ("a.pgm", "L", {})]:
            p = tmp_path / name
            Image.fromarray(rgb).convert(mode).save(str(p), **kw)
            seeds[name] = p.read_bytes()

        def rle(row, run_byte, lit_byte):
            """Shared RLE encoder: PSD PackBits (run 257-n, literal n-1)
            vs HDR adaptive (run 128+n, literal n) differ only in how the
            count byte is formed."""
            out, i = bytearray(), 0
            while i < len(row):
                run = 1
                while (i + run < len(row) and row[i + run] == row[i]
                       and run < 127):
                    run += 1
                if run >= 3:
                    out += bytes([run_byte(run), row[i]])
                    i += run
                else:
                    out += bytes([lit_byte(1), row[i]])
                    i += 1
            return bytes(out)

        def packbits(row):
            return rle(row, lambda n: 257 - n, lambda n: n - 1)

        def hdr_rle(row):
            return rle(row, lambda n: 128 + n, lambda n: n)

        h, w, ch = rgb.shape
        rows = [packbits(rgb[y, :, c].tobytes())
                for c in range(ch) for y in range(h)]
        seeds["a.psd"] = (
            b"8BPS" + struct.pack(">H", 1) + b"\0" * 6
            + struct.pack(">HIIHH", ch, h, w, 8, 3)
            + struct.pack(">I", 0) * 3 + struct.pack(">H", 1)
            + b"".join(struct.pack(">H", len(r)) for r in rows)
            + b"".join(rows))

        rgbe = np.concatenate(
            [rgb, np.full((h, w, 1), 130, np.uint8)], axis=-1)
        hdr = bytearray(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
                        + f"-Y {h} +X {w}\n".encode())
        for y in range(h):  # adaptive-RLE scanlines
            hdr += bytes([2, 2, w >> 8, w & 0xFF])
            for c in range(4):
                hdr += hdr_rle(rgbe[y, :, c].tobytes())
        seeds["a.hdr"] = bytes(hdr)

        seeds["a.pic"] = (  # Softimage PIC, one uncompressed RGB packet
            bytes([0x53, 0x80, 0xF6, 0x34]) + b"\0" * 84 + b"PICT"
            + struct.pack(">HHfHH", w, h, 1.0, 3, 0)
            + bytes([0, 8, 0, 0xE0]) + rgb.tobytes())

        for name, data in sorted(seeds.items()):
            mut = tmp_path / ("mut_" + name)
            mut.write_bytes(data)  # pristine seed must decode (not vacuous)
            out = subprocess.run([exe, str(mut), str(mut)],
                                 capture_output=True, timeout=60)
            assert out.returncode == 0, (name, out.stdout, out.stderr)
            cases = [data[:cut]
                     for cut in range(1, len(data), max(1, len(data) // 24))]
            for off in range(0, len(data), max(1, len(data) // 24)):
                for val in (0x00, 0xFF):
                    b = bytearray(data)
                    b[off] = val
                    cases.append(bytes(b))
            for case in cases:
                mut.write_bytes(case)
                out = subprocess.run([exe, str(mut), str(mut)],
                                     capture_output=True, timeout=60)
                assert out.returncode >= 0, (
                    name, len(case), out.returncode)


@needs_native
class TestPngFullInputClass:
    """16-bit, sub-8-bit and Adam7-interlaced PNGs — the rest of the input
    class the reference tool accepts via stbi_load (image_compare.c:37,47).
    Fixtures are hand-crafted (PIL cannot WRITE interlaced or 16-bit-RGB
    PNGs); each fixture is first decoded with PIL to prove the fixture
    itself is well-formed, then the native tool must match the expected
    8-bit reduction at RMSE 0.0 (16-bit reduces by high byte — stb's
    stbi__convert_16_to_8 — which PIL's I;16 path also produces)."""

    @staticmethod
    def _chunk(typ, body):
        import struct
        import zlib
        return (struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    def _write_png(self, path, w, h, depth, color_type, interlace, raw):
        import struct
        import zlib
        ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                           interlace)
        with open(path, "wb") as fh:
            fh.write(b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr)
                     + self._chunk(b"IDAT", zlib.compress(raw))
                     + self._chunk(b"IEND", b""))

    @staticmethod
    def _adam7_raw(img):
        """Filter-0 Adam7 scanline stream for an (H, W, C) uint8 image."""
        XO = [0, 4, 0, 2, 0, 1, 0]
        YO = [0, 0, 4, 0, 2, 0, 1]
        XS = [8, 8, 4, 4, 2, 2, 1]
        YS = [8, 8, 8, 4, 4, 2, 2]
        raw = b""
        for p in range(7):
            sub = img[YO[p]::YS[p], XO[p]::XS[p]]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw += b"\x00" + row.tobytes()
        return raw

    def _assert_tool_matches(self, tmp_path, fixture_path, expected_rgb):
        from PIL import Image
        exe = native.compare_exe_path()
        ref = str(tmp_path / "expected.png")
        Image.fromarray(expected_rgb).save(ref)
        out = subprocess.run([exe, fixture_path, ref], capture_output=True,
                             text=True)
        assert out.returncode == 0, out.stderr
        assert "RMSE: 0.000000" in out.stdout, out.stdout

    def test_16bit_rgb(self, tmp_path, rng):
        from PIL import Image
        w, h = 13, 9
        hi = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        lo = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        px16 = (hi.astype(np.uint16) << 8) | lo
        raw = b"".join(b"\x00" + px16[y].astype(">u2").tobytes()
                       for y in range(h))
        p = str(tmp_path / "rgb16.png")
        self._write_png(p, w, h, 16, 2, 0, raw)
        pil = np.asarray(Image.open(p).convert("RGB"))  # PIL proves fixture
        np.testing.assert_array_equal(pil, hi)
        self._assert_tool_matches(tmp_path, p, hi)

    def test_16bit_gray_pil_written(self, tmp_path, rng):
        from PIL import Image
        w, h = 11, 7
        g16 = rng.randint(0, 65535, (h, w)).astype(np.uint16)
        p = str(tmp_path / "g16.png")
        Image.fromarray(g16, mode="I;16").save(p)
        expected = np.repeat((g16 >> 8).astype(np.uint8)[:, :, None], 3, 2)
        self._assert_tool_matches(tmp_path, p, expected)

    def test_interlaced_rgb(self, tmp_path, rng):
        from PIL import Image
        w, h = 19, 13  # non-multiples of 8 exercise partial passes
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        p = str(tmp_path / "adam7.png")
        self._write_png(p, w, h, 8, 2, 1, self._adam7_raw(img))
        pil = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(pil, img)
        self._assert_tool_matches(tmp_path, p, img)

    def test_interlaced_16bit_rgba(self, tmp_path, rng):
        from PIL import Image
        w, h = 10, 6
        hi = rng.randint(0, 255, (h, w, 4)).astype(np.uint8)
        hi[:, :, 3] = 255  # opaque (the compare includes alpha)
        px16 = (hi.astype(np.uint16) << 8) | 0x33
        be = px16.astype(">u2").view(np.uint8).reshape(h, w, 8)
        p = str(tmp_path / "adam7_16.png")
        self._write_png(p, w, h, 16, 6, 1, self._adam7_raw(be))
        pil = np.asarray(Image.open(p).convert("RGBA"))
        np.testing.assert_array_equal(pil, hi)
        self._assert_tool_matches(tmp_path, p, hi[:, :, :3])

    def test_1bit_and_4bit_gray(self, tmp_path, rng):
        from PIL import Image
        w, h = 17, 5
        bits = rng.randint(0, 2, (h, w)).astype(np.uint8)
        p1 = str(tmp_path / "g1.png")
        raw = b""
        for y in range(h):
            packed = np.packbits(bits[y])
            raw += b"\x00" + packed.tobytes()
        self._write_png(p1, w, h, 1, 0, 0, raw)
        exp1 = np.repeat((bits * 255)[:, :, None], 3, 2)
        np.testing.assert_array_equal(
            np.asarray(Image.open(p1).convert("RGB")), exp1)
        self._assert_tool_matches(tmp_path, p1, exp1)
        nib = rng.randint(0, 16, (h, w)).astype(np.uint8)
        p4 = str(tmp_path / "g4.png")
        raw = b""
        for y in range(h):
            row = nib[y]
            if w % 2:
                row = np.concatenate([row, [0]]).astype(np.uint8)
            packed = (row[0::2] << 4) | row[1::2]
            raw += b"\x00" + packed.astype(np.uint8).tobytes()
        self._write_png(p4, w, h, 4, 0, 0, raw)
        exp4 = np.repeat((nib * 17)[:, :, None], 3, 2)
        np.testing.assert_array_equal(
            np.asarray(Image.open(p4).convert("RGB")), exp4)
        self._assert_tool_matches(tmp_path, p4, exp4)


@needs_native
class TestProgressiveJpeg:
    def test_exe_reads_progressive_jpeg(self, tmp_path, rng):
        """Progressive (SOF2) JPEG — the last unsupported stbi input
        class (image_compare.c:37,47 accepts it via stb_image). PIL
        writes spectral-selection + successive-approximation scans
        (DC/AC first + refinement, EOB runs); the tool's decode vs PIL's
        decode of the SAME file must agree to decoder rounding, for
        grayscale and every chroma subsampling, restart markers
        included, at non-MCU-aligned sizes."""
        from PIL import Image
        exe = native.compare_exe_path()
        for i, (w, h, sub, gray, rst) in enumerate(
                [(64, 48, 0, False, 0), (100, 75, 2, False, 0),
                 (33, 17, 1, False, 0), (40, 40, 0, True, 0),
                 (80, 50, 2, False, 4)]):
            x = np.linspace(0, 1, w)[None, :, None]
            y = np.linspace(0, 1, h)[:, None, None]
            img = (128 + 100 * np.sin(6 * x) * np.cos(4 * y)
                   + rng.randn(h, w, 1) * 8
                   + np.array([10, -5, 20])[None, None, :])
            img = np.clip(img, 0, 255).astype(np.uint8)
            pim = (Image.fromarray(img[..., 0], "L") if gray
                   else Image.fromarray(img, "RGB"))
            p_jpg = str(tmp_path / f"p{i}.jpg")
            kw = dict(quality=85, subsampling=sub, progressive=True)
            if rst:
                kw["restart_marker_rows"] = rst
            try:
                pim.save(p_jpg, **kw)
            except TypeError:  # older PIL: no restart_marker_rows
                kw.pop("restart_marker_rows", None)
                pim.save(p_jpg, **kw)
            with open(p_jpg, "rb") as fh:
                data = fh.read()
            assert b"\xff\xc2" in data, "fixture is not progressive"
            dec = np.asarray(Image.open(p_jpg).convert("RGB"))
            p_png = str(tmp_path / f"p{i}.png")
            Image.fromarray(dec).save(p_png)
            out = subprocess.run([exe, p_jpg, p_png, "--threshold", "0.005"],
                                 capture_output=True, text=True)
            assert out.returncode == 0, (i, out.stdout, out.stderr)
            rmse = float(out.stdout.split("RMSE:")[1].split()[0])
            assert rmse < 0.002, (i, out.stdout)
