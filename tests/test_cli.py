"""CLI flag parsing (ParseArgs semantics, win32_main.cpp:2110-2195)."""

import numpy as np
import pytest

from pathtracer_tpu.cli import _parse_reference_flags, print_help


class TestReferenceFlags:
    def test_concatenated_flags(self):
        # the reference's style: -t16 -p16 -nmr (README.md:51)
        ref, rest = _parse_reference_flags(["-t16", "-p16", "-nmr"])
        assert ref["t"] == 16 and ref["p"] == 16
        assert ref["n"] and ref["m"] and ref["r"]
        assert not ref["d"] and rest == []

    def test_world_and_dof(self):
        ref, _ = _parse_reference_flags(["-w3", "-d"])
        assert ref["w"] == 3 and ref["d"]

    def test_mixed_with_long_options(self):
        ref, rest = _parse_reference_flags(["-w4", "--size", "64x36", "-p2"])
        assert ref["w"] == 4 and ref["p"] == 2
        assert rest == ["--size", "64x36"]

    def test_invalid_flag_warns_and_continues(self, capsys):
        ref, _ = _parse_reference_flags(["-xw2"])
        out = capsys.readouterr().out
        # reproduces the reference's message, typo included (:2188)
        assert "Warning: invalid program arugment -x" in out
        assert ref["w"] == 2

    def test_number_glued_to_flag(self):
        ref, _ = _parse_reference_flags(["-t8p3"])
        assert ref["t"] == 8 and ref["p"] == 3

    def test_double_dash_passthrough(self):
        _, rest = _parse_reference_flags(["--png", "x.png"])
        assert rest == ["--png", "x.png"]

    def test_help(self, capsys):
        print_help()
        out = capsys.readouterr().out
        assert "Cornell box" in out and "Mario" in out
        assert "w<int>" in out and "thin-lens" in out.lower() or "d " in out


class TestTerminalViewer:
    def test_frame_to_text_half_blocks(self):
        import numpy as np
        from pathtracer_tpu.io.term import frame_to_text
        rgb = np.zeros((4, 3, 3), np.uint8)
        rgb[0, :, 0] = 255  # top row red
        text = frame_to_text(rgb, max_cols=10, max_rows=10)
        lines = text.split("\n")
        assert len(lines) == 2           # 4 rows -> 2 half-block lines
        assert lines[0].count("▀") == 3
        assert "38;2;255;0;0" in lines[0]  # red foreground on line 0

    def test_downscale_fits_budget(self):
        import numpy as np
        from pathtracer_tpu.io.term import frame_to_text
        rgb = np.random.RandomState(0).randint(
            0, 255, (64, 128, 3), np.uint8)
        text = frame_to_text(rgb, max_cols=20, max_rows=10)
        for line in text.split("\n"):
            assert line.count("▀") <= 20
        assert len(text.split("\n")) <= 10

    def test_liveview_rewrites_in_place(self):
        import io as _io
        import numpy as np
        from pathtracer_tpu.io.term import LiveView
        buf = _io.StringIO()
        lv = LiveView(stream=buf, max_cols=8, max_rows=4)
        img = np.zeros((8, 8, 3), np.uint8)
        lv.update(img, status="1/4")
        first = buf.getvalue()
        assert "\x1b[" in first and "1/4" in first
        lv.update(img, status="2/4")
        # second frame moves the cursor back up over the first
        assert f"\x1b[{first.count(chr(10))}F" in buf.getvalue()[len(first):]


class TestPreviewMidRender:
    def test_sharded_preview_written_mid_render(self, tmp_path):
        """--preview must fire at chunk boundaries on the SHARDED path too
        (VERDICT round 1 item 8): mid-render states carry mesh-padding
        lanes which trim_accum drops."""
        import jax
        import numpy as np
        from pathtracer_tpu import cli
        if len(jax.devices()) < 2:
            import pytest
            pytest.skip("needs the multi-device CPU mesh")
        png = str(tmp_path / "prev.png")
        out = str(tmp_path / "out.bmp")
        # 17x9 pixels does NOT divide 8 devices -> padded mid-render states
        rc = cli.main(["-w3", "-p2", "--size", "17x9", "--out", out,
                       "--chunk", "1", "--preview", png])
        assert rc == 0
        from PIL import Image
        img = Image.open(png)
        assert img.size == (17, 9)

    def test_out_extension_dispatch_and_flip(self, tmp_path):
        """--out dispatches on the file extension (the reference's
        'dynamically find extension' TODO, win32_main.cpp:146) and --flip
        mirrors the saved image (the granular save-orientation TODO,
        :142-144). The PNG/JPG outputs must match the BMP pixels."""
        import numpy as np
        from PIL import Image
        from pathtracer_tpu import cli
        from pathtracer_tpu.io.bmp import read_bmp, packed_to_rgb

        base = ["-w3", "-p1", "--size", "16x8", "--single-chip"]
        bmp = str(tmp_path / "a.bmp")
        png = str(tmp_path / "a.png")
        jpg = str(tmp_path / "a.jpg")
        assert cli.main(base + ["--out", bmp]) == 0
        assert cli.main(base + ["--out", png]) == 0
        assert cli.main(base + ["--out", jpg]) == 0
        ref = packed_to_rgb(read_bmp(bmp))[::-1]
        got = np.asarray(Image.open(png).convert("RGB"))
        np.testing.assert_array_equal(ref, got)
        assert Image.open(jpg).size == (16, 8)  # lossy: shape check only

        flipped = str(tmp_path / "f.png")
        assert cli.main(base + ["--out", flipped, "--flip", "xy"]) == 0
        got_f = np.asarray(Image.open(flipped).convert("RGB"))
        np.testing.assert_array_equal(ref[::-1, ::-1], got_f)

    def test_out_odd_paths_never_lose_the_render(self, tmp_path):
        """Extension dispatch edge cases must still write SOMETHING: a
        dotted DIRECTORY with an extensionless filename reads as no
        extension (BMP bytes, the old always-BMP behavior), and an
        extension PIL can't encode falls back to BMP bytes at the same
        path instead of crashing after the finished render."""
        from pathtracer_tpu import cli

        base = ["-w3", "-p1", "--size", "16x8", "--single-chip"]
        dotted = tmp_path / "results.v2"
        dotted.mkdir()
        out1 = str(dotted / "render")
        assert cli.main(base + ["--out", out1]) == 0
        assert open(out1, "rb").read(2) == b"BM"
        out2 = str(tmp_path / "render.dat")
        assert cli.main(base + ["--out", out2]) == 0
        assert open(out2, "rb").read(2) == b"BM"

    def test_fog_albedo_arity_validated(self):
        """A malformed --fog-albedo must fail at flag level with a clear
        message, not deep inside trace compilation."""
        from pathtracer_tpu import cli

        base = ["-w3", "-p1", "--size", "8x6", "--single-chip",
                "--fog", "0.1"]
        for bad in ("1,1", "1,2,3,4", "1,x,3"):
            with pytest.raises(SystemExit):
                cli.main(base + ["--fog-albedo", bad])

    def test_trim_accum_drops_padding(self):
        import numpy as np
        from pathtracer_tpu.parallel.shard import trim_accum
        from pathtracer_tpu.render.renderer import init_accum
        st = init_accum(24)
        trimmed = trim_accum(st, 17)
        assert trimmed.count.shape[0] == 17
        assert trim_accum(trimmed, 17) is trimmed
