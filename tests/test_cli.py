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
