"""The examples must keep running end-to-end (marked slow)."""

import os
import runpy

import numpy as np
import pytest


@pytest.mark.slow
def test_quickstart_runs(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    runpy.run_path(os.path.join(os.path.dirname(__file__), "..",
                                "examples", "quickstart.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "SMRF total error" in out
    assert (tmp_path / "dtm.tif").exists()
    assert (tmp_path / "geomorphons.png").exists()
