"""The examples must keep running end-to-end.

The notebook ports run in CI mode (EXAMPLE_FAST=1 shrinks the DEM) so
each finishes in seconds; every example carries its own asserted
oracles (micro-morphology codes, terrain-code invariants, statistic
envelopes), so "it ran" means "its numbers checked out".
"""

import os
import runpy

import numpy as np
import pytest

# full-pipeline integration tests: excluded from the default <5-min
# dev loop (pytest.ini), still in -m "not slow" and certification runs
pytestmark = pytest.mark.heavy

_EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(name, tmp_path, monkeypatch):
    import sys
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    monkeypatch.setenv("EXAMPLE_FAST", "1")
    # _common caches OUT_DIR/EXAMPLE_FAST at import — force a fresh
    # read per test so each example writes into its own tmp_path
    sys.modules.pop("_common", None)
    runpy.run_path(os.path.join(_EXAMPLES, name), run_name="__main__")


@pytest.mark.slow
def test_quickstart_runs(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("OUT_DIR", str(tmp_path))
    runpy.run_path(os.path.join(_EXAMPLES, "quickstart.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "SMRF total error" in out
    assert (tmp_path / "dtm.tif").exists()
    assert (tmp_path / "geomorphons.png").exists()


def test_geomorphons_walkthrough(tmp_path, monkeypatch, capsys):
    _run("geomorphons_walkthrough.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "walkthrough complete" in out
    assert (tmp_path / "sample_dem_geomorphons.png").exists()
    assert (tmp_path / "sample_dem_geomorphons.pgw").exists()
    assert (tmp_path / "openness.png").exists()
    assert (tmp_path / "terrain_code_frequencies.png").exists()


def test_curvature_comparison(tmp_path, monkeypatch, capsys):
    _run("curvature_comparison.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "curvature comparison complete" in out
    assert (tmp_path / "evans_curvatures.png").exists()
    assert (tmp_path / "curvature_families.png").exists()


def test_terrain_visualization(tmp_path, monkeypatch, capsys):
    _run("terrain_visualization.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "terrain visualization complete" in out
    assert (tmp_path / "terrain_gallery.png").exists()
    assert (tmp_path / "colortable_variants.png").exists()


@pytest.mark.slow
def test_smrf_isprs(tmp_path, monkeypatch, capsys):
    _run("smrf_isprs.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "smrf isprs example complete" in out
    assert "Total Error:" in out          # the published-metrics part ran
    assert (tmp_path / "scene_smrfed.tif").exists()
    assert (tmp_path / "scene_smrfed_bonemap.png").exists()
    assert (tmp_path / "smrf_bonemaps.png").exists()


def test_dem_filters(tmp_path, monkeypatch, capsys):
    _run("dem_filters.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "dem filters complete" in out
    assert "glider advanced" in out
    assert (tmp_path / "dem_filters.png").exists()


def test_inpainting_dtm(tmp_path, monkeypatch, capsys):
    _run("inpainting_dtm.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "inpainting complete" in out
    assert "NaNs after inpaint: 0" in out
    assert (tmp_path / "ground_inpainted.tif").exists()
    import neilpy_tpu as nt
    J, _ = nt.imread(str(tmp_path / "ground_inpainted.tif"))
    assert not np.isnan(J).any()


def test_poland_tiled_geomorphons(tmp_path, monkeypatch, capsys):
    _run("poland_tiled_geomorphons.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "poland tiled geomorphons complete" in out
    assert "interior agreement: 1.000000" in out
    assert (tmp_path / "poland_geomorphon.png").exists()
    assert (tmp_path / "poland_geomorphon.pgw").exists()


def test_ypr_to_opk(tmp_path, monkeypatch, capsys):
    _run("ypr_to_opk.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "ypr to opk complete" in out
    assert (tmp_path / "poas_opk.csv").exists()
    import pandas as pd
    df = pd.read_csv(tmp_path / "poas_opk.csv")
    assert {"fn", "lat", "lon", "azimuth", "omega", "phi",
            "kappa"} <= set(df.columns)
    assert len(df) == 6


def test_near_earth_imaging_lab(tmp_path, monkeypatch, capsys):
    _run("near_earth_imaging_lab.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "near earth imaging lab tour complete" in out
    assert "ashift(x, 0) matches" in out
    assert (tmp_path / "neil_tour.png").exists()
    assert (tmp_path / "dk22_bonemap.png").exists()
    assert (tmp_path / "dk22_standin.las").exists()


def test_spatial_autocorrelation(tmp_path, monkeypatch, capsys):
    _run("spatial_autocorrelation.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "spatial autocorrelation complete" in out
    assert (tmp_path / "gi_hotspots.png").exists()
    assert (tmp_path / "curvature_hotspots.tif").exists()
    assert (tmp_path / "curvature_hotspots.tfw").exists()
    # the hotspot raster reads back as significance bins
    import neilpy_tpu as nt
    G, _ = nt.imread(str(tmp_path / "curvature_hotspots.tif"))
    assert set(np.unique(G)) <= {-3, -2, -1, 0, 1, 2, 3}


def test_out_of_core_pipeline(tmp_path, monkeypatch, capsys):
    _run("out_of_core_pipeline.py", tmp_path, monkeypatch)
    out = capsys.readouterr().out
    assert "out-of-core pipeline complete" in out
    assert (tmp_path / "geomorphons.tif").exists()
    assert (tmp_path / "cloud_classified.las").exists()
