"""CLI smoke tests: the full q1 -> q2 -> q3 -> benchmark pipeline on CPU in
a temp directory, exercising the persistence handoff and artifact schema."""

import json
import os

import numpy as np
import pytest

from hullwhite_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


def test_pipeline(workdir):
    assert main(["q1", "--paths", "8192", "--reps", "1"]) == 0
    assert (workdir / "data" / "market.npz").exists()
    assert (workdir / "data" / "P.bin").stat().st_size == 101 * 4

    assert main(["q2", "--paths", "8192", "--reps", "1", "--validate", "3"]) == 0
    doc = json.loads((workdir / "data" / "q2b_results.json").read_text())
    assert doc["parameters"]["N_PATHS"] == 8192
    assert 0.0 < doc["results"]["ZBC_control_variate"] < 0.1
    assert (workdir / "data" / "zbc_bootstrap_optimal.csv").exists()

    assert main(["q3", "--paths", "8192", "--reps", "1"]) == 0
    doc = json.loads((workdir / "data" / "q3_results.json").read_text())
    r = doc["results"]
    # pathwise, FD-CRN and AD must all be near the true vega ~0.23
    for k in ["sensitivity_mc", "sensitivity_fd", "sensitivity_ad_jvp"]:
        assert 0.15 < r[k] < 0.32, (k, r[k])

    assert main(["benchmark", "--paths", "8192", "--reps", "1"]) == 0
    doc = json.loads((workdir / "data" / "benchmark_engines.json").read_text())
    assert doc["results"]["consistency_pass"]


def test_q2_requires_q1(tmp_path):
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        with pytest.raises(FileNotFoundError, match="Did you run Q1 first"):
            main(["q2", "--paths", "4096", "--reps", "1"])
    finally:
        os.chdir(old)


def test_bin_files_match_reference_format(workdir):
    """P.bin must be raw little-endian fp32, loadable the way the reference
    loads it (common.cuh:155-169)."""
    raw = np.fromfile(workdir / "data" / "P.bin", dtype="<f4")
    assert raw.shape == (101,)
    assert abs(raw[0] - 1.0) < 1e-6


def _ensure_market(workdir):
    """Slow-lane self-sufficiency: these tests are deselected from the
    lane that runs test_pipeline, so bootstrap the market themselves."""
    if not (workdir / "data" / "market.npz").exists():
        assert main(["q1", "--paths", "8192", "--reps", "1"]) == 0


@pytest.mark.slow
def test_swaption_and_grid_subcommands(workdir):
    _ensure_market(workdir)
    assert main(["swaption", "--paths", "8192", "--payer"]) == 0
    doc = json.loads((workdir / "data" / "swaption_results.json").read_text())
    assert abs(doc["results"]["qmc_price"] - doc["results"]["jamshidian"]) < 1e-4
    assert main(["grid", "--paths", "8192"]) == 0
    doc = json.loads((workdir / "data" / "grid_results.json").read_text())
    assert np.asarray(doc["price"]).shape == (5, 5)


def test_q3_profile_flag(tmp_path, monkeypatch):
    """--profile prints the compile report (limiting factor included)."""
    import contextlib
    import io

    monkeypatch.chdir(tmp_path)
    from hullwhite_tpu.cli import main

    assert main(["q1", "--paths", "8192", "--reps", "1"]) == 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["q3", "--paths", "8192", "--reps", "1", "--profile"])
    assert rc == 0
    out = buf.getvalue()
    assert "XLA kernel analysis" in out or "kernel analysis unavailable" in out


@pytest.mark.slow
def test_bermudan_sweep_and_plot(workdir):
    """swaption --bermudan-sweep writes the k=1..5 bracket artifact; the
    analyze plotter consumes it.  Pins lower <= oracle <= upper within
    noise and monotonicity of the oracle in k."""
    _ensure_market(workdir)
    assert main(["swaption", "--paths", "8192", "--bermudan-sweep"]) == 0
    doc = json.loads(
        (workdir / "data" / "bermudan_sweep.json").read_text())
    r = doc["results"]
    assert r["k"] == [1, 2, 3, 4, 5]
    dp = np.asarray(r["dp_oracle"])
    assert np.all(np.diff(dp) > 0)
    up = np.asarray(r["upper"])
    up_se = np.asarray(r["upper_se"])
    assert np.all(up + 4 * up_se + 5e-5 >= dp)

    from pathlib import Path

    from hullwhite_tpu.analyze import plot_bermudan_bracket

    out = plot_bermudan_bracket(workdir / "data", Path(workdir))
    assert out is not None and out.exists()


def test_calibrate_subcommand(workdir):
    """calibrate recovers HW (a, sigma) and G2 (sigma, eta, rho) from
    closed-form quotes on the bootstrapped market curve."""
    assert main(["calibrate", "--paths", "8192"]) == 0
    doc = json.loads(
        (workdir / "data" / "calibration_results.json").read_text())
    r = doc["results"]
    assert abs(r["hw_a"] - 1.0) < 1e-4
    assert abs(r["hw_sigma"] - 0.1) < 1e-5
    assert abs(r["g2_rho"] + 0.6) < 1e-3


@pytest.mark.slow
def test_pipeline_lane(workdir):
    """Composed calibrate -> reprice -> XVA lane (round-5): hidden
    (a*, sigma*) recovered from quotes, the book and the XVA stack
    repriced at the calibrated parameters under the market-refit theta,
    every gate PASS, one artifact."""
    _ensure_market(workdir)
    assert main(["pipeline", "--paths", "8192"]) == 0
    doc = json.loads(
        (workdir / "data" / "pipeline_results.json").read_text())
    r = doc["results"]
    assert r["hw_calibration"]["ok"] and r["g2_calibration"]["ok"]
    assert abs(r["hw_calibration"]["a"] - 0.85) < 1e-4
    for k in ("swaption", "cap", "range_accrual", "cva", "g2_zbc",
              "g2_netted_cva"):
        assert abs(r[k]["z"]) < 4.0 or abs(r[k]["mc"]
                                           - r[k]["oracle"]) < 1e-4, (k, r[k])
