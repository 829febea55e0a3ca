"""The Lagrange thresh-sweep report generator
(docs/flagship2/lagrange_sweep_report.py): gap recovery and rail
detection over synthetic sweep cells."""

import csv
import importlib.util
import os
import subprocess
import sys


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "lagrange_report_under_test",
        os.path.join(ROOT, "docs/flagship2/lagrange_sweep_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_cell(base, thresh, alpha, gap, rets):
    """One sweep cell: logged min_qf1_loss = alpha*(gap-thresh)."""
    d = os.path.join(base, f"cql_walker_lagrange_th{thresh:g}",
                     "cql_run_s0")
    os.makedirs(d)
    keys = ["epoch", "trainer/alpha_prime", "trainer/min_qf1_loss",
            "eval/is_fresh", "eval/Average Returns Mean"]
    with open(os.path.join(d, "progress.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(keys)
        for i, ret in enumerate(rets):
            w.writerow([-len(rets) + i, alpha, alpha * (gap - thresh),
                        1, ret])
    return d


def test_summarize_recovers_gap_and_detects_rail(tmp_path):
    mod = _load()
    d = _write_cell(str(tmp_path), 5, 1e6, 18.0, [10, 200, 300])
    rows = mod.load_rows(os.path.join(d, "progress.csv"))
    s = mod.summarize(rows, 5.0)
    assert s["railed"] is True
    assert abs(s["gap_final5"] - 18.0) < 1e-6  # min_qf1/alpha + thresh
    assert s["ret_best"] == 300 and s["ret_final"] == 300


def test_summarize_interior_cell(tmp_path):
    mod = _load()
    d = _write_cell(str(tmp_path), 25, 1.0, 24.0, [10, 400, 250])
    rows = mod.load_rows(os.path.join(d, "progress.csv"))
    s = mod.summarize(rows, 25.0)
    assert s["railed"] is False
    assert abs(s["gap_final5"] - 24.0) < 1e-6
    # no collapse: last-2 mean (325) well above 20% of best (400)
    assert s["ret_best"] == 400


def test_report_cli_end_to_end(tmp_path):
    _write_cell(str(tmp_path / "logs"), 1, 1e6, 19.0, [10, 290])
    _write_cell(str(tmp_path / "logs"), 25, 0.98, 24.0, [10, 435])
    out = tmp_path / "AB.md"
    r = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "docs/flagship2/lagrange_sweep_report.py"),
         "--glob", str(tmp_path / "logs" / "cql_walker_lagrange_th*"),
         "--out", str(out)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    assert "| 1 |" in text and "| 25 |" in text
    assert text.index("| 1 |") < text.index("| 25 |")  # thresh-sorted
    assert "YES" in text and "no" in text  # railed vs interior
