"""The bench chip-evidence record (bench.py CHIP_RECORD_PATH).

bench.py keeps the BEST on-chip result JSON in docs/BENCH_CHIP_LAST.json
(lower contended-chip runs don't clobber it); on a CPU fallback it embeds
that record in the output under ``last_chip_measurement``, and on a chip
run that measures lower than the record under ``best_chip_measurement``,
so the driver-captured scoreboard artifact never loses the chip evidence
to a relay outage or a busy chip (round-3 postmortem: BENCH_r03.json was
a 9.18-fps CPU fallback while the real chip number lived only in prose)."""

import importlib.util
import json
import os


def _load_bench_module():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_chip_record_roundtrip(tmp_path, monkeypatch):
    bench = _load_bench_module()
    # point the record inside tmp_path (path is joined with bench.py's dir,
    # so hand it an absolute path)
    monkeypatch.setattr(
        bench, "CHIP_RECORD_PATH", str(tmp_path / "rec.json"))
    bench._save_chip_record(
        {"metric": "m", "value": 123.0, "baseline": {"dropped": True}})
    rec = bench._load_chip_record()
    assert rec["value"] == 123.0
    assert "measured_utc" in rec and "note" in rec
    # the torch-twin baseline block is machine-local, not chip evidence
    assert "baseline" not in rec


def test_chip_record_keeps_best(tmp_path, monkeypatch):
    """A lower (contended-chip) measurement must not clobber the best
    recorded one; a higher one replaces it."""
    bench = _load_bench_module()
    monkeypatch.setattr(
        bench, "CHIP_RECORD_PATH", str(tmp_path / "rec.json"))
    bench._save_chip_record({"metric": "m", "value": 13829.0})
    bench._save_chip_record({"metric": "m", "value": 13638.0})  # contended
    assert bench._load_chip_record()["value"] == 13829.0
    bench._save_chip_record({"metric": "m", "value": 14000.0})  # new best
    assert bench._load_chip_record()["value"] == 14000.0


def test_chip_record_missing_is_none(tmp_path, monkeypatch):
    bench = _load_bench_module()
    monkeypatch.setattr(
        bench, "CHIP_RECORD_PATH", str(tmp_path / "absent.json"))
    assert bench._load_chip_record() is None


def test_chip_record_best_and_latest_side_by_side(tmp_path, monkeypatch):
    """ADVICE r4: a contended (lower) run must still be visible — the
    record keeps the best at top level AND the most recent run under
    'latest', so the ratchet never hides the latest evidence."""
    bench = _load_bench_module()
    monkeypatch.setattr(
        bench, "CHIP_RECORD_PATH", str(tmp_path / "rec.json"))
    bench._save_chip_record({"metric": "m", "value": 13958.0})
    bench._save_chip_record({"metric": "m", "value": 13600.0})  # contended
    rec = bench._load_chip_record()
    assert rec["value"] == 13958.0
    assert rec["latest"]["value"] == 13600.0
    bench._save_chip_record({"metric": "m", "value": 14100.0})  # new best
    rec = bench._load_chip_record()
    assert rec["value"] == 14100.0 and rec["latest"]["value"] == 14100.0


def test_torch_twin_baseline_is_pinned(monkeypatch):
    """vs_baseline's denominator must come from the pinned record (mean
    over measurements), not a fresh host-load-dependent measurement."""
    bench = _load_bench_module()
    called = []
    monkeypatch.setattr(bench, "measure_torch_twin",
                        lambda: called.append(1) or 99.0)
    base = bench.torch_twin_baseline(remeasure=False)
    assert base is not None and not called  # no re-measure
    assert base["n_measurements"] >= 4
    import math
    with open(bench._repo_path(bench.TORCH_RECORD_PATH)) as f:
        rec = json.load(f)
    vals = [m["frames_per_sec"] for m in rec["measurements"]]
    assert math.isclose(base["frames_per_sec"],
                        round(sum(vals) / len(vals), 2))


def test_partial_result_carries_chip_record():
    """A kill before the first measurement must still yield a JSON with
    the prior chip evidence and explicit provenance."""
    bench = _load_bench_module()
    res = bench._partial_result("killed by SIGTERM before completion")
    assert res["partial"].startswith("killed by")
    assert res["value"] == res["last_chip_measurement"]["value"]
    assert "prior on-chip record" in res["value_provenance"]


def test_committed_record_is_chip_provenance():
    """The committed record must describe an on-chip measurement."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "docs", "BENCH_CHIP_LAST.json")) as f:
        rec = json.load(f)
    assert rec["unit"] == "frames/sec/chip"
    assert "cpu" not in rec["backend"].lower()
    assert rec["value"] > 1000  # a CPU fallback could never hit this


def test_chip_record_headline_best_keeps_last_full_sweep(tmp_path, monkeypatch):
    """A 2-cell headline-mode run that becomes the new best must not
    evict the most recent full sweep curve from the record."""
    bench = _load_bench_module()
    monkeypatch.setattr(
        bench, "CHIP_RECORD_PATH", str(tmp_path / "rec.json"))
    sweep_cells = [{"batch": b, "rollouts_per_dispatch": r, "fps": 1.0}
                   for b in (256, 1024) for r in (1, 4, 16)]
    bench._save_chip_record({"metric": "m", "value": 13963.0,
                             "mode": "sweep", "fps_vs_batch": sweep_cells,
                             "pallas_ab": {"speedup": 0.72},
                             "gb_int8_ab": {"speedup": 0.914}})
    bench._save_chip_record({"metric": "m", "value": 13969.0,
                             "mode": "headline",
                             "fps_vs_batch": sweep_cells[:2]})
    rec = bench._load_chip_record()
    assert rec["value"] == 13969.0
    assert len(rec["last_full_sweep"]["fps_vs_batch"]) == len(sweep_cells)
    assert rec["last_full_sweep"]["gb_int8_ab"]["speedup"] == 0.914
