"""Artifact collection: stall-resume progress.csv fragment merging.

The chip queue's stall watchdog resumes wedged stages into fresh run
dirs whose progress.csv holds only post-resume epochs
(docs/flagship2/merge_progress.py); collect_artifacts.sh publishes the
merged logical run. Mirrors the reference's csv-regression toolkit role
(rlkit/testing/csv_util.py — get_exp/check_equal over progress.csv)."""

import csv
import importlib.util
import os
import sys

import pytest

_MOD = os.path.join(os.path.dirname(__file__), os.pardir,
                    "docs", "flagship2", "merge_progress.py")


@pytest.fixture(scope="module")
def merge():
    spec = importlib.util.spec_from_file_location("merge_progress", _MOD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.merge


def _write(path, header, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _read(path):
    with open(path, newline="") as f:
        return list(csv.reader(f))


def test_merges_fragments_dedup_on_epoch(tmp_path, merge):
    """Resume re-runs its first epoch from the checkpoint: the later
    fragment's row must win, and pre-resume epochs must survive."""
    h = ["epoch", "psnr"]
    _write(str(tmp_path / "run_a" / "progress.csv"), h,
           [["1", "10.0"], ["2", "11.0"], ["3", "11.5"]])
    _write(str(tmp_path / "run_b" / "progress.csv"), h,
           [["3", "12.0"], ["4", "12.5"]])
    dst = str(tmp_path / "merged.csv")
    assert merge(str(tmp_path / "*" / "progress.csv"), dst) == 0
    rows = _read(dst)
    assert rows[0] == h
    assert [r[0] for r in rows[1:]] == ["1", "2", "3", "4"]
    assert dict((r[0], r[1]) for r in rows[1:])["3"] == "12.0"


def test_header_only_fragments_are_skipped(tmp_path, merge):
    h = ["epoch", "psnr"]
    _write(str(tmp_path / "run_a" / "progress.csv"), h, [["1", "9.0"]])
    _write(str(tmp_path / "run_b" / "progress.csv"), h, [])  # just started
    dst = str(tmp_path / "merged.csv")
    assert merge(str(tmp_path / "*" / "progress.csv"), dst) == 0
    assert [r[0] for r in _read(dst)[1:]] == ["1"]


def test_no_output_yet_exits_3_and_writes_nothing(tmp_path, merge):
    dst = str(tmp_path / "merged.csv")
    assert merge(str(tmp_path / "*" / "progress.csv"), dst) == 3
    assert not os.path.exists(dst)


def test_header_mismatch_keeps_newest_fragment_only(tmp_path, merge,
                                                    capsys):
    _write(str(tmp_path / "run_a" / "progress.csv"),
           ["epoch", "old_key"], [["1", "0.5"]])
    _write(str(tmp_path / "run_b" / "progress.csv"),
           ["epoch", "psnr"], [["1", "10.0"], ["2", "11.0"]])
    dst = str(tmp_path / "merged.csv")
    assert merge(str(tmp_path / "*" / "progress.csv"), dst) == 0
    rows = _read(dst)
    assert rows[0] == ["epoch", "psnr"]
    assert len(rows) == 3
    assert "header mismatch" in capsys.readouterr().err


def test_no_epoch_column_concatenates(tmp_path, merge):
    h = ["step", "loss"]
    _write(str(tmp_path / "run_a" / "progress.csv"), h, [["1", "0.5"]])
    _write(str(tmp_path / "run_b" / "progress.csv"), h, [["1", "0.4"]])
    dst = str(tmp_path / "merged.csv")
    assert merge(str(tmp_path / "*" / "progress.csv"), dst) == 0
    assert len(_read(dst)) == 3  # header + both rows kept
