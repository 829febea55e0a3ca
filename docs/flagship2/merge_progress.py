"""Merge a run's progress.csv fragments across stall-resume run dirs.

The chip queue's stall watchdog kills and resumes wedged stages
(run_session14_queue.sh); each resume logs into a FRESH run dir whose
progress.csv only contains post-resume epochs. Collecting just the
newest fragment (the old `ls | tail -1` behavior) would publish a
partial curve — e.g. the 2026-08-20 walker GAN resume holds epochs
24-30 while epochs 1-23 live in the stalled run dir. This merges all
fragments of one logical run in run-dir order, deduping on the epoch
column (later fragments win, since a resume re-runs its first epoch
from the last orbax checkpoint).

Usage: python merge_progress.py '<glob of progress.csv>' <dst.csv>
Exits 0 writing dst only if at least one non-empty fragment matched;
exits 3 (and writes nothing) otherwise so callers can log a skip.
"""

import csv
import glob
import sys


def merge(pattern: str, dst: str) -> int:
    paths = sorted(glob.glob(pattern))
    frags = []
    for p in paths:
        with open(p, newline="") as f:
            rows = list(csv.reader(f))
        if len(rows) >= 2:  # header + at least one data row
            frags.append((p, rows))
    if not frags:
        return 3

    header = frags[-1][1][0]
    mismatched = [p for p, rows in frags if rows[0] != header]
    if mismatched:
        # schema changed between fragments (different variant) — that is
        # a different logical run; keep only the newest fragment
        print(f"merge_progress: header mismatch in {', '.join(mismatched)}"
              f"; using newest fragment only", file=sys.stderr)
        frags = frags[-1:]
    epoch_col = header.index("epoch") if "epoch" in header else None

    merged: dict = {}
    order: list = []
    for _, rows in frags:
        for row in rows[1:]:
            key = row[epoch_col] if epoch_col is not None else len(order)
            if key not in merged:
                order.append(key)
            merged[key] = row

    with open(dst, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        for key in order:
            w.writerow(merged[key])
    print(f"merged {len(frags)} fragment(s), {len(order)} rows -> {dst}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    sys.exit(merge(sys.argv[1], sys.argv[2]))
