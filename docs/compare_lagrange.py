"""Render the CQL-Lagrange A/B: fixed min_q_weight vs Lagrange dual.

Reads the committed fixed-arm protocol run
(docs/flagship2/cql_state_entropy_progress.csv — trainer/q1_pred drifts
+164 -> -65 over 150 epochs; the pathology the reference exposes
--with_lagrange for, rlkit cql_trainer.py:387-395) and the freshest
Lagrange-arm CSV (chip A/B if present, else the labeled CPU insurance
arm), and prints an epoch-aligned table of dataset-Q and eval return.
Works on partial CSVs — the Lagrange arm lands epoch by epoch.

Usage: python docs/compare_lagrange.py [--out docs/LAGRANGE_AB.md]
"""

import argparse
import csv
import glob
import os.path as osp

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

FIXED = "docs/flagship2/cql_state_entropy_progress.csv"
LAGRANGE_CANDIDATES = [
    # chip A/B (queue stage 3) and the CPU insurance arm, run dirs and
    # collected copies; the MOST-EPOCHS candidate wins (a 6-epoch chip
    # attempt was stranded by the 2026-08-17 relay outage — row count,
    # not source priority, is what makes the comparison informative)
    "runs/flagship2/rl_logs/cql_state_entropy_lagrange/*/progress.csv",
    "docs/flagship2/cql_state_lagrange_progress.csv",
    "docs/flagship2/cql_state_lagrange_cpu_progress.csv",
    "runs/flagship2/rl_logs/cql_state_entropy_lagrange_cpu/*/progress.csv",
]


def load(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return {int(float(r["epoch"])): r for r in rows}


def pick_lagrange():
    best = None  # (n_rows, mtime, path)
    import os

    for pat in LAGRANGE_CANDIDATES:
        for path in glob.glob(osp.join(ROOT, pat)):
            try:
                with open(path) as f:
                    n = sum(1 for _ in f) - 1
                cand = (n, os.stat(path).st_mtime, path)
            except OSError:
                continue
            if best is None or cand[:2] > best[:2]:
                best = cand
    return best[2] if best else None


def fmt(row, key, nd=1):
    if row is None or key not in row or row[key] in ("", "nan"):
        return "-"
    return f"{float(row[key]):.{nd}f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the table as markdown to this path")
    args = ap.parse_args()

    fixed = load(osp.join(ROOT, FIXED))
    lag_path = pick_lagrange()
    if lag_path is None:
        print("no Lagrange-arm CSV found yet (chip queue stage 3 or the "
              "CPU insurance arm)")
        return
    lag = load(lag_path)
    src = osp.relpath(lag_path, ROOT)
    # label by measured speed, not filename: the chip trains this config
    # at ~29 s/epoch, one host CPU core at ~290 s/epoch (a stranded
    # 2026-08-17 launch fell back to CPU while named like the chip job)
    t_train = [float(r["time/training (s)"]) for r in lag.values()
               if r.get("time/training (s)")]
    backend = ("chip A/B" if t_train and min(t_train) < 100.0
               else "CPU arm (host-core fallback/insurance)")

    lines = [
        f"# CQL-Lagrange A/B (state leg) — fixed arm vs {backend}",
        "",
        f"Fixed arm: `{FIXED}` (min_q_weight=5, chip, round 3).",
        f"Lagrange arm: `{src}` (--with_lagrange --lagrange_thresh 10).",
        "",
        "| epoch | q1_pred fixed | q1_pred lagrange | alpha' | "
        "eval ret fixed | eval ret lagrange |",
        "|---|---|---|---|---|---|",
    ]
    for ep in sorted(set(fixed) | set(lag)):
        f_row, l_row = fixed.get(ep), lag.get(ep)
        if f_row is None and l_row is None:
            continue
        lines.append(
            f"| {ep} | {fmt(f_row, 'trainer/q1_pred')} "
            f"| {fmt(l_row, 'trainer/q1_pred')} "
            f"| {fmt(l_row, 'trainer/alpha_prime', 3)} "
            f"| {fmt(f_row, 'eval/Returns Mean')} "
            f"| {fmt(l_row, 'eval/Returns Mean')} |"
        )
    table = "\n".join(lines)
    try:
        print(table)
    except BrokenPipeError:  # e.g. `| head` — the --out file still lands
        pass
    if args.out:
        with open(osp.join(ROOT, args.out), "w") as f:
            f.write(table + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
