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
# Fixed-arm rerun on the round-4 REGENERATED dataset (session-8 queue
# stage 8). When it has run long enough to show the drift regime
# (>=100 epochs), it replaces the r3 fixed arm so the A/B is
# same-dataset; until then the r3 protocol run stays the baseline.
FIXED_R4_CANDIDATES = [
    "docs/flagship2/cql_state_fixed_r4_progress.csv",
    "runs/flagship2/rl_logs/cql_state_entropy_fixed_r4/*/progress.csv",
]
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


def _most_rows(patterns):
    best = None  # (n_rows, mtime, path)
    import os

    for pat in patterns:
        for path in glob.glob(osp.join(ROOT, pat)):
            try:
                with open(path) as f:
                    n = sum(1 for _ in f) - 1
                cand = (n, os.stat(path).st_mtime, path)
            except OSError:
                continue
            if best is None or cand[:2] > best[:2]:
                best = cand
    return best


def pick_lagrange():
    best = _most_rows(LAGRANGE_CANDIDATES)
    return best[2] if best else None


def pick_fixed():
    """Prefer the same-dataset (regenerated) fixed arm once it is deep
    enough to show the late-drift regime; else the committed r3 run."""
    r4 = _most_rows(FIXED_R4_CANDIDATES)
    if r4 and r4[0] >= 100:
        return r4[2], True
    return osp.join(ROOT, FIXED), False


def fmt(row, key, nd=1):
    if row is None or key not in row or row[key] in ("", "nan"):
        return "-"
    return f"{float(row[key]):.{nd}f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the table as markdown to this path")
    args = ap.parse_args()

    fixed_path, same_dataset = pick_fixed()
    fixed = load(fixed_path)
    fixed_src = osp.relpath(fixed_path, ROOT)
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

    def tail_stats(rows, key, n=25):
        vals = [float(r[key]) for _, r in sorted(rows.items())[-n:]
                if r.get(key) not in (None, "", "nan")]
        if not vals:
            return None
        return (sum(vals) / len(vals), min(vals), max(vals))

    def ret_stats(rows):
        vals = [float(r["eval/Returns Mean"]) for _, r in sorted(rows.items())
                if r.get("eval/Returns Mean") not in (None, "", "nan")]
        return (vals[-1], max(vals)) if vals else (None, None)

    verdict = []
    f_q = tail_stats(fixed, "trainer/q1_pred")
    l_q = tail_stats(lag, "trainer/q1_pred")
    l_a = tail_stats(lag, "trainer/alpha_prime", n=10)
    f_fin, f_best = ret_stats(fixed)
    l_fin, l_best = ret_stats(lag)
    if f_q and l_q and len(lag) >= 50 and None not in (f_fin, l_fin):
        bounded = abs(l_q[0]) < abs(f_q[0]) and l_q[1] > f_q[1]
        verdict = [
            "## Verdict",
            "",
            f"Final-25-epoch dataset q1_pred: fixed arm mean {f_q[0]:.1f} "
            f"(range {f_q[1]:.1f}..{f_q[2]:.1f}"
            + ("" if same_dataset else ", having drifted from +164 peak")
            + f") vs Lagrange arm mean {l_q[0]:.1f} "
            f"(range {l_q[1]:.1f}..{l_q[2]:.1f})."
            + (f" Dual settled at alpha' ~= {l_a[0]:.2f} "
               "(penalty relaxed once the action-gap fell below "
               "lagrange_thresh=10)." if l_a else ""),
            "",
            f"Eval returns (final / best): fixed {f_fin:.1f} / {f_best:.1f}, "
            f"Lagrange {l_fin:.1f} / {l_best:.1f} (data policy ~250).",
            "",
            ("**The dual bounds the Q-drift at comparable-or-better "
             "returns** — the reference's `--with_lagrange` escape hatch "
             "(rlkit cql_trainer.py:387-395) reproduces: the fixed-weight "
             "arm's monotone dataset-Q drift is absent under the Lagrange "
             "dual." if bounded else
             "**Inconclusive** — the Lagrange arm's Q stats do not clearly "
             "dominate the fixed arm's; see the table."),
            "",
            ("Both arms ran on round-4 regenerated datasets (same-dataset "
             "A/B)." if same_dataset else
             "Caveat: the Lagrange arm ran on the round-4 regenerated "
             "dataset (same seeded collection protocol; statistically "
             "equivalent, not bit-identical to round 3's — see "
             "docs/ROUND4_NOTES.md session 5)."),
            "",
        ]

    lines = [
        f"# CQL-Lagrange A/B (state leg) — fixed arm vs {backend}",
        "",
        f"Fixed arm: `{fixed_src}` (min_q_weight=5"
        + (", regenerated dataset — same-dataset A/B, round 4)."
           if same_dataset else ", chip, round 3)."),
        f"Lagrange arm: `{src}` (--with_lagrange --lagrange_thresh 10).",
        "",
        *verdict,
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
