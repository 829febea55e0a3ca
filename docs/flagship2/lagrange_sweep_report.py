"""Generate the lagrange_thresh sweep section of docs/LAGRANGE_AB.md
(VERDICT r4 #5) from the sweep runs' progress.csv files.

For each thresh cell: α′ trajectory (settled interior vs railed at the
1e6 clamp), the recovered raw action gap (the logged min_qf1_loss is the
post-dual product α′·(gap − thresh), so gap = min_qf1_loss/α′ + thresh),
the effective penalty weight (α′ itself — vs the fixed-arm
min_q_weight=5), and eval returns (collapse check).

Usage: python docs/flagship2/lagrange_sweep_report.py \
    [--glob 'runs/flagship2/lagrange_sweep_logs/cql_walker_lagrange_th*'] \
    [--out docs/LAGRANGE_AB.md]
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
import re


def last_run_dir(cell_root: str) -> str | None:
    runs = sorted(glob.glob(os.path.join(cell_root, "cql_*")))
    return runs[-1] if runs else None


def load_rows(path: str) -> list[dict]:
    with open(path) as f:
        return list(csv.DictReader(f))


def f(row: dict, key: str) -> float | None:
    v = row.get(key, "")
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def summarize(rows: list[dict], thresh: float) -> dict:
    ap_key = "trainer/alpha_prime"
    ret_keys = [k for k in rows[0]
                if "eval" in k.lower() and "Returns Mean" in k]
    ret_key = ret_keys[0] if ret_keys else None
    aps = [f(r, ap_key) for r in rows]
    aps = [a for a in aps if a is not None]
    rets = [f(r, ret_key) for r in rows] if ret_key else []
    rets = [r for r in rets if r is not None]
    gaps = []
    for r in rows:
        ap, mq = f(r, ap_key), f(r, "trainer/min_qf1_loss")
        if ap and ap > 1e-8 and mq is not None:
            gaps.append(mq / ap + thresh)
    n5 = max(1, min(5, len(rows)))
    return {
        "epochs": len(rows),
        "ap_final": aps[-1] if aps else None,
        "ap_max": max(aps) if aps else None,
        "railed": bool(aps and max(aps) >= 0.99e6),
        "gap_final5": (sum(gaps[-n5:]) / len(gaps[-n5:])) if gaps else None,
        "ret_final": rets[-1] if rets else None,
        "ret_best": max(rets) if rets else None,
        "ret_last2_mean": (sum(rets[-2:]) / len(rets[-2:])) if rets else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--glob",
        default="runs/flagship2/lagrange_sweep_logs/cql_walker_lagrange_th*")
    ap.add_argument("--out", default="docs/LAGRANGE_AB.md")
    args = ap.parse_args()

    cells = []
    for root in sorted(glob.glob(args.glob),
                       key=lambda p: float(re.search(r"th([\d.]+)$", p).group(1))):
        th = float(re.search(r"th([\d.]+)$", root).group(1))
        rd = last_run_dir(root)
        if rd is None:
            continue
        pcsv = os.path.join(rd, "progress.csv")
        if not os.path.exists(pcsv):
            continue
        rows = load_rows(pcsv)
        if not rows:
            continue
        cells.append((th, rd, summarize(rows, th)))

    if not cells:
        print("no sweep cells found")
        return

    lines = [
        "",
        "## lagrange_thresh sweep (round 5, walker image leg; VERDICT r4 #5)",
        "",
        "The r4 image-leg A/B (cheetah, thresh=10) railed α′ at its 1e6",
        "clamp. Short-protocol sweep (40 epochs × 2000 steps, batch 128,",
        "50k real + 50k generated, walker-walk) of the target action gap.",
        "The logged `min_qf1_loss` is α′·(gap − thresh); the raw gap below",
        "is recovered as `min_qf1_loss/α′ + thresh`. The fixed arm's",
        "effective penalty weight is min_q_weight=5 for comparison.",
        "",
        "| thresh | α′ final | α′ max | railed@1e6? | raw gap (last-5 mean)"
        " | eval final | eval best | collapse? |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for th, rd, s in cells:
        fmt = lambda v, d=2: ("—" if v is None else f"{v:.{d}f}")
        collapse = (
            "—" if s["ret_best"] is None else
            ("YES" if (s["ret_last2_mean"] is not None
                       and s["ret_best"] > 100
                       and s["ret_last2_mean"] < 0.2 * s["ret_best"])
             else "no")
        )
        lines.append(
            f"| {th:g} | {fmt(s['ap_final'],4)} | {fmt(s['ap_max'],4)} | "
            f"{'YES' if s['railed'] else 'no'} | {fmt(s['gap_final5'])} | "
            f"{fmt(s['ret_final'],1)} | {fmt(s['ret_best'],1)} | "
            f"{collapse} |"
        )
        lines.append(f"|  | run: `{rd}` ({s['epochs']} epochs) | | | | | | |")
    with open(args.out, "a") as fo:
        fo.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
