#!/usr/bin/env bash
# Artifact auto-commit loop v2 (round 4, session 16). v1 passed all nine
# pathspecs to ONE `git add`, which aborts the whole staging (exit 128,
# nothing added) if ANY pathspec matches no files — with stderr sent to
# /dev/null the disaster-recovery loop could die silently exactly when
# a fresh round has no BENCH_r*.json yet. v2 stages each pathspec
# independently. Docs/artifact-only by construction: it stages ONLY
# docs/ artifacts and the bench records, never source.
# Usage: setsid nohup bash docs/flagship2/autocommit_loop2.sh \
#          > runs/flagship2/autocommit.log 2>&1 &
cd /root/repo
while :; do
  sleep 900
  # artifact file types ONLY — never .py/.sh (those are hand-edited
  # sources under docs/ that must land in purposeful commits)
  for spec in 'docs/*.csv' 'docs/*.json' 'docs/**/*.csv' 'docs/**/*.json' \
      docs/RESULTS_TABLE.md docs/LAGRANGE_AB.md docs/E2E_RESULTS.md \
      docs/final_evals.csv 'BENCH_r*.json'; do
    git add "$spec" 2>/dev/null || true
  done
  if ! git diff --cached --quiet; then
    git commit -m "$(cat <<'EOF'
Artifact snapshot: collected partial run CSVs / bench records (autocommit)

No-Verification-Needed: docs/artifact-only autocommit
EOF
)" && echo "[$(date -u +%H:%M:%S)] committed artifact snapshot"
  fi
done
