#!/usr/bin/env bash
# Artifact auto-commit loop (round 4, session 12). The VM hosting this
# build has been recreated five times mid-round; everything under runs/
# dies each time and only committed files survive. The chip queue already
# copies partial progress CSVs into tracked docs/ after every stage
# (collect_artifacts.sh) — this loop commits those snapshots every 15
# minutes so a recreation can never destroy a landed result again.
# Docs/artifact-only by construction: it stages ONLY docs/ and the
# bench record, never source.
# Usage: setsid nohup bash docs/flagship2/autocommit_loop.sh \
#          > runs/flagship2/autocommit.log 2>&1 &
cd /root/repo
while :; do
  sleep 900
  # artifact file types ONLY — never .py/.sh (those are hand-edited
  # sources under docs/ that must land in purposeful commits)
  git add 'docs/*.csv' 'docs/*.json' 'docs/**/*.csv' 'docs/**/*.json' \
    'docs/RESULTS_TABLE.md' 'docs/LAGRANGE_AB.md' 'docs/E2E_RESULTS.md' \
    'docs/final_evals.csv' BENCH_r*.json 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -m "$(cat <<'EOF'
Artifact snapshot: collected partial run CSVs / bench records (autocommit)

No-Verification-Needed: docs/artifact-only autocommit
EOF
)" && echo "[$(date -u +%H:%M:%S)] committed artifact snapshot"
  fi
done
