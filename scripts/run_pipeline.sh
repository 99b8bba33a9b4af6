#!/usr/bin/env bash
# Full-chain launcher (prepare -> lift -> triangulate -> fuse -> angle ->
# metrics) with per-stage timing; see configs/run_all.yaml.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}:${PYTHONPATH:-}"
exec python -m skix.pipelines.run_all "$@"
