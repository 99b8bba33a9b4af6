#!/usr/bin/env bash
# Batch-launcher for skix pipeline stages (the L7 tier — reference
# pegasus/*.sh PBS scripts). Works as-is under bash/SLURM/PBS wrappers:
#   sbatch --wrap "scripts/run_stage.sh videopose3d paths.pt_root=/data/pt"
#   qsub -- scripts/run_stage.sh fuse
set -euo pipefail
STAGE="${1:?usage: run_stage.sh <stage> [key=value ...]}"
shift || true
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="${REPO}:${PYTHONPATH:-}"
exec python -m "skix.pipelines.${STAGE}" "$@"
