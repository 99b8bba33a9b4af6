"""Orbax checkpoint helpers shared by every training CLI.

Capability parity with the reference's checkpoint machinery (SURVEY.md
§5.4: VideoPose3D epoch checkpoints with optimizer + RNG state and
``--resume``; SAM3 trainer rank-0 save with keep-list and resume,
train/utils/checkpoint_utils.py). Under JAX there is no rank-0 dance —
one process owns the save.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional

import numpy as np

log = logging.getLogger(__name__)


def save_pytree(path: Path, tree: Any, metadata: Optional[dict] = None,
                keep_last: Optional[int] = None) -> None:
    """Save a pytree checkpoint + JSON metadata sidecar; prune old ones."""
    import jax
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)
    if metadata is not None:
        path.with_suffix(".meta.json").write_text(json.dumps(metadata))
    if keep_last:
        siblings = sorted(p for p in path.parent.iterdir()
                          if p.is_dir() and p.name.split("_")[0]
                          == path.name.split("_")[0])
        for old in siblings[:-keep_last]:
            import shutil

            shutil.rmtree(old, ignore_errors=True)
            old.with_suffix(".meta.json").unlink(missing_ok=True)


def restore_pytree(path: Path, target: Any) -> Any:
    import jax
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), jax.device_get(target))


def latest_checkpoint_path(ckpt_dir: Path, prefix: str = "step"):
    """(path, metadata) of the newest ``<prefix>_*`` checkpoint or None."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    cands = sorted(p for p in ckpt_dir.iterdir()
                   if p.is_dir() and p.name.startswith(f"{prefix}_"))
    if not cands:
        return None
    path = cands[-1]
    meta_file = path.with_suffix(".meta.json")
    meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return path, meta
