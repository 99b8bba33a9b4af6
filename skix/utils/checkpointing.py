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


# ---------------------------------------------------------------------------
# Unix-pattern parameter selection + checkpoint kernels
# ---------------------------------------------------------------------------
# The reference's partial-loading machinery
# (train/utils/checkpoint_utils.py:27 unix_pattern_to_parameter_names,
# :44/:65 filter/exclude_params_matching_unix_pattern, :161
# CkptExcludeKernel, :244 load_checkpoint_and_apply_kernels) over flax
# pytrees: parameter "names" are '/'-joined pytree paths.

def tree_param_names(tree: Any) -> list:
    """All leaf names of a pytree as ``a/b/c`` path strings."""
    import jax

    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return ["/".join(_key_str(k) for k in path) for path, _ in flat]


def _key_str(k) -> str:
    name = getattr(k, "key", getattr(k, "idx", getattr(k, "name", None)))
    return str(name if name is not None else k)


def unix_pattern_to_parameter_names(constraints, all_parameter_names):
    """Names matching ANY pattern; every pattern must match ≥1 name
    (checkpoint_utils.py:27-42 semantics incl. the assert)."""
    import fnmatch

    names = list(all_parameter_names)
    out = set()
    for pattern in constraints:
        matching = set(fnmatch.filter(names, pattern))
        if not matching:
            raise AssertionError(
                f"param_names {pattern} don't match any param in the given "
                f"names.")
        out |= matching
    return out


def _tree_filter_by_names(tree: Any, keep: set, invert: bool = False) -> Any:
    """Replace non-selected leaves with None (pruned subtrees stay in place
    so the result remains a valid partial pytree)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in flat:
        name = "/".join(_key_str(k) for k in path)
        selected = name in keep
        leaves.append(leaf if (selected != invert) else None)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def filter_params_matching_unix_pattern(patterns, tree: Any) -> Any:
    """Keep only leaves whose path matches one of ``patterns`` (others set
    to None). Empty pattern list → empty selection (reference :58)."""
    if not patterns:
        return _tree_filter_by_names(tree, set())
    keep = unix_pattern_to_parameter_names(patterns, tree_param_names(tree))
    return _tree_filter_by_names(tree, keep)


def exclude_params_matching_unix_pattern(patterns, tree: Any) -> Any:
    """Drop leaves whose path matches one of ``patterns`` (set to None).
    Empty pattern list → unchanged (reference :79)."""
    if not patterns:
        return tree
    drop = unix_pattern_to_parameter_names(patterns, tree_param_names(tree))
    return _tree_filter_by_names(tree, drop, invert=True)


class CkptIncludeKernel:
    """Keep only keys matching the patterns (applied at load time)."""

    def __init__(self, key_pattern):
        self.key_pattern = list(key_pattern)

    def __call__(self, state_dict: Any) -> Any:
        if not self.key_pattern:
            return state_dict
        return filter_params_matching_unix_pattern(self.key_pattern,
                                                   state_dict)


class CkptExcludeKernel:
    """Remove keys matching the patterns (checkpoint_utils.py:161)."""

    def __init__(self, key_pattern):
        self.key_pattern = list(key_pattern)

    def __call__(self, state_dict: Any) -> Any:
        if not self.key_pattern:
            return state_dict
        return exclude_params_matching_unix_pattern(self.key_pattern,
                                                    state_dict)


def load_checkpoint_and_apply_kernels(checkpoint_path: Path, target: Any,
                                      checkpoint_kernels=None) -> Any:
    """Restore a pytree checkpoint then apply processing kernels in order
    (checkpoint_utils.py:244). Returns the (possibly pruned) pytree; use
    ``merge_params`` to overlay it onto a fresh init."""
    tree = restore_pytree(Path(checkpoint_path), target)
    for kernel in (checkpoint_kernels or []):
        tree = kernel(tree)
    return tree


def merge_params(base: Any, overlay: Any) -> Any:
    """Overlay non-None leaves of ``overlay`` onto ``base`` by pytree path
    (the flax analog of load_state_dict(strict=False) after include/exclude
    kernels). Overlay paths absent from ``base`` are ignored."""
    import jax

    is_none = lambda x: x is None  # noqa: E731
    flat_o, _ = jax.tree_util.tree_flatten_with_path(overlay, is_leaf=is_none)
    omap = {"/".join(_key_str(k) for k in p): v for p, v in flat_o}
    flat_b, treedef = jax.tree_util.tree_flatten_with_path(base)
    leaves = []
    for p, v in flat_b:
        o = omap.get("/".join(_key_str(k) for k in p))
        leaves.append(v if o is None else o)
    return jax.tree_util.tree_unflatten(treedef, leaves)
