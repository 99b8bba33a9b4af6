"""LoRA adapter machinery: load safetensors-shaped dicts, fuse into params.

Capability parity with the reference's fused "multiple-angles" LoRA
(image_edit/qwen_image_edit.py:79-87: ``load_lora_weights`` +
``fuse_lora(lora_scale=1.25)``). Here fusion is a pure pytree transform:

    W' = W + scale · (alpha / r) · (down @ up)

applied to every 2-D Dense kernel whose flax path matches a LoRA entry
(conv kernels are skipped with a warning — reshape them to matrix form
before fusing).
``convert_safetensors_lora`` accepts both common key layouts
(``*.lora_A.weight``/``*.lora_B.weight`` and
``*.lora.down.weight``/``*.lora.up.weight``, with optional ``*.alpha``)
and maps the torch module path onto the flax params path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def convert_safetensors_lora(state: Dict) -> Dict[str, Tuple]:
    """safetensors-shaped dict → {module_path: (down, up, alpha)}.

    ``down (r, in)`` and ``up (out, r)`` keep the torch orientation;
    fusion transposes into the flax kernel layout.
    """
    def np_of(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v)

    downs, ups, alphas = {}, {}, {}
    for key, val in state.items():
        base = key
        for suffix, store in ((".lora_A.weight", downs),
                              (".lora_B.weight", ups),
                              (".lora.down.weight", downs),
                              (".lora.up.weight", ups),
                              (".lora_down.weight", downs),
                              (".lora_up.weight", ups)):
            if key.endswith(suffix):
                base = key[: -len(suffix)]
                store[base] = np_of(val)
                break
        else:
            if key.endswith(".alpha"):
                alphas[key[: -len(".alpha")]] = float(np_of(val))
    out = {}
    for base, down in downs.items():
        if base not in ups:
            continue
        r = down.shape[0]
        out[base] = (down, ups[base], alphas.get(base, float(r)))
    return out


def _find_kernel(params: Dict, path_parts):
    """Walk a flax params tree by dotted path; returns (subtree, leaf_key)
    or None."""
    node = params
    for part in path_parts[:-1]:
        if part not in node:
            return None
        node = node[part]
    leaf = path_parts[-1]
    if isinstance(node, dict) and leaf in node and "kernel" in node[leaf]:
        return node[leaf], "kernel"
    return None


def apply_lora(params: Dict, lora: Dict[str, Tuple],
               scale: float = 1.0) -> Tuple[Dict, int]:
    """Fuse LoRA deltas into a (mutable-copied) flax params tree.

    LoRA paths use '.'-separated module names matching the flax tree
    (torch '.' path ↔ flax nesting). Returns (new_params, n_fused).
    """
    def deep_copy(d):
        return {k: deep_copy(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    import warnings

    root = deep_copy(params["params"] if "params" in params else params)
    fused = 0
    skipped = []
    for path, (down, up, alpha) in lora.items():
        parts = path.split(".")
        hit = _find_kernel(root, parts)
        if hit is None:
            skipped.append(path)
            continue
        node, key = hit
        kernel = np.asarray(node[key])
        r = down.shape[0]
        delta = (up @ down).T * (scale * alpha / r)  # (in, out) flax layout
        if delta.shape != kernel.shape:
            if delta.T.shape == kernel.shape:
                delta = delta.T
            else:
                skipped.append(path)
                continue
        node[key] = jnp.asarray(kernel + delta.astype(kernel.dtype))
        fused += 1
    if skipped:
        warnings.warn(f"apply_lora: {len(skipped)} LoRA entries did not "
                      f"match any 2-D Dense kernel and were skipped "
                      f"(first: {skipped[0]!r})", stacklevel=2)
    if "params" in params:
        out = dict(params)  # preserve batch_stats/other collections
        out["params"] = root
        return out, fused
    return root, fused
