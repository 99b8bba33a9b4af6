"""Pattern-scoped optimizer factory, layer decay, and LR schedulers.

Reference-capability counterpart of the SAM3 train optim stack
(sam3/train/optim/optimizer.py: ``construct_optimizer`` builds torch
param groups from per-option scheduler configs with fnmatch param-name
constraints, ``layer_decay_param_modifier`` splits the LR option into
per-layer groups with BEiT-style decayed scales, ``GradientClipper``
clips globally; sam3/train/optim/schedulers.py:
``InverseSquareRootParamScheduler``).

TPU-first split: there is no host-side ``scheduler.step()`` mutating
param groups — every schedule is a pure ``step -> value`` function
evaluated *inside* the jitted update, and the whole factory lowers to a
single ``optax.multi_transform`` whose labels are computed once at
construction from the flattened flax param paths. Scheduled weight
decay (the reference schedules any optimizer option) is a 15-line
custom transform rather than a host loop.

Option semantics match the reference:
- each option (``lr``, ``weight_decay``) carries a list of rules;
  a rule scopes itself with unix-style patterns over ``a/b/c`` flax
  paths (the flax analog of both ``param_names`` and
  ``module_cls_names`` — flax auto-naming puts the module class in the
  path, so ``*/norm*/*`` covers what ``torch.nn.LayerNorm`` selects);
- at most one rule per option may omit patterns: it becomes the
  default for all remaining params (optimizer.py
  ``set_default_parameters``);
- every pattern must match ≥1 param, rules within an option must be
  disjoint, and the final groups must cover every param
  (``validate_param_group_params``) — violations raise ``ValueError``;
- the cross product of options yields the param groups
  (``map_scheduler_cfgs_to_param_groups``).
"""

from __future__ import annotations

import dataclasses
import fnmatch
import re
from typing import Callable, Mapping, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import optax
from flax.traverse_util import flatten_dict, unflatten_dict

ScheduleLike = Union[float, int, Callable[[int], jnp.ndarray]]


# --------------------------------------------------------------------------
# Schedulers
# --------------------------------------------------------------------------
def constant_schedule(value: float) -> Callable:
    """fvcore ConstantParamScheduler equivalent."""
    return lambda step: jnp.asarray(value, jnp.float32)


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int,
                          cooldown_steps: int, timescale: int,
                          total_steps: int) -> Callable:
    """Inverse-square-root LR with linear warmup and cooldown.

    Formula parity with the reference
    ``InverseSquareRootParamScheduler.__call__`` (schedulers.py:20-41),
    which receives ``where = step / total_steps``; here ``total_steps``
    is bound at construction so the schedule is a pure step->value fn
    (jnp-safe, usable inside the jitted update)."""
    base_lr = float(base_lr)
    shift = timescale - warmup_steps

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.where(step > warmup_steps,
                       base_lr / jnp.sqrt((step + shift) / timescale),
                       base_lr)
        if warmup_steps:
            lr = lr * jnp.minimum(1.0, step / warmup_steps)
        if cooldown_steps:
            # step-0 quirk replicated for exact parity: the reference
            # derives total_steps = step/where, which is 1 when
            # where == 0 (their trainer primes schedulers at step 0),
            # so the first step sees cooldown factor 1/cooldown.
            eff_total = jnp.where(step > 0, float(total_steps), 1.0)
            lr = lr * jnp.clip((eff_total - step) / cooldown_steps,
                               0.0, 1.0)
        return lr

    return sched


def warmup_cosine_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int, end_lr: float = 0.0) -> Callable:
    """fvcore CosineParamScheduler + warmup equivalent (optax native)."""
    return optax.warmup_cosine_decay_schedule(
        0.0, base_lr, max(warmup_steps, 1), total_steps, end_value=end_lr)


def as_schedule(s: ScheduleLike) -> Callable:
    if callable(s):
        return s
    return constant_schedule(float(s))


# --------------------------------------------------------------------------
# Option rules
# --------------------------------------------------------------------------
@dataclasses.dataclass
class OptionRule:
    """One scheduler config for one optimizer option (optimizer.py:344
    scheduler_cfg semantics). ``param_names=None`` marks the default
    rule that absorbs all params no other rule of the option claims."""

    schedule: ScheduleLike
    param_names: Optional[Sequence[str]] = None


def _resolve_option(rules: Sequence[OptionRule], all_paths: Sequence[str],
                    option: str):
    """Pattern-match each rule to concrete paths; assign the default.

    Returns list of (schedule, frozenset(paths)); raises ValueError on
    unmatched patterns, overlapping rules, or >1 default (the
    reference's asserts in set_default_parameters /
    unix_param_pattern_to_parameter_names)."""
    taken: set[str] = set()
    resolved: list[tuple[ScheduleLike, frozenset]] = []
    default_rules = [r for r in rules if r.param_names is None]
    if len(default_rules) > 1:
        raise ValueError(f"option {option!r}: only one default rule allowed")
    for rule in rules:
        if rule.param_names is None:
            continue
        matched: set[str] = set()
        for pat in rule.param_names:
            hits = set(fnmatch.filter(all_paths, pat))
            if not hits:
                raise ValueError(
                    f"option {option!r}: pattern {pat!r} matches no params")
            matched |= hits
        overlap = matched & taken
        if overlap:
            raise ValueError(
                f"option {option!r}: rules overlap on {sorted(overlap)[:3]}")
        taken |= matched
        resolved.append((rule.schedule, frozenset(matched)))
    rest = frozenset(p for p in all_paths if p not in taken)
    if default_rules:
        resolved.append((default_rules[0].schedule, rest))
    elif rest:
        # no default rule: remaining params get the option's factory
        # default (reference appends an option-less cfg; the torch
        # optimizer default stands in — here the caller's base value).
        resolved.append((None, rest))
    return resolved


# --------------------------------------------------------------------------
# Layer decay
# --------------------------------------------------------------------------
def vit_layer_id(path: str, num_layers: int) -> int:
    """BEiT layer-id map in flax-path terms (reference
    vitdet.py:861-876 ``get_layer_id``): embeddings/pre-norm -> 0,
    ``block_i`` -> i+1, rel-pos and everything else -> num_layers+1."""
    if "rel_pos" in path:
        return num_layers + 1
    if "ln_pre" in path or "pos_embed" in path or "cls_token" in path:
        return 0
    if "patch_embed" in path:
        return 0
    m = re.search(r"block_(\d+)/", path)
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1


def infer_num_layers(paths: Sequence[str], apply_to: str) -> int:
    ids = [int(m.group(1)) for p in paths if p.startswith(apply_to)
           for m in [re.search(r"block_(\d+)/", p)] if m]
    return max(ids) + 1 if ids else 0


@dataclasses.dataclass
class LayerDecay:
    """BEiT-style layer-wise LR decay (optimizer.py:420-498
    ``layer_decay_param_modifier``): params under ``apply_to`` get their
    LR schedule scaled by ``value ** (num_layers + 1 - layer_id)``
    (clamped at ``minimum``); ``overrides`` pin specific patterns to a
    fixed scale (e.g. ``{"*pos_embed*": 1.0}`` as the reference configs
    do)."""

    value: float
    apply_to: str = ""
    minimum: Optional[float] = None
    overrides: Mapping[str, float] = dataclasses.field(default_factory=dict)
    layer_id_fn: Callable[[str, int], int] = vit_layer_id
    num_layers: Optional[int] = None

    def scale_for(self, path: str, num_layers: int) -> float:
        lid = num_layers + 1
        if path.startswith(self.apply_to):
            rel = path[len(self.apply_to):].lstrip("/")
            for pat, val in self.overrides.items():
                if fnmatch.fnmatchcase(rel, pat) or fnmatch.fnmatchcase(
                        path, pat):
                    return float(val)
            lid = self.layer_id_fn(rel, num_layers)
        scale = self.value ** (num_layers + 1 - lid)
        if self.minimum is not None:
            scale = max(scale, self.minimum)
        return float(scale)


class _ScaledSchedule:
    """ValueScaler equivalent (optimizer.py:397-404) with a stable
    identity for group dedup: (schedule, scale) pairs compare equal."""

    def __init__(self, schedule: ScheduleLike, scale: float):
        self.schedule = schedule
        self.scale = float(scale)

    def __call__(self, step):
        return as_schedule(self.schedule)(step) * self.scale

    def __eq__(self, other):
        return (isinstance(other, _ScaledSchedule)
                and other.schedule is self.schedule
                and other.scale == self.scale)

    def __hash__(self):
        return hash((id(self.schedule), self.scale))


def _apply_layer_decay(lr_resolved, all_paths, ld: LayerDecay):
    """Split each LR rule's param set by layer-decay scale."""
    num_layers = (ld.num_layers if ld.num_layers is not None
                  else infer_num_layers(all_paths, ld.apply_to))
    out = []
    for sched, paths in lr_resolved:
        by_scale: dict[float, set] = {}
        for p in paths:
            by_scale.setdefault(ld.scale_for(p, num_layers), set()).add(p)
        for scale, group in sorted(by_scale.items()):
            if scale == 1.0:
                s = sched
            elif callable(sched):
                s = _ScaledSchedule(sched, scale)
            else:
                s = float(sched) * scale
            out.append((s, frozenset(group)))
    return out


# --------------------------------------------------------------------------
# Scheduled weight decay transform
# --------------------------------------------------------------------------
def add_scheduled_decay(wd: ScheduleLike) -> optax.GradientTransformation:
    """add_decayed_weights with a step-indexed schedule (the reference
    schedules weight_decay like any other option)."""
    if not callable(wd):
        return optax.add_decayed_weights(float(wd))
    sched = as_schedule(wd)

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("scheduled weight decay requires params")
        w = sched(state.count)
        updates = jax.tree_util.tree_map(lambda u, p: u + w * p,
                                         updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


# --------------------------------------------------------------------------
# Factory
# --------------------------------------------------------------------------
def construct_optimizer(params, options: Mapping[str, Sequence[OptionRule]],
                        *, base_lr: float = 1e-4,
                        base_weight_decay: float = 0.0,
                        b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8,
                        grad_clip_norm: Optional[float] = None,
                        layer_decay: Optional[LayerDecay] = None):
    """Build one ``optax`` transformation from per-option rules.

    ``params``: the model's param pytree (paths are ``/``-joined keys).
    ``options``: ``{"lr": [OptionRule...], "weight_decay": [...]}``.
    Returns ``(tx, groups)`` where ``groups`` is a list of
    ``{"paths", "lr", "weight_decay"}`` dicts (the flax analog of torch
    param groups) for inspection and tests.
    """
    flat = flatten_dict(params)
    all_paths = sorted("/".join(map(str, k)) for k in flat)
    known = {"lr", "weight_decay"}
    unknown = set(options) - known
    if unknown:
        raise ValueError(f"unsupported optimizer options: {sorted(unknown)}")

    lr_res = _resolve_option(options.get("lr", []), all_paths, "lr")
    if not lr_res:
        lr_res = [(None, frozenset(all_paths))]
    # resolve factory defaults before layer decay so scales multiply a
    # concrete base value
    lr_res = [(base_lr if s is None else s, p) for s, p in lr_res]
    if layer_decay is not None:
        lr_res = _apply_layer_decay(lr_res, all_paths, layer_decay)
    wd_res = _resolve_option(options.get("weight_decay", []), all_paths,
                             "weight_decay")
    if not wd_res:
        wd_res = [(None, frozenset(all_paths))]

    groups: list[dict] = []
    txs: dict[str, optax.GradientTransformation] = {}
    path_label: dict[str, str] = {}
    for lr_s, lr_paths in lr_res:
        for wd_s, wd_paths in wd_res:
            inter = lr_paths & wd_paths
            if not inter:
                continue
            label = f"g{len(groups)}"
            lr_eff: ScheduleLike = lr_s
            wd_eff: ScheduleLike = (base_weight_decay if wd_s is None
                                    else wd_s)
            steps = [optax.scale_by_adam(b1=b1, b2=b2, eps=eps)]
            if callable(wd_eff) or float(wd_eff) != 0.0:
                steps.append(add_scheduled_decay(wd_eff))
            if callable(lr_eff):
                steps.append(optax.scale_by_schedule(
                    lambda s, _f=as_schedule(lr_eff): -_f(s)))
            else:
                steps.append(optax.scale(-float(lr_eff)))
            txs[label] = optax.chain(*steps)
            groups.append({"label": label, "paths": sorted(inter),
                           "lr": lr_eff, "weight_decay": wd_eff})
            for p in inter:
                path_label[p] = label

    covered = set(path_label)
    if covered != set(all_paths):  # pragma: no cover - construction invariant
        raise ValueError(
            f"param groups do not cover {sorted(set(all_paths) - covered)[:3]}")

    labels = unflatten_dict(
        {k: path_label["/".join(map(str, k))] for k in flat})
    tx = optax.multi_transform(txs, labels)
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_clip_norm)), tx)
    return tx, groups
