"""Process-wide cached jitted ``model.apply``.

The recompile trap: ``jax.jit(lambda v, x: model.apply(v, x))`` built
inside a per-video/per-clip function creates a NEW jitted callable every
call, so every clip pays a full compile (20–40 s through the axon
remote-compile tunnel). Flax modules are frozen dataclasses — hashable
and comparable — so one module-level jitted entry keyed on the module
(static) serves every call site with jit-cache hits across clips.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.jit, static_argnums=(0, 1))
def apply_model(model, method_name, variables, *args):
    """``model.apply(variables, *args[, method=<method_name>])`` jitted
    once per (module config, method, arg shapes)."""
    if method_name is None:
        return model.apply(variables, *args)
    return model.apply(variables, *args, method=getattr(model, method_name))
