"""Memory-tracker per-frame budget on the real chip (VERDICT r2 #7).

Round-2 config: conv trunk, features=128, heads=2 → head_dim 64,
7 slots, 512 px → 64×64 grid, 8 objects.

Honest timing (CLAUDE.md): UNROLL steps statically unrolled inside ONE
jit with the memory bank threading the data dependency, host readback
of a scalar that depends on all work, warm-up call read back the same
way (``block_until_ready`` returns early under the axon relay —
per-dispatch timing of ~100 ms programs is dominated by relay noise).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from skix.tracking.memory_tracker import (MaskMemoryTracker, MemoryBank,
                                          init_memory)

N_OBJ, SIZE, FEATURES, HEADS, SLOTS = 8, 512, 128, 2, 7
UNROLL, REPS = 10, 3


def bench_chained(make_body, name):
    """make_body(tot) -> new_tot chains UNROLL times inside one jit."""
    @jax.jit
    def chained():
        tot = jnp.asarray(0.0)
        for _ in range(UNROLL):
            tot = make_body(tot)
        return tot

    float(chained())                       # compile + warm-up readback
    t0 = time.time()
    for _ in range(REPS):
        float(chained())
    dt = (time.time() - t0) / (REPS * UNROLL)
    print(f"{name}: {dt * 1000:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    model = MaskMemoryTracker(features=FEATURES, num_heads=HEADS,
                              mem_slots=SLOTS, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((1, SIZE, SIZE, 3)), jnp.float32)
    gh = gw = SIZE // 8
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), img, init_memory(SLOTS, gh, gw, FEATURES),
        method=model.step))()
    bank0 = MemoryBank(
        mem=jnp.asarray(rng.random((SLOTS, gh, gw, FEATURES)), jnp.float32),
        valid=jnp.ones((SLOTS,), bool), ring_pos=jnp.asarray(1))
    banks = jax.tree.map(
        lambda x: jnp.asarray(np.broadcast_to(np.asarray(x)[None],
                                              (N_OBJ, *x.shape))), bank0)

    def full_step(dense):
        bk = {"b": banks}       # rebind per closure call

        def body(tot):
            feats = model.apply(variables, img + tot * 1e-20,
                                method=model.encode_frame)
            m, s, bk["b"] = jax.vmap(lambda b: model.apply(
                variables, feats, b, True, dense,
                method=model.step_from_feats))(bk["b"])
            return tot + jnp.sum(s)

        return body

    bench_chained(full_step(False), "full step @8obj, slot-scan attn ")
    bench_chained(full_step(True), "full step @8obj, dense flash attn")

    def enc_body(tot):
        f = model.apply(variables, img + tot * 1e-20,
                        method=model.encode_frame)
        return tot + jnp.sum(f)

    bench_chained(enc_body, "frame encode                     ")

    feats = jax.jit(lambda: model.apply(variables, img,
                                        method=model.encode_frame))()

    def att_body(dense):
        def body(tot):
            m, s = jax.vmap(lambda b: model.apply(
                variables, feats + tot * 1e-20, b, dense,
                method=model.attend_decode))(banks)
            return tot + jnp.sum(s)
        return body

    bench_chained(att_body(False), "attend+decode @8obj scan         ")
    bench_chained(att_body(True), "attend+decode @8obj dense        ")

    masks = jnp.asarray(rng.random((N_OBJ, gh, gw)), jnp.float32)

    def me_body(tot):
        mm = jax.vmap(lambda m: model.apply(
            variables, feats[0] + tot * 1e-20, m,
            method=model.encode_memory))(masks)
        return tot + jnp.sum(mm)

    bench_chained(me_body, "memory encode @8obj              ")


if __name__ == "__main__":
    main()
