"""Memory-tracker per-frame budget on the real chip (VERDICT r2 #7).

Reproduces the round-2 98 ms/frame configuration (conv trunk,
features=128, heads=2 → head_dim 64, 7 slots, 512 px → 64×64 grid,
8 objects) and breaks the step into components, then measures the
dense-flash full-bank attention candidate.

Honest timing per CLAUDE.md: chained dependent steps + host readback of
a value that data-depends on all work.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from skix.ops.attention import flash_attention
from skix.tracking.memory_tracker import (MaskMemoryTracker, MemoryBank,
                                          init_memory, write_conditioning)

N_OBJ, SIZE, FEATURES, HEADS, SLOTS = 8, 512, 128, 2, 7
STEPS = 20


def timeit(fn, *args, steps=STEPS):
    out = fn(*args)           # compile
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    acc = None
    for _ in range(steps):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        acc = leaf if acc is None else acc + leaf * 0 + leaf
    # host readback forces completion through the axon relay
    float(jnp.sum(acc))
    return (time.time() - t0) / steps


def main():
    rng = np.random.default_rng(0)
    model = MaskMemoryTracker(features=FEATURES, num_heads=HEADS,
                              mem_slots=SLOTS, dtype=jnp.bfloat16)
    img = jnp.asarray(rng.random((1, SIZE, SIZE, 3)), jnp.float32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), img,
        init_memory(SLOTS, SIZE // 8, SIZE // 8, FEATURES),
        method=model.step))()
    gh = gw = SIZE // 8
    bank0 = init_memory(SLOTS, gh, gw, FEATURES)
    bank0 = MemoryBank(
        mem=jnp.asarray(rng.random((SLOTS, gh, gw, FEATURES)), jnp.float32),
        valid=jnp.ones((SLOTS,), bool), ring_pos=jnp.asarray(1))
    banks = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (N_OBJ, *x.shape)), bank0)

    @jax.jit
    def full_step(v, im, bk):
        feats = model.apply(v, im, method=model.encode_frame)
        return jax.vmap(lambda b: model.apply(
            v, feats, b, method=model.step_from_feats))(bk)

    t = timeit(lambda: full_step(variables, img, banks))
    print(f"v0 full multi-step (8 obj): {t * 1000:.1f} ms/frame")

    enc = jax.jit(lambda v, im: model.apply(v, im,
                                            method=model.encode_frame))
    t_enc = timeit(lambda: enc(variables, img))
    print(f"v1 frame encode:            {t_enc * 1000:.1f} ms")

    feats = enc(variables, img)

    @jax.jit
    def attend_all(v, f, bk):
        return jax.vmap(lambda b: model.apply(
            v, f, b, method=model.attend_decode))(bk)

    t_att = timeit(lambda: attend_all(variables, feats, banks))
    print(f"v2 attend+decode (8 obj):   {t_att * 1000:.1f} ms")

    @jax.jit
    def memenc_all(v, f, ml):
        return jax.vmap(lambda m: model.apply(
            v, f[0], m, method=model.encode_memory))(ml)

    masks = jnp.asarray(rng.random((N_OBJ, gh, gw)), jnp.float32)
    t_me = timeit(lambda: memenc_all(variables, feats, masks))
    print(f"v3 memory encode (8 obj):   {t_me * 1000:.1f} ms")

    # dense flash attention candidate: q (B,H,L,hd), kv (B,H,M*L,hd)
    hd = FEATURES // HEADS
    L = gh * gw
    q = jnp.asarray(rng.random((N_OBJ, HEADS, L, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.random((N_OBJ, HEADS, SLOTS * L, hd)), jnp.bfloat16)
    v_ = jnp.asarray(rng.random((N_OBJ, HEADS, SLOTS * L, hd)), jnp.bfloat16)

    f1 = jax.jit(lambda a, b, c: flash_attention(a, b, c))
    t_f = timeit(lambda: f1(q, k, v_))
    print(f"v4 flash dense 4096x{SLOTS * L} x2layers-equiv: "
          f"{t_f * 1000:.1f} ms/layer/8obj -> x2 = {2 * t_f * 1000:.1f} ms")

    # current scan attention in isolation (same shapes, for comparison)
    mem = jnp.asarray(rng.random((N_OBJ, SLOTS, L, FEATURES)), jnp.bfloat16)
    valid = jnp.ones((N_OBJ, SLOTS), bool)
    from skix.tracking.memory_tracker import _SlotCrossAttention

    sca = _SlotCrossAttention(num_heads=HEADS, dtype=jnp.bfloat16)
    qin = jnp.asarray(rng.random((N_OBJ, L, FEATURES)), jnp.bfloat16)
    sv = jax.jit(lambda: sca.init(jax.random.PRNGKey(1), qin, mem, valid))()
    f2 = jax.jit(lambda vv, a, b, c: sca.apply(vv, a, b, c))
    t_s = timeit(lambda: f2(sv, qin, mem, valid))
    print(f"v5 scan slot-attn isolated: {t_s * 1000:.1f} ms/layer/8obj")


if __name__ == "__main__":
    main()
