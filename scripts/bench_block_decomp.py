"""Window-block overhead decomposition (round 5).

bench_detector_profile2 measured the production window Block at
1.732 ms while its named parts (single-tile attention 0.157, MLP 0.507,
qkv+proj 0.17-0.68 at matmul rate, relayout 0.033) sum to ~0.9 ms.
This probes the remaining ~0.8 ms: MHA module alone (qkv dense +
head-split relayouts + kernel + merge + proj), the LN+residual
skeleton, an MLP sub-block, and layout variants.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_block_decomp.py
"""

import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))
from bench_calibration import fit_chain  # noqa: E402


def probe(name, fn, x0, lengths=(16, 48, 144)):
    def mk(n):
        @jax.jit
        def chain():
            def body(c, _):
                out = fn(c)
                return c * 0.999 + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return chain
    a, b, totals = fit_chain(mk, lengths)
    print(f"{name:16s} fixed a = {a * 1e3:6.1f} ms   per-iter b = "
          f"{b * 1e3:8.3f} ms   x28 = {b * 1e3 * 28:6.2f} ms/frame",
          flush=True)
    return b


def main():
    import flax.linen as nn

    from skix.models.layers import (Block, Mlp, MultiHeadAttention,
                                    make_grid_positions)

    key = jax.random.PRNGKey
    ws, D, H = 24, 1024, 16
    S = ws * ws
    x0 = jax.random.normal(key(0), (9, S, D), jnp.bfloat16)
    pos = jnp.broadcast_to(
        jnp.asarray(make_grid_positions(ws, ws))[None], (9, S, 2))

    # full production block (baseline)
    blk = Block(num_heads=H, mlp_ratio=4.625, qk_norm=False,
                dtype=jnp.bfloat16, rope_freq=100.0, rope_tables=True,
                attn_block=S)
    bv = jax.jit(lambda k: blk.init(k, x0, pos))(key(1))
    probe("block_full", lambda c: blk.apply(bv, c, pos), x0)

    # MHA module alone (qkv dense + relayouts + kernel + merge + proj)
    mha = MultiHeadAttention(H, dtype=jnp.bfloat16, rope_freq=100.0,
                             rope_tables=True, attn_block=S)
    mv = jax.jit(lambda k: mha.init(k, x0, pos))(key(2))
    probe("mha_module", lambda c: mha.apply(mv, c, pos), x0)

    # MHA without rope tables (is the in-kernel rope costly at G=4?)
    mha_nr = MultiHeadAttention(H, dtype=jnp.bfloat16, rope_freq=-1.0,
                                attn_block=S)
    mnv = jax.jit(lambda k: mha_nr.init(k, x0))(key(3))
    probe("mha_no_rope", lambda c: mha_nr.apply(mnv, c), x0)

    # LN + residual skeleton only
    ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    lv = ln.init(key(4), x0)
    probe("ln2_residual", lambda c: c + ln.apply(lv, c + ln.apply(lv, c)),
          x0)

    # Mlp sub-block (LN + fc1/gelu/fc2 + residual)
    mlp = Mlp(int(D * 4.625), dtype=jnp.bfloat16)
    pv = mlp.init(key(5), x0)
    probe("ln_mlp_res", lambda c: c + mlp.apply(pv, ln.apply(lv, c)), x0)

    # TWO chained blocks: if b ~= 2x the single block, the ~0.7 ms
    # composition overhead is per-block intrinsic; if less, the single-
    # block probe harness overstates it
    probe("block_x2",
          lambda c: blk.apply(bv, blk.apply(bv, c, pos), pos), x0,
          lengths=(8, 24, 72))

    # block with the attention kernel REPLACED by identity (attn_fn):
    # everything except the flash call — the non-kernel remainder
    blk_na = Block(num_heads=H, mlp_ratio=4.625, qk_norm=False,
                   dtype=jnp.bfloat16, attn_fn=lambda q, k, v: v)
    nav = jax.jit(lambda k: blk_na.init(k, x0))(key(7))
    probe("block_no_attn", lambda c: blk_na.apply(nav, c), x0)

    # the head-split relayout pair alone: (9,S,3C) -> 3x(9,H,S,hd) -> merge
    wqkv = jax.random.normal(key(6), (D, 3 * D), jnp.bfloat16) * 0.02

    def split_merge(c):
        qkv = (c @ wqkv).reshape(9, S, 3, H, D // H)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        out = (q + k * 0.5 + v * 0.25)          # stand-in for the kernel
        return out.transpose(0, 2, 1, 3).reshape(9, S, D)

    probe("qkv_split_merge", split_merge, x0)


if __name__ == "__main__":
    main()
