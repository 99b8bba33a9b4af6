"""One-harness chip-throughput calibration (VERDICT-r4 #3).

docs/PERF.md carried two numbers that cannot describe one chip: the
lifting conv stack at 152 TF/s (77% of v5e bf16 peak) and a "pure
4608^3 bf16 matmul" at 49.6 TF/s (decomp6's xla_big probe). Hypothesis:
the matmul chains ran 10 scanned iterations (~10-20 ms of device work
per timed call) while the lifting bench runs ~435 ms per timed call —
any FIXED per-call cost through the axon relay (dispatch + schedule +
scalar readback, and the relay's block_until_ready early-return quirk)
contaminates the short chain and vanishes in the long one.

Method: every probe is ONE jitted lax.scan chain with a terminal
host readback, measured at several chain lengths n. Fitting
``total_seconds = a + b*n`` separates the fixed per-call overhead (a)
from the true per-iteration time (b); TF/s is computed from b. If the
old 10-iter numbers were clean, a ~= 0 and the asymptote matches them;
if a is tens of ms, the old short-chain numbers undercount the chip and
the window-wall ceiling calibration must be restated.

Probes:
  lifting     full-size TemporalLifter step (B=8, T_out=512) — the
              headline bench config (33.55 MFLOP/output frame, halo
              frames counted as useful like bench.py does)
  big_matmul  4608^3 bf16 c@c chain (decomp6 xla_big, same epilogue)
  small_nn    (576,512)x(512,4608) bf16 — the window-op size class
              (decomp6/PERF "18-20 TF/s" claim), batched x9 windows
  win_flash   the production single-tile window flash-attention call
              at the ViT-Det shape (9 win x 16 heads x 576 x 64)

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_calibration.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def fit_chain(make_chain, lengths=(10, 40, 160)):
    """Time one jitted scan-chain at several lengths; return (a, b) of
    total = a + b*n via least squares plus the per-length raw totals."""
    totals = []
    for n in lengths:
        chain = make_chain(n)
        _ = float(chain())           # compile + sync
        t0 = time.perf_counter()
        _ = float(chain())
        totals.append(time.perf_counter() - t0)
    n_arr = np.asarray(lengths, np.float64)
    t_arr = np.asarray(totals, np.float64)
    A = np.stack([np.ones_like(n_arr), n_arr], -1)
    (a, b), *_ = np.linalg.lstsq(A, t_arr, rcond=None)
    return a, b, dict(zip(lengths, totals))


def report(name, flops_per_iter, a, b, totals):
    print(f"{name:11s} fixed a = {a * 1e3:7.1f} ms   per-iter b = "
          f"{b * 1e3:8.3f} ms  ->  {flops_per_iter / b / 1e12:6.1f} TF/s "
          f"(asymptotic)", flush=True)
    for n, t in totals.items():
        naive = flops_per_iter * n / t / 1e12
        print(f"             n={n:4d}: total {t * 1e3:8.1f} ms   naive "
              f"{naive:6.1f} TF/s", flush=True)


def probe_big_matmul():
    N = 4608
    a0 = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.bfloat16)

    def make_chain(n):
        @jax.jit
        def chain():
            def body(c, _):
                return (c @ c * jnp.bfloat16(1e-4)
                        + a0 * jnp.bfloat16(1e-3)), ()
            c, _ = jax.lax.scan(body, a0, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return chain

    report("big_matmul", 2.0 * N ** 3, *fit_chain(make_chain))


def probe_small_nn():
    B, M, K, N = 9, 576, 512, 4608
    q0 = jax.random.normal(jax.random.PRNGKey(1), (B, M, K), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.PRNGKey(2), (B, K, N), jnp.bfloat16)

    def make_chain(n):
        @jax.jit
        def chain():
            def body(c, _):
                s = jnp.einsum("bmk,bkn->bmn", c, k0,
                               preferred_element_type=jnp.float32)
                return c + s[:, :, :K].astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, q0, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return chain

    report("small_nn", 2.0 * B * M * K * N, *fit_chain(make_chain))


def probe_lifting():
    from skix.models.videopose3d import TemporalLifter

    model = TemporalLifter(filter_widths=(3, 3, 3, 3, 3), channels=1024,
                           compute_dtype=jnp.bfloat16)
    variables = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, model.rf, 17, 2)), train=False))(
        jax.random.PRNGKey(0))
    B, T_out = 8, 512
    rf = model.rf
    x0 = jax.random.normal(jax.random.PRNGKey(3),
                           (B, T_out + rf - 1, 17, 2), jnp.float32)

    def make_chain(n):
        @jax.jit
        def chain():
            def body(c, _):
                out = model.apply(variables, c, train=False)
                nxt = c * 0.999 + jnp.pad(
                    out[..., :2],
                    ((0, 0), (0, rf - 1), (0, 0), (0, 0))) * 1e-3
                return nxt, ()
            c, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(c)
        return chain

    # bench.py's convention: per-OUTPUT-frame FLOPs (33.55 M) x B x T_out
    flops = 33.55e6 * B * T_out
    report("lifting", flops, *fit_chain(make_chain, lengths=(5, 20, 80)))


def probe_win_flash():
    from skix.ops.attention import flash_attention

    W, H, S, D = 9, 16, 576, 64
    mk = jax.random.PRNGKey
    q0 = jax.random.normal(mk(4), (W, H, S, D), jnp.bfloat16)
    k0 = jax.random.normal(mk(5), (W, H, S, D), jnp.bfloat16)
    v0 = jax.random.normal(mk(6), (W, H, S, D), jnp.bfloat16)

    def make_chain(n):
        @jax.jit
        def chain():
            def body(c, _):
                out = flash_attention(c, k0, v0, fixed_max=12.0,
                                      block_q=S, block_k_major=S,
                                      block_k=S)
                return c + out.astype(c.dtype) * 1e-3, ()
            c, _ = jax.lax.scan(body, q0, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return chain

    # useful attention FLOPs (QK^T + pV)
    report("win_flash", 4.0 * W * H * S * S * D, *fit_chain(make_chain))


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    probe_big_matmul()
    probe_small_nn()
    probe_win_flash()
    probe_lifting()
