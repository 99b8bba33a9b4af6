"""Mask-memory tracker tests: ring-buffer mechanics + propagation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.tracking.memory_tracker import (
    MaskMemoryTracker,
    MemoryBank,
    init_memory,
    propagate_object,
    write_conditioning,
    write_recent,
)

rng = np.random.default_rng(101)


class TestMemoryBank:
    def test_ring_never_evicts_conditioning(self):
        bank = init_memory(3, 2, 2, 4)
        cond = jnp.ones((2, 2, 4))
        bank = write_conditioning(bank, cond)
        for i in range(5):
            bank = write_recent(bank, jnp.full((2, 2, 4), float(i + 2)))
        np.testing.assert_allclose(np.asarray(bank.mem[0]), 1.0)
        assert bool(bank.valid[0])
        # recent slots hold the latest writes (ring over slots 1..2)
        recent_vals = {float(bank.mem[1, 0, 0, 0]),
                       float(bank.mem[2, 0, 0, 0])}
        assert recent_vals == {5.0, 6.0}

    def test_valid_tracking(self):
        bank = init_memory(4, 2, 2, 4)
        assert not bool(jnp.any(bank.valid))
        bank = write_recent(bank, jnp.ones((2, 2, 4)))
        assert int(jnp.sum(bank.valid)) == 1


class TestTracker:
    def _model_and_vars(self, H=32, W=32):
        model = MaskMemoryTracker(features=16, num_heads=2, mem_slots=3)
        frames = jnp.zeros((1, H, W, 3))
        bank = init_memory(3, H // 8, W // 8, 16)
        variables = model.init(jax.random.PRNGKey(0), frames, bank,
                               method=model.step)
        return model, variables

    def test_step_shapes(self):
        model, variables = self._model_and_vars()
        bank = init_memory(3, 4, 4, 16)
        img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        m, s, bank2 = model.apply(variables, img, bank, method=model.step)
        assert m.shape == (1, 4, 4)
        assert s.shape == (1,)
        assert int(jnp.sum(bank2.valid)) == 1  # one recent memory written

    def test_conditioning_changes_prediction(self):
        model, variables = self._model_and_vars()
        img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
        bank0 = init_memory(3, 4, 4, 16)
        mask_a = np.zeros((32, 32), np.float32)
        mask_a[:16] = 1.0
        mask_b = 1.0 - mask_a
        bank_a = model.apply(variables, img, jnp.asarray(mask_a)[None],
                             bank0, method=model.init_from_mask)
        bank_b = model.apply(variables, img, jnp.asarray(mask_b)[None],
                             bank0, method=model.init_from_mask)
        ma, _, _ = model.apply(variables, img, bank_a, method=model.step)
        mb, _, _ = model.apply(variables, img, bank_b, method=model.step)
        assert not np.allclose(np.asarray(ma), np.asarray(mb))

    def test_propagate_clip(self):
        model, variables = self._model_and_vars()
        frames = rng.integers(0, 255, (5, 32, 32, 3)).astype(np.uint8)
        first_mask = np.zeros((32, 32), bool)
        first_mask[8:24, 8:24] = True
        masks, scores = propagate_object(model, variables, frames,
                                         jnp.asarray(first_mask))
        assert masks.shape == (5, 4, 4)
        assert scores.shape == (5,)
        assert np.all(np.isfinite(masks)) and np.all(np.isfinite(scores))


class TestReferenceCapabilityPieces:
    def test_cxblock_residual_identity_at_init_scale(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from skix.tracking.memory_tracker import CXBlock

        blk = CXBlock(dim=16)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 16)),
                        jnp.float32)
        v = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(v, x)
        # layerscale 1e-6 makes the block ≈ identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)

    def test_mask_downsampler_stride(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from skix.tracking.memory_tracker import MaskDownSampler

        ds = MaskDownSampler(embed_dim=8, stride=4, total_stride=4)
        m = jnp.ones((1, 32, 32, 1))
        v = ds.init(jax.random.PRNGKey(0), m)
        out = ds.apply(v, m)
        assert out.shape == (1, 8, 8, 8)

    def test_vitdet_trunk_tracks(self):
        import jax
        import numpy as np

        from skix.tracking.memory_tracker import (MaskMemoryTracker,
                                                  propagate_object)

        model = MaskMemoryTracker(features=16, num_heads=2, mem_slots=3,
                                  trunk="vitdet", vit_embed_dim=32,
                                  vit_depth=1)
        rng = np.random.default_rng(4)
        frames = rng.uniform(0, 1, (3, 28, 28, 3)).astype(np.float32)
        first = np.zeros((28, 28), bool)
        first[8:20, 8:20] = True
        variables = jax.jit(lambda k: model.init(
            k, frames[:1], init_memory_shapes=None), static_argnums=())(
            jax.random.PRNGKey(0)) if False else model.init(
            jax.random.PRNGKey(0), frames[:1], method=model.encode_frame)
        # init full params through one step
        from skix.tracking.memory_tracker import init_memory

        feats = model.apply(variables, frames[:1],
                            method=model.encode_frame)
        gh, gw = feats.shape[1:3]
        bank = init_memory(3, gh, gw, model.features)
        variables = model.init(jax.random.PRNGKey(0), frames[:1], bank,
                               method=model.step)
        masks, scores = propagate_object(model, variables, frames, first)
        assert masks.shape == (3, gh, gw)
        assert np.all(np.isfinite(masks)) and np.all(np.isfinite(scores))


class TestSamMaskDecoder:
    def _setup(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from skix.tracking.sam_decoder import SamMaskDecoder

        rng = np.random.default_rng(77)
        dec = SamMaskDecoder(transformer_dim=32, num_heads=4, depth=2)
        feat = jnp.asarray(rng.normal(size=(2, 8, 8, 32)), jnp.float32)
        v = dec.init(jax.random.PRNGKey(0), feat)
        return dec, feat, v

    def test_output_contract(self):
        import numpy as np

        import jax

        dec, feat, v = self._setup()
        out = dec.apply(v, feat)
        assert out.mask_logits.shape == (2, 32, 32)        # 4× upscale
        assert out.all_mask_logits.shape == (2, 4, 32, 32)  # 1 + 3 multi
        assert out.iou_pred.shape == (2, 4)
        assert out.obj_score.shape == (2,)
        assert out.mask_token.shape == (2, 32)
        for leaf in jax.tree.leaves(out):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_multimask_selects_best_iou(self):
        import numpy as np
        import jax.numpy as jnp

        dec, feat, v = self._setup()
        out = dec.apply(v, feat, multimask_output=True)
        best = np.asarray(jnp.argmax(out.iou_pred[:, 1:], -1)) + 1
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(out.mask_logits[b]),
                np.asarray(out.all_mask_logits[b, best[b]]))

    def test_prompt_tokens_condition_output(self):
        import numpy as np

        import jax
        import jax.numpy as jnp

        from skix.tracking.sam_decoder import SamMaskDecoder

        rng = np.random.default_rng(78)
        dec = SamMaskDecoder(transformer_dim=32, num_heads=4, depth=1)
        feat = jnp.asarray(rng.normal(size=(1, 8, 8, 32)), jnp.float32)
        p1 = jnp.asarray(rng.normal(size=(1, 2, 32)), jnp.float32)
        v = dec.init(jax.random.PRNGKey(0), feat, prompt_tokens=p1)
        o1 = dec.apply(v, feat, prompt_tokens=p1)
        o2 = dec.apply(v, feat, prompt_tokens=p1 * -1.0)
        assert not np.allclose(np.asarray(o1.mask_logits),
                               np.asarray(o2.mask_logits))

    def test_jit_and_grad(self):
        import numpy as np

        import jax
        import jax.numpy as jnp

        dec, feat, v = self._setup()

        def loss(v):
            out = dec.apply(v, feat)
            return (jnp.sum(out.mask_logits ** 2) * 1e-3
                    + jnp.sum(out.iou_pred ** 2)
                    + jnp.sum(out.obj_score ** 2))

        g = jax.jit(jax.grad(loss))(v)
        assert all(bool(jnp.all(jnp.isfinite(x)))
                   for x in jax.tree.leaves(g))


class TestSlotCrossAttention:
    """The online-softmax slot scan must equal a dense masked softmax."""

    def _dense_oracle(self, params, q_in, mem, slot_valid, H):
        # reconstruct dense masked MHA from the same projection weights
        def proj(name, x):
            p = params["params"][name]
            return np.einsum("...c,chd->...hd", x, np.asarray(p["kernel"])) \
                + np.asarray(p["bias"])

        B, M, L, C = mem.shape
        hd = C // H
        q = proj("query", q_in) / np.sqrt(hd)
        k = proj("key", mem).reshape(B, M * L, H, hd)
        v = proj("value", mem).reshape(B, M * L, H, hd)
        s = np.einsum("bqhd,bkhd->bhqk", q, k)
        ok = np.repeat(slot_valid, L, axis=1)[:, None, None, :]
        s = np.where(ok, s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        out = np.einsum("bhqk,bkhd->bqhd", p, v)
        po = params["params"]["out"]
        return np.einsum("bqhd,hdc->bqc", out, np.asarray(po["kernel"])) \
            + np.asarray(po["bias"])

    def test_matches_dense_masked_softmax(self):
        from skix.tracking.memory_tracker import _SlotCrossAttention

        r = np.random.default_rng(7)
        B, M, L, Lq, C, H = 2, 4, 8, 6, 16, 2
        q_in = jnp.asarray(r.standard_normal((B, Lq, C)), jnp.float32)
        mem = jnp.asarray(r.standard_normal((B, M, L, C)), jnp.float32)
        valid = jnp.asarray([[True, False, True, False],
                             [True, True, True, True]])
        attn = _SlotCrossAttention(num_heads=H)
        params = attn.init(jax.random.PRNGKey(0), q_in, mem, valid)
        got = np.asarray(attn.apply(params, q_in, mem, valid))
        want = self._dense_oracle(params, np.asarray(q_in), np.asarray(mem),
                                  np.asarray(valid), H)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_single_valid_zero_slot_is_finite(self):
        from skix.tracking.memory_tracker import _SlotCrossAttention

        r = np.random.default_rng(8)
        q_in = jnp.asarray(r.standard_normal((1, 5, 16)), jnp.float32)
        mem = jnp.zeros((1, 3, 4, 16))
        valid = jnp.asarray([[True, False, False]])
        attn = _SlotCrossAttention(num_heads=2)
        params = attn.init(jax.random.PRNGKey(0), q_in, mem, valid)
        out = attn.apply(params, q_in, mem, valid)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestMultiObjectStep:
    def test_encode_once_vmap_matches_full_step(self):
        model = MaskMemoryTracker(features=16, num_heads=2, mem_slots=3)
        r = np.random.default_rng(11)
        img = jnp.asarray(r.random((1, 32, 32, 3)), jnp.float32)
        bank0 = init_memory(3, 4, 4, 16)
        variables = model.init(jax.random.PRNGKey(0), img, bank0,
                               method=model.step)
        banks = jax.tree.map(
            lambda x: jnp.stack([x, x + (0.1 if x.dtype != bool else 0)])
            if x.dtype != bool else jnp.stack([x, x]), bank0)
        banks = banks._replace(
            valid=jnp.asarray([[True, False, False], [True, True, False]]),
            ring_pos=jnp.asarray([1, 2]))
        full = jax.vmap(
            lambda b: model.apply(variables, img, b, method=model.step))(banks)
        feats = model.apply(variables, img, method=model.encode_frame)
        half = jax.vmap(
            lambda b: model.apply(variables, feats, b,
                                  method=model.step_from_feats))(banks)
        np.testing.assert_allclose(np.asarray(full[0]), np.asarray(half[0]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(full[1]), np.asarray(half[1]),
                                   atol=1e-6)

    def test_propagate_objects_matches_single(self):
        from skix.tracking.memory_tracker import propagate_objects

        model = MaskMemoryTracker(features=16, num_heads=2, mem_slots=3)
        r = np.random.default_rng(12)
        frames = np.asarray(r.random((3, 32, 32, 3)), np.float32)
        bank = init_memory(3, 4, 4, 16)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(frames[:1]), bank,
                               method=model.step)
        m0 = np.zeros((2, 32, 32), bool)
        m0[0, 4:12, 4:12] = True
        m0[1, 16:28, 16:28] = True
        masks, scores = propagate_objects(model, variables, frames, m0)
        assert masks.shape == (3, 2, 4, 4) and scores.shape == (3, 2)
        # each object tracked independently == single-object propagation
        m_a, s_a = propagate_object(model, variables, frames, m0[0])
        np.testing.assert_allclose(masks[:, 0], m_a, atol=1e-5)
        np.testing.assert_allclose(scores[:, 0], s_a, atol=1e-5)


class TestDenseFastPath:
    """The flash/dense path with the closed-form invalid-slot correction
    must equal the masked slot scan (VERDICT r2 #7 fast path)."""

    def test_dense_equals_scan_with_constant_pad_slots(self):
        from skix.tracking.memory_tracker import _SlotCrossAttention

        r = np.random.default_rng(9)
        B, M, L, Lq, C, H = 2, 4, 8, 6, 16, 2
        q_in = jnp.asarray(r.standard_normal((B, Lq, C)), jnp.float32)
        pad = jnp.asarray(r.standard_normal((C,)), jnp.float32)
        mem = r.standard_normal((B, M, L, C)).astype(np.float32)
        valid = np.asarray([[True, False, True, False],
                            [True, True, True, False]])
        # invariant: every token of an invalid slot equals the pad token
        for b in range(B):
            for m in range(M):
                if not valid[b, m]:
                    mem[b, m] = np.asarray(pad)
        mem = jnp.asarray(mem)
        valid = jnp.asarray(valid)
        scan = _SlotCrossAttention(num_heads=H)
        params = scan.init(jax.random.PRNGKey(0), q_in, mem, valid)
        want = np.asarray(scan.apply(params, q_in, mem, valid))
        dense = _SlotCrossAttention(num_heads=H, dense=True)
        got = np.asarray(dense.apply(params, q_in, mem, valid, pad))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_attend_decode_dense_equals_scan(self):
        from skix.tracking.memory_tracker import (MaskMemoryTracker,
                                                  MemoryBank, init_memory)

        r = np.random.default_rng(10)
        model = MaskMemoryTracker(features=32, num_heads=2, mem_slots=4)
        img = jnp.asarray(r.random((1, 32, 32, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), img,
                       init_memory(4, 4, 4, 32), method=model.step)
        feats = model.apply(v, img, method=model.encode_frame)
        gh, gw = feats.shape[1], feats.shape[2]
        # bank with 2 valid slots, zeros elsewhere (the write invariant)
        mem = np.zeros((4, gh, gw, 32), np.float32)
        mem[0] = r.standard_normal((gh, gw, 32))
        mem[1] = r.standard_normal((gh, gw, 32))
        bank = MemoryBank(mem=jnp.asarray(mem),
                          valid=jnp.asarray([True, True, False, False]),
                          ring_pos=jnp.asarray(2))
        m_scan, s_scan = model.apply(v, feats, bank,
                                     method=model.attend_decode)
        m_dense, s_dense = model.apply(v, feats, bank, True,
                                       method=model.attend_decode)
        np.testing.assert_allclose(np.asarray(m_dense), np.asarray(m_scan),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(s_dense), np.asarray(s_scan),
                                   atol=1e-4, rtol=1e-4)

    def test_empty_bank_dense_finite_and_matches(self):
        from skix.tracking.memory_tracker import (MaskMemoryTracker,
                                                  init_memory)

        r = np.random.default_rng(11)
        model = MaskMemoryTracker(features=32, num_heads=2, mem_slots=4)
        img = jnp.asarray(r.random((1, 32, 32, 3)), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), img,
                       init_memory(4, 4, 4, 32), method=model.step)
        feats = model.apply(v, img, method=model.encode_frame)
        bank = init_memory(4, feats.shape[1], feats.shape[2], 32)
        m_scan, s_scan = model.apply(v, feats, bank,
                                     method=model.attend_decode)
        m_dense, s_dense = model.apply(v, feats, bank, True,
                                       method=model.attend_decode)
        assert np.isfinite(np.asarray(m_dense)).all()
        np.testing.assert_allclose(np.asarray(m_dense), np.asarray(m_scan),
                                   atol=1e-4, rtol=1e-4)

    def test_flash_attention_with_lse_partition(self):
        from skix.ops.attention import flash_attention_with_lse

        r = np.random.default_rng(12)
        q = jnp.asarray(r.standard_normal((1, 2, 8, 16)), jnp.float32)
        k = jnp.asarray(r.standard_normal((1, 2, 12, 16)), jnp.float32)
        v = jnp.asarray(r.standard_normal((1, 2, 12, 16)), jnp.float32)
        out, lse = flash_attention_with_lse(q, k, v, sm_scale=0.25)
        s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * .25
        np.testing.assert_allclose(np.asarray(lse),
                                   np.log2(np.exp(s).sum(-1)), atol=1e-4)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.einsum("bhqk,bhkd->bhqd", p,
                                             np.asarray(v)), atol=1e-5)
