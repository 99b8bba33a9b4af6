"""Kernel-op tests: attention (XLA path), NMS, connected components, masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.ops import batched_nms, connected_components, flash_attention, mask_iou, masks_to_boxes, nms
from skix.ops.attention import _attention_reference
from skix.ops.nms import box_iou

rng = np.random.default_rng(33)


class TestAttention:
    def test_matches_naive_softmax(self):
        B, H, S, D = 2, 3, 64, 32
        q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
        out = flash_attention(q, k, v)
        s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("bhqk,bhkd->bhqd", p, v)
        np.testing.assert_allclose(np.asarray(out), want, atol=2e-5)

    def test_cross_attention_shapes(self):
        q = jnp.zeros((1, 2, 10, 16))
        k = jnp.zeros((1, 2, 37, 16))
        v = jnp.zeros((1, 2, 37, 16))
        assert flash_attention(q, k, v).shape == (1, 2, 10, 16)

    def test_grad_flows(self):
        q = jnp.asarray(rng.normal(size=(1, 1, 8, 4)), jnp.float32)
        g = jax.grad(lambda q: jnp.sum(flash_attention(q, q, q)))(q)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0


class TestPallasKernelInterpret:
    """The Pallas fwd+bwd kernels through the interpreter — CI exercises the
    kernel path off-chip (a kernel regression must not ship silently)."""

    CASES = [
        # (B, H, Sq, Sk, D, block_q, block_k_major, block_k)
        (2, 3, 64, 64, 16, 16, 32, 16),     # two-level KV tiling
        (1, 2, 100, 72, 32, 32, 32, 16),    # ragged: q and kv padding
        (2, 2, 128, 128, 64, 64, 64, 32),
        # single tile sized to S — the ViT-Det window configuration
        # (block_q == block_k == S keeps the whole score tile in VMEM)
        (1, 2, 64, 64, 64, 64, 64, 64),
        # D=32 f32 — the fusion-encoder tail self-attention (d_model 256
        # / 8 heads); ragged S vs the 5184 = 9·576 pad-free tile shape
        (1, 4, 72, 80, 32, 24, 24, 24),
        # head-batched single-tile path (G = gcd(8, 8) heads per cell)
        (2, 8, 48, 48, 32, 48, 48, 48),
        # single-tile CROSS-attention (Sq != Sk, one tile each)
        (1, 4, 40, 72, 32, 40, 72, 72),
    ]

    @pytest.mark.parametrize("case", CASES)
    def test_forward_matches_reference(self, case):
        B, H, Sq, Sk, D, bq, bkm, bk = case
        r = np.random.default_rng(7)
        q = jnp.asarray(r.normal(size=(B, H, Sq, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        out = flash_attention(q, k, v, block_q=bq, block_k_major=bkm,
                              block_k=bk, interpret=True)
        ref = _attention_reference(q, k, v, 1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    @pytest.mark.parametrize("case", CASES[:2])
    def test_fixed_max_mode_matches(self, case):
        """fixed_max skips the online-max bookkeeping (qk-normed models);
        softmax shift-invariance keeps it exact within f32 range."""
        B, H, Sq, Sk, D, bq, bkm, bk = case
        r = np.random.default_rng(5)
        q = jnp.asarray(r.normal(size=(B, H, Sq, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        out = flash_attention(q, k, v, block_q=bq, block_k_major=bkm,
                              block_k=bk, interpret=True, fixed_max=8.0)
        ref = _attention_reference(q, k, v, 1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)
        g = jax.grad(lambda q: jnp.sum(jnp.sin(flash_attention(
            q, k, v, block_q=bq, block_k_major=bkm, block_k=bk,
            interpret=True, fixed_max=8.0))))(q)
        gr = jax.grad(lambda q: jnp.sum(jnp.sin(_attention_reference(
            q, k, v, 1.0 / np.sqrt(D)))))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=3e-4)

    @pytest.mark.parametrize("case", CASES[:2])
    def test_mxu_lsum_matches(self, case):
        """mxu_lsum rides the softmax partition Σp on the ones-column of
        the p·V matmul (fixed-max only) — exact vs the reference,
        including the ragged case where padded KV rows must contribute
        exactly zero mass, and grads still flow (bwd path unchanged)."""
        B, H, Sq, Sk, D, bq, bkm, bk = case
        r = np.random.default_rng(21)
        q = jnp.asarray(r.normal(size=(B, H, Sq, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        out = flash_attention(q, k, v, block_q=bq, block_k_major=bkm,
                              block_k=bk, interpret=True, fixed_max=8.0,
                              mxu_lsum=True)
        ref = _attention_reference(q, k, v, 1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)
        g = jax.grad(lambda q: jnp.sum(jnp.sin(flash_attention(
            q, k, v, block_q=bq, block_k_major=bkm, block_k=bk,
            interpret=True, fixed_max=8.0, mxu_lsum=True))))(q)
        gr = jax.grad(lambda q: jnp.sum(jnp.sin(_attention_reference(
            q, k, v, 1.0 / np.sqrt(D)))))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=3e-4)

    def test_mxu_lsum_with_rope_tables(self, ):
        """mxu_lsum composes with in-kernel rope (V is untouched by
        rope, so the ones column is orthogonal to it)."""
        from skix.ops.attention import rope_2d_tables

        r = np.random.default_rng(23)
        B, H, S, D = 1, 2, 64, 32
        q = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        pos = np.stack(np.meshgrid(np.arange(8), np.arange(8),
                                   indexing="ij"), -1).reshape(-1, 2)
        cos, sin = rope_2d_tables(jnp.asarray(pos), D, 100.0)
        out = flash_attention(q, k, v, block_q=32, block_k_major=32,
                              block_k=32, interpret=True, fixed_max=8.0,
                              rope_cos=cos, rope_sin=sin, mxu_lsum=True)
        ref = flash_attention(q, k, v, rope_cos=cos, rope_sin=sin)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)

    @pytest.mark.parametrize("case", CASES)
    def test_backward_matches_reference(self, case):
        B, H, Sq, Sk, D, bq, bkm, bk = case
        r = np.random.default_rng(11)
        q = jnp.asarray(r.normal(size=(B, H, Sq, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, Sk, D)), jnp.float32)

        def f(q, k, v):
            return jnp.sum(jnp.sin(flash_attention(
                q, k, v, block_q=bq, block_k_major=bkm, block_k=bk,
                interpret=True)))

        def fr(q, k, v):
            return jnp.sum(jnp.sin(_attention_reference(
                q, k, v, 1.0 / np.sqrt(D))))

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_fused_rope_matches_xla_rope(self):
        """In-kernel rope (cos/sin tables + rotate-half-as-matmul) equals
        rope_2d applied at the XLA level before plain attention."""
        from skix.models.layers import rope_2d
        from skix.ops.attention import rope_2d_tables

        B, H, S, D = 1, 2, 64, 32
        r = np.random.default_rng(19)
        q = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        pos = jnp.asarray(np.stack([ys, xs], -1).reshape(1, S, 2))

        cos, sin = rope_2d_tables(pos[0], D, 100.0)
        out = flash_attention(q, k, v, block_q=32, block_k_major=32,
                              block_k=32, interpret=True,
                              rope_cos=cos, rope_sin=sin)
        qr = rope_2d(q, pos, 100.0)
        kr = rope_2d(k, pos, 100.0)
        ref = _attention_reference(qr, kr, v, 1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_fused_rope_mismatched_tiles_and_padding(self):
        """Regression: K cos/sin tables must pad to the K tile multiple
        (block_q != block_k_major with ragged S used to read past the
        table on the last K tile)."""
        from skix.models.layers import rope_2d
        from skix.ops.attention import rope_2d_tables

        # S=70: round_up(70, 32)=96 < round_up(70, 64)=128 — the pre-fix
        # pq-padded K tables are SHORTER than what the K BlockSpec reads,
        # so this shape actually exercises the out-of-bounds case
        B, H, S, D = 1, 2, 70, 32
        r = np.random.default_rng(37)
        q = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        pos = jnp.asarray(r.integers(0, 10, (1, S, 2)), jnp.float32)
        cos, sin = rope_2d_tables(pos[0], D, 100.0)
        out = flash_attention(q, k, v, block_q=32, block_k_major=64,
                              block_k=32, interpret=True,
                              rope_cos=cos, rope_sin=sin)
        ref = _attention_reference(rope_2d(q, pos, 100.0),
                                   rope_2d(k, pos, 100.0), v,
                                   1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_fused_interleaved_rope_matches_reference_rotation(self):
        """The interleaved-pair convention (SAM3 ViT-Det) through the
        table + signed-permutation form equals apply_rope_interleaved."""
        from skix.ops.attention import interleaved_rope_tables
        from skix.tracking.vitdet import apply_rope_interleaved

        B, H, S, D = 1, 2, 64, 32
        r = np.random.default_rng(29)
        q = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        angles = jnp.asarray(r.uniform(0, 3, (S, D // 2)), jnp.float32)
        cos, sin = interleaved_rope_tables(angles)
        out = flash_attention(q, k, v, block_q=32, block_k_major=32,
                              block_k=32, interpret=True, rope_cos=cos,
                              rope_sin=sin, rope_rotate="interleaved")
        qr = apply_rope_interleaved(q, angles)
        kr = apply_rope_interleaved(k, angles)
        ref = _attention_reference(qr, kr, v, 1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_fused_segmented_rope_matches_rope_3d(self):
        """The MMDiT 3D-rope convention (per-axis rotate-half segments +
        untouched tail) through the fused table path equals rope_3d."""
        from skix.models.mmdit import rope_3d
        from skix.ops.attention import rope_3d_tables

        B, H, S, D = 1, 2, 64, 32
        axes = (8, 12, 8)  # sums to 28 < 32 → 4 untouched tail features
        r = np.random.default_rng(31)
        q = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        pos = jnp.asarray(r.integers(0, 12, (1, S, 3)), jnp.float32)

        cos, sin = rope_3d_tables(pos[0], D, axes)
        out = flash_attention(q, k, v, block_q=32, block_k_major=32,
                              block_k=32, interpret=True, rope_cos=cos,
                              rope_sin=sin,
                              rope_rotate=("segments", axes))
        qr = rope_3d(q, pos, axes_dim=axes)
        kr = rope_3d(k, pos, axes_dim=axes)
        ref = _attention_reference(qr, kr, v, 1.0 / np.sqrt(D))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_fused_rope_backward(self):
        from skix.ops.attention import rope_2d_tables
        from skix.models.layers import rope_2d

        B, H, S, D = 1, 2, 32, 16
        r = np.random.default_rng(23)
        q = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        k = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        v = jnp.asarray(r.normal(size=(B, H, S, D)), jnp.float32)
        ys, xs = np.meshgrid(np.arange(4), np.arange(8), indexing="ij")
        pos = jnp.asarray(np.stack([ys, xs], -1).reshape(1, S, 2))
        cos, sin = rope_2d_tables(pos[0], D, 50.0)

        def f(q, k, v):
            return jnp.sum(jnp.sin(flash_attention(
                q, k, v, block_q=16, block_k_major=16, block_k=16,
                interpret=True, rope_cos=cos, rope_sin=sin)))

        def fr(q, k, v):
            return jnp.sum(jnp.sin(_attention_reference(
                rope_2d(q, pos, 50.0), rope_2d(k, pos, 50.0), v,
                1.0 / np.sqrt(D))))

        g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


class TestNMS:
    def test_box_iou_identity(self):
        b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
        iou = np.asarray(box_iou(b, b))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
        assert iou[0, 2] == 0.0
        np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, rtol=1e-5)

    def test_greedy_suppression(self):
        boxes = jnp.asarray([
            [0.0, 0, 10, 10],
            [1.0, 1, 11, 11],   # overlaps box 0 heavily
            [20.0, 20, 30, 30],
        ])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = np.asarray(nms(boxes, scores, iou_threshold=0.5))
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_matches_torchvision_random(self):
        tv = pytest.importorskip("torchvision")
        import torch

        N = 64
        xy = rng.uniform(0, 100, size=(N, 2))
        wh = rng.uniform(5, 30, size=(N, 2))
        boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
        scores = rng.random(N).astype(np.float32)
        keep_ref = np.zeros(N, bool)
        keep_ref[tv.ops.nms(torch.from_numpy(boxes), torch.from_numpy(scores),
                            0.5).numpy()] = True
        keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
        np.testing.assert_array_equal(keep, keep_ref)

    def test_batched_nms_classes_dont_interact(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [0.0, 0, 10, 10]])
        scores = jnp.asarray([0.9, 0.8])
        keep = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.5))
        assert keep.all()  # identical boxes, different classes → both kept

    def test_score_threshold(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [20.0, 20, 30, 30]])
        keep = np.asarray(nms(boxes, jnp.asarray([0.9, 0.01]), 0.5,
                              score_threshold=0.1))
        np.testing.assert_array_equal(keep, [True, False])


class TestConnectedComponents:
    def test_two_blobs(self):
        m = np.zeros((16, 16), bool)
        m[2:5, 2:5] = True
        m[10:14, 10:13] = True
        lbl = np.asarray(connected_components(jnp.asarray(m)))
        assert lbl[0, 0] == -1
        l1 = lbl[3, 3]
        l2 = lbl[11, 11]
        assert l1 != l2 and l1 >= 0 and l2 >= 0
        assert np.all(lbl[2:5, 2:5] == l1)
        assert np.all(lbl[10:14, 10:13] == l2)

    def test_snake_component(self):
        # long winding path — stresses propagation distance
        m = np.zeros((20, 20), bool)
        m[0, :] = True
        m[:, 19] = True
        m[19, :] = True
        lbl = np.asarray(connected_components(jnp.asarray(m)))
        vals = np.unique(lbl[m])
        assert len(vals) == 1

    def test_matches_scipy_random(self):
        ndimage = pytest.importorskip("scipy.ndimage")
        m = rng.random((32, 32)) > 0.6
        lbl = np.asarray(connected_components(jnp.asarray(m)))
        ref, n_ref = ndimage.label(m, structure=np.array(
            [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
        n_got = len(np.unique(lbl[m]))
        assert n_got == n_ref
        # same partition: every ref component maps to exactly one label
        for r in range(1, n_ref + 1):
            assert len(np.unique(lbl[ref == r])) == 1

    def test_vmap_batch(self):
        m = np.zeros((3, 8, 8), bool)
        m[:, 2:4, 2:4] = True
        lbls = np.asarray(jax.vmap(connected_components)(jnp.asarray(m)))
        assert lbls.shape == (3, 8, 8)


class TestMaskOps:
    def test_masks_to_boxes(self):
        m = np.zeros((2, 10, 12), bool)
        m[0, 2:5, 3:7] = True
        boxes = np.asarray(masks_to_boxes(jnp.asarray(m)))
        np.testing.assert_allclose(boxes[0], [3, 2, 7, 5])
        np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])  # empty

    def test_mask_iou(self):
        a = np.zeros((1, 8, 8), bool)
        b = np.zeros((1, 8, 8), bool)
        a[0, :4] = True
        b[0, 2:6] = True
        iou = np.asarray(mask_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(iou[0, 0], 16.0 / 48.0, rtol=1e-5)
