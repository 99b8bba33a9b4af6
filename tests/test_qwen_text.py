"""Qwen2-family text tower: converter parity vs a tiny random
``transformers.Qwen2Model`` (the reference's image-edit prompt encoder
family — pipeline_qwenimage_edit_plus.py:194,287) and tokenizer id
parity vs ``transformers.Qwen2Tokenizer`` on synthetic vocab assets."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skix.models.qwen_text import (QwenBpeTokenizer, QwenTextEncoder,
                                   convert_hf_qwen2)


def _tiny_hf_qwen2(seed=3):
    import torch
    from transformers import Qwen2Config, Qwen2Model

    cfg = Qwen2Config(vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=64, rope_theta=10_000.0,
                      rms_norm_eps=1e-6, attention_dropout=0.0,
                      use_cache=False)
    torch.manual_seed(seed)
    model = Qwen2Model(cfg)
    model.eval()
    return model, cfg


class TestQwenTowerParity:
    def test_hidden_states_match_hf(self):
        """convert_hf_qwen2 + QwenTextEncoder reproduce Qwen2Model's
        last_hidden_state ≤2e-4 (RMSNorm, rope, GQA, SwiGLU, causal)."""
        import torch

        model, cfg = _tiny_hf_qwen2()
        rng = np.random.default_rng(4)
        ids = rng.integers(0, cfg.vocab_size, (2, 12)).astype(np.int64)
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids)
                        ).last_hidden_state.numpy()

        enc = QwenTextEncoder(vocab_size=cfg.vocab_size, hidden=32,
                              layers=2, heads=4, kv_heads=2,
                              intermediate=64, rope_theta=10_000.0)
        variables = convert_hf_qwen2(model.state_dict(), prefix="")
        out = enc.apply(variables, jnp.asarray(ids, jnp.int32))
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)

    def test_attention_mask_matches_hf(self):
        """Padded positions change nothing for valid ones (HF mask
        semantics: masked keys excluded for every query)."""
        import torch

        model, cfg = _tiny_hf_qwen2(seed=5)
        rng = np.random.default_rng(6)
        ids = rng.integers(0, cfg.vocab_size, (1, 10)).astype(np.int64)
        mask = np.ones((1, 10), np.int64)
        mask[0, 7:] = 0
        with torch.no_grad():
            ref = model(input_ids=torch.from_numpy(ids),
                        attention_mask=torch.from_numpy(mask)
                        ).last_hidden_state.numpy()

        enc = QwenTextEncoder(vocab_size=cfg.vocab_size, hidden=32,
                              layers=2, heads=4, kv_heads=2,
                              intermediate=64, rope_theta=10_000.0)
        variables = convert_hf_qwen2(model.state_dict(), prefix="")
        out = np.asarray(enc.apply(variables, jnp.asarray(ids, jnp.int32),
                                   attention_mask=jnp.asarray(mask)))
        # parity on the VALID positions (HF's masked rows see garbage
        # rope/attn internally and are discarded by downstream pooling)
        np.testing.assert_allclose(out[0, :7], ref[0, :7], atol=2e-4)

    def test_converter_accepts_model_prefix(self):
        model, cfg = _tiny_hf_qwen2(seed=7)
        sd = {f"model.{k}": v for k, v in model.state_dict().items()}
        v1 = convert_hf_qwen2(sd)                      # default prefix
        v2 = convert_hf_qwen2(model.state_dict(), prefix="")
        a = jax.tree_util.tree_leaves(v1)
        b = jax.tree_util.tree_leaves(v2)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _tiny_vocab_files(tmp_path):
    """A minimal byte-level BPE vocab: all 256 byte symbols + a few
    merges, in the exact vocab.json/merges.txt format."""
    from skix.tracking.clip_tokenizer import bytes_to_unicode

    syms = list(bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(syms)}
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("Ġ", "w"),
              ("o", "r"), ("Ġw", "or"), ("hell", "o"), ("Ġwor", "ld")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    mf.write_text("#version: 0.2\n" + "\n".join(
        f"{a} {b}" for a, b in merges), encoding="utf-8")
    return str(vf), str(mf)


class TestQwenTokenizer:
    def test_id_parity_vs_transformers(self, tmp_path):
        from transformers import Qwen2Tokenizer

        vf, mf = _tiny_vocab_files(tmp_path)
        ref = Qwen2Tokenizer(vocab_file=vf, merges_file=mf)
        tok = QwenBpeTokenizer(vf, mf)
        for text in ("hello world", "hello  world!", "Hello\nworld",
                     "a 12 bc", "  spaced out ", "héllo wörld"):
            assert tok.encode(text) == ref(text)["input_ids"], text

    def test_roundtrip_and_padding(self, tmp_path):
        vf, mf = _tiny_vocab_files(tmp_path)
        tok = QwenBpeTokenizer(vf, mf, context_length=8)
        ids, mask = tok(["hello world"])
        assert ids.shape == (1, 8) and mask.shape == (1, 8)
        n = int(mask[0].sum())
        assert tok.decode(ids[0, :n]) == "hello world"
        assert (ids[0, n:] == tok.eos_id).all()
