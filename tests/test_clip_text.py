"""CLIP-BPE tokenizer + text-tower parity vs the reference (oracle import
only: sam3/model/tokenizer_ve.py and text_encoder_ve.py)."""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from skix.tracking.clip_text import VETextEncoder, convert_ve_text_encoder
from skix.tracking.clip_tokenizer import ClipTokenizer

REF_DIR = "/root/reference/prepare_front_results/sam3/model"
BPE_GZ = ("/root/reference/prepare_front_results/sam3/assets/"
          "bpe_simple_vocab_16e6.txt.gz")

TEXTS = [
    "person",
    "snow",
    "a skier carving down the slope",
    "Person in a RED jacket!",
    "the  quick   brown fox, jumping; over 12 gates?",
    "skis & poles (rental #42)",
    "don't stop",
]


def _stub(name, **attrs):
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec(name) keeps working
    # for code that probes optional deps (e.g. transformers)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_tokenizer():
    torch = pytest.importorskip("torch")  # noqa: F841
    # the reference imports ftfy + iopath; stub them (test vectors are
    # already-clean text, where ftfy.fix_text is the identity)
    _stub("ftfy", fix_text=lambda s: s)
    _stub("iopath")
    _stub("iopath.common")
    _stub("iopath.common.file_io",
          g_pathmgr=types.SimpleNamespace(
              open=lambda p, mode="rb": open(p, mode)))
    spec = importlib.util.spec_from_file_location(
        "ref_tokenizer_ve", f"{REF_DIR}/tokenizer_ve.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_tokenizer_ve"] = mod
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer(bpe_path=BPE_GZ, context_length=32)


@pytest.fixture(scope="module")
def ref_text_encoder_mod():
    pytest.importorskip("torch")
    pkg = types.ModuleType("refsam3m")
    pkg.__path__ = [REF_DIR]
    sys.modules.setdefault("refsam3m", pkg)
    spec = importlib.util.spec_from_file_location(
        "refsam3m.text_encoder_ve", f"{REF_DIR}/text_encoder_ve.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refsam3m.text_encoder_ve"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestTokenizerParity:
    def test_token_ids_match_reference(self, ref_tokenizer):
        ours = ClipTokenizer(context_length=32)
        for text in TEXTS:
            want = ref_tokenizer([text]).numpy()
            got = ours([text])
            np.testing.assert_array_equal(got, want, err_msg=text)

    def test_vocab_and_specials_match(self, ref_tokenizer):
        ours = ClipTokenizer(context_length=32)
        assert ours.vocab_size == ref_tokenizer.vocab_size == 49408
        assert ours.sot_token_id == ref_tokenizer.sot_token_id
        assert ours.eot_token_id == ref_tokenizer.eot_token_id

    def test_truncation_keeps_eot(self):
        ours = ClipTokenizer(context_length=8)
        toks = ours(["a very long sentence that must surely be truncated "
                     "to fit the tiny context window"])
        assert toks.shape == (1, 8)
        assert toks[0, -1] == ours.eot_token_id

    def test_decode_roundtrip(self):
        ours = ClipTokenizer()
        ids = ours.encode("a skier carving")
        assert ours.decode(ids).strip() == "a skier carving"


class TestTextEncoderParity:
    @pytest.mark.slow
    def test_converted_random_weights_match(self, ref_text_encoder_mod):
        import torch

        torch.manual_seed(0)
        ref = ref_text_encoder_mod.VETextEncoder(
            d_model=32, tokenizer=None, width=48, heads=4, layers=2,
            context_length=16, vocab_size=128, use_act_checkpoint=False)
        # fill uninitialized buffers (torch.empty) deterministically
        with torch.no_grad():
            for name, prm in ref.named_parameters():
                prm.copy_(torch.randn_like(prm) * 0.05)
        ref.eval()

        tokens = np.array([[1, 5, 9, 100, 2, 0, 0, 0],
                           [1, 77, 2, 0, 0, 0, 0, 0]], np.int64)
        with torch.no_grad():
            t = torch.from_numpy(tokens)
            _, text_memory = ref.encoder(t)
            want_resized = ref.resizer(text_memory).numpy()

        model = VETextEncoder(d_model=32, width=48, heads=4, layers=2,
                              context_length=16, vocab_size=128)
        variables = convert_ve_text_encoder(ref.state_dict())
        mask, resized, embeds = model.apply(variables,
                                            jnp.asarray(tokens, jnp.int32))
        np.testing.assert_allclose(np.asarray(resized), want_resized,
                                   atol=1e-4)
        assert mask.shape == tokens.shape
        assert embeds.shape == (2, 8, 48)

    def test_full_size_config_builds(self):
        # reference config: d_model 256, width 1024, 16 heads, 24 layers
        # (model_builder.py:488) — construct only; full init covered by
        # the perf path
        model = VETextEncoder()
        assert model.width == 1024 and model.layers == 24
