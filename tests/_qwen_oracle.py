"""Loader for the vendored reference Qwen-Image transformer as a torch
oracle (image_edit/qwenimage/transformer_qwenimage.py).

The environment has no ``diffusers`` wheel, so this installs a
test-local stub of exactly the small diffusers surface that file
imports. The stub transcribes the upstream semantics of the generic
diffusers layers (Timesteps / TimestepEmbedding / RMSNorm /
AdaLayerNormContinuous / FeedForward / Attention container /
dispatch_attention_fn → sdpa); every DISTINCTIVE computation of the
model under test — block wiring, joint-attention processor, rope
generation, modulation — lives in the imported reference file itself,
which is the oracle. Stub modules carry real ModuleSpecs (transformers'
optional-dep probing breaks otherwise — see CLAUDE.md).
"""

from __future__ import annotations

import functools
import importlib.machinery
import importlib.util
import inspect
import math
import sys
import types
from dataclasses import dataclass

import torch
import torch.nn as tnn
import torch.nn.functional as F

REF_PATH = "/root/reference/image_edit/qwenimage/transformer_qwenimage.py"


def _mod(name, is_package=False):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                is_package=is_package)
    if is_package:
        m.__path__ = []
    sys.modules[name] = m
    return m


class _RMSNorm(tnn.Module):
    def __init__(self, dim, eps: float, elementwise_affine: bool = True):
        super().__init__()
        self.eps = eps
        self.weight = tnn.Parameter(torch.ones(dim)) \
            if elementwise_affine else None

    def forward(self, x):
        dtype = x.dtype
        var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
        x = x * torch.rsqrt(var + self.eps)
        if self.weight is not None:
            return x.to(dtype) * self.weight
        return x.to(dtype)


class _AdaLayerNormContinuous(tnn.Module):
    def __init__(self, embedding_dim, conditioning_embedding_dim,
                 elementwise_affine=True, eps=1e-5, bias=True):
        super().__init__()
        self.silu = tnn.SiLU()
        self.linear = tnn.Linear(conditioning_embedding_dim,
                                 embedding_dim * 2, bias=bias)
        self.norm = tnn.LayerNorm(embedding_dim, eps, elementwise_affine,
                                  bias)

    def forward(self, x, conditioning_embedding):
        emb = self.linear(self.silu(conditioning_embedding).to(x.dtype))
        scale, shift = torch.chunk(emb, 2, dim=1)
        return self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]


class _Timesteps(tnn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift,
                 scale=1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        half = self.num_channels // 2
        exponent = -math.log(10000.0) * torch.arange(
            half, dtype=torch.float32, device=timesteps.device)
        exponent = exponent / (half - self.downscale_freq_shift)
        emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
        emb = self.scale * emb
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb


class _TimestepEmbedding(tnn.Module):
    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = tnn.Linear(in_channels, time_embed_dim)
        self.act = tnn.SiLU()
        self.linear_2 = tnn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class _GELU(tnn.Module):
    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = tnn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, x):
        return F.gelu(self.proj(x), approximate=self.approximate)


class _FeedForward(tnn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False, inner_dim=None,
                 bias=True):
        super().__init__()
        inner_dim = inner_dim if inner_dim is not None else int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        assert activation_fn == "gelu-approximate", activation_fn
        self.net = tnn.ModuleList([
            _GELU(dim, inner_dim, approximate="tanh", bias=bias),
            tnn.Dropout(dropout),
            tnn.Linear(inner_dim, dim_out, bias=bias),
        ])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


def _dispatch_attention_fn(query, key, value, attn_mask=None, dropout_p=0.0,
                           is_causal=False, backend=None, **kwargs):
    # diffusers layout: (B, S, H, D) in and out; sdpa wants (B, H, S, D)
    out = F.scaled_dot_product_attention(
        query.transpose(1, 2), key.transpose(1, 2), value.transpose(1, 2),
        attn_mask=attn_mask, dropout_p=dropout_p, is_causal=is_causal)
    return out.transpose(1, 2)


class _Attention(tnn.Module):
    """The diffusers Attention CONTAINER for the config the vendored
    block uses (out_dim given, added KV projections, rms qk-norm,
    context_pre_only=False); forward delegates to the processor."""

    def __init__(self, query_dim, cross_attention_dim=None,
                 added_kv_proj_dim=None, dim_head=64, heads=8, out_dim=None,
                 context_pre_only=None, bias=False, processor=None,
                 qk_norm=None, eps=1e-5, **kwargs):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.heads = (self.out_dim // dim_head if out_dim is not None
                      else heads)
        self.to_q = tnn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = tnn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_v = tnn.Linear(query_dim, self.inner_dim, bias=bias)
        assert qk_norm == "rms_norm", qk_norm
        self.norm_q = _RMSNorm(dim_head, eps=eps)
        self.norm_k = _RMSNorm(dim_head, eps=eps)
        if added_kv_proj_dim is not None:
            self.add_q_proj = tnn.Linear(added_kv_proj_dim, self.inner_dim,
                                         bias=bias)
            self.add_k_proj = tnn.Linear(added_kv_proj_dim, self.inner_dim,
                                         bias=bias)
            self.add_v_proj = tnn.Linear(added_kv_proj_dim, self.inner_dim,
                                         bias=bias)
            self.norm_added_q = _RMSNorm(dim_head, eps=eps)
            self.norm_added_k = _RMSNorm(dim_head, eps=eps)
            if context_pre_only is False:
                self.to_add_out = tnn.Linear(self.inner_dim, self.out_dim,
                                             bias=bias)
        self.to_out = tnn.ModuleList([
            tnn.Linear(self.inner_dim, self.out_dim, bias=bias),
            tnn.Dropout(0.0),
        ])
        self.processor = processor

    def forward(self, hidden_states, **kwargs):
        return self.processor(self, hidden_states, **kwargs)


def install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    _mod("diffusers", is_package=True)

    cfg = _mod("diffusers.configuration_utils")

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            bound = inspect.signature(init).bind(self, *args, **kwargs)
            bound.apply_defaults()
            init(self, *args, **kwargs)
            self.config = types.SimpleNamespace(
                **{k: v for k, v in bound.arguments.items() if k != "self"})
        return wrapped

    cfg.ConfigMixin = ConfigMixin
    cfg.register_to_config = register_to_config

    loaders = _mod("diffusers.loaders")
    loaders.FromOriginalModelMixin = type("FromOriginalModelMixin", (), {})
    loaders.PeftAdapterMixin = type("PeftAdapterMixin", (), {})

    utils = _mod("diffusers.utils")
    utils.USE_PEFT_BACKEND = False
    import logging as _logging
    utils.logging = types.SimpleNamespace(
        get_logger=lambda name: _logging.getLogger(name))
    utils.scale_lora_layers = lambda *a, **k: None
    utils.unscale_lora_layers = lambda *a, **k: None

    tu = _mod("diffusers.utils.torch_utils")
    tu.maybe_allow_in_graph = lambda cls: cls
    utils.torch_utils = tu

    _mod("diffusers.models", is_package=True)
    att = _mod("diffusers.models.attention")
    att.FeedForward = _FeedForward
    att.AttentionMixin = type("AttentionMixin", (), {})

    ad = _mod("diffusers.models.attention_dispatch")
    ad.dispatch_attention_fn = _dispatch_attention_fn

    ap = _mod("diffusers.models.attention_processor")
    ap.Attention = _Attention

    cu = _mod("diffusers.models.cache_utils")

    class CacheMixin:
        def cache_context(self, *a, **k):
            import contextlib
            return contextlib.nullcontext()

    cu.CacheMixin = CacheMixin

    emb = _mod("diffusers.models.embeddings")
    emb.Timesteps = _Timesteps
    emb.TimestepEmbedding = _TimestepEmbedding

    mo = _mod("diffusers.models.modeling_outputs")

    @dataclass
    class Transformer2DModelOutput:
        sample: torch.Tensor

    mo.Transformer2DModelOutput = Transformer2DModelOutput

    mu = _mod("diffusers.models.modeling_utils")

    class ModelMixin(tnn.Module):
        pass

    mu.ModelMixin = ModelMixin

    norm = _mod("diffusers.models.normalization")
    norm.AdaLayerNormContinuous = _AdaLayerNormContinuous
    norm.RMSNorm = _RMSNorm


def load_reference_transformer():
    """Import the vendored transformer_qwenimage module (oracle)."""
    name = "ref_qwen_transformer"
    if name in sys.modules:
        return sys.modules[name]
    install_diffusers_stub()
    spec = importlib.util.spec_from_file_location(name, REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
