"""Torch-side checkpoint-parity tests (SURVEY.md §4).

The environment has no released reference checkpoints and the reference code
itself cannot be imported (pytorch_transformers is absent), so these tests
build minimal torch modules from the REFERENCE EQUATIONS with the
reference's parameter names, run them forward, convert their state dicts
through gstx's converter, and require the Flax model to reproduce the torch
activations to ~1e-5.  Unlike the round-trip test (export->import with our
own code on both sides), this breaks the circularity: the names and the
math on the torch side are written independently against
models/vilbert_dialog.py.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gstx.core.checkpoint import convert_torch_state_dict  # noqa: E402
from gstx.core.config import EncoderConfig  # noqa: E402


def torch_gelu(x):
    # vilbert_dialog.py:116-122
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


class TorchLN(nn.Module):
    def __init__(self, d, eps=1e-12):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))
        self.bias = nn.Parameter(torch.zeros(d))
        self.eps = eps

    def forward(self, x):
        u = x.mean(-1, keepdim=True)
        s = (x - u).pow(2).mean(-1, keepdim=True)
        return self.weight * ((x - u) / torch.sqrt(s + self.eps)) + self.bias


class TorchSelfAttn(nn.Module):
    """vilbert_dialog.py:354-431 with reference param names."""

    def __init__(self, d, heads):
        super().__init__()
        self.heads, self.dh = heads, d // heads
        self.self = nn.Module()
        self.self.query = nn.Linear(d, d)
        self.self.key = nn.Linear(d, d)
        self.self.value = nn.Linear(d, d)
        self.output = nn.Module()
        self.output.dense = nn.Linear(d, d)
        self.output.LayerNorm = TorchLN(d)

    def _split(self, x):
        b, l, d = x.shape
        return x.view(b, l, self.heads, self.dh).permute(0, 2, 1, 3)

    def forward(self, x, mask):
        q = self._split(self.self.query(x))
        k = self._split(self.self.key(x))
        v = self._split(self.self.value(x))
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.dh) + mask
        probs = torch.softmax(scores, -1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(x.shape)
        return self.output.LayerNorm(self.output.dense(ctx) + x)


class TorchLayer(nn.Module):
    """BertLayer: attention + intermediate + output (:465-476)."""

    def __init__(self, d, heads, inter):
        super().__init__()
        self.attention = TorchSelfAttn(d, heads)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(d, inter)
        self.output = nn.Module()
        self.output.dense = nn.Linear(inter, d)
        self.output.LayerNorm = TorchLN(d)

    def forward(self, x, mask):
        a = self.attention(x, mask)
        h = torch_gelu(self.intermediate.dense(a))
        return self.output.LayerNorm(self.output.dense(h) + a)


class TorchBiAttention(nn.Module):
    """BertBiAttention + BertBiOutput + per-stream FFN (:606-773)."""

    def __init__(self, v_d, t_d, bi_d, heads, v_inter, t_inter):
        super().__init__()
        self.heads, self.dh = heads, bi_d // heads
        self.biattention = nn.Module()
        ba = self.biattention
        ba.query1 = nn.Linear(v_d, bi_d)
        ba.key1 = nn.Linear(v_d, bi_d)
        ba.value1 = nn.Linear(v_d, bi_d)
        ba.query2 = nn.Linear(t_d, bi_d)
        ba.key2 = nn.Linear(t_d, bi_d)
        ba.value2 = nn.Linear(t_d, bi_d)
        self.biOutput = nn.Module()
        bo = self.biOutput
        bo.dense1 = nn.Linear(bi_d, v_d)
        bo.LayerNorm1 = TorchLN(v_d)
        bo.dense2 = nn.Linear(bi_d, t_d)
        bo.LayerNorm2 = TorchLN(t_d)
        bo.q_dense1 = nn.Linear(bi_d, v_d)   # unused in forward (ckpt-only)
        bo.q_dense2 = nn.Linear(bi_d, t_d)
        self.v_intermediate = nn.Module()
        self.v_intermediate.dense = nn.Linear(v_d, v_inter)
        self.v_output = nn.Module()
        self.v_output.dense = nn.Linear(v_inter, v_d)
        self.v_output.LayerNorm = TorchLN(v_d)
        self.t_intermediate = nn.Module()
        self.t_intermediate.dense = nn.Linear(t_d, t_inter)
        self.t_output = nn.Module()
        self.t_output.dense = nn.Linear(t_inter, t_d)
        self.t_output.LayerNorm = TorchLN(t_d)

    def _split(self, x):
        b, l, _ = x.shape
        return x.view(b, l, self.heads, self.dh).permute(0, 2, 1, 3)

    def forward(self, v_in, v_mask, t_in, t_mask):
        ba = self.biattention
        q1, k1, v1 = (self._split(f(v_in))
                      for f in (ba.query1, ba.key1, ba.value1))
        q2, k2, v2 = (self._split(f(t_in))
                      for f in (ba.query2, ba.key2, ba.value2))
        # text queries over visual K/V (:670-688)
        s1 = q2 @ k1.transpose(-1, -2) / math.sqrt(self.dh) + v_mask
        ctx1 = (torch.softmax(s1, -1) @ v1).permute(0, 2, 1, 3)
        ctx1 = ctx1.reshape(t_in.shape[0], t_in.shape[1], -1)
        # visual queries over text K/V (:690-710)
        s2 = q1 @ k2.transpose(-1, -2) / math.sqrt(self.dh) + t_mask
        ctx2 = (torch.softmax(s2, -1) @ v2).permute(0, 2, 1, 3)
        ctx2 = ctx2.reshape(v_in.shape[0], v_in.shape[1], -1)
        # BertBiOutput call order: biOutput(bi_output2, v_in, bi_output1,
        # t_in) (:765) i.e. visual residual gets ctx2, text gets ctx1
        v_state = self.biOutput.LayerNorm1(self.biOutput.dense1(ctx2) + v_in)
        t_state = self.biOutput.LayerNorm2(self.biOutput.dense2(ctx1) + t_in)
        v_out = self.v_output.LayerNorm(
            self.v_output.dense(torch_gelu(
                self.v_intermediate.dense(v_state))) + v_state)
        t_out = self.t_output.LayerNorm(
            self.t_output.dense(torch_gelu(
                self.t_intermediate.dense(t_state))) + t_state)
        return v_out, t_out


@pytest.fixture(scope="module")
def enc_cfg():
    return EncoderConfig(
        vocab_size=120, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        v_feature_size=8, v_target_size=5, v_hidden_size=12,
        v_num_hidden_layers=1, v_num_attention_heads=2,
        v_intermediate_size=12, bi_hidden_size=12,
        bi_num_attention_heads=2, bi_intermediate_size=12,
        v_biattention_id=(0,), t_biattention_id=(0,),
        hidden_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        v_attention_probs_dropout_prob=0.0)


def _named_sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}


def test_text_layer_torch_parity(enc_cfg):
    """One text-stream layer: torch (reference names/math) -> converter ->
    flax produces the same activations."""
    torch.manual_seed(0)
    d, heads, inter = 16, 2, 32
    layer = TorchLayer(d, heads, inter)
    x = torch.randn(2, 6, d)
    mask = torch.where(torch.rand(2, 1, 1, 6) > 0.3,
                       torch.zeros(1), torch.full((1,), -10000.0))
    with torch.no_grad():
        want = layer(x, mask).numpy()

    sd = _named_sd(layer, "encoder.bert_pretrained.bert.encoder.layer.0")
    from gstx.core.checkpoint import _qkv_kernel, _dense, _ln
    tree = {}
    prefix = "encoder.bert_pretrained.bert.encoder.layer.0"
    k, b = _qkv_kernel(sd, f"{prefix}.attention.self")
    tree = {"attention": {"qkv": {"kernel": k, "bias": b},
                          "out": _dense(sd, f"{prefix}.attention.output.dense"),
                          "out_ln": _ln(sd, f"{prefix}.attention.output.LayerNorm")},
            "ffn": {"intermediate": _dense(sd, f"{prefix}.intermediate.dense"),
                    "output": _dense(sd, f"{prefix}.output.dense"),
                    "output_ln": _ln(sd, f"{prefix}.output.LayerNorm")}}

    from gstx.models.layers import TransformerLayer
    fl = TransformerLayer(num_heads=heads, head_dim=d // heads,
                          intermediate_size=inter, attn_dropout=0.0,
                          hidden_dropout=0.0)
    got = fl.apply({"params": tree}, jnp.asarray(x.numpy()),
                   jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_coattention_torch_parity(enc_cfg):
    """The signature co-attention connection layer: torch reference math vs
    the converted Flax CoAttentionLayer."""
    torch.manual_seed(1)
    cfg = enc_cfg
    block = TorchBiAttention(cfg.v_hidden_size, cfg.hidden_size,
                             cfg.bi_hidden_size, cfg.bi_num_attention_heads,
                             cfg.v_intermediate_size, cfg.intermediate_size)
    v_in = torch.randn(2, 5, cfg.v_hidden_size)
    t_in = torch.randn(2, 7, cfg.hidden_size)
    v_mask = torch.zeros(2, 1, 1, 5)
    t_mask = torch.where(torch.rand(2, 1, 1, 7) > 0.3, torch.zeros(1),
                         torch.full((1,), -10000.0))
    with torch.no_grad():
        want_v, want_t = block(v_in, v_mask, t_in, t_mask)

    sd = _named_sd(
        block, "encoder.bert_pretrained.bert.encoder.c_layer.0")
    # embed in a full fake state dict via the public converter by adding the
    # minimum other keys? Instead, map just this subtree with the same
    # helpers the converter uses:
    from gstx.core.checkpoint import _dense, _ln, _qkv_kernel
    src = "encoder.bert_pretrained.bert.encoder.c_layer.0"
    k1, b1 = _qkv_kernel(sd, f"{src}.biattention",
                         ("query1", "key1", "value1"))
    k2, b2 = _qkv_kernel(sd, f"{src}.biattention",
                         ("query2", "key2", "value2"))
    tree = {
        "biattention": {"qkv1": {"kernel": k1, "bias": b1},
                        "qkv2": {"kernel": k2, "bias": b2}},
        "v_dense": _dense(sd, f"{src}.biOutput.dense1"),
        "v_ln": _ln(sd, f"{src}.biOutput.LayerNorm1"),
        "t_dense": _dense(sd, f"{src}.biOutput.dense2"),
        "t_ln": _ln(sd, f"{src}.biOutput.LayerNorm2"),
        "v_ffn": {"intermediate": _dense(sd, f"{src}.v_intermediate.dense"),
                  "output": _dense(sd, f"{src}.v_output.dense"),
                  "output_ln": _ln(sd, f"{src}.v_output.LayerNorm")},
        "t_ffn": {"intermediate": _dense(sd, f"{src}.t_intermediate.dense"),
                  "output": _dense(sd, f"{src}.t_output.dense"),
                  "output_ln": _ln(sd, f"{src}.t_output.LayerNorm")},
    }

    from gstx.models.two_stream import CoAttentionLayer
    fl = CoAttentionLayer(cfg)
    got_v, got_t = fl.apply(
        {"params": tree}, jnp.asarray(v_in.numpy()),
        jnp.asarray(v_mask.numpy()), jnp.asarray(t_in.numpy()),
        jnp.asarray(t_mask.numpy()))
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_full_converter_accepts_torch_names(enc_cfg):
    """convert_torch_state_dict on a torch-built full-name state dict (one
    layer of each kind) resolves every expected subtree."""
    torch.manual_seed(2)
    cfg = enc_cfg
    sd = {}
    bert = "encoder.bert_pretrained.bert"
    emb = {
        "word_embeddings": nn.Embedding(cfg.vocab_size, cfg.hidden_size),
        "position_embeddings": nn.Embedding(64, cfg.hidden_size),
        "token_type_embeddings": nn.Embedding(2, cfg.hidden_size),
        "token_type_embeddings_extension": nn.Embedding(10, cfg.hidden_size),
        "sep_embeddings": nn.Embedding(50, cfg.hidden_size),
    }
    for name, m in emb.items():
        sd[f"{bert}.embeddings.{name}.weight"] = \
            m.weight.detach().numpy()
    ln = TorchLN(cfg.hidden_size)
    sd.update(_named_sd(ln, f"{bert}.embeddings.LayerNorm"))
    sd.update(_named_sd(nn.Linear(cfg.v_feature_size, cfg.v_hidden_size),
                        f"{bert}.v_embeddings.image_embeddings"))
    sd.update(_named_sd(nn.Linear(5, cfg.v_hidden_size),
                        f"{bert}.v_embeddings.image_location_embeddings"))
    sd.update(_named_sd(TorchLN(cfg.v_hidden_size),
                        f"{bert}.v_embeddings.LayerNorm"))
    sd.update(_named_sd(
        TorchLayer(cfg.hidden_size, cfg.num_attention_heads,
                   cfg.intermediate_size), f"{bert}.encoder.layer.0"))
    sd.update(_named_sd(
        TorchLayer(cfg.v_hidden_size, cfg.v_num_attention_heads,
                   cfg.v_intermediate_size), f"{bert}.encoder.v_layer.0"))
    sd.update(_named_sd(
        TorchBiAttention(cfg.v_hidden_size, cfg.hidden_size,
                         cfg.bi_hidden_size, cfg.bi_num_attention_heads,
                         cfg.v_intermediate_size, cfg.intermediate_size),
        f"{bert}.encoder.c_layer.0"))
    sd.update(_named_sd(nn.Linear(cfg.hidden_size, cfg.bi_hidden_size),
                        f"{bert}.t_pooler.dense"))
    sd.update(_named_sd(nn.Linear(cfg.v_hidden_size, cfg.bi_hidden_size),
                        f"{bert}.v_pooler.dense"))
    cls = "encoder.bert_pretrained.cls"
    sd.update(_named_sd(nn.Linear(cfg.hidden_size, cfg.hidden_size),
                        f"{cls}.predictions.transform.dense"))
    sd.update(_named_sd(TorchLN(cfg.hidden_size),
                        f"{cls}.predictions.transform.LayerNorm"))
    sd[f"{cls}.predictions.bias"] = np.zeros(cfg.vocab_size, np.float32)
    sd.update(_named_sd(nn.Linear(cfg.bi_hidden_size, 2),
                        f"{cls}.bi_seq_relationship"))
    sd.update(_named_sd(nn.Linear(cfg.v_hidden_size, cfg.v_hidden_size),
                        f"{cls}.imagePredictions.transform.dense"))
    sd.update(_named_sd(TorchLN(cfg.v_hidden_size),
                        f"{cls}.imagePredictions.transform.LayerNorm"))
    sd.update(_named_sd(nn.Linear(cfg.v_hidden_size, cfg.v_target_size),
                        f"{cls}.imagePredictions.decoder"))

    tree = convert_torch_state_dict(sd, num_text_layers=1,
                                    num_visual_layers=1, num_co_layers=1,
                                    num_dec_layers=0)
    assert "encoder" in tree and "cls" in tree
    assert "layer_0" in tree["encoder"]["encoder"]
    assert "v_layer_0" in tree["encoder"]["encoder"]
    assert "c_layer_0" in tree["encoder"]["encoder"]
    np.testing.assert_array_equal(
        tree["encoder"]["embeddings"]["word_embeddings"]["embedding"],
        sd[f"{bert}.embeddings.word_embeddings.weight"])


class TorchDecoderLayer(nn.Module):
    """HF BertLayer with crossattention as instantiated by the reference
    decoder (visual_dialog_decoder.py:116-323): self-attn -> cross-attn ->
    FFN, post-LN residuals, reference parameter names."""

    def __init__(self, d, heads, inter):
        super().__init__()
        self.heads, self.dh = heads, d // heads
        self.attention = TorchSelfAttn(d, heads)
        self.crossattention = nn.Module()
        ca = self.crossattention
        ca.self = nn.Module()
        ca.self.query = nn.Linear(d, d)
        ca.self.key = nn.Linear(d, d)
        ca.self.value = nn.Linear(d, d)
        ca.output = nn.Module()
        ca.output.dense = nn.Linear(d, d)
        ca.output.LayerNorm = TorchLN(d)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(d, inter)
        self.output = nn.Module()
        self.output.dense = nn.Linear(inter, d)
        self.output.LayerNorm = TorchLN(d)

    def _split(self, x):
        b, l, _ = x.shape
        return x.view(b, l, self.heads, self.dh).permute(0, 2, 1, 3)

    def forward(self, x, self_mask, memory, mem_mask):
        h = self.attention(x, self_mask)
        ca = self.crossattention
        q = self._split(ca.self.query(h))
        k = self._split(ca.self.key(memory))
        v = self._split(ca.self.value(memory))
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.dh) + mem_mask
        ctx = (torch.softmax(scores, -1) @ v).permute(0, 2, 1, 3)
        ctx = ctx.reshape(h.shape)
        h = ca.output.LayerNorm(ca.output.dense(ctx) + h)
        f = torch_gelu(self.intermediate.dense(h))
        return self.output.LayerNorm(self.output.dense(f) + h)


def test_decoder_layer_torch_parity():
    """Decoder layer (causal self + cross attention): torch reference math
    vs the converted Flax DecoderLayer, both full-sequence and one KV-cached
    step."""
    torch.manual_seed(3)
    d, heads, inter, L, M = 16, 2, 32, 6, 9
    layer = TorchDecoderLayer(d, heads, inter)
    x = torch.randn(2, L, d)
    memory = torch.randn(2, M, d)
    # causal mask
    causal = torch.tril(torch.ones(L, L))
    self_mask = (1.0 - causal)[None, None] * -10000.0
    mem_mask = torch.where(torch.rand(2, 1, 1, M) > 0.3, torch.zeros(1),
                           torch.full((1,), -10000.0))
    with torch.no_grad():
        want = layer(x, self_mask, memory, mem_mask).numpy()

    sd = _named_sd(layer, "decoder.decoder.bert.encoder.layer.0")
    from gstx.core.checkpoint import _dense, _ln, _qkv_kernel
    src = "decoder.decoder.bert.encoder.layer.0"
    k, b = _qkv_kernel(sd, f"{src}.attention.self")
    kc, bc = _qkv_kernel(sd, f"{src}.crossattention.self", ("key", "value"))
    tree = {
        "qkv": {"kernel": k, "bias": b},
        "self_out": _dense(sd, f"{src}.attention.output.dense"),
        "self_ln": _ln(sd, f"{src}.attention.output.LayerNorm"),
        "cross_q": _dense(sd, f"{src}.crossattention.self.query"),
        "cross_kv": {"kernel": kc, "bias": bc},
        "cross_out": _dense(sd, f"{src}.crossattention.output.dense"),
        "cross_ln": _ln(sd, f"{src}.crossattention.output.LayerNorm"),
        "intermediate": _dense(sd, f"{src}.intermediate.dense"),
        "output": _dense(sd, f"{src}.output.dense"),
        "output_ln": _ln(sd, f"{src}.output.LayerNorm"),
    }

    from gstx.core.config import DecoderConfig
    from gstx.models.decoder import DecoderLayer

    cfg = DecoderConfig(vocab_size=100, hidden_size=d, num_hidden_layers=1,
                        num_attention_heads=heads, intermediate_size=inter,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    fl = DecoderLayer(cfg)
    got = fl.apply({"params": tree}, jnp.asarray(x.numpy()),
                   jnp.asarray(self_mask.numpy().astype(np.float32)),
                   jnp.asarray(memory.numpy()),
                   jnp.asarray(mem_mask.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # KV-cached stepping reproduces position 0..L-1 outputs
    import jax as _jax

    mem_k, mem_v = fl.apply({"params": tree}, jnp.asarray(memory.numpy()),
                            method=DecoderLayer.memory_kv)
    cache = {"k": jnp.zeros((2, heads, L, d // heads)),
             "v": jnp.zeros((2, heads, L, d // heads))}
    outs = []
    for pos in range(L):
        out, cache = fl.apply(
            {"params": tree}, jnp.asarray(x.numpy()[:, pos:pos + 1]), pos,
            cache, (mem_k, mem_v), jnp.asarray(mem_mask.numpy()),
            method=DecoderLayer.step)
        outs.append(np.asarray(out)[:, 0])
    np.testing.assert_allclose(np.stack(outs, 1), want, rtol=1e-4, atol=1e-4)
