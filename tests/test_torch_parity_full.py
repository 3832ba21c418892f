"""COMPOSED full-model torch parity harness (VERDICT round-1 item #1).

Assembles the COMPLETE reference model — dialog embeddings + image
embeddings + the interleaved two-stream encoder schedule + -10000 additive
masks (vilbert_dialog.py:1352-1382) + poolers + pretraining heads + the 3
losses (:1489-1514) + VLFusion (visual_dialog_model.py:123-135) + the
12-layer cross-attention decoder with label derivation
(visual_dialog_decoder.py:53-77) — in torch, from the reference EQUATIONS
with the reference PARAMETER NAMES (per-block modules reused from
test_torch_parity.py), runs it end to end, converts its full state dict
through gstx's converter, and requires the Flax model to reproduce:

  * teacher-forced decoder logits and loss (the train/eval forward of
    EncoderDecoderModel, visual_dialog_model.py:44-72),
  * all three pretraining losses of the enc-only path,
  * candidate log-likelihood ranking (evaluate_gen.py:94-107),

at <=1e-4.  Any composition bug — mask building, embedding LN ordering,
fusion concat order, the three-way tying topology, the encoder schedule's
tail layers — fails this test even when every per-block test passes.
Verified by mutation: an inconsistent fusion swap (memory order changed,
mask not) and an embedding LN-ordering bug both fail the logits test.
(A CONSISTENT permutation of memory+mask is functionally identity —
cross-attention is permutation-invariant over memory tokens — so only the
inconsistent variant is a real bug, and it is caught.)
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
from gstx.models.encdec import (  # noqa: E402
    GSTVisualDialog,
    candidate_log_likelihood,
    derive_labels_and_inputs,
    teacher_forced_loss,
)
from gstx.models.heads import (  # noqa: E402
    masked_img_loss,
    masked_lm_loss,
    soft_nsp_loss,
)

from tests.test_torch_parity import (  # noqa: E402
    TorchBiAttention,
    TorchDecoderLayer,
    TorchLayer,
    TorchLN,
    torch_gelu,
)

EOS_ID = 102
PAD_ID = 0


# --------------------------------------------------------------------- #
# torch reference modules (reference equations + reference names)
# --------------------------------------------------------------------- #


class TorchEmbeddingsDialog(nn.Module):
    """BertEmbeddingsDialog (vilbert_dialog.py:298-352).  The sinusoidal
    ``pe`` is a plain attribute in the reference (not a registered buffer,
    :312) so it never appears in state dicts and is omitted here too."""

    def __init__(self, vocab, hidden, max_pos=512, type_vocab=2):
        super().__init__()
        self.type_vocab = type_vocab
        self.word_embeddings = nn.Embedding(vocab, hidden)
        self.position_embeddings = nn.Embedding(max_pos, hidden)
        self.token_type_embeddings = nn.Embedding(type_vocab, hidden)
        self.token_type_embeddings_extension = nn.Embedding(10, hidden)
        self.sep_embeddings = nn.Embedding(50, hidden)
        self.LayerNorm = TorchLN(hidden)

    def forward(self, input_ids, token_type_ids=None):
        seq = input_ids.shape[1]
        pos = torch.arange(seq).unsqueeze(0).expand_as(input_ids)
        if token_type_ids is None:
            token_type_ids = torch.zeros_like(input_ids)
        # extension-table select (:334-347)
        ext = token_type_ids - self.type_vocab
        ext_mask = (ext >= 0).float()
        ext = (ext.float() * ext_mask).long()
        base_mask = (token_type_ids < self.type_vocab).float()
        base = (token_type_ids.float() * base_mask).long()
        seg = (self.token_type_embeddings(base) * base_mask.unsqueeze(-1)
               + self.token_type_embeddings_extension(ext)
               * ext_mask.unsqueeze(-1))
        emb = (self.word_embeddings(input_ids)
               + self.position_embeddings(pos) + seg)
        return self.LayerNorm(emb)


class TorchImageEmbeddings(nn.Module):
    """BertImageEmbeddings (vilbert_dialog.py:1409-1427)."""

    def __init__(self, v_feature, v_hidden):
        super().__init__()
        self.image_embeddings = nn.Linear(v_feature, v_hidden)
        self.image_location_embeddings = nn.Linear(5, v_hidden)
        self.LayerNorm = TorchLN(v_hidden)

    def forward(self, feat, loc):
        return self.LayerNorm(self.image_embeddings(feat)
                              + self.image_location_embeddings(loc))


class TorchPooler(nn.Module):
    """BertTextPooler / BertImagePooler: dense + ReLU on token 0
    (vilbert_dialog.py:915-941)."""

    def __init__(self, d_in, d_out):
        super().__init__()
        self.dense = nn.Linear(d_in, d_out)

    def forward(self, hidden):
        return torch.relu(self.dense(hidden[:, 0]))


class TorchScheduleEncoder(nn.Module):
    """BertEncoder.forward schedule (vilbert_dialog.py:806-912): per
    (v_biattention_id, t_biattention_id) pair run v/t stream layers up to
    the ids, then the connection layer; tail layers after the loop."""

    def __init__(self, cfg):
        super().__init__()
        self.v_ids = cfg.v_biattention_id
        self.t_ids = cfg.t_biattention_id
        self.layer = nn.ModuleList(
            TorchLayer(cfg.hidden_size, cfg.num_attention_heads,
                       cfg.intermediate_size)
            for _ in range(cfg.num_hidden_layers))
        self.v_layer = nn.ModuleList(
            TorchLayer(cfg.v_hidden_size, cfg.v_num_attention_heads,
                       cfg.v_intermediate_size)
            for _ in range(cfg.v_num_hidden_layers))
        self.c_layer = nn.ModuleList(
            TorchBiAttention(cfg.v_hidden_size, cfg.hidden_size,
                             cfg.bi_hidden_size, cfg.bi_num_attention_heads,
                             cfg.v_intermediate_size, cfg.intermediate_size)
            for _ in range(len(cfg.v_biattention_id)))

    def forward(self, t_emb, v_emb, t_mask, v_mask):
        v_start = t_start = 0
        for count, (v_end, t_end) in enumerate(zip(self.v_ids, self.t_ids)):
            for i in range(v_start, v_end):
                v_emb = self.v_layer[i](v_emb, v_mask)
            for i in range(t_start, t_end):
                t_emb = self.layer[i](t_emb, t_mask)
            v_emb, t_emb = self.c_layer[count](v_emb, v_mask, t_emb, t_mask)
            v_start, t_start = v_end, t_end
        for i in range(v_start, len(self.v_layer)):       # tails (:895-905)
            v_emb = self.v_layer[i](v_emb, v_mask)
        for i in range(t_start, len(self.layer)):
            t_emb = self.layer[i](t_emb, t_mask)
        return t_emb, v_emb


class TorchPreTrainingHeads(nn.Module):
    """BertPreTrainingHeads (vilbert_dialog.py:1017-1055); the MLM decoder
    weight IS the word-embedding Parameter (:991)."""

    def __init__(self, cfg, word_weight):
        super().__init__()
        self.predictions = nn.Module()
        self.predictions.transform = nn.Module()
        self.predictions.transform.dense = nn.Linear(cfg.hidden_size,
                                                     cfg.hidden_size)
        self.predictions.transform.LayerNorm = TorchLN(cfg.hidden_size)
        self.predictions.decoder = nn.Linear(cfg.hidden_size, cfg.vocab_size,
                                             bias=False)
        self.predictions.decoder.weight = word_weight          # tied
        self.predictions.bias = nn.Parameter(torch.zeros(cfg.vocab_size))
        self.bi_seq_relationship = nn.Linear(cfg.bi_hidden_size, 2)
        self.imagePredictions = nn.Module()
        ip = self.imagePredictions
        ip.transform = nn.Module()
        ip.transform.dense = nn.Linear(cfg.v_hidden_size, cfg.v_hidden_size)
        ip.transform.LayerNorm = TorchLN(cfg.v_hidden_size)
        ip.decoder = nn.Linear(cfg.v_hidden_size, cfg.v_target_size)

    def forward(self, seq_t, seq_v, pooled_t, pooled_v, fusion="mul"):
        pooled = pooled_t * pooled_v if fusion == "mul" else pooled_t + pooled_v
        p = self.predictions
        h = p.transform.LayerNorm(torch_gelu(p.transform.dense(seq_t)))
        pred_t = p.decoder(h) + p.bias
        ip = self.imagePredictions
        hv = ip.transform.LayerNorm(torch_gelu(ip.transform.dense(seq_v)))
        pred_v = ip.decoder(hv)
        return pred_t, pred_v, self.bi_seq_relationship(pooled)


class TorchGST(nn.Module):
    """The COMPLETE reference EncoderDecoderModel, reference state-dict
    layout: encoder.bert_pretrained.{bert,cls}, vlfusion.{fc_l,fc_v},
    decoder.decoder.{bert,lm_head}.  The decoder's embeddings module IS the
    encoder's (train_gen.py:293 module swap); lm_head.decoder.weight stays
    an independent tensor (captured before the swap,
    visual_dialog_decoder.py:124)."""

    def __init__(self, enc_cfg, dec_cfg):
        super().__init__()
        self.enc_cfg, self.dec_cfg = enc_cfg, dec_cfg
        bert = nn.Module()
        bert.embeddings = TorchEmbeddingsDialog(enc_cfg.vocab_size,
                                                enc_cfg.hidden_size)
        bert.v_embeddings = TorchImageEmbeddings(enc_cfg.v_feature_size,
                                                 enc_cfg.v_hidden_size)
        bert.encoder = TorchScheduleEncoder(enc_cfg)
        bert.t_pooler = nn.Module()
        bert.t_pooler.dense = nn.Linear(enc_cfg.hidden_size,
                                        enc_cfg.bi_hidden_size)
        bert.v_pooler = nn.Module()
        bert.v_pooler.dense = nn.Linear(enc_cfg.v_hidden_size,
                                        enc_cfg.bi_hidden_size)
        self.encoder = nn.Module()
        self.encoder.bert_pretrained = nn.Module()
        self.encoder.bert_pretrained.bert = bert
        self.encoder.bert_pretrained.cls = TorchPreTrainingHeads(
            enc_cfg, bert.embeddings.word_embeddings.weight)

        self.vlfusion = nn.Module()
        self.vlfusion.fc_l = nn.Linear(enc_cfg.hidden_size,
                                       enc_cfg.hidden_size)
        self.vlfusion.fc_v = nn.Linear(enc_cfg.v_hidden_size,
                                       enc_cfg.hidden_size)

        dec_bert = nn.Module()
        dec_bert.embeddings = bert.embeddings                  # tied MODULE
        dec_bert.encoder = nn.Module()
        dec_bert.encoder.layer = nn.ModuleList(
            TorchDecoderLayer(dec_cfg.hidden_size,
                              dec_cfg.num_attention_heads,
                              dec_cfg.intermediate_size)
            for _ in range(dec_cfg.num_hidden_layers))
        lm_head = nn.Module()
        lm_head.decoder = nn.Linear(dec_cfg.hidden_size, dec_cfg.vocab_size)
        lm_head.bias = lm_head.decoder.bias                    # shared tensor
        self.decoder = nn.Module()
        self.decoder.decoder = nn.Module()
        self.decoder.decoder.bert = dec_bert
        self.decoder.decoder.lm_head = lm_head

    # ---- reference forward paths ----

    @staticmethod
    def _ext_mask(mask_2d):
        """(1 - mask)[:, None, None, :] * -10000 (vilbert:1352-1370)."""
        return ((1.0 - mask_2d.float()) * -10000.0)[:, None, None, :]

    def encode(self, input_ids, image_feat, image_loc, token_type_ids,
               attention_mask, image_attention_mask):
        bert = self.encoder.bert_pretrained.bert
        t_emb = bert.embeddings(input_ids, token_type_ids)
        v_emb = bert.v_embeddings(image_feat, image_loc)
        hidden_t, hidden_v = bert.encoder(
            t_emb, v_emb, self._ext_mask(attention_mask),
            self._ext_mask(image_attention_mask))
        pooled_t = torch.relu(bert.t_pooler.dense(hidden_t[:, 0]))
        pooled_v = torch.relu(bert.v_pooler.dense(hidden_v[:, 0]))
        return hidden_t, hidden_v, pooled_t, pooled_v

    def pretrain_scores(self, *enc_args):
        hidden_t, hidden_v, pooled_t, pooled_v = self.encode(*enc_args)
        return self.encoder.bert_pretrained.cls(hidden_t, hidden_v,
                                                pooled_t, pooled_v)

    def fuse(self, hidden_t, hidden_v, attention_mask, image_attention_mask):
        memory = torch.cat((self.vlfusion.fc_v(hidden_v),
                            self.vlfusion.fc_l(hidden_t)), dim=1)
        mem_mask = torch.cat((image_attention_mask, attention_mask), dim=1)
        return memory, mem_mask

    def decode_logits(self, dec_input_ids, dec_attention_mask, memory,
                      mem_mask):
        """BertGenerationEncoder.forward (visual_dialog_decoder.py:219-323):
        causal x pad self mask, inverted memory mask, embeddings with
        token_type zeros, HF BertLayer stack, lm_head."""
        L = dec_input_ids.shape[1]
        causal = torch.tril(torch.ones(L, L))
        self_mask = (1.0 - causal[None, None]
                     * dec_attention_mask.float()[:, None, None, :]) * -10000.0
        mem_add = self._ext_mask(mem_mask)
        x = self.decoder.decoder.bert.embeddings(dec_input_ids)
        for layer in self.decoder.decoder.bert.encoder.layer:
            x = layer(x, self_mask, memory, mem_add)
        lm = self.decoder.decoder.lm_head
        return lm.decoder(x)

    def score(self, input_ids, image_feat, image_loc, token_type_ids,
              attention_mask, image_attention_mask, dec_input_ids,
              dec_attention_mask):
        hidden_t, hidden_v, _, _ = self.encode(
            input_ids, image_feat, image_loc, token_type_ids,
            attention_mask, image_attention_mask)
        memory, mem_mask = self.fuse(hidden_t, hidden_v, attention_mask,
                                     image_attention_mask)
        return self.decode_logits(dec_input_ids, dec_attention_mask, memory,
                                  mem_mask)


def torch_reference_losses(pred_t, pred_v, nsp, mlm_labels, image_target,
                           image_label, nsp_labels):
    """The 3 pretraining losses exactly as vilbert_dialog.py:1489-1510."""
    lm = nn.CrossEntropyLoss(ignore_index=-1)(
        pred_t.reshape(-1, pred_t.shape[-1]), mlm_labels.reshape(-1))
    img = nn.KLDivLoss(reduction="none")(
        F.log_softmax(pred_v, dim=2), image_target)
    img = torch.sum(img * (image_label == 1).unsqueeze(2).float()) / max(
        torch.sum(image_label == 1), 1)
    logp = F.log_softmax(nsp.reshape(-1, 2), dim=1)
    nsp_loss = -(nsp_labels * logp).sum() / nsp_labels.shape[0]
    return lm, img, nsp_loss


# --------------------------------------------------------------------- #
# the composed parity fixture
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def composed(tiny_configs):
    enc_cfg, dec_cfg = tiny_configs
    torch.manual_seed(7)
    model = TorchGST(enc_cfg, dec_cfg).eval()

    B, L, R, T = 8, 24, 7, 10
    g = torch.Generator().manual_seed(11)
    batch = {
        "input_ids": torch.randint(1, enc_cfg.vocab_size, (B, L), generator=g),
        "image_feat": torch.randn(B, R, enc_cfg.v_feature_size, generator=g),
        "image_loc": torch.rand(B, R, 5, generator=g),
        # exercise BOTH the base segment table and the extension table
        "token_type_ids": torch.randint(0, 4, (B, L), generator=g),
        "attention_mask": (torch.rand(B, L, generator=g) > 0.2).long(),
        "image_attention_mask": (torch.rand(B, R, generator=g) > 0.2).long(),
    }
    batch["attention_mask"][:, 0] = 1          # CLS always visible
    batch["image_attention_mask"][:, 0] = 1
    dec_input_ids = torch.randint(1, enc_cfg.vocab_size, (B, T), generator=g)
    dec_input_ids[:, 0] = 101
    dec_input_ids[:, -2] = EOS_ID              # exercise EOS->PAD derivation
    dec_input_ids[:, -1] = PAD_ID
    dec_attention_mask = (dec_input_ids != PAD_ID).long()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    tree = convert_torch_state_dict(
        sd, num_text_layers=enc_cfg.num_hidden_layers,
        num_visual_layers=enc_cfg.v_num_hidden_layers,
        num_co_layers=len(enc_cfg.v_biattention_id),
        num_dec_layers=dec_cfg.num_hidden_layers)
    fl = GSTVisualDialog(enc_cfg, dec_cfg)
    return model, fl, {"params": tree}, batch, dec_input_ids, \
        dec_attention_mask


def _jx(t):
    return jnp.asarray(t.numpy())


def test_composed_teacher_forced_logits_and_loss(composed):
    """End-to-end encode -> fuse -> teacher-forced decode parity, including
    the reference's in-forward label derivation (shift-left labels,
    EOS->PAD inputs) and the CE-ignore-pad loss."""
    model, fl, params, batch, dec_ids, dec_mask = composed

    # torch side: reference derivation (visual_dialog_decoder.py:53-57)
    t_labels = torch.zeros_like(dec_ids)
    t_labels[:, :-1] = dec_ids[:, 1:]
    t_inputs = dec_ids.masked_fill(dec_ids == EOS_ID, PAD_ID)
    with torch.no_grad():
        want_logits = model.score(
            batch["input_ids"], batch["image_feat"], batch["image_loc"],
            batch["token_type_ids"], batch["attention_mask"],
            batch["image_attention_mask"], t_inputs, dec_mask)
        want_loss = nn.CrossEntropyLoss(ignore_index=PAD_ID)(
            want_logits.reshape(-1, want_logits.shape[-1]),
            t_labels.reshape(-1))

    labels, inputs = derive_labels_and_inputs(_jx(dec_ids), EOS_ID, PAD_ID)
    np.testing.assert_array_equal(np.asarray(labels), t_labels.numpy())
    np.testing.assert_array_equal(np.asarray(inputs), t_inputs.numpy())

    got_logits = fl.apply(
        params, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
        _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
        _jx(batch["attention_mask"]), _jx(batch["image_attention_mask"]),
        inputs, _jx(dec_mask), method=GSTVisualDialog.score)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=1e-4, atol=1e-4)
    got_loss = teacher_forced_loss(got_logits, labels, PAD_ID)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-5, atol=1e-6)


def test_composed_pretraining_losses(composed, tiny_configs):
    """enc-only path: MLM / masked-image / soft-NSP losses agree end to end
    (vilbert_dialog.py:1489-1510 vs gstx.models.heads)."""
    enc_cfg, _ = tiny_configs
    model, fl, params, batch, _, _ = composed
    B, L = batch["input_ids"].shape
    R = batch["image_feat"].shape[1]
    g = torch.Generator().manual_seed(13)
    mlm_labels = torch.where(torch.rand(B, L, generator=g) < 0.15,
                             torch.randint(0, enc_cfg.vocab_size, (B, L),
                                           generator=g),
                             torch.full((B, L), -1))
    image_target = torch.softmax(
        torch.randn(B, R, enc_cfg.v_target_size, generator=g), -1)
    image_label = torch.where(torch.rand(B, R, generator=g) < 0.2,
                              torch.ones(B, R, dtype=torch.long),
                              torch.full((B, R), -1, dtype=torch.long))
    image_label[:, 1] = 1                     # >=1 masked region
    nsp_labels = torch.softmax(torch.randn(B, 2, generator=g), -1)

    enc_args = (batch["input_ids"], batch["image_feat"], batch["image_loc"],
                batch["token_type_ids"], batch["attention_mask"],
                batch["image_attention_mask"])
    with torch.no_grad():
        pred_t, pred_v, nsp = model.pretrain_scores(*enc_args)
        want = torch_reference_losses(pred_t, pred_v, nsp, mlm_labels,
                                      image_target, image_label, nsp_labels)

    got_t, got_v, got_nsp = fl.apply(
        params, *[_jx(a) for a in enc_args],
        method=GSTVisualDialog.pretrain_scores)
    np.testing.assert_allclose(np.asarray(got_t), pred_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), pred_v.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_nsp), nsp.numpy(),
                               rtol=1e-4, atol=1e-4)
    got = (masked_lm_loss(got_t, _jx(mlm_labels)),
           masked_img_loss(got_v, _jx(image_target), _jx(image_label)),
           soft_nsp_loss(got_nsp, _jx(nsp_labels)))
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(float(g_), float(w_), rtol=1e-5,
                                   atol=1e-6)


def test_composed_candidate_ranking(composed, tiny_configs):
    """Generative ranking (evaluate_gen.py:94-107): per-candidate summed
    log-likelihood and the induced ranking order agree."""
    enc_cfg, _ = tiny_configs
    model, fl, params, batch, _, _ = composed
    B, C, T = 4, 12, 9
    g = torch.Generator().manual_seed(17)
    cands = torch.randint(1, enc_cfg.vocab_size, (B, C, T), generator=g)
    cands[:, :, 0] = 101
    # variable lengths: pad tails
    for b in range(B):
        for c in range(C):
            n = int(torch.randint(3, T, (1,), generator=g))
            cands[b, c, n:] = PAD_ID

    sl = {k: v[:B] for k, v in batch.items()}
    with torch.no_grad():
        hidden_t, hidden_v, _, _ = model.encode(
            sl["input_ids"], sl["image_feat"], sl["image_loc"],
            sl["token_type_ids"], sl["attention_mask"],
            sl["image_attention_mask"])
        memory, mem_mask = model.fuse(hidden_t, hidden_v,
                                      sl["attention_mask"],
                                      sl["image_attention_mask"])
        want_scores = torch.zeros(B, C)
        for c in range(C):
            ids = cands[:, c]
            targets = torch.zeros_like(ids)
            targets[:, :-1] = ids[:, 1:]
            inputs = ids.masked_fill(ids == EOS_ID, PAD_ID)
            mask = (ids != PAD_ID).long()
            logits = model.decode_logits(inputs, mask, memory, mem_mask)
            logp = F.log_softmax(logits, dim=-1)
            tok = torch.gather(logp, 2, targets.unsqueeze(-1)).squeeze(-1)
            tok = tok.masked_fill(targets == PAD_ID, 0.0)
            want_scores[:, c] = tok.sum(-1)

    flat = cands.reshape(B * C, T)
    inputs_j = jnp.where(_jx(flat) == EOS_ID, PAD_ID, _jx(flat))
    mask_j = (_jx(flat) != PAD_ID).astype(jnp.int32)
    rep = lambda a: jnp.repeat(_jx(a), C, axis=0)
    got_logits = fl.apply(
        params, rep(sl["input_ids"]), rep(sl["image_feat"]),
        rep(sl["image_loc"]), rep(sl["token_type_ids"]),
        rep(sl["attention_mask"]), rep(sl["image_attention_mask"]),
        inputs_j, mask_j, method=GSTVisualDialog.score)
    got_scores = candidate_log_likelihood(
        got_logits, _jx(flat), PAD_ID).reshape(B, C)
    np.testing.assert_allclose(np.asarray(got_scores), want_scores.numpy(),
                               rtol=1e-4, atol=1e-4)
    # identical ranking order
    np.testing.assert_array_equal(
        np.argsort(-np.asarray(got_scores), axis=1),
        np.argsort(-want_scores.numpy(), axis=1))
