"""Parity against the reference's OWN torch modules (VERDICT round-2 #3).

`tests/test_torch_parity_full.py` pins gstx against a TRANSCRIPTION of the
reference equations; a transcription error would be invisible there.  This
harness removes that risk: it imports the actual
`/root/reference/models/vilbert_dialog.py` (BertForMultiModalPreTraining —
the full two-stream encoder + heads), `visual_dialog_decoder.py`
(BertForSequenceGeneration) and `visual_dialog_model.py` (VLFusion),
instantiates them at the tiny topology, converts their randomly-initialized
state dicts through `gstx.core.checkpoint.convert_torch_state_dict`, and
re-runs the three composed-parity assertions (teacher-forced logits + loss,
the 3 pretraining losses, candidate ranking) against the REFERENCE'S OWN
forward passes.

Two ~20-line accommodations make the reference code importable offline
(the ONLY blocking issues, verified in round 2's VERDICT):
  * `pytorch_transformers.modeling_bert.BertEmbeddings` — shimmed to the
    installed `transformers` BertEmbeddings (vilbert_dialog.py:34 imports
    it but never uses it: BertEmbeddingsDialog is self-contained);
  * `pytorch_pretrained_bert.file_utils.cached_path` — stubbed (only
    reachable via `from_pretrained`, which these tests never call);
plus a CPU device proxy for the unused `pe` buffer that vilbert_dialog
pins to CUDA at construction (vilbert_dialog.py:312; `pe` is not used in
forward and is absent from state dicts).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from torch import nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gstx.core.checkpoint import convert_torch_state_dict  # noqa: E402
from gstx.eval.rank_gen import candidate_log_likelihood  # noqa: E402
from gstx.models.encdec import (  # noqa: E402
    GSTVisualDialog,
    derive_labels_and_inputs,
    teacher_forced_loss,
)
from gstx.models.heads import (  # noqa: E402
    masked_img_loss,
    masked_lm_loss,
    soft_nsp_loss,
)

EOS_ID, PAD_ID = 102, 0

REFERENCE_ROOT = "/root/reference"


def load_reference_modules():
    """Import the reference's own torch modules with the offline shims;
    returns (vilbert_dialog, visual_dialog_decoder, visual_dialog_model)
    or None when the reference tree is absent.  Shared with the
    production-dimension harness (test_reference_parity_production.py)."""
    import os

    if not os.path.isdir(os.path.join(REFERENCE_ROOT, "models")):
        return None
    mb = types.ModuleType("pytorch_transformers.modeling_bert")
    mb.BertEmbeddings = transformers.models.bert.modeling_bert.BertEmbeddings
    pt = types.ModuleType("pytorch_transformers")
    pt.modeling_bert = mb
    fu = types.ModuleType("pytorch_pretrained_bert.file_utils")

    def cached_path(*a, **k):
        raise RuntimeError("offline harness: cached_path must not be called")

    fu.cached_path = cached_path
    ppb = types.ModuleType("pytorch_pretrained_bert")
    ppb.file_utils = fu
    sys.modules.update({
        "pytorch_transformers": pt,
        "pytorch_transformers.modeling_bert": mb,
        "pytorch_pretrained_bert": ppb,
        "pytorch_pretrained_bert.file_utils": fu,
    })
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        import models.vilbert_dialog as vd
        import models.visual_dialog_decoder as vdd
        import models.visual_dialog_model as vdm
    finally:
        sys.path.remove(REFERENCE_ROOT)

    class _TorchCPU:
        """vilbert_dialog.py:312 pins the (unused) sinusoidal `pe` buffer to
        CUDA at construction; route its torch.device to CPU."""

        def __getattr__(self, name):
            return getattr(torch, name)

        @staticmethod
        def device(*a, **k):
            return torch.device("cpu")

    vd.torch = _TorchCPU()
    return vd, vdd, vdm


@pytest.fixture(scope="module")
def ref_modules():
    mods = load_reference_modules()
    if mods is None:
        pytest.skip("reference tree not available")
    return mods


def _ref_enc_config(vd, enc_cfg, mode, model_arch):
    cfg = vd.BertConfig.from_dict(dict(
        vocab_size=enc_cfg.vocab_size, hidden_size=enc_cfg.hidden_size,
        num_hidden_layers=enc_cfg.num_hidden_layers,
        num_attention_heads=enc_cfg.num_attention_heads,
        intermediate_size=enc_cfg.intermediate_size, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=enc_cfg.max_position_embeddings,
        type_vocab_size=enc_cfg.type_vocab_size, initializer_range=0.02,
        v_feature_size=enc_cfg.v_feature_size,
        v_target_size=enc_cfg.v_target_size,
        v_hidden_size=enc_cfg.v_hidden_size,
        v_num_hidden_layers=enc_cfg.v_num_hidden_layers,
        v_num_attention_heads=enc_cfg.v_num_attention_heads,
        v_intermediate_size=enc_cfg.v_intermediate_size,
        bi_hidden_size=enc_cfg.bi_hidden_size,
        bi_num_attention_heads=enc_cfg.bi_num_attention_heads,
        bi_intermediate_size=enc_cfg.bi_intermediate_size,
        v_attention_probs_dropout_prob=0.0, v_hidden_act="gelu",
        v_hidden_dropout_prob=0.0, v_initializer_range=0.02,
        v_biattention_id=list(enc_cfg.v_biattention_id),
        t_biattention_id=list(enc_cfg.t_biattention_id),
        predict_feature=False, fast_mode=False, fixed_v_layer=0,
        fixed_t_layer=0, in_batch_pairs=False, fusion_method="mul",
        intra_gate=False, with_coattention=True))
    cfg.cur_device = 0
    cfg.mode = mode
    cfg.model_arch = model_arch
    return cfg


def _ref_dec_config(vdd, dec_cfg):
    cfg = vdd.BertGenerationConfig(
        vocab_size=dec_cfg.vocab_size, hidden_size=dec_cfg.hidden_size,
        num_hidden_layers=dec_cfg.num_hidden_layers,
        num_attention_heads=dec_cfg.num_attention_heads,
        intermediate_size=dec_cfg.intermediate_size, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        max_position_embeddings=dec_cfg.max_position_embeddings,
        initializer_range=0.02, is_decoder=True, add_cross_attention=True,
        layer_norm_eps=1e-12, bos_token_id=101, eos_token_id=EOS_ID,
        pad_token_id=PAD_ID, use_cache=False)
    cfg.type_vocab_size = dec_cfg.type_vocab_size
    cfg.cur_device = 0
    return cfg


@pytest.fixture(scope="module")
def ref_assembly(ref_modules, tiny_configs):
    """The real reference model stack at tiny topology, its state dict run
    through the gstx converter, and a shared input batch."""
    vd, vdd, vdm = ref_modules
    enc_cfg, dec_cfg = tiny_configs
    torch.manual_seed(7)
    cfg = _ref_enc_config(vd, enc_cfg, mode="vd_eval_val",
                          model_arch="enc_dec_a")
    encoder = vd.BertForMultiModalPreTraining(cfg).eval()
    vlfusion = vdm.VLFusion(cfg).eval()
    dcfg = _ref_dec_config(vdd, dec_cfg)
    decoder = vdd.BertForSequenceGeneration(dcfg).eval()
    # the reference's embedding-module swap (train_gen.py:293): decoder
    # INPUT embeddings become the encoder's shared DialogEmbeddings, while
    # lm_head keeps the decoder's ORIGINAL (now-orphaned) table — exactly
    # the tying topology gstx reproduces structurally
    decoder.bert.embeddings = encoder.bert.embeddings

    # assemble the enc-dec checkpoint template exactly as
    # EncoderDecoderModel.state_dict() lays it out (generate.py checkpoints)
    sd = {}
    for k, v in encoder.state_dict().items():
        sd[f"encoder.bert_pretrained.{k}"] = v.detach().numpy()
    for k, v in decoder.state_dict().items():
        sd[f"decoder.decoder.{k}"] = v.detach().numpy()
    for k, v in vlfusion.state_dict().items():
        sd[f"vlfusion.{k}"] = v.detach().numpy()
    tree = convert_torch_state_dict(
        sd, num_text_layers=enc_cfg.num_hidden_layers,
        num_visual_layers=enc_cfg.v_num_hidden_layers,
        num_co_layers=len(enc_cfg.v_biattention_id),
        num_dec_layers=dec_cfg.num_hidden_layers)
    fl = GSTVisualDialog(enc_cfg, dec_cfg)

    B, L, R, T = 6, 24, 7, 10
    g = torch.Generator().manual_seed(11)
    batch = {
        "input_ids": torch.randint(1, enc_cfg.vocab_size, (B, L),
                                   generator=g),
        "image_feat": torch.randn(B, R, enc_cfg.v_feature_size, generator=g),
        "image_loc": torch.rand(B, R, 5, generator=g),
        # both the base segment table and the 10-slot extension table
        "token_type_ids": torch.randint(0, 4, (B, L), generator=g),
        "attention_mask": (torch.rand(B, L, generator=g) > 0.2).long(),
        "image_attention_mask": (torch.rand(B, R, generator=g) > 0.2).long(),
    }
    batch["attention_mask"][:, 0] = 1
    batch["image_attention_mask"][:, 0] = 1
    dec_ids = torch.randint(1, dec_cfg.vocab_size, (B, T), generator=g)
    dec_ids[:, 0] = 101
    dec_ids[:, -2] = EOS_ID
    dec_ids[:, -1] = PAD_ID
    return (vd, vdd, vdm, cfg, encoder, vlfusion, decoder, fl,
            {"params": tree}, batch, dec_ids)


def _jx(t):
    return jnp.asarray(t.numpy())


def _ref_encode(encoder, batch):
    """enc_dec branch of the reference encoder forward
    (vilbert_dialog.py:1485-1488/1516-1517): returns the two last hidden
    streams."""
    with torch.no_grad():
        out = encoder(
            batch["input_ids"], batch["image_feat"], batch["image_loc"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            image_attention_mask=batch["image_attention_mask"])
    return out  # (hidden_t, hidden_v) in eval enc_dec mode


def test_reference_teacher_forced_logits_and_loss(ref_assembly):
    """encode -> VLFusion -> teacher-forced decode against the reference's
    own modules, including its in-forward label derivation
    (visual_dialog_decoder.py:53-57) and CE-ignore-pad loss."""
    (_, _, _, _, encoder, vlfusion, decoder, fl, params, batch,
     dec_ids) = ref_assembly
    dec_mask = (dec_ids != PAD_ID).long()
    t_labels = torch.zeros_like(dec_ids)
    t_labels[:, :-1] = dec_ids[:, 1:]
    t_inputs = dec_ids.masked_fill(dec_ids == EOS_ID, PAD_ID)

    hidden_t, hidden_v = _ref_encode(encoder, batch)
    with torch.no_grad():
        memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                    batch["attention_mask"],
                                    batch["image_attention_mask"])
        dout = decoder(decoder_input_ids=t_inputs, attention_mask=dec_mask,
                       encoder_hidden_states=memory,
                       encoder_attention_mask=mem_mask)
        want_logits = dout.logits
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


def test_reference_pretraining_losses(ref_modules, ref_assembly,
                                      tiny_configs):
    """enc_only train branch (vilbert_dialog.py:1489-1510): the reference's
    own MLM / masked-image KLDiv / soft-NSP losses against gstx's."""
    vd, _, _ = ref_modules
    enc_cfg, _ = tiny_configs
    (_, _, _, _, encoder, _, _, fl, params, batch, _) = ref_assembly
    # enc_only train branches are config-driven: rebuild a wrapper view of
    # the SAME weights under mode='vd_train', model_arch='enc_only_a'
    cfg2 = _ref_enc_config(vd, enc_cfg, mode="vd_train",
                           model_arch="enc_only_a")
    enc_only = vd.BertForMultiModalPreTraining(cfg2).eval()
    enc_only.load_state_dict(encoder.state_dict(), strict=True)

    B, L = batch["input_ids"].shape
    R = batch["image_feat"].shape[1]
    g = torch.Generator().manual_seed(13)
    mlm_labels = torch.where(
        torch.rand(B, L, generator=g) < 0.15,
        torch.randint(0, enc_cfg.vocab_size, (B, L), generator=g),
        torch.full((B, L), -1))
    image_target = torch.softmax(
        torch.randn(B, R, enc_cfg.v_target_size, generator=g), -1)
    image_label = torch.where(
        torch.rand(B, R, generator=g) < 0.2,
        torch.ones(B, R, dtype=torch.long),
        torch.full((B, R), -1, dtype=torch.long))
    image_label[:, 1] = 1
    nsp_labels = torch.softmax(torch.randn(B, 2, generator=g), -1)

    with torch.no_grad():
        want_lm, want_img, want_nsp, _, pred_t, nsp_score = enc_only(
            batch["input_ids"], batch["image_feat"], batch["image_loc"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            image_attention_mask=batch["image_attention_mask"],
            masked_lm_labels=mlm_labels, image_label=image_label,
            image_target=image_target, next_sentence_label=nsp_labels)

    got_t, got_v, got_nsp = fl.apply(
        params, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
        _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
        _jx(batch["attention_mask"]), _jx(batch["image_attention_mask"]),
        method=GSTVisualDialog.pretrain_scores)
    np.testing.assert_allclose(np.asarray(got_t), pred_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_nsp), nsp_score.numpy(),
                               rtol=1e-4, atol=1e-4)
    got = (masked_lm_loss(got_t, _jx(mlm_labels)),
           masked_img_loss(got_v, _jx(image_target), _jx(image_label)),
           soft_nsp_loss(got_nsp, _jx(nsp_labels)))
    for g_, w_ in zip(got, (want_lm, want_img, want_nsp)):
        np.testing.assert_allclose(float(g_), float(w_), rtol=1e-4,
                                   atol=1e-5)


def test_reference_pretraining_gradient_parity(ref_modules, ref_assembly,
                                               tiny_configs):
    """Backward-graph parity for the OTHER training family: the coefficient
    -weighted 3-loss encoder pretraining objective (train_disc.py:116-123
    `loss = lm + nsp + img` -> backward) through the reference's own
    BertForMultiModalPreTraining vs `jax.grad` through gstx's
    `pretrain_scores` + loss heads.  Complements
    test_reference_gradient_parity (decoder-CE family): together every
    trainable loss surface has its gradients pinned against torch autograd.
    Distinct coefficients catch any loss-term mix-up."""
    import jax

    vd, _, _ = ref_modules
    enc_cfg, dec_cfg = tiny_configs
    (_, _, _, _, encoder, _, _, fl, params, batch, _) = ref_assembly
    c_lm, c_nsp, c_img = 1.0, 0.7, 0.3

    cfg2 = _ref_enc_config(vd, enc_cfg, mode="vd_train",
                           model_arch="enc_only_a")
    enc_only = vd.BertForMultiModalPreTraining(cfg2).eval()
    enc_only.load_state_dict(encoder.state_dict(), strict=True)
    enc_only.zero_grad(set_to_none=True)

    B, L = batch["input_ids"].shape
    R = batch["image_feat"].shape[1]
    g = torch.Generator().manual_seed(13)
    mlm_labels = torch.where(
        torch.rand(B, L, generator=g) < 0.15,
        torch.randint(0, enc_cfg.vocab_size, (B, L), generator=g),
        torch.full((B, L), -1))
    image_target = torch.softmax(
        torch.randn(B, R, enc_cfg.v_target_size, generator=g), -1)
    image_label = torch.where(
        torch.rand(B, R, generator=g) < 0.2,
        torch.ones(B, R, dtype=torch.long),
        torch.full((B, R), -1, dtype=torch.long))
    image_label[:, 1] = 1
    nsp_labels = torch.softmax(torch.randn(B, 2, generator=g), -1)

    want_lm, want_img, want_nsp, _, _, _ = enc_only(
        batch["input_ids"], batch["image_feat"], batch["image_loc"],
        token_type_ids=batch["token_type_ids"],
        attention_mask=batch["attention_mask"],
        image_attention_mask=batch["image_attention_mask"],
        masked_lm_labels=mlm_labels, image_label=image_label,
        image_target=image_target, next_sentence_label=nsp_labels)
    (c_lm * want_lm.mean() + c_nsp * want_nsp.mean()
     + c_img * want_img.mean()).backward()

    sd_g = {}
    pgrads = {k: v.grad for k, v in enc_only.named_parameters()}
    for k, v in enc_only.state_dict().items():
        gr = pgrads.get(k)
        sd_g["encoder.bert_pretrained." + k] = (
            gr.detach().numpy() if gr is not None
            else np.zeros(v.shape, np.float32))
    tree_g = convert_torch_state_dict(
        sd_g, num_text_layers=enc_cfg.num_hidden_layers,
        num_visual_layers=enc_cfg.v_num_hidden_layers,
        num_co_layers=len(enc_cfg.v_biattention_id),
        num_dec_layers=dec_cfg.num_hidden_layers)

    def loss_fn(p):
        pt, pv, nsp = fl.apply(
            p, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
            _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
            _jx(batch["attention_mask"]),
            _jx(batch["image_attention_mask"]),
            method=GSTVisualDialog.pretrain_scores)
        return (c_lm * masked_lm_loss(pt, _jx(mlm_labels))
                + c_nsp * soft_nsp_loss(nsp, _jx(nsp_labels))
                + c_img * masked_img_loss(pv, _jx(image_target),
                                          _jx(image_label)))

    got = jax.grad(loss_fn)(params)["params"]

    import flax.traverse_util as tu

    want_flat = tu.flatten_dict(tree_g, sep="/")
    got_flat = tu.flatten_dict(got, sep="/")
    # encoder-only objective: the converted want-tree covers the encoder +
    # heads subtrees; every gstx leaf outside them (decoder, fusion) must
    # have gotten EXACTLY zero gradient
    assert set(want_flat) <= set(got_flat)
    zero_keys = set(got_flat) - set(want_flat)
    assert any(k.startswith("decoder/") for k in zero_keys)
    for k in sorted(zero_keys):
        assert float(np.abs(got_flat[k]).max()) == 0.0, k
    for k in sorted(want_flat):
        np.testing.assert_allclose(
            np.asarray(got_flat[k]),
            np.asarray(want_flat[k], np.float32), rtol=3e-4, atol=5e-7,
            err_msg=f"gradient mismatch at {k}")
    enc_only.zero_grad(set_to_none=True)


def test_reference_fgsm_parity(ref_assembly, tiny_configs):
    """FGSM attack parity against torch autograd through the reference's
    own modules (evaluate_gen_attack.py:101-148): the INPUT gradient
    d(relevance-weighted mean NLL)/d(image features) — the quantity
    `sign()` consumes — matches on every element, zero-relevance rows get
    EXACTLY zero gradient (the mesh-padding invariant attacks.py relies
    on), and the composed `fgsm_scores` (perturb + rescore) reproduces the
    reference's post-attack candidate log-likelihoods."""
    import jax

    enc_cfg, dec_cfg = tiny_configs
    (_, _, _, _, encoder, vlfusion, decoder, fl, params, batch,
     dec_ids) = ref_assembly
    from gstx.eval.attacks import make_fgsm_scorer

    B = batch["input_ids"].shape[0]
    g = torch.Generator().manual_seed(29)
    rel = torch.rand(B, generator=g)
    rel[1] = 0.0  # a zero-relevance candidate row
    epsilon = 0.5

    dec_mask = (dec_ids != PAD_ID).long()
    t_labels = torch.zeros_like(dec_ids)
    t_labels[:, :-1] = dec_ids[:, 1:]
    t_inputs = dec_ids.masked_fill(dec_ids == EOS_ID, PAD_ID)

    # torch: grad wrt a leaf features tensor (the reference's Variable
    # requires_grad dance), per-position CE -> mean over ALL positions ->
    # relevance-weighted sum -> backward
    feats = batch["image_feat"].clone().requires_grad_(True)
    hidden_t, hidden_v = encoder(
        batch["input_ids"], feats, batch["image_loc"],
        token_type_ids=batch["token_type_ids"],
        attention_mask=batch["attention_mask"],
        image_attention_mask=batch["image_attention_mask"])
    memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                batch["attention_mask"],
                                batch["image_attention_mask"])
    logits = decoder(decoder_input_ids=t_inputs, attention_mask=dec_mask,
                     encoder_hidden_states=memory,
                     encoder_attention_mask=mem_mask).logits
    nll = nn.CrossEntropyLoss(ignore_index=PAD_ID, reduction="none")(
        logits.reshape(-1, logits.shape[-1]), t_labels.reshape(-1))
    loss = (nll.reshape(B, -1).mean(1) * rel).sum()
    loss.backward()
    want_grad = feats.grad.detach()

    with torch.no_grad():
        pert = batch["image_feat"] + epsilon * torch.sign(want_grad)
        hidden_t2, hidden_v2 = encoder(
            batch["input_ids"], pert, batch["image_loc"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            image_attention_mask=batch["image_attention_mask"])
        memory2, mem_mask2 = vlfusion(hidden_t2, hidden_v2,
                                      batch["attention_mask"],
                                      batch["image_attention_mask"])
        logits2 = decoder(decoder_input_ids=t_inputs,
                          attention_mask=dec_mask,
                          encoder_hidden_states=memory2,
                          encoder_attention_mask=mem_mask2).logits
        logp = F.log_softmax(logits2, dim=-1)
        tok = torch.gather(logp, 2, t_labels.unsqueeze(-1)).squeeze(-1)
        want_scores = tok.masked_fill(t_labels == PAD_ID, 0.0).sum(-1)

    chunk = {
        "enc_input_ids": _jx(batch["input_ids"]),
        "enc_image_feat": _jx(batch["image_feat"]),
        "enc_image_loc": _jx(batch["image_loc"]),
        "enc_segments": _jx(batch["token_type_ids"]),
        "enc_att_mask": _jx(batch["attention_mask"]),
        "enc_image_mask": _jx(batch["image_attention_mask"]),
        "dec_input_ids": _jx(dec_ids),
        "dec_att_mask": _jx(dec_mask),
    }
    scorer = make_fgsm_scorer(fl, epsilon=epsilon)
    got_grad = scorer.nll_grad(chunk["enc_image_feat"], params, chunk,
                               _jx(rel))
    np.testing.assert_allclose(np.asarray(got_grad), want_grad.numpy(),
                               rtol=3e-4, atol=5e-7)
    assert float(want_grad[1].abs().max()) == 0.0
    assert float(np.abs(np.asarray(got_grad)[1]).max()) == 0.0
    # composed attack: identical signs -> identical perturbation -> the
    # rescored candidate log-likelihoods agree at forward-parity tolerance
    got_scores = scorer(params, chunk, _jx(rel))
    np.testing.assert_allclose(np.asarray(got_scores),
                               want_scores.numpy(), rtol=1e-4, atol=1e-4)


def test_reference_candidate_ranking(ref_assembly, tiny_configs):
    """Generative candidate ranking (evaluate_gen.py:94-107) against the
    reference's own encoder+fusion+decoder."""
    enc_cfg, _ = tiny_configs
    (_, _, _, _, encoder, vlfusion, decoder, fl, params, batch,
     _) = ref_assembly
    B, C, T = 4, 8, 9
    g = torch.Generator().manual_seed(17)
    cands = torch.randint(1, enc_cfg.vocab_size, (B, C, T), generator=g)
    cands[:, :, 0] = 101
    for b in range(B):
        for c in range(C):
            n = int(torch.randint(3, T, (1,), generator=g))
            cands[b, c, n:] = PAD_ID

    sl = {k: v[:B] for k, v in batch.items()}
    hidden_t, hidden_v = _ref_encode(encoder, sl)
    with torch.no_grad():
        memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                    sl["attention_mask"],
                                    sl["image_attention_mask"])
        want_scores = torch.zeros(B, C)
        for c in range(C):
            ids = cands[:, c]
            targets = torch.zeros_like(ids)
            targets[:, :-1] = ids[:, 1:]
            inputs = ids.masked_fill(ids == EOS_ID, PAD_ID)
            mask = (ids != PAD_ID).long()
            logits = decoder(decoder_input_ids=inputs, attention_mask=mask,
                             encoder_hidden_states=memory,
                             encoder_attention_mask=mem_mask).logits
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
    np.testing.assert_array_equal(
        np.argsort(-np.asarray(got_scores), axis=1),
        np.argsort(-want_scores.numpy(), axis=1))


def test_reference_gradient_parity(ref_assembly, tiny_configs):
    """Composed GRADIENT parity: torch autograd through the reference's own
    encoder+VLFusion+decoder on the generative training loss (decoder CE,
    train_gen.py:324-325 `lm_loss.backward()`) vs `jax.grad` through gstx's
    `score` path — with the torch grads mapped through the SAME checkpoint
    converter as the weights (concat/transpose are linear, so converted
    grads are the grads of converted params; torch's shared embedding
    Parameter already accumulates its encoder-input + decoder-input + MLM
    -projection uses, and the converter's tied-duplicate drop keeps that
    accumulated tensor).  Until now only forwards/losses were pinned against
    the reference; this pins the entire backward graph."""
    import jax

    enc_cfg, dec_cfg = tiny_configs
    (_, _, _, _, encoder, vlfusion, decoder, fl, params, batch,
     dec_ids) = ref_assembly

    dec_mask = (dec_ids != PAD_ID).long()
    t_labels = torch.zeros_like(dec_ids)
    t_labels[:, :-1] = dec_ids[:, 1:]
    t_inputs = dec_ids.masked_fill(dec_ids == EOS_ID, PAD_ID)

    mods = (encoder, vlfusion, decoder)
    for m in mods:
        m.zero_grad(set_to_none=True)
    # grad-enabled re-run of _ref_encode's enc_dec forward
    hidden_t, hidden_v = encoder(
        batch["input_ids"], batch["image_feat"], batch["image_loc"],
        token_type_ids=batch["token_type_ids"],
        attention_mask=batch["attention_mask"],
        image_attention_mask=batch["image_attention_mask"])
    memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                batch["attention_mask"],
                                batch["image_attention_mask"])
    logits = decoder(decoder_input_ids=t_inputs, attention_mask=dec_mask,
                     encoder_hidden_states=memory,
                     encoder_attention_mask=mem_mask).logits
    loss = nn.CrossEntropyLoss(ignore_index=PAD_ID)(
        logits.reshape(-1, logits.shape[-1]), t_labels.reshape(-1))
    loss.backward()

    # grads keyed exactly like the enc-dec checkpoint (weights template +
    # grad where a parameter has one, zeros for grad-less params/buffers)
    sd_g = {}
    for prefix, mod in (("encoder.bert_pretrained.", encoder),
                        ("decoder.decoder.", decoder),
                        ("vlfusion.", vlfusion)):
        pgrads = {k: v.grad for k, v in mod.named_parameters()}
        for k, v in mod.state_dict().items():
            g = pgrads.get(k)
            sd_g[prefix + k] = (g.detach().numpy() if g is not None
                                else np.zeros(v.shape, np.float32))
    tree_g = convert_torch_state_dict(
        sd_g, num_text_layers=enc_cfg.num_hidden_layers,
        num_visual_layers=enc_cfg.v_num_hidden_layers,
        num_co_layers=len(enc_cfg.v_biattention_id),
        num_dec_layers=dec_cfg.num_hidden_layers)

    def loss_fn(p):
        lg = fl.apply(
            p, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
            _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
            _jx(batch["attention_mask"]),
            _jx(batch["image_attention_mask"]),
            _jx(t_inputs), _jx(dec_mask), method=GSTVisualDialog.score)
        return teacher_forced_loss(lg, _jx(t_labels), PAD_ID)

    got = jax.grad(loss_fn)(params)["params"]

    import flax.traverse_util as tu

    want_flat = tu.flatten_dict(tree_g, sep="/")
    got_flat = tu.flatten_dict(got, sep="/")
    assert set(want_flat) == set(got_flat)
    # the shared table really accumulated multiple uses (nonzero), and a
    # decoder-only leaf (lm head) plus an encoder-only leaf both got grads
    emb_key = "encoder/embeddings/word_embeddings/embedding"
    assert float(np.abs(want_flat[emb_key]).max()) > 0
    checked = 0
    for k in sorted(got_flat):
        w, g = np.asarray(want_flat[k], np.float32), np.asarray(got_flat[k])
        np.testing.assert_allclose(
            g, w, rtol=3e-4, atol=5e-7,
            err_msg=f"gradient mismatch at {k}")
        checked += 1
    assert checked == len(got_flat)
    for m in mods:
        m.zero_grad(set_to_none=True)


def _ref_greedy_decode(decoder, memory, mem_mask, hist_ques, max_steps,
                       ngram_size, du):
    """The reference's decode branch (visual_dialog_model.py:86-119) run
    with the reference's OWN decoding utils, made deterministic by top_k=1
    (the multinomial draw over a single surviving candidate).  Harness glue
    only — filtering/blocking/sampling are the imported reference code."""
    b = memory.shape[0]
    dec = torch.full((b, 1), 101, dtype=torch.long)
    seq = []
    for _ in range(max_steps):
        with torch.no_grad():
            logits = decoder(decoder_input_ids=dec.clone(),
                             attention_mask=None,
                             encoder_hidden_states=memory,
                             encoder_attention_mask=mem_mask).logits
        step_logits = logits[:, -1, :] / 0.7
        step_logits = du.batch_ngram_blocking(
            step_logits, hist_ques, dec, ngram_size=ngram_size)
        filtered = du.batch_top_k_top_p_sampling(step_logits, top_k=1,
                                                 top_p=0.0)
        nxt = torch.multinomial(F.softmax(filtered, dim=-1), 1)
        dec = torch.cat((dec, nxt), dim=-1)
        seq.append(nxt)
    return torch.cat(seq, 1)


@pytest.mark.parametrize("fused", [False, True])
def test_reference_greedy_decode_parity(ref_modules, ref_assembly,
                                        tiny_configs, fused):
    """END-TO-END greedy decode against the reference's own code: its
    decoder module + its actual `utils/decoding_utils.py` (top-k filter and
    dict-based n-gram blocking) vs gstx's KV-cached `sample_sequence`.
    Previously greedy equivalence was pinned only against a gstx-side
    reference-STYLE loop (test_decode_equivalence) — this closes the
    transcription risk for the composed decode chain.  Phase 1 decodes
    unblocked; phase 2 plants phase-1's own output in the blocking source
    so the n-gram ban MUST fire and divert the greedy path identically on
    both sides.  Runs with both samplers (top_k=1 makes the fused
    candidate-extract + categorical deterministic too)."""
    import sys as _sys

    import jax

    _sys.path.insert(0, REFERENCE_ROOT)
    try:
        import utils.decoding_utils as du
    finally:
        _sys.path.remove(REFERENCE_ROOT)
    from gstx.decode.sampler import (DecodeSettings, init_cache,
                                     sample_sequence)
    from gstx.ops.sampling import pad_after_eos

    enc_cfg, dec_cfg = tiny_configs
    (_, _, _, _, encoder, vlfusion, decoder, fl, params, batch,
     _) = ref_assembly
    b = batch["input_ids"].shape[0]
    max_steps = 10

    hidden_t, hidden_v = _ref_encode(encoder, batch)
    with torch.no_grad():
        memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                    batch["attention_mask"],
                                    batch["image_attention_mask"])
    mem_kv, mem_add = fl.apply(
        params, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
        _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
        _jx(batch["attention_mask"]), _jx(batch["image_attention_mask"]),
        method=GSTVisualDialog.decode_prepare)

    def gstx_decode(ngram_source, ngram_size):
        def step_fn(tok, pos, caches):
            return fl.apply(params, tok, pos, caches, mem_kv, mem_add,
                            method=GSTVisualDialog.decode_step)

        caches = init_cache(dec_cfg, b, max_steps + 1)
        return sample_sequence(
            step_fn, jax.random.PRNGKey(5), b, caches,
            DecodeSettings(max_steps=max_steps, temperature=0.7, top_k=1,
                           ngram_blocking_size=ngram_size,
                           fused_sampler=fused),
            ngram_source=ngram_source, bos_id=101, eos_id=EOS_ID)

    # phase 1: unblocked greedy
    zero_hist = torch.zeros(b, 20, dtype=torch.long)
    want1 = _ref_greedy_decode(decoder, memory, mem_mask, zero_hist,
                               max_steps, 0, du)
    got1 = gstx_decode(None, 0)
    want1p = pad_after_eos(_jx(want1), EOS_ID, PAD_ID)
    np.testing.assert_array_equal(np.asarray(got1), np.asarray(want1p))

    # phase 2: plant phase-1 output in the blocking source -> the first
    # special-free PRE-EOS trigram of each row becomes a live ban that MUST
    # fire (greedy replays the phase-1 prefix until the planted (t0,t1)
    # tail, where the ban -inf's t2 and diverts); both sides must divert
    # identically
    hist = torch.zeros(b, 20, dtype=torch.long)
    specials = {0, 100, 101, EOS_ID, 103}
    planted = 0
    w1p = np.asarray(want1p)
    for r in range(b):
        toks = [int(t) for t in w1p[r] if t != PAD_ID]  # pre-EOS + EOS
        for i in range(len(toks) - 2):
            tri = toks[i:i + 3]
            if not (set(tri) & specials):
                hist[r, :3] = torch.tensor(tri)
                planted += 1
                break
    assert planted >= 1  # at least one live ban: the scenario is real
    want2 = _ref_greedy_decode(decoder, memory, mem_mask, hist.clone(),
                               max_steps, 3, du)
    got2 = gstx_decode(_jx(hist), 3)
    want2p = pad_after_eos(_jx(want2), EOS_ID, PAD_ID)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2p))
    # and the ban really rewrote history vs phase 1 for some planted row
    assert not np.array_equal(np.asarray(want2p), np.asarray(want1p))


def test_reference_answer_ppl(ref_assembly, tiny_configs):
    """The GST engine's answer-perplexity trick (generate.py:183-209) against
    the reference's own decoder, via the engine's REAL ``answer_ppl``.

    Pins the exact semantics a naive in-loop fold would break (PERF.md
    round 4): the answer is scored CLS-less (its first token sits at
    position 0 and is never itself scored), the attention mask is computed
    BEFORE the EOS->PAD rewrite (visual_dialog_decoder.py:57 mutates
    in-place, generate.py:186 masks first), and the normalising length
    AFTER it (generate.py:205) — including the no-EOS quirk where 17
    scored terms divide by 18."""
    enc_cfg, dec_cfg = tiny_configs
    (_, _, _, _, encoder, vlfusion, decoder, fl, params, batch,
     _) = ref_assembly
    from gstx.decode.dialog_engine import make_dialog_engine

    B, T = batch["input_ids"].shape[0], 18
    g = torch.Generator().manual_seed(23)
    # synthetic sampled answers, shaped like sample_sequence output: random
    # non-special tokens, first EOS at L-1, PAD after; one row with no EOS
    # at all (the full-18-steps case: 17 scored terms over denominator 18)
    ans = torch.randint(1, dec_cfg.vocab_size, (B, T), generator=g)
    ans[ans == EOS_ID] = 103
    lengths = [5, 2, 18, None, 9, 3]  # None = no EOS sampled
    for b, L in enumerate(lengths):
        if L is not None:
            ans[b, L - 1] = EOS_ID
            ans[b, L:] = PAD_ID

    att = (ans != PAD_ID).long()                     # BEFORE the rewrite
    t_labels = torch.zeros_like(ans)
    t_labels[:, :-1] = ans[:, 1:]                    # shift of the ORIGINAL
    t_inputs = ans.masked_fill(ans == EOS_ID, PAD_ID)
    hidden_t, hidden_v = _ref_encode(encoder, batch)
    with torch.no_grad():
        memory, mem_mask = vlfusion(hidden_t, hidden_v,
                                    batch["attention_mask"],
                                    batch["image_attention_mask"])
        logits = decoder(decoder_input_ids=t_inputs, attention_mask=att,
                         encoder_hidden_states=memory,
                         encoder_attention_mask=mem_mask).logits
        loss = nn.CrossEntropyLoss(ignore_index=PAD_ID, reduction="none")(
            logits.reshape(-1, logits.shape[-1]), t_labels.reshape(-1))
        ans_len = (t_inputs != PAD_ID).sum(-1)       # AFTER the rewrite
        want_ppl = torch.exp(loss.reshape(B, T).sum(-1) / ans_len)

    engine = make_dialog_engine(fl, dec_cfg)
    mem_kv, mem_add = fl.apply(
        params, _jx(batch["input_ids"]), _jx(batch["image_feat"]),
        _jx(batch["image_loc"]), _jx(batch["token_type_ids"]),
        _jx(batch["attention_mask"]), _jx(batch["image_attention_mask"]),
        method=GSTVisualDialog.decode_prepare)
    got_ppl, got_inputs, got_len = engine.answer_ppl(
        params, _jx(ans), mem_kv, mem_add)

    np.testing.assert_array_equal(np.asarray(got_inputs), t_inputs.numpy())
    np.testing.assert_array_equal(np.asarray(got_len), ans_len.numpy())
    assert int(ans_len[3]) == T  # no-EOS row: denominator is the full 18
    np.testing.assert_allclose(np.asarray(got_ppl), want_ppl.numpy(),
                               rtol=2e-4)
