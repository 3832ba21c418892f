"""Adversarial robustness attacks: FGSM on region features, coreference
synonym substitution, random-token MLM refill.

Reimplements reference ``evaluate_gen_attack.py:28-231`` and
``utils/text_attack.py``:

  * FGSM: one ascent step ``x + eps * sign(grad)`` on the image features,
    where the loss is the relevance-weighted mean teacher-forced NLL over
    the 100 candidates of the dense-annotated round
    (``evaluate_gen_attack.py:100-148``).  jax.grad replaces the
    requires_grad/optimizer dance.
  * coreference: substitute a dependency-linked word with its most similar
    counter-fitted-embedding synonym (cos-sim >= 0.5) in the affected
    rounds (``text_attack.py:58-116``).  The reference's ``substitute_word``
    as written crashes (str indexed as list, ``text_attack.py:93-96``); we
    implement the evident intent: split the decoded context on [SEP],
    replace in the target segment, re-tokenize.
  * random_token: the eval dataset masks history tokens with prob
    ``mask_prob``; an MLM re-fills the masks (``text_attack.py:30-56``).
    Deviation: the reference loads a separate huggingface BertForMaskedLM;
    gstx uses the dialog encoder's own MLM head (self-contained, and
    conditioned on the image like the rest of the model).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gstx.core.config import MASK_ID, PAD_ID, SEP_ID
from gstx.data.encode import list2arraypad
from gstx.models.encdec import (
    GSTVisualDialog,
    derive_labels_and_inputs,
    teacher_forced_nll,
)


def make_fgsm_scorer(model: GSTVisualDialog, epsilon: float = 1.0,
                     mesh=None):
    """Returns jitted ``fgsm_scores(params, chunk, gt_relevance)`` ->
    candidate log-likelihood scores after the FGSM perturbation of the image
    features (evaluate_gen_attack.py:101-148).

    With ``mesh``, candidate rows shard over the data axis (the SPMD
    equivalent of the reference's DataParallel wrap,
    evaluate_gen_attack.py:410); the per-row FGSM gradient partitions with
    them.  Padded rows must carry ``gt_relevance == 0``: their gradient is
    exactly zero, so ``sign(0) == 0`` leaves them unperturbed."""
    from gstx.models.encdec import candidate_log_likelihood
    from gstx.kernels.ffn import set_tensor_parallel_from_mesh, tp_gated

    # pallas kernels are GSPMD-opaque; gate them off under Megatron TP
    # (re-asserted per call via tp_gated)
    set_tensor_parallel_from_mesh(mesh)
    in_shardings = None
    if mesh is not None:
        from gstx.core.mesh import batch_sharding

        # params entry None: inherit the committed (possibly Megatron-TP)
        # leaf shardings instead of force-replicating
        in_shardings = (None,
                        jax.tree_util.tree_map(
                            lambda _: batch_sharding(mesh), {
                                k: 0 for k in (
                                    "enc_input_ids", "enc_segments",
                                    "enc_att_mask", "dec_input_ids",
                                    "dec_att_mask", "enc_image_feat",
                                    "enc_image_loc", "enc_image_mask")}),
                        batch_sharding(mesh))

    def nll_loss(image_feat, params, chunk, gt_relevance):
        dec_ids = chunk["dec_input_ids"]
        labels, dec_inputs = derive_labels_and_inputs(dec_ids, SEP_ID, PAD_ID)
        logits = model.apply(
            params, chunk["enc_input_ids"], image_feat,
            chunk["enc_image_loc"], chunk["enc_segments"],
            chunk["enc_att_mask"], chunk["enc_image_mask"],
            dec_inputs, chunk["dec_att_mask"],
            method=GSTVisualDialog.score)
        nll = teacher_forced_nll(logits, labels)  # [B, T], 0 at pads
        per_sample = nll.mean(-1)  # mean over all positions (ref :127)
        return jnp.sum(per_sample * gt_relevance)

    nll_grad = jax.grad(nll_loss)

    def fgsm_scores(params, chunk, gt_relevance):
        grad = nll_grad(chunk["enc_image_feat"], params, chunk,
                        gt_relevance)
        perturbed = chunk["enc_image_feat"] + epsilon * jnp.sign(grad)
        dec_ids = chunk["dec_input_ids"]
        dec_inputs = jnp.where(dec_ids == SEP_ID, PAD_ID, dec_ids)
        logits = model.apply(
            params, chunk["enc_input_ids"], perturbed,
            chunk["enc_image_loc"], chunk["enc_segments"],
            chunk["enc_att_mask"], chunk["enc_image_mask"],
            dec_inputs, chunk["dec_att_mask"],
            method=GSTVisualDialog.score)
        return candidate_log_likelihood(logits, dec_ids)

    if in_shardings is not None:
        out = tp_gated(mesh, jax.jit(fgsm_scores,
                                     in_shardings=in_shardings))
    else:
        out = tp_gated(mesh, jax.jit(fgsm_scores))
    # exposed for the torch-oracle parity test (the attack's input gradient
    # d loss / d image_features, the quantity FGSM's sign() consumes)
    out.nll_grad = jax.jit(nll_grad)
    return out


class TextAttack:
    """Host-side text attacks (text_attack.py:13-116)."""

    def __init__(self, tokenizer, cos_sim: Optional[np.ndarray] = None,
                 cos_sim_idx2word: Optional[dict] = None,
                 cos_sim_word2idx: Optional[dict] = None,
                 mlm_fill: Optional[Callable] = None,
                 max_seq_len: int = 256):
        self.tokenizer = tokenizer
        self.cos_sim = cos_sim
        self.idx2word = cos_sim_idx2word
        self.word2idx = cos_sim_word2idx
        self.mlm_fill = mlm_fill
        self.max_seq_len = max_seq_len

    # ------------------------------------------------------------------ #

    def random_token_attack(self, input_ids: np.ndarray,
                            token_type_ids: np.ndarray,
                            attention_mask: np.ndarray,
                            image: Optional[Dict] = None) -> np.ndarray:
        """Re-fill [MASK]ed history tokens via MLM argmax; all 100 candidate
        rows share the same context, so only row 0 is predicted and
        broadcast (text_attack.py:30-56)."""
        batch_size = input_ids.shape[0]
        masked = np.array(input_ids[:1])
        if self.mlm_fill is None:
            return np.array(input_ids)
        logits = np.asarray(self.mlm_fill(
            masked, token_type_ids[:1], attention_mask[:1], image))
        mask_pos = masked == MASK_ID
        if mask_pos.any():
            masked[mask_pos] = logits[mask_pos].argmax(-1)
        return np.repeat(masked, batch_size, axis=0)

    # ------------------------------------------------------------------ #

    def coreference_attack(self, input_ids: np.ndarray,
                           sep_indices: np.ndarray,
                           coref_dependency: Dict) -> np.ndarray:
        """Synonym-substitute dependency-linked words in the affected rounds
        (text_attack.py:58-91)."""
        batch_size = input_ids.shape[0]
        if not coref_dependency:
            return np.array(input_ids)
        unit = np.array(input_ids[:1])
        for k, target_word in coref_dependency.items():
            target_round = int(k)
            if self.word2idx is None or target_word not in self.word2idx:
                continue
            synonyms, _ = self.pick_most_similar_words_batch(
                [self.word2idx[target_word]], self.cos_sim, self.idx2word)
            if not synonyms[0]:
                continue
            synonym = synonyms[0][0]
            if target_round == 0:
                unit = self._substitute(unit, target_word, synonym, 0)
            else:
                unit = self._substitute(unit, target_word, synonym,
                                        target_round * 2 - 1)
                unit = self._substitute(unit, target_word, synonym,
                                        target_round * 2)
        return np.repeat(unit, batch_size, axis=0)

    def _substitute(self, unit_input_ids: np.ndarray, target_word: str,
                    synonym_word: str, segment_index: int) -> np.ndarray:
        """Intended behavior of the reference's substitute_word
        (text_attack.py:93-100): decode, split on [SEP], replace in the
        segment, re-tokenize with [CLS] prefix and re-pad."""
        ids = [int(t) for t in unit_input_ids[0] if t != PAD_ID]
        text = self.tokenizer.decode(ids, skip_special_tokens=False)
        segments = [s.strip() for s in text.replace("[CLS]", "").split(
            "[SEP]")]
        if segment_index >= len(segments):
            return unit_input_ids
        segments[segment_index] = segments[segment_index].replace(
            target_word, synonym_word)
        # rebuild: [CLS] seg1 [SEP] seg2 [SEP] ...
        rebuilt = ["[CLS]"]
        for seg in (s for s in segments if s != ""):
            rebuilt.extend(self.tokenizer.tokenize(seg))
            rebuilt.append("[SEP]")
        new_ids = self.tokenizer.convert_tokens_to_ids(rebuilt)
        return list2arraypad(new_ids, self.max_seq_len)[None, :]

    # ------------------------------------------------------------------ #

    @staticmethod
    def pick_most_similar_words_batch(src_words, sim_mat, idx2word,
                                      ret_count: int = 10,
                                      threshold: float = 0.5):
        """text_attack.py:103-116 (TextFooler-style synonym lookup)."""
        sim_order = np.argsort(-sim_mat[src_words, :])[:, 1:1 + ret_count]
        sim_words, sim_values = [], []
        for idx, src_word in enumerate(src_words):
            sim_value = sim_mat[src_word][sim_order[idx]]
            mask = sim_value >= threshold
            sim_word = sim_order[idx][mask]
            sim_words.append([idx2word[i] for i in sim_word])
            sim_values.append(sim_value[mask])
        return sim_words, sim_values


def make_mlm_fill(model: GSTVisualDialog, params):
    """MLM refill callable backed by the dialog encoder's own MLM head."""

    @jax.jit
    def _predict(input_ids, token_type_ids, attention_mask, image_feat,
                 image_loc, image_mask):
        pred_t, _, _ = model.apply(
            params, input_ids, image_feat, image_loc, token_type_ids,
            attention_mask, image_mask,
            method=GSTVisualDialog.pretrain_scores)
        return pred_t

    def fill(input_ids, token_type_ids, attention_mask, image):
        return _predict(jnp.asarray(input_ids), jnp.asarray(token_type_ids),
                        jnp.asarray(attention_mask),
                        jnp.asarray(image["feat"][:1]),
                        jnp.asarray(image["loc"][:1]),
                        jnp.asarray(image["mask"][:1]))

    return fill
