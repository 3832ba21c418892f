"""Adversarial robustness evaluation loop.

Equivalent of reference ``evaluate_gen_attack.py:233-369``: eval batch size 1
(v1.0), inner chunks of 100 (= one dialog round's candidates); the FGSM /
coreference attacks fire only on the dense-annotated round
(``evaluate_gen_attack.py:92-100``), random_token perturbs every round's
context (the eval dataset masks history tokens with ``mask_prob`` when
``attack == random_token``, ``dataloader_visdial_gen.py:387``)."""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gstx.core.config import PAD_ID, SEP_ID, GSTConfig
from gstx.eval.attacks import TextAttack, make_fgsm_scorer
from gstx.eval.metrics import NDCG, SparseGTMetrics
from gstx.eval.rank_gen import make_chunk_scorer
from gstx.models.encdec import GSTVisualDialog


def rebuild_segments(ids: np.ndarray, start_segment: int = 1) -> np.ndarray:
    """Reconstruct oscillating segment ids from [SEP] positions
    (encode_input semantics, data_utils.py:34-57): each utterance's tokens
    INCLUDING its trailing SEP share a segment; pads are 0."""
    is_sep = (ids == SEP_ID).astype(np.int64)
    # number of SEPs strictly before each position
    before = np.cumsum(is_sep, axis=1) - is_sep
    seg = (start_segment + before) % 2
    seg[ids == PAD_ID] = 0
    return seg


def evaluate_attack(
    model: GSTVisualDialog,
    params,
    loader,
    config: GSTConfig,
    coref_dependency: Optional[List[dict]] = None,
    text_attack: Optional[TextAttack] = None,
    epsilon: float = 1.0,
    chunk_size: int = 100,
    logger=None,
    mesh=None,
) -> Dict:
    """With ``mesh``, each round's candidate chunk shards over the data
    axis — the SPMD stand-in for the reference's DataParallel wrap
    (evaluate_gen_attack.py:410).  Chunks pad to the data-axis multiple
    with repeated rows (gt_relevance 0 for FGSM, so padded rows take no
    perturbation) and the padded scores are sliced away."""
    sparse = SparseGTMetrics()
    ndcg = NDCG()
    if mesh is not None:
        from gstx.core.mesh import MODEL_AXIS, shard_by_path

        params = shard_by_path(mesh, params)
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            model = model.clone(mesh=mesh)
    score_chunk = make_chunk_scorer(model, mesh=mesh)
    fgsm_chunk = make_fgsm_scorer(model, epsilon, mesh=mesh) \
        if config.attack == "fgsm" else None
    from gstx.core.mesh import pad_batch_rows

    dp = mesh.shape["data"] if mesh is not None else 1
    # device chunk keys: enc_sep_indices stays host-side (it only feeds the
    # dialog-round computation) and must not hit the sharded scorers
    dev_keys = ("enc_input_ids", "enc_segments", "enc_att_mask",
                "dec_input_ids", "dec_att_mask", "enc_image_feat",
                "enc_image_loc", "enc_image_mask")

    batch_idx = 0
    for batch in loader:
        b, rounds, options = batch["enc_input_ids"].shape[:3]
        assert b == 1, "attack eval uses batch size 1 (ref :378)"
        total = rounds * options
        assert chunk_size == options

        flat = {}
        for key in ("enc_input_ids", "enc_segments", "enc_sep_indices",
                    "enc_att_mask", "dec_input_ids", "dec_att_mask"):
            flat[key] = batch[key].reshape(total, batch[key].shape[-1])
        for key in ("enc_image_feat", "enc_image_loc", "enc_image_mask"):
            x = batch[key]
            expanded = np.broadcast_to(
                x[:, None, None], (b, rounds, options) + x.shape[1:])
            flat[key] = expanded.reshape((total,) + x.shape[1:])

        round_id = int(batch["round_id"][0, 0])
        gt_relevance = np.asarray(batch["gt_relevance"][0])
        out = []
        for j in range(rounds):
            chunk = {k: v[j * options:(j + 1) * options]
                     for k, v in flat.items()}
            # current dialog round from the sep count
            # (evaluate_gen_attack.py:94-96)
            dialog_round = int((chunk["enc_sep_indices"][0] != 0).sum() // 2)
            is_dense_round = dialog_round == round_id

            def dev_chunk():
                # pad AFTER any text-attack mutation of `chunk` below
                padded, _ = pad_batch_rows(
                    {k: np.asarray(chunk[k]) for k in dev_keys}, dp)
                return {k: jnp.asarray(v) for k, v in padded.items()}

            n_pad = (-options) % dp
            if config.attack == "fgsm" and is_dense_round:
                # padded rows carry gt_relevance 0: their FGSM gradient is
                # exactly zero, so sign(0) == 0 leaves them unperturbed
                scores = np.asarray(fgsm_chunk(
                    params, dev_chunk(),
                    jnp.asarray(np.concatenate(
                        [gt_relevance, np.zeros(n_pad,
                                                gt_relevance.dtype)]))))[
                    :options]
            else:
                if config.attack == "coreference" and is_dense_round \
                        and text_attack is not None:
                    dep = coref_dependency[batch_idx]["coreference"][j] \
                        if coref_dependency else {}
                    new_ids = text_attack.coreference_attack(
                        chunk["enc_input_ids"], chunk["enc_sep_indices"], dep)
                    chunk["enc_input_ids"] = new_ids
                    # re-tokenized context can change length: recompute the
                    # attention mask and segment ids (the reference keeps
                    # the stale ones — its substitute path crashes anyway)
                    chunk["enc_att_mask"] = (new_ids != PAD_ID).astype(
                        np.float32)
                    chunk["enc_segments"] = rebuild_segments(new_ids)
                elif config.attack == "random_token" \
                        and text_attack is not None:
                    image = {"feat": chunk["enc_image_feat"],
                             "loc": chunk["enc_image_loc"],
                             "mask": chunk["enc_image_mask"]}
                    chunk["enc_input_ids"] = text_attack.random_token_attack(
                        chunk["enc_input_ids"], chunk["enc_segments"],
                        chunk["enc_att_mask"], image)
                scores = np.asarray(score_chunk(params, dev_chunk()))[
                    :options]
            out.append(scores)

        scores = np.concatenate(out).reshape(1, rounds, options)
        sparse.observe(scores, batch["gt_option_inds"])
        if config.vd_version == "1.0":
            dense_scores = scores[np.arange(1), round_id - 1]
            ndcg.observe(dense_scores, batch["gt_relevance"])
        batch_idx += 1

    metrics = {}
    metrics.update(sparse.retrieve(reset=True))
    if config.vd_version == "1.0":
        metrics.update(ndcg.retrieve(reset=True))
    if logger is not None:
        for k, v in metrics.items():
            logger.write(f"{k}: {v}")
    return metrics
