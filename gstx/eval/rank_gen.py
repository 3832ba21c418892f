"""Generative ranking evaluation: score 100 candidate answers per round by
teacher-forced log-likelihood.

Equivalent of reference ``evaluate_gen.py:22-142``: each eval batch holds
[B, 10 rounds, num_options] sequences; they are flattened and scored in
fixed-size chunks (one jitted program, reference chunk 500), then reduced to
NDCG/MRR/R@k or an EvalAI ranks file.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from gstx.core.config import PAD_ID, SEP_ID
from gstx.eval.metrics import NDCG, SparseGTMetrics, scores_to_ranks
from gstx.models.encdec import GSTVisualDialog, candidate_log_likelihood


def make_chunk_scorer(model: GSTVisualDialog, mesh=None):
    """Jitted scorer for one flattened chunk.

    The decoder inputs get EOS->PAD scrubbed (the reference's in-decoder
    label derivation, visual_dialog_decoder.py:53-57) while the candidate
    log-likelihood targets keep the EOS so its probability is scored
    (evaluate_gen.py:98-106).

    With ``mesh``, chunks shard over the data axis (DP evaluation: the
    10x100 options axis folds into the batch and splits across chips)."""

    from gstx.kernels.ffn import set_tensor_parallel_from_mesh, tp_gated

    # pallas kernels are GSPMD-opaque; gate them off when this scorer's
    # mesh carries Megatron-TP weights (re-asserted per call via tp_gated)
    set_tensor_parallel_from_mesh(mesh)
    in_shardings = None
    if mesh is not None:
        from gstx.core.mesh import batch_sharding

        # params entry None: inherit each leaf's committed sharding, so a
        # shard_by_path-placed tree keeps its Megatron-TP layout (callers
        # with a mesh commit params first) instead of being force-replicated
        in_shardings = (None,
                        jax.tree_util.tree_map(
                            lambda _: batch_sharding(mesh), {
                                k: 0 for k in (
                                    "enc_input_ids", "enc_segments",
                                    "enc_att_mask", "dec_input_ids",
                                    "dec_att_mask", "enc_image_feat",
                                    "enc_image_loc", "enc_image_mask")}))

    def score_chunk(params, chunk):
        dec_ids = chunk["dec_input_ids"]
        dec_inputs = jnp.where(dec_ids == SEP_ID, PAD_ID, dec_ids)
        logits = model.apply(
            params,
            chunk["enc_input_ids"], chunk["enc_image_feat"],
            chunk["enc_image_loc"], chunk["enc_segments"],
            chunk["enc_att_mask"], chunk["enc_image_mask"],
            dec_inputs, chunk["dec_att_mask"],
            method=GSTVisualDialog.score)
        return candidate_log_likelihood(logits, dec_ids, PAD_ID)

    if in_shardings is not None:
        return tp_gated(mesh, jax.jit(score_chunk, in_shardings=in_shardings))
    return tp_gated(mesh, jax.jit(score_chunk))


def evaluate_gen(
    model: GSTVisualDialog,
    params,
    loader,
    mode: str = "vd_eval_val",
    vd_version: str = "1.0",
    chunk_size: int = 500,
    logger=None,
    mesh=None,
) -> Dict:
    """Run the full generative evaluation.  ``loader`` yields collated eval
    batches (VisdialGenDataset vd_eval_val / vd_eval_test items).  With
    ``mesh``, chunks shard over the data axis (multi-chip DP eval) and,
    when the mesh has a >1 'model' axis, params place Megatron-TP via
    shard_by_path with the vocab matmuls constraint-partitioned."""
    sparse = SparseGTMetrics()
    ndcg = NDCG()
    ranks_json: List[dict] = []
    if mesh is not None:
        from gstx.core.mesh import MODEL_AXIS, shard_by_path

        params = shard_by_path(mesh, params)
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            model = model.clone(mesh=mesh)
    score_chunk = make_chunk_scorer(model, mesh=mesh)

    for batch in loader:
        b, rounds, options = batch["enc_input_ids"].shape[:3]
        total = b * rounds * options

        flat = {}
        for key in ("enc_input_ids", "enc_segments", "enc_att_mask",
                    "dec_input_ids", "dec_att_mask"):
            flat[key] = batch[key].reshape(total, batch[key].shape[-1])
        # expand image features across rounds x options
        # (evaluate_gen.py:62-70)
        for key in ("enc_image_feat", "enc_image_loc", "enc_image_mask"):
            x = batch[key]
            expanded = np.broadcast_to(
                x[:, None, None], (b, rounds, options) + x.shape[1:])
            flat[key] = expanded.reshape((total,) + x.shape[1:])

        cs = min(chunk_size, total)
        assert total % cs == 0, (total, cs)
        # DP meshes need the chunk batch divisible by the data axis: pad
        # with repeated rows and slice the padded scores away
        from gstx.core.mesh import pad_batch_rows

        dp = mesh.shape["data"] if mesh is not None else 1
        out = []
        for j in range(total // cs):
            chunk, _ = pad_batch_rows(
                {k: v[j * cs:(j + 1) * cs] for k, v in flat.items()}, dp)
            chunk = {k: jnp.asarray(v) for k, v in chunk.items()}
            out.append(np.asarray(score_chunk(params, chunk))[:cs])
        scores = np.concatenate(out).reshape(b, rounds, options)

        if mode == "vd_eval_val":
            sparse.observe(scores, batch["gt_option_inds"])
            if vd_version == "1.0":
                rel_round = batch["round_id"][:, 0]  # 1-based
                dense_scores = scores[np.arange(b), rel_round - 1]
                ndcg.observe(dense_scores, batch["gt_relevance"])
        else:
            ranks = scores_to_ranks(scores)[:, 0, :]
            for i in range(b):
                ranks_json.append({
                    "image_id": int(batch["image_id"][i, 0]),
                    "round_id": int(batch["round_id"][i, 0]),
                    "ranks": [int(r) for r in ranks[i]],
                })

    if mode == "vd_eval_val":
        metrics = {}
        metrics.update(sparse.retrieve(reset=True))
        if vd_version == "1.0":
            metrics.update(ndcg.retrieve(reset=True))
        if logger is not None:
            for k, v in metrics.items():
                logger.write(f"{k}: {v}")
        return metrics
    return ranks_json
