"""Discriminative ranking evaluation: candidate score = NSP softmax prob of
the "is-next" class.

Equivalent of reference ``evaluate_disc.py:22-120``: [B, 10, options]
full-sequence candidates scored by softmax(seq_relationship)[:, 0]
(:79-83), chunked (reference 200), reduced to the same metrics.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from gstx.data.encode import nsp_attention_mask
from gstx.eval.metrics import NDCG, SparseGTMetrics, scores_to_ranks
from gstx.models.encdec import GSTVisualDialog


def make_nsp_scorer(model: GSTVisualDialog, mesh=None):
    from gstx.kernels.ffn import set_tensor_parallel_from_mesh, tp_gated

    # pallas kernels are GSPMD-opaque; gate them off under Megatron TP
    # (re-asserted per call via tp_gated)
    set_tensor_parallel_from_mesh(mesh)
    in_shardings = None
    if mesh is not None:
        from gstx.core.mesh import batch_sharding

        keys = ("tokens", "segments", "sep_indices", "att_mask",
                "image_feat", "image_loc", "image_mask")
        # params entry None: inherit the committed (possibly Megatron-TP)
        # leaf shardings instead of force-replicating
        in_shardings = (None,
                        {k: batch_sharding(mesh) for k in keys})

    def score_chunk(params, chunk):
        _, _, nsp = model.apply(
            params,
            chunk["tokens"], chunk["image_feat"], chunk["image_loc"],
            chunk["segments"], chunk["att_mask"], chunk["image_mask"],
            method=GSTVisualDialog.pretrain_scores)
        probs = jax.nn.softmax(nsp.astype(jnp.float32), axis=-1)
        return probs[:, 0]

    if in_shardings is not None:
        return tp_gated(mesh, jax.jit(score_chunk, in_shardings=in_shardings))
    return tp_gated(mesh, jax.jit(score_chunk))





def evaluate_disc(
    model: GSTVisualDialog,
    params,
    loader,
    mode: str = "vd_eval_val",
    vd_version: str = "1.0",
    chunk_size: int = 200,
    logger=None,
    mesh=None,
) -> Dict:
    sparse = SparseGTMetrics()
    ndcg = NDCG()
    ranks_json: List[dict] = []
    if mesh is not None:
        from gstx.core.mesh import MODEL_AXIS, shard_by_path

        params = shard_by_path(mesh, params)
        if mesh.shape.get(MODEL_AXIS, 1) > 1:
            model = model.clone(mesh=mesh)
    score_chunk = make_nsp_scorer(model, mesh=mesh)

    for batch in loader:
        b, rounds, options = batch["tokens"].shape[:3]
        total = b * rounds * options
        flat = {}
        for key in ("tokens", "segments", "sep_indices"):
            flat[key] = batch[key].reshape(total, batch[key].shape[-1])
        hist_len = batch["hist_len"].reshape(total)
        flat["att_mask"] = nsp_attention_mask(
            flat["sep_indices"], hist_len, batch["tokens"].shape[-1])
        for key in ("image_feat", "image_loc", "image_mask"):
            x = batch[key]
            expanded = np.broadcast_to(
                x[:, None, None], (b, rounds, options) + x.shape[1:])
            flat[key] = expanded.reshape((total,) + x.shape[1:])

        cs = min(chunk_size, total)
        assert total % cs == 0
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
                rel_round = batch["round_id"][:, 0]
                ndcg.observe(scores[np.arange(b), rel_round - 1],
                             batch["gt_relevance"])
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
