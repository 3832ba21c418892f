"""Checkpointing: orbax-based native checkpoints + a bit-faithful converter
for the reference's released PyTorch checkpoints.

Reference checkpoint layout (``train_gen.py:345-357``): a dict with
``model_state_dict`` / ``optimizer_state_dict`` / ``scheduler_state_dict`` /
``iter_id``; the model state dict holds the full ``EncoderDecoderModel``
(encoder.bert_pretrained..., decoder.decoder..., vlfusion...) with the
embedding tables appearing under BOTH encoder and decoder prefixes (they are
the same tensors after the tying at ``train_gen.py:293``).

:func:`convert_torch_state_dict` maps those names onto the gstx parameter
pytree, concatenating per-projection Q/K/V into the fused QKV kernels and
dropping the tied duplicates and the forward-unused ``q_dense1/q_dense2``
co-attention projections (``vilbert_dialog.py:722,729`` — created but never
called in ``BertBiOutput.forward``).  :func:`to_torch_state_dict` inverts
the mapping (emitting zeros for the unused projections so the reference's
strict ``load_state_dict`` accepts the result).
"""

from __future__ import annotations

import os
import re
from typing import Dict, Tuple

import numpy as np

# ---------------------------------------------------------------------- #
# orbax native checkpoints
# ---------------------------------------------------------------------- #


def save_checkpoint(path: str, params, opt_state=None, step: int = 0):
    """Write-to-temp-then-swap so an interrupted save never destroys the
    previous checkpoint (the old copy survives until the new one is fully
    written).

    Multi-host (jax.process_count() > 1): ALL processes must call this with
    the same path on a SHARED filesystem — orbax streams each process's
    addressable shards of globally-sharded arrays collectively; the
    host-side tmp cleanup and final swap then run on process 0 only,
    fenced by barriers so no process returns before the checkpoint is
    complete (the single-process tmp-swap would race across hosts)."""
    import shutil

    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = path + ".tmp"
    multiproc = jax.process_count() > 1
    if multiproc:
        from jax.experimental import multihost_utils

        barrier = multihost_utils.sync_global_devices
    else:
        barrier = lambda name: None  # noqa: E731
    if (not multiproc or jax.process_index() == 0) and os.path.isdir(tmp):
        shutil.rmtree(tmp)
    barrier("gstx:ckpt_tmp_clean")
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params, "step": np.asarray(step)}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(tmp, payload)
    barrier("gstx:ckpt_written")
    if not multiproc or jax.process_index() == 0:
        # three-step swap: at EVERY instant either `path` or `path.old`
        # holds a complete checkpoint (a plain rmtree-then-replace had a
        # kill window with neither; restore_checkpoint falls back to .old)
        old = path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(path):
            os.replace(path, old)
        os.replace(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old)
    barrier("gstx:ckpt_swapped")


def restore_checkpoint(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        # a kill landed inside save_checkpoint's swap: the previous
        # complete checkpoint survives at .old
        print(f"[checkpoint] {path} missing after an interrupted swap; "
              "restoring the surviving previous copy at .old")
        path = path + ".old"
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


# ---------------------------------------------------------------------- #
# torch state-dict conversion
# ---------------------------------------------------------------------- #


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """torch.load -> numpy state dict (model_state_dict unwrapped)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" in raw:
        raw = raw["model_state_dict"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in raw.items()}


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _qkv_kernel(sd, prefix, names=("query", "key", "value")):
    ws = [sd[f"{prefix}.{n}.weight"] for n in names]
    bs = [sd[f"{prefix}.{n}.bias"] for n in names]
    kernel = np.concatenate([w.T for w in ws], axis=1)
    bias = np.concatenate(bs, axis=0)
    return kernel, bias


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _strip_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize key prefixes across the reference's checkpoint flavors:
    enc-dec ckpts ('encoder.bert_pretrained...'), encoder-only ckpts
    ('bert_pretrained...'), and DataParallel 'module.' wrappers."""
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v
    return out


def convert_torch_state_dict(
    sd: Dict[str, np.ndarray],
    num_text_layers: int = 12,
    num_visual_layers: int = 6,
    num_co_layers: int = 6,
    num_dec_layers: int = 12,
) -> dict:
    """Reference state dict -> gstx param pytree (the {'params': ...} inner
    tree).  Works for enc-dec checkpoints and encoder-only checkpoints
    (decoder/fusion parts are filled only if present)."""
    sd = _strip_prefixes(sd)

    def has(key):
        return key in sd

    # locate the encoder prefix
    enc_p = None
    for cand in ("encoder.bert_pretrained.bert",
                 "bert_pretrained.bert", "bert"):
        if has(f"{cand}.embeddings.word_embeddings.weight"):
            enc_p = cand
            break
    if enc_p is None:
        raise ValueError("no recognizable encoder prefix in state dict")
    # every candidate ends in 'bert'; the cls head lives beside it — for the
    # bare 'bert' flavor (a raw BertForMultiModalPreTraining state dict)
    # that is top-level 'cls', NOT 'bert.cls' (rsplit('.bert') would never
    # match the bare prefix)
    cls_p = enc_p[: -len("bert")] + "cls"

    tree: dict = {}

    # --- embeddings (vilbert_dialog.py:298-321) ---
    emb = f"{enc_p}.embeddings"
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings", "token_type_embeddings_extension"):
        _set(tree, ("encoder", "embeddings", name, "embedding"),
             sd[f"{emb}.{name}.weight"])
    # sep_embeddings is a bare param (ckpt-present, forward-unused)
    _set(tree, ("encoder", "embeddings", "sep_embeddings"),
         sd[f"{emb}.sep_embeddings.weight"])
    _set(tree, ("encoder", "embeddings", "ln"), _ln(sd, f"{emb}.LayerNorm"))

    # --- image embeddings (vilbert_dialog.py:1409-1418) ---
    vemb = f"{enc_p}.v_embeddings"
    _set(tree, ("encoder", "v_embeddings", "image_embeddings"),
         _dense(sd, f"{vemb}.image_embeddings"))
    _set(tree, ("encoder", "v_embeddings", "image_location_embeddings"),
         _dense(sd, f"{vemb}.image_location_embeddings"))
    _set(tree, ("encoder", "v_embeddings", "ln"), _ln(sd, f"{vemb}.LayerNorm"))

    # --- text / visual stream layers ---
    def stream_layer(src, dst):
        k, b = _qkv_kernel(sd, f"{src}.attention.self")
        _set(tree, dst + ("attention", "qkv"), {"kernel": k, "bias": b})
        _set(tree, dst + ("attention", "out"),
             _dense(sd, f"{src}.attention.output.dense"))
        _set(tree, dst + ("attention", "out_ln"),
             _ln(sd, f"{src}.attention.output.LayerNorm"))
        _set(tree, dst + ("ffn", "intermediate"),
             _dense(sd, f"{src}.intermediate.dense"))
        _set(tree, dst + ("ffn", "output"), _dense(sd, f"{src}.output.dense"))
        _set(tree, dst + ("ffn", "output_ln"),
             _ln(sd, f"{src}.output.LayerNorm"))

    for i in range(num_text_layers):
        stream_layer(f"{enc_p}.encoder.layer.{i}",
                     ("encoder", "encoder", f"layer_{i}"))
    for i in range(num_visual_layers):
        stream_layer(f"{enc_p}.encoder.v_layer.{i}",
                     ("encoder", "encoder", f"v_layer_{i}"))

    # --- co-attention connection layers (vilbert_dialog.py:746-773) ---
    for i in range(num_co_layers):
        src = f"{enc_p}.encoder.c_layer.{i}"
        dst = ("encoder", "encoder", f"c_layer_{i}")
        k1, b1 = _qkv_kernel(sd, f"{src}.biattention",
                             ("query1", "key1", "value1"))
        k2, b2 = _qkv_kernel(sd, f"{src}.biattention",
                             ("query2", "key2", "value2"))
        _set(tree, dst + ("biattention", "qkv1"), {"kernel": k1, "bias": b1})
        _set(tree, dst + ("biattention", "qkv2"), {"kernel": k2, "bias": b2})
        _set(tree, dst + ("v_dense",), _dense(sd, f"{src}.biOutput.dense1"))
        _set(tree, dst + ("v_ln",), _ln(sd, f"{src}.biOutput.LayerNorm1"))
        _set(tree, dst + ("t_dense",), _dense(sd, f"{src}.biOutput.dense2"))
        _set(tree, dst + ("t_ln",), _ln(sd, f"{src}.biOutput.LayerNorm2"))
        # q_dense1/q_dense2 are dropped: never used in forward
        _set(tree, dst + ("v_ffn", "intermediate"),
             _dense(sd, f"{src}.v_intermediate.dense"))
        _set(tree, dst + ("v_ffn", "output"),
             _dense(sd, f"{src}.v_output.dense"))
        _set(tree, dst + ("v_ffn", "output_ln"),
             _ln(sd, f"{src}.v_output.LayerNorm"))
        _set(tree, dst + ("t_ffn", "intermediate"),
             _dense(sd, f"{src}.t_intermediate.dense"))
        _set(tree, dst + ("t_ffn", "output"),
             _dense(sd, f"{src}.t_output.dense"))
        _set(tree, dst + ("t_ffn", "output_ln"),
             _ln(sd, f"{src}.t_output.LayerNorm"))

    # --- poolers ---
    _set(tree, ("encoder", "t_pooler", "dense"),
         _dense(sd, f"{enc_p}.t_pooler.dense"))
    _set(tree, ("encoder", "v_pooler", "dense"),
         _dense(sd, f"{enc_p}.v_pooler.dense"))

    # --- pretraining heads (vilbert_dialog.py:1017-1055) ---
    _set(tree, ("cls", "transform", "dense"),
         _dense(sd, f"{cls_p}.predictions.transform.dense"))
    _set(tree, ("cls", "transform", "ln"),
         _ln(sd, f"{cls_p}.predictions.transform.LayerNorm"))
    _set(tree, ("cls", "mlm_bias"), sd[f"{cls_p}.predictions.bias"])
    _set(tree, ("cls", "bi_seq_relationship"),
         _dense(sd, f"{cls_p}.bi_seq_relationship"))
    _set(tree, ("cls", "img_transform", "dense"),
         _dense(sd, f"{cls_p}.imagePredictions.transform.dense"))
    _set(tree, ("cls", "img_transform", "ln"),
         _ln(sd, f"{cls_p}.imagePredictions.transform.LayerNorm"))
    _set(tree, ("cls", "img_decoder"),
         _dense(sd, f"{cls_p}.imagePredictions.decoder"))

    # --- decoder (visual_dialog_decoder.py:116-344), if present ---
    dec_p = None
    for cand in ("decoder.decoder", "decoder"):
        if has(f"{cand}.bert.encoder.layer.0.attention.self.query.weight"):
            dec_p = cand
            break
    if dec_p is not None:
        for i in range(num_dec_layers):
            src = f"{dec_p}.bert.encoder.layer.{i}"
            dst = ("decoder", f"layer_{i}")
            k, b = _qkv_kernel(sd, f"{src}.attention.self")
            _set(tree, dst + ("qkv",), {"kernel": k, "bias": b})
            _set(tree, dst + ("self_out",),
                 _dense(sd, f"{src}.attention.output.dense"))
            _set(tree, dst + ("self_ln",),
                 _ln(sd, f"{src}.attention.output.LayerNorm"))
            _set(tree, dst + ("cross_q",),
                 _dense(sd, f"{src}.crossattention.self.query"))
            kc, bc = _qkv_kernel(sd, f"{src}.crossattention.self",
                                 ("key", "value"))
            _set(tree, dst + ("cross_kv",), {"kernel": kc, "bias": bc})
            _set(tree, dst + ("cross_out",),
                 _dense(sd, f"{src}.crossattention.output.dense"))
            _set(tree, dst + ("cross_ln",),
                 _ln(sd, f"{src}.crossattention.output.LayerNorm"))
            _set(tree, dst + ("intermediate",),
                 _dense(sd, f"{src}.intermediate.dense"))
            _set(tree, dst + ("output",), _dense(sd, f"{src}.output.dense"))
            _set(tree, dst + ("output_ln",),
                 _ln(sd, f"{src}.output.LayerNorm"))
        # independent LM projection (diverged from the shared table in
        # trained reference checkpoints; see GSTDecoderModel.setup)
        _set(tree, ("decoder", "lm_weight"),
             sd[f"{dec_p}.lm_head.decoder.weight"])
        _set(tree, ("decoder", "lm_bias"), sd[f"{dec_p}.lm_head.bias"])

    if has("vlfusion.fc_l.weight"):
        _set(tree, ("fusion_fc_l",), _dense(sd, "vlfusion.fc_l"))
        _set(tree, ("fusion_fc_v",), _dense(sd, "vlfusion.fc_v"))

    return tree


def to_torch_state_dict(params: dict, with_decoder: bool = True,
                        enc_prefix: str = "encoder.bert_pretrained",
                        dtype=np.float32) -> Dict[str, np.ndarray]:
    """gstx param tree -> reference-named state dict (inverse mapping,
    including tied duplicates and zero-filled unused q_dense projections so
    the reference's strict load accepts it)."""
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}
    bert = f"{enc_prefix}.bert"
    cls = f"{enc_prefix}.cls"

    def put_dense(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["kernel"]).T.astype(dtype)
        sd[f"{prefix}.bias"] = np.asarray(node["bias"]).astype(dtype)

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["scale"]).astype(dtype)
        sd[f"{prefix}.bias"] = np.asarray(node["bias"]).astype(dtype)

    def put_qkv(prefix, node, names=("query", "key", "value")):
        k = np.asarray(node["kernel"])
        b = np.asarray(node["bias"])
        ks = np.split(k, len(names), axis=1)
        bs = np.split(b, len(names), axis=0)
        for name, kk, bb in zip(names, ks, bs):
            sd[f"{prefix}.{name}.weight"] = kk.T.astype(dtype)
            sd[f"{prefix}.{name}.bias"] = bb.astype(dtype)

    enc = p["encoder"]
    for name in ("word_embeddings", "position_embeddings",
                 "token_type_embeddings", "token_type_embeddings_extension"):
        sd[f"{bert}.embeddings.{name}.weight"] = np.asarray(
            enc["embeddings"][name]["embedding"]).astype(dtype)
    sd[f"{bert}.embeddings.sep_embeddings.weight"] = np.asarray(
        enc["embeddings"]["sep_embeddings"]).astype(dtype)
    put_ln(f"{bert}.embeddings.LayerNorm", enc["embeddings"]["ln"])
    put_dense(f"{bert}.v_embeddings.image_embeddings",
              enc["v_embeddings"]["image_embeddings"])
    put_dense(f"{bert}.v_embeddings.image_location_embeddings",
              enc["v_embeddings"]["image_location_embeddings"])
    put_ln(f"{bert}.v_embeddings.LayerNorm", enc["v_embeddings"]["ln"])

    def put_stream(prefix, node):
        put_qkv(f"{prefix}.attention.self", node["attention"]["qkv"])
        put_dense(f"{prefix}.attention.output.dense", node["attention"]["out"])
        put_ln(f"{prefix}.attention.output.LayerNorm",
               node["attention"]["out_ln"])
        put_dense(f"{prefix}.intermediate.dense", node["ffn"]["intermediate"])
        put_dense(f"{prefix}.output.dense", node["ffn"]["output"])
        put_ln(f"{prefix}.output.LayerNorm", node["ffn"]["output_ln"])

    for name, node in enc["encoder"].items():
        m = re.fullmatch(r"layer_(\d+)", name)
        if m:
            put_stream(f"{bert}.encoder.layer.{m.group(1)}", node)
            continue
        m = re.fullmatch(r"v_layer_(\d+)", name)
        if m:
            put_stream(f"{bert}.encoder.v_layer.{m.group(1)}", node)
            continue
        m = re.fullmatch(r"c_layer_(\d+)", name)
        if m:
            prefix = f"{bert}.encoder.c_layer.{m.group(1)}"
            put_qkv(f"{prefix}.biattention", node["biattention"]["qkv1"],
                    ("query1", "key1", "value1"))
            put_qkv(f"{prefix}.biattention", node["biattention"]["qkv2"],
                    ("query2", "key2", "value2"))
            put_dense(f"{prefix}.biOutput.dense1", node["v_dense"])
            put_ln(f"{prefix}.biOutput.LayerNorm1", node["v_ln"])
            put_dense(f"{prefix}.biOutput.dense2", node["t_dense"])
            put_ln(f"{prefix}.biOutput.LayerNorm2", node["t_ln"])
            v_hidden = np.asarray(node["v_dense"]["kernel"]).shape[1]
            hidden = np.asarray(node["t_dense"]["kernel"]).shape[1]
            bi = np.asarray(node["v_dense"]["kernel"]).shape[0]
            # unused-in-forward projections, zero-filled for strict load
            sd[f"{prefix}.biOutput.q_dense1.weight"] = np.zeros(
                (v_hidden, bi), dtype)
            sd[f"{prefix}.biOutput.q_dense1.bias"] = np.zeros(v_hidden, dtype)
            sd[f"{prefix}.biOutput.q_dense2.weight"] = np.zeros(
                (hidden, bi), dtype)
            sd[f"{prefix}.biOutput.q_dense2.bias"] = np.zeros(hidden, dtype)
            put_dense(f"{prefix}.v_intermediate.dense",
                      node["v_ffn"]["intermediate"])
            put_dense(f"{prefix}.v_output.dense", node["v_ffn"]["output"])
            put_ln(f"{prefix}.v_output.LayerNorm", node["v_ffn"]["output_ln"])
            put_dense(f"{prefix}.t_intermediate.dense",
                      node["t_ffn"]["intermediate"])
            put_dense(f"{prefix}.t_output.dense", node["t_ffn"]["output"])
            put_ln(f"{prefix}.t_output.LayerNorm", node["t_ffn"]["output_ln"])

    put_dense(f"{bert}.t_pooler.dense", enc["t_pooler"]["dense"])
    put_dense(f"{bert}.v_pooler.dense", enc["v_pooler"]["dense"])

    heads = p["cls"]
    put_dense(f"{cls}.predictions.transform.dense",
              heads["transform"]["dense"])
    put_ln(f"{cls}.predictions.transform.LayerNorm", heads["transform"]["ln"])
    sd[f"{cls}.predictions.bias"] = np.asarray(heads["mlm_bias"]).astype(dtype)
    word = np.asarray(
        enc["embeddings"]["word_embeddings"]["embedding"]).astype(dtype)
    sd[f"{cls}.predictions.decoder.weight"] = word  # tied
    put_dense(f"{cls}.bi_seq_relationship", heads["bi_seq_relationship"])
    put_dense(f"{cls}.imagePredictions.transform.dense",
              heads["img_transform"]["dense"])
    put_ln(f"{cls}.imagePredictions.transform.LayerNorm",
           heads["img_transform"]["ln"])
    put_dense(f"{cls}.imagePredictions.decoder", heads["img_decoder"])

    if with_decoder and "decoder" in p:
        dec = p["decoder"]
        dbert = "decoder.decoder.bert"
        # tied embeddings appear under the decoder prefix too
        for name in ("word_embeddings", "position_embeddings",
                     "token_type_embeddings",
                     "token_type_embeddings_extension"):
            sd[f"{dbert}.embeddings.{name}.weight"] = np.asarray(
                enc["embeddings"][name]["embedding"]).astype(dtype)
        sd[f"{dbert}.embeddings.sep_embeddings.weight"] = np.asarray(
            enc["embeddings"]["sep_embeddings"]).astype(dtype)
        put_ln(f"{dbert}.embeddings.LayerNorm", enc["embeddings"]["ln"])
        for name, node in dec.items():
            m = re.fullmatch(r"layer_(\d+)", name)
            if not m:
                continue
            prefix = f"{dbert}.encoder.layer.{m.group(1)}"
            put_qkv(f"{prefix}.attention.self", node["qkv"])
            put_dense(f"{prefix}.attention.output.dense", node["self_out"])
            put_ln(f"{prefix}.attention.output.LayerNorm", node["self_ln"])
            put_dense(f"{prefix}.crossattention.self.query", node["cross_q"])
            put_qkv(f"{prefix}.crossattention.self", node["cross_kv"],
                    ("key", "value"))
            put_dense(f"{prefix}.crossattention.output.dense",
                      node["cross_out"])
            put_ln(f"{prefix}.crossattention.output.LayerNorm",
                   node["cross_ln"])
            put_dense(f"{prefix}.intermediate.dense", node["intermediate"])
            put_dense(f"{prefix}.output.dense", node["output"])
            put_ln(f"{prefix}.output.LayerNorm", node["output_ln"])
        sd["decoder.decoder.lm_head.decoder.weight"] = np.asarray(
            dec["lm_weight"]).astype(dtype)
        sd["decoder.decoder.lm_head.bias"] = np.asarray(
            dec["lm_bias"]).astype(dtype)
        sd["decoder.decoder.lm_head.decoder.bias"] = np.asarray(
            dec["lm_bias"]).astype(dtype)
        put_dense("vlfusion.fc_l", p["fusion_fc_l"])
        put_dense("vlfusion.fc_v", p["fusion_fc_v"])

    return sd
