"""Shared CLI plumbing: flag parsing (same '-flag' surface as the reference
``options.py``), tokenizer/model/checkpoint construction."""

from __future__ import annotations

import argparse
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp

from gstx.core import checkpoint as ckpt_lib
from gstx.core.config import DecoderConfig, EncoderConfig, GSTConfig, \
    add_config_args, config_from_args
# re-exported for the CLIs; the implementation lives with the other mesh
# utilities (shared by the eval chunk loops)
from gstx.core.mesh import pad_batch_rows  # noqa: F401
from gstx.data.tokenizer import BertTokenizer
from gstx.models.encdec import GSTVisualDialog


def _check_choice(name, value, choices):
    if value not in choices:
        raise SystemExit(
            f"error: -{name} must be one of {list(choices)}, got {value!r}")


def configure_platform():
    """Honor GSTX_PLATFORM / GSTX_NUM_CPU_DEVICES env vars in subprocess
    stages (the selftrain orchestrator's children, tests).  This sandbox's
    sitecustomize ignores JAX_PLATFORMS, but jax.config.update before first
    device use still wins; a no-op once a backend is already initialized."""
    platform = os.environ.get("GSTX_PLATFORM")
    if not platform:
        return
    if platform == "cpu":
        # multi-virtual-device CPU collectives die on XLA's 40 s rendezvous
        # watchdog under host load — relax it before backend init
        from gstx.core.mesh import relax_cpu_collective_timeouts

        relax_cpu_collective_timeouts()
    try:
        jax.config.update("jax_platforms", platform)
        n = os.environ.get("GSTX_NUM_CPU_DEVICES")
        if platform == "cpu" and n:
            jax.config.update("jax_num_cpu_devices", int(n))
    except Exception:
        pass  # backend already in use — leave it


def parse_config(argv=None, description: str = "gstx") -> GSTConfig:
    configure_platform()
    parser = argparse.ArgumentParser(description=description)
    add_config_args(parser)
    cfg = config_from_args(parser.parse_args(argv))
    # choice validation (the reference's argparse choices, options.py:54-56,85)
    _check_choice("vd_version", cfg.vd_version, ("1.0", "0.9"))
    _check_choice("mode", cfg.mode,
                  ("vd_train", "vd_eval_val", "vd_eval_test", "vd_gen_val",
                   "cc12m_gen", "cc12m_train"))
    _check_choice("model", cfg.model,
                  ("enc_only_a", "enc_dec_a", "enc_dec_q"))
    _check_choice("attack", cfg.attack,
                  ("fgsm", "random_token", "coreference"))
    if cfg.save_path == "checkpoints/":
        # timestamped default save path (options.py:94-98)
        stamp = time.strftime("%d-%b-%y-%X-%a", time.gmtime())
        cfg = cfg.replace(save_path=os.path.join(cfg.save_path, stamp))
    assert cfg.sequences_per_image <= 8
    assert cfg.visdial_tot_rounds <= 11
    return cfg


def enable_compile_cache():
    """Persistent compile cache; GSTX_COMPILE_CACHE overrides the location.

    The override exists because CPU AOT artifacts are machine-feature
    -fingerprinted: a cache dir carried across machines (or across runtime
    environments that detect CPU features differently) can serve stale
    artifacts whose load SIGILLs the process (observed: intermittent
    native crashes in subprocess stages; XLA warns 'machine type used for
    compilation doesn't match'). Tests point subprocess stages at a fresh
    per-run directory."""
    cache = os.environ.get("GSTX_COMPILE_CACHE",
                           os.path.join(os.getcwd(), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def apply_runtime_flags(config):
    """Honor runtime feature flags.  Called before any device use, so
    -distributed can still initialize jax.distributed."""
    if config.distributed:
        from gstx.core.mesh import init_distributed

        init_distributed()
    if config.use_pallas:
        # fused FFN / projection+LN epilogue kernels: measured wins over XLA
        # at production shapes (PERF.md round 2).  The whole-block attention
        # kernel (gstx.kernels.attention) stays off — XLA's fused attention
        # beats it and upstream flash_attention at S<=256 (scripts/attn_bench).
        from gstx.kernels import ffn as pf

        pf.enable(True)


def build_tokenizer(config: GSTConfig) -> BertTokenizer:
    return BertTokenizer(vocab_path=config.vocab_path)


def primary_process_only(what: str = "evaluation") -> bool:
    """True when this process should run a single-host workload.

    The evaluator CLIs mesh over LOCAL devices only (the val set is ~2k
    images — cross-host eval is not worth DCN coordination), so under a
    jax.distributed launch the non-zero processes would duplicate the
    whole computation and race on the shared output files.  They log and
    skip instead; process 0's local-mesh programs never touch other
    hosts' devices, so skipping is collective-safe."""
    if jax.process_count() > 1 and jax.process_index() != 0:
        print(f"[gstx] {what} is single-host: process "
              f"{jax.process_index()} idle (process 0 computes)")
        return False
    return True


def build_model(config: GSTConfig, use_decoder: bool = True,
                remat: bool = False, mesh=None
                ) -> Tuple[GSTVisualDialog, EncoderConfig, DecoderConfig]:
    enc_cfg = config.encoder_config()
    dec_cfg = config.decoder_config()
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    model = GSTVisualDialog(enc_cfg, dec_cfg, use_decoder=use_decoder,
                            dtype=dtype, remat=remat,
                            remat_policy=config.remat_policy, mesh=mesh)
    return model, enc_cfg, dec_cfg


def make_generation_mesh(config: GSTConfig, enc_only: bool = False):
    """Device mesh for the generation/eval/inference CLIs — the SPMD
    stand-in for the reference's DataParallel wrap (generate.py:67,77,
    evaluate_gen.py:181, evaluate_disc.py:167, evaluate_gen_attack.py:410,
    inference.py:64).

    Local-devices only: generation/eval is embarrassingly parallel over
    images, so multi-host runs stripe the DATASET per process (DataLoader
    process_index/process_count) and each host drives its own local mesh —
    no cross-host collectives, DCN stays idle.  Returns None when a single
    device is available or -data_parallel 1 forces it off.  ``enc_only``
    skips decoder-dimension validation (discriminative evaluator).

    Auto dp (-data_parallel -1) deliberately uses ALL local devices and
    lets callers pad partial batches rather than capping dp to a divisor
    of the batch/chunk size: ceil(B / n_dev) rows per device is <= B / d
    for every divisor d <= n_dev, so padding onto otherwise-idle devices
    never increases any device's work (e.g. chunk 100 on 8 devices: pad
    to 104 = 13 rows/device, vs divisor dp=5 = 20 rows/device)."""
    if config.data_parallel == 1 and config.model_parallel <= 1:
        return None
    local = jax.local_devices()
    if len(local) <= 1:
        return None
    from gstx.core.mesh import make_mesh, validate_model_parallel

    mp = max(1, config.model_parallel)
    if mp > 1:
        validate_model_parallel(
            config.encoder_config(),
            None if enc_only else config.decoder_config(), mp)
    dp = config.data_parallel
    if dp == -1:
        dp = len(local) // mp
    n = dp * mp
    if n < 1 or n > len(local):
        raise SystemExit(
            f"error: mesh {dp}x{mp} needs {n} devices, "
            f"have {len(local)} local")
    return make_mesh(dp, mp, devices=local[:n])




def init_params(model: GSTVisualDialog, config: GSTConfig, seed: int = 0):
    enc_cfg = model.enc_config
    b, l = 2, config.max_seq_len
    r, t = config.max_regions, config.max_utt_len
    init_batch = dict(
        input_ids=jnp.ones((b, l), jnp.int32),
        image_feat=jnp.ones((b, r, enc_cfg.v_feature_size)),
        image_loc=jnp.ones((b, r, enc_cfg.v_loc_size)),
        token_type_ids=jnp.zeros((b, l), jnp.int32),
        attention_mask=jnp.ones((b, l), jnp.int32),
        image_attention_mask=jnp.ones((b, r), jnp.int32),
        dec_input_ids=jnp.ones((b, t), jnp.int32),
        dec_attention_mask=jnp.ones((b, t), jnp.int32))
    return model.init(jax.random.PRNGKey(seed), **init_batch,
                      method=GSTVisualDialog.init_all)


def load_params(model: GSTVisualDialog, config: GSTConfig, path: str,
                seed: int = 0):
    """Load a checkpoint: orbax dir or reference torch .ckpt file."""
    if os.path.isdir(path):
        restored = ckpt_lib.restore_checkpoint(path)
        return restored["params"]
    # torch checkpoint: init a template tree, then overlay converted weights
    params = init_params(model, config, seed)
    sd = ckpt_lib.load_torch_checkpoint(path)
    enc_cfg, dec_cfg = model.enc_config, model.dec_config
    tree = ckpt_lib.convert_torch_state_dict(
        sd, enc_cfg.num_hidden_layers, enc_cfg.v_num_hidden_layers,
        len(enc_cfg.v_biattention_id), dec_cfg.num_hidden_layers)

    def merge(a, b):
        if isinstance(a, dict):
            return {k: merge(a[k], b[k]) if isinstance(b, dict) and k in b
                    else a[k] for k in a}
        return jnp.asarray(b)

    merged = merge(params["params"], tree)
    if "decoder" not in tree and "decoder" in merged:
        # encoder-only checkpoint: seed the LM projection from the loaded
        # word embeddings (reference pretrained-init semantics)
        word = merged["encoder"]["embeddings"]["word_embeddings"]["embedding"]
        if merged["decoder"]["lm_weight"].shape == word.shape:
            merged["decoder"] = dict(merged["decoder"],
                                     lm_weight=jnp.asarray(word))
    return {"params": merged}
