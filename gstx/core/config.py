"""Typed configuration for the gstx framework.

Replaces the reference's dynamic ``BertConfig`` (reference
``models/vilbert_dialog.py:131-274``), the two model-config JSONs
(``config/bert_base_6layer_6conect_{enc,dec}.json``) and the ~45-flag argparse
surface (``options.py:7-106``) with frozen dataclasses.  The JSON files of the
reference remain loadable via :meth:`EncoderConfig.from_json` /
:meth:`DecoderConfig.from_json` so existing config assets keep working.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple


def _load_json(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


@dataclass(frozen=True)
class EncoderConfig:
    """Two-stream ViLBERT encoder configuration.

    Field semantics match the reference encoder config
    (``config/bert_base_6layer_6conect_enc.json``) plus the defaults filled in
    by ``BertConfig.__init__`` (reference ``models/vilbert_dialog.py:135-168``).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.3
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    type_vocab_extension: int = 10  # extra segment table, vilbert_dialog.py:315
    sep_vocab_size: int = 50  # sep_embeddings table (ckpt-present), :317
    initializer_range: float = 0.02

    # visual stream
    v_feature_size: int = 2048
    v_target_size: int = 1601
    v_hidden_size: int = 1024
    v_num_hidden_layers: int = 6
    v_num_attention_heads: int = 8
    v_intermediate_size: int = 1024
    v_attention_probs_dropout_prob: float = 0.1
    v_hidden_act: str = "gelu"
    v_hidden_dropout_prob: float = 0.3
    v_initializer_range: float = 0.02
    v_loc_size: int = 5  # normalized box + area, image_features_reader.py:130-141

    # co-attention
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 8
    bi_intermediate_size: int = 1024
    v_biattention_id: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    t_biattention_id: Tuple[int, ...] = (6, 7, 8, 9, 10, 11)
    with_coattention: bool = True
    fixed_t_layer: int = 0
    fixed_v_layer: int = 0

    # heads
    fusion_method: str = "mul"  # pooled fusion, vilbert_dialog.py:1030-1035
    predict_feature: bool = False

    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def v_head_dim(self) -> int:
        return self.v_hidden_size // self.v_num_attention_heads

    @property
    def bi_head_dim(self) -> int:
        return self.bi_hidden_size // self.bi_num_attention_heads

    @classmethod
    def from_json(cls, path: str) -> "EncoderConfig":
        raw = _load_json(path)
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in names}
        for key in ("v_biattention_id", "t_biattention_id"):
            if key in kwargs:
                kwargs[key] = tuple(kwargs[key])
        return cls(**kwargs)


@dataclass(frozen=True)
class DecoderConfig:
    """Causal decoder with cross-attention.

    Matches ``config/bert_base_6layer_6conect_dec.json`` (BertGeneration-style
    decoder, reference ``models/visual_dialog_decoder.py:116-323``).
    """

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.3
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    add_cross_attention: bool = True
    is_decoder: bool = True
    layer_norm_eps: float = 1e-12
    bos_token_id: int = 101
    eos_token_id: int = 102
    pad_token_id: int = 0
    decoder_start_token_id: int = 101

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_json(cls, path: str) -> "DecoderConfig":
        raw = _load_json(path)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in names})


# Token ids of bert-base-uncased specials; fixed by the WordPiece vocab the
# reference uses everywhere (dataloader_visdial_gen.py:62-63).
PAD_ID = 0
UNK_ID = 100
CLS_ID = 101
SEP_ID = 102
MASK_ID = 103
SPECIAL_TOKEN_IDS = (PAD_ID, UNK_ID, CLS_ID, SEP_ID, MASK_ID)


@dataclass(frozen=True)
class GSTConfig:
    """Full run configuration: every flag of the reference ``options.py``
    (reference ``options.py:7-106``) plus TPU-specific knobs."""

    # --- data input (VisDial), options.py:12-41 ---
    visdial_processed_train: str = "data/visdial/visdial_1.0_train_processed.json"
    visdial_processed_val: str = "data/visdial/visdial_1.0_val_processed.json"
    visdial_processed_test: str = "data/visdial/visdial_1.0_test_processed.json"
    visdial_processed_train_09: str = "data/visdial/visdial_0.9_train_processed.json"
    visdial_processed_val_09: str = "data/visdial/visdial_0.9_val_processed.json"
    visdial_image_feats: str = "data/visdial/visdial_img_feat.store"
    visdial_processed_train_dense: str = "data/visdial/visdial_1.0_train_dense_processed.json"
    train_dense: bool = False
    visdial_processed_val_dense_annotations: str = (
        "data/visdial/visdial_1.0_val_dense_annotations_processed.json"
    )
    visdial_processed_val_coref_dependency: str = (
        "data/visdial/visdial_1.0_val_coref_dependency.json"
    )
    cos_sim_counter_fitting: str = "data/visdial/cos_sim_counter_fitting.npy"
    cos_sim_idx2word: str = "data/visdial/cos_sim_idx2word.pickle"
    cos_sim_word2idx: str = "data/visdial/cos_sim_word2idx.pickle"
    # independent attacker MLM for the random_token attack (the reference's
    # BertForMaskedLM('bert-base-uncased'), text_attack.py:19-27); empty ->
    # fall back to the dialog model's own MLM head
    mlm_path: str = ""
    start_path: str = ""
    start_path_q: str = ""
    start_path_a: str = ""
    model_enc_config: str = ""
    model_dec_config: str = ""
    vocab_path: str = "data/vocab/bert-base-uncased-vocab.txt"

    # --- data input (CC12M), options.py:44-50 ---
    cc12m_processed_train: str = "data/cc12m/dialogs/"
    cc12m_image_feats: str = "data/cc12m/features/"
    cc12m_caption: str = ""
    url_to_cap: str = "data/url_to_cap.json"  # generate.py:87
    image_id_to_url: str = "data/image_id_to_url.json"  # generate.py:88
    chunk: str = ""
    threshold: int = 50  # ppl data-selection threshold, options.py:50

    # --- training / mode, options.py:54-92 ---
    vd_version: str = "1.0"  # {'1.0', '0.9'}
    mode: str = "vd_train"  # {vd_train, vd_eval_val, vd_eval_test, vd_gen_val, cc12m_gen, cc12m_train}
    model: str = "enc_dec_a"  # {enc_only_a, enc_dec_a, enc_dec_q}
    iter: int = 1
    num_workers: int = 8
    batch_size: int = 72
    num_epochs: int = 100
    batch_multiply: int = 1
    save_every_steps: int = 0  # >0: rotating mid-epoch step checkpoint
    # ({mode}_step.ckpt; the disc trainer uses {mode}_disc_step.ckpt so a
    # shared save_path cannot clobber) every N iterations; resume
    # with -start_path <ckpt> -continue is EXACT (per-step fold_in rng +
    # per-(epoch,index) loader item seeds replay the identical stream) —
    # the reference loses everything since the last epoch boundary
    # (train_gen.py:345-357)
    select_data: bool = False
    lr: float = 2e-5
    image_lr: float = 2e-5
    min_lr: float = 1e-5
    overfit: bool = False
    continue_training: bool = False  # '-continue'
    num_train_samples: int = 0
    num_val_samples: int = 0
    num_options: int = 100
    sequences_per_image: int = 1
    visdial_tot_rounds: int = 11
    max_seq_len: int = 256
    max_utt_len: int = 25
    num_negative_samples: int = 1
    lm_loss_coeff: float = 1.0
    nsp_loss_coeff: float = 1.0
    img_loss_coeff: float = 1.0
    mask_prob: float = 0.15
    attack: str = "fgsm"  # {fgsm, random_token, coreference}
    save_path: str = "checkpoints/"
    save_name: str = ""

    # --- decode defaults (generate.py:138-141,177-180; visual_dialog_model.py:77) ---
    max_dec_len: int = 18
    temperature: float = 0.7
    top_k: int = 7
    top_p: float = 0.0
    ngram_blocking_size: int = 4
    num_dialog_rounds: int = 10
    max_regions: int = 37
    quantize_memory: bool = False  # int8 cross-attention decode memory
    # (bf16 engines only; +24% isolated decode, measured -5% in-engine on
    # the XLA round program — see PERF.md opt 7 / the pallas decode kernel)
    dynamic_buckets: bool = False  # pick context buckets from ACTUAL batch
    # lengths each round (one host sync/round; wins when utterances are
    # short, i.e. trained checkpoints) instead of the worst-case schedule
    context_buckets: str = ""  # e.g. "128,192": smaller context widths for
    # early dialog rounds (exact math, lower encoder cost)

    # --- TPU-specific ---
    dtype: str = "bfloat16"  # activation dtype on TPU; use float32 for parity
    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1
    warmup_steps: int = 1500  # train_gen.py:180 (disc uses 10000, train_disc.py:146)
    distributed: bool = False  # multi-host: jax.distributed over DCN
    # per-layer jax.checkpoint in the TRAINING forward (trades ~30% extra
    # FLOPs for the f32 attention-score memory; reference batch 72 does not
    # fit a 16 GB chip without it).  Decode/eval paths never remat.
    remat: bool = True
    remat_policy: str = "small"  # what jax.checkpoint saves across the
    # training forward (models/layers.py::checkpoint_policy):
    # 'small' (default) saves ONLY the tagged small activations (QKV
    # projections, attention contexts, residual block outputs) and
    # recomputes the [B,H,S,S] scores/probs + FFN hidden in the backward —
    # measured +6.5% examples/s over 'full' at the production batch-72
    # step (412 vs 441 ms/step, two repeats each, PERF.md round 5), bit-
    # identical numerics (tests/test_train.py::test_remat_policy_identity).
    # 'full' saves only layer inputs (minimum memory, recomputes the whole
    # layer) — the fallback when a larger-than-reference config needs the
    # memory headroom.
    # 'dots' additionally saves the weight-matmul outputs so the backward
    # skips re-running the MXU work while the [B,H,S,S] attention scores
    # are still recomputed: measured 4% slower than 'full' on v5e (441 vs
    # 460 ms/step, PERF.md round 4) — the extra live memory costs XLA
    # scheduling room.
    seed: int = 0
    log_every: int = 10
    use_pallas: bool = True  # fused pallas FFN/LN epilogue kernels (TPU bf16)
    trace_dir: str = ""  # capture a jax.profiler device trace of the run
    # (train/generate loops) into this dir, viewable in TensorBoard/XProf
    pipeline: int = 2  # generate: batches in flight (async dispatch while
    # the previous batch's results transfer/decode; depths 1/2/3 measured
    # 12,177/12,175/12,149 tok/s/chip — device-bound, 2 covers host syncs)
    flush_every: int = 20  # generate: append completed batches to a
    # <out>.partial.jsonl sidecar every N batches so a preempted chunk run
    # (the reference dumps JSON only at the very end, generate.py:258 —
    # ~65 min of work per 120k-image chunk shard) can resume instead of
    # restarting; 0 disables the sidecar (reference behavior)
    resume_generation: bool = True  # generate: when a sidecar whose meta
    # matches this run exists, splice its completed batches and continue
    # from the first unfinished batch (per-batch rng is fold_in(seed, idx),
    # so resumed token streams == uninterrupted ones)
    fused_sampler: bool = True  # decode: fused top-k extract + categorical
    # over the k candidates instead of full-vocab filter + [B,V] gumbel draw
    # (ops/sampling.py::sample_token_topk); same distribution, different rng
    # consumption -> different sampled tokens, so it is part of the
    # generation sidecar identity.  Default ON after two same-session engine
    # A/Bs (+1.9%/+0.9%, PERF.md round 4); '-no_fused_sampler' restores the
    # reference-shaped filter-then-sample chain (which also keeps >k
    # candidates on exact k-th-value ties — measure-zero with f32 logits)
    host_prefetch: bool = True  # generate: prepare batch i+1 (pad, host
    # bf16 cast, device_put with the data-axis sharding) on a background
    # thread while batch i's rounds run, so the feature upload overlaps
    # device compute instead of serializing with dispatch; '-no_host_prefetch'
    # restores the in-line path (the A/B lever for PERF.md round 4)

    def encoder_config(self) -> EncoderConfig:
        if self.model_enc_config:
            return EncoderConfig.from_json(self.model_enc_config)
        return EncoderConfig()

    def decoder_config(self) -> DecoderConfig:
        if self.model_dec_config:
            return DecoderConfig.from_json(self.model_dec_config)
        return DecoderConfig()

    def replace(self, **kw) -> "GSTConfig":
        return dataclasses.replace(self, **kw)

    def context_bucket_tuple(self):
        if not self.context_buckets:
            return ()
        return tuple(int(x) for x in self.context_buckets.split(",") if x)


def add_config_args(parser, cls=GSTConfig):
    """Expose every GSTConfig field as a '-flag' (single-dash, like the
    reference options.py) on an argparse parser.

    Boolean fields get a PAIR of switches: ``-X`` (sets True, the reference
    options.py:27-70 surface) and ``-no_X`` (sets False) — so default-True
    fields like ``remat``/``use_pallas`` are controllable from every CLI.
    ``-continue`` is an explicit alias for ``-continue_training``
    (reference options.py:70), not an argparse prefix accident.
    """
    for f in dataclasses.fields(cls):
        name = "-" + f.name
        is_bool = f.type in ("bool", bool) or isinstance(f.default, bool)
        if is_bool:
            parser.add_argument(name, dest=f.name, action="store_true")
            parser.add_argument("-no_" + f.name, dest=f.name,
                                action="store_false")
            parser.set_defaults(**{f.name: f.default})
        else:
            ftype = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            if isinstance(f.default, int):
                parser.add_argument(name, type=int, default=f.default)
            elif isinstance(f.default, float):
                parser.add_argument(name, type=float, default=f.default)
            else:
                parser.add_argument(name, type=ftype, default=f.default)
    if any(f.name == "continue_training" for f in dataclasses.fields(cls)):
        parser.add_argument("-continue", dest="continue_training",
                            action="store_true")
    return parser


def config_from_args(args, cls=GSTConfig) -> GSTConfig:
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in vars(args).items() if k in names})
