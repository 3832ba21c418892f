"""CLI: adversarial robustness evaluation (reference
``evaluate_gen_attack.py``): -attack {fgsm, random_token, coreference}."""

from __future__ import annotations

import json
import os
import pickle
import pprint

import numpy as np

from gstx.cli.common import (
    apply_runtime_flags,
    build_model,
    build_tokenizer,
    enable_compile_cache,
    load_params,
    parse_config,
)
from gstx.core.logging import Logger
from gstx.data.loader import DataLoader
from gstx.data.visdial import VisdialGenDataset
from gstx.eval.attack_eval import evaluate_attack
from gstx.eval.attacks import TextAttack, make_mlm_fill


def main(argv=None, max_batches=None):
    config = parse_config(argv, "gstx attack evaluation")
    pprint.pprint(config)
    assert config.mode == "vd_eval_val"
    assert config.start_path != ""
    enable_compile_cache()
    apply_runtime_flags(config)  # -distributed init BEFORE process queries
    from gstx.cli.common import primary_process_only

    if not primary_process_only():
        return None
    os.makedirs(config.save_path, exist_ok=True)

    # batch size 1 for v1.0 (evaluate_gen_attack.py:378)
    eval_batch_size = 1 if config.vd_version == "1.0" else 25
    save_name = config.save_name or "performance_log.txt"
    logger = Logger(os.path.join(config.save_path, save_name))

    tokenizer = build_tokenizer(config)
    dataset = VisdialGenDataset(config, tokenizer, mode="vd_eval_val")
    if config.attack == "random_token":
        # the dataset masks history tokens with mask_prob in attack mode
        dataset.attack_mode = True
    model, enc_cfg, dec_cfg = build_model(config)
    params = load_params(model, config, config.start_path)

    text_attack = None
    coref_dependency = None
    if config.attack in ("random_token", "coreference"):
        cos_sim = cos_idx2word = cos_word2idx = None
        if os.path.exists(config.cos_sim_counter_fitting):
            cos_sim = np.load(config.cos_sim_counter_fitting)
            cos_idx2word = pickle.load(open(config.cos_sim_idx2word, "rb"))
            cos_word2idx = pickle.load(open(config.cos_sim_word2idx, "rb"))
        if config.mlm_path:
            # independent attacker MLM (reference text_attack.py:19-27:
            # a separately-trained BertForMaskedLM, NOT the victim's head)
            from gstx.models.mlm import load_mlm_attacker, \
                make_standalone_mlm_fill

            mlm_model, mlm_params = load_mlm_attacker(config.mlm_path)
            mlm_fill = make_standalone_mlm_fill(mlm_model, mlm_params)
        else:
            # self-contained fallback: the dialog model's own MLM head
            mlm_fill = make_mlm_fill(model, params)
        text_attack = TextAttack(
            tokenizer, cos_sim, cos_idx2word, cos_word2idx,
            mlm_fill=mlm_fill,
            max_seq_len=config.max_seq_len)
        if config.attack == "coreference":
            coref_dependency = json.load(
                open(config.visdial_processed_val_coref_dependency))

    loader = DataLoader(dataset, batch_size=eval_batch_size, shuffle=False,
                        drop_last=False, num_workers=config.num_workers)

    def batches():
        for i, b in enumerate(loader.epoch(0)):
            if max_batches is not None and i >= max_batches:
                return
            yield b

    # the SPMD stand-in for the reference's DataParallel wrap
    # (evaluate_gen_attack.py:410): candidate chunks shard over 'data',
    # -model_parallel > 1 places params Megatron-TP
    from gstx.cli.common import make_generation_mesh

    mesh = make_generation_mesh(config)
    return evaluate_attack(
        model, params, batches(), config,
        coref_dependency=coref_dependency, text_attack=text_attack,
        chunk_size=config.num_options, logger=logger, mesh=mesh)


if __name__ == "__main__":
    main()
