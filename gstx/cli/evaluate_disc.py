"""CLI: discriminative ranking evaluation (reference ``evaluate_disc.py``).
Candidate score = NSP softmax probability of the is-next class."""

from __future__ import annotations

import json
import os
import pprint


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
from gstx.data.visdial import VisdialDiscDataset
from gstx.eval.rank_disc import evaluate_disc


def main(argv=None, max_batches=None, chunk_size=200):
    config = parse_config(argv, "gstx discriminative evaluation")
    pprint.pprint(config)
    assert config.mode in ("vd_eval_val", "vd_eval_test")
    assert config.model == "enc_only_a"
    assert config.start_path != ""
    enable_compile_cache()
    apply_runtime_flags(config)  # -distributed init BEFORE process queries
    from gstx.cli.common import primary_process_only

    if not primary_process_only():
        return None
    os.makedirs(config.save_path, exist_ok=True)

    eval_batch_size = 20 if config.vd_version == "1.0" else 25
    save_name = config.save_name or "performance_log.txt"
    logger = Logger(os.path.join(config.save_path, save_name))

    tokenizer = build_tokenizer(config)
    dataset = VisdialDiscDataset(config, tokenizer, mode=config.mode)
    model, enc_cfg, dec_cfg = build_model(config, use_decoder=False)
    params = load_params(model, config, config.start_path)

    loader = DataLoader(dataset, batch_size=eval_batch_size, shuffle=False,
                        drop_last=False, num_workers=config.num_workers)

    def batches():
        for i, b in enumerate(loader.epoch(0)):
            if max_batches is not None and i >= max_batches:
                return
            yield b

    # ('data','model') mesh: chunks shard over 'data' (chunk padding makes
    # any dp work), -model_parallel > 1 places params Megatron-TP
    from gstx.cli.common import make_generation_mesh

    mesh = make_generation_mesh(config, enc_only=True)
    result = evaluate_disc(model, params, batches(), mode=config.mode,
                           vd_version=config.vd_version,
                           chunk_size=chunk_size, logger=logger, mesh=mesh)
    if config.mode == "vd_eval_test":
        json.dump(result, open(
            os.path.join(config.save_path, "predictions.txt"), "w"))
    return result


if __name__ == "__main__":
    main()
