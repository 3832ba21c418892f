"""CLI: generative training (teacher / questioner / student).
Mirrors reference ``train_gen.py`` (same flags via GSTConfig).

Usage:
    python -m gstx.cli.train_gen -mode vd_train -model enc_dec_a ...
    python -m gstx.cli.train_gen -mode cc12m_train -chunk 30 -iter 1 \
        -select_data ...
"""

from __future__ import annotations

import pprint

from gstx.cli.common import apply_runtime_flags, \
    build_tokenizer, enable_compile_cache, parse_config
from gstx.train.train_gen import train_gen


def main(argv=None, max_steps=None):
    config = parse_config(argv, "gstx generative training")
    pprint.pprint(config)
    assert config.mode in ("vd_train", "cc12m_train")
    assert config.model in ("enc_dec_a", "enc_dec_q")
    enable_compile_cache()
    apply_runtime_flags(config)

    tokenizer = build_tokenizer(config)
    if config.mode == "vd_train":
        from gstx.data.visdial import VisdialGenDataset

        dataset = VisdialGenDataset(config, tokenizer, mode="vd_train")
    else:
        from gstx.data.cc12m import load_cc12m_chunks

        dataset = load_cc12m_chunks(config, tokenizer)
    num_iter_epoch = max(1, len(dataset) // config.batch_size)
    return train_gen(config, dataset, num_iter_epoch, max_steps=max_steps)


if __name__ == "__main__":
    main()
