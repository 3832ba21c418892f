"""gstx — TPU-native generative self-training for Visual Dialog.

A from-scratch JAX/Flax/Pallas/pjit framework with the capabilities of
gicheonkang/gst-visdial (CVPR 2023, "The Dialog Must Go On"): the ViLBERT-style
two-stream co-attention encoder, the cross-attention BERT decoder, the
questioner/teacher synthetic-dialog engine with perplexity-based data
selection, generative & discriminative training and evaluation, adversarial
robustness evaluation, and the supporting data plumbing.

Layout (see SURVEY.md §7):
    core/           configs, device mesh, checkpointing, logging
    models/         Flax model core (embeddings, two-stream encoder, decoder)
    ops/            sampling / decoding ops (top-k/p, n-gram blocking)
    kernels/        Pallas TPU kernels (fused co-attention, flash attention)
    decode/         jitted KV-cached sampler + dialog generation engine
    data/           tokenizer, feature store, dataset pipelines
    train/          optimizers, pjit train steps
    eval/           metrics, ranking evaluators, attacks
    cli/            command-line entry points mirroring the reference scripts
    preprocessing/  offline dataset preparation
"""

__version__ = "0.1.0"
