"""CLI: interactive demo (reference ``inference.py:79-186``).

REPL: shows a VisDial val image's caption, the user types questions, the
answerer model decodes replies; the context grows exactly like the dialog
engine (question appended with segment 0, answer with segment 1)."""

from __future__ import annotations

import pprint

import jax
import jax.numpy as jnp
import numpy as np

from gstx.cli.common import (
    apply_runtime_flags,
    build_model,
    build_tokenizer,
    enable_compile_cache,
    load_params,
    parse_config,
)
from gstx.core.config import CLS_ID, PAD_ID, SEP_ID
from gstx.data.visdial import VisdialGenDataset
from gstx.decode.dialog_engine import DialogState, append_utterance
from gstx.decode.sampler import DecodeSettings, init_cache, sample_sequence
from gstx.models.encdec import GSTVisualDialog


def main(argv=None, input_fn=input, output_fn=print, max_turns=None):
    config = parse_config(argv, "gstx interactive demo")
    config = config.replace(mode="vd_gen_val")
    pprint.pprint(config)
    assert config.start_path != "", "need -start_path (answerer checkpoint)"
    enable_compile_cache()
    apply_runtime_flags(config)

    tokenizer = build_tokenizer(config)
    dataset = VisdialGenDataset(config, tokenizer, mode="vd_gen_val")
    # mesh stand-in for the reference's DataParallel wrap (inference.py:64).
    # The REPL decodes a single dialog (batch 1), so the data axis buys
    # nothing — the mesh matters for -model_parallel > 1, which places the
    # params Megatron-TP so configs larger than one chip's HBM still serve.
    from gstx.cli.common import make_generation_mesh
    from gstx.kernels.ffn import set_tensor_parallel_from_mesh

    mesh = make_generation_mesh(config)
    set_tensor_parallel_from_mesh(mesh)
    model, enc_cfg, dec_cfg = build_model(config, mesh=mesh)
    params = load_params(model, config, config.start_path)
    if mesh is not None:
        from gstx.core.mesh import shard_by_path

        params = shard_by_path(mesh, params)
    settings = DecodeSettings(
        max_steps=config.max_dec_len, temperature=config.temperature,
        top_k=config.top_k, top_p=config.top_p, ngram_blocking_size=0,
        fused_sampler=config.fused_sampler)

    item = dataset.__getitem__(0, seed=0)
    output_fn(f"image_id: {int(item['image_id'][0])}")
    output_fn("caption: " + tokenizer.decode(
        [int(t) for t in item["enc_input_ids"]], skip_special_tokens=True))

    state = DialogState(
        enc_input_ids=jnp.asarray(item["enc_input_ids"])[None].astype(
            jnp.int32),
        enc_segments=jnp.asarray(item["enc_segments"])[None].astype(
            jnp.int32),
        enc_len=jnp.asarray(
            [(item["enc_input_ids"] != PAD_ID).sum()], jnp.int32),
        abnormal=jnp.zeros((1,), bool),
    )
    image = {
        "feat": jnp.asarray(item["enc_image_feat"])[None],
        "loc": jnp.asarray(item["enc_image_loc"])[None],
        "mask": jnp.asarray(item["enc_image_mask"])[None],
    }

    @jax.jit
    def answer(params, state, rng):
        att = (state.enc_input_ids != PAD_ID).astype(jnp.int32)
        mem_kv, mem_mask = model.apply(
            params, state.enc_input_ids, image["feat"], image["loc"],
            state.enc_segments, att, image["mask"],
            method=GSTVisualDialog.decode_prepare)

        def step_fn(tok, pos, caches):
            return model.apply(params, tok, pos, caches, mem_kv, mem_mask,
                               method=GSTVisualDialog.decode_step)

        caches = init_cache(dec_cfg, 1, settings.max_steps + 1)
        return sample_sequence(step_fn, rng, 1, caches, settings,
                               bos_id=CLS_ID, eos_id=SEP_ID)

    rng = jax.random.PRNGKey(config.seed)
    turns = 0
    while True:
        try:
            line = input_fn("you: ")
        except EOFError:
            break
        if not line or line.strip() in ("quit", "exit"):
            break
        q_cap = min(config.max_utt_len - 2, config.max_dec_len - 1)
        q_ids = tokenizer.encode(line.strip())[:q_cap]
        q = np.zeros((1, config.max_dec_len), np.int32)
        q[0, : len(q_ids)] = q_ids
        q[0, len(q_ids)] = SEP_ID
        q_len = jnp.asarray([len(q_ids) + 1], jnp.int32)
        state, _ = append_utterance(state, jnp.asarray(q), q_len,
                                    segment=0, write_segments=False)
        rng, key = jax.random.split(rng)
        ans = answer(params, state, key)
        txt = tokenizer.decode([int(t) for t in np.asarray(ans)[0]],
                               skip_special_tokens=True)
        output_fn(f"bot: {txt}")
        ans_wo_eos = jnp.where(ans == SEP_ID, PAD_ID, ans)
        a_len = (ans_wo_eos != PAD_ID).sum(-1).astype(jnp.int32)
        state, _ = append_utterance(state, ans_wo_eos, a_len,
                                    segment=1, write_segments=True)
        if bool(state.abnormal[0]):
            output_fn("[context full — restarting would be needed]")
            break
        turns += 1
        if max_turns is not None and turns >= max_turns:
            break


if __name__ == "__main__":
    main()
