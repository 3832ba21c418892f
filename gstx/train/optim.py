"""Optimizer: AdamW with the reference's two learning-rate groups and
warmup-linear-nonzero schedule.

Reference semantics reproduced exactly:
  * ``WarmupLinearScheduleNonZero`` (``utils/optim_utils.py:8-26``): linear
    warmup then linear decay, FLOORED at min_lr=1e-5 — including during
    early warmup (the reference floors whenever base*factor < min_lr);
  * two LR groups (``train_gen.py:204-242``): parameters named in
    ``config/language_weights.json`` get ``lr``, everything else
    ``image_lr``.  That list contains the text-BERT subtree only, so the
    group rule becomes a path predicate: text embeddings, the 12 text-stream
    layers and the MLM head are "language"; visual stream, co-attention,
    poolers, NSP/image heads, fusion and the whole decoder are "image";
  * no weight decay for biases and LayerNorm parameters, 0.01 otherwise
    (``train_gen.py:204,217-225``), decay scaled by the group lr like torch
    AdamW;
  * the EXACT AdamW step of the reference's pinned pytorch-transformers
    1.2.0 (``requirements.txt``; ``pytorch_transformers/optimization.py``
    ``AdamW.step``): b1=0.9, b2=0.999, eps=1e-6, with its two signature
    quirks — eps is added to sqrt(v) BEFORE the bias correction is folded
    into the step size (``denom = exp_avg_sq.sqrt().add_(eps)``;
    ``step_size = lr * sqrt(1-b2^t)/(1-b1^t)``), and weight decay is
    applied AFTER the adam update to the already-updated parameters with
    the scheduled group lr (``p.data.add_(-lr * wd, p.data)``).  Both
    differ (second-order small) from ``optax.adamw``, which corrects m,v
    first and decays the pre-update parameters; pinned by a trajectory
    differential in ``tests/test_reference_data_parity.py``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def warmup_linear_nonzero(base_lr: float, warmup_steps: int, t_total: int,
                          min_lr: float = 1e-5) -> Callable:
    """optim_utils.py:19-26, including the min_lr floor on both sides."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (t_total - step) / jnp.maximum(1.0, t_total - warmup_steps))
        factor = jnp.where(step < warmup_steps, warm, decay)
        lr = base_lr * factor
        return jnp.where(lr > min_lr, lr, min_lr)

    return schedule


def _joined(path) -> str:
    return "/" + "/".join(getattr(k, "key", str(k)) for k in path) + "/"


def is_language_param(path) -> bool:
    """Group predicate replacing the language_weights.json name list
    (train_gen.py:205-215): text embeddings + text-stream layers + MLM head.
    Substring checks only, so the predicate is independent of the tree root
    (the optimizer sees paths rooted at the flax 'params' collection key).

    The NSP head stays in the image group on purpose: language_weights.json
    lists ``cls.seq_relationship`` but the model's actual parameter is
    ``cls.bi_seq_relationship`` (vilbert_dialog.py:1021), so the list entry
    matches nothing and the reference trains the NSP head at image_lr."""
    joined = _joined(path)
    if "/embeddings/" in joined:  # text embeddings (v_embeddings excluded)
        return True
    if "/encoder/layer_" in joined:  # text stream layers (not decoder/v_/c_)
        return True
    if "/cls/transform/" in joined or "/mlm_bias/" in joined:
        return True
    return False


def is_no_decay_param(path) -> bool:
    """No weight decay for any param whose torch name contains 'bias' or is
    a LayerNorm weight: the reference matches ``no_decay = ['bias',
    'LayerNorm.bias', 'LayerNorm.weight']`` by SUBSTRING (train_gen.py:204,
    217), so the vocab biases ``cls.predictions.bias`` / ``lm_head.bias``
    (gstx leaves ``mlm_bias`` / ``lm_bias``) are exempt too."""
    leaf = getattr(path[-1], "key", str(path[-1]))
    return leaf == "scale" or leaf.endswith("bias")


class _GroupScaleState(NamedTuple):
    count: jnp.ndarray


class _PTTAdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_ptt_adam(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-6) -> optax.GradientTransformation:
    """The adam core of pytorch-transformers 1.2.0 ``AdamW.step``: eps is
    added to the UNCORRECTED sqrt(v) and the bias correction is folded into
    the step size afterwards, i.e.

        u = m / (sqrt(v) + eps) * sqrt(1 - b2^t) / (1 - b1^t)

    (equivalently m_hat / (sqrt(v_hat) + eps/sqrt(1-b2^t)) — the effective
    eps starts ~32x larger at step 1 and decays to eps), unlike
    ``optax.scale_by_adam`` which corrects m and v first and adds eps to
    sqrt(v_hat)."""

    def init_fn(params):
        mu = jax.tree_util.tree_map(jnp.zeros_like, params)
        nu = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _PTTAdamState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, updates)
        t = state.count + 1
        tf = t.astype(jnp.float32)
        corr = jnp.sqrt(1.0 - b2 ** tf) / (1.0 - b1 ** tf)
        out = jax.tree_util.tree_map(
            lambda m, v: (corr * m / (jnp.sqrt(v) + eps)).astype(m.dtype),
            mu, nu)
        return out, _PTTAdamState(count=t, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(lang_lr: float, image_lr: float, warmup_steps: int,
                   t_total: int, min_lr: float = 1e-5,
                   weight_decay: float = 0.01, fixed_t_layer: int = 0,
                   fixed_v_layer: int = 0) -> optax.GradientTransformation:
    lang_sched = warmup_linear_nonzero(lang_lr, warmup_steps, t_total, min_lr)
    img_sched = warmup_linear_nonzero(image_lr, warmup_steps, t_total, min_lr)

    adam = scale_by_ptt_adam(b1=0.9, b2=0.999, eps=1e-6)

    def is_frozen(path):
        # fixed_t/v_layer prefixes run under stop_gradient
        # (two_stream.py, vilbert_dialog.py:839-858): their grads are exactly
        # zero, so adam contributes nothing — excluding them from weight
        # decay as well makes them fully static, matching torch AdamW which
        # skips grad-None params entirely.
        joined = _joined(path)
        return (
            any(f"/encoder/layer_{n}/" in joined
                for n in range(fixed_t_layer))
            or any(f"/encoder/v_layer_{n}/" in joined
                   for n in range(fixed_v_layer)))

    def init_fn(params):
        return _GroupScaleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("make_optimizer requires params at update()")
        lr_lang = lang_sched(state.count)
        lr_img = img_sched(state.count)

        def per_leaf(path, u, p):
            lr = (jnp.where(is_language_param(path), lr_lang, lr_img)
                  .astype(u.dtype))
            out = -lr * u
            # ptt 1.2.0 AdamW applies weight decay AFTER the adam update,
            # to the already-updated params, with the scheduled group lr
            # (optimization.py: p.data.add_(-group['lr'] * wd, p.data))
            if not (is_no_decay_param(path) or is_frozen(path)):
                out = out - lr * weight_decay * (p + out)
            return out

        new_updates = jax.tree_util.tree_map_with_path(
            per_leaf, updates, params)
        return new_updates, _GroupScaleState(count=state.count + 1)

    group_scale = optax.GradientTransformation(init_fn, update_fn)
    return optax.chain(adam, group_scale)


def optimizer_step_count(opt_state) -> int:
    """Current schedule step (for logging/resume): the chain's last element
    is the group-scale state."""
    s = opt_state[-1]
    assert isinstance(s, _GroupScaleState), type(s)
    return int(s.count)


def current_lrs(opt_state, lang_lr, image_lr, warmup_steps, t_total,
                min_lr=1e-5):
    step = optimizer_step_count(opt_state)
    return (
        float(warmup_linear_nonzero(lang_lr, warmup_steps, t_total,
                                    min_lr)(step)),
        float(warmup_linear_nonzero(image_lr, warmup_steps, t_total,
                                    min_lr)(step)),
    )
