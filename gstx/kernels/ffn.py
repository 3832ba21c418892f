"""Pallas TPU fused feed-forward / projection epilogue kernels.

The encoder's per-layer cost at production shapes ([B=96, S<=256, D=768]) is
dominated not by matmul FLOPs (XLA runs those at ~92% of MXU peak) but by
HBM round-trips between them: the [M, 3072] FFN intermediate is written,
re-read by the erf-GELU pass, re-written, and re-read by the second matmul;
bias/residual/LayerNorm each add another pass over [M, 768].

These kernels fuse each matmul with its epilogue so intermediates never
leave VMEM:

  * :func:`fused_ffn`       — LN(x + W2 @ gelu(W1 @ x + b1) + b2)
                              (reference BertIntermediate + BertOutput,
                              vilbert_dialog.py:434-462, exact-erf GELU)
  * :func:`fused_dense_ln`  — LN(residual + W @ x + b)
                              (reference BertSelfOutput, vilbert_dialog.py:405-419)

Both grid over row-blocks of the flattened [M, D] input; the weights use a
constant index map so Mosaic keeps them resident in VMEM across grid steps.
Numerics: matmuls accumulate in f32 on the MXU; GELU and LayerNorm
(eps inside sqrt, TF-style) run in f32; outputs cast back to the activation
dtype.  This matches the jnp path (gstx/models/layers.py::FeedForward /
SelfAttention) to bf16 rounding; the f32/CPU paths keep using jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_ENABLED = False

# VMEM budget for resident weights + intermediate (bytes).  The text-stream
# FFN (768x3072, ~9 MB bf16 + 3 MB f32 intermediate at block_m=256) fits;
# the visual-stream FFN (1024x4096, ~17 MB) does not and falls back to XLA
# (it is <2 ms/forward at production batch anyway — PERF.md).
_WEIGHT_BYTES_LIMIT = 10 * 1024 * 1024


def enable(flag: bool = True):
    global _ENABLED
    _ENABLED = flag


def is_enabled() -> bool:
    return _ENABLED


# Megatron tensor parallelism shards the FFN/projection weights over the
# 'model' mesh axis (gstx.core.mesh.param_partition_spec); a pallas_call is
# opaque to the GSPMD partitioner, so running the fused kernels on sharded
# weights would force all-gathers (or fail to partition).  Every jitted-
# program factory (make_train_step, make_disc_train_step,
# make_dialog_engine, the eval chunk scorers) sets this at BUILD time from
# its own mesh — True or False — so building a TP=1 program restores the
# kernels after a TP>1 one.  The flag is read at TRACE time (first call of
# each jitted program), so every program factory ALSO re-asserts its own
# setting at call time (tp_gated below, or an inline set in the entry fn)
# — interleaved construction of TP and non-TP programs then still bakes
# the right gate into each.
_TP_ACTIVE = False


def set_tensor_parallel(flag: bool):
    global _TP_ACTIVE
    _TP_ACTIVE = bool(flag)


def set_tensor_parallel_from_mesh(mesh):
    """Flip the TP gate from a mesh (None or 'model' axis <= 1 -> off)."""
    from gstx.core.mesh import MODEL_AXIS

    set_tensor_parallel(mesh is not None
                        and mesh.shape.get(MODEL_AXIS, 1) > 1)


def tensor_parallel_active() -> bool:
    return _TP_ACTIVE


def tp_gated(mesh, fn):
    """Wrap a built (usually jitted) program so ITS tensor-parallel gate is
    re-asserted at every call.  The gate is module-global and read at TRACE
    time — the first call of each jitted program — so without this,
    interleaved construction of TP and non-TP programs bakes the LAST
    builder's setting into whichever traces first (the footgun documented
    above _TP_ACTIVE).  The per-call cost is one bool store."""
    import functools

    @functools.wraps(fn)
    def call(*args, **kwargs):
        set_tensor_parallel_from_mesh(mesh)
        return fn(*args, **kwargs)

    if hasattr(fn, "lower"):
        # jax.jit API passthrough (lowering traces too, so gate first)
        def lower(*args, **kwargs):
            set_tensor_parallel_from_mesh(mesh)
            return fn.lower(*args, **kwargs)

        call.lower = lower
    return call


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# In-kernel erf implementation (lax.erf has no Pallas TPU lowering).  All
# three are sub-bf16-resolution; they differ in VPU cost.  The FFN kernel
# runs at 163 TF/s vs the 361 TF/s pure-matmul rate because the erf tail
# does not fully overlap the MXU (PERF.md roadmap 1) — selectable here so
# the variants can be A/B'd in the full engine.
#   as7126: A&S 7.1.26, 5-term rational x exp(-x^2); max err 1.5e-7
#   as7125: A&S 7.1.25, 3-term rational x exp(-x^2); max err 2.5e-5
#   poly:   odd Chebyshev fit x*P(x^2) deg 10, NO exp / NO divide;
#           max err 6.7e-5 in f32 Horner (clamped to +-1 at |x|>=3.2)
# Default: as7126 (the most accurate).  Full-engine A/B measured as7126
# 12,233 / as7125 12,250 / poly 12,332 then a poly REPEAT at 12,125
# tok/s/chip — the spread does not replicate outside the +-2% tunnel
# variance, so the erf tail is not a measurable engine cost and the
# default keeps maximum fidelity (PERF.md round 3).
_ERF_IMPL = "as7126"


def set_erf_impl(name: str):
    global _ERF_IMPL
    assert name in ("as7126", "as7125", "poly"), name
    _ERF_IMPL = name


def _erf_as7126(x):
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_as7125(x):
    a1, a2, a3, p = 0.3480242, -0.0958798, 0.7478556, 0.47047
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((a3 * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


# ascending coefficients of P(x^2) with erf(x) ~= x * P(x^2) on [0, 3.2]
_ERF_POLY = (
    1.1283780952953903, -0.3760988184823886, 0.1127200536750201,
    -0.026667773601845128, 0.005050076017138482, -0.0007637513688678132,
    8.965654474807214e-05, -7.760456752796303e-06, 4.591610321141101e-07,
    -1.638980577687176e-08, 2.6407040815881297e-10)


def _erf_poly(x):
    ax = jnp.abs(x)
    t = ax * ax
    acc = jnp.full_like(t, _ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        acc = acc * t + c
    core = ax * acc
    return jnp.sign(x) * jnp.where(ax >= 3.2, 1.0, core)


def _erf(x):
    if _ERF_IMPL == "as7125":
        return _erf_as7125(x)
    if _ERF_IMPL == "poly":
        return _erf_poly(x)
    return _erf_as7126(x)


def _gelu_erf(x):
    # exact-erf GELU in f32 (reference vilbert_dialog.py:116-122)
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _layer_norm(x, gamma, beta, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * gamma + beta


def _ffn_pallas(x, w1, b1, w2, b2, gamma, beta, *, eps: float,
                block_m: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    d = orig_shape[-1]
    f = w1.shape[1]
    xm = x.reshape(-1, d)
    m = xm.shape[0]
    m_p = _round_up(m, block_m)
    if m_p != m:
        xm = jnp.pad(xm, ((0, m_p - m), (0, 0)))

    out_dtype = x.dtype
    b1r = b1.reshape(1, f).astype(jnp.float32)
    b2r = b2.reshape(1, d).astype(jnp.float32)
    gr = gamma.reshape(1, d).astype(jnp.float32)
    br = beta.reshape(1, d).astype(jnp.float32)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref, o_ref):
        xb = x_ref[...]
        h = jax.lax.dot_general(
            xb, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = _gelu_erf(h + b1_ref[...])
        h = h.astype(xb.dtype)
        y = jax.lax.dot_general(
            h, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + b2_ref[...] + xb.astype(jnp.float32)
        o_ref[...] = _layer_norm(
            y, g_ref[...], be_ref[...], eps).astype(o_ref.dtype)

    const = lambda i: (0, 0)  # noqa: E731  weights resident across steps
    out = pl.pallas_call(
        kernel,
        grid=(m_p // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, d), out_dtype),
        interpret=interpret,
    )(xm, w1, b1r, w2, b2r, gr, br)
    return out[:m].reshape(orig_shape)


def _dense_ln_pallas(x, w, b, residual, gamma, beta, *, eps: float,
                     block_m: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = residual.shape
    din = x.shape[-1]
    d = w.shape[1]
    xm = x.reshape(-1, din)
    rm = residual.reshape(-1, d)
    m = xm.shape[0]
    m_p = _round_up(m, block_m)
    if m_p != m:
        xm = jnp.pad(xm, ((0, m_p - m), (0, 0)))
        rm = jnp.pad(rm, ((0, m_p - m), (0, 0)))

    out_dtype = residual.dtype
    br = b.reshape(1, d).astype(jnp.float32)
    gr = gamma.reshape(1, d).astype(jnp.float32)
    ber = beta.reshape(1, d).astype(jnp.float32)

    def kernel(x_ref, w_ref, b_ref, r_ref, g_ref, be_ref, o_ref):
        y = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + b_ref[...] + r_ref[...].astype(jnp.float32)
        o_ref[...] = _layer_norm(
            y, g_ref[...], be_ref[...], eps).astype(o_ref.dtype)

    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(m_p // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, din), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((din, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, d), out_dtype),
        interpret=interpret,
    )(xm, w, br, rm, gr, ber)
    return out[:m].reshape(orig_shape)


# ---------------------------------------------------------------------------
# Reverse-mode autodiff: pallas_call has no VJP, but grads DO flow through
# these blocks in the FGSM attack (jax.grad wrt image features through a
# deterministic encoder forward, gstx/eval/attacks.py).  The backward pass
# recomputes via the equivalent jnp math (f32), whose vjp jax derives.
# ---------------------------------------------------------------------------


def _ffn_ref_math(x, w1, b1, w2, b2, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    h = _gelu_erf(xf @ w1.astype(jnp.float32) + b1.astype(jnp.float32))
    y = h @ w2.astype(jnp.float32) + b2.astype(jnp.float32) + xf
    return _layer_norm(y, gamma.astype(jnp.float32),
                       beta.astype(jnp.float32), eps).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ffn_vjp(eps, block_m, interpret, x, w1, b1, w2, b2, gamma, beta):
    return _ffn_pallas(x, w1, b1, w2, b2, gamma, beta, eps=eps,
                       block_m=block_m, interpret=interpret)


def _ffn_vjp_fwd(eps, block_m, interpret, x, w1, b1, w2, b2, gamma, beta):
    out = _ffn_vjp(eps, block_m, interpret, x, w1, b1, w2, b2, gamma, beta)
    return out, (x, w1, b1, w2, b2, gamma, beta)


def _ffn_vjp_bwd(eps, block_m, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _ffn_ref_math(*a, eps), *res)
    return vjp(g)


_ffn_vjp.defvjp(_ffn_vjp_fwd, _ffn_vjp_bwd)


def _dense_ln_ref_math(x, w, b, residual, gamma, beta, eps):
    y = (x.astype(jnp.float32) @ w.astype(jnp.float32)
         + b.astype(jnp.float32) + residual.astype(jnp.float32))
    return _layer_norm(y, gamma.astype(jnp.float32),
                       beta.astype(jnp.float32), eps).astype(residual.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _dense_ln_vjp(eps, block_m, interpret, x, w, b, residual, gamma, beta):
    return _dense_ln_pallas(x, w, b, residual, gamma, beta, eps=eps,
                            block_m=block_m, interpret=interpret)


def _dense_ln_vjp_fwd(eps, block_m, interpret, x, w, b, residual, gamma,
                      beta):
    out = _dense_ln_vjp(eps, block_m, interpret, x, w, b, residual, gamma,
                        beta)
    return out, (x, w, b, residual, gamma, beta)


def _dense_ln_vjp_bwd(eps, block_m, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _dense_ln_ref_math(*a, eps), *res)
    return vjp(g)


_dense_ln_vjp.defvjp(_dense_ln_vjp_fwd, _dense_ln_vjp_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def fused_ffn(x, w1, b1, w2, b2, gamma, beta, *, eps: float = 1e-12,
              block_m: int = 256, interpret: bool = False):
    """LayerNorm(x + gelu(x @ w1 + b1) @ w2 + b2) with VMEM-resident
    intermediate; differentiable (jnp-math backward).

    x: [..., D]; w1: [D, F]; b1: [F]; w2: [F, D]; b2: [D];
    gamma/beta: [D] (f32).  Returns x.dtype with f32 accumulation.
    """
    return _ffn_vjp(eps, block_m, interpret, x, w1, b1, w2, b2, gamma, beta)


@functools.partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def fused_dense_ln(x, w, b, residual, gamma, beta, *, eps: float = 1e-12,
                   block_m: int = 512, interpret: bool = False):
    """LayerNorm(residual + x @ w + b): a projection with its residual
    LayerNorm fused (reference BertSelfOutput / BertBiOutput);
    differentiable (jnp-math backward).

    x: [..., Din]; w: [Din, D]; b: [D]; residual: [..., D].
    """
    return _dense_ln_vjp(eps, block_m, interpret, x, w, b, residual, gamma,
                         beta)


def maybe_fused_ffn(x, w1, b1, w2, b2, gamma, beta, *, eps: float,
                    dropout_rate: float, deterministic: bool, dtype):
    """Return the fused result when eligible, else None (caller falls back
    to the jnp path)."""
    if not _ENABLED or _TP_ACTIVE or not _on_tpu():
        return None
    if not deterministic and dropout_rate > 0.0:
        return None
    if dtype != jnp.bfloat16:
        return None
    d, f = w1.shape
    if (d * f + f * d) * jnp.dtype(dtype).itemsize > _WEIGHT_BYTES_LIMIT:
        return None
    if d % 128 != 0 or f % 128 != 0:
        return None
    return fused_ffn(x.astype(dtype), w1.astype(dtype), b1, w2.astype(dtype),
                     b2, gamma, beta, eps=eps)


def maybe_fused_dense_ln(x, w, b, residual, gamma, beta, *, eps: float,
                         dropout_rate: float, deterministic: bool, dtype):
    """Fused attention-output projection + residual LayerNorm, or None."""
    if not _ENABLED or _TP_ACTIVE or not _on_tpu():
        return None
    if not deterministic and dropout_rate > 0.0:
        return None
    if dtype != jnp.bfloat16:
        return None
    din, d = w.shape
    if din % 128 != 0 or d % 128 != 0:
        return None
    return fused_dense_ln(x.astype(dtype), w.astype(dtype), b,
                          residual.astype(dtype), gamma, beta, eps=eps)
