"""Pallas kernel: fused geometric (box-bias) attention.

Fuses the ROI attention core of roi_modeling.py:14-47 into one VMEM-resident
kernel: scores = QK^T/sqrt(d) + log(max(w_g, 1e-6)); out = softmax(scores) V.
One grid step covers a (batch*head) slice; N (ROIs) and d (head dim) are
padded to the TPU tile (8, 128) and masked inside the kernel.

Training support: `fused_box_attention` carries a custom VJP whose backward
is the analytic softmax-attention gradient in plain XLA (the standard
pallas-forward / XLA-backward pattern) — numerically identical to
differentiating the unfused math.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

GEO_CLAMP_MIN = 1e-6
SUBLANE = 8
LANE = 128


def _pad_to(x, axis, target):
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_valid, scale):
    """blocks: q/k/v [1, Np, Dp]; bias [1, Np, Np_lanes] of raw ReLU gates —
    the log-clamp is fused here."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    bias = bias_ref[0][:, : scores.shape[1]].astype(jnp.float32)
    scores = scores + jnp.log(jnp.maximum(bias, GEO_CLAMP_MIN))
    # mask padded keys
    np_ = scores.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_valid, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def _forward_pallas(q, k, v, gates, interpret: bool):
    """q/k/v: [BH, N, d]; gates: [BH, N, N] (post-ReLU geometric weights)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, n, d = q.shape
    n_pad = max(SUBLANE, -(-n // SUBLANE) * SUBLANE)
    d_pad = max(LANE, -(-d // LANE) * LANE)
    npn = max(LANE, -(-n // LANE) * LANE)  # lane-dim padding for bias cols

    qp = _pad_to(_pad_to(q, 1, n_pad), 2, d_pad)
    kp = _pad_to(_pad_to(k, 1, n_pad), 2, d_pad)
    vp = _pad_to(_pad_to(v, 1, n_pad), 2, d_pad)
    bp = _pad_to(_pad_to(gates, 1, n_pad), 2, npn)

    out = pl.pallas_call(
        functools.partial(_kernel, n_valid=n, scale=1.0 / math.sqrt(d)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, npn), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, bp)
    return out[:, :n, :d]


def _xla_probs(q, k, gates):
    d = q.shape[-1]
    scores = jnp.einsum("bnd,bmd->bnm", q, k).astype(jnp.float32) / math.sqrt(d)
    scores = scores + jnp.log(jnp.maximum(gates.astype(jnp.float32),
                                          GEO_CLAMP_MIN))
    return jax.nn.softmax(scores, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_box_attention(q, k, v, gates, interpret: bool = False):
    """softmax(QK^T/sqrt(d) + log(clamp(gates))) V, fused on TPU.

    q/k/v: [BH, N, d]; gates: [BH, N, N] post-ReLU geometric weights.
    """
    return _forward_pallas(q, k, v, gates, interpret)


def _fwd(q, k, v, gates, interpret):
    return _forward_pallas(q, k, v, gates, interpret), (q, k, v, gates)


def _bwd(interpret, res, g):
    q, k, v, gates = res
    d = q.shape[-1]
    probs = _xla_probs(q, k, gates)                      # [BH, N, M]
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("bnm,bnd->bmd", probs, g32)
    dp = jnp.einsum("bnd,bmd->bnm", g32, v32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bnm,bmd->bnd", ds, k.astype(jnp.float32)) / math.sqrt(d)
    dk = jnp.einsum("bnm,bnd->bmd", ds, q.astype(jnp.float32)) / math.sqrt(d)
    # d log(clamp(gates)) = ds / gates where gates > clamp_min else 0
    g_f = gates.astype(jnp.float32)
    dgates = jnp.where(g_f > GEO_CLAMP_MIN, ds / jnp.maximum(g_f, GEO_CLAMP_MIN),
                       0.0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dgates.astype(gates.dtype))


fused_box_attention.defvjp(_fwd, _bwd)


def box_attention_reference(q, k, v, gates):
    """Unfused XLA reference (same math) for tests."""
    probs = _xla_probs(q, k, gates)
    return jnp.einsum("bnm,bmd->bnd", probs.astype(q.dtype), v)
