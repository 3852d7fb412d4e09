"""Pallas kernel: fused self-attention with in-kernel dropout (flash-style).

Motivation (profiled on v5e, batch 8, 2026-08-17): the XLA lowering of the
text-encoder attention materializes per block a u32[48,12,170,170] dropout
bit tensor, a layout-change copy of it, a pred compare, and f32 score/prob
tensors in HBM — ~10 ms of the 71 ms cached-feature train step across the
12 blocks.  This kernel keeps scores/probs in VMEM, draws the dropout mask
from the on-core PRNG (`pltpu.prng_seed` / `prng_random_bits`), and never
touches HBM with anything but q/k/v/out.

Semantics match `models.layers.attention_core` (reference math:
mm_modeling.py:202-215): softmax((QK^T)/sqrt(d) + additive_mask) in f32,
dropout on the probabilities, then @V.  The additive mask is the standard
[B, Lk] padding-mask row broadcast over queries/heads — the only form the
text encoder uses.

Backward is a second Pallas kernel that *recomputes* scores/probs and
*regenerates the identical dropout bits* (same seed, same per-program
stream, same generation shape), then applies the analytic softmax-attention
gradient — nothing but q/k/v is saved from the forward.

The dropout mask distribution differs bitwise from `jax.random.bernoulli`
(different PRNG), which is immaterial: dropout only needs iid Bernoulli
keeps, and eval/deterministic paths are exactly the fused math with no RNG.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BF16_SUBLANE = 16
NEG_BIG = -1e9  # finite column-pad mask; exp underflows to exactly 0 in f32


def _pad_axis(x: Array, axis: int, target: int) -> Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _keep_mask(shape, rate: float):
    """Draw the keep mask from the seeded on-core PRNG.  MUST be the only
    draw after prng_seed and use the same shape in forward and backward so
    the streams coincide."""
    from jax.experimental.pallas import tpu as pltpu
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))
    return bits >= thresh


def _probs(q, k, mask_row, lk, scale):
    """f32 softmax((q k^T) scale + mask) with padded keys dropped exactly.

    q/k arrive in their storage dtype (bf16 in training): the MXU runs
    bf16 x bf16 -> f32 at full rate, while casting operands to f32 first
    would quarter matmul throughput (profiled: the all-f32 version of this
    kernel ran at ~15 TF/s).  Accumulation stays f32 via
    preferred_element_type, matching the XLA attention path's numerics.
    """
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + mask_row  # [Lq, Lk] + [1, Lk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk, s, NEG_BIG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                lk, scale, rate):
    """One program per batch row; blocks are [H, Lp, d].

    Profiled on v5e (batch 8, 2026-08-18): with one program per (batch,
    head) the 576-program grid spent ~1.3 us/program of fixed dispatch —
    0.37 ms per forward call where the matmul math is ~20 us.  Unrolling
    the head loop inside a 48-program grid amortizes that overhead 12x.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mask_row = mask_ref[0].astype(jnp.float32)  # [1, Lkp]
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    for h in range(q_ref.shape[0]):  # heads, unrolled
        p = _probs(q_ref[h], k_ref[h], mask_row, lk, scale)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate)  # per-head draw, fixed order
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        o_ref[h] = jnp.dot(p.astype(v_ref.dtype), v_ref[h],
                           preferred_element_type=jnp.float32).astype(
                               o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, lk, scale, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    mask_row = mask_ref[0].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))  # same stream as fwd
    for h in range(q_ref.shape[0]):  # heads, unrolled; draw order == fwd
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        g = g_ref[h]

        p = _probs(q, k, mask_row, lk, scale)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p

        # o = pd @ v; matmul operands in storage dtype (MXU full rate),
        # f32 accumulation
        dv = jax.lax.dot_general(pd.astype(g.dtype), g,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [Lk,D]
        dpd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(
            q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[h] = dq.astype(dq_ref.dtype)
        dk_ref[h] = dk.astype(dk_ref.dtype)
        dv_ref[h] = dv.astype(dv_ref.dtype)


def _prep(q, k, v, mask):
    """[B, H, L, d] -> padded [BH, Lp, d] views + padded [B, Lkp] mask."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lqp = _round_up(max(lq, BF16_SUBLANE), BF16_SUBLANE)
    lkp = _round_up(max(lk, BF16_SUBLANE), BF16_SUBLANE)
    fold = lambda x, lp: _pad_axis(x.reshape(b * h, x.shape[2], d), 1, lp)
    # mask as [B, 1, Lkp]: a (1, 1, Lkp) block then matches the array's last
    # two dims exactly (Mosaic's block-shape tiling rule)
    return (fold(q, lqp), fold(k, lkp), fold(v, lkp),
            _pad_axis(mask, 1, lkp)[:, None, :], lqp, lkp)


def _call(kernel, seed, arrays, mask, out_shapes, num_heads, interpret):
    """Shared pallas_call wiring: grid over B (each program owns all H
    heads of one batch row — see _fwd_kernel on why), SMEM seed, per-b
    mask row.  Arrays stay [B*H, Lp, d]; a (H, Lp, d) block at block-index
    (i, 0, 0) covers rows [i*H, (i+1)*H)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, lp, d = arrays[0].shape
    specs = [pl.BlockSpec((num_heads, a.shape[1], d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) for a in arrays]
    mask_spec = pl.BlockSpec((1, 1, mask.shape[2]), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((num_heads, s.shape[1], s.shape[2]),
                              lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
                 for s in out_shapes]
    return pl.pallas_call(
        kernel,
        grid=(bh // num_heads,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), *specs[:3],
                  mask_spec, *specs[3:]],
        out_shape=[jax.ShapeDtypeStruct(s.shape, s.dtype) for s in out_shapes],
        out_specs=out_specs,
        interpret=interpret,
    )(seed, *arrays[:3], mask, *arrays[3:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_self_attention(q: Array, k: Array, v: Array, mask: Array,
                         seed: Array, rate: float = 0.0,
                         interpret: bool = False) -> Array:
    """softmax(QK^T/sqrt(d) + mask[:, None, None, :]) -> dropout -> @V, fused.

    q/k/v: [B, H, L, d] (Lq may differ from Lk); mask: [B, Lk] additive f32
    row (0 keep / large-negative drop — the HF/reference convention);
    seed: int32[1] scalar array driving the in-kernel dropout PRNG (ignored
    when rate == 0).  Gradients flow to q/k/v; the mask is treated as
    constant (it is derived from integer inputs everywhere in this model).
    """
    out, _ = _fwd(q, k, v, mask, seed, rate, interpret)
    return out


def _fwd(q, k, v, mask, seed, rate, interpret):
    b, h, lq, d = q.shape
    qp, kp, vp, mp, lqp, lkp = _prep(q, k, v, mask)
    kern = functools.partial(_fwd_kernel, lk=k.shape[2],
                             scale=1.0 / math.sqrt(d), rate=rate)
    (out,) = _call(kern, seed, (qp, kp, vp), mp,
                   [jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype)], h,
                   interpret)
    out = out[:, :lq, :].reshape(b, h, lq, d)
    return out, (q, k, v, mask, seed)


def _bwd(rate, interpret, res, g):
    q, k, v, mask, seed = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qp, kp, vp, mp, lqp, lkp = _prep(q, k, v, mask)
    gp = _pad_axis(g.reshape(b * h, lq, d), 1, lqp)
    kern = functools.partial(_bwd_kernel, lk=lk, scale=1.0 / math.sqrt(d),
                             rate=rate)
    dq, dk, dv = _call(kern, seed, (qp, kp, vp, gp), mp,
                       [jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
                        jax.ShapeDtypeStruct((b * h, lkp, d), k.dtype),
                        jax.ShapeDtypeStruct((b * h, lkp, d), v.dtype)],
                       h, interpret)
    dq = dq[:, :lq, :].reshape(b, h, lq, d)
    dk = dk[:, :lk, :].reshape(b, h, lk, d)
    dv = dv[:, :lk, :].reshape(b, h, lk, d)
    return (dq, dk, dv, jnp.zeros_like(mask),
            np.zeros(seed.shape, jax.dtypes.float0))


def _fwd_rule(q, k, v, mask, seed, rate, interpret):
    return _fwd(q, k, v, mask, seed, rate, interpret)


fused_self_attention.defvjp(_fwd_rule, _bwd)


def attention_reference(q, k, v, mask):
    """Unfused XLA math (no dropout) for parity tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    s = s / math.sqrt(d) + mask[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)
