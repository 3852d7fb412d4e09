"""Pallas kernel: fused self-attention with in-kernel dropout (flash-style).

Motivation (profiled on v5e, batch 8, 2026-08-17): the XLA lowering of the
text-encoder attention materializes per block a u32[48,12,170,170] dropout
bit tensor, a layout-change copy of it, a pred compare, and f32 score/prob
tensors in HBM — ~10 ms of the 71 ms cached-feature train step across the
12 blocks.  This kernel keeps scores/probs in VMEM, draws the dropout mask
from the on-core PRNG (`pltpu.prng_seed` / `prng_random_bits`), and never
touches HBM with anything but q/k/v/out.

Interface (re-designed 2026-08-19): q/k/v arrive in the PROJECTION's
native [B, L, H*d] layout and heads are sliced inside the kernel — the
earlier [B, H, L, d] interface forced XLA to materialize a
[B,L,H,d]->[B,H,L,d] transpose plus an explicit 170->176 row pad for every
operand of every layer (fwd + bwd), ~5 ms/step of pure relayout at batch
8.  Row padding now happens implicitly through the BlockSpec (block rows
rounded up to the sublane tile; out-of-bounds stores are masked), with
loaded pad rows zeroed in-kernel so no uninitialized values can reach a
matmul.

Semantics match `models.layers.attention_core` (reference math:
mm_modeling.py:202-215): softmax((QK^T)/sqrt(d) + additive_mask) in f32,
dropout on the probabilities, then @V.  The additive mask is the standard
[B, Lk] padding-mask row broadcast over queries/heads — the only form the
text encoder uses.  Matmul operands stay in their storage dtype (bf16 in
training): the MXU runs bf16 x bf16 -> f32 at full rate, while casting
operands to f32 first would quarter throughput (profiled ~15 TF/s);
accumulation is f32 via preferred_element_type, matching the XLA path.

Backward is a second Pallas kernel that *recomputes* scores/probs and
*regenerates the identical dropout bits* (same seed, same per-program
stream, same generation shape and head order), then applies the analytic
softmax-attention gradient — nothing but q/k/v is saved from the forward.

The dropout mask distribution differs bitwise from `jax.random.bernoulli`
(different PRNG), which is immaterial: dropout only needs iid Bernoulli
keeps, and eval/deterministic paths are exactly the fused math with no RNG.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

BF16_SUBLANE = 16
NEG_BIG = -1e9  # finite column-pad mask; exp underflows to exactly 0 in f32


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _keep_mask(shape, rate: float):
    """Draw the keep mask from the seeded on-core PRNG.  Draws MUST happen
    in the same order and shape in forward and backward so the streams
    coincide."""
    from jax.experimental.pallas import tpu as pltpu
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = np.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))
    return bits >= thresh


def _probs(q, k, mask_row, lk, scale):
    """f32 softmax((q k^T) scale + mask) with padded keys dropped exactly."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + mask_row  # [Lq, Lk] + [1, Lk]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < lk, s, NEG_BIG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _zero_pad_rows(x, l):
    """Zero block rows >= l (out-of-bounds loads may be uninitialized; a
    NaN there would propagate through 0 * NaN in the PV matmul)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(row < l, x, 0)


def _head(x, h, d):
    return jax.lax.slice_in_dim(x, h * d, (h + 1) * d, axis=1)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                l, num_heads, scale, rate):
    """One program per batch row; blocks are [1, Lp, H*d], heads sliced
    in-kernel (unrolled: amortizes the ~1.3 us/program grid dispatch 12x
    vs a per-(batch,head) grid, profiled 2026-08-18)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = q_ref.shape[-1] // num_heads
    mask_row = mask_ref[0].astype(jnp.float32)  # [1, Lkp]
    q = _zero_pad_rows(q_ref[0], l)
    k = _zero_pad_rows(k_ref[0], l)
    v = _zero_pad_rows(v_ref[0], l)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    outs = []
    for h in range(num_heads):  # heads, unrolled; fixed draw order
        p = _probs(_head(q, h, d), _head(k, h, d), mask_row, l, scale)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        outs.append(jnp.dot(p.astype(v.dtype), _head(v, h, d),
                            preferred_element_type=jnp.float32))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, l, num_heads, scale, rate):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = q_ref.shape[-1] // num_heads
    mask_row = mask_ref[0].astype(jnp.float32)
    q = _zero_pad_rows(q_ref[0], l)
    k = _zero_pad_rows(k_ref[0], l)
    v = _zero_pad_rows(v_ref[0], l)
    g = _zero_pad_rows(g_ref[0], l)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))  # same stream as fwd
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):  # heads, unrolled; draw order == fwd
        qh, kh, vh, gh = (_head(t, h, d) for t in (q, k, v, g))
        p = _probs(qh, kh, mask_row, l, scale)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate)
            inv = 1.0 / (1.0 - rate)
            pd = jnp.where(keep, p * inv, 0.0)
        else:
            pd = p

        # o = pd @ v; matmul operands in storage dtype (full MXU rate),
        # f32 accumulation
        dv = jax.lax.dot_general(pd.astype(gh.dtype), gh,
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(gh, vh, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd * inv, 0.0) if rate > 0.0 else dpd
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(
            qh.dtype)
        dqs.append(jnp.dot(ds, kh, preferred_element_type=jnp.float32)
                   * scale)
        dks.append(jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
                   * scale)
        dvs.append(dv)
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)


def _call(kernel, seed, arrays, mask, num_outs, interpret):
    """Shared pallas_call wiring: grid over B, SMEM seed, per-b mask row.

    Arrays stay [B, L, H*d]; each program's block is (1, Lp, H*d) with Lp
    the sublane-rounded row count — out-of-bounds rows load as padding
    (zeroed in-kernel) and stores beyond L are masked, so no explicit pad
    or transpose ops appear in the XLA graph."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, lseq, hd = arrays[0].shape
    lp = _round_up(max(lseq, BF16_SUBLANE), BF16_SUBLANE)
    lkp = mask.shape[-1]
    specs = [pl.BlockSpec((1, lp, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) for _ in arrays]
    mask_spec = pl.BlockSpec((1, 1, lkp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, lp, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, lseq, hd), arrays[0].dtype)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), *specs[:3],
                  mask_spec, *specs[3:]],
        out_shape=[out_shape] * num_outs,
        out_specs=[out_spec] * num_outs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(seed, *arrays[:3], mask, *arrays[3:])


def _prep_mask(mask: Array, lseq: int) -> Array:
    """[B, Lk] additive f32 row -> [B, 1, Lkp] (zero-padded; padded key
    columns are re-masked exactly inside _probs)."""
    lkp = _round_up(max(lseq, BF16_SUBLANE), BF16_SUBLANE)
    pad = lkp - mask.shape[1]
    if pad > 0:
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    return mask[:, None, :].astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_self_attention(q: Array, k: Array, v: Array, mask: Array,
                         seed: Array, num_heads: int, rate: float = 0.0,
                         interpret: bool = False) -> Array:
    """Multi-head softmax(QK^T/sqrt(d) + mask) -> dropout -> @V, fused.

    q/k/v: [B, L, H*d] — the raw projection outputs, NOT head-split (the
    kernel slices heads internally); mask: [B, L] additive f32 row (0 keep
    / large-negative drop — the HF/reference convention); seed: int32[1]
    scalar array driving the in-kernel dropout PRNG (ignored when
    rate == 0).  Returns [B, L, H*d] (merged-head layout, ready for the
    output projection).  Gradients flow to q/k/v; the mask is treated as
    constant (it is derived from integer inputs everywhere in this model).
    """
    return _fwd(q, k, v, mask, seed, num_heads, rate, interpret)[0]


def _fwd(q, k, v, mask, seed, num_heads, rate, interpret):
    d = q.shape[-1] // num_heads
    lseq = q.shape[1]
    kern = functools.partial(_fwd_kernel, l=lseq, num_heads=num_heads,
                             scale=1.0 / math.sqrt(d), rate=rate)
    (out,) = _call(kern, seed, (q, k, v), _prep_mask(mask, lseq), 1,
                   interpret)
    return out, (q, k, v, mask, seed)


def _bwd(num_heads, rate, interpret, res, g):
    q, k, v, mask, seed = res
    d = q.shape[-1] // num_heads
    lseq = q.shape[1]
    kern = functools.partial(_bwd_kernel, l=lseq, num_heads=num_heads,
                             scale=1.0 / math.sqrt(d), rate=rate)
    dq, dk, dv = _call(kern, seed, (q, k, v, g), _prep_mask(mask, lseq), 3,
                       interpret)
    return (dq, dk, dv, jnp.zeros_like(mask),
            np.zeros(seed.shape, jax.dtypes.float0))


fused_self_attention.defvjp(_fwd, _bwd)


def fused_self_attention_sharded(q: Array, k: Array, v: Array, mask: Array,
                                 seed: Array, num_heads: int,
                                 rate: float = 0.0, interpret: bool = False,
                                 *, mesh, dp_axis: str = "dp",
                                 mp_axis: str = "mp") -> Array:
    """`fused_self_attention` partitioned over a device mesh via shard_map.

    `pallas_call` lowers to an opaque custom call with no GSPMD
    partitioning rule, so under a multi-chip jit the bare kernel would be
    replicated (all-gathering the dp-sharded batch).  This wrapper
    partitions it manually — the composition the reference gets for free
    from DDP (run_multimodal_fcmf.py:126-132) composing with its kernels:

    * batch rows shard over `dp_axis` (the kernel grid is one program per
      row — embarrassingly parallel),
    * heads shard over `mp_axis`: the Megatron TP rules
      (parallel/sharding.py) column-shard the q/k/v projections, so the
      [B, L, H*d] activations arrive head-sharded on the last dim; each
      shard runs the kernel on its own ``num_heads / mp`` heads and the
      head-sharded output feeds the row-sharded output projection with no
      resharding at all.  Attention is head-independent, so this is exact.

    The dropout seed is offset by the shard's linear mesh index so every
    shard draws an independent PRNG stream; forward and backward apply the
    same offset, keeping the regenerated masks identical.

    Requires B % dp == 0 and num_heads % mp == 0 (callers check and fall
    back to the XLA path otherwise).
    """
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get(dp_axis, 1)
    mp = mesh.shape.get(mp_axis, 1)
    if q.shape[0] % dp != 0:
        raise ValueError(f"batch {q.shape[0]} not divisible by {dp_axis}={dp}")
    if num_heads % mp != 0:
        raise ValueError(f"{num_heads} heads not divisible by {mp_axis}={mp}")

    def local(q, k, v, mask, seed):
        idx = jax.lax.axis_index(dp_axis) * mp
        if mp > 1:
            idx = idx + jax.lax.axis_index(mp_axis)
        return fused_self_attention(q, k, v, mask,
                                    seed + idx.astype(seed.dtype),
                                    num_heads // mp, rate, interpret)

    qkv = P(dp_axis, None, mp_axis if mp > 1 else None)
    return jax.shard_map(local, mesh=mesh,
                         in_specs=(qkv, qkv, qkv, P(dp_axis, None), P()),
                         out_specs=qkv, check_vma=False)(q, k, v, mask, seed)


def attention_reference(q, k, v, mask):
    """Unfused XLA math (no dropout) on [B, H, L, d] for parity tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    s = s / math.sqrt(d) + mask[:, None, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)
