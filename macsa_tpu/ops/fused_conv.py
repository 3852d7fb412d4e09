"""Pallas kernel: 1x1 convolution as matmul with a fused BN/residual/ReLU
epilogue.

Motivation (profiled on v5e, batch 8, 2026-08-18): XLA:TPU cannot fuse
elementwise epilogues into convolutions, so every ResNet bottleneck
(reference: fcmf_framework/resnet_utils.py runs torchvision resnet152)
round-trips its conv3 output through HBM twice — conv writes the
[224,14,14,1024] activation (90 MB), then a separate `add_maximum` fusion
re-reads it plus the residual and writes the block output.  At batch 8 the
stage-3 residual fusions alone are ~14.8 ms of the 112 ms step, pure HBM
bandwidth.  A 1x1 conv over NHWC is exactly a matmul over the flattened
spatial rows, so this kernel computes

    y = relu((x @ w) * mul + add [+ residual])

in one pass: the conv output never touches HBM, eliminating a
write+read of the widest tensor in every bottleneck block.

`mul`/`add` are the frozen-BatchNorm affine factors
(models.resnet.FrozenBatchNorm): mul = scale*rsqrt(var+eps),
add = bias - mean*mul.  They are applied to the f32 accumulator before the
residual add, matching the unfused path's op order (conv -> BN -> +res ->
relu) exactly up to bf16 rounding of the intermediate.

The backward (only reached when the CNN is fine-tuned; the hot path wraps
features in stop_gradient) is plain XLA matmuls — exact, no custom kernel
needed, because the frozen-CNN training step never differentiates through
this op.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Per-buffer-set VMEM budget for tile sizing.  Mosaic double-buffers grid
# blocks, and the f32 accumulator lives in VMEM too, so stay well under the
# ~16 MB/core total.
_VMEM_BUDGET = 5 * 1024 * 1024


def _tile_m(m: int, k: int, n: int, has_res: bool) -> int:
    """Largest multiple-of-256 row tile whose buffers fit the VMEM budget.

    Per row of the tile: x (2k bytes) + out (2n) + f32 accumulator (4n)
    + residual (2n).  The weight block (2kn) is grid-invariant (resident).
    Small m collapses to a single 8-row-aligned block.
    """
    per_row = 2 * k + 6 * n + (2 * n if has_res else 0)
    tm = max((_VMEM_BUDGET - 2 * k * n) // per_row, 256) // 256 * 256
    m8 = -(-m // 8) * 8
    return min(tm, m8) if m8 >= 256 else m8


def _kernel(x_ref, w_ref, mul_ref, add_ref, *rest, relu):
    if len(rest) == 2:
        res_ref, o_ref = rest
    else:
        res_ref, (o_ref,) = None, rest
    acc = jax.lax.dot_general(x_ref[...], w_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    y = acc * mul_ref[...] + add_ref[...]
    if res_ref is not None:
        y = y + res_ref[...].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.astype(o_ref.dtype)


def _call(x2: Array, w: Array, mul: Array, add: Array,
          residual2: Optional[Array], relu: bool, interpret: bool) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x2.shape
    n = w.shape[1]
    tm = _tile_m(m, k, n, residual2 is not None)
    grid = (-(-m // tm),)

    const = lambda i: (0, 0)
    row = lambda i: (i, 0)
    in_specs = [
        pl.BlockSpec((tm, k), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n), const, memory_space=pltpu.VMEM),
    ]
    args = [x2, w, mul.reshape(1, n), add.reshape(1, n)]
    if residual2 is not None:
        in_specs.append(pl.BlockSpec((tm, n), row, memory_space=pltpu.VMEM))
        args.append(residual2)

    return pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        grid=grid,
        in_specs=in_specs,
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        out_specs=pl.BlockSpec((tm, n), row, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_matmul_bn_act(x2: Array, w: Array, mul: Array, add: Array,
                        residual2: Optional[Array] = None,
                        relu: bool = True, interpret: bool = False) -> Array:
    """relu((x2 @ w) * mul + add + residual2), fused on the MXU.

    x2: [M, K] activation rows (NHWC 1x1 conv input flattened over
    batch*H*W); w: [K, N]; mul/add: [N] f32 BN affine; residual2: optional
    [M, N].  Output [M, N] in x2's dtype, f32 accumulation/epilogue.
    Gradients flow to x2/w/mul/add/residual2 via plain XLA ops (exact
    matmul-BN-relu backward; relu mask recovered from the saved output).
    """
    return _fwd(x2, w, mul, add, residual2, relu, interpret)[0]


def _fwd(x2, w, mul, add, residual2, relu, interpret):
    y = _call(x2, w, mul, add, residual2, relu, interpret)
    # None-vs-marker: pytree *structure* statically records whether a
    # residual input existed (a bool leaf would turn into a tracer)
    marker = None if residual2 is None else jnp.zeros((), x2.dtype)
    return y, (x2, w, mul, add, y, marker)


def _bwd(relu, interpret, res, g):
    x2, w, mul, add, y, marker = res
    g = g.astype(jnp.float32)
    if relu:
        g = jnp.where(y > 0, g, 0.0)
    dres = g.astype(x2.dtype) if marker is not None else None
    gm = (g * mul.astype(jnp.float32)).astype(x2.dtype)
    dx = jnp.dot(gm, w.T, preferred_element_type=jnp.float32).astype(x2.dtype)
    dw = jnp.dot(x2.T, gm, preferred_element_type=jnp.float32).astype(w.dtype)
    # BN-affine grads need the raw accumulator; recompute it (bwd is the
    # cold fine-tune-CNN path only)
    acc = jnp.dot(x2, w, preferred_element_type=jnp.float32)
    dmul = jnp.sum(g * acc, axis=0).astype(mul.dtype)
    dadd = jnp.sum(g, axis=0).astype(add.dtype)
    return dx, dw, dmul, dadd, dres


fused_matmul_bn_act.defvjp(_fwd, _bwd)
