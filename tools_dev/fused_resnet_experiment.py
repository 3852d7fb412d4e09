"""RETIRED EXPERIMENT — fused ResNet bottleneck Pallas kernels.

A whole-bottleneck Pallas kernel (conv1/conv2(3x3)/conv3 + BN affines +
residual + ReLUs with all intermediates in VMEM) plus the 1x1-conv
matmul+epilogue kernel it grew from, and a backbone runner functionally
identical to `models.resnet.VisualFeatures` (same parameter pytree, same
math — reference: fcmf_framework/resnet_utils.py runs torchvision
resnet152 grid/pooled heads).

Motivation (profiled on v5e, batch 8, 2026-08-18): XLA:TPU cannot fuse
elementwise epilogues into convolutions, so every ResNet bottleneck
round-trips its conv3 output through HBM twice — conv writes the
[224,14,14,1024] activation (90 MB), then a separate `add_maximum` fusion
re-reads it plus the residual and writes the block output.  At batch 8 the
stage-3 residual fusions alone are ~14.8 ms of the 112 ms step, pure HBM
bandwidth.  With the whole block in one kernel, HBM traffic per block is
exactly one read of x and one write of the output.

MEASURED NEGATIVE RESULT (v5e, batch 8, BENCH_MODE=visual 50-step runs) —
why this lives in tools_dev and not on any product path:

    XLA conv pipeline             47.5 ms  (1179 pairs/s)   <- default
    fused, stages 2+3             56.8 ms  ( 986 pairs/s)
    fused, stage 3 only           52.9 ms  (1058 pairs/s)   <- 2026-08-19 retry

The saved residual-add HBM traffic is real but is re-paid in VPU work
(9x roll + mask + cast per block for the in-kernel 3x3 conv; Mosaic's
rotate is 32-bit-only so the conv1 activation must stay f32) and in
stage-boundary relayouts, and the kernel serializes each block's three
matmuls where XLA double-buffers convs across blocks.  The stage-3-only
retry (best MXU:VPU ratio — F=256, K=1024) recovers 3.9 ms of the loss
but still trails XLA by 5.4 ms.  A hybrid that fuses only the 1x1 convs
and leaves the 3x3 to XLA is worse still (81 ms): custom-calls force
default layouts, so every pallas<->conv boundary inserts a full-tensor
layout copy.  The XLA path is already ~66% MFU; there is no headroom left
that this schedule can reach.

Kept here, parity-tested (tests/test_fused_conv.py, interpret mode on
CPU), as the scaffold should the tiling ever be re-attempted (int8
residual staging is the remaining untried idea — it changes numerics).
Micro-bench on the real chip:  python tools_dev/fused_resnet_experiment.py
[--stages 3] [--batch 8] [--steps 50].

Kernel math: `mul`/`add` are the frozen-BatchNorm affine factors
(models.resnet.FrozenBatchNorm): mul = scale*rsqrt(var+eps),
add = bias - mean*mul, applied to the f32 accumulator before the residual
add, matching the unfused path's op order (conv -> BN -> +res -> relu)
exactly up to bf16 rounding of the intermediate.  Backward paths are
plain XLA (exact; the frozen-CNN hot path never differentiates through
these ops).
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


# ---------------------------------------------------------------------------
# Whole-bottleneck kernel: conv1(1x1) + conv2(3x3) + conv3(1x1) + BN affines
# + residual + ReLUs in ONE pallas program per image tile.
# ---------------------------------------------------------------------------
#
# Why: splitting the block between pallas 1x1 kernels and XLA's 3x3 conv
# loses to pure XLA — custom-calls force default layouts, so every
# pallas<->conv boundary inserts a full-tensor layout copy (measured: the
# hybrid ran the batch-8 visual step at 81 ms vs XLA's 50 ms).  With conv2
# *inside* the kernel the intermediate activations never leave VMEM: HBM
# traffic per block drops from ~4 passes over the widest tensor (conv3
# write + residual-add read/read/write, plus boundary copies) to exactly
# one read of x and one write of the output.
#
# Measured outcome: negative — see the module docstring's table (fused
# loses to XLA at every stage subset; the saved residual-add HBM traffic
# is re-paid in VPU work and stage-boundary relayouts).
#
# conv2 (3x3, stride 1, pad 1) runs as 9 row-shifted matmuls on the
# flattened [N*H*W, F] activation: shifting by (dy-1)*W + (dx-1) rows
# aligns neighbor pixels; rows whose (h, w) neighbors fall outside the
# image are zero-masked (iota-derived masks), which also neutralizes
# pltpu.roll's wraparound rows.  All 9 shifted operands hit the MXU as
# plain [M, F] @ [F, F] dots with f32 accumulation.

# Mosaic's scoped-stack allocation runs ~2x this static estimate (extra
# live temporaries in the unrolled 9-tap loop), so budget well under the
# ~16 MB/core ceiling.  At 8 MB: stage 2 runs bn=1, stage 3 bn=2; stages 1
# and 4 (11.6 MB/image and 8.7 MB resident weights) fall back to XLA.
_BLOCK_VMEM_BUDGET = 8 * 1024 * 1024


def _bottleneck_kernel(x_ref, w1_ref, m1_ref, a1_ref, w2_ref, m2_ref,
                       a2_ref, w3_ref, m3_ref, a3_ref, o_ref, *, h, w):
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    x = x_ref[...]                     # [M, C] storage dtype
    m = x.shape[0]
    feats = w1_ref.shape[1]

    # conv1 1x1 + bn1 + relu; a1 stays f32 — Mosaic's rotate only supports
    # 32-bit data, and the roll below is a row shift
    acc = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    a1 = jnp.maximum(acc * m1_ref[...] + a1_ref[...], 0.0)

    # conv2 3x3 (stride 1, pad 1) as 9 shifted matmuls
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    w_idx = row % w
    h_idx = (row // w) % h
    acc2 = jnp.zeros((m, feats), f32)
    for dy in range(3):
        ok_h = jnp.logical_and(h_idx + (dy - 1) >= 0, h_idx + (dy - 1) < h)
        for dx in range(3):
            off = (dy - 1) * w + (dx - 1)
            ok = jnp.logical_and(
                ok_h, jnp.logical_and(w_idx + (dx - 1) >= 0,
                                      w_idx + (dx - 1) < w))
            # shifted[r] = a1[r + off]; wraparound rows are always masked
            shifted = pltpu.roll(a1, -off % m, 0) if off else a1
            shifted = jnp.where(ok, shifted, 0).astype(x.dtype)
            acc2 = acc2 + jax.lax.dot_general(
                shifted, w2_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
    a2 = jnp.maximum(acc2 * m2_ref[...] + a2_ref[...], 0.0).astype(x.dtype)

    # conv3 1x1 + bn3 + residual(x) + relu
    acc3 = jax.lax.dot_general(a2, w3_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=f32)
    y = acc3 * m3_ref[...] + a3_ref[...] + x.astype(f32)
    o_ref[...] = jnp.maximum(y, 0.0).astype(o_ref.dtype)


def block_images(n: int, h: int, w: int, c: int, feats: int):
    """Images per program: largest divisor of n whose buffers fit the VMEM
    budget AND whose row tile (bn*h*w) satisfies Mosaic's 8-sublane rule.

    Returns None when no valid tiling exists (e.g. ResNet stage 4's 49
    rows/image with 8.7 MB of resident weights) — callers fall back to the
    XLA path for that block.
    """
    weights = 2 * (2 * c * feats + 9 * feats * feats)
    # per image: x + out (bf16, double-buffered by the pipeline) + f32
    # conv3 accumulator + ~3 F-wide bf16 temporaries + f32 conv2 accumulator
    per_img = h * w * (2 * c * 4 + 4 * c + 2 * feats * 3 + 4 * feats)
    best = None
    for bn in range(1, n + 1):
        if n % bn or (bn * h * w) % 8:
            continue
        if weights + bn * per_img <= _BLOCK_VMEM_BUDGET:
            best = bn
    return best


def _bottleneck_ref(x2, w1, mul1, add1, w2, mul2, add2, w3, mul3, add3,
                    n, h, w):
    """Unfused XLA composition of the same math (backward path + tests)."""
    c = x2.shape[1]
    feats = w1.shape[1]
    a1 = jnp.maximum((x2 @ w1).astype(jnp.float32) * mul1 + add1, 0.0) \
        .astype(x2.dtype)
    a1 = a1.reshape(n, h, w, feats)
    k2 = w2.reshape(3, 3, feats, feats)
    conv = jax.lax.conv_general_dilated(
        a1, k2.astype(a1.dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    a2 = jnp.maximum(conv * mul2 + add2, 0.0).astype(x2.dtype) \
        .reshape(n * h * w, feats)
    y = (a2 @ w3).astype(jnp.float32) * mul3 + add3 + x2.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_bottleneck(x2: Array, w1: Array, mul1: Array, add1: Array,
                     w2: Array, mul2: Array, add2: Array,
                     w3: Array, mul3: Array, add3: Array,
                     n: int = 1, h: int = 1, w: int = 1,
                     interpret: bool = False) -> Array:
    """One ResNet bottleneck block (stride 1, identity shortcut), fused.

    x2: [n*h*w, C] flattened NHWC rows; w1 [C, F]; w2 [9, F, F] (the 3x3
    kernel's HW taps flattened, HWIO order); w3 [F, C]; mul*/add* f32 BN
    affines.  Returns relu(bn3(conv3(relu(bn2(conv2(relu(bn1(conv1(x))))))))
    + x) as [n*h*w, C].  Backward (fine-tune-CNN path only) is the exact
    autodiff of the unfused XLA composition.
    """
    return _bneck_fwd(x2, w1, mul1, add1, w2, mul2, add2, w3, mul3, add3,
                      n, h, w, interpret)[0]


def _bneck_fwd(x2, w1, mul1, add1, w2, mul2, add2, w3, mul3, add3,
               n, h, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = x2.shape[1]
    feats = w1.shape[1]
    bn = block_images(n, h, w, c, feats)
    assert bn is not None, (n, h, w, c, feats)
    tm = bn * h * w
    row = lambda i: (i, 0)
    const2 = lambda i: (0, 0)
    const3 = lambda i: (0, 0, 0)

    def vec(a):
        return a.reshape(1, -1).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_bottleneck_kernel, h=h, w=w),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((tm, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, feats), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((9, feats, feats), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, feats), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((feats, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        out_specs=pl.BlockSpec((tm, c), row, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=15 * 1024 * 1024),
        interpret=interpret,
    )(x2, w1.astype(x2.dtype), vec(mul1), vec(add1), w2.astype(x2.dtype),
      vec(mul2), vec(add2), w3.astype(x2.dtype), vec(mul3), vec(add3))
    return out, (x2, w1, mul1, add1, w2, mul2, add2, w3, mul3, add3)


def _bneck_bwd(n, h, w, interpret, res, g):
    args = res
    _, vjp = jax.vjp(
        lambda *a: _bottleneck_ref(*a, n, h, w), *args)
    return vjp(g)


fused_bottleneck.defvjp(_bneck_fwd, _bneck_bwd)


# ---------------------------------------------------------------------------
# Backbone runner: VisualFeatures-compatible forward through the kernels.
# ---------------------------------------------------------------------------

def _affine(bn, eps: float = 1e-5):
    """FrozenBatchNorm (models/resnet.py) affine factors, f32."""
    mul = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    return mul, bn["bias"] - bn["mean"] * mul


def _bn_relu(x, bn, relu: bool = True):
    mul, add = _affine(bn)
    y = x * mul.astype(x.dtype) + add.astype(x.dtype)
    return jax.nn.relu(y) if relu else y


def _conv(x, kernel, stride: int):
    """NHWC conv matching models.resnet._conv (same-ish padding k//2)."""
    kh = kernel.shape[0]
    pad = kh // 2
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bottleneck_xla_block(p, x, stride: int, downsample: bool):
    """Pure-XLA bottleneck (models.resnet.Bottleneck math) for blocks the
    kernel does not cover (strided block 0, unfused stages)."""
    residual = x
    y = _bn_relu(_conv(x, p["conv1"]["kernel"], 1), p["bn1"])
    y = _bn_relu(_conv(y, p["conv2"]["kernel"], stride), p["bn2"])
    y = _bn_relu(_conv(y, p["conv3"]["kernel"], 1), p["bn3"], relu=False)
    if downsample:
        residual = _bn_relu(_conv(x, p["ds_conv"]["kernel"], stride),
                            p["ds_bn"], relu=False)
    return jax.nn.relu(y + residual)


def _block_args(p):
    """Bottleneck param tree -> fused_bottleneck weight/affine args."""
    w1 = p["conv1"]["kernel"]
    c, feats = w1.shape[-2], w1.shape[-1]
    m1, a1 = _affine(p["bn1"])
    m2, a2 = _affine(p["bn2"])
    m3, a3 = _affine(p["bn3"])
    w2 = p["conv2"]["kernel"].reshape(9, feats, feats)
    w3 = p["conv3"]["kernel"].reshape(feats, c)
    return (w1.reshape(c, feats), m1, a1, w2, m2, a2, w3, m3, a3)


def run_backbone(variables, x, cfg, stages=(3,), interpret: bool = False):
    """[N, H, W, 3] normalized float -> [N, H/32, W/32, 2048].

    Mirrors models.resnet.ResNet.__call__ (stem -> 4 stages of
    bottlenecks) over the same `{"params": {"backbone": ...}}` pytree.
    Identity bottlenecks of the (1-indexed) stages in `stages` run as ONE
    `fused_bottleneck` pallas program each, activations kept as flattened
    [N*H*W, C] rows between blocks; everything else runs on XLA.
    """
    bp = variables["params"]["backbone"]
    dt = jnp.dtype(cfg.dtype)
    x = x.astype(dt)
    x = _conv(x, bp["conv1"]["kernel"], 2)
    x = _bn_relu(x, bp["bn1"])
    from flax import linen as nn
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    for stage, num_blocks in enumerate(cfg.stage_sizes):
        stride = 2 if stage > 0 else 1
        x = _bottleneck_xla_block(bp[f"layer{stage + 1}_0"], x, stride,
                                  downsample=True)
        if num_blocks == 1:
            continue
        n, h, w, c = x.shape
        feats = bp[f"layer{stage + 1}_1"]["conv1"]["kernel"].shape[-1]
        if ((stage + 1) not in stages
                or block_images(n, h, w, c, feats) is None):
            # stage not selected, or no VMEM-feasible whole-image tiling
            # (e.g. stage 4's 49 rows/image + 8.7 MB resident weights)
            for block in range(1, num_blocks):
                x = _bottleneck_xla_block(bp[f"layer{stage + 1}_{block}"],
                                          x, 1, downsample=False)
            continue
        x2 = x.reshape(n * h * w, c)
        for block in range(1, num_blocks):
            x2 = fused_bottleneck(
                x2, *_block_args(bp[f"layer{stage + 1}_{block}"]),
                n, h, w, interpret)
        x = x2.reshape(n, h, w, c)
    return x


def extract_features(variables, images, roi_images, cfg, stages=(3,),
                     interpret: bool = False):
    """One trunk pass over images+ROI crops -> (grid, pooled) features.

    images [B, I, H, W, 3], roi_images [B, I, R, H, W, 3] ->
    grid [B, I, att*att, 2048], roi [B, I, R, 2048] — the same outputs as
    VisualFeatures.grid_features / pooled_features (resnet_utils.py:24,50),
    computed in a single concatenated conv batch.
    """
    b, i = images.shape[:2]
    r = roi_images.shape[2]
    hw = images.shape[-3:]
    flat = jnp.concatenate([images.reshape((-1,) + hw),
                            roi_images.reshape((-1,) + hw)], axis=0)
    feat = run_backbone(variables, flat, cfg, stages, interpret)
    n, h, w, c = feat.shape
    att = cfg.grid_size
    gi = feat[:b * i]
    if (h, w) != (att, att):  # adaptive mean pool (224 -> 7x7 is identity)
        assert h % att == 0 and w % att == 0, (h, w, att)
        gi = gi.reshape(b * i, att, h // att, att, w // att, c).mean(axis=(2, 4))
    grid = gi.reshape(b, i, att * att, c)
    roi = feat[b * i:].mean(axis=(1, 2)).reshape(b, i, r, c)
    return grid, roi


def _main():
    """Micro-bench: XLA vs fused visual extraction on the real chip."""
    import argparse
    import time

    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="3",
                    help="comma list of stages to fuse, e.g. '3' or '2,3'")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    stages = tuple(int(s) for s in args.stages.split(",") if s)

    from macsa_tpu.config import ResNetConfig
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.common import jit_init

    cfg = ResNetConfig()
    visual = VisualFeatures(cfg)
    key = jax.random.PRNGKey(0)
    b, i, r = args.batch, 7, 4
    imgs = jax.random.normal(key, (b, i, 224, 224, 3), jnp.bfloat16)
    rois = jax.random.normal(key, (b, i, r, 224, 224, 3), jnp.bfloat16)
    variables = jit_init(visual, key, imgs[:1, :1])

    def xla_fn(v, im, ro):
        g = visual.apply(v, im, method=VisualFeatures.grid_features)
        p = visual.apply(v, ro, method=VisualFeatures.pooled_features)
        return g.sum() + p.sum()

    def fused_fn(v, im, ro):
        g, p = extract_features(v, im, ro, cfg, stages)
        return g.sum() + p.sum()

    for name, fn in [("xla", xla_fn), (f"fused{stages}", fused_fn)]:
        f = jax.jit(fn)
        out = f(variables, imgs, rois)
        float(out)  # compile + first step
        t0 = time.time()
        for _ in range(args.steps):
            out = f(variables, imgs, rois)
        float(out)
        dt = (time.time() - t0) / args.steps
        print(f"{name}: {dt * 1e3:.1f} ms/step "
              f"({b * i / dt:.0f} image-text pairs/s-equivalent)")


if __name__ == "__main__":
    _main()
