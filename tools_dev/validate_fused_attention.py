"""TPU-side validation of the fused-attention kernel's dropout path.

The in-kernel PRNG (`pltpu.prng_seed`) has no CPU-interpret lowering, so
these checks need a real TPU (the CI-able deterministic parity lives in
tests/test_fused_attention.py).  Checks, recorded in docs/DESIGN.md:

1. deterministic (rate=0) fused output == XLA reference
2. same seed -> identical dropout output (twice)
3. different seeds -> different outputs
4. mean over many seeds ~= deterministic output (unbiased dropout)
5. custom-VJP gradient == central finite differences THROUGH the
   in-kernel dropout mask (same seed both sides)

Usage: python tools_dev/validate_fused_attention.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from macsa_tpu.ops.fused_attention import fused_self_attention

    jax.config.update("jax_default_matmul_precision", "highest")
    rng = np.random.default_rng(0)
    b, heads, l, d = 4, 4, 40, 16
    hd = heads * d
    q, k, v = (jnp.asarray(rng.normal(size=(b, l, hd)).astype(np.float32))
               for _ in range(3))
    mask = np.zeros((b, l), np.float32)
    mask[:, -7:] = -1e9
    mask = jnp.asarray(mask)
    rate = 0.3

    def split(x):
        return x.reshape(b, l, heads, d).transpose(0, 2, 1, 3)

    def reference(q3, k3, v3):
        import math
        s = jnp.einsum("bhqd,bhkd->bhqk", split(q3), split(k3))
        s = s.astype(jnp.float32) / math.sqrt(d) + mask[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(q3.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v3))
        return o.transpose(0, 2, 1, 3).reshape(b, l, hd)

    seed0 = jnp.zeros((1,), jnp.int32)
    fused = jax.jit(lambda qq, kk, vv, s, r: fused_self_attention(
        qq, kk, vv, mask, s, heads, r, False), static_argnums=(4,))

    det = fused(q, k, v, seed0, 0.0)
    ref = reference(q, k, v)
    err = float(jnp.abs(det - ref).max())
    print(f"1. deterministic vs XLA: max|diff| = {err:.2e}")
    assert err < 1e-5

    s7 = jnp.full((1,), 7, jnp.int32)
    a = fused(q, k, v, s7, rate)
    bb = fused(q, k, v, s7, rate)
    same = bool(jnp.all(a == bb))
    print(f"2. same seed identical: {same}")
    assert same

    c = fused(q, k, v, jnp.full((1,), 8, jnp.int32), rate)
    diff = bool(jnp.any(a != c))
    print(f"3. different seed differs: {diff}")
    assert diff

    n = 64
    acc = jnp.zeros_like(det)
    for i in range(n):
        acc = acc + fused(q, k, v, jnp.full((1,), 100 + i, jnp.int32), rate)
    mean_err = float(jnp.abs(acc / n - det).max() / jnp.abs(det).max())
    print(f"4. {n}-seed mean vs deterministic: rel max diff = {mean_err:.3f}")
    assert mean_err < 0.25  # ~1/sqrt(64) Bernoulli noise on p=0.7

    # 5. finite differences through the dropout mask
    w = jnp.asarray(rng.normal(size=det.shape).astype(np.float32))
    tangent = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))
    loss = jax.jit(lambda qq: (fused_self_attention(
        qq, k, v, mask, s7, heads, rate, False) * w).sum())
    g = jax.grad(loss)(q)
    analytic = float((g * tangent).sum())
    eps = 1e-3
    fd = float((loss(q + eps * tangent) - loss(q - eps * tangent)) / (2 * eps))
    rel = abs(analytic - fd) / max(abs(fd), 1e-9)
    print(f"5. VJP vs central differences: {analytic:.4f} vs {fd:.4f} "
          f"(rel {rel:.4%})")
    assert rel < 0.01
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
