"""Break down where the fine-tune step time goes on the real chip.

Measures, at a given batch size:
  1. full train step, per-step host fetch (what bench.py reports)
  2. full train step, tail-only fetch of the last loss (device throughput:
     loss_N depends on the whole state chain, so fetching it forces every
     prior step to finish — any gap vs (1) is per-step sync latency)
  3. extract_visual only (the two batched ResNet-152 stacks)
  4. text+fusion forward+backward only (precomputed visual features)

Usage: BENCH_BATCH=8 python tools_dev/profile_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, n, *args, fetch_each=True):
    out = fn(*args)
    last = out
    import jax
    jax.block_until_ready(jax.tree_util.tree_leaves(last)[0])
    t0 = time.time()
    for _ in range(n):
        last = fn(*args)
        if fetch_each:
            np.asarray(jax.tree_util.tree_leaves(last)[0]).ravel()[0]
    if not fetch_each:
        np.asarray(jax.tree_util.tree_leaves(last)[0]).ravel()[0]
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_batch
    from macsa_tpu.config import FCMFConfig, ModelConfig, ResNetConfig, TextEncoderConfig
    from macsa_tpu.models.fcmf import FCMF
    from macsa_tpu.models.resnet import VisualFeatures
    from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
    from macsa_tpu.train.state import TrainState
    from macsa_tpu.train.steps import (extract_visual, fcmf_forward_all_aspects,
                                       make_finetune_train_step, cross_entropy,
                                       _fold_aspects, _tile_visual)

    b = int(os.environ.get("BENCH_BATCH", "8"))
    n = int(os.environ.get("BENCH_STEPS", "5"))

    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16"),
                     text=TextEncoderConfig(dtype="bfloat16"))
    rcfg = ResNetConfig()
    model, visual = FCMF(cfg), VisualFeatures(rcfg)
    batch = make_batch(cfg, b)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    visual_params = visual.init(key, batch["images"][:1, :1])
    grid1, roi1 = extract_visual(visual, visual_params, batch["images"][:1],
                                 batch["roi_images"][:1])
    params = model.init(key, batch["input_ids"][:1, 0], grid1, roi1,
                        batch["roi_coors"][:1], None,
                        batch["attention_mask"][:1, 0],
                        batch["added_mask"][:1, 0])["params"]
    tx = make_adamw(linear_warmup_schedule(7e-5, 100, 10000),
                    head_learning_rate=linear_warmup_schedule(7e-4, 100, 10000))
    state = TrainState.create(params, visual_params, tx)
    print(f"# init {time.time() - t0:.0f}s", file=sys.stderr)

    # (3) visual extraction only
    ev = jax.jit(lambda vp, im, ri: extract_visual(visual, vp, im, ri))
    t = timed(ev, n, state.visual_params, batch["images"], batch["roi_images"])
    print(f"extract_visual            : {t * 1e3:8.1f} ms")
    grid, roi = ev(state.visual_params, batch["images"], batch["roi_images"])

    # (4) text+fusion fwd+bwd with precomputed features
    def text_loss(params, g, r, dropout_rng):
        text, bb, a = _fold_aspects(batch)
        logits = model.apply(
            {"params": params}, text["input_ids"], _tile_visual(g, a),
            _tile_visual(r, a), _tile_visual(batch["roi_coors"], a),
            text.get("token_type_ids"), text["attention_mask"],
            text["added_mask"], deterministic=False,
            rngs={"dropout": dropout_rng})
        logits = logits.reshape(bb, a, -1)
        return cross_entropy(logits, batch["labels"]).mean(axis=0).sum()

    gfn = jax.jit(jax.value_and_grad(text_loss))
    t = timed(gfn, n, state.params, grid, roi, key)
    print(f"text+fusion fwd+bwd       : {t * 1e3:8.1f} ms")

    # (1)/(2) full step
    step = make_finetune_train_step(model, visual, donate=False)
    t1 = timed(lambda s: step(s, batch, key)[1]["loss"], n, state)
    print(f"full step (fetch each)    : {t1 * 1e3:8.1f} ms")

    def chain(s, k):
        for _ in range(n):
            s, m = step(s, batch, k)
        return m["loss"]
    # chained: one dispatch burst, single tail fetch
    l = chain(state, key); np.asarray(l)
    t0 = time.time()
    l = chain(state, key); np.asarray(l)
    t2 = (time.time() - t0) / n
    print(f"full step (chained, tail) : {t2 * 1e3:8.1f} ms")
    print(f"-> per-step sync overhead : {(t1 - t2) * 1e3:8.1f} ms")
    print(f"-> pairs/s at batch {b}: fetch-each {b * cfg.num_imgs / t1:.1f}, "
          f"chained {b * cfg.num_imgs / t2:.1f}")


if __name__ == "__main__" and not os.environ.get("PROFILE_SUBMODULES"):
    main()


def submodules():
    """Time individual fusion-stack submodules fwd+bwd at bench shapes."""
    import jax
    import jax.numpy as jnp
    from macsa_tpu.config import FCMFConfig, ModelConfig, TextEncoderConfig
    from macsa_tpu.models import layers
    from macsa_tpu.models.text_encoder import TextEncoder
    from macsa_tpu.models.box_attention import BoxMultiHeadedAttention

    b = int(os.environ.get("BENCH_BATCH", "8"))
    n = int(os.environ.get("BENCH_STEPS", "10"))
    cfg = FCMFConfig(model=ModelConfig(dtype="bfloat16"),
                     text=TextEncoderConfig(dtype="bfloat16"))
    mc = cfg.model
    BA = b * 6          # folded aspect views
    BAI = BA * cfg.num_imgs  # folded image axis
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def bwd_timed(name, module, *args, method=None):
        params = module.init(key, *args)
        def loss(p, *a):
            out = module.apply(p, *a)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out.astype(jnp.float32) ** 2)
        # reduce grads to ONE scalar inside jit: the tail fetch then moves
        # 4 bytes, not a 46MB embedding-grad leaf, through the tunnel
        def gsum(p, *a):
            grads = jax.grad(loss)(p, *a)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(grads))
        g = jax.jit(gsum)
        float(g(params, *args))  # compile + warm
        t0 = time.time()
        for _ in range(n):
            out = g(params, *args)
        float(out)   # device executes enqueued programs in order
        t = (time.time() - t0) / n
        print(f"{name:28s}: {t * 1e3:8.1f} ms")

    h = mc.hidden_size
    # text encoder: [BA, 170]
    ids = jnp.asarray(rng.integers(2, cfg.text.vocab_size, (BA, 170)), jnp.int32)
    mask = jnp.ones((BA, 170), jnp.int32)
    bwd_timed("bert (12L, BA x 170)", TextEncoder(cfg.text), ids, None, mask)

    # text2img cross encoder: q=[BAI,170,h], kv=[BAI,49,h]
    q = jnp.asarray(rng.normal(size=(BAI, 170, h)), jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(BAI, 49, h)), jnp.bfloat16)
    m = layers.extend_attention_mask(jnp.ones((BAI, 49), jnp.int32),
                                     dtype=jnp.bfloat16)
    bwd_timed("text2img (BAI,170<-49)", layers.BertCrossEncoder(mc), q, kv, m)

    # mm_attention self-attn over 174 tokens
    x174 = jnp.asarray(rng.normal(size=(BAI, 174, h)), jnp.bfloat16)
    m174 = layers.extend_attention_mask(jnp.ones((BAI, 174), jnp.int32),
                                        dtype=jnp.bfloat16)
    bwd_timed("mm_attn roi (BAI,174)", layers.MultimodalEncoder(mc), x174, m174)

    # mm_attention fusion over 15 tokens
    x15 = jnp.asarray(rng.normal(size=(BA, 15, h)), jnp.bfloat16)
    m15 = layers.extend_attention_mask(jnp.ones((BA, 15), jnp.int32),
                                       dtype=jnp.bfloat16)
    bwd_timed("mm_attn fusion (BA,15)", layers.MultimodalEncoder(mc), x15, m15)

    # box attention: [BAI, 4, h]
    roi = jnp.asarray(rng.normal(size=(BAI, 4, h)), jnp.bfloat16)
    coors = jnp.asarray(rng.uniform(0, 1, (BAI, 4, 4)), jnp.float32)
    box = BoxMultiHeadedAttention(num_heads=8, d_model=h, dtype=jnp.bfloat16)
    params = box.init(key, roi, roi, roi, coors)
    g = jax.jit(jax.grad(lambda p: jnp.sum(
        box.apply(p, roi, roi, roi, coors).astype(jnp.float32) ** 2)))
    t = timed(lambda: g(params), n)
    print(f"{'box_attn (BAI,4)':28s}: {t * 1e3:8.1f} ms")


if __name__ == "__main__" and os.environ.get("PROFILE_SUBMODULES"):
    submodules()
    sys.exit(0)
