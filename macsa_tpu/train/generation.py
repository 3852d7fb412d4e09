"""Generation evaluation for Phase-1: batched decode + ROUGE + BERTScore.

The reference's eval harness is commented out but definitive for capabilities
(reference: run_pretraining_fcmf.py:376-452): per-sample beam search, then
BERTScore (visobert, num_layers=12) macro-averaged per aspect, plus ROUGE.
Here decoding is *batched* on TPU (beams folded into the batch,
macsa_tpu.models.seq2seq), ROUGE-1/-L are computed in numpy, and BERTScore
runs as a JAX eval-only forward of our own TextEncoder (greedy cosine
matching over final-layer states, idf-less F1 — the bert-score default
recipe)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def _lcs_len(a: List[str], b: List[str]) -> int:
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_scores(pred: str, ref: str) -> Dict[str, float]:
    p, r = pred.split(), ref.split()
    if not p or not r:
        return {"rouge1": 0.0, "rougeL": 0.0}
    overlap = 0
    ref_counts: Dict[str, int] = {}
    for t in r:
        ref_counts[t] = ref_counts.get(t, 0) + 1
    for t in p:
        if ref_counts.get(t, 0) > 0:
            overlap += 1
            ref_counts[t] -= 1
    prec, rec = overlap / len(p), overlap / len(r)
    r1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    lcs = _lcs_len(p, r)
    lp, lr = lcs / len(p), lcs / len(r)
    rl = 2 * lp * lr / (lp + lr) if lp + lr else 0.0
    return {"rouge1": r1, "rougeL": rl}


def bert_score_f1(cands: List[str], refs: List[str], text_encoder, params,
                  tokenizer, max_len: int = 64, batch_size: int = 16) -> float:
    """Greedy-cosine BERTScore F1 with our JAX text encoder (final layer)."""
    import jax.numpy as jnp

    def encode(texts):
        outs, masks = [], []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i:i + batch_size]
            tok = tokenizer(chunk, max_length=max_len, padding="max_length",
                            truncation=True)
            ids = jnp.asarray(tok["input_ids"], jnp.int32)
            mask = jnp.asarray(tok["attention_mask"], jnp.int32)
            seq, _ = text_encoder.apply({"params": params}, ids, None, mask)
            outs.append(np.asarray(seq, np.float32))
            masks.append(np.asarray(mask))
        return np.concatenate(outs), np.concatenate(masks)

    c_emb, c_mask = encode(cands)
    r_emb, r_mask = encode(refs)
    f1s = []
    for ce, cm, re_, rm in zip(c_emb, c_mask, r_emb, r_mask):
        ce = ce[cm.astype(bool)]
        re_ = re_[rm.astype(bool)]
        ce = ce / np.maximum(np.linalg.norm(ce, axis=-1, keepdims=True), 1e-9)
        re_ = re_ / np.maximum(np.linalg.norm(re_, axis=-1, keepdims=True), 1e-9)
        sim = ce @ re_.T
        p = sim.max(axis=1).mean()
        r = sim.max(axis=0).mean()
        f1s.append(2 * p * r / (p + r) if p + r else 0.0)
    return float(np.mean(f1s))


def evaluate_generation(model, state, visual, dataset, tokenizer,
                        batch_size: int, mesh, beam_size: int = 3,
                        max_len: int = 20, max_samples: Optional[int] = 200,
                        logger=None) -> Dict[str, float]:
    """Batched greedy (beam_size=1) or beam decode over the dev set, scored
    with ROUGE and JAX BERTScore, macro-averaged per aspect
    (run_pretraining_fcmf.py:428-440 capability)."""
    import jax
    import jax.numpy as jnp

    from macsa_tpu.data.loader import DataLoader, pad_batch
    from macsa_tpu.train.steps import (extract_visual,
                                       scanned_forward_variant,
                                       stack_text_params)

    bos_id = tokenizer.bos_token_id or tokenizer.cls_token_id or 0
    eos_id = tokenizer.eos_token_id or tokenizer.sep_token_id or 2

    # decode is forward-only: the scanned text encoder compiles this
    # (large: encoder + beam while-loop) program ~3x smaller at zero step
    # cost — the full-scale run's generation-eval compile was its single
    # biggest overhead (docs/RUNS.md stage 1)
    dec_model = scanned_forward_variant(model)
    num_layers = model.config.text.num_hidden_layers

    @jax.jit
    def decode_batch(params, visual_params, batch):
        params = stack_text_params(params, num_layers)
        grid, roi = extract_visual(visual, visual_params, batch["images"],
                                   batch["roi_images"],
                                   out_dtype=model.config.model.jnp_dtype)
        if beam_size <= 1:
            return dec_model.apply(
                {"params": params}, batch["enc_input_ids"], grid, roi,
                batch["roi_coors"], bos_id, eos_id,
                None, batch["attention_mask"], batch["added_mask"], max_len,
                method=type(model).greedy_decode)
        seqs, _ = dec_model.apply(
            {"params": params}, batch["enc_input_ids"], grid, roi,
            batch["roi_coors"], bos_id, eos_id, beam_size,
            None, batch["attention_mask"], batch["added_mask"], max_len,
            method=type(model).beam_decode)
        return seqs

    loader = DataLoader(dataset, batch_size, num_workers=8)
    per_aspect: Dict[str, List[Dict[str, float]]] = {}
    cands_all, refs_all, aspects_all = [], [], []
    seen = 0
    for batch in loader:
        if max_samples is not None and seen >= max_samples:
            break
        texts = batch.pop("text")
        batch.pop("_idx", None)
        batch.pop("orig_idx", None)
        aspects = batch.pop("target_aspect")
        labels = batch.pop("labels")
        dec_ids = batch.pop("dec_input_ids")
        b = dec_ids.shape[0]
        padded = pad_batch(batch, batch_size)
        padded.pop("pad_mask")
        seqs = np.asarray(decode_batch(state.params, state.visual_params,
                                       padded))[:b]
        for k in range(b):
            pred = tokenizer.decode([t for t in seqs[k] if t != eos_id],
                                    skip_special_tokens=True)
            ref = tokenizer.decode([t for t in dec_ids[k]
                                    if t != tokenizer.pad_token_id],
                                   skip_special_tokens=True)
            cands_all.append(pred)
            refs_all.append(ref)
            aspects_all.append(aspects[k])
            per_aspect.setdefault(aspects[k], []).append(rouge_scores(pred, ref))
        seen += b

    out: Dict[str, float] = {}
    for key in ("rouge1", "rougeL"):
        per_asp_means = [float(np.mean([s[key] for s in scores]))
                         for scores in per_aspect.values()]
        out[key] = float(np.mean(per_asp_means)) if per_asp_means else 0.0

    # BERTScore with the model's own text backbone (eval-only JAX forward)
    try:
        import dataclasses

        from macsa_tpu.models.text_encoder import (TextEncoder,
                                                   stack_layer_params)
        enc = TextEncoder(dataclasses.replace(model.config.text,
                                              scan_layers=True))
        bert_params = dict(stack_layer_params(
            state.params["encoder"]["bert"],
            model.config.text.num_hidden_layers))
        if "embeddings" in bert_params and "word_embeddings" not in \
                bert_params.get("embeddings", {}):
            import flax
            bert_params = flax.core.unfreeze(bert_params)
            bert_params["embeddings"]["word_embeddings"] = {
                "embedding": state.params["shared_embedding"]}
        scores = {}
        for asp in per_aspect:
            idx = [i for i, a in enumerate(aspects_all) if a == asp]
            scores[asp] = bert_score_f1([cands_all[i] for i in idx],
                                        [refs_all[i] for i in idx],
                                        enc, bert_params, tokenizer)
        out["bertscore_f1"] = float(np.mean(list(scores.values())))
    except Exception as e:  # BERTScore is best-effort in the harness
        if logger:
            logger.warning(f"bertscore skipped: {e}")
    return out
