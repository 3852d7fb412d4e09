"""Host-side data loading: batching, shuffling, worker pool, prefetch,
epoch-persistent feature caching, and per-host sharding.

Replaces the reference's torch DataLoader + DistributedSampler
(reference: run_multimodal_fcmf.py:421-424, run_pretraining_fcmf.py:281) and
fixes its two throughput sinks: (a) images are decoded/resized/cropped again
every epoch (vimacsa_dataset re-reads in __getitem__) — here samples are
memoized after first touch when `cache=True`; (b) batches are prefetched on a
background thread pool so host work overlaps device steps.

Also reproduces the *capability* of per-host data sharding (the reference
double-shards via manual dataframe slicing + DistributedSampler,
SURVEY.md §2.4) with a single `shard(num_hosts, host_id)` slice.
"""

from __future__ import annotations

import copy
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional, Sequence

import numpy as np

Batch = Dict[str, np.ndarray]

_ARRAY_KEYS_EXCLUDED = ("text", "target_aspect")


class ThreadSafeTokenizer:
    """Per-thread tokenizer copies.

    HF *fast* tokenizers are not thread-safe (concurrent encode raises
    `RuntimeError: Already borrowed` from the Rust core); the loader's worker
    pool calls dataset.__getitem__ concurrently, so each worker thread gets
    its own lazily-deepcopied tokenizer.  Falls back to a lock if the
    tokenizer cannot be deepcopied."""

    def __init__(self, tokenizer):
        self._base = tokenizer
        self._local = threading.local()
        self._lock = threading.Lock()

    def _get(self):
        tok = getattr(self._local, "tok", None)
        if tok is None:
            try:
                tok = copy.deepcopy(self._base)
            except Exception:
                tok = None  # un-copyable: serialize through the lock
            self._local.tok = tok if tok is not None else False
            return self._local.tok
        return tok

    def __call__(self, *args, **kwargs):
        tok = self._get()
        if tok is False:
            with self._lock:
                return self._base(*args, **kwargs)
        return tok(*args, **kwargs)

    def __getattr__(self, name):  # pad_token_id, decode, ...
        return getattr(self._base, name)

    def __len__(self):
        return len(self._base)


def collate(samples: Sequence[Dict[str, Any]]) -> Batch:
    """Stack per-sample dicts into batch arrays; string fields become lists."""
    out: Dict[str, Any] = {}
    for k in samples[0]:
        if k in _ARRAY_KEYS_EXCLUDED:
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = False, num_workers: int = 8,
                 prefetch: int = 2, cache: bool = False,
                 num_hosts: int = 1, host_id: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.epoch = 0
        self._cache: Optional[dict] = {} if cache else None
        # per-host shard (contiguous slice, reference style
        # run_pretraining_fcmf.py:170-172)
        n = len(dataset)
        per_host = n // num_hosts if num_hosts > 1 else n
        self._indices = (list(range(per_host * host_id, per_host * (host_id + 1)))
                         if num_hosts > 1 else list(range(n)))

    def set_epoch(self, epoch: int) -> None:
        """DistributedSampler.set_epoch equivalent (run_multimodal_fcmf.py:428)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self._indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _get(self, i: int):
        if self._cache is not None:
            if i not in self._cache:
                self._cache[i] = self.dataset[i]
            return self._cache[i]
        return self.dataset[i]

    def __iter__(self) -> Iterator[Batch]:
        order = list(self._indices)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # Any worker exception is forwarded to the consumer and re-raised
            # there — a silently-truncated epoch is a correctness bug.
            try:
                for idxs in batches:
                    if stop.is_set():
                        return
                    samples = list(pool.map(self._get, idxs))
                    out = collate(samples)
                    # per-sample dataset indices (feature-cache keys)
                    out["_idx"] = np.asarray(idxs, np.int32)
                    q.put(out)
                q.put(None)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)


def pad_batch(batch: Batch, target: int) -> Batch:
    """Zero-pad the batch dim to `target` (static shapes for the last partial
    batch under jit); returns (padded batch incl. 'pad_mask')."""
    b = next(v for k, v in batch.items() if not isinstance(v, list)).shape[0]
    if b == target:
        out = dict(batch)
        out["pad_mask"] = np.ones((target,), np.bool_)
        return out
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            out[k] = v + [v[-1]] * (target - b)
        else:
            # "_idx" pads with -1 so feature-cache scatters drop pad rows
            fill = -1 if k == "_idx" else 0
            pad = np.full((target - b,) + v.shape[1:], fill, v.dtype)
            out[k] = np.concatenate([v, pad], axis=0)
    mask = np.zeros((target,), np.bool_)
    mask[:b] = True
    out["pad_mask"] = mask
    return out
