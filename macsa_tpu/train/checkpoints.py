"""Checkpointing: full train-state save/resume, best/last retention, and
Phase-1 -> Phase-2 encoder transfer (orbax).

Reproduces the reference's checkpoint semantics
(reference: run_multimodal_fcmf.py:40-58,316-380,554-563):
* a checkpoint carries {step/epoch, best_score, params, visual params,
  optimizer state} — everything needed to resume incl. the LR-schedule
  position (the schedule is a pure function of the step, so restoring the
  step restores the schedule; the AMP GradScaler has no TPU equivalent),
* `best` and `last` checkpoints are kept side by side (:554-563),
* cross-phase transfer loads only the encoder subtree, strict=False
  (:382-412): Phase-1 FCMFSeq2Seq params -> Phase-2 FCMF params, including
  mapping the seq2seq's tied `shared_embedding` back into the classifier's
  internal `bert/embeddings/word_embeddings` table.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import jax
import numpy as np

from macsa_tpu.train.state import TrainState


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    """Thin orbax wrapper with best/last retention."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = _ocp().StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, state: TrainState, epoch: int,
             best_score: float = 0.0) -> None:
        payload = {
            "step": state.step,
            "params": state.params,
            "visual_params": state.visual_params,
            "opt_state": state.opt_state,
            "epoch": np.asarray(epoch, np.int32),
            "best_score": np.asarray(best_score, np.float32),
        }
        path = self._path(tag)
        # Async save: orbax snapshots the arrays to host before returning,
        # then persists in the background — the (slow, multi-GB) file write
        # overlaps the next epoch's training.  One save in flight at a time;
        # every read path below waits, and drivers call finalize() after the
        # training loop so a bare --do_train run can't exit mid-write.
        self._ckptr.wait_until_finished()
        # One pipelined device->host fetch, timed: through a remote-TPU
        # tunnel this fetch IS the checkpoint cost (docs/RUNS.md stage 1
        # measured ~22 min of checkpoint overhead across 3 epochs), and
        # fetching here keeps orbax's async phase purely disk-bound.
        import logging
        import time
        t0 = time.time()
        payload = jax.device_get(payload)
        nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(payload))
        logging.getLogger("macsa_tpu.checkpoints").info(
            "checkpoint %s: device fetch %.1fs (%.2f GB)", tag,
            time.time() - t0, nbytes / 1e9)
        self._ckptr.save(path, payload, force=True)

    def finalize(self) -> None:
        """Block until any in-flight async save has fully landed on disk."""
        self._ckptr.wait_until_finished()

    def copy(self, src: str, dst: str) -> None:
        """Duplicate checkpoint `src` as `dst` with a local file copy.

        Fine-tune/pretrain epochs where the dev score improves save `best`
        and `last` with IDENTICAL payloads; re-saving fetches the multi-GB
        state from device again (minutes through a remote-TPU tunnel), while
        a disk copy takes seconds.  Atomic: copies to a tmp dir then renames.
        """
        import shutil
        self._ckptr.wait_until_finished()
        src_path, dst_path = self._path(src), self._path(dst)
        tmp = dst_path + ".copy-tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(src_path, tmp)
        if os.path.isdir(dst_path):
            shutil.rmtree(dst_path)
        os.replace(tmp, dst_path)

    def restore_params_only(self, tag: str, state: TrainState) -> TrainState:
        """Restore only `params` + `visual_params` into `state`.

        For eval-only reloads (the `--do_test` best-checkpoint reload,
        run_multimodal_fcmf.py:565-570) the optimizer moments — two more
        params-sized trees, ~2/3 of the payload — are dead weight; skipping
        them cuts checkpoint IO ~3x.
        """
        self._ckptr.wait_until_finished()
        got = restore_subtrees(self._path(tag), ("params", "visual_params"))
        return state.replace(params=got["params"],
                             visual_params=got["visual_params"])

    def restore(self, tag: str, state: TrainState) -> Tuple[TrainState, int, float]:
        """Restore into the structure of `state` -> (state, epoch, best)."""
        self._ckptr.wait_until_finished()
        template = {
            "step": state.step,
            "params": state.params,
            "visual_params": state.visual_params,
            "opt_state": state.opt_state,
            "epoch": np.asarray(0, np.int32),
            "best_score": np.asarray(0.0, np.float32),
        }
        got = self._ckptr.restore(self._path(tag), template)
        new_state = state.replace(step=got["step"], params=got["params"],
                                  visual_params=got["visual_params"],
                                  opt_state=got["opt_state"])
        return new_state, int(got["epoch"]), float(got["best_score"])

    def exists(self, tag: str) -> bool:
        self._ckptr.wait_until_finished()
        return os.path.isdir(self._path(tag))

    def save_params(self, tag: str, params: Any) -> None:
        self._ckptr.wait_until_finished()
        self._ckptr.save(self._path(tag), params, force=True)
        self._ckptr.wait_until_finished()

    def restore_params(self, tag: str, template: Any) -> Any:
        self._ckptr.wait_until_finished()
        return self._ckptr.restore(self._path(tag), template)


def restore_subtrees(path: str, keys: Sequence[str]) -> Dict[str, Any]:
    """Restore only the named top-level subtrees of an orbax checkpoint.

    A full train-state checkpoint is ~3x the params (AdamW `opt_state`
    carries two more params-sized moment trees), so params-only readers —
    the inference CLI and the Phase-1 -> Phase-2 encoder transfer
    (run_multimodal_fcmf.py:382-412) — waste most of the restore on arrays
    they immediately drop.  This reads the checkpoint's tree metadata,
    requests just the wanted subtrees via orbax partial restore, and returns
    them as numpy.  Payloads that have none of the requested keys (e.g. a
    bare params tree written by `save_params`) are restored whole.
    """
    ocp = _ocp()
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ck:
        meta = ck.metadata(path).item_metadata.tree
        present = ({k: meta[k] for k in keys if k in meta}
                   if isinstance(meta, dict) else {})
        if not present:
            return ck.restore(path)
        item = jax.tree_util.tree_map(lambda m: 0, present)
        restore_args = jax.tree_util.tree_map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), present)
        return ck.restore(path, args=ocp.args.PyTreeRestore(
            item=item, restore_args=restore_args, partial_restore=True))


def resolve_iaog_checkpoint(path: str) -> "str | None":
    """Resolve `--pretrained_iaog_path` to a concrete orbax checkpoint dir.

    Accepts either a Phase-1 output directory (containing `best`/`last`,
    preferring `best`) or a direct orbax checkpoint directory — the
    reference's flag points straight at a checkpoint file
    (run_multimodal_fcmf.py:382), so both spellings must work.  Returns None
    when no checkpoint is found.
    """
    base = os.path.abspath(path)
    if os.path.exists(os.path.join(base, "_CHECKPOINT_METADATA")):
        return base
    for tag in ("best", "last"):
        cand = os.path.join(base, tag)
        if os.path.isdir(cand):
            return cand
    return None


def transfer_encoder_params(seq2seq_params: Dict[str, Any],
                            fcmf_params: Dict[str, Any]) -> Dict[str, Any]:
    """Phase-1 -> Phase-2 knowledge transfer (run_multimodal_fcmf.py:382-412).

    Copies the `encoder` subtree of FCMFSeq2Seq params into the FCMF
    classifier params (strict=False semantics: head params keep their fresh
    init), and materializes the seq2seq's externally-tied `shared_embedding`
    as the classifier's internal word-embedding table.
    """
    import flax
    out = flax.core.unfreeze(jax.tree_util.tree_map(lambda x: x, fcmf_params))
    src_enc = seq2seq_params["encoder"]

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(out["encoder"], flax.core.unfreeze(src_enc))
    # tie-back: Phase-1 kept the token table outside the bert subtree
    if "shared_embedding" in seq2seq_params:
        emb = out["encoder"]["bert"].setdefault("embeddings", {})
        table = np.asarray(seq2seq_params["shared_embedding"])
        target = out["encoder"]["bert"]["embeddings"].get(
            "word_embeddings", {}).get("embedding")
        if target is not None and target.shape[0] != table.shape[0]:
            table = resize_embedding(table, target.shape[0])
        emb["word_embeddings"] = {"embedding": table}
    return out


def resize_embedding(table: np.ndarray, new_size: int,
                     init_std: float = 0.02, seed: int = 0) -> np.ndarray:
    """HF resize_token_embeddings equivalent (fcmf_pretraining.py:159-160):
    truncate or extend with normal(0.02) rows."""
    table = np.asarray(table)
    if new_size <= table.shape[0]:
        return table[:new_size]
    extra = np.random.default_rng(seed).normal(
        0.0, init_std, size=(new_size - table.shape[0], table.shape[1]))
    return np.concatenate([table, extra.astype(table.dtype)], axis=0)
