"""Tensor-parallel (Megatron-style) parameter sharding over the `mp` axis.

The reference has no tensor parallelism (SURVEY.md §2.4 — DDP only); this is
the optional TPU-native extension: transformer matmuls are sharded
column-/row-wise over the mesh's `mp` axis and XLA/GSPMD inserts the
collectives (all-gather for the vocab-sharded embedding take, psum after the
row-sharded second matmul) over ICI.  With mp=1 every spec degenerates to
replicated and the dp-only path is unchanged.

Rules (matched on the trailing parameter path, so they apply equally to the
params tree and to the optimizer-state mu/nu trees that mirror it):

  attention self  query/key/value kernel [H, H]   -> P(None, "mp")  (column)
                  query/key/value bias   [H]      -> P("mp")
  attention output dense kernel          [H, H]   -> P("mp", None)  (row)
  mlp intermediate_dense kernel          [H, 4H]  -> P(None, "mp")  (column)
                  intermediate_dense bias [4H]    -> P("mp")
  mlp output_dense kernel                [4H, H]  -> P("mp", None)  (row)
  word_embeddings / shared_embedding     [V, H]   -> P("mp", None)  (vocab)
  everything else                                  -> P() (replicated)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN_KERNELS = ("query", "key", "value", "intermediate_dense")
_ROW_KERNELS = ("output_dense",)


def _path_names(path) -> list:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        else:
            out.append(str(k))
    return out


def leaf_spec(path, leaf) -> P:
    """PartitionSpec for one state/param leaf by its trailing path names."""
    names = _path_names(path)
    if not names or np.ndim(leaf) == 0:
        return P()
    last = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    grand = names[-3] if len(names) >= 3 else ""

    if last == "embedding" and parent in ("word_embeddings",):
        return P("mp", None)
    if last == "shared_embedding" or parent == "shared_embedding":
        return P("mp", None)
    # scanned layer stacks (text_encoder scan_layers: "layers"; decoder
    # scan_blocks: "blocks") carry a leading [num_layers] axis on every
    # leaf: same rules, shifted right by one.
    stacked = "layers" in names or "blocks" in names
    ndim = np.ndim(leaf) - (1 if stacked else 0)
    lead = (None,) if stacked else ()
    if last == "kernel" and ndim == 2:
        if parent in _COLUMN_KERNELS:
            return P(*lead, None, "mp")
        if parent in _ROW_KERNELS:
            return P(*lead, "mp", None)
        # attention output projection: <block>/attention/output/dense/kernel
        if parent == "dense" and grand == "output":
            return P(*lead, "mp", None)
    if last == "bias" and ndim == 1:
        if parent in _COLUMN_KERNELS:
            return P(*lead, "mp")
    return P()


def state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a TrainState (params + optimizer mirrors).

    mu/nu optimizer leaves carry the same trailing path names as the params
    they track, so one rule covers both."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, leaf_spec(path, leaf)), state)


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh under the TP rules."""
    shardings = state_shardings(state, mesh)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
