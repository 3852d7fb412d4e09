"""True multi-process SPMD test (2 processes x 2 CPU devices).

The reference was only ever exercised as a real 2-GPU torchrun job with no
simulated backend (SURVEY.md §4); here the multi-host path — per-host data
shards assembled with `make_array_from_process_local_data`, XLA-inserted
gradient all-reduce over the dp axis, `fetch_global` eval gather — runs as an
actual 2-process `jax.distributed` job over Gloo CPU collectives, and the
training loss must match a single-process run on the same global batch.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
role = sys.argv[1]            # "dist:<pid>" or "single"
port = sys.argv[2]
import jax
if role.startswith("dist"):
    pid = int(role.split(":")[1])
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from macsa_tpu.config import small_test_configs
from macsa_tpu.models.fcmf import FCMF
from macsa_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from macsa_tpu.train.optim import linear_warmup_schedule, make_adamw
from macsa_tpu.train.state import TrainState

MODEL, TEXT, CFG, DEC = small_test_configs()
assert jax.device_count() == 4, jax.devices()
mesh = make_mesh()

B = 4  # global batch
rng = np.random.default_rng(0)
l = CFG.max_text_len
batch = {
    "input_ids": rng.integers(2, TEXT.vocab_size, size=(B, 6, l)).astype(np.int32),
    "token_type_ids": np.zeros((B, 6, l), np.int32),
    "attention_mask": np.ones((B, 6, l), np.int32),
    "added_mask": np.ones((B, 6, l + CFG.num_patches), np.int32),
    "labels": rng.integers(0, 4, size=(B, 6)).astype(np.int32),
    "grid": rng.normal(size=(B, CFG.num_imgs, CFG.num_patches,
                             CFG.visual_feat_dim)).astype(np.float32),
    "roi": rng.normal(size=(B, CFG.num_imgs, CFG.num_roi,
                            CFG.visual_feat_dim)).astype(np.float32),
    "roi_coors": rng.uniform(0, 1, size=(B, CFG.num_imgs, CFG.num_roi,
                                         4)).astype(np.float32),
}
if role.startswith("dist"):  # this host's contiguous half of the global batch
    pid = jax.process_index()
    batch = {k: v[pid * 2:(pid + 1) * 2] for k, v in batch.items()}

model = FCMF(CFG)
params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["input_ids"][:1, 0]),
                    jnp.asarray(batch["grid"][:1]), jnp.asarray(batch["roi"][:1]),
                    jnp.asarray(batch["roi_coors"][:1]), None,
                    jnp.asarray(batch["attention_mask"][:1, 0]),
                    jnp.asarray(batch["added_mask"][:1, 0]))["params"]
tx = make_adamw(linear_warmup_schedule(1e-3, 2, 100))
state = TrainState.create(params, {}, tx)
state = replicate(state, mesh)

from jax.sharding import NamedSharding, PartitionSpec as P
repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("dp"))

def step(state, b, rng_key):
    def loss_fn(p):
        bb, a = b["input_ids"].shape[:2]
        fold = lambda x: x.reshape((bb * a,) + x.shape[2:])
        tile = lambda x: jnp.repeat(x, a, axis=0)
        logits = model.apply({"params": p}, fold(b["input_ids"]),
                             tile(b["grid"]), tile(b["roi"]),
                             tile(b["roi_coors"]), fold(b["token_type_ids"]),
                             fold(b["attention_mask"]), fold(b["added_mask"]),
                             deterministic=True).reshape(bb, a, -1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, b["labels"][..., None], -1)[..., 0]
        return ce.mean(axis=0).sum()
    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads), loss

jstep = jax.jit(step, in_shardings=(repl, data, repl),
                out_shardings=(repl, repl))
sb = shard_batch(batch, mesh)
key = jax.random.PRNGKey(0)
losses = []
for _ in range(3):
    state, loss = jstep(state, sb, key)
    losses.append(float(loss))
print("LOSSES", " ".join(f"{x:.6f}" for x in losses))
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip the TPU plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    return env


def _parse(out):
    for line in out.splitlines():
        if line.startswith("LOSSES"):
            return [float(x) for x in line.split()[1:]]
    raise AssertionError(f"no LOSSES line in:\n{out}")


@pytest.mark.slow
def test_two_process_spmd_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": REPO})
    port = _free_port()

    single = subprocess.run(
        [sys.executable, str(worker), "single", str(port)],
        env=_env(4), capture_output=True, text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-3000:]
    ref = _parse(single.stdout)

    procs = [subprocess.Popen(
        [sys.executable, str(worker), f"dist:{i}", str(port)],
        env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
    got0, got1 = _parse(outs[0][0]), _parse(outs[1][0])

    assert ref[0] > ref[-1], f"loss should decrease: {ref}"
    np.testing.assert_allclose(got0, got1, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got0, ref, rtol=0, atol=2e-4)
