"""REAL multi-process mesh validation (the multi-host story, executed).

Unlike the single-process (dcn, data) simulation in the dryrun, this spawns
two OS processes, wires them with ``jax.distributed.initialize`` (Gloo
collectives across processes — the CPU analogue of DCN), builds the sharded
indexes over the 2x4 global mesh, and verifies search results against a
local oracle in each process. This is the engine path a 2-host TPU pod
slice would execute, minus only the transport.
"""

import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{{port}}", num_processes=2,
    process_id=proc_id)
import numpy as np
from semcode_tpu.parallel.mesh import make_mesh
from semcode_tpu.index.flat import FlatIndex
from semcode_tpu.index.ivf import IVFIndex

mesh = make_mesh((2, 4), ("dcn", "data"))
rng = np.random.default_rng(42)  # identical inputs on every process
x = rng.standard_normal((2048, 64)).astype(np.float32)
q = x[:8] + 0.01 * rng.standard_normal((8, 64)).astype(np.float32)
tags = (np.arange(2048) % 2).astype(np.int32)

flat = FlatIndex(64, metric="ip", dtype="float32", mesh=mesh)
flat.add(x, tags=tags)
_, ids = flat.search(q, k=5)
oracle = np.argsort(-(q @ x.T), axis=1)[:, :5]
assert np.array_equal(np.sort(ids, 1), np.sort(oracle, 1)), "flat mismatch"
_, fids = flat.search(q, k=5, allow_tags=[1])
assert (tags[fids.ravel()] == 1).all(), "filter leak"

ivf = IVFIndex(64, nlist=16, nprobe=16, metric="ip", dtype="int8", mesh=mesh)
ivf.add(x)
_, iids = ivf.search(q, k=5)
assert np.array_equal(iids[:, 0], oracle[:, 0]), "ivf top-1 mismatch"

# DP x TP contrastive training step with cross-process GSPMD collectives
# (incl. the in-batch-negatives all-gather); loss must agree bit-for-bit
from semcode_tpu.models.encoder import EncoderConfig
from semcode_tpu.models.train import ContrastiveTrainer

tmesh = make_mesh((4, 2), ("data", "model"))
cfg = EncoderConfig.preset("mini", max_len=32)
trainer = ContrastiveTrainer(cfg, tmesh)
params, opt_state = trainer.init_state(jax.random.PRNGKey(0), seq_len=32)
batch = {{
    "anchor_ids": rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32),
    "anchor_mask": np.ones((8, 32), np.int32),
    "pos_ids": rng.integers(0, cfg.vocab_size, (8, 32)).astype(np.int32),
    "pos_mask": np.ones((8, 32), np.int32),
}}
params, opt_state, metrics = trainer.train_step(params, opt_state, batch)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
print(f"WORKER_OK loss={{loss:.6f}}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        return s.getsockname()[1]


def test_engine_on_a_real_two_process_mesh(tmp_path):
    # bounded by the communicate() timeout below; the free-port probe has a
    # small reuse race, so the whole spawn is retried once on coordinator
    # bind failure
    for attempt in range(2):
        port = _free_port()
        if _spawn_and_check(tmp_path, port, final=attempt == 1):
            return


def _spawn_and_check(tmp_path, port: int, final: bool) -> bool:
    code = WORKER.format(repo=str(REPO))
    env = {
        k: v
        for k, v in __import__("os").environ.items()
        # children must pick their own platform/device topology
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=tmp_path,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    if not final and any(
        p.returncode != 0 and "bind" in out.lower() for p, out in zip(procs, outs)
    ):
        return False  # port race: retry once with a fresh port
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-2500:]}"
        ok_lines = [ln for ln in out.splitlines() if ln.startswith("WORKER_OK")]
        assert ok_lines, out[-2500:]
        losses.append(ok_lines[0])
    # both controllers computed the identical training loss
    assert losses[0] == losses[1], losses
    return True
