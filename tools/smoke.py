"""End-to-end CPU-mesh smoke: ingest -> incremental re-ingest -> filtered
query -> chunks listing -> compact -> stats. Used by `make smoke`."""
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["SEMCODE_WORKSPACE_ROOT"] = tempfile.mkdtemp(prefix="semcode_smoke_")
import jax

jax.config.update("jax_platforms", "cpu")
from semcode_tpu.cli import main  # noqa: E402

steps = [
    ["ingest", "--name", "self", "--include", "semcode_tpu/index",
     "--root", ".", "--yes"],
    ["ingest", "--name", "self", "--include", "semcode_tpu/index",
     "--root", ".", "--yes"],  # incremental: 0 embedded
    ["query", "lock-free device snapshot", "--repo", "self", "--top-k", "3"],
    ["chunks", "--repo", "self", "--limit", "5"],
    ["compact"],
    ["stats"],
]
for args in steps:
    rc = main(args)
    if rc != 0:
        print(f"SMOKE FAILED at {args[:2]} rc={rc}", file=sys.stderr)
        sys.exit(rc)
print("SMOKE OK")
