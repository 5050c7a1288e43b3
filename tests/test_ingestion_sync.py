"""Plan/execute mirror-sync ingestion (semcode_tpu/ingestion/manager.py).

The reference re-copies the whole tree on every ingest; this manager plans a
manifest first and then syncs incrementally — unchanged files are reused,
vanished files are pruned.
"""

import os
import time

import pytest

from semcode_tpu.ingestion.manager import (
    RepositoryIngestionManager,
    compile_ignore,
)
from semcode_tpu.settings import AppSettings


@pytest.fixture
def mgr(tmp_path):
    cfg = AppSettings(workspace_root=str(tmp_path / "ws"))
    return RepositoryIngestionManager(config=cfg)


@pytest.fixture
def src(tmp_path):
    root = tmp_path / "proj"
    (root / "pkg").mkdir(parents=True)
    (root / "pkg" / "a.py").write_text("def a():\n    return 1\n")
    (root / "pkg" / "b.cpp").write_text("int b() { return 2; }\n")
    (root / "node_modules").mkdir()
    (root / "node_modules" / "x.js").write_text("ignored")
    return root


def test_plan_manifest_and_languages(mgr, src):
    plan = mgr.plan([src], "demo")
    rel = sorted(str(it.dst.relative_to(mgr.workspace / "demo")) for it in plan.items)
    assert rel == ["proj/pkg/a.py", "proj/pkg/b.cpp"]
    assert plan.ignored >= 1  # node_modules dropped during the walk
    assert plan.languages() == ["cpp", "python"]
    assert plan.total_bytes == sum(it.size for it in plan.items)


def test_incremental_sync_reuses_unchanged_files(mgr, src):
    mgr.ingest_sources([src], "demo")
    copied = mgr.workspace / "demo" / "proj" / "pkg" / "a.py"
    first_mtime = copied.stat().st_mtime_ns

    # re-ingest without touching sources: nothing should be re-copied
    time.sleep(0.01)
    mgr.ingest_sources([src], "demo")
    assert copied.stat().st_mtime_ns == first_mtime

    # touch one source: only that file refreshes
    time.sleep(0.01)
    (src / "pkg" / "a.py").write_text("def a():\n    return 42\n")
    mgr.ingest_sources([src], "demo")
    assert copied.read_text().endswith("return 42\n")
    b = mgr.workspace / "demo" / "proj" / "pkg" / "b.cpp"
    assert b.stat().st_mtime_ns == os.stat(src / "pkg" / "b.cpp").st_mtime_ns


def test_sync_prunes_vanished_files(mgr, src):
    extra = src / "pkg" / "gone.py"
    extra.write_text("x = 1\n")
    mgr.ingest_sources([src], "demo")
    mirrored = mgr.workspace / "demo" / "proj" / "pkg" / "gone.py"
    assert mirrored.exists()

    extra.unlink()
    mgr.ingest_sources([src], "demo")
    assert not mirrored.exists()


def test_force_does_full_refresh(mgr, src):
    mgr.ingest_sources([src], "demo")
    stray = mgr.workspace / "demo" / "stray.txt"
    stray.write_text("leftover")
    meta = mgr.ingest_sources([src], "demo", force=True)
    assert not stray.exists()
    assert meta.languages == ["cpp", "python"]


def test_copy_callback_sees_every_planned_file(mgr, src):
    seen = []
    mgr.ingest_sources([src], "demo", copy_callback=seen.append)
    assert len(seen) == 2
    assert all(p.is_file() for p in seen)


def test_compile_ignore_matches_fnmatch_semantics():
    ignored = compile_ignore([".*", "build*", "node_modules"])
    assert ignored(".git") and ignored("build-debug") and ignored("node_modules")
    assert not ignored("src") and not ignored("rebuild")


def test_dir_symlink_skipped_file_symlink_materialized(mgr, tmp_path, src):
    loop = src / "loop"
    loop.symlink_to(src)  # cycle: must not recurse
    real = tmp_path / "real.py"
    real.write_text("y = 2\n")
    (src / "pkg" / "link.py").symlink_to(real)
    plan = mgr.plan([src], "demo")
    rel = sorted(str(it.dst) for it in plan.items)
    assert not any("loop" in r for r in rel)
    meta = mgr.ingest_sources([src], "demo")
    copy = meta.path / "proj" / "pkg" / "link.py"
    assert copy.read_text() == "y = 2\n" and not copy.is_symlink()


def test_path_type_change_file_to_dir_and_back(mgr, src):
    """A refactor can turn file 'utils' into package 'utils/' (or back);
    the mirror sync must replace the stale entry, not copy INTO a stale
    directory or crash on mkdir over a stale file."""
    (src / "pkg" / "utils.py").unlink(missing_ok=True)
    (src / "utils").write_text("def u():\n    return 1\n")
    meta = mgr.ingest_sources([src], "demo")
    mirror = meta.path / "proj"
    assert (mirror / "utils").is_file()

    # file -> directory
    (src / "utils").unlink()
    (src / "utils").mkdir()
    (src / "utils" / "__init__.py").write_text("def u2():\n    return 2\n")
    meta = mgr.ingest_sources([src], "demo")
    assert (mirror / "utils").is_dir()
    assert (mirror / "utils" / "__init__.py").read_text().startswith("def u2")

    # directory -> file again
    import shutil as _sh

    _sh.rmtree(src / "utils")
    (src / "utils").write_text("def u3():\n    return 3\n")
    meta = mgr.ingest_sources([src], "demo")
    assert (mirror / "utils").is_file()
    assert (mirror / "utils").read_text().startswith("def u3")
