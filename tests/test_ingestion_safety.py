"""Repo-name validation: names flow from unauthenticated API bodies into
workspace paths and (with force=true) into rmtree — traversal must be
impossible (round-1 advisor finding; the reference shares the flaw)."""



import pytest

from semcode_tpu.ingestion.manager import (
    RepositoryIngestionManager,
    validate_repo_name,
)
from semcode_tpu.settings import AppSettings


@pytest.mark.parametrize(
    "bad",
    ["../../x", "..", ".", "", "a/b", "a\\b", ".hidden", "-dash", "a b", "a\x00b"],
)
def test_bad_repo_names_rejected(bad):
    with pytest.raises(ValueError):
        validate_repo_name(bad)


@pytest.mark.parametrize("good", ["demo", "My-Repo_1.2", "a", "x" * 64])
def test_good_repo_names_accepted(good):
    assert validate_repo_name(good) == good


def test_ingest_refuses_traversal(tmp_path):
    victim = tmp_path / "victim"
    victim.mkdir()
    (victim / "data.txt").write_text("precious")
    ws = tmp_path / "ws"
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.py").write_text("x = 1\n")
    mgr = RepositoryIngestionManager(
        ws, config=AppSettings(workspace_root=ws)
    )
    with pytest.raises(ValueError):
        mgr.ingest_sources([src], "../victim", force=True)
    assert (victim / "data.txt").exists(), "traversal must not delete anything"
    # normal ingest still works
    meta = mgr.ingest_sources([src], "demo")
    assert meta.path == ws / "demo" and (ws / "demo" / "src" / "a.py").exists()


def test_ingest_accepts_bare_path_source(tmp_path):
    """A single str/Path source (a common library-caller slip) must plan
    THAT path — iterating a bare string as a sequence would walk its
    characters, and '/root/...' starts with '/': an accidental plan of
    the whole filesystem."""
    ws = tmp_path / "ws"
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.py").write_text("x = 1\n")
    mgr = RepositoryIngestionManager(ws, config=AppSettings(workspace_root=ws))
    meta = mgr.ingest_sources(str(src), "bare")
    assert meta.name == "bare"
    assert (ws / "bare" / "src" / "a.py").exists()


def test_ingest_tolerates_vanishing_files(tmp_path, monkeypatch):
    """Files that disappear between scandir and stat (build outputs,
    editor temp files) are skipped, not fatal."""
    import os as _os

    ws = tmp_path / "ws"
    src = tmp_path / "src"
    src.mkdir()
    (src / "keep.py").write_text("x = 1\n")
    (src / "vanish.py").write_text("y = 2\n")

    real_scandir = _os.scandir

    class _Vanishing:
        def __init__(self, entry):
            self._e = entry

        def __getattr__(self, name):
            return getattr(self._e, name)

        def stat(self, **kw):
            raise FileNotFoundError(self._e.path)

    def scandir(path):
        for e in real_scandir(path):
            yield _Vanishing(e) if e.name == "vanish.py" else e

    monkeypatch.setattr(
        "semcode_tpu.ingestion.manager.os.scandir", scandir
    )
    mgr = RepositoryIngestionManager(ws, config=AppSettings(workspace_root=ws))
    plan = mgr.plan([src], "demo")
    names = [it.src.name for it in plan.items]
    assert "keep.py" in names and "vanish.py" not in names
