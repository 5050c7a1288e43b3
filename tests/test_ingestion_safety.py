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
