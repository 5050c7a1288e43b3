"""Repository registry: persistence, corruption tolerance."""

from semcode_tpu.storage import RepositoryRecord, RepositoryRegistry


def test_register_persist_reload(tmp_path):
    path = tmp_path / "registry.json"
    reg = RepositoryRegistry(path)
    reg.register(
        RepositoryRecord(name="r1", languages=["python"], chunk_count=10)
    )
    reg.register(RepositoryRecord(name="r2", languages=["cpp"], chunk_count=5))
    reg2 = RepositoryRegistry(path)
    assert [r.name for r in reg2.list()] == ["r1", "r2"]
    assert reg2.get("r1").chunk_count == 10
    assert reg2.remove("r1") is True
    assert reg2.remove("r1") is False
    assert RepositoryRegistry(path).get("r1") is None


def test_corrupt_registry_tolerated(tmp_path):
    path = tmp_path / "registry.json"
    path.write_text("{not json!!")
    reg = RepositoryRegistry(path)
    assert reg.list() == []
    reg.register(RepositoryRecord(name="ok"))
    assert RepositoryRegistry(path).get("ok") is not None


def test_v1_bare_mapping_still_reads(tmp_path):
    import json

    path = tmp_path / "registry.json"
    path.write_text(json.dumps({"legacy": {"name": "legacy", "chunk_count": 3}}))
    reg = RepositoryRegistry(path)
    assert reg.get("legacy").chunk_count == 3
    reg.register(RepositoryRecord(name="new"))
    # re-written as the versioned envelope
    raw = json.loads(path.read_text())
    assert raw["version"] == 2 and set(raw["repos"]) == {"legacy", "new"}


def test_corrupt_file_backed_up_not_discarded(tmp_path):
    path = tmp_path / "registry.json"
    path.write_text("{not json!!")
    reg = RepositoryRegistry(path)
    assert reg.list() == []
    backup = tmp_path / "registry.json.corrupt"
    assert backup.exists() and backup.read_text() == "{not json!!"


def test_unknown_record_keys_dropped(tmp_path):
    import json

    path = tmp_path / "registry.json"
    path.write_text(json.dumps({
        "version": 3,
        "repos": {"r": {"name": "r", "future_field": True}},
    }))
    reg = RepositoryRegistry(path)
    assert reg.get("r").name == "r"


def test_register_stamps_updated_at(tmp_path):
    reg = RepositoryRegistry(tmp_path / "registry.json")
    reg.register(RepositoryRecord(name="r"))
    assert reg.get("r").updated_at and reg.get("r").updated_at.endswith("Z")


def test_concurrent_writers_merge_not_clobber(tmp_path):
    """Two registry instances (API server process + CLI process) loaded the
    same file: each register() must re-load + merge under the OS file lock,
    not replace the catalogue with its stale in-memory snapshot."""
    path = tmp_path / "registry.json"
    api = RepositoryRegistry(path)   # process 1
    cli = RepositoryRegistry(path)   # process 2: loaded BEFORE any writes
    api.register(RepositoryRecord(name="from-api", chunk_count=1))
    cli.register(RepositoryRecord(name="from-cli", chunk_count=2))
    names = [r.name for r in RepositoryRegistry(path).list()]
    assert names == ["from-api", "from-cli"]
    # remove also merges: cli removing its own repo must not resurrect state
    assert cli.remove("from-api") is True
    assert [r.name for r in RepositoryRegistry(path).list()] == ["from-cli"]
