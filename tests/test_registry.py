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
