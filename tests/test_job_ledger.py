"""JobLedger: event-fold semantics, restart durability, retention.

Owned design (round-2 rewrite of api/jobs.py): append-only event journal
folded into immutable snapshots; replaces the reference's volatile in-memory
registry (reference src/semcode/api/jobs.py loses jobs on restart)."""

import json

import pytest

from semcode_tpu.api.jobs import JobLedger


def test_lifecycle_fold(tmp_path):
    ledger = JobLedger()
    job = ledger.create("ingest", metadata={"name": "demo"})
    assert job.status == "queued" and job.metadata["name"] == "demo"
    ledger.set_status(job.id, "running", stage="copy")
    ledger.update_progress(job.id, files=3)
    ledger.update_progress(job.id, files=7, chunks=2)
    ledger.update_stage(job.id, "embed")
    snap = ledger.get(job.id)
    assert snap.status == "running" and snap.stage == "embed"
    assert dict(snap.progress) == {"files": 7, "chunks": 2}
    ledger.complete(job.id, {"chunk_count": 9})
    done = ledger.get(job.id)
    assert done.status == "completed" and done.result == {"chunk_count": 9}
    assert done.duration_ms() >= 0


def test_snapshots_are_immutable():
    ledger = JobLedger()
    job = ledger.create("ingest")
    ledger.set_status(job.id, "running")
    before = ledger.get(job.id)
    ledger.update_progress(job.id, files=1)
    assert dict(before.progress) == {}, "held snapshot must not mutate"
    with pytest.raises(TypeError):
        before.progress["x"] = 1  # frozen mapping


def test_terminal_states_are_sticky():
    ledger = JobLedger()
    job = ledger.create("ingest")
    ledger.fail(job.id, "boom")
    failed_at = ledger.get(job.id).updated_at
    ledger.update_progress(job.id, late_callback=True)  # no-op
    ledger.complete(job.id)  # cannot resurrect
    snap = ledger.get(job.id)
    assert snap.status == "failed" and snap.error == "boom"
    assert snap.updated_at == failed_at
    assert "late_callback" not in snap.progress


def test_unknown_job_raises():
    with pytest.raises(KeyError):
        JobLedger().set_status("nope", "running")


def test_journal_replay_restores_jobs(tmp_path):
    path = tmp_path / "jobs.jsonl"
    ledger = JobLedger(path)
    done = ledger.create("ingest", metadata={"name": "a"})
    ledger.set_status(done.id, "running")
    ledger.complete(done.id, {"chunk_count": 4})
    midflight = ledger.create("ingest", metadata={"name": "b"})
    ledger.set_status(midflight.id, "running", stage="embed")
    ledger.close()

    revived = JobLedger(path)  # simulated restart
    a = revived.get(done.id)
    assert a.status == "completed" and a.result == {"chunk_count": 4}
    assert a.metadata["name"] == "a"
    b = revived.get(midflight.id)
    assert b.status == "interrupted" and "exited" in b.error
    # the interruption verdict itself is persisted: a THIRD boot agrees
    revived.close()
    third = JobLedger(path)
    assert third.get(midflight.id).status == "interrupted"


def test_journal_tolerates_torn_tail(tmp_path):
    path = tmp_path / "jobs.jsonl"
    ledger = JobLedger(path)
    job = ledger.create("ingest")
    ledger.complete(job.id)
    ledger.close()
    with path.open("a") as f:
        f.write('{"id": "x", "kind": "crea')  # torn write from a crash
    revived = JobLedger(path)
    assert revived.get(job.id).status == "completed"


def test_progress_journal_throttled(tmp_path):
    path = tmp_path / "jobs.jsonl"
    ledger = JobLedger(path)
    job = ledger.create("ingest")
    ledger.set_status(job.id, "running")
    for i in range(200):  # burst of per-file callbacks
        ledger.update_progress(job.id, files=i)
    ledger.close()
    events = [json.loads(l) for l in path.read_text().splitlines()]
    progress_events = [e for e in events if e["kind"] == "progress"]
    assert len(progress_events) <= 2, "progress journal writes must be throttled"
    # ...but the in-memory fold saw every update
    assert JobLedger(path) .get(job.id) is not None


def test_terminal_eviction_bounds_memory():
    ledger = JobLedger(keep_terminal=5)
    ids = []
    for i in range(12):
        j = ledger.create("ingest")
        ledger.complete(j.id)
        ids.append(j.id)
    live = ledger.create("ingest")  # non-terminal: never evicted
    assert ledger.get(live.id) is not None
    terminal_kept = [i for i in ids if ledger.get(i) is not None]
    assert len(terminal_kept) == 5 and terminal_kept == ids[-5:]


def test_journal_bounded_across_restarts(tmp_path):
    """Startup compaction folds the journal to one snapshot line per job, so
    size stays bounded no matter how many events/restarts accumulate."""
    journal = tmp_path / "jobs.jsonl"
    ledger = JobLedger(journal)
    for i in range(5):
        snap = ledger.create("ingest", {"n": i})
        ledger.set_status(snap.id, "running")
        for p in range(20):
            ledger.update_progress(snap.id, copied=p)
        ledger.complete(snap.id, {"ok": True})
    ledger.close()
    lines_before = len(journal.read_text().splitlines())
    assert lines_before >= 15  # events accumulated in the live journal

    for restart in range(3):
        ledger = JobLedger(journal)
        jobs = ledger.list()
        assert len(jobs) == 5
        assert all(s.status == "completed" for s in jobs.values())
        assert all(s.result == {"ok": True} for s in jobs.values())
        ledger.close()
        # after compaction: exactly one snapshot line per job, every restart
        assert len(journal.read_text().splitlines()) == 5


def test_journal_compaction_marks_interrupted(tmp_path):
    journal = tmp_path / "jobs.jsonl"
    ledger = JobLedger(journal)
    snap = ledger.create("ingest")
    ledger.set_status(snap.id, "running", stage="copy")
    ledger.close()  # process "dies" mid-job
    ledger2 = JobLedger(journal)
    got = ledger2.get(snap.id)
    assert got is not None and got.status == "interrupted"
    ledger2.close()
    # the interrupted verdict survives the NEXT restart via the snapshot line
    ledger3 = JobLedger(journal)
    assert ledger3.get(snap.id).status == "interrupted"
    ledger3.close()
