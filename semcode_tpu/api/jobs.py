"""In-memory async job tracking.

Parity with the reference JobManager (/root/reference/src/semcode/api/
jobs.py:17-91): thread-safe registry of ``JobInfo`` records with
status/stage/progress updates written by ingest callbacks and polled via the
jobs endpoints.
"""

from __future__ import annotations

import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


@dataclass
class JobInfo:
    id: str
    type: str
    status: str = "queued"  # queued | running | completed | failed
    stage: Optional[str] = None
    progress: Dict[str, Any] = field(default_factory=dict)
    result: Optional[Dict[str, Any]] = None
    error: Optional[str] = None
    metadata: Dict[str, Any] = field(default_factory=dict)
    created_at: float = field(default_factory=time.time)
    updated_at: float = field(default_factory=time.time)

    def duration_ms(self) -> float:
        return (self.updated_at - self.created_at) * 1000.0


class JobManager:
    def __init__(self) -> None:
        self._jobs: Dict[str, JobInfo] = {}
        self._lock = threading.Lock()

    def create(
        self, job_type: str, metadata: Optional[Dict[str, Any]] = None
    ) -> JobInfo:
        job = JobInfo(id=str(uuid.uuid4()), type=job_type, metadata=metadata or {})
        with self._lock:
            self._jobs[job.id] = job
        return job

    def list(self) -> Dict[str, JobInfo]:
        with self._lock:
            return dict(self._jobs)

    def get(self, job_id: str) -> Optional[JobInfo]:
        with self._lock:
            return self._jobs.get(job_id)

    def _touch(self, job: JobInfo) -> None:
        job.updated_at = time.time()

    def set_status(
        self, job_id: str, status: str, stage: Optional[str] = None
    ) -> None:
        with self._lock:
            job = self._jobs[job_id]
            job.status = status
            if stage is not None:
                job.stage = stage
            self._touch(job)

    def update_stage(self, job_id: str, stage: str) -> None:
        with self._lock:
            job = self._jobs[job_id]
            job.stage = stage
            self._touch(job)

    def update_progress(self, job_id: str, **fields: Any) -> None:
        with self._lock:
            job = self._jobs[job_id]
            job.progress.update(fields)
            self._touch(job)

    def complete(self, job_id: str, result: Optional[Dict[str, Any]] = None) -> None:
        with self._lock:
            job = self._jobs[job_id]
            job.status = "completed"
            job.stage = "done"
            job.result = result
            self._touch(job)

    def fail(self, job_id: str, error: str) -> None:
        with self._lock:
            job = self._jobs[job_id]
            job.status = "failed"
            job.error = error
            self._touch(job)
