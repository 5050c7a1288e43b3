"""JSON repository registry.

Parity with the reference registry (/root/reference/src/semcode/storage/
registry.py:21-74): a catalogue at ``workspace_root/registry.json`` mapping
repo name to its record, loaded on init, persisted on every mutation, and
defensive against corrupt files.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

from ..logger import get_logger
from ..settings import AppSettings, settings as default_settings

log = get_logger("storage.registry")


@dataclass
class RepositoryRecord:
    name: str
    revision: Optional[str] = None
    languages: List[str] = field(default_factory=list)
    language_summary: Optional[str] = None
    chunk_count: Optional[int] = None
    collection: Optional[str] = None  # index namespace (was milvus_collection)


class RepositoryRegistry:
    def __init__(
        self,
        registry_path: Optional[Path] = None,
        *,
        config: Optional[AppSettings] = None,
    ) -> None:
        config = config or default_settings
        self.path = Path(
            registry_path or Path(config.workspace_root) / "registry.json"
        )
        self._records: Dict[str, RepositoryRecord] = {}
        self._load()

    def _load(self) -> None:
        if not self.path.exists():
            return
        try:
            raw = json.loads(self.path.read_text(encoding="utf-8"))
            self._records = {
                name: RepositoryRecord(**data) for name, data in raw.items()
            }
        except (json.JSONDecodeError, TypeError, ValueError) as exc:
            log.warning("registry_corrupt", path=str(self.path), error=str(exc))
            self._records = {}

    def _persist(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        payload = {name: asdict(rec) for name, rec in self._records.items()}
        tmp = self.path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(payload, indent=2), encoding="utf-8")
        tmp.replace(self.path)

    def register(self, record: RepositoryRecord) -> None:
        self._records[record.name] = record
        self._persist()

    def remove(self, name: str) -> bool:
        if name in self._records:
            del self._records[name]
            self._persist()
            return True
        return False

    def get(self, name: str) -> Optional[RepositoryRecord]:
        return self._records.get(name)

    def list(self) -> List[RepositoryRecord]:
        return sorted(self._records.values(), key=lambda r: r.name)
