"""Repository ingestion orchestration.

Capability parity with the reference manager
(/root/reference/src/semcode/ingestion/manager.py:24-231): copy include
directories into ``workspace/<name>`` under default+user fnmatch ignore
patterns with a per-file copy callback, detect languages by extension, iterate
chunkable sources, and drive the chunker. Differences: the chunkable-language
set is wider (JS/TS/C/markdown in addition to Python/C++) and chunk budgets
come from settings instead of a llama.cpp context window.
"""

from __future__ import annotations

import fnmatch
import re
import shutil
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

from ..chunking import CodeChunk, CodeChunker, apply_code2prompt_heuristics
from ..chunking.chunker import CHUNKABLE_SUFFIXES, LANGUAGE_BY_SUFFIX
from ..logger import get_logger
from ..settings import AppSettings, settings as default_settings

log = get_logger("ingestion")

DEFAULT_IGNORE_PATTERNS: Sequence[str] = (
    ".*",
    ".git",
    ".hg",
    ".svn",
    ".idea",
    ".vscode",
    ".DS_Store",
    "__pycache__",
    ".mypy_cache",
    ".pytest_cache",
    ".ruff_cache",
    ".venv",
    "venv",
    "node_modules",
    "build*",
    "dist",
    "tmp",
    "vcpkg_installed",
    "CMakeFiles",
)

# suffixes eligible for chunking+indexing (code files only by default; the
# docs/text suffixes in LANGUAGE_BY_SUFFIX are chunkable but opt-in)
SOURCE_SUFFIXES = tuple(
    s
    for s in CHUNKABLE_SUFFIXES
    if LANGUAGE_BY_SUFFIX[s] not in ("text", "markdown")
)

_SAFE_REPO_NAME = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]*")


def validate_repo_name(name: str) -> str:
    """Reject repo names that are not a single safe path segment.

    Repo names flow (possibly from unauthenticated API bodies) into
    ``workspace/<name>`` and, with ``force=true``, into ``shutil.rmtree`` —
    a traversal like ``../../x`` would escape the workspace and delete an
    arbitrary directory. The reference shares this flaw
    (manager.py:69-83 builds the path unvalidated); we close it instead.
    """
    name = str(name or "").strip()
    if not name or name in (".", "..") or not _SAFE_REPO_NAME.fullmatch(name):
        raise ValueError(
            "repo name must be a single path segment of "
            f"[A-Za-z0-9._-] not starting with '.', got {name!r}"
        )
    return name


@dataclass
class RepositoryMetadata:
    """Descriptor for an ingested repository (reference manager.py:47-54)."""

    name: str
    path: Path
    languages: List[str] = field(default_factory=list)
    description: Optional[str] = None


class RepositoryIngestionManager:
    """Copies sources into the workspace and produces chunks."""

    def __init__(
        self,
        workspace: Optional[Path] = None,
        *,
        config: Optional[AppSettings] = None,
    ) -> None:
        self.config = config or default_settings
        self.workspace = Path(workspace or self.config.workspace_root)
        self.workspace.mkdir(parents=True, exist_ok=True)
        self.chunker = CodeChunker(
            max_lines=self.config.chunk_max_lines,
            max_chars=self.config.chunk_max_chars,
        )
        log.info("workspace_initialized", workspace=str(self.workspace))

    # -- copy --------------------------------------------------------------------

    def ingest_sources(
        self,
        sources: Sequence[Path],
        repo_name: str,
        force: bool = False,
        ignore_dirs: Optional[Iterable[str]] = None,
        copy_callback: Optional[Callable[[Path], None]] = None,
    ) -> RepositoryMetadata:
        """Copy source dirs/files into workspace/<repo_name>."""
        if not sources:
            raise ValueError("At least one source path must be provided.")
        resolved: List[Path] = []
        for src in sources:
            src = Path(src)
            if not src.exists():
                raise FileNotFoundError(f"Source path not found: {src}")
            resolved.append(src.resolve())

        repo_name = validate_repo_name(repo_name)
        target = self.workspace / repo_name
        # belt and braces on top of the name validation: never rmtree outside
        # the workspace even if a future caller builds the path differently
        if target.resolve().parent != self.workspace.resolve():
            raise ValueError(f"repo target escapes the workspace: {target}")
        user_ignores = tuple(
            str(p).strip() for p in (ignore_dirs or []) if str(p).strip()
        )
        patterns: Tuple[str, ...] = tuple(
            dict.fromkeys((*DEFAULT_IGNORE_PATTERNS, *user_ignores))
        )

        if target.exists() and force:
            shutil.rmtree(target)
            log.warning("workspace_copy_removed", target=str(target))
        target.mkdir(parents=True, exist_ok=True)

        def _ignored(name: str) -> bool:
            return any(fnmatch.fnmatch(name, pat) for pat in patterns)

        def ignore_func(_src: str, names: Iterable[str]) -> List[str]:
            return [n for n in names if _ignored(n)]

        def copy_fn(src_path: str, dst_path: str, *, follow_symlinks: bool = True):
            shutil.copy2(src_path, dst_path, follow_symlinks=follow_symlinks)
            if copy_callback:
                copy_callback(Path(dst_path))
            return dst_path

        for src in resolved:
            if _ignored(src.name):
                log.info("skip_ignored_source", source=str(src))
                continue
            destination = target / src.name
            if destination.exists():
                if destination.is_dir():
                    shutil.rmtree(destination)
                else:
                    destination.unlink()
            if src.is_dir():
                shutil.copytree(
                    src,
                    destination,
                    ignore=ignore_func,
                    copy_function=copy_fn if copy_callback else shutil.copy2,
                )
            else:
                destination.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(src, destination)
                if copy_callback:
                    copy_callback(destination)

        meta = RepositoryMetadata(
            name=repo_name, path=target, languages=self._detect_languages(target)
        )
        log.info(
            "repository_ingested",
            repo=repo_name,
            sources=[str(s) for s in resolved],
            languages=meta.languages,
        )
        return meta

    # -- enumeration -----------------------------------------------------------------

    def list_ingested(self) -> List[RepositoryMetadata]:
        repos: List[RepositoryMetadata] = []
        if not self.workspace.exists():
            return repos
        for entry in sorted(self.workspace.iterdir()):
            if entry.is_dir() and entry.name != "index":
                repos.append(
                    RepositoryMetadata(
                        name=entry.name,
                        path=entry,
                        languages=self._detect_languages(entry),
                    )
                )
        return repos

    def iter_source_files(self, repo: RepositoryMetadata) -> Iterator[Path]:
        for path in sorted(repo.path.rglob("*")):
            if path.is_file() and path.suffix.lower() in SOURCE_SUFFIXES:
                yield path

    # -- chunking ---------------------------------------------------------------------

    def chunk_repository(
        self,
        repo: RepositoryMetadata,
        progress_callback: Optional[Callable[[Path], None]] = None,
    ) -> List[CodeChunk]:
        files = list(self.iter_source_files(repo))
        log.info("chunking_repository", repo=repo.name, files=len(files))
        chunks = self.chunker.chunk_repository(
            repo.path, files, on_file=progress_callback
        )
        refined = apply_code2prompt_heuristics(chunks)
        log.info("chunks_ready", repo=repo.name, chunks=len(refined))
        return refined

    @staticmethod
    def _detect_languages(path: Path) -> List[str]:
        languages = set()
        for file_path in path.rglob("*"):
            lang = LANGUAGE_BY_SUFFIX.get(file_path.suffix.lower())
            if lang and lang not in ("text", "markdown"):
                languages.add(lang)
        return sorted(languages)
