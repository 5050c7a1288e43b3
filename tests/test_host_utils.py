"""Logger, tracing, and CLI helper coverage."""

import logging
import time


from semcode_tpu.cli import _collect_files, _render_directory_tree
from semcode_tpu.logger import (
    configure_logging,
    get_logger,
    redirect_logging_to_file,
)
from semcode_tpu.utils.tracing import StageTimer


def test_logger_kv_rendering(capsys):
    configure_logging()
    log = get_logger("test")
    log.info("event_happened", repo="r1", chunks=5)
    err = capsys.readouterr().err
    assert "event_happened" in err
    assert "repo='r1'" in err and "chunks=5" in err


def test_logger_bind(capsys):
    configure_logging()
    log = get_logger("test").bind(job="j1")
    log.warning("stage_done", stage="copy")
    err = capsys.readouterr().err
    assert "job='j1'" in err and "stage='copy'" in err


def test_logger_file_redirect(tmp_path):
    target = tmp_path / "logs" / "ingestion.log"
    redirect_logging_to_file(target)
    get_logger("test").info("to_file", n=1)
    logging.getLogger("semcode_tpu").handlers[0].flush()
    assert "to_file" in target.read_text()
    configure_logging()  # restore console logging for other tests


def test_stage_timer_nesting():
    t = StageTimer()
    with t.stage("outer"):
        time.sleep(0.01)
        with t.stage("inner"):
            time.sleep(0.01)
    d = t.as_dict()
    assert d["outer"] >= d["inner"] >= 9.0
    t.reset()
    assert t.as_dict() == {}


def test_collect_files_and_tree(tmp_path):
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "a.py").write_text("x=1")
    (tmp_path / "src" / "b.txt").write_text("t")
    (tmp_path / "node_modules").mkdir()
    (tmp_path / "node_modules" / "junk.py").write_text("x")
    ignore = ["node_modules", ".*"]
    files = _collect_files([tmp_path], ignore)
    names = {f.name for f in files}
    assert names == {"a.py", "b.txt"}
    only_py = _collect_files([tmp_path], ignore, suffix_filter=(".py",))
    assert {f.name for f in only_py} == {"a.py"}
    tree = _render_directory_tree(tmp_path, ignore)
    assert "src/" in tree and "node_modules" not in tree
