"""Frontend client logic tests (VERDICT round-3 item 8).

Neither streamlit nor gradio installs in this image, so the Streamlit app's
``run()`` flow is exercised under a STUB streamlit module (session state,
widgets scripted per test) and the pure helpers (request plumbing, source
filtering, diff rendering, gradio search/table assembly) are tested directly
with a faked ``requests``. Reference behavior:
/root/reference/src/semcode/frontend/app.py:36-158, gradio_app.py:54-157.
"""

from __future__ import annotations

import sys
import types
from contextlib import contextmanager

import pytest

from semcode_tpu.frontend import app as fe
from semcode_tpu.frontend import gradio_app as ga


class _Resp:
    def __init__(self, payload, status=200):
        self._payload = payload
        self.status_code = status

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def json(self):
        return self._payload


# -- pure helpers -------------------------------------------------------------


def test_headers_with_and_without_key():
    assert "X-API-Key" not in fe._headers(None)
    assert fe._headers("sk")["X-API-Key"] == "sk"
    assert fe._headers("sk")["Content-Type"] == "application/json"


def test_filter_sources_by_repo_and_language():
    sources = [
        {"repo": "a", "language": "python"},
        {"repo": "b", "language": "python"},
        {"repo": "a", "language": "cpp"},
    ]
    assert fe._filter_sources(sources, [], []) == sources
    assert fe._filter_sources(sources, ["a"], []) == [sources[0], sources[2]]
    assert fe._filter_sources(sources, ["a"], ["python"]) == [sources[0]]
    assert fe._filter_sources(sources, ["zzz"], []) == []


def test_render_diff_unified_format():
    out = fe._render_diff("a\nb\nc", "a\nx\nc", "one.py", "two.py")
    assert "--- one.py" in out and "+++ two.py" in out
    assert "-b" in out and "+x" in out
    # identical snippets diff to nothing
    assert fe._render_diff("same", "same", "a", "b") == ""


def test_run_query_builds_filter_body(monkeypatch):
    seen = {}

    def fake_request(method, url, headers=None, json=None, timeout=None):
        seen.update(method=method, url=url, headers=headers, body=json)
        return _Resp({"answer": "ok", "sources": [], "meta": {}})

    monkeypatch.setattr(fe.requests, "request", fake_request)
    out = fe._run_query(
        "http://api:8000/", "key", "q?", repos=["r1"], languages=["python"]
    )
    assert out["answer"] == "ok"
    assert seen["method"] == "POST"
    assert seen["url"] == "http://api:8000/query"  # trailing slash stripped
    assert seen["headers"]["X-API-Key"] == "key"
    assert seen["body"] == {
        "question": "q?",
        "filters": {"repo": ["r1"], "language": ["python"]},
    }


def test_run_query_raises_on_http_error(monkeypatch):
    monkeypatch.setattr(
        fe.requests, "request", lambda *a, **k: _Resp({}, status=502)
    )
    with pytest.raises(RuntimeError):
        fe._run_query("http://api", None, "q")


def test_fetch_repositories_error_path_returns_empty(monkeypatch):
    def boom(*a, **k):
        raise ConnectionError("down")

    monkeypatch.setattr(fe.requests, "request", boom)
    assert fe._fetch_repositories("http://api", None) == []


# -- streamlit run() flow under a stub module ---------------------------------


class _SessionState(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


class _StubStreamlit(types.ModuleType):
    """Scriptable streamlit: widget returns come from per-test dicts; every
    rendered element is recorded for assertions."""

    def __init__(self):
        super().__init__("streamlit")
        self.session_state = _SessionState()
        self.pressed = set()  # button labels/keys that return True
        self.text_area_value_override = None
        self.multiselects = {}
        self.rendered = []  # (kind, payload)

    # widgets ------------------------------------------------------------
    def set_page_config(self, **kw):
        pass

    def title(self, t):
        self.rendered.append(("title", t))

    def header(self, t):
        pass

    def subheader(self, t):
        self.rendered.append(("subheader", t))

    def text_input(self, label, value="", **kw):
        return value

    def text_area(self, label, value=""):
        if self.text_area_value_override is not None:
            return self.text_area_value_override
        return value

    def multiselect(self, label, options):
        return self.multiselects.get(label, [])

    def button(self, label, key=None):
        return (key or label) in self.pressed

    def selectbox(self, label, options, index=0):
        return options[index]

    def columns(self, spec):
        return [self] * len(spec)

    # containers ----------------------------------------------------------
    @property
    def sidebar(self):
        return self._ctx()

    def expander(self, label):
        return self._ctx()

    @staticmethod
    @contextmanager
    def _ctx():
        yield

    # output --------------------------------------------------------------
    def markdown(self, t):
        self.rendered.append(("markdown", t))

    def warning(self, t):
        self.rendered.append(("warning", t))

    def error(self, t):
        self.rendered.append(("error", t))

    def caption(self, t):
        self.rendered.append(("caption", t))

    def code(self, t, language=None):
        self.rendered.append(("code", t, language))


@pytest.fixture
def stub_st(monkeypatch):
    st = _StubStreamlit()
    monkeypatch.setitem(sys.modules, "streamlit", st)
    return st


def _result(answer="the answer", n_sources=1, fallback=False):
    return {
        "answer": answer,
        "sources": [
            {
                "repo": "r",
                "path": f"src/f{i}.py",
                "language": "python",
                "score": 0.9,
                "snippet": f"line{i}\ncommon",
            }
            for i in range(n_sources)
        ],
        "meta": {"fallback_used": fallback, "reason": "no_llm_configured"},
    }


def test_run_search_appends_history_and_renders(stub_st, monkeypatch):
    monkeypatch.setattr(fe, "_fetch_repositories", lambda *a: [])
    monkeypatch.setattr(fe, "_run_query", lambda *a, **k: _result(n_sources=2))
    stub_st.text_area_value_override = "what is the scan step?"
    stub_st.pressed = {"Search"}
    fe.run()
    assert stub_st.session_state.history == ["what is the scan step?"]
    assert stub_st.session_state.active_result["answer"] == "the answer"
    kinds = [r[0] for r in stub_st.rendered]
    assert "markdown" in kinds  # answer rendered
    assert kinds.count("caption") == 2  # one per source
    # two sources -> compare UI renders a unified diff
    assert ("subheader", "Compare snippets") in stub_st.rendered
    diff_blocks = [r for r in stub_st.rendered if r[0] == "code" and r[2] == "diff"]
    assert diff_blocks and "-line0" in diff_blocks[0][1]


def test_run_history_dedup_and_limit(stub_st, monkeypatch):
    monkeypatch.setattr(fe, "_fetch_repositories", lambda *a: [])
    monkeypatch.setattr(fe, "_run_query", lambda *a, **k: _result())
    stub_st.session_state.history = [f"old {i}" for i in range(fe.HISTORY_LIMIT)]
    stub_st.text_area_value_override = "old 3"  # re-asking moves to front
    stub_st.pressed = {"Search"}
    fe.run()
    hist = stub_st.session_state.history
    assert hist[0] == "old 3"
    assert len(hist) == fe.HISTORY_LIMIT  # capped, duplicate removed
    assert hist.count("old 3") == 1


def test_run_replay_button_sets_question(stub_st, monkeypatch):
    monkeypatch.setattr(fe, "_fetch_repositories", lambda *a: [])
    monkeypatch.setattr(fe, "_run_query", lambda *a, **k: _result())
    q = "replayed question"
    stub_st.session_state.history = [q]
    stub_st.pressed = {f"hist_{hash(q)}"}  # click the history button
    fe.run()
    # the replay key is consumed into the question box (popped after render)
    assert "replay" not in stub_st.session_state


def test_run_query_error_renders_st_error(stub_st, monkeypatch):
    monkeypatch.setattr(fe, "_fetch_repositories", lambda *a: [])

    def boom(*a, **k):
        raise RuntimeError("api down")

    monkeypatch.setattr(fe, "_run_query", boom)
    stub_st.text_area_value_override = "q"
    stub_st.pressed = {"Search"}
    fe.run()
    errs = [r for r in stub_st.rendered if r[0] == "error"]
    assert errs and "api down" in errs[0][1]
    assert stub_st.session_state.history == []  # failed query not recorded


def test_run_clear_button_resets_result(stub_st, monkeypatch):
    monkeypatch.setattr(fe, "_fetch_repositories", lambda *a: [])
    stub_st.session_state.active_result = _result()
    stub_st.pressed = {"Clear"}
    fe.run()
    assert stub_st.session_state.active_result is None


def test_run_fallback_warning(stub_st, monkeypatch):
    monkeypatch.setattr(fe, "_fetch_repositories", lambda *a: [])
    monkeypatch.setattr(
        fe, "_run_query", lambda *a, **k: _result(fallback=True)
    )
    stub_st.text_area_value_override = "q"
    stub_st.pressed = {"Search"}
    fe.run()
    warns = [r for r in stub_st.rendered if r[0] == "warning"]
    assert warns and "no_llm_configured" in warns[0][1]


# -- gradio client logic -------------------------------------------------------


def test_gradio_search_filters_and_rows(monkeypatch):
    payload = {
        "answer": "A",
        "meta": {"fallback_used": False},
        "sources": [
            {"repo": "r1", "path": "a.py", "language": "python",
             "score": 0.5, "snippet": "x" * 400},
            {"repo": "r2", "path": "b.cpp", "language": "cpp",
             "score": 0.4, "snippet": "y"},
        ],
    }
    seen = {}

    def fake_post(url, headers=None, json=None, timeout=None):
        seen.update(url=url, body=json)
        return _Resp(payload)

    monkeypatch.setattr(ga.requests, "post", fake_post)
    answer, meta, rows = ga._search("q", "http://api", "", "r1", "")
    assert answer == "A"
    assert seen["body"]["filters"] == {"repo": ["r1"]}
    assert len(rows) == 1 and rows[0][0] == "r1"
    assert len(rows[0][4]) == 300  # snippet truncated for the table


def test_gradio_search_empty_question_and_error(monkeypatch):
    answer, msg, rows = ga._search("  ", "http://api", "", "", "")
    assert rows == [] and "Enter a question" in msg

    def boom(*a, **k):
        raise ConnectionError("down")

    monkeypatch.setattr(ga.requests, "post", boom)
    answer, msg, rows = ga._search("q", "http://api", "", "", "")
    assert answer == "" and "Query failed" in msg and rows == []


def test_gradio_load_filters(monkeypatch):
    repos = [
        {"name": "alpha", "languages": ["python", "cpp"]},
        {"name": "beta", "languages": ["python"]},
    ]
    monkeypatch.setattr(ga.requests, "get", lambda *a, **k: _Resp(repos))
    names, langs = ga._load_filters("http://api", "")
    assert names == "alpha,beta"
    assert langs == "cpp,python"

    def boom(*a, **k):
        raise ConnectionError("down")

    monkeypatch.setattr(ga.requests, "get", boom)
    assert ga._load_filters("http://api", "") == ("", "")
