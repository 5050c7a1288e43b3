"""Chunker: budgets, symbol tagging, fallback behavior."""

from pathlib import Path

from semcode_tpu.chunking import CodeChunker
from semcode_tpu.chunking.chunker import guess_language
from semcode_tpu.chunking.symbols import scan_symbols

PY_SRC = '''\
import os

def top_level(x):
    return x + 1

class Widget:
    def method_a(self):
        pass

    def method_b(self):
        return 42

def another():
    return os.getcwd()
'''

CPP_SRC = """\
#include <vector>

namespace util {

class Buffer {
 public:
  int size() const { return n_; }
 private:
  int n_;
};

int add(int a, int b) {
  return a + b;
}

}  // namespace util
"""


def test_single_chunk_python(tmp_path):
    f = tmp_path / "sample.py"
    f.write_text(PY_SRC)
    chunks = CodeChunker().chunk_file(f)
    assert len(chunks) == 1
    assert chunks[0].start_line == 1
    assert chunks[0].language == "python"
    assert chunks[0].content.rstrip() == PY_SRC.rstrip()
    assert chunks[0].symbol is not None


def test_line_budget_splits_at_definitions(tmp_path):
    blocks = []
    for i in range(12):
        blocks.append(f"def func_{i}():\n" + "\n".join(
            f"    x{j} = {j}" for j in range(18)) + "\n    return 0\n")
    src = "\n".join(blocks)
    f = tmp_path / "big.py"
    f.write_text(src)
    chunks = CodeChunker(max_lines=50).chunk_file(f)
    assert len(chunks) > 2
    for c in chunks:
        assert c.end_line - c.start_line + 1 <= 50
    # non-first chunks should start at a def boundary (split-point preference)
    for c in chunks[1:]:
        assert c.content.lstrip().startswith("def func_"), c.content[:40]
    # spans must tile the file
    assert chunks[0].start_line == 1
    for a, b in zip(chunks, chunks[1:]):
        assert b.start_line == a.end_line + 1


def test_char_budget_split(tmp_path):
    f = tmp_path / "wide.py"
    f.write_text("x = '" + "a" * 20000 + "'\n")
    chunks = CodeChunker(max_chars=6000).chunk_file(f)
    assert len(chunks) >= 3
    assert all(len(c.content) <= 6000 for c in chunks)


def test_cpp_symbols():
    syms = scan_symbols(CPP_SRC.splitlines(), "cpp")
    names = {s.name for s in syms}
    # the structural scanner emits namespace-qualified names
    assert "util::Buffer" in names and "util::add" in names and "util" in names


def test_every_chunk_gets_symbol(tmp_path):
    f = tmp_path / "multi.py"
    f.write_text(PY_SRC)
    chunks = CodeChunker(max_lines=5).chunk_file(f)
    assert len(chunks) > 1
    assert all(c.symbol for c in chunks[1:])  # improvement over reference


def test_unknown_language_fallback(tmp_path):
    f = tmp_path / "data.xyz"
    f.write_text("some plain text\n" * 10)
    chunks = CodeChunker().chunk_file(f)
    assert len(chunks) == 1 and chunks[0].language == "text"


def test_empty_file(tmp_path):
    f = tmp_path / "empty.py"
    f.write_text("")
    assert CodeChunker().chunk_file(f) == []


def test_guess_language():
    assert guess_language(Path("a.py")) == "python"
    assert guess_language(Path("a.hpp")) == "cpp"
    assert guess_language(Path("a.ts")) == "typescript"
    assert guess_language(Path("a.bin")) is None


def test_python_ast_scanner_exactness():
    """The stdlib-ast scan skips defs in strings, reports decorator-aware
    start lines, and qualifies nested names; broken files fall back to the
    regex scan."""
    from semcode_tpu.chunking.symbols import scan_symbols

    src = '''\
S = """
def not_a_def():  # inside a string
    pass
"""


@decorator
def top(a, b):
    return a


class Widget:
    @property
    def size(self):
        return 1

    class Inner:
        def leaf(self):
            pass
'''
    syms = scan_symbols(src.splitlines(), "python")
    by_name = {s.name: s for s in syms}
    assert "not_a_def" not in by_name  # string content ignored
    assert by_name["top"].kind == "function"
    assert by_name["top"].line == 6  # the @decorator line, 0-based
    assert by_name["Widget"].kind == "class"
    assert by_name["Widget.size"].kind == "method"
    assert by_name["Widget.Inner"].kind == "class"
    assert by_name["Widget.Inner.leaf"].kind == "method"

    # syntax-broken file: regex fallback still finds the def line
    broken = ["def solo(:", "    pass"]
    fb = scan_symbols(broken, "python")
    assert fb and fb[0].name == "solo"


def test_char_split_pieces_carry_real_line_ranges(tmp_path):
    """Pieces of a char-budget split must carry distinct, correct line
    spans — not the whole segment's (the reference stamps every piece with
    the full segment span, reference tree_sitter_chunker.py:264-273)."""
    # 40 lines x 400 chars = 16k chars in one 40-line segment
    lines = [f"x{i:03d} = " + "a" * 392 for i in range(40)]
    path = tmp_path / "wide.py"
    path.write_text("\n".join(lines), encoding="utf-8")
    chunker = CodeChunker(max_lines=200, max_chars=6000)
    chunks = chunker.chunk_file(path)
    assert len(chunks) >= 3
    # spans are distinct, ordered, and cover the file
    spans = [(c.start_line, c.end_line) for c in chunks]
    assert len(set(spans)) == len(spans)
    assert spans[0][0] == 1 and spans[-1][1] == 40
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 >= s1 and e2 >= e1
    # every piece's first line really is at its recorded start_line
    for c in chunks:
        first_piece_line = c.content.splitlines()[0]
        src_line = lines[c.start_line - 1]
        assert src_line.endswith(first_piece_line) or src_line == first_piece_line


def test_symbol_span_respects_scope_end():
    """A chunk of top-level code AFTER a class must not be tagged with the
    class's last method (the AST scanner knows scope ends)."""
    from semcode_tpu.chunking.symbols import scan_symbols, symbol_for_span

    lines = (
        "class A:\n"
        "    def m(self):\n"
        "        return 1\n"
        + "\n" * 2
        + "x = 1\n" * 60
    ).splitlines()
    syms = scan_symbols(lines, "python")
    # span inside the class -> tagged with the method
    assert symbol_for_span(syms, 1, 3) == "A.m"
    # span far below the class body -> no stale 'A.m' tag
    assert symbol_for_span(syms, 30, 50) is None
