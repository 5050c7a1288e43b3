"""Structural C/C++ symbol scanner (chunking/cparse.py).

Cases the round-1 line regex missed: multi-line signatures, out-of-line
qualified definitions, operators, constructors with initializer lists,
destructors, enum class, preprocessor/comment/string noise."""

from semcode_tpu.chunking.cparse import scan_c_symbols, strip_noise
from semcode_tpu.chunking.symbols import scan_symbols

GNARLY = r'''
#include <vector>
// def not_a_function(
namespace ns {
template <typename T>
class Widget : public Base<T> {
 public:
  Widget(int a) : a_(a), b_{0} { init(); }
  ~Widget() { release(); }
  auto* frob(
      const std::vector<T>& items,
      int depth) const noexcept -> Widget* {
    if (depth > 0) { return this; }
    return nullptr;
  }
  bool operator==(const Widget& o) const { return a_ == o.a_; }
 private:
  int a_;
};
enum class Color { kRed };
}  // namespace ns

void
multi_line_free(
    int x)
{
  int arr[] = {1, 2};
  auto lam = [&](int q) { return q; };
  const char* s = "braces { in } strings (";
}

void ns::Widget::out_of_line() { }
'''


def _names(code):
    return {(s.kind, s.name) for s in scan_c_symbols(code)}


def test_gnarly_cpp_definitions():
    got = _names(GNARLY)
    assert ("namespace", "ns") in got
    assert ("class", "ns::Widget") in got
    assert ("method", "ns::Widget::Widget") in got          # ctor + init list
    assert ("method", "ns::Widget::~Widget") in got         # dtor
    assert ("method", "ns::Widget::frob") in got            # multi-line sig
    assert ("method", "ns::Widget::operator==") in got      # operator
    assert ("enum", "ns::Color") in got                     # enum class
    assert ("function", "multi_line_free") in got
    assert ("method", "ns::Widget::out_of_line") in got     # out-of-line


def test_control_flow_and_noise_not_reported():
    names = {s.name.split("::")[-1] for s in scan_c_symbols(GNARLY)}
    for bad in ("if", "for", "while", "lam", "not_a_function", "arr"):
        assert bad not in names


def test_strip_noise_preserves_line_count():
    assert strip_noise(GNARLY).count("\n") == GNARLY.count("\n")
    assert '"' not in strip_noise(GNARLY)
    assert "#include" not in strip_noise(GNARLY)


def test_scan_symbols_seam_uses_structural_scanner():
    lines = GNARLY.splitlines()
    syms = scan_symbols(lines, "cpp")
    assert any(s.name == "ns::Widget::frob" for s in syms)
    # line numbers index into the original text
    frob = next(s for s in syms if s.name.endswith("frob"))
    assert "frob" in lines[frob.line]


def test_plain_c_functions():
    code = "static int add(int a, int b)\n{\n  return a + b;\n}\n"
    got = _names(code)
    assert ("function", "add") in got


def test_native_strip_noise_byte_parity():
    """The C strip_noise must be byte-for-byte identical to the Python state
    machine on ASCII inputs (unicode routes to Python automatically)."""
    import pytest

    from semcode_tpu.embeddings.native import strip_noise_native

    samples = [
        'int a = 1; // trailing comment\nchar* s = "str with // fake";\n',
        "/* multi\nline\ncomment */ struct S { int x; };\n",
        "#define BIG(x) \\\n    part_one(x) \\\n    part_two(x)\nint f() {}\n",
        "char c = '\\''; char d = '\\\\';\nstd::string e = \"esc\\\"quote\";\n",
        "#include <vector>\nnamespace ns { class K { K(); ~K(); }; }\n",
        'auto s = "unterminated string...',
        "/* unterminated comment...",
        "",
        "#\n##\n# \\\n\n",
    ]
    native_seen = False
    for src in samples:
        got = strip_noise_native(src)
        if got is None:
            continue  # toolchain unavailable in this environment
        native_seen = True
        # Python reference path (bypass the native shortcut)
        import semcode_tpu.chunking.cparse as cp

        ref_out = []
        # call the pure-python body by stubbing the native hook
        import unittest.mock as mock

        with mock.patch(
            "semcode_tpu.embeddings.native.strip_noise_native",
            return_value=None,
        ):
            ref = cp.strip_noise(src)
        assert got == ref, f"parity break on {src!r}:\n{got!r}\n{ref!r}"
        assert len(got) == len(src)
    if not native_seen:
        pytest.skip("native library unavailable")


def test_native_strip_noise_unicode_falls_back():
    from semcode_tpu.chunking.cparse import scan_c_symbols

    src = "// коммент\nint fn_with_unicode_comment() {\n  return 1;\n}\n"
    syms = scan_c_symbols(src)
    assert [s.name for s in syms] == ["fn_with_unicode_comment"]
