"""Structural js/ts symbol scanner: parity with the C++ scanner's test bar
(tests/test_cparse.py); replaces the round-2 line-regex scan."""

from semcode_tpu.chunking.jsparse import scan_js_symbols, strip_js_noise
from semcode_tpu.chunking.symbols import scan_symbols


def _by_name(syms):
    return {s.name: s for s in syms}


def test_function_declarations_and_expressions():
    src = """
function plain(a, b) {
  return a + b;
}
async function fetched(url) {
  return await fetch(url);
}
function* gen() { yield 1; }
const assigned = function(x) { return x; };
"""
    syms = _by_name(scan_js_symbols(src))
    assert syms["plain"].kind == "function" and syms["plain"].line == 1
    assert "fetched" in syms
    assert "gen" in syms
    assert syms["assigned"].kind == "function"


def test_arrow_functions_block_and_expression_bodies():
    src = """
const add = (a, b) => {
  return a + b;
};
const double = x => x * 2;
const fetchIt = async (url) => {
  return await fetch(url);
};
export const typed = <T>(x: T): T => x;
"""
    syms = _by_name(scan_js_symbols(src))
    assert syms["add"].line == 1
    assert syms["double"].kind == "function"  # expression body, no brace
    assert "fetchIt" in syms
    assert "typed" in syms


def test_class_with_methods_emits_qualified_names():
    src = """
export default class Store {
  constructor(opts) {
    this.opts = opts;
  }
  get size() { return this._n; }
  static of(items) { return new Store(items); }
  async load(path) {
    return read(path);
  }
  #internal() { return 1; }
}
class Sub extends Store {
  render() {}
}
"""
    syms = _by_name(scan_js_symbols(src))
    assert syms["Store"].kind == "class" and syms["Store"].line == 1
    assert syms["Store.constructor"].kind == "method"
    assert syms["Store.size"].kind == "method"
    assert syms["Store.of"].kind == "method"
    assert syms["Store.load"].kind == "method"
    assert syms["Store.#internal"].kind == "method"
    assert syms["Sub.render"].kind == "method"


def test_multiline_signatures():
    src = """
function longOne(
    first,
    second,
    third,
) {
  return first;
}
const arrowLong = (
    a,
    b,
) => {
  return a + b;
};
"""
    syms = _by_name(scan_js_symbols(src))
    assert "longOne" in syms
    assert "arrowLong" in syms


def test_typescript_constructs():
    src = """
interface Shape {
  area(): number;
}
enum Color { Red, Green }
namespace Geo {
  export function dist(a: Pt, b: Pt): number {
    return 0;
  }
}
export abstract class Repo<T> {
  abstract find(id: string): Promise<T>;
  protected async save(item: T): Promise<void> {
    await this.db.put(item);
  }
}
function generic<T extends object>(x: T): T {
  return x;
}
"""
    syms = _by_name(scan_js_symbols(src))
    assert syms["Shape"].kind == "class"
    assert syms["Color"].kind == "enum"
    assert syms["Geo"].kind == "namespace"
    assert syms["Geo.dist"].kind == "function"
    assert syms["Repo"].kind == "class"
    assert syms["Repo.save"].kind == "method"
    assert "generic" in syms


def test_object_literal_methods():
    src = """
const api = {
  get(url) { return fetch(url); },
  post: function(url, body) { return fetch(url, body); },
  patch: (url) => {
    return fetch(url);
  },
};
"""
    names = {s.name for s in scan_js_symbols(src)}
    assert {"api", "post", "patch"} <= names or {"post", "patch"} <= names


def test_strings_comments_and_regex_do_not_confuse_scanner():
    src = """
// function commented(a) {
/* class Commented { } */
const s = "function inString() {";
const t = 'class InString {';
const tpl = `function inTemplate() { ${ (x) => x } }`;
const re = /function inRegex\\(/g;
function real() {
  return s;
}
"""
    syms = _by_name(scan_js_symbols(src))
    assert "real" in syms
    assert "commented" not in syms
    assert "inString" not in syms
    assert "InString" not in syms
    assert "inTemplate" not in syms
    assert "inRegex" not in syms


def test_control_flow_braces_are_not_functions():
    src = """
function outer(n) {
  if (n > 0) {
    for (let i = 0; i < n; i++) {
      while (true) {
        break;
      }
    }
  } else {
    switch (n) {
      case 1: { break; }
    }
  }
  try {
    risky();
  } catch (e) {
    handle(e);
  }
  return n;
}
"""
    syms = scan_js_symbols(src)
    assert [s.name for s in syms] == ["outer"]


def test_template_interpolation_arrow_is_code():
    # arrows inside ${...} are real code and may legitimately be found;
    # the scanner must at minimum not crash or mis-nest on them
    src = "const render = (items) => {\n  return `x${items.map(i => i.id).join(',')}y`;\n};\n"
    syms = _by_name(scan_js_symbols(src))
    assert "render" in syms


def test_strip_js_noise_preserves_newlines():
    src = "const a = `line1\nline2`;\nfunction f() {}\n"
    clean = strip_js_noise(src)
    assert clean.count("\n") == src.count("\n")
    assert "line2" not in clean
    assert "function f" in clean


def test_scan_symbols_dispatches_for_js_and_ts():
    lines = ["export class Widget {", "  draw() {}", "}"]
    for lang in ("javascript", "typescript"):
        syms = scan_symbols(lines, lang)
        names = {s.name for s in syms}
        assert {"Widget", "Widget.draw"} <= names
