"""The built-in web UI's JavaScript must execute, not just string-match.

Two layers, so a JS syntax error can never ship green:

1. ``test_js_scans_cleanly`` — always runs: a real JS lexical scanner
   (strings, template literals with nested ``${}``, comments, regex
   literals, bracket balance) over the script extracted from
   ``webui.py``.  Catches the ship-breaking class of syntax errors
   (unterminated literal / unbalanced bracket) with zero dependencies.
2. ``test_js_executes_under_node`` — self-activating where any ``node``
   exists: executes the script inside a stub DOM and drives the full
   scenario — model list, hash-router deep links, metadata editing,
   classify upload->submit->poll->chart, filter->download
   (tests/webui_js_driver.js).  This is the reference's
   App.tsx/result-chart.tsx behavior executed headlessly.
"""

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DRIVER = REPO / "tests" / "webui_js_driver.js"


def extract_script() -> str:
    from xspect2_tpu.webui import INDEX_HTML

    start = INDEX_HTML.index("<script>") + len("<script>")
    end = INDEX_HTML.index("</script>")
    return INDEX_HTML[start:end]


# --------------------------------------------------------------- JS scanner

_KEYWORD_BEFORE_REGEX = {
    "return", "typeof", "case", "in", "of", "new", "delete", "void",
    "instanceof", "do", "else", "yield", "await", "throw",
}
_WORD_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_$"
)
_PAIRS = {"(": ")", "[": "]", "{": "}"}


class JsSyntaxError(ValueError):
    pass


def scan_js(src: str) -> None:
    """Lexically scan JS; raise JsSyntaxError on unterminated literals,
    unterminated comments, or unbalanced brackets."""
    n = len(src)

    def err(msg: str, i: int):
        line = src.count("\n", 0, i) + 1
        raise JsSyntaxError(f"{msg} at offset {i} (line {line})")

    def scan_string(i: int, quote: str) -> int:
        j = i + 1
        while j < n:
            c = src[j]
            if c == "\\":
                j += 2
                continue
            if c == quote:
                return j + 1
            if c == "\n":
                err("newline inside string literal", i)
            j += 1
        err("unterminated string literal", i)

    def scan_regex(i: int) -> int:
        j = i + 1
        in_class = False
        while j < n:
            c = src[j]
            if c == "\\":
                j += 2
                continue
            if c == "\n":
                err("newline inside regex literal", i)
            if in_class:
                if c == "]":
                    in_class = False
            elif c == "[":
                in_class = True
            elif c == "/":
                j += 1
                while j < n and src[j] in _WORD_CHARS:  # flags
                    j += 1
                return j
            j += 1
        err("unterminated regex literal", i)

    def scan_template(i: int) -> int:
        j = i + 1
        while j < n:
            c = src[j]
            if c == "\\":
                j += 2
                continue
            if c == "`":
                return j + 1
            if src[j : j + 2] == "${":
                j = scan_code(j + 2, stop_on_stray_brace=True)
                if j >= n or src[j] != "}":
                    err("unterminated ${...} in template literal", i)
                j += 1
                continue
            j += 1
        err("unterminated template literal", i)

    def scan_code(i: int, stop_on_stray_brace: bool = False) -> int:
        stack: list[tuple[str, int]] = []
        last = "op"  # regex is legal after operators/keywords, not values
        while i < n:
            c = src[i]
            if c in " \t\r\n":
                i += 1
                continue
            two = src[i : i + 2]
            if two == "//":
                nl = src.find("\n", i)
                i = n if nl < 0 else nl
                continue
            if two == "/*":
                close = src.find("*/", i + 2)
                if close < 0:
                    err("unterminated block comment", i)
                i = close + 2
                continue
            if c in "\"'":
                i = scan_string(i, c)
                last = "val"
                continue
            if c == "`":
                i = scan_template(i)
                last = "val"
                continue
            if c == "/" and last != "val":
                i = scan_regex(i)
                last = "val"
                continue
            if c in _PAIRS:
                stack.append((c, i))
                i += 1
                last = "op"
                continue
            if c in ")]}":
                if not stack:
                    if c == "}" and stop_on_stray_brace:
                        return i
                    err(f"unmatched '{c}'", i)
                opener, where = stack.pop()
                if _PAIRS[opener] != c:
                    err(f"'{opener}' (offset {where}) closed by '{c}'", i)
                i += 1
                last = "val" if c in ")]" else "op"
                continue
            if c in _WORD_CHARS:
                j = i
                while j < n and src[j] in _WORD_CHARS:
                    j += 1
                word = src[i:j]
                last = "op" if word in _KEYWORD_BEFORE_REGEX else "val"
                i = j
                continue
            i += 1
            last = "op"
        if stack:
            opener, where = stack[0]
            err(f"unclosed '{opener}'", where)
        return i

    scan_code(0)


def test_js_scans_cleanly():
    script = extract_script()
    assert len(script) > 1000, "web UI script extraction failed"
    scan_js(script)  # raises with position on any lexical defect


def test_driver_js_scans_cleanly():
    scan_js(DRIVER.read_text())


@pytest.mark.parametrize(
    "mutation",
    [
        lambda s: s.replace("function showView(v) {", "function showView(v) {{", 1),
        lambda s: s.replace("'Waiting for result '", "'Waiting for result ", 1),
        lambda s: s[: s.rindex("}")],  # drop a closing brace
        lambda s: s.replace("`<option>${esc(m)}</option>`", "`<option>${esc(m)</option>`", 1),
    ],
)
def test_js_scanner_catches_mutations(mutation):
    """The scanner itself must flag realistic ship-breaking typos."""
    with pytest.raises(JsSyntaxError):
        scan_js(mutation(extract_script()))


def test_js_executes_under_node(tmp_path):
    node = shutil.which("node") or shutil.which("nodejs")
    if node is None:
        pytest.skip(
            "no JavaScript runtime on PATH (install node >= 16 to execute "
            "the web UI headlessly; the lexical scan above still ran)"
        )
    script_file = tmp_path / "webui_script.js"
    script_file.write_text(extract_script())
    proc = subprocess.run(
        [node, str(DRIVER), str(script_file)],
        capture_output=True,
        text=True,
        timeout=120,
        check=False,
    )
    sys.stderr.write(proc.stdout + proc.stderr)
    assert proc.returncode == 0, f"web UI scenario failed:\n{proc.stdout}\n{proc.stderr}"
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"], result
    failed = [c["name"] for c in result["checks"] if not c["ok"]]
    assert not failed, f"scenario checks failed: {failed}"
