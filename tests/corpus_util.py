"""Interpreters for the html5lib-style conformance corpus formats.

Ports the format semantics (NOT the code) of the reference's PHPUnit
drivers: tests/cases/TestTokenizer.php:99-216 (.test JSON files) and
tests/cases/TestTreeConstructor.php:65-136,179-250 (.dat files).
Corpus files themselves live in tests/corpus/ (vendored mensbeam cases
are redistributable; the rest are written fresh for this engine).
"""

import json
import re
from pathlib import Path

CORPUS = Path(__file__).parent / "corpus"

_UNESC = re.compile(r"\\u([0-9a-fA-F]{4})")


def _double_unescape(s):
    return _UNESC.sub(lambda m: chr(int(m.group(1), 16)), s)


def _unescape_deep(obj):
    if isinstance(obj, str):
        return _double_unescape(obj)
    if isinstance(obj, list):
        return [_unescape_deep(x) for x in obj]
    if isinstance(obj, dict):
        return {_double_unescape(k): _unescape_deep(v) for k, v in obj.items()}
    return obj


def load_tokenizer_tests(path):
    """Yield (description, initial_state_name, last_start_tag, input,
    expected_tokens, expected_error_codes, expected_error_positions)
    for one .test file.

    ``expected_error_positions`` is a list of (code, line, col) built
    from errors that carry BOTH "line" and "col" (the html5lib .test
    error-object form, {code,line,col}); empty when the file only pins
    codes.  Positions are 1-based; EOF-class errors point one past the
    last character (the reference's Data::whereIs cursor model)."""
    data = json.loads(Path(path).read_text())
    for case in data.get("tests", []):
        inp = case["input"]
        output = case["output"]
        if case.get("doubleEscaped"):
            inp = _double_unescape(inp)
            output = _unescape_deep(output)
        states = case.get("initialStates") or ["Data state"]
        errs = case.get("errors", [])
        errors = [e["code"] for e in errs]
        positions = [
            (e["code"], e["line"], e["col"])
            for e in errs
            if "line" in e and "col" in e
        ]
        for st in states:
            yield (
                case.get("description", ""),
                st,
                case.get("lastStartTag"),
                inp,
                output,
                errors,
                positions,
            )


def normalize_tokens(tokens):
    """Convert our tuple tokens to html5lib .test expected form:
    coalesce adjacent character tokens, drop EOF."""
    out = []
    for t in tokens:
        kind = t[0]
        if kind == "EOF":
            continue
        if kind in ("Character", "Space"):
            data = t[1]
            if out and out[-1][0] == "Character":
                out[-1][1] += data
            else:
                out.append(["Character", data])
        elif kind == "Null":
            if out and out[-1][0] == "Character":
                out[-1][1] += "\x00"
            else:
                out.append(["Character", "\x00"])
        elif kind == "StartTag":
            row = ["StartTag", t[1], dict(t[2])]
            if t[3]:
                row.append(True)
            out.append(row)
        elif kind == "EndTag":
            out.append(["EndTag", t[1]])
        elif kind in ("Comment", "PI"):
            data = t[1] if kind == "Comment" else t[1]
            out.append(["Comment", data])
        elif kind == "Doctype":
            out.append(["DOCTYPE", t[1], t[2], t[3], not t[4]])
    return out


def load_dat_blocks(path, start_keys=("data",)):
    """Split an html5lib-format .dat file into dicts of section -> lines.

    ``start_keys``: section names that begin a new test block ("data" for
    tokenizer/tree files; ("document", "fragment") for serializer files).
    """
    text = Path(path).read_text()
    tests = []
    current = None
    section = None
    for line in text.split("\n"):
        if line.startswith("#"):
            name = line[1:]
            if name in start_keys:
                if current is not None:
                    tests.append(current)
                current = {name: []}
                section = name
            elif current is not None:
                section = name
                current[section] = []
        elif current is not None:
            current[section].append(line)
    if current is not None:
        tests.append(current)
    out = []
    for t in tests:
        case = {}
        for k, v in t.items():
            # the final newline before the next section marker is not content
            case[k] = "\n".join(v[:-1] if v and v[-1] == "" else v)
        out.append(case)
    return out


def load_tree_tests(path):
    """Yield dicts: data, errors(list), fragment(context or None), expected.

    Engine extension over the html5lib format: an optional
    ``#engine-errors`` section lists the expected parse-error CODES in
    order (the reference only asserts counts,
    TestTreeConstructor.php:134-135 — codes are a stronger oracle)."""
    for case in load_dat_blocks(path):
        frag = case.get("document-fragment")
        codes = case.get("engine-errors")
        quirks = case.get("engine-quirks")
        yield {
            "data": case.get("data", ""),
            "n_errors": len([l for l in case.get("errors", "").split("\n") if l]),
            "error_codes": (
                [l for l in codes.split("\n") if l] if codes is not None else None
            ),
            "quirks": int(quirks) if quirks not in (None, "") else None,
            "fragment": frag.strip() if frag else None,
            "expected": case.get("document", ""),
            "script": (
                "on"
                if "script-on" in case
                else "off" if "script-off" in case else None
            ),
        }
