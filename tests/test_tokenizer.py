"""Tokenizer conformance: html5lib-format .test corpus (vendored mensbeam
cases + engine-authored spec cases) driven the same way as the reference's
tests/cases/TestTokenizer.php:156-216."""

import glob
import os

import pytest

from html_extract.tokenizer import STATE_NAMES, Tokenizer
from tests.corpus_util import CORPUS, load_tokenizer_tests, normalize_tokens


def _collect():
    cases = []
    for path in sorted(glob.glob(str(CORPUS / "tokenizer" / "*.test"))):
        fname = os.path.basename(path)
        for i, case in enumerate(load_tokenizer_tests(path)):
            cases.append(pytest.param(case, id=f"{fname}:{i}:{case[0][:40]}"))
    return cases


@pytest.mark.parametrize("case", _collect())
def test_tokenizer_case(case):
    (
        desc,
        state_name,
        last_start_tag,
        inp,
        expected,
        expected_errors,
        expected_positions,
    ) = case
    tok = Tokenizer(
        inp,
        state=STATE_NAMES[state_name],
        last_start_tag=last_start_tag,
    )
    got = normalize_tokens(list(tok.tokens()))
    assert got == expected, f"{desc}: {got!r} != {expected!r}"
    got_codes = sorted(code for code, _ in tok.errors)
    assert got_codes == sorted(expected_errors), (
        f"{desc}: errors {got_codes!r} != {sorted(expected_errors)!r}"
    )
    if expected_positions:
        from html_extract.parser import _LineCol

        linecol = _LineCol(inp)
        got_pos = sorted((c, *linecol(off)) for c, off in tok.errors)
        assert got_pos == sorted(expected_positions), (
            f"{desc}: error positions {got_pos!r} != "
            f"{sorted(expected_positions)!r}"
        )
