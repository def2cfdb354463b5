"""Tree-construction conformance: html5lib-format .dat corpus (vendored
mensbeam cases + engine-authored cases), driven like the reference's
tests/cases/TestTreeConstructor.php:65-136."""

import glob
import os

import pytest

from html_extract.parser import Config, parse, parse_fragment
from tests.corpus_util import CORPUS, load_tree_tests
from tests.treefmt import serialize_test_format


def _collect():
    cases = []
    for path in sorted(glob.glob(str(CORPUS / "tree-construction" / "*.dat"))):
        fname = os.path.basename(path)
        pi = fname.startswith("pi")
        for i, case in enumerate(load_tree_tests(path)):
            label = case["data"][:35].replace("\n", "\\n")
            cases.append(pytest.param(case, pi, id=f"{fname}:{i}:{label}"))
    return cases


@pytest.mark.parametrize("case,pi", _collect())
def test_tree_case(case, pi):
    config = Config(processing_instructions=pi, error_collection=True)
    if case["fragment"]:
        frag = parse_fragment(case["fragment"], case["data"], config=config)
        got = serialize_test_format(frag)
    else:
        out = parse(case["data"], config=config)
        got = serialize_test_format(out.document)
    assert got == case["expected"], (
        f"input: {case['data']!r}\n--- got ---\n{got}\n--- want ---\n{case['expected']}"
    )
