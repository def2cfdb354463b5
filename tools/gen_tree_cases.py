"""Generate html5lib-format .dat blocks (with #engine-errors codes) for
a list of inputs by running the engine, for HAND REVIEW before they are
committed as corpus goldens.

Usage: python tools/gen_tree_cases.py <spec.py> > out.dat
where spec.py defines CASES = [(input, opts_dict), ...]; opts:
  fragment: context tag name        script: "on"|"off"
This is the round-1 methodology: generate, then review every tree
against the WHATWG spec before vendoring.  NEVER commit unreviewed.
"""

import sys

sys.path.insert(0, ".")

from html_extract.parser import Config, parse, parse_fragment  # noqa: E402
from tests.treefmt import serialize_test_format  # noqa: E402


def emit(data, fragment=None, script=None):
    config = Config(error_collection=True, scripting=script == "on")
    out = []
    out.append("#data")
    out.append(data)
    if script:
        out.append(f"#script-{script}")
    if fragment:
        res = parse_fragment(fragment, data, config=config)
        tree = serialize_test_format(res)
        errors = []
    else:
        res = parse(data, config=config)
        tree = serialize_test_format(res.document)
        errors = [e[0] for e in res.errors]
    out.append("#errors")
    out.extend("err" for _ in errors)
    if not fragment:
        out.append("#engine-errors")
        out.extend(errors)
        out.append("#engine-quirks")
        out.append(str(res.quirks_mode))
    if fragment:
        out.append("#document-fragment")
        out.append(fragment)
    out.append("#document")
    out.append(tree)
    return "\n".join(out)


def main(path):
    ns: dict = {}
    exec(open(path).read(), ns)
    blocks = []
    for case in ns["CASES"]:
        data, opts = (case, {}) if isinstance(case, str) else case
        blocks.append(emit(data, **opts))
    print("\n\n".join(blocks))


if __name__ == "__main__":
    main(sys.argv[1])
