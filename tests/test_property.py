"""Property-based robustness tests (hypothesis; derandomized so CI is
deterministic).  The reference has no property testing (SURVEY.md §5.4);
these pin the engine's global invariants on adversarial inputs:

- parse() never raises, whatever the input;
- serialize(parse(x)) CONVERGES after one normalizing reparse
  (plaintext excluded: a <plaintext> element is not serializable —
  everything after it reparses as literal text, so output grows);
- extract_spans emits contiguous 0-based span order;
- the pretty printer is idempotent and whitespace-collapse-preserving.
"""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from html_extract.extract import extract_spans
from html_extract.parser import Config, parse
from html_extract.serializer import serialize

# HTML-shaped soup: tag fragments, entities, brackets, nulls, unicode
_soup = st.text(
    alphabet=st.sampled_from(
        list("<>&;/=\"' abAB\t\n-!?[]") + ["\x00", "�", "é", "\U0001f600"]
    ),
    max_size=200,
)
_tags = st.sampled_from(
    "<p><div><table><tr><td><b><i><a href=x><svg><math><template>"
    "<select><option><pre><!--c--><![CDATA[x]]></p></div></table>"
    "</b></i></a></svg></math><!doctype html>"
    # round-5 hunt shapes (the nested-template EOF bug class lived here)
    "</template><optgroup><input><hr><keygen><textarea></textarea>"
    "<caption><colgroup><nobr></nobr><form></select>".replace(
        "><", ">|<"
    ).split("|")
)
_html = st.lists(st.one_of(_soup, _tags), max_size=30).map("".join)

_SETTINGS = dict(
    max_examples=150,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_SETTINGS)
@given(_html)
def test_parse_never_raises(src):
    out = parse(src, config=Config(error_collection=True))
    assert out.document is not None
    for code, line, col in out.errors:
        assert isinstance(code, str) and line >= 1 and col >= 1


@settings(**_SETTINGS)
@given(_html)
def test_serialize_parse_converges(src):
    # serialize->reparse is NOT a fixed point for every tree (the spec
    # itself warns: e.g. an HTML <p> nested inside <svg> breaks out on
    # reparse, §13.3 round-trip caveat) — but it must CONVERGE after
    # one normalizing reparse
    hypothesis.assume("plaintext" not in src.lower())  # not serializable
    once = serialize(parse(src).document)
    twice = serialize(parse(once).document)
    third = serialize(parse(twice).document)
    assert third == twice


@settings(**_SETTINGS)
@given(_html)
def test_extract_span_order_contiguous(src):
    spans, meta = extract_spans(src)
    assert [s[3] if len(s) > 3 else i for i, s in enumerate(spans)] == list(
        range(len(spans))
    ) or all(len(s) == 3 for s in spans)
    assert meta["n_errors"] >= 0


@settings(**_SETTINGS)
@given(_html)
def test_pretty_print_converges(src):
    # same §13.3 round-trip caveat as above: idempotence is asserted on
    # the normalized (once-reparsed) document
    hypothesis.assume("plaintext" not in src.lower())  # not serializable
    pretty = serialize(parse(src).document, reformat_whitespace=True)
    pretty2 = serialize(parse(pretty).document, reformat_whitespace=True)
    pretty3 = serialize(parse(pretty2).document, reformat_whitespace=True)
    assert pretty3 == pretty2


@settings(**_SETTINGS)
@given(
    st.sampled_from(
        ["div", "td", "tr", "tbody", "table", "select", "option", "template",
         "head", "html", "frameset", "colgroup", "caption", "title", "script",
         "style", "textarea", "plaintext", "svg path", "math ms"]
    ),
    _html,
)
def test_parse_fragment_never_raises(context, src):
    from html_extract.parser import parse_fragment

    frag = parse_fragment(context, src)
    assert frag is not None


@settings(**_SETTINGS)
@given(
    st.sampled_from(
        ["svg svg", "svg desc", "svg foreignObject", "math ms",
         "math mtext", "math annotation-xml", "math math"]
    ),
    _html,
)
def test_foreign_fragments_parse_and_serialize(context, src):
    # the r3 fragment-breakout fix territory: foreign contexts must
    # never hit the reprocess cap, and their fragments must serialize
    from html_extract.parser import parse_fragment
    from html_extract.serializer import serialize_inner

    frag = parse_fragment(context, src)
    serialize_inner(frag)


@settings(**_SETTINGS)
@given(
    st.sampled_from(
        [b"", b"\xef\xbb\xbf", b"\xfe\xff", b"\xff\xfe",
         b'<meta charset="shift_jis">', b'<meta charset="x-user-defined">',
         b'<meta charset="replacement">', b'<meta charset="utf-16le">']
    ),
    st.binary(max_size=200),
)
def test_bytes_input_never_raises(prefix, body):
    # full sniff + bounded encoding-change restart on arbitrary bytes
    out = parse(prefix + body, config=Config(error_collection=True))
    assert out.encoding


# Tokenizer-state-seeded inputs: raw-text-ish payloads (partial closers,
# comment openers, entities, CR/LF/NUL) interleaved with tag soup, fed
# into the fragment contexts that seed non-DATA tokenizer states
# (RCDATA/RAWTEXT/script/plaintext) and special insertion modes.
_raw_payload = st.sampled_from(
    ["</title>", "</TITLE >", "</textarea x>", "</style", "</scr",
     "</script >", "<!--", "-->", "<!--<script>", "&amp;", "&notin;",
     "&not", "\r\n", "\x00", "]]>", "<b>", "</p>", "x</", "=", "'",
     '"', " ", "</plaintext>", "</xmp>"]
)
_rawtext_html = st.lists(
    st.one_of(_soup, _tags, _raw_payload), max_size=30
).map("".join)
_state_contexts = st.sampled_from(
    "title textarea style script plaintext xmp iframe noembed noframes "
    "noscript select option table tr td caption colgroup template html "
    "body head frameset p b form button li dd ruby".split()
)


@settings(**_SETTINGS)
@given(_state_contexts, _rawtext_html)
def test_state_seeded_fragments_never_raise(context, src):
    # fragment contexts seed the tokenizer in RCDATA/RAWTEXT/script-data
    # (spec fragment-parsing step 2); payloads full of partial closing
    # tags and comment openers probe those state machines' edge arcs
    from html_extract.parser import parse_fragment
    from html_extract.serializer import serialize_inner

    frag = parse_fragment(context, src)
    serialize_inner(frag)


def _text_tokens(doc):
    from html_extract.dom import Document, Element, Text

    out = []
    stack = [doc]
    while stack:
        n = stack.pop()
        if isinstance(n, Text):
            out.extend(n.data.split())
        elif isinstance(n, Element):
            if n.template_content is None:
                stack.extend(reversed(n.children))
        elif isinstance(n, Document):
            stack.extend(reversed(n.children))
    return out


@settings(**_SETTINGS)
@given(_html)
def test_pretty_print_preserves_rendered_text(src):
    # the strongest pretty-printer guarantee: reformatting may move
    # whitespace but must never lose or merge rendered-text tokens
    hypothesis.assume("plaintext" not in src.lower())
    doc = parse(src).document
    pretty = serialize(doc, reformat_whitespace=True)
    assert _text_tokens(parse(pretty).document) == _text_tokens(doc)
