"""Deterministic HTML synthesis for the interleaved-document corpus.

The driver's ``documents`` table carries plain text (TESTDATA.md).  The
north-rule input is a Lance/Parquet table of interleaved text+media
documents whose html spans exercise a real HTML5 parser
(FIXTURES.md §1 synthesis recipe).  This module turns (doc_id, text)
into that shape deterministically — seeded by doc_id only — so every
run, process and cluster node generates byte-identical input.
"""

import random

_BOILER_LINKS = [
    ("Home", "/"),
    ("World", "/world"),
    ("Tech", "/tech"),
    ("Sports", "/sports"),
    ("About", "/about"),
    ("Contact", "/contact"),
]

_QUIRKY_DOCTYPES = [
    "<!DOCTYPE html>",
    "<!DOCTYPE html>",
    "<!DOCTYPE html>",
    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" "http://www.w3.org/TR/html4/loose.dtd">',
    '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 3.2//EN">',
    "",
]

_ENTITIES = ["&amp;", "&lt;", "&gt;", "&nbsp;", "&mdash;", "&#x2603;", "&copy;", "&AMP"]


def _para(rng, words, lo=12, hi=40):
    n = rng.randint(lo, hi)
    picks = [words[rng.randrange(len(words))] for _ in range(n)]
    if rng.random() < 0.3:
        picks.insert(rng.randrange(len(picks)), _ENTITIES[rng.randrange(len(_ENTITIES))])
    if rng.random() < 0.25:
        i = rng.randrange(len(picks))
        picks[i] = f"<b>{picks[i]}</b>"
    if rng.random() < 0.15:
        i = rng.randrange(len(picks))
        picks[i] = f"<b><i>{picks[i]}</b></i>"  # misnesting -> adoption agency
    return " ".join(picks)


def generate_html(doc_id, text: str) -> str:
    """Deterministic page around the document's own words."""
    rng = random.Random(f"htmlgen-{doc_id}")
    words = text.split() or ["lorem"]
    parts = []
    parts.append(_QUIRKY_DOCTYPES[rng.randrange(len(_QUIRKY_DOCTYPES))])
    parts.append("<html><head>")
    parts.append(f"<title>Document {doc_id}</title>")
    if rng.random() < 0.5:
        parts.append('<meta charset="utf-8">')
    parts.append("<style>body { color: #222 }</style>")
    parts.append("<script>var p = '</scr' + 'ipt>';</script>")
    parts.append("</head><body>")
    # boilerplate chrome
    nav = " ".join(
        f'<a href="{href}">{label}</a>' for label, href in _BOILER_LINKS
    )
    parts.append(f"<nav>{nav}</nav>")
    parts.append('<header class="masthead"><h1>Site Banner</h1></header>')
    if rng.random() < 0.4:
        parts.append(
            '<div class="sidebar widget"><ul>'
            + "".join(f'<li><a href="/r/{i}">related {i}</a></li>' for i in range(4))
            + "</ul></div>"
        )
    # main content
    parts.append("<main><article>")
    parts.append(f"<h1>{_para(rng, words, 3, 7)}</h1>")
    n_paras = rng.randint(2, 6)
    for i in range(n_paras):
        parts.append(f"<p>{_para(rng, words)}</p>")
        r = rng.random()
        if r < 0.25:
            parts.append(
                f'<img src="mem://asset/{doc_id}/{i}" alt="{_para(rng, words, 2, 4)}">'
            )
        elif r < 0.32:
            parts.append(
                "<table><tr><td>"
                + _para(rng, words, 6, 14)
                + "</td><td>"
                + _para(rng, words, 6, 14)
                + "</td></tr></table>"
            )
        elif r < 0.4:
            parts.append(
                "<ul>"
                + "".join(f"<li>{_para(rng, words, 4, 9)}" for _ in range(3))
                + "</ul>"
            )
        elif r < 0.45:
            parts.append(f"<blockquote><p>{_para(rng, words, 10, 25)}</p></blockquote>")
        elif r < 0.5:
            parts.append(
                '<svg viewbox="0 0 1 1"><circle r="1"/></svg>'
            )
    if rng.random() < 0.2:
        # deep-nesting skew tail
        depth = rng.randint(20, 120)
        parts.append("<div>" * depth + f"<p>{_para(rng, words)}</p>" + "</div>" * depth)
    parts.append("</article></main>")
    parts.append(
        '<footer><p>&copy; 2026 Example Corp. All rights reserved.</p>'
        '<form action="/subscribe"><input type="email"><button>Go</button></form>'
        "</footer>"
    )
    parts.append("</body></html>")
    return "".join(parts)


def make_interleaved_spans(doc_id, text: str):
    """(doc_id, text) -> list of interleaved input spans
    [(kind, text, media_ref, offset)] per the input_hint schema."""
    rng = random.Random(f"spans-{doc_id}")
    spans = []
    off = 0
    if rng.random() < 0.3:
        spans.append(("text", f"Lead-in note for document {doc_id}.", "", off))
        off += 1
    spans.append(("html", generate_html(doc_id, text), "", off))
    off += 1
    if rng.random() < 0.35:
        spans.append(
            ("media", f"standalone asset for {doc_id}", f"mem://asset/{doc_id}/x", off)
        )
        off += 1
    if rng.random() < 0.2:
        spans.append(("text", text[: len(text) // 2], "", off))
        off += 1
    return spans
