"""DOMParser facade: MIME-dispatching parseFromString (reference S4).

Parity target: lib/DOMParser.php:76-105 — dispatch on the MIME type,
extract the charset parameter, parse.  The reference's XML branch
delegates to PHP's libxml; this engine is HTML-only, so XML types raise
NotImplementedError (documented subset, SURVEY.md §2.1 S4).
"""

import re

from .parser import Config, Output, parse

HTML_TYPES = frozenset(["text/html"])
XML_TYPES = frozenset(
    [
        "text/xml",
        "application/xml",
        "application/xhtml+xml",
        "image/svg+xml",
    ]
)

_MIME_RE = re.compile(r"^\s*([a-zA-Z0-9!#$&^_.+-]+/[a-zA-Z0-9!#$&^_.+-]+)")


def parse_from_string(data, content_type: str, config: Config | None = None) -> Output:
    """Parse ``data`` according to ``content_type`` (MIME + params).

    text/html -> full HTML parse, charset honored from the MIME params
    (bytes input) per the encoding-sniffing transport step.
    XML types -> NotImplementedError (reference delegates to libxml).
    Anything else -> ValueError (mirrors the reference's TypeError).
    """
    m = _MIME_RE.match(content_type or "")
    if not m:
        raise ValueError(f"invalid MIME type: {content_type!r}")
    essence = m.group(1).lower()
    if essence in HTML_TYPES:
        return parse(data, content_type=content_type, config=config)
    if essence in XML_TYPES or essence.endswith("+xml"):
        raise NotImplementedError(
            "XML parsing is out of scope for this engine "
            "(the reference delegates it to libxml)"
        )
    raise ValueError(f"unsupported MIME type: {essence}")
