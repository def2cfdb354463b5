"""Minimal XML document parser for the DOMParser XML branch (S4).

Parity target: lib/DOMParser.php:113-206 — the reference delegates XML
to libxml and, on failure, returns a document containing a Mozilla-
style ``parsererror`` element carrying code/message/line/column
(DOMParser.php:125-137).  This engine uses the stdlib expat parser and
builds the same plain-Python DOM the HTML parser uses.

Documented subset: namespace prefixes are preserved verbatim as part
of the element/attribute names and xmlns attributes stay ordinary
attributes — namespace URIs are not resolved (the serializer then
round-trips arbitrary XML faithfully).  External entities / DTD
validation are never performed (matches the reference's LIBXML_NONET).
"""

from xml.parsers import expat

from . import charset as cs
from .dom import (
    Comment,
    Doctype,
    Document,
    Element,
    ProcessingInstruction,
    Text,
)

PARSERERROR_NS = "http://www.mozilla.org/newlayout/xml/parsererror.xml"

# sentinel namespace for generic XML content (kept distinct from the
# HTML namespace so HTML-specific serializer rules never apply)
XML_CONTENT_NS = None


def _decode(data, transport_charset=None):
    """bytes -> str per the reference's order: BOM > charset param >
    XML-declaration encoding > UTF-8 (DOMParser.php:84-90,139-206)."""
    if isinstance(data, str):
        return data
    raw = bytes(data)
    bom = cs.sniff_bom(raw)
    if bom is not None:
        enc, bomlen = bom
        return raw[bomlen:].decode(enc, errors="replace")
    enc = None
    if transport_charset:
        enc = cs.lookup_label(transport_charset)
    if enc is None:
        enc = cs.xml_declaration(raw)
    if enc is None:
        enc = "UTF-8"
    # cs.decode handles x-user-defined and the replacement encoding
    # (single U+FFFD -> "no element found" -> parsererror document,
    # matching the reference's behavior for e.g. csiso2022kr)
    return cs.decode(raw, enc)


def parse_xml(data, transport_charset=None) -> Document:
    """Parse an XML document into the engine DOM.

    Never raises on malformed input: like the reference, a failed
    parse yields a document whose root is a ``parsererror`` element
    (Mozilla namespace) with code/message/line/column attributes."""
    text = _decode(data, transport_charset)
    doc = Document()
    stack = [doc]
    parser = expat.ParserCreate(namespace_separator=None)
    parser.buffer_text = True
    parser.ordered_attributes = False

    def start(name, attrs):
        el = Element(name, namespace=XML_CONTENT_NS, attrs=dict(attrs))
        stack[-1].append(el)
        stack.append(el)

    def end(name):
        stack.pop()

    def chars(s):
        parent = stack[-1]
        if parent is doc:
            return  # whitespace outside the root
        last = parent.children[-1] if parent.children else None
        if isinstance(last, Text):
            last.data += s
        else:
            parent.append(Text(s))

    def comment(s):
        stack[-1].append(Comment(s))

    def pi(target, payload):
        stack[-1].append(ProcessingInstruction(target, payload))

    def doctype_start(name, sysid, pubid, has_internal):
        doc.append(Doctype(name or "", pubid or "", sysid or ""))

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    parser.CommentHandler = comment
    parser.ProcessingInstructionHandler = pi
    parser.StartDoctypeDeclHandler = doctype_start

    try:
        parser.Parse(text, True)
    except expat.ExpatError as e:
        return _error_document(e, parser)
    if not any(isinstance(c, Element) for c in doc.children):
        err = expat.ExpatError("no element found")
        err.code = expat.errors.codes[expat.errors.XML_ERROR_NO_ELEMENTS]
        err.lineno = parser.CurrentLineNumber
        err.offset = parser.CurrentColumnNumber
        return _error_document(err, parser)
    return doc


def _error_document(e, parser) -> Document:
    """Mozilla-parsererror document (DOMParser.php:125-137 shape)."""
    code = getattr(e, "code", 0)
    message = expat.errors.messages.get(code, str(e))
    line = getattr(e, "lineno", parser.ErrorLineNumber or 0)
    col = getattr(e, "offset", parser.ErrorColumnNumber or 0)
    doc = Document()
    el = Element(
        "parsererror",
        namespace=PARSERERROR_NS,
        attrs={
            "xmlns": PARSERERROR_NS,
            "code": str(code),
            "message": message,
            "line": str(line),
            "column": str(col),
        },
    )
    el.append(
        Text(f'{code}: "{message}" on line {line}, column {col}')
    )
    doc.append(el)
    return doc
