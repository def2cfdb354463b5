"""HTML serialization (spec §13.3 fragment-serialization algorithm).

Reference parity: mensbeam/HTML-Parser lib/Parser/Serializer.php
(serialize/serializeInner :70-81, node walk :113-528, escaping
lib/Parser/NameCoercion.php:69-83).  Option parity:
- booleanAttributeValues -> ``bool_attr`` (implemented)
- foreignVoidEndTags     -> ``foreign_void_end_tags`` (implemented)
- reformatWhitespace / indentStep / indentWithSpaces / groupElements
  (the pretty-printer, Serializer.php:56-68,133-208): explicit
  NON-GOALS — non-standard output-beautification that cannot affect
  span equality; each would require the XPath BLOCK_QUERY emulation
  for zero extraction value (SURVEY.md §2.2 Z3).
"""

from .dom import (
    Comment,
    Doctype,
    Document,
    DocumentFragment,
    Element,
    ProcessingInstruction,
    Text,
)
from .tables import (
    HTML_NS,
    MATHML_NS,
    RAWTEXT_SERIALIZE,
    SVG_NS,
    VOID_ELEMENTS,
    XLINK_NS,
    XML_NS,
    XMLNS_NS,
)

_ESC_TEXT = str.maketrans(
    {"&": "&amp;", "\xa0": "&nbsp;", "<": "&lt;", ">": "&gt;"}
)
_ESC_ATTR = str.maketrans({"&": "&amp;", "\xa0": "&nbsp;", '"': "&quot;"})

# Boolean attributes for the optional value-omission mode (reference
# Serializer.php:22-53 $boolAttr; the set is public HTML spec data)
BOOLEAN_ATTRIBUTES = frozenset(
    """allowfullscreen async autofocus autoplay checked controls default
    defer disabled formnovalidate hidden inert ismap itemscope loop multiple
    muted nomodule novalidate open playsinline readonly required reversed
    selected""".split()
)

# HTML-ns elements whose text children serialize raw.  noscript is raw
# only when scripting is on (Serializer.php:21,346-356); this engine is
# permanently scripting-off, so noscript text is escaped.
_RAW_PARENTS = RAWTEXT_SERIALIZE - {"noscript"}


def _attr_name(el, qname):
    nsinfo = el.attr_ns.get(qname)
    if nsinfo is None:
        return qname
    ns, prefix, local = nsinfo
    if ns == XML_NS:
        return "xml:" + local
    if ns == XMLNS_NS:
        return "xmlns" if local == "xmlns" else "xmlns:" + local
    if ns == XLINK_NS:
        return "xlink:" + local
    return f"{prefix}:{local}" if prefix else local


def _serialize_node(node, out, bool_attr=False, foreign_void_end_tags=True):
    # Iterative (explicit stack): survives pathologically deep documents
    # that would blow Python's recursion limit.  Literal strings on the
    # stack are emitted as-is (used for deferred end tags).
    stack = [node]
    while stack:
        item = stack.pop()
        if type(item) is str:
            out.append(item)
            continue
        if isinstance(item, Element):
            name = item.name  # local for HTML/MathML/SVG; qualified else
            out.append("<")
            out.append(name)
            for qname, value in item.attrs.items():
                out.append(" ")
                out.append(_attr_name(item, qname))
                if (
                    bool_attr
                    and item.namespace == HTML_NS
                    and qname in BOOLEAN_ATTRIBUTES
                    and value in ("", qname)
                ):
                    continue  # value omitted (Serializer.php:264-277)
                out.append('="')
                out.append(value.translate(_ESC_ATTR))
                out.append('"')
            kids = (
                item.template_content.children
                if item.template_content is not None
                else item.children
            )
            if (
                not foreign_void_end_tags
                and item.namespace != HTML_NS
                and not kids
            ):
                # childless foreign element as self-closing start tag
                # (reference Serializer option foreignVoidEndTags=false,
                # Serializer.php:287-290)
                out.append("/>")
                continue
            out.append(">")
            if item.namespace == HTML_NS and item.name in VOID_ELEMENTS:
                continue
            stack.append(f"</{name}>")
            stack.extend(reversed(kids))
        elif isinstance(item, Text):
            parent = item.parent
            if (
                isinstance(parent, Element)
                and parent.namespace == HTML_NS
                and parent.name in _RAW_PARENTS
            ):
                out.append(item.data)
            else:
                out.append(item.data.translate(_ESC_TEXT))
        elif isinstance(item, Comment):
            out.append(f"<!--{item.data}-->")
        elif isinstance(item, Doctype):
            out.append(f"<!DOCTYPE {item.name}>")
        elif isinstance(item, ProcessingInstruction):
            out.append(f"<?{item.target} {item.data}>")
        elif isinstance(item, (Document, DocumentFragment)):
            stack.extend(reversed(item.children))


def serialize(
    node, bool_attr: bool = False, foreign_void_end_tags: bool = True
) -> str:
    """outerHTML: the node itself plus its subtree.

    ``bool_attr=True`` omits values of known boolean attributes
    (reference Serializer option, Serializer.php:22-53).
    ``foreign_void_end_tags=False`` self-closes childless foreign
    elements instead of emitting end tags (Serializer.php:287-290).
    """
    out = []
    _serialize_node(node, out, bool_attr, foreign_void_end_tags)
    return "".join(out)


def serialize_inner(
    node, bool_attr: bool = False, foreign_void_end_tags: bool = True
) -> str:
    """innerHTML: children only (template elements: their contents)."""
    out = []
    kids = (
        node.template_content.children
        if isinstance(node, Element) and node.template_content is not None
        else node.children
    )
    for child in kids:
        _serialize_node(child, out, bool_attr, foreign_void_end_tags)
    return "".join(out)
