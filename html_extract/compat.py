"""Reference-shaped API facade.

Mirrors the public classes/static methods of mensbeam/HTML-Parser
(lib/Parser.php:49-83, lib/Parser/Serializer.php:70-81,
lib/DOMParser.php:76-105) so pipelines written against the reference
can switch imports and keep their call shapes:

    from html_extract.compat import Parser, DOMParser
    out = Parser.parse(bytes_or_str, "text/html; charset=utf-8")
    html = Parser.serialize(out.document)
    frag = Parser.parseFragment(context_element, 0, "<td>x")
"""

from .dom import Element
from .parser import Config, Output, parse as _parse, parse_fragment as _parse_fragment
from .serializer import serialize as _serialize, serialize_inner as _serialize_inner
from . import domparser as _domparser

# Quirks-mode constants (Parser.php class constants)
NO_QUIRKS_MODE = 0
QUIRKS_MODE = 1
LIMITED_QUIRKS_MODE = 2


class Parser:
    NO_QUIRKS_MODE = NO_QUIRKS_MODE
    QUIRKS_MODE = QUIRKS_MODE
    LIMITED_QUIRKS_MODE = LIMITED_QUIRKS_MODE

    @staticmethod
    def parse(data, encoding_or_content_type=None, config: Config | None = None) -> Output:
        """Parser::parse(string, ?string, ?Config): Output (Parser.php:49)."""
        return _parse(data, content_type=encoding_or_content_type, config=config)

    @staticmethod
    def parseFragment(context, quirks_mode=0, data="", encoding_or_content_type=None, config=None):
        """Parser::parseFragment(DOMElement, int, string, ...) (Parser.php:61).

        ``context`` may be an Element or a tag-name string; returns a
        DocumentFragment.  quirks_mode is accepted for signature parity
        (fragment parsing here does not re-tokenize by quirks).
        """
        if isinstance(context, Element):
            context = (context.namespace, context.name)
        return _parse_fragment(context, data, config=config)

    @staticmethod
    def serialize(node, bool_attr: bool = False) -> str:
        return _serialize(node, bool_attr=bool_attr)

    @staticmethod
    def serializeInner(node, bool_attr: bool = False) -> str:
        return _serialize_inner(node, bool_attr=bool_attr)


class DOMParser:
    """DOMParser::parseFromString(string, string) (DOMParser.php:76)."""

    def parseFromString(self, data, content_type: str):
        return _domparser.parse_from_string(data, content_type).document
