"""HTML serialization (spec §13.3 fragment-serialization algorithm).

Reference parity: mensbeam/HTML-Parser lib/Parser/Serializer.php
(serialize/serializeInner :70-81, node walk :113-528, escaping
lib/Parser/NameCoercion.php:69-83).  Option parity:
- booleanAttributeValues -> ``bool_attr`` (implemented)
- foreignVoidEndTags     -> ``foreign_void_end_tags`` (implemented)
- reformatWhitespace / indentStep / indentWithSpaces / groupElements
  (the pretty-printer, Serializer.php:56-68, 133-208, 360-446,
  602-666): implemented in the ``reformat_whitespace=True`` path
  below — block detection ports the BLOCK_QUERY semantics (descendant
  scan with the preformatted-ancestry exclusion and the
  not(last()=1) conditional names) without XPath, and inline text
  runs are joined per the firstOfLine/lastOfLine rules over the
  nearest real-block ancestor.  The pretty path is a separate
  recursive serializer used only on demand; the default path stays
  the allocation-lean iterative walk (pretty output cannot affect
  span equality, so the hot pipeline never pays for it).
"""

import re as _re

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


def _emit_start_tag(item, out, bool_attr, foreign_void_end_tags, kids):
    """Append the start tag (incl. attrs) of ``item``; returns True if
    the element is fully serialized (void / self-closed foreign)."""
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
    if (
        not foreign_void_end_tags
        and item.namespace != HTML_NS
        and not kids
    ):
        # childless foreign element as self-closing start tag
        # (reference Serializer option foreignVoidEndTags=false,
        # Serializer.php:287-290)
        out.append("/>")
        return True
    out.append(">")
    return item.namespace == HTML_NS and item.name in VOID_ELEMENTS


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
            kids = (
                item.template_content.children
                if item.template_content is not None
                else item.children
            )
            if _emit_start_tag(item, out, bool_attr, foreign_void_end_tags, kids):
                continue
            stack.append(f"</{item.name}>")
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


# ---------------------------------------------------------------------------
# pretty printer (reformatWhitespace, Serializer.php:133-208, 360-446)

# elements whose CONTENT suspends reformatting (Serializer.php:19)
PREFORMATTED_ELEMENTS = frozenset(
    """iframe listing noembed noframes noscript plaintext pre style script
    textarea title xmp""".split()
)
# BLOCK_QUERY name list (Serializer.php:56): unconditional names...
_BLOCK_ALWAYS = frozenset(
    """address article aside blockquote base body canvas datalist details
    dialog dd div dl dt fieldset figcaption figure footer form frame
    frameset h1 h2 h3 h4 h5 h6 head header hr html isindex li link main
    meta nav ol optgroup option p picture pre section select script source
    style table tbody td tfoot th thead title tr ul video""".split()
)
# ...and the `and not(last() = 1)` conditional ones: they count as block
# only when the candidate descendant set has more than one member
_BLOCK_CONDITIONAL = frozenset(["button", "input", "output", "textarea"])
# "real" block ancestors for inline text-run joining (the ancestor::
# XPath in the Text branch, Serializer.php:397).  NOTE: the reference
# XPath spells the body test `name="body"` (an attribute-value test,
# not name()="body"), so body NEVER matches there; we reproduce that
# behavior bug-for-bug by omitting body — text directly under body
# joins runs under the nearest html ancestor, exactly as the
# reference does.
_REAL_BLOCK = frozenset(
    """address article aside blockquote canvas dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr html li
    main nav ol p section table tfoot ul video""".split()
)
_H_ELEMENTS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
_WS = "\t\n\x0c\r "
_RE_NL_WS = _re.compile(r"[\t\n\x0c\r ]*\n[\t\n\x0c\r ]*")
_RE_WS_RUN = _re.compile(r"[\t\n\x0c\r ]+")
_RE_SPACES = _re.compile(r" +")


class _Pretty:
    """Recursive reformatting serializer — offline convenience path
    (depth-bounded by Python recursion; the hot pipeline and the
    pathological-depth guarantees use the iterative default path)."""

    def __init__(self, bool_attr, foreign_void, indent_step, indent_with_spaces, group):
        self.bool_attr = bool_attr
        self.foreign_void = foreign_void
        self.step = indent_step
        self.char = " " if indent_with_spaces else "\t"
        self.group = group
        self._block_memo = {}
        self._runs = {}

    # -- block / preformatted classification ---------------------------
    def _kids(self, el):
        return (
            el.template_content.children
            if el.template_content is not None
            else el.children
        )

    def treat_as_block(self, node) -> bool:
        """BLOCK_QUERY port (Serializer.php:56, treatAsBlock :617-638):
        a node is treated as block when it HAS a block-named descendant
        (HTML namespace, not under a preformatted element).  In the
        reference XPath `.//*[ns][not-preformatted][name-pred][1]` the
        `not(last() = 1)` predicate on button/input/output/textarea is
        evaluated per child-axis step: `last()` is the number of
        HTML-namespace element children of THAT parent, so a
        conditional name counts as block only when its own parent has
        more than one qualifying element child.  Template contents are
        scanned too (treatAsBlockWithTemplates — the reference PHP DOM
        stores them as regular children)."""
        if isinstance(node, (Document, DocumentFragment)):
            return True
        if not isinstance(node, Element):
            node = getattr(node, "parent", None)
            if node is None:
                return False
            if isinstance(node, (Document, DocumentFragment)):
                return True
        key = id(node)
        memo = self._block_memo
        if key in memo:
            return memo[key]
        res = False
        # stack of sibling lists (child-axis steps), scanned per parent
        # so the conditional-name context size is that parent's own
        # HTML-ns element-child count
        stack = [self._kids(node)]
        while stack and not res:
            kids = stack.pop()
            n_ns = 0
            for el in kids:
                if isinstance(el, Element) and el.namespace == HTML_NS:
                    n_ns += 1
            for el in kids:
                if not isinstance(el, Element):
                    continue
                if el.namespace == HTML_NS:
                    if el.name in _BLOCK_ALWAYS or (
                        el.name in _BLOCK_CONDITIONAL and n_ns != 1
                    ):
                        res = True
                        break
                    if el.name in PREFORMATTED_ELEMENTS:
                        continue  # ancestor::pre-style exclusion
                stack.append(self._kids(el))
        memo[key] = res
        return res

    @staticmethod
    def is_preformatted_content(node) -> bool:
        n = node
        while n is not None:
            if (
                isinstance(n, Element)
                and n.namespace == HTML_NS
                and n.name in PREFORMATTED_ELEMENTS
            ):
                return True
            n = getattr(n, "parent", None)
        return False

    def _foreign_root_as_block(self, node) -> bool:
        # treatForeignRootAsBlock (Serializer.php:648-666)
        n = node
        while n is not None:
            p = getattr(n, "parent", None)
            if not (
                p is not None
                and isinstance(p, Element)
                and p.namespace != HTML_NS
            ):
                return self.treat_as_block(p) if p is not None else False
            n = p
        return False

    # -- inline text-run bookkeeping ------------------------------------
    def _text_run(self, text):
        """(ordered text-node list, index) under the nearest real-block
        ancestor of ``text`` (or the tree root) — template contents
        excluded, per the not(ancestor::template) filter."""
        anc = text.parent
        top = text
        while anc is not None:
            if (
                isinstance(anc, Element)
                and anc.namespace == HTML_NS
                and anc.name in _REAL_BLOCK
            ):
                break
            top = anc
            anc = getattr(anc, "parent", None)
        key_node = anc if anc is not None else top
        key = id(key_node)
        run = self._runs.get(key)
        if run is None:
            run = []
            stack = [key_node]
            while stack:
                n = stack.pop()
                if isinstance(n, Text):
                    run.append(n)
                elif isinstance(n, Element):
                    if n.template_content is not None:
                        continue  # not(ancestor::template)
                    stack.extend(reversed(n.children))
                elif isinstance(n, (Document, DocumentFragment)):
                    stack.extend(reversed(n.children))
            self._runs[key] = run
        return run, run.index(text)

    # -- node dispatch ---------------------------------------------------
    def _indent(self, out, level):
        out.append("\n")
        out.append(self.char * (level * self.step))

    def _group_break(self, out, node, same):
        """Extra newline between unlike siblings (groupElements):
        walk back past text siblings; break unless the nearest real
        sibling satisfies ``same`` (Serializer.php:185-198, 455-466)."""
        if not self.group:
            return
        sibs = node.parent.children if node.parent is not None else []
        try:
            i = sibs.index(node)
        except ValueError:
            return
        for j in range(i - 1, -1, -1):
            prev = sibs[j]
            if isinstance(prev, Text):
                continue
            if not same(prev):
                out.append("\n")
            return

    def node(self, item, out, level, first, fab, pre):
        # explicit-stack walk: pretty output must survive the same
        # pathological depths as the default iterative serializer
        # ("n" = render a node, "c" = emit an element's close tag)
        stack = [("n", item, level, first, fab, pre)]
        while stack:
            frame = stack.pop()
            if frame[0] == "c":
                _, name, lvl, do_indent = frame
                if do_indent:
                    self._indent(out, lvl)
                out.append(f"</{name}>")
                continue
            _, item, level, first, fab, pre = frame
            if isinstance(item, (Document, DocumentFragment)):
                kids = item.children
                for i in range(len(kids) - 1, -1, -1):
                    stack.append(
                        ("n", kids[i], level, first and i == 0, fab, pre)
                    )
                continue
            if isinstance(item, Element):
                cont = self._element_open(item, out, level, first, fab, pre)
                if cont is None:
                    continue
                kids, fab2, do_indent = cont
                stack.append(("c", item.name, level, do_indent))
                for i in range(len(kids) - 1, -1, -1):
                    stack.append(("n", kids[i], level + 1, False, fab2, False))
            elif isinstance(item, Text):
                self._text(item, out, fab, pre)
            elif isinstance(item, Comment):
                self._positioned_literal(
                    item, out, level, first, fab, pre,
                    lambda prev: isinstance(prev, Comment),
                )
                out.append(f"<!--{item.data}-->")
            elif isinstance(item, ProcessingInstruction):
                self._positioned_literal(
                    item, out, level, first, fab, pre,
                    lambda prev: isinstance(prev, ProcessingInstruction),
                )
                out.append(f"<?{item.target} {item.data}>")
            elif isinstance(item, Doctype):
                if not first:
                    out.append("\n")
                out.append(f"<!DOCTYPE {item.name}>")

    def _positioned_literal(self, item, out, level, first, fab, pre, same):
        # comment / PI positioning (Serializer.php:452-500)
        if first:
            return
        if pre or self.is_preformatted_content(item):
            return
        if fab or self.treat_as_block(item.parent):
            self._group_break(out, item, same)
            self._indent(out, level)

    def _element_open(self, el, out, level, first, fab, pre):
        """Prefix + start tag for one element.  Returns None when the
        subtree is fully emitted here (void, preformatted-verbatim, or
        childless); else ``(kids, child_fab, close_indent)`` for the
        caller's explicit stack."""
        kids = self._kids(el)
        name = el.name
        html = el.namespace == HTML_NS
        preformatted = pre or self.is_preformatted_content(el)
        modify = False
        if not preformatted or (html and name in PREFORMATTED_ELEMENTS):
            if html:
                parent = el.parent
                if not first and parent is not None and self.treat_as_block(parent):
                    modify = True
            elif fab:
                modify = True
            else:
                parent = el.parent
                if parent is None:
                    modify = True
                    fab = True
                elif (
                    not isinstance(parent, Element)
                    or parent.namespace == HTML_NS
                ):
                    if self.treat_as_block(parent):
                        modify = True
                        fab = True
                elif self._foreign_root_as_block(parent):
                    modify = True
                    fab = True
            if not first and modify:
                self._group_break(
                    out,
                    el,
                    lambda prev: isinstance(prev, (Element, Doctype))
                    and (
                        not isinstance(prev, Element)
                        or prev.name == name
                        or (prev.name in _H_ELEMENTS and name in _H_ELEMENTS)
                    ),
                )
                self._indent(out, level)
        if _emit_start_tag(el, out, self.bool_attr, self.foreign_void, kids):
            return None
        if preformatted:
            # content verbatim: reformatting suspended for the subtree
            for child in kids:
                _serialize_node(child, out, self.bool_attr, self.foreign_void)
            out.append(f"</{name}>")
            return None
        if not kids:
            out.append(f"</{name}>")
            return None
        close_indent = any(isinstance(k, Element) for k in kids) and (
            fab or (html and self.treat_as_block(el))
        )
        return kids, fab, close_indent

    def _text(self, text, out, fab, pre):
        parent = text.parent
        if (
            isinstance(parent, Element)
            and parent.namespace == HTML_NS
            and parent.name in _RAW_PARENTS
        ):
            out.append(text.data)
            return
        data = text.data
        if not (pre or self.is_preformatted_content(text)):
            as_block = self.treat_as_block(text)
            all_ws = not data.strip(_WS)
            if (fab or as_block) and all_ws:
                return
            if as_block:
                # block formatting context: trim + collapse
                data = _RE_WS_RUN.sub(" ", data.strip(_WS))
                if not data:
                    return
            elif _RE_WS_RUN.search(data):
                # inline formatting context (Serializer.php:380-446)
                data = _RE_NL_WS.sub("\n", data)
                data = data.replace("\t", " ").replace("\n", " ")
                data = _RE_SPACES.sub(" ", data)
                run, idx = self._text_run(text)
                first_of_line = idx == 0
                last_of_line = idx == len(run) - 1
                if not first_of_line and run[idx - 1].data[-1:] in tuple(_WS):
                    data = data.lstrip(_WS)
                if first_of_line:
                    data = data.lstrip(_WS)
                if last_of_line:
                    data = data.rstrip(_WS)
        out.append(data.translate(_ESC_TEXT))


def serialize(
    node,
    bool_attr: bool = False,
    foreign_void_end_tags: bool = True,
    reformat_whitespace: bool = False,
    indent_step: int = 1,
    indent_with_spaces: bool = True,
    group_elements: bool = True,
) -> str:
    """outerHTML: the node itself plus its subtree.

    ``bool_attr=True`` omits values of known boolean attributes
    (reference Serializer option, Serializer.php:22-53).
    ``foreign_void_end_tags=False`` self-closes childless foreign
    elements instead of emitting end tags (Serializer.php:287-290).
    ``reformat_whitespace=True`` pretty-prints (Serializer.php pretty
    printer; indent_step/indent_with_spaces/group_elements as in the
    reference, defaults matching verifyConfiguration :531-540).
    """
    if reformat_whitespace:
        out = []
        _Pretty(
            bool_attr, foreign_void_end_tags, indent_step,
            indent_with_spaces, group_elements,
        ).node(node, out, 0, True, False, False)
        return "".join(out)
    out = []
    _serialize_node(node, out, bool_attr, foreign_void_end_tags)
    return "".join(out)


def serialize_inner(
    node,
    bool_attr: bool = False,
    foreign_void_end_tags: bool = True,
    reformat_whitespace: bool = False,
    indent_step: int = 1,
    indent_with_spaces: bool = True,
    group_elements: bool = True,
) -> str:
    """innerHTML: children only (template elements: their contents)."""
    kids = (
        node.template_content.children
        if isinstance(node, Element) and node.template_content is not None
        else node.children
    )
    if reformat_whitespace:
        out = []
        p = _Pretty(
            bool_attr, foreign_void_end_tags, indent_step,
            indent_with_spaces, group_elements,
        )
        p.inner(kids, out, 0, True, False, False)
        return "".join(out)
    out = []
    for child in kids:
        _serialize_node(child, out, bool_attr, foreign_void_end_tags)
    return "".join(out)
