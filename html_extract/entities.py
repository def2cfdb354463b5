"""Named character reference table + longest-prefix matcher.

The WHATWG named-character-references table (≈2231 entries including the
106 legacy semicolon-less forms) ships in the Python stdlib as
``html.entities.html5`` — the same data the reference generates into
lib/Parser/CharacterReference.php (RoboFile.php:159-262).  We wrap it
with the spec's longest-match semantics (§13.2.5.73 named character
reference state), which ``html.unescape`` does NOT implement faithfully
for attribute contexts.

Loaded once per worker process; the per-first-char length index below is
the "entity trie" actor state called out in SURVEY.md §2.4.
"""

from html.entities import html5 as _HTML5

# name (sans '&') -> replacement text.  Keys may end with ';'.
NAMES = dict(_HTML5)
MAX_NAME_LEN = max(len(k) for k in NAMES)  # 32 incl. ';'

# Semicolon-less legacy names, for the decreasing-length scan.
LEGACY = frozenset(k for k in NAMES if not k.endswith(";"))
_MAX_LEGACY_LEN = max(len(k) for k in LEGACY)

_ALNUM = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
)


def match_named(s: str, pos: int):
    """Longest named-reference match in ``s`` starting just after an '&'.

    Returns ``(consumed_length, replacement, had_semicolon)`` or
    ``None``.  ``consumed_length`` counts characters after the '&'.
    """
    n = len(s)
    end = min(n, pos + MAX_NAME_LEN)
    i = pos
    while i < end and s[i] in _ALNUM:
        i += 1
    run_len = i - pos
    if run_len == 0:
        return None
    run = s[pos:i]
    # A name containing ';' can only be the full alnum run + ';'.
    if i < n and s[i] == ";":
        cand = run + ";"
        if cand in NAMES:
            return run_len + 1, NAMES[cand], True
    # Legacy semicolon-less names: longest prefix of the run.
    for ln in range(min(run_len, _MAX_LEGACY_LEN), 0, -1):
        cand = run[:ln]
        if cand in LEGACY:
            return ln, NAMES[cand], False
    return None
