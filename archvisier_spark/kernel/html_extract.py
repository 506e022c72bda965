"""HTML main-content extraction (boilerplate strip) — north-rule payload.

The reference contains no HTML/DOM code (SURVEY.md §7 honesty note); this
tier is specified by BASELINE.json:north_star — "HTML DOM boilerplate
stripping via text-density/link-density heuristics over a parsed node
tree".  The design follows the published boilerpipe (Kohlschütter et al.,
WSDM 2010) / jusText family of heuristics, implemented from scratch on the
stdlib ``html.parser`` node stream:

1. tokenize the document into a block sequence — text runs flushed at
   block-level tag boundaries, with per-block total chars and chars under
   ``<a>`` (link chars);
2. classify each block: content iff it is long enough AND its link density
   (link_chars / chars) is low;
3. emit the content blocks joined by a single newline.

This module is the oracle for the Spark HTML path; it runs verbatim inside
the extraction pandas UDF.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Tags that open/close a visual block — flush the text buffer at each.
BLOCK_TAGS = frozenset(
    """p div section article main header footer nav aside li ul ol dl dd dt
    td th tr table thead tbody tfoot h1 h2 h3 h4 h5 h6 blockquote pre
    figure figcaption form fieldset address hr br""".split()
)
# Subtrees that never contribute visible text.
IGNORED_TAGS = frozenset("script style noscript template svg head iframe object".split())

MIN_BLOCK_CHARS = 25       # shorter blocks are headlines/crumbs/boilerplate
MAX_LINK_DENSITY = 0.33    # blocks dominated by anchor text are navigation


class _BlockCollector(HTMLParser):
    """Flatten an HTML document into (text, link_chars) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._a_depth = 0
        self._ignore_depth = 0

    def _flush(self) -> None:
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append((text, self._link_chars))
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in IGNORED_TAGS:
            self._ignore_depth += 1
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in IGNORED_TAGS:
            self._ignore_depth = max(0, self._ignore_depth - 1)
            return
        if self._ignore_depth:
            return
        if tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._ignore_depth or not data:
            return
        self._buf.append(data)
        if self._a_depth:
            self._link_chars += len(data)

    def close(self) -> None:  # flush any trailing text
        super().close()
        self._flush()


def html_blocks_stdlib(html: str) -> list[tuple[str, int]]:
    """Parse ``html`` into (raw_text, link_chars) block tuples via the
    stdlib HTMLParser — the correctness oracle for the fast tokenizer."""
    collector = _BlockCollector()
    collector.feed(html)
    collector.close()
    return collector.blocks


# --- fast tokenizer: one C-speed regex pass over the markup ---

import re as _re
from html import unescape as _unescape

# A tag token: comment | declaration/PI | name with optionally-quoted
# attribute values (quoted values may contain '>' — the ambiguity a naive
# <[^>]*> splitter gets wrong).
_TAG_RE = _re.compile(
    r"""<(?:
        !--.*?--\s*>              # comment
      | !\[CDATA\[.*?\]\]>        # CDATA section
      | [!?][^>]*>                # doctype / processing instruction
      | /?[a-zA-Z][^>"']*(?:"[^"]*"[^>"']*|'[^']*'[^>"']*)*>
    )""",
    _re.DOTALL | _re.VERBOSE,
)
_NAME_RE = _re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)")
# stdlib HTMLParser enters CDATA mode for these: everything until the
# matching close tag is raw text, markup inside is NOT parsed
_CDATA_TAGS = ("script", "style")
_CDATA_CLOSE = {
    t: _re.compile(rf"</\s*{t}", _re.IGNORECASE) for t in _CDATA_TAGS
}
_AMP = "&"
_WS_OR_QUOTE = " \t\n\r\f\"'"


# stdlib attrfind attaches an unquoted value across whitespace around '='
# (`name \s*=+\s* value`), absorbing a trailing '/' into the VALUE:
# '<script src = x/>' is a START tag entering CDATA mode (round-3
# ADVICE).  The absorption happens only when the '='-run is preceded by a
# well-formed attribute NAME (first char not '='), itself preceded by a
# whitespace/quote/slash boundary — mirror exactly that.
_EQ_ABSORB_RE = _re.compile(r"""[\s"'/][^\s/>=][^\s/=>]*\s*=+\s*[^\s"'=]*$""")
# '=' + whitespace + unquoted run at end WITHOUT a preceding attribute
# name (e.g. '<a = x/>'): stdlib then treats '=' as a bare attribute and
# the slash stands alone — rare and subtle, so defer to the oracle.
_EQ_WS_VALUE_RE = _re.compile(r"=\s+[^\s\"'=]*$")


def _is_startendtag(token: str) -> bool | None:
    """Does a tag token ending ``/>`` self-close per stdlib semantics?

    Mirrors ``HTMLParser.parse_starttag``: the trailing ``/`` is a
    self-close marker (→ ``handle_startendtag``) UNLESS it is absorbed
    into a preceding *unquoted* attribute value (``<a href=x/>`` parses as
    a start tag with ``href="x/"``).  The slash stands alone when the run
    since the last whitespace/quote boundary is the bare tag name, a bare
    attribute name, or empty — i.e. contains no ``=``.

    Whitespace-adjacent ``=`` (``src = x/>``): stdlib's ``'\\s*=+\\s*'``
    attachment absorbs the slash into the value when the ``=`` follows an
    attribute NAME (→ ``False``, start tag); with no name to attach to
    (``<a = x/>``) the semantics are subtler — returns ``None`` and the
    caller bails to the stdlib oracle.
    """
    body = token[1:-2]
    i = max(body.rfind(ch) for ch in _WS_OR_QUOTE)
    if i == -1:
        return True  # '<name/>' — no attributes
    if "=" in body[i + 1:]:
        return False  # '<a href=x/>': slash absorbed into the value
    if _EQ_ABSORB_RE.search(body):
        return False  # '<a href = x/>': absorbed across the whitespace
    if _EQ_WS_VALUE_RE.search(body):
        return None  # spaced '=' with no attribute name → defer to stdlib
    return True


def html_blocks_fast(html: str) -> list[tuple[str, int]] | None:
    """Single-regex-pass block tokenizer, byte-equal to the stdlib path on
    well-formed markup (pinned by a differential fuzz test).  Returns
    ``None`` when it meets markup it cannot token-split with certainty
    (an unterminated tag at EOF) — callers fall back to the oracle."""
    blocks: list[tuple[str, int]] = []
    buf: list[str] = []
    link_chars = 0
    a_depth = 0
    ignore_depth = 0

    def flush() -> None:
        nonlocal buf, link_chars
        text = "".join(buf)
        if text.strip():
            blocks.append((text, link_chars))
        buf = []
        link_chars = 0

    def emit(data: str) -> None:
        nonlocal link_chars
        if ignore_depth or not data:
            return
        if _AMP in data:
            data = _unescape(data)
        buf.append(data)
        if a_depth:
            link_chars += len(data)

    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt == -1:
            emit(html[pos:])
            break
        if lt > pos:
            emit(html[pos:lt])
        m = _TAG_RE.match(html, lt)
        if not m:
            nxt = html.find("<", lt + 1)
            if html[lt + 1: lt + 2].isalpha() or html[lt + 1: lt + 2] in "/!?":
                # looks like a tag but didn't tokenize (unterminated /
                # exotic) — bail to the oracle parser
                return None
            # bare '<' is character data (stdlib behaviour)
            emit(html[lt: nxt if nxt != -1 else n])
            pos = nxt if nxt != -1 else n
            continue
        token = m.group(0)
        pos = m.end()
        if token.startswith(("<!", "<?")):
            continue
        nm = _NAME_RE.match(token)
        if not nm:
            continue
        closing = token.startswith("</")
        tag = nm.group(1).lower()
        if token.endswith("/>"):
            if closing:
                # '</tag/>' is ambiguous: stdlib treats it as an end tag
                # outside CDATA mode but as raw DATA inside it — bail to
                # the oracle rather than replicate that mode split.
                return None
            se = _is_startendtag(token)
            if se is None:
                # '=' + whitespace + unquoted run before '/>' — stdlib
                # value attachment is ambiguous here; use the oracle
                return None
            if se:
                # XHTML self-closing tag: stdlib fires start+end
                # back-to-back (handle_startendtag) and does NOT enter
                # CDATA mode for script/style — ignore/a depths are
                # net-unchanged; a block tag flushes once.
                if not ignore_depth and tag in BLOCK_TAGS:
                    flush()
                continue
        if not closing and tag in _CDATA_TAGS:
            # raw-text element: skip straight to its close tag (stdlib
            # CDATA mode — markup inside is NOT parsed); the close tag is
            # tokenized on the next loop turn and decrements the depth
            end = _CDATA_CLOSE[tag].search(html, pos)
            pos = end.start() if end else n
            ignore_depth += 1  # script/style are both IGNORED_TAGS
            continue
        if tag in IGNORED_TAGS:
            if closing:
                ignore_depth = max(0, ignore_depth - 1)
            else:
                ignore_depth += 1
            continue
        if ignore_depth:
            continue
        if tag == "a":
            if closing:
                a_depth = max(0, a_depth - 1)
            else:
                a_depth += 1
        if tag in BLOCK_TAGS:
            flush()
    flush()
    return blocks


def html_blocks(html: str) -> list[tuple[str, int]]:
    """Fast tokenizer with stdlib fallback — identical outputs by
    construction (differential-fuzzed)."""
    fast = html_blocks_fast(html)
    if fast is not None:
        return fast
    return html_blocks_stdlib(html)


def extract_main_text(
    html: str,
    min_block_chars: int = MIN_BLOCK_CHARS,
    max_link_density: float = MAX_LINK_DENSITY,
) -> str:
    """Strip boilerplate: keep long, low-link-density blocks.

    Per-block: ``stripped = text.strip()``; keep iff
    ``len(stripped) >= min_block_chars`` and
    ``link_chars / len(text) <= max_link_density``.  Content blocks join
    with a single ``\\n`` — this joined string is the byte-identity target
    for the HTML rows of the corpus.
    """
    kept: list[str] = []
    for text, link_chars in html_blocks(html):
        stripped = text.strip()
        if len(stripped) < min_block_chars:
            continue
        if link_chars / max(len(text), 1) > max_link_density:
            continue
        kept.append(stripped)
    return "\n".join(kept)
