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

    def parse_marked_section(self, i: int, report: int = 1) -> int:
        """Totalize stdlib's marked-section wart: ``_markupbase`` RAISES
        AssertionError on a ``<![`` whose keyword is unknown or missing
        (e.g. ``<![foo]>``, ``<![>``) — junk that arbitrary web text does
        contain.  Convert the raise to WHATWG bogus-comment handling
        (consume through the next ``>``; unterminated → stdlib's
        DATA-at-EOF fallback via the ``-1`` return).  Inputs stdlib
        parses without raising are untouched."""
        try:
            return super().parse_marked_section(i, report)
        except AssertionError:
            k = self.rawdata.find(">", i + 2)
            return k + 1 if k != -1 else -1


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
# <[^>]*> splitter gets wrong).  The element branch captures the closing
# slash and the tag name directly ([a-zA-Z0-9:-] ⊂ [^>"'], so hoisting
# the name out of the attribute run matches the same strings) — one
# C-level match yields token split + name, where a separate name regex
# per tag used to double the match count on the hot path.
#
# In a START tag a quote may span '>' ONLY as an attribute VALUE, which
# per stdlib's attrfind_tolerant means it directly follows ``name=`` — a
# BARE quote is an attribute-name character and the next '>' then ends
# the tag ('<C ">">' is tag '<C ">' plus data '">').  The lookbehind pins
# the '=' to a name-ending char; quote-after-'=='/'= '/bare-quote forms
# make the start branch FAIL, and the tokenizer bails to the stdlib
# oracle (correct by fallback, never by guess).  An END tag is different:
# stdlib's tolerant parse_endtag finds the FIRST '>' after the tag name —
# quoted values do NOT span '>' there ('</b x="1>2">' ends at the '>'
# inside the quotes), so the end branch has no quote alternations.
_TAG_RE = _re.compile(
    r"""<(?:
        !--.*?--\s*>              # comment (closes at stdlib's --\s*>)
      | !(?!--|\[)[^>]*>          # doctype / bogus comment — but NOT a
                                  # '!--' opener whose comment branch
                                  # failed (stdlib treats an unterminated
                                  # comment as trailing DATA at EOF) and
                                  # NOT a '<![' marked section (its close
                                  # delimiter depends on the keyword and
                                  # may span '>' — handled in the loop)
      | \?[^>]*>                  # processing instruction
      | /([a-zA-Z][a-zA-Z0-9:-]*)[^>]*>   # end tag — first '>' wins
      | ([a-zA-Z][a-zA-Z0-9:-]*)[^>"']*
        (?:(?<=[^\s/=>"'])=\s*"[^"]*"[^>"']*
          |(?<=[^\s/=>"'])=\s*'[^']*'[^>"']*)*>
    )""",
    _re.DOTALL | _re.VERBOSE,
)
# Marked sections ('<![…'), mirrored from _markupbase.parse_marked_section:
# a keyword matched by _declname_match dispatches on its lowercased value —
# SGML-style sections close at ']]>' (whitespace-tolerant: ']\s*]\s*>'),
# MS-conditional ones at ']>'; an unterminated section becomes raw DATA at
# EOF via goahead's find('>') fallback.  An unknown or missing keyword
# makes stdlib RAISE AssertionError — a wart real web text does trip — so
# the oracle is totalized (``_BlockCollector.parse_marked_section``) to
# WHATWG bogus-comment handling: consume through the next '>'.
_MS_NAME_RE = _re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")  # _declname_match
_MS_SGML_CLOSE = _re.compile(r"]\s*]\s*>")  # _markedsectionclose
_MS_COND_CLOSE = _re.compile(r"]\s*>")      # _msmarkedsectionclose
_MS_SGML_NAMES = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MS_COND_NAMES = frozenset({"if", "else", "endif"})
# stdlib HTMLParser enters CDATA mode for these: everything until the
# matching close tag is raw text, markup inside is NOT parsed.  The mode
# exits ONLY at a STRICT close — set_cdata_mode's `interesting` regex is
# '</\s*{name}\s*>' (no attributes or junk), so '</script x>' is plain
# data the scan never even stops at, and the first strict match wins.
_CDATA_TAGS = ("script", "style")
_CDATA_CLOSE = {
    t: _re.compile(rf"</\s*{t}\s*>", _re.IGNORECASE) for t in _CDATA_TAGS
}
_AMP = "&"
# An '=' that does NOT open a quoted value (mod whitespace) and whose
# UNQUOTED value run then swallows a quote char — the one shape that lets
# stdlib's attrfind pair a start tag's quotes differently than our
# tokenizer (see the extent-verification comment in html_blocks_fast).
# Plain unquoted values ('id=x3', value ends at whitespace/'>' without a
# quote) do not match, so clean mixed-quoting tags skip verification.
_RISKY_EQ_RE = _re.compile(r"=(?!\s*[\"'])\s*[^>\s]*[\"']")
# Characters that TERMINATE a tag name under stdlib's tagfind_tolerant
# ('[a-zA-Z][^\t\n\r\f />\x00]*'): if the char after our captured name is
# not one of these, stdlib's name would run longer than ours.
_NAME_BREAK = " \t\n\r\f/>\x00"

# One-lookup tag dispatch for the hot loop: tag name → class code.
# script/style are BOTH raw-text (CDATA mode) and ignored-subtree tags —
# the _CDATA code applies on start tags, the end tag decrements
# ignore_depth like any ignored tag (stdlib leaves CDATA mode at the
# matching close tag).
_K_CDATA, _K_IGNORED, _K_A, _K_BLOCK = 1, 2, 3, 4
_TAG_KIND = {t: _K_BLOCK for t in BLOCK_TAGS}
_TAG_KIND.update({t: _K_IGNORED for t in IGNORED_TAGS})
_TAG_KIND.update({t: _K_CDATA for t in _CDATA_TAGS})
_TAG_KIND["a"] = _K_A


# stdlib's own start-tag machinery, reused verbatim so the fast path's
# startend-vs-start decision cannot drift from parse_starttag's: hand-
# rolled heuristics here kept losing to attrfind corner cases found by
# fuzzing ('$' matching before a trailing newline; '='-leading attribute
# NAMES like '<a =x/>' where the slash stands alone; values absorbed
# across '\s*=+\s*' only when GLUED to the '/').
from html import parser as _hp

_ATTRFIND_TOLERANT = _hp.attrfind_tolerant
_TAGFIND_TOLERANT = _hp.tagfind_tolerant
_LOCATE_STARTTAG_END = _hp.locatestarttagend_tolerant


def _is_startendtag(token: str) -> bool | None:
    """Does a start-tag token ending ``/>`` self-close per stdlib
    semantics?  ``token`` is the WHOLE tag, angle brackets included.

    Mirrors ``HTMLParser.parse_starttag`` exactly, with stdlib's own
    regexes: locate the tag extent (``check_for_whole_start_tag``), walk
    the attributes (``tagfind_tolerant`` + ``attrfind_tolerant``), and
    classify by the unconsumed residue — ``'/>'`` → self-closing
    (``handle_startendtag``); ``'>'`` → the slash was absorbed into an
    unquoted attribute value (``<a href=x/>`` is a START tag with
    ``href="x/"``, round-3 ADVICE).  Any other residue is
    ``parse_starttag``'s malformed-tag fallback (the whole token re-
    emitted as DATA), and an extent that disagrees with our tokenizer
    means the token split itself is suspect — both return ``None`` and
    the caller bails to the oracle.
    """
    j = _LOCATE_STARTTAG_END.match(token).end()
    if token.startswith("/>", j):
        j += 2
    elif token.startswith(">", j):
        j += 1
    else:
        return None  # check_for_whole_start_tag's bogus-input branches
    if j != len(token):
        return None  # stdlib's tag extent ≠ ours — let the oracle split
    k = _TAGFIND_TOLERANT.match(token, 1).end()
    while k < j:
        am = _ATTRFIND_TOLERANT.match(token, k)
        if not am:
            break
        k = am.end()
    end = token[k:].strip()
    if end == "/>":
        return True
    if end == ">":
        return False
    return None  # malformed: stdlib re-emits the token as raw DATA


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
    find = html.find
    tag_match = _TAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            emit(html[pos:])
            break
        if lt > pos:
            emit(html[pos:lt])
        m = tag_match(html, lt)
        if not m:
            if html[lt + 1: lt + 3] == "![":
                # marked section — replicate totalized-stdlib semantics
                # (see _MS_* above) instead of bailing: these are common
                # enough in web text (IE conditionals, XHTML CDATA) that
                # a bail would forfeit the fast path on real pages
                nm = _MS_NAME_RE.match(html, lt + 3)
                close = None
                if nm and nm.end() < n:
                    sect = nm.group().strip().lower()
                    if sect in _MS_SGML_NAMES:
                        close = _MS_SGML_CLOSE.search(html, lt + 3)
                    elif sect in _MS_COND_NAMES:
                        close = _MS_COND_CLOSE.search(html, lt + 3)
                    else:  # unknown keyword → totalized bogus comment
                        gt = find(">", lt + 2)
                        if gt != -1:
                            pos = gt + 1
                            continue
                elif nm is None and lt + 3 < n:
                    # no name token (e.g. '<![>') → same totalization;
                    # '<![' at EOF is stdlib's (None, -1) → fallback
                    gt = find(">", lt + 2)
                    if gt != -1:
                        pos = gt + 1
                        continue
                if close:
                    pos = close.end()  # section consumed, no data
                    continue
                # unterminated at EOF — goahead fallback: DATA through
                # the next '>', else to the next '<', else one char (the
                # rest then re-parses as ordinary text/markup); the
                # fallback unescapes under convert_charrefs, same as emit
                gt = find(">", lt + 1)
                if gt != -1:
                    k = gt + 1
                else:
                    k = find("<", lt + 1)
                    if k == -1:
                        k = lt + 1
                emit(html[lt:k])
                pos = k
                continue
            nxt = find("<", lt + 1)
            if html[lt + 1: lt + 2].isalpha() or html[lt + 1: lt + 2] in "/!?":
                # looks like a tag but didn't tokenize (unterminated /
                # exotic) — bail to the oracle parser
                return None
            # bare '<' is character data (stdlib behaviour)
            emit(html[lt: nxt if nxt != -1 else n])
            pos = nxt if nxt != -1 else n
            continue
        pos = m.end()
        li = m.lastindex  # 1 = end-tag name group, 2 = start-tag name
        if li is None:
            # comment / doctype / processing instruction
            continue
        closing = li == 1
        name = m.group(li)
        # stdlib's tolerant tag NAME runs to whitespace / '/' / '>'
        # (tagfind_tolerant) — it may contain '<', quotes, '=', '.' …
        # ('<a<>' is a start tag named 'a<', NOT an anchor).  Our capture
        # stops at [a-zA-Z0-9:-]; if the next char would extend the
        # stdlib name, the names disagree — bail to the oracle rather
        # than misclassify a junk-named tag as a real one.
        nb = html[lt + (2 if closing else 1) + len(name)]
        if nb not in _NAME_BREAK:
            return None
        if nb == "\x00" and not closing:
            # NUL directly after a start-tag name: it terminates
            # tagfind's name yet is the ONE name-breaking char the
            # attribute machinery cannot reach (every attr name needs a
            # ['"\s/] boundary before it, and ws / '/' / '>' are the
            # other breakers) — stdlib's locator STALLS, parse_starttag
            # re-emits '<name' alone as DATA and resumes AT the NUL.
            # Rare junk: bail.  End tags are immune (parse_endtag's
            # tolerant branch just finds the next '>' after the name).
            return None
        lname = name.lower()
        kind = _TAG_KIND.get(lname)
        if not closing:
            if html[pos - 2] == "/":  # start token ends '/>'
                se = _is_startendtag(html[lt:pos])
                if se is None:
                    # malformed tag stdlib re-emits as DATA, or extent
                    # disagreement — use the oracle
                    return None
                if se:
                    # XHTML self-closing tag: stdlib fires start+end
                    # back-to-back (handle_startendtag) and does NOT
                    # enter CDATA mode for script/style — ignore/a depths
                    # are net-unchanged; a block tag flushes once.
                    if kind == _K_BLOCK and not ignore_depth and buf:
                        flush()
                    continue
            elif (
                # Our regex and stdlib agree trivially on quote-free
                # tokens (both chew arbitrary junk to the first '>':
                # every char is consumable by tagfind/attrfind, and only
                # QUOTED values may cross '>').  With quotes present, the
                # two pair them differently ONLY when some '=' sits
                # inside an UNQUOTED value — stdlib's attrfind consumes
                # 'href=!x="<b' as ONE bare value ([^>\s]*, quotes and
                # all) where our lookbehind reads '!x="' as a value
                # opener; a fixed-width lookbehind cannot see
                # "attribute-name position".  When instead every '=' in
                # the token directly opens a quote, both machines are
                # forced to the same openers, hence the same pairing and
                # the same extent.  So: a bare value swallowing a quote
                # (rare — _RISKY_EQ_RE) → verify the extent with stdlib's
                # own locator, bail on disagreement — catching both
                # fuzz-found shapes (our quoted value spans a '>' stdlib
                # ends at; stdlib's spans OUR final '>').  A clean tag,
                # quoted or not, costs one C-level scan and never
                # verifies.  The '/>'-ending shape is extent-checked in
                # _is_startendtag.
                _RISKY_EQ_RE.search(html, lt, pos)
                and _LOCATE_STARTTAG_END.match(html, lt).end() != pos - 1
            ):
                return None
        if kind is None:
            if ignore_depth:
                continue
        elif kind == _K_BLOCK:
            if ignore_depth:
                continue
            if buf:  # emit() pairs buf growth with link_chars, so an
                flush()  # empty buf has nothing to flush or reset
        elif kind == _K_CDATA and not closing:
            # raw-text element: skip to the first STRICT close tag
            # (stdlib CDATA mode — markup inside is NOT parsed, and a
            # junk close like '</script x>' is plain data the strict
            # `interesting` scan never stops at); the close is tokenized
            # on the next loop turn and decrements the depth.  No close →
            # the mode runs to EOF, everything suppressed as ignored data.
            end = _CDATA_CLOSE[lname].search(html, pos)
            pos = end.start() if end else n
            ignore_depth += 1  # script/style are both IGNORED_TAGS
        elif kind in (_K_IGNORED, _K_CDATA):
            if closing:
                ignore_depth = max(0, ignore_depth - 1)
            else:
                ignore_depth += 1
        else:  # _K_A
            if ignore_depth:
                continue
            if closing:
                a_depth = max(0, a_depth - 1)
            else:
                a_depth += 1
    if buf:
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
