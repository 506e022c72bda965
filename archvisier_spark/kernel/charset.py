"""Charset detection for web payloads (north-rule HTML tier).

Real Common-Crawl HTML is not all UTF-8: legacy Polish pages ship
ISO-8859-2 / windows-1250, and UTF-16 appears with BOMs.  This implements
a simplified WHATWG encoding sniff (html.spec.whatwg.org §13.2.3.2
"determining the character encoding" — a public spec; the reference has
no HTML tier, SURVEY.md §7):

1. **BOM** wins: UTF-8 / UTF-16LE/BE / UTF-32LE/BE signatures.
2. Else the **transport layer** (the HTTP/WARC ``Content-Type`` header a
   Common-Crawl record carries, passed as ``declared``).
3. Else a **meta prescan** of the first 1024 bytes for
   ``<meta … charset=…>`` (covers both the HTML5 form and the
   ``http-equiv`` content-type form, since ``charset=`` appears inside
   the content attribute either way).
4. Else UTF-8.

Per the WHATWG rules, a ``charset=utf-16*`` *meta declaration* (without
BOM) is treated as UTF-8 — an ASCII-readable meta tag proves the bytes
are not actually UTF-16 — while a transport-layer UTF-16 label is
honored as-is (§13.2.3.2 trusts a supported transport encoding; bare
``utf-16`` → UTF-16LE per the label table).  ``x-user-defined`` maps to
windows-1252.
Decoding always uses ``errors="ignore"`` (the engine's naive-read
contract) and strips the BOM character.
"""

from __future__ import annotations

import codecs
import re

# (signature, python codec) — longest signatures first (UTF-32LE's BOM
# starts with UTF-16LE's two bytes)
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_META_CHARSET = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?([a-zA-Z0-9._\-]+)",
    re.IGNORECASE | re.DOTALL,
)
PRESCAN_BYTES = 1024


def detect_bom(payload: bytes) -> tuple[str | None, int]:
    """(codec, bom_length) when the payload opens with a BOM signature."""
    for sig, codec in _BOMS:
        if payload.startswith(sig):
            return codec, len(sig)
    return None, 0


# 'text/html; charset=ISO-8859-2' — the transport-layer form a WARC
# Content-Type header carries; also accepts a bare label
_HEADER_CHARSET = re.compile(r"charset\s*=\s*[\"']?([a-zA-Z0-9._\-]+)", re.IGNORECASE)


def _resolve_label(name: str, transport: bool = False) -> str | None:
    """WHATWG label normalization.  The ``utf-16*``→UTF-8 remap applies
    ONLY to in-document declarations (spec §13.2.3.3: an ASCII-readable
    meta tag proves the bytes aren't UTF-16); §13.2.3.2 honors a
    supported TRANSPORT-layer encoding as-is, so a header-declared
    BOM-less UTF-16 page decodes as UTF-16 (round-4 ADVICE — the prior
    behavior remapped both layers and mangled genuine UTF-16).  A bare
    ``utf-16`` transport label maps to UTF-16LE per the Encoding
    Standard's label table.  ``x-user-defined`` maps to windows-1252 at
    both layers — a deliberate deviation at the transport layer (the
    spec keeps the single-byte x-user-defined encoding there, which
    Python lacks; windows-1252 is byte-preserving for ASCII and the
    closest available decode-never-fails stand-in).  ``None`` for labels
    Python has no codec for (caller falls through to the next
    precedence step)."""
    name = name.strip().strip("\"'").lower()
    if not name:
        return None
    if name.startswith("utf-16") or name.startswith("utf16"):
        if not transport:
            return "utf-8"
        return "utf-16-be" if name.endswith("be") else "utf-16-le"
    if name == "x-user-defined":
        return "windows-1252"
    try:
        codecs.lookup(name)
        return name
    except LookupError:
        return None


def charset_from_declaration(declared: str | None) -> str | None:
    """Transport-layer charset (HTTP/WARC ``Content-Type``): accepts the
    full header value or a bare label; ``None`` when absent/unusable."""
    if not declared:
        return None
    m = _HEADER_CHARSET.search(declared)
    label = m.group(1) if m else (None if "/" in declared or ";" in declared else declared)
    return _resolve_label(label, transport=True) if label else None


def sniff_charset(payload: bytes, declared: str | None = None) -> str:
    """Resolved python codec name for a web payload (never raises).

    WHATWG §13.2.3 precedence: BOM → transport layer (``declared``, an
    HTTP/WARC Content-Type header value or bare label) → 1024-byte meta
    prescan → UTF-8."""
    codec, _ = detect_bom(payload)
    if codec is not None:
        return codec
    codec = charset_from_declaration(declared)
    if codec is not None:
        return codec
    m = _META_CHARSET.search(payload[:PRESCAN_BYTES])
    if m:
        codec = _resolve_label(m.group(1).decode("ascii", errors="ignore"))
        if codec is not None:
            return codec
    return "utf-8"


def decode_payload(payload: bytes, declared: str | None = None) -> str:
    """Charset-sniffed decode, BOM stripped, undecodable bytes ignored."""
    codec, bom_len = detect_bom(payload)
    if codec is not None:
        return payload[bom_len:].decode(codec, errors="ignore")
    return payload.decode(sniff_charset(payload, declared), errors="ignore")
