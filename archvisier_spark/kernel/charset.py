"""Charset detection for web payloads (north-rule HTML tier).

Real Common-Crawl HTML is not all UTF-8: legacy Polish pages ship
ISO-8859-2 / windows-1250, and UTF-16 appears with BOMs.  This implements
a simplified WHATWG encoding sniff (html.spec.whatwg.org §13.2.3.2
"determining the character encoding" — a public spec; the reference has
no HTML tier, SURVEY.md §7):

1. **BOM** wins: UTF-8 / UTF-16LE/BE / UTF-32LE/BE signatures.
2. Else a **meta prescan** of the first 1024 bytes for
   ``<meta … charset=…>`` (covers both the HTML5 form and the
   ``http-equiv`` content-type form, since ``charset=`` appears inside
   the content attribute either way).
3. Else UTF-8.

Per the WHATWG rules, a ``charset=utf-16*`` *declaration* (without BOM)
is treated as UTF-8 — an ASCII-readable meta tag proves the bytes are
not actually UTF-16 — and ``x-user-defined`` maps to windows-1252.
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


def sniff_charset(payload: bytes) -> str:
    """Resolved python codec name for a web payload (never raises)."""
    codec, _ = detect_bom(payload)
    if codec is not None:
        return codec
    m = _META_CHARSET.search(payload[:PRESCAN_BYTES])
    if m:
        name = m.group(1).decode("ascii", errors="ignore").strip().lower()
        if name.startswith("utf-16") or name.startswith("utf16"):
            return "utf-8"  # WHATWG: utf-16 *label* without BOM → utf-8
        if name == "x-user-defined":
            return "windows-1252"
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    return "utf-8"


def decode_payload(payload: bytes) -> str:
    """Charset-sniffed decode, BOM stripped, undecodable bytes ignored."""
    codec, bom_len = detect_bom(payload)
    if codec is not None:
        return payload[bom_len:].decode(codec, errors="ignore")
    return payload.decode(sniff_charset(payload), errors="ignore")
