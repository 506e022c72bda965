"""Charset sniffing (simplified WHATWG prescan) for web payloads: BOM →
meta charset → utf-8, with UTF-16 sniffable as HTML through its BOM."""

from archvisier_spark.kernel.charset import decode_payload, detect_bom, sniff_charset
from archvisier_spark.kernel.document import STATUS_OK, extract_document_text
from archvisier_spark.kernel.sniffer import FORMAT_HTML, FORMAT_TEXT, sniff_format

POLISH = "Zażółć gęślą jaźń ąćęłńóśżź"  # iso-8859-2/cp1250-encodable
HTML_TMPL = "<html><head>{meta}</head><body><p>{body} and padding text to pass the block length gate.</p></body></html>"


def test_bom_detection():
    assert detect_bom("x".encode("utf-8-sig"))[0] == "utf-8"
    assert detect_bom("x".encode("utf-16-le").join([b"\xff\xfe", b""]))[0] in (
        "utf-16-le",
        "utf-32-le",
    )
    assert detect_bom(b"\xfe\xff\x00x")[0] == "utf-16-be"
    assert detect_bom(b"\xff\xfe\x00\x00abcd")[0] == "utf-32-le"
    assert detect_bom(b"plain")[0] is None


def test_meta_charset_prescan():
    html = HTML_TMPL.format(meta='<meta charset="iso-8859-2">', body=POLISH)
    payload = html.encode("iso-8859-2")
    assert sniff_charset(payload) == "iso-8859-2"
    assert POLISH in decode_payload(payload)


def test_meta_http_equiv_form():
    html = HTML_TMPL.format(
        meta='<meta http-equiv="Content-Type" content="text/html; charset=windows-1250">',
        body=POLISH,
    )
    payload = html.encode("windows-1250")
    assert sniff_charset(payload) == "windows-1250"
    text, status, fmt = extract_document_text(payload)
    assert (status, fmt) == (STATUS_OK, FORMAT_HTML)
    assert POLISH in text


def test_utf16_bom_html_end_to_end():
    html = HTML_TMPL.format(meta="", body=POLISH)
    payload = "﻿".encode("utf-16-le")[:0] + b"\xff\xfe" + html.encode("utf-16-le")
    assert sniff_format(payload) == FORMAT_HTML
    text, status, fmt = extract_document_text(payload)
    assert (status, fmt) == (STATUS_OK, FORMAT_HTML)
    assert POLISH in text


def test_utf8_payload_byte_identical_to_old_path():
    """The sniff must be a no-op for plain utf-8 (the corpus contract)."""
    html = HTML_TMPL.format(meta="", body=POLISH)
    payload = html.encode("utf-8")
    assert sniff_charset(payload) == "utf-8"
    assert decode_payload(payload) == payload.decode("utf-8", errors="ignore")


def test_utf8_bom_text_strips_bom():
    text, status, fmt = extract_document_text("zwykły tekst".encode("utf-8-sig"))
    assert (text, status, fmt) == ("zwykły tekst", STATUS_OK, FORMAT_TEXT)


def test_utf16_label_without_bom_is_utf8():
    # WHATWG: an ASCII-readable 'charset=utf-16' label proves the bytes
    # are NOT utf-16 → decode as utf-8
    payload = HTML_TMPL.format(meta='<meta charset="utf-16">', body="abc").encode()
    assert sniff_charset(payload) == "utf-8"


def test_unknown_and_x_user_defined_labels():
    assert sniff_charset(b'<meta charset="no-such-encoding">x') == "utf-8"
    assert sniff_charset(b'<meta charset="x-user-defined">x') == "windows-1252"


def test_invalid_bytes_are_ignored_not_fatal():
    payload = b"<p>ok block long enough to be kept as content\xff\xfe\x00</p>"
    text, status, fmt = extract_document_text(payload)
    assert status == STATUS_OK and fmt == FORMAT_HTML
    assert "ok block" in text


def test_charset_roundtrip_property():
    """Property: text from a Polish+ascii alphabet, wrapped in HTML with a
    matching meta declaration and encoded in any supported legacy/unicode
    codec, is recovered exactly by the full extraction path."""
    import random

    rng = random.Random(31337)
    alphabet = "abcdefgh ąćęłńóśżź ABCDE 0123456789"
    encodings = [
        ("utf-8", '<meta charset="utf-8">', False),
        ("iso-8859-2", '<meta charset="iso-8859-2">', False),
        ("windows-1250", '<meta http-equiv="Content-Type" content="text/html; charset=windows-1250">', False),
        ("utf-16-le", "", True),   # BOM carries the declaration
        ("utf-16-be", "", True),
    ]
    import codecs

    boms = {"utf-16-le": codecs.BOM_UTF16_LE, "utf-16-be": codecs.BOM_UTF16_BE}
    for _ in range(60):
        body = "".join(rng.choice(alphabet) for _ in range(rng.randint(40, 160))).strip()
        if not body or len(body) < 30:
            continue
        enc, meta, bom = encodings[rng.randrange(len(encodings))]
        html = f"<html><head>{meta}</head><body><p>{body}</p></body></html>"
        payload = (boms[enc] if bom else b"") + html.encode(enc)
        text, status, fmt = extract_document_text(payload)
        assert (status, fmt) == (STATUS_OK, FORMAT_HTML), (enc, body)
        assert text == body, (enc, body)
