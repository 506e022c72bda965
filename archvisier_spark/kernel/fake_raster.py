"""Deterministic fake raster-OCR engine — the SVID-fixture family.

Same role as ``ops/multimodal.py``'s SVID container: the binary step that
cannot run in this sandbox (Poppler rasterisation / Tesseract OCR,
``kernel/pdf.py:230,253``) is replaced by a deterministic synthetic
stand-in, so the ORCHESTRATION the reference specifies
(processing/ocr.py:169-237) — page iteration in page order, the two-pass
auto-language decision, dictionary repair, the ``BŁĄD TECHNICZNY OCR:``
error-row contract — is executable and value-checkable everywhere.  The
real binaries remain the cluster image's job (docker/Dockerfile.cluster,
tests/test_cluster_image.py).

Everything here is a pure function of its byte/int inputs, so the Spark
query and the driver-side oracle generator compute byte-identical
expectations, and the functions are module-level so the
:class:`~archvisier_spark.kernel.document.RasterEngine` tuple pickles by
reference into executor closures.
"""

from __future__ import annotations

import hashlib
import struct

from archvisier_spark.kernel.document import RasterEngine

SIMG_MAGIC = b"SIMG"

# A real rasteriser can fail mid-document (Poppler exiting non-zero on a
# damaged page); the fake reproduces that failure mode deterministically
# so the error-row contract is drivable: any page beyond the limit raises,
# and the raster loop surfaces it as a BŁĄD TECHNICZNY OCR data row.
FAKE_PAGE_LIMIT = 8

# Per-page OCR bodies: odd pages Polish (diacritics → detect_lang "pl" →
# re-OCR with "pol"), even pages English — both branches of the two-pass
# auto-language decision run inside one document.
_POL_BODY = "umowa najmu została zawarta pomiędzy stronami zażółć gęślą jaźń"
_ENG_BODY = "the rental agreement was signed between the listed parties"


def fake_rasterize(payload: bytes, page: int = 1, dpi: int = 200) -> bytes:
    """Synthetic page raster: ``SIMG + page:u32 + dpi:u32 + blake2s-8(payload)``.

    A pure function of (payload bytes, page number, dpi) — exactly the
    information a real rasteriser consumes — so downstream OCR output is
    pinned by the document bytes and page order."""
    if page > FAKE_PAGE_LIMIT:
        raise ValueError(
            f"fake rasteriser: page {page} exceeds the "
            f"{FAKE_PAGE_LIMIT}-page fake limit"
        )
    digest = hashlib.blake2s(payload, digest_size=8).digest()
    return SIMG_MAGIC + struct.pack("<II", page, dpi) + digest


def fake_ocr(image: bytes, lang: str = "pol", config: str = "") -> str:
    """Deterministic 'recognition' over a SIMG raster.

    The returned text encodes the raster identity (payload digest + page)
    and the LANGUAGE THE ENGINE WAS CALLED WITH, so the re-OCR of the
    auto-language decision is visible in the final extracted text — the
    same observability trick the reference's fake ``image_to_string``
    tests use (tests/test_ocr.py:96-120)."""
    if image[:4] != SIMG_MAGIC:
        raise ValueError("fake OCR: not a SIMG raster")
    page, _dpi = struct.unpack("<II", image[4:12])
    digest_hex = image[12:20].hex()
    body = _POL_BODY if page % 2 == 1 else _ENG_BODY
    return f"[{digest_hex}/p{page}/{lang}] {body}"


FAKE_RASTER_ENGINE = RasterEngine(
    rasterize_fn=fake_rasterize,
    ocr_fn=fake_ocr,
    detect_fn=None,  # the REAL diacritics heuristic (textfix.detect_lang)
)
