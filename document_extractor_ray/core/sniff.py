"""Format sniffing and container/multiframe payload codecs.

The reference routes by file extension (``process_run.py:93-109``); the
north_star requires content sniffing, since a web corpus has no
extensions.  Magic bytes:

- ``RIFF....WAVE``  -> ``noise``        (auto-delete, process_run.py:37,158-164)
- ``PK\\x03\\x04``  -> ``unsupported``  (xlsx-style quarantine, process_run.py:36,166-171)
- ``CNT1``          -> ``container``    (PDF-portfolio analogue, portfolio_unpack.py:92-177)
- ``MUF1``          -> ``multi_unit``   (multi-frame TIFF analogue, pass_img.py:106-129)
- html-ish payload  -> ``html``         (the PDF cascade analogue)
- empty html, text column set or empty -> ``txt`` (pass_txt.py route)
- anything else     -> ``unsupported``

The CNT1/MUF1 binary formats are defined by this repo (deterministic,
length-prefixed) — they exist so the synthetic corpus can exercise the
container-explode and per-frame paths without real PDF/TIFF libraries.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

KIND_HTML = "html"
KIND_TXT = "txt"
KIND_IMG = "multi_unit"
KIND_CONTAINER = "container"
KIND_NOISE = "noise"
KIND_UNSUPPORTED = "unsupported"
KIND_DOCX = "docx"
KIND_DOC = "doc"

MAGIC_CONTAINER = b"CNT1"
MAGIC_MULTIFRAME = b"MUF1"
MAGIC_DOCX = b"DOCX"  # word-processor XML analogue (pass_doc.py _docx_text)
MAGIC_DOC = b"DOC1"   # legacy binary word-processor analogue (_doc_text)

_HTML_PREFIXES = (b"<!doctype", b"<!DOCTYPE", b"<html", b"<HTML", b"<")


def sniff_kind(payload: bytes) -> str:
    """Route one payload by magic bytes (extension-router analogue R1)."""
    if payload is None or len(payload) == 0:
        return KIND_TXT  # empty html: the pre-extracted text column route
    head = payload[:16]
    if head[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return KIND_NOISE
    if head[:4] == b"PK\x03\x04":
        return KIND_UNSUPPORTED
    if head[:4] == MAGIC_CONTAINER:
        return KIND_CONTAINER
    if head[:4] == MAGIC_MULTIFRAME:
        return KIND_IMG
    if head[:4] == MAGIC_DOCX:
        return KIND_DOCX
    if head[:4] == MAGIC_DOC:
        return KIND_DOC
    stripped = payload.lstrip()
    if stripped[:9].lower().startswith(b"<!doctype") or stripped[:1] == b"<":
        return KIND_HTML
    return KIND_UNSUPPORTED


# ---------------------------------------------------------------------------
# MUF1: multi-frame payload.  b"MUF1" + u32 n + n * (u32 len + utf8 text)
# ---------------------------------------------------------------------------

def encode_multiframe(frames: List[str]) -> bytes:
    out = [MAGIC_MULTIFRAME, struct.pack("<I", len(frames))]
    for f in frames:
        b = f.encode("utf-8")
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def multiframe_frame_count(payload: bytes) -> int:
    """Two-tier frame-count probe, mirroring the reference's
    pdf_page_count (common.py:272-309): tier 1 opens the payload fully
    (the PyMuPDF-open analogue), tier 2 reads only the header count
    field (the pdfinfo metadata analogue); raises when both fail
    (raise-if-both-fail, common.py:305-308)."""
    try:
        n = len(decode_multiframe(payload))
        if n > 0:
            return n
    except Exception:
        pass
    try:
        if payload[:4] == MAGIC_MULTIFRAME:
            (n,) = struct.unpack_from("<I", payload, 4)
            if n > 0:
                return n
    except Exception:
        pass
    raise RuntimeError("could not determine frame count")


def zip_flavor(payload: bytes) -> str:
    """Classify a PK-zip payload by member paths: 'xlsx' (xl/ —
    the reference's explicit unsupported route, process_run.py:36
    UNSUPPORTED_EXTS), 'docx' (word/), else 'zip'.  Content-level
    stand-in for the reference's extension routing: a web corpus has
    no extensions, so the member-path scan is how the xlsx-vs-docx
    distinction survives.  All three flavors currently quarantine as
    unsupported (real OOXML codecs are out of scope — stub policy);
    the flavor is exposed so a real-codec integration can dispatch
    docx without re-sniffing."""
    if payload[:4] != b"PK\x03\x04":
        raise ValueError("not a PK-zip payload")
    head = payload[: 64 * 1024]  # member paths live in local headers
    if b"xl/" in head or (b"[Content_Types].xml" in head and b"spreadsheet" in head):
        return "xlsx"
    if b"word/" in head:
        return "docx"
    return "zip"


def decode_multiframe(payload: bytes) -> List[str]:
    if payload[:4] != MAGIC_MULTIFRAME:
        raise ValueError("not a MUF1 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    off = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(payload[off : off + ln].decode("utf-8", "ignore"))
        off += ln
    return frames


# ---------------------------------------------------------------------------
# CNT1: container payload (portfolio analogue).
# b"CNT1" + u32 n + n * (u32 name_len + name + u32 payload_len + payload)
# ---------------------------------------------------------------------------

def encode_container(children: List[Tuple[str, bytes]]) -> bytes:
    out = [MAGIC_CONTAINER, struct.pack("<I", len(children))]
    for name, payload in children:
        nb = name.encode("utf-8")
        out.append(struct.pack("<I", len(nb)))
        out.append(nb)
        out.append(struct.pack("<I", len(payload)))
        out.append(payload)
    return b"".join(out)


def decode_container(payload: bytes) -> List[Tuple[str, bytes]]:
    if payload[:4] != MAGIC_CONTAINER:
        raise ValueError("not a CNT1 payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    off = 8
    children = []
    for _ in range(n):
        (nl,) = struct.unpack_from("<I", payload, off)
        off += 4
        name = payload[off : off + nl].decode("utf-8", "ignore")
        off += nl
        (pl,) = struct.unpack_from("<I", payload, off)
        off += 4
        children.append((name, bytes(payload[off : off + pl])))
        off += pl
    return children


def child_url(parent_url: str, child_name: str) -> str:
    """Portfolio child naming: Parent.pdf::Child.ext
    (portfolio_unpack.py:156-164)."""
    return f"{parent_url}::{child_name}"


# Size buckets for skew handling (north_rule: size-bucketed
# repartitioning; thresholds from SURVEY.md §4.2).
SIZE_BUCKET_EDGES = (64 * 1024, 1024 * 1024, 8 * 1024 * 1024)


def size_bucket(n_bytes: int) -> int:
    for i, edge in enumerate(SIZE_BUCKET_EDGES):
        if n_bytes < edge:
            return i
    return len(SIZE_BUCKET_EDGES)
