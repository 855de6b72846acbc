"""DOC/DOCX route — mirror of pass_doc.py.

Payload analogues (this container has no python-docx/antiword, so the
formats are deterministic stand-ins with the same extraction contract):

- ``DOCX`` + word-processor-XML-ish utf-8: ``<w:p>…</w:p>`` paragraphs
  and ``<w:tbl>…<w:tc>…</w:tc>…</w:tbl>`` table cells.  ``docx_text``
  mirrors ``_docx_text`` (pass_doc.py:50-78): paragraphs first, then
  table cells, "\\n"-joined, best-effort on tables.
- ``DOC1`` + legacy binary bytes: printable text interleaved with
  control bytes.  ``doc_text`` mirrors the antiword/catdoc contract
  (pass_doc.py:85-102): recover the printable text stream.

Control flow mirrors ``pass_doc.main`` (pass_doc.py:189-275):
native extract -> gate (non-blank AND rel >= cutoff; DOCX 0.70 / DOC
0.75) -> accept as single-page doc; else the DOC->PDF->TXT fallback
(``_fallback_via_pdf``, pass_doc.py:105-186): convert to an html
rendering, rerun the TXT pass per-doc with cutoff=0.0 (the triage can
still reject scan-only-looking conversions), rescore with
score_reliability, accept as ``doc_pdf_text``; else ERROR row + rc=1
(quarantine).  Extraction errors write a ``doc_extract_error`` ERROR
row (pass_doc.py:217-230).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import List

from document_extractor_ray.config import (
    STATUS_ERROR,
    STATUS_OK,
    PipelineConfig,
)
from document_extractor_ray.core import cascade
from document_extractor_ray.core.scoring import score_reliability

PASS_DOCX_TEXT = "docx_text"
PASS_DOC_TEXT = "doc_text"
PASS_DOC_PDF_TEXT = "doc_pdf_text"
PASS_DOC_EXTRACT_ERROR = "doc_extract_error"

_P_RE = re.compile(r"<w:p>(.*?)</w:p>", re.S)
_TC_RE = re.compile(r"<w:tc>(.*?)</w:tc>", re.S)


def docx_text(payload: bytes) -> str:
    """_docx_text mirror: paragraphs then table cells, newline-joined."""
    if payload[:4] != b"DOCX":
        raise ValueError("not a DOCX payload")
    body = payload[4:].decode("utf-8", "ignore")
    parts: List[str] = []
    for m in _P_RE.findall(body):
        text = _htmllib.unescape(m)
        if text:
            parts.append(text)
    try:
        for m in _TC_RE.findall(body):
            text = _htmllib.unescape(m)
            if text:
                parts.append(text)
    except Exception:
        pass  # table iteration is best-effort (pass_doc.py:73-76)
    return "\n".join(parts)


def doc_text(payload: bytes) -> str:
    """antiword/catdoc contract mirror: printable stream recovery."""
    if payload[:4] != b"DOC1":
        raise ValueError("not a DOC1 payload")
    body = payload[4:]
    out = []
    for b in body:
        if b >= 0x20 or b in (0x0A, 0x09):
            out.append(b)
    text = bytes(out).decode("utf-8", "ignore")
    if not text:
        raise RuntimeError("Neither antiword nor catdoc produced text")
    return text


def convert_to_html(text: str) -> str:
    """doc_to_pdf.convert_to_pdf analogue: render the native text into
    the downstream format (html page instead of pdf), one <p> per
    line — the "conversion" whose output the TXT pass re-extracts."""
    paras = "".join(
        f"<p>{_htmllib.escape(line)}</p>" for line in text.split("\n") if line
    )
    return f"<html><body>{paras}</body></html>"


def process_doc(kind: str, payload: bytes, cfg: PipelineConfig) -> cascade.DocResult:
    """pass_doc.main mirror for one document."""
    try:
        if kind == "docx":
            method = PASS_DOCX_TEXT
            text = docx_text(payload)
            cutoff = cfg.docx_cutoff
        else:
            method = PASS_DOC_TEXT
            text = doc_text(payload)
            cutoff = cfg.doc_cutoff
    except Exception:
        # pass_doc.py:217-230: ERROR row, exit 1 -> quarantine
        return cascade.DocResult(
            status=STATUS_ERROR,
            pass_used=PASS_DOC_EXTRACT_ERROR,
            used_ocr=False,
            score=0.0,
            mode="per-doc",
            quarantine=True,
            reason=cascade.QUARANTINE_RC1,
        )

    text = text or ""
    rel = score_reliability(text)

    if text.strip() and rel >= cutoff:
        return cascade.DocResult(
            status=STATUS_OK,
            pass_used=method,
            used_ocr=False,
            score=rel,
            mode="per-doc",
            pages=[(1, text)],
            page_rels=[rel],
        )

    # DOC->PDF->TXT fallback (pass_doc.py:105-186)
    fallback_text = ""
    try:
        html_render = convert_to_html(text)
        ok, payload2 = cascade.run_txt_pass([html_render], "per-doc", 0.0, cfg)
        if ok and payload2:
            fallback_text = payload2.get("text") or ""
    except Exception:
        fallback_text = ""

    if fallback_text.strip():
        rel2 = score_reliability(fallback_text)
        return cascade.DocResult(
            status=STATUS_OK,
            pass_used=PASS_DOC_PDF_TEXT,
            used_ocr=False,
            score=rel2,
            mode="per-doc",
            pages=[(1, fallback_text)],
            page_rels=[rel2],
        )

    # Fallback failed: ERROR row with the native method + rc=1
    return cascade.DocResult(
        status=STATUS_ERROR,
        pass_used=method,
        used_ocr=False,
        score=rel,
        mode="per-doc",
        quarantine=True,
        reason=cascade.QUARANTINE_RC1,
    )
