"""HTML main-content extraction — the web analogue of the reference's
extraction passes.

Mapping to the reference cascade (SURVEY.md §2.3, BASELINE.json
north_star "HTML boilerplate stripping via DOM-tree text-density
heuristics"):

- ``extract_visible``   : pass 1, the native-text-layer analogue of
  ``common.extract_text_layer`` (common.py:332-350).  Link-density
  boilerplate removal: visible text lines whose anchored-character
  ratio exceeds the threshold (nav bars, footers, ad link lists) are
  dropped (boilerpipe/CETD-family heuristic, simplified and
  deterministic).
- ``extract_aggressive``: fallback A, the OCR-A analogue
  (pass_pdf_ocr_a.py:117-122).  Recovers text invisible to pass 1
  (alt/title attribute text — the "pixels" of the web analogue) and
  filters noise lines below an alnum-ratio floor.
- ``extract_best``      : fallback B, the rotation-sweep analogue
  (pass_pdf_ocr_b.py:32-44).  Runs three candidate strip strategies and
  keeps the argmax-reliability text (strictly greater wins, first
  strategy on ties — mirroring ``if rel > best_rel``).

All functions are pure and deterministic; module-level compiled
regexes are the only state (hoisted into actor ``__init__`` by
importing this module there — the ST1/ST5 amortization).
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import List, Tuple

from document_extractor_ray.core.scoring import score_reliability

# Page delimiter inside a single html payload: the multi-page documents
# of the web corpus (the reference's PDF page analogue, G2/G3
# pass_pdf.py:95-110).
PAGE_DELIM = "<!--PAGE-->"

_TOKEN_RE = re.compile(r"(<[^>]*>)", re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_WS_RE = re.compile(r"\s+")
_TAG_NAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_ATTR_TEXT_RE = re.compile(r'(?:alt|title)\s*=\s*"([^"]*)"', re.I)
# One-pass removal of invisible-content elements: their bodies never
# reach the per-token Python loop (the scanner's skip_until state is
# kept as a correctness backstop, but after this sub nothing matches).
# The second alternative mirrors the scanner's unclosed-tag behavior:
# an unterminated <script> swallows the rest of the page.
_SKIP_BLOCK_RE = re.compile(
    r"<(script|style|title|noscript)\b[^>]*>.*?</\s*\1\s*>"
    r"|<(?:script|style|title|noscript)\b[^>]*>.*$",
    re.I | re.S,
)

# Tags that terminate a visual line (block-level elements).
_BLOCK_TAGS = frozenset(
    """p div li ul ol br h1 h2 h3 h4 h5 h6 tr td th table section article
    header footer nav blockquote pre hr form fieldset main aside figure
    figcaption dl dt dd body html head title option select textarea""".split()
)
# Elements whose text content is never visible.
_SKIP_TAGS = frozenset({"script", "style", "title", "noscript"})


def split_pages(html_text: str) -> List[str]:
    """Split one html payload into its unit pages on PAGE_DELIM.

    A payload without delimiters is a single-page document (the common
    case for real web pages)."""
    if PAGE_DELIM in html_text:
        return html_text.split(PAGE_DELIM)
    return [html_text]


def decode_payload(payload: bytes) -> str:
    """UTF-8 with errors ignored — mirrors pass_txt.py:30 read semantics."""
    if payload is None:
        return ""
    return payload.decode("utf-8", "ignore")


Line = Tuple[str, int]  # (collapsed text, anchored char count)

# Per-process cache of short literal tag strings -> (name, closing).
# Bounded (4096 entries, parts <= 16 chars) so attr-laden unique tags
# never grow it; populated lazily from the same _TAG_NAME_RE.
_TAG_CACHE: dict = {}


def extract_lines(page_html: str, include_attrs: bool = False) -> List[Line]:
    """Tokenize one page of html into visual lines.

    Returns [(line_text, anchored_chars), ...] where anchored_chars is
    the number of characters of the line that sit inside <a> elements
    (the link-density signal).  When include_attrs is set, alt/title
    attribute values are emitted as their own (un-anchored) lines —
    text pass 1 cannot see, the web stand-in for OCR-able pixels.
    """
    # Strip comments first; a comment containing '>' would otherwise
    # break the naive tag tokenizer.  Then drop invisible-content
    # blocks in one compiled pass (script/style/title/noscript) so the
    # per-token loop only ever sees renderable markup.
    page_html = _COMMENT_RE.sub("", page_html)
    page_html = _SKIP_BLOCK_RE.sub("", page_html)
    parts = _TOKEN_RE.split(page_html)

    lines: List[Line] = []
    buf: List[str] = []               # text pieces
    buf_total = 0                     # total piece chars (pre-collapse)
    buf_anchored = 0                  # piece chars inside <a>
    skip_until: str = ""              # inside <script>/<style>/... until this close
    anchor_depth = 0
    unescape = _htmllib.unescape
    tag_cache = _TAG_CACHE

    def flush() -> None:
        nonlocal buf_total, buf_anchored
        if not buf:
            return
        # Whitespace collapse via str.split (3.7x faster than the \s+
        # regex, measured).  Collapse semantics are defined by
        # str.isspace() — shared by pipeline AND oracle, so identity
        # holds by construction.
        text = " ".join("".join(buf).split())
        if text:
            # Scale anchored chars to the collapsed length so the ratio
            # survives whitespace collapsing.
            anchored = buf_anchored
            if buf_total > 0:
                anchored = int(round(len(text) * (anchored / buf_total)))
            lines.append((text, anchored))
        buf.clear()
        buf_total = 0
        buf_anchored = 0

    for part in parts:
        if not part:
            continue
        if part[0] == "<":
            # Tag name + closing flag, cached for short (attr-free)
            # tags — HTML is dominated by a small set of literal tag
            # strings, so the dict hit replaces the regex in the
            # common case; the regex stays the semantic source for
            # anything uncached.
            cached = tag_cache.get(part)
            if cached is None:
                m = _TAG_NAME_RE.match(part)
                name = m.group(1).lower() if m else ""
                closing = part.startswith("</")
                if len(part) <= 16 and len(tag_cache) < 4096:
                    tag_cache[part] = (name, closing)
            else:
                name, closing = cached
            if skip_until:
                if closing and name == skip_until:
                    skip_until = ""
                continue
            if not closing and name in _SKIP_TAGS:
                # void-style usage like <br/> never applies to skip tags
                skip_until = name
                continue
            if name == "a":
                if closing:
                    anchor_depth = max(0, anchor_depth - 1)
                else:
                    anchor_depth += 1
            if include_attrs and not closing:
                for attr_text in _ATTR_TEXT_RE.findall(part):
                    if buf:
                        flush()
                    t = " ".join(unescape(attr_text).split())
                    if t:
                        lines.append((t, 0))
            if buf and name in _BLOCK_TAGS:
                flush()
            continue
        if skip_until:
            continue
        text = unescape(part)
        if text:
            buf.append(text)
            buf_total += len(text)
            if anchor_depth > 0:
                buf_anchored += len(text)
    if buf:
        flush()
    return lines


def extract_visible(page_html: str, anchor_density_max: float = 0.5) -> str:
    """Pass-1 extraction: visible text minus link-dense boilerplate.

    Keeps lines whose anchored-char ratio <= anchor_density_max; joins
    with newlines (the reference joins page text with "\\n",
    pass_pdf_txt.py:64)."""
    kept = []
    for text, anchored in extract_lines(page_html, include_attrs=False):
        if len(text) == 0:
            continue
        if anchored / len(text) <= anchor_density_max:
            kept.append(text)
    return "\n".join(kept)


def extract_aggressive(page_html: str, keep_ratio: float = 0.5) -> str:
    """Fallback-A extraction (OCR-A analogue, pass_pdf_ocr_a.py:117-122).

    Full tag strip including alt/title attribute text; drops lines whose
    alnum ratio falls below keep_ratio (the degraded-text recovery that
    lifts reliability of noisy documents past the OCR-A cutoff)."""
    kept = []
    for text, _ in extract_lines(page_html, include_attrs=True):
        if score_reliability(text) >= keep_ratio:
            kept.append(text)
    return "\n".join(kept)


def extract_best(
    page_html: str, keep_ratio_a: float = 0.5, keep_ratio_b: float = 0.7
) -> Tuple[str, float]:
    """Fallback-B extraction: argmax over three strip strategies.

    The rotation-sweep analogue (pass_pdf_ocr_b.py:32-44 tries rotations
    0/90/270 and keeps the best-reliability OCR).  Strategies, in order:

      0. raw      — every line including attribute text
      1. filter50 — lines with alnum ratio >= keep_ratio_a
      2. filter70 — lines with alnum ratio >= keep_ratio_b

    Strictly-greater comparison, so ties keep the earliest strategy —
    mirroring ``if rel > best_rel`` in _best_ocr_text."""
    all_lines = extract_lines(page_html, include_attrs=True)
    texts = [t for t, _ in all_lines]
    candidates = [
        "\n".join(texts),
        "\n".join(t for t in texts if score_reliability(t) >= keep_ratio_a),
        "\n".join(t for t in texts if score_reliability(t) >= keep_ratio_b),
    ]
    best_text, best_rel = "", 0.0
    for cand in candidates:
        rel = score_reliability(cand)
        if rel > best_rel:
            best_rel = rel
            best_text = cand
    return best_text or "", best_rel
