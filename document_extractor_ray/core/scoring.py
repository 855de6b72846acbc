"""Reliability scoring and triage — byte-faithful to the reference.

- ``score_reliability``: alnum/length ratio in [0,1] rounded to 4
  decimals, Python ``str.isalnum`` per char (``common.py:194-203``).
  Vectorized here via a lazily-grown codepoint lookup table so the same
  semantics run at Arrow-batch speed (the reference's per-char Python
  loop would be the hot-path bottleneck at 100 TB).
- ``median``: drop None, ``statistics.median`` (``common.py:205-214``).
- ``likely_scan_only``: scan-only triage (``common.py:216-244``).
- ``sample_page_indices``: even-spaced deterministic page sampling
  including the padding quirk (``common.py:352-371``).
- ``page_reliability``: the legacy shell weighted score
  (``common_pdf.sh:98-156``) kept for parity/documentation.
"""

from __future__ import annotations

import statistics
from typing import Iterable, List, Sequence, Union

import numpy as np

# ---------------------------------------------------------------------------
# Vectorized str.isalnum: lookup table over unicode codepoints, built
# lazily per process (per Ray worker) and grown in powers of two.  The
# table is filled with Python's own str.isalnum so results are identical
# to the reference's per-char loop by construction.
# ---------------------------------------------------------------------------

_ALNUM_TABLE = np.zeros(0, dtype=bool)


def _alnum_table(upto: int) -> np.ndarray:
    """Return the global codepoint->isalnum table covering [0, upto]."""
    global _ALNUM_TABLE
    if upto < _ALNUM_TABLE.size:
        return _ALNUM_TABLE
    new_size = 256
    while new_size <= upto:
        new_size *= 2
    new_size = min(new_size, 0x110000)
    old = _ALNUM_TABLE
    tbl = np.empty(new_size, dtype=bool)
    tbl[: old.size] = old
    # chr(cp).isalnum() for the newly covered range; surrogates
    # (U+D800-DFFF) cannot appear in valid str and are not alnum.
    for cp in range(old.size, new_size):
        if 0xD800 <= cp <= 0xDFFF:
            tbl[cp] = False
        else:
            tbl[cp] = chr(cp).isalnum()
    _ALNUM_TABLE = tbl
    return tbl


def alnum_count(text: str) -> int:
    """Number of codepoints ch with ch.isalnum() — vectorized for long
    strings; short strings (the per-line scoring case) take a direct
    ``map(str.isalnum)`` path, which beats the numpy setup cost below
    ~130 chars (measured 7x on 24-char lines).  Both paths are
    str.isalnum by construction."""
    if not text:
        return 0
    if len(text) <= 128:
        return sum(map(str.isalnum, text))
    # utf-32-le yields exactly len(text) uint32 codepoints.
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    tbl = _alnum_table(int(arr.max()))
    return int(tbl[arr].sum())


def score_reliability(text: str) -> float:
    """PROVENANCE: semantics intentionally mirror
    /root/reference/scripts/common.py:194-203 (score_reliability) —
    the byte-identity requirement (BASELINE.json north_star) pins the
    alnum/length ratio, clamping and 4-dp rounding exactly; the alnum
    count itself is re-implemented vectorized (see _alnum_table)."""
    if not text:
        return 0.0
    total = len(text)
    if total <= 0:
        return 0.0
    s = max(0.0, min(1.0, alnum_count(text) / float(total)))
    return round(s, 4)


def median(values: Iterable[float]) -> float:
    """PROVENANCE: intentional mirror of
    /root/reference/scripts/common.py:205-214 (median) — the None-drop,
    statistics.median call and index-based fallback define the gate
    semantics the byte-identity contract pins; kept verbatim-equivalent
    on purpose."""
    vals = [float(v) for v in values if v is not None]
    if not vals:
        return 0.0
    try:
        return float(statistics.median(vals))
    except Exception:
        vals.sort()
        mid = len(vals) // 2
        return vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2.0


def likely_scan_only(
    text_or_samples: Union[str, Sequence], min_chars: int = 40, rel_cap: float = 0.15
) -> bool:
    """PROVENANCE: intentional mirror of
    /root/reference/scripts/common.py:216-244 (likely_scan_only) —
    all three accepted input forms (str, int list, str list) and the
    min_chars/rel_cap gates are pinned by the byte-identity contract;
    kept verbatim-equivalent on purpose."""
    if isinstance(text_or_samples, (list, tuple)):
        if not text_or_samples:
            return True
        first = text_or_samples[0]
        if isinstance(first, int):
            total = sum(int(x) for x in text_or_samples)
            return total < min_chars
        if isinstance(first, str):
            text = " ".join(text_or_samples)
        else:
            text = str(text_or_samples)
    else:
        text = text_or_samples or ""

    text = str(text)
    if len(text.strip()) < min_chars:
        return True
    return score_reliability(text) < rel_cap


def sample_page_indices(total_pages: int, target: int = 5) -> List[int]:
    """PROVENANCE: intentional mirror of
    /root/reference/scripts/common.py:352-371 (sample_page_indices),
    including the deterministic padding loop when even spacing
    collapses duplicate picks (the E4 quirk the goldens pin); kept
    verbatim-equivalent on purpose."""
    n = int(max(0, total_pages))
    t = int(max(1, target))
    if n <= t:
        return list(range(1, n + 1))
    step = n / float(t + 1)
    picks = sorted({max(1, min(n, int(round(step * i)))) for i in range(1, t + 1)})
    while len(picks) < t:
        for j in range(1, n + 1):
            if j not in picks:
                picks.append(j)
                if len(picks) == t:
                    break
    return sorted(picks)


def legacy_clean_text(text: str) -> str:
    """Legacy CSV text cleaner (common_pdf.sh:37 clean_text, E21/F12):
    strip carriage returns, literalize newlines as two-char ``\\n``,
    double embedded quotes for CSV embedding."""
    return text.replace("\r", "").replace("\n", "\\n").replace('"', '""')


# ---------------------------------------------------------------------------
# Legacy weighted reliability (common_pdf.sh:98-156).  The Python
# reference simplified this to the alnum ratio; the richer model is kept
# here (documented semantics, used by the quality-scoring operator).
# ---------------------------------------------------------------------------

# Embedded 100-word stopword list (common_pdf.sh:87-95).
STOPWORDS = frozenset(
    """the of and to in a is that for it as was with be by on not he i this
    are or his from at which but have an had they you were their one all we
    can her has there been if more when will would who so no out up into do
    time two like only just him know take people year your good some could
    them see other than then now look come its over think also back after
    use how our work first well way even new want because any these give
    day most us""".split()
)


# Vectorized str.isspace, same lazily-grown-table trick as _alnum_table
# (semantics identical to the per-char loop by construction).
_SPACE_TABLE = np.zeros(0, dtype=bool)


def _space_table(upto: int) -> np.ndarray:
    global _SPACE_TABLE
    if upto < _SPACE_TABLE.size:
        return _SPACE_TABLE
    new_size = 256
    while new_size <= upto:
        new_size *= 2
    new_size = min(new_size, 0x110000)
    old = _SPACE_TABLE
    tbl = np.empty(new_size, dtype=bool)
    tbl[: old.size] = old
    for cp in range(old.size, new_size):
        if 0xD800 <= cp <= 0xDFFF:
            tbl[cp] = False
        else:
            tbl[cp] = chr(cp).isspace()
    _SPACE_TABLE = tbl
    return tbl


def non_ws_count(text: str) -> int:
    """Number of codepoints ch with NOT ch.isspace() — vectorized."""
    if not text:
        return 0
    arr = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    tbl = _space_table(int(arr.max()))
    return int(len(arr) - tbl[arr].sum())


def page_reliability(text: str, method: str = "txt") -> float:
    """Legacy weighted score (common_pdf.sh:98-156).

    txt: 0.5*D + 0.3*W + 0.2*R
    ocr: 0.4*D + 0.2*W + 0.2*R + 0.2*C  (C = D for ocr, 1.0 for txt)

    D = non-whitespace chars / 400, capped at 1
    W = fraction of words that are stopwords
    R = 1 - (max char frequency / total chars)

    D and R are numpy-vectorized over the codepoint array (identical
    values to the per-char loops: same counts, same float ops in the
    same order); W keeps exact Python str.split + set membership, the
    semantics the DuckDB oracle mirrors."""
    if not text:
        return 0.0
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    tbl = _space_table(int(cp.max()))
    non_ws_cp = cp[~tbl[cp]]
    n_non_ws = int(non_ws_cp.size)
    if n_non_ws == 0:
        return 0.0
    d = min(1.0, n_non_ws / 400.0)
    words = [w.lower() for w in text.split()]
    w = (sum(1 for x in words if x in STOPWORDS) / len(words)) if words else 0.0
    max_freq = int(np.bincount(non_ws_cp - non_ws_cp.min()).max())
    r = 1.0 - (max_freq / float(n_non_ws))
    if method == "ocr":
        c = d
        score = 0.4 * d + 0.2 * w + 0.2 * r + 0.2 * c
    else:
        score = 0.5 * d + 0.3 * w + 0.2 * r
    return round(max(0.0, min(1.0, score)), 4)
