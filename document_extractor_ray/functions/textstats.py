"""Text-analysis operators over the ``documents`` table: token
counting, quality scoring, language ID, document fingerprinting.

Quality/token metrics are defined in ASCII-regex terms so a DuckDB
oracle can express them exactly; ratios are integer permille
(floor-divided) so float association order can never break the
driver's value-hash comparison.
"""

from __future__ import annotations

import math
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from document_extractor_ray.core.scoring import STOPWORDS

_TOKEN_RE = r"\S+"
_ALNUM_ASCII_RE = r"[^A-Za-z0-9]"
_PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"


def _read_docs(sf_dir: str, columns):
    from document_extractor_ray.functions.analytics import _n_blocks

    from document_extractor_ray.sources import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=columns, override_num_blocks=_n_blocks()
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace tokens + a BPE-ish subword estimate)
# ---------------------------------------------------------------------------

def token_counts(sf_dir: str):
    """Per-doc whitespace token count and character count — all
    pyarrow.compute kernels, zero Python per row."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(t["text"], _TOKEN_RE)
        chars = pc.utf8_length(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(toks, pa.int64()),
                "n_chars_computed": pc.cast(chars, pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow").sort("doc_id")


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_computed
FROM documents
ORDER BY doc_id
"""


# PII scrubbing: deterministic masking of emails / phone numbers /
# IPv4 addresses — the redaction step a training-data pipeline runs
# before packing.  RE2-safe patterns (no backrefs/lookahead) so the
# DuckDB oracle applies the IDENTICAL regexes.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(sf_dir: str):
    """Scrub emails/phones/IPv4s to fixed placeholder tokens and count
    the redactions per document.  Pure pyarrow.compute regex kernels
    (compiled once per worker by Arrow), zero Python per row; applied
    in a fixed order (email, phone, ip) so the oracle chain matches."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_email = pc.cast(pc.count_substring_regex(text, PII_EMAIL_RE), pa.int64())
        out = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
        n_phone = pc.cast(pc.count_substring_regex(out, PII_PHONE_RE), pa.int64())
        out = pc.replace_substring_regex(out, PII_PHONE_RE, "<PHONE>")
        n_ip = pc.cast(pc.count_substring_regex(out, PII_IPV4_RE), pa.int64())
        out = pc.replace_substring_regex(out, PII_IPV4_RE, "<IP>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_scrubbed": out,
                "n_email": n_email,
                "n_phone": n_phone,
                "n_ip": n_ip,
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow").sort("doc_id")


PII_SCRUB_SQL = f"""
WITH s1 AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS BIGINT) AS n_email,
         regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM documents
), s2 AS (
  SELECT doc_id, n_email,
         CAST(length(regexp_extract_all(t1, '{PII_PHONE_RE}')) AS BIGINT) AS n_phone,
         regexp_replace(t1, '{PII_PHONE_RE}', '<PHONE>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '{PII_IPV4_RE}', '<IP>', 'g') AS text_scrubbed,
       n_email, n_phone,
       CAST(length(regexp_extract_all(t2, '{PII_IPV4_RE}')) AS BIGINT) AS n_ip
FROM s2
ORDER BY doc_id
"""


# C4-style quality gate thresholds (integer-exact so the SQL oracle
# matches bit-for-bit).
MIN_TOKENS = 20
MIN_ALNUM_PERMILLE = 500
MAX_PUNCT_PERMILLE = 150


def quality_filter(sf_dir: str):
    """C4-style corpus cleaning: keep documents passing ALL quality
    gates (enough tokens, alnum-dominant, not punctuation-noise) —
    the filter step an LLM data pipeline runs between extraction and
    dedup.  One vectorized map_batches, no shuffle; every signal is
    the same integer-exact kernel the scoring queries use."""
    ds = _read_docs(sf_dir, ["doc_id", "lang", "text"])

    def keep(t: pa.Table) -> pa.Table:
        text = t["text"]
        n = pc.cast(pc.utf8_length(text), pa.int64())
        n_safe = pc.max_element_wise(n, 1)
        toks = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64())
        alnum = pc.cast(pc.count_substring_regex(text, r"[A-Za-z0-9]"), pa.int64())
        punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
        alnum_pm = pc.divide(pc.multiply(alnum, 1000), n_safe)
        punct_pm = pc.divide(pc.multiply(punct, 1000), n_safe)
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(toks, MIN_TOKENS),
                pc.greater_equal(alnum_pm, MIN_ALNUM_PERMILLE),
            ),
            pc.less_equal(punct_pm, MAX_PUNCT_PERMILLE),
        )
        out = t.filter(mask)
        return pa.table({"doc_id": out["doc_id"], "lang": out["lang"]})

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


QUALITY_FILTER_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS toks,
         (CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) * 1000)
             // greatest(CAST(length(text) AS BIGINT), 1) AS alnum_pm,
         (CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS BIGINT) * 1000)
             // greatest(CAST(length(text) AS BIGINT), 1) AS punct_pm
  FROM documents
)
WHERE toks >= {MIN_TOKENS} AND alnum_pm >= {MIN_ALNUM_PERMILLE} AND punct_pm <= {MAX_PUNCT_PERMILLE}
ORDER BY doc_id
"""


def bpe_ish_token_count(text_col: pa.ChunkedArray) -> pa.Array:
    """BPE-ish subword estimate: words contribute ceil(len/4) tokens
    (roughly byte-pair merge density for English); punctuation one
    each.  Vectorized: total alnum chars / 4 + punct count."""
    alnum = pc.count_substring_regex(text_col, r"[A-Za-z0-9]")
    punct = pc.count_substring_regex(text_col, _PUNCT_RE)
    words = pc.count_substring_regex(text_col, r"[A-Za-z0-9]+")
    # ceil(alnum/4) spread over words: approximate with alnum//4 + words
    sub = pc.add(pc.divide(alnum, 4), words)
    return pc.cast(pc.add(sub, punct), pa.int64())


# ---------------------------------------------------------------------------
# Quality scoring (length / punct / alnum / stopword signals)
# ---------------------------------------------------------------------------

def quality_scores(sf_dir: str):
    """Per-doc quality signals in integer permille (ASCII-exact so the
    DuckDB oracle matches bit-for-bit)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        text = t["text"]
        n = pc.cast(pc.utf8_length(text), pa.int64())
        n_safe = pc.max_element_wise(n, 1)
        alnum = pc.cast(pc.count_substring_regex(text, r"[A-Za-z0-9]"), pa.int64())
        punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
        alnum_pm = pc.divide(pc.multiply(alnum, 1000), n_safe)  # floor div (int64)
        punct_pm = pc.divide(pc.multiply(punct, 1000), n_safe)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "alnum_permille": alnum_pm,
                "punct_permille": punct_pm,
                "n_chars_computed": n,
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


QUALITY_SCORES_SQL = """
SELECT doc_id,
       (CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS BIGINT) * 1000)
           // greatest(CAST(length(text) AS BIGINT), 1) AS alnum_permille,
       (CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS BIGINT) * 1000)
           // greatest(CAST(length(text) AS BIGINT), 1) AS punct_permille,
       CAST(length(text) AS BIGINT) AS n_chars_computed
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) — stateful actor stage
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "it", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "pour", "que", "dans", "pas"},
    "es": {"el", "la", "los", "que", "es", "una", "por", "para", "con", "del"},
}


class LangId:
    """Heuristic language classifier: stopword hit rate per language +
    a CJK codepoint check.  A callable class so marker sets / regexes
    compile once per actor (the stateful-stage pattern, ST5)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def classify(self, text: str) -> str:
        if not text:
            return "und"
        if self.cjk_re.search(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        best_lang, best_hits = "und", 0
        for lang, markers in sorted(self.markers.items()):
            hits = sum(1 for w in words if w in markers)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang if best_hits > 0 else "en"

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = [self.classify(x) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "pred_lang": pa.array(preds, pa.string())}
        )


_WORKER_CACHE: dict = {}  # per-worker-process stage instances


def _langid_batch(t: pa.Table) -> pa.Table:
    # task pool + module-cached instance: the regex compile happens
    # once per worker PROCESS, with no actor-pool spin-up (PERF 19/25)
    if "langid" not in _WORKER_CACHE:
        _WORKER_CACHE["langid"] = LangId()
    return _WORKER_CACHE["langid"](t)


def lang_id(sf_dir: str):
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(
        _langid_batch, batch_format="pyarrow", batch_size=1024
    ).sort("doc_id")


def _marker_list_sql(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang])) + "]"


# SQL mirror of LangId.classify: words = lowered [a-zA-Z]+ runs, per-
# language stopword hits, winner = first language in sorted order
# (de,en,es,fr) reaching the max strictly-positive hit count ('en'
# when no marker hits, 'und' for empty text/no words, 'zh' on any CJK
# codepoint) — the CASE ladder encodes the same strict-greater
# iteration order as the Python loop.
LANG_ID_SQL = f"""
WITH w AS (
  SELECT doc_id, text,
         list_transform(regexp_extract_all(text, '[a-zA-Z]+'), x -> lower(x)) AS words,
         regexp_matches(text, '[一-鿿぀-ヿ]') AS cjk
  FROM documents
), h AS (
  SELECT doc_id, text, words, cjk,
         len(list_filter(words, x -> list_contains({_marker_list_sql("de")}, x))) AS h_de,
         len(list_filter(words, x -> list_contains({_marker_list_sql("en")}, x))) AS h_en,
         len(list_filter(words, x -> list_contains({_marker_list_sql("es")}, x))) AS h_es,
         len(list_filter(words, x -> list_contains({_marker_list_sql("fr")}, x))) AS h_fr
  FROM w
)
SELECT doc_id,
  CASE
    WHEN text IS NULL OR text = '' THEN 'und'
    WHEN cjk THEN 'zh'
    WHEN len(words) = 0 THEN 'und'
    WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'en'
    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
    ELSE 'fr'
  END AS pred_lang
FROM h ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Document fingerprinting (rolling hash)
# ---------------------------------------------------------------------------

def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Deterministic 63-bit document fingerprint: min of Rabin-Karp
    rolling hashes over word windows (a winnowing-style selection —
    robust to local edits outside the minimal window)."""
    words = text.split()
    if not words:
        return 0
    hashes = [zlib.crc32(w.encode("utf-8")) for w in words]
    if len(hashes) <= window:
        acc = 0
        for h in hashes:
            acc = (acc * 1000003 + h) & ((1 << 63) - 1)
        return acc
    best = (1 << 63) - 1
    acc = 0
    mask = (1 << 63) - 1
    pow_w = pow(1000003, window - 1, 1 << 63)
    for i, h in enumerate(hashes):
        if i < window:
            acc = (acc * 1000003 + h) & mask
            if i == window - 1 and acc < best:
                best = acc
        else:
            acc = ((acc - hashes[i - window] * pow_w) * 1000003 + h) & mask
            if acc < best:
                best = acc
    return best


def doc_health(sf_dir: str):
    """Legacy document-health metrics (common_pdf.sh A4/A5 + the
    weighted page_reliability F3): per-doc non-whitespace chars,
    legacy txt/ocr reliability scores, and the >=0.5-reliability flag
    used by the legacy %good-pages rollup.  SQL-oracled: DOC_HEALTH_SQL
    embeds the stopword list and uses round_even to mirror Python's
    banker's rounding bit-for-bit."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    from document_extractor_ray.core.scoring import non_ws_count, page_reliability

    def health(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        non_ws = [non_ws_count(x or "") for x in texts]
        rel_txt = [page_reliability(x or "", "txt") for x in texts]
        rel_ocr = [page_reliability(x or "", "ocr") for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "non_ws_chars": pa.array(non_ws, pa.int64()),
                "legacy_rel_txt": pa.array(rel_txt, pa.float64()),
                "legacy_rel_ocr": pa.array(rel_ocr, pa.float64()),
                "good_page": pa.array([r >= 0.5 for r in rel_txt], pa.bool_()),
            }
        )

    return ds.map_batches(health, batch_format="pyarrow").sort("doc_id")


def _stopword_list_sql() -> str:
    return "[" + ",".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"


# SQL mirror of doc_health / core.scoring.page_reliability
# (common_pdf.sh:98-156 semantics): D = min(1, non_ws/400),
# W = stopword fraction of whitespace-split lowered words, R = 1 - max
# char frequency / non_ws (correlated subquery over exploded chars).
# printf('%.4f') is correctly-rounded decimal conversion of the BINARY
# double — exactly Python round(x, 4) semantics (round_even is NOT: it
# rounds the scaled double, so 0.37225000...0142 went down instead of
# up; 3 mismatches at sf0.1).  Float term order matches the Python
# expression left-to-right so the doubles are bit-identical.
DOC_HEALTH_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS non_ws,
         list_transform(regexp_extract_all(text, '\\S+'), x -> lower(x)) AS words
  FROM documents
), comp AS (
  SELECT doc_id, text, non_ws,
         least(1.0, non_ws / 400.0) AS d,
         CASE WHEN len(words) = 0 THEN 0.0
              ELSE len(list_filter(words, x -> list_contains({_stopword_list_sql()}, x)))
                   / CAST(len(words) AS DOUBLE) END AS w,
         CASE WHEN non_ws = 0 THEN 0.0 ELSE
           1.0 - (
             (SELECT max(cnt) FROM (
                SELECT count(*) AS cnt
                FROM unnest(string_split(regexp_replace(text, '\\s', '', 'g'), '')) AS u(ch)
                GROUP BY ch)) / CAST(non_ws AS DOUBLE))
         END AS r
  FROM base
), scored AS (
  SELECT doc_id, non_ws,
         CASE WHEN non_ws = 0 THEN 0.0
              ELSE CAST(printf('%.4f', greatest(0.0, least(1.0, 0.5*d + 0.3*w + 0.2*r))) AS DOUBLE) END AS legacy_rel_txt,
         CASE WHEN non_ws = 0 THEN 0.0
              ELSE CAST(printf('%.4f', greatest(0.0, least(1.0, 0.4*d + 0.2*w + 0.2*r + 0.2*d))) AS DOUBLE) END AS legacy_rel_ocr
  FROM comp
)
SELECT doc_id, non_ws AS non_ws_chars, legacy_rel_txt, legacy_rel_ocr,
       legacy_rel_txt >= 0.5 AS good_page
FROM scored ORDER BY doc_id
"""


def fingerprints(sf_dir: str):
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        vals = [rolling_fingerprint(x) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "fingerprint": pa.array(vals, pa.int64())}
        )

    return ds.map_batches(fp, batch_format="pyarrow").sort("doc_id")


# ---------------------------------------------------------------------------
# Repetition filter (Gopher-style repetitious-text signals)
# ---------------------------------------------------------------------------

# Thresholds as integer ratios so the flag never touches a float
# compare: dup_word_frac > 0.65  <=>  20*(n-uniq) > 13*n;
# top_bigram_frac > 0.08  <=>  25*top > 2*(n-1).  Chosen from the sf
# corpus distribution (p75 dup ~0.64, p99 bigram ~0.11) so both flags
# fire on a real minority of docs — non-vacuous, non-total.
REP_DUP_WORD_NUM, REP_DUP_WORD_DEN = 13, 20       # > 0.65
REP_TOP_BIGRAM_NUM, REP_TOP_BIGRAM_DEN = 2, 25    # > 0.08


def repetition_filter(sf_dir: str):
    """Per-doc repetition signals (Rae et al., Gopher §A1.3 analogue):
    duplicate-word fraction and most-frequent-bigram fraction, plus
    the combined repetitive flag.  Fractions are raw IEEE quotients of
    integer counts (bit-identical in SQL); flags are integer
    cross-multiplications.

    Per-doc work is numpy unique over the word array (axis-unique over
    the stacked bigram rows, so no separator-collision hazard); the
    per-doc Python dispatch is inherent to ragged tokenization, same
    as the shingle kernels."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        n_l, uniq_l, top_l = [], [], []
        for s in t["text"].to_pylist():
            w = np.array((s or "").lower().split())
            n = w.size
            n_l.append(n)
            if n == 0:
                uniq_l.append(0)
                top_l.append(0)
                continue
            uniq_l.append(len(np.unique(w)))
            if n < 2:
                top_l.append(0)
            else:
                _, counts = np.unique(
                    np.stack([w[:-1], w[1:]]), axis=1, return_counts=True
                )
                top_l.append(int(counts.max()))
        n = np.asarray(n_l, dtype=np.int64)
        uniq = np.asarray(uniq_l, dtype=np.int64)
        top = np.asarray(top_l, dtype=np.int64)
        dup = n - uniq
        nb = np.maximum(n - 1, 0)
        dup_frac = np.where(n > 0, dup / np.where(n > 0, n, 1), 0.0)
        top_frac = np.where(nb > 0, top / np.where(nb > 0, nb, 1), 0.0)
        flag = (REP_DUP_WORD_DEN * dup > REP_DUP_WORD_NUM * n) | (
            REP_TOP_BIGRAM_DEN * top > REP_TOP_BIGRAM_NUM * nb
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n, pa.int64()),
                "n_unique_words": pa.array(uniq, pa.int64()),
                "dup_word_frac": pa.array(dup_frac, pa.float64()),
                "top_bigram_count": pa.array(top, pa.int64()),
                "top_bigram_frac": pa.array(top_frac, pa.float64()),
                "repetitive": pa.array(flag),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow").sort("doc_id")


REPETITION_FILTER_SQL = f"""
WITH split AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws FROM documents
),
raww AS (
  SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS p FROM split
),
words AS (
  SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM raww WHERE w <> ''
),
wstats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT w) AS BIGINT) AS uniq
  FROM words GROUP BY doc_id
),
bg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM words
),
bgc AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top FROM (
    SELECT doc_id, w1, w2, count(*) AS c FROM bg WHERE w2 IS NOT NULL
    GROUP BY doc_id, w1, w2
  ) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n, 0) AS n_words,
       coalesce(s.uniq, 0) AS n_unique_words,
       CASE WHEN coalesce(s.n, 0) > 0
            THEN (s.n - s.uniq)::DOUBLE / s.n ELSE 0.0 END AS dup_word_frac,
       coalesce(b.top, 0) AS top_bigram_count,
       CASE WHEN coalesce(s.n, 0) > 1
            THEN coalesce(b.top, 0)::DOUBLE / (s.n - 1) ELSE 0.0 END AS top_bigram_frac,
       ({REP_DUP_WORD_DEN} * (coalesce(s.n, 0) - coalesce(s.uniq, 0))
          > {REP_DUP_WORD_NUM} * coalesce(s.n, 0))
       OR ({REP_TOP_BIGRAM_DEN} * coalesce(b.top, 0)
          > {REP_TOP_BIGRAM_NUM} * greatest(coalesce(s.n, 1) - 1, 0)) AS repetitive
FROM documents d
LEFT JOIN wstats s ON s.doc_id = d.doc_id
LEFT JOIN bgc b ON b.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Global token-count histogram (corpus-shape statistic)
# ---------------------------------------------------------------------------

HIST_BUCKET_TOKENS = 64


def token_histogram(sf_dir: str, bucket: int = HIST_BUCKET_TOKENS):
    """Corpus-wide histogram of per-doc whitespace-token counts in
    fixed ``bucket``-token bins: (bucket, n_docs, total_tokens).

    Scale shape: each batch pre-aggregates its own histogram with one
    np.bincount (partial combine), so the groupby shuffles at most
    n_buckets rows per block — never the corpus."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(
            pc.count_substring_regex(t["text"], _TOKEN_RE), pa.int64()
        ).to_numpy()
        b = toks // bucket
        n_docs = np.bincount(b)
        tok_sums = np.bincount(b, weights=toks)
        nz = np.nonzero(n_docs)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "n_docs": pa.array(n_docs[nz], pa.int64()),
                "total_tokens": pa.array(tok_sums[nz].astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("total_tokens", alias_name="total_tokens"))
        .sort("bucket")
    )


TOKEN_HISTOGRAM_SQL = f"""
SELECT CAST(length(regexp_extract_all(text, '\\S+')) // {HIST_BUCKET_TOKENS} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Exact global quantiles (distributed order statistic)
# ---------------------------------------------------------------------------

QUANTILE_PERMILLES = (10, 250, 500, 750, 900, 990)


def token_quantiles(sf_dir: str, permilles=QUANTILE_PERMILLES):
    """Exact corpus-wide quantiles of the per-doc token count: the
    q-permille value is the smallest v whose cumulative doc count
    satisfies cum*1000 >= q*n (integer cross-multiplied ceil — no
    float rank arithmetic anywhere).

    Scale shape: token counts live in a small value domain, so the
    exact order statistic needs no distributed sort at all — each
    batch pre-aggregates value counts with np.bincount, the groupby
    shuffles at most |domain| rows per block, and the cumulative scan
    runs on the tiny collected count table.  (For unbounded domains
    the same plan applies to bucketed values first, then a second
    exact pass inside the one chosen bucket.)"""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(
            pc.count_substring_regex(t["text"], _TOKEN_RE), pa.int64()
        ).to_numpy()
        counts = np.bincount(toks)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "v": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .sort("v")
        .take_all()
    )
    vs = np.array([r["v"] for r in counts], dtype=np.int64)
    cum = np.cumsum([r["n"] for r in counts]).astype(np.int64)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in permilles:
        out_q.append(q)
        idx = int(np.searchsorted(cum * 1000, q * total, side="left"))
        # smallest v with cum*1000 >= q*total
        if (cum * 1000 < q * total)[min(idx, len(cum) - 1)]:
            idx += 1
        out_v.append(int(vs[min(idx, len(vs) - 1)]))
    return pa.table(
        {
            "q_permille": pa.array(out_q, pa.int64()),
            "n_tokens": pa.array(out_v, pa.int64()),
        }
    )


TOKEN_QUANTILES_SQL = f"""
WITH c AS (
  SELECT CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS v,
         count(*) AS n
  FROM documents GROUP BY 1
),
cum AS (SELECT v, sum(n) OVER (ORDER BY v) AS cumn FROM c),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
qs(q) AS (VALUES {", ".join(f"({q})" for q in QUANTILE_PERMILLES)})
SELECT CAST(qs.q AS BIGINT) AS q_permille, CAST(min(cum.v) AS BIGINT) AS n_tokens
FROM qs, cum, tot
WHERE cum.cumn * 1000 >= qs.q * tot.n
GROUP BY qs.q
ORDER BY q_permille
"""


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, table A1 analogue)
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_WLEN_PM = 3_000  # mean word length >= 3.0 chars (x1000)
GOPHER_MAX_WLEN_PM = 10_000  # mean word length <= 10.0 chars
GOPHER_MAX_SYMBOL_PM = 100  # (# + ellipsis) per word <= 0.1
GOPHER_MAX_BULLET_PM = 900  # <= 90% of lines bullet-led
GOPHER_MIN_STOP_HITS = 2  # >= 2 distinct common stopwords present
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(sf_dir: str):
    """Gopher-style document quality rules: word-count bounds, mean
    word length bounds, symbol-to-word ratio, bullet-line fraction and
    stopword presence — every signal an integer permille so the SQL
    oracle matches bit-for-bit.  Emits ALL docs with their signals and
    an int64 keep flag (filtering is the caller's one-line mask): the
    rejected rows are what a corpus-quality review actually audits.

    One vectorized map_batches over pyarrow.compute regex kernels, no
    shuffle, no Python per row — the same 100 TB shape as
    quality_filter."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def signals(t: pa.Table) -> pa.Table:
        # NULL text would propagate through every kernel and the
        # non-Kleene pc.and_ chain into keep=null (the oracle's CASE
        # yields 0) — normalize to '' first, mirroring the SQL's
        # coalesce.
        text = pc.fill_null(t["text"], "")
        n_words = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64())
        nw_safe = pc.max_element_wise(n_words, 1)
        word_chars = pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64())
        wlen_pm = pc.divide(pc.multiply(word_chars, 1000), nw_safe)
        n_hash = pc.cast(pc.count_substring(text, "#"), pa.int64())
        n_ellip = pc.cast(pc.count_substring_regex(text, r"\.\.\."), pa.int64())
        symbol_pm = pc.divide(
            pc.multiply(pc.add(n_hash, n_ellip), 1000), nw_safe
        )
        n_lines = pc.add(pc.cast(pc.count_substring(text, "\n"), pa.int64()), 1)
        n_bullet = pc.cast(
            pc.count_substring_regex(text, r"(?m)^[-*•]"), pa.int64()
        )
        bullet_pm = pc.divide(pc.multiply(n_bullet, 1000), n_lines)
        stop_hits = None
        for w in GOPHER_STOPS:
            hit = pc.cast(
                pc.match_substring_regex(text, rf"\b{w}\b"), pa.int64()
            )
            stop_hits = hit if stop_hits is None else pc.add(stop_hits, hit)
        keep = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(n_words, GOPHER_MIN_WORDS),
                    pc.less_equal(n_words, GOPHER_MAX_WORDS),
                ),
                pc.and_(
                    pc.greater_equal(wlen_pm, GOPHER_MIN_WLEN_PM),
                    pc.less_equal(wlen_pm, GOPHER_MAX_WLEN_PM),
                ),
            ),
            pc.and_(
                pc.and_(
                    pc.less_equal(symbol_pm, GOPHER_MAX_SYMBOL_PM),
                    pc.less_equal(bullet_pm, GOPHER_MAX_BULLET_PM),
                ),
                pc.greater_equal(stop_hits, GOPHER_MIN_STOP_HITS),
            ),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": n_words,
                "mean_wlen_permille": wlen_pm,
                "symbol_permille": symbol_pm,
                "bullet_permille": bullet_pm,
                "n_stop_hits": stop_hits,
                "keep": pc.cast(keep, pa.int64()),
            }
        )

    return ds.map_batches(signals, batch_format="pyarrow").sort("doc_id")


def _gopher_stop_sum_sql() -> str:
    return " + ".join(
        f"CASE WHEN regexp_matches(text, '\\b{w}\\b') THEN 1 ELSE 0 END"
        for w in GOPHER_STOPS
    )


GOPHER_RULES_SQL = f"""
WITH documents0 AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
), s AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS word_chars,
         CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
           + CAST(length(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS n_sym,
         CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines,
         CAST(length(regexp_extract_all(text, '(?m)^[-*•]')) AS BIGINT) AS n_bullet,
         CAST({_gopher_stop_sum_sql()} AS BIGINT) AS n_stop_hits
  FROM documents0
), p AS (
  SELECT doc_id, n_words, n_stop_hits,
         word_chars * 1000 // greatest(n_words, 1) AS mean_wlen_permille,
         n_sym * 1000 // greatest(n_words, 1) AS symbol_permille,
         n_bullet * 1000 // n_lines AS bullet_permille
  FROM s
)
SELECT doc_id, n_words, mean_wlen_permille, symbol_permille, bullet_permille,
       n_stop_hits,
       CAST(CASE WHEN n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                  AND mean_wlen_permille BETWEEN {GOPHER_MIN_WLEN_PM} AND {GOPHER_MAX_WLEN_PM}
                  AND symbol_permille <= {GOPHER_MAX_SYMBOL_PM}
                  AND bullet_permille <= {GOPHER_MAX_BULLET_PM}
                  AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM p
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Document frequency: top tokens by how many docs contain them
# ---------------------------------------------------------------------------

DF_TOP_K = 100
TFIDF_TOP_PER_DOC = 3
TFIDF_SCALE = 1_000_000
_DF_SPLIT_RE = "[^a-z0-9]+"


def _df_partial_from_docs(t: pa.Table) -> pa.Table:
    """Per-batch partial DOCUMENT frequencies (token, df_part): a
    doc's tokens live wholly in its row, so per-doc distinctness is
    exact within the batch — flatten lower(text) split on
    non-alphanumerics, dedup (doc, token) pairs and count docs per
    token with Arrow group-bys (all C, no Python per row).  Shared by
    df_top_tokens and tfidf_top_terms phase 1 so the tokenization
    cannot drift between the two operators."""
    toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    pairs = pa.table({"d": parent, "token": flat}).filter(pc.not_equal(flat, ""))
    distinct = pa.TableGroupBy(pairs, ["d", "token"]).aggregate([])
    per_tok = pa.TableGroupBy(distinct, ["token"]).aggregate([("d", "count")])
    return pa.table(
        {
            "token": per_tok["token"],
            "df_part": pc.cast(per_tok["d_count"], pa.int64()),
        }
    )


def df_top_tokens(sf_dir: str, k: int = DF_TOP_K):
    """Top-k tokens by DOCUMENT frequency — the inverted-index /
    TF-IDF building block.  The shuffle carries only per-batch partial
    (token, df) rows — bounded by vocabulary, never corpus size — into
    one grouped sum and a top-k sort."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    from ray.data.aggregate import Sum

    from document_extractor_ray.functions.bucketing import bucketed_agg

    # token keys are vocabulary-sized (key-per-row at web scale):
    # bucketed aggregate, not Ray's per-group hash aggregate (PERF 20-23)
    return (
        bucketed_agg(
            ds.map_batches(_df_partial_from_docs, batch_format="pyarrow"),
            ["token"],
            [("df_part", "sum", "df")],
        )
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
    )


DF_TOP_TOKENS_SQL = f"""
SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY df DESC, token
LIMIT {DF_TOP_K}
"""


# ---------------------------------------------------------------------------
# Token rarity: per-doc mean inverse unigram frequency (quality signal)
# ---------------------------------------------------------------------------

RARITY_SCALE = 1000


def token_rarity(sf_dir: str):
    """Per-doc mean inverse corpus unigram frequency — the
    integer-exact stand-in for a CCNet-style LM perplexity filter
    (rare-token-heavy docs score high, boilerplate scores low) with no
    float logs, so the SQL oracle matches bit for bit:

        rarity_milli(d) = (sum over occurrences of
                           RARITY_SCALE * N_total // cnt(token)) // n_tok(d)

    Scale shape: pass 1 is a bucketed vocabulary aggregate (shuffle
    bounded by distinct tokens, never corpus size); the (token, cnt)
    table broadcasts once like the df/tfidf operators (same documented
    vocabulary-broadcast ceiling — above it, swap the broadcast for a
    partitioned join on token); pass 2 is one vectorized
    index_in + segment-sum per batch."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "c_part": pc.cast(g["count_all"], pa.int64())}
        )

    vocab = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["token"],
        [("c_part", "sum", "c")],
    ).materialize()
    vt = pa.concat_tables(
        tb for tb in map(ray.get, vocab.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()
    n_total = int(pc.sum(vt["c"]).as_py() or 0)
    ref = state.broadcast((vt, n_total))

    def score(t: pa.Table) -> pa.Table:
        v, n_tot = state.cached_get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        ntok = np.zeros(t.num_rows, np.int64)
        per = np.zeros(t.num_rows, np.int64)
        if len(flat):
            idx = pc.index_in(flat, value_set=v["token"]).to_numpy(
                zero_copy_only=False
            )
            c = v["c"].to_numpy(zero_copy_only=False)[idx]
            r = (RARITY_SCALE * n_tot) // c
            np.add.at(per, par, r)
            np.add.at(ntok, par, 1)
        rarity = np.where(ntok > 0, per // np.maximum(ntok, 1), 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pa.array(ntok),
                "rarity_milli": pa.array(rarity.astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


TOKEN_RARITY_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY token),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
per AS (
  SELECT tk.doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum({RARITY_SCALE} * tot.n // cnt.c) AS BIGINT) AS s
  FROM tk CROSS JOIN tot JOIN cnt ON cnt.token = tk.token
  GROUP BY tk.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(coalesce(per.s // per.n_tok, 0) AS BIGINT) AS rarity_milli
FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Inverted-index build: postings for the top-df tokens
# ---------------------------------------------------------------------------

POSTINGS_TOP = 20


def postings_topdf(sf_dir: str, p: int = POSTINGS_TOP):
    """Postings lists (token, doc_id) for the top-``p`` tokens by
    document frequency — the index-build counterpart of search_topk.

    Scale shape: the token selection reuses df_top_tokens (bounded
    vocabulary shuffle + k-row collect); the postings pass broadcasts
    the p-token set and emits distinct (token, doc_id) pairs per batch
    — a doc lives wholly in its row, so per-batch distinctness is
    globally exact and nothing but matching postings crosses the final
    sort.  At a 10^12-doc scale, write the sorted postings partitioned
    by token instead of sorting globally."""
    top = df_top_tokens(sf_dir, k=p)
    toks = sorted(r["token"] for r in top.take_all())
    tok_set = pa.array(toks, pa.string())

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def postings(t: pa.Table) -> pa.Table:
        toks_l = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks_l)
        parent = pc.list_parent_indices(toks_l)
        keep = pc.and_(
            pc.is_in(flat, value_set=tok_set), pc.not_equal(flat, "")
        )
        pairs = pa.table(
            {
                "token": flat.filter(keep),
                "doc_id": pc.take(t["doc_id"], parent.filter(keep)),
            }
        )
        g = pa.TableGroupBy(pairs, ["token", "doc_id"]).aggregate([])
        return g.select(["token", "doc_id"])

    return ds.map_batches(postings, batch_format="pyarrow").sort(
        ["token", "doc_id"]
    )


POSTINGS_TOPDF_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT DISTINCT doc_id, token FROM tok WHERE token <> ''),
dfx AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tk GROUP BY token),
top AS (SELECT token FROM dfx ORDER BY df DESC, token LIMIT {POSTINGS_TOP})
SELECT tk.token, tk.doc_id
FROM tk JOIN top USING (token)
ORDER BY token, doc_id
"""


# ---------------------------------------------------------------------------
# Term search: top-k docs for a fixed query by summed integer tf-idf
# ---------------------------------------------------------------------------

SEARCH_TERMS = ("stream", "join", "hash")
SEARCH_TOP_K = 10


def search_topk(sf_dir: str, terms=SEARCH_TERMS, k: int = SEARCH_TOP_K):
    """Retrieval over the corpus: top-k documents for a fixed term
    query, scored by summed integer tf-idf (tf * 1e6 // df per term) —
    the query-side counterpart of the df/tfidf indexing operators.

    Scale shape: the per-term df is a tiny aggregate over the
    df-partial stream filtered to the query terms (combiner output is
    <= |terms| rows per batch), broadcast implicitly as Python ints in
    the scoring closure; scoring is one vectorized count per term per
    batch with a per-batch local top-k, so the driver merge sees at
    most k rows per block.  No shuffle except the final k-row sort."""
    from ray.data.aggregate import Sum

    import ray as _ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    term_set = set(terms)

    def df_for_terms(t: pa.Table) -> pa.Table:
        part = _df_partial_from_docs(t)
        return part.filter(pc.is_in(part["token"], value_set=pa.array(list(term_set))))

    df_tbl = pa.concat_tables(
        tb
        for tb in map(
            _ray.get,
            ds.map_batches(df_for_terms, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("df_part", alias_name="df"))
            .to_arrow_refs(),
        )
        if tb.num_rows
    )
    df_map = dict(zip(df_tbl["token"].to_pylist(), df_tbl["df"].to_pylist()))

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        total = np.zeros(t.num_rows, dtype=np.int64)
        for term in terms:
            dfv = df_map.get(term, 0)
            if not dfv:
                continue
            tf = np.zeros(t.num_rows, dtype=np.int64)
            hits = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            np.add.at(tf, parent[hits], 1)
            total += tf * TFIDF_SCALE // dfv
        out = pa.table(
            {"doc_id": t["doc_id"], "score": pa.array(total, pa.int64())}
        ).filter(pc.greater(pa.array(total), 0))
        # local top-k: at most k rows leave each batch
        return out.sort_by([("score", "descending"), ("doc_id", "ascending")]).slice(0, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


def _search_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in SEARCH_TERMS)
    return f"""
WITH q(term) AS (VALUES {terms}),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok JOIN q ON q.term = tok.token
  GROUP BY 1, 2
),
dfx AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok
        JOIN q ON q.term = tok.token GROUP BY token),
sc AS (
  SELECT tf.doc_id, CAST(sum(tf.tf * {TFIDF_SCALE} // dfx.df) AS BIGINT) AS score
  FROM tf JOIN dfx USING (token)
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM sc WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT {SEARCH_TOP_K}
"""


SEARCH_TOPK_SQL = _search_sql()


# ---------------------------------------------------------------------------
# Exact per-group quantiles (grouped order statistic)
# ---------------------------------------------------------------------------

def lang_token_quantiles(sf_dir: str):
    """Exact per-LANG median and p90 of the per-doc token count — the
    grouped variant of token_quantiles, same rank convention (smallest
    v whose cumulative count satisfies cum*1000 >= q*n, integer
    cross-multiplied).

    Scale shape: each batch pre-aggregates (lang, token-count) value
    counts with one Arrow group-by, the shuffle carries at most
    |langs| x |value domain| rows per block, and the per-lang CDF walk
    runs over the tiny collected count table — exact grouped quantiles
    with no distributed sort."""
    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(t["text"], _TOKEN_RE), pa.int64())
        tbl = pa.table({"lang": t["lang"], "v": toks})
        g = pa.TableGroupBy(tbl, ["lang", "v"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "v": g["v"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "v"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["lang", "v"])
        .take_all()
    )

    out: dict[str, list] = {"lang": [], "n_docs": [], "median_tokens": [], "p90_tokens": []}
    by_lang: dict[str, list] = {}
    for r in counts:
        by_lang.setdefault(r["lang"], []).append((r["v"], r["n"]))
    for lang in sorted(by_lang):
        vs = np.array([v for v, _ in by_lang[lang]], dtype=np.int64)
        cum = np.cumsum([n for _, n in by_lang[lang]]).astype(np.int64)
        total = int(cum[-1])
        row = [lang, total]
        for q in (500, 900):
            idx = int(np.searchsorted(cum * 1000, q * total, side="left"))
            if (cum * 1000 < q * total)[min(idx, len(cum) - 1)]:
                idx += 1
            row.append(int(vs[min(idx, len(vs) - 1)]))
        out["lang"].append(row[0])
        out["n_docs"].append(row[1])
        out["median_tokens"].append(row[2])
        out["p90_tokens"].append(row[3])
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"], pa.int64()),
            "median_tokens": pa.array(out["median_tokens"], pa.int64()),
            "p90_tokens": pa.array(out["p90_tokens"], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# TF-IDF: top terms per document (two-phase: corpus DF, then scoring)
# ---------------------------------------------------------------------------

# (TFIDF_TOP_PER_DOC / TFIDF_SCALE live next to DF_TOP_K — search_topk
# needs them at module-eval time before this section.)


def tfidf_top_terms(sf_dir: str, per_doc: int = TFIDF_TOP_PER_DOC):
    """Top terms per document by tf-idf — the canonical two-phase
    corpus pipeline: phase 1 computes corpus-wide document frequency
    (the df_top_tokens plan, shuffle bounded by vocabulary), phase 2
    broadcasts the df table once (ray.put) and scores every doc's
    term frequencies against it inside map_batches.

    The idf is integer-exact (score = tf * 1e6 // df) so the oracle
    matches bit-for-bit — a float ln(N/df) would rank identically but
    hash differently across engines.  Broadcast assumption: the df
    table is vocabulary-sized; above a memory budget the same plan
    becomes a partitioned join of (doc,token,tf) against (token,df)
    on token (the dedup_first escalation pattern)."""
    from document_extractor_ray import state

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        doc_ids = pc.take(t["doc_id"], parent)
        pairs = pa.table({"doc_id": doc_ids, "token": flat}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(pairs, ["doc_id", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "token": g["token"],
                "tf": pc.cast(g["count_all"], pa.int64()),
            }
        )

    # Phase 1: corpus df — the SAME per-batch partial df_top_tokens
    # uses (one pass: tokenize, (doc,token) dedup, partial counts), so
    # the two operators' tokenization cannot drift.
    from ray.data.aggregate import Sum

    import ray as _ray

    from document_extractor_ray.functions.bucketing import bucketed_agg

    refs = bucketed_agg(
        ds.map_batches(_df_partial_from_docs, batch_format="pyarrow"),
        ["token"],
        [("df_part", "sum", "df")],
    ).to_arrow_refs()
    tables = [tb for tb in map(_ray.get, refs) if tb.num_rows]
    df_tbl = (
        pa.concat_tables(tables)
        if tables
        else pa.table({"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    )
    ref = state.broadcast(df_tbl)

    # Phase 2: re-tokenize and score over the ORIGINAL docs batches —
    # one input row is one doc, so every doc's terms are whole within
    # the batch and the per-doc head needs no shuffle.  (Scoring over
    # the phase-1 tf stream instead would be subject to Ray's
    # re-batching splitting a doc's rows across batches.)
    def score(t: pa.Table) -> pa.Table:
        t = tf_pairs(t)
        t = state.lookup_join(t, "token", state.cached_get(ref), "token", ["df"], fill=0)
        sc = pc.divide(pc.multiply(t["tf"], TFIDF_SCALE), t["df"])
        t = t.append_column("score", pc.cast(sc, pa.int64()))
        g = t.to_pandas().sort_values(
            ["doc_id", "score", "token"], ascending=[True, False, True], kind="mergesort"
        )
        top = g.groupby("doc_id", sort=False).head(per_doc)
        return pa.Table.from_pandas(top, preserve_index=False).cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("token", pa.string()),
                    ("tf", pa.int64()),
                    ("df", pa.int64()),
                    ("score", pa.int64()),
                ]
            )
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["doc_id", "score", "token"], descending=[False, True, False])
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents
  )
  WHERE token <> ''
  GROUP BY 1, 2
),
dfx AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
         tf.tf * {TFIDF_SCALE} // dfx.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * {TFIDF_SCALE} // dfx.df DESC, tf.token
         ) AS rn
  FROM tf JOIN dfx USING (token)
)
SELECT doc_id, token, tf, df, CAST(score AS BIGINT) AS score
FROM scored WHERE rn <= {TFIDF_TOP_PER_DOC}
ORDER BY doc_id, score DESC, token
"""


LANG_TOKEN_QUANTILES_SQL = """
WITH c AS (
  SELECT lang, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS v,
         count(*) AS n
  FROM documents GROUP BY 1, 2
),
cum AS (SELECT lang, v, sum(n) OVER (PARTITION BY lang ORDER BY v) AS cumn FROM c),
tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1)
SELECT tot.lang, tot.n AS n_docs,
       (SELECT CAST(min(v) AS BIGINT) FROM cum
         WHERE cum.lang = tot.lang AND cum.cumn * 1000 >= 500 * tot.n) AS median_tokens,
       (SELECT CAST(min(v) AS BIGINT) FROM cum
         WHERE cum.lang = tot.lang AND cum.cumn * 1000 >= 900 * tot.n) AS p90_tokens
FROM tot
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Corpus bigram counts (n-gram language-model statistics)
# ---------------------------------------------------------------------------

BIGRAM_TOP_K = 20


def bigram_top(sf_dir: str, k: int = BIGRAM_TOP_K):
    """Top-k corpus bigrams by occurrence count — the n-gram LM /
    collocation statistic, and the n>1 generalization of
    df_top_tokens (same tokenizer, so the n-gram family cannot drift).

    All Arrow/numpy per batch: split_pattern_regex tokenizes every doc
    at once, empties drop while keeping list parentage, and the
    consecutive-pair mask is one numpy compare of parent indices
    (pairs never straddle docs; a doc's tokens are wholly in its row).
    binary_join_element_wise materializes the bigram strings and an
    Arrow group_by pre-counts per batch — the shuffle carries
    (bigram, n) partials bounded by the batch's distinct-bigram count,
    never token count; then one grouped Sum + top-k sort.  At corpus
    scale the tail vocabulary is huge, so a production run would add
    a per-batch min-count floor; k-selection semantics are unchanged
    because a global top-k bigram cannot be rare in every batch."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        if len(f) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        mask = pa.array(p[1:] == p[:-1])
        bg = pc.binary_join_element_wise(
            f.slice(0, len(f) - 1).filter(mask), f.slice(1).filter(mask), " "
        )
        agg = pa.TableGroupBy(pa.table({"bigram": bg}), ["bigram"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"bigram": agg["bigram"], "n": pc.cast(agg["count_all"], pa.int64())}
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    return (
        bucketed_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["bigram"],
            [("n", "sum", "n")],
        )
        .sort(["n", "bigram"], descending=[True, False])
        .limit(k)
    )


BIGRAM_TOP_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT lst[g.i] || ' ' || lst[g.i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM grams
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {BIGRAM_TOP_K}
"""


# ---------------------------------------------------------------------------
# Count-min sketch of corpus token frequencies (mergeable registers)
# ---------------------------------------------------------------------------

CMS_D = 4       # hash rows
CMS_W = 256     # buckets per row (top-8-bit multiply-shift)
# odd 64-bit multipliers + offsets (splitmix64 / xxhash-style constants)
CMS_A = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0xD6E8FEB86659FD93,
    0xA24BAED4963EE407,
)
CMS_B = (
    0x5555555555555555,
    0x3333333333333333,
    0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF,
)


def _cms_bucket(crc: int, j: int) -> int:
    return ((crc * CMS_A[j] + CMS_B[j]) % (1 << 64)) >> 56


def token_cms_registers(sf_dir: str):
    """Count-min sketch (Cormode & Muthukrishnan 2005) of corpus
    token frequencies — the mergeable HEAVY-HITTER sketch, closing
    the sketch family next to HLL (distinct), HDR (quantiles) and
    moments (corr): point-lookup upper bounds on any token's count
    from O(d*w) state per stream, no vocabulary shuffle at all.

    Like hll_user_registers, the query emits the REGISTER TABLE
    (row_j, bucket, n): counter matrices are integer sums, so merge
    is elementwise addition — commutative and associative — and the
    distributed state is bit-exact regardless of block order, which
    the SQL oracle verifies cell by cell (same zlib CRC-32 token
    hash via the recursive-CTE table, same multiply-shift bucket in
    HUGEINT arithmetic).  ``cms_estimate`` turns the table into the
    min-over-rows point estimate on the driver.

    Scale shape: tokenization is the vectorized Arrow whitespace
    split (verified == str.split, mirroring the shingle family's
    _words CTE); per-batch counts fold into a d x w matrix via
    np.add.at over the batch's DISTINCT tokens (the only Python loop
    is vocabulary-bounded per batch, never per occurrence); the
    shuffle carries <= d*w = 1024 partial rows per block into one
    grouped Sum."""
    import zlib

    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(pc.utf8_lower(t["text"])))
        tbl = pa.table({"w": toks})
        tbl = tbl.filter(pc.not_equal(tbl["w"], ""))
        g = pa.TableGroupBy(tbl, ["w"]).aggregate([([], "count_all")])
        counts = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        for w, n in zip(g["w"].to_pylist(), counts):
            crc = zlib.crc32(w.encode("utf-8"))
            for j in range(CMS_D):
                mat[j, _cms_bucket(crc, j)] += int(n)
        rows, buckets = np.nonzero(mat)
        return pa.table(
            {
                "row_j": pa.array(rows.astype(np.int64), pa.int64()),
                "bucket": pa.array(buckets.astype(np.int64), pa.int64()),
                "n": pa.array(mat[rows, buckets], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row_j", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .sort(["row_j", "bucket"])
    )


def cms_estimate(registers, token: str) -> int:
    """Point estimate (upper bound) for one token's corpus count from
    a (row_j, bucket, n) register table: min over rows of the
    token's cell."""
    import zlib

    if hasattr(registers, "to_pydict"):
        d = registers.to_pydict()
        rows = zip(d["row_j"], d["bucket"], d["n"])
    else:
        rows = ((r["row_j"], r["bucket"], r["n"]) for r in registers.take_all())
    cells = {(j, b): n for j, b, n in rows}
    crc = zlib.crc32(token.encode("utf-8"))
    return min(cells.get((j, _cms_bucket(crc, j)), 0) for j in range(CMS_D))


# ---------------------------------------------------------------------------
# Character-distribution stats (gibberish / low-entropy signal)
# ---------------------------------------------------------------------------

def char_stats(sf_dir: str):
    """Per-doc character-distribution quality signal: total and
    distinct character counts plus the modal character and its exact
    integer permille share — the cheap gibberish detector (a doc whose
    top character carries most of the mass is padding/noise; cf. the
    repetition heuristics in Rae et al. 2021 \"Gopher\" appendix A).

    Whole-batch vectorization, no per-character Python: the batch's
    texts join into ONE utf-32 codepoint array, per-row char counts
    come from a single np.unique over (row << 21 | codepoint)
    composites, and the per-row modal char falls out of one lexsort
    ordered (row, -count, codepoint) so ties break to the smallest
    codepoint exactly like the oracle's ORDER BY n DESC, c ASC."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(_char_stats_batch, batch_format="pyarrow").sort("doc_id")


def _char_stats_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    n = len(texts)
    lengths = np.fromiter((len(s or "") for s in texts), np.int64, n)
    cps = np.frombuffer(
        "".join(s or "" for s in texts).encode("utf-32-le"), np.uint32
    ).astype(np.int64)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    comp = (row_ids << 21) | cps
    uniq, counts = np.unique(comp, return_counts=True)
    u_rows = uniq >> 21
    u_cps = uniq & 0x1FFFFF
    distinct = np.bincount(u_rows, minlength=n).astype(np.int64)
    top_cp = np.zeros(n, np.int64)
    top_n = np.zeros(n, np.int64)
    if len(uniq):
        ord_ = np.lexsort((u_cps, -counts, u_rows))
        first = np.searchsorted(u_rows[ord_], np.arange(n))
        has = lengths > 0
        sel = ord_[np.clip(first, 0, len(ord_) - 1)]
        top_cp[has] = u_cps[sel[has]]
        top_n[has] = counts[sel[has]]
    permille = top_n * 1000 // np.maximum(lengths, 1)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_chars": pa.array(lengths, pa.int64()),
            "distinct_chars": pa.array(distinct, pa.int64()),
            "top_char": pa.array(
                [chr(c) if m else "" for c, m in zip(top_cp, lengths > 0)],
                pa.string(),
            ),
            "top_char_permille": pa.array(permille, pa.int64()),
        }
    )



CHAR_STATS_SQL = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c FROM documents
),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
ranked AS (
  SELECT doc_id, c, n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, c ASC) AS rk
  FROM cnt
),
tot AS (
  SELECT doc_id, count(*) AS n_chars, count(DISTINCT c) AS distinct_chars
  FROM ch GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(t.n_chars, 0) AS BIGINT) AS n_chars,
       CAST(coalesce(t.distinct_chars, 0) AS BIGINT) AS distinct_chars,
       coalesce(r.c, '') AS top_char,
       CAST(coalesce(r.n * 1000 // t.n_chars, 0) AS BIGINT) AS top_char_permille
FROM documents d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rk = 1
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# TextRank keywords: fixed-iteration integer PageRank over the corpus
# bigram graph (Mihalcea & Tarau 2004; Page et al. 1999)
# ---------------------------------------------------------------------------

TEXTRANK_ITERS = 10
TEXTRANK_SCALE = 1_000_000_000   # nano-rank units
TEXTRANK_TOP_K = 20
TEXTRANK_DRIVER_EDGE_LIMIT = 1_000_000  # edges; above -> edge-parallel rounds


def textrank_keywords(
    sf_dir: str,
    iters: int = TEXTRANK_ITERS,
    k: int = TEXTRANK_TOP_K,
    driver_edge_limit: int = TEXTRANK_DRIVER_EDGE_LIMIT,
):
    """Top-k corpus keywords by PageRank over the directed bigram
    graph (edge w1->w2 per consecutive token pair, weight = corpus
    bigram count; df_top_tokens' tokenizer, so the token family cannot
    drift).  The iterative-graph-algorithm pattern for this engine:

    - ONE corpus pass builds the edge list (per-batch Arrow partial
      counts, shuffle bounded by distinct bigrams, never tokens);
    - above the driver budget, edges and ranks co-partition on
      hash(word): every iteration is two bucketed shuffles (a
      union-tag reduce-side join computes contributions per source
      partition; a second bucketed sum rebuilds ranks per target
      partition) — NO driver-side node dict, NO per-iteration rank
      broadcast (round-2 VERDICT item 4), state is a key-partitioned
      rank Dataset the whole way;
    - arithmetic is pure integer (rank r_{t+1}(v) = 15*S//100 +
      85*sum_{u->v}(r_t(u)*wt//out_w(u))//100 in nano-rank units), so
      block order can never change a single bit and the SQL oracle
      replicates it as 10 chained CTEs.  Dangling mass (last-word-only
      nodes) leaks, as in the classic simplified iteration — both
      sides identically.  Overflow budget: N*S*wt_max must stay under
      2^63; at a 10^7-node vocabulary drop SCALE to 10^6."""
    ds = _read_docs(sf_dir, ["text"])

    def edge_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        if len(f) < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "wt": pa.array([], pa.int64()),
                }
            )
        mask = pa.array(p[1:] == p[:-1])
        g = pa.TableGroupBy(
            pa.table(
                {
                    "w1": f.slice(0, len(f) - 1).filter(mask),
                    "w2": f.slice(1).filter(mask),
                }
            ),
            ["w1", "w2"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "w1": g["w1"],
                "w2": g["w2"],
                "wt": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from document_extractor_ray.functions.bucketing import bucketed_agg

    edges = bucketed_agg(
        ds.map_batches(edge_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        [("wt", "sum", "wt")],
    ).materialize()

    teleport = 15 * TEXTRANK_SCALE // 100
    n_edges = edges.count()
    if n_edges == 0:  # no doc has two consecutive tokens: empty graph
        return pa.table(
            {
                "word": pa.array([], pa.string()),
                "rank_nano": pa.array([], pa.int64()),
            }
        )

    # Small-graph fast path: when the EDGE table fits a driver pass,
    # run the iterations as pure numpy on collected (i1, i2, wt) int
    # arrays — identical integer math, zero per-round Ray stages
    # (measured 6.6 s -> sub-second at bench scale where the vocab
    # graph is tiny).  Both paths share the (rank desc, word asc)
    # ranking rule.
    if n_edges <= driver_edge_limit:
        et = pa.concat_tables(
            tb for tb in map(ray.get, edges.to_arrow_refs()) if tb.num_rows
        )
        nodes_pa = pc.unique(
            pa.concat_arrays(
                [et["w1"].combine_chunks(), et["w2"].combine_chunks()]
            )
        )
        nodes_pa = pc.take(nodes_pa, pc.sort_indices(nodes_pa))
        nodes = nodes_pa.to_pylist()
        n = len(nodes)
        i1 = pc.index_in(et["w1"], value_set=nodes_pa).to_numpy(
            zero_copy_only=False
        )
        i2 = pc.index_in(et["w2"], value_set=nodes_pa).to_numpy(
            zero_copy_only=False
        )
        wt = et["wt"].to_numpy(zero_copy_only=False)
        ow = np.zeros(n, np.int64)
        np.add.at(ow, i1, wt)
        ranks = np.full(n, TEXTRANK_SCALE, np.int64)
        for _ in range(iters):
            c = np.zeros(n, np.int64)
            np.add.at(c, i2, ranks[i1] * wt // ow[i1])
            ranks = teleport + 85 * c // 100
        return _textrank_rank_table(nodes, ranks, k)

    return _textrank_distributed(edges, iters, k, teleport)


def _textrank_distributed(
    edges: "ray.data.Dataset", iters: int, k: int, teleport: int
) -> pa.Table:
    """Partition-parallel PageRank iterations: edges and ranks hash-
    co-partition on the word, each iteration is two bucketed shuffles.
    Driver state is O(1); per-worker state is one partition.  The
    integer math is identical to the driver fast path (per-edge
    r*wt//ow, then 85*sum//100 once per node), so results are
    bit-equal between the paths and vs the SQL oracle."""
    from document_extractor_ray.functions.bucketing import (
        n_shuffle_parts,
        part_of_strings,
    )

    n_parts = n_shuffle_parts()

    def _settle(dset: "ray.data.Dataset") -> "ray.data.Dataset":
        mat = dset.materialize()
        live = [r for r in mat.to_arrow_refs() if ray.get(r).num_rows > 0]
        return ray.data.from_arrow_refs(live) if live else mat

    # Static edge table, partitioned by part(w1), with the per-source
    # out-weight attached locally (all rows of a w1 share a partition).
    def add_part1(t: pa.Table) -> pa.Table:
        return t.append_column("part", part_of_strings(t["w1"], n_parts))

    def attach_ow(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["w1"]).aggregate([("wt", "sum")])
        idx = pc.index_in(t["w1"], value_set=g["w1"])
        ow = pc.take(pc.cast(g["wt_sum"], pa.int64()), idx)
        return pa.table(
            {
                "part": t["part"],
                "w": t["w1"],
                "w2": t["w2"],
                "wt": t["wt"],
                "ow": ow,
                "r": pa.array([None] * t.num_rows, pa.int64()),
            }
        )

    edges_static = _settle(
        edges.map_batches(add_part1, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attach_ow, batch_format="pyarrow")
    )

    # Node table (part, w), one row per word; doubles as the zero-
    # contribution floor so rank(v) = teleport when nothing points at v.
    def node_partial(t: pa.Table) -> pa.Table:
        w = pc.unique(
            pa.concat_arrays(
                [t["w1"].combine_chunks(), t["w2"].combine_chunks()]
            )
        )
        return pa.table({"part": part_of_strings(w, n_parts), "w": w})

    def node_resolve(t: pa.Table) -> pa.Table:
        w = pc.unique(t["w"].combine_chunks())
        return pa.table({"part": part_of_strings(w, n_parts), "w": w})

    nodes = _settle(
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(node_resolve, batch_format="pyarrow")
    )
    nodes_zero = nodes.map_batches(
        lambda t: t.append_column(
            "c", pa.array(np.zeros(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
    ).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return t.append_column(
            "r", pa.array(np.full(t.num_rows, TEXTRANK_SCALE, np.int64))
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def widen_ranks(t: pa.Table) -> pa.Table:
        null_s = pa.array([None] * t.num_rows, pa.string())
        null_i = pa.array([None] * t.num_rows, pa.int64())
        return pa.table(
            {
                "part": t["part"],
                "w": t["w"],
                "w2": null_s,
                "wt": null_i,
                "ow": null_i,
                "r": t["r"],
            }
        )

    empty_contrib = pa.table(
        {
            "part": pa.array([], pa.int32()),
            "w": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        }
    )

    def contribs(t: pa.Table) -> pa.Table:
        is_e = pc.is_valid(t["wt"])
        e = t.filter(is_e)
        if e.num_rows == 0:
            return empty_contrib
        rt = t.filter(pc.invert(is_e))
        i1 = pc.index_in(e["w"], value_set=rt["w"]).to_numpy(
            zero_copy_only=False
        )
        rv = rt["r"].to_numpy(zero_copy_only=False)[i1]
        c = rv * e["wt"].to_numpy(zero_copy_only=False) // e["ow"].to_numpy(
            zero_copy_only=False
        )
        g = pa.TableGroupBy(
            pa.table({"w": e["w2"], "c": pa.array(c, pa.int64())}), ["w"]
        ).aggregate([("c", "sum")])
        return pa.table(
            {
                "part": part_of_strings(g["w"], n_parts),
                "w": g["w"],
                "c": pc.cast(g["c_sum"], pa.int64()),
            }
        )

    def new_ranks(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["w"]).aggregate([("c", "sum")])
        r = teleport + 85 * g["c_sum"].to_numpy(zero_copy_only=False) // 100
        return pa.table(
            {
                "part": part_of_strings(g["w"], n_parts),
                "w": g["w"],
                "r": pa.array(r.astype(np.int64)),
            }
        )

    for _ in range(iters):
        tagged = edges_static.union(
            ranks.map_batches(widen_ranks, batch_format="pyarrow")
        )
        contrib_ds = (
            tagged.groupby("part")
            .map_groups(contribs, batch_format="pyarrow")
        )
        ranks = _settle(
            contrib_ds.union(nodes_zero)
            .groupby("part")
            .map_groups(new_ranks, batch_format="pyarrow")
        )

    # Global top-k without a node-sized collect: local top-k per block
    # (<= k * n_blocks rows reach the driver), then one final sort.
    def local_topk(t: pa.Table) -> pa.Table:
        return t.select(["w", "r"]).sort_by(
            [("r", "descending"), ("w", "ascending")]
        ).slice(0, k)

    head = pa.concat_tables(
        ranks.map_batches(local_topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ),
        promote_options="default",
    )
    head = head.sort_by([("r", "descending"), ("w", "ascending")]).slice(0, k)
    return pa.table(
        {
            "word": pc.cast(head["w"], pa.string()),
            "rank_nano": head["r"],
        }
    )


def _textrank_rank_table(nodes, ranks: np.ndarray, k: int) -> pa.Table:
    """Shared ranking tail for both iteration paths: top-k by
    (rank desc, word asc)."""
    order = np.lexsort((np.array(nodes), -ranks))[:k]
    return pa.table(
        {
            "word": pa.array([nodes[i] for i in order], pa.string()),
            "rank_nano": pa.array(ranks[order], pa.int64()),
        }
    )


def textrank_keywords_sql(
    iters: int = TEXTRANK_ITERS, k: int = TEXTRANK_TOP_K
) -> str:
    """Oracle: the identical integer PageRank as ``iters`` chained
    (non-recursive) CTEs in HUGEINT arithmetic."""
    S = TEXTRANK_SCALE
    teleport = 15 * S // 100
    steps = []
    for t in range(1, iters + 1):
        prev = f"r{t - 1}"
        steps.append(
            f"""r{t} AS (
  SELECT n.w, {teleport}::HUGEINT + 85 * coalesce(s.c, 0) // 100 AS r
  FROM nodes n LEFT JOIN (
    SELECT e.w2 AS w, sum({prev}.r * e.wt // o.ow) AS c
    FROM edges e
    JOIN {prev} ON {prev}.w = e.w1
    JOIN outw o ON o.w = e.w1
    GROUP BY e.w2
  ) s ON s.w = n.w
)"""
        )
    chain = ",\n".join(steps)
    return f"""WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
pairs AS (
  SELECT lst[g.i] AS w1, lst[g.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
edges AS (SELECT w1, w2, count(*)::HUGEINT AS wt FROM pairs GROUP BY 1, 2),
outw AS (SELECT w1 AS w, sum(wt) AS ow FROM edges GROUP BY 1),
nodes AS (SELECT w1 AS w FROM edges UNION SELECT w2 FROM edges),
r0 AS (SELECT w, {S}::HUGEINT AS r FROM nodes),
{chain}
SELECT w AS word, CAST(r AS BIGINT) AS rank_nano
FROM r{iters} ORDER BY r DESC, w LIMIT {k}"""


# ---------------------------------------------------------------------------
# BM25 retrieval (Robertson & Zaragoza 2009), exact-rational variant
# ---------------------------------------------------------------------------

BM25_SCALE = 1_000_000
# k1 = 1.2 and b = 0.75 enter as exact rationals: multiplying the
# saturation fraction through by 10*avgdl gives
#   tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
#     = 22*avgdl*tf / (10*avgdl*tf + 3*avgdl + 9*dl)
# with avgdl = A // N floored to an integer (defined semantics).  The
# idf is the log-free odds form (N - df + 1)/(df + 1), so each
# per-term score is ONE integer floor both engines compute
# identically:
#   micro_t = SCALE*22*avg*tf*(N-df+1) // ((df+1)*(10*avg*tf+3*avg+9*dl))
_BM25_DOCS_KEY = "\x00docs"
_BM25_TOKS_KEY = "\x00toks"


def bm25_topk(sf_dir: str, terms=SEARCH_TERMS, k: int = SEARCH_TOP_K):
    """Top-k documents for the fixed term query under BM25 with exact
    integer semantics — the length-normalized, tf-saturating scorer
    next to search_topk's plain tf-idf.  Each (doc, term) score is a
    single rational floored to micro units, and the doc score is the
    SUM of those ints, so block order can never change a bit and the
    SQL oracle reproduces it in HUGEINT.

    Scale shape: ONE stats pass fuses the per-term df partials with
    corpus totals (doc count + token count ride the same tiny
    aggregate as two reserved keys); the (df, N, avgdl) scalars
    broadcast in the scoring closure; scoring is vectorized per batch
    with a local top-k, so the driver merge sees <= k rows per block.
    Overflow budget: SCALE*22*avgdl*tf_max*(N+1) must stay under
    2^63 — holds to N ~ 10^7 at web-ish doc lengths; drop SCALE to
    10^3 beyond (the SQL side is HUGEINT-safe regardless)."""
    from ray.data.aggregate import Sum

    import ray as _ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    term_set = set(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        # one tokenization feeds BOTH the per-term df partial and the
        # corpus token count (the split is the pass's dominant cost)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.and_(
            pc.not_equal(flat, ""),
            pc.is_in(flat, value_set=pa.array(list(term_set))),
        )
        pairs = pa.table({"d": parent, "token": flat}).filter(keep)
        distinct = pa.TableGroupBy(pairs, ["d", "token"]).aggregate([])
        per_tok = pa.TableGroupBy(distinct, ["token"]).aggregate([("d", "count")])
        part = pa.table(
            {
                "token": per_tok["token"],
                "df_part": pc.cast(per_tok["d_count"], pa.int64()),
            }
        )
        n_toks = int(pc.sum(pc.cast(pc.not_equal(flat, ""), pa.int64())).as_py() or 0)
        extra = pa.table(
            {
                "token": pa.array([_BM25_DOCS_KEY, _BM25_TOKS_KEY], pa.string()),
                "df_part": pa.array([t.num_rows, n_toks], pa.int64()),
            }
        )
        return pa.concat_tables([part, extra])

    stats_tbl = pa.concat_tables(
        tb
        for tb in map(
            _ray.get,
            ds.map_batches(stats_partial, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Sum("df_part", alias_name="df"))
            .to_arrow_refs(),
        )
        if tb.num_rows
    )
    stats = dict(zip(stats_tbl["token"].to_pylist(), stats_tbl["df"].to_pylist()))
    n_docs = int(stats.pop(_BM25_DOCS_KEY, 0))
    n_toks = int(stats.pop(_BM25_TOKS_KEY, 0))
    avg = n_toks // max(n_docs, 1)
    # per-term numerator is SCALE*22*avg*(N-df+1)*tf with tf <= dl;
    # the scalar part of the budget is checked here and the tf factor
    # per batch below (raise, not assert: must survive python -O)
    scalar_budget = BM25_SCALE * 22 * max(avg, 1) * (n_docs + 1)
    if scalar_budget >= (1 << 63) // 4096:
        raise OverflowError(
            "bm25_topk int64 budget exceeded at this corpus size: "
            "lower BM25_SCALE (the SQL oracle is HUGEINT-safe)"
        )

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dl = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(dl, parent[keep], 1)
        total = np.zeros(t.num_rows, dtype=np.int64)
        for term in terms:
            dfv = int(stats.get(term, 0))
            if not dfv:
                continue
            tf = np.zeros(t.num_rows, dtype=np.int64)
            hits = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            np.add.at(tf, parent[hits], 1)
            max_tf = int(tf.max()) if len(tf) else 0
            if max_tf and scalar_budget * max_tf >= (1 << 63):
                raise OverflowError(
                    "bm25_topk int64 budget exceeded by a term-spam doc "
                    f"(tf={max_tf}): lower BM25_SCALE"
                )
            num = BM25_SCALE * 22 * avg * (n_docs - dfv + 1) * tf
            den = (dfv + 1) * (10 * avg * tf + 3 * avg + 9 * dl)
            total += num // np.maximum(den, 1)
        out = pa.table(
            {"doc_id": t["doc_id"], "score_micro": pa.array(total, pa.int64())}
        ).filter(pc.greater(pa.array(total), 0))
        return out.sort_by(
            [("score_micro", "descending"), ("doc_id", "ascending")]
        ).slice(0, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score_micro", "doc_id"], descending=[True, False])
        .limit(k)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"('{t}')" for t in SEARCH_TERMS)
    S = BM25_SCALE
    return f"""
WITH q(term) AS (VALUES {terms}),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
tot AS (
  SELECT (SELECT CAST(count(*) AS HUGEINT) FROM documents) AS n,
         (SELECT CAST(count(*) AS HUGEINT) FROM tok2) AS a
),
avg AS (SELECT n, a // n AS avgdl FROM tot),
dl AS (SELECT doc_id, CAST(count(*) AS HUGEINT) AS dl FROM tok2 GROUP BY 1),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS HUGEINT) AS tf
  FROM tok2 JOIN q ON q.term = tok2.token
  GROUP BY 1, 2
),
dfx AS (
  SELECT token, CAST(count(DISTINCT doc_id) AS HUGEINT) AS df
  FROM tok2 JOIN q ON q.term = tok2.token GROUP BY token
),
sc AS (
  SELECT tf.doc_id,
         CAST(sum(
           ({S}::HUGEINT * 22 * avg.avgdl * (avg.n - dfx.df + 1) * tf.tf)
           // ((dfx.df + 1)
               * (10 * avg.avgdl * tf.tf + 3 * avg.avgdl + 9 * dl.dl))
         ) AS BIGINT) AS score_micro
  FROM tf
  JOIN dfx USING (token)
  JOIN dl USING (doc_id)
  CROSS JOIN avg
  GROUP BY tf.doc_id
)
SELECT doc_id, score_micro FROM sc WHERE score_micro > 0
ORDER BY score_micro DESC, doc_id
LIMIT {SEARCH_TOP_K}
"""


BM25_TOPK_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# Pointwise mutual information over corpus bigrams (collocation mining)
# ---------------------------------------------------------------------------

PMI_TOP_K = 20
PMI_MIN_COUNT = 3          # drop hapax pairs — PMI is degenerate on them
PMI_SCALE = 1_000_000      # fixed-point for the exact integer rank key


def pmi_bigrams(sf_dir: str, k: int = PMI_TOP_K):
    """Top-k bigrams by pointwise mutual information — the collocation
    / multi-word-expression miner (Church & Hanks 1990).  PMI =
    log(N * n_xy / (n_x * n_y)); log is monotone, so ranking on the
    exact integer fixed-point ratio ((n_xy*SCALE)//n_x)*N//n_y gives
    the identical order with NO floats — the two-step division keeps
    every intermediate <= SCALE * N, inside int64 up to ~10^12 corpus
    tokens (the 100 TB regime).

    One fused tokenize pass emits unigram counts, bigram counts, and
    the total-token sentinel (gram='', typ=0) as ONE partial table, so
    the corpus is read once; all three count families flow through a
    single bucketed aggregate (vocabulary is key-per-row at web
    scale).  Attaching n_x / n_y to each surviving bigram is the
    co-partition idiom, not a broadcast: bigrams explode into two
    side rows, tag-union with the unigram table, hash-bucket on the
    TOKEN, and one vectorized pandas merge per balanced partition —
    no vocabulary-sized driver state (the textrank lesson, VERDICT r2
    item 4).  Only bigrams with n_xy >= PMI_MIN_COUNT travel."""
    import pandas as pd

    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        n_shuffle_parts,
        part_of_strings,
    )

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        pieces = [
            pa.table(
                {
                    "gram": pa.array([""], pa.string()),
                    "typ": pa.array([0], pa.int32()),
                    "n": pa.array([len(f)], pa.int64()),
                }
            )
        ]
        if len(f):
            u = pa.TableGroupBy(pa.table({"gram": f}), ["gram"]).aggregate(
                [([], "count_all")]
            )
            pieces.append(
                pa.table(
                    {
                        "gram": u["gram"],
                        "typ": pa.array(
                            np.full(u.num_rows, 1, np.int32), pa.int32()
                        ),
                        "n": pc.cast(u["count_all"], pa.int64()),
                    }
                )
            )
        if len(f) >= 2:
            mask = pa.array(p[1:] == p[:-1])
            bg = pc.binary_join_element_wise(
                f.slice(0, len(f) - 1).filter(mask), f.slice(1).filter(mask), " "
            )
            if len(bg):
                b = pa.TableGroupBy(pa.table({"gram": bg}), ["gram"]).aggregate(
                    [([], "count_all")]
                )
                pieces.append(
                    pa.table(
                        {
                            "gram": b["gram"],
                            "typ": pa.array(
                                np.full(b.num_rows, 2, np.int32), pa.int32()
                            ),
                            "n": pc.cast(b["count_all"], pa.int64()),
                        }
                    )
                )
        return pa.concat_tables(pieces)

    counts = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["gram", "typ"],
        [("n", "sum", "n")],
    ).materialize()  # three consumers below (Ray 2.49 multi-consumer guard)

    total_rows = counts.map_batches(
        lambda t: t.filter(pc.equal(t["typ"], 0)).select(["n"]),
        batch_format="pyarrow",
    ).take_all()
    n_total = int(sum(r["n"] for r in total_rows))
    # ((n_xy*SCALE)//n_x) <= SCALE, so the rank key needs
    # SCALE * n_total <= int64 max — holds to ~9e12 corpus tokens.
    assert n_total < (1 << 63) // PMI_SCALE

    n_parts = n_shuffle_parts()

    def tag_unigrams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["typ"], 1))
        out = pa.table(
            {
                "token": t["gram"],
                "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "n_tok": t["n"],
                "bigram": pa.array([""] * t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                "n_xy": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            }
        )
        return out.append_column("part", part_of_strings(out["token"], n_parts))

    def explode_bigrams(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.equal(t["typ"], 2),
                pc.greater_equal(t["n"], PMI_MIN_COUNT),
            )
        )
        halves = pc.split_pattern(t["gram"], " ")
        left = pc.list_element(halves, 0)
        right = pc.list_element(halves, 1)
        m = t.num_rows
        out = pa.table(
            {
                "token": pa.concat_arrays(
                    [left.combine_chunks(), right.combine_chunks()]
                ),
                "kind": pa.array(np.ones(2 * m, np.int8), pa.int8()),
                "n_tok": pa.array(np.zeros(2 * m, np.int64), pa.int64()),
                "bigram": pa.concat_arrays(
                    [t["gram"].combine_chunks()] * 2
                ),
                "side": pa.array(
                    np.repeat(np.array([0, 1], np.int8), m), pa.int8()
                ),
                "n_xy": pa.concat_arrays([t["n"].combine_chunks()] * 2),
            }
        )
        return out.append_column("part", part_of_strings(out["token"], n_parts))

    tagged = counts.map_batches(tag_unigrams, batch_format="pyarrow").union(
        counts.map_batches(explode_bigrams, batch_format="pyarrow")
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        dim = g[g["kind"] == 0][["token", "n_tok"]]
        rows = g[g["kind"] == 1][["token", "bigram", "side", "n_xy"]]
        m = rows.merge(dim, on="token", how="inner")
        s0 = (m["side"].to_numpy() == 0).astype(np.int64)
        ntok = m["n_tok"].to_numpy()
        return pd.DataFrame(
            {
                "bigram": m["bigram"],
                "n_xy": m["n_xy"].astype("int64"),
                "nx_part": ntok * s0,
                "ny_part": ntok * (1 - s0),
            }
        )

    folded = bucketed_agg(
        tagged.groupby("part").map_groups(attach, batch_format="pandas"),
        ["bigram"],
        [
            ("n_xy", "max", "n_xy"),
            ("nx_part", "sum", "n_x"),
            ("ny_part", "sum", "n_y"),
        ],
    )

    def score(t: pa.Table) -> pa.Table:
        n_xy = t["n_xy"].to_numpy(zero_copy_only=False)
        n_x = t["n_x"].to_numpy(zero_copy_only=False)
        n_y = t["n_y"].to_numpy(zero_copy_only=False)
        s = (n_xy * PMI_SCALE // n_x) * n_total // n_y
        return pa.table(
            {
                "bigram": t["bigram"],
                "n_xy": t["n_xy"],
                "n_x": t["n_x"],
                "n_y": t["n_y"],
                "pmi_scaled": pa.array(s, pa.int64()),
            }
        )

    # top-k is a monotone selector: each block ships <= k rows, the
    # driver merges (saves the full-sort exchange — PERF step 35)
    def local_topk(t: pa.Table) -> pa.Table:
        return t.sort_by(
            [("pmi_scaled", "descending"), ("bigram", "ascending")]
        ).slice(0, k)

    rows = (
        folded.map_batches(score, batch_format="pyarrow")
        .map_batches(local_topk, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (-r["pmi_scaled"], r["bigram"]))
    rows = rows[:k]
    return pa.table(
        {
            "bigram": pa.array([r["bigram"] for r in rows], pa.string()),
            "n_xy": pa.array([r["n_xy"] for r in rows], pa.int64()),
            "n_x": pa.array([r["n_x"] for r in rows], pa.int64()),
            "n_y": pa.array([r["n_y"] for r in rows], pa.int64()),
            "pmi_scaled": pa.array([r["pmi_scaled"] for r in rows], pa.int64()),
        }
    )


PMI_BIGRAMS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
flat AS (SELECT unnest(lst) AS tok FROM toks),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM flat GROUP BY tok),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM flat),
grams AS (
  SELECT lst[g.i] AS a, lst[g.i + 1] AS b
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
bg AS (
  SELECT a || ' ' || b AS bigram, a, b, CAST(count(*) AS BIGINT) AS n_xy
  FROM grams GROUP BY 1, 2, 3
  HAVING count(*) >= {PMI_MIN_COUNT}
)
SELECT bg.bigram, bg.n_xy, ua.n AS n_x, ub.n AS n_y,
       CAST((((bg.n_xy * {PMI_SCALE}) // ua.n) * tot.n) // ub.n AS BIGINT)
         AS pmi_scaled
FROM bg
JOIN uni ua ON ua.tok = bg.a
JOIN uni ub ON ub.tok = bg.b, tot
ORDER BY pmi_scaled DESC, bigram
LIMIT {PMI_TOP_K}
"""


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) of documents: most tokens for fewest chars
# ---------------------------------------------------------------------------

def _frontier_mask(n_tok: np.ndarray, n_chars: np.ndarray) -> np.ndarray:
    """Boolean skyline mask under (maximize n_tok, minimize n_chars)
    with strict dominance (equal points all survive): a point is kept
    iff no other point is >= in tok, <= in chars, and strictly better
    in one.  O(n log n): dedupe to distinct pairs, sort by (tok desc,
    chars asc), keep a distinct pair iff its chars beat the running
    min over every preceding pair (preceding = strictly more tokens,
    or same tokens with strictly fewer chars — exactly the dominators'
    candidate set), then map survival back to all rows."""
    if not len(n_tok):
        return np.zeros(0, bool)
    # composite sort key: tok desc then chars asc in ONE int64 desc sort
    comp = n_tok * (1 << 31) + ((1 << 31) - 1 - n_chars)
    dist = np.unique(comp)[::-1]  # desc
    chars_d = (1 << 31) - 1 - (dist & ((1 << 31) - 1))
    keep = np.ones(len(dist), bool)
    if len(dist) > 1:
        prev_min = np.minimum.accumulate(chars_d)[:-1]
        keep[1:] = chars_d[1:] < prev_min
    return np.isin(comp, dist[keep])


def pareto_docs(sf_dir: str):
    """Skyline query over documents: the Pareto frontier of (token
    count maximized, n_chars minimized) — "densest" docs no other doc
    beats on both axes, the multi-objective selection primitive
    (Börzsönyi et al. 2001).  Ray Data has no skyline operator; the
    distributed shape is the frontier's closure property — the global
    frontier equals the frontier of the UNION of per-block frontiers
    (any dominator of a survivor is itself undominated or dominated
    by an undominated point, transitively) — so each batch reduces to
    its own tiny frontier and one resolve task folds them.  Frontier
    size is bounded by distinct token-count values, orders of
    magnitude below corpus size; at 10^12 docs swap the single
    resolve for a 2-level tree merge of the same function."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "n_chars"])

    def stats_and_local(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_tok": pc.cast(
                    pc.count_substring_regex(t["text"], r"\S+"), pa.int64()
                ),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
                "part": pa.array(np.zeros(t.num_rows, np.int32), pa.int32()),
            }
        )
        mask = _frontier_mask(
            out["n_tok"].to_numpy(), out["n_chars"].to_numpy()
        )
        return out.filter(pa.array(mask))

    def resolve(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        mask = _frontier_mask(
            t["n_tok"].to_numpy(zero_copy_only=False),
            t["n_chars"].to_numpy(zero_copy_only=False),
        )
        return t.filter(pa.array(mask))

    return (
        ds.map_batches(stats_and_local, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
        .sort(["n_tok", "n_chars", "doc_id"], descending=[True, False, False])
    )


PARETO_DOCS_SQL = r"""
WITH d AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
),
dist AS (SELECT n_tok, n_chars FROM d GROUP BY 1, 2),
ranked AS (
  SELECT n_tok, n_chars,
         min(n_chars) OVER (
           ORDER BY n_tok DESC, n_chars ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_min
  FROM dist
),
front AS (
  SELECT n_tok, n_chars FROM ranked
  WHERE prev_min IS NULL OR n_chars < prev_min
)
SELECT doc_id, n_tok, n_chars
FROM d JOIN front USING (n_tok, n_chars)
ORDER BY n_tok DESC, n_chars ASC, doc_id
"""


# ---------------------------------------------------------------------------
# BPE merge learning (byte-pair-encoding vocabulary induction)
# ---------------------------------------------------------------------------

BPE_N_MERGES = 6


def bpe_merges(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Learn the first n BPE merges over the corpus (Sennrich et al.
    2016): repeatedly count adjacent symbol pairs across all word
    TYPES (weighted by word frequency) and merge the most frequent
    pair everywhere, ties broken (n desc, left asc, right asc).
    Returns the merge table (merge_idx, left, right, n) — the learned
    subword vocabulary prefix.

    Words are symbol strings with a DOUBLE-space separator and single
    flanking spaces (' d  a  t  a '), so one literal
    replace(' L  R ', ' LR ') per iteration applies the merge to
    every non-overlapping occurrence simultaneously — each symbol
    owns its flanking spaces, making back-to-back merges exact BPE
    (verified char-identical to DuckDB's replace in pytest/oracle).
    Distributed shape: the word-type table stays a Dataset end to end
    (web-scale word vocabularies are 10^8+ — the textrank lesson:
    never a driver dict); it is materialized ONCE, and iteration i
    applies the i accumulated merges lazily inside its pair pass (one
    sequential replace chain per batch — the same total string work as
    per-iteration rewrites, minus n_merges materialize round-trips).
    Each iteration's argmax folds per-block DISTINCT-pair partials on
    the driver: the pair-count table is bounded by the adjacent
    SYMBOL-pair vocabulary (PERF-32 class, like kn_continuation's
    vocab² fold), categorically smaller than the word table — if a
    corpus ever pushes it past driver memory, reinstate one
    bucketed_agg + block-local top-1 per iteration (the 3.4 s shape
    this replaced).  Measured at sf0.1: 3.9 s -> ~1.4 s warm (PERF
    step 35)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["text"])

    def word_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"word": flat}), ["word"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"word": g["word"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    words = bucketed_agg(
        ds.map_batches(word_partial, batch_format="pyarrow"),
        ["word"],
        [("n", "sum", "n")],
    )

    def to_sym(t: pa.Table) -> pa.Table:
        core = pc.replace_substring_regex(t["word"], "(.)", r"\1  ")
        pad = pa.array([" "] * t.num_rows, pa.string())
        sym = pc.binary_join_element_wise(
            pad, pc.utf8_rtrim(core, " "), pad, ""
        )
        return pa.table({"sym": sym, "n": t["n"]})

    syms = words.map_batches(to_sym, batch_format="pyarrow").materialize()

    _PAIR_EMPTY = pa.table(
        {
            "left": pa.array([], pa.string()),
            "right": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def pair_partial(t: pa.Table, reps=()) -> pa.Table:
        sym = t["sym"]
        for pat, rep in reps:
            sym = pc.replace_substring(sym, pattern=pat, replacement=rep)
        lists = pc.split_pattern(pc.utf8_trim(sym, " "), "  ")
        flat = pc.list_flatten(lists).combine_chunks()
        if len(flat) < 2:
            return _PAIR_EMPTY
        parent = (
            pc.list_parent_indices(lists)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        wn = t["n"].to_numpy(zero_copy_only=False)
        mask = parent[1:] == parent[:-1]
        if not mask.any():
            return _PAIR_EMPTY
        left = flat.slice(0, len(flat) - 1).filter(pa.array(mask))
        right = flat.slice(1).filter(pa.array(mask))
        w = wn[parent[:-1][mask]]
        g = pa.TableGroupBy(
            pa.table(
                {"left": left, "right": right, "n": pa.array(w, pa.int64())}
            ),
            ["left", "right"],
        ).aggregate([("n", "sum")])
        return pa.table(
            {"left": g["left"], "right": g["right"], "n": g["n_sum"]}
        )

    import functools

    merges = []
    reps: list[tuple[str, str]] = []
    for i in range(n_merges):
        partials = syms.map_batches(
            functools.partial(pair_partial, reps=tuple(reps)),
            batch_format="pyarrow",
        ).take_all()
        if not partials:
            break
        agg: dict[tuple, int] = {}
        for r in partials:
            k = (r["left"], r["right"])
            agg[k] = agg.get(k, 0) + int(r["n"])
        (L, R), n = min(
            agg.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((i, L, R, int(n)))
        reps.append((f" {L}  {R} ", f" {L}{R} "))

    return pa.table(
        {
            "merge_idx": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def _bpe_ctes(n_merges: int = BPE_N_MERGES) -> list:
    """The shared merge-learning CTE chain (w{i} word-type tables,
    p{i} pair counts, m{i} argmax picks) — used by BOTH the
    bpe_merges oracle and the bpe_apply_stats oracle."""
    ctes = [
        f"""w0 AS (
  SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), '  ') || ' '
           AS sym, n
  FROM (
    SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_filter(
        regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'), t -> t <> ''
      )) AS tok FROM documents
    ) GROUP BY tok
  )
)"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT lst[g.i] AS l, lst[g.i + 1] AS r, CAST(sum(n) AS BIGINT) AS n
  FROM (SELECT string_split(trim(sym), '  ') AS lst, n FROM w{i - 1}),
       LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"m{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1)"
        )
        if i < n_merges:
            ctes.append(
                f"""w{i} AS (
  SELECT replace(sym, ' ' || m.l || '  ' || m.r || ' ',
                 ' ' || m.l || m.r || ' ') AS sym, w.n
  FROM w{i - 1} w CROSS JOIN m{i} m
)"""
            )
    return ctes


def _bpe_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Chained-CTE replication of every merge iteration (the textrank
    oracle pattern)."""
    ctes = _bpe_ctes(n_merges)
    selects = " UNION ALL ".join(
        f"SELECT CAST({i - 1} AS BIGINT) AS merge_idx, l AS \"left\","
        f" r AS \"right\", n FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (" + selects + ")"
        " ORDER BY merge_idx"
    )


BPE_MERGES_SQL = _bpe_sql()


# ---------------------------------------------------------------------------
# Exact Gini concentration of the corpus token-frequency distribution
# ---------------------------------------------------------------------------

def token_gini(sf_dir: str):
    """Gini coefficient of the corpus unigram frequency distribution
    (how concentrated the token mass is — the Zipf-skew scalar used
    to compare corpus diversity), exact in integers via the
    frequency-of-frequencies fold:

        G = (2*S - (n+1)*T) / (n*T),  S = sum_i i * f_(i)  (f asc)

    and for a group of c tokens sharing frequency f after B tokens,
    sum_i i*f = f * (c*B + c*(c+1)/2) — so G needs only the tiny
    (frequency, token_count) table, never the sorted vocabulary.

    Distributed shape: fold 1 is the standard bucketed vocabulary
    count (shuffle bounded by distinct tokens); fold 2 groups THAT by
    frequency value (domain-bounded, thousands of distinct f at web
    scale); the closed-form Gini then runs in one task on Python ints
    (no int64 overflow at 10^12 tokens).  Output scaled to permille,
    floor division, so the DuckDB HUGEINT oracle is bit-exact."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "cnt": pc.cast(g["count_all"], pa.int64())}
        )

    vocab = bucketed_agg(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["token"],
        [("cnt", "sum", "cnt")],
    )

    def ff_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["cnt"]).rename_columns(["f"]), ["f"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"f": g["f"], "c": pc.cast(g["count_all"], pa.int64())}
        )

    ff = bucketed_agg(
        vocab.map_batches(ff_partial, batch_format="pyarrow"),
        ["f"],
        [("c", "sum", "c")],
    )

    def resolve(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        fs = sorted(
            zip(
                t["f"].to_numpy(zero_copy_only=False).tolist(),
                t["c"].to_numpy(zero_copy_only=False).tolist(),
            )
        )
        n = sum(c for _, c in fs)
        total = sum(f * c for f, c in fs)
        b = 0
        s = 0
        for f, c in fs:  # bounded by DISTINCT frequency values, not vocab
            s += f * (c * b + c * (c + 1) // 2)
            b += c
        gini_pm = (
            1000 * (2 * s - (n + 1) * total) // (n * total) if n and total else 0
        )
        return pa.table(
            {
                "n_tokens": pa.array([n], pa.int64()),
                "total_occurrences": pa.array([total], pa.int64()),
                "gini_permille": pa.array([gini_pm], pa.int64()),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        )

    return (
        ff.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


TOKEN_GINI_SQL = f"""
WITH vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS f
  FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents
  ) WHERE token <> ''
  GROUP BY token
),
ff AS (SELECT f, CAST(count(*) AS BIGINT) AS c FROM vocab GROUP BY f),
cum AS (
  SELECT f, c,
         coalesce(sum(c) OVER (ORDER BY f
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
  FROM ff
),
tot AS (
  SELECT CAST(sum(c) AS HUGEINT) AS n, CAST(sum(f * c) AS HUGEINT) AS t,
         CAST(sum(f * (c * b + c * (c + 1) // 2)) AS HUGEINT) AS s
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n_tokens,
       CAST(t AS BIGINT) AS total_occurrences,
       CAST(CASE WHEN n > 0 AND t > 0
                 THEN 1000 * (2 * s - (n + 1) * t) // (n * t)
                 ELSE 0 END AS BIGINT) AS gini_permille
FROM tot
"""


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth at doc-count checkpoints
# ---------------------------------------------------------------------------

VOCAB_GROWTH_BUCKETS = 10


def vocab_growth(sf_dir: str, n_buckets: int = VOCAB_GROWTH_BUCKETS):
    """Vocabulary size after each decile of the corpus (by doc_id
    order) — the Heaps-law growth curve that sizes tokenizer vocab
    and dedup budgets before a full run.  A token counts toward the
    FIRST checkpoint covering its global first occurrence, so the
    curve is one bucketed (token -> min doc_id) fold, a 10-key
    histogram, and a cumulative sum over 10 rows — no checkpoint
    rescans (the naive form is n_buckets passes over the corpus).

    checkpoint_j covers doc_id <= c_j = (j * max_id) // n_buckets;
    bucket of a first-occurrence md is ceil(md * n / max_id) in pure
    integers, so the SQL oracle matches exactly."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    # one-column scan for the scalar bound (parquet stats would also
    # do); broadcast into the bucket closure
    max_id = int(_read_docs(sf_dir, ["doc_id"]).max("doc_id"))

    def first_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(t["doc_id"], parent)
        pairs = pa.table({"token": flat, "doc_id": ids}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(pairs, ["token"]).aggregate([("doc_id", "min")])
        return pa.table(
            {
                "token": g["token"],
                "md": pc.cast(g["doc_id_min"], pa.int64()),
            }
        )

    firsts = bucketed_agg(
        ds.map_batches(first_partial, batch_format="pyarrow"),
        ["token"],
        [("md", "min", "md")],
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        md = t["md"].to_numpy(zero_copy_only=False)
        j = np.minimum(
            n_buckets, (md * n_buckets + max_id - 1) // max(max_id, 1)
        )
        j = np.maximum(j, 1)
        cnt = np.bincount(j, minlength=n_buckets + 1)[1:]
        return pa.table(
            {
                "checkpoint": pa.array(
                    np.arange(1, n_buckets + 1, dtype=np.int64), pa.int64()
                ),
                "new_tokens": pa.array(cnt.astype(np.int64), pa.int64()),
                "part": pa.array(np.zeros(n_buckets, np.int32), pa.int32()),
            }
        )

    def resolve(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"])
        g = pa.TableGroupBy(t, ["checkpoint"]).aggregate([("new_tokens", "sum")])
        cp = g["checkpoint"].to_numpy(zero_copy_only=False)
        nt = g["new_tokens_sum"].to_numpy(zero_copy_only=False)
        order = np.argsort(cp)
        cp, nt = cp[order], nt[order]
        return pa.table(
            {
                "checkpoint": pa.array(cp, pa.int64()),
                "docs_cutoff": pa.array(
                    cp * max_id // n_buckets, pa.int64()
                ),
                "new_tokens": pa.array(nt.astype(np.int64), pa.int64()),
                "vocab_size": pa.array(np.cumsum(nt).astype(np.int64), pa.int64()),
            }
        )

    return (
        firsts.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


VOCAB_GROWTH_SQL = f"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
firsts AS (
  SELECT token, min(doc_id) AS md
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents
  ) WHERE token <> ''
  GROUP BY token
),
bk AS (
  SELECT greatest(1, least({VOCAB_GROWTH_BUCKETS},
           (md * {VOCAB_GROWTH_BUCKETS} + mx.m - 1) // mx.m)) AS checkpoint,
         count(*) AS c
  FROM firsts, mx GROUP BY 1
),
grid AS (SELECT unnest(range(1, {VOCAB_GROWTH_BUCKETS} + 1)) AS checkpoint)
SELECT CAST(g.checkpoint AS BIGINT) AS checkpoint,
       CAST(g.checkpoint * mx.m // {VOCAB_GROWTH_BUCKETS} AS BIGINT) AS docs_cutoff,
       CAST(coalesce(bk.c, 0) AS BIGINT) AS new_tokens,
       CAST(sum(coalesce(bk.c, 0)) OVER (ORDER BY g.checkpoint) AS BIGINT)
         AS vocab_size
FROM grid g CROSS JOIN mx LEFT JOIN bk ON bk.checkpoint = g.checkpoint
ORDER BY g.checkpoint
"""


# ---------------------------------------------------------------------------
# Keyword-in-context concordance (search / inspection primitive)
# ---------------------------------------------------------------------------

KWIC_TERM = "spark"
KWIC_WINDOW = 2


def kwic_term(sf_dir: str, term: str = KWIC_TERM):
    """Concordance lines for a term: every occurrence with up to
    KWIC_WINDOW tokens of left/right context — the corpus-inspection
    primitive behind search snippets and annotation tooling.

    Fully vectorized per batch: one regex split per doc, flat token
    array + per-doc offsets, hit positions by one equality mask, and
    the context gathers are clipped `take`s masked at doc boundaries
    (an out-of-doc neighbor contributes '' and the join trims) — no
    Python per token.  Output streams; only hit rows leave a block."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "left_ctx": pa.array([], pa.string()),
            "right_ctx": pa.array([], pa.string()),
        }
    )

    def scan(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks).combine_chunks()
        parent = pc.list_parent_indices(toks).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        fl = flat.to_numpy(zero_copy_only=False)
        keep = fl != ""
        fl, parent = fl[keep], parent[keep]
        if not len(fl):
            return _EMPTY
        flat = pa.array(fl, pa.string())
        # per-doc 1-based positions over the KEPT tokens
        change = np.concatenate(([True], parent[1:] != parent[:-1]))
        starts = np.flatnonzero(change)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(parent))))
        pos = np.arange(len(parent)) - run_start + 1
        hits = np.flatnonzero(fl == term)
        if not len(hits):
            return _EMPTY
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[parent[hits]]
        n = len(fl)

        def nb(offs: int) -> np.ndarray:
            idx = hits + offs
            ok = (idx >= 0) & (idx < n)
            ok &= np.where(ok, parent[np.clip(idx, 0, n - 1)] == parent[hits], False)
            out = np.where(ok, fl[np.clip(idx, 0, n - 1)], "")
            return out

        l2, l1, r1, r2 = (pa.array(nb(o), pa.string()) for o in (-2, -1, 1, 2))
        left = pc.utf8_ltrim(
            pc.binary_join_element_wise(l2, l1, " "), " "
        )
        right = pc.utf8_rtrim(
            pc.binary_join_element_wise(r1, r2, " "), " "
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(pos[hits], pa.int64()),
                "left_ctx": left,
                "right_ctx": right,
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow").sort(["doc_id", "pos"])


KWIC_TERM_SQL = f"""
WITH toks AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM (
    SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS p
    FROM (
      SELECT doc_id,
             regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}') AS ws
      FROM documents
    )
  ) WHERE w <> ''
),
ctx AS (
  SELECT doc_id, w, pos,
         ltrim(coalesce(lag(w, 2) OVER win, '') || ' '
               || coalesce(lag(w, 1) OVER win, '')) AS left_ctx,
         rtrim(coalesce(lead(w, 1) OVER win, '') || ' '
               || coalesce(lead(w, 2) OVER win, '')) AS right_ctx
  FROM toks
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, left_ctx, right_ctx
FROM ctx WHERE w = '{KWIC_TERM}'
ORDER BY doc_id, pos
"""


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (model-eval primitive)
# ---------------------------------------------------------------------------

def lang_confusion(sf_dir: str):
    """Confusion matrix of the heuristic language classifier against
    the corpus `lang` labels — the model-evaluation primitive (how a
    filter model is audited before it gates a 100 TB crawl).  The
    classifier state compiles once per worker (module cache, ST5);
    each batch classifies and pre-counts its own (lang, pred) cells,
    so the shuffle carries only the bounded label-square."""
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def cells(t: pa.Table) -> pa.Table:
        if "langid" not in _WORKER_CACHE:
            _WORKER_CACHE["langid"] = LangId()
        inst = _WORKER_CACHE["langid"]
        preds = [inst.classify(x) for x in t["text"].to_pylist()]
        g = pa.TableGroupBy(
            pa.table(
                {"lang": t["lang"], "pred_lang": pa.array(preds, pa.string())}
            ),
            ["lang", "pred_lang"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "pred_lang": g["pred_lang"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .sort(["lang", "pred_lang"])
    )


LANG_CONFUSION_SQL = f"""
WITH w AS (
  SELECT doc_id, lang, text,
         list_transform(regexp_extract_all(text, '[a-zA-Z]+'), x -> lower(x)) AS words,
         regexp_matches(text, '[一-鿿぀-ヿ]') AS cjk
  FROM documents
), h AS (
  SELECT doc_id, lang, text, words, cjk,
         len(list_filter(words, x -> list_contains({{de}}, x))) AS h_de,
         len(list_filter(words, x -> list_contains({{en}}, x))) AS h_en,
         len(list_filter(words, x -> list_contains({{es}}, x))) AS h_es,
         len(list_filter(words, x -> list_contains({{fr}}, x))) AS h_fr
  FROM w
), p AS (
  SELECT lang,
    CASE
      WHEN text IS NULL OR text = '' THEN 'und'
      WHEN cjk THEN 'zh'
      WHEN len(words) = 0 THEN 'und'
      WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'en'
      WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
      WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
      WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
      ELSE 'fr'
    END AS pred_lang
  FROM h
)
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM p GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""

# inline the live marker sets so the oracle cannot drift from LangId
LANG_CONFUSION_SQL = LANG_CONFUSION_SQL.replace("{de}", _marker_list_sql("de"))
LANG_CONFUSION_SQL = LANG_CONFUSION_SQL.replace("{en}", _marker_list_sql("en"))
LANG_CONFUSION_SQL = LANG_CONFUSION_SQL.replace("{es}", _marker_list_sql("es"))
LANG_CONFUSION_SQL = LANG_CONFUSION_SQL.replace("{fr}", _marker_list_sql("fr"))


# ---------------------------------------------------------------------------
# Hapax share per language (vocabulary-tail health metric)
# ---------------------------------------------------------------------------

def hapax_share(sf_dir: str):
    """Per-language vocabulary size, hapax-legomena count (terms whose
    corpus frequency is exactly 1) and hapax share in permille — the
    vocabulary-tail statistic used to sanity-check a crawl's noise
    level.  Scale shape: the (lang, token) term-frequency fold is
    vocabulary-sized key-per-row work, so it runs through
    ``bucketed_agg``; the per-lang rollup then folds each PARTITION
    to <= n_langs partial rows (count + count-of-ones) before one tiny
    grouped Sum — the all-to-all carries languages, never vocabulary."""
    from ray.data.aggregate import Sum

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["lang", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        lang = t["lang"].take(parent)
        pairs = pa.table({"lang": lang, "token": flat}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(pairs, ["lang", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "token": g["token"],
                "c": pc.cast(g["count_all"], pa.int64()),
            }
        )

    tf = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["lang", "token"],
        [("c", "sum", "c")],
    )

    def lang_partial(t: pa.Table) -> pa.Table:
        ones = pc.cast(pc.equal(t["c"], 1), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"lang": t["lang"], "one": ones}), ["lang"]
        ).aggregate([([], "count_all"), ("one", "sum")])
        return pa.table(
            {
                "lang": g["lang"],
                "n_vocab": pc.cast(g["count_all"], pa.int64()),
                "n_hapax": g["one_sum"],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        share = pc.cast(
            pc.divide(pc.multiply(t["n_hapax"], 1000), t["n_vocab"]), pa.int64()
        )
        return pa.table(
            {
                "lang": t["lang"],
                "n_vocab": t["n_vocab"],
                "n_hapax": t["n_hapax"],
                "hapax_permille": share,
            }
        )

    return (
        tf.map_batches(lang_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_vocab", alias_name="n_vocab"),
            Sum("n_hapax", alias_name="n_hapax"),
        )
        .map_batches(finish, batch_format="pyarrow")
        .sort("lang")
    )


HAPAX_SHARE_SQL = f"""
WITH tf AS (
  SELECT lang, token, count(*) AS c
  FROM (
    SELECT lang,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents
  )
  WHERE token <> ''
  GROUP BY lang, token
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_vocab,
       CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
       CAST(1000 * count(*) FILTER (c = 1) // count(*) AS BIGINT) AS hapax_permille
FROM tf GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Grouped top-k: most frequent tokens per language
# ---------------------------------------------------------------------------

LANG_TOP_TOKENS_K = 10


def top_tokens_per_lang(sf_dir: str, k: int = LANG_TOP_TOKENS_K):
    """Top-k tokens by corpus frequency WITHIN each language — the
    grouped variant of df_top_tokens (same tokenizer, so the family
    cannot drift).  After the bucketed (lang, token) fold each key is
    globally unique, so a per-block local top-k per lang is exact and
    bounds what leaves every block at langs*k rows; one driver-bounded
    merge resolves.  Ties break (n DESC, token ASC), deterministic on
    both engines."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["lang", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        lang = t["lang"].take(parent)
        pairs = pa.table({"lang": lang, "token": flat}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(pairs, ["lang", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "token": g["token"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    tf = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["lang", "token"],
        [("n", "sum", "n")],
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t,
            sort_keys=[("lang", "ascending"), ("n", "descending"), ("token", "ascending")],
        )
        t = t.take(idx)
        ld = pc.dictionary_encode(t["lang"].combine_chunks())
        codes = ld.indices.to_numpy(zero_copy_only=False)
        new = np.ones(len(codes), dtype=bool)
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(codes))))
        rank = np.arange(len(codes)) - run_start + 1
        return t.filter(pa.array(rank <= k))

    def add_rank(t: pa.Table) -> pa.Table:
        # rows arrive sorted (lang asc, n desc, token asc) from finish
        ld = pc.dictionary_encode(t["lang"].combine_chunks())
        codes = ld.indices.to_numpy(zero_copy_only=False)
        new = np.ones(len(codes), dtype=bool)
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(codes))))
        rank = np.arange(len(codes)) - run_start + 1
        return t.append_column("rank", pa.array(rank.astype(np.int64), pa.int64()))

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        tf.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: add_rank(local_topk(t.drop_columns(["g"]))),
            batch_format="pyarrow",
        )
        .sort(["lang", "rank"])
    )


TOP_TOKENS_PER_LANG_SQL = f"""
SELECT lang, token, n, CAST(rk AS BIGINT) AS rank
FROM (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
  FROM (
    SELECT lang, token, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT lang,
             unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
      FROM documents
    )
    WHERE token <> ''
    GROUP BY lang, token
  )
)
WHERE rk <= {LANG_TOP_TOKENS_K}
ORDER BY lang, rank
"""


# ---------------------------------------------------------------------------
# Bigram-LM coverage: share of a doc's bigrams inside the corpus top-M
# ---------------------------------------------------------------------------

LM_TOP_BIGRAMS = 200


def lm_bigram_coverage(sf_dir: str, m: int = LM_TOP_BIGRAMS):
    """Per-document coverage (permille, with multiplicity) of the
    corpus's top-M bigrams — the integer-exact stand-in for an n-gram
    LM familiarity score (a true log-prob is irrational, so the
    oracle-comparable statistic is membership coverage).  Two phases:
    (1) the existing bigram_top fold (same tokenizer as the whole
    n-gram family) yields the top-M table, driver-bounded at M rows
    and broadcast once via ray.put; (2) one streaming pass re-derives
    each doc's bigrams IN ROW (pairs never straddle docs) and counts
    membership with a single pc.is_in against the broadcast set —
    per-doc output, no shuffle at all beyond the final doc_id sort.
    Docs with zero bigrams don't appear (matches the SQL's grams
    grouping)."""
    from document_extractor_ray import state

    top = bigram_top(sf_dir, m).to_pandas()
    top_set = pa.array(top["bigram"].tolist(), pa.string())
    top_ref = state.broadcast(top_set)

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def coverage(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "hits": pa.array([], pa.int64()),
                "coverage_permille": pa.array([], pa.int64()),
            }
        )
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        if len(f) < 2:
            return empty
        mask = p[1:] == p[:-1]
        bg = pc.binary_join_element_wise(
            f.slice(0, len(f) - 1).filter(pa.array(mask)),
            f.slice(1).filter(pa.array(mask)),
            " ",
        )
        docs = p[:-1][mask]
        hits = pc.cast(
            pc.is_in(bg, value_set=state.cached_get(top_ref)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        if len(docs) == 0:
            return empty
        # segment fold over contiguous doc runs
        new = np.ones(len(docs), dtype=bool)
        new[1:] = docs[1:] != docs[:-1]
        starts = np.flatnonzero(new)
        n_bg = np.diff(np.append(starts, len(docs))).astype(np.int64)
        hit_sum = np.add.reduceat(hits, starts).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[docs[starts]]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "hits": pa.array(hit_sum, pa.int64()),
                "coverage_permille": pa.array(1000 * hit_sum // n_bg, pa.int64()),
            }
        )

    return ds.map_batches(coverage, batch_format="pyarrow").sort("doc_id")


LM_BIGRAM_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT doc_id, lst[g.i] || ' ' || lst[g.i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
top AS (
  SELECT bigram FROM (
    SELECT bigram, count(*) AS n FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT {LM_TOP_BIGRAMS}
  )
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(count(*) FILTER (bigram IN (SELECT bigram FROM top)) AS BIGINT) AS hits,
       CAST(1000 * count(*) FILTER (bigram IN (SELECT bigram FROM top))
            // count(*) AS BIGINT) AS coverage_permille
FROM grams GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Feature hashing: signed hashed bag-of-words (Weinberger et al. 2009)
# ---------------------------------------------------------------------------

HBOW_DIMS = 16


def hashed_bow(sf_dir: str, d: int = HBOW_DIMS):
    """Signed feature-hashing vectorizer ("hashing trick"): each doc
    becomes a D-dim integer vector, component = sum over token
    occurrences of sign(crc), dim = crc32(token) % D, sign from the
    next crc bit — the collision-tolerant bag-of-words every linear
    text model trains on, with zero vocabulary state.  Emitted long
    (doc_id, dim, val) with one row per OCCUPIED (doc, dim) cell (val
    can be 0 when signs cancel).  Scale shape: per-batch work is
    wholly in-row — crc per DISTINCT word of the batch (dictionary
    encode first, so the C-call loop runs over the batch vocabulary,
    not tokens), one bincount scatter-add per batch, no shuffle
    before the final doc_id sort.  Tokenizer and crc are the dedup
    family's (lower().split() + zlib.crc32), so the SQL twin reuses
    sqlhash's recursive-CTE CRC verbatim."""
    import zlib

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def vectorize(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "val": pa.array([], pa.int64()),
            }
        )
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        if len(f) == 0:
            return empty
        fd = pc.dictionary_encode(f)
        codes = fd.indices.to_numpy(zero_copy_only=False)
        vocab = fd.dictionary.to_pylist()
        crc = np.fromiter(
            (zlib.crc32(w.encode("utf-8")) for w in vocab),
            dtype=np.uint64,
            count=len(vocab),
        )
        dim_of = (crc % np.uint64(d)).astype(np.int64)
        sign_of = np.where((crc // np.uint64(d)) % np.uint64(2) == 0, 1, -1).astype(
            np.int64
        )
        tok_dim = dim_of[codes]
        tok_sign = sign_of[codes]
        cell = p.astype(np.int64) * d + tok_dim
        n_cells = int(t.num_rows) * d
        vals = np.bincount(cell, weights=tok_sign, minlength=n_cells).astype(np.int64)
        occupied = np.bincount(cell, minlength=n_cells) > 0
        idx = np.flatnonzero(occupied)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[idx // d]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "dim": pa.array((idx % d).astype(np.int64), pa.int64()),
                "val": pa.array(vals[idx], pa.int64()),
            }
        )

    return ds.map_batches(vectorize, batch_format="pyarrow").sort(["doc_id", "dim"])


def _hashed_bow_sql() -> str:
    from document_extractor_ray.functions.sqlhash import _CRC_TABLE, _WORD_CRC, _words

    return f"""WITH RECURSIVE
{_words(lower=True)},
{_CRC_TABLE},
{_WORD_CRC}
SELECT doc_id,
       CAST(crc % {HBOW_DIMS} AS BIGINT) AS dim,
       CAST(sum(CASE WHEN (crc // {HBOW_DIMS}) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS val
FROM wcrc
GROUP BY doc_id, dim
ORDER BY doc_id, dim
"""


HASHED_BOW_SQL = _hashed_bow_sql()


# ---------------------------------------------------------------------------
# Grouped percent-rank: length percentile of every doc WITHIN its lang
# ---------------------------------------------------------------------------

def lang_percentiles(sf_dir: str):
    """Every document's length rank and permille percentile WITHIN its
    language — grouped percent_rank, the per-stratum difficulty score
    a curriculum or quality gate keys on.  Same histogram-offset plan
    as doc_global_rank but keyed (lang, n_chars): the driver holds
    only the per-lang key histogram (bounded by lang x length domain),
    rows shuffle ONCE on the composite key, and each partition adds
    within-tie positions to broadcast base offsets — no per-group
    Python, no total-order sort."""
    import ray

    from document_extractor_ray import state
    from document_extractor_ray.functions.analytics import _n_blocks
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "lang", "n_chars"])
    n_parts = _n_blocks()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"lang": t["lang"], "k": t["n_chars"]}), ["lang", "k"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"lang": g["lang"], "k": g["k"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "k"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    base_maps = {}
    totals = {}
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("k")
        keys = g["k"].to_numpy().astype(np.int64)
        counts = g["n"].to_numpy().astype(np.int64)
        above = counts[::-1].cumsum()[::-1] - counts  # strictly longer docs
        base_maps[lang] = (keys, above)
        totals[lang] = int(counts.sum())
    base_ref = state.broadcast((base_maps, totals))

    def add_part(t: pa.Table) -> pa.Table:
        k = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def rank_partition(g):
        import pandas as pd

        maps, tots = state.cached_get(base_ref)
        g = g.sort_values(["lang", "n_chars", "doc_id"], kind="mergesort")
        out = []
        for lang, gg in g.groupby("lang", sort=True):
            keys, above = maps[lang]
            k = gg["n_chars"].to_numpy().astype(np.int64)
            tie_pos = np.arange(len(gg)) - np.searchsorted(k, k, side="left")
            rnk = above[np.searchsorted(keys, k)] + tie_pos + 1
            nl = tots[lang]
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": gg["doc_id"].to_numpy().astype("int64"),
                        "lang": lang,
                        "n_chars": k,
                        "rnk_in_lang": rnk.astype("int64"),
                        "permille_rank": (1000 * (rnk - 1) // max(nl - 1, 1)).astype(
                            "int64"
                        ),
                    }
                )
            )
        return pd.concat(out)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_partition, batch_format="pandas")
        .sort("doc_id")
    )


LANG_PERCENTILES_SQL = """
SELECT doc_id, lang, n_chars,
       CAST(rnk AS BIGINT) AS rnk_in_lang,
       CAST(1000 * (rnk - 1) // greatest(nl - 1, 1) AS BIGINT) AS permille_rank
FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk,
         count(*) OVER (PARTITION BY lang) AS nl
  FROM documents
)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Record-linkage blocking audit: near-length candidate-pair counts
# ---------------------------------------------------------------------------

LEN_BLOCK_DELTA = 2


def length_blocking_audit(sf_dir: str, delta: int = LEN_BLOCK_DELTA):
    """How many candidate pairs would a |len_a - len_b| <= delta
    blocking key generate per language — the cost audit run BEFORE a
    fuzzy-matching join to check the blocking key is selective enough.
    The count needs no pair enumeration at all: it is a histogram
    convolution — pairs = Σ_i c_i*(c_i-1)/2 + Σ_{0<k_j-k_i<=delta}
    c_i*c_j over the (lang, n_chars) count table, computed with prefix
    sums + searchsorted per lang.  Scale shape: the only distributed
    work is the bounded-domain histogram fold; nothing pair-shaped
    ever exists anywhere."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["lang", "n_chars"])

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"lang": t["lang"], "k": t["n_chars"]}), ["lang", "k"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"lang": g["lang"], "k": g["k"], "c": pc.cast(g["count_all"], pa.int64())}
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "k"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def fold(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        df = t.to_pandas().sort_values(["lang", "k"])
        out_l, out_d, out_p = [], [], []
        for lang, g in df.groupby("lang", sort=True):
            k = g["k"].to_numpy().astype(np.int64)
            c = g["c"].to_numpy().astype(np.int64)
            within = int((c * (c - 1) // 2).sum())
            pref = np.concatenate(([0], c.cumsum()))
            hi = np.searchsorted(k, k + delta, side="right")
            lo = np.arange(1, len(k) + 1)  # strictly greater bins
            cross = int((c * (pref[hi] - pref[lo - 1] - c)).sum())
            # cross counts each (i < j within delta) product once:
            # pref[hi] - pref[i+1 - 1] - c_i = sum of c_j for j>i, k_j-k_i<=delta
            out_l.append(lang)
            out_d.append(int(c.sum()))
            out_p.append(within + cross)
        return pa.table(
            {
                "lang": pa.array(out_l, pa.string()),
                "n_docs": pa.array(out_d, pa.int64()),
                "n_pairs": pa.array(out_p, pa.int64()),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        hist.map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: fold(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort("lang")
    )


LENGTH_BLOCKING_AUDIT_SQL = f"""
WITH h AS (
  SELECT lang, n_chars AS k, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
)
SELECT lang,
       CAST(sum(d) AS BIGINT) AS n_docs,
       CAST(sum(p) AS BIGINT) AS n_pairs
FROM (
  SELECT a.lang, 0 AS d, a.c * b.c AS p
  FROM h a JOIN h b ON a.lang = b.lang
                   AND b.k > a.k AND b.k - a.k <= {LEN_BLOCK_DELTA}
  UNION ALL
  SELECT lang, c AS d, c * (c - 1) // 2 AS p FROM h
)
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Cross-language vocabulary overlap (Jaccard per lang pair)
# ---------------------------------------------------------------------------

def lang_vocab_overlap(sf_dir: str):
    """Vocabulary Jaccard between every language pair — the loanword /
    contamination signal a multilingual curator reads before mixing
    language buckets.  Scale shape: the bounded-catalog bitmask fold
    (`bucketing.bitmask_pair_counts`): distinct (token, lang-bit) rows
    collapse per token to one int64 mask, only the mask histogram
    leaves the shuffle, the driver expands 10 pair + 5 per-lang counts
    with a popcount pass — no vocab self-join, nothing pair-shaped
    shuffles.  jaccard_permille = 1000·shared // (va + vb − shared),
    floor on both engines."""
    from document_extractor_ray.functions.bucketing import bitmask_pair_counts

    ds = _read_docs(sf_dir, ["lang", "text"])

    # the lang catalog is a bounded constant: Ray's unique() is fine
    # at 5 keys (the key-per-row trap does not apply)
    langs = sorted(ds.select_columns(["lang"]).unique("lang"))
    code_of = {s: i for i, s in enumerate(langs)}

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        lang = t["lang"].take(parent)
        tab = pa.table({"token": flat, "lang": lang}).filter(pc.not_equal(flat, ""))
        # local distinct before the exchange
        g = pa.TableGroupBy(tab, ["token", "lang"]).aggregate([])
        codes = pa.array(
            [code_of[v] for v in g["lang"].to_pylist()], pa.int64()
        )
        return pa.table({"token": g["token"], "code": codes})

    pairs, counts = bitmask_pair_counts(
        ds.map_batches(explode, batch_format="pyarrow"), ["token"], "code", len(langs)
    )
    out_a, out_b, out_s, out_na, out_nb, out_j = [], [], [], [], [], []
    for (i, j), shared in sorted(pairs.items()):
        union = counts[i] + counts[j] - shared
        out_a.append(langs[i])
        out_b.append(langs[j])
        out_s.append(shared)
        out_na.append(counts[i])
        out_nb.append(counts[j])
        out_j.append(1000 * shared // max(union, 1))
    return pa.table(
        {
            "lang_a": pa.array(out_a, pa.string()),
            "lang_b": pa.array(out_b, pa.string()),
            "n_shared": pa.array(out_s, pa.int64()),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
            "jaccard_permille": pa.array(out_j, pa.int64()),
        }
    )


LANG_VOCAB_OVERLAP_SQL = f"""
WITH v AS (
  SELECT DISTINCT lang, token FROM (
    SELECT lang,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents
  ) WHERE token <> ''
),
sizes AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY lang),
shared AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM v a JOIN v b ON a.token = b.token AND a.lang < b.lang
  GROUP BY 1, 2
)
SELECT s.lang_a, s.lang_b, s.n_shared, sa.n AS n_a, sb.n AS n_b,
       CAST(1000 * s.n_shared // greatest(sa.n + sb.n - s.n_shared, 1) AS BIGINT)
         AS jaccard_permille
FROM shared s
JOIN sizes sa ON sa.lang = s.lang_a
JOIN sizes sb ON sb.lang = s.lang_b
ORDER BY lang_a, lang_b
"""


# ---------------------------------------------------------------------------
# Label-vs-classifier agreement audit per source
# ---------------------------------------------------------------------------

def langid_agreement_by_source(sf_dir: str):
    """Per source: how often the n-gram language classifier agrees
    with the corpus's lang label — the metadata-trust audit a curator
    runs before choosing which field to filter on.  One streaming
    pass: the batch classifier (module-cached regex state) predicts
    in-row, agreement folds to <= |sources| partial rows per batch,
    one tiny grouped Sum, integer permille."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["doc_id", "text", "lang", "source"])

    def agree_partial(t: pa.Table) -> pa.Table:
        pred = _langid_batch(t.select(["doc_id", "text"]))
        eq = pc.cast(pc.equal(pred["pred_lang"], t["lang"]), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"source": t["source"], "agree": eq}), ["source"]
        ).aggregate([([], "count_all"), ("agree", "sum")])
        return pa.table(
            {
                "source": g["source"],
                "n_docs": pc.cast(g["count_all"], pa.int64()),
                "n_agree": g["agree_sum"],
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "agree_permille",
            pc.cast(pc.divide(pc.multiply(t["n_agree"], 1000), t["n_docs"]), pa.int64()),
        )

    return (
        ds.map_batches(agree_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_agree", alias_name="n_agree"))
        .map_batches(finish, batch_format="pyarrow")
        .sort("source")
    )


LANGID_AGREEMENT_BY_SOURCE_SQL = f"""
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (p.pred_lang = d.lang) AS BIGINT) AS n_agree,
       CAST(1000 * count(*) FILTER (p.pred_lang = d.lang) // count(*) AS BIGINT)
         AS agree_permille
FROM ({LANG_ID_SQL}) p JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope per language (log-log least squares)
# ---------------------------------------------------------------------------

ZIPF_TOP_K = 100


def zipf_slope_by_lang(sf_dir: str, k: int = ZIPF_TOP_K):
    """Least-squares slope of ln(count) over ln(rank) for each
    language's top-k tokens — the Zipf-exponent fit that flags
    synthetic or templated corpora (natural text sits near -1).
    Exactness: ln values are micro-quantized BIGINTs on both engines
    (floor(x*1e6+0.5) == DuckDB round() for positives; CPython's
    math.log and DuckDB's ln are the same libm call), and the slope
    ships as the exact integer pair (slope_num, slope_den) =
    (n·Σxy − ΣxΣy, n·Σxx − Σx²) — no float division ever happens.
    Scale shape: same bucketed (lang, token) fold + per-block local
    top-k as top_tokens_per_lang; the regression fold sees only
    langs·k rows."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["lang", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        lang = t["lang"].take(parent)
        pairs = pa.table({"lang": lang, "token": flat}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(pairs, ["lang", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "token": g["token"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    tf = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["lang", "token"],
        [("n", "sum", "n")],
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("lang", "ascending"),
                ("n", "descending"),
                ("token", "ascending"),
            ],
        )
        t = t.take(idx)
        ld = pc.dictionary_encode(t["lang"].combine_chunks())
        codes = ld.indices.to_numpy(zero_copy_only=False)
        new = np.ones(len(codes), dtype=bool)
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(codes))))
        rank = np.arange(len(codes)) - run_start + 1
        return t.filter(pa.array(rank <= k))

    def micro_ln(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def fit(t: pa.Table) -> pa.Table:
        t = local_topk(t)                     # global top-k per lang
        langs, n_tops, nums, dens = [], [], [], []
        ld = pc.dictionary_encode(t["lang"].combine_chunks())
        codes = ld.indices.to_numpy(zero_copy_only=False)
        counts = t["n"].to_numpy(zero_copy_only=False)
        for code in range(len(ld.dictionary)):
            sel = np.flatnonzero(codes == code)
            if len(sel) < 2:
                continue
            # exact integer regression sums (Python ints: no overflow)
            sx = sy = sxy = sxx = 0
            for r, i in enumerate(sel, start=1):
                x, y = micro_ln(r), micro_ln(int(counts[i]))
                sx += x
                sy += y
                sxy += x * y
                sxx += x * x
            m = len(sel)
            langs.append(ld.dictionary[code].as_py())
            n_tops.append(m)
            nums.append(m * sxy - sx * sy)
            dens.append(m * sxx - sx * sx)
        order = np.argsort(np.array(langs, dtype=object))
        return pa.table(
            {
                "lang": pa.array([langs[i] for i in order], pa.string()),
                "n_top": pa.array([n_tops[i] for i in order], pa.int64()),
                "slope_num": pa.array([nums[i] for i in order], pa.int64()),
                "slope_den": pa.array([dens[i] for i in order], pa.int64()),
            }
        )

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("g", pa.array(np.zeros(t.num_rows, np.int32)))

    return (
        tf.map_batches(local_topk, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lambda t: fit(t.drop_columns(["g"])), batch_format="pyarrow")
        .sort("lang")
    )


ZIPF_SLOPE_BY_LANG_SQL = f"""
WITH tf AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT lang,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents
  )
  WHERE token <> ''
  GROUP BY lang, token
),
ranked AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
  FROM tf
),
pts AS (
  SELECT lang,
         CAST(round(ln(rk) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(n) * 1000000) AS BIGINT) AS y
  FROM ranked WHERE rk <= {ZIPF_TOP_K}
),
s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_top,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts GROUP BY 1
)
SELECT lang, n_top,
       CAST(n_top * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n_top * sxx - sx * sx AS BIGINT) AS slope_den
FROM s WHERE n_top >= 2 ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Per-document character-distribution entropy (micro-nat integer form)
# ---------------------------------------------------------------------------

def doc_char_entropy(sf_dir: str):
    """Shannon entropy of each document's character distribution,
    shipped as the exact integer numerator ent_num =
    Σ_c m_c·(L(n) − L(m_c)) with L(v) = round(ln(v)·1e6) — entropy in
    micro-nats is ent_num / n_chars, a division left to the consumer
    so no float crosses the wire.  Low entropy flags templated /
    repeated-character junk the quality filters miss.  Scale shape:
    one streaming pass; per doc a vectorized utf-32 decode +
    np.unique count (alphabet-bounded), ln values memoized per
    distinct count."""
    import math

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def ent_batch(t: pa.Table) -> pa.Table:
        ln_cache: dict[int, int] = {}

        def L(v: int) -> int:
            r = ln_cache.get(v)
            if r is None:
                r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
                ln_cache[v] = r
            return r

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nums = np.empty(len(ids), np.int64)
        lens = np.empty(len(ids), np.int64)
        for i, txt in enumerate(t["text"].to_pylist()):
            cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
            n = len(cp)
            lens[i] = n
            if n == 0:
                nums[i] = 0
                continue
            _, m = np.unique(cp, return_counts=True)
            ln_n = L(n)
            nums[i] = sum(int(c) * (ln_n - L(int(c))) for c in m)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(lens, pa.int64()),
                "ent_num": pa.array(nums, pa.int64()),
            }
        )

    return ds.map_batches(ent_batch, batch_format="pyarrow").sort("doc_id")


DOC_CHAR_ENTROPY_SQL = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c FROM documents
),
cnt AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS m FROM ch GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n FROM cnt GROUP BY 1)
SELECT cnt.doc_id, t.n AS n_chars,
       CAST(sum(m * (CAST(round(ln(t.n) * 1000000) AS BIGINT)
                     - CAST(round(ln(m) * 1000000) AS BIGINT))) AS BIGINT)
         AS ent_num
FROM cnt JOIN tot t ON t.doc_id = cnt.doc_id
GROUP BY cnt.doc_id, t.n
ORDER BY cnt.doc_id
"""


# ---------------------------------------------------------------------------
# Windowed co-occurrence pairs (skip-gram context counts, window <= 2)
# ---------------------------------------------------------------------------

COOC_WINDOW = 2
COOC_TOP_K = 30


def cooc_window_pairs(sf_dir: str, window: int = COOC_WINDOW, k: int = COOC_TOP_K):
    """Top-k directional token pairs co-occurring within ``window``
    positions — the skip-gram context statistic behind word-vector
    training (the window>1 generalization of bigram_top, same
    tokenizer so the n-gram family cannot drift).  Per batch: one
    tokenize, then for each distance d a single numpy parent-index
    compare builds the (w, w_{+d}) pairs — pairs never straddle docs —
    and an Arrow group_by pre-counts; the shuffle carries
    (pair, n) partials bounded by distinct-pair count per batch."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        pieces = []
        for d in range(1, window + 1):
            if len(f) <= d:
                continue
            mask = pa.array(p[d:] == p[:-d])
            pieces.append(
                pc.binary_join_element_wise(
                    f.slice(0, len(f) - d).filter(mask), f.slice(d).filter(mask), " "
                )
            )
        if not pieces:
            return empty
        pairs = pa.concat_arrays([pa.array(x) if not isinstance(x, pa.Array) else x for x in pieces])
        agg = pa.TableGroupBy(pa.table({"pair": pairs}), ["pair"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"pair": agg["pair"], "n": pc.cast(agg["count_all"], pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )


COOC_WINDOW_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT lst[g.i] || ' ' || lst[g.i + 1] AS pair
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
  UNION ALL
  SELECT lst[g.i] || ' ' || lst[g.i + 2] AS pair
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst) - 1)) AS i) g
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM grams
GROUP BY pair
ORDER BY n DESC, pair
LIMIT {COOC_TOP_K}
"""


# ---------------------------------------------------------------------------
# Shared-prefix boilerplate groups (first-k raw split tokens)
# ---------------------------------------------------------------------------

PREFIX_GROUP_TOKENS = 5


def doc_prefix_groups(sf_dir: str, k: int = PREFIX_GROUP_TOKENS):
    """Groups of documents sharing their first ``k`` split tokens —
    the cheap boilerplate / mirror-page detector that catches
    template families exact-hash dedup misses.  The prefix is built
    from the RAW split (list_slice before any filtering) so both
    engines see identical token windows.  Scale shape: prefixes are
    key-per-row, so the group fold runs through ``bucketed_agg``
    (count + min doc_id), and only groups with >= 2 docs survive."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def prefixes(t: pa.Table) -> pa.Table:
        toks = pc.list_slice(
            pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE),
            0,
            k,
        )
        joined = pc.binary_join(toks, " ")
        return pa.table({"prefix": joined, "doc_id": t["doc_id"]})

    grouped = bucketed_agg(
        ds.map_batches(prefixes, batch_format="pyarrow"),
        ["prefix"],
        [(None, "count", "n_docs"), ("doc_id", "min", "min_doc_id")],
    )

    def survivors(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n_docs"], 1)).select(
            ["prefix", "n_docs", "min_doc_id"]
        )

    return (
        grouped.map_batches(survivors, batch_format="pyarrow")
        .sort(["n_docs", "prefix"], descending=[True, False])
    )


DOC_PREFIX_GROUPS_SQL = f"""
SELECT array_to_string(
         list_slice(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'), 1, {PREFIX_GROUP_TOKENS}),
         ' ') AS prefix,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM documents
GROUP BY 1 HAVING count(*) > 1
ORDER BY n_docs DESC, prefix
"""


# ---------------------------------------------------------------------------
# Vocabulary prune plan: df-bucketed vocab census for tokenizer training
# ---------------------------------------------------------------------------

def vocab_prune_plan(sf_dir: str):
    """Census of the corpus vocabulary by document-frequency SHARE
    band (rare / mid / common / ubiquitous, permille-of-corpus
    cutoffs at 100/700/780) — the sizing pass run before tokenizer
    training or vocab pruning decides what to keep.  Share bands
    rather than absolute df so the census means the same thing at
    every corpus size.  Per batch ONE tokenize yields both partials:
    term frequency and per-doc-distinct df contributions (a document
    lives wholly in its row, so per-batch distinct (doc, token) is an
    exact df partial); the vocabulary-sized fold runs through
    ``bucketed_agg``, n_docs comes from parquet METADATA (no scan),
    and only <= 4 band rows leave the final shuffle."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Min, Sum

    from document_extractor_ray.functions.bucketing import bucketed_agg

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        occ = pa.table(
            {"doc_id": t["doc_id"].take(parent), "token": flat}
        ).filter(pc.not_equal(flat, ""))
        tf = pa.TableGroupBy(occ.select(["token"]), ["token"]).aggregate(
            [([], "count_all")]
        )
        dt = pa.TableGroupBy(occ, ["token", "doc_id"]).aggregate([([], "count_all")])
        df = pa.TableGroupBy(dt.select(["token"]), ["token"]).aggregate(
            [([], "count_all")]
        )
        tf_t = pa.table(
            {
                "token": tf["token"],
                "tf": pc.cast(tf["count_all"], pa.int64()),
                "df": pa.array(np.zeros(tf.num_rows, np.int64), pa.int64()),
            }
        )
        df_t = pa.table(
            {
                "token": df["token"],
                "tf": pa.array(np.zeros(df.num_rows, np.int64), pa.int64()),
                "df": pc.cast(df["count_all"], pa.int64()),
            }
        )
        return pa.concat_tables([tf_t, df_t])

    tok = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("tf", "sum", "tf"), ("df", "sum", "df")],
    )

    def band_partial(t: pa.Table) -> pa.Table:
        permille = pc.divide(pc.multiply(t["df"], 1000), n_docs)
        bucket = pc.if_else(
            pc.less(permille, 100),
            pa.scalar("rare"),
            pc.if_else(
                pc.less(permille, 700),
                pa.scalar("mid"),
                pc.if_else(
                    pc.less(permille, 780), pa.scalar("common"), pa.scalar("ubiquitous")
                ),
            ),
        )
        g = pa.TableGroupBy(
            pa.table({"bucket": bucket, "tf": t["tf"], "token": t["token"]}),
            ["bucket"],
        ).aggregate([([], "count_all"), ("tf", "sum"), ("token", "min")])
        return pa.table(
            {
                "bucket": g["bucket"],
                "n_tokens": pc.cast(g["count_all"], pa.int64()),
                "total_tf": g["tf_sum"],
                "example_token": g["token_min"],
            }
        )

    return (
        tok.map_batches(band_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("total_tf", alias_name="total_tf"),
            Min("example_token", alias_name="example_token"),
        )
        .sort("bucket")
    )


VOCAB_PRUNE_PLAN_SQL = f"""
WITH occ AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tok AS (
  SELECT token,
         CAST(count(DISTINCT doc_id) * 1000
              // (SELECT count(*) FROM documents) AS BIGINT) AS permille,
         CAST(count(*) AS BIGINT) AS tf
  FROM occ WHERE token <> '' GROUP BY 1
)
SELECT CASE WHEN permille < 100 THEN 'rare'
            WHEN permille < 700 THEN 'mid'
            WHEN permille < 780 THEN 'common'
            ELSE 'ubiquitous' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       min(token) AS example_token
FROM tok GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Metadata-vs-content correlation audit (exact integer ingredients)
# ---------------------------------------------------------------------------

def doc_len_token_corr(sf_dir: str):
    """Exact Pearson ingredients between the DECLARED n_chars metadata
    column and the measured token count, per source — the metadata
    trust audit that catches a feed whose length field lies (truncated
    or padded payloads).  Ships (n, cov_num, var_x_num, var_y_num) as
    exact integers per source; corr is the consumer's float.  Scale
    shape: per batch one tokenize + bincount over list parents, a
    source-bounded partial fold, and the cross-multiplies happen over
    the bounded per-source table."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["source", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        y = np.bincount(parent[keep], minlength=t.num_rows).astype(np.int64)
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = pa.table(
            {
                "source": t["source"],
                "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "xy": pa.array(x * y, pa.int64()),
                "xx": pa.array(x * x, pa.int64()),
                "yy": pa.array(y * y, pa.int64()),
            }
        )
        g = pa.TableGroupBy(part, ["source"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"), ("xy", "sum"),
             ("xx", "sum"), ("yy", "sum")]
        )
        return pa.table(
            {
                "source": g["source"],
                "n": g["one_sum"],
                "sx": g["x_sum"],
                "sy": g["y_sum"],
                "sxy": g["xy_sum"],
                "sxx": g["xx_sum"],
                "syy": g["yy_sum"],
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
    )
    rows = sorted(merged.take_all(), key=lambda r: r["source"])  # source-bounded
    return pa.table(
        {
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
            "cov_num": pa.array(
                [r["n"] * r["sxy"] - r["sx"] * r["sy"] for r in rows], pa.int64()
            ),
            "var_x_num": pa.array(
                [r["n"] * r["sxx"] - r["sx"] * r["sx"] for r in rows], pa.int64()
            ),
            "var_y_num": pa.array(
                [r["n"] * r["syy"] - r["sy"] * r["sy"] for r in rows], pa.int64()
            ),
        }
    )


DOC_LEN_TOKEN_CORR_SQL = f"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                              t -> t <> '')) AS BIGINT) AS y
  FROM documents
),
s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM d GROUP BY 1
)
SELECT source, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS var_x_num,
       CAST(n * syy - sy * sy AS BIGINT) AS var_y_num
FROM s ORDER BY source
"""


# ---------------------------------------------------------------------------
# Char-bigram conditional entropy per language (predictability audit)
# ---------------------------------------------------------------------------

def char_bigram_condent(sf_dir: str):
    """Corpus-level conditional entropy H(c2 | c1) of character
    bigrams per language, shipped as the exact integer numerator
    Σ n12·(L(n1) − L(n12)) with L(v) = round(ln(v)·1e6) over bigram
    counts — low values flag templated or machine-generated text
    (next-char too predictable).  condent = num / total micro-nats is
    the consumer's division.  Scale shape: per batch a vectorized
    utf-32 decode packs each bigram into one int64 ((c1<<21)|c2) and
    Arrow group_by pre-counts; the shuffle and the final fold touch
    only the (lang × alphabet²)-bounded count table."""
    import math

    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        xs, doc_langs = [], []
        for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            cp = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            if len(cp) < 2:
                continue
            xs.append((cp[:-1] << 21) | cp[1:])
            doc_langs.append(lang)
        if not xs:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "pair": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        idx = pa.array(
            np.repeat(np.arange(len(xs), dtype=np.int64), [len(x) for x in xs])
        )
        occ = pa.table(
            {
                "lang": pc.take(pa.array(doc_langs, pa.string()), idx),
                "pair": pa.array(np.concatenate(xs), pa.int64()),
            }
        )
        g = pa.TableGroupBy(occ, ["lang", "pair"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "pair": g["pair"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "pair"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        # (lang x alphabet^2)-bounded: exact integer entropy fold
        lut: dict[int, int] = {}

        def L(v: int) -> int:
            r = lut.get(v)
            if r is None:
                r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
                lut[v] = r
            return r

        pairs = t["pair"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        c1 = pairs >> 21
        order = np.argsort(c1, kind="stable")
        c1s, ns = c1[order], n[order]
        new = np.ones(len(c1s), dtype=bool)
        new[1:] = c1s[1:] != c1s[:-1]
        starts = np.flatnonzero(new)
        marg = np.add.reduceat(ns, starts)
        seg = np.cumsum(new) - 1
        num = 0
        total = int(ns.sum())
        for i in range(len(ns)):            # alphabet²-bounded loop
            num += int(ns[i]) * (L(int(marg[seg[i]])) - L(int(ns[i])))
        return pa.table(
            {
                "lang": t["lang"].slice(0, 1),
                "n_bigrams": pa.array([total], pa.int64()),
                "condent_num": pa.array([num], pa.int64()),
            }
        )

    return (
        counts.groupby("lang")
        .map_groups(fold, batch_format="pyarrow")
        .sort("lang")
    )


CHAR_BIGRAM_CONDENT_SQL = r"""
WITH ch AS (
  SELECT lang, regexp_extract_all(text, '[\s\S]') AS lst FROM documents
),
bg AS (
  SELECT lang,
         lst[g.i] AS c1, lst[g.i + 1] AS c2
  FROM ch, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
cnt AS (
  SELECT lang, c1, c2, CAST(count(*) AS BIGINT) AS n12 FROM bg GROUP BY 1, 2, 3
),
marg AS (
  SELECT lang, c1, CAST(sum(n12) AS BIGINT) AS n1 FROM cnt GROUP BY 1, 2
)
SELECT cnt.lang,
       CAST(sum(n12) AS BIGINT) AS n_bigrams,
       CAST(sum(n12 * (CAST(round(ln(m.n1) * 1000000) AS BIGINT)
                       - CAST(round(ln(n12) * 1000000) AS BIGINT))) AS BIGINT)
         AS condent_num
FROM cnt JOIN marg m ON m.lang = cnt.lang AND m.c1 = cnt.c1
GROUP BY cnt.lang
ORDER BY cnt.lang
"""


# ---------------------------------------------------------------------------
# Unigram-LM perplexity analogue (CCNet-style quality filter, integer-exact)
# ---------------------------------------------------------------------------


def _surprisal_ref(sf_dir: str):
    """Broadcast ref of the corpus unigram surprisal table
    (tokens ChunkedArray, surp int64 micro-nats array) — the shared
    LM state behind the xent family (vocab fold via ``bucketed_agg``,
    one memoized ln per distinct count)."""
    import math

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "c_part": pc.cast(g["count_all"], pa.int64())}
        )

    vocab = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["token"],
        [("c_part", "sum", "c")],
    ).materialize()
    vt = pa.concat_tables(
        tb for tb in map(ray.get, vocab.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()
    n_total = int(pc.sum(vt["c"]).as_py() or 0)

    ln_cache: dict[int, int] = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    l_n = L(n_total) if n_total else 0
    # per-token surprisal L(N) - L(c): one memoized ln per DISTINCT count
    surp = np.array(
        [l_n - L(int(c)) for c in vt["c"].to_pylist()], dtype=np.int64
    )
    return state.broadcast((vt["token"].combine_chunks(), surp))


def _unigram_xent_ds(sf_dir: str, extra_cols: tuple = ()):
    """Unsorted per-doc unigram cross-entropy dataset
    (doc_id, *extra_cols, n_tok, xent_num) — the shared kernel behind
    ``doc_unigram_xent`` and ``ccnet_ppl_buckets``.  See
    ``doc_unigram_xent`` for semantics and the scale story."""
    from document_extractor_ray import state

    ref = _surprisal_ref(sf_dir)
    ds = _read_docs(sf_dir, ["doc_id", *extra_cols, "text"])

    def score(t: pa.Table) -> pa.Table:
        tokens, sp = state.cached_get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        ntok = np.zeros(t.num_rows, np.int64)
        num = np.zeros(t.num_rows, np.int64)
        if len(flat):
            idx = pc.index_in(flat, value_set=tokens).to_numpy(
                zero_copy_only=False
            )
            np.add.at(num, par, sp[idx])
            np.add.at(ntok, par, 1)
        cols = {"doc_id": t["doc_id"]}
        for c in extra_cols:
            cols[c] = t[c]
        cols["n_tok"] = pa.array(ntok)
        cols["xent_num"] = pa.array(num)
        # match the oracle's inner join: token-less docs emit no row
        return pa.table(cols).filter(pa.array(ntok > 0))

    return ds.map_batches(score, batch_format="pyarrow")


def doc_unigram_xent(sf_dir: str):
    """Per-doc cross-entropy under the corpus unigram LM, shipped as
    the exact integer numerator xent_num = Σ_occurrences (L(N) − L(c_w))
    with L(v) = round(ln(v)·1e6) — cross-entropy in micro-nats is
    xent_num / n_tok, the division left to the consumer so no float
    crosses the wire.  This is the integer-exact stand-in for the
    CCNet/Gopher LM-perplexity filter: high xent = rare-token-heavy
    text, low xent = repetitive boilerplate.

    Scale shape: pass 1 is the vocabulary fold (``bucketed_agg`` —
    shuffle bounded by distinct tokens, never corpus size; same
    documented vocabulary-broadcast ceiling as df/tfidf, above it swap
    the broadcast for a partitioned join on token); the per-token
    ln-micro table is computed ONCE on the driver (math.log memoized
    per distinct count — bit-identical to DuckDB's ln, proven by the
    entropy family) and broadcast; pass 2 is one vectorized
    index_in + np.add.at segment-sum per batch."""
    return _unigram_xent_ds(sf_dir).sort("doc_id")


DOC_UNIGRAM_XENT_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk)
SELECT tk.doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(CAST(round(ln(t.n) * 1000000) AS BIGINT)
                - CAST(round(ln(c.c) * 1000000) AS BIGINT)) AS BIGINT)
         AS xent_num
FROM tk JOIN cnt c USING (token) CROSS JOIN tot t
GROUP BY tk.doc_id
ORDER BY tk.doc_id
"""


def ccnet_ppl_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing: rank every document WITHIN
    its language by mean unigram surprisal (mean_xent_nano =
    xent_num·1000 // n_tok, floor — the exact integer both engines
    share) and assign head/middle/tail tertiles (ppl_bucket 1..3,
    ntile semantics, ties broken by doc_id).  This is the filtering
    step the CCNet pipeline runs after LM scoring: keep the head,
    review the middle, drop the tail, per language.

    Scale shape: the LM scoring pass is ``_unigram_xent_ds`` (vocab
    fold + broadcast surprisal table, one segment-sum per batch); the
    grouped tertile is the lang_percentiles plan — a bounded
    (lang × distinct-key) histogram fold broadcast once, one shuffle
    on the key hash so ties co-locate, and a vectorized within-tie
    rank per partition.  No per-group sort window, no corpus-sized
    driver state."""
    import pandas as pd

    from document_extractor_ray import state
    from document_extractor_ray.functions.analytics import _n_blocks

    scored = _unigram_xent_ds(sf_dir, extra_cols=("lang",))

    def keyed(t: pa.Table) -> pa.Table:
        num = t["xent_num"].to_numpy(zero_copy_only=False)
        ntk = t["n_tok"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "mean_xent_nano": pa.array(num * 1000 // ntk, pa.int64()),
            }
        )

    keyed_ds = scored.map_batches(keyed, batch_format="pyarrow").materialize()

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"lang": t["lang"], "k": t["mean_xent_nano"]}), ["lang", "k"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"lang": g["lang"], "k": g["k"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    # per-(lang, key) histogram: bounded by distinct mean-surprisal
    # values per lang, so fold the per-block partials on the driver
    # (PERF step 32 — one less full exchange than a groupby shuffle)
    hist: dict = {}
    for tb in map(
        ray.get,
        keyed_ds.map_batches(hist_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for lang, k, n in zip(
            tb["lang"].to_pylist(), tb["k"].to_pylist(), tb["n"].to_pylist()
        ):
            h = hist.setdefault(lang, {})
            h[int(k)] = h.get(int(k), 0) + int(n)
    base_maps = {}
    totals = {}
    for lang in sorted(hist):
        keys = np.array(sorted(hist[lang]), dtype=np.int64)
        counts = np.array([hist[lang][int(v)] for v in keys], dtype=np.int64)
        below = np.concatenate(([0], np.cumsum(counts)[:-1]))  # strictly lower
        base_maps[lang] = (keys, below)
        totals[lang] = int(counts.sum())
    base_ref = state.broadcast((base_maps, totals))
    n_parts = _n_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        k = t["mean_xent_nano"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (k * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def bucket_partition(g):
        maps, tots = state.cached_get(base_ref)
        g = g.sort_values(["lang", "mean_xent_nano", "doc_id"], kind="mergesort")
        out = []
        for lang, gg in g.groupby("lang", sort=True):
            keys, below = maps[lang]
            k = gg["mean_xent_nano"].to_numpy().astype(np.int64)
            tie_pos = np.arange(len(gg)) - np.searchsorted(k, k, side="left")
            r0 = below[np.searchsorted(keys, k)] + tie_pos  # 0-based global rank
            n = tots[lang]
            q, rem = divmod(n, 3)
            cutoff = rem * (q + 1)
            bucket = (
                np.where(r0 < cutoff, r0 // (q + 1), rem + (r0 - cutoff) // max(q, 1))
                + 1
            )
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": gg["doc_id"].to_numpy().astype("int64"),
                        "lang": lang,
                        "mean_xent_nano": k,
                        "ppl_bucket": bucket.astype("int64"),
                    }
                )
            )
        return pd.concat(out)

    return (
        keyed_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_partition, batch_format="pandas")
        .sort("doc_id")
    )


CCNET_PPL_BUCKETS_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, lang, token FROM tok WHERE token <> ''),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk),
x AS (
  SELECT tk.doc_id, tk.lang,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(CAST(round(ln(t.n) * 1000000) AS BIGINT)
                  - CAST(round(ln(c.c) * 1000000) AS BIGINT)) AS BIGINT)
           AS xent_num
  FROM tk JOIN cnt c USING (token) CROSS JOIN tot t
  GROUP BY tk.doc_id, tk.lang
)
SELECT doc_id, lang, mean_xent_nano,
       CAST(ntile(3) OVER (PARTITION BY lang
                           ORDER BY mean_xent_nano, doc_id) AS BIGINT)
         AS ppl_bucket
FROM (SELECT doc_id, lang,
             CAST(xent_num * 1000 // n_tok AS BIGINT) AS mean_xent_nano
      FROM x)
ORDER BY doc_id
"""


def positional_xent_profile(sf_dir: str):
    """Corpus surprisal by RELATIVE token position: every token is
    assigned to a position decile within its document
    (pos0·10 // n_tok) and the corpus unigram surprisal mass is folded
    per decile — the burn-in/boilerplate profile (headers and footers
    show up as low-surprisal head/tail deciles; a flat profile means
    position-independent text).

    Scale shape: the LM state is the shared ``_surprisal_ref``
    broadcast; the profile pass is one vectorized batch kernel
    (positions from list-parent indices, one np.add.at into 10 cells)
    emitting a 10-row partial per block — driver fold, no shuffle."""
    from document_extractor_ray import state

    ref = _surprisal_ref(sf_dir)
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        tokens, sp = state.cached_get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        n_cnt = np.zeros(10, np.int64)
        x_sum = np.zeros(10, np.int64)
        if len(flat):
            pos0 = np.arange(len(par)) - np.searchsorted(par, par, side="left")
            ntok = np.bincount(par, minlength=t.num_rows)
            dec = pos0 * 10 // ntok[par]
            idx = pc.index_in(flat, value_set=tokens).to_numpy(
                zero_copy_only=False
            )
            np.add.at(n_cnt, dec, 1)
            np.add.at(x_sum, dec, sp[idx])
        present = n_cnt > 0
        return pa.table(
            {
                "pos_decile": pa.array(np.flatnonzero(present), pa.int64()),
                "n_p": pa.array(n_cnt[present], pa.int64()),
                "x_p": pa.array(x_sum[present], pa.int64()),
            }
        )

    n_fold = np.zeros(10, np.int64)
    x_fold = np.zeros(10, np.int64)
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        d = tb["pos_decile"].to_numpy(zero_copy_only=False)
        n_fold[d] += tb["n_p"].to_numpy(zero_copy_only=False)
        x_fold[d] += tb["x_p"].to_numpy(zero_copy_only=False)
    present = n_fold > 0
    return pa.table(
        {
            "pos_decile": pa.array(np.flatnonzero(present), pa.int64()),
            "n_tok": pa.array(n_fold[present], pa.int64()),
            "xent_num": pa.array(x_fold[present], pa.int64()),
        }
    )


POSITIONAL_XENT_PROFILE_SQL = f"""
WITH tok0 AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token,
         generate_subscripts(
           regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'), 1) AS p
  FROM documents
),
tk AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS pos0
  FROM tok0 WHERE token <> ''
),
nt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tk)
SELECT CAST(tk.pos0 * 10 // nt.n AS BIGINT) AS pos_decile,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(CAST(round(ln(t.n) * 1000000) AS BIGINT)
                - CAST(round(ln(c.c) * 1000000) AS BIGINT)) AS BIGINT)
         AS xent_num
FROM tk JOIN nt USING (doc_id) JOIN cnt c USING (token) CROSS JOIN tot t
GROUP BY 1 ORDER BY 1
"""


def doc_bigram_xent(sf_dir: str):
    """Per-doc conditional bigram cross-entropy under the corpus
    bigram LM: for each adjacent pair (w1,w2) the surprisal is
    L(pre(w1)) − L(c(w1 w2)) micro-nats, where pre(w1) counts bigrams
    whose first token is w1 and L(v) = round(ln(v)·1e6) — the
    token-level sequel to doc_unigram_xent (fluency, not just rarity;
    scripted/templated text scores near zero).  No backoff is needed:
    the LM is trained on the same corpus it scores, so every doc
    bigram has a count.

    Scale shape: pass 1 folds the (bigram, n) table with
    ``bucketed_agg`` (shuffle bounded by distinct bigrams — at web
    scale a min-count floor would cap this, documented like
    bigram_top); prefix sums and the per-bigram surprisal table are
    one driver fold over that bounded table, broadcast once; pass 2
    is one vectorized index_in + np.add.at per batch."""
    import math

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def bg_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        if len(f) < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        mask = pa.array(p[1:] == p[:-1])
        bg = pc.binary_join_element_wise(
            f.slice(0, len(f) - 1).filter(mask), f.slice(1).filter(mask), " "
        )
        agg = pa.TableGroupBy(pa.table({"bigram": bg}), ["bigram"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"bigram": agg["bigram"], "n": pc.cast(agg["count_all"], pa.int64())}
        )

    lm = bucketed_agg(
        ds.map_batches(bg_partial, batch_format="pyarrow"),
        ["bigram"],
        [("n", "sum", "n")],
    ).materialize()
    lt = pa.concat_tables(
        tb for tb in map(ray.get, lm.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()

    ln_cache: dict[int, int] = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    # prefix counts: tokens are alnum (the split regex), so the first
    # space splits bigram -> w1 unambiguously
    w1 = pc.list_element(pc.split_pattern(lt["bigram"], " ", max_splits=1), 0)
    pre_tab = pa.TableGroupBy(
        pa.table({"w1": w1, "n": lt["n"]}), ["w1"]
    ).aggregate([("n", "sum")])
    pre_of = dict(
        zip(pre_tab["w1"].to_pylist(), pre_tab["n_sum"].to_pylist())
    )
    nb = lt["n"].to_pylist()
    surp = np.array(
        [
            L(int(pre_of[w])) - L(int(c))
            for w, c in zip(w1.to_pylist(), nb)
        ],
        dtype=np.int64,
    )
    ref = state.broadcast((lt["bigram"].combine_chunks(), surp))

    def score(t: pa.Table) -> pa.Table:
        bigrams, sp = state.cached_get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        nbig = np.zeros(t.num_rows, np.int64)
        num = np.zeros(t.num_rows, np.int64)
        if len(f) >= 2:
            mask = p[1:] == p[:-1]
            bg = pc.binary_join_element_wise(
                f.slice(0, len(f) - 1).filter(pa.array(mask)),
                f.slice(1).filter(pa.array(mask)),
                " ",
            )
            par = p[:-1][mask]
            idx = pc.index_in(bg, value_set=bigrams).to_numpy(
                zero_copy_only=False
            )
            np.add.at(num, par, sp[idx])
            np.add.at(nbig, par, 1)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_big": pa.array(nbig),
                "xent2_num": pa.array(num),
            }
        )
        return out.filter(pa.array(nbig > 0))

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


DOC_BIGRAM_XENT_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT doc_id, lst[g.i] AS w1, lst[g.i] || ' ' || lst[g.i + 1] AS bigram
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
cnt AS (SELECT bigram, CAST(count(*) AS BIGINT) AS nb FROM grams GROUP BY 1),
pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS np FROM grams GROUP BY 1)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_big,
       CAST(sum(CAST(round(ln(p.np) * 1000000) AS BIGINT)
                - CAST(round(ln(c.nb) * 1000000) AS BIGINT)) AS BIGINT)
         AS xent2_num
FROM grams g JOIN cnt c USING (bigram) JOIN pre p USING (w1)
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


def source_lm_divergence(sf_dir: str):
    """KL divergence of each source's unigram distribution from the
    whole-corpus LM — the domain-drift / contamination monitor a
    mixture pipeline runs before reweighting sources.  Everything is
    an exact integer numerator in micro-nats·tokens: ent_num =
    Σ_t m·(L(n_s) − L(m)) (source self-entropy), xent_num =
    Σ_t m·(L(N) − L(c_t)) (source under the corpus LM), and
    kl_num = xent_num − ent_num ≥ 0, with L(v) = round(ln(v)·1e6);
    KL in nats is kl_num / (n_tok·1e6).  No smoothing is needed —
    every source token is in the corpus by construction.

    Scale shape: one (source, token) ``bucketed_agg`` (shuffle bounded
    by sources × vocabulary); the final fold is over that bounded
    table on the driver (PERF 32: once partials are bounded, another
    Ray exchange is pure fixed cost)."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["source", "text"])

    def st_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = t["source"].take(parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"source": src, "token": flat}), ["source", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "token": g["token"],
                "m_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    st = bucketed_agg(
        ds.map_batches(st_partial, batch_format="pyarrow"),
        ["source", "token"],
        [("m_part", "sum", "m")],
    ).materialize()
    tab = pa.concat_tables(
        tb for tb in map(ray.get, st.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()

    ln_cache: dict[int, int] = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    srcs = tab["source"].to_pylist()
    toks = tab["token"].to_pylist()
    ms = tab["m"].to_pylist()
    c_of: dict[str, int] = {}
    n_of: dict[str, int] = {}
    for s, w, m in zip(srcs, toks, ms):
        c_of[w] = c_of.get(w, 0) + int(m)
        n_of[s] = n_of.get(s, 0) + int(m)
    n_total = sum(n_of.values())
    l_n = L(n_total) if n_total else 0
    ent: dict[str, int] = {}
    xent: dict[str, int] = {}
    for s, w, m in zip(srcs, toks, ms):
        m = int(m)
        ent[s] = ent.get(s, 0) + m * (L(n_of[s]) - L(m))
        xent[s] = xent.get(s, 0) + m * (l_n - L(c_of[w]))
    rows = sorted(n_of)
    return pa.table(
        {
            "source": pa.array(rows, pa.string()),
            "n_tok": pa.array([n_of[s] for s in rows], pa.int64()),
            "ent_num": pa.array([ent[s] for s in rows], pa.int64()),
            "xent_num": pa.array([xent[s] for s in rows], pa.int64()),
            "kl_num": pa.array([xent[s] - ent[s] for s in rows], pa.int64()),
        }
    )


SOURCE_LM_DIVERGENCE_SQL = f"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
m AS (SELECT source, token, CAST(count(*) AS BIGINT) AS m FROM tk GROUP BY 1, 2),
g AS (SELECT token, CAST(sum(m) AS BIGINT) AS c FROM m GROUP BY 1),
ns AS (SELECT source, CAST(sum(m) AS BIGINT) AS n FROM m GROUP BY 1),
nt AS (SELECT CAST(sum(m) AS BIGINT) AS nn FROM m)
SELECT m.source,
       ns.n AS n_tok,
       CAST(sum(m.m * (CAST(round(ln(ns.n) * 1000000) AS BIGINT)
                       - CAST(round(ln(m.m) * 1000000) AS BIGINT))) AS BIGINT)
         AS ent_num,
       CAST(sum(m.m * (CAST(round(ln(nt.nn) * 1000000) AS BIGINT)
                       - CAST(round(ln(g.c) * 1000000) AS BIGINT))) AS BIGINT)
         AS xent_num,
       CAST(sum(m.m * ((CAST(round(ln(nt.nn) * 1000000) AS BIGINT)
                        - CAST(round(ln(g.c) * 1000000) AS BIGINT))
                       - (CAST(round(ln(ns.n) * 1000000) AS BIGINT)
                          - CAST(round(ln(m.m) * 1000000) AS BIGINT))))
            AS BIGINT) AS kl_num
FROM m JOIN g USING (token) JOIN ns USING (source) CROSS JOIN nt
GROUP BY 1, 2
ORDER BY m.source
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (subword-per-word budget planning)
# ---------------------------------------------------------------------------


def tokenizer_fertility(sf_dir: str):
    """Per-language tokenizer fertility: BPE-ish subword estimate
    (``bpe_ish_token_count`` — the same kernel token_histogram uses)
    over whitespace words, as integer permille — the budget number a
    multilingual pipeline checks before fixing a token quota per
    language (high fertility = the tokenizer fragments that language).

    Scale shape: all counts are pyarrow.compute regex kernels; the
    per-batch partial is language-bounded, so the driver folds it
    directly (PERF 32)."""
    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ws = pc.cast(pc.count_substring_regex(t["text"], _TOKEN_RE), pa.int64())
        sub = bpe_ish_token_count(t["text"])
        ch = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"lang": t["lang"], "ws": ws, "sub": sub, "ch": ch}),
            ["lang"],
        ).aggregate([([], "count_all"), ("ws", "sum"), ("sub", "sum"), ("ch", "sum")])
        return pa.table(
            {
                "lang": g["lang"],
                "n_docs": pc.cast(g["count_all"], pa.int64()),
                "ws": g["ws_sum"],
                "sub": g["sub_sum"],
                "ch": g["ch_sum"],
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["lang"], [0, 0, 0, 0])
        a[0] += int(r["n_docs"])
        a[1] += int(r["ws"])
        a[2] += int(r["sub"])
        a[3] += int(r["ch"])
    langs = sorted(acc)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array([acc[l][0] for l in langs], pa.int64()),
            "ws_tokens": pa.array([acc[l][1] for l in langs], pa.int64()),
            "subword_tokens": pa.array([acc[l][2] for l in langs], pa.int64()),
            "n_chars": pa.array([acc[l][3] for l in langs], pa.int64()),
            "fert_permille": pa.array(
                [acc[l][2] * 1000 // max(acc[l][1], 1) for l in langs],
                pa.int64(),
            ),
        }
    )


TOKENIZER_FERTILITY_SQL = r"""
WITH per AS (
  SELECT lang,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws,
         CAST(length(regexp_extract_all(text, '[A-Za-z0-9]')) AS BIGINT) // 4
           + CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
           + CAST(length(regexp_extract_all(text, '[.,;:!?''"()\[\]{}-]'))
                  AS BIGINT) AS sub,
         CAST(length(text) AS BIGINT) AS ch
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       CAST(sum(sub) AS BIGINT) AS subword_tokens,
       CAST(sum(ch) AS BIGINT) AS n_chars,
       CAST(sum(sub) * 1000 // greatest(sum(ws), 1) AS BIGINT) AS fert_permille
FROM per GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Collocation detection via Dunning log-likelihood ratio (integer-exact)
# ---------------------------------------------------------------------------

LLR_TOP_K = 30


def _s_micro(x: int, L) -> int:
    """S(x) = x·L(x) with S(0) = 0 — the x·ln(x) term of Dunning's LLR
    in exact micro-nat integers."""
    return 0 if x == 0 else x * L(x)


def collocation_llr(sf_dir: str, k: int = LLR_TOP_K):
    """Top-k adjacent-token collocations by Dunning's log-likelihood
    ratio (the standard significance test for multi-word expressions;
    Dunning 1993) — shipped as the exact integer numerator llr_num =
    2·[S(k11)+S(k12)+S(k21)+S(k22) − S(r1) − S(N−r1) − S(c1) − S(N−c1)
    + S(N)] with S(x) = x·round(ln(x)·1e6), so the SQL oracle matches
    bit for bit (LLR in nats = llr_num / 2e6... the /2 convention kept
    inside).  Unlike raw PMI this does not over-rank rare pairs.

    Scale shape: one bucketed (bigram, n) fold (shuffle bounded by
    distinct bigrams — a production run adds a min-count floor like
    bigram_top); prefix/suffix marginals and the LLR scores are a
    driver fold over that bounded table with memoized ln per DISTINCT
    count.  int64 headroom: S(N) < 2^63 up to N ≈ 3·10^11 bigrams —
    beyond that the numerator needs a nano→micro rescale or int128
    accumulation (documented ceiling)."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["text"])

    def bg_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        if len(f) < 2:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        mask = pa.array(p[1:] == p[:-1])
        g = pa.TableGroupBy(
            pa.table(
                {
                    "w1": f.slice(0, len(f) - 1).filter(mask),
                    "w2": f.slice(1).filter(mask),
                }
            ),
            ["w1", "w2"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {"w1": g["w1"], "w2": g["w2"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    lm = bucketed_agg(
        ds.map_batches(bg_partial, batch_format="pyarrow"),
        ["w1", "w2"],
        [("n", "sum", "n")],
    ).materialize()
    lt = pa.concat_tables(
        tb for tb in map(ray.get, lm.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()

    ln_cache: dict[int, int] = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    w1 = lt["w1"].to_pylist()
    w2 = lt["w2"].to_pylist()
    k11s = lt["n"].to_pylist()
    pre: dict[str, int] = {}
    suf: dict[str, int] = {}
    for a, b, n in zip(w1, w2, k11s):
        pre[a] = pre.get(a, 0) + int(n)
        suf[b] = suf.get(b, 0) + int(n)
    n_tot = sum(pre.values())
    scored = []
    for a, b, n in zip(w1, w2, k11s):
        k11 = int(n)
        r1, c1 = pre[a], suf[b]
        llr = 2 * (
            _s_micro(k11, L)
            + _s_micro(r1 - k11, L)
            + _s_micro(c1 - k11, L)
            + _s_micro(n_tot - r1 - c1 + k11, L)
            - _s_micro(r1, L)
            - _s_micro(n_tot - r1, L)
            - _s_micro(c1, L)
            - _s_micro(n_tot - c1, L)
            + _s_micro(n_tot, L)
        )
        scored.append((f"{a} {b}", k11, llr))
    scored.sort(key=lambda x: (-x[2], x[0]))
    top = scored[:k]
    return pa.table(
        {
            "bigram": pa.array([x[0] for x in top], pa.string()),
            "n": pa.array([x[1] for x in top], pa.int64()),
            "llr_num": pa.array([x[2] for x in top], pa.int64()),
        }
    )


def _llr_sql(k: int = LLR_TOP_K) -> str:
    def S(x: str) -> str:
        return (
            f"(CASE WHEN ({x}) = 0 THEN 0 ELSE ({x}) * "
            f"CAST(round(ln({x}) * 1000000) AS BIGINT) END)"
        )

    return f"""
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT lst[g.i] AS w1, lst[g.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS k11 FROM grams GROUP BY 1, 2),
pre AS (SELECT w1, CAST(count(*) AS BIGINT) AS r1 FROM grams GROUP BY 1),
suf AS (SELECT w2, CAST(count(*) AS BIGINT) AS c1 FROM grams GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM grams)
SELECT w1 || ' ' || w2 AS bigram, k11 AS n,
       CAST(2 * ({S("k11")} + {S("r1 - k11")} + {S("c1 - k11")}
                 + {S("t.n - r1 - c1 + k11")}
                 - {S("r1")} - {S("t.n - r1")} - {S("c1")} - {S("t.n - c1")}
                 + {S("t.n")}) AS BIGINT) AS llr_num
FROM cnt JOIN pre USING (w1) JOIN suf USING (w2) CROSS JOIN tot t
ORDER BY llr_num DESC, bigram
LIMIT {k}
"""


COLLOCATION_LLR_SQL = _llr_sql()


# ---------------------------------------------------------------------------
# Composite quality gate (the full filter chain as one fused pass)
# ---------------------------------------------------------------------------

FAIL_C4 = 1        # C4 gate (quality_filter thresholds)
FAIL_REPETITION = 2  # Gopher repetition flags (repetition_filter)
FAIL_GOPHER = 4    # Gopher document rules (gopher_rules keep = 0)


def doc_quality_composite(sf_dir: str, extra_cols: tuple = ()):
    """The production filter chain — C4 gate + repetition flags +
    Gopher rules — fused into ONE pass over the text, emitting a
    fail-reason bitmask per doc (bit0 C4, bit1 repetition, bit2
    Gopher) and the final keep flag.  A real pipeline runs exactly
    this fusion: three separate scans (or worse, three joins) over a
    100 TB corpus just to AND three masks is the anti-pattern.  The
    component semantics are IDENTICAL to quality_filter /
    repetition_filter / gopher_rules (same constants, same kernels) —
    pinned by a pytest cross-op identity and by the oracle, which
    composes the three ops' own SQL as subqueries.

    Scale shape: one map_batches, no shuffle; the only per-row Python
    is the repetition signals' ragged numpy uniques (inherent, same
    as repetition_filter).  ``extra_cols`` ride along untouched (the
    per-source curation report uses this to avoid a second scan)."""
    ds = _read_docs(sf_dir, ["doc_id", *extra_cols, "text"])

    def composite(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n = pc.cast(pc.utf8_length(text), pa.int64())
        n_safe = pc.max_element_wise(n, 1)
        toks = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64())
        alnum = pc.cast(pc.count_substring_regex(text, r"[A-Za-z0-9]"), pa.int64())
        punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
        alnum_pm = pc.divide(pc.multiply(alnum, 1000), n_safe)
        punct_pm = pc.divide(pc.multiply(punct, 1000), n_safe)
        c4 = pc.and_(
            pc.and_(
                pc.greater_equal(toks, MIN_TOKENS),
                pc.greater_equal(alnum_pm, MIN_ALNUM_PERMILLE),
            ),
            pc.less_equal(punct_pm, MAX_PUNCT_PERMILLE),
        ).to_numpy(zero_copy_only=False)

        # repetition signals (repetition_filter kernels)
        rep = np.zeros(t.num_rows, bool)
        for i, s in enumerate(text.to_pylist()):
            w = np.array((s or "").lower().split())
            nw = w.size
            if nw == 0:
                continue
            uniq = len(np.unique(w))
            top = 0
            if nw >= 2:
                _, counts = np.unique(
                    np.stack([w[:-1], w[1:]]), axis=1, return_counts=True
                )
                top = int(counts.max())
            rep[i] = (
                REP_DUP_WORD_DEN * (nw - uniq) > REP_DUP_WORD_NUM * nw
            ) or (REP_TOP_BIGRAM_DEN * top > REP_TOP_BIGRAM_NUM * (nw - 1))

        # gopher rules (gopher_rules kernels)
        nw_safe = pc.max_element_wise(toks, 1)
        word_chars = pc.cast(pc.count_substring_regex(text, r"\S"), pa.int64())
        wlen_pm = pc.divide(pc.multiply(word_chars, 1000), nw_safe)
        n_sym = pc.add(
            pc.cast(pc.count_substring(text, "#"), pa.int64()),
            pc.cast(pc.count_substring_regex(text, r"\.\.\."), pa.int64()),
        )
        symbol_pm = pc.divide(pc.multiply(n_sym, 1000), nw_safe)
        n_lines = pc.add(pc.cast(pc.count_substring(text, "\n"), pa.int64()), 1)
        n_bullet = pc.cast(pc.count_substring_regex(text, r"(?m)^[-*•]"), pa.int64())
        bullet_pm = pc.divide(pc.multiply(n_bullet, 1000), n_lines)
        stop_hits = None
        for w in GOPHER_STOPS:
            hit = pc.cast(pc.match_substring_regex(text, rf"\b{w}\b"), pa.int64())
            stop_hits = hit if stop_hits is None else pc.add(stop_hits, hit)
        gopher = pc.and_(
            pc.and_(
                pc.and_(
                    pc.greater_equal(toks, GOPHER_MIN_WORDS),
                    pc.less_equal(toks, GOPHER_MAX_WORDS),
                ),
                pc.and_(
                    pc.greater_equal(wlen_pm, GOPHER_MIN_WLEN_PM),
                    pc.less_equal(wlen_pm, GOPHER_MAX_WLEN_PM),
                ),
            ),
            pc.and_(
                pc.and_(
                    pc.less_equal(symbol_pm, GOPHER_MAX_SYMBOL_PM),
                    pc.less_equal(bullet_pm, GOPHER_MAX_BULLET_PM),
                ),
                pc.greater_equal(stop_hits, GOPHER_MIN_STOP_HITS),
            ),
        ).to_numpy(zero_copy_only=False)

        mask = (
            np.where(c4, 0, FAIL_C4)
            + np.where(rep, FAIL_REPETITION, 0)
            + np.where(gopher, 0, FAIL_GOPHER)
        ).astype(np.int64)
        cols = {"doc_id": t["doc_id"]}
        for c in extra_cols:
            cols[c] = t[c]
        cols["fail_mask"] = pa.array(mask)
        cols["keep"] = pa.array((mask == 0).astype(np.int64))
        return pa.table(cols)

    return ds.map_batches(composite, batch_format="pyarrow").sort("doc_id")


DOC_QUALITY_COMPOSITE_SQL = f"""
WITH q AS (SELECT doc_id FROM ({QUALITY_FILTER_SQL})),
r AS (SELECT doc_id, repetitive FROM ({REPETITION_FILTER_SQL})),
g AS (SELECT doc_id, keep AS gkeep FROM ({GOPHER_RULES_SQL}))
SELECT d.doc_id,
       CAST((CASE WHEN q.doc_id IS NULL THEN {FAIL_C4} ELSE 0 END)
            + (CASE WHEN r.repetitive THEN {FAIL_REPETITION} ELSE 0 END)
            + (CASE WHEN g.gkeep = 0 THEN {FAIL_GOPHER} ELSE 0 END)
          AS BIGINT) AS fail_mask,
       CAST(CASE WHEN q.doc_id IS NOT NULL AND NOT r.repetitive
                  AND g.gkeep = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d
LEFT JOIN q ON q.doc_id = d.doc_id
JOIN r ON r.doc_id = d.doc_id
JOIN g ON g.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def doc_source_lm_gap(sf_dir: str):
    """Per-doc surprisal gap between the corpus LM and the doc's OWN
    source LM: gap_num = Σ_occurrences [(L(N) − L(c_w)) −
    (L(n_src) − L(m_src,w))] micro-nats — large positive gap means the
    doc reads like its source but not like the corpus (in-domain
    jargon); near zero means the source adds no information; this is
    the per-document allocation of source_lm_divergence's KL (summing
    gap_num over a source's docs reproduces its kl_num exactly —
    pinned in pytest).

    Scale shape: one (source, token) bucketed fold (bounded by
    sources × vocabulary) → a driver surprisal-gap table → one
    broadcast; per batch a composite source\\x00token key joins via
    index_in and a np.add.at segment-sum — same plan as
    doc_unigram_xent with a two-level key."""
    import math

    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def st_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = t["source"].take(parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"source": src, "token": flat}), ["source", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "token": g["token"],
                "m_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    st = bucketed_agg(
        ds.map_batches(st_partial, batch_format="pyarrow"),
        ["source", "token"],
        [("m_part", "sum", "m")],
    ).materialize()
    tab = pa.concat_tables(
        tb for tb in map(ray.get, st.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()

    ln_cache: dict[int, int] = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    srcs = tab["source"].to_pylist()
    toks = tab["token"].to_pylist()
    ms = tab["m"].to_pylist()
    c_of: dict[str, int] = {}
    n_of: dict[str, int] = {}
    for s, w, m in zip(srcs, toks, ms):
        c_of[w] = c_of.get(w, 0) + int(m)
        n_of[s] = n_of.get(s, 0) + int(m)
    n_total = sum(n_of.values())
    l_n = L(n_total) if n_total else 0
    keys = [f"{s}\x00{w}" for s, w in zip(srcs, toks)]
    gap = np.array(
        [
            (l_n - L(c_of[w])) - (L(n_of[s]) - L(int(m)))
            for s, w, m in zip(srcs, toks, ms)
        ],
        dtype=np.int64,
    )
    ref = state.broadcast((pa.array(keys, pa.string()), gap))

    def score(t: pa.Table) -> pa.Table:
        key_arr, gp = state.cached_get(ref)
        toks_b = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks_b)
        parent = pc.list_parent_indices(toks_b)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par_arr = parent.filter(keep)
        par = par_arr.to_numpy(zero_copy_only=False)
        ntok = np.zeros(t.num_rows, np.int64)
        num = np.zeros(t.num_rows, np.int64)
        if len(flat):
            comp = pc.binary_join_element_wise(
                t["source"].take(par_arr).combine_chunks(),
                flat.combine_chunks(),
                "\x00",
            )
            idx = pc.index_in(comp, value_set=key_arr).to_numpy(
                zero_copy_only=False
            )
            np.add.at(num, par, gp[idx])
            np.add.at(ntok, par, 1)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pa.array(ntok),
                "gap_num": pa.array(num),
            }
        )
        return out.filter(pa.array(ntok > 0))

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


DOC_SOURCE_LM_GAP_SQL = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, source, token FROM tok WHERE token <> ''),
m AS (SELECT source, token, CAST(count(*) AS BIGINT) AS m FROM tk GROUP BY 1, 2),
g AS (SELECT token, CAST(sum(m) AS BIGINT) AS c FROM m GROUP BY 1),
ns AS (SELECT source, CAST(sum(m) AS BIGINT) AS n FROM m GROUP BY 1),
nt AS (SELECT CAST(sum(m) AS BIGINT) AS nn FROM m)
SELECT tk.doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum((CAST(round(ln(nt.nn) * 1000000) AS BIGINT)
                 - CAST(round(ln(g.c) * 1000000) AS BIGINT))
                - (CAST(round(ln(ns.n) * 1000000) AS BIGINT)
                   - CAST(round(ln(m.m) * 1000000) AS BIGINT))) AS BIGINT)
         AS gap_num
FROM tk
JOIN m USING (source, token)
JOIN g USING (token)
JOIN ns USING (source)
CROSS JOIN nt
GROUP BY tk.doc_id
ORDER BY tk.doc_id
"""


# ---------------------------------------------------------------------------
# Token burstiness (Church–Gale variance-to-mean of per-doc counts)
# ---------------------------------------------------------------------------


def token_burstiness(sf_dir: str):
    """Per-token burstiness ingredients: corpus frequency tf, document
    frequency df, and the sum of squared per-doc counts — the
    variance-to-mean ratio over docs CONTAINING the token is the exact
    rational vmr_num/vmr_den with vmr_num = df·sum_cnt_sq − tf² and
    vmr_den = tf·df (Church & Gale: content words are bursty, function
    words are not; a dedup/boilerplate diagnostic).

    Scale shape: per-batch (doc, token) Arrow group_by pre-counts feed
    a token-keyed ``bucketed_agg`` of (tf, df, sum_cnt_sq) — shuffle
    bounded by per-batch distinct tokens, never token occurrences."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = parent.filter(keep)
        g = pa.TableGroupBy(
            pa.table({"d": par, "token": flat}), ["d", "token"]
        ).aggregate([([], "count_all")])
        c = pc.cast(g["count_all"], pa.int64())
        g2 = pa.TableGroupBy(
            pa.table(
                {
                    "token": g["token"],
                    "tf": c,
                    "df": pa.array(np.ones(len(c), np.int64)),
                    "sq": pc.multiply(c, c),
                }
            ),
            ["token"],
        ).aggregate([("tf", "sum"), ("df", "sum"), ("sq", "sum")])
        return pa.table(
            {
                "token": g2["token"],
                "tf_p": g2["tf_sum"],
                "df_p": g2["df_sum"],
                "sq_p": g2["sq_sum"],
            }
        )

    agg = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("tf_p", "sum", "tf"), ("df_p", "sum", "df"), ("sq_p", "sum", "sum_cnt_sq")],
    )

    def finish(t: pa.Table) -> pa.Table:
        tf = t["tf"].to_numpy(zero_copy_only=False)
        df = t["df"].to_numpy(zero_copy_only=False)
        sq = t["sum_cnt_sq"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "token": t["token"],
                "tf": t["tf"],
                "df": t["df"],
                "sum_cnt_sq": t["sum_cnt_sq"],
                "vmr_num": pa.array(df * sq - tf * tf),
                "vmr_den": pa.array(tf * df),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("token")


TOKEN_BURSTINESS_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
dc AS (
  SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c
  FROM tk GROUP BY 1, 2
)
SELECT token,
       CAST(sum(c) AS BIGINT) AS tf,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(c * c) AS BIGINT) AS sum_cnt_sq,
       CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS BIGINT) AS vmr_num,
       CAST(sum(c) * count(*) AS BIGINT) AS vmr_den
FROM dc GROUP BY token
ORDER BY token
"""


# ---------------------------------------------------------------------------
# Kneser-Ney continuation counts (smoothed-LM ingredients)
# ---------------------------------------------------------------------------

def kn_continuation_counts(sf_dir: str):
    """Kneser-Ney smoothing ingredients per token: corpus frequency
    ``tf``, continuation counts ``left_cont`` = |{v : (v,w) seen}| and
    ``right_cont`` = |{v : (w,v) seen}|, plus the global distinct-
    bigram count ``total_bigram_types`` — P_KN(w) is the consumer's
    float left_cont / total_bigram_types (Kneser & Ney 1995: unigram
    backoff should weight by context diversity, not raw frequency;
    "san francisco" makes "francisco" frequent but not diverse).

    Scale shape: one map_batches emits per-batch DISTINCT-pair partial
    counts (bigram rows plus sentinel prev='' rows carrying token
    frequencies — '' cannot collide, empty tokens are filtered), one
    pair-keyed ``bucketed_agg`` bounds the shuffle by per-batch
    distinct bigrams, and the vocab-bounded final folds on the driver
    (PERF step 32: every further exchange is ~1.5 s fixed cost)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        # token-frequency partial rows (prev = sentinel '')
        gt = pa.TableGroupBy(pa.table({"next": f}), ["next"]).aggregate(
            [([], "count_all")]
        )
        tf_rows = pa.table(
            {
                "prev": pa.array([""] * len(gt), pa.string()),
                "next": gt["next"],
                "n": pc.cast(gt["count_all"], pa.int64()),
            }
        )
        # bigram partial rows (consecutive tokens within one doc)
        fa = f.to_numpy(zero_copy_only=False)
        if len(fa) >= 2:
            same = par[1:] == par[:-1]
            gb = pa.TableGroupBy(
                pa.table(
                    {
                        "prev": pa.array(fa[:-1][same], pa.string()),
                        "next": pa.array(fa[1:][same], pa.string()),
                    }
                ),
                ["prev", "next"],
            ).aggregate([([], "count_all")])
            bg_rows = pa.table(
                {
                    "prev": gb["prev"],
                    "next": gb["next"],
                    "n": pc.cast(gb["count_all"], pa.int64()),
                }
            )
            return pa.concat_tables([tf_rows, bg_rows])
        return tf_rows

    pairs = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["prev", "next"],
        [("n", "sum", "n")],
    ).take_all()  # vocab-bounded: <= |V|^2 + |V| rows

    tf: dict[str, int] = {}
    left: dict[str, set] = {}
    right: dict[str, set] = {}
    total_bg = 0
    for r in pairs:
        p, nx = r["prev"], r["next"]
        if p == "":
            tf[nx] = tf.get(nx, 0) + int(r["n"])
        else:
            total_bg += 1
            left.setdefault(nx, set()).add(p)
            right.setdefault(p, set()).add(nx)
    toks = sorted(tf)
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "tf": pa.array([tf[w] for w in toks], pa.int64()),
            "left_cont": pa.array([len(left.get(w, ())) for w in toks], pa.int64()),
            "right_cont": pa.array([len(right.get(w, ())) for w in toks], pa.int64()),
            "total_bigram_types": pa.array([total_bg] * len(toks), pa.int64()),
        }
    )


KN_CONTINUATION_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split_regex(lower(text), '{_DF_SPLIT_RE}') AS ws
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS p FROM raw
),
tok AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM tokpos WHERE token <> ''
),
bg AS (
  SELECT lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         token AS next
  FROM tok
),
pairs AS (SELECT prev, next FROM bg WHERE prev IS NOT NULL GROUP BY 1, 2),
tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token),
lc AS (SELECT next AS token, CAST(count(*) AS BIGINT) AS left_cont
       FROM pairs GROUP BY 1),
rc AS (SELECT prev AS token, CAST(count(*) AS BIGINT) AS right_cont
       FROM pairs GROUP BY 1),
total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM pairs)
SELECT tf.token, tf.tf,
       CAST(coalesce(lc.left_cont, 0) AS BIGINT) AS left_cont,
       CAST(coalesce(rc.right_cont, 0) AS BIGINT) AS right_cont,
       (SELECT t FROM total) AS total_bigram_types
FROM tf LEFT JOIN lc USING (token) LEFT JOIN rc USING (token)
ORDER BY tf.token
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (full selection, Schleimer/Wilkerson/Aiken 2003)
# ---------------------------------------------------------------------------

def _winnowing_fp_ds(sf_dir: str, window: int = 8, guard: int = 4):
    """Full winnowing selection over the SAME Rabin-Karp word-window
    hashes as ``rolling_fingerprint`` (base 1000003 mod 2^63, crc32
    words, non-lowered split()): every guarantee window of ``guard``
    consecutive window-hashes contributes its minimal hash, ties
    broken RIGHTMOST (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    guarantees any match of ``window + guard - 1`` words shares a
    selected fingerprint, the standard local-similarity index MOSS
    builds on).  Emits DISTINCT (doc_id, pos, fp) selected pairs.

    Scale shape: entirely in-row — one pass, no shuffle; the per-doc
    kernel is numpy end-to-end (crc vector, ``guard``-term rolling
    combination, sliding_window_view argmin on the reversed axis for
    rightmost ties).  Docs with fewer than ``guard`` window-hashes
    select from one window spanning all of them."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    mask63 = np.uint64((1 << 63) - 1)

    def per_batch(t: pa.Table) -> pa.Table:
        pw_cache: dict[int, np.ndarray] = {}
        doc_ids: list[int] = []
        poss: list[int] = []
        fps: list[int] = []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = (s or "").split()
            n = len(words)
            if n == 0:
                continue
            crc = np.fromiter(
                (zlib.crc32(w.encode("utf-8")) for w in words),
                dtype=np.uint64,
                count=n,
            )
            length = window if n >= window else n
            pws = pw_cache.get(length)
            if pws is None:
                pws = np.array(
                    [pow(1000003, length - 1 - j, 1 << 63) for j in range(length)],
                    dtype=np.uint64,
                )
                pw_cache[length] = pws
            nwin = n - length + 1
            h = np.zeros(nwin, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(length):
                    h += crc[j : j + nwin] * pws[j]
            h &= mask63  # mod 2^64 wraparound preserves the mod-2^63 residue
            if nwin <= guard:
                sel = np.array([(nwin - 1) - int(np.argmin(h[::-1]))])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, guard)
                idx = (guard - 1) - np.argmin(sw[:, ::-1], axis=1)
                sel = np.unique(np.arange(nwin - guard + 1) + idx)
            doc_ids.extend([did] * len(sel))
            poss.extend((sel + 1).tolist())
            fps.extend(h[sel].astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "pos": pa.array(poss, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")


def winnowing_fingerprints(sf_dir: str, window: int = 8, guard: int = 4):
    """Sorted public surface of the winnowing selection (kernel and
    provenance in ``_winnowing_fp_ds``'s docstring); compositions that
    re-key by fp (winnowing_overlap_pairs) use the unsorted kernel
    directly — the (doc_id, pos) sort is presentation, not semantics."""
    return _winnowing_fp_ds(sf_dir, window, guard).sort(["doc_id", "pos"])


# ---------------------------------------------------------------------------
# Simpson diversity (exact integer rationals)
# ---------------------------------------------------------------------------

def doc_simpson_diversity(sf_dir: str):
    """Per-doc Simpson repeat index as EXACT integer rationals: the
    probability two tokens drawn without replacement are equal is
    rep_num/rep_den with rep_num = sum c_i*(c_i-1) over token counts
    and rep_den = N*(N-1) — the lexical-diversity complement (1 - D)
    used alongside TTR/hapax for quality filtering, float-free so the
    oracle compares bit-exact.

    Scale shape: entirely in-row — one zero-copy pyarrow pass
    (split_pattern_regex -> list_flatten/parent_indices -> one
    (row, token) TableGroupBy per batch), partials scattered back by
    parent index with np.add.at; no shuffle, output = one row per doc."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def agg(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep)
        par = parent.filter(keep)
        g = pa.TableGroupBy(
            pa.table({"p": par, "tok": f}), ["p", "tok"]
        ).aggregate([([], "count_all")])
        c = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        p_idx = g["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_arr = np.zeros(len(t), dtype=np.int64)
        rep_arr = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_arr, p_idx, c)
        np.add.at(rep_arr, p_idx, c * (c - 1))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_arr),
                "rep_num": pa.array(rep_arr),
                "rep_den": pa.array(n_arr * (n_arr - 1)),
            }
        )

    return ds.map_batches(agg, batch_format="pyarrow").sort("doc_id")


DOC_SIMPSON_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split_regex(lower(text), '{_DF_SPLIT_RE}') AS ws
  FROM documents
),
tok AS (SELECT doc_id, unnest(ws) AS tkn FROM raw),
tc AS (SELECT doc_id, tkn, count(*) AS c FROM tok WHERE tkn <> '' GROUP BY 1, 2),
agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(sum(c * (c - 1)) AS BIGINT) AS rep_num
  FROM tc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.rep_num, 0) AS BIGINT) AS rep_num,
       CAST(coalesce(a.n_tokens * (a.n_tokens - 1), 0) AS BIGINT) AS rep_den
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Successor (branching) entropy per token
# ---------------------------------------------------------------------------

def token_context_entropy(sf_dir: str):
    """Right-context branching entropy per token: over the corpus
    bigram distribution, H(next | prev=w) shipped as the exact integer
    numerator ent_num = Σ_c c·(L(n_w) − L(c)) with L(v) =
    round(ln(v)·1e6) (the user_event_entropy identity) — low-entropy
    tokens glue multi-word terms together (the unithood signal in
    term-extraction); high-entropy tokens end phrases.

    Scale shape: per-batch (prev, next) count partials (consecutive
    tokens within one doc) through ONE pair-keyed ``bucketed_agg``;
    the final fold is vocab²-bounded and runs on the driver (PERF 32)
    with ln values memoized per distinct count."""
    import math

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        fa = f.to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "prev": pa.array([], pa.string()),
                "next": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(fa) < 2:
            return empty
        same = par[1:] == par[:-1]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "prev": pa.array(fa[:-1][same], pa.string()),
                    "next": pa.array(fa[1:][same], pa.string()),
                }
            ),
            ["prev", "next"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev": g["prev"],
                "next": g["next"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    pairs = bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["prev", "next"],
        [("n", "sum", "n")],
    ).take_all()

    agg: dict[str, dict[str, int]] = {}
    for r in pairs:
        agg.setdefault(r["prev"], {})[r["next"]] = int(r["n"])
    lmemo: dict[int, int] = {}

    def L(v: int) -> int:
        out = lmemo.get(v)
        if out is None:
            out = lmemo[v] = int(math.floor(math.log(v) * 1_000_000 + 0.5))
        return out

    toks = sorted(agg)
    n_next, n_dist, ent = [], [], []
    for w in toks:
        cs = agg[w]
        n = sum(cs.values())
        n_next.append(n)
        n_dist.append(len(cs))
        ln_n = L(n)
        ent.append(sum(c * (ln_n - L(c)) for c in cs.values()))
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "n_next": pa.array(n_next, pa.int64()),
            "n_distinct_next": pa.array(n_dist, pa.int64()),
            "ent_num": pa.array(ent, pa.int64()),
        }
    )


TOKEN_CONTEXT_ENTROPY_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split_regex(lower(text), '{_DF_SPLIT_RE}') AS ws
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS p FROM raw
),
tok AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM tokpos WHERE token <> ''
),
bg AS (
  SELECT lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         token AS next
  FROM tok
),
cnt AS (
  SELECT prev, next, CAST(count(*) AS BIGINT) AS c
  FROM bg WHERE prev IS NOT NULL GROUP BY 1, 2
),
tot AS (
  SELECT prev, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d
  FROM cnt GROUP BY 1
)
SELECT t.prev AS token, t.n AS n_next, t.d AS n_distinct_next,
       CAST(sum(c * (CAST(round(ln(t.n) * 1000000) AS BIGINT)
                     - CAST(round(ln(c) * 1000000) AS BIGINT))) AS BIGINT)
         AS ent_num
FROM cnt JOIN tot t USING (prev)
GROUP BY 1, 2, 3
ORDER BY token
"""


# ---------------------------------------------------------------------------
# Positional phrase search (exact adjacent-token phrase match)
# ---------------------------------------------------------------------------

PHRASE_TERMS = ("stream", "column")


def phrase_search(sf_dir: str, phrase=PHRASE_TERMS):
    """Exact-phrase retrieval: docs containing the two query tokens
    ADJACENT (in order), with per-doc occurrence counts — the
    positional-index counterpart of search_topk's bag-of-words
    scoring.  One tokenization per batch; adjacency is a numpy compare
    of consecutive parent indices (pairs never straddle docs), and the
    per-doc count is one np.add.at scatter.  Matching docs only leave
    the batch, so the shuffle carries hits, not the corpus; no
    positional postings are ever materialized (at index-build scale a
    positional index would be the persisted form — this is the
    scan-side exact evaluator)."""
    t1, t2 = phrase
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def hits(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        n = np.zeros(t.num_rows, dtype=np.int64)
        if len(f) >= 2:
            a = pc.equal(f.slice(0, len(f) - 1), t1).to_numpy(zero_copy_only=False)
            b = pc.equal(f.slice(1), t2).to_numpy(zero_copy_only=False)
            hit = a & b & (p[1:] == p[:-1])
            np.add.at(n, p[:-1][hit], 1)
        return pa.table(
            {"doc_id": t["doc_id"], "n_phrase": pa.array(n, pa.int64())}
        ).filter(pc.greater(pa.array(n), 0))

    return ds.map_batches(hits, batch_format="pyarrow").sort("doc_id")


PHRASE_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT doc_id, lst[g.i] AS w1, lst[g.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_phrase
FROM grams
WHERE w1 = '{PHRASE_TERMS[0]}' AND w2 = '{PHRASE_TERMS[1]}'
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of the tf-idf and BM25 rankings
# ---------------------------------------------------------------------------

RRF_K = 60  # Cormack, Clarke & Buettcher 2009 constant


def rrf_fusion(sf_dir: str, k: int = SEARCH_TOP_K):
    """Reciprocal-rank fusion of the search_topk (tf-idf) and
    bm25_topk rankings for the fixed query: per retrieved doc,
    rrf_micro = sum over lists of 1e6 // (60 + rank) — the standard
    score-free ensembling of heterogeneous retrieval runs, in exact
    integer micro units.  Absent-from-a-list is rank 0 in the output
    (contributes nothing).

    Scale shape: both input rankings are top-k (each already reduces
    to <= k rows per block before their final k-row sort), so the
    fusion itself touches 2k rows on the driver — the expensive part
    is the two scoring passes, which share the corpus scan shape and
    at production scale would run off the same persisted index."""
    import ray as _ray

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    terms = SEARCH_TERMS
    term_set = set(terms)

    # ONE fused stats pass: per-term df partials + the two corpus
    # sentinels (doc count, token count) — bm25_topk's stats shape;
    # the tf-idf ranking reads the same df column (PERF step 36: the
    # previous composition ran FOUR corpus scans, two per ranking).
    def stats_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.and_(
            pc.not_equal(flat, ""),
            pc.is_in(flat, value_set=pa.array(list(term_set))),
        )
        pairs = pa.table({"d": parent, "token": flat}).filter(keep)
        distinct = pa.TableGroupBy(pairs, ["d", "token"]).aggregate([])
        per_tok = pa.TableGroupBy(distinct, ["token"]).aggregate([("d", "count")])
        part = pa.table(
            {
                "token": per_tok["token"],
                "df_part": pc.cast(per_tok["d_count"], pa.int64()),
            }
        )
        n_toks = int(pc.sum(pc.cast(pc.not_equal(flat, ""), pa.int64())).as_py() or 0)
        extra = pa.table(
            {
                "token": pa.array([_BM25_DOCS_KEY, _BM25_TOKS_KEY], pa.string()),
                "df_part": pa.array([t.num_rows, n_toks], pa.int64()),
            }
        )
        return pa.concat_tables([part, extra])

    # partials are <= |terms|+2 rows per batch: fold on the driver
    # instead of paying the ~1.5 s fixed Ray aggregate exchange
    # (PERF step 32 rule)
    stats: dict = {}
    for tb in map(
        _ray.get,
        ds.map_batches(stats_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for tok, n in zip(tb["token"].to_pylist(), tb["df_part"].to_pylist()):
            stats[tok] = stats.get(tok, 0) + int(n)
    n_docs = int(stats.pop(_BM25_DOCS_KEY, 0))
    n_toks = int(stats.pop(_BM25_TOKS_KEY, 0))
    avg = n_toks // max(n_docs, 1)

    # ONE scoring pass computing BOTH metrics; each batch emits the
    # union of its two local top-k row sets, so <= 2k rows per block.
    def score_both(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep_np = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dl = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(dl, parent[keep_np], 1)
        tot_tfidf = np.zeros(t.num_rows, dtype=np.int64)
        tot_bm = np.zeros(t.num_rows, dtype=np.int64)
        for term in terms:
            dfv = int(stats.get(term, 0))
            if not dfv:
                continue
            tf = np.zeros(t.num_rows, dtype=np.int64)
            hits = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            np.add.at(tf, parent[hits], 1)
            tot_tfidf += tf * TFIDF_SCALE // dfv
            num = BM25_SCALE * 22 * avg * (n_docs - dfv + 1) * tf
            den = (dfv + 1) * (10 * avg * tf + 3 * avg + 9 * dl)
            tot_bm += num // np.maximum(den, 1)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "score": pa.array(tot_tfidf, pa.int64()),
                "score_micro": pa.array(tot_bm, pa.int64()),
            }
        )
        top_a = (
            out.filter(pc.greater(out["score"], 0))
            .sort_by([("score", "descending"), ("doc_id", "ascending")])
            .slice(0, k)
        )
        top_b = (
            out.filter(pc.greater(out["score_micro"], 0))
            .sort_by([("score_micro", "descending"), ("doc_id", "ascending")])
            .slice(0, k)
        )
        both = pa.concat_tables([top_a, top_b])
        g = pa.TableGroupBy(both, ["doc_id"]).aggregate(
            [("score", "max"), ("score_micro", "max")]
        )
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "score": g["score_max"],
                "score_micro": g["score_micro_max"],
            }
        )

    cand = [
        r
        for tb in map(
            _ray.get,
            ds.map_batches(score_both, batch_format="pyarrow").to_arrow_refs(),
        )
        if tb.num_rows
        for r in tb.to_pylist()
    ]
    lists = []
    for key in ("score", "score_micro"):
        ranked = sorted(
            (r for r in cand if r[key] > 0), key=lambda r: (-r[key], r["doc_id"])
        )[:k]
        lists.append({r["doc_id"]: i + 1 for i, r in enumerate(ranked)})
    docs = sorted(set(lists[0]) | set(lists[1]))
    rrf = [
        sum(1_000_000 // (RRF_K + l[d]) for l in lists if d in l) for d in docs
    ]
    out = pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "rrf_micro": pa.array(rrf, pa.int64()),
            "rank_tfidf": pa.array([lists[0].get(d, 0) for d in docs], pa.int64()),
            "rank_bm25": pa.array([lists[1].get(d, 0) for d in docs], pa.int64()),
        }
    )
    return out.sort_by([("rrf_micro", "descending"), ("doc_id", "ascending")])


def _rrf_sql() -> str:
    return f"""
WITH tfidf AS ({_search_sql()}),
bm AS ({_bm25_sql()}),
r1 AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
       FROM tfidf),
r2 AS (SELECT doc_id, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r
       FROM bm),
u AS (
  SELECT doc_id, 1000000 // ({RRF_K} + r) AS c, r AS ra, 0 AS rb FROM r1
  UNION ALL
  SELECT doc_id, 1000000 // ({RRF_K} + r), 0, r FROM r2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS rrf_micro,
       CAST(max(ra) AS BIGINT) AS rank_tfidf,
       CAST(max(rb) AS BIGINT) AS rank_bm25
FROM u GROUP BY doc_id
ORDER BY rrf_micro DESC, doc_id
"""


RRF_FUSION_SQL = _rrf_sql()


# ---------------------------------------------------------------------------
# Range-partition planner audit (sort/exchange infrastructure)
# ---------------------------------------------------------------------------

RANGE_PARTS = 8


def range_partition_plan(sf_dir: str, n_parts: int = RANGE_PARTS):
    """The boundary-planning step of a range partitioner (what a
    distributed sort computes before the exchange), audited exactly:
    split the corpus into ``n_parts`` equal-count partitions by
    (n_tokens, doc_id) order and report each partition's row count and
    key range — ntile semantics (first N%P partitions take the extra
    row).

    Scale shape: the plan needs only the KEY HISTOGRAM, never the
    sorted data — per-batch (n_tokens -> count) partials fold on the
    driver (bounded by distinct key values, the same cardinality a
    sort's sample-based planner assumes), and every boundary is read
    off the cumulative histogram with searchsorted.  This is how a
    planner avoids pre-sorting 10^12 rows to choose split points;
    doc_id tie-breaks never move a boundary's KEY, so min/max per
    partition are exact without them."""
    ds = _read_docs(sf_dir, ["text"])

    def hist(t: pa.Table) -> pa.Table:
        toks = pc.count_substring_regex(t["text"], _TOKEN_RE)
        g = pa.TableGroupBy(
            pa.table({"k": pc.cast(toks, pa.int64())}), ["k"]
        ).aggregate([([], "count_all")])
        return pa.table({"k": g["k"], "c": pc.cast(g["count_all"], pa.int64())})

    agg: dict[int, int] = {}
    for tb in map(
        ray.get, ds.map_batches(hist, batch_format="pyarrow").to_arrow_refs()
    ):
        for k, c in zip(tb["k"].to_pylist(), tb["c"].to_pylist()):
            agg[int(k)] = agg.get(int(k), 0) + int(c)
    ks = np.array(sorted(agg), dtype=np.int64)
    cum = np.cumsum(np.array([agg[int(k)] for k in ks], dtype=np.int64))
    n = int(cum[-1]) if len(cum) else 0
    base, rem = divmod(n, n_parts)
    sizes = [base + 1] * rem + [base] * (n_parts - rem)
    parts, counts, mins, maxs = [], [], [], []
    start = 0
    for p, sz in enumerate(sizes, 1):
        if sz == 0:
            continue
        lo_rank, hi_rank = start + 1, start + sz
        mins.append(int(ks[np.searchsorted(cum, lo_rank)]))
        maxs.append(int(ks[np.searchsorted(cum, hi_rank)]))
        parts.append(p)
        counts.append(sz)
        start += sz
    return pa.table(
        {
            "part": pa.array(parts, pa.int64()),
            "n_rows": pa.array(counts, pa.int64()),
            "min_tokens": pa.array(mins, pa.int64()),
            "max_tokens": pa.array(maxs, pa.int64()),
        }
    )


RANGE_PARTITION_PLAN_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS k
  FROM documents
),
t AS (
  SELECT doc_id, k, ntile({RANGE_PARTS}) OVER (ORDER BY k, doc_id) AS part
  FROM tok
)
SELECT CAST(part AS BIGINT) AS part,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(k) AS BIGINT) AS min_tokens,
       CAST(max(k) AS BIGINT) AS max_tokens
FROM t GROUP BY part ORDER BY part
"""


# ---------------------------------------------------------------------------
# Winnowing fingerprint overlap pairs (MOSS-style local similarity)
# ---------------------------------------------------------------------------

def winnowing_overlap_pairs(sf_dir: str, window: int = 8, guard: int = 4):
    """Document pairs sharing winnowed fingerprints, with the shared
    DISTINCT-fingerprint count per pair — the MOSS matching step on
    top of ``winnowing_fingerprints``'s index (Schleimer et al. 2003:
    any common run of window+guard-1 words guarantees a shared
    selected fingerprint, so this catches local plagiarism/quotation
    that whole-doc MinHash dilutes away).

    Scale shape: selection is in-row; the exchange ships DISTINCT
    (fp, doc_id) pairs — a 1/guard-sized subsample of the window
    hashes by construction — through one bucketed distinct, pair
    expansion only inside >=2-doc fingerprint groups
    (bucketed_bucket_pairs: mostly-singleton buckets never invoke
    Python), and a bucketed pair-count sum.  A production corpus adds
    the MAX_BUCKET cap on pathological boilerplate fingerprints, as
    the LSH family does."""
    from document_extractor_ray.functions import bucketing

    fp = _winnowing_fp_ds(sf_dir, window=window, guard=guard)
    distinct = bucketing.bucketed_agg(
        fp.map_batches(
            lambda t: pa.table(
                {
                    "fp": t["fp"],
                    "doc_id": t["doc_id"],
                    "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["fp", "doc_id"],
        [("one", "max", "one")],
    )

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        d = np.sort(g["doc_id"].to_numpy(zero_copy_only=False))
        ii, jj = np.triu_indices(len(d), k=1)
        return pa.table(
            {
                "doc_a": pa.array(d[ii], pa.int64()),
                "doc_b": pa.array(d[jj], pa.int64()),
                "n": pa.array(np.ones(len(ii), np.int64), pa.int64()),
            }
        )

    pairs = bucketing.bucketed_bucket_pairs(distinct, ["fp"], bucket_pairs, empty)
    return bucketing.bucketed_agg(
        pairs, ["doc_a", "doc_b"], [("n", "sum", "n_shared")]
    ).sort(["doc_a", "doc_b"])


# ---------------------------------------------------------------------------
# word2vec negative-sampling table (unigram^0.75)
# ---------------------------------------------------------------------------

NEGSAMPLE_POW_NUM = 3  # alpha = 3/4 (Mikolov et al. 2013)
NEGSAMPLE_POW_DEN = 4


def negsample_table(sf_dir: str):
    """The word2vec negative-sampling distribution: per-token weight
    n^0.75 in integer micro units (exp(0.75*ln n), round-half-up — the
    libm-identity the entropy family proved), plus the cumulative
    weight in token order, i.e. the alias-free sampling table a
    skip-gram trainer binary-searches into.

    Scale shape: unigram counts ride the bucketed aggregate (key-per-
    row rule), the fold and the pow/cumsum are vocabulary-bounded on
    the driver, and the emitted table IS the broadcast artifact a
    trainer ships to every worker."""
    from document_extractor_ray.functions import bucketing

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    cnt = bucketing.bucketed_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        [("n", "sum", "n")],
    )
    agg: dict[str, int] = {}
    for tb in map(ray.get, cnt.to_arrow_refs()):
        if not tb.num_rows:  # hash aggregates emit empty-schema blocks
            continue
        for tok, n in zip(tb["token"].to_pylist(), tb["n"].to_pylist()):
            agg[tok] = agg.get(tok, 0) + int(n)
    toks = sorted(agg)
    ws = [
        int(
            math.floor(
                math.exp(
                    (NEGSAMPLE_POW_NUM / NEGSAMPLE_POW_DEN) * math.log(agg[t])
                )
                * 1_000_000
                + 0.5
            )
        )
        for t in toks
    ]
    cum = np.cumsum(np.array(ws, dtype=np.int64))
    return pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "n": pa.array([agg[t] for t in toks], pa.int64()),
            "w_micro": pa.array(ws, pa.int64()),
            "cum_w": pa.array(cum, pa.int64()),
        }
    )


NEGSAMPLE_TABLE_SQL = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM tok WHERE token <> '' GROUP BY token
),
w AS (
  SELECT token, n,
         CAST(round(exp(0.75 * ln(n)) * 1000000) AS BIGINT) AS w_micro
  FROM cnt
)
SELECT token, n, w_micro,
       CAST(sum(w_micro) OVER (ORDER BY token
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
FROM w ORDER BY token
"""


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram probabilities (exact integer rationals)
# ---------------------------------------------------------------------------

KN_DISCOUNT_NUM = 3  # d = 3/4 (Chen & Goodman 1999 canonical fixed discount)
KN_DISCOUNT_DEN = 4


def kn_bigram_probs(sf_dir: str):
    """Full interpolated Kneser-Ney bigram model over the corpus, in
    EXACT integer micro units: with discount d = 3/4,

      P(w2|w1) = max(c12 - d, 0)/c1 + (d*T1/c1) * (L2/B)

    (c1 = bigram tokens starting with w1, T1 = distinct continuations
    of w1, L2 = distinct left-contexts of w2, B = total bigram types)
    computed as one integer rational per bigram —
    prob_micro = 1e6*(max(4*c12-3,0)*B + 3*T1*L2) // (4*c1*B) — so the
    model sums to 1 per context up to floor slack and the oracle
    reproduces every bit (HUGEINT-safe on the SQL side).  This is the
    estimation step ON TOP of kn_continuation_counts' ingredients, the
    standard n-gram LM a perplexity filter scores against.

    Scale shape: bigram counts ride the pair-keyed bucketed aggregate
    (bounded by per-batch distinct bigrams), the fold is vocab^2-
    bounded on the driver (PERF step 32), and everything downstream of
    c12 is arithmetic — at a 10^9-type web vocabulary the fold becomes
    two more bucketed aggregates (per-prev and per-next) plus a join,
    with identical integer semantics."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        fa = f.to_numpy(zero_copy_only=False)
        if len(fa) < 2:
            return pa.table(
                {
                    "prev": pa.array([], pa.string()),
                    "next": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = par[1:] == par[:-1]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "prev": pa.array(fa[:-1][same], pa.string()),
                    "next": pa.array(fa[1:][same], pa.string()),
                }
            ),
            ["prev", "next"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {"prev": g["prev"], "next": g["next"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    c12: dict[tuple, int] = {}
    for tb in map(
        ray.get,
        bucketed_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["prev", "next"],
            [("n", "sum", "n")],
        ).to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for p, nx, n in zip(
            tb["prev"].to_pylist(), tb["next"].to_pylist(), tb["n"].to_pylist()
        ):
            c12[(p, nx)] = c12.get((p, nx), 0) + int(n)
    c1: dict[str, int] = {}
    t1: dict[str, int] = {}
    l2: dict[str, int] = {}
    for (p, nx), n in c12.items():
        c1[p] = c1.get(p, 0) + n
        t1[p] = t1.get(p, 0) + 1
        l2[nx] = l2.get(nx, 0) + 1
    B = len(c12)
    keys = sorted(c12)
    dn, dd = KN_DISCOUNT_NUM, KN_DISCOUNT_DEN
    probs = [
        (
            1_000_000
            * (max(dd * c12[k] - dn, 0) * B + dn * t1[k[0]] * l2[k[1]])
        )
        // (dd * c1[k[0]] * B)
        for k in keys
    ]
    return pa.table(
        {
            "prev": pa.array([k[0] for k in keys], pa.string()),
            "next": pa.array([k[1] for k in keys], pa.string()),
            "c12": pa.array([c12[k] for k in keys], pa.int64()),
            "prob_micro": pa.array(probs, pa.int64()),
        }
    )


KN_BIGRAM_PROBS_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split_regex(lower(text), '{_DF_SPLIT_RE}') AS ws
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS p FROM raw
),
tok AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM tokpos WHERE token <> ''
),
bg AS (
  SELECT lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         token AS next
  FROM tok
),
cc AS (
  SELECT prev, next, CAST(count(*) AS BIGINT) AS c12
  FROM bg WHERE prev IS NOT NULL GROUP BY 1, 2
),
cx AS (SELECT prev, CAST(sum(c12) AS BIGINT) AS c1,
              CAST(count(*) AS BIGINT) AS t1
       FROM cc GROUP BY prev),
lx AS (SELECT next, CAST(count(*) AS BIGINT) AS l2 FROM cc GROUP BY next),
b AS (SELECT CAST(count(*) AS BIGINT) AS b FROM cc)
SELECT cc.prev, cc.next, cc.c12,
       CAST((1000000::HUGEINT
             * (greatest({KN_DISCOUNT_DEN} * cc.c12 - {KN_DISCOUNT_NUM}, 0)::HUGEINT
                  * (SELECT b FROM b)
                + {KN_DISCOUNT_NUM}::HUGEINT * cx.t1 * lx.l2))
            // ({KN_DISCOUNT_DEN}::HUGEINT * cx.c1 * (SELECT b FROM b))
            AS BIGINT) AS prob_micro
FROM cc JOIN cx USING (prev) JOIN lx USING (next)
ORDER BY cc.prev, cc.next
"""


# ---------------------------------------------------------------------------
# Hill tail-index estimator (heavy-tail audit of doc lengths)
# ---------------------------------------------------------------------------

HILL_K = 64


def hill_tail_index(sf_dir: str, k: int = HILL_K):
    """Hill estimator of the doc-length tail exponent (Hill 1975):
    over the k largest n_chars values with the (k+1)-th as threshold,
    hill_micro = (sum_{i<=k} ln_micro(x_i)) // k - ln_micro(x_{k+1})
    and alpha_milli = 1e9 // hill_micro — the heavy-tail audit that
    justifies size-bucketed repartitioning (a small alpha means giant
    docs dominate a partition's bytes; complements zipf_slope, which
    fits token frequencies).  All in the proven ln-micro integer
    convention, so the oracle is bit-exact.

    Scale shape: per-batch local top-(k+1) partials (k+1 rows leave
    each block), one driver merge; only VALUES are needed, so ties at
    the threshold cannot change the result."""
    ds = _read_docs(sf_dir, ["n_chars"])

    def topk(t: pa.Table) -> pa.Table:
        x = t["n_chars"]
        return pa.table({"x": x}).sort_by([("x", "descending")]).slice(0, k + 1)

    vals: list[int] = []
    for tb in map(
        ray.get, ds.map_batches(topk, batch_format="pyarrow").to_arrow_refs()
    ):
        if tb.num_rows:
            vals.extend(tb["x"].to_pylist())
    vals.sort(reverse=True)
    top = vals[: k + 1]
    lnm = [int(math.floor(math.log(v) * 1_000_000 + 0.5)) for v in top]
    hill = sum(lnm[:k]) // k - lnm[k]
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "x_threshold": pa.array([top[k]], pa.int64()),
            "hill_micro": pa.array([hill], pa.int64()),
            "alpha_milli": pa.array(
                [1_000_000_000 // hill if hill > 0 else 0], pa.int64()
            ),
        }
    )


HILL_TAIL_INDEX_SQL = f"""
WITH top AS (
  SELECT CAST(n_chars AS BIGINT) AS x FROM documents
  ORDER BY n_chars DESC LIMIT {HILL_K + 1}
),
r AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn FROM top),
l AS (SELECT rn, x, CAST(round(ln(x) * 1000000) AS BIGINT) AS lnm FROM r),
h AS (
  SELECT ((SELECT sum(lnm) FROM l WHERE rn <= {HILL_K}) // {HILL_K})
         - (SELECT lnm FROM l WHERE rn = {HILL_K + 1}) AS hill
)
SELECT CAST({HILL_K} AS BIGINT) AS k,
       (SELECT x FROM l WHERE rn = {HILL_K + 1}) AS x_threshold,
       CAST(hill AS BIGINT) AS hill_micro,
       CAST(CASE WHEN hill > 0 THEN 1000000000 // hill ELSE 0 END AS BIGINT)
         AS alpha_milli
FROM h
"""


# ---------------------------------------------------------------------------
# Per-language char-trigram profile (the langid training artifact)
# ---------------------------------------------------------------------------

TRIGRAM_PROFILE_K = 10


def char_trigram_lang_profile(sf_dir: str, k: int = TRIGRAM_PROFILE_K):
    """Top-k character trigrams per language with exact counts — the
    profile table an n-gram language identifier trains on (Cavnar &
    Trenkle 1994), built the scale-safe way: trigram extraction is
    pure numpy over the Arrow string buffer (a 3-byte integer code per
    position, doc boundaries masked by a repeat-built doc index — no
    per-row Python, no substring materialization), per-batch partial
    counts bound the shuffle by distinct (lang, trigram) <= |langs| x
    alphabet^3, and the per-lang top-k folds from the bucketed
    aggregate.  ASCII corpus assumption is explicit: byte trigrams ==
    char trigrams here (a UTF-8 corpus would shingle codepoints).
    """
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        arr = pc.utf8_lower(t["text"]).combine_chunks()
        n = len(arr)
        if n == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "tri": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        dat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        off = off - off[0]
        if len(dat) < 3:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "tri": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        lens = np.diff(off)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        d = dat.astype(np.int64)
        tri = d[:-2] * 65536 + d[1:-1] * 256 + d[2:]
        valid = doc_idx[:-2] == doc_idx[2:]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "lang": pa.array(
                        np.asarray(t["lang"].combine_chunks().take(
                            pa.array(doc_idx[:-2][valid])
                        )),
                        pa.string(),
                    ),
                    "tri": pa.array(tri[valid], pa.int64()),
                }
            ),
            ["lang", "tri"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "tri": g["tri"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    agg: dict[tuple, int] = {}
    for tb in map(
        ray.get,
        bucketed_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["lang", "tri"],
            [("n", "sum", "n")],
        ).to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for lg, tr, n in zip(
            tb["lang"].to_pylist(), tb["tri"].to_pylist(), tb["n"].to_pylist()
        ):
            agg[(lg, int(tr))] = agg.get((lg, int(tr)), 0) + int(n)
    by_lang: dict[str, list] = {}
    for (lg, tr), n in agg.items():
        s = bytes([tr >> 16, (tr >> 8) & 255, tr & 255]).decode("ascii")
        by_lang.setdefault(lg, []).append((n, s))
    out_l, out_t, out_n = [], [], []
    for lg in sorted(by_lang):
        top = sorted(by_lang[lg], key=lambda x: (-x[0], x[1]))[:k]
        for n, s in top:
            out_l.append(lg)
            out_t.append(s)
            out_n.append(n)
    return pa.table(
        {
            "lang": pa.array(out_l, pa.string()),
            "trigram": pa.array(out_t, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        }
    )


CHAR_TRIGRAM_PROFILE_SQL = f"""
WITH t3 AS (
  SELECT lang, substr(lower(text), CAST(g.i AS INTEGER), 3) AS tri
  FROM documents,
       LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i) g
),
cnt AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS n
        FROM t3 GROUP BY 1, 2),
rk AS (
  SELECT lang, tri, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, tri) AS rn
  FROM cnt
)
SELECT lang, tri AS trigram, n FROM rk WHERE rn <= {TRIGRAM_PROFILE_K}
ORDER BY lang, n DESC, trigram
"""


# ---------------------------------------------------------------------------
# BPE application: tokenize the corpus with the learned merges
# ---------------------------------------------------------------------------

def bpe_apply_stats(sf_dir: str, n_merges: int = BPE_N_MERGES):
    """Apply the learned BPE merge table to every document and report
    per-doc subword statistics: word count, subword count after all
    merges, and fertility (subwords per word, integer permille) — the
    tokenization step bpe_merges learns FOR, and the statistic
    (fertility) that decides whether a vocabulary is worth its size
    (tokenizer_fertility's twin, but under the LEARNED vocab instead
    of the fixed one).

    Scale shape: learning reuses bpe_merges (word types stay a
    Dataset); application is embarrassingly parallel — the 6 merge
    replaces broadcast as literal patterns and run as vectorized
    pc.replace_substring chains per batch (same non-overlapping
    left-to-right semantics as DuckDB's replace, proven
    char-identical), subword counts are one count_substring per word
    + one scatter-add per doc."""
    merges = bpe_merges(sf_dir, n_merges=n_merges)
    reps = [
        (f" {l}  {r} ", f" {l}{r} ")
        for l, r in zip(merges["left"].to_pylist(), merges["right"].to_pylist())
    ]
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def apply(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        par = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        core = pc.replace_substring_regex(f, "(.)", r"\1  ")
        pad = pa.array([" "] * len(f), pa.string())
        sym = pc.binary_join_element_wise(pad, pc.utf8_rtrim(core, " "), pad, "")
        for pat, rep in reps:
            sym = pc.replace_substring(sym, pattern=pat, replacement=rep)
        nsub = pc.add(
            pc.count_substring(sym, "  "), 1
        ).to_numpy(zero_copy_only=False)
        n_words = np.zeros(t.num_rows, dtype=np.int64)
        n_subs = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_words, par, 1)
        np.add.at(n_subs, par, nsub.astype(np.int64))
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_subwords": pa.array(n_subs, pa.int64()),
            }
        ).filter(pc.greater(pa.array(n_words), 0))
        return out.append_column(
            "fertility_permille",
            pc.cast(
                pc.divide(
                    pc.multiply(out["n_subwords"], pa.scalar(1000, pa.int64())),
                    out["n_words"],
                ),
                pa.int64(),
            ),
        )

    return ds.map_batches(apply, batch_format="pyarrow").sort("doc_id")


def _bpe_apply_sql(n_merges: int = BPE_N_MERGES) -> str:
    ctes = _bpe_ctes(n_merges)
    apply_chain = [
        f"""dw AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, unnest(list_filter(
      regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'), t -> t <> ''
    )) AS tok FROM documents
  ) GROUP BY doc_id, tok
)""",
        """s0 AS (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(tok, '.'), '  ') || ' '
           AS sym, c
  FROM dw
)""",
    ]
    for i in range(1, n_merges + 1):
        apply_chain.append(
            f"""s{i} AS (
  SELECT doc_id,
         replace(sym, ' ' || m.l || '  ' || m.r || ' ',
                 ' ' || m.l || m.r || ' ') AS sym, c
  FROM s{i - 1} CROSS JOIN m{i} m
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes + apply_chain)
        + f"""
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(sum(c * len(string_split(trim(sym), '  '))) AS BIGINT)
         AS n_subwords,
       CAST(sum(c * len(string_split(trim(sym), '  '))) * 1000
            // sum(c) AS BIGINT) AS fertility_permille
FROM s{n_merges}
GROUP BY doc_id
ORDER BY doc_id"""
    )


BPE_APPLY_STATS_SQL = _bpe_apply_sql()


# ---------------------------------------------------------------------------
# Good-Turing frequency-of-frequencies (LM smoothing ingredient)
# ---------------------------------------------------------------------------

def good_turing_counts(sf_dir: str):
    """Good-Turing count-of-counts over the corpus unigrams: per
    observed frequency r, the number of token types N_r seen exactly
    r times, and the Turing-smoothed adjusted count r* = (r+1) *
    N_{r+1} / N_r in integer micro (0 where N_{r+1} is absent) — the
    other classical smoothing ingredient next to kn_continuation_
    counts (Good 1953; the N_1/N total is the leave-one-out
    probability mass of unseen types).

    Scale shape: token counts ride the bucketed aggregate; the
    count-of-counts table is bounded by DISTINCT FREQUENCIES
    (O(sqrt(corpus tokens)) by a counting argument — sum of distinct
    r's is <= total tokens), so the fold and the r* arithmetic are
    driver-trivial at any corpus size."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    cnt: dict[str, int] = {}
    for tb in map(
        ray.get,
        bucketed_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["token"],
            [("n", "sum", "n")],
        ).to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for tok, n in zip(tb["token"].to_pylist(), tb["n"].to_pylist()):
            cnt[tok] = cnt.get(tok, 0) + int(n)
    nof: dict[int, int] = {}
    for n in cnt.values():
        nof[n] = nof.get(n, 0) + 1
    rs = sorted(nof)
    rstar = [
        1_000_000 * (r + 1) * nof.get(r + 1, 0) // nof[r] for r in rs
    ]
    return pa.table(
        {
            "r": pa.array(rs, pa.int64()),
            "n_types": pa.array([nof[r] for r in rs], pa.int64()),
            "r_star_micro": pa.array(rstar, pa.int64()),
        }
    )


GOOD_TURING_SQL = f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM tok WHERE token <> '' GROUP BY token
),
nof AS (SELECT n AS r, CAST(count(*) AS BIGINT) AS n_types FROM cnt GROUP BY n)
SELECT a.r, a.n_types,
       CAST(1000000 * (a.r + 1) * coalesce(b.n_types, 0) // a.n_types
            AS BIGINT) AS r_star_micro
FROM nof a LEFT JOIN nof b ON b.r = a.r + 1
ORDER BY a.r
"""


# ---------------------------------------------------------------------------
# Cohen's kappa for the language classifier (chance-corrected agreement)
# ---------------------------------------------------------------------------

def langid_kappa(sf_dir: str):
    """Cohen's kappa between the heuristic classifier and the corpus
    lang labels, as ONE exact integer rational on top of
    lang_confusion's matrix: kappa = (agree*N - sum_c row_c*col_c) /
    (N^2 - sum_c row_c*col_c), reported as the raw numerator/
    denominator plus kappa_micro with the convention-proof floor —
    the chance-corrected single-number audit a confusion matrix alone
    doesn't give (a degenerate classifier predicting the majority
    class can still show high raw accuracy).

    Scale shape: entirely a fold over lang_confusion's bounded
    label-square; the classifier pass is the only corpus-sized work."""
    rows = lang_confusion(sf_dir).take_all()
    agree = sum(r["n_docs"] for r in rows if r["lang"] == r["pred_lang"])
    n = sum(r["n_docs"] for r in rows)
    row_tot: dict[str, int] = {}
    col_tot: dict[str, int] = {}
    for r in rows:
        row_tot[r["lang"]] = row_tot.get(r["lang"], 0) + int(r["n_docs"])
        col_tot[r["pred_lang"]] = col_tot.get(r["pred_lang"], 0) + int(r["n_docs"])
    chance = sum(
        row_tot[c] * col_tot.get(c, 0) for c in row_tot
    )
    num = agree * n - chance
    den = n * n - chance
    kappa = (num * 1_000_000 - ((num * 1_000_000) % den + den) % den) // den
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_agree": pa.array([agree], pa.int64()),
            "kappa_num": pa.array([num], pa.int64()),
            "kappa_den": pa.array([den], pa.int64()),
            "kappa_micro": pa.array([kappa], pa.int64()),
        }
    )


def _langid_kappa_sql() -> str:
    return f"""
WITH conf AS ({LANG_CONFUSION_SQL}),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM conf),
ag AS (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS agree
       FROM conf WHERE lang = pred_lang),
rt AS (SELECT lang AS c, CAST(sum(n_docs) AS BIGINT) AS r FROM conf GROUP BY 1),
ct AS (SELECT pred_lang AS c, CAST(sum(n_docs) AS BIGINT) AS cl
       FROM conf GROUP BY 1),
ch AS (
  SELECT CAST(coalesce(sum(rt.r * ct.cl), 0) AS BIGINT) AS chance
  FROM rt JOIN ct USING (c)
),
k AS (
  SELECT tot.n, ag.agree,
         ag.agree * tot.n - ch.chance AS num,
         tot.n * tot.n - ch.chance AS den
  FROM tot, ag, ch
)
SELECT n AS n_docs, agree AS n_agree,
       CAST(num AS BIGINT) AS kappa_num,
       CAST(den AS BIGINT) AS kappa_den,
       CAST((num * 1000000 - ((num * 1000000) % den + den) % den) // den
            AS BIGINT) AS kappa_micro
FROM k
"""


LANGID_KAPPA_SQL = _langid_kappa_sql()


def hashing_collision_audit(sf_dir: str, d: int = HBOW_DIMS):
    """Collision profile of the feature-hashing map ``hashed_bow``
    uses: distribution of vocabulary load per hashed dimension
    (load → n_dims, including empty dimensions) — the audit that says
    whether d is large enough before committing to a hashed feature
    space (expected load is |V|/d; heavy tails mean semantic
    collisions).

    Scale shape: the only distributed work is the distinct-vocabulary
    fold (``bucketed_agg``, token-bounded — the df/tfidf ceiling);
    hashing and the load histogram are a driver pass over the bounded
    vocab."""
    import zlib

    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def vocab_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "one": pc.cast(g["count_all"], pa.int64())}
        )

    vocab = bucketed_agg(
        ds.map_batches(vocab_partial, batch_format="pyarrow"),
        ["token"],
        [("one", "sum", "c")],
    ).take_all()
    words = sorted({r["token"] for r in vocab})
    dims = np.fromiter(
        (zlib.crc32(w.encode("utf-8")) % d for w in words),
        dtype=np.int64,
        count=len(words),
    )
    loads = np.bincount(dims, minlength=d)
    load_vals, load_counts = np.unique(loads, return_counts=True)
    return pa.table(
        {
            "load": pa.array(load_vals.astype(np.int64), pa.int64()),
            "n_dims": pa.array(load_counts.astype(np.int64), pa.int64()),
        }
    )


def hashing_collision_audit_sql(d: int = HBOW_DIMS) -> str:
    from document_extractor_ray.functions.sqlhash import _CRC_TABLE, _WORD_CRC, _words

    return f"""WITH RECURSIVE
{_words(lower=True)},
{_CRC_TABLE},
{_WORD_CRC},
dl AS (SELECT crc % {d} AS dim, CAST(count(*) AS BIGINT) AS load
       FROM wcrc0 GROUP BY 1),
h AS (
  SELECT load, CAST(count(*) AS BIGINT) AS n_dims FROM dl GROUP BY 1
  UNION ALL
  SELECT CAST(0 AS BIGINT), CAST({d} - (SELECT count(*) FROM dl) AS BIGINT)
  WHERE {d} > (SELECT count(*) FROM dl)
)
SELECT load, n_dims FROM h ORDER BY load"""


HASHING_COLLISION_AUDIT_SQL = hashing_collision_audit_sql()


# ---------------------------------------------------------------------------
# Partition checksums (snapshot-diff integrity primitive)
# ---------------------------------------------------------------------------

CHECKSUM_RANGE = 256  # doc_ids per checksum partition


def partition_checksums(sf_dir: str, range_size: int = CHECKSUM_RANGE):
    """Order-independent content checksum per deterministic doc_id
    partition: (range, n_docs, sum_chars, checksum) with checksum =
    Σ_docs Σ_words crc32(word)·position mod 2³¹ — two corpus snapshots
    diff by comparing this bounded table, and only ranges whose
    checksum moved need re-processing (the incremental-rerun
    primitive behind resume.py's shard commits, lifted to content
    level: it catches any word edit, insertion or reorder).

    Scale shape: one vectorized pass (dictionary-encode tokens, one
    crc per DISTINCT token via the hashed_bow path, one np.add.at);
    per-block partials are range-keyed and the fold is bounded by
    id-domain/range_size."""
    import zlib

    ds = _read_docs(sf_dir, ["doc_id", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        rng_doc = (
            t["doc_id"].to_numpy(zero_copy_only=False) // range_size
        ).astype(np.int64)
        row_sum = np.zeros(t.num_rows, dtype=np.int64)
        if len(flat):
            d = flat.combine_chunks().dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False)
            vocab = d.dictionary.to_pylist()
            crc = np.fromiter(
                (zlib.crc32(w.encode("utf-8")) for w in vocab),
                dtype=np.int64,
                count=len(vocab),
            )
            pos = (
                np.arange(len(par)) - np.searchsorted(par, par, side="left") + 1
            )
            np.add.at(row_sum, par, crc[codes] * pos)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "rng": pa.array(rng_doc, pa.int64()),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                    "chars": pc.cast(t["n_chars"], pa.int64()),
                    "rs": pa.array(row_sum, pa.int64()),
                }
            ),
            ["rng"],
        ).aggregate([("one", "sum"), ("chars", "sum"), ("rs", "sum")])
        return pa.table(
            {
                "rng": g["rng"],
                "n_p": pc.cast(g["one_sum"], pa.int64()),
                "ch_p": pc.cast(g["chars_sum"], pa.int64()),
                "cs_p": pc.cast(g["rs_sum"], pa.int64()),
            }
        )

    fold: dict[int, list] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for r, n, ch, cs in zip(
            tb["rng"].to_pylist(), tb["n_p"].to_pylist(),
            tb["ch_p"].to_pylist(), tb["cs_p"].to_pylist(),
        ):
            cur = fold.setdefault(int(r), [0, 0, 0])
            cur[0] += int(n)
            cur[1] += int(ch)
            cur[2] += int(cs)
    rngs = sorted(fold)
    return pa.table(
        {
            "rng": pa.array(rngs, pa.int64()),
            "n_docs": pa.array([fold[r][0] for r in rngs], pa.int64()),
            "sum_chars": pa.array([fold[r][1] for r in rngs], pa.int64()),
            "checksum": pa.array(
                [fold[r][2] % 2147483648 for r in rngs], pa.int64()
            ),
        }
    )


def partition_checksums_sql(range_size: int = CHECKSUM_RANGE) -> str:
    from document_extractor_ray.functions.sqlhash import _CRC_TABLE, _WORD_CRC, _words

    return f"""WITH RECURSIVE
{_words(lower=True)},
{_CRC_TABLE},
{_WORD_CRC},
w AS (
  SELECT doc_id // {range_size} AS rng,
         CAST(sum(CAST(crc AS HUGEINT) * pos) AS HUGEINT) AS cs
  FROM wcrc GROUP BY 1
),
d AS (
  SELECT doc_id // {range_size} AS rng,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY 1
)
SELECT d.rng, d.n_docs, d.sum_chars,
       CAST(coalesce(w.cs, 0) % 2147483648 AS BIGINT) AS checksum
FROM d LEFT JOIN w USING (rng)
ORDER BY d.rng"""


PARTITION_CHECKSUMS_SQL = partition_checksums_sql()


# ---------------------------------------------------------------------------
# Dataset card: the one-row corpus summary
# ---------------------------------------------------------------------------

def dataset_card(sf_dir: str):
    """The one-row dataset card a corpus release ships: document and
    token counts, distinct vocabulary, language and source counts,
    mean document length (milli-tokens), and the C4/Gopher pass rates
    (permille) — every number integer-exact and reproducible.

    Scale shape: ONE fused pass computes the per-doc counters and the
    two quality gates (the doc_quality_composite kernels); the only
    shuffle is the distinct-vocabulary fold (``bucketed_agg``,
    token-bounded); langs/sources fold as bounded sets."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "lang", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        n = pc.cast(pc.utf8_length(text), pa.int64())
        n_safe = pc.max_element_wise(n, 1)
        toks = pc.cast(pc.count_substring_regex(text, _TOKEN_RE), pa.int64())
        alnum = pc.cast(pc.count_substring_regex(text, r"[A-Za-z0-9]"), pa.int64())
        punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
        alnum_pm = pc.divide(pc.multiply(alnum, 1000), n_safe)
        punct_pm = pc.divide(pc.multiply(punct, 1000), n_safe)
        c4 = pc.and_(
            pc.and_(
                pc.greater_equal(toks, MIN_TOKENS),
                pc.greater_equal(alnum_pm, MIN_ALNUM_PERMILLE),
            ),
            pc.less_equal(punct_pm, MAX_PUNCT_PERMILLE),
        )
        return pa.table(
            {
                "n_docs": pa.array([t.num_rows], pa.int64()),
                "n_tokens": pa.array([int(pc.sum(toks).as_py() or 0)], pa.int64()),
                "n_chars": pa.array([int(pc.sum(n).as_py() or 0)], pa.int64()),
                "n_c4_pass": pa.array(
                    [int(pc.sum(pc.cast(c4, pa.int64())).as_py() or 0)], pa.int64()
                ),
                "langs": pa.array(
                    [pc.unique(t["lang"]).to_pylist()],
                    pa.list_(pa.string()),
                ),
                "sources": pa.array(
                    [pc.unique(t["source"]).to_pylist()],
                    pa.list_(pa.string()),
                ),
            }
        )

    n_docs = n_tokens = n_chars = n_c4 = 0
    langs: set = set()
    sources: set = set()
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        n_docs += sum(tb["n_docs"].to_pylist())
        n_tokens += sum(tb["n_tokens"].to_pylist())
        n_chars += sum(tb["n_chars"].to_pylist())
        n_c4 += sum(tb["n_c4_pass"].to_pylist())
        for ls in tb["langs"].to_pylist():
            langs.update(ls)
        for ss in tb["sources"].to_pylist():
            sources.update(ss)

    def vocab_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.TableGroupBy(pa.table({"token": flat}), ["token"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"token": g["token"], "one": pc.cast(g["count_all"], pa.int64())}
        )

    vocab_rows = bucketed_agg(
        ds.map_batches(vocab_partial, batch_format="pyarrow"),
        ["token"],
        [("one", "sum", "c")],
    ).count()

    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "n_chars": pa.array([n_chars], pa.int64()),
            "n_distinct_tokens": pa.array([vocab_rows], pa.int64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
            "n_sources": pa.array([len(sources)], pa.int64()),
            "mean_doc_tokens_milli": pa.array(
                [n_tokens * 1000 // max(n_docs, 1)], pa.int64()
            ),
            "c4_pass_permille": pa.array(
                [n_c4 * 1000 // max(n_docs, 1)], pa.int64()
            ),
        }
    )


DATASET_CARD_SQL = f"""
WITH base AS (
  SELECT CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS toks,
         CAST(length(text) AS BIGINT) AS n,
         lang, source,
         (CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
            >= {MIN_TOKENS}
          AND (CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
                    AS BIGINT) * 1000)
              // greatest(CAST(length(text) AS BIGINT), 1)
            >= {MIN_ALNUM_PERMILLE}
          AND (CAST(length(text)
                    - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}-]', '',
                                            'g')) AS BIGINT) * 1000)
              // greatest(CAST(length(text) AS BIGINT), 1)
            <= {MAX_PUNCT_PERMILLE}) AS c4
  FROM documents
),
vocab AS (
  SELECT count(DISTINCT tok) AS v FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS tok
    FROM documents) WHERE tok <> ''
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       CAST(sum(n) AS BIGINT) AS n_chars,
       CAST((SELECT v FROM vocab) AS BIGINT) AS n_distinct_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(toks) * 1000 // greatest(count(*), 1) AS BIGINT)
         AS mean_doc_tokens_milli,
       CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) * 1000
            // greatest(count(*), 1) AS BIGINT) AS c4_pass_permille
FROM base
"""


def lang_source_gtest(sf_dir: str):
    """G-test of independence for the lang × source contingency table
    — "does any source skew toward a language" as one number:
    g_micro = 2·Σ O·(L(O·N) − L(R·C)) micro-nats with
    L(v) = round(ln v · 1e6) (zero cells contribute nothing), plus the
    degrees of freedom — the corpus-composition audit next to
    value_type_chi2's events-side test.

    Scale shape: per-batch (lang, source) count partials, driver fold
    bounded by |langs|·|sources|; the statistic is driver arithmetic
    on that bounded table."""
    import math

    ds = _read_docs(sf_dir, ["doc_id", "lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["lang", "source"]), ["lang", "source"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "source": g["source"],
                "n_p": pc.cast(g["count_all"], pa.int64()),
            }
        )

    fold: dict[tuple, int] = {}
    for tb in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not tb.num_rows:
            continue
        for la, s, n in zip(
            tb["lang"].to_pylist(), tb["source"].to_pylist(), tb["n_p"].to_pylist()
        ):
            fold[(la, s)] = fold.get((la, s), 0) + int(n)
    langs = sorted({k[0] for k in fold})
    sources = sorted({k[1] for k in fold})
    row_t = {la: sum(v for k, v in fold.items() if k[0] == la) for la in langs}
    col_t = {s: sum(v for k, v in fold.items() if k[1] == s) for s in sources}
    n_tot = sum(fold.values())

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    g_micro = 2 * sum(
        o * (L(o * n_tot) - L(row_t[la] * col_t[s]))
        for (la, s), o in fold.items()
        if o > 0
    )
    return pa.table(
        {
            "n_docs": pa.array([n_tot], pa.int64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
            "n_sources": pa.array([len(sources)], pa.int64()),
            "df": pa.array([(len(langs) - 1) * (len(sources) - 1)], pa.int64()),
            "g_micro": pa.array([g_micro], pa.int64()),
        }
    )


LANG_SOURCE_GTEST_SQL = """
WITH o AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rt FROM o GROUP BY 1),
c AS (SELECT source, CAST(sum(n) AS BIGINT) AS ct FROM o GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM o),
g AS (
  SELECT CAST(2 * sum(o.n * (CAST(round(ln(o.n * t.nt) * 1000000) AS BIGINT)
                             - CAST(round(ln(r.rt * c.ct) * 1000000) AS BIGINT)))
         AS BIGINT) AS g_micro
  FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
)
SELECT (SELECT nt FROM t) AS n_docs,
       CAST((SELECT count(*) FROM r) AS BIGINT) AS n_langs,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_sources,
       CAST(((SELECT count(*) FROM r) - 1) * ((SELECT count(*) FROM c) - 1)
         AS BIGINT) AS df,
       g_micro
FROM g
"""


# ---------------------------------------------------------------------------
# Exact AUC (Mann-Whitney U) from a score histogram — no global sort
# ---------------------------------------------------------------------------

def quality_auc(sf_dir: str):
    """Exact ROC-AUC of the document-length score against the
    ``lang == 'en'`` label — the ranking-metric primitive every
    quality-classifier evaluation needs, computed as the Mann-Whitney
    rank-sum WITHOUT a global sort: AUC = Σ_v pos_v·(neg_below_v +
    neg_v/2) / (P·N), folded from a (score → pos, neg) histogram.
    Ties get the standard midrank treatment; the value ships as one
    truncating integer rational, auc_micro = 10⁶·Σ pos·(2·neg_below +
    neg) // (2·P·N).

    Scale shape: per-block (score, label) histogram partials fold on
    the driver (distinct doc lengths are bounded; a continuous score
    at 10^12 rows would be quantized to fixed-width bins first —
    same math, bounded histogram)."""
    ds = _read_docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        lab = pc.cast(pc.equal(t["lang"], "en"), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"s": t["n_chars"], "pos": lab}), ["s", "pos"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {"s": g["s"], "pos": g["pos"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    hist: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for s, p, n in zip(
            t["s"].to_pylist(), t["pos"].to_pylist(), t["n"].to_pylist()
        ):
            cur = hist.setdefault(s, [0, 0])
            cur[p] += n

    n_pos = sum(v[1] for v in hist.values())
    n_neg = sum(v[0] for v in hist.values())
    u2 = 0
    neg_below = 0
    for s in sorted(hist):
        neg, pos = hist[s][0], hist[s][1]
        u2 += pos * (2 * neg_below + neg)
        neg_below += neg
    auc_micro = (1_000_000 * u2) // (2 * n_pos * n_neg)
    return pa.table(
        {
            "n_pos": pa.array([n_pos], pa.int64()),
            "n_neg": pa.array([n_neg], pa.int64()),
            "auc_micro": pa.array([auc_micro], pa.int64()),
        }
    )


QUALITY_AUC_SQL = """
WITH h AS (
  SELECT n_chars AS s,
         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS pos,
         CAST(count(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS neg
  FROM documents GROUP BY 1
),
c AS (
  SELECT pos, neg,
         CAST(COALESCE(sum(neg) OVER (
             ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS neg_below
  FROM h
),
t AS (
  SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
         CAST(sum(neg) AS BIGINT) AS n_neg,
         CAST(sum(pos * (2 * neg_below + neg)) AS BIGINT) AS u2
  FROM c
)
SELECT n_pos, n_neg,
       CAST((1000000::HUGEINT * u2) // (2::HUGEINT * n_pos * n_neg) AS BIGINT)
         AS auc_micro
FROM t
"""


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query-likelihood retrieval (the LM alternative to BM25)
# ---------------------------------------------------------------------------

QLM_MU = 2000


def qlm_topk(sf_dir: str, terms=SEARCH_TERMS, k: int = SEARCH_TOP_K, mu: int = QLM_MU):
    """Top-k documents under the Dirichlet-smoothed query-likelihood
    model — score(d) = Σ_t ln((tf + μ·cf_t/C)/(len_d + μ)) — the
    language-model retrieval twin of ``bm25_topk``.  Exactness: each
    p(t|d) is the integer rational (tf·C + μ·cf_t)/((len_d+μ)·C), so
    score_micro = Σ_t L(tf·C + μ·cf_t) − |q|·L(len_d+μ) − |q|·L(C)
    with L(v) = floor(ln(v)·10⁶ + ½) == DuckDB round(ln·10⁶) (same
    libm).  ln-micro is evaluated per DISTINCT argument (a bounded
    set: tf and doc-length values), never per row.

    Scale shape: collection stats (cf per query term + total token
    count C) fold from per-block partials on the driver and ride into
    the scoring closure as Python ints; scoring is one vectorized
    pass with a per-batch local top-k, so ≤ k rows leave each block."""
    import math

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    term_list = list(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        names = ["__total__"] + term_list
        counts = [len(flat)] + [
            pc.sum(pc.equal(flat, w)).as_py() or 0 for w in term_list
        ]
        return pa.table(
            {"token": pa.array(names, pa.string()), "n": pa.array(counts, pa.int64())}
        )

    agg: dict = {}
    for t in map(
        ray.get, ds.map_batches(stats_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for w, n in zip(t["token"].to_pylist(), t["n"].to_pylist()):
            agg[w] = agg.get(w, 0) + n
    ctot = agg.pop("__total__", 0)
    cf = {w: agg.get(w, 0) for w in term_list}
    live_terms = [w for w in term_list if cf[w] > 0]
    nq = len(live_terms)

    def _lmic_map(vals: np.ndarray) -> np.ndarray:
        uniq = np.unique(vals)
        lut = np.array(
            [int(math.floor(math.log(int(v)) * 1_000_000 + 0.5)) for v in uniq],
            np.int64,
        )
        return lut[np.searchsorted(uniq, vals)]

    l_c = int(math.floor(math.log(ctot) * 1_000_000 + 0.5)) if ctot else 0

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dlen = np.zeros(t.num_rows, np.int64)
        np.add.at(dlen, parent[keep], 1)
        total = np.zeros(t.num_rows, np.int64)
        for w in live_terms:
            tf = np.zeros(t.num_rows, np.int64)
            hits = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            np.add.at(tf, parent[hits], 1)
            total += _lmic_map(tf * ctot + mu * cf[w])
        total -= nq * _lmic_map(dlen + mu)
        total -= nq * l_c
        out = pa.table(
            {"doc_id": t["doc_id"], "score_micro": pa.array(total, pa.int64())}
        )
        return out.sort_by(
            [("score_micro", "descending"), ("doc_id", "ascending")]
        ).slice(0, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["score_micro", "doc_id"], descending=[True, False])
        .limit(k)
    )


def _qlm_sql(terms=SEARCH_TERMS, k: int = SEARCH_TOP_K, mu: int = QLM_MU) -> str:
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents)
  WHERE token <> ''
),
len AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
c AS (SELECT CAST(count(*) AS BIGINT) AS ctot FROM tok),
q(term) AS (VALUES {values}),
cf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf
  FROM tok JOIN q ON token = term GROUP BY 1 HAVING count(*) > 0
),
tf AS (
  SELECT l.doc_id, cf.term, cf.cf, CAST(COALESCE(x.tf, 0) AS BIGINT) AS tf
  FROM len l CROSS JOIN cf
  LEFT JOIN (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM tok JOIN q ON token = term GROUP BY 1, 2
  ) x ON x.doc_id = l.doc_id AND x.token = cf.term
),
sc AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(round(ln(tf.tf * c.ctot + {mu} * tf.cf) * 1000000)
                       AS BIGINT)) AS BIGINT)
         - (SELECT count(*) FROM cf)
           * CAST(round(ln(any_value(l.len) + {mu}) * 1000000) AS BIGINT)
         - (SELECT count(*) FROM cf)
           * CAST(round(ln(any_value(c.ctot)) * 1000000) AS BIGINT)
           AS score_micro
  FROM tf JOIN len l ON l.doc_id = tf.doc_id CROSS JOIN c
  GROUP BY tf.doc_id
)
SELECT doc_id, CAST(score_micro AS BIGINT) AS score_micro
FROM sc ORDER BY score_micro DESC, doc_id LIMIT {k}
"""


QLM_TOPK_SQL = _qlm_sql()


# ---------------------------------------------------------------------------
# Per-language characteristic tokens (chi-square association)
# ---------------------------------------------------------------------------

TOKEN_LANG_CHI2_K = 5


def token_lang_chi2(sf_dir: str, k: int = TOKEN_LANG_CHI2_K):
    """Top-k characteristic tokens per language by the chi-square
    statistic of the 2×2 (lang, token-presence) document contingency
    table — the feature-selection pass a lang-ID or domain classifier
    trains on.  Only observed (lang, token) pairs compete (positive
    association), and tokens present in every document are skipped
    (degenerate margin → χ² undefined).  Exactness: χ²_micro =
    10⁶·N·(ad−bc)² // ((a+b)(c+d)(a+c)(b+d)) as one truncating
    integer rational (Python ints / DuckDB HUGEINT — no overflow).

    Scale shape: per-block distinct-(doc, lang, token) partials fold
    into a (lang, token) → doc-frequency table bounded by vocab ×
    langs; at open-vocab web scale the same partials route through
    ``bucketed_agg`` and the χ² ranking becomes a per-lang local
    top-k (the zipf/top_tokens plan)."""
    ds = _read_docs(sf_dir, ["doc_id", "lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        tbl = pa.table(
            {
                "d": pc.take(t["doc_id"], parent),
                "lang": pc.take(t["lang"], parent),
                "token": flat,
            }
        ).filter(pc.not_equal(flat, ""))
        dt = pa.TableGroupBy(tbl, ["d", "lang", "token"]).aggregate([])
        g = pa.TableGroupBy(dt, ["lang", "token"]).aggregate([([], "count_all")])
        # also fold per-block doc counts per lang (distinct docs are
        # block-local rows, so a plain count is exact)
        langs = pa.TableGroupBy(
            pa.table({"lang": t["lang"]}), ["lang"]
        ).aggregate([([], "count_all")])
        left = pa.table(
            {
                "lang": g["lang"],
                "token": g["token"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )
        right = pa.table(
            {
                "lang": langs["lang"],
                "token": pa.array(["__docs__"] * langs.num_rows, pa.string()),
                "n": pc.cast(langs["count_all"], pa.int64()),
            }
        )
        return pa.concat_tables([left, right])

    df: dict = {}
    rl: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for la, w, n in zip(
            t["lang"].to_pylist(), t["token"].to_pylist(), t["n"].to_pylist()
        ):
            if w == "__docs__":
                rl[la] = rl.get(la, 0) + n
            else:
                df[(la, w)] = df.get((la, w), 0) + n

    n_total = sum(rl.values())
    tok_tot: dict = {}
    for (la, w), a in df.items():
        tok_tot[w] = tok_tot.get(w, 0) + a

    rows = []
    for (la, w), a in df.items():
        t_w = tok_tot[w]
        if t_w == 0 or t_w == n_total:
            continue
        r = rl[la]
        b = r - a
        c = t_w - a
        d = n_total - r - t_w + a
        diff = a * d - b * c
        denom = (a + b) * (c + d) * (a + c) * (b + d)
        chi2 = (1_000_000 * n_total * diff * diff) // denom
        rows.append((la, w, a, chi2))

    rows.sort(key=lambda x: (x[0], -x[3], x[1]))
    out = []
    per: dict = {}
    for la, w, a, chi2 in rows:
        per[la] = per.get(la, 0) + 1
        if per[la] <= k:
            out.append((la, w, a, chi2))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in out], pa.string()),
            "token": pa.array([r[1] for r in out], pa.string()),
            "df_lang": pa.array([r[2] for r in out], pa.int64()),
            "chi2_micro": pa.array([r[3] for r in out], pa.int64()),
        }
    )


TOKEN_LANG_CHI2_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, lang, token FROM (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents)
  WHERE token <> ''
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
rl AS (SELECT lang, CAST(count(*) AS BIGINT) AS r FROM documents GROUP BY 1),
tt AS (SELECT token, CAST(count(*) AS BIGINT) AS t FROM tok GROUP BY 1),
aa AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS a FROM tok GROUP BY 1, 2),
x AS (
  SELECT aa.lang, aa.token, aa.a,
         (aa.a::HUGEINT * (nn.n - rl.r - tt.t + aa.a)
          - (rl.r - aa.a)::HUGEINT * (tt.t - aa.a)) AS diff,
         ((rl.r)::HUGEINT * (nn.n - rl.r)
          * tt.t * (nn.n - tt.t)) AS denom
  FROM aa JOIN rl USING (lang) JOIN tt USING (token) CROSS JOIN nn
  WHERE tt.t < nn.n
),
c2 AS (
  SELECT lang, token, a,
         CAST((1000000::HUGEINT * (SELECT n FROM nn) * diff * diff) // denom
              AS BIGINT) AS chi2_micro
  FROM x
)
SELECT lang, token, CAST(a AS BIGINT) AS df_lang, chi2_micro
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY lang ORDER BY chi2_micro DESC, token) AS rk
  FROM c2
) WHERE rk <= {TOKEN_LANG_CHI2_K}
ORDER BY lang, chi2_micro DESC, token
"""


# ---------------------------------------------------------------------------
# Interpolated bigram/unigram LM hyperparameter sweep (one pass, 3 lambdas)
# ---------------------------------------------------------------------------

LM_SWEEP_LAMBDAS = (250, 500, 750)  # permille bigram weight


def lm_interpolation_sweep(sf_dir: str, lambdas=LM_SWEEP_LAMBDAS):
    """Corpus cross-entropy of the Jelinek-Mercer interpolated
    bigram/unigram LM at three mixture weights — the hyperparameter
    sweep every LM-based quality filter tunes, swept in ONE stats pass
    (PERF-36 rule: metrics are extra columns, never extra scans).
    Each position's mixed probability is the integer rational
    (λ·c₁₂·N + (1000−λ)·n₂·n₁) / (1000·n₁·N), so xent is a Σ c·(L(den)
    − L(num)) of ln-micro BIGINTs, exact on both engines.

    Scale shape: the (w1, w2) bigram and unigram folds are
    vocab-bounded (the corpus has a closed 31-token vocab; open-vocab
    corpora route the same partials through ``bucketed_agg``); the
    3-λ sweep is driver math over that bounded table."""
    import math

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep).combine_chunks()
        p = parent.filter(keep).combine_chunks().to_numpy(zero_copy_only=False)
        parts = []
        if len(f) >= 2:
            mask = pa.array(p[1:] == p[:-1])
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "a": f.slice(0, len(f) - 1).filter(mask),
                        "b": f.slice(1).filter(mask),
                    }
                ),
                ["a", "b"],
            ).aggregate([([], "count_all")])
            parts.append(
                pa.table(
                    {
                        "a": g["a"],
                        "b": g["b"],
                        "n": pc.cast(g["count_all"], pa.int64()),
                    }
                )
            )
        u = pa.TableGroupBy(pa.table({"w": f}), ["w"]).aggregate([([], "count_all")])
        parts.append(
            pa.table(
                {
                    "a": pa.array(["__u__"] * u.num_rows, pa.string()),
                    "b": u["w"],
                    "n": pc.cast(u["count_all"], pa.int64()),
                }
            )
        )
        return pa.concat_tables(parts)

    bg: dict = {}
    uni: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for a, b, n in zip(
            t["a"].to_pylist(), t["b"].to_pylist(), t["n"].to_pylist()
        ):
            if a == "__u__":
                uni[b] = uni.get(b, 0) + n
            else:
                bg[(a, b)] = bg.get((a, b), 0) + n

    n_tot = sum(uni.values())

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    rows = []
    for lam in lambdas:
        s = 0
        npos = 0
        for (a, b), c in bg.items():
            num = lam * c * n_tot + (1000 - lam) * uni[b] * uni[a]
            den = 1000 * uni[a] * n_tot
            s += c * (L(den) - L(num))
            npos += c
        rows.append((lam, npos, s, s // npos if npos else 0))
    return pa.table(
        {
            "lambda_permille": pa.array([r[0] for r in rows], pa.int64()),
            "n_positions": pa.array([r[1] for r in rows], pa.int64()),
            "xent_sum_micro": pa.array([r[2] for r in rows], pa.int64()),
            "mean_xent_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _lm_sweep_sql(lambdas=LM_SWEEP_LAMBDAS) -> str:
    values = ", ".join(f"({v})" for v in lambdas)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
grams AS (
  SELECT lst[g.i] AS w1, lst[g.i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst))) AS i) g
),
bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY 1, 2),
uni AS (
  SELECT t AS w, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(lst) AS t FROM toks) GROUP BY 1
),
nn AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM uni),
lam(l) AS (VALUES {values}),
term AS (
  SELECT lam.l, bg.c,
         CAST(round(ln(1000 * u1.n * nn.n) * 1000000) AS BIGINT)
         - CAST(round(ln(lam.l * bg.c * nn.n
                         + (1000 - lam.l) * u2.n * u1.n) * 1000000) AS BIGINT)
           AS x
  FROM bg
  JOIN uni u1 ON u1.w = bg.w1
  JOIN uni u2 ON u2.w = bg.w2
  CROSS JOIN nn CROSS JOIN lam
)
SELECT CAST(l AS BIGINT) AS lambda_permille,
       CAST(sum(c) AS BIGINT) AS n_positions,
       CAST(sum(c * x) AS BIGINT) AS xent_sum_micro,
       CAST(sum(c * x) // sum(c) AS BIGINT) AS mean_xent_micro
FROM term GROUP BY 1 ORDER BY 1
"""


LM_INTERPOLATION_SWEEP_SQL = _lm_sweep_sql()


# ---------------------------------------------------------------------------
# Rank agreement between two retrieval scorers (Kendall pair counts)
# ---------------------------------------------------------------------------

def rank_corr_audit(sf_dir: str, terms=SEARCH_TERMS, mu: int = QLM_MU):
    """Do tf-idf and the Dirichlet QL model rank the corpus the same
    way?  Kendall pair counts (concordant, discordant, x-only and
    y-only ties) between the two scores over every document matching
    ≥1 query term, plus tau_a in micro units — the retrieval-metrics
    capstone over ``search_topk``'s and ``qlm_topk``'s scorers.
    Both scores come out of ONE corpus pass (PERF-36: metrics are
    extra columns), integer-exact as in their parent operators.

    Scale shape: collection stats fold once (tiny); the candidate
    (doc, s1, s2) table is bounded by matching docs and the O(m²)
    pair count runs CHUNKED-vectorized on the driver (25M int8 ops at
    sf0.1); above that the pair count is a merge-sort inversion count
    over a doc_id-range partition."""
    import math

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    term_list = list(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        p = parent.to_numpy(zero_copy_only=False)[keep]
        names, dfs, cfs = ["__total__"], [0], [len(f)]
        for w in term_list:
            hits = pc.equal(f, w).to_numpy(zero_copy_only=False)
            names.append(w)
            dfs.append(int(len(np.unique(p[hits]))))
            cfs.append(int(hits.sum()))
        return pa.table(
            {
                "token": pa.array(names, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "cf": pa.array(cfs, pa.int64()),
            }
        )

    df: dict = {}
    cf: dict = {}
    ctot = 0
    for t in map(
        ray.get, ds.map_batches(stats_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for w, d, c in zip(
            t["token"].to_pylist(), t["df"].to_pylist(), t["cf"].to_pylist()
        ):
            if w == "__total__":
                ctot += c
            else:
                df[w] = df.get(w, 0) + d
                cf[w] = cf.get(w, 0) + c
    live = [w for w in term_list if cf.get(w, 0) > 0]
    nq = len(live)
    l_c = int(math.floor(math.log(ctot) * 1_000_000 + 0.5)) if ctot else 0

    def _lmic_map(vals: np.ndarray) -> np.ndarray:
        uniq = np.unique(vals)
        lut = np.array(
            [int(math.floor(math.log(int(v)) * 1_000_000 + 0.5)) for v in uniq],
            np.int64,
        )
        return lut[np.searchsorted(uniq, vals)]

    def score(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        dlen = np.zeros(t.num_rows, np.int64)
        np.add.at(dlen, parent[keep], 1)
        s1 = np.zeros(t.num_rows, np.int64)
        s2 = np.zeros(t.num_rows, np.int64)
        for w in live:
            tf = np.zeros(t.num_rows, np.int64)
            hits = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            np.add.at(tf, parent[hits], 1)
            s1 += tf * TFIDF_SCALE // df[w]
            s2 += _lmic_map(tf * ctot + mu * cf[w])
        s2 -= nq * _lmic_map(dlen + mu)
        s2 -= nq * l_c
        m = s1 > 0
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(m)),
                "s1": pa.array(s1[m], pa.int64()),
                "s2": pa.array(s2[m], pa.int64()),
            }
        )

    cand = [
        t
        for t in map(
            ray.get, ds.map_batches(score, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    tbl = pa.concat_tables(cand) if cand else pa.table(
        {"doc_id": pa.array([], pa.int64()), "s1": pa.array([], pa.int64()),
         "s2": pa.array([], pa.int64())}
    )
    s1 = tbl["s1"].to_numpy(zero_copy_only=False)
    s2 = tbl["s2"].to_numpy(zero_copy_only=False)
    m = len(s1)
    conc = disc = t1 = t2 = 0
    chunk = 512
    for i0 in range(0, m, chunk):
        i1 = min(i0 + chunk, m)
        a1 = s1[i0:i1, None]
        a2 = s2[i0:i1, None]
        # pairs (i, j) with j > i only: mask the lower triangle + self
        jmask = np.arange(m)[None, :] > np.arange(i0, i1)[:, None]
        dx = np.sign(a1 - s1[None, :])
        dy = np.sign(a2 - s2[None, :])
        prod = dx * dy
        conc += int(((prod > 0) & jmask).sum())
        disc += int(((prod < 0) & jmask).sum())
        t1 += int(((dx == 0) & (dy != 0) & jmask).sum())
        t2 += int(((dy == 0) & (dx != 0) & jmask).sum())
    n_pairs = m * (m - 1) // 2
    num = 1_000_000 * (conc - disc)
    tau = (num - ((num % n_pairs + n_pairs) % n_pairs)) // n_pairs if n_pairs else 0
    return pa.table(
        {
            "n_docs": pa.array([m], pa.int64()),
            "n_pairs": pa.array([n_pairs], pa.int64()),
            "concordant": pa.array([conc], pa.int64()),
            "discordant": pa.array([disc], pa.int64()),
            "ties_tfidf_only": pa.array([t1], pa.int64()),
            "ties_qlm_only": pa.array([t2], pa.int64()),
            "tau_a_micro": pa.array([tau], pa.int64()),
        }
    )


def _rank_corr_sql(terms=SEARCH_TERMS, mu: int = QLM_MU) -> str:
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH tok AS (
  SELECT doc_id, token FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents)
  WHERE token <> ''
),
len AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM tok GROUP BY 1),
cc AS (SELECT CAST(count(*) AS BIGINT) AS ctot FROM tok),
q(term) AS (VALUES {values}),
st AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS cf
  FROM tok JOIN q ON token = term GROUP BY 1 HAVING count(*) > 0
),
tf AS (
  SELECT l.doc_id, st.term, st.df, st.cf,
         CAST(COALESCE(x.tf, 0) AS BIGINT) AS tf
  FROM len l CROSS JOIN st
  LEFT JOIN (
    SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
    FROM tok JOIN q ON token = term GROUP BY 1, 2
  ) x ON x.doc_id = l.doc_id AND x.token = st.term
),
sc AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf * {TFIDF_SCALE} // tf.df) AS BIGINT) AS s1,
         CAST(sum(CAST(round(ln(tf.tf * cc.ctot + {mu} * tf.cf) * 1000000)
                       AS BIGINT)) AS BIGINT)
         - (SELECT count(*) FROM st)
           * CAST(round(ln(any_value(l.len) + {mu}) * 1000000) AS BIGINT)
         - (SELECT count(*) FROM st)
           * CAST(round(ln(any_value(cc.ctot)) * 1000000) AS BIGINT) AS s2
  FROM tf JOIN len l ON l.doc_id = tf.doc_id CROSS JOIN cc
  GROUP BY tf.doc_id
),
cand AS (SELECT doc_id, s1, s2 FROM sc WHERE s1 > 0),
pairs AS (
  SELECT CASE WHEN sign(a.s1 - b.s1) * sign(a.s2 - b.s2) > 0 THEN 1 ELSE 0 END AS c,
         CASE WHEN sign(a.s1 - b.s1) * sign(a.s2 - b.s2) < 0 THEN 1 ELSE 0 END AS d,
         CASE WHEN a.s1 = b.s1 AND a.s2 <> b.s2 THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.s2 = b.s2 AND a.s1 <> b.s1 THEN 1 ELSE 0 END AS ty
  FROM cand a JOIN cand b ON b.doc_id > a.doc_id
),
agg AS (
  SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(COALESCE(sum(c), 0) AS BIGINT) AS concordant,
         CAST(COALESCE(sum(d), 0) AS BIGINT) AS discordant,
         CAST(COALESCE(sum(tx), 0) AS BIGINT) AS ties_tfidf_only,
         CAST(COALESCE(sum(ty), 0) AS BIGINT) AS ties_qlm_only
  FROM pairs
)
SELECT n_docs, n_pairs, concordant, discordant, ties_tfidf_only, ties_qlm_only,
       CAST(CASE WHEN n_pairs = 0 THEN 0 ELSE
         (1000000 * (concordant - discordant)
          - (((1000000 * (concordant - discordant)) % n_pairs + n_pairs)
             % n_pairs)) // n_pairs END AS BIGINT) AS tau_a_micro
FROM agg
"""


RANK_CORR_AUDIT_SQL = _rank_corr_sql()


# ---------------------------------------------------------------------------
# Proximity search: two terms within a token window
# ---------------------------------------------------------------------------

PROX_TERM_A = "stream"
PROX_TERM_B = "hash"
PROX_WINDOW = 5


def proximity_search(
    sf_dir: str, a: str = PROX_TERM_A, b: str = PROX_TERM_B, w: int = PROX_WINDOW
):
    """Documents where ``a`` and ``b`` occur within ``w`` tokens of
    each other, with the minimum gap — the positional-index operator
    between exact ``phrase_search`` (gap 1) and bag-of-words
    ``search_topk``.  Positions are 0-based indices into the
    non-empty-token stream; gaps are position differences, so the
    base convention cancels against the oracle's 1-based ordinality.

    Scale shape: per-batch fully vectorized — nearest-other-term
    lookup via searchsorted over doc-composite keys (doc·2²⁰ + pos),
    per-doc min fold with np.minimum.at; per-doc output, no shuffle
    beyond the final doc_id sort."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])
    big = 1 << 20

    def probe(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        f = flat.filter(pa.array(keep))
        p = parent.to_numpy(zero_copy_only=False)[keep]
        # position within doc: running index minus the doc's run start
        new = np.ones(len(p), dtype=bool)
        new[1:] = p[1:] != p[:-1]
        run_start = np.repeat(
            np.flatnonzero(new), np.diff(np.append(np.flatnonzero(new), len(p)))
        ) if len(p) else np.zeros(0, np.int64)
        pos = np.arange(len(p)) - run_start
        ka = pc.equal(f, a).to_numpy(zero_copy_only=False)
        kb = pc.equal(f, b).to_numpy(zero_copy_only=False)
        key_a = p[ka] * big + pos[ka]
        key_b = np.sort(p[kb] * big + pos[kb])
        doc_a = p[ka]
        best = np.full(t.num_rows, np.iinfo(np.int64).max, np.int64)
        if len(key_a) and len(key_b):
            idx = np.searchsorted(key_b, key_a)
            for cand in (np.minimum(idx, len(key_b) - 1), np.maximum(idx - 1, 0)):
                kb_c = key_b[cand]
                same = kb_c // big == doc_a
                gap = np.abs(kb_c - key_a)
                gap[~same] = np.iinfo(np.int64).max
                np.minimum.at(best, doc_a[same], gap[same])
        hit = best <= w
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(hit)),
                "min_gap": pa.array(best[hit], pa.int64()),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow").sort("doc_id")


PROXIMITY_SEARCH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}'),
                     t -> t <> '') AS lst
  FROM documents
),
pos AS (
  SELECT doc_id, lst[g.i] AS token, g.i AS p
  FROM toks, LATERAL (SELECT unnest(range(1, len(lst) + 1)) AS i) g(i)
),
a AS (SELECT doc_id, p FROM pos WHERE token = '{PROX_TERM_A}'),
b AS (SELECT doc_id, p FROM pos WHERE token = '{PROX_TERM_B}'),
g AS (
  SELECT a.doc_id, CAST(min(abs(a.p - b.p)) AS BIGINT) AS min_gap
  FROM a JOIN b USING (doc_id) GROUP BY 1
)
SELECT doc_id, min_gap FROM g WHERE min_gap <= {PROX_WINDOW} ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Jensen-Shannon distance matrix between language trigram profiles
# ---------------------------------------------------------------------------

def lang_trigram_jsd(sf_dir: str):
    """Pairwise Jensen-Shannon divergence between the languages'
    character-trigram distributions — the language-distance matrix a
    corpus curator reads next to the per-lang profiles.  Each KL half
    is the exact integer rational Σ_t c·(L(2·c·N_other) − L(c·N_other
    + c_other·N)) / (2·N) in ln-micro nats, floor-proof division (a
    rounded numerator can dip negative even though JSD ≥ 0).

    Scale shape: the same buffer-level numpy trigram partials as
    char_trigram_lang_profile fold into a (lang, trigram) count table
    bounded by langs × alphabet³; the pairwise JSD is driver math
    over that bounded fold."""
    import math

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "tri": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        arr = pc.utf8_lower(t["text"]).combine_chunks()
        n = len(arr)
        if n == 0:
            return empty
        off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        dat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
        off = off - off[0]
        if len(dat) < 3:
            return empty
        lens = np.diff(off)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        d = dat.astype(np.int64)
        tri = d[:-2] * 65536 + d[1:-1] * 256 + d[2:]
        valid = doc_idx[:-2] == doc_idx[2:]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "lang": pa.array(
                        np.asarray(
                            t["lang"].combine_chunks().take(
                                pa.array(doc_idx[:-2][valid])
                            )
                        ),
                        pa.string(),
                    ),
                    "tri": pa.array(tri[valid], pa.int64()),
                }
            ),
            ["lang", "tri"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "tri": g["tri"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cnt: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for la, tr, n in zip(
            t["lang"].to_pylist(), t["tri"].to_pylist(), t["n"].to_pylist()
        ):
            cnt[(la, tr)] = cnt.get((la, tr), 0) + n

    langs = sorted({la for la, _ in cnt})
    tot = {la: 0 for la in langs}
    by_lang: dict = {la: {} for la in langs}
    for (la, tr), n in cnt.items():
        tot[la] += n
        by_lang[la][tr] = n

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            na, nb = tot[la], tot[lb]
            ca_map, cb_map = by_lang[la], by_lang[lb]
            union = set(ca_map) | set(cb_map)
            sa = sb = 0
            for tr in union:
                ca = ca_map.get(tr, 0)
                cb = cb_map.get(tr, 0)
                den = L(ca * nb + cb * na)
                if ca:
                    sa += ca * (L(2 * ca * nb) - den)
                if cb:
                    sb += cb * (L(2 * cb * na) - den)
            rows.append(
                (la, lb, na, nb, len(union), fdiv(sa, 2 * na) + fdiv(sb, 2 * nb))
            )
    return pa.table(
        {
            "lang_a": pa.array([r[0] for r in rows], pa.string()),
            "lang_b": pa.array([r[1] for r in rows], pa.string()),
            "n_tri_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_tri_b": pa.array([r[3] for r in rows], pa.int64()),
            "n_union_trigrams": pa.array([r[4] for r in rows], pa.int64()),
            "jsd_micro": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


LANG_TRIGRAM_JSD_SQL = """
WITH t3 AS (
  SELECT lang, substr(lower(text), CAST(g.i AS INTEGER), 3) AS tri
  FROM documents,
       LATERAL (SELECT unnest(range(1, length(text) - 1)) AS i) g
),
cnt AS (SELECT lang, tri, CAST(count(*) AS BIGINT) AS n
        FROM t3 GROUP BY 1, 2),
tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nn FROM cnt GROUP BY 1),
pairs AS (
  SELECT a.lang AS la, a.nn AS na, b.lang AS lb, b.nn AS nb
  FROM tot a JOIN tot b ON a.lang < b.lang
),
u AS (
  SELECT p.la, p.lb, p.na, p.nb, c.tri,
         COALESCE(ca.n, 0) AS ca, COALESCE(cb.n, 0) AS cb
  FROM pairs p
  JOIN (SELECT DISTINCT tri FROM cnt) c ON true
  LEFT JOIN cnt ca ON ca.lang = p.la AND ca.tri = c.tri
  LEFT JOIN cnt cb ON cb.lang = p.lb AND cb.tri = c.tri
  WHERE COALESCE(ca.n, 0) + COALESCE(cb.n, 0) > 0
),
terms AS (
  SELECT la, lb, na, nb,
         CASE WHEN ca > 0 THEN ca *
           (CAST(round(ln(2 * ca * nb) * 1000000) AS BIGINT)
            - CAST(round(ln(ca * nb + cb * na) * 1000000) AS BIGINT))
           ELSE 0 END AS xa,
         CASE WHEN cb > 0 THEN cb *
           (CAST(round(ln(2 * cb * na) * 1000000) AS BIGINT)
            - CAST(round(ln(ca * nb + cb * na) * 1000000) AS BIGINT))
           ELSE 0 END AS xb
  FROM u
),
agg AS (
  SELECT la, lb, na, nb,
         CAST(count(*) AS BIGINT) AS n_union,
         CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT la AS lang_a, lb AS lang_b, na AS n_tri_a, nb AS n_tri_b,
       n_union AS n_union_trigrams,
       CAST((sa - ((sa % (2 * na) + 2 * na) % (2 * na))) // (2 * na)
            + (sb - ((sb % (2 * nb) + 2 * nb) % (2 * nb))) // (2 * nb)
            AS BIGINT) AS jsd_micro
FROM agg ORDER BY lang_a, lang_b
"""


# ---------------------------------------------------------------------------
# Per-source character-class profile (charset / content-type audit)
# ---------------------------------------------------------------------------

def source_charset_profile(sf_dir: str):
    """Byte-class mix per source — alphabetic / digit / whitespace /
    other shares in permille of total characters — the charset audit
    that catches a feed switching encodings or leaking markup.  Pure
    ``pyarrow.compute`` counting kernels; permille via truncating
    division of per-source totals.

    Scale shape: per-block (source → 5 counters) partials, bounded
    driver fold."""
    ds = _read_docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n_alpha = pc.cast(pc.count_substring_regex(t["text"], "[A-Za-z]"), pa.int64())
        n_digit = pc.cast(pc.count_substring_regex(t["text"], "[0-9]"), pa.int64())
        n_space = pc.cast(pc.count_substring_regex(t["text"], r"\s"), pa.int64())
        n_all = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        g = pa.TableGroupBy(
            pa.table(
                {
                    "source": t["source"],
                    "a": n_alpha,
                    "d": n_digit,
                    "s": n_space,
                    "n": n_all,
                }
            ),
            ["source"],
        ).aggregate([("a", "sum"), ("d", "sum"), ("s", "sum"), ("n", "sum")])
        return pa.table(
            {
                "source": g["source"],
                "a": g["a_sum"],
                "d": g["d_sum"],
                "s": g["s_sum"],
                "n": g["n_sum"],
            }
        )

    acc: dict = {}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for src, a, d, s, n in zip(
            t["source"].to_pylist(), t["a"].to_pylist(), t["d"].to_pylist(),
            t["s"].to_pylist(), t["n"].to_pylist(),
        ):
            cur = acc.setdefault(src, [0, 0, 0, 0])
            cur[0] += a
            cur[1] += d
            cur[2] += s
            cur[3] += n

    srcs = sorted(acc)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([acc[s][3] for s in srcs], pa.int64()),
            "alpha_permille": pa.array(
                [(1000 * acc[s][0]) // acc[s][3] for s in srcs], pa.int64()
            ),
            "digit_permille": pa.array(
                [(1000 * acc[s][1]) // acc[s][3] for s in srcs], pa.int64()
            ),
            "space_permille": pa.array(
                [(1000 * acc[s][2]) // acc[s][3] for s in srcs], pa.int64()
            ),
            "other_permille": pa.array(
                [
                    (1000 * (acc[s][3] - acc[s][0] - acc[s][1] - acc[s][2]))
                    // acc[s][3]
                    for s in srcs
                ],
                pa.int64(),
            ),
        }
    )


SOURCE_CHARSET_PROFILE_SQL = """
WITH c AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS a,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS d,
         CAST(length(text)
              - length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS s
  FROM documents
),
g AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n, CAST(sum(a) AS BIGINT) AS a,
         CAST(sum(d) AS BIGINT) AS d, CAST(sum(s) AS BIGINT) AS s
  FROM c GROUP BY 1
)
SELECT source, n AS n_chars,
       CAST((1000 * a) // n AS BIGINT) AS alpha_permille,
       CAST((1000 * d) // n AS BIGINT) AS digit_permille,
       CAST((1000 * s) // n AS BIGINT) AS space_permille,
       CAST((1000 * (n - a - d - s)) // n AS BIGINT) AS other_permille
FROM g ORDER BY source
"""


# ---------------------------------------------------------------------------
# Token frequency-rank drift between corpus halves
# ---------------------------------------------------------------------------

def token_rank_drift(sf_dir: str):
    """Every token's frequency rank in the first vs second half of the
    doc_id range and the rank delta — the vocabulary-drift movers
    table a tokenizer owner reviews before retraining.  Rank rule:
    count desc, token asc, ranks computed independently per half;
    tokens absent from a half rank after all present ones (count 0).

    Scale shape: ONE pass emits (half, token) count partials (the
    split is a doc_id threshold from the bounded min/max fold);
    ranking is driver math over the closed vocabulary (open-vocab
    corpora cap to top-N by global count first)."""
    ds = _read_docs(sf_dir, ["doc_id", "text"])

    mn = mx = None
    for t in map(
        ray.get,
        ds.map_batches(
            lambda t: pa.table(
                {
                    "mn": pa.array([pc.min(t["doc_id"]).as_py()], pa.int64()),
                    "mx": pa.array([pc.max(t["doc_id"]).as_py()], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).to_arrow_refs(),
    ):
        if not t.num_rows:
            continue
        for a, b in zip(t["mn"].to_pylist(), t["mx"].to_pylist()):
            mn = a if mn is None else min(mn, a)
            mx = b if mx is None else max(mx, b)
    mid = (mn + mx + 1) // 2

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        half = pc.cast(
            pc.greater_equal(pc.take(t["doc_id"], parent), mid), pa.int64()
        )
        tbl = pa.table({"half": half, "token": flat}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(tbl, ["half", "token"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "half": g["half"],
                "token": g["token"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cnt: dict = {0: {}, 1: {}}
    for t in map(
        ray.get, ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    ):
        if not t.num_rows:
            continue
        for h, w, n in zip(
            t["half"].to_pylist(), t["token"].to_pylist(), t["n"].to_pylist()
        ):
            cnt[h][w] = cnt[h].get(w, 0) + n

    vocab = sorted(set(cnt[0]) | set(cnt[1]))

    def ranks(h: int) -> dict:
        order = sorted(vocab, key=lambda w: (-cnt[h].get(w, 0), w))
        return {w: i + 1 for i, w in enumerate(order)}

    ra, rb = ranks(0), ranks(1)
    rows = sorted(
        ((w, ra[w], rb[w], rb[w] - ra[w]) for w in vocab),
        key=lambda r: (-abs(r[3]), r[0]),
    )
    return pa.table(
        {
            "token": pa.array([r[0] for r in rows], pa.string()),
            "rank_first_half": pa.array([r[1] for r in rows], pa.int64()),
            "rank_second_half": pa.array([r[2] for r in rows], pa.int64()),
            "rank_delta": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


TOKEN_RANK_DRIFT_SQL = f"""
WITH mid AS (
  SELECT (min(doc_id) + max(doc_id) + 1) // 2 AS m FROM documents
),
tok AS (
  SELECT CASE WHEN doc_id >= (SELECT m FROM mid) THEN 1 ELSE 0 END AS half,
         token
  FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
    FROM documents)
  WHERE token <> ''
),
c AS (SELECT half, token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2),
v AS (SELECT DISTINCT token FROM c),
f AS (
  SELECT v.token,
         COALESCE(a.n, 0) AS na, COALESCE(b.n, 0) AS nb
  FROM v
  LEFT JOIN c a ON a.token = v.token AND a.half = 0
  LEFT JOIN c b ON b.token = v.token AND b.half = 1
),
r AS (
  SELECT token,
         row_number() OVER (ORDER BY na DESC, token) AS rank_first_half,
         row_number() OVER (ORDER BY nb DESC, token) AS rank_second_half
  FROM f
)
SELECT token,
       CAST(rank_first_half AS BIGINT) AS rank_first_half,
       CAST(rank_second_half AS BIGINT) AS rank_second_half,
       CAST(rank_second_half - rank_first_half AS BIGINT) AS rank_delta
FROM r
ORDER BY abs(rank_second_half - rank_first_half) DESC, token
"""


# ---------------------------------------------------------------------------
# Witten-Bell interpolated bigram LM (sibling of kn_bigram_probs)
# ---------------------------------------------------------------------------

def witten_bell_bigram(sf_dir: str):
    """Witten-Bell interpolated bigram model in exact integer micro
    units: with T1 = distinct continuations of w1 as the "new event"
    mass,

      P(w2|w1) = (c12 + T1 * Pml(w2)) / (c1 + T1),

    Pml taken over the bigram successor marginal (c2 = sum_prev c12,
    N = total bigrams — the same ingredient table KN reads), giving
    one integer rational per bigram:
    prob_micro = 1e6*(c12*N + T1*c2) // ((c1+T1)*N).  Second smoother
    over the identical counts, so kn_bigram_probs vs this op isolates
    the smoothing choice for an LM-filter ablation.

    Scale shape: identical to kn_bigram_probs (pair-keyed bucketed
    aggregate, vocab^2-bounded driver fold)."""
    from document_extractor_ray.functions.bucketing import bucketed_agg

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        f = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        fa = f.to_numpy(zero_copy_only=False)
        if len(fa) < 2:
            return pa.table(
                {
                    "prev": pa.array([], pa.string()),
                    "next": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        same = par[1:] == par[:-1]
        g = pa.TableGroupBy(
            pa.table(
                {
                    "prev": pa.array(fa[:-1][same], pa.string()),
                    "next": pa.array(fa[1:][same], pa.string()),
                }
            ),
            ["prev", "next"],
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "prev": g["prev"],
                "next": g["next"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    c12: dict = {}
    for tb in map(
        ray.get,
        bucketed_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["prev", "next"],
            [("n", "sum", "n")],
        ).to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for p, nx, n in zip(
            tb["prev"].to_pylist(), tb["next"].to_pylist(), tb["n"].to_pylist()
        ):
            c12[(p, nx)] = c12.get((p, nx), 0) + int(n)
    c1: dict = {}
    t1: dict = {}
    c2: dict = {}
    big_n = 0
    for (p, nx), n in c12.items():
        c1[p] = c1.get(p, 0) + n
        t1[p] = t1.get(p, 0) + 1
        c2[nx] = c2.get(nx, 0) + n
        big_n += n
    keys = sorted(c12)
    probs = [
        (1_000_000 * (c12[k] * big_n + t1[k[0]] * c2[k[1]]))
        // ((c1[k[0]] + t1[k[0]]) * big_n)
        for k in keys
    ]
    return pa.table(
        {
            "prev": pa.array([k[0] for k in keys], pa.string()),
            "next": pa.array([k[1] for k in keys], pa.string()),
            "c12": pa.array([c12[k] for k in keys], pa.int64()),
            "prob_micro": pa.array(probs, pa.int64()),
        }
    )


WITTEN_BELL_BIGRAM_SQL = f"""
WITH raw AS (
  SELECT doc_id, string_split_regex(lower(text), '{_DF_SPLIT_RE}') AS ws
  FROM documents
),
tokpos AS (
  SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS p FROM raw
),
tok AS (
  SELECT doc_id, token,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM tokpos WHERE token <> ''
),
bg AS (
  SELECT lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         token AS next
  FROM tok
),
cc AS (
  SELECT prev, next, CAST(count(*) AS BIGINT) AS c12
  FROM bg WHERE prev IS NOT NULL GROUP BY 1, 2
),
cx AS (SELECT prev, CAST(sum(c12) AS BIGINT) AS c1,
              CAST(count(*) AS BIGINT) AS t1
       FROM cc GROUP BY prev),
nx AS (SELECT next, CAST(sum(c12) AS BIGINT) AS c2 FROM cc GROUP BY next),
b AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM cc)
SELECT cc.prev, cc.next, cc.c12,
       CAST((1000000::HUGEINT
             * (cc.c12::HUGEINT * (SELECT n FROM b)
                + cx.t1::HUGEINT * nx.c2))
            // ((cx.c1 + cx.t1)::HUGEINT * (SELECT n FROM b))
            AS BIGINT) AS prob_micro
FROM cc JOIN cx USING (prev) JOIN nx USING (next)
ORDER BY cc.prev, cc.next
"""


# ---------------------------------------------------------------------------
# Char->token linear-fit residual outliers (tokenization anomaly audit)
# ---------------------------------------------------------------------------

RESIDUAL_TOP_K = 15


def length_token_residual_outliers(sf_dir: str, k: int = RESIDUAL_TOP_K):
    """Docs whose whitespace token count deviates most from the
    corpus-wide chars->tokens least-squares line — the tokenization
    anomaly screen (a doc far ABOVE the line is fragment soup; far
    below is run-on garbage), the ranking layer on top of
    doc_len_token_corr's single correlation number.  The OLS
    coefficients are quantized to micro units with convention-proof
    floor division (part of the op definition), so
    resid_micro = 1e6*y - a_micro - b_micro*x is integer-exact and
    bounded (~1e9) at ANY corpus size.

    Scale shape: two streaming passes — a bounded moment fold, then a
    per-block top-k partial on |resid| (k rows per block reach the
    driver).  Ranking ties break by doc_id."""
    ds = _read_docs(sf_dir, ["doc_id", "n_chars", "text"])

    def moments(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = (
            pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
            }
        )

    from document_extractor_ray.functions.bucketing import fold_partials

    m = fold_partials(
        ds.map_batches(moments, batch_format="pyarrow"),
        "k",
        ["n", "sx", "sy", "sxy", "sxx"],
    )[1]
    n, sx, sy, sxy, sxx = (int(v) for v in m)
    d = n * sxx - sx * sx
    b_micro = (1_000_000 * (n * sxy - sx * sy)) // d
    a_micro = (1_000_000 * (sy * sxx - sx * sxy)) // d

    def topk(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = (
            pc.cast(pc.count_substring_regex(t["text"], r"\S+"), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        resid = 1_000_000 * y - a_micro - b_micro * x
        a = np.abs(resid)
        if len(a) > k:
            idx = np.argpartition(-a, k)[:k]
        else:
            idx = np.arange(len(a))
        dd = t["doc_id"].to_numpy(zero_copy_only=False)[idx]
        return pa.table(
            {
                "doc_id": pa.array(dd, pa.int64()),
                "n_chars": pa.array(x[idx], pa.int64()),
                "n_tokens": pa.array(y[idx], pa.int64()),
                "resid_micro": pa.array(resid[idx], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(topk, batch_format="pyarrow")
        .to_pandas()
        .assign(absr=lambda f: f["resid_micro"].abs())
        .sort_values(["absr", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(k)
        .drop(columns="absr")
    )
    return pa.table(
        {
            "doc_id": pa.array(parts["doc_id"].to_numpy().astype("int64")),
            "n_chars": pa.array(parts["n_chars"].to_numpy().astype("int64")),
            "n_tokens": pa.array(parts["n_tokens"].to_numpy().astype("int64")),
            "resid_micro": pa.array(parts["resid_micro"].to_numpy().astype("int64")),
        }
    )


LENGTH_TOKEN_RESIDUAL_SQL = f"""
WITH tok AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
  FROM tok
),
coef AS (
  SELECT
    (1000000::HUGEINT * (n * sxy - sx * sy)
     - ((((1000000::HUGEINT * (n * sxy - sx * sy)) % (n * sxx - sx * sx))
         + (n * sxx - sx * sx)) % (n * sxx - sx * sx)))
      // (n * sxx - sx * sx) AS b_micro,
    (1000000::HUGEINT * (sy * sxx - sx * sxy)
     - ((((1000000::HUGEINT * (sy * sxx - sx * sxy)) % (n * sxx - sx * sx))
         + (n * sxx - sx * sx)) % (n * sxx - sx * sx)))
      // (n * sxx - sx * sx) AS a_micro
  FROM m
),
r AS (
  SELECT doc_id, x, y,
         CAST(1000000 * y - coef.a_micro - coef.b_micro * x AS BIGINT)
           AS resid_micro
  FROM tok, coef
)
SELECT doc_id, x AS n_chars, y AS n_tokens, resid_micro
FROM r
ORDER BY abs(resid_micro) DESC, doc_id
LIMIT {RESIDUAL_TOP_K}
"""


# ---------------------------------------------------------------------------
# Front-coding (prefix compression) audit over doc_id-sorted prefixes
# ---------------------------------------------------------------------------

FRONT_PREFIX_CHARS = 32
FRONT_RANGE = 256


def front_coding_audit(
    sf_dir: str, width: int = FRONT_PREFIX_CHARS, range_size: int = FRONT_RANGE
):
    """Front-coding benefit over the doc_id-sorted stream of 32-char
    text prefixes: total chars shared with the PREDECESSOR prefix
    (the longest-common-prefix mass a front-coded index would elide;
    lcp capped at both strings' lengths).  doc_prefix_groups finds
    duplicate prefixes — this one prices the incremental encoding.

    Scale shape: the encoding_size_audit neighbor plan — the order
    dependency decomposes over deterministic doc_id RANGES: pass 1
    folds one boundary prefix per range (at the range's max doc_id),
    the driver broadcasts predecessor boundaries, pass 2 shuffles once
    by range and scores each range's pairs vectorized over a fixed
    (n, width) codepoint matrix."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.analytics import _n_blocks
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def prefixed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "prefix": pc.utf8_slice_codeunits(t["text"], 0, width),
            }
        )

    def boundary_partial(t: pa.Table) -> pa.Table:
        t = prefixed(t)
        rng = pc.divide(t["doc_id"], pa.scalar(range_size, pa.int64()))
        tb = t.append_column("rng", rng)
        g = pa.TableGroupBy(tb, ["rng"]).aggregate([("doc_id", "max")])
        idx = pc.index_in(g["doc_id_max"], value_set=tb["doc_id"])
        return pa.table(
            {
                "rng": g["rng"],
                "max_id": g["doc_id_max"],
                "prefix": tb["prefix"].take(idx),
            }
        )

    bound: dict[int, tuple] = {}
    for tb in map(
        ray.get,
        ds.map_batches(boundary_partial, batch_format="pyarrow").to_arrow_refs(),
    ):
        if not tb.num_rows:
            continue
        for r, m, p in zip(
            tb["rng"].to_pylist(), tb["max_id"].to_pylist(), tb["prefix"].to_pylist()
        ):
            r = int(r)
            if r not in bound or int(m) > bound[r][0]:
                bound[r] = (int(m), p)
    prev: dict[int, str] = {}
    rs = sorted(bound)
    for i, r in enumerate(rs):
        if i:
            prev[r] = bound[rs[i - 1]][1]
    prev_ref = state.broadcast(prev)
    n_parts = _n_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        t = prefixed(t)
        rng = pc.divide(t["doc_id"], pa.scalar(range_size, pa.int64()))
        rn = rng.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (rn * np.uint64(2654435761)) & np.uint64(0x7FFFFFFF)
        return t.append_column("rng", rng).append_column(
            "part", pa.array((h % np.uint64(n_parts)).astype(np.int32))
        )

    def _lcp_mass(prefixes: list, lead: str | None, w: int) -> tuple:
        seq = ([lead] if lead is not None else []) + prefixes
        arr = np.array(seq, dtype=f"U{w}")
        u = arr.view(np.uint32).reshape(len(arr), w)
        lens = (u != 0).sum(axis=1)
        eq = u[1:] == u[:-1]
        run = np.cumprod(eq, axis=1).sum(axis=1)
        lcp = np.minimum(run, np.minimum(lens[1:], lens[:-1]))
        total_chars = int(lens.sum()) - (int(lens[0]) if lead is not None else 0)
        return int(lcp.sum()), total_chars, len(prefixes)

    def score_partition(g: pd.DataFrame) -> pa.Table:
        pv = state.cached_get(prev_ref)
        g = g.sort_values(["rng", "doc_id"], kind="mergesort")
        rvals = g["rng"].to_numpy()
        prefs = g["prefix"].to_numpy()
        saved = chars = docs = 0
        start = 0
        for i in range(1, len(g) + 1):
            if i == len(g) or rvals[i] != rvals[start]:
                s, c, n = _lcp_mass(
                    list(prefs[start:i]), pv.get(int(rvals[start])), width
                )
                saved += s
                chars += c
                docs += n
                start = i
        return pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "n_docs": pa.array([docs], pa.int64()),
                "prefix_chars": pa.array([chars], pa.int64()),
                "lcp_chars_saved": pa.array([saved], pa.int64()),
            }
        )

    tot = fold_partials(
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(score_partition, batch_format="pandas"),
        "k",
        ["n_docs", "prefix_chars", "lcp_chars_saved"],
    )[1]
    n_docs, chars, saved = (int(v) for v in tot)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "prefix_chars": pa.array([chars], pa.int64()),
            "lcp_chars_saved": pa.array([saved], pa.int64()),
            "savings_permille": pa.array(
                [1000 * saved // chars if chars else 0], pa.int64()
            ),
        }
    )


FRONT_CODING_AUDIT_SQL = f"""
WITH p AS (
  SELECT doc_id, substr(text, 1, {FRONT_PREFIX_CHARS}) AS prefix
  FROM documents
),
w AS (
  SELECT doc_id, prefix,
         lag(prefix) OVER (ORDER BY doc_id) AS prev
  FROM p
),
l AS (
  SELECT doc_id, length(prefix) AS plen,
         CASE WHEN prev IS NULL THEN 0
              ELSE (SELECT max(r.p) FROM range(0, {FRONT_PREFIX_CHARS + 1}) r(p)
                    WHERE r.p <= least(length(prefix), length(prev))
                      AND substr(prefix, 1, CAST(r.p AS INTEGER))
                          = substr(prev, 1, CAST(r.p AS INTEGER)))
         END AS lcp
  FROM w
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(plen) AS BIGINT) AS prefix_chars,
       CAST(sum(lcp) AS BIGINT) AS lcp_chars_saved,
       CAST(CASE WHEN sum(plen) > 0
                 THEN 1000 * sum(lcp) // sum(plen) ELSE 0 END AS BIGINT)
         AS savings_permille
FROM l
"""


# ---------------------------------------------------------------------------
# FORCAST-style readability per source (no sentence punctuation needed)
# ---------------------------------------------------------------------------

def readability_profile(sf_dir: str):
    """FORCAST readability grade per source: grade = 20 - M/10 where
    M is the monosyllabic-word count per 150 words — the one classic
    readability formula that needs NO sentence boundaries (the corpus
    has none), so it survives boilerplate-stripped web text where
    punctuation was lost.  Syllables are maximal ``[aeiouy]+`` runs
    (the standard cheap proxy); a word is monosyllabic when it
    contains exactly one run.  Emitted per source: doc/word/syllable/
    monosyllable totals plus ``forcast_milli`` =
    20000 - 15000*mono // words (exact integer milli-grades).

    Scale shape: per-block (source -> 4 counters) partials from pure
    ``pyarrow.compute`` kernels (run counting via non-overlapping
    regex matches; per-word analysis on the flattened split with
    ``list_parent_indices`` — zero Python per row), bounded driver
    fold on the source domain."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(t["text"])
        w = pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64())
        y = pc.cast(pc.count_substring_regex(txt, "[aeiouy]+"), pa.int64())
        words = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(words)
        parent = pc.list_parent_indices(words)
        mono = pc.and_(
            pc.greater(pc.utf8_length(flat), 0),
            pc.equal(pc.count_substring_regex(flat, "[aeiouy]+"), 1),
        )
        mono_src = pc.take(t["source"], pc.filter(parent, mono))
        g1 = pa.TableGroupBy(
            pa.table({"source": t["source"], "w": w, "y": y}), ["source"]
        ).aggregate([("w", "sum"), ("y", "sum"), ([], "count_all")])
        g2 = pa.TableGroupBy(pa.table({"source": mono_src}), ["source"]).aggregate(
            [([], "count_all")]
        )
        zero1 = pa.nulls(g1.num_rows, pa.int64()).fill_null(0)
        zero2 = pa.nulls(g2.num_rows, pa.int64()).fill_null(0)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "source": g1["source"],
                        "n_docs": pc.cast(g1["count_all"], pa.int64()),
                        "w": g1["w_sum"],
                        "y": g1["y_sum"],
                        "mono": zero1,
                    }
                ),
                pa.table(
                    {
                        "source": g2["source"],
                        "n_docs": zero2,
                        "w": zero2,
                        "y": zero2,
                        "mono": pc.cast(g2["count_all"], pa.int64()),
                    }
                ),
            ]
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "source",
        ["n_docs", "w", "y", "mono"],
    )
    rows = []
    for src in sorted(acc):
        n_docs, w, y, mono = acc[src]
        grade = 20000 - (15000 * mono) // w if w > 0 else 20000
        rows.append((src, n_docs, w, y, mono, grade))
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_words": pa.array([r[2] for r in rows], pa.int64()),
            "n_syllables": pa.array([r[3] for r in rows], pa.int64()),
            "n_mono": pa.array([r[4] for r in rows], pa.int64()),
            "forcast_milli": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


READABILITY_PROFILE_SQL = """
WITH d AS (
  SELECT source, lower(text) AS txt FROM documents
),
c AS (
  SELECT source,
         CAST(length(regexp_replace(txt, '\\S+', '#', 'g'))
              - length(regexp_replace(txt, '\\S+', '', 'g')) AS BIGINT) AS w,
         CAST(length(regexp_replace(txt, '[aeiouy]+', '#', 'g'))
              - length(regexp_replace(txt, '[aeiouy]+', '', 'g')) AS BIGINT) AS y
  FROM d
),
m AS (
  SELECT source, CAST(count(*) AS BIGINT) AS mono
  FROM d, unnest(regexp_split_to_array(d.txt, '\\s+')) AS u(tok)
  WHERE length(tok) > 0
    AND length(regexp_replace(tok, '[aeiouy]+', '#', 'g'))
        - length(regexp_replace(tok, '[aeiouy]+', '', 'g')) = 1
  GROUP BY 1
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS w, CAST(sum(y) AS BIGINT) AS y
  FROM c GROUP BY 1
)
SELECT g.source, g.n_docs, g.w AS n_words, g.y AS n_syllables,
       CAST(COALESCE(m.mono, 0) AS BIGINT) AS n_mono,
       CAST(CASE WHEN g.w > 0
                 THEN 20000 - (15000 * COALESCE(m.mono, 0)) // g.w
                 ELSE 20000 END AS BIGINT) AS forcast_milli
FROM g LEFT JOIN m ON m.source = g.source
ORDER BY g.source
"""


# ---------------------------------------------------------------------------
# Calibration bins: alpha-share quality score vs the lang=='en' label
# ---------------------------------------------------------------------------

def quality_calibration_bins(sf_dir: str):
    """Reliability-diagram bins for the alpha-share quality score
    (permille of ``[A-Za-z]`` chars) against the ``lang == 'en'``
    label — quality_auc's ranking view answered in calibration terms:
    per fixed permille decade [0,10),[10,20),... the doc count,
    positive count, exact positive rate (permille) and mean score
    (permille, floor) — the "is the score's 700 actually 70% en?"
    check every quality-classifier deployment needs before
    thresholding at corpus scale.

    Scale shape: per-block (bin -> n, pos, score-sum) partials from
    pure pyarrow kernels, 10-key driver fold."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t["text"])
        a = pc.count_substring_regex(t["text"], "[A-Za-z]")
        a64 = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
        n64 = pc.cast(n, pa.int64()).to_numpy(zero_copy_only=False)
        score = np.where(n64 > 0, (1000 * a64) // np.maximum(n64, 1), 0)
        b = np.minimum(score // 10, 99)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "bin": pa.array(b, pa.int64()),
                    "pos": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
                    "score": pa.array(score, pa.int64()),
                }
            ),
            ["bin"],
        ).aggregate([("pos", "sum"), ("score", "sum"), ([], "count_all")])
        return pa.table(
            {
                "bin": g["bin"],
                "pos": g["pos_sum"],
                "score": g["score_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "bin",
        ["pos", "score", "n"],
    )
    bins = sorted(acc)
    return pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "n_docs": pa.array([acc[b][2] for b in bins], pa.int64()),
            "n_pos": pa.array([acc[b][0] for b in bins], pa.int64()),
            "pos_rate_permille": pa.array(
                [1000 * acc[b][0] // acc[b][2] for b in bins], pa.int64()
            ),
            "mean_score_permille": pa.array(
                [acc[b][1] // acc[b][2] for b in bins], pa.int64()
            ),
        }
    )


QUALITY_CALIBRATION_SQL = """
WITH s AS (
  SELECT CASE WHEN length(text) > 0
              THEN (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   // length(text)
              ELSE 0 END AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
b AS (SELECT least(score // 10, 99) AS bin, pos, score FROM s)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(1000 * sum(pos) // count(*) AS BIGINT) AS pos_rate_permille,
       CAST(sum(score) // count(*) AS BIGINT) AS mean_score_permille
FROM b GROUP BY bin ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Pairwise KS distance matrix between sources on doc length
# ---------------------------------------------------------------------------

def source_length_ks_matrix(sf_dir: str):
    """Exact two-sample KS ingredients for EVERY source pair on the
    doc-length distribution: ks_num = max_v |cum_a(v)·n_b −
    cum_b(v)·n_a| (so D = ks_num / (n_a·n_b) is the consumer's one
    division) — value_ks_types' single-pair test scaled to the full
    source x source drift matrix, the feed-divergence screen that
    flags which ingestion sources stopped looking alike.

    Scale shape: ONE (source, length) histogram fold (bounded by
    sources x distinct lengths, the length_mannwhitney bound), then a
    vectorized cumsum + 190-pair numpy sweep on the driver — the
    all-pairs matrix costs pairs x |lengths| integer ops, zero
    additional passes over the data."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["source", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "v": g["n_chars"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["source", "v"], "n"
    )
    sources = sorted({s for (s, _) in cells})
    vals = sorted({v for (_, v) in cells})
    v_idx = {v: i for i, v in enumerate(vals)}
    s_idx = {s: i for i, s in enumerate(sources)}
    hist = np.zeros((len(sources), len(vals)), np.int64)
    for (s, v), n in cells.items():
        hist[s_idx[s], v_idx[v]] = n
    cum = np.cumsum(hist, axis=1)
    tot = cum[:, -1]
    rows = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            ks = int(np.abs(cum[i] * tot[j] - cum[j] * tot[i]).max())
            rows.append((sources[i], sources[j], int(tot[i]), int(tot[j]), ks))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "ks_num": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SOURCE_LENGTH_KS_SQL = """
WITH c AS (
  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
grid AS (SELECT DISTINCT v FROM c),
cells AS (
  SELECT s.source, g.v, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN grid g
  LEFT JOIN c ON c.source = s.source AND c.v = g.v
),
cum AS (
  SELECT source, v,
         CAST(sum(n) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cw
  FROM cells
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(any_value(ta.nt) AS BIGINT) AS n_a,
       CAST(any_value(tb.nt) AS BIGINT) AS n_b,
       CAST(max(abs(a.cw * tb.nt - b.cw * ta.nt)) AS BIGINT) AS ks_num
FROM cum a
JOIN cum b ON b.v = a.v AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Language run-clustering in doc_id order (multi-category runs test)
# ---------------------------------------------------------------------------

def lang_run_clustering(sf_dir: str):
    """Multi-category Wald-Wolfowitz ingredients for HOW CLUSTERED the
    ``lang`` column sits in doc_id order: observed run count plus the
    exact integers (n, Σ n_l²) behind the expected-runs formula
    E[runs] = n - (Σ n_l² - n)/(n - 1) under random arrangement —
    observed far below expected means language-blocked storage (good
    for compression and per-lang scans, bad for sampling without a
    shuffle).  One row: n_docs, n_langs, observed_runs, sum_nl_sq.

    Scale shape: per-block (min_id, max_id, first/last lang, runs)
    summaries merge on the driver in id order (presortedness_audit's
    segmented-scan monoid, equality flavor); lang counts fold on the
    bounded lang domain."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["doc_id", "lang"])

    def counts(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["lang"]), ["lang"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"lang": g["lang"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    lang_n = fold_partials(
        ds.map_batches(counts, batch_format="pyarrow"), "lang", "n"
    )

    def summarize(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t["doc_id"])
        t = t.take(idx)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        langs = t["lang"].to_pylist()
        runs = 1 + sum(1 for a, b in zip(langs, langs[1:]) if a != b)
        return pa.table(
            {
                "min_id": pa.array([int(ids[0])], pa.int64()),
                "max_id": pa.array([int(ids[-1])], pa.int64()),
                "runs": pa.array([runs], pa.int64()),
                "first_lang": pa.array([langs[0]], pa.string()),
                "last_lang": pa.array([langs[-1]], pa.string()),
            }
        )

    import ray as _ray

    blocks = [
        t
        for t in map(
            _ray.get,
            ds.map_batches(summarize, batch_format="pyarrow").to_arrow_refs(),
        )
        if t.num_rows
    ]
    rows = pa.concat_tables(blocks).to_pylist()
    rows.sort(key=lambda r: r["min_id"])
    for prev, cur in zip(rows, rows[1:]):
        if cur["min_id"] <= prev["max_id"]:
            raise ValueError("lang_run_clustering: overlapping id ranges")
    observed = sum(r["runs"] for r in rows) - sum(
        1
        for prev, cur in zip(rows, rows[1:])
        if prev["last_lang"] == cur["first_lang"]
    )
    n = sum(lang_n.values())
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_langs": pa.array([len(lang_n)], pa.int64()),
            "observed_runs": pa.array([observed], pa.int64()),
            "sum_nl_sq": pa.array(
                [sum(v * v for v in lang_n.values())], pa.int64()
            ),
        }
    )


LANG_RUN_CLUSTERING_SQL = """
WITH w AS (
  SELECT lang, lag(lang) OVER (ORDER BY doc_id) AS prev
  FROM documents
),
c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1)
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_langs,
       CAST((SELECT count(*) FROM w
             WHERE prev IS NULL OR prev <> lang) AS BIGINT) AS observed_runs,
       CAST((SELECT sum(n * n) FROM c) AS BIGINT) AS sum_nl_sq
"""


# ---------------------------------------------------------------------------
# Standardized type-token ratio (fixed 100-token windows) per source
# ---------------------------------------------------------------------------

STTR_WINDOW = 100


def sttr_by_source(sf_dir: str, window: int = STTR_WINDOW):
    """Standardized type-token ratio per source: docs are cut into
    fixed 100-token windows (doc-local, remainder window kept) and the
    distinct-type counts of every window are summed —
    sttr_permille = 1000·Σ distinct / Σ tokens.  Plain TTR collapses
    as docs grow (types saturate); fixing the window makes lexical
    diversity comparable across sources with different length mixes —
    the standard corpus-linguistics fix.

    Scale shape: a doc lives in ONE row, so per-batch Arrow
    group-distinct over (doc, window, token) IS the global distinct —
    no cross-block dedup exists by construction; only (source -> 3
    counters) partials fold on the driver."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        # doc-local token position -> window index
        starts = np.flatnonzero(np.diff(np.concatenate(([-1], parent))))
        pos = np.arange(len(parent)) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(parent)])))
        )
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        tbl = pa.table(
            {
                "doc": pa.array(parent[keep], pa.int64()),
                "w": pa.array(pos[keep] // window, pa.int64()),
                "tok": flat.filter(pa.array(keep)),
            }
        )
        g = pa.TableGroupBy(tbl, ["doc", "w", "tok"]).aggregate([([], "count_all")])
        # distinct types per (doc, window) roll up to the source
        src_of = t["source"]
        dist = pa.TableGroupBy(g.select(["doc", "w"]), ["doc", "w"]).aggregate(
            [([], "count_all")]
        )
        src_d = pc.take(src_of, dist["doc"])
        gd = pa.TableGroupBy(
            pa.table(
                {"source": src_d, "d": pc.cast(dist["count_all"], pa.int64())}
            ),
            ["source"],
        ).aggregate([("d", "sum"), ([], "count_all")])
        # token totals per source (post empty-filter)
        src_t = pc.take(src_of, tbl["doc"])
        gt = pa.TableGroupBy(pa.table({"source": src_t}), ["source"]).aggregate(
            [([], "count_all")]
        )
        zero_d = pa.nulls(gd.num_rows, pa.int64()).fill_null(0)
        zero_t = pa.nulls(gt.num_rows, pa.int64()).fill_null(0)
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "source": gd["source"],
                        "distinct": gd["d_sum"],
                        "windows": pc.cast(gd["count_all"], pa.int64()),
                        "tokens": zero_d,
                    }
                ),
                pa.table(
                    {
                        "source": gt["source"],
                        "distinct": zero_t,
                        "windows": zero_t,
                        "tokens": pc.cast(gt["count_all"], pa.int64()),
                    }
                ),
            ]
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "source",
        ["distinct", "windows", "tokens"],
    )
    srcs = sorted(acc)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "n_windows": pa.array([acc[s][1] for s in srcs], pa.int64()),
            "n_tokens": pa.array([acc[s][2] for s in srcs], pa.int64()),
            "sum_distinct": pa.array([acc[s][0] for s in srcs], pa.int64()),
            "sttr_permille": pa.array(
                [1000 * acc[s][0] // acc[s][2] for s in srcs], pa.int64()
            ),
        }
    )


# token-position bound: docs are length-capped (577 chars at sf0.1),
# so 4096 covers any per-doc token count; the range-lateral replaces
# WITH ORDINALITY (not implemented in DuckDB)
STTR_BY_SOURCE_SQL = f"""
WITH arr AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> length(x) > 0) AS a
  FROM documents
),
tk AS (
  SELECT arr.doc_id, arr.source, arr.a[CAST(i.i AS INTEGER)] AS tok,
         CAST((i.i - 1) // {STTR_WINDOW} AS BIGINT) AS w
  FROM arr, range(1, 4096) i(i)
  WHERE i.i <= len(arr.a)
),
dw AS (
  SELECT doc_id, source, w, CAST(count(DISTINCT tok) AS BIGINT) AS d
  FROM tk GROUP BY 1, 2, 3
),
g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(d) AS BIGINT) AS sum_distinct
  FROM dw GROUP BY 1
),
t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY 1)
SELECT g.source, g.n_windows, t.n_tokens, g.sum_distinct,
       CAST(1000 * g.sum_distinct // t.n_tokens AS BIGINT) AS sttr_permille
FROM g JOIN t USING (source)
ORDER BY g.source
"""


# ---------------------------------------------------------------------------
# Pairwise 1-Wasserstein (EMD) matrix between sources on doc length
# ---------------------------------------------------------------------------

def source_length_emd_matrix(sf_dir: str):
    """Exact 1-Wasserstein (earth-mover) numerators for every source
    pair on doc length: emd_num = Σ_v |cum_a(v)·n_b − cum_b(v)·n_a| ·
    (v_next − v), so W₁ = emd_num / (n_a·n_b) is the consumer's one
    division — the INTEGRAL drift companion to
    source_length_ks_matrix's sup-norm (EMD sees mass moved a long
    way; KS only sees the worst single crossing).

    Scale shape: identical to the KS matrix — one (source, length)
    histogram fold, cumsum + 190-pair vectorized sweep on the
    driver."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["source", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "v": g["n_chars"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["source", "v"], "n"
    )
    sources = sorted({s for (s, _) in cells})
    vals = np.array(sorted({v for (_, v) in cells}), np.int64)
    v_idx = {int(v): i for i, v in enumerate(vals)}
    s_idx = {s: i for i, s in enumerate(sources)}
    hist = np.zeros((len(sources), len(vals)), np.int64)
    for (s, v), n in cells.items():
        hist[s_idx[s], v_idx[int(v)]] = n
    cum = np.cumsum(hist, axis=1)
    tot = cum[:, -1]
    gaps = np.diff(vals)  # width between consecutive observed lengths
    rows = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            diff = np.abs(cum[i][:-1] * tot[j] - cum[j][:-1] * tot[i])
            emd = int((diff.astype(object) * gaps.astype(object)).sum())
            rows.append((sources[i], sources[j], int(tot[i]), int(tot[j]), emd))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "emd_num": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SOURCE_LENGTH_EMD_SQL = """
WITH c AS (
  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
grid AS (
  SELECT v, lead(v) OVER (ORDER BY v) AS v_next
  FROM (SELECT DISTINCT v FROM c)
),
cells AS (
  SELECT s.source, g.v, g.v_next, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN grid g
  LEFT JOIN c ON c.source = s.source AND c.v = g.v
),
cum AS (
  SELECT source, v, v_next,
         CAST(sum(n) OVER (PARTITION BY source ORDER BY v) AS BIGINT) AS cw
  FROM cells
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(any_value(ta.nt) AS BIGINT) AS n_a,
       CAST(any_value(tb.nt) AS BIGINT) AS n_b,
       CAST(sum(abs(a.cw * tb.nt - b.cw * ta.nt) * (a.v_next - a.v))
            FILTER (WHERE a.v_next IS NOT NULL) AS BIGINT) AS emd_num
FROM cum a
JOIN cum b ON b.v = a.v AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Posting-list delta-gap bit cost for the top-df tokens (index planner)
# ---------------------------------------------------------------------------

POSTINGS_GAP_TOP_K = 20


def _bits_case_sql(col: str) -> str:
    """Exact bit_length(x) for positive BIGINT as a CASE ladder (no
    float log2 — boundary values must not round)."""
    whens = "\n".join(
        f"    WHEN {col} < {1 << b} THEN {b}" for b in range(1, 63)
    )
    return f"(CASE\n{whens}\n    ELSE 63 END)"


def postings_gap_bits(sf_dir: str, k: int = POSTINGS_GAP_TOP_K):
    """Delta-gap compression cost of the inverted index for the top-k
    document-frequency tokens: postings sorted by doc_id, each gap
    (first = doc_id+1) costing exactly bit_length(gap) bits, vs the
    64·df raw cost — the index-layout planner's "is delta coding
    worth it per term" table.  gap_bits is exact (integer bit_length
    on both engines; the SQL side uses a CASE ladder, never float
    log2).

    Scale shape: the (token, doc_id) distinct explode rides the
    vocabulary-bounded shuffle every df op here uses; the per-token
    gap scan is ``groupby(token).map_groups`` over the top-k token set
    (k rows out).  At 10^12 docs per-token postings stream through the
    same sort; only the 3-int summary returns."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks).combine_chunks()
        parent = pc.list_parent_indices(toks)
        keep = pc.greater(pc.utf8_length(flat), 0)
        tbl = pa.table(
            {
                "tok": flat.filter(keep),
                "doc_id": pc.take(t["doc_id"], parent).filter(keep),
            }
        )
        g = pa.TableGroupBy(tbl, ["tok", "doc_id"]).aggregate([([], "count_all")])
        return pa.table({"tok": g["tok"], "doc_id": g["doc_id"]})

    postings = ds.map_batches(explode, batch_format="pyarrow")
    # df per token (vocab-bounded fold) -> the top-k term set
    def df_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t.select(["tok"]), ["tok"]).aggregate([([], "count_all")])
        return pa.table(
            {"tok": g["tok"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    df = fold_partials(
        postings.map_batches(df_partial, batch_format="pyarrow"), "tok", "n"
    )
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    chosen = pa.array([t for t, _ in top], pa.string())

    def gap_scan(t: pa.Table) -> pa.Table:
        ids = np.sort(t["doc_id"].to_numpy(zero_copy_only=False))
        gaps = np.diff(np.concatenate(([-1], ids)))
        bits = sum(int(g).bit_length() for g in gaps)
        return pa.table(
            {
                "token": pa.array([t["tok"][0].as_py()], pa.string()),
                "df": pa.array([len(ids)], pa.int64()),
                "gap_bits": pa.array([bits], pa.int64()),
            }
        )

    out = (
        postings.map_batches(
            lambda t: t.filter(pc.is_in(t["tok"], value_set=chosen)),
            batch_format="pyarrow",
        )
        .groupby("tok")
        .map_groups(gap_scan, batch_format="pyarrow")
    )
    import ray as _ray

    tabs = [t for t in map(_ray.get, out.to_arrow_refs()) if t.num_rows]
    res = pa.concat_tables(tabs).combine_chunks().to_pylist()
    res.sort(key=lambda r: (-r["df"], r["token"]))
    return pa.table(
        {
            "token": pa.array([r["token"] for r in res], pa.string()),
            "df": pa.array([r["df"] for r in res], pa.int64()),
            "raw_bits": pa.array([64 * r["df"] for r in res], pa.int64()),
            "gap_bits": pa.array([r["gap_bits"] for r in res], pa.int64()),
            "savings_permille": pa.array(
                [
                    1000 * (64 * r["df"] - r["gap_bits"]) // (64 * r["df"])
                    for r in res
                ],
                pa.int64(),
            ),
        }
    )


POSTINGS_GAP_BITS_SQL = f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> length(x) > 0) AS a
  FROM documents
),
p AS (
  SELECT DISTINCT arr.a[CAST(i.i AS INTEGER)] AS token, arr.doc_id
  FROM arr, range(1, 4096) i(i) WHERE i.i <= len(arr.a)
),
df AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df,
         row_number() OVER (ORDER BY count(*) DESC, token) AS rk
  FROM p GROUP BY 1
),
top AS (SELECT token, df FROM df WHERE rk <= {POSTINGS_GAP_TOP_K}),
g AS (
  SELECT p.token,
         p.doc_id - COALESCE(lag(p.doc_id) OVER (
             PARTITION BY p.token ORDER BY p.doc_id), -1) AS gap
  FROM p JOIN top ON top.token = p.token
),
b AS (
  SELECT token, CAST(sum({_bits_case_sql('gap')}) AS BIGINT) AS gap_bits
  FROM g GROUP BY 1
)
SELECT top.token, top.df,
       CAST(64 * top.df AS BIGINT) AS raw_bits,
       b.gap_bits,
       CAST(1000 * (64 * top.df - b.gap_bits) // (64 * top.df) AS BIGINT)
         AS savings_permille
FROM top JOIN b USING (token)
ORDER BY top.df DESC, top.token
"""


# ---------------------------------------------------------------------------
# Corpus coverage curve of the top-k most frequent types
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_KS = (1, 2, 4, 8, 16)


def vocab_coverage_curve(sf_dir: str):
    """Cumulative corpus coverage of the k most frequent types for
    k in {1,2,4,8,16}: covered tokens and exact permille of all
    tokens — vocab_prune_plan's band census turned into the curve a
    tokenizer-budget decision actually reads ("16 types already cover
    X‰").  Rank ties break by token text ASC on both engines.

    Scale shape: ONE vocabulary-bounded term-frequency fold; the
    curve is a sorted cumsum over the |V|-row driver table."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        g = pa.TableGroupBy(pa.table({"tok": flat}), ["tok"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"tok": g["tok"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    tf = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "tok", "n"
    )
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    rows = []
    for k in VOCAB_COVERAGE_KS:
        cov = sum(n for _, n in ranked[:k])
        rows.append((k, min(k, len(ranked)), cov, 1000 * cov // total))
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "n_types_used": pa.array([r[1] for r in rows], pa.int64()),
            "covered_tokens": pa.array([r[2] for r in rows], pa.int64()),
            "coverage_permille": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


VOCAB_COVERAGE_SQL = f"""
WITH arr AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> length(x) > 0) AS a
  FROM documents
),
tk AS (
  SELECT arr.a[CAST(i.i AS INTEGER)] AS tok
  FROM arr, range(1, 4096) i(i) WHERE i.i <= len(arr.a)
),
tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n,
         row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
  FROM tk GROUP BY 1
),
cum AS (
  SELECT rk, CAST(sum(n) OVER (ORDER BY rk) AS BIGINT) AS cov FROM tf
),
ks AS (SELECT unnest([{", ".join(str(k) for k in VOCAB_COVERAGE_KS)}]) AS k),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS v FROM tf)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(least(ks.k, tot.v) AS BIGINT) AS n_types_used,
       CAST(COALESCE((SELECT cov FROM cum
                      WHERE cum.rk = least(ks.k, tot.v)), 0) AS BIGINT)
         AS covered_tokens,
       CAST(1000 * COALESCE((SELECT cov FROM cum
                             WHERE cum.rk = least(ks.k, tot.v)), 0)
            // tot.t AS BIGINT) AS coverage_permille
FROM ks, tot ORDER BY k
"""


# ---------------------------------------------------------------------------
# Pairwise Cramér-von Mises matrix between sources on doc length
# ---------------------------------------------------------------------------

def source_length_cvm_matrix(sf_dir: str):
    """Exact Cramér-von Mises numerators for every source pair on doc
    length: cvm_num = Σ_v (cum_a(v)·n_b − cum_b(v)·n_a)² · nt(v) with
    nt the pooled count at v — the L2 member completing the drift
    trilogy (KS = sup norm, EMD = L1, CvM = L2-weighted); CvM sees
    persistent moderate divergence that KS's single crossing misses
    and EMD's tail mass can drown.  Normalization (÷ (n_a·n_b)²·N) is
    the consumer's division.

    int64 ceiling: cvm_num grows as (n_a·n_b)²·N ≈ n⁵ — exact to
    ~10⁵ docs per source pair in the Arrow output (Python ints are
    exact throughout; SQL side runs HUGEINT).  Past that, emit per-
    pair HUGEINT-as-string or quantize lengths first.

    Scale shape: the same single (source, length) histogram fold the
    KS and EMD matrices ride; 190-pair vectorized object-int sweep on
    the driver."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["source", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "v": g["n_chars"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cells = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["source", "v"], "n"
    )
    sources = sorted({s for (s, _) in cells})
    vals = sorted({v for (_, v) in cells})
    v_idx = {v: i for i, v in enumerate(vals)}
    s_idx = {s: i for i, s in enumerate(sources)}
    hist = np.zeros((len(sources), len(vals)), np.int64)
    for (s, v), n in cells.items():
        hist[s_idx[s], v_idx[v]] = n
    cum = np.cumsum(hist, axis=1).astype(object)
    tot = cum[:, -1]
    rows = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            nt = (hist[i] + hist[j]).astype(object)
            diff = cum[i] * tot[j] - cum[j] * tot[i]
            cvm = int((diff * diff * nt).sum())
            rows.append((sources[i], sources[j], int(tot[i]), int(tot[j]), cvm))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "cvm_num": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


SOURCE_LENGTH_CVM_SQL = """
WITH c AS (
  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
grid AS (SELECT DISTINCT v FROM c),
cells AS (
  SELECT s.source, g.v, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN grid g
  LEFT JOIN c ON c.source = s.source AND c.v = g.v
),
cum AS (
  SELECT source, v, n,
         CAST(sum(n) OVER (PARTITION BY source ORDER BY v) AS HUGEINT) AS cw
  FROM cells
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(any_value(ta.nt) AS BIGINT) AS n_a,
       CAST(any_value(tb.nt) AS BIGINT) AS n_b,
       CAST(sum((a.cw * tb.nt - b.cw * ta.nt)
                * (a.cw * tb.nt - b.cw * ta.nt)
                * (a.n + b.n)) AS BIGINT) AS cvm_num
FROM cum a
JOIN cum b ON b.v = a.v AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, data selection via
# importance resampling) under an add-1-smoothed unigram LM pair
# ---------------------------------------------------------------------------


def dsir_importance_weights(sf_dir: str, k: int = 100):
    """DSIR importance weights for target-aware data selection: score
    every document in the raw pool by how much more likely its tokens
    are under the TARGET domain's unigram LM than under the raw pool's
    (Xie et al. 2023, arXiv:2302.03169 — here with explicit unigram
    features and add-1 smoothing instead of hashed n-grams so the
    oracle is exact).  Target = the lexicographically smallest
    ``source`` value; weight(d) = Σ_occ [L(ct+1) − L(cr+1)] +
    n_tok·[L(Nr+V) − L(Nt+V)] in micro-nats with L(v) =
    round(ln(v)·1e6) (the xent family's integer-log convention);
    emits the top-k raw-pool docs (target-source docs excluded — they
    are the exemplar set, not candidates).

    Scale shape: ONE (token → cr, ct) vocabulary fold via
    ``bucketed_agg`` (shuffle bounded by distinct tokens); the
    per-token weight table is computed once on the driver (memoized
    ln per distinct count) and broadcast; scoring is one vectorized
    index_in + np.add.at segment-sum per batch; top-k via sort+limit
    on the slim (doc_id, n_tok, weight) table."""
    from document_extractor_ray import state
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["doc_id", "source", "text"])

    def src_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"source": t["source"]}), ["source"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"source": g["source"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    srcs = fold_partials(
        ds.map_batches(src_partial, batch_format="pyarrow"), "source", "n"
    )
    target = min(srcs)

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        src = pc.take(t["source"], parent)
        is_t = pc.cast(pc.equal(src, target), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"token": flat, "is_t": is_t}), ["token"]
        ).aggregate([("is_t", "sum"), ([], "count_all")])
        return pa.table(
            {
                "token": g["token"],
                "ct_part": g["is_t_sum"],
                "cr_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    vocab = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["token"],
        [("cr_part", "sum", "cr"), ("ct_part", "sum", "ct")],
    ).materialize()
    vt = pa.concat_tables(
        tb for tb in map(ray.get, vocab.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()

    ln_cache: dict = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    cr = vt["cr"].to_numpy(zero_copy_only=False)
    ct = vt["ct"].to_numpy(zero_copy_only=False)
    n_raw, n_tgt, v_size = int(cr.sum()), int(ct.sum()), len(cr)
    w = np.array(
        [L(int(a) + 1) - L(int(b) + 1) for a, b in zip(ct, cr)], dtype=np.int64
    )
    shift = L(n_raw + v_size) - L(n_tgt + v_size)
    ref = state.broadcast((vt["token"].combine_chunks(), w))

    def score(t: pa.Table) -> pa.Table:
        tokens, wt = state.cached_get(ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        par = parent.filter(keep).to_numpy(zero_copy_only=False)
        ntok = np.zeros(t.num_rows, np.int64)
        num = np.zeros(t.num_rows, np.int64)
        if len(flat):
            idx = pc.index_in(flat, value_set=tokens).to_numpy(zero_copy_only=False)
            np.add.at(num, par, wt[idx])
            np.add.at(ntok, par, 1)
        out = pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "n_tok": pa.array(ntok),
                "dsir_micro": pa.array(num + ntok * shift),
            }
        )
        mask = pc.and_(pa.array(ntok > 0), pc.not_equal(t["source"], target))
        return out.filter(mask)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["dsir_micro", "doc_id"], descending=[True, False])
        .limit(k)
    )


DSIR_IMPORTANCE_SQL = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, source, token FROM tok WHERE token <> ''),
tgt AS (SELECT min(source) AS s FROM documents),
cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cr,
         CAST(count(*) FILTER (WHERE source = (SELECT s FROM tgt))
              AS BIGINT) AS ct
  FROM tk GROUP BY 1
),
tot AS (
  SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt,
         CAST(count(*) AS BIGINT) AS v
  FROM cnt
)
SELECT tk.doc_id, tk.source AS source,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(CAST(round(ln(c.ct + 1) * 1000000) AS BIGINT)
                - CAST(round(ln(c.cr + 1) * 1000000) AS BIGINT))
            + count(*)
              * (CAST(round(ln((SELECT nr + v FROM tot)) * 1000000) AS BIGINT)
                 - CAST(round(ln((SELECT nt + v FROM tot)) * 1000000) AS BIGINT))
            AS BIGINT) AS dsir_micro
FROM tk JOIN cnt c USING (token)
WHERE tk.source <> (SELECT s FROM tgt)
GROUP BY tk.doc_id, tk.source
ORDER BY dsir_micro DESC, tk.doc_id
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Burrows' Delta stylometric distance between sources (MAD-scaled)
# ---------------------------------------------------------------------------


def burrows_delta_sources(sf_dir: str, m: int = 50):
    """Burrows' Delta between every pair of sources over the corpus's
    top-m tokens — the classic stylometric authorship distance, in the
    integer-exact MAD-scaled form (Argamon's median-based variant):
    f_st = ⌊10⁹·c_st / n_s⌋ (per-source relative frequency), per-token
    spread MAD_t = lower-median of |f_st − lower-median_s(f_st)| across
    sources, and Δ(a,b) = Σ_{t: MAD_t>0} ⌊10⁶·|f_at − f_bt| / MAD_t⌋ —
    which sources write alike, the corpus-mixing diagnostic next to
    source_lm_divergence (KL) and the drift matrices (KS/EMD/CvM on
    lengths).

    Scale shape: one vocabulary fold picks the top-m tokens (bounded
    shuffle); per-(source, token∈top-m) counts fold on the m×S-bounded
    domain; all pair math runs on the driver over that tiny grid."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["source", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = pc.take(t["source"], parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"source": src, "token": flat}), ["source", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "token": g["token"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    st = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["source", "token"],
        [("c_part", "sum", "c")],
    )
    grid = fold_partials(st, ["source", "token"], "c", max_keys=500_000)

    # driver: global top-m tokens (count DESC, token ASC), per-source totals
    tot_tok: dict = {}
    n_src: dict = {}
    for (s, t), c in grid.items():
        c = int(c)
        tot_tok[t] = tot_tok.get(t, 0) + c
        n_src[s] = n_src.get(s, 0) + c
    top = sorted(tot_tok, key=lambda t: (-tot_tok[t], t))[:m]
    sources = sorted(n_src)

    def lower_median(vals) -> int:
        v = sorted(vals)
        return v[(len(v) - 1) // 2]

    f = {
        (s, t): (1_000_000_000 * int(grid.get((s, t), 0))) // n_src[s]
        for s in sources
        for t in top
    }
    mad = {}
    for t in top:
        med = lower_median(f[(s, t)] for s in sources)
        mad[t] = lower_median(abs(f[(s, t)] - med) for s in sources)
    used = [t for t in top if mad[t] > 0]
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            delta = sum(
                (1_000_000 * abs(f[(a, t)] - f[(b, t)])) // mad[t] for t in used
            )
            rows.append((a, b, len(used), delta))
    return pa.table(
        {
            "source_a": pa.array([r[0] for r in rows], pa.string()),
            "source_b": pa.array([r[1] for r in rows], pa.string()),
            "n_terms": pa.array([r[2] for r in rows], pa.int64()),
            "delta_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


BURROWS_DELTA_SQL = f"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1),
top AS (
  SELECT token FROM (
    SELECT token, count(*) AS c FROM tk GROUP BY 1
  ) ORDER BY c DESC, token LIMIT 50
),
cnt AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM tk WHERE token IN (SELECT token FROM top)
  GROUP BY 1, 2
),
grid AS (
  SELECT s.source, t.token, coalesce(c.c, 0) AS c
  FROM (SELECT DISTINCT source FROM tk) s
  CROSS JOIN top t
  LEFT JOIN cnt c USING (source, token)
),
f AS (
  SELECT g.source, g.token, (1000000000 * g.c) // ns.n AS f
  FROM grid g JOIN ns USING (source)
),
med AS (SELECT token, quantile_disc(f, 0.5) AS med FROM f GROUP BY 1),
mad AS (
  SELECT f.token, quantile_disc(abs(f.f - m.med), 0.5) AS mad
  FROM f JOIN med m USING (token) GROUP BY 1
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum((1000000 * abs(a.f - b.f)) // m.mad) AS BIGINT) AS delta_micro
FROM f a
JOIN f b ON a.token = b.token AND a.source < b.source
JOIN mad m ON m.token = a.token AND m.mad > 0
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA) of the quality score's reliability bins
# ---------------------------------------------------------------------------


def isotonic_calibration(sf_dir: str):
    """Isotonic regression (pool-adjacent-violators) over the
    quality_calibration_bins reliability diagram: the alpha-share
    score's per-decade positive rates, forced monotone non-decreasing
    by merging adjacent violating bins — the calibration map an
    isotonic-calibrated quality classifier would actually ship.  Each
    original bin row carries its pool's EXACT fitted rate as the
    integer rational (fit_pos, fit_n) plus the floored permille; pools
    merge on STRICT violation (pos_prev·n_cur > pos_cur·n_prev), so
    equal rates stay separate pools — the deterministic rule both
    engines share (SQL side: a small-step recursive-CTE stack machine,
    one merge or one consume per step).

    Scale shape: the 100-bin (bin → n, pos) fold is the whole shuffle;
    PAVA itself is O(bins) on the driver."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t["text"])
        a = pc.count_substring_regex(t["text"], "[A-Za-z]")
        a64 = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
        n64 = pc.cast(n, pa.int64()).to_numpy(zero_copy_only=False)
        score = np.where(n64 > 0, (1000 * a64) // np.maximum(n64, 1), 0)
        b = np.minimum(score // 10, 99)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "bin": pa.array(b, pa.int64()),
                    "pos": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
                }
            ),
            ["bin"],
        ).aggregate([("pos", "sum"), ([], "count_all")])
        return pa.table(
            {
                "bin": g["bin"],
                "pos": g["pos_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "bin", ["pos", "n"]
    )
    bins = sorted(acc)
    # PAVA: stack of pools [first_bin, n, pos]; merge while the last
    # two pools strictly violate monotonicity of pos/n.
    stack: list = []
    for b in bins:
        pos, n = (int(v) for v in acc[b])
        stack.append([int(b), n, pos])
        while (
            len(stack) >= 2
            and stack[-2][2] * stack[-1][1] > stack[-1][2] * stack[-2][1]
        ):
            b2, n2, p2 = stack.pop()
            stack[-1][1] += n2
            stack[-1][2] += p2
    rows = []
    for i, b in enumerate(bins):
        pos, n = (int(v) for v in acc[b])
        pool = max((p for p in stack if p[0] <= b), key=lambda p: p[0])
        rows.append((int(b), n, pos, pool[2], pool[1], 1000 * pool[2] // pool[1]))
    return pa.table(
        {
            "bin": pa.array([r[0] for r in rows], pa.int64()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_pos": pa.array([r[2] for r in rows], pa.int64()),
            "fit_pos": pa.array([r[3] for r in rows], pa.int64()),
            "fit_n": pa.array([r[4] for r in rows], pa.int64()),
            "fit_rate_permille": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


ISOTONIC_CALIBRATION_SQL = """
WITH RECURSIVE s AS (
  SELECT CASE WHEN length(text) > 0
              THEN (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   // length(text)
              ELSE 0 END AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
bins AS (
  SELECT CAST(least(score // 10, 99) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos
  FROM s GROUP BY 1
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS m FROM bins),
walk AS (
  SELECT CAST(1 AS BIGINT) AS nexti,
         CAST([] AS STRUCT(b BIGINT, n BIGINT, pos BIGINT)[]) AS st
  UNION ALL
  SELECT CASE WHEN viol THEN nexti ELSE nexti + 1 END,
         CASE WHEN viol
              THEN st[1:len(st)-2]
                   || [{'b': st[len(st)-1].b,
                        'n': st[len(st)-1].n + st[len(st)].n,
                        'pos': st[len(st)-1].pos + st[len(st)].pos}]
              ELSE st || [(SELECT {'b': b, 'n': n, 'pos': pos}
                           FROM bins
                           QUALIFY row_number() OVER (ORDER BY b)
                                   = walk.nexti)]
         END
  FROM (
    SELECT nexti, st,
           len(st) >= 2
           AND st[len(st)-1].pos * st[len(st)].n
               > st[len(st)].pos * st[len(st)-1].n AS viol
    FROM walk
  ) walk
  WHERE viol OR nexti <= (SELECT m FROM nb)
),
fin AS (
  SELECT st FROM walk ORDER BY nexti DESC, len(st) LIMIT 1
),
pools AS (SELECT unnest(st, recursive := true) FROM fin)
SELECT bins.b AS bin, bins.n AS n_docs, bins.pos AS n_pos,
       p.pos AS fit_pos, p.n AS fit_n,
       CAST(1000 * p.pos // p.n AS BIGINT) AS fit_rate_permille
FROM bins JOIN pools p ON p.b <= bins.b
QUALIFY row_number() OVER (PARTITION BY bins.b ORDER BY p.b DESC) = 1
ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Chao1 vocabulary-richness estimator per language
# ---------------------------------------------------------------------------


def chao1_richness(sf_dir: str):
    """Chao1 species-richness estimate of the UNSEEN vocabulary per
    language: S_chao1 = S_obs + f1(f1−1)/(2(f2+1)) (the bias-corrected
    form, defined even when no doubleton exists), where f1/f2 are the
    singleton/doubleton counts of the per-lang token-frequency
    spectrum — "how much vocabulary does this corpus slice still owe
    us", the capture-recapture answer behind vocab_growth's empirical
    curve and hapax_share's ratio.  Reported in exact micro units via
    one floor division.

    Scale shape: the (lang, token) → count fold is ``bucketed_agg``
    (complete groups per hash bucket), so the frequency-spectrum
    reduction (S_obs, f1, f2) is a per-block pyarrow partial folded on
    the lang-bounded domain — the vocabulary never lands anywhere
    whole."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["lang", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        lang = pc.take(t["lang"], parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"lang": lang, "token": flat}), ["lang", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "token": g["token"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    vocab = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["lang", "token"],
        [("c_part", "sum", "c")],
    )

    def spectrum(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "lang": t["lang"],
                    "one": pc.cast(pc.equal(t["c"], 1), pa.int64()),
                    "two": pc.cast(pc.equal(t["c"], 2), pa.int64()),
                }
            ),
            ["lang"],
        ).aggregate([("one", "sum"), ("two", "sum"), ([], "count_all")])
        return pa.table(
            {
                "lang": g["lang"],
                "f1": g["one_sum"],
                "f2": g["two_sum"],
                "s": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        vocab.map_batches(spectrum, batch_format="pyarrow"),
        "lang",
        ["f1", "f2", "s"],
    )
    rows = []
    for lang in sorted(acc):
        f1, f2, s = (int(v) for v in acc[lang])
        chao1 = 1_000_000 * s + (1_000_000 * f1 * (f1 - 1)) // (2 * (f2 + 1))
        rows.append((lang, s, f1, f2, chao1))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "s_obs": pa.array([r[1] for r in rows], pa.int64()),
            "f1": pa.array([r[2] for r in rows], pa.int64()),
            "f2": pa.array([r[3] for r in rows], pa.int64()),
            "chao1_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


CHAO1_RICHNESS_SQL = f"""
WITH tok AS (
  SELECT lang,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT lang, token FROM tok WHERE token <> ''),
cnt AS (
  SELECT lang, token, count(*) AS c FROM tk GROUP BY 1, 2
),
sp AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS s_obs,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM cnt GROUP BY 1
)
SELECT lang, s_obs, f1, f2,
       CAST(1000000 * s_obs
            + (1000000 * f1 * (f1 - 1)) // (2 * (f2 + 1)) AS BIGINT)
         AS chao1_micro
FROM sp ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Heaps-law exponent fit over the vocabulary growth curve
# ---------------------------------------------------------------------------


def heaps_law_fit(sf_dir: str, n_buckets: int = VOCAB_GROWTH_BUCKETS):
    """Heaps-law exponent β̂ for V(n) = K·n^β, fitted by least squares
    on the (L(n_j), L(V_j)) integer micro-log points of the
    vocab_growth checkpoints (cumulative token occurrences vs
    cumulative distinct tokens after each corpus decile): with scaled
    centering X_j = m·x_j − Σx the slope is the exact rational
    ΣXY / ΣX², reported in micro via one portable floor division —
    the one-number tokenizer-budget extrapolation the growth curve
    feeds (β ≈ 0.5 typical English; higher = vocabulary still
    exploding).

    Scale shape: two vocabulary-bounded folds (first-occurrence
    checkpoint histogram — vocab_growth's plan — plus a token-count
    histogram over the same checkpoints); the 10-point regression is
    driver arithmetic on Python ints."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["doc_id", "text"])
    max_id = int(_read_docs(sf_dir, ["doc_id"]).max("doc_id"))

    def first_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = pc.take(t["doc_id"], parent)
        pairs = pa.table({"token": flat, "doc_id": ids}).filter(
            pc.not_equal(flat, "")
        )
        g = pa.TableGroupBy(pairs, ["token"]).aggregate([("doc_id", "min")])
        return pa.table({"token": g["token"], "md": g["doc_id_min"]})

    firsts = bucketed_agg(
        ds.map_batches(first_partial, batch_format="pyarrow"),
        ["token"],
        [("md", "min", "md")],
    )

    def first_hist(t: pa.Table) -> pa.Table:
        md = t["md"].to_numpy(zero_copy_only=False)
        cp = np.maximum(
            1, np.minimum(n_buckets, (md * n_buckets + max_id - 1) // max_id)
        )
        g = pa.TableGroupBy(
            pa.table({"cp": pa.array(cp, pa.int64())}), ["cp"]
        ).aggregate([([], "count_all")])
        return pa.table({"cp": g["cp"], "v": pc.cast(g["count_all"], pa.int64())})

    v_new = fold_partials(
        firsts.map_batches(first_hist, batch_format="pyarrow"), "cp", "v"
    )

    def tok_hist(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        ids = (
            pc.take(t["doc_id"], parent.filter(pc.not_equal(flat, "")))
            .to_numpy(zero_copy_only=False)
        )
        cp = np.maximum(
            1, np.minimum(n_buckets, (ids * n_buckets + max_id - 1) // max_id)
        )
        g = pa.TableGroupBy(
            pa.table({"cp": pa.array(cp, pa.int64())}), ["cp"]
        ).aggregate([([], "count_all")])
        return pa.table({"cp": g["cp"], "n": pc.cast(g["count_all"], pa.int64())})

    n_new = fold_partials(
        ds.map_batches(tok_hist, batch_format="pyarrow"), "cp", "n"
    )

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    xs, ys = [], []
    cn = cv = 0
    for j in range(1, n_buckets + 1):
        cn += int(n_new.get(j, 0))
        cv += int(v_new.get(j, 0))
        if cn > 0 and cv > 0:
            xs.append(L(cn))
            ys.append(L(cv))
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    num = sum((m * x - sx) * (m * y - sy) for x, y in zip(xs, ys))
    den = sum((m * x - sx) ** 2 for x in xs)

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    beta_micro = fdiv(1_000_000 * num, den) if den else 0
    return pa.table(
        {
            "n_points": pa.array([m], pa.int64()),
            "beta_micro": pa.array([beta_micro], pa.int64()),
            "xbar_micro": pa.array([fdiv(sx, m)], pa.int64()),
            "ybar_micro": pa.array([fdiv(sy, m)], pa.int64()),
        }
    )


HEAPS_LAW_SQL = f"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT doc_id, token FROM tok WHERE token <> ''),
firsts AS (SELECT token, min(doc_id) AS md FROM tk GROUP BY 1),
vh AS (
  SELECT greatest(1, least({VOCAB_GROWTH_BUCKETS},
           (md * {VOCAB_GROWTH_BUCKETS} + mx.m - 1) // mx.m)) AS cp,
         CAST(count(*) AS BIGINT) AS v
  FROM firsts, mx GROUP BY 1
),
nh AS (
  SELECT greatest(1, least({VOCAB_GROWTH_BUCKETS},
           (doc_id * {VOCAB_GROWTH_BUCKETS} + mx.m - 1) // mx.m)) AS cp,
         CAST(count(*) AS BIGINT) AS n
  FROM tk, mx GROUP BY 1
),
grid AS (
  SELECT unnest(generate_series(1, {VOCAB_GROWTH_BUCKETS})) AS cp
),
pts AS (
  SELECT g.cp,
         sum(coalesce(nh.n, 0)) OVER (ORDER BY g.cp) AS cn,
         sum(coalesce(vh.v, 0)) OVER (ORDER BY g.cp) AS cv
  FROM grid g
  LEFT JOIN nh ON nh.cp = g.cp
  LEFT JOIN vh ON vh.cp = g.cp
),
xy AS (
  SELECT CAST(round(ln(cn) * 1000000) AS BIGINT) AS x,
         CAST(round(ln(cv) * 1000000) AS BIGINT) AS y
  FROM pts WHERE cn > 0 AND cv > 0
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy
  FROM xy
),
fit AS (
  SELECT sum(CAST((SELECT m FROM st) * x - (SELECT sx FROM st) AS HUGEINT)
             * ((SELECT m FROM st) * y - (SELECT sy FROM st))) AS num,
         sum(CAST((SELECT m FROM st) * x - (SELECT sx FROM st) AS HUGEINT)
             * ((SELECT m FROM st) * x - (SELECT sx FROM st))) AS den
  FROM xy
)
SELECT (SELECT m FROM st) AS n_points,
       CAST(CASE WHEN den > 0 THEN
              (1000000 * num
               - ((1000000 * num % den + den) % den)) // den
            ELSE 0 END AS BIGINT) AS beta_micro,
       CAST(((SELECT sx FROM st)
             - (((SELECT sx FROM st) % (SELECT m FROM st)
                 + (SELECT m FROM st)) % (SELECT m FROM st)))
            // (SELECT m FROM st) AS BIGINT) AS xbar_micro,
       CAST(((SELECT sy FROM st)
             - (((SELECT sy FROM st) % (SELECT m FROM st)
                 + (SELECT m FROM st)) % (SELECT m FROM st)))
            // (SELECT m FROM st) AS BIGINT) AS ybar_micro
FROM fit
"""


# ---------------------------------------------------------------------------
# Best single-threshold (CART stump) split of the quality score
# ---------------------------------------------------------------------------


def gini_split_scan(sf_dir: str):
    """Exact CART decision-stump scan over the quality score: among
    the 100 permille-decade bins, find the split "score-bin ≤ b" that
    maximizes the Gini impurity decrease against the lang == 'en'
    label — the first split a gradient-boosted quality model would
    make, with the argmax taken over EXACT rationals (gain candidate
    num/den pairs compared cross-multiplied, smallest bin on ties; the
    squared counts exceed int64, so Python ints / HUGEINT carry them).

    Scale shape: identical to quality_calibration_bins — one 100-bin
    (bin → n, pos) fold; the threshold scan is O(bins) driver
    arithmetic."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t["text"])
        a = pc.count_substring_regex(t["text"], "[A-Za-z]")
        a64 = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
        n64 = pc.cast(n, pa.int64()).to_numpy(zero_copy_only=False)
        score = np.where(n64 > 0, (1000 * a64) // np.maximum(n64, 1), 0)
        b = np.minimum(score // 10, 99)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "bin": pa.array(b, pa.int64()),
                    "pos": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
                }
            ),
            ["bin"],
        ).aggregate([("pos", "sum"), ([], "count_all")])
        return pa.table(
            {
                "bin": g["bin"],
                "pos": g["pos_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "bin", ["pos", "n"]
    )
    bins = sorted(acc)
    tot_n = sum(int(acc[b][1]) for b in bins)
    tot_p = sum(int(acc[b][0]) for b in bins)
    parent = tot_p * tot_p + (tot_n - tot_p) * (tot_n - tot_p)

    best = None  # (num, den, bin, nl, pl)
    cn = cp = 0
    for b in bins[:-1]:
        p, n = int(acc[b][0]), int(acc[b][1])
        cn += n
        cp += p
        nl, nr = cn, tot_n - cn
        pl, pr = cp, tot_p - cp
        if nl == 0 or nr == 0:
            continue
        al = pl * pl + (nl - pl) * (nl - pl)
        ar = pr * pr + (nr - pr) * (nr - pr)
        num, den = al * nr + ar * nl, nl * nr
        if best is None or num * best[1] > best[0] * den:
            best = (num, den, int(b), nl, pl)
    if best is None:
        # Histogram collapsed to a single bin — no split candidate
        # exists; the SQL twin's `sc` CTE is empty and returns zero
        # rows, so mirror that here (ADVICE r4).
        return pa.table(
            {
                "split_bin": pa.array([], pa.int64()),
                "n_left": pa.array([], pa.int64()),
                "pos_left": pa.array([], pa.int64()),
                "n_right": pa.array([], pa.int64()),
                "pos_right": pa.array([], pa.int64()),
                "gain_micro": pa.array([], pa.int64()),
            }
        )
    num, den, b, nl, pl = best

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    gain_micro = fdiv(1_000_000 * (num * tot_n - parent * den), den * tot_n)
    return pa.table(
        {
            "split_bin": pa.array([b], pa.int64()),
            "n_left": pa.array([nl], pa.int64()),
            "pos_left": pa.array([pl], pa.int64()),
            "n_right": pa.array([tot_n - nl], pa.int64()),
            "pos_right": pa.array([tot_p - pl], pa.int64()),
            "gain_micro": pa.array([gain_micro], pa.int64()),
        }
    )


GINI_SPLIT_SCAN_SQL = """
WITH s AS (
  SELECT CASE WHEN length(text) > 0
              THEN (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   // length(text)
              ELSE 0 END AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
bins AS (
  SELECT CAST(least(score // 10, 99) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos
  FROM s GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(pos) AS BIGINT) AS tp
  FROM bins
),
cand AS (
  SELECT b,
         sum(n) OVER (ORDER BY b) AS nl,
         sum(pos) OVER (ORDER BY b) AS pl,
         row_number() OVER (ORDER BY b) AS i,
         count(*) OVER () AS nb
  FROM bins
),
sc AS (
  SELECT b, nl, pl,
         (SELECT tn FROM tot) - nl AS nr,
         (SELECT tp FROM tot) - pl AS pr,
         (CAST(pl AS HUGEINT) * pl + CAST(nl - pl AS HUGEINT) * (nl - pl))
           * ((SELECT tn FROM tot) - nl)
         + (CAST((SELECT tp FROM tot) - pl AS HUGEINT)
              * ((SELECT tp FROM tot) - pl)
            + CAST(((SELECT tn FROM tot) - nl)
                   - ((SELECT tp FROM tot) - pl) AS HUGEINT)
              * (((SELECT tn FROM tot) - nl)
                 - ((SELECT tp FROM tot) - pl)))
           * nl AS num,
         CAST(nl AS HUGEINT) * ((SELECT tn FROM tot) - nl) AS den
  FROM cand
  WHERE i < nb AND nl > 0 AND (SELECT tn FROM tot) - nl > 0
),
best AS (
  SELECT * FROM sc a
  WHERE NOT EXISTS (
    SELECT 1 FROM sc x
    WHERE x.num * a.den > a.num * x.den
       OR (x.num * a.den = a.num * x.den AND x.b < a.b)
  )
),
p AS (
  SELECT CAST(tp AS HUGEINT) * tp
         + CAST(tn - tp AS HUGEINT) * (tn - tp) AS parent, tn
  FROM tot
)
SELECT b AS split_bin, CAST(nl AS BIGINT) AS n_left,
       CAST(pl AS BIGINT) AS pos_left,
       CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
       CAST((1000000 * (num * p.tn - p.parent * den)
             - ((1000000 * (num * p.tn - p.parent * den)
                 % (den * p.tn) + den * p.tn) % (den * p.tn)))
            // (den * p.tn) AS BIGINT) AS gain_micro
FROM best, p
"""


# ---------------------------------------------------------------------------
# Cumulative gains table of the quality score against the en label
# ---------------------------------------------------------------------------


def gains_curve_deciles(sf_dir: str):
    """Cumulative gains table of the alpha-share quality score against
    the lang == 'en' label: rank docs by score DESC (doc-count decile
    cut d = 10·(rank−1) // n over the score histogram — no per-doc
    sort, rank offsets come from cumulative bin counts), and per
    decile report docs, positives, the cumulative positive share
    (permille of ALL positives) and the lift vs random in micro —
    quality_auc's one number unrolled into the "score the top 10%,
    catch X% of the English" deployment view.

    Scale shape: the 1000-cell score histogram (score permille ×
    label) folds once; the decile walk is driver arithmetic over the
    bounded histogram."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t["text"])
        a = pc.count_substring_regex(t["text"], "[A-Za-z]")
        a64 = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
        n64 = pc.cast(n, pa.int64()).to_numpy(zero_copy_only=False)
        score = np.where(n64 > 0, (1000 * a64) // np.maximum(n64, 1), 0)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "score": pa.array(score, pa.int64()),
                    "pos": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
                }
            ),
            ["score"],
        ).aggregate([("pos", "sum"), ([], "count_all")])
        return pa.table(
            {
                "score": g["score"],
                "pos": g["pos_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "score", ["pos", "n"]
    )
    # walk scores DESC assigning rank ranges; split bins across decile
    # boundaries exactly: within a bin every doc shares the score, so
    # positives split PROPORTIONALLY BY EXACT COUNT cannot be known —
    # instead cut deciles on the doc-count boundary and assign each
    # whole bin to the decile of its FIRST rank (deterministic, both
    # engines share it).
    scores = sorted(acc, reverse=True)
    total_n = sum(int(acc[s][1]) for s in scores)
    total_p = sum(int(acc[s][0]) for s in scores)
    dec = {d: [0, 0] for d in range(10)}
    cum = 0
    for s in scores:
        p, n = (int(v) for v in acc[s])
        d = min(10 * cum // total_n, 9)
        dec[d][0] += n
        dec[d][1] += p
        cum += n
    rows = []
    cum_p = 0
    for d in range(10):
        n, p = dec[d]
        cum_p += p
        share = 1000 * cum_p // total_p if total_p else 0
        rows.append((d, n, p, share))
    return pa.table(
        {
            "decile": pa.array([r[0] for r in rows], pa.int64()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "n_pos": pa.array([r[2] for r in rows], pa.int64()),
            "cum_pos_share_permille": pa.array(
                [r[3] for r in rows], pa.int64()
            ),
        }
    )


GAINS_CURVE_SQL = """
WITH s AS (
  SELECT CASE WHEN length(text) > 0
              THEN (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   // length(text)
              ELSE 0 END AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
bins AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p
  FROM s GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(p) AS BIGINT) AS tp
  FROM bins
),
walk AS (
  SELECT score, n, p,
         coalesce(sum(n) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM bins
),
assigned AS (
  SELECT least(10 * cum // (SELECT tn FROM tot), 9) AS decile, n, p
  FROM walk
),
grid AS (SELECT unnest(generate_series(0, 9)) AS decile),
dec AS (
  SELECT g.decile,
         CAST(coalesce(sum(a.n), 0) AS BIGINT) AS n_docs,
         CAST(coalesce(sum(a.p), 0) AS BIGINT) AS n_pos
  FROM grid g LEFT JOIN assigned a ON a.decile = g.decile
  GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
       CAST(CASE WHEN (SELECT tp FROM tot) > 0
                 THEN 1000 * sum(n_pos) OVER (ORDER BY decile)
                      // (SELECT tp FROM tot)
                 ELSE 0 END AS BIGINT) AS cum_pos_share_permille
FROM dec ORDER BY decile
"""


# ---------------------------------------------------------------------------
# "Fightin' Words" log-odds with Dirichlet prior between two sources
# ---------------------------------------------------------------------------


def fightin_words(sf_dir: str, k: int = 20):
    """Monroe/Colaresi/Quinn "Fightin' Words" (2008): which tokens
    most distinguish the lexicographically FIRST source from the LAST
    — the Dirichlet-smoothed log-odds
    δ_w = [L(y1+1) − L(n1+V−y1−1)] − [L(y2+1) − L(n2+V−y2−1)]
    in exact micro-nats (α = 1 per word, α0 = V, all-integer log
    arguments under the L(v) = round(ln v·1e6) convention) plus the
    variance ≈ 1/(y1+1) + 1/(y2+1) as a floored micro rational; top-k
    tokens by δ (token tie-break) — the principled replacement for
    raw tf-idf difference lists.

    Scale shape: one (token → y1, y2) vocabulary fold over the two
    sources via ``bucketed_agg``; the scoreboard is per-hash-bucket
    arithmetic and a distributed top-k (sort + limit) — the
    vocabulary never lands anywhere whole."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["source", "text"])

    def src_partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(pa.table({"source": t["source"]}), ["source"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {"source": g["source"], "n": pc.cast(g["count_all"], pa.int64())}
        )

    srcs = sorted(
        fold_partials(
            ds.map_batches(src_partial, batch_format="pyarrow"), "source", "n"
        )
    )
    src_a, src_b = srcs[0], srcs[-1]

    def tf_partial(t: pa.Table) -> pa.Table:
        keep_src = pc.or_(
            pc.equal(t["source"], src_a), pc.equal(t["source"], src_b)
        )
        t = t.filter(keep_src)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = pc.take(t["source"], parent.filter(keep))
        is_a = pc.cast(pc.equal(src, src_a), pa.int64())
        g = pa.TableGroupBy(
            pa.table({"token": flat, "a": is_a}), ["token"]
        ).aggregate([("a", "sum"), ([], "count_all")])
        return pa.table(
            {
                "token": g["token"],
                "y1_part": g["a_sum"],
                "tot_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    vocab = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["token"],
        [("y1_part", "sum", "y1"), ("tot_part", "sum", "tot")],
    ).materialize()
    vt = pa.concat_tables(
        tb for tb in map(ray.get, vocab.to_arrow_refs()) if tb.num_rows
    ).combine_chunks()
    y1 = vt["y1"].to_numpy(zero_copy_only=False)
    tot = vt["tot"].to_numpy(zero_copy_only=False)
    y2 = tot - y1
    n1, n2, v_size = int(y1.sum()), int(y2.sum()), len(y1)

    ln_cache: dict = {}

    def L(v: int) -> int:
        r = ln_cache.get(v)
        if r is None:
            r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
            ln_cache[v] = r
        return r

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    rows = []
    for tok, a, b in zip(vt["token"].to_pylist(), y1, y2):
        a, b = int(a), int(b)
        delta = (L(a + 1) - L(n1 + v_size - a - 1)) - (
            L(b + 1) - L(n2 + v_size - b - 1)
        )
        var = fdiv(1_000_000 * (a + 1 + b + 1), (a + 1) * (b + 1))
        rows.append((tok, a, b, delta, var))
    rows.sort(key=lambda r: (-r[3], r[0]))
    rows = rows[:k]
    return pa.table(
        {
            "token": pa.array([r[0] for r in rows], pa.string()),
            "y_a": pa.array([r[1] for r in rows], pa.int64()),
            "y_b": pa.array([r[2] for r in rows], pa.int64()),
            "delta_micro": pa.array([r[3] for r in rows], pa.int64()),
            "var_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


FIGHTIN_WORDS_SQL = f"""
WITH ab AS (
  SELECT min(source) AS a, max(source) AS b FROM documents
),
tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
  WHERE source = (SELECT a FROM ab) OR source = (SELECT b FROM ab)
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
cnt AS (
  SELECT token,
         CAST(sum(CASE WHEN source = (SELECT a FROM ab)
                       THEN 1 ELSE 0 END) AS BIGINT) AS y1,
         CAST(sum(CASE WHEN source = (SELECT b FROM ab)
                       THEN 1 ELSE 0 END) AS BIGINT) AS y2
  FROM tk GROUP BY 1
),
tot AS (
  SELECT CAST(sum(y1) AS BIGINT) AS n1, CAST(sum(y2) AS BIGINT) AS n2,
         CAST(count(*) AS BIGINT) AS v
  FROM cnt
)
SELECT token, y1 AS y_a, y2 AS y_b,
       CAST((CAST(round(ln(y1 + 1) * 1000000) AS BIGINT)
             - CAST(round(ln((SELECT n1 + v FROM tot) - y1 - 1) * 1000000)
                    AS BIGINT))
            - (CAST(round(ln(y2 + 1) * 1000000) AS BIGINT)
               - CAST(round(ln((SELECT n2 + v FROM tot) - y2 - 1) * 1000000)
                      AS BIGINT)) AS BIGINT) AS delta_micro,
       CAST((1000000 * (y1 + 1 + y2 + 1))
            // ((y1 + 1) * (y2 + 1)) AS BIGINT) AS var_micro
FROM cnt
ORDER BY delta_micro DESC, token
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Precision/recall/F1 threshold sweep of the quality score
# ---------------------------------------------------------------------------


def pr_threshold_sweep(sf_dir: str):
    """Precision / recall / F1 at every decade threshold of the
    alpha-share quality score against the lang == 'en' label (predict
    positive iff score ≥ 100·t permille, t = 0..9): exact integer
    confusion counts and the permille ratios with F1 as the one-floor
    rational 2000·tp // (2·tp + fp + fn) — the operating-point menu
    quality_auc's ranking number can't give you.

    Scale shape: the 1000-cell score histogram folds once (the
    gains_curve_deciles fold); the 10-threshold sweep is driver
    arithmetic."""
    from document_extractor_ray.functions.bucketing import fold_partials

    ds = _read_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t["text"])
        a = pc.count_substring_regex(t["text"], "[A-Za-z]")
        a64 = pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False)
        n64 = pc.cast(n, pa.int64()).to_numpy(zero_copy_only=False)
        score = np.where(n64 > 0, (1000 * a64) // np.maximum(n64, 1), 0)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "score": pa.array(score, pa.int64()),
                    "pos": pc.cast(pc.equal(t["lang"], "en"), pa.int64()),
                }
            ),
            ["score"],
        ).aggregate([("pos", "sum"), ([], "count_all")])
        return pa.table(
            {
                "score": g["score"],
                "pos": g["pos_sum"],
                "n": pc.cast(g["count_all"], pa.int64()),
            }
        )

    acc = fold_partials(
        ds.map_batches(partial, batch_format="pyarrow"), "score", ["pos", "n"]
    )
    total_p = sum(int(acc[s][0]) for s in acc)
    rows = []
    for t in range(10):
        thr = 100 * t
        tp = sum(int(acc[s][0]) for s in acc if int(s) >= thr)
        pred_pos = sum(int(acc[s][1]) for s in acc if int(s) >= thr)
        fp = pred_pos - tp
        fn = total_p - tp
        prec = 1000 * tp // pred_pos if pred_pos else 0
        rec = 1000 * tp // total_p if total_p else 0
        f1 = 2000 * tp // (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0
        rows.append((t, tp, fp, fn, prec, rec, f1))
    return pa.table(
        {
            "threshold_decade": pa.array([r[0] for r in rows], pa.int64()),
            "tp": pa.array([r[1] for r in rows], pa.int64()),
            "fp": pa.array([r[2] for r in rows], pa.int64()),
            "fn": pa.array([r[3] for r in rows], pa.int64()),
            "precision_permille": pa.array([r[4] for r in rows], pa.int64()),
            "recall_permille": pa.array([r[5] for r in rows], pa.int64()),
            "f1_permille": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


PR_THRESHOLD_SWEEP_SQL = """
WITH s AS (
  SELECT CASE WHEN length(text) > 0
              THEN (1000 * length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
                   // length(text)
              ELSE 0 END AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
),
tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tp_all FROM s),
grid AS (SELECT unnest(generate_series(0, 9)) AS t),
sw AS (
  SELECT g.t,
         CAST(sum(CASE WHEN s.score >= 100 * g.t THEN s.pos ELSE 0 END)
              AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s.score >= 100 * g.t THEN 1 ELSE 0 END)
              AS BIGINT) AS pred_pos
  FROM grid g CROSS JOIN s
  GROUP BY 1
)
SELECT CAST(t AS BIGINT) AS threshold_decade, tp,
       pred_pos - tp AS fp,
       (SELECT tp_all FROM tot) - tp AS fn,
       CAST(CASE WHEN pred_pos > 0 THEN 1000 * tp // pred_pos
                 ELSE 0 END AS BIGINT) AS precision_permille,
       CAST(CASE WHEN (SELECT tp_all FROM tot) > 0
                 THEN 1000 * tp // (SELECT tp_all FROM tot)
                 ELSE 0 END AS BIGINT) AS recall_permille,
       CAST(CASE WHEN 2 * tp + (pred_pos - tp)
                      + ((SELECT tp_all FROM tot) - tp) > 0
                 THEN 2000 * tp // (2 * tp + (pred_pos - tp)
                                    + ((SELECT tp_all FROM tot) - tp))
                 ELSE 0 END AS BIGINT) AS f1_permille
FROM sw ORDER BY threshold_decade
"""


# ---------------------------------------------------------------------------
# Gries' DP lexical dispersion across sources
# ---------------------------------------------------------------------------


def gries_dp_dispersion(sf_dir: str, m: int = 20):
    """Gries' "deviation of proportions" DP (2008) for the corpus's
    top-m tokens: DP = ½·Σ_parts |v_i − s_i| with v_i the token's
    occurrence share in source i and s_i the source's token-mass
    share — 0 = perfectly even across sources, →1 = concentrated in
    one; the dispersion axis a frequency list hides (a stop word and
    a boilerplate artifact can share a count while sitting at opposite
    DP ends).  Exact: dp_permille = ⌊500·Σ|y_si·N − n_i·y_t| /
    (y_t·N)⌋, all integers.

    Scale shape: one (source, token) fold via ``bucketed_agg``
    (bounded by sources × vocabulary hash buckets); the top-m
    scoreboard folds per-token rows on the driver (m × S grid)."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["source", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = pc.take(t["source"], parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"source": src, "token": flat}), ["source", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "token": g["token"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    st = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["source", "token"],
        [("c_part", "sum", "c")],
    )
    grid = fold_partials(st, ["source", "token"], "c", max_keys=500_000)
    n_src: dict = {}
    tok_tot: dict = {}
    for (s, t), c in grid.items():
        c = int(c)
        n_src[s] = n_src.get(s, 0) + c
        tok_tot[t] = tok_tot.get(t, 0) + c
    sources = sorted(n_src)
    big_n = sum(n_src.values())
    top = sorted(tok_tot, key=lambda t: (-tok_tot[t], t))[:m]
    rows = []
    for t in top:
        yt = tok_tot[t]
        dev = sum(
            abs(int(grid.get((s, t), 0)) * big_n - n_src[s] * yt)
            for s in sources
        )
        dp = (500 * dev) // (yt * big_n)
        rows.append((t, yt, dp))
    return pa.table(
        {
            "token": pa.array([r[0] for r in rows], pa.string()),
            "count": pa.array([r[1] for r in rows], pa.int64()),
            "dp_permille": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


GRIES_DP_SQL = f"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY 1),
bign AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ns),
tt AS (SELECT token, CAST(count(*) AS BIGINT) AS yt FROM tk GROUP BY 1),
top AS (SELECT token, yt FROM tt ORDER BY yt DESC, token LIMIT 20),
cnt AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM tk WHERE token IN (SELECT token FROM top)
  GROUP BY 1, 2
),
grid AS (
  SELECT s.source, t.token, t.yt, coalesce(c.c, 0) AS c, s.n
  FROM ns s CROSS JOIN top t
  LEFT JOIN cnt c ON c.source = s.source AND c.token = t.token
),
dev AS (
  SELECT token, yt,
         CAST(sum(abs(c * (SELECT n FROM bign) - n * yt)) AS HUGEINT) AS dev
  FROM grid GROUP BY 1, 2
)
SELECT token, yt AS count,
       CAST((500 * dev) // (CAST(yt AS HUGEINT) * (SELECT n FROM bign))
            AS BIGINT) AS dp_permille
FROM dev
ORDER BY count DESC, token
"""


# ---------------------------------------------------------------------------
# Generalized Jensen–Shannon divergence across ALL sources
# ---------------------------------------------------------------------------


def multi_source_jsd(sf_dir: str):
    """Generalized (k-way) Jensen–Shannon divergence of the unigram
    distributions of ALL sources at once — JSD = H(mixture) −
    Σ_s w_s·H(source), w_s the token-mass share — as the exact
    integer N·JSD = N·L(N) − Σ_w Y_w·L(Y_w) − Σ_s [n_s·L(n_s) −
    Σ_w y_sw·L(y_sw)] in micro-nats (every L argument an integer
    count) — lang_trigram_jsd's pairwise matrix collapsed to the one
    mixture number: how much does knowing the source tell you about
    the next token (0 = identical feeds, ln k = disjoint).

    Scale shape: one (source, token) fold and one (token) fold via
    ``bucketed_agg``; the three Σc·L(c) reductions run per hash
    bucket (memoized ln per distinct count) and fold as scalars —
    vocabulary never collected."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["source", "text"])

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), _DF_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        src = pc.take(t["source"], parent.filter(keep))
        g = pa.TableGroupBy(
            pa.table({"source": src, "token": flat}), ["source", "token"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g["source"],
                "token": g["token"],
                "c_part": pc.cast(g["count_all"], pa.int64()),
            }
        )

    st = bucketed_agg(
        ds.map_batches(tf_partial, batch_format="pyarrow"),
        ["source", "token"],
        [("c_part", "sum", "c")],
    ).materialize()

    def cl_partial(t: pa.Table) -> pa.Table:
        # per-block Σ c·L(c) for source rows, plus per-source mass;
        # token mixture counts need a second fold keyed by token.
        ln_cache: dict = {}

        def L(v: int) -> int:
            r = ln_cache.get(v)
            if r is None:
                r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
                ln_cache[v] = r
            return r

        c = t["c"].to_numpy(zero_copy_only=False)
        cl = sum(int(v) * L(int(v)) for v in c)
        g = pa.TableGroupBy(
            pa.table({"source": t["source"], "c": t["c"]}), ["source"]
        ).aggregate([("c", "sum")])
        out = pa.table(
            {
                "k": pa.array([0] * (g.num_rows + 1), pa.int64()),
                "source": pa.concat_arrays(
                    [g["source"].combine_chunks(), pa.array(["__cl__"])]
                ),
                "v": pa.concat_arrays(
                    [
                        g["c_sum"].combine_chunks(),
                        pa.array([cl], pa.int64()),
                    ]
                ),
            }
        )
        return out.drop_columns(["k"])

    src_acc = fold_partials(
        st.map_batches(cl_partial, batch_format="pyarrow"), "source", "v"
    )
    sum_ycl = int(src_acc.pop("__cl__", 0))
    n_src = {s: int(v) for s, v in src_acc.items()}

    mix = bucketed_agg(st, ["token"], [("c", "sum", "y")])

    def mix_partial(t: pa.Table) -> pa.Table:
        ln_cache: dict = {}

        def L(v: int) -> int:
            r = ln_cache.get(v)
            if r is None:
                r = int(math.floor(math.log(v) * 1_000_000 + 0.5))
                ln_cache[v] = r
            return r

        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "ycl": pa.array(
                    [sum(int(v) * L(int(v)) for v in y)], pa.int64()
                ),
            }
        )

    mix_acc = fold_partials(
        mix.map_batches(mix_partial, batch_format="pyarrow"), "k", "ycl"
    )
    sum_mix_ycl = int(mix_acc.get(0, 0))

    def L(v: int) -> int:
        return int(math.floor(math.log(v) * 1_000_000 + 0.5))

    def fdiv(a: int, n: int) -> int:
        return (a - ((a % n + n) % n)) // n

    big_n = sum(n_src.values())
    h_mix_num = big_n * L(big_n) - sum_mix_ycl  # N·H(mixture) micro
    h_src_num = sum(
        n * L(n) for n in n_src.values()
    ) - sum_ycl  # Σ n_s·H_s micro
    jsd_num = h_mix_num - h_src_num
    return pa.table(
        {
            "n_sources": pa.array([len(n_src)], pa.int64()),
            "n_tokens": pa.array([big_n], pa.int64()),
            "jsd_num_micro": pa.array([jsd_num], pa.int64()),
            "jsd_micro": pa.array([fdiv(jsd_num, big_n)], pa.int64()),
        }
    )


MULTI_SOURCE_JSD_SQL = f"""
WITH tok AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '{_DF_SPLIT_RE}')) AS token
  FROM documents
),
tk AS (SELECT source, token FROM tok WHERE token <> ''),
st AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1, 2
),
ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY 1),
mix AS (SELECT token, CAST(sum(c) AS BIGINT) AS y FROM st GROUP BY 1),
bign AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM ns),
parts AS (
  SELECT
    (SELECT CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
     FROM st) AS sum_ycl,
    (SELECT CAST(sum(y * CAST(round(ln(y) * 1000000) AS BIGINT)) AS BIGINT)
     FROM mix) AS sum_mix_ycl,
    (SELECT CAST(sum(n * CAST(round(ln(n) * 1000000) AS BIGINT)) AS BIGINT)
     FROM ns) AS sum_nln,
    (SELECT n FROM bign) AS n,
    (SELECT CAST(round(ln((SELECT n FROM bign)) * 1000000) AS BIGINT)) AS ln_n
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ns) AS n_sources,
       n AS n_tokens,
       CAST((n * ln_n - sum_mix_ycl) - (sum_nln - sum_ycl) AS BIGINT)
         AS jsd_num_micro,
       CAST((((n * ln_n - sum_mix_ycl) - (sum_nln - sum_ycl))
             - ((((n * ln_n - sum_mix_ycl) - (sum_nln - sum_ycl)) % n + n)
                % n)) // n AS BIGINT) AS jsd_micro
FROM parts
"""


# ---------------------------------------------------------------------------
# Cliff's delta effect size between first/last source on doc length
# ---------------------------------------------------------------------------


def cliffs_delta_sources(sf_dir: str):
    """Cliff's δ ordinal effect size between the lexicographically
    first and last sources on document length: δ = [#(x>y) − #(x<y)]
    / (n·m), computed EXACTLY from the two length histograms by a
    merged cumulative walk (Σ_x c_a(x)·[m_less(x) − m_greater(x)] —
    pair counts without pairs, the hour_value_kendall trick) —
    length_mannwhitney tells you the shift is significant; δ tells
    you if anyone should care (|δ| < 0.147 negligible by the standard
    rubric, encoded as a flag).

    Scale shape: one (source, n_chars) histogram fold bounded by the
    length domain; the walk is driver arithmetic."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["source", "n_chars"])
    hist = fold_partials(
        bucketed_agg(ds, ["source", "n_chars"], [(None, "count", "m")]),
        ["source", "n_chars"],
        "m",
        max_keys=500_000,
    )
    sources = sorted({s for s, _ in hist})
    src_a, src_b = sources[0], sources[-1]
    ha: dict = {}
    hb: dict = {}
    for (s, v), c in hist.items():
        if s == src_a:
            ha[int(v)] = ha.get(int(v), 0) + int(c)
        elif s == src_b:
            hb[int(v)] = hb.get(int(v), 0) + int(c)
    n = sum(ha.values())
    m = sum(hb.values())
    vals = sorted(set(ha) | set(hb))
    # cumulative counts of b strictly below each value
    below = 0
    delta_num = 0
    cum_b = 0
    for v in vals:
        b_here = hb.get(v, 0)
        a_here = ha.get(v, 0)
        greater = m - cum_b - b_here  # b strictly above v
        delta_num += a_here * (cum_b - greater)
        cum_b += b_here

    def fdiv(a: int, d: int) -> int:
        return (a - ((a % d + d) % d)) // d

    delta_micro = fdiv(1_000_000 * delta_num, n * m) if n and m else 0
    return pa.table(
        {
            "n_a": pa.array([n], pa.int64()),
            "n_b": pa.array([m], pa.int64()),
            "delta_num": pa.array([delta_num], pa.int64()),
            "delta_micro": pa.array([delta_micro], pa.int64()),
            "negligible": pa.array(
                [1 if abs(delta_micro) < 147_000 else 0], pa.int64()
            ),
        }
    )


CLIFFS_DELTA_SQL = """
WITH ab AS (SELECT min(source) AS a, max(source) AS b FROM documents),
da AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c FROM documents
  WHERE source = (SELECT a FROM ab) GROUP BY 1
),
db AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c FROM documents
  WHERE source = (SELECT b FROM ab) GROUP BY 1
),
tot AS (
  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM da) AS n,
         (SELECT CAST(sum(c) AS BIGINT) FROM db) AS m
),
walk AS (
  SELECT da.v, da.c AS a_here,
         CAST(coalesce((SELECT sum(db.c) FROM db WHERE db.v < da.v), 0)
              AS BIGINT) AS cum_b
  FROM da
),
num AS (
  SELECT CAST(sum(a_here * (cum_b
           - ((SELECT m FROM tot) - cum_b
              - coalesce((SELECT c FROM db WHERE db.v = walk.v), 0))))
         AS BIGINT) AS delta_num
  FROM walk
)
SELECT (SELECT n FROM tot) AS n_a, (SELECT m FROM tot) AS n_b,
       delta_num,
       CAST((1000000 * delta_num
             - ((1000000 * delta_num % ((SELECT n FROM tot)
                                        * (SELECT m FROM tot))
                 + (SELECT n FROM tot) * (SELECT m FROM tot))
                % ((SELECT n FROM tot) * (SELECT m FROM tot))))
            // ((SELECT n FROM tot) * (SELECT m FROM tot)) AS BIGINT)
         AS delta_micro,
       CAST(CASE WHEN abs((1000000 * delta_num
             - ((1000000 * delta_num % ((SELECT n FROM tot)
                                        * (SELECT m FROM tot))
                 + (SELECT n FROM tot) * (SELECT m FROM tot))
                % ((SELECT n FROM tot) * (SELECT m FROM tot))))
            // ((SELECT n FROM tot) * (SELECT m FROM tot))) < 147000
            THEN 1 ELSE 0 END AS BIGINT) AS negligible
FROM num
"""


# ---------------------------------------------------------------------------
# Ansari–Bradley rank test of SCALE between first/last source
# ---------------------------------------------------------------------------


def ansari_bradley_scale(sf_dir: str):
    """Ansari–Bradley rank test of SCALE: pooled doc lengths of the
    first and last sources get the center-peaked scores
    min(i, N+1−i); sample A's score sum (tied blocks contribute the
    exact block average a·S_block/m_block, floored per block in micro)
    is compared against the null mean n_a·S_total/N — A more
    DISPERSED than B pulls T below the mean (extreme positions score
    low).  Completes the two-sample family: location
    (length_mannwhitney), stochastic dominance (cliffs_delta),
    distribution (KS/EMD/CvM matrices), now scale.

    Scale shape: the same (source, n_chars) histogram fold as
    cliffs_delta; block score sums come from closed-form arithmetic
    series over the position ranges — no row-level ranking anywhere."""
    from document_extractor_ray.functions.bucketing import (
        bucketed_agg,
        fold_partials,
    )

    ds = _read_docs(sf_dir, ["source", "n_chars"])
    hist = fold_partials(
        bucketed_agg(ds, ["source", "n_chars"], [(None, "count", "m")]),
        ["source", "n_chars"],
        "m",
        max_keys=500_000,
    )
    sources = sorted({s for s, _ in hist})
    src_a, src_b = sources[0], sources[-1]
    ha: dict = {}
    hb: dict = {}
    for (s, v), c in hist.items():
        if s == src_a:
            ha[int(v)] = ha.get(int(v), 0) + int(c)
        elif s == src_b:
            hb[int(v)] = hb.get(int(v), 0) + int(c)
    n_a, n_b = sum(ha.values()), sum(hb.values())
    big_n = n_a + n_b
    t = big_n + 1

    def series_sum(lo: int, hi: int) -> int:
        """Σ_{i=lo..hi} min(i, t - i) via two arithmetic series."""
        if hi < lo:
            return 0
        cut = (t - 1) // 2  # i <= cut -> min is i
        s = 0
        a, b = lo, min(hi, cut)
        if b >= a:
            s += (a + b) * (b - a + 1) // 2
        a, b = max(lo, cut + 1), hi
        if b >= a:
            s += (2 * t - a - b) * (b - a + 1) // 2
        return s

    def fdiv(a: int, d: int) -> int:
        return (a - ((a % d + d) % d)) // d

    t_micro = 0
    cum = 0
    for v in sorted(set(ha) | set(hb)):
        a_here = ha.get(v, 0)
        m_block = a_here + hb.get(v, 0)
        s_block = series_sum(cum + 1, cum + m_block)
        if a_here:
            t_micro += fdiv(1_000_000 * a_here * s_block, m_block)
        cum += m_block
    s_total = series_sum(1, big_n)
    null_mean_micro = fdiv(1_000_000 * n_a * s_total, big_n)
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "t_micro": pa.array([t_micro], pa.int64()),
            "null_mean_micro": pa.array([null_mean_micro], pa.int64()),
            "a_more_dispersed": pa.array(
                [1 if t_micro < null_mean_micro else 0], pa.int64()
            ),
        }
    )


ANSARI_BRADLEY_SQL = """
WITH ab AS (SELECT min(source) AS a, max(source) AS b FROM documents),
pooled AS (
  SELECT n_chars AS v, CASE WHEN source = (SELECT a FROM ab)
                            THEN 1 ELSE 0 END AS is_a
  FROM documents
  WHERE source = (SELECT a FROM ab) OR source = (SELECT b FROM ab)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pooled),
rk AS (
  SELECT v, is_a,
         row_number() OVER (ORDER BY v) AS i
  FROM pooled
),
sc AS (
  SELECT v, is_a,
         least(i, (SELECT n FROM nn) + 1 - i) AS score
  FROM rk
),
blocks AS (
  SELECT v, CAST(sum(is_a) AS BIGINT) AS a_here,
         CAST(count(*) AS BIGINT) AS m_block,
         CAST(sum(score) AS BIGINT) AS s_block
  FROM sc GROUP BY 1
),
tstat AS (
  SELECT CAST(sum(CASE WHEN a_here > 0 THEN
           (1000000 * a_here * s_block
            - ((1000000 * a_here * s_block % m_block + m_block) % m_block))
           // m_block
         ELSE 0 END) AS BIGINT) AS t_micro
  FROM blocks
),
tot AS (
  SELECT CAST(sum(s_block) AS BIGINT) AS s_total,
         CAST(sum(a_here) AS BIGINT) AS n_a,
         CAST(sum(m_block) - sum(a_here) AS BIGINT) AS n_b
  FROM blocks
)
SELECT n_a, n_b,
       (SELECT t_micro FROM tstat) AS t_micro,
       CAST((1000000 * n_a * s_total
             - ((1000000 * n_a * s_total % (n_a + n_b) + (n_a + n_b))
                % (n_a + n_b))) // (n_a + n_b) AS BIGINT)
         AS null_mean_micro,
       CAST(CASE WHEN (SELECT t_micro FROM tstat)
                      < (1000000 * n_a * s_total
                         - ((1000000 * n_a * s_total % (n_a + n_b)
                             + (n_a + n_b)) % (n_a + n_b))) // (n_a + n_b)
                 THEN 1 ELSE 0 END AS BIGINT) AS a_more_dispersed
FROM tot
"""
