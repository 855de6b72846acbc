"""Sequential reference-faithful oracle.

Processes a pages table exactly the way the reference's orchestrator
would (process_run.py walk -> route -> pass cascade -> write_result),
one document at a time, single process, using the same ``core``
functions as the Ray pipeline.  The golden tests assert that the Ray
pipeline's output is byte-identical per url to this oracle
(BASELINE.json:14-15); SURVEY.md §5.2.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from document_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from document_extractor_ray.core import cascade, records, sniff


def dedup_first_indices(
    urls: List[str],
    warc_ts: List[int],
    htmls: Optional[List] = None,
    texts: Optional[List] = None,
) -> List[int]:
    """Exact dedup by url: keep the rows minimizing
    (warc_ts, capture_hash) per url.

    warc_ts ties break on the content hash — NOT input order, which a
    distributed run cannot reproduce (records.capture_hash).  Bitwise-
    identical tie captures all survive, identically in the oracle and
    the Ray pipeline.  When htmls/texts are not given, ties keep
    every min-ts row (hashless mode, for ts-only callers).

    The reference gets idempotency from delete-on-success
    (process_run.py:194-197); a pure rebuild needs explicit dedup-first
    (SURVEY.md §2.8)."""
    def key(i):
        if htmls is None:
            return (warc_ts[i],)
        return (warc_ts[i], records.capture_hash(htmls[i], texts[i] if texts else None))

    best: Dict[str, tuple] = {}
    for i, u in enumerate(urls):
        k = key(i)
        cur = best.get(u)
        if cur is None or k < cur:
            best[u] = k
    keep = [i for i, u in enumerate(urls) if key(i) == best[u]]
    return sorted(keep)


def run_oracle(table: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """Returns {'final', 'results', 'quarantine', 'units', 'manifest',
    'noise_count'} — final is sorted by url and contains every deduped
    input url (plus container children) exactly once."""
    urls = table["url"].to_pylist()
    tss = [t.value if hasattr(t, "value") else t for t in table["warc_ts"]]
    htmls = table["html"].to_pylist()
    texts = table["text"].to_pylist()

    keep = (
        dedup_first_indices(urls, tss, htmls, texts)
        if cfg.dedup
        else list(range(len(urls)))
    )

    recs: List[dict] = []
    manifest: List[dict] = []

    def handle(url: str, payload: Optional[bytes], text: Optional[str]) -> None:
        payload = payload or b""
        kind = sniff.sniff_kind(payload)
        if kind == sniff.KIND_CONTAINER:
            try:
                children = sniff.decode_container(payload)
            except Exception:
                res = cascade.DocResult(
                    status="ERROR",
                    pass_used="portfolio",
                    quarantine=True,
                    reason=cascade.QUARANTINE_RC1,
                    notes="decode error",
                )
                recs.append(records.assemble_record(url, kind, len(payload), res, cfg))
                return
            manifest.extend(records.manifest_records(url, children))
            res = cascade.container_parent(len(children), cfg)
            recs.append(records.assemble_record(url, kind, len(payload), res, cfg))
            for name, child_payload in children:
                curl = sniff.child_url(url, name)
                ckind = sniff.sniff_kind(child_payload)
                cres = cascade.process_any(ckind, child_payload, "", cfg)
                recs.append(
                    records.assemble_record(curl, ckind, len(child_payload), cres, cfg)
                )
            return
        res = cascade.process_any(kind, payload, text, cfg)
        recs.append(records.assemble_record(url, kind, len(payload), res, cfg))

    for i in keep:
        handle(urls[i], htmls[i], texts[i])

    final = records.records_to_table(recs)
    final = final.sort_by("url")

    manifest_table = pa.table(
        {
            "parent_url": pa.array([m["parent_url"] for m in manifest], pa.string()),
            "child_name": pa.array([m["child_name"] for m in manifest], pa.string()),
            "child_url": pa.array([m["child_url"] for m in manifest], pa.string()),
            "size_bytes": pa.array([m["size_bytes"] for m in manifest], pa.int64()),
        },
        schema=records.MANIFEST_SCHEMA,
    ).sort_by("child_url")

    import pyarrow.compute as pc

    noise_count = int(
        pc.sum(pc.cast(pc.equal(final["status"], "NOISE"), pa.int64())).as_py() or 0
    )

    return {
        "final": final,
        "results": records.project_results(final),
        "quarantine": records.project_quarantine(final),
        "units": records.explode_unit_rows(final),
        "manifest": manifest_table,
        "noise_count": noise_count,
    }
