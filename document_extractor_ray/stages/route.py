"""Routing stage: magic-byte sniffing + container explode.

The extension router + portfolio pre-pass of the reference
(``process_run.py:93-109`` R1, ``portfolio_unpack.py:92-177`` E20)
re-expressed as one row-count-changing ``map_batches`` transform:
container rows explode into child rows (``url = parent::child``,
denormalized so no join is ever needed — SURVEY.md §2.5) while the
parent survives as a CONTAINER marker row.
"""

from __future__ import annotations

from typing import List

import pyarrow as pa

from document_extractor_ray.config import PipelineConfig
from document_extractor_ray.core import sniff
from document_extractor_ray.core.records import partition_of

ROUTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("doc_kind", pa.string()),
        ("size_bytes", pa.int64()),
        ("size_bucket", pa.int32()),
        ("partition_id", pa.int32()),
        ("n_children", pa.int32()),
    ]
)


def route_and_explode(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Sniff every payload, explode containers one level deep.

    n_children: -1 => container payload failed to decode (the primary
    stage turns that into an ERROR row); 0 => not a container / leaf.
    """
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = batch["text"].to_pylist() if "text" in batch.column_names else [""] * len(urls)

    out_url: List[str] = []
    out_html: List[bytes] = []
    out_text: List[str] = []
    out_kind: List[str] = []
    out_size: List[int] = []
    out_children: List[int] = []

    def push(url: str, payload: bytes, text: str, kind: str, n_children: int) -> None:
        out_url.append(url)
        out_html.append(payload)
        out_text.append(text or "")
        out_kind.append(kind)
        out_size.append(len(payload))
        out_children.append(n_children)

    for url, payload, text in zip(urls, htmls, texts):
        payload = payload or b""
        kind = sniff.sniff_kind(payload)
        if kind != sniff.KIND_CONTAINER:
            push(url, payload, text, kind, 0)
            continue
        try:
            children = sniff.decode_container(payload)
        except Exception:
            push(url, payload, text, kind, -1)
            continue
        push(url, payload, "", kind, len(children))
        for name, child_payload in children:
            curl = sniff.child_url(url, name)
            push(curl, child_payload, "", sniff.sniff_kind(child_payload), 0)

    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "html": pa.array(out_html, pa.binary()),
            "text": pa.array(out_text, pa.string()),
            "doc_kind": pa.array(out_kind, pa.string()),
            "size_bytes": pa.array(out_size, pa.int64()),
            "size_bucket": pa.array(
                [sniff.size_bucket(s) for s in out_size], pa.int32()
            ),
            "partition_id": pa.array(
                [partition_of(u, cfg.num_partitions) for u in out_url], pa.int32()
            ),
            "n_children": pa.array(out_children, pa.int32()),
        },
        schema=ROUTED_SCHEMA,
    )
