"""The flagship extraction pipeline — Ray Data assembly.

Replaces the reference's three entry points (watcher loop, pass_pdf
orchestrator, pass_any ad-hoc; SURVEY.md §3) with one streaming
Dataset pipeline:

    read_parquet(pages)
      -> [optional] exact dedup-first by url        (shuffle on url)
      -> route_and_explode (sniff + container E20)  (stateless tasks)
      -> size-bucket split                          (skew lane, north_rule)
      -> primary_extract (pass-1 cascade)           (stateless tasks)
      -> FallbackExtractor (OCR-A/B analogues)      (actor pool, masked)
      -> union -> [optional] sort by url            (determinism)

Wide operations and their keys (SURVEY.md §7.4): dedup shuffles on
``url``; the final sort orders by ``url``; the size-bucket split is a
streaming filter (no shuffle).  Pages of one document never leave the
row (list columns), so there is NO per-document groupby on the hot
path — the reference's per-doc median/concat (A1/A3) are per-row
reduces inside the stages.
"""

from __future__ import annotations

from typing import Optional, Union

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from document_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from document_extractor_ray.stages.extract import primary_extract
from document_extractor_ray.stages.fallback import FallbackExtractor
from document_extractor_ray.stages.route import route_and_explode

BIG_BUCKET = 1  # size_bucket >= this goes down the big-document lane (>= 64 KiB)


def dedup_first(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact dedup by url keeping the earliest warc_ts row (ST6 —
    the reference's unimplemented checksum cache, TODO.md:20).

    This is a hash shuffle on ``url``; at the 10^12-document scale it is
    the pipeline's one unavoidable all-to-all when inputs may repeat
    (re-crawls).  Skip with cfg.dedup=False when inputs are known
    unique."""

    def first_by_ts(group: pa.Table) -> pa.Table:
        return group.sort_by("warc_ts").slice(0, 1)

    return ds.groupby("url").map_groups(first_by_ts, batch_format="pyarrow")


def build_extraction(
    ds: "ray.data.Dataset", cfg: PipelineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """pages Dataset -> FINAL_SCHEMA Dataset (lazy; caller consumes).

    Skew note: an earlier design split the stream into small/big
    size-bucket lanes with their own batch sizes — but a Ray Dataset
    with two consumers RE-EXECUTES its upstream per consumer (two
    reads, two dedup shuffles), which is strictly worse at scale than
    the skew it avoids.  Instead skew is bounded within one lane:
    modest batch sizes keep a giant document from stalling many
    neighbors, the per-page cascade bounds per-row work, and the
    size_bucket column still partitions outputs/metrics.  For a true
    two-lane physical plan, persist the routed intermediate per shard
    (pipelines/resume.py) and run the lanes over the committed files.
    """
    if cfg.dedup:
        ds = dedup_first(ds)

    final = (
        ds.map_batches(
            route_and_explode,
            batch_format="pyarrow",
            fn_kwargs={"cfg": cfg},
            batch_size=cfg.small_batch_size,
        )
        .map_batches(
            primary_extract,
            batch_format="pyarrow",
            fn_kwargs={"cfg": cfg},
            batch_size=cfg.small_batch_size,
        )
        .map_batches(
            FallbackExtractor,
            batch_format="pyarrow",
            fn_constructor_kwargs={"cfg": cfg},
            batch_size=cfg.big_batch_size * 8,
            concurrency=cfg.fallback_concurrency,
            num_cpus=1,
        )
    )
    if cfg.deterministic_order:
        final = final.sort("url")
    return final


def read_pages(path: str) -> "ray.data.Dataset":
    """Read a pages table, pruning to the columns the pipeline uses."""
    return ray.data.read_parquet(
        path, columns=["url", "warc_ts", "html", "text"]
    )


def run_extraction(
    source: Union[str, "ray.data.Dataset", pa.Table],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset":
    if isinstance(source, str):
        ds = read_pages(source)
    elif isinstance(source, pa.Table):
        ds = ray.data.from_arrow(source)
    else:
        ds = source
    return build_extraction(ds, cfg)
