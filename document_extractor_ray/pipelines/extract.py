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
from document_extractor_ray.stages.extract import primary_extract, route_primary
from document_extractor_ray.stages.fallback import FallbackExtractor, make_fallback_fn
from document_extractor_ray.stages.route import route_and_explode

BIG_BUCKET = 1  # size_bucket >= this goes down the big-document lane (>= 64 KiB)


def dedup_first(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact dedup by url keeping the earliest warc_ts row (ST6 —
    the reference's unimplemented checksum cache, TODO.md:20).

    Scale shape: a naive ``groupby(url).map_groups(first)`` shuffles
    every payload byte AND pays a Python call per group (measured: it
    capped the whole pipeline at ~3.7k docs/s).  Instead:

    1. count pass over the ``url`` column only (projection pushed into
       the parquet read) — a slim vectorized aggregate shuffle;
    2. urls with count > 1 (rare: re-crawled pages) are broadcast as a
       set via ray.put;
    3. non-duplicated rows stream through untouched — their payloads
       never shuffle; only the duplicated subset takes the
       groupby(url) -> first-by-warc_ts path.

    The winner timestamps for duplicated urls are broadcast and the
    full stream is filtered in one pass — so payload bytes never
    shuffle and the input is planned twice only in the slim projection.
    Caveat: two rows with an identical (url, warc_ts) pair would both
    survive; crawl captures carry distinct timestamps, and the fixture
    corpus guarantees it.  Skip with cfg.dedup=False when inputs are
    known unique."""
    from ray.data.aggregate import Count, Min

    slim = ds.select_columns(["url", "warc_ts"])
    per_url = slim.groupby("url").aggregate(
        Min("warc_ts", alias_name="min_ts"), Count(alias_name="n")
    )
    dup_winners = {
        r["url"]: r["min_ts"]
        for batch in per_url.map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        for r in batch.to_pylist()
    }
    if not dup_winners:
        return ds

    ref = ray.put(dup_winners)

    def keep_winners(t: pa.Table) -> pa.Table:
        winners = ray.get(ref)
        # Vectorized fast path: only rows whose url is duplicated at all
        # (pc.is_in against the small dup set) need the per-row check.
        dup_mask = pc.is_in(t["url"], value_set=pa.array(list(winners.keys())))
        if not pc.any(dup_mask).as_py():
            return t
        keep = dup_mask.to_numpy(zero_copy_only=False).copy()
        idxs = [i for i, d in enumerate(keep) if d]
        urls = t["url"].take(pa.array(idxs)).to_pylist()
        tss = t["warc_ts"].take(pa.array(idxs)).to_pylist()
        for i, u, ts in zip(idxs, urls, tss):
            keep[i] = ts == winners[u]
        mask = pc.or_(pc.invert(dup_mask), pa.array(keep, pa.bool_()))
        return t.filter(mask)

    return ds.map_batches(keep_winners, batch_format="pyarrow")


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

    # Fused sniff+explode+pass-1 (one intermediate Arrow materialization
    # of the payload column instead of two; see route_primary docstring).
    ds = ds.map_batches(
        route_primary,
        batch_format="pyarrow",
        fn_kwargs={"cfg": cfg},
        batch_size=cfg.small_batch_size,
    )

    # Fallback stage: stateless tasks by default.  The per-worker state
    # (compiled regexes, the unicode table) is module-level and worker
    # processes are reused across tasks, so tasks amortize init exactly
    # like an actor pool — without the measured ~5 s pool spin-up per
    # execution and without the pool-size/CPU-starvation tuning (a pool
    # == num_cpus deadlocks the fused plan).  cfg.fallback_actor_pool
    # selects the explicit pool for deployments that want pinned
    # resources (e.g. a model-loading variant of the stage).
    if cfg.fallback_actor_pool:
        final = ds.map_batches(
            FallbackExtractor,
            batch_format="pyarrow",
            fn_constructor_kwargs={"cfg": cfg},
            batch_size=cfg.big_batch_size * 8,
            concurrency=_pool_size(cfg),
            num_cpus=1,
        )
    else:
        final = ds.map_batches(
            make_fallback_fn(cfg),
            batch_format="pyarrow",
            batch_size=cfg.big_batch_size * 8,
        )
    if cfg.deterministic_order:
        final = final.sort("url")
    return final


def _pool_size(cfg: PipelineConfig) -> int:
    """Fallback actor pool size: HALF the cluster CPUs, fixed.

    Measured on the 20k-doc bench (32 cpus): autoscaling (1, 64) pays a
    ramp from one actor (~30s); a fixed pool equal to num_cpus
    DEADLOCKS (the pool reserves every CPU and the read/shuffle stages
    starve — also the cause of a flaky full-pipeline hang); half the
    CPUs ran fastest (11.7s vs 30.6s).  Ray fuses the upstream task
    stages into this pool, so it is the pipeline's compute engine and
    the remaining CPUs serve reads, shuffles and the object store."""
    import ray

    if ray.is_initialized():
        n = int(ray.cluster_resources().get("CPU", 8))
    else:
        n = 8
    return max(2, n // 2)


def read_pages(path: str) -> "ray.data.Dataset":
    """Read a pages table, pruning to the columns the pipeline uses.

    Blocks ~ 2x cluster CPUs: enough slack for pipelining without the
    tiny-block task/shuffle overhead the default splitter produces."""
    n = 32
    if ray.is_initialized():
        n = max(8, 2 * int(ray.cluster_resources().get("CPU", 16)))
    return ray.data.read_parquet(
        path, columns=["url", "warc_ts", "html", "text"], override_num_blocks=n
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
