"""WARC source tests: parse/serialize round-trip and pipeline parity
with the parquet source (the Common-Crawl-native input path)."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from document_extractor_ray.config import DEFAULT_CONFIG


def _null_text(pages: pa.Table) -> pa.Table:
    """Parquet twin of a raw crawl: WARC carries no pre-extracted text
    column, so the parity corpus nulls it on both paths."""
    cols = {c: pages[c] for c in pages.schema.names}
    cols["text"] = pa.nulls(pages.num_rows, pa.string())
    return pa.table(cols)


def test_warc_roundtrip_preserves_rows(tmp_path):
    from document_extractor_ray import fixtures
    from document_extractor_ray.sources import warc

    pages = fixtures.make_pages_table(80, seed=5)
    path = str(tmp_path / "fx.warc")
    n = warc.write_warc_fixture(pages, path)
    assert n == pages.num_rows
    got = list(warc.parse_warc_file(path))
    assert len(got) == pages.num_rows
    want_urls = pages["url"].to_pylist()
    want_html = [h or b"" for h in pages["html"].to_pylist()]
    assert [u for u, _, _ in got] == want_urls
    assert [h for _, _, h in got] == want_html
    # timestamps survive at second resolution (WARC-Date granularity;
    # the fixture corpus uses whole seconds so this is lossless)
    want_ts = [
        int(t.timestamp() * 1_000_000) if hasattr(t, "timestamp") else int(t)
        for t in pages["warc_ts"].to_pylist()
    ]
    assert [t for _, t, _ in got] == want_ts


def test_warc_gz_roundtrip(tmp_path):
    from document_extractor_ray import fixtures
    from document_extractor_ray.sources import warc

    pages = fixtures.make_pages_table(25, seed=6)
    path = str(tmp_path / "fx.warc.gz")
    warc.write_warc_fixture(pages, path)
    got = list(warc.parse_warc_file(path))
    assert len(got) == pages.num_rows


def test_warc_truncated_fails_loudly():
    from document_extractor_ray.sources import warc

    blob = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/\r\nContent-Length: 100\r\n\r\nshort"
    )
    with pytest.raises(ValueError, match="truncated"):
        list(warc.iter_warc_records(io.BytesIO(blob)))


def test_warc_pipeline_parity_with_parquet(ray_session, tmp_path):
    """Extraction over read_pages_warc must be row-identical to the
    parquet source over the same corpus (with text nulled on both —
    a raw crawl has no text column)."""
    from document_extractor_ray import fixtures
    from document_extractor_ray.pipelines.extract import run_extraction
    from document_extractor_ray.sources import warc

    pages = _null_text(fixtures.make_pages_table(120, seed=9))
    pq_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pq_path)
    w1 = str(tmp_path / "a.warc")
    w2 = str(tmp_path / "b.warc.gz")
    half = pages.num_rows // 2
    warc.write_warc_fixture(pages.slice(0, half), w1)
    warc.write_warc_fixture(pages.slice(half), w2)

    def canon(ds):
        return sorted(
            ({k: r[k] for k in sorted(r)} for r in ds.take_all()),
            key=lambda r: str(r["url"]),
        )

    a = canon(run_extraction(pq_path, DEFAULT_CONFIG))
    b = canon(
        run_extraction(warc.read_pages_warc([w1, w2]), DEFAULT_CONFIG)
    )
    assert a == b
    assert len(a) > 100
