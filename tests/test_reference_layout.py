"""Tests for the reference-compatible on-disk run layout."""

import csv
import os

import pytest

from document_extractor_ray.config import DEFAULT_CONFIG
from document_extractor_ray.core.chunking import DOCUMENT_BREAK
from document_extractor_ray.pipelines.reference_layout import write_reference_layout


@pytest.fixture(scope="module")
def layout(small_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ref_layout"))
    info = write_reference_layout(small_corpus["oracle"]["final"], out, DEFAULT_CONFIG)
    return out, info, small_corpus["oracle"]["final"]


def test_index_csv_matches_results(layout):
    out, info, final = layout
    with open(info["csv"], newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    assert header == [
        "original_file", "original_name", "relative_path", "txt_relative_path",
        "pages", "processed_at", "pass_used", "score", "status", "used_ocr",
        "run_id", "notes",
    ]
    from document_extractor_ray.core.records import project_results

    results = project_results(final)
    assert len(body) == results.num_rows
    by_url = {r[0]: r for r in body}
    for rec in results.to_pylist():
        row = by_url[rec["url"]]
        assert row[7] == f"{rec['score']:.2f}"
        assert row[9] == str(bool(rec["used_ocr"])).lower()
        assert row[8] == rec["status"]


def test_txt_files_byte_identical(layout):
    out, info, final = layout
    checked = 0
    for rec in final.to_pylist():
        if rec["extracted_text"] and rec["txt_relative_path"]:
            path = os.path.join(out, "txt", rec["txt_relative_path"])
            assert os.path.exists(path), path
            assert open(path, encoding="utf-8", newline="").read() == rec["extracted_text"]
            checked += 1
            if checked >= 25:
                break
    assert checked > 0


def test_combined_chunks_and_manifest(layout):
    out, info, final = layout
    assert info["combined_files"]
    data = open(info["combined_files"][0], encoding="utf-8").read()
    assert DOCUMENT_BREAK in data
    # review manifest covers every quarantined doc
    with open(info["review_manifest"], newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["filename", "reason"]
    n_quar = sum(1 for r in final.to_pylist() if r["quarantine"])
    assert len(rows) - 1 == n_quar
    # Mandatory Review marker dir exists
    assert os.path.isdir(os.path.join(out, "Mandatory Review"))


def test_noise_and_review_have_no_index_rows(layout):
    out, info, final = layout
    with open(info["csv"], newline="", encoding="utf-8") as f:
        urls = {r[0] for r in list(csv.reader(f))[1:]}
    for rec in final.to_pylist():
        if rec["status"] in ("NOISE", "MANDATORY_REVIEW", "LOW_DISK"):
            assert rec["url"] not in urls


def test_legacy_six_col_csv(tmp_path, small_corpus):
    from document_extractor_ray.pipelines.outputs import write_legacy_csv
    from document_extractor_ray.core.records import explode_unit_rows

    units = explode_unit_rows(small_corpus["oracle"]["final"])
    path = str(tmp_path / "legacy.csv")
    write_legacy_csv(units, path)
    with open(path, newline="", encoding="utf-8") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["filename", "page", "text", "method", "used_ocr", "reliability"]
    assert len(rows) - 1 == units.num_rows
    # QUOTE_ALL: every field of the raw line is quoted
    raw = open(path, encoding="utf-8").read().splitlines()[1]
    assert raw.startswith('"')
    for r in rows[1:3]:
        assert r[4] == "true" and len(r) == 6
