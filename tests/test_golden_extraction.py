"""Golden end-to-end: the Ray pipeline's output must be byte-identical
per url to the sequential reference-faithful oracle (BASELINE.json:14,
SURVEY.md §5.2) — every column, including extracted_text bytes and
span offsets."""

import numpy as np
import pyarrow as pa
import pytest


def _normalize(v):
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, list):
        v = [_normalize(x) for x in v]
    if isinstance(v, dict):
        v = {k: _normalize(x) for k, x in v.items()}
    return v


@pytest.fixture(scope="module")
def ray_final(ray_session, small_corpus):
    from document_extractor_ray.pipelines.extract import run_extraction

    ds = run_extraction(small_corpus["pages"], small_corpus["cfg"])
    return sorted(ds.take_all(), key=lambda r: r["url"])


def test_byte_identical_per_url(ray_final, small_corpus):
    oracle_rows = small_corpus["oracle"]["final"].to_pylist()
    assert len(ray_final) == len(oracle_rows)
    for got, want in zip(ray_final, oracle_rows):
        assert got["url"] == want["url"]
        for key, expected in want.items():
            assert _normalize(got[key]) == expected, (
                f"{want['url']} field {key!r} differs"
            )


def test_every_route_class_covered(small_corpus):
    """The corpus must actually exercise every route/gate."""
    import collections, re

    final = small_corpus["oracle"]["final"]
    tags = collections.Counter()
    for u in final["url"].to_pylist():
        m = re.match(r"https://fixtures\.test/([a-z_]+)/", u)
        tags[m.group(1) if m else "child"] += 1
    for tag in (
        "clean boilerplate scan_only noisy hopeless giant multi_unit "
        "container plain_text docx doc unsupported noise".split()
    ):
        assert tags[tag] > 0, f"corpus missing class {tag}"


def test_pass_distribution(small_corpus):
    import collections

    final = small_corpus["oracle"]["final"]
    passes = collections.Counter(final["pass_used"].to_pylist())
    # all three cascade stages must win somewhere
    assert passes["html_text"] > 0
    assert passes["html_ocr_a"] > 0
    assert passes["html_ocr_b"] > 0
    statuses = collections.Counter(final["status"].to_pylist())
    assert statuses["ERROR"] > 0
    assert statuses["MANDATORY_REVIEW"] > 0
    assert statuses["NOISE"] > 0
    assert statuses["CONTAINER"] > 0
