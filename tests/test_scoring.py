"""Unit tests for the scalar semantics (SURVEY.md §5.1) — table-driven
cases derived from the cited reference lines."""

import math

import pytest

from document_extractor_ray.core.scoring import (
    alnum_count,
    likely_scan_only,
    median,
    page_reliability,
    sample_page_indices,
    score_reliability,
)


class TestScoreReliability:
    """common.py:194-203"""

    def test_empty(self):
        assert score_reliability("") == 0.0
        assert score_reliability(None) == 0.0

    def test_all_alnum(self):
        assert score_reliability("abc123") == 1.0

    def test_ratio_rounded_4dp(self):
        # 3 alnum of 7 chars -> 0.428571... -> 0.4286
        assert score_reliability("a b c  ") == round(3 / 7, 4)

    def test_matches_naive_python_loop(self):
        # vectorized path must equal the reference's per-char loop
        cases = [
            "hello world",
            "文本抽出器測試",          # CJK ideographs are alnum
            "café número",             # accented letters are alnum
            "emoji \U0001f389 here",  # emoji are not
            "½⅓ fractions",           # numeric-other: isalnum() is True
            "a b",               # nbsp
            "tabs\tand\nnewlines",
            "ＡＢＣ fullwidth",
            "́ combining",
        ]
        for text in cases:
            naive = sum(ch.isalnum() for ch in text)
            assert alnum_count(text) == naive, text
            expected = round(max(0.0, min(1.0, naive / len(text))), 4)
            assert score_reliability(text) == expected, text

    def test_exact_three_quarters(self):
        assert score_reliability("ab c") == 0.75


class TestMedian:
    """common.py:205-214"""

    def test_empty(self):
        assert median([]) == 0.0

    def test_none_dropped(self):
        assert median([None, 1.0, None, 3.0]) == 2.0

    def test_odd_even(self):
        assert median([3, 1, 2]) == 2.0
        assert median([4, 1, 3, 2]) == 2.5


class TestLikelyScanOnly:
    """common.py:216-244"""

    def test_empty_list(self):
        assert likely_scan_only([]) is True

    def test_lengths(self):
        assert likely_scan_only([10, 10, 10]) is True   # sum 30 < 40
        assert likely_scan_only([20, 20, 20]) is False  # sum 60 >= 40

    def test_strings_joined(self):
        assert likely_scan_only(["short", "text"]) is True  # < 40 chars
        long_clean = ["this is a perfectly readable sentence here"] * 2
        assert likely_scan_only(long_clean) is False

    def test_noisy_text_rejected(self):
        noisy = "#$%^& *()!! #$%^& *()!! #$%^& *()!! #$%^& *()!!"
        assert score_reliability(noisy) < 0.15
        assert likely_scan_only(noisy) is True

    def test_short_strip(self):
        assert likely_scan_only("   " + "a" * 39 + "   ") is True
        assert likely_scan_only("a" * 40) is False


class TestSamplePageIndices:
    """common.py:352-371"""

    def test_small_doc_all_pages(self):
        assert sample_page_indices(3, 5) == [1, 2, 3]
        assert sample_page_indices(0, 5) == []

    def test_even_spacing(self):
        picks = sample_page_indices(100, 5)
        assert len(picks) == 5
        assert picks == sorted(set(picks))
        assert all(1 <= p <= 100 for p in picks)
        # reference formula: round(step*i) with step = n/(t+1)
        assert picks == [17, 33, 50, 67, 83]

    def test_padding_when_collapsed(self):
        # n slightly above t forces duplicate rounding -> padding loop
        for n in range(6, 20):
            picks = sample_page_indices(n, 5)
            assert len(picks) == 5
            assert picks == sorted(set(picks))


class TestPageReliabilityLegacy:
    """common_pdf.sh:98-156 weighted model"""

    def test_empty(self):
        assert page_reliability("") == 0.0

    def test_stopword_rich_prose_scores_higher(self):
        prose = "the cat and the dog went to the house of the king " * 10
        soup = "zxqv kjhw pqmz " * 20
        assert page_reliability(prose) > page_reliability(soup)

    def test_bounds(self):
        for text in ["a", "the " * 200, "#" * 500]:
            assert 0.0 <= page_reliability(text) <= 1.0
