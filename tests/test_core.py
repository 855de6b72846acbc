"""Unit tests: sniffing, codecs, html extraction, cascade gating,
block construction, chunk assignment."""

import pyarrow as pa
import pytest

from document_extractor_ray.config import DEFAULT_CONFIG
from document_extractor_ray.core import blocks, cascade, chunking, htmlx, sniff


class TestSniff:
    def test_magic_routes(self):
        assert sniff.sniff_kind(b"RIFF\x00\x00\x00\x00WAVEdata") == "noise"
        assert sniff.sniff_kind(b"PK\x03\x04junk") == "unsupported"
        assert sniff.sniff_kind(sniff.encode_container([("a.html", b"<p>x</p>")])) == "container"
        assert sniff.sniff_kind(sniff.encode_multiframe(["x"])) == "multi_unit"
        assert sniff.sniff_kind(b"<!DOCTYPE html><html></html>") == "html"
        assert sniff.sniff_kind(b"  <html><body>x</body></html>") == "html"
        assert sniff.sniff_kind(b"") == "txt"
        assert sniff.sniff_kind(b"\x00\x01\x02 random") == "unsupported"

    def test_multiframe_roundtrip(self):
        frames = ["first frame", "second\nframe", "unicode 文本"]
        assert sniff.decode_multiframe(sniff.encode_multiframe(frames)) == frames

    def test_container_roundtrip(self):
        children = [("a.html", b"<p>hello</p>"), ("b.tif", b"MUF1junk")]
        assert sniff.decode_container(sniff.encode_container(children)) == children

    def test_child_url(self):
        assert sniff.child_url("https://x/y.pdf", "c.tif") == "https://x/y.pdf::c.tif"

    def test_size_bucket(self):
        assert sniff.size_bucket(100) == 0
        assert sniff.size_bucket(64 * 1024) == 1
        assert sniff.size_bucket(2 * 1024 * 1024) == 2
        assert sniff.size_bucket(100 * 1024 * 1024) == 3


class TestHtmlExtraction:
    def test_visible_drops_nav(self):
        html = (
            "<html><body><nav><ul><li><a href='/'>Home page</a></li>"
            "<li><a href='/b'>About page</a></li></ul></nav>"
            "<div><p>Real content paragraph here.</p></div></body></html>"
        )
        out = htmlx.extract_visible(html)
        assert "Real content paragraph here." in out
        assert "Home page" not in out

    def test_script_style_title_skipped(self):
        html = (
            "<html><head><title>Page Title</title><style>b{}</style>"
            "<script>var x='hello';</script></head>"
            "<body><p>Visible text.</p></body></html>"
        )
        out = htmlx.extract_visible(html)
        assert out == "Visible text."

    def test_entities_unescaped(self):
        assert htmlx.extract_visible("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_comments_stripped(self):
        assert htmlx.extract_visible("<p>keep</p><!-- drop > this -->") == "keep"

    def test_aggressive_includes_alt_text(self):
        html = '<p>cap</p><img alt="Recovered alt sentence here">'
        out = htmlx.extract_aggressive(html)
        assert "Recovered alt sentence here" in out

    def test_aggressive_drops_soup_lines(self):
        html = "<p>good clean line of text</p><p>#$% ^&amp;* ()!!</p>"
        out = htmlx.extract_aggressive(html)
        assert "good clean line" in out
        assert "#$%" not in out

    def test_best_argmax_first_on_tie(self):
        text, rel = htmlx.extract_best("<p>all clean words here</p>")
        assert text == "all clean words here"
        assert rel > 0.7

    def test_split_pages(self):
        assert htmlx.split_pages("a<!--PAGE-->b<!--PAGE-->c") == ["a", "b", "c"]
        assert htmlx.split_pages("no delim") == ["no delim"]

    def test_decode_payload_errors_ignored(self):
        assert htmlx.decode_payload(b"ok \xff\xfe bytes") == "ok  bytes"


class TestCascade:
    def test_mode_switch(self):
        cfg = DEFAULT_CONFIG
        assert cascade.initial_mode(10, 1, cfg) == "per-doc"
        assert cascade.initial_mode(cfg.big_size_bytes, 1, cfg) == "per-page"
        assert cascade.initial_mode(10, cfg.big_page_limit, cfg) == "per-page"

    def test_clean_accepts_pass1_per_doc(self):
        html = b"<html><body><p>plenty of clean readable words in this sentence here now</p></body></html>"
        res = cascade.process_html(html, DEFAULT_CONFIG)
        assert res.status == "OK"
        assert res.pass_used == "html_text"
        assert res.used_ocr is False
        assert res.mode == "per-doc"
        assert len(res.pages) == 1 and res.pages[0][0] == 1

    def test_scan_only_triage_rejects_to_fallback(self):
        html = b'<html><body><p>tiny</p><img alt="the recovered hidden sentence with plenty of words here"></body></html>'
        res = cascade.process_html(html, DEFAULT_CONFIG)
        assert res.pass_used == "html_ocr_a"
        assert res.used_ocr is True
        assert res.mode == "per-page"  # forced per-page once OCR needed

    def test_hopeless_all_fail(self):
        html = b"<html><body><p>#$% ^* ()! #$% ^* ()! #$% ^* ()! #$% ^* ()!</p></body></html>"
        res = cascade.process_html(html, DEFAULT_CONFIG)
        assert res.status == "ERROR"
        assert res.pass_used == "html_ocr_b"  # last attempted pass
        assert res.used_ocr is True
        assert res.score == 0.0
        assert res.pages == []
        assert res.quarantine is True
        assert res.reason == "pass rc=1"

    def test_per_page_score_is_max_page_rel(self):
        # pass-1 accepted in per-page mode: payload has no doc-level
        # reliability -> score = max page rel (pass_pdf.py:140-143)
        pages = ["<p>clean words here in the first page text</p>"] * 3
        html = "<!--PAGE-->".join(pages).encode()
        cfg = DEFAULT_CONFIG.with_(big_page_limit=3)
        res = cascade.process_html(html, cfg)
        assert res.status == "OK"
        assert res.mode == "per-page"
        assert res.score == max(res.page_rels)

    def test_low_disk_guard(self):
        cfg = DEFAULT_CONFIG.with_(simulate_low_disk=True)
        html = b"<html><body><p>#$% ^* ()! #$% ^* ()! #$% ^* ()! #$%</p></body></html>"
        res = cascade.process_html(html, cfg)
        assert res.status == "LOW_DISK"
        assert res.quarantine is True

    def test_stage_disable_flags(self):
        # G6 probe wrappers: disabling pass 1 forces the cascade path
        clean = b"<html><body><p>plenty of clean readable words in this sentence here now</p></body></html>"
        cfg = DEFAULT_CONFIG.with_(enable_txt_pass=False)
        res = cascade.process_html(clean, cfg)
        assert res.pass_used == "html_ocr_a"

    def test_txt_route(self):
        res = cascade.process_txt("some plain text", DEFAULT_CONFIG)
        assert res.status == "OK" and res.pass_used == "txt"
        res = cascade.process_txt("   ", DEFAULT_CONFIG)
        assert res.status == "ERROR"
        assert res.quarantine is False  # pass_txt exits 0 even on ERROR

    def test_img_route_labels(self):
        single = sniff.encode_multiframe(["one frame text"])
        res = cascade.process_img(single, DEFAULT_CONFIG)
        assert res.page_labels == ["-"]  # pass_img.py:120
        multi = sniff.encode_multiframe(["frame one text", "frame two text"])
        res = cascade.process_img(multi, DEFAULT_CONFIG)
        assert res.page_labels == ["1", "2"]
        assert res.status == "OK"

    def test_img_variant_b_wins_on_noisy_frame(self):
        noisy_frame = "clean sentence of words\n#$% ^* ()!! #$%"
        text, rel = cascade._img_variants(noisy_frame, DEFAULT_CONFIG)
        assert text == "clean sentence of words"


class TestBlocks:
    def test_block_bytes(self):
        cfg = DEFAULT_CONFIG
        b = blocks.build_block(
            "https://fixtures.test/clean/000007",
            [(1, "page one text"), (2, "")],
            "html_text",
            0.8123,
            "OK",
            cfg,
        )
        expected = (
            "# original_file: https://fixtures.test/clean/000007\n"
            "# original_name: 000007\n"
            "# relative_path: clean/000007\n"
            "# pages: 2\n"
            f"# processed_at: {cfg.processed_at}\n"
            "# pass_used: html_text\n"
            "# score: 0.8123\n"
            "# status: OK\n"
            "\n"
            "=== [PAGE 1] ===\n"
            "\n"
            "page one text\n"
            "\n"
            "=== [PAGE 2] ===\n"
            "\n"
            "\n"
        )
        assert b.extracted_text == expected
        assert b.txt_relative_path == "clean/000007.txt"

    def test_spans_index_into_block(self):
        b = blocks.build_block(
            "https://fixtures.test/x/a", [(1, "alpha"), (2, "beta")],
            "html_text", 0.9, "OK", DEFAULT_CONFIG,
        )
        for (page, start, end), want in zip(b.spans, ["alpha", "beta"]):
            assert b.extracted_text[start:end] == want

    def test_no_text_no_block(self):
        b = blocks.build_block(
            "https://x/a", [(1, "   "), (2, "")], "p", 0.0, "ERROR", DEFAULT_CONFIG
        )
        assert b.extracted_text == "" and b.spans == [] and not b.has_text

    def test_relative_path_fallback(self):
        # url outside input_root falls back to the name (output_writer.py:47-50)
        assert blocks.url_relative_path("http://other.site/a/b", "https://fixtures.test") == "b"

    def test_with_txt_suffix(self):
        assert blocks.with_txt_suffix("a/b.html") == "a/b.txt"
        assert blocks.with_txt_suffix("a/b") == "a/b.txt"
        assert blocks.with_txt_suffix(".hidden") == ".hidden.txt"


class TestChunking:
    def test_assignment(self):
        # break marker is 27 bytes
        sizes = [100, 100, 100]
        assert list(chunking.assign_chunks(sizes, max_bytes=260)) == [1, 1, 2]

    def test_doc_never_split_and_oversized_doc_own_chunk(self):
        sizes = [500, 100]
        assert list(chunking.assign_chunks(sizes, max_bytes=300)) == [1, 2]
        # first doc of a chunk always fits (reference: empty file accepts)
        assert list(chunking.assign_chunks([10_000], max_bytes=300)) == [1]

    def test_break_accounting_matches_reference(self):
        # current_size includes prior break markers (output_writer.py:100)
        bb = chunking.DOCUMENT_BREAK_BYTES
        sizes = [100, 100, 100]
        # chunk 1 after two docs: 200 + 2*bb; third fits iff 200+2*bb+100 <= max
        assert list(chunking.assign_chunks(sizes, max_bytes=300 + 2 * bb)) == [1, 1, 1]
        assert list(chunking.assign_chunks(sizes, max_bytes=299 + 2 * bb)) == [1, 1, 2]

    def test_file_name(self):
        assert chunking.chunk_file_name("run-0001", 7) == "run-0001_all_text_007.txt"


def test_multiframe_two_tier_probe():
    """common.py:272-309 pdf_page_count mirror: full decode first,
    header metadata second, raise when both fail."""
    import struct

    import pytest

    from document_extractor_ray.core import sniff

    good = sniff.encode_multiframe(["a", "b", "c"])
    assert sniff.multiframe_frame_count(good) == 3
    # truncated frame bodies: full decode fails, header count survives
    header_only = good[:10]
    assert sniff.multiframe_frame_count(header_only) == 3
    # both tiers fail
    with pytest.raises(RuntimeError):
        sniff.multiframe_frame_count(b"MUF1")  # no count field
    with pytest.raises(RuntimeError):
        sniff.multiframe_frame_count(b"MUF1" + struct.pack("<I", 0))


def test_zip_flavor_content_routing():
    """Content-level xlsx-vs-docx distinction (process_run.py:36
    UNSUPPORTED_EXTS routes .xlsx by name; a web corpus has no names)."""
    import pytest

    from document_extractor_ray.core import sniff

    xlsx = b"PK\x03\x04" + b"\x00" * 22 + b"xl/workbook.xml..."
    docx = b"PK\x03\x04" + b"\x00" * 22 + b"word/document.xml..."
    other = b"PK\x03\x04" + b"\x00" * 22 + b"data/blob.bin"
    assert sniff.zip_flavor(xlsx) == "xlsx"
    assert sniff.zip_flavor(docx) == "docx"
    assert sniff.zip_flavor(other) == "zip"
    # every PK flavor still routes unsupported through the sniffer
    for p in (xlsx, docx, other):
        assert sniff.sniff_kind(p) == sniff.KIND_UNSUPPORTED
    with pytest.raises(ValueError):
        sniff.zip_flavor(b"nope")
