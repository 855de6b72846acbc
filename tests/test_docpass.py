"""Tests for the DOC/DOCX route (pass_doc.py mirror) and the related
config/registry surfaces."""

import pytest

from document_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from document_extractor_ray.core import cascade, docpass, sniff
from document_extractor_ray.core.scoring import legacy_clean_text, score_reliability


class TestDocxText:
    def test_paragraphs_then_cells(self):
        payload = (
            b"DOCX<w:p>first para</w:p><w:p>second para</w:p>"
            b"<w:tbl><w:tr><w:tc>cell one</w:tc><w:tc>cell two</w:tc></w:tr></w:tbl>"
        )
        assert docpass.docx_text(payload) == "first para\nsecond para\ncell one\ncell two"

    def test_entities_unescaped(self):
        assert docpass.docx_text(b"DOCX<w:p>a &amp; b</w:p>") == "a & b"

    def test_doc_printable_recovery(self):
        payload = b"DOC1hello\x01\x02 world\x00\x07 again"
        assert docpass.doc_text(payload) == "hello world again"

    def test_doc_empty_raises(self):
        with pytest.raises(RuntimeError):
            docpass.doc_text(b"DOC1\x01\x02\x03")


class TestDocRoute:
    def test_sniff(self):
        assert sniff.sniff_kind(b"DOCX<w:p>x</w:p>") == "docx"
        assert sniff.sniff_kind(b"DOC1hello") == "doc"

    def test_native_accept(self):
        payload = b"DOCX<w:p>plenty of clean readable words here in this paragraph now</w:p>"
        res = docpass.process_doc("docx", payload, DEFAULT_CONFIG)
        assert res.status == "OK" and res.pass_used == "docx_text"
        assert res.score >= DEFAULT_CONFIG.docx_cutoff
        assert not res.quarantine

    def test_fallback_accept(self):
        # below the native gate (heavy punctuation) but recoverable text
        line = "words;;; with;;; much;;; punctuation;;; here;;; still;;; readable"
        payload = b"DOCX<w:p>" + line.encode() + b"</w:p>"
        native_rel = score_reliability(line)
        assert native_rel < DEFAULT_CONFIG.docx_cutoff
        res = docpass.process_doc("docx", payload, DEFAULT_CONFIG)
        assert res.status == "OK" and res.pass_used == "doc_pdf_text"

    def test_fallback_fail_quarantines(self):
        payload = b"DOCX<w:p>### $$$ %%% ^^^ ### $$$ %%% ^^^ ### $$$</w:p>"
        res = docpass.process_doc("docx", payload, DEFAULT_CONFIG)
        assert res.status == "ERROR" and res.pass_used == "docx_text"
        assert res.quarantine and res.reason == "pass rc=1"

    def test_extract_error_row(self):
        res = docpass.process_doc("doc", b"DOC1\x01\x02", DEFAULT_CONFIG)
        assert res.status == "ERROR" and res.pass_used == "doc_extract_error"
        assert res.quarantine

    def test_doc_vs_docx_cutoffs(self):
        # identical mid-rel text: accepted under DOCX's 0.70 but not DOC's 0.75
        base = "some words with just enough punctuation to sit between cutoffs"
        pad = round(sum(c.isalnum() for c in base) / 0.72 - len(base))
        line = base + "." * pad  # alnum ratio ~0.716: between 0.70 and 0.75
        rel = score_reliability(line)
        assert 0.70 <= rel < 0.75, rel
        ok_docx = docpass.process_doc("docx", b"DOCX<w:p>" + line.encode() + b"</w:p>", DEFAULT_CONFIG)
        assert ok_docx.pass_used == "docx_text"
        res_doc = docpass.process_doc("doc", b"DOC1" + line.encode(), DEFAULT_CONFIG)
        assert res_doc.pass_used == "doc_pdf_text"  # falls back, then accepts

    def test_registry_dispatch(self):
        payload = b"DOCX<w:p>plenty of clean readable words here in this paragraph now</w:p>"
        res = cascade.process_any("docx", payload, "", DEFAULT_CONFIG)
        assert res.pass_used == "docx_text"

    def test_register_custom_route(self):
        def handler(payload, text, cfg):
            return cascade.DocResult(status="OK", pass_used="custom", pages=[(1, "x")])

        cascade.register_route("weird", handler)
        try:
            res = cascade.process_any("weird", b"", "", DEFAULT_CONFIG)
            assert res.pass_used == "custom"
        finally:
            del cascade.ROUTES["weird"]
        assert cascade.process_any("weird", b"", "", DEFAULT_CONFIG).status == "MANDATORY_REVIEW"


class TestConfigSurfaces:
    def test_from_env_defaults_on_garbage(self):
        env = {"PASS_TXT_CUTOFF": "not-a-float", "BIGDOC_PAGE_LIMIT": "1e3"}
        cfg = PipelineConfig.from_env(env)
        assert cfg.txt_cutoff == DEFAULT_CONFIG.txt_cutoff
        assert cfg.big_page_limit == DEFAULT_CONFIG.big_page_limit

    def test_from_env_overrides(self):
        env = {"PASS_TXT_CUTOFF": "0.80", "PASS_OCR_A_CUTOFF": "0.70",
               "RUN_ID": "run-x", "BIGDOC_PAGE_LIMIT": "500"}
        cfg = PipelineConfig.from_env(env)
        assert cfg.txt_cutoff == 0.80 and cfg.ocr_a_cutoff == 0.70
        assert cfg.run_id == "run-x" and cfg.big_page_limit == 500

    def test_big_char_limit_g7(self):
        cfg = DEFAULT_CONFIG.with_(big_char_limit=100)
        assert cascade.initial_mode(10, 1, cfg, total_chars=150) == "per-page"
        assert cascade.initial_mode(10, 1, cfg, total_chars=50) == "per-doc"
        # disabled by default (the Python reference dropped the criterion)
        assert cascade.initial_mode(10, 1, DEFAULT_CONFIG, total_chars=10**9) == "per-doc"

    def test_legacy_clean_text(self):
        assert legacy_clean_text('a\r\nb "q"') == 'a\\nb ""q""'
