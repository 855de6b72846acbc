"""Reference-compatible output layout.

Materializes the exact on-disk layout the reference produces for a run
(so a user of ``document-extractor`` can switch engines and keep their
downstream tooling):

    <out>/<run_id>.csv                      12-col run index (process_run.py:21-34)
    <out>/txt/<relative_path>.txt           per-doc text artifacts (output_writer.py:164-211)
    <out>/<run_id>_all_text_###.txt         combined chunks + DOCUMENT BREAK (output_writer.py:213-228)
    <out>/review_manifest.csv               quarantine manifest (process_run.py:68-81)
    <out>/Mandatory Review/                 marker dir (files are never moved —
                                            quarantine is data; the dir exists for
                                            layout compatibility, process_run.py:41)

Driver-side sequential sink over the sorted final table — ordered
semantics (chunk numbering, append order) make this inherently a
single pass; it streams via iter_batches and only ever holds one batch
of documents in memory."""

from __future__ import annotations

import csv
import os
from typing import Union

import pyarrow as pa

from document_extractor_ray.config import DEFAULT_CONFIG, PipelineConfig
from document_extractor_ray.core.blocks import url_name, url_relative_path
from document_extractor_ray.core.records import RESULT_STATUSES


def write_reference_layout(
    final_sorted: Union[pa.Table, "object"],
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """final table/Dataset (sorted by url) -> reference run layout."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "Mandatory Review"), exist_ok=True)

    csv_path = os.path.join(out_dir, f"{cfg.run_id}.csv")
    manifest_path = os.path.join(out_dir, "review_manifest.csv")

    def batches():
        if isinstance(final_sorted, pa.Table):
            yield final_sorted
        else:
            yield from final_sorted.iter_batches(batch_size=512, batch_format="pyarrow")

    n_txt = 0
    combined_files = []
    chunk_state = {"chunk_id": 1, "current": 0, "first": True}
    combined_fh = None
    manifest_started = False
    quarantined_names: dict = {}

    def disambiguate(rel: str) -> str:
        """Collision handling for quarantine manifest names, mirroring
        move_to_manual.sh:29-37 (which suffixes a timestamp before the
        extension when the Mandatory Review target exists).  Quarantine
        here is data, not file moves, so the deterministic analogue is
        an ordinal suffix: two DIFFERENT docs deriving the same
        relative_path stay distinguishable in review_manifest.csv."""
        k = quarantined_names.get(rel)
        quarantined_names[rel] = (k or 0) + 1
        if k is None:
            return rel
        base, dot, ext = rel.rpartition(".")
        if dot and base:
            return f"{base}_{k}.{ext}"
        return f"{rel}_{k}"

    from document_extractor_ray.core.chunking import DOCUMENT_BREAK, chunk_file_name

    with open(csv_path, "w", newline="", encoding="utf-8") as fcsv:
        # header via plain writer, rows via QUOTE_ALL — mirroring
        # process_run._write_header_if_needed + output_writer row quoting
        csv.writer(fcsv).writerow(
            [
                "original_file",
                "original_name",
                "relative_path",
                "txt_relative_path",
                "pages",
                "processed_at",
                "pass_used",
                "score",
                "status",
                "used_ocr",
                "run_id",
                "notes",
            ]
        )
        qw = csv.writer(fcsv, quoting=csv.QUOTE_ALL)
        try:
            for batch in batches():
                for row in batch.to_pylist():
                    status = row["status"]
                    # review manifest for every quarantined doc
                    if row["quarantine"]:
                        new = not manifest_started and not os.path.exists(manifest_path)
                        with open(manifest_path, "a", newline="", encoding="utf-8") as fm:
                            w = csv.writer(fm)
                            if new:
                                w.writerow(["filename", "reason"])
                            w.writerow(
                                [
                                    disambiguate(
                                        url_relative_path(row["url"], cfg.input_root)
                                    ),
                                    row["reason"],
                                ]
                            )
                        manifest_started = True
                    if status not in RESULT_STATUSES:
                        continue  # NOISE / MANDATORY_REVIEW / LOW_DISK: no index row
                    block = row["extracted_text"]
                    txt_rel = row["txt_relative_path"]
                    if block and txt_rel:
                        txt_path = os.path.join(out_dir, "txt", txt_rel)
                        os.makedirs(os.path.dirname(txt_path), exist_ok=True)
                        with open(txt_path, "w", encoding="utf-8", newline="") as f:
                            f.write(block)
                        n_txt += 1
                        # combined chunks
                        doc_bytes = len(block.encode("utf-8"))
                        st = chunk_state
                        if not st["first"] and st["current"] + doc_bytes > cfg.max_combined_bytes:
                            st["chunk_id"] += 1
                            st["current"] = 0
                            st["first"] = True
                        if st["first"]:
                            if combined_fh:
                                combined_fh.close()
                            cpath = os.path.join(
                                out_dir, chunk_file_name(cfg.run_id, st["chunk_id"])
                            )
                            combined_fh = open(cpath, "w", encoding="utf-8", newline="")
                            combined_files.append(cpath)
                        combined_fh.write(block)
                        combined_fh.write(DOCUMENT_BREAK)
                        st["current"] += doc_bytes + len(DOCUMENT_BREAK.encode("utf-8"))
                        st["first"] = False
                    qw.writerow(
                        [
                            row["url"],
                            url_name(row["url"]),
                            url_relative_path(row["url"], cfg.input_root),
                            txt_rel,
                            row["n_units"],
                            row["processed_at"],
                            row["pass_used"],
                            f"{float(row['score']):.2f}" if row["score"] is not None else "",
                            status,
                            str(bool(row["used_ocr"])).lower(),
                            cfg.run_id,
                            row["notes"] or "",
                        ]
                    )
        finally:
            if combined_fh:
                combined_fh.close()

    return {
        "csv": csv_path,
        "n_txt_files": n_txt,
        "combined_files": combined_files,
        "review_manifest": manifest_path if manifest_started else "",
    }
