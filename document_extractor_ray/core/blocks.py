"""Text-artifact block construction — byte-faithful to output_writer.py.

Builds the per-document text block (metadata header + ``=== [PAGE n] ===``
markers, ``output_writer.py:164-211``) as a string column plus
character-span offsets of each page's text within the block.  The
reference writes this to ``output/<run>/txt/<relpath>.txt``; the rebuild
keeps it as the ``extracted_text`` column (the byte-identity target per
url, BASELINE.json:14-15).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

from document_extractor_ray.config import PipelineConfig


@dataclass
class BlockResult:
    extracted_text: str = ""
    spans: List[Tuple[int, int, int]] = field(default_factory=list)  # (page, start, end)
    txt_relative_path: str = ""
    has_text: bool = False


def url_name(url: str) -> str:
    """Path(original_file).name analogue for urls (output_writer.py:42)."""
    return url.rstrip("/").rsplit("/", 1)[-1]


def url_relative_path(url: str, input_root: str) -> str:
    """Mirror output_writer.py:44-50: relative to INPUT_DIR, with the
    just-the-filename fallback when the url is outside the root."""
    root = input_root.rstrip("/")
    if url.startswith(root + "/"):
        return url[len(root) + 1 :]
    return url_name(url)


def with_txt_suffix(relpath: str) -> str:
    """Path(...).with_suffix('.txt') analogue (output_writer.py:56)."""
    head, sep, last = relpath.rpartition("/")
    dot = last.rfind(".")
    if dot > 0:  # a leading dot is a hidden file, not a suffix
        last = last[:dot]
    return f"{head}{sep}{last}.txt"


def build_block(
    url: str,
    pages: Sequence[Tuple[int, str]],
    pass_used: str,
    score: float,
    status: str,
    cfg: PipelineConfig,
) -> BlockResult:
    """Mirror of output_writer.write_result's text-artifact construction
    (output_writer.py:153-193): header f-strings, blank-line placement,
    the ``if text:`` falsy skip, and the trailing ``"\\n".join + "\\n"``.

    ``processed_at`` is the injected deterministic clock
    (output_writer.py:147 uses wall-clock UTC; goldens need stability).
    """
    relative_path = url_relative_path(url, cfg.input_root)
    pages_count = len(pages)

    has_text = False
    for _, text in pages:
        if text and str(text).strip():
            has_text = True
            break
    if not has_text:
        return BlockResult()

    header_lines = [
        f"# original_file: {url}",
        f"# original_name: {url_name(url)}",
        f"# relative_path: {relative_path}",
        f"# pages: {pages_count}",
        f"# processed_at: {cfg.processed_at}",
        f"# pass_used: {pass_used}",
        f"# score: {score}",
        f"# status: {status}",
    ]

    content_lines: List[str] = []
    content_lines.extend(header_lines)
    content_lines.append("")  # blank line between header and content

    # Track char offsets: each line contributes len(line)+1 ("\n" join).
    cum = sum(len(l) + 1 for l in content_lines)
    spans: List[Tuple[int, int, int]] = []

    for page_num, text in pages:
        marker = f"=== [PAGE {page_num}] ==="
        content_lines.append(marker)
        cum += len(marker) + 1
        content_lines.append("")
        cum += 1
        if text:
            s = str(text)
            content_lines.append(s)
            spans.append((int(page_num), cum, cum + len(s)))
            cum += len(s) + 1
        else:
            spans.append((int(page_num), cum, cum))
        content_lines.append("")
        cum += 1

    doc_text_block = "\n".join(content_lines) + "\n"
    return BlockResult(
        extracted_text=doc_text_block,
        spans=spans,
        txt_relative_path=with_txt_suffix(relative_path),
        has_text=True,
    )
