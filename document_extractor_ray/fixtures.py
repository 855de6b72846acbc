"""Deterministic synthetic pages-table generator (FIXTURES.md §1-2).

Generates the Common-Crawl-style input table
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` with the corpus classes that exercise every route and
gate of the reference (clean / boilerplate / scan_only / noisy /
hopeless / giant / multi_unit / container / plain_text / unsupported /
noise), plus deterministic edge rows.

Everything derives from ``random.Random(f"{seed}:{tag}:{i}")`` — no
wall clock, no global RNG state, so the same (n, seed) always yields
the same table on any process (required for oracle-vs-pipeline
goldens and for regenerating bench inputs at two parallelism levels).
"""

from __future__ import annotations

import random
from datetime import datetime, timezone
from typing import List, Tuple

import pyarrow as pa

from document_extractor_ray.core import sniff

# Words of length >= 4 so prose alnum ratio stays safely above the
# pass-1 cutoff (ratio ~ mean_len/(mean_len+1) ~ 0.83).
WORDS = (
    "about above after again against almost alone along already always "
    "among animal answer around because become before began behind below "
    "between board bring brought called cannot carry certain change check "
    "children close cold color common complete could country course cover "
    "cross dark day decide deep develop differ direct does done draw drive "
    "early earth effect enough every example face fact family far feel few "
    "field figure final find fine fire first fish follow food foot force "
    "form found four free friend from front full game gave girl give gold "
    "gone good govern great green ground group grow half hand hard head "
    "hear heard heat held help here high hold home hope horse hour house "
    "however hundred idea inch interest island keep kind king knew know "
    "land language large last late laugh lead learn leave left letter life "
    "light line list little live long look machine made main make many map "
    "mark matter mean measure might mile mind minute miss money moon more "
    "morning most mother mountain move much music must name near need never "
    "night north note nothing notice noun number numeral object often old "
    "once only open order other page paper part pass pattern people perhaps "
    "person picture piece place plain plan plane plant play point port pose "
    "possible pound power press problem produce product pull question quick "
    "rain reach read ready real record remember rest river road rock room "
    "round rule run said same school science sea second seem self sentence "
    "serve set shape ship short should show side simple since sing slow "
    "small snow some song soon sound south space special spell stand star "
    "start state stay step still stood stop story street strong study such "
    "sure surface table tail take talk teach tell than that them then there "
    "these thing think this those though thought thousand three through time "
    "together told took toward town travel tree true turn under unit until "
    "usual very voice vowel wait walk want warm watch water week weight "
    "well went were what wheel when where which while white whole whose "
    "will wind wonder wood word work world would write year young"
).split()

SOUP_CHARS = "#$%^*()[]{}~!?;:+=|\\/.,-_'\""

# Bump when class fractions or builders change: cache file names embed
# it so stale /tmp corpora are never reused across code versions.
CORPUS_VERSION = 2

CLASS_FRACTIONS = [
    ("clean", 0.32),
    ("boilerplate", 0.14),
    ("scan_only", 0.10),
    ("noisy", 0.10),
    ("hopeless", 0.05),
    ("giant", 0.05),
    ("multi_unit", 0.05),
    ("container", 0.05),
    ("plain_text", 0.05),
    ("docx", 0.02),
    ("doc", 0.02),
    ("unsupported", 0.03),
    ("noise", 0.02),
]

BASE_TS = int(datetime(2025, 6, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)


def _rng(seed: int, tag: str, i: int) -> random.Random:
    return random.Random(f"{seed}:{tag}:{i}")


def _sentence(r: random.Random, lo: int = 6, hi: int = 12) -> str:
    n = r.randint(lo, hi)
    words = [r.choice(WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(r: random.Random, n_sent: int = 3) -> str:
    return " ".join(_sentence(r) for _ in range(n_sent))


def _soup_line(r: random.Random, n: int = 16) -> str:
    # A couple of letters keep the line ratio ~0.15 (above rel_cap in
    # aggregate but far below every keep threshold).
    chars = [r.choice(SOUP_CHARS) for _ in range(n)]
    chars[r.randrange(n)] = r.choice("abcdef")
    chars[r.randrange(n)] = r.choice("ghijkl")
    return " ".join("".join(chars[i : i + 4]) for i in range(0, n, 4))


def _mid_ratio_line(r: random.Random, target: float = 0.60) -> str:
    """A prose line padded with '.' so its alnum ratio lands just above
    ``target`` — keeps fallback-A's median below its 0.65 cutoff while
    fallback-B still accepts at 0.55 (the 'recover only at B' class)."""
    base = " ".join(r.choice(WORDS) for _ in range(r.randint(6, 10)))
    alnum = sum(ch.isalnum() for ch in base)
    total = len(base)
    pad = max(0, int(alnum / target) - total)
    return base + "." * pad


def _nav_block(r: random.Random, n_links: int) -> str:
    items = "".join(
        f'<li><a href="/{r.choice(WORDS)}">{r.choice(WORDS).capitalize()} '
        f"{r.choice(WORDS)}</a></li>"
        for _ in range(n_links)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _footer(r: random.Random) -> str:
    links = " | ".join(
        f'<a href="/{w}">{w.capitalize()}</a>'
        for w in (r.choice(WORDS), r.choice(WORDS), r.choice(WORDS))
    )
    return f"<footer>{links}</footer>"


def _page_html(
    r: random.Random,
    body_blocks: List[str],
    nav_links: int = 4,
    include_footer: bool = True,
) -> str:
    title = " ".join(r.choice(WORDS) for _ in range(3))
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>body{color:#222;margin:0}</style>"
        "<script>var t=1;function f(){return t;}</script>"
        "</head><body>"
        + (_nav_block(r, nav_links) if nav_links else "")
        + "".join(body_blocks)
        + (_footer(r) if include_footer else "")
        + "</body></html>"
    )


# ---------------------------------------------------------------------------
# Per-class document constructors -> (html_bytes, text, lang)
# ---------------------------------------------------------------------------

def _doc_clean(r: random.Random) -> Tuple[bytes, str, str]:
    paras = [f"<p>{_paragraph(r, r.randint(2, 4))}</p>" for _ in range(r.randint(2, 5))]
    body = [f"<div class='main'><h1>{_sentence(r, 3, 5)}</h1>"] + paras + ["</div>"]
    return _page_html(r, body).encode(), "", "en"


def _doc_boilerplate(r: random.Random) -> Tuple[bytes, str, str]:
    # Main content < 30% of markup: huge nav/ad link lists around one
    # short real paragraph.
    body = [
        _nav_block(r, r.randint(15, 30)),
        f"<div id='content'><p>{_paragraph(r, 2)}</p></div>",
        _nav_block(r, r.randint(10, 20)),
    ]
    return _page_html(r, body, nav_links=10).encode(), "", "en"


def _doc_scan_only(r: random.Random) -> Tuple[bytes, str, str]:
    # Visible text < 40 chars; the real content lives in alt attributes
    # (the web stand-in for OCR-able pixels).
    imgs = "".join(
        f'<img src="scan{k}.png" alt="{_paragraph(r, 2)}">' for k in range(r.randint(2, 4))
    )
    body = [f"<div><p>Scan {r.randint(1, 99)}</p>{imgs}</div>"]
    return _page_html(r, body, nav_links=0).encode(), "", "en"


def _doc_noisy(r: random.Random, recover_at_b: bool) -> Tuple[bytes, str, str]:
    if recover_at_b:
        # every line mid-ratio (~0.60): pass1 fails (<0.75), A's filter
        # keeps them but median < 0.65, B accepts at >= 0.55.
        lines = [_mid_ratio_line(r) for _ in range(r.randint(6, 10))]
    else:
        # prose interleaved with soup: pass1 fails, A's filter drops the
        # soup and accepts (>= 0.65).
        lines = []
        for _ in range(r.randint(4, 7)):
            lines.append(_sentence(r, 8, 12))
            lines.append(_soup_line(r))
    body = ["<div>"] + [f"<p>{ln}</p>" for ln in lines] + ["</div>"]
    return _page_html(r, body, nav_links=0).encode(), "", "en"


def _doc_hopeless(r: random.Random) -> Tuple[bytes, str, str]:
    # No nav and no footer: nothing anywhere scores above any cutoff, so
    # the whole cascade fails -> ERROR row + quarantine (pass_pdf.py:257-270).
    lines = [_soup_line(r, 20) for _ in range(r.randint(5, 9))]
    body = ["<div>"] + [f"<p>{ln}</p>" for ln in lines] + ["</div>"]
    return _page_html(r, body, nav_links=0, include_footer=False).encode(), "", "en"


def _doc_giant(r: random.Random, big_bytes: bool) -> Tuple[bytes, str, str]:
    if big_bytes:
        # >= 64 KiB across a handful of pages -> per-page by size.
        n_pages = r.randint(6, 10)
        per_page_paras = 14
    else:
        # >= 50 unit pages -> per-page by page count.
        n_pages = r.randint(52, 60)
        per_page_paras = 1
    pages = []
    for _ in range(n_pages):
        paras = [f"<p>{_paragraph(r, 3)}</p>" for _ in range(per_page_paras)]
        pages.append(_page_html(r, ["<div>"] + paras + ["</div>"]))
    html = "<!--PAGE-->".join(pages)
    # The big-bytes flavor must genuinely cross the 64 KiB size switch
    # so the big-bucket skew lane processes real rows.
    while big_bytes and len(html.encode()) < 66 * 1024:
        filler = "".join(f"<p>{_paragraph(r, 4)}</p>" for _ in range(40))
        html += "<!--PAGE-->" + _page_html(r, ["<div>" + filler + "</div>"])
    return html.encode(), "", "en"


def _doc_multi_unit(r: random.Random) -> Tuple[bytes, str, str]:
    n = r.randint(2, 8)
    frames = []
    for k in range(n):
        if k % 3 == 2:
            # a noisy frame: variant B (threshold) wins
            frames.append(
                "\n".join([_sentence(r, 8, 12), _soup_line(r), _sentence(r, 6, 9)])
            )
        else:
            frames.append("\n".join(_sentence(r, 6, 10) for _ in range(r.randint(2, 4))))
    return sniff.encode_multiframe(frames), "", "en"


def _doc_single_frame(r: random.Random) -> Tuple[bytes, str, str]:
    # single-frame image: page label "-" (pass_img.py:120)
    return sniff.encode_multiframe(["\n".join(_sentence(r) for _ in range(3))]), "", "en"


def _doc_container(r: random.Random) -> Tuple[bytes, str, str]:
    n = r.randint(1, 4)
    children = []
    for k in range(n):
        kind = r.choice(["html", "txt"])
        if kind == "html":
            payload, _, _ = _doc_clean(r)
            name = f"child{k}.html"
        else:
            payload = b""  # empty html -> txt route needs text col; use MUF instead
            payload = sniff.encode_multiframe([_sentence(r, 5, 8)])
            name = f"child{k}.tif"
        children.append((name, payload))
    return sniff.encode_container(children), "", "en"


def _doc_docx(r: random.Random, i: int) -> Tuple[bytes, str, str]:
    # i%3==0: native accept (>=0.70); ==1: native reject -> doc_pdf_text
    # fallback accept; ==2: soup everywhere -> fallback triage-rejects
    # -> ERROR + quarantine (pass_doc.py:267-275).
    which = i % 3
    if which == 0:
        paras = [_sentence(r, 8, 12) for _ in range(r.randint(3, 6))]
        cells = [_sentence(r, 4, 6) for _ in range(r.randint(0, 3))]
    elif which == 1:
        paras = [_mid_ratio_line(r, target=0.55) for _ in range(r.randint(4, 7))]
        cells = []
    else:
        paras = [_soup_line(r, 20) for _ in range(r.randint(3, 5))]
        cells = []
    body = "".join(f"<w:p>{p}</w:p>" for p in paras)
    if cells:
        body += "<w:tbl><w:tr>" + "".join(
            f"<w:tc>{c}</w:tc>" for c in cells
        ) + "</w:tr></w:tbl>"
    return b"DOCX" + body.encode(), "", "en"


def _doc_legacy(r: random.Random, i: int) -> Tuple[bytes, str, str]:
    # Printable text interleaved with control bytes (the antiword
    # recovery contract).  i%2==0 native accept (>=0.75), ==1 fallback.
    if i % 2 == 0:
        text = "\n".join(_sentence(r, 8, 12) for _ in range(r.randint(3, 6)))
    else:
        text = "\n".join(_mid_ratio_line(r, target=0.55) for _ in range(4))
    raw = bytearray()
    for k, ch in enumerate(text.encode()):
        raw.append(ch)
        if k % 17 == 16:
            raw.append(r.randrange(0x01, 0x09))  # control noise
    return b"DOC1" + bytes(raw), "", "en"


def _doc_plain_text(r: random.Random) -> Tuple[bytes, str, str]:
    return b"", "\n".join(_paragraph(r, 2) for _ in range(r.randint(1, 3))), "en"


def _doc_unsupported(r: random.Random) -> Tuple[bytes, str, str]:
    junk = bytes(r.randrange(256) for _ in range(64))
    return b"PK\x03\x04" + junk, "", "en"


def _doc_noise(r: random.Random) -> Tuple[bytes, str, str]:
    junk = bytes(r.randrange(256) for _ in range(32))
    return b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + junk, "", "en"


# ---------------------------------------------------------------------------
# Edge rows (FIXTURES.md §2 tail), appended deterministically.
# ---------------------------------------------------------------------------

def _edge_rows(seed: int, start_index: int) -> List[dict]:
    rows = []

    def add(tag: str, html: bytes, text: str, lang: str, url: str = None, ts_off: int = 0):
        i = start_index + len(rows)
        rows.append(
            dict(
                url=url or f"https://fixtures.test/{tag}/{i:06d}",
                warc_ts=BASE_TS + i * 1_000_000 + ts_off,
                html=html,
                text=text,
                lang=lang,
            )
        )

    # empty html AND empty text -> txt route, blank => ERROR-not-quarantined
    add("edge_empty", b"", "", "en")
    # exactly-at-cutoff: visible text = 15 words, 42 alnum chars + 14
    # spaces = 56 chars, ratio exactly 0.75 == txt_cutoff; >= 40 chars so
    # triage passes.  Exercises the >= acceptance boundary (pass_pdf_txt.py:67).
    add(
        "edge_cutoff",
        b"<!DOCTYPE html><html><body><div>"
        b"<p>abc def ghi jkl mno pqr stu vwx yza bcd efg hij kl mn op</p>"
        b"</div></body></html>",
        "",
        "en",
    )
    # CJK (isalnum parity: CJK ideographs are alnum, ratio 1.0)
    r = _rng(seed, "edge_cjk", 0)
    cjk = "文本抽出器測試文書" * 6
    add(
        "edge_cjk",
        f"<!DOCTYPE html><html><body><div><p>{cjk}</p></div></body></html>".encode(),
        "",
        "zh",
    )
    # emoji line (emoji are NOT alnum)
    add(
        "edge_emoji",
        "<!DOCTYPE html><html><body><div><p>party \U0001f389\U0001f389 time "
        "again with many more plain words to score well</p></div></body></html>".encode(),
        "",
        "en",
    )
    # CRLF line endings preserved through the txt route
    add("edge_crlf", b"", "first line\r\nsecond line\r\nthird longer line here", "en")
    # duplicate url pair: dedup keeps the earliest warc_ts row
    r2 = _rng(seed, "edge_dup", 0)
    dup_html, _, _ = _doc_clean(r2)
    dup_url = f"https://fixtures.test/edge_dup/{start_index + len(rows):06d}"
    add("edge_dup", dup_html, "", "en", url=dup_url)
    dup_html2, _, _ = _doc_clean(_rng(seed, "edge_dup", 1))
    add("edge_dup", dup_html2, "", "en", url=dup_url, ts_off=500_000_000)
    return rows


_CLASS_BUILDERS = {
    "clean": lambda r, i: _doc_clean(r),
    "boilerplate": lambda r, i: _doc_boilerplate(r),
    "scan_only": lambda r, i: _doc_scan_only(r),
    "noisy": lambda r, i: _doc_noisy(r, recover_at_b=(i % 2 == 1)),
    "hopeless": lambda r, i: _doc_hopeless(r),
    "giant": lambda r, i: _doc_giant(r, big_bytes=(i % 2 == 0)),
    "multi_unit": lambda r, i: (
        _doc_single_frame(r) if i % 5 == 0 else _doc_multi_unit(r)
    ),
    "container": lambda r, i: _doc_container(r),
    "plain_text": lambda r, i: _doc_plain_text(r),
    "docx": _doc_docx,
    "doc": _doc_legacy,
    "unsupported": lambda r, i: _doc_unsupported(r),
    "noise": lambda r, i: _doc_noise(r),
}


def class_of(seed: int, i: int) -> str:
    x = _rng(seed, "cls", i).random()
    cum = 0.0
    for tag, frac in CLASS_FRACTIONS:
        cum += frac
        if x < cum:
            return tag
    return "clean"


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def make_pages_table(n_rows: int, seed: int = 42, edge_rows: bool = True) -> pa.Table:
    """The authoritative synthetic corpus (input_hint shape)."""
    body = make_pages_range(0, n_rows, seed)
    if not edge_rows:
        return body
    rows = _edge_rows(seed, n_rows)
    tail = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    return pa.concat_tables([body, tail])


def make_pages_range(start: int, stop: int, seed: int = 42) -> pa.Table:
    """Rows [start, stop) of the corpus — per-row determinism makes any
    contiguous range independently computable (the property that lets
    generation parallelize and lets tests slice the same corpus)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(start, stop):
        tag = class_of(seed, i)
        r = _rng(seed, tag, i)
        html, text, lang = _CLASS_BUILDERS[tag](r, i)
        urls.append(f"https://fixtures.test/{tag}/{i:06d}")
        tss.append(BASE_TS + i * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(path: str, n_rows: int, seed: int = 42, edge_rows: bool = True):
    import pyarrow.parquet as pq

    table = make_pages_table(n_rows, seed=seed, edge_rows=edge_rows)
    pq.write_table(table, path)
    return table


def _gen_chunk(args) -> bytes:
    """Worker for parallel generation: returns a serialized record batch."""
    start, stop, seed = args
    table = make_pages_range(start, stop, seed)
    import io

    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue()


def write_pages_parquet_parallel(
    path: str,
    n_rows: int,
    seed: int = 42,
    edge_rows: bool = True,
    chunk: int = 5000,
    workers: int = 16,
    row_group_size: int = 512,
) -> None:
    """Multi-process corpus generation (per-row determinism => chunks
    are independent); identical bytes to make_pages_table row-for-row."""
    import concurrent.futures as cf

    import pyarrow.parquet as pq

    ranges = [(i, min(i + chunk, n_rows), seed) for i in range(0, n_rows, chunk)]
    writer = None
    try:
        with cf.ProcessPoolExecutor(max_workers=workers) as ex:
            for data in ex.map(_gen_chunk, ranges):
                table = pa.ipc.open_stream(data).read_all()
                if writer is None:
                    writer = pq.ParquetWriter(path, table.schema)
                writer.write_table(table, row_group_size=row_group_size)
        if edge_rows:
            tail_cols = _edge_rows(seed, n_rows)
            tail = pa.table(
                {
                    "url": pa.array([r["url"] for r in tail_cols], pa.string()),
                    "warc_ts": pa.array(
                        [r["warc_ts"] for r in tail_cols], pa.timestamp("us")
                    ),
                    "html": pa.array([r["html"] for r in tail_cols], pa.binary()),
                    "text": pa.array([r["text"] for r in tail_cols], pa.string()),
                    "lang": pa.array([r["lang"] for r in tail_cols], pa.string()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(path, tail.schema)
            writer.write_table(tail, row_group_size=row_group_size)
    finally:
        if writer is not None:
            writer.close()
