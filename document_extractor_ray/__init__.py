"""document_extractor_ray — a Ray-Data-native rebuild of the
``strahd-zarovich/document-extractor`` extraction engine.

The reference (read-only at /root/reference) is a sequential,
file-at-a-time appliance: a watcher loop routes each dropped file by
extension to a pass subprocess (``process_run.py:174-203``) that runs an
escalating extraction cascade (TXT -> OCR-A -> OCR-B,
``pass_pdf.py:112-270``) and appends CSV/txt artifacts.

This package re-expresses the same semantics as a streaming Ray Data
pipeline over Parquet tables of Common-Crawl-style web pages
``(url, warc_ts, html, text, lang)``:

- ``core/``       pure semantics shared by the Ray pipeline AND the
                  sequential oracle (byte-identity lives here; no Ray).
- ``stages/``     vectorized ``map_batches`` stage functions + the
                  stateful fallback actor class.
- ``pipelines/``  pipeline assembly, resumable sharded runner, sinks.
- ``functions/``  training-data-pipeline operators (dedup, similarity
                  search, text analysis) and generic analytics.
- ``fixtures.py`` deterministic synthetic pages-table generator.
- ``oracle.py``   sequential reference-faithful oracle.
"""

from document_extractor_ray.config import PipelineConfig

__version__ = "0.1.0"
__all__ = ["PipelineConfig", "__version__"]
