"""Pure extraction semantics — no Ray imports anywhere in this package.

Both the Ray Data stages (``document_extractor_ray.stages``) and the
sequential oracle (``document_extractor_ray.oracle``) call these exact
functions, so byte-identity of extracted text per url is guaranteed by
construction (SURVEY.md §7.5.1).
"""
