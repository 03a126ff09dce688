"""pappermate_ray — a Ray-Data-native document-extraction engine.

A from-scratch reimplementation of the *capabilities* of CzarX86/PapperMate
(reference snapshot at /root/reference) as streaming ``ray.data.Dataset``
pipelines over Arrow batches:

- main-content extraction from Common-Crawl-style pages
  (``url, warc_ts, html, text, lang``) via text-/link-density heuristics,
- contract metadata / section / entity parsing (the deterministic regex
  cascades of ``services/contract_parser.py``),
- entity-span extraction with per-doc normalize+dedup
  (``processing/entity_extractor.py``),
- corpus-level dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard),
- similarity search over embedding columns,
- grouped reports, stratified sampling, joins, resumable partitioned output.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the caller (bench.py, CLI, pytest fixture, or the driver).
"""

__version__ = "0.1.0"
