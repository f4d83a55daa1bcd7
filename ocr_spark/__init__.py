"""ocr_spark — a PySpark-native distributed document-extraction engine.

From-scratch re-expression of the capabilities of the reference OCR service
(ClassesOver/ocr, a single-node Flask/FastAPI invoice-OCR wrapper) as an
idiomatic Spark pipeline over Iceberg/Parquet tables of interleaved
text+media documents:

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Media spans are decoded in Arrow batches, run through a DB-style text
detection stage, an angle-classification pass and a CTC-style recognition
stage (all vectorized pandas UDFs — no per-row Python), ordered by the
reference's reading-order heuristic, and spliced back between the native
text spans at their original offsets.

Sub-packages
------------
fixtures   deterministic corpus + image synthesis (pure function of media_ref)
core       single-node numpy stage contracts (also the pytest oracle)
operators  Spark operators: pipeline, detector-chain fields, span algebra,
           table geometry, dedup, similarity, text analysis, and
           checkpoint-resume with per-partition lineage
functions  scalar normalizer library (native Spark SQL expressions)
streaming  Structured Streaming ingest (foreachBatch extraction, watermarks)
"""

__version__ = "0.1.0"
