"""aide_spark — a PySpark-native document-extraction analytics engine.

A from-scratch, Spark-first re-expression of the computation performed by the
reference system (ALabs-coder/aide, a serverless PDF bank-statement extractor):
per-document content extraction over a table of interleaved text+media
documents ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.

Everything is declared with the DataFrame API so Catalyst/Tungsten pick the
physical strategy; per-row Python is never used (vectorized pandas/Arrow UDFs
only at the two genuinely non-relational boundaries, see SURVEY.md §2.12).

Layout:
    schemas      - explicit StructTypes for every stage boundary
    generator    - deterministic synthetic corpus (bank line grammars + validator taxonomy)
    sources      - table readers/writers (parquet; Iceberg-compatible API)
    functions    - reusable column expression builders (text, hashing, vectors, textstats)
    operators    - the operator inventory of SURVEY.md §2 (validation, lines,
                   segmentation, the three bank parsers, summary, dedup, similarity)
    plans        - end-to-end pipeline assembly + checkpoint/lineage/resume
    streaming    - Structured Streaming variants
"""

__version__ = "0.1.0"
