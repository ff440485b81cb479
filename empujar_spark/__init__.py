"""empujar_spark — a PySpark-native analytics/ELT engine.

A from-scratch re-expression of the capabilities of taskrabbit/empujar
(reference: /root/reference, a Node.js ELT orchestrator) as an idiomatic
Spark engine:

- ``book`` / ``chapter`` / page / loader orchestration DAG
  (reference: lib/book.js, lib/chapter.js) — driver-side scheduler whose
  parallel units submit Spark actions.
- A parquet-backed warehouse connection with the reference's observable
  operator semantics: schema inference from row batches, schema evolution
  (add-column, int→float and varchar→text promotion, unknown-type
  re-typing), batched upsert, table-level merge, dedup-keep-latest,
  watermark extraction (reference: lib/connections/*.js).
- Relational transforms expressed as DataFrame programs (the SQL corpus of
  the reference's ETL book, books/etl/chapters/transform/*.js).
- Large-scale training-data-pipeline operators beyond the reference's
  surface: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  embedding-cosine), similarity search, multimodal column plumbing, text
  analysis.

Everything is DataFrame-first: Catalyst owns optimization; no RDDs.
"""

from empujar_spark.session import get_spark, stop_spark
from empujar_spark.book import Book
from empujar_spark.chapter import Chapter
from empujar_spark.catalog import Warehouse

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "Book", "Chapter", "Warehouse", "__version__"]
