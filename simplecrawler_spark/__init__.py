"""simplecrawler_spark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch re-expression of the query/data-processing semantics of
NovikovEvgeny/simplecrawler (reference at /root/reference, TypeScript) as
distributed batch waves over snapshot-committed frontier tables.

Layers:
- functions/  pure, vectorizable exactness kernels (URL algebra, link
  discovery, charset decode, robots matching, cookies, text analysis).
  No Spark imports — unit-testable and wrapped by Arrow-batched pandas
  UDFs at the DataFrame boundary.
- operators/  DataFrame-level building blocks (politeness budgeting,
  seen-set anti-join + Bloom, dedupe families, similarity search,
  queue analytics).
- plans/      the wave pipeline and the crawl engine loop.
- sources/    snapshot store (parquet + lineage manifests) and fixture
  page-table builders.
"""

__version__ = "0.1.0"
