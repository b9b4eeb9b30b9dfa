"""pharmacodi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bhklab/PharmacoDI, re-expressed Spark-first.

The reference (/root/reference) is an eager, single-node pandas/datatable/
polars ETL pipeline. This engine re-expresses its full operator surface
(SURVEY.md §2) as lazy Spark DataFrame transformations so that Catalyst /
Tungsten / AQE handle what the reference does by hand, and extends it with
the large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, streaming) required at 100 TB scale.

Layout:
    session     — tuned SparkSession builder (AQE, Arrow, broadcast sizing)
    io          — multi-format load/save, glob-union readers  (SURVEY §2.1)
    schema      — declared contracts + ``harmonize``           (SURVEY §1.3)
    operators   — keys, joins, dedup, reshape, set ops        (SURVEY §2.2-2.8)
    functions   — scalar kit (regex/string/math)              (SURVEY §2.9)
    sources     — record-text parser, API connector harness   (SURVEY §2.1, §2.10)
    pipelines   — per-PSet / combine / enrichment assemblies  (SURVEY §3)
    text        — dedup, similarity, text-analysis extensions (north star)
    streaming   — Structured Streaming ops over event streams (north star)
    plans       — named queries + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
