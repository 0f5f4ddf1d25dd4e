"""duva_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of onaio/duva, rebuilt Spark-first.

The reference (onaio/duva) is a CSV→Tableau-Hyper ETL/sync service; the
query surface it delivers is delegated to OnaData's export shaping and to
Hyper's SQL engine. This package owns both halves natively:

- ``sources``   — CSV/Parquet/JSON ingestion with duva's exact null/type
                  semantics (reference: app/core/importer.py:38-74).
- ``shaping``   — the OnaData export-shaping operators duva configures
                  (select-multiple split, label substitution, group
                  flattening; reference: app/schemas/configuration.py:6-14).
- ``queries``   — the relational operator inventory (joins, aggregations,
                  windows, set ops, scalar functions) as oracle-checked
                  named queries.
- ``llm``       — 100 TB-scale data-pipeline operators: exact + MinHash-LSH
                  dedup, SimHash, n-gram Jaccard, embedding similarity
                  search, text analysis, multimodal column plumbing.
- ``streaming`` — Structured Streaming windows/watermarks/sessionization
                  over the events table.
- ``sinks``     — full-refresh Parquet sinks mirroring duva's
                  drop-and-recreate semantics (app/core/importer.py:242-256).
"""

__version__ = "0.1.0"
