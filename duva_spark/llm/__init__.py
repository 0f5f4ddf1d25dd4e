"""LLM-training-data pipeline operators, designed for 100 TB scale.

Beyond the reference's own surface (onaio/duva is ingest-only), this
package provides the data-pipeline operators a large-scale training-data
pipeline needs, each expressed with JVM-side Column expressions wherever
possible (whole-stage codegen; no Python in the hot path) and with
shuffle-frugal plans:

- ``dedup``      — exact (hash-groupBy) deduplication.
- ``minhash``    — MinHash signatures + banded LSH candidate pairs
                   (never pairwise: candidates come from band-bucket
                   equi-joins, linear in data size).
- ``simhash``    — per-bit-majority SimHash fingerprints.
- ``textstats``  — token counts, quality scoring, language-ID heuristic,
                   document fingerprinting.
- ``similarity`` — embedding cosine top-k (brute-force baseline and
                   IVF-bucketed scale path).
- ``multimodal`` — binary-payload column plumbing with stubbed decoders.
"""
