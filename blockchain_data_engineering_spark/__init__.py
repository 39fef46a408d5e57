"""blockchain_data_engineering_spark — a PySpark-native analytics engine.

A brand-new, Spark-first rebuild of the query and data-processing
capabilities of the reference pipeline (Edgxtech/blockchain-data-engineering,
read-only snapshot at /root/reference). The reference streams Cardano blocks,
computes per-(address, token) net value flows, token volumes priced in ADA,
a wallet transfer graph, rollups, PageRank, and chart analytics — mostly via
row-at-a-time Python UDFs and pandas (see SURVEY.md §2).

This engine re-expresses every one of those operators as declarative
DataFrame / Spark SQL plans so Catalyst + Tungsten pick the physical
strategy (predicate pushdown, broadcast joins, partial aggregation,
whole-stage codegen, AQE skew handling). Python only survives at the
edges (Arrow-batched pandas UDFs) where built-ins genuinely cannot
express the semantics.

Layout
------
- ``session``     SparkSession factory tuned for local[32] testing and
                  cluster-scale defaults (AQE, shuffle partitions, Arrow).
- ``catalog``     loaders for the deterministic test tables.
- ``functions``   scalar expression library (unit construction, hex
                  decode, decimal scaling, slot→time, …) — SURVEY §2.7.
- ``operators``   relational/analytic building blocks (net-flow, top-k,
                  window analytics, spine fill, dedup, similarity, text,
                  graph) — SURVEY §2.2-2.8 + the LLM-data extension ops.
- ``domain``      blockchain semantics (block schema, UTxO resolution as
                  a join, volumes, transfers) — SURVEY §2 M2 layer.
- ``streaming``   Structured Streaming layer (sources, watermarking,
                  idempotent multi-sink foreachBatch) — SURVEY §2.9.
- ``plans``       the query registry backing ``__spark_entry__.py``:
                  every operator wired to the test tables with a DuckDB
                  oracle SQL twin.
"""

__version__ = "0.1.0"
