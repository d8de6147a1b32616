"""etl_batch_spark — a PySpark-native batch analytics/ETL engine.

Re-expresses the capabilities of the reference `sudsk/etl-batch` Oracle
PL/SQL batch-utility package (see /root/repo/SURVEY.md) as an idiomatic
Spark engine:

- ``orchestration/`` — batch lifecycle (startup / endup / resume),
  run monitoring, dependency gating, timers, config, notification
  (reference: pkg_batch_util_body.sql:472-722, 251-346, 39-86).
- ``functions/`` — exact-parity scalar utilities (datediff H:M:S,
  check_date, field counter/splitter, atoi) as native Spark column
  expressions (reference: body.sql:17-123, 729-857).
- ``queries/`` — the relational operator surface (joins, windows,
  rollup/cube, set ops, sorts, string/date/JSON functions) exposed as
  oracle-checked query builders over the star schema.
- ``llmops/`` — LLM-data-pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis,
  multimodal column plumbing — designed for 100 TB scale.
- ``streaming/`` — Structured Streaming over the ``events`` table.
"""

__version__ = "0.1.0"
