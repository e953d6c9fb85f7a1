"""logpump_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Gollob/1CLogPumpClickHouse.

The reference (/root/reference, Go, ~1,700 LoC) is a streaming ETL pump:
watch dirs -> tail 1C technology logs -> assemble multi-line records ->
parse 24-field LogEntry -> transform to a 16-column TechLogRow -> batch ->
route by Component -> bulk INSERT into ClickHouse MergeTree tables.  All
analytical querying is delegated to ClickHouse.

This package re-expresses that surface Spark-first:

- ``techlog``   — the parse/transform pipeline as pure Column expressions
                  (no UDFs): record assembly, header/SQL/Context extraction,
                  TechLogRow projection.  (SURVEY.md §2.A-S7/S8, §2.B)
- ``sources``   — batch + streaming readers with glob/recursive discovery.
                  (§2.A S1-S5)
- ``streaming`` — Structured Streaming jobs: trigger batching, component
                  routing, partitioned sinks, checkpointing.  (§2.D, §2.E)
- ``operators`` — the relational surface ClickHouse provided downstream:
                  joins, aggregates, windows, sort/top-k, set ops.  (§2.F/G)
- ``functions`` — scalar string/date/cast/json/array suites.  (§2.C)
- ``llmdata``   — north-star LLM-data-pipeline ops: dedup (exact, MinHash
                  LSH, SimHash), similarity search, text analysis,
                  multimodal column plumbing.  (§7.1 M4)
- ``queries``   — the driver-facing registry: (spark, sf_dir) callables +
                  DuckDB oracle SQL per operator.

Everything is built for a multi-executor cluster at ~100 TB: declarative
DataFrame plans (Catalyst does pushdown/pruning/AQE), broadcast hints for
dimension joins, no collect() in any operator, salting/LSH instead of
pairwise loops.

Package name note: the reference repo name starts with a digit
(1CLogPumpClickHouse) which is not a legal Python identifier, hence
``logpump_spark``.
"""

__version__ = "0.1.0"
