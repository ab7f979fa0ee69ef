"""Operator library: each module exposes

- plain functions ``(spark, sf_dir) -> DataFrame`` (declarative plans),
- ``QUERIES``: name -> callable registered in `__spark_entry__.queries()`,
- ``ORACLES``: name -> DuckDB ANSI-SQL string with identical semantics
  (same rounding, same tie-breaks) for the driver's correctness gate.

Numeric-parity conventions used THROUGHOUT (see ARCHITECTURE.md §Oracle):
- time is int64 microseconds (``ts div 1000`` == DuckDB ``epoch_us``);
- every float output is ``ROUND(x, k)`` on BOTH engines, with k chosen so
  float summation-order noise (~1e-11) cannot straddle a rounding
  boundary (inputs have 2-decimal precision);
- every top-k / last-k uses ROW_NUMBER with a total ordering
  (rounded measure, then a unique id);
- counts are CAST to BIGINT on both engines (DuckDB SUM(BIGINT) is
  HUGEINT otherwise).
"""
