"""PromQL scalar & label function library (Tier B, public).

The reference exposes no scalar functions of its own — its samples are
consumed by the paired PromQL layer (README.md:2), whose function
surface (label_replace, label_join, clamp*, abs/ceil/floor/sqrt, …)
operates on instant vectors of exactly the series the reference's four
shards produce. Everything here is a pure JVM-side column expression —
no UDFs, fully codegen'd, pushdown-transparent.
"""

from shards_prometheus_spark.functions.promql import (  # noqa: F401
    ORACLES,
    QUERIES,
    clamp_values,
    label_join,
    label_replace,
    math_scalar_funcs,
)
