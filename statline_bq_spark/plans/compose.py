"""Declarative transform pipelines: a config-native spec (list of plain
dicts — JSON/TOML/YAML-friendly) compiled into ONE DataFrame chain.

The reference's orchestration is imperative Python over per-dataset dicts
(reference ``main.py:379-586``); the warehouse-native equivalent is a
dbt-style declared pipeline. Because the whole spec compiles to a single
DataFrame, Catalyst sees the entire pipeline at once — filters written as
late steps still push down to the scan, unused columns prune end-to-end,
and join strategies are chosen with full-plan context. Nothing executes at
compile time.

Spec grammar (each step is ``{"op": ..., **params}``):

- ``{"op": "read", "table": name}``            — base table (first step)
- ``{"op": "filter", "where": sql_expr}``
- ``{"op": "select", "cols": [sql_expr, ...]}``— exprs may alias (``x AS y``)
- ``{"op": "with_column", "name": n, "expr": sql_expr}``
- ``{"op": "join", "table": name, "on": sql_expr | [cols], "how": how,
     "broadcast": bool}``                      — broadcast ONLY bounded dims
- ``{"op": "group_agg", "keys": [...], "aggs": {out: sql_agg_expr}}``
- ``{"op": "top_per_group", "keys": [...], "order": [sql_expr, ...],
     "k": int}``                               — rank<=k (WindowGroupLimit)
- ``{"op": "running_sum", "keys": [...], "order": [sql_expr, ...],
     "value": sql_expr, "out": name}``         — per-key cumulative sum
- ``{"op": "top_n", "order": [sql_expr, ...], "n": int}`` — global top-N
     (compiles to TakeOrderedAndProject — per-partition top-N then merge,
     never a global sort)
- ``{"op": "distinct"}``
- ``{"op": "limit", "n": int}``

Expressions are Spark SQL strings (``F.expr``), so the spec stays
engine-checked at analysis time — a typo fails compilation with a clear
AnalysisException, not at run time.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from statline_bq_spark.io import read_table


def compile_pipeline(
    spark: SparkSession,
    sf_dir: str,
    steps: Sequence[Mapping],
    *,
    reader: Callable[[SparkSession, str, str], DataFrame] = read_table,
) -> DataFrame:
    """Compile a declared pipeline into one (lazy) DataFrame."""
    if not steps or steps[0].get("op") != "read":
        raise ValueError("pipeline must start with a 'read' step")
    df = reader(spark, sf_dir, steps[0]["table"])
    for i, step in enumerate(steps[1:], start=1):
        op = step.get("op")
        if op == "filter":
            df = df.filter(F.expr(step["where"]))
        elif op == "select":
            df = df.selectExpr(*step["cols"])
        elif op == "with_column":
            df = df.withColumn(step["name"], F.expr(step["expr"]))
        elif op == "join":
            other = reader(spark, sf_dir, step["table"])
            if step.get("broadcast"):
                other = F.broadcast(other)
            on = step["on"]
            cond = F.expr(on) if isinstance(on, str) else list(on)
            df = df.join(other, cond, step.get("how", "inner"))
        elif op == "group_agg":
            aggs = [
                F.expr(expr).alias(out)
                for out, expr in step["aggs"].items()
            ]
            df = df.groupBy(*step["keys"]).agg(*aggs)
        elif op == "top_per_group":
            w = Window.partitionBy(*step["keys"]).orderBy(
                *[F.expr(e) for e in step["order"]]
            )
            # Collision-proof temp name: a source column legitimately
            # named _rn must survive the step un-clobbered.
            rn = "_rn"
            while rn in df.columns:
                rn += "_"
            df = (
                df.withColumn(rn, F.row_number().over(w))
                .filter(F.col(rn) <= int(step["k"]))
                .drop(rn)
            )
        elif op == "running_sum":
            w = (
                Window.partitionBy(*step["keys"])
                .orderBy(*[F.expr(e) for e in step["order"]])
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            df = df.withColumn(step["out"], F.sum(F.expr(step["value"])).over(w))
        elif op == "top_n":
            df = df.orderBy(*[F.expr(e) for e in step["order"]]).limit(
                int(step["n"])
            )
        elif op == "distinct":
            df = df.distinct()
        elif op == "limit":
            df = df.limit(int(step["n"]))
        else:
            raise ValueError(f"step {i}: unknown op {op!r}")
    return df
