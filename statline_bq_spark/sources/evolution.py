"""Cross-snapshot schema evolution.

The reference enforces schema-once WITHIN a load (first-page inference
forced onto later pages, reference ``utils.py:123-129``) but has no story
for drift BETWEEN loads — a re-crawled dataset that adds a column, drops
one, or widens a type would simply land with a different schema under the
next dated folder. This module supplies the union policy for reading
across such snapshots:

- columns missing on one side null-fill (``allowMissingColumns``);
- numeric types widen along byte < short < int < long < float < double
  (lossless direction only);
- any other type conflict falls back to STRING — the reference's own
  unmapped-type policy (``statline.py:304-306``: EDM types without a
  mapping default to string), extended to conflicts.

Everything is driver-side schema arithmetic plus per-column casts — the
data path stays one narrow projection per input, no shuffle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StringType

#: Lossless widening chain; anything off-chain conflicts to string.
_NUMERIC_ORDER = ["byte", "short", "int", "float", "long", "double"]
# NB float is listed before long only to give both a common upper bound:
# long↔float widen to double (neither holds the other losslessly).


def widen(a: DataType, b: DataType) -> DataType:
    """Smallest common type of two column types under the module policy."""
    if a == b:
        return a
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    ranks = {
        ByteType(): 0,
        ShortType(): 1,
        IntegerType(): 2,
        FloatType(): 3,
        LongType(): 3,
        DoubleType(): 4,
    }
    if a in ranks and b in ranks:
        if {a, b} == {FloatType(), LongType()}:
            return DoubleType()  # neither direction is lossless
        return a if ranks[a] >= ranks[b] else b
    return StringType()


def evolve_union(*dfs: DataFrame) -> DataFrame:
    """Union DataFrames with drifted schemas under the widening policy.

    Column order follows first appearance across inputs; missing columns
    null-fill; conflicting types cast to their widened common type (string
    in the worst case) BEFORE the union so Spark never sees a mismatch.
    """
    if not dfs:
        raise ValueError("evolve_union needs at least one DataFrame")
    order: list[str] = []
    types: dict[str, DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                types[f.name] = widen(types[f.name], f.dataType)

    aligned = []
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = [
            (
                F.col(c).cast(types[c])
                if c in have
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in order
        ]
        aligned.append(df.select(*cols))
    return reduce(lambda a, b: a.unionByName(b), aligned)
