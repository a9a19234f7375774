"""Identifier/description cleansing as native column expressions.

Re-expresses the reference's driver-side Python string functions as Catalyst
expressions so they run vectorized inside whole-stage codegen instead of
row-at-a-time Python:

- ``clean_python_name``      ← reference ``utils.py:267-295`` (regex clean to
  python-identifier charset: strip leading non-alpha, replace invalid → "_").
- ``clean_description``      ← reference ``statline.py:349-377`` (strip
  newlines, truncate >limit chars to limit-3 + "..."; BigQuery's 1024-char
  description cap, honored at ``statline.py:369-374``).
- ``rename_dotted_columns``  ← reference ``main.py:170-180`` (DataProperties
  column names contain "." which is illegal downstream → "." → "_").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BigQuery column-description limit the reference honors (statline.py:369).
DESCRIPTION_MAX_CHARS = 1024


def clean_python_name(col: Column | str, extra_chars: str = "") -> Column:
    """Clean a string column to ``(letter|'_')(letter|digit|'_')*``.

    Mirrors reference ``utils.py:267-295``: trim, strip leading characters
    until a letter/underscore, then replace every invalid character with an
    underscore. Pure Catalyst ``regexp_replace`` chain — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.trim(c), "^[^a-zA-Z_]+", "")
    return F.regexp_replace(stripped, "[^0-9a-zA-Z_]" + extra_chars, "_")


def clean_description(col: Column | str, max_chars: int = DESCRIPTION_MAX_CHARS) -> Column:
    """Strip CR/LF and truncate to ``max_chars`` with a ``...`` suffix.

    Mirrors reference ``statline.py:366-374``: descriptions longer than the
    limit are cut to ``max_chars - 4`` characters plus ``"..."``.
    """
    c = F.col(col) if isinstance(col, str) else col
    no_newlines = F.regexp_replace(c, "[\\n\\r]", "")
    return F.when(
        F.length(no_newlines) > max_chars,
        F.concat(F.substring(no_newlines, 1, max_chars - 4), F.lit("...")),
    ).otherwise(no_newlines)


def rename_dotted_columns(df: DataFrame) -> DataFrame:
    """Rename every column containing "." to use "_" instead.

    Mirrors reference ``main.py:170-180`` which rewrote the parquet file; in
    Spark this is a zero-cost projection (``toDF``), no rewrite needed.
    """
    return df.toDF(*[c.replace(".", "_") for c in df.columns])
