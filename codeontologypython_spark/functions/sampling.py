"""Deterministic corpus sampling / source mixing for a training-data
pipeline: reproducible hash-based Bernoulli sampling, per-source weighted
mixing (RedPajama/Dolma-style source reweighting), and sampling a corpus
down to a per-source token budget.

Scale-first:

- the keep/drop decision is a pure column expression on a portable hash of
  the row key — no shuffle, no RNG state, embarrassingly parallel, and
  bit-reproducible across runs/engines (re-running the pipeline keeps the
  SAME rows — the property that makes ablations comparable);
- per-source fractions ride a broadcast join (sources are a tiny dimension
  next to the corpus);
- the token-budget variant needs ONE aggregation over (source, n_tokens)
  — the only shuffle, and it moves one row per source.

Engine portability: the uniform draw is
``conv(substring(md5(key),1,8),16,10) / 2^32`` — the same 32-bit-prefix
integer hash used by MinHash (``textops.hash_hex_prefix_to_long``), exactly
representable in a double, identical in DuckDB via
``('0x'||substr(md5(key),1,8))::bigint / 4294967296.0``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark.functions.textops import (
    hash_hex_prefix_to_long,
    token_count,
)

_TWO_32 = float(2 ** 32)


def uniform_from_key(key: Column) -> Column:
    """Deterministic uniform in [0, 1): md5-based, exact in a double."""
    return hash_hex_prefix_to_long(key.cast("string")) / F.lit(_TWO_32)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Reproducible Bernoulli sample: keep rows with u(key) < fraction."""
    return df.filter(uniform_from_key(F.col(key_col)) < F.lit(fraction))


def weighted_sample(df: DataFrame, weights: DataFrame,
                    key_col: str = "doc_id",
                    group_col: str = "source") -> DataFrame:
    """Per-source weighted mix: ``weights`` is a small (group, fraction)
    table, broadcast-joined; each row keeps iff u(key) < its group's
    fraction. Groups absent from ``weights`` are dropped (fraction 0)."""
    w = F.broadcast(weights.select(group_col, "fraction"))
    return (df.join(w, group_col)
            .filter(uniform_from_key(F.col(key_col)) < F.col("fraction"))
            .drop("fraction"))


def token_budget_fractions(df: DataFrame, budget_per_source: Column | float,
                           text_col: str = "text",
                           group_col: str = "source") -> DataFrame:
    """Per-source keep fractions that sample each source down to ~a token
    budget: fraction = least(1, budget / source_total_tokens). One
    single-row-per-source aggregation; the result is the broadcast side of
    ``weighted_sample``."""
    budget = (budget_per_source if isinstance(budget_per_source, Column)
              else F.lit(float(budget_per_source)))
    totals = (df.groupBy(group_col)
              .agg(F.sum(token_count(F.col(text_col))).alias("total_tokens")))
    return totals.select(
        group_col,
        F.least(F.lit(1.0),
                budget / F.col("total_tokens").cast("double"))
        .alias("fraction"))


def token_budget_sample(df: DataFrame, budget_per_source: float,
                        text_col: str = "text", key_col: str = "doc_id",
                        group_col: str = "source") -> DataFrame:
    """Sample each source down to ~``budget_per_source`` whitespace tokens
    (expected value under the deterministic uniform): the data-mixing step
    that equalizes source contributions before training."""
    fr = token_budget_fractions(df, budget_per_source, text_col, group_col)
    return weighted_sample(df, fr, key_col, group_col)
