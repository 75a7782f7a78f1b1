"""Corpus-level span deduplication: remove every LATER occurrence of a
repeated span (paragraph / fixed-width token chunk) across the whole
corpus, keeping documents otherwise intact — the Spark-expressible form of
exact-substring training-data dedup (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better": their suffix-array pass is
inherently sequential; production pipelines approximate it at paragraph or
fixed-window granularity, which IS expressible as hash-groupBy).

Scale-first:

- spans are keyed by md5 (32-char key, uniform — no skew); the
  first-occurrence pick is a map-side-combining ``min(struct)`` aggregation,
  never a row_number window (CLAUDE.md pitfall 5);
- three span-sized shuffles total: groupBy(hash), the hash-equi join back,
  and the per-doc reassembly; nothing is O(n^2) and nothing collects;
- the exploded span stream is deliberately NOT persisted even though two
  consumers recompute it (the first-occurrence agg and the join-back): at
  corpus scale the exploded stream is the size of the corpus itself, and
  re-running a split+posexplode over the scan is far cheaper than caching
  it (measured: recompute costs ~0 at sf0.1, 5.1 s best-of-3 total);
- reassembly carries (pos, span) structs and sorts per-doc arrays JVM-side
  (``array_sort`` on structs orders by the leading pos field).

The DuckDB oracle in ``__spark_entry__.py`` reproduces the same pipeline
(md5 keys, min-first-key, ordered string_agg) bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark.functions.textops import tokens_col


def token_chunks_col(text: Column, width: int = 3) -> Column:
    """Non-overlapping ``width``-token chunks (the last chunk may be
    shorter). Guarded like ``textops.shingles_col``: F.sequence descends when
    start > stop, so token-less docs must yield [] explicitly."""
    toks = tokens_col(text)
    n_chunks = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.when(
        F.size(toks) > 0,
        F.transform(idx, lambda i: F.concat_ws(
            " ", F.slice(toks, i * width + 1, width)))
    ).otherwise(F.array().cast("array<string>"))


def paragraphs_col(text: Column, sep: str = "\n\n") -> Column:
    """Paragraph spans: split on ``sep``, blank paragraphs dropped (the
    natural granularity for prose corpora; the synthetic test corpus is
    single-line, so the oracle query exercises token_chunks_col instead)."""
    return F.filter(F.split(text, sep), lambda p: p != "")


def span_dedup(df: DataFrame, spans: Column, id_col: str = "doc_id",
               join_sep: str = " ") -> DataFrame:
    """Keep only the corpus-wide FIRST occurrence (min (doc_id, pos)) of
    each distinct span; rebuild each document from its surviving spans.

    Returns (id_col, text_clean, n_kept, n_removed) for EVERY input row —
    a document whose spans were all seen earlier comes back with
    text_clean = '' and n_kept = 0.
    """
    did = F.col(id_col)
    exploded = (df.select(did, F.posexplode(spans).alias("pos", "span"))
                .withColumn("h", F.md5(F.col("span"))))
    first = (exploded.groupBy("h")
             .agg(F.min(F.struct(did.alias("d"), F.col("pos").alias("p")))
                  .alias("first")))
    kept = (exploded.join(first, "h")
            .filter((did == F.col("first.d"))
                    & (F.col("pos") == F.col("first.p"))))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws(join_sep, F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("pos", "span"))),
                        lambda x: x["span"])).alias("text_clean"),
                    F.count("*").alias("n_kept")))
    base = df.select(did, F.size(spans).cast("long").alias("n_spans"))
    return (base.join(rebuilt, id_col, "left")
            .select(did,
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.coalesce("n_kept", F.lit(0).cast("long"))
                    .alias("n_kept"),
                    (F.col("n_spans")
                     - F.coalesce("n_kept", F.lit(0).cast("long")))
                    .alias("n_removed")))
