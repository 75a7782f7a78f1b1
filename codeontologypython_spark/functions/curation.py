"""End-to-end corpus curation: the composition every training-data
pipeline actually runs, built from this package's oracle-backed pieces —

    quality gate  ->  exact dedup  ->  decontamination  ->  source mixing

Each stage is independently verified (q_token_stats / q_dedup_exact /
q_decontaminate / q_weighted_mix oracles); this module wires them in the
conventional order (cheap row-local filters first, corpus-wide shuffles
last, so every shuffle sees an already-shrunk stream) and reports
per-stage row counts — the survivorship audit curation reports track.

Scale notes: the quality gate is expression-only (no shuffle); exact dedup
shuffles 32-char md5 keys; decontamination broadcasts the benchmark
shingle set and shuffles only (doc, count) rows; mixing is a broadcast
join + expression filter. Nothing here adds a shuffle beyond the
documented per-stage ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark.functions.dedup import decontaminate, exact_dedup
from codeontologypython_spark.functions.sampling import weighted_sample
from codeontologypython_spark.functions.textops import (
    lang_id,
    quality_score,
    repetition_ratio,
)


def curate(docs: DataFrame, benchmark: DataFrame | None = None,
           weights: DataFrame | None = None, *, lang: str = "en",
           min_quality: int = 2, max_repetition: float = 0.5,
           min_shared_shingles: int = 3,
           text_col: str = "text",
           id_col: str = "doc_id") -> tuple[DataFrame, dict[str, int]]:
    """Returns (curated_docs, stage_counts). ``benchmark`` (optional) is the
    eval-set table to decontaminate against; ``weights`` (optional) is the
    (source, fraction) mixing table for ``weighted_sample``. stage_counts
    records rows surviving each stage (each count is one lightweight
    aggregate job over the already-built plan)."""
    text = F.col(text_col)
    counts = {"input": docs.count()}

    gated = docs.filter(
        (lang_id(text) == lang)
        & (quality_score(text) >= min_quality)
        & (F.coalesce(repetition_ratio(text), F.lit(0.0)) <= max_repetition))
    counts["quality_gate"] = gated.count()

    deduped = (exact_dedup(gated, text_col=text_col, id_col=id_col)
               .drop("content_md5", "dup_count"))
    counts["exact_dedup"] = deduped.count()

    if benchmark is not None:
        contaminated = decontaminate(deduped, benchmark,
                                     min_shared=min_shared_shingles,
                                     text_col=text_col, id_col=id_col)
        deduped = deduped.join(contaminated.select(id_col), id_col,
                               "left_anti")
        counts["decontaminated"] = deduped.count()

    if weights is not None:
        deduped = weighted_sample(deduped, weights, key_col=id_col)
        counts["mixed"] = deduped.count()

    return deduped, counts
