"""Stage 1 — distributed per-file extraction (SURVEY.md §2.2, north_star:
"vectorized pandas/Arrow UDFs parse each Python file's AST per partition").

One ``mapInPandas`` pass over the source_files table runs
:func:`codeontologypython_spark.operators.pyfile.extract_file` per row and
emits a unified record stream (entities / per-file triples / mentions /
errors), split afterwards by cheap filter+select. Each file is parsed exactly
once — the relational replacement for the reference's astroid FQN parse cache
(parser.py:65-82, serializer.py:96-100).

Scale notes:
- the UDF is embarrassingly parallel per file; partitioning by (repo, path)
  spreads hub repos across executors;
- Arrow batch size is capped in session.py so batches of large files fit in
  worker memory (SURVEY §7 hard-part 7);
- per-row failures degrade to error records, never fail the job
  (parser.py:67-89 warn-and-skip).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark.schemas import EXTRACT_OUTPUT


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # import inside the worker so the UDF ships cleanly via --py-files
    from codeontologypython_spark.operators.pyfile import extract_file

    for pdf in batches:
        rows: list[dict] = []
        for repo, path, commit, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]):
            base = {"repo": repo, "path": path, "commit": commit,
                    "ent": None, "trp": None, "men": None, "err": None}
            if lang != "python" or content is None:
                continue  # non-python rows are ignored (FIXTURES.md §1 lang dispatch)
            entities, triples, mentions, error = extract_file(repo, path, commit, content)
            if error is not None:
                stage, _, message = error.partition(":")
                rows.append({**base, "rec": "err",
                             "err": {"stage": stage, "message": message}})
                continue
            for e in entities:
                rows.append({**base, "rec": "ent", "ent": {
                    "eid": e["eid"], "kind": e["kind"], "name": e["name"],
                    "fqn": e["fqn"], "line": e["line"], "attrs": e["attrs"]}})
            for s, p, o, is_lit in triples:
                rows.append({**base, "rec": "trp", "trp": {
                    "subj": s, "pred": p, "obj": o, "obj_is_literal": is_lit}})
            for m in mentions:
                rows.append({**base, "rec": "men", "men": m})
        yield pd.DataFrame(rows, columns=[f.name for f in EXTRACT_OUTPUT.fields])


def extract_stage(src_df: DataFrame) -> DataFrame:
    """source_files -> unified extraction record stream.

    Filters non-python rows *before* the UDF so Catalyst pushes the predicate
    into the parquet scan, and repartitions by (repo, path) so skewed repos
    spread across all partitions.
    """
    pythonic = src_df.filter(F.col("lang") == "python")
    return pythonic.mapInPandas(_extract_batches, schema=EXTRACT_OUTPUT)


def split_extraction(out_df: DataFrame):
    """Split the unified stream into (entities, triples, mentions, errors).

    Call ``out_df.persist()`` (or checkpoint to parquet) first so the parse
    runs once, not four times.
    """
    entities = (out_df.filter(F.col("rec") == "ent")
                .select("repo", "path", "commit", "ent.*"))
    triples = (out_df.filter(F.col("rec") == "trp")
               .select("repo", "commit", "trp.*"))
    mentions = (out_df.filter(F.col("rec") == "men")
                .select("repo", "path", "commit", "men.*"))
    errors = (out_df.filter(F.col("rec") == "err")
              .select("repo", "path", "commit", "err.*"))
    return entities, triples, mentions, errors
