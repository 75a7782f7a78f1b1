"""Fixed StructType schemas for every stage boundary.

The reference's output model is schema-fixed (the OWL ontology); the Spark
engine mirrors that with static StructTypes everywhere — no inference
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table — exact shape mandated by BASELINE.json input_hint:
# (repo:string, path:string, commit:string, lang:string, content:string)
SOURCE_FILES = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
    T.StructField("content", T.StringType(), True),
])

# Stage-1 extractor output: one unified row stream, discriminated by `rec`,
# split into entities / triples / mentions / errors by filter+select.
# Keeping one mapInPandas pass means each file is parsed exactly once
# (the relational analog of the reference's parse cache, parser.py:65-82).
EXTRACT_OUTPUT = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("rec", T.StringType(), False),  # ent | trp | men | err
    # rec == 'ent'
    T.StructField("ent", T.StructType([
        T.StructField("eid", T.StringType()),        # deterministic global id
        T.StructField("kind", T.StringType()),       # woc class simple name
        T.StructField("name", T.StringType()),
        T.StructField("fqn", T.StringType()),        # null if no FQN rule applies
        T.StructField("line", T.IntegerType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]), True),
    # rec == 'trp'  (fully resolved per-file triple; obj is eid or literal)
    T.StructField("trp", T.StructType([
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("obj_is_literal", T.BooleanType()),
    ]), True),
    # rec == 'men'  (cross-file reference to resolve in Stage 2)
    T.StructField("men", T.StructType([
        T.StructField("subj", T.StringType()),       # eid of referring entity
        T.StructField("pred", T.StringType()),       # triple predicate to emit
        T.StructField("kind", T.StringType()),       # import|wildcard|type|base|name
        T.StructField("candidates", T.ArrayType(T.StringType())),  # fqn candidates, best first
        T.StructField("raw", T.StringType()),        # original mention text
    ]), True),
    # rec == 'err'  (warn-and-skip semantics, parser.py:67-89)
    T.StructField("err", T.StructType([
        T.StructField("stage", T.StringType()),
        T.StructField("message", T.StringType()),
    ]), True),
])

ENTITIES = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("eid", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("fqn", T.StringType(), True),
    T.StructField("line", T.IntegerType(), True),
    T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
])

TRIPLES = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("obj_is_literal", T.BooleanType(), False),
])

MENTIONS = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), False),
    T.StructField("subj", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("candidates", T.ArrayType(T.StringType()), False),
    T.StructField("raw", T.StringType(), True),
])

SYMBOL_TABLE = T.StructType([
    T.StructField("fqn", T.StringType(), False),
    T.StructField("eid", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("repo", T.StringType(), False),
])

# Per-stage, per-partition lineage + metrics (north_star checkpoint/resume).
LINEAGE_METRICS = T.StructType([
    T.StructField("stage", T.StringType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), True),
    T.StructField("rows_in", T.LongType(), True),
    T.StructField("rows_out", T.LongType(), True),
    T.StructField("status", T.StringType(), False),
])
