"""Stage 3 — canonicalization (SURVEY.md §2.4).

- C1 window dedup with min-commit tiebreak (the north_star's stated form of
  the reference's idempotent-init guards, individuals.py:104 etc.)
- C3 content-hashed IRI assignment: sha256 over the entity's own literal
  attribute values plus the names of its related individuals, sorted
  (individuals.py:54-85) — computed as a collect_list/array_sort aggregation
  over the *final* linked triples, because the reference hashes post-linking
  attribute sets (SURVEY §2.4 C3 note)
- C4 inverse-property materialization: one map-expression projection + union
  replacing owlready2's automatic inverses (extractor.py:35-38)
- dangling ParameterizedType pruning: a parameterized type whose generic
  could not be resolved is dropped, matching the reference's
  generic-individual-None rule (extractor.py:952-961)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeontologypython_spark import woc
from codeontologypython_spark.operators.relational import window_dedup

WOC = woc.WOC


def dedup_triples(triples: DataFrame) -> DataFrame:
    """C1: one winner per (subj, pred, obj), min-commit tiebreak.

    Implemented as groupBy + min(struct) rather than a row_number window:
    identical result, but the aggregation partial-combines map-side, so the
    shuffle carries one row per distinct triple instead of every duplicate
    (the dominant cost at corpus scale where Project/Library/Package triples
    are re-emitted by every file)."""
    return (triples
            .groupBy("subj", "pred", "obj")
            .agg(F.min(F.struct("commit", "repo", "obj_is_literal"))
                 .alias("w"))
            .select(F.col("w.repo").alias("repo"),
                    F.col("w.commit").alias("commit"),
                    "subj", "pred", "obj",
                    F.col("w.obj_is_literal").alias("obj_is_literal")))


def dedup_entities(entities: DataFrame) -> DataFrame:
    """C1 for entity rows: shared entities (Project/Library/Package) are
    idempotently emitted by every file of their repo (the reference's
    hasattr-guarded init_*, individuals.py:104); keep the min-commit row."""
    return (entities
            .groupBy("eid")
            .agg(F.min(F.struct("commit", "path", "repo", "kind", "name",
                                "fqn", "line")).alias("w"))
            .select("eid", F.col("w.repo").alias("repo"),
                    F.col("w.path").alias("path"),
                    F.col("w.commit").alias("commit"),
                    F.col("w.kind").alias("kind"),
                    F.col("w.name").alias("name"),
                    F.col("w.fqn").alias("fqn"),
                    F.col("w.line").alias("line")))


def compute_iris(entities: DataFrame, triples: DataFrame) -> DataFrame:
    """C3 -> (eid, iri).

    Hash input per entity: sorted own literal values + sorted neighbor
    names + kind + eid. The eid (repo|path|ordinal) is included as a
    uniqueness guard: the reference asserts hash uniqueness over attrs +
    neighbor names alone (individuals.py:83-85), which collides for
    e.g. two identical `pass` statements on the same line of different
    files; at 10^12-file scale that assert would fail, so the eid term makes
    IRIs collision-free while staying deterministic in the input content.
    """
    # each literal is pre-hashed so the aggregation shuffles 64-char digests
    # instead of multi-KB hasSourceCode strings; the outer sha256 over the
    # sorted digest list keeps determinism (the reference concatenates raw
    # values, individuals.py:60-85 — same IRI-stability contract, different
    # bytes, which is fine because IRI parity is engine-internal)
    own_lits = (triples.filter(F.col("obj_is_literal"))
                .groupBy("subj")
                .agg(F.collect_list(F.sha2("obj", 256)).alias("lits")))
    neighbor_names = (
        triples.filter(~F.col("obj_is_literal"))
        .join(entities.select(F.col("eid").alias("obj"),
                              F.col("name").alias("nname")), "obj")
        .filter(F.col("nname").isNotNull())
        .groupBy("subj").agg(F.collect_list("nname").alias("nnames")))
    return (entities
            .join(own_lits.withColumnRenamed("subj", "eid"), "eid", "left")
            .join(neighbor_names.withColumnRenamed("subj", "eid"), "eid", "left")
            .select(
                "eid",
                F.concat(
                    F.lit(WOC),
                    F.sha2(F.concat_ws(
                        "|",
                        F.col("kind"),
                        F.col("eid"),
                        F.concat_ws(",", F.array_sort(
                            F.coalesce(F.col("lits"), F.array()))),
                        F.concat_ws(",", F.array_sort(
                            F.coalesce(F.col("nnames"), F.array()))),
                    ), 256)).alias("iri")))


def apply_iris(triples: DataFrame, iri_map: DataFrame) -> DataFrame:
    """Rewrite local entity ids to hashed IRIs on both subj and obj sides.
    Objects already holding absolute IRIs (rdf:type classes, access-modifier
    singletons, owl terms) pass through via coalesce."""
    s_map = iri_map.select(F.col("eid").alias("subj"), F.col("iri").alias("s_iri"))
    o_map = iri_map.select(F.col("eid").alias("obj"), F.col("iri").alias("o_iri"))
    return (triples
            .join(s_map, "subj", "left")
            .join(o_map, "obj", "left")
            .select(
                "repo", "commit",
                F.coalesce("s_iri", "subj").alias("subj"),
                "pred",
                F.when(F.col("obj_is_literal"), F.col("obj"))
                 .otherwise(F.coalesce("o_iri", "obj")).alias("obj"),
                "obj_is_literal"))


def materialize_inverses(triples: DataFrame) -> DataFrame:
    """C4: forward-only emission + relational inverse generation."""
    inv_map = F.create_map(*[F.lit(x) for pair in woc.INVERSE.items() for x in pair])
    invertible = (triples
                  .filter(~F.col("obj_is_literal"))
                  .withColumn("inv_pred", inv_map[F.col("pred")])
                  .filter(F.col("inv_pred").isNotNull()))
    inverses = invertible.select(
        "repo", "commit",
        F.col("obj").alias("subj"), F.col("inv_pred").alias("pred"),
        F.col("subj").alias("obj"), F.lit(False).alias("obj_is_literal"))
    return triples.unionByName(inverses)


def degrade_argless_ptypes(entities: DataFrame, triples: DataFrame) -> DataFrame:
    """A ParameterizedType whose generic resolved but NONE of whose type
    arguments did degrades to the plain generic class — the reference links
    the bare generic when ``is_all_none(parameterized_individuals)``
    (extractor.py:955-961). Common shape: ``Box[T]`` where ``Box`` is
    corpus-local but ``T`` is an unresolvable TypeVar.

    Single pass suffices for nesting: an inner ParameterizedType is itself a
    non-literal hasArgumentType object, so its enclosing TypeArgument counts
    as resolved regardless of the inner one's later rewrite."""
    ptypes = entities.filter(F.col("kind") == "ParameterizedType").select("eid")
    generic = (triples.filter(F.col("pred") == WOC + "hasGenericType")
               .select(F.col("subj").alias("eid"), F.col("obj").alias("gen")))
    targs = (triples.filter(F.col("pred") == WOC + "hasActualTypeArgument")
             .select(F.col("subj").alias("eid"), F.col("obj").alias("targ")))
    resolved_args = (triples.filter((F.col("pred") == WOC + "hasArgumentType")
                                    & ~F.col("obj_is_literal"))
                     .select(F.col("subj").alias("targ")).distinct())
    has_resolved_arg = (targs.join(resolved_args, "targ", "left_semi")
                        .select("eid").distinct())
    degenerate = (ptypes.join(generic, "eid")
                  .join(has_resolved_arg, "eid", "left_anti")
                  .localCheckpoint())
    if degenerate.isEmpty():
        return triples
    # rewrite inbound type links to the generic class (tiny map, broadcast)
    rmap = degenerate.select(F.col("eid").alias("obj"),
                             F.col("gen").alias("new_obj"))
    rewritten = (triples
                 .join(F.broadcast(rmap), "obj", "left")
                 .withColumn("obj", F.when(
                     F.col("new_obj").isNotNull()
                     & F.col("pred").isin(WOC + "hasType",
                                          WOC + "hasArgumentType"),
                     F.col("new_obj")).otherwise(F.col("obj")))
                 .drop("new_obj"))
    # drop the degenerate subtree (its own triples + its TypeArguments')
    drop = (degenerate.select("eid")
            .unionByName(targs.join(degenerate.select("eid"), "eid",
                                    "left_semi")
                         .select(F.col("targ").alias("eid")))
            .distinct())
    return (rewritten
            .join(F.broadcast(drop.withColumnRenamed("eid", "subj")),
                  "subj", "left_anti")
            .join(F.broadcast(drop.withColumnRenamed("eid", "obj")),
                  "obj", "left_anti"))


def prune_dangling_ptypes(entities: DataFrame, triples: DataFrame) -> DataFrame:
    """Drop ParameterizedType entities that (a) never resolved a generic
    (reference generic-individual-None rule, extractor.py:952-961) or
    (b) have no inbound hasType/hasArgumentType reference left — e.g. the
    annotation subtree of a LOSING field fact after the Stage-2 fold — plus
    their TypeArgument subtrees. Bounded loop: dropping a parent generic
    orphans its nested generics, so iterate to the (shallow) nesting depth.
    """
    ptypes = (entities.filter(F.col("kind") == "ParameterizedType")
              .select("eid").localCheckpoint())
    if ptypes.isEmpty():
        return triples
    # all the per-round probes filter on 3 type-predicates — restrict once
    # per round so the full triple stream is only anti-joined, never grouped
    for _ in range(6):
        resolved_generic = (triples
                            .filter(F.col("pred") == WOC + "hasGenericType")
                            .select(F.col("subj").alias("eid")).distinct())
        inbound = (triples
                   .filter(F.col("pred").isin(WOC + "hasType",
                                              WOC + "hasArgumentType")
                           & ~F.col("obj_is_literal"))
                   .select(F.col("obj").alias("eid")).distinct())
        bad = (ptypes.join(resolved_generic, "eid", "left_anti")
               .unionByName(ptypes.join(inbound, "eid", "left_anti"))
               .distinct().localCheckpoint())
        if bad.isEmpty():
            return triples
        targs = (triples.filter(F.col("pred") == WOC + "hasActualTypeArgument")
                 .join(F.broadcast(bad.withColumnRenamed("eid", "subj")), "subj")
                 .select(F.col("obj").alias("eid")))
        # the drop set is tiny (a subset of the type-annotation entities):
        # broadcast it so the two anti-joins are map-side and the full triple
        # stream is never shuffled
        drop = bad.unionByName(targs).distinct().localCheckpoint()
        triples = (triples
                   .join(F.broadcast(drop.withColumnRenamed("eid", "subj")),
                         "subj", "left_anti")
                   .join(F.broadcast(drop.withColumnRenamed("eid", "obj")),
                         "obj", "left_anti")).localCheckpoint()
        ptypes = ptypes.join(drop, "eid", "left_anti").localCheckpoint()
        if ptypes.isEmpty():
            return triples
    return triples


def audit_iri_uniqueness(iri_map: DataFrame) -> DataFrame:
    """The reference asserts global IRI uniqueness (individuals.py:83-85);
    relational analog: return colliding IRIs (must be empty)."""
    return (iri_map.groupBy("iri").agg(F.count("*").alias("n"),
                                       F.collect_list("eid").alias("eids"))
            .filter(F.col("n") > 1))


def canonicalize_stage(entities: DataFrame, all_triples: DataFrame) -> DataFrame:
    """Full Stage 3: prune -> IRI hash -> rewrite -> inverses -> dedup.

    ``pruned`` and ``iri_map`` are localCheckpointed: each feeds 2-3
    downstream joins, and without a materialization barrier Catalyst would
    re-embed (and re-execute) the whole upstream plan once per join branch —
    the plan-blowup problem, quadratic at scale. On a cluster these are the
    Stage-3 parquet/Iceberg checkpoints.
    """
    entities = dedup_entities(entities)
    degraded = degrade_argless_ptypes(entities, all_triples)
    pruned = prune_dangling_ptypes(entities, degraded)
    # dedup BEFORE IRI hashing: (a) the IRI aggregation then sees each
    # neighbor name once (duplicate emissions would perturb the hash input),
    # (b) the IRI-rewrite joins and the inverse union process one row per
    # distinct triple. Inverses of distinct forward triples are distinct —
    # only forward predicates are emitted upstream — so no second dedup.
    deduped = dedup_triples(pruned).localCheckpoint()
    iri_map = compute_iris(entities, deduped).localCheckpoint()
    rewritten = apply_iris(deduped, iri_map)
    return materialize_inverses(rewritten)
