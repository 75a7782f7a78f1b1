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
from codeontologypython_spark.operators.relational import reliable_barrier

WOC = woc.WOC


def dedup_triples(triples: DataFrame) -> DataFrame:
    """C1: one winner per (subj, pred, obj), min-commit tiebreak.

    Implemented as groupBy + min(struct) rather than a row_number window,
    and the stream is explicitly ``repartition("subj")`` first: hash
    partitioning by subj alone SATISFIES the (subj, pred, obj) clustering
    requirement (equal subj ⟹ same partition ⟹ equal triple ⟹ same
    partition), so Catalyst inserts no second exchange — and, because the
    aggregation preserves its child's partitioning, every downstream
    subj-keyed operation (the neighbor-name IRI aggregation, the subj-side
    IRI rewrite join) reuses this ONE exchange when the result is persisted.
    This trades the map-side partial combine for exchange reuse: duplicate
    triples (per-file re-emissions of shared Project/Library/Package rows,
    <0.1% of the stream) travel through the shuffle before collapsing, while
    later full-stream shuffles disappear entirely. In canonicalize_stage
    this path now carries only the NON-literal rows (small, join-active);
    literal rows — the byte mass — dedup via :func:`dedup_literal_triples`
    without shuffling their bytes at all."""
    return (triples
            .repartition("subj")
            .groupBy("subj", "pred", "obj")
            .agg(F.min(F.struct("commit", "repo", "obj_is_literal"))
                 .alias("w"))
            .select(F.col("w.repo").alias("repo"),
                    F.col("w.commit").alias("commit"),
                    "subj", "pred", "obj",
                    F.col("w.obj_is_literal").alias("obj_is_literal")))


# dup keys above this count stop fitting a comfortable broadcast (~120 B/key);
# fall back to the classic byte-shuffle dedup — the shape of a commit-dense
# corpus where most files exist at many commits
_LIT_DUP_BROADCAST_MAX = 2_000_000


def dedup_literal_triples(lit: DataFrame) -> tuple[DataFrame, DataFrame]:
    """C1 for LITERAL rows without shuffling their bytes.

    Literal objects (hasSourceCode, hasDocumentation, names…) are the
    stream's byte mass: a multi-KB source string per statement/executable.
    Classic dedup must move every unique row through one exchange to
    co-locate equal triples — at 8→32 local cores that exchange is memory-
    bandwidth-bound and stops scaling, and at 10^12-file scale it IS the
    canonicalize stage's network bill. But a duplicated literal triple can
    only arise from the same file content at several commits (subjects are
    (repo|path|ordinal)-scoped), which makes duplicates RARE and detectable
    from digests alone:

    1. shuffle only ``(subj, pred, sha2(obj))`` key rows (~200 B) to count
       multiplicity per distinct triple — the byte column stays in place;
    2. keys with multiplicity > 1 (the rare multi-commit files) form a tiny
       broadcast set; rows matching it take the classic min-commit dedup —
       a byte shuffle of only the duplicated sliver;
    3. everything else passes through map-side untouched.

    Returns ``(deduped_rows, digest_groups)`` where ``digest_groups`` is the
    distinct ``(subj, pred, digest)`` table — exactly one row per surviving
    triple, which :func:`compute_iris` aggregates into the own-literal IRI
    hash input (identical multiset to hashing the deduped rows directly, so
    IRIs are byte-identical to the classic path). Falls back to classic
    dedup when the dup-key set exceeds ``_LIT_DUP_BROADCAST_MAX``.

    Cache lifetime contract: the digest-group table is ``persist()``ed here
    (it feeds the dup gate eagerly, then BOTH returned frames lazily — the
    groups projection via compute_iris and, when duplicates exist, the
    dup-key anti/semi joins), so it must stay cached until the caller
    materializes the stage output; it cannot be unpersisted inside this
    function or canonicalize_stage without recomputing the literal-stream
    groupBy. ``run_pipeline`` / ``__spark_entry__`` release it (and every
    other stage cache) with a delta-sweep of ``getPersistentRDDs`` right
    after the stage-3 result lands; long-lived sessions calling
    canonicalize_stage directly should do the same.
    """
    cols = ["repo", "commit", "subj", "pred", "obj", "obj_is_literal"]
    lit2 = lit.withColumn("digest", F.sha2("obj", 256))
    g = (lit2.groupBy("subj", "pred", "digest")
         .agg(F.count("*").alias("c"))
         .persist())  # consumed by the dup gate AND the own-literal IRI agg
    dup_keys = g.filter(F.col("c") > 1).select("subj", "pred", "digest")
    n_dups = dup_keys.count()
    groups = g.select("subj", "pred", "digest")
    if n_dups == 0:
        return lit2.select(*cols), groups
    if n_dups > _LIT_DUP_BROADCAST_MAX:
        return dedup_triples(lit), groups
    clean = (lit2.join(F.broadcast(dup_keys), ["subj", "pred", "digest"],
                       "left_anti").select(*cols))
    hit = (lit2.join(F.broadcast(dup_keys), ["subj", "pred", "digest"],
                     "left_semi").select(*cols))
    return clean.unionByName(dedup_triples(hit)), groups


def apply_library_manifest(triples: DataFrame,
                           manifest: DataFrame) -> DataFrame:
    """S3 remnant — project-own vs dependency library classification.

    The reference's ``Library.is_by_project`` (explore/__init__.py:188-231)
    gates ``init_library``'s project links (individuals.py:720-731): ONLY
    libraries declared inside the project get ``hasProject`` /
    ``isDependencyOf``; dependency libraries keep their Library individual
    and ``hasName`` but stand unlinked. SURVEY §2.1 maps the classification
    to a column joined from a tiny project-manifest table:
    ``manifest(repo, library, is_by_project)``, absent rows defaulting to
    project-own (True).

    Spark shape: the manifest is tiny (one row per repo x top-level library
    marked as a dependency), so the drop-set is a broadcast ANTI join keyed
    on the library eid — the full triple stream is never shuffled. The
    library eid sits in ``subj`` for ``hasProject`` and in ``obj`` for
    ``hasDependency``; inverses don't exist yet at this stage (they are
    materialized from forwards later, so dropping the forwards drops them
    too)."""
    deps = (manifest.filter(~F.col("is_by_project"))
            .select(F.concat(F.col("repo"), F.lit("|Library|"),
                             F.col("library")).alias("dep_eid")))
    lib_key = (F.when(F.col("pred") == woc.PROP["hasProject"], F.col("subj"))
               .when(F.col("pred") == woc.PROP["hasDependency"],
                     F.col("obj")))
    return (triples.withColumn("_libkey", lib_key)
            .join(F.broadcast(deps), F.col("_libkey") == F.col("dep_eid"),
                  "left_anti")
            .drop("_libkey"))


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


def compute_iris(entities: DataFrame, triples: DataFrame,
                 lit_groups: DataFrame | None = None,
                 broadcast_entities: bool = False) -> DataFrame:
    """C3 -> (eid, iri).

    ``broadcast_entities``: hint the (eid, name) side of the neighbor-name
    join as a broadcast — the non-literal stream then keeps its subj
    partitioning through that join and the following groupBy(subj) reuses
    it (zero extra exchanges). Gated by the caller on the entity count
    (canonicalize_stage ties it to the same threshold as the IRI rewrite);
    False at corpus scale.

    Hash input per entity: sorted own literal values + sorted neighbor
    names + kind + eid. The eid (repo|path|ordinal) is included as a
    uniqueness guard: the reference asserts hash uniqueness over attrs +
    neighbor names alone (individuals.py:83-85), which collides for
    e.g. two identical `pass` statements on the same line of different
    files; at 10^12-file scale that assert would fail, so the eid term makes
    IRIs collision-free while staying deterministic in the input content.

    ``lit_groups`` (the distinct (subj, pred, digest) table from
    :func:`dedup_literal_triples`) supplies the own-literal digests without
    touching the literal byte column again; without it they are hashed from
    ``triples`` directly (the mixed-stream form used by unit tests).
    """
    # each literal is pre-hashed so the aggregation shuffles 64-char digests
    # instead of multi-KB hasSourceCode strings; the outer sha256 over the
    # sorted digest list keeps determinism (the reference concatenates raw
    # values, individuals.py:60-85 — same IRI-stability contract, different
    # bytes, which is fine because IRI parity is engine-internal)
    if lit_groups is not None:
        # one group row per surviving deduped literal triple -> the digest
        # multiset equals hashing the deduped rows directly
        own_lits = (lit_groups.groupBy("subj")
                    .agg(F.collect_list("digest").alias("lits")))
    else:
        own_lits = (triples.filter(F.col("obj_is_literal"))
                    .groupBy("subj")
                    .agg(F.collect_list(F.sha2("obj", 256)).alias("lits")))
    name_map = entities.select(F.col("eid").alias("obj"),
                               F.col("name").alias("nname"))
    if broadcast_entities:
        name_map = F.broadcast(name_map)
    neighbor_names = (
        triples.filter(~F.col("obj_is_literal"))
        .join(name_map, "obj")
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


# above this many iri_map rows (~130 B/row -> ~500 MB hash relation) the
# broadcast rewrite stops fitting comfortably in executor memory; fall back
# to shuffle joins (the corpus-scale default, where the triple table is
# bucketed so the sorts are co-located). Mirrors linking's
# _AUTO_BROADCAST_MAX_ROWS pattern.
_IRI_BROADCAST_MAX_ROWS = 4_000_000


def apply_iris(lit: DataFrame, nonlit: DataFrame, iri_map: DataFrame,
               broadcast_maps: bool = False) -> DataFrame:
    """Rewrite local entity ids to hashed IRIs: subj side on both streams,
    obj side on non-literals only. Objects already holding absolute IRIs
    (rdf:type classes, access-modifier singletons, owl terms) pass through
    via coalesce.

    Shuffle shape: with ``broadcast_maps`` (auto-gated by canonicalize_stage
    on iri_map size) all lookups are map-side broadcast-hash joins — the
    literal byte mass crosses ZERO exchanges in the whole stage (its dedup
    is digest-based, see dedup_literal_triples). On the shuffle path the
    literal stream pays its single byte exchange here (subj join) and the
    non-literal joins reuse the dedup output's subj partitioning; the
    sort-merge sorts of a unified 11M-row stream were measured 10x slower
    than the broadcast probe, hence the auto gate."""
    s_map = iri_map.select(F.col("eid").alias("subj"), F.col("iri").alias("s_iri"))
    o_map = iri_map.select(F.col("eid").alias("obj"), F.col("iri").alias("o_iri"))
    if broadcast_maps:
        # the exchanges canonicalize to the same subtree (aliases are
        # normalized away), so ReuseExchange ships one hash relation
        s_map, o_map = F.broadcast(s_map), F.broadcast(o_map)
    lits = (lit
            .join(s_map, "subj", "left")
            .select("repo", "commit",
                    F.coalesce("s_iri", "subj").alias("subj"),
                    "pred", "obj", "obj_is_literal"))
    nonlits = (nonlit
               .join(s_map, "subj", "left")
               .select("repo", "commit",
                       F.coalesce("s_iri", "subj").alias("subj"),
                       "pred", "obj", "obj_is_literal")
               .join(o_map, "obj", "left")
               .select("repo", "commit", "subj", "pred",
                       F.coalesce("o_iri", "obj").alias("obj"),
                       "obj_is_literal"))
    return lits.unionByName(nonlits)


def materialize_inverses(triples: DataFrame) -> DataFrame:
    """C4: forward-only emission + relational inverse generation.

    Single pass: each row explodes into [forward] or [forward, inverse] —
    NOT a union of the input plan with a derived-inverses plan, which would
    execute the whole upstream rewrite pipeline twice (once per union
    branch)."""
    inv_map = F.create_map(*[F.lit(x) for pair in woc.INVERSE.items() for x in pair])
    inv_pred = inv_map[F.col("pred")]
    fwd = F.struct(F.col("subj"), F.col("pred"), F.col("obj"),
                   F.col("obj_is_literal"))
    inv = F.struct(F.col("obj").alias("subj"), inv_pred.alias("pred"),
                   F.col("subj").alias("obj"),
                   F.lit(False).alias("obj_is_literal"))
    rows = (F.when(F.col("obj_is_literal") | inv_pred.isNull(),
                   F.array(fwd))
            .otherwise(F.array(fwd, inv)))
    return (triples
            .select("repo", "commit", F.explode(rows).alias("t"))
            .select("repo", "commit", "t.subj", "t.pred", "t.obj",
                    "t.obj_is_literal"))


def degrade_argless_ptypes(entities: DataFrame, triples: DataFrame,
                           assume_ptypes: bool = False) -> DataFrame:
    """A ParameterizedType whose generic resolved but NONE of whose type
    arguments did degrades to the plain generic class — the reference links
    the bare generic when ``is_all_none(parameterized_individuals)``
    (extractor.py:955-961). Common shape: ``Box[T]`` where ``Box`` is
    corpus-local but ``T`` is an unresolvable TypeVar.

    Single pass suffices for nesting: an inner ParameterizedType is itself a
    non-literal hasArgumentType object, so its enclosing TypeArgument counts
    as resolved regardless of the inner one's later rewrite."""
    ptypes = entities.filter(F.col("kind") == "ParameterizedType").select("eid")
    if not assume_ptypes and ptypes.isEmpty():
        # common corpus shape (no parameterized annotations at all): skip the
        # three full-stream candidate scans below outright (canonicalize_stage
        # answers this from its batched kind-count job and passes
        # assume_ptypes=True when ptypes are known to exist)
        return triples
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
                  .localCheckpoint(eager=False))
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


def prune_dangling_ptypes(entities: DataFrame, triples: DataFrame,
                          checkpoint_dir: str | None = None) -> DataFrame:
    """Drop ParameterizedType entities that (a) never resolved a generic
    (reference generic-individual-None rule, extractor.py:952-961) or
    (b) have no inbound hasType/hasArgumentType reference left — e.g. the
    annotation subtree of a LOSING field fact after the Stage-2 fold — plus
    their TypeArgument subtrees. Bounded loop: dropping a parent generic
    orphans its nested generics, so iterate to the (shallow) nesting depth.
    ``checkpoint_dir`` swaps the loop's localCheckpoints for reliable
    parquet barriers (relational.reliable_barrier — the cluster-scale mode).
    """
    ptypes = reliable_barrier(
        entities.filter(F.col("kind") == "ParameterizedType").select("eid"),
        checkpoint_dir, "ptypes_init")
    if ptypes.isEmpty():
        return triples
    # Round-6 shape: the fixpoint only ever inspects the 4 type predicates,
    # so iterate over THAT small subgraph (restricted once, barriered) and
    # accumulate the drop set; the full triple stream is anti-joined exactly
    # ONCE at the end. The round-5 loop re-barriered the whole multi-GB
    # stream every round — up to 6 full-stream materializations (measured as
    # the bulk of Stage-3 build time on the realworld corpus).
    type_preds = (WOC + "hasGenericType", WOC + "hasActualTypeArgument",
                  WOC + "hasType", WOC + "hasArgumentType")
    tp = reliable_barrier(
        triples.filter(F.col("pred").isin(*type_preds))
        .select("subj", "pred", "obj", "obj_is_literal"),
        checkpoint_dir, "ptypes_subgraph")
    dropped = None
    for i in range(6):
        resolved_generic = (tp
                            .filter(F.col("pred") == WOC + "hasGenericType")
                            .select(F.col("subj").alias("eid")).distinct())
        inbound = (tp
                   .filter(F.col("pred").isin(WOC + "hasType",
                                              WOC + "hasArgumentType")
                           & ~F.col("obj_is_literal"))
                   .select(F.col("obj").alias("eid")).distinct())
        bad = reliable_barrier(
            ptypes.join(resolved_generic, "eid", "left_anti")
            .unionByName(ptypes.join(inbound, "eid", "left_anti"))
            .distinct(), checkpoint_dir, f"ptypes_bad_{i}")
        if bad.isEmpty():
            break
        targs = (tp.filter(F.col("pred") == WOC + "hasActualTypeArgument")
                 .join(F.broadcast(bad.withColumnRenamed("eid", "subj")), "subj")
                 .select(F.col("obj").alias("eid")))
        # the drop set is tiny (a subset of the type-annotation entities):
        # broadcast it so the anti-joins are map-side
        drop = reliable_barrier(bad.unionByName(targs).distinct(),
                                checkpoint_dir, f"ptypes_drop_{i}")
        dropped = drop if dropped is None else dropped.unionByName(drop)
        tp = reliable_barrier(
            tp
            .join(F.broadcast(drop.withColumnRenamed("eid", "subj")),
                  "subj", "left_anti")
            .join(F.broadcast(drop.withColumnRenamed("eid", "obj")),
                  "obj", "left_anti"), checkpoint_dir, f"ptypes_sub_{i}")
        ptypes = reliable_barrier(ptypes.join(drop, "eid", "left_anti"),
                                  checkpoint_dir, f"ptypes_left_{i}")
        if ptypes.isEmpty():
            break
    if dropped is None:
        return triples
    # per-round drop sets are disjoint (each round's bad/targs were removed
    # from ptypes/tp before the next), so sequential per-round anti-joins
    # equal one anti-join with their union
    dropped = reliable_barrier(dropped.distinct(), checkpoint_dir,
                               "ptypes_drop_all")
    return (triples
            .join(F.broadcast(dropped.withColumnRenamed("eid", "subj")),
                  "subj", "left_anti")
            .join(F.broadcast(dropped.withColumnRenamed("eid", "obj")),
                  "obj", "left_anti"))


def audit_iri_uniqueness(iri_map: DataFrame) -> DataFrame:
    """The reference asserts global IRI uniqueness (individuals.py:83-85);
    relational analog: return colliding IRIs (must be empty)."""
    return (iri_map.groupBy("iri").agg(F.count("*").alias("n"),
                                       F.collect_list("eid").alias("eids"))
            .filter(F.col("n") > 1))


def canonicalize_stage(entities: DataFrame, all_triples: DataFrame,
                       manifest: DataFrame | None = None,
                       broadcast_iris: bool | None = None) -> DataFrame:
    """Full Stage 3: prune -> IRI hash -> rewrite -> inverses -> dedup.

    ``manifest`` (optional, tiny ``(repo, library, is_by_project)`` table)
    drops the project links of dependency libraries first — see
    :func:`apply_library_manifest`.

    ``broadcast_iris``: None (default) auto-gates the IRI rewrite on the
    iri_map row count (one count job); an explicit True/False pins the plan
    AND skips that job — benchmarks pin False so every corpus size takes the
    same (corpus-scale) physical plan instead of flipping strategies across
    the broadcast threshold mid-measurement.

    ``entities``, ``nonlit_d`` and ``iri_map`` each feed 2-4 downstream
    consumers, so they are persist()ed — a materialization barrier like the
    localCheckpoints elsewhere, but one that PRESERVES outputPartitioning
    (localCheckpoint's LogicalRDD drops it under AQE): the single
    ``repartition("subj")`` inside the non-literal dedup then also serves
    the neighbor-name IRI aggregation and the subj-side rewrite join with no
    further full-stream exchange, and the eid-partitioned entity dedup
    serves every eid-keyed join in compute_iris. Literal rows — the byte
    mass — never enter that exchange at all: their dedup and IRI hash input
    run on digests (dedup_literal_triples), so on the broadcast-rewrite path
    the stage moves ZERO literal bytes through shuffles. On a cluster these
    persists are the Stage-3 parquet/Iceberg checkpoints (which preserve
    bucketing the same way).
    """
    if manifest is not None:
        all_triples = apply_library_manifest(all_triples, manifest)
    entities = dedup_entities(entities).persist()
    # ONE aggregate job (which also warms the entity persist) answers both
    # serial gates: the ParameterizedType emptiness probe (degrade/prune
    # short-circuit) AND the entity count that drives every broadcast
    # decision — iri_map has exactly one row per entity, so this replaces
    # the round-5 separate iri_map.count() job outright
    row = entities.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("kind") == "ParameterizedType", True))
        .alias("np")).collect()[0]
    n_entities, n_ptypes = row["n"], row["np"]
    if n_ptypes:
        degraded = degrade_argless_ptypes(entities, all_triples,
                                          assume_ptypes=True)
        pruned = prune_dangling_ptypes(entities, degraded)
    else:
        pruned = all_triples
    if broadcast_iris is None:
        broadcast_iris = n_entities <= _IRI_BROADCAST_MAX_ROWS
    # dedup BEFORE IRI hashing: (a) the IRI aggregation then sees each
    # neighbor name / literal digest once (duplicate emissions would perturb
    # the hash input), (b) the IRI-rewrite joins and the inverse union
    # process one row per distinct triple. Inverses of distinct forward
    # triples are distinct — only forward predicates are emitted upstream —
    # so no second dedup.
    nonlit_d = dedup_triples(pruned.filter(~F.col("obj_is_literal"))).persist()
    lit_d, lit_groups = dedup_literal_triples(
        pruned.filter(F.col("obj_is_literal")))
    iri_map = compute_iris(entities, nonlit_d,
                           lit_groups=lit_groups,
                           broadcast_entities=broadcast_iris).persist()
    rewritten = apply_iris(lit_d, nonlit_d, iri_map,
                           broadcast_maps=broadcast_iris)
    return materialize_inverses(rewritten)
