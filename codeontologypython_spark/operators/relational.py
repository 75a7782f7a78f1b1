"""Generic distributed-relational primitives the KG pipeline is built from.

These are the Spark-native replacements for the reference's recursive
pointer-chasing (SURVEY.md §2.3/§2.4): broadcast + salted hash joins,
top-1-per-group windows, bounded transitive closure, window dedup with a
deterministic tiebreak. They are exposed directly (and exercised against the
TPC-H-ish driver tables in ``__spark_entry__.py``) because they ARE the
engine's operator core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reliable_barrier(df: DataFrame, checkpoint_dir: str | None,
                     tag: str) -> DataFrame:
    """Materialization barrier for iterative-join loops.

    Default (``checkpoint_dir=None``): ``localCheckpoint()`` — fast, but
    executor-local and non-replicated, so on a real cluster an executor loss
    means recompute-from-nothing. With ``checkpoint_dir`` set, the round's
    result is written to ``<dir>/<tag>`` as parquet and read back — a
    reliable barrier that survives executor loss and also truncates lineage.
    This makes the "on a cluster: per-round parquet checkpoint" substitution
    documented at the loop sites executable rather than commentary. Each
    caller passes a round-unique ``tag`` so no round overwrites a path an
    earlier round's DataFrame still reads from.

    The local mode is a LAZY checkpoint (``eager=False``): every barrier in
    the iterative loops is consumed immediately afterwards (an isEmpty
    probe, the next round's join), so the first action both materializes
    and pins it — an eager checkpoint would run one extra job per round
    for the same result (measured 1.5x on the bounded-closure loop).
    Lineage still truncates at materialization, so plans stay flat.
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=False)
    path = f"{checkpoint_dir.rstrip('/')}/{tag}"
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Scale-adaptive parallelism floor for expression-heavy operators.

    A small input (one parquet file under maxPartitionBytes) scans as ONE
    partition, so every per-row expression upstream of the first exchange —
    shingle explosion, MinHash folds, regex scrubbing — runs on one core
    regardless of cluster width. Repartitioning to
    ``defaultParallelism * multiplier`` costs one shuffle of the (by
    construction small) input and unlocks full-width evaluation.

    Scale-adaptive: when the input already has at least that many partitions
    (any corpus-scale table), this is a NO-OP — no shuffle is ever added to
    a large input, so operators using it keep their 100 TB shuffle shape.
    The explicit partition number is deliberate: AQE never coalesces a
    user-specified ``repartition(n)``, while a bare ``repartition(col)``
    would be coalesced right back to one partition at these sizes.
    ``multiplier=1`` (one task per core) measured best for expression-heavy
    map work at bench scale; finer grains only add scheduling overhead to
    the downstream small-shuffle jobs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-defusing equi-join (north_star: "salted hash joins to defuse skew
    on hub modules"). The probe side gets a deterministic salt derived from
    its row content; the build side is replicated ``salt`` times. Result
    equals a plain ``probe.join(build, key, how)``.

    Use when the build side is too large to broadcast AND the probe key is
    skewed (hub symbols like ``os``/``typing`` at corpus scale). AQE skew-join
    handles sort-merge skew adaptively; explicit salting also covers
    shuffle-hash joins and makes the mitigation deterministic.
    """
    all_probe_cols = probe.columns
    salt_col = (F.abs(F.hash(*[F.col(c) for c in all_probe_cols])) % salt)
    p = probe.withColumn("__salt", salt_col)
    b = build.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = p.join(b, on=[key, "__salt"], how=how).drop("__salt")
    return out


def top1_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Keep the best row per group (candidate-join resolution, SURVEY L3;
    MRO-priority override pick, SURVEY P4)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def window_dedup(
    df: DataFrame, key_cols: list[str], tiebreak_cols: list[Column]
) -> DataFrame:
    """Dedup with deterministic winner (SURVEY C1; north_star "window over
    (subj,pred,obj) with min-commit tiebreak").

    Implemented as groupBy + ``min(struct(tiebreaks…, remaining cols…))``
    rather than a row_number window (CLAUDE.md pitfall 5): the aggregation
    partial-combines map-side, so the exchange carries at most one row per
    (group x map partition) instead of every input row, and the reduce side
    needs no sort. Contract: ``tiebreak_cols`` must be ASCENDING expressions
    (the C1 min-commit shape); the winner is the row minimizing
    (tiebreaks…, remaining columns…) lexicographically — identical to the
    window form whenever the tiebreak is unique within a group, and still
    deterministic when it is not (the window form is not). For descending /
    mixed orderings use :func:`top1_per_group`."""
    others = [c for c in df.columns if c not in key_cols]
    w = F.min(F.struct(
        *[tb.alias(f"__tb{i}") for i, tb in enumerate(tiebreak_cols)],
        *[F.col(c) for c in others])).alias("w")
    return (df.groupBy(*[F.col(k) for k in key_cols]).agg(w)
            .select(*key_cols, *[F.col(f"w.{c}").alias(c) for c in others]))


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 10,
    carry_min: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded iterative transitive closure over an edge DataFrame, the join
    analog of the reference's recursive ancestor walks (SURVEY L4; alias
    chase bound tracking.py:343).

    Returns (src, dst, depth[, carry]) where depth is the minimum path length.
    ``carry_min`` optionally propagates the minimum of an edge attribute along
    the first hop (used for base-class position in MRO-priority ordering).
    Each round is one shuffle join; Python class DAGs are shallow so the loop
    exits after 2-4 rounds. ``checkpoint_dir`` swaps the per-round
    localCheckpoint for a reliable parquet barrier (see
    :func:`reliable_barrier`) — the cluster-scale mode.
    """
    carry_cols = [carry_min] if carry_min else []
    frontier = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.lit(1).alias("depth"), *[F.col(c) for c in carry_cols])
    closure = frontier
    base = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    for i in range(max_iterations):
        stepped = (frontier.join(base, frontier["dst"] == base["e_src"])
                   .select(F.col("src"), F.col("e_dst").alias("dst"),
                           (F.col("depth") + 1).alias("depth"),
                           *[F.col(c) for c in carry_cols]))
        # anti-join against known pairs -> only genuinely new paths survive;
        # the barrier truncates the per-round lineage so the plan does not
        # grow quadratically
        new = reliable_barrier(
            stepped.join(closure.select("src", "dst"),
                         on=["src", "dst"], how="left_anti"),
            checkpoint_dir, f"tc_round_{i}")
        if new.isEmpty():
            break
        closure = closure.unionByName(new)
        frontier = new
    # keep min depth (and min carry) per pair
    aggs = [F.min("depth").alias("depth")] + [F.min(c).alias(c) for c in carry_cols]
    return closure.groupBy("src", "dst").agg(*aggs)


def broadcast_if_small(df: DataFrame, threshold_rows: int | None = None):
    """Hint helper: broadcast the project-level symbol table when it is small
    (north_star), fall back to a shuffle join otherwise. Catalyst's AQE also
    auto-broadcasts below spark.sql.autoBroadcastJoinThreshold; the explicit
    hint covers the planned-size-unknown UDF-output case."""
    if threshold_rows is None:
        return F.broadcast(df)
    return df
