"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every operator family of SURVEY.md §2 (and the
training-data-pipeline extensions) as a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL. Numeric columns
that aggregate doubles are routed through DECIMAL casts so Spark and DuckDB
produce bit-identical values; cosine similarities are computed with the same
operand order and rounded on both sides.

KG-pipeline queries (prefix ``kg_``) run the full extract->link->canonicalize
pipeline on the deterministic fixture corpus (FIXTURES.md) — they are not
SQL-expressible over the TPC-H tables, so they carry no oracle entry and get
the driver's rows-only check; their strong correctness gate is
``tests/test_pipeline.py`` / ``tests/test_golden.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
_SW_SQL = "('" + "','".join(STOPWORDS) + "')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c, scale=4):
    return F.col(c).cast(f"decimal(18,{scale})")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: local-supplier-volume style multi-join aggregation over
    sf0.001 (broadcast dims + partial aggregation; the relational shape of
    the KG linking stage)."""
    return _q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# TPC-H-style relational primitives (SURVEY §2 operator demonstrations)
# --------------------------------------------------------------------------

def _q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                 F.sum(_dec("l_extendedprice")
                       * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
                 .cast("double").alias("sum_disc_price"),
                 F.count("*").alias("count_order")))


def _q3_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey")
            .agg(F.sum(_dec("l_extendedprice")
                       * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
                 .cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
            .limit(10))


def _q5_local_supplier_volume(spark, sf_dir):
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (li
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(cust, (orders.o_custkey == cust.c_custkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(F.sum(_dec("l_extendedprice")
                       * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
                 .cast("double").alias("revenue")))


def _q_broadcast_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(_dec("o_totalprice")).cast("double").alias("total_price")))


def _q_salted_join(spark, sf_dir):
    from codeontologypython_spark.operators.relational import salted_join
    orders = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(orders, cust, "custkey", salt=8)
    return (joined.groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(_dec("o_totalprice")).cast("double").alias("total_price")))


def _q_window_dedup(spark, sf_dir):
    from codeontologypython_spark.operators.relational import window_dedup
    li = _t(spark, sf_dir, "lineitem")
    return window_dedup(
        li.select("l_orderkey", "l_linenumber", "l_partkey"),
        ["l_orderkey"],
        [F.col("l_linenumber"), F.col("l_partkey")])


def _q_top1_per_group(spark, sf_dir):
    from codeontologypython_spark.operators.relational import top1_per_group
    supp = _t(spark, sf_dir, "supplier")
    return top1_per_group(
        supp.select("s_nationkey", "s_suppkey", "s_acctbal"),
        ["s_nationkey"],
        [F.col("s_acctbal").desc(), F.col("s_suppkey")])


def _q_posexplode(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (orders.select(
        "o_orderkey",
        F.posexplode(F.split("o_orderpriority", "-")).alias("pos0", "part"))
        .select("o_orderkey", (F.col("pos0") + 1).alias("pos"), "part")
        .groupBy("part", "pos").agg(F.count("*").alias("n")))


def _q_transitive_closure(spark, sf_dir):
    from codeontologypython_spark.operators.relational import transitive_closure
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    edges = (cust.select((F.col("c_custkey") + 100000).cast("long").alias("src"),
                         F.col("c_nationkey").cast("long").alias("dst"))
             .unionByName(nation.select(
                 F.col("n_nationkey").cast("long").alias("src"),
                 (F.col("n_regionkey") + 1000).cast("long").alias("dst"))))
    return transitive_closure(edges)


def _q_sessionize(spark, sf_dir):
    """Sessionization: per-user event stream split at inactivity gaps > 1800s
    (lag + conditional cumsum — the batch form of a session window; the
    streaming form is applyInPandasWithState over the same key)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact integers: DuckDB's epoch() is a rounding DOUBLE
    # while a Spark long cast truncates — epoch_us/unix_micros agree exactly
    tsl = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = tsl - F.lag(tsl).over(w)
    with_flag = ev.select(
        "user_id", "event_id", tsl.alias("tsl"),
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1)
        .otherwise(0).alias("new_sess"))
    w2 = (Window.partitionBy("user_id").orderBy("tsl", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0))
    sess = with_flag.withColumn("session_id", F.sum("new_sess").over(w2))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 (F.max("tsl") - F.min("tsl")).alias("duration_us")))


def _q_event_chain(spark, sf_dir):
    """P10's statement-chain window as a relational query: per-user event
    sequence position + next-event link (row_number + lead)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("user_id", "event_id",
                      F.row_number().over(w).alias("pos"),
                      F.lead("event_id").over(w).alias("next_event_id")))


# --------------------------------------------------------------------------
# training-data pipeline operators over documents / embeddings
# --------------------------------------------------------------------------

def _q_dedup_exact(spark, sf_dir):
    from codeontologypython_spark.functions.dedup import exact_dedup
    docs = _t(spark, sf_dir, "documents")
    return (exact_dedup(docs)
            .select("doc_id", "content_md5", "dup_count"))


def _q_token_stats(spark, sf_dir):
    from codeontologypython_spark.functions import textops as tx
    docs = _t(spark, sf_dir, "documents")
    toks = tx.tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda a, x: a + F.length(x).cast("long")).alias("total_token_len"),
        F.size(F.filter(toks, lambda x: F.lower(x).isin(STOPWORDS)))
        .alias("stopword_hits"),
        tx.punct_count(F.col("text")).alias("punct_chars"),
        tx.quality_score(F.col("text")).alias("quality_score"))


def _q_lang_id(spark, sf_dir):
    from codeontologypython_spark.functions.textops import lang_id
    docs = _t(spark, sf_dir, "documents")
    return (docs.select(lang_id(F.col("text")).alias("pred_lang"))
            .groupBy("pred_lang").agg(F.count("*").alias("n_docs")))


def _q_fingerprint(spark, sf_dir):
    from codeontologypython_spark.functions.textops import doc_fingerprint
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id",
                       doc_fingerprint(F.col("text")).alias("fingerprint"))


def _q_bpe_token_stats(spark, sf_dir):
    """BPE-ish tokenizer stats (GPT-2-style pre-tokenizer regex, the brief's
    'token counting: whitespace + a BPE-ish regex'); expression-only."""
    from codeontologypython_spark.functions.textops import (
        bpe_token_count, bytes_per_token, token_count)
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        bytes_per_token(F.col("text")).alias("bytes_per_token"))


def _q_ngram_jaccard(spark, sf_dir):
    from codeontologypython_spark.functions.dedup import ngram_jaccard_pairs
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.2)


def _q_minhash_signature(spark, sf_dir):
    from codeontologypython_spark.functions.dedup import minhash_signature
    docs = _t(spark, sf_dir, "documents")
    return minhash_signature(docs)


def _q_minhash_lsh(spark, sf_dir):
    from codeontologypython_spark.functions.dedup import minhash_lsh_pairs
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.25)


def _q_knn_cosine(spark, sf_dir):
    from codeontologypython_spark.functions.similarity import cosine_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=5)


def _q_ivf_ann(spark, sf_dir):
    """IVF ANN: deterministic mini-k-means coarse quantizer + nprobe cell
    probing (the inverted-file alternative to sign-LSH; brief: 'an IVF or
    LSH-bucketed variant as the scale path'). The oracle reproduces the SAME
    two Lloyd iterations in SQL (rounded centroid means make the floating-
    point trajectory engine-portable)."""
    from codeontologypython_spark.functions.similarity import ivf_ann_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_ann_topk(emb, queries, k=5, n_cells=8, iters=2, nprobe=2)


def _q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket self-join +
    exact cosine confirm (the 100TB-path shape — never all-pairs)."""
    from codeontologypython_spark.functions.similarity import (
        embedding_near_dup_pairs)
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.2, dim=64, n_planes=4,
                                    seed=7)


def _q_simhash_pairs(spark, sf_dir):
    from codeontologypython_spark.functions.dedup import simhash_near_dup_pairs
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_near_dup_pairs(docs, min_equal_chunks=3)


def _q_lsh_ann(spark, sf_dir):
    from codeontologypython_spark.functions.similarity import lsh_ann_topk
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_ann_topk(emb, queries, k=5, dim=64, n_planes=4)


# --------------------------------------------------------------------------
# KG pipeline queries (fixture corpus; rows-only driver check)
# --------------------------------------------------------------------------

_KG_CACHE: dict[int, DataFrame] = {}


def _kg_triples(spark: SparkSession) -> DataFrame:
    key = id(spark)
    if key not in _KG_CACHE:
        from codeontologypython_spark.corpus.fixtures import source_files_df
        from codeontologypython_spark.operators.canonicalize import canonicalize_stage
        from codeontologypython_spark.operators.extract import (
            extract_stage,
            split_extraction,
        )
        from codeontologypython_spark.operators.linking import link_stage
        src = source_files_df(spark)
        out = extract_stage(src).localCheckpoint()
        entities, triples, mentions, _ = split_extraction(out)
        resolved, extra_entities, triples = link_stage(entities, triples,
                                                       mentions)
        final = canonicalize_stage(entities.unionByName(extra_entities),
                                   triples.unionByName(resolved))
        _KG_CACHE[key] = final.localCheckpoint()
    return _KG_CACHE[key]


def _kg_library_names(spark, sf_dir):
    """The reference README's golden query (README.md:56-64): names of all
    woc:Library individuals."""
    from codeontologypython_spark import woc
    t = _kg_triples(spark)
    libs = t.filter((F.col("pred") == woc.RDF_TYPE)
                    & (F.col("obj") == woc.CLS["Library"])).select("subj")
    names = t.filter(F.col("pred") == woc.DPROP["hasName"])
    return (libs.join(names, "subj")
            .select(F.col("obj").alias("library_name")).distinct())


def _kg_class_star(spark, sf_dir):
    """README.md:95-99 class-star: all properties around each Class node."""
    from codeontologypython_spark import woc
    t = _kg_triples(spark)
    classes = t.filter((F.col("pred") == woc.RDF_TYPE)
                       & (F.col("obj") == woc.CLS["Class"])).select("subj")
    return (classes.join(t, "subj")
            .groupBy("pred").agg(F.count("*").alias("n")))


def _kg_triples_by_predicate(spark, sf_dir):
    t = _kg_triples(spark)
    return t.groupBy("pred").agg(F.count("*").alias("n"))


def _kg_overrides(spark, sf_dir):
    from codeontologypython_spark import woc
    t = _kg_triples(spark)
    return (t.filter(F.col("pred") == woc.PROP["overrides"])
            .select("subj", "obj"))


def _kg_inherited_fields(spark, sf_dir):
    """Inherited fields per class (reference track_fields reverse-MRO +
    super().__init__ chain semantics, tracking.py:785-835): every class
    carries hasField for ancestor-declared fields too — Dog(Animal) lists
    kingdom/limbs/name/_age alongside its own a/b/breed."""
    from codeontologypython_spark import woc
    t = _kg_triples(spark)
    has_field = (t.filter(F.col("pred") == woc.PROP["hasField"])
                 .select(F.col("subj").alias("cls_iri"),
                         F.col("obj").alias("field_iri")))
    names = (t.filter(F.col("pred") == woc.DPROP["hasFullyQualifiedName"])
             .select(F.col("subj").alias("cls_iri"),
                     F.col("obj").alias("class_fqn")))
    fnames = (t.filter(F.col("pred") == woc.DPROP["hasSimpleName"])
              .select(F.col("subj").alias("field_iri"),
                      F.col("obj").alias("field_name")))
    return (has_field.join(names, "cls_iri").join(fnames, "field_iri")
            .select("class_fqn", "field_name").distinct()
            .orderBy("class_fqn", "field_name"))


def _kg_sql_library_listing(spark, sf_dir):
    """SURVEY §2.6: the README's SPARQL demo (README.md:54-93) expressed as
    spark.sql over the triple table — rdf:type filter + property self-join."""
    from codeontologypython_spark import woc
    _kg_triples(spark).createOrReplaceTempView("kg_triples")
    return spark.sql(f"""
        SELECT DISTINCT n.obj AS library_name
        FROM kg_triples t
        JOIN kg_triples n ON t.subj = n.subj
        WHERE t.pred = '{woc.RDF_TYPE}'
          AND t.obj = '{woc.CLS["Library"]}'
          AND n.pred = '{woc.DPROP["hasName"]}'
    """)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_shipping_priority": _q3_shipping_priority,
        "q5_local_supplier_volume": _q5_local_supplier_volume,
        "q_broadcast_join": _q_broadcast_join,
        "q_salted_join": _q_salted_join,
        "q_window_dedup": _q_window_dedup,
        "q_top1_per_group": _q_top1_per_group,
        "q_posexplode": _q_posexplode,
        "q_transitive_closure": _q_transitive_closure,
        "q_event_chain": _q_event_chain,
        "q_sessionize": _q_sessionize,
        "q_dedup_exact": _q_dedup_exact,
        "q_token_stats": _q_token_stats,
        "q_bpe_token_stats": _q_bpe_token_stats,
        "q_lang_id": _q_lang_id,
        "q_fingerprint": _q_fingerprint,
        "q_ngram_jaccard": _q_ngram_jaccard,
        "q_minhash_signature": _q_minhash_signature,
        "q_minhash_lsh": _q_minhash_lsh,
        "q_knn_cosine": _q_knn_cosine,
        "q_simhash_pairs": _q_simhash_pairs,
        "q_embedding_near_dup": _q_embedding_near_dup,
        "q_ivf_ann": _q_ivf_ann,
        "q_lsh_ann": _q_lsh_ann,
        "kg_library_names": _kg_library_names,
        "kg_sql_library_listing": _kg_sql_library_listing,
        "kg_class_star": _kg_class_star,
        "kg_triples_by_predicate": _kg_triples_by_predicate,
        "kg_overrides": _kg_overrides,
        "kg_inherited_fields": _kg_inherited_fields,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_REV = ("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
        "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) "
        "AS DOUBLE)")

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_SHINGLES = (
    "list_distinct(list_transform(range(1, len({t}) - 1), "
    "i -> array_to_string({t}[i:i+2], ' ')))")


def _mh_expr(k: int) -> str:
    # mirrors dedup.minhash_signature: one md5 base per shingle, affine
    # variants (A_k*base + B_k) mod 2^31-1 (see dedup._MH_A/_MH_B/_MH_P)
    from codeontologypython_spark.functions.dedup import _MH_A, _MH_B, _MH_P
    return (f"list_min(list_transform(bases, "
            f"h -> ({_MH_A[k]} * h + {_MH_B[k]}) % {_MH_P})) AS mh_{k}")


def _simhash_sql() -> str:
    """64-bit majority-vote SimHash (functions/dedup.simhash64) in DuckDB:
    per bit, majority of that bit across the token-md5 halves; word = sum of
    (majority << b). Shifts wrap two's-complement identically in Spark and
    DuckDB, so the 64-bit value (and its 16-bit chunks) are bit-identical."""
    def word(col: str) -> str:
        return " + ".join(
            f"(CASE WHEN 2*list_sum(list_transform({col}, h -> (h >> {b}) & 1))"
            f" > n THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
            for b in range(32))

    # the 64-bit pack (hi << 32) overflows DuckDB's checked BIGINT shift, so
    # compare the four 16-bit chunks straight off the 32-bit halves —
    # bit-identical to Spark's (simhash64 >> 16i) & 0xFFFF because the pack
    # is a pure bit concatenation (no carries)
    eq = " + ".join(
        f"(CASE WHEN a.c{i} = b.c{i} THEN 1 ELSE 0 END)" for i in range(4))
    chunk_join = " OR ".join(f"(a.c{i} = b.c{i})" for i in range(4))
    return f"""
        WITH t AS (SELECT doc_id, list_distinct({_TOKS}) AS toks
                   FROM documents WHERE doc_id < 200),
        parts AS (SELECT doc_id,
                    list_transform(toks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs,
                    list_transform(toks, x -> ('0x' || substr(md5(x), 9, 8))::BIGINT) AS ls,
                    len(toks) AS n
                  FROM t),
        w AS (SELECT doc_id, ({word('hs')}) AS hi, ({word('ls')}) AS lo
              FROM parts),
        c AS (SELECT doc_id,
                     lo & 65535 AS c0, (lo >> 16) & 65535 AS c1,
                     hi & 65535 AS c2, (hi >> 16) & 65535 AS c3
              FROM w),
        scored AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                          ({eq}) AS equal_chunks
                   FROM c a JOIN c b ON a.doc_id < b.doc_id
                                    AND ({chunk_join}))
        SELECT doc_a, doc_b, equal_chunks
        FROM scored WHERE equal_chunks >= 3"""


def oracle_sql() -> dict[str, str]:
    mh_cols = ",\n  ".join(_mh_expr(k) for k in range(8))
    sig_cte = (
        "WITH toks AS (SELECT doc_id AS doc, "
        f"{_TOKS} AS t FROM documents),\n"
        "base AS (SELECT doc, list_transform("
        + _SHINGLES.format(t="t")
        + ", s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS bases\n"
        "  FROM toks WHERE len(t) >= 3),\n"
        "sig AS (SELECT doc,\n  " + mh_cols + "\n"
        "  FROM base)")
    bands = " UNION ALL ".join(
        f"SELECT doc, {b} AS band, mh_{2*b}::VARCHAR || '_' || "
        f"mh_{2*b+1}::VARCHAR AS key FROM sig" for b in range(4))
    est = " + ".join(
        f"CASE WHEN a.mh_{k} = b.mh_{k} THEN 1 ELSE 0 END" for k in range(8))

    cos_expr = (
        "round(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]))"
        " / (sqrt(list_sum(list_transform(qv, x -> x * x)))"
        " * sqrt(list_sum(list_transform(cv, x -> x * x)))), 4)")

    # q_lsh_ann oracle: the hyperplanes are seeded-deterministic literals
    # (similarity._hyperplanes(64, 4, 42)) — embed the SAME constants so the
    # sign-LSH buckets match Spark's bit-for-bit
    from codeontologypython_spark.functions.similarity import _hyperplanes
    _planes = _hyperplanes(64, 4, 42)

    def _plane_dot(vcol: str, plane: list[float]) -> str:
        arr = "[" + ",".join(repr(x) for x in plane) + "]"
        return (f"list_sum(list_transform(range(1, 65), "
                f"i -> {vcol}[i] * ({arr}::DOUBLE[])[i]))")

    _bucket = " + ".join(
        f"(CASE WHEN {_plane_dot('v', p)} > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(_planes))

    _raw_cos = (
        "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * cv[i]))"
        " / (sqrt(list_sum(list_transform(qv, x -> x * x)))"
        " * sqrt(list_sum(list_transform(cv, x -> x * x))))")
    def _ivf_sql(n_cells=8, iters=2, nprobe=2, k=5) -> str:
        """Mini k-means (Lloyd) + IVF probe entirely in SQL, mirroring
        similarity.ivf_ann_topk step for step: same init (smallest ids),
        same (dist, cell) tie order, same rounded centroid means."""
        dist = ("list_sum(list_transform(range(1, 65), "
                "i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))")
        blocks = [
            "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
            f"c0 AS (SELECT vec_id AS cell, v AS cv FROM e "
            f"WHERE vec_id < {n_cells})",
        ]
        prev = "c0"
        for it in range(1, iters + 1):
            blocks += [
                f"a{it} AS (SELECT vec_id, v, cell FROM ("
                f"  SELECT e.vec_id, e.v, c.cell, row_number() OVER ("
                f"    PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn"
                f"  FROM e, {prev} c) WHERE rn = 1)",
                f"u{it} AS (SELECT cell, i, round(avg(v[i]), 6) AS m"
                f"  FROM a{it}, (SELECT unnest(range(1, 65)) AS i)"
                f"  GROUP BY cell, i)",
                f"n{it} AS (SELECT cell, list(m ORDER BY i) AS cv"
                f"  FROM u{it} GROUP BY cell)",
                f"c{it} AS (SELECT * FROM n{it} UNION ALL"
                f"  SELECT cell, cv FROM {prev}"
                f"  WHERE cell NOT IN (SELECT cell FROM n{it}))",
            ]
            prev = f"c{it}"
        blocks += [
            f"idx AS (SELECT vec_id AS neighbor_id, v AS cv2, cell FROM ("
            f"  SELECT e.vec_id, e.v, c.cell, row_number() OVER ("
            f"    PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn"
            f"  FROM e, {prev} c) WHERE rn = 1)",
            f"qp AS (SELECT query_id, qv, cell FROM ("
            f"  SELECT e.vec_id AS query_id, e.v AS qv, c.cell,"
            f"    row_number() OVER ("
            f"    PARTITION BY e.vec_id ORDER BY {dist}, c.cell) AS rn"
            f"  FROM e, {prev} c WHERE e.vec_id < 10) WHERE rn <= {nprobe})",
            "s AS (SELECT query_id, neighbor_id, qv, cv2 AS cv"
            "  FROM qp JOIN idx USING (cell)"
            "  WHERE neighbor_id <> query_id)",
            f"sc AS (SELECT query_id, neighbor_id, {cos_expr} AS cos FROM s)",
        ]
        return ("WITH " + ",\n".join(blocks) + f"""
            SELECT query_id, neighbor_id, cos, rank FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
                AS rank FROM sc) WHERE rank <= {k}""")

    _nd_planes = _hyperplanes(64, 4, 7)
    _nd_bucket = " + ".join(
        f"(CASE WHEN {_plane_dot('v', p)} > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(_nd_planes))
    embedding_near_dup_sql = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        b AS (SELECT vec_id, v, ({_nd_bucket}) AS bucket FROM e),
        p AS (SELECT a.vec_id AS doc_a, b2.vec_id AS doc_b,
                     a.v AS qv, b2.v AS cv
              FROM b a JOIN b b2 ON a.bucket = b2.bucket
                                AND a.vec_id < b2.vec_id),
        s AS (SELECT doc_a, doc_b, {_raw_cos} AS rawcos FROM p)
        SELECT doc_a, doc_b, round(rawcos, 4) AS cos
        FROM s WHERE rawcos >= 0.2"""
    lsh_ann_sql = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        b AS (SELECT vec_id, v, ({_bucket}) AS bucket FROM e),
        qs AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b
               WHERE vec_id < 10),
        s AS (SELECT query_id, b.vec_id AS neighbor_id,
                     qv, b.v AS cv
              FROM qs JOIN b ON qs.bucket = b.bucket
                            AND b.vec_id <> qs.query_id),
        scored AS (SELECT query_id, neighbor_id, {cos_expr} AS cos FROM s)
        SELECT query_id, neighbor_id, cos, rank FROM (
          SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored) WHERE rank <= 5"""

    return {
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
                   {_REV} AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "q3_shipping_priority": f"""
            SELECT l_orderkey, {_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        "q5_local_supplier_volume": f"""
            SELECT n_name, {_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name""",
        "q_broadcast_join": """
            SELECT r_name, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "q_salted_join": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "q_window_dedup": """
            SELECT l_orderkey, l_linenumber, l_partkey
            FROM lineitem
            QUALIFY row_number() OVER (
                PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey) = 1""",
        "q_top1_per_group": """
            SELECT s_nationkey, s_suppkey, s_acctbal
            FROM supplier
            QUALIFY row_number() OVER (
                PARTITION BY s_nationkey
                ORDER BY s_acctbal DESC, s_suppkey) = 1""",
        "q_posexplode": """
            WITH e AS (
              SELECT o_orderkey,
                     unnest(string_split(o_orderpriority, '-')) AS part,
                     generate_subscripts(string_split(o_orderpriority, '-'), 1) AS pos
              FROM orders)
            SELECT part, pos, COUNT(*) AS n FROM e GROUP BY part, pos""",
        "q_transitive_closure": """
            WITH RECURSIVE edges AS (
              SELECT CAST(c_custkey + 100000 AS BIGINT) AS src,
                     CAST(c_nationkey AS BIGINT) AS dst FROM customer
              UNION ALL
              SELECT CAST(n_nationkey AS BIGINT),
                     CAST(n_regionkey + 1000 AS BIGINT) FROM nation),
            paths(src, dst, depth) AS (
              SELECT src, dst, 1 FROM edges
              UNION ALL
              SELECT p.src, e.dst, p.depth + 1
              FROM paths p JOIN edges e ON p.dst = e.src WHERE p.depth < 10)
            SELECT src, dst, MIN(depth) AS depth FROM paths GROUP BY src, dst""",
        "q_event_chain": """
            SELECT user_id, event_id,
                   row_number() OVER w AS pos,
                   lead(event_id) OVER w AS next_event_id
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        "q_sessionize": """
            WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS tsl,
                              CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                                     OR epoch_us(ts)
                                        - lag(epoch_us(ts)) OVER w > 1800000000
                                   THEN 1 ELSE 0 END AS new_sess
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id)),
            s AS (SELECT user_id, event_id, tsl,
                         SUM(new_sess) OVER (
                             PARTITION BY user_id ORDER BY tsl, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
                  FROM g)
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MAX(tsl) - MIN(tsl) AS duration_us
            FROM s GROUP BY user_id, session_id""",
        "q_dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, md5(text) AS content_md5,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY md5(text)""",
        "q_token_stats": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks,
                              length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
                       FROM documents)
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
                     AS total_token_len,
                   len(list_filter(toks, x -> lower(x) IN {_SW_SQL}))
                     AS stopword_hits,
                   punct AS punct_chars,
                   (CASE WHEN len(toks) >= 20 THEN 1 ELSE 0 END
                    + CASE WHEN len(list_filter(toks, x -> lower(x) IN {_SW_SQL}))::DOUBLE
                           / len(toks) < 0.5 THEN 1 ELSE 0 END
                    + CASE WHEN punct > 0 THEN 1 ELSE 0 END) AS quality_score
            FROM t""",
        "q_bpe_token_stats": f"""
            SELECT doc_id,
                   len({_TOKS}) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{{1,3}}|[^A-Za-z0-9\\s]'))
                     AS n_bpe_tokens,
                   length(text)::DOUBLE
                     / len(regexp_extract_all(text,
                       '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{{1,3}}|[^A-Za-z0-9\\s]'))
                     AS bytes_per_token
            FROM documents""",
        "q_lang_id": f"""
            WITH t AS (SELECT {_TOKS} AS toks FROM documents)
            SELECT CASE WHEN len(list_filter(toks, x -> lower(x) IN {_SW_SQL}))::DOUBLE
                             / len(toks) >= 0.05
                        THEN 'en' ELSE 'other' END AS pred_lang,
                   COUNT(*) AS n_docs
            FROM t GROUP BY 1""",
        "q_fingerprint": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents)
            SELECT doc_id,
                   list_min(list_transform({_SHINGLES.format(t='t')},
                                           s -> md5(s))) AS fingerprint
            FROM t""",
        "q_ngram_jaccard": f"""
            WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh_all AS (SELECT doc_id,
                              unnest({_SHINGLES.format(t='t')}) AS shingle
                       FROM toks),
            -- stop-shingle cap mirrors ngram_jaccard_pairs(max_shingle_df)
            sh AS (SELECT * FROM sh_all
                   WHERE shingle IN (SELECT shingle FROM sh_all
                                     GROUP BY shingle
                                     HAVING COUNT(*) <= 500)),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             COUNT(*) AS i
                      FROM sh a JOIN sh b ON a.shingle = b.shingle
                                         AND a.doc_id < b.doc_id
                      GROUP BY a.doc_id, b.doc_id)
            SELECT doc_a, doc_b,
                   i::DOUBLE / (sa.n + sb.n - i) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.2""",
        "q_minhash_signature": sig_cte + "\nSELECT * FROM sig",
        "q_simhash_pairs": _simhash_sql(),
        "q_lsh_ann": lsh_ann_sql,
        "q_embedding_near_dup": embedding_near_dup_sql,
        "q_ivf_ann": _ivf_sql(),
        "q_minhash_lsh": sig_cte + f""",
            bands AS ({bands}),
            cand AS (SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
                     FROM bands x JOIN bands y
                       ON x.band = y.band AND x.key = y.key AND x.doc < y.doc)
            SELECT doc_a, doc_b, ({est})::DOUBLE / 8 AS est_jaccard
            FROM cand
            JOIN sig a ON a.doc = doc_a
            JOIN sig b ON b.doc = doc_b
            WHERE ({est})::DOUBLE / 8 >= 0.25""",
        "q_knn_cosine": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 10),
            p AS (SELECT query_id, qv, e.vec_id AS neighbor_id,
                         e.embedding::DOUBLE[] AS cv
                  FROM q, embeddings e WHERE e.vec_id <> query_id),
            s AS (SELECT query_id, neighbor_id, {cos_expr} AS cos FROM p)
            SELECT query_id, neighbor_id, cos, rank FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rank
              FROM s) WHERE rank <= 5""",
    }
