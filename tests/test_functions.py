"""Tests for the training-data-pipeline operators (dedup, similarity, text
analysis, multimodal plumbing)."""

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s", 43),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en", "s", 43),  # near dup
        (3, "completely different text with no overlap at all here", "en", "s", 54),
        (4, "zz", "en", "s", 2),  # shorter than one shingle
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]).cache()


def test_exact_dedup(docs):
    from codeontologypython_spark.functions.dedup import exact_dedup
    out = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2          # doc 1 collapsed into doc 0
    assert 1 not in out
    assert out[3] == 1


def test_ngram_jaccard(docs):
    from codeontologypython_spark.functions.dedup import ngram_jaccard_pairs
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs  # no shared shingles at all


def test_minhash_vs_pure_python(docs):
    """MinHash signature equals an independent pure-Python implementation."""
    from codeontologypython_spark.functions.dedup import minhash_signature

    def py_minhash(text, k):
        from codeontologypython_spark.functions.dedup import (
            _MH_A, _MH_B, _MH_P)
        toks = [t for t in text.split() if t]
        shingles = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        bases = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                 for s in shingles]
        return min((_MH_A[k] * b + _MH_B[k]) % _MH_P for b in bases)

    rows = {r["doc"]: r for r in minhash_signature(docs).collect()}
    assert 4 not in rows  # too short for a shingle
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc, r in rows.items():
        for k in range(8):
            assert r[f"mh_{k}"] == py_minhash(texts[doc], k)


def test_minhash_lsh_finds_near_dups(docs):
    from codeontologypython_spark.functions.dedup import minhash_lsh_pairs
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) not in pairs


def test_simhash_properties(docs, spark):
    from codeontologypython_spark.functions.dedup import (
        simhash64,
        simhash_near_dup_pairs,
    )
    vals = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", simhash64(F.col("text")).alias("sh")).collect()}
    assert vals[0] == vals[1]           # identical text -> identical simhash
    assert vals[0] != vals[3]
    assert all(0 <= v < 2 ** 64 for v in vals.values())
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             simhash_near_dup_pairs(docs, min_equal_chunks=4).collect()}
    assert (0, 1) in pairs


def test_cosine_topk_exact(spark):
    from codeontologypython_spark.functions.similarity import cosine_topk
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [1.0, 0.05])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]) \
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in
           out.orderBy("rank").collect()]
    assert got == [(3, 1), (1, 2)]


def test_lsh_ann_recall_vs_bruteforce(spark, tmp_path):
    from codeontologypython_spark.functions.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=5)
    approx = lsh_ann_topk(emb, q, k=5, dim=64, n_planes=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.2  # few planes + random vectors: sanity floor
    # every approx hit must be a true neighbor of its bucket (cos computed
    # exactly), and ranks are contiguous
    assert all(r["rank"] >= 1 for r in approx.collect())


def test_text_quality_and_lang(spark, docs):
    from codeontologypython_spark.functions import textops as tx
    out = docs.select(
        "doc_id",
        tx.token_count(F.col("text")).alias("n"),
        tx.stopword_ratio(F.col("text")).alias("sw"),
        tx.lang_id(F.col("text")).alias("lang")).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[0]["n"] == 9
    assert rows[0]["sw"] == pytest.approx(2 / 9)
    assert rows[0]["lang"] == "en"
    assert rows[4]["lang"] == "other"


def test_doc_fingerprint_stability(docs):
    from codeontologypython_spark.functions.textops import doc_fingerprint
    out1 = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out1[0] == out1[1]
    assert out1[0] != out1[3]
    assert out1[4] is None  # no shingles -> null fingerprint


def test_multimodal_plumbing(spark):
    from codeontologypython_spark.functions.multimodal import (
        decode_and_featurize,
        frame_sample_plan,
        synthetic_media_df,
    )
    media = synthetic_media_df(spark, 12)
    feats = decode_and_featurize(media, fake=True).collect()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["n_bytes"] == 128
    assert len(by_id[0]["feature"]) == 8
    # deterministic: same payload -> same feature
    feats2 = decode_and_featurize(media, fake=True).collect()
    assert {r["media_id"]: r["feature"] for r in feats2} == \
           {r["media_id"]: r["feature"] for r in feats}
    # real path on opaque payloads: warn-and-skip rows, never job failure
    real_on_fake = decode_and_featurize(media, fake=False).collect()
    assert all(r["status"] == "unsupported" and r["feature"] is None
               for r in real_on_fake)
    plan = frame_sample_plan(media, every_ms=2000)
    vids = media.filter(F.col("kind") == "video").count()
    assert plan.count() >= vids


def test_multimodal_real_decode(spark):
    """Genuine decodes via the pure-stdlib PNG and WAV codecs (Pillow/
    soundfile probed first when importable)."""
    from codeontologypython_spark.functions.multimodal import (
        decode_and_featurize,
        decode_png,
        encode_png_gray,
        synthetic_media_df,
    )
    # codec roundtrip: encode -> decode recovers the pixels
    pixels = [[(x * 7 + y) % 256 for x in range(9)] for y in range(5)]
    w, h, flat = decode_png(encode_png_gray(pixels))
    assert (w, h) == (9, 5)
    assert flat == [p for row in pixels for p in row]

    media = synthetic_media_df(spark, 12, real=True)
    feats = {r["media_id"]: r for r in
             decode_and_featurize(media, fake=False).collect()}
    img = [r for r in feats.values() if r["kind"] == "image"]
    aud = [r for r in feats.values() if r["kind"] == "audio"]
    vid = [r for r in feats.values() if r["kind"] == "video"]
    assert img and all(r["status"] in ("builtin-png", "pil") for r in img)
    assert all(len(r["feature"]) == 8 for r in img)
    assert aud and all(r["status"] in ("builtin-wav", "soundfile")
                       for r in aud)
    assert all(r["feature"] is not None for r in aud)
    # video: PyAV when importable (first-frame feature), honest unsupported
    # rows otherwise (the synthetic payloads are fake containers, so with a
    # real PyAV they decode-fail into error:* — never silently succeed)
    try:
        import av  # type: ignore # noqa: F401
        assert vid and all(r["status"].startswith(("pyav", "error:"))
                           for r in vid)
    except ImportError:
        assert vid and all(r["status"] == "unsupported" for r in vid)
    # determinism
    feats2 = {r["media_id"]: r["feature"] for r in
              decode_and_featurize(media, fake=False).collect()}
    assert feats2 == {k: r["feature"] for k, r in feats.items()}


def test_bpe_ish_tokenizer(spark):
    """GPT-2-style pre-tokenizer subset: contractions split, digit runs
    capped at 3, punctuation separate — counts diverge from whitespace on
    code-like text (the point of the second counter)."""
    from codeontologypython_spark.functions.textops import (
        bpe_token_count, bpe_tokens_col, token_count)
    df = spark.createDataFrame(
        [(1, "it's 12345 f(x)=y!")], ["doc_id", "text"])
    row = df.select(
        bpe_tokens_col(F.col("text")).alias("toks"),
        bpe_token_count(F.col("text")).alias("n_bpe"),
        token_count(F.col("text")).alias("n_ws")).collect()[0]
    assert row["toks"] == ["it", "'s", "123", "45",
                           "f", "(", "x", ")", "=", "y", "!"]
    assert row["n_bpe"] == 11
    assert row["n_ws"] == 3


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF: deterministic mini-k-means cells + nprobe probing; recall against
    exact top-k, exact cosine within probed cells, deterministic across
    runs (seeded by smallest-id init)."""
    from codeontologypython_spark.functions.similarity import (
        cosine_topk,
        ivf_ann_topk,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=5)
    approx = ivf_ann_topk(emb, q, k=5, n_cells=8, iters=2, nprobe=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a1 = approx.collect()
    a = {(r["query_id"], r["neighbor_id"]) for r in a1}
    assert len(e & a) / len(e) >= 0.2  # coarse cells, random vectors
    a2 = {(r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
          for r in ivf_ann_topk(emb, q, k=5, n_cells=8, iters=2,
                                nprobe=2).collect()}
    assert a2 == {(r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
                  for r in a1}


def test_bucketed_ann_index_prunes_partitions(spark, tmp_path):
    """The on-disk LSH index probe must (a) equal the in-memory lsh_ann_topk
    results and (b) show partition pruning in the physical plan (the scan
    reads only the probed buckets)."""
    from codeontologypython_spark.functions.similarity import (
        lsh_ann_topk,
        probe_ann_index,
        write_ann_index,
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ann_index")
    write_ann_index(emb, path, dim=64, n_planes=4)

    q = emb.filter(F.col("vec_id") < 5)
    got = probe_ann_index(spark, path, q, k=5, dim=64, n_planes=4)
    ref = lsh_ann_topk(emb, q, k=5, dim=64, n_planes=4)
    cols = ["query_id", "neighbor_id", "cos", "rank"]
    assert (got.select(cols).exceptAll(ref.select(cols)).count()
            + ref.select(cols).exceptAll(got.select(cols)).count()) == 0

    plan = got._jdf.queryExecution().executedPlan().toString()
    # the index scan must carry a non-empty partition filter on bucket
    assert "PartitionFilters: [bucket" in plan

    # large-|Q| path: the bucket JOIN form (no driver collect of the probe
    # set; DPP prunes on a cluster) must give identical results, and "auto"
    # must select it above the collect threshold
    joined = probe_ann_index(spark, path, q, k=5, dim=64, n_planes=4,
                             prune_strategy="join")
    assert (joined.select(cols).exceptAll(got.select(cols)).count()
            + got.select(cols).exceptAll(joined.select(cols)).count()) == 0
    auto_big = probe_ann_index(spark, path, q, k=5, dim=64, n_planes=4,
                               prune_strategy="auto", collect_threshold=2)
    aplan = auto_big._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" not in aplan  # join form chosen
    assert (auto_big.select(cols).exceptAll(got.select(cols)).count()
            + got.select(cols).exceptAll(auto_big.select(cols)).count()) == 0


def test_netpbm_whitespace_first_pixel():
    """Regression (ADVICE r2): the netpbm header ends at EXACTLY ONE
    whitespace byte — raster data whose first byte is ASCII whitespace
    (0x20, 0x09-0x0D) must not be eaten by a whitespace-run split."""
    from codeontologypython_spark.functions.multimodal import decode_netpbm
    w, h = 3, 2
    # first pixel 0x20 (space), second 0x0A (newline) — the adversarial case
    pix = [0x20, 0x0A, 0x7F, 0x00, 0xFF, 0x09]
    data = b"P5 %d %d 255\n" % (w, h) + bytes(pix)
    gw, gh, got = decode_netpbm(data)
    assert (gw, gh) == (w, h)
    assert got == pix
    # P6 RGB with whitespace-valued leading channel bytes
    rgb = bytes([0x20, 0x20, 0x20, 0x0A, 0x0A, 0x0A] * w * h)[: 3 * w * h]
    data6 = b"P6\n%d %d\n255\n" % (w, h) + rgb
    gw6, gh6, got6 = decode_netpbm(data6)
    assert (gw6, gh6) == (w, h)
    assert got6[0] == 0x20 and got6[1] == 0x0A


def test_near_dup_clusters_and_corpus(spark):
    """Connected components over pair graphs: chains collapse to the min id,
    separate components stay separate, singletons keep themselves; the
    deduplicated corpus keeps exactly one representative per cluster."""
    from codeontologypython_spark.functions.dedup import (
        dedup_corpus,
        near_dup_clusters,
    )
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string")
    # components: {0,1,2,3} via chain 0-1,1-2,2-3; {5,6}; singletons 4,7
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long")
    got = {(r["doc_id"], r["cluster_id"])
           for r in near_dup_clusters(docs, pairs).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0), (4, 4),
                   (5, 5), (6, 5), (7, 7)}
    kept = sorted(r["doc_id"] for r in dedup_corpus(docs, pairs).collect())
    assert kept == [0, 4, 5, 7]


def test_iterative_loops_parquet_checkpoint_mode(spark, tmp_path):
    """checkpoint_dir mode: the iterative-loop helpers swap their per-round
    localCheckpoint (executor-local, non-replicated) for reliable parquet
    barriers — the cluster-scale substitution the loop docstrings promise.
    Results must be identical in both modes, and the barrier files must
    actually land on disk (proving the mode engaged)."""
    import os

    from codeontologypython_spark.functions.dedup import near_dup_clusters
    from codeontologypython_spark.operators.linking import chase_aliases
    from codeontologypython_spark.operators.relational import (
        transitive_closure,
    )

    # transitive closure: 0->1->2->3 chain
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long")
    d1 = str(tmp_path / "tc")
    base = {(r["src"], r["dst"], r["depth"])
            for r in transitive_closure(edges).collect()}
    ckpt = {(r["src"], r["dst"], r["depth"])
            for r in transitive_closure(edges, checkpoint_dir=d1).collect()}
    assert base == ckpt and (0, 3, 3) in ckpt
    assert any(n.startswith("tc_round_") for n in os.listdir(d1))

    # connected components: chain + singleton
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(5)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    d2 = str(tmp_path / "cc")
    base = {(r["doc_id"], r["cluster_id"])
            for r in near_dup_clusters(docs, pairs).collect()}
    ckpt = {(r["doc_id"], r["cluster_id"])
            for r in near_dup_clusters(docs, pairs,
                                       checkpoint_dir=d2).collect()}
    assert base == ckpt
    assert any(n.startswith("cc_round_") for n in os.listdir(d2))

    # alias chase: two-hop alias chain flattens in both modes
    symtab = spark.createDataFrame(
        [("m.target", "E1", "Class", "r", False)],
        "fqn string, eid string, kind string, repo string, via_alias boolean")
    mentions = spark.createDataFrame(
        [("r", "a.one", "alias", ["m.target"]),
         ("r", "a.two", "alias", ["a.one"])],
        "repo string, subj string, kind string, candidates array<string>")
    d3 = str(tmp_path / "al")
    base = {(r["fqn"], r["eid"], r["via_alias"])
            for r in chase_aliases(symtab, mentions).collect()}
    ckpt = {(r["fqn"], r["eid"], r["via_alias"])
            for r in chase_aliases(symtab, mentions,
                                   checkpoint_dir=d3).collect()}
    assert base == ckpt and ("a.two", "E1", True) in ckpt
    assert any(n.startswith("alias_round_") for n in os.listdir(d3))


def test_repetition_ratio(spark):
    from codeontologypython_spark.functions.textops import repetition_ratio
    rows = [(0, "a b c a b c a b c"),      # "a b c" style repeats
            (1, "w x y z q r s t"),        # all shingles distinct
            (2, "zz")]                     # too short -> null
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["rr"] for r in df.select(
        "doc_id", repetition_ratio(F.col("text")).alias("rr")).collect()}
    # doc 0: 7 shingles, 3 distinct -> 1 - 3/7
    assert got[0] == pytest.approx(1 - 3 / 7)
    assert got[1] == 0.0
    assert got[2] is None


def test_decontaminate(spark):
    from codeontologypython_spark.functions.dedup import decontaminate
    corpus = spark.createDataFrame(
        [(0, "the exam question about spark shuffles appears here today"),
         (1, "totally unrelated text with zero overlap whatsoever present"),
         (2, "the exam question about nothing")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "the exam question about spark shuffles")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_shared_shingles"]
           for r in decontaminate(corpus, bench, min_shared=3).collect()}
    assert got[0] == 4          # 4 shared 3-gram shingles
    assert 1 not in got         # clean doc untouched
    assert 2 not in got         # 2 shared shingles < min_shared=3


def test_redact_pii(spark):
    from codeontologypython_spark.functions.redact import pii_counts, redact_pii
    rows = [(0, "mail bob.smith+x@corp.example.org or call +14155551234 now"),
            (1, "server at 192.168.0.1 and 10.0.255.7 port 8080"),
            (2, "fax 415-555-0199 reaches the office"),
            (3, "no pii here at all")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = pii_counts(F.col("text"))
    got = {r["doc_id"]: r for r in df.select(
        "doc_id", redact_pii(F.col("text")).alias("red"),
        *[c.alias(n) for n, c in cols.items()]).collect()}
    assert got[0]["red"] == "mail [EMAIL] or call [PHONE] now"
    assert (got[0]["n_emails"], got[0]["n_phones"]) == (1, 1)
    assert got[1]["red"] == "server at [IP] and [IP] port 8080"
    assert got[1]["n_ips"] == 2
    assert got[2]["red"] == "fax [PHONE] reaches the office"
    assert got[3]["red"] == "no pii here at all"
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (0, 0, 0)


def test_hash_sample_deterministic(spark):
    from codeontologypython_spark.functions.sampling import hash_sample
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect())
    assert a == b                          # bit-reproducible
    assert 0.25 < len(a) / 2000 < 0.35     # ~fraction of rows kept
    # monotone: a smaller fraction keeps a subset of a larger one
    c = set(r["doc_id"] for r in hash_sample(df, "doc_id", 0.1).collect())
    assert c <= set(a)


def test_weighted_and_token_budget_sample(spark):
    from codeontologypython_spark.functions.sampling import (
        token_budget_fractions, token_budget_sample, weighted_sample)
    rows = [(i, "w " * (10 if i % 2 == 0 else 40) + "end",
             "small" if i % 2 == 0 else "big") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = spark.createDataFrame([("small", 1.0), ("big", 0.0)],
                              "source string, fraction double")
    kept = weighted_sample(df, w).collect()
    assert kept and all(r["source"] == "small" for r in kept)
    # token budget: "small" docs are 11 tokens, "big" 41; 200 docs each
    fr = {r["source"]: r["fraction"]
          for r in token_budget_fractions(df, 1100.0).collect()}
    assert fr["small"] == pytest.approx(1100 / (200 * 11))
    assert fr["big"] == pytest.approx(1100 / (200 * 41))
    out = token_budget_sample(df, 1100.0)
    tok = (out.groupBy("source")
           .agg(F.sum(F.size(F.split("text", r"\s+"))).alias("t")).collect())
    for r in tok:  # expected kept tokens ~ budget per source (loose: n=200)
        assert 300 < r["t"] < 2400


def test_span_dedup_chunks_and_paragraphs(spark):
    from codeontologypython_spark.functions.spandedup import (
        paragraphs_col, span_dedup, token_chunks_col)
    rows = [(0, "a b c d e f"),        # chunks: "a b c", "d e f"
            (1, "a b c x y z"),        # first chunk dup of doc 0
            (2, "a b c d e f"),        # fully duplicated -> empty
            (3, "")]                   # no tokens -> no spans
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup(
        df, token_chunks_col(F.col("text"), 3)).collect()}
    assert got[0]["text_clean"] == "a b c d e f"
    assert (got[1]["text_clean"], got[1]["n_removed"]) == ("x y z", 1)
    assert (got[2]["text_clean"], got[2]["n_kept"], got[2]["n_removed"]) \
        == ("", 0, 2)
    assert (got[3]["text_clean"], got[3]["n_removed"]) == ("", 0)

    pdf = spark.createDataFrame(
        [(0, "intro\n\nbody text\n\noutro"), (1, "body text\n\nfresh end")],
        "doc_id long, text string")
    pg = {r["doc_id"]: r for r in span_dedup(
        pdf, paragraphs_col(F.col("text")), join_sep="\n\n").collect()}
    assert pg[0]["text_clean"] == "intro\n\nbody text\n\noutro"
    assert pg[1]["text_clean"] == "fresh end"
    assert pg[1]["n_removed"] == 1


def test_pack_sequences(spark):
    from codeontologypython_spark.functions.packing import pack_sequences
    rows = [(i, "w " * (i % 7 + 4)) for i in range(60)]  # 4..10 tokens + tail
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, ctx_len=16, n_buckets=2).collect()
    assert len(out) == 60
    by_bucket = {}
    for r in sorted(out, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1}
    for rows_b in by_bucket.values():
        start = 0
        for r in rows_b:  # greedy stream semantics within each bucket
            assert r["seq_id"] == start // 16
            assert r["offset"] == start % 16
            start += r["n_tokens"]
    # deterministic: same assignment on re-run
    again = pack_sequences(df, ctx_len=16, n_buckets=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curate_end_to_end(spark):
    from codeontologypython_spark.functions.curation import curate
    good = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away to find a quiet place to rest.")
    good2 = ("a small red bird sits on the high branch and sings a soft "
             "song in the morning light for everyone.")
    leaked = ("we review the exam question about spark shuffles and then we "
              "talk for a long while about the answer key.")
    docs = spark.createDataFrame(
        [(0, good, "s"), (1, good, "s"), (2, good2, "s"),
         (3, "x y z", "s"), (4, leaked, "s")],
        "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(100, "the exam question about spark shuffles")],
        "doc_id long, text string")
    weights = spark.createDataFrame([("s", 1.0)],
                                    "source string, fraction double")
    out, audit = curate(docs, benchmark=bench, weights=weights)
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 2]
    assert audit.counts() == {"input": 5, "quality_gate": 4,
                              "exact_dedup": 3, "decontaminated": 2,
                              "mixed": 2}


def test_curate_counts_single_action(spark):
    """The survivorship audit must ride the ONE materializing action:
    counts() after the action launches zero additional Spark jobs, and the
    observed stages count each row ONCE even though exact dedup and
    decontamination duplicate their input subtree in the physical plan."""
    from codeontologypython_spark.functions.curation import curate
    long_doc = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away to find a quiet place to rest today.")
    docs = spark.createDataFrame(
        [(i, long_doc + f" tail {i % 7}", "s") for i in range(40)],
        "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(100, "no such phrase anywhere at all here")],
        "doc_id long, text string")
    out, audit = curate(docs, benchmark=bench)
    n = out.count()
    st = spark.sparkContext.statusTracker()
    jobs_before = len(st.getJobIdsForGroup(None) or [])
    counts = audit.counts()
    assert len(st.getJobIdsForGroup(None) or []) == jobs_before
    # 40 inputs, all pass quality, 7 distinct texts survive dedup, none
    # contaminated — double-fire through the duplicated dedup/decontaminate
    # subtrees would report 80/14 here
    assert counts == {"input": 40, "quality_gate": 40,
                      "exact_dedup": 7, "decontaminated": 7}
    assert n == 7


def test_normalize_text(spark):
    from codeontologypython_spark.functions.textops import normalize_text
    rows = [(0, "  a\x01b\t\tc   d \x7f "),
            (1, "one\n\n\n\n\ntwo"),
            (2, "clean text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", normalize_text(F.col("text")).alias("n")).collect()}
    assert got[0] == "ab c d"           # ctrl stripped, runs collapsed, trim
    assert got[1] == "one\n\ntwo"       # blank-line run capped
    assert got[2] == "clean text"


def test_span_dedup_randomized_vs_pure_python(spark):
    """200 seeded random word-soup docs: Spark span_dedup must agree with a
    direct pure-Python first-occurrence fold on every field."""
    import random

    from codeontologypython_spark.functions.spandedup import (span_dedup,
                                                              token_chunks_col)
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 25))))
            for i in range(200)]

    def chunks(text, w=3):
        toks = [t for t in text.split() if t]
        return [" ".join(toks[i:i + w]) for i in range(0, len(toks), w)]

    seen, expected = set(), {}
    for did, text in docs:                      # doc_id order == first-seen
        kept = []
        n_spans = 0
        for sp in chunks(text):
            n_spans += 1
            if sp not in seen:
                seen.add(sp)
                kept.append(sp)
        expected[did] = (" ".join(kept), len(kept), n_spans - len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = span_dedup(df, token_chunks_col(F.col("text"), 3)).collect()
    assert len(out) == 200
    for r in out:
        assert (r["text_clean"], r["n_kept"], r["n_removed"]) \
            == expected[r["doc_id"]], r["doc_id"]


def test_unigram_logprob(spark):
    import math

    from codeontologypython_spark.functions.lm import (unigram_doc_scores,
                                                       unigram_model)
    # corpus: 4x "a", 2x "b", 2x "c" -> p(a)=1/2, p(b)=p(c)=1/4
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a a b c"), (2, "c"), (3, "")],
        "doc_id long, text string")
    model = {r["word"]: r["logp_micro"]
             for r in unigram_model(df).collect()}
    assert model["a"] == round(math.log(0.5) * 1e8)
    assert model["b"] == model["c"] == round(math.log(0.25) * 1e8)
    got = {r["doc_id"]: r for r in unigram_doc_scores(df).collect()}
    exp0 = round((2 * model["a"] + model["b"]) / 3 / 1e8, 4)
    assert got[0]["avg_logprob"] == exp0
    assert got[2]["avg_logprob"] == round(model["c"] / 1e8, 4)
    assert got[3]["n_scored_tokens"] == 0
    assert got[3]["avg_logprob"] is None
    # scoring a different corpus against this model: joins drop OOV words
    other = spark.createDataFrame([(9, "a zzz")], "doc_id long, text string")
    [r] = unigram_doc_scores(other, model=unigram_model(df)).collect()
    assert r["n_scored_tokens"] == 1           # zzz is OOV, not scored
    assert r["avg_logprob"] == round(model["a"] / 1e8, 4)
    # ... or charge OOV tokens the KenLM-style fixed penalty (ln(1/total))
    oov = round(math.log(1 / 8) * 1e8)
    [r2] = unigram_doc_scores(other, model=unigram_model(df),
                              oov_logp_micro=oov).collect()
    assert r2["n_scored_tokens"] == 2          # zzz now counted
    assert r2["avg_logprob"] == round((model["a"] + oov) / 2 / 1e8, 4)


def _live_plan(df):
    """Physical-plan tree with cached-relation INTERNALS stripped: an
    InMemoryRelation node prints the plan that originally built the cache,
    which never re-executes — only operators outside it do. Dropping the
    deeper-indented lines under each InMemoryRelation leaves exactly the
    live operators."""
    full = df._jdf.queryExecution().executedPlan().toString()
    out, skip_indent = [], None
    for line in full.splitlines():
        indent = len(line) - len(line.lstrip(" +-*:"))
        if skip_indent is not None:
            if indent > skip_indent or not line.strip():
                continue
            skip_indent = None
        out.append(line)
        if "InMemoryRelation" in line:
            skip_indent = indent
    return "\n".join(out)


def test_unigram_model_single_corpus_pass(spark):
    """VERDICT r4 #3: the token total folds into the vocab aggregation —
    the model's consumers read the persisted vocab cache instead of
    re-running the corpus explode/shuffle."""
    from codeontologypython_spark.functions.lm import (unigram_doc_scores,
                                                       unigram_model)
    df = spark.createDataFrame(
        [(i, "alpha beta gamma " * 3) for i in range(20)],
        "doc_id long, text string")
    model = unigram_model(df)
    plan = _live_plan(model)
    assert "InMemoryTableScan" in plan      # projection over the cache
    assert "Generate" not in plan           # no corpus re-scan (explode)
    # the scoring plan scans the corpus exactly once (the token explode)
    scores = unigram_doc_scores(df, model=model)
    splan = _live_plan(scores)
    assert splan.count("Generate") == 1
    assert "InMemoryTableScan" in splan
    scores.collect()


def test_chunk_documents(spark):
    from codeontologypython_spark.functions.chunking import chunk_documents
    docs = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 25), (3, ""), (4, "c" * 11)],
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_size=10, overlap=2).collect()
    rows = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunks"])
            for r in out}
    # exactly chunk_size -> one whole-doc chunk
    assert rows[(1, 0)] == ("a" * 10, 1)
    # 25 chars, stride 8: windows at 0,8,16 cover it -> 3 chunks
    assert rows[(2, 0)] == ("b" * 10, 3)
    assert rows[(2, 1)] == ("b" * 10, 3)
    assert rows[(2, 2)] == ("b" * 9, 3)   # last window shorter
    # empty doc keeps one empty chunk
    assert rows[(3, 0)] == ("", 1)
    # one char over -> second window overlaps but covers the tail
    assert rows[(4, 0)] == ("c" * 10, 2) and rows[(4, 1)] == ("c" * 3, 2)
    assert len(rows) == 7
    # every character is covered: reassembly equals the source
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=10, overlap=10)
