"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the KG-extraction
throughput job at two parallelism levels (local[8] vs local[32]) as the
sandbox stand-in for the north_rule's N-vs-4N-executor scaling criterion.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "kg": {"files": n, "files_per_sec": fps,
          "scaling": {"cpus_lo": 8, "fps_lo": ..., "cpus_hi": 32,
                      "fps_hi": ..., "efficiency": ...}}}

Budget contract (the round-4 driver artifact was lost to a timeout, so this
is load-bearing): phases run MOST-IMPORTANT-FIRST (headline queries ->
realworld E2E -> extract scaling -> ceilings -> link scaling), a soft
deadline ($SPARK_GRAFT_BUDGET_SEC, default 3300 s) skips remaining phases
rather than overrunning, and a SIGTERM handler prints the partial JSON
before dying — so even a hard driver timeout yields a parseable artifact
with the phases that completed. Every phase runs in its own subprocess
(JVM isolation, see _confined), so reordering cannot leak a phase's JVM
into a later confined level.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_window_dedup",
    "q_transitive_closure",
    "q_event_chain",
    "q_dedup_exact",
    "q_token_stats",
    "q_ngram_jaccard",
    "q_minhash_lsh",
    "q_knn_cosine",
    # round-4 training-pipeline operators (additive keys — earlier-round
    # BENCH files simply lack them)
    "q_pii_redact",
    "q_normalize_text",
    "q_weighted_mix",
    "q_token_budget_mix",
    "q_pack_sequences",
    "q_span_dedup",
]

KG_FILES = int(os.environ.get("SPARK_GRAFT_KG_FILES", "12000"))
KG_UNITS = int(os.environ.get("SPARK_GRAFT_KG_UNITS", "40"))
# the link+canonicalize scaling levels run at THREE corpus sizes per core
# count (tiny / mid / big = 50 / KG_LINK_FILES/4 / KG_LINK_FILES): the tiny
# level reads the serial floor S directly (P≈0 there), and the mid→big delta
# isolates the per-file parallel core cost p_c = Δwall·cores/Δfiles, giving
# the parallel half's scaling efficiency p_lo/p_hi with S factored out — the
# model-fit form of the north rule for the join-heavy half (stage 2/3
# processes ~11k triples per file)
KG_LINK_FILES = int(os.environ.get("SPARK_GRAFT_KG_LINK_FILES", "3200"))
# 2 repeats by default (was 3): the serial-floor and p_efficiency story is
# established across rounds 3-4, so default sampling is sized to fit the
# driver's ~1 h budget with margin; raise for quiet-box deep sampling
KG_REPEATS = int(os.environ.get("SPARK_GRAFT_KG_REPEATS", "2"))
# the 800-file mid link level refines the p_c baseline but is the single
# most expensive optional phase (~7 min at defaults) — off by default, the
# tiny level serves as the delta baseline instead (S cancels either way)
KG_LINK_MID = os.environ.get("SPARK_GRAFT_KG_LINK_MID", "") not in ("", "0")
# soft wall-clock budget: skip remaining phases (rather than overrun) once
# elapsed time crosses this, so the driver's timeout never truncates stdout
BUDGET_SEC = int(os.environ.get("SPARK_GRAFT_BUDGET_SEC", "3300"))


def _noop_write(df):
    df.write.format("noop").mode("overwrite").save()


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    # session warmup: JIT/codegen compilation and parquet footer reads land
    # before q1's timer, not inside it (standard bench hygiene — the first
    # query otherwise pays ~2-4s of one-time session costs)
    from pyspark.sql import functions as F
    for t in ("lineitem", "documents", "embeddings"):
        _noop_write(spark.read.parquet(f"{sf_dir}/{t}.parquet")
                    .limit(1000).groupBy().agg(F.count("*")))
    out = {}
    for name in HEADLINE:
        best = None
        # the three draw-sensitive queries (observed +13-20% swings across
        # rounds on untouched code) get best-of-3; the rest are stable
        # single-shot (their round-to-round spread is within a few percent)
        for _ in range(3 if name in _BEST_OF_3 else 1):
            t0 = time.time()
            _noop_write(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
        out[name] = best
    return out


_BEST_OF_3 = {"q_ngram_jaccard", "q_minhash_lsh", "q_knn_cosine"}


def run_headline(cpus: int, sf_dir: str) -> dict[str, float]:
    """Headline-query session body (runs inside headline_confined's
    subprocess — like every other phase, its JVM must die with its
    process rather than contend with later confined scaling levels)."""
    from codeontologypython_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name="bench-queries")
    queries = time_queries(spark, sf_dir)
    spark.stop()
    return queries


def _run_confined(call_src: str, cpus: int):
    """Evaluate ``bench.<call>`` in a subprocess pinned to ``cpus`` CPUs
    and return its JSON-round-tripped result — the one confinement wrapper
    every phase goes through.

    Why a subprocess ALWAYS (even unconfined full-width levels): a stopped
    SparkContext's JVM lives until its python process exits, holding tens
    of GB and background threads that contend with every later confined
    level (measured: a leftover hi-level JVM tripled the link lo level's
    wall time). A subprocess takes its JVM with it.

    Why taskset: an N-executor cluster gives the engine N cores TOTAL —
    JVM feed threads, GC and Python workers all share them. Unconfined
    local[8] on a 32-core box leaks the idle cores to the JVM side
    (measured: the 8-task-slot run keeps ~16 cores busy), inflating the lo
    baseline and understating scaling efficiency. Falls back to
    unconfined when taskset is unavailable.
    """
    import shutil
    import subprocess

    code = (
        "import sys, json; sys.path.insert(0, %r)\n"
        "import bench\n"
        "print('CONFINED_JSON ' + json.dumps(bench.%s))\n"
        % (os.path.dirname(os.path.abspath(__file__)), call_src))
    cmd = [sys.executable, "-c", code]
    if shutil.which("taskset") is not None and cpus < (os.cpu_count() or cpus):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("CONFINED_JSON"):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(
        f"confined run {call_src!r} failed: {out.stderr[-2000:]}")


def headline_confined(cpus: int, sf_dir: str) -> dict[str, float]:
    return _run_confined(f"run_headline({cpus}, {sf_dir!r})", cpus)


def kg_extract_run(cpus: int, n_files: int = KG_FILES,
                   units: int = KG_UNITS, repeats: int = 2,
                   udf_only: bool = False) -> tuple[int, float]:
    """Fresh session at the given parallelism; time Stage-1 extraction over
    an executor-side-generated synthetic corpus (~units*0.3 KB per file).
    Returns (n_files, best seconds of `repeats` runs).

    udf_only=True consumes the extraction output inside the Python workers
    (no Arrow egress): this isolates the part of the job that scales with
    executor count on a real cluster. Local mode funnels every worker's
    Arrow stream through ONE shared JVM, an artifact a multi-executor
    cluster does not have (each executor ingests its own workers' output).
    """
    from codeontologypython_spark.corpus.fixtures import synthetic_corpus_df
    from codeontologypython_spark.operators.extract import (
        _extract_record_batches,
        extract_stage,
    )
    from codeontologypython_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"bench-kg-{cpus}")
    # cpus*12 tasks: short tasks balance load and keep per-task Arrow frames
    # small so Python extraction overlaps JVM consumption (measured sweep:
    # x2 at 32 cores vs cpus*6)
    parts = cpus * 12
    src = synthetic_corpus_df(spark, n_files, units=units,
                              partitions=parts).cache()
    src.count()

    def consume(batches):
        import pyarrow as pa
        n = 0
        for b in _extract_record_batches(batches):
            n += b.num_rows
        yield pa.record_batch([pa.array([n], pa.int64())], names=["rows"])

    def run_once(df):
        if udf_only:
            df.mapInArrow(consume, "rows long").collect()
        else:
            _noop_write(extract_stage(df))

    # warmup: a full-width pass over a small corpus so ALL Python workers
    # fork + import before the timed run (limit() would run as one task and
    # leave the other workers cold, poisoning the scaling measurement)
    warm = synthetic_corpus_df(spark, parts, units=2, partitions=parts)
    run_once(warm)
    best = None
    for _ in range(repeats):
        t0 = time.time()
        run_once(src)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return n_files, best


def kg_link_run(cpus: int, n_files: int = KG_LINK_FILES,
                units: int = KG_UNITS, repeats: int = 2) -> tuple[int, float]:
    """Stage-2/3 (link + canonicalize) throughput: materialize Stage-1
    extraction output once (untimed), then time the join-heavy half of the
    pipeline — symtab build, mention resolution rounds, MRO/fields closure,
    IRI canonicalization — to the noop sink. This is where a 100x corpus
    stresses shuffles rather than Python CPU; measured at two confined
    parallelism levels it evidences the north rule for the relational half.

    No separate warmup pass: the untimed extraction already forked the
    workers and warmed the JVM, run 1 compiles the stage's codegen, and
    best-of-``repeats`` absorbs it (unlike the extraction bench, a full
    link pass is too expensive to burn on warmup alone).
    """
    from codeontologypython_spark.corpus.fixtures import synthetic_corpus_df
    from codeontologypython_spark.operators.canonicalize import (
        canonicalize_stage,
    )
    from codeontologypython_spark.operators.extract import (
        extract_stage,
        split_extraction,
    )
    from codeontologypython_spark.operators.linking import link_stage
    from codeontologypython_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"bench-kg-link-{cpus}")
    # extraction wants cpus*12 fine-grained tasks for parse load balance,
    # but the link stage runs ~25 jobs over this checkpoint — at 384 stored
    # partitions each job pays seconds of pure task scheduling. Repartition
    # (untimed setup) down to 2/core, the shape a parquet stage-1 checkpoint
    # would naturally have.
    parts = cpus * 12
    src = synthetic_corpus_df(spark, n_files, units=units, partitions=parts)
    out = (extract_stage(src)
           .repartition(max(cpus * 2, 16)).localCheckpoint())

    # the stage-1 checkpoint must survive repeats; everything persisted AFTER
    # this point is per-run state
    keep_rdds = {r.id() for r in
                 spark.sparkContext._jsc.getPersistentRDDs().values()}

    def run_once():
        entities, triples, mentions, _ = split_extraction(out)
        # contract (run_pipeline does the same): the split views feed many
        # consumers — persist so each is materialized once, not re-filtered
        # from the full extraction stream per use
        entities = entities.persist()
        triples = triples.persist()
        mentions = mentions.persist()
        # plan pinning: force the CORPUS-SCALE strategies (salted symtab
        # join, shuffle IRI rewrite) at every corpus size. The auto gates
        # flip broadcast->shuffle across _AUTO_BROADCAST_MAX_ROWS /
        # _IRI_BROADCAST_MAX_ROWS as the corpus grows, which would compare
        # different physical plans between the scaling model's sizes; the
        # pinned shuffle paths are also what a 10^12-file corpus runs.
        resolved, extra_entities, base = link_stage(entities, triples,
                                                    mentions,
                                                    broadcast_symtab=False,
                                                    salt=16)
        final = canonicalize_stage(entities.unionByName(extra_entities),
                                   base.unionByName(resolved),
                                   broadcast_iris=False)
        _noop_write(final)
        spark.catalog.clearCache()  # drop the stage's persisted barriers
        # clearCache does NOT free localCheckpoint RDDs — without this sweep
        # each repeat leaks its round barriers into executor memory and
        # repeat 3 lands in cache-eviction/GC territory (measured: 31s -> 133s
        # on the third repeat at 800 files / 8 cores)
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            if jrdd.id() not in keep_rdds:
                jrdd.unpersist()

    best = None
    for _ in range(repeats):
        t0 = time.time()
        run_once()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return n_files, best


REALWORLD_GLOB = os.environ.get("SPARK_GRAFT_REALWORLD_GLOB",
                                "/opt/spark/python/pyspark/**/*.py")


def kg_realworld_run(cpus: int) -> dict | None:
    """Full 4-stage pipeline (extract -> link -> canonicalize -> partitioned
    triple table, plans/pipeline.run_pipeline) over REAL code: the installed
    PySpark sources (~1,200 files of production Python). Guards the
    throughput claims against synthetic-corpus overfitting — real files have
    deep class hierarchies, long docstrings, dense imports. Returns
    {files, seconds, files_per_sec, n_triples, n_errors} or None when the
    sources are not installed. The zero-error contract matches
    tests/test_realworld.py (full-corpus: 1,171/1,171 clean)."""
    import glob
    import shutil
    import tempfile

    paths = sorted(glob.glob(REALWORLD_GLOB, recursive=True))
    if not paths:
        return None
    from pyspark.sql import functions as F

    from codeontologypython_spark.plans.pipeline import run_pipeline
    from codeontologypython_spark.schemas import SOURCE_FILES
    from codeontologypython_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"bench-kg-realworld-{cpus}")
    rows = []
    for p in paths:
        try:
            content = open(p, encoding="utf-8").read()
        except (OSError, UnicodeDecodeError):
            continue
        rows.append(("pyspark", p.rsplit("python/", 1)[-1], "c0000001",
                     "python", content))
    src = (spark.createDataFrame(rows, SOURCE_FILES)
           .repartition(cpus * 12).cache())
    src.count()  # input prep (driver-side file reads) stays untimed
    workdir = tempfile.mkdtemp(prefix="bench_rw_")
    try:
        t0 = time.time()
        res = run_pipeline(spark, src, workdir, write_nt=False)
        dt = time.time() - t0
        n_err = (spark.read.parquet(f"{workdir}/stage1_extract")
                 .filter(F.col("rec") == "err").count())
        # query-surface timing on REAL data: the reference README's
        # library-listing SPARQL (README.md:56-64) compiled by plans/sparql
        # over the realworld triple table — the same text jobs/query.py
        # serves from the CLI
        from codeontologypython_spark.plans.sparql import sparql_to_df
        triples = spark.read.parquet(res.triples_path)
        sq = """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT DISTINCT ?n_lib
        WHERE { ?lib rdf:type woc:Library . ?lib woc:hasName ?n_lib . }
        """
        t0 = time.time()
        n_libs = sparql_to_df(triples, sq).count()
        sparql_sec = time.time() - t0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
    return {"files": len(rows), "seconds": round(dt, 1),
            "files_per_sec": round(len(rows) / dt, 1),
            "n_triples": res.n_triples, "n_errors": n_err,
            "sparql_query_sec": round(sparql_sec, 2),
            "sparql_n_libraries": n_libs}


def _confined(fn_name: str, cpus: int, repeats: int,
              udf_only: bool | None = None,
              n_files: int | None = None) -> tuple[int, float]:
    """Run a (n_items, best_seconds) bench fn via _run_confined (see its
    docstring for the subprocess-always + taskset rationale)."""
    kw = {"repeats": repeats}
    if udf_only is not None:
        kw["udf_only"] = udf_only
    if n_files is not None:
        kw["n_files"] = n_files
    kw_src = ", ".join(f"{k}={v!r}" for k, v in kw.items())
    n, t = _run_confined(f"{fn_name}({cpus}, {kw_src})", cpus)
    return int(n), float(t)


def kg_extract_confined(cpus: int, repeats: int = KG_REPEATS,
                        udf_only: bool = False) -> tuple[int, float]:
    return _confined("kg_extract_run", cpus, repeats, udf_only=udf_only)


def kg_link_confined(cpus: int, repeats: int = KG_REPEATS,
                     n_files: int | None = None) -> tuple[int, float]:
    return _confined("kg_link_run", cpus, repeats, n_files=n_files)


def kg_realworld_confined(cpus: int) -> dict | None:
    """kg_realworld_run in its own (taskset-confined) subprocess — same
    JVM-isolation rationale as _run_confined."""
    return _run_confined(f"kg_realworld_run({cpus})", cpus)


def spark_shuffle_ceiling_run(cpus: int) -> float:
    """Canonical Spark shuffle workload — range -> 1KB payloads ->
    repartition -> groupBy/agg over ~16 GB — nothing but built-in JVM
    operators, indisputably scale-correct. Its 8->32 efficiency is what THE
    SAME Spark runtime achieves on this box for shuffle/agg work (one shared
    JVM heap, shared memory bandwidth); the link stage's parallel-half
    efficiency should be read against this ceiling, exactly like
    udf_efficiency reads against workload_ceiling."""
    import time as _t

    from pyspark.sql import functions as F

    from codeontologypython_spark.session import get_spark
    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8),
                      app_name=f"bench-shuffle-ceiling-{cpus}")
    df = (spark.range(0, 16_000_000)
          .select((F.col("id") % 1_600_000).alias("k"),
                  F.concat(F.lit("x"),
                           F.sha2(F.col("id").cast("string"), 256),
                           F.repeat(F.lit("y"), 960)).alias("payload"))
          ).cache()
    df.count()

    def run():
        (df.repartition("k").groupBy("k")
         .agg(F.count("*").alias("c"),
              F.sum(F.length("payload")).alias("b"))
         .write.format("noop").mode("overwrite").save())

    run()  # warm codegen
    best = None
    for _ in range(3):
        t0 = _t.time()
        run()
        dt = _t.time() - t0
        best = dt if best is None else min(best, dt)
    spark.stop()
    return best


def spark_shuffle_ceiling(lo: int = 8, hi: int = 32) -> float:
    """8->32 efficiency of the canonical shuffle job, each level confined in
    its own subprocess (same isolation rules as every other level)."""
    import shutil
    import subprocess

    walls = {}
    for cpus in (lo, hi):
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from bench import spark_shuffle_ceiling_run\n"
            "print('SCRESULT %%f' %% spark_shuffle_ceiling_run(%d))\n"
            % (os.path.dirname(os.path.abspath(__file__)), cpus))
        cmd = [sys.executable, "-c", code]
        if shutil.which("taskset") is not None and cpus < (os.cpu_count() or cpus):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
        for line in out.stdout.splitlines():
            if line.startswith("SCRESULT"):
                walls[cpus] = float(line.split()[1])
        if cpus not in walls:
            raise RuntimeError(f"shuffle ceiling failed: {out.stderr[-1000:]}")
    return (walls[lo] / walls[hi]) / (hi / lo)


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def hw_ceiling(lo: int = 8, hi: int = 32, seconds: float = 2.0) -> float:
    """Hardware scaling ceiling: pure-CPU busy loops at both process counts.
    SMT + shared cache + frequency scaling mean 4x processes never reach 4x
    throughput even with zero software overhead; engine efficiency should be
    read against this ceiling (a real 4N-executor cluster on 4x the NODES has
    ceiling 1.0)."""
    import multiprocessing as mp

    rates = {}
    for n in (lo, hi):
        with mp.Pool(n) as p:
            rates[n] = sum(p.map(_burn, [seconds] * n))
    return (rates[hi] / rates[lo]) / (hi / lo)


def _extract_chunk(rng: tuple) -> int:
    """Pure-Python extraction worker for workload_ceiling (no Spark)."""
    import gc

    gc.disable()
    from codeontologypython_spark.corpus.fixtures import synthetic_module_text
    from codeontologypython_spark.operators.pyfile import extract_file_columnar
    n = 0
    for i in range(*rng):
        fx, _ = extract_file_columnar(
            "r", f"m_{i}.py", "c0", synthetic_module_text(i, KG_UNITS))
        if fx is not None:
            n += 1
    return n


def workload_ceiling(lo: int = 8, hi: int = 32, n_files: int = 3000,
                     repeats: int = 2) -> float:
    """THIS workload's scaling ceiling: the same per-file extraction run by
    plain multiprocessing (no Spark, no Arrow, no JVM), each level pinned to
    its core count, best-of-``repeats`` (single samples on this shared host
    swing 2x). Extraction is allocator/memory-bandwidth heavy, so its
    ceiling sits BELOW the busy-loop hw ceiling (measured ~0.65-0.75 vs 0.85
    on this VM); engine efficiency should be read against this number — it is
    what a zero-overhead engine could achieve on this box."""
    import multiprocessing as mp

    all_cpus = os.sched_getaffinity(0)
    rates = {}
    try:
        for n in (lo, hi):
            os.sched_setaffinity(0, set(range(n)))
            step = max(1, n_files // (n * 12))
            rngs = [(s, min(s + step, n_files))
                    for s in range(0, n_files, step)]
            best = 0.0
            for _ in range(repeats):
                with mp.Pool(n) as p:
                    t0 = time.time()
                    p.map(_extract_chunk, rngs)
                    best = max(best, n_files / (time.time() - t0))
            rates[n] = best
    finally:
        os.sched_setaffinity(0, all_cpus)
    return (rates[hi] / rates[lo]) / (hi / lo)


def _log(msg: str, t0: float) -> None:
    print(f"[bench +{time.time() - t0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import signal

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    t_all = time.time()

    scaling: dict = {}
    results: dict = {
        "metric": "headline_queries_plus_kg_extraction",
        "value": None,
        "unit": "sec",
        "queries": None,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "kg": {"files": None, "files_per_sec": None,
               "scaling": scaling, "realworld": None},
    }
    emitted = {"done": False}

    def emit(partial: bool) -> None:
        if emitted["done"]:
            return
        emitted["done"] = True
        results["value"] = round(time.time() - t_all, 3)
        if partial:
            results["partial"] = True
        print(json.dumps(results), flush=True)

    # a driver-side timeout delivers SIGTERM: print the phases that DID
    # complete as the one JSON line before dying, so the artifact survives.
    # Forked children INHERIT this handler (the ceiling phases' mp.Pool
    # terminates its workers with SIGTERM) — they must die silently, not
    # write their own JSON copy onto the shared stdout
    main_pid = os.getpid()

    def _on_term(signum, frame):
        if os.getpid() != main_pid:
            os._exit(143)
        _log("SIGTERM — emitting partial results", t_all)
        emit(partial=True)
        sys.exit(143)

    signal.signal(signal.SIGTERM, _on_term)

    # a phase that dies (a bad knob combination, an OOM'd subprocess) must
    # not take the artifact with it: log, record, move on — the final JSON
    # carries every phase that DID complete plus the error strings, and a
    # machine-readable list of phases the soft budget skipped (so a
    # budget-truncated artifact can never be mistaken for a complete one)
    phase_errors: dict[str, str] = {}
    skipped: list[str] = []

    def over_budget(name: str) -> bool:
        if time.time() - t_all > BUDGET_SEC:
            _log(f"budget {BUDGET_SEC}s exceeded — skipping {name}", t_all)
            skipped.append(name)
            return True
        return False

    def run_phase(name: str, fn) -> None:
        if over_budget(name):
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — artifact survival
            _log(f"{name} FAILED: {e!r}", t_all)
            phase_errors[name] = repr(e)

    # ---- phase 1: headline queries (the round-over-round comparison the
    # driver contract is built on — ALWAYS first, own subprocess) ----------
    def phase_headline():
        results["queries"] = headline_confined(cpus, sf_dir)
        _log("headline queries done", t_all)

    # ---- phase 2: real-world E2E — full 4-stage pipeline + a timed SPARQL
    # query over the installed PySpark sources (own subprocess) ------------
    def phase_realworld():
        results["kg"]["realworld"] = kg_realworld_confined(32)
        _log(f"realworld done ({results['kg']['realworld']})", t_all)

    # ---- phase 3: extraction scaling — same job, same input, N vs 4N
    # cores, each level PINNED to its core count (kg_extract_confined
    # docstring — an N-executor cluster is N cores total). The sandbox VM
    # shows heavy run-to-run interference (up to 3x at fixed config), so
    # each level reports the best of its repeats (see BASELINE.md). -------
    lo_cpus, hi_cpus = 8, 32
    # the hi level's single run is ~4x cheaper AND noisier (shared-host
    # interference hits short runs harder): one extra repeat evens the
    # sampling time
    hi_repeats = KG_REPEATS + 1

    def phase_extract_scaling():
        n_files, t_lo = kg_extract_confined(lo_cpus, repeats=KG_REPEATS)
        _log(f"extract lo done ({t_lo:.1f}s best)", t_all)
        _, t_hi = kg_extract_confined(hi_cpus, repeats=hi_repeats)
        _log(f"extract hi done ({t_hi:.1f}s best)", t_all)
        fps_lo, fps_hi = n_files / t_lo, n_files / t_hi
        results["kg"]["files"] = n_files
        results["kg"]["files_per_sec"] = round(fps_hi, 1)
        scaling.update({
            "cpus_lo": lo_cpus, "fps_lo": round(fps_lo, 1),
            "cpus_hi": hi_cpus, "fps_hi": round(fps_hi, 1),
            "efficiency": round((fps_hi / fps_lo) / (hi_cpus / lo_cpus), 3),
        })
        # compute-side scaling: excludes the local-mode-only shared-JVM
        # ingest (per-executor on a real cluster), kg_extract_run docstring
        _, u_lo = kg_extract_confined(lo_cpus, repeats=KG_REPEATS,
                                      udf_only=True)
        _log(f"udf lo done ({u_lo:.1f}s best)", t_all)
        _, u_hi = kg_extract_confined(hi_cpus, repeats=hi_repeats,
                                      udf_only=True)
        _log(f"udf hi done ({u_hi:.1f}s best)", t_all)
        udf_eff = ((n_files / u_hi) / (n_files / u_lo)) / (hi_cpus / lo_cpus)
        scaling.update({
            "udf_fps_lo": round(n_files / u_lo, 1),
            "udf_fps_hi": round(n_files / u_hi, 1),
            "udf_efficiency": round(udf_eff, 3),
        })

    # ---- phase 4: stage-2/3 scaling — the join-heavy link+canonicalize
    # half (extraction pre-materialized, untimed) at two corpus sizes per
    # confined level. wall(n, c) = S_c + n*p_c/c: the tiny level measures
    # S_c DIRECTLY (P≈0 at 50 files), the tiny→big delta isolates p_c with
    # S factored out, and p_lo/p_hi is the parallel half's scaling
    # efficiency — the quantity that grows with data, free of the fixed
    # per-job driver cost that dominates small-corpus walls. The optional
    # mid level ($SPARK_GRAFT_KG_LINK_MID=1) refines the delta baseline. --
    def phase_link_scaling():
        ln_tiny, ln_mid = 50, max(100, KG_LINK_FILES // 4)
        sizes = sorted({ln_tiny, KG_LINK_FILES}
                       | ({ln_mid} if KG_LINK_MID else set()))
        link = {}
        # the lo/big level is the single longest-running sample in the
        # whole bench (~4-11 min per draw) and therefore the MOST exposed
        # to a contention window; with only one repeat a bad draw reads as
        # super-ideal scaling (observed: one 687 s draw vs 224 s quiet-box
        # on unchanged code). Keep >= 2 repeats at default settings.
        for cc, reps in ((lo_cpus, max(1, KG_REPEATS)),
                         (hi_cpus, KG_REPEATS + 1)):
            for n in sizes:
                _, t = _confined("kg_link_run", cc, reps, n_files=n)
                link[(cc, n)] = t
                _log(f"link {cc}c/{n}f done ({t:.1f}s best)", t_all)
        l_lo = link[(lo_cpus, KG_LINK_FILES)]
        l_hi = link[(hi_cpus, KG_LINK_FILES)]
        scaling.update({
            "link_files": KG_LINK_FILES,
            "link_fps_lo": round(KG_LINK_FILES / l_lo, 1),
            "link_fps_hi": round(KG_LINK_FILES / l_hi, 1),
            "link_efficiency": round((l_lo / l_hi) / (hi_cpus / lo_cpus), 3),
            # direct serial-floor reading: wall at 50 files (P≈0), per core
            # count — core-count-invariance is the model's premise
            "link_serial_lo_sec": round(link[(lo_cpus, ln_tiny)], 1),
            "link_serial_hi_sec": round(link[(hi_cpus, ln_tiny)], 1),
        })
        # delta baseline: mid when measured (largest-n pairing), else tiny;
        # a degenerate config (KG_LINK_FILES == baseline size) has no delta
        # to read p_c from — skip the per-file metrics, keep the rest
        base_n = ln_mid if KG_LINK_MID else ln_tiny
        dn = KG_LINK_FILES - base_n
        link_p_eff = None
        if dn > 0:
            link_p_lo = (l_lo - link[(lo_cpus, base_n)]) * lo_cpus / dn
            link_p_hi = (l_hi - link[(hi_cpus, base_n)]) * hi_cpus / dn
            link_p_eff = (link_p_lo / link_p_hi) if link_p_hi > 0 else None
            scaling.update({
                # per-file parallel core cost from the delta (S cancels);
                # their ratio is the parallel half's scaling
                "link_perfile_core_lo": round(link_p_lo, 4),
                "link_perfile_core_hi": round(link_p_hi, 4),
                "link_p_efficiency": (round(link_p_eff, 3)
                                      if link_p_eff else None),
            })
        # the Spark-runtime analog of workload_ceiling: what a canonical
        # shuffle/agg job achieves 8->32 on this box's single shared JVM
        if not over_budget("shuffle ceiling"):
            sc_eff = round(spark_shuffle_ceiling(lo_cpus, hi_cpus), 3)
            _log(f"spark shuffle ceiling done ({sc_eff})", t_all)
            scaling["spark_shuffle_ceiling_efficiency"] = sc_eff
            if link_p_eff and sc_eff:
                scaling["link_p_efficiency_vs_ceiling"] = round(
                    link_p_eff / sc_eff, 3)

    # ---- phase 5: ceilings (multiprocessing only, no JVM) ----------------
    def phase_ceilings():
        hw_eff = round(hw_ceiling(lo_cpus, hi_cpus), 3)
        wc = round(workload_ceiling(lo_cpus, hi_cpus), 3)
        _log("ceilings done", t_all)
        scaling["hw_ceiling_efficiency"] = hw_eff
        scaling["workload_ceiling_efficiency"] = wc
        if scaling.get("udf_efficiency") and wc:
            # the engine's efficiency as a fraction of what zero-overhead
            # multiprocessing achieves under the SAME box conditions — the
            # draw-invariant reading (shared-host interference moves both
            # numerator and denominator together)
            scaling["udf_efficiency_vs_ceiling"] = round(
                scaling["udf_efficiency"] / wc, 3)

    run_phase("headline", phase_headline)
    run_phase("realworld", phase_realworld)
    run_phase("extract scaling", phase_extract_scaling)
    # ceilings before link: they cost ~2 min, contextualize the extract
    # numbers (the draw-invariant vs-ceiling reading), and must not be
    # lost to the budget when the link sweep — the longest phase — would
    # overrun it
    run_phase("ceilings", phase_ceilings)
    run_phase("link scaling", phase_link_scaling)
    if phase_errors:
        results["phase_errors"] = phase_errors
    if skipped:
        results["skipped_phases"] = skipped
    emit(partial=bool(skipped) or bool(phase_errors))


if __name__ == "__main__":
    main()
