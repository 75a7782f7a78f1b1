"""Round-6 optimization harness (NOT part of the driver contract — bench.py
is frozen; this file exists for guide §1 measurement hygiene).

Per-query isolation: times each headline query with the noop sink
(guide §1.4), best-of-N, labelled jobs (guide §1.5), and captures
``.explain("formatted")`` to plans/r06/<query>_<tag>.txt so plan claims in
OPTIMIZATION_r06.md are reproducible.

Usage:
  python bench_extra.py [--tag before|after] [--repeats N] [--plans-only]
                        [query ...]
Defaults: all HEADLINE queries, repeats=3, tag=before.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, _noop_write  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from codeontologypython_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries or HEADLINE
    qs = entry_mod.queries()

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(cpus=cpus, app_name=f"bench-extra-{args.tag}")
    # same warmup as bench.time_queries
    for t in ("lineitem", "documents", "embeddings"):
        _noop_write(spark.read.parquet(f"{sf_dir}/{t}.parquet")
                    .limit(1000).groupBy().agg(F.count("*")))

    out = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        if not args.no_plans:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as f:
                f.write(plan)
        if args.plans_only:
            continue
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            _noop_write(qs[name](spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples}
        print(f"{name}: best={min(samples)} samples={samples}",
              file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"tag": args.tag, "sf_dir": sf_dir, "cpus": cpus,
                      "queries": out}))


if __name__ == "__main__":
    main()
