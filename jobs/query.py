"""spark-submit entry point: run a SPARQL query (plans/sparql.py subset)
against a triple table produced by ``jobs/extract.py`` — the reference's
"load the triplets into third-party tools to query with SPARQL" workflow
(reference README.md:56-64), with no third-party tool: the query runs
distributed on the same cluster that built the graph.

Example:
    spark-submit --py-files dist/engine.zip jobs/query.py \
        --triples /data/kg/triple_table \
        --query 'SELECT DISTINCT ?n WHERE { ?l a woc:Library . ?l woc:hasName ?n . }'

``--query @file.rq`` reads the query text from a file. The woc/rdf
prefixes are predeclared (matching what the reference's SPARQL tooling
provides); queries may re-declare or extend them.
"""

from __future__ import annotations

import argparse
import json
import sys


PREDECLARED = ("prefix woc: <http://rdf.webofcode.org/woc/>\n"
               "prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--triples", required=True,
                   help="parquet triple table dir (from jobs/extract.py)")
    p.add_argument("--query", required=True,
                   help="SPARQL text, or @path to a .rq file")
    p.add_argument("--out", default=None,
                   help="write the result as parquet here instead of "
                        "printing rows (first 100) to stdout")
    args = p.parse_args(argv)

    query = args.query
    if query.startswith("@"):
        with open(query[1:], encoding="utf-8") as f:
            query = f.read()

    from pyspark.sql import SparkSession

    from codeontologypython_spark.plans.sparql import sparql_to_df

    spark = SparkSession.builder.appName("kg-sparql").getOrCreate()
    triples = spark.read.parquet(args.triples)
    result = sparql_to_df(triples, PREDECLARED + query)
    if args.out:
        result.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"rows": n, "out": args.out,
                          "columns": result.columns}))
    else:
        rows = result.limit(100).collect()
        for r in rows:
            print(json.dumps(r.asDict()))
        print(json.dumps({"rows_shown": len(rows),
                          "columns": result.columns}), file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
