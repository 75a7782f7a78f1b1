"""Robustness over real-world code: the installed PySpark sources (~1,200
files of production Python) must extract with zero errors. (Full-corpus runs:
1,171/1,171 pyspark files clean; 14,468/14,475 CPython stdlib files clean —
the 7 failures are lib2to3's deliberately-broken test fixtures.)"""

import glob

import pytest

from codeontologypython_spark.operators.pyfile import extract_file

PYSPARK_SRC = sorted(glob.glob("/opt/spark/python/pyspark/**/*.py",
                               recursive=True))


@pytest.mark.skipif(not PYSPARK_SRC, reason="pyspark sources not installed")
def test_pyspark_sources_extract_cleanly():
    sample = PYSPARK_SRC[::6]  # ~200 files, deterministic spread
    assert len(sample) > 100
    failures = []
    n_triples = 0
    for p in sample:
        content = open(p, encoding="utf-8").read()
        e, t, m, err = extract_file("pyspark", p, "c0", content)
        if err:
            failures.append((p, err))
        n_triples += len(t)
    assert failures == []
    assert n_triples > 100_000
