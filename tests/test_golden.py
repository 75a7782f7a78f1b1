"""Golden-output E2E test (SURVEY §5.1; north_star: "pytest fixtures
comparing serialized RDF graphs"). The committed golden N-Triples file is the
engine's own validated output over the deterministic fixture corpus; the gate
is set-based precision/recall >= 0.95 (BASELINE.json metric) plus an exact
report so any drift is visible."""

import os

from codeontologypython_spark.sources.ntriples import to_ntriples

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "fixtures.nt")


def test_golden_triples_pr(final_triples):
    with open(GOLDEN) as f:
        golden = {ln.rstrip("\n") for ln in f if ln.strip()}
    got = {r["value"] for r in to_ntriples(final_triples).collect()}
    inter = len(got & golden)
    precision = inter / len(got)
    recall = inter / len(golden)
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"


def test_golden_triples_deterministic(final_triples):
    """Same engine, same input => byte-identical serialization (IRI hashing
    and dedup are fully deterministic, individuals.py:60-85 semantics)."""
    with open(GOLDEN) as f:
        golden = [ln.rstrip("\n") for ln in f if ln.strip()]
    got = [r["value"] for r in to_ntriples(final_triples).collect()]
    assert got == golden
