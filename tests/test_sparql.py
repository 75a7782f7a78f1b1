"""SPARQL-BGP-subset compiler tests (plans/sparql.py): parsing, joins,
OPTIONAL, FILTER, ordering, and equality with the hand-written kg query on
the live pipeline (the hash-backed receipt is kg_sparql_library_names)."""

import pytest
from pyspark.sql import functions as F

from codeontologypython_spark.plans.sparql import parse_sparql, sparql_to_df

WOC = "http://rdf.webofcode.org/woc/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("e1", RDF_TYPE, WOC + "Class", False),
        ("e1", WOC + "hasName", "Dog", True),
        ("e1", WOC + "extends", "e2", False),
        ("e2", RDF_TYPE, WOC + "Class", False),
        ("e2", WOC + "hasName", "Animal", True),
        ("m1", RDF_TYPE, WOC + "Method", False),
        ("m1", WOC + "hasName", "bark", True),
        ("m1", WOC + "isMethodOf", "e1", False),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean"
    ).cache()


def test_parse_readme_query():
    q = parse_sparql("""
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT DISTINCT ?n_lib
        WHERE { ?lib rdf:type woc:Library . ?lib woc:hasName ?n_lib . }
    """)
    assert q.select == ["n_lib"] and q.distinct
    assert len(q.patterns) == 2
    assert q.patterns[0].p == ("iri", RDF_TYPE)
    assert q.patterns[0].o == ("iri", WOC + "Library")


def test_bgp_join_and_a_keyword(spark, triples):
    out = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?name WHERE { ?c a woc:Class . ?c woc:hasName ?name . }
    """).collect()
    assert sorted(r["name"] for r in out) == ["Animal", "Dog"]


def test_literal_object_and_chain(spark, triples):
    out = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?super WHERE {
            ?c woc:hasName "Dog" . ?c woc:extends ?s .
            ?s woc:hasName ?super .
        }
    """).collect()
    assert [r["super"] for r in out] == ["Animal"]


def test_optional_left_join(spark, triples):
    out = {r["name"]: r["super"] for r in sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?name ?super WHERE {
            ?c a woc:Class . ?c woc:hasName ?name .
            OPTIONAL { ?c woc:extends ?s . ?s woc:hasName ?super . }
        }
    """).collect()}
    assert out == {"Dog": "Animal", "Animal": None}


def test_filters_order_limit(spark, triples):
    out = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?name WHERE {
            ?x woc:hasName ?name . FILTER regex(?name, "^[A-Z]")
            FILTER (?name != "Animal")
        } ORDER BY ?name LIMIT 5
    """).collect()
    assert [r["name"] for r in out] == ["Dog"]


def test_repeated_variable_in_pattern(spark, triples):
    # nothing extends itself -> empty
    out = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?c WHERE { ?c woc:extends ?c . }
    """).collect()
    assert out == []


def test_errors(spark, triples):
    with pytest.raises(ValueError, match="undeclared prefix"):
        sparql_to_df(triples, 'SELECT ?x WHERE { ?x nope:thing ?y . }')
    with pytest.raises(ValueError, match="unbound select"):
        sparql_to_df(triples, """
            prefix woc: <http://rdf.webofcode.org/woc/>
            SELECT ?zzz WHERE { ?x woc:hasName ?y . }
        """)
    with pytest.raises(ValueError, match="only OPTIONAL"):
        sparql_to_df(triples, """
            prefix woc: <http://rdf.webofcode.org/woc/>
            SELECT ?x WHERE { OPTIONAL { ?x woc:hasName ?y . } }
        """)


def test_sparql_matches_handwritten_kg_query(spark):
    """The README SPARQL text through the compiler == the hand-written
    DataFrame query, on the LIVE fixture pipeline output."""
    import __spark_entry__ as entry_mod
    a = {r["library_name"] for r in entry_mod.queries()
         ["kg_sparql_library_names"](spark, None).collect()}
    b = {r["library_name"] for r in entry_mod.queries()
         ["kg_library_names"](spark, None).collect()}
    assert a == b and len(a) == 9


def test_aggregate_group_by(spark, triples):
    out = {r["p"]: r["n"] for r in sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?p (COUNT(*) AS ?n)
        WHERE { ?s ?p ?o . } GROUP BY ?p
    """).collect()}
    assert out[RDF_TYPE] == 3
    assert out[WOC + "hasName"] == 3
    assert out[WOC + "extends"] == 1


def test_aggregate_count_var_and_global(spark, triples):
    # COUNT(?super) over an OPTIONAL: nulls are not counted
    [r] = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT (COUNT(?super) AS ?n_sub) WHERE {
            ?c a woc:Class . OPTIONAL { ?c woc:extends ?super . }
        }
    """).collect()
    assert r["n_sub"] == 1
    with pytest.raises(ValueError, match="not in GROUP BY"):
        sparql_to_df(triples, """
            prefix woc: <http://rdf.webofcode.org/woc/>
            SELECT ?p (COUNT(*) AS ?n) WHERE { ?s ?p ?o . }
        """)


def test_sparql_class_star_matches_handwritten(spark):
    import __spark_entry__ as entry_mod
    a = {(r["pred"], r["n"]) for r in entry_mod.queries()
         ["kg_sparql_class_star"](spark, None).collect()}
    b = {(r["pred"], r["n"]) for r in entry_mod.queries()
         ["kg_class_star"](spark, None).collect()}
    assert a == b and len(a) == 16


def test_isliteral_filter(spark, triples):
    # literal-valued properties of Dog only
    out = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?v WHERE {
            ?c woc:hasName "Dog" . ?c ?p ?v . FILTER isLiteral(?v)
        }
    """).collect()
    assert [r["v"] for r in out] == ["Dog"]
    # non-literal objects of Dog: its type IRI and its superclass
    out2 = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?v WHERE {
            ?c woc:hasName "Dog" . ?c ?p ?v . FILTER (!isLiteral(?v))
        }
    """).collect()
    assert sorted(r["v"] for r in out2) == ["e2", WOC + "Class"]
    # unsatisfiable: a subject-position var required to be a literal
    out3 = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?c WHERE { ?c woc:hasName ?n . FILTER isLiteral(?c) }
    """).collect()
    assert out3 == []


def test_sparql_deep_star_matches_handwritten(spark):
    import __spark_entry__ as entry_mod
    a = {(r["pred1"], r["pred2"], r["n"]) for r in entry_mod.queries()
         ["kg_sparql_class_star_deep"](spark, None).collect()}
    b = {(r["pred1"], r["pred2"], r["n"]) for r in entry_mod.queries()
         ["kg_class_star_deep"](spark, None).collect()}
    assert a == b and len(a) == 117


def test_full_line_comments_and_hash_iris(spark, triples):
    # '#' lives inside rdf IRIs, so only FULL-LINE comments are stripped
    out = sparql_to_df(triples, """
        # list class names
        prefix r: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?name WHERE {
            ?c r:type <http://rdf.webofcode.org/woc/Class> .
            ?c <http://rdf.webofcode.org/woc/hasName> ?name .
        }
    """).collect()
    assert sorted(r["name"] for r in out) == ["Animal", "Dog"]


def test_randomized_bgp_vs_naive_evaluator(spark):
    """15 seeded random (graph, BGP) cases: the compiler must agree with a
    direct pure-Python pattern-matching evaluator on the full binding set."""
    import random

    rng = random.Random(7)
    X = "http://x/"

    def naive(triples, patterns, select):
        bindings = [{}]
        for s_t, p_t, o_t in patterns:
            out = []
            for b in bindings:
                for (s, p, o, lit) in triples:
                    b2 = dict(b)
                    ok = True
                    for (kind, val), cell, is_obj in (
                            (s_t, s, False), (p_t, p, False), (o_t, o, True)):
                        if kind == "var":
                            if b2.get(val, cell) != cell:
                                ok = False
                                break
                            b2[val] = cell
                        elif kind == "iri":
                            if cell != val or (is_obj and lit):
                                ok = False
                                break
                        else:  # literal
                            if cell != val or not (is_obj and lit):
                                ok = False
                                break
                    if ok:
                        out.append(b2)
            bindings = out
        return {tuple(b[v] for v in select) for b in bindings}

    def term_sql(kind, val):
        if kind == "var":
            return "?" + val
        if kind == "iri":
            return f"<{val}>"
        return f'"{val}"'

    for case in range(15):
        triples = set()
        while len(triples) < rng.randrange(20, 50):
            s = X + f"e{rng.randrange(6)}"
            p = X + f"p{rng.randrange(4)}"
            if rng.random() < 0.5:
                triples.add((s, p, X + f"e{rng.randrange(6)}", False))
            else:
                triples.add((s, p, f"w{rng.randrange(5)}", True))
        triples = sorted(triples)

        def rand_term(pos, used_vars):
            r = rng.random()
            if r < 0.55:
                v = f"v{rng.randrange(3)}"
                used_vars.add(v)
                return ("var", v)
            if pos == "o" and r < 0.75:
                return ("lit", f"w{rng.randrange(5)}")
            if pos == "s":
                return ("iri", X + f"e{rng.randrange(6)}")
            if pos == "p":
                return ("iri", X + f"p{rng.randrange(4)}")
            return ("iri", X + f"e{rng.randrange(6)}")

        used = set()
        patterns = [tuple(rand_term(pos, used) for pos in "spo")
                    for _ in range(rng.randrange(2, 4))]
        if not used:
            continue
        select = sorted(used)
        sparql = ("SELECT DISTINCT " + " ".join("?" + v for v in select)
                  + " WHERE { "
                  + " . ".join(" ".join(term_sql(*t) for t in pat)
                               for pat in patterns) + " . }")
        df = spark.createDataFrame(
            triples,
            "subj string, pred string, obj string, obj_is_literal boolean")
        got = {tuple(r[v] for v in select)
               for r in sparql_to_df(df, sparql).collect()}
        want = naive(triples, patterns, select)
        assert got == want, (case, sparql, got ^ want)


def test_union(spark, triples):
    # names of classes UNION names of methods
    out = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT DISTINCT ?name WHERE {
            { ?c a woc:Class . ?c woc:hasName ?name . }
            UNION
            { ?m a woc:Method . ?m woc:hasName ?name . }
        }
    """).collect()
    assert sorted(r["name"] for r in out) == ["Animal", "Dog", "bark"]
    # branches with DIFFERENT variables: unbound side comes back null
    rows = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT ?cls ?meth WHERE {
            { ?x a woc:Class . ?x woc:hasName ?cls . }
            UNION
            { ?x a woc:Method . ?x woc:hasName ?meth . }
        }
    """).collect()
    got = {(r["cls"], r["meth"]) for r in rows}
    assert got == {("Dog", None), ("Animal", None), (None, "bark")}
    # UNION composes with aggregation
    [r] = sparql_to_df(triples, """
        prefix woc: <http://rdf.webofcode.org/woc/>
        SELECT (COUNT(*) AS ?n) WHERE {
            { ?c a woc:Class . } UNION { ?m a woc:Method . }
        }
    """).collect()
    assert r["n"] == 3


def test_randomized_union_vs_naive_evaluator(spark):
    """10 seeded random two-branch UNION queries: compiler output must equal
    the union of per-branch naive evaluations, null-padded to the shared
    variable set."""
    import random

    rng = random.Random(11)
    X = "http://x/"

    def naive_branch(triples, patterns):
        bindings = [{}]
        for s_t, p_t, o_t in patterns:
            out = []
            for b in bindings:
                for (s, p, o, lit) in triples:
                    b2 = dict(b)
                    ok = True
                    for (kind, val), cell, is_obj in (
                            (s_t, s, False), (p_t, p, False), (o_t, o, True)):
                        if kind == "var":
                            if b2.get(val, cell) != cell:
                                ok = False
                                break
                            b2[val] = cell
                        elif kind == "iri":
                            if cell != val or (is_obj and lit):
                                ok = False
                                break
                        else:
                            if cell != val or not (is_obj and lit):
                                ok = False
                                break
                    if ok:
                        out.append(b2)
            bindings = out
        return bindings

    def term_sql(kind, val):
        if kind == "var":
            return "?" + val
        if kind == "iri":
            return f"<{val}>"
        return f'"{val}"'

    for case in range(10):
        triples = set()
        while len(triples) < rng.randrange(15, 40):
            s = X + f"e{rng.randrange(5)}"
            p = X + f"p{rng.randrange(3)}"
            if rng.random() < 0.5:
                triples.add((s, p, X + f"e{rng.randrange(5)}", False))
            else:
                triples.add((s, p, f"w{rng.randrange(4)}", True))
        triples = sorted(triples)

        def rand_pattern(used):
            pat = []
            for pos in "spo":
                r = rng.random()
                if r < 0.6:
                    v = f"v{rng.randrange(3)}"
                    used.add(v)
                    pat.append(("var", v))
                elif pos == "o" and r < 0.8:
                    pat.append(("lit", f"w{rng.randrange(4)}"))
                elif pos == "p":
                    pat.append(("iri", X + f"p{rng.randrange(3)}"))
                else:
                    pat.append(("iri", X + f"e{rng.randrange(5)}"))
            return tuple(pat)

        branches, all_vars = [], set()
        for _ in range(2):
            used = set()
            branch = [rand_pattern(used)
                      for _ in range(rng.randrange(1, 3))]
            if not used:
                branch = [(("var", "v0"),) + branch[0][1:]]
                used = {"v0"}
            branches.append((branch, used))
            all_vars |= used
        select = sorted(all_vars)

        sparql = ("SELECT DISTINCT " + " ".join("?" + v for v in select)
                  + " WHERE { "
                  + " UNION ".join(
                      "{ " + " . ".join(" ".join(term_sql(*t) for t in pat)
                                        for pat in br) + " . }"
                      for br, _ in branches)
                  + " }")
        want = set()
        for br, used in branches:
            for b in naive_branch(triples, br):
                want.add(tuple(b.get(v) for v in select))
        df = spark.createDataFrame(
            triples,
            "subj string, pred string, obj string, obj_is_literal boolean")
        got = {tuple(r[v] for v in select)
               for r in sparql_to_df(df, sparql).collect()}
        assert got == want, (case, sparql, got ^ want)
