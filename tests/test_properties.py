"""Property-based tests (hypothesis) for the pure-Python extraction core:
the warn-and-skip contract (extract never raises, parser.py:67-89), docstring
parsing totality, cleaning idempotence, FQN derivation laws."""

import ast

from hypothesis import given, settings
from hypothesis import strategies as st

from codeontologypython_spark.operators.pyfile import (
    clean_description,
    extract_file,
    module_fqn_of_path,
    parse_docstring,
    structure_annotation,
)

_TEXT = st.text(max_size=300)


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_extract_file_never_raises(src):
    """Arbitrary content is either extracted or degraded to an error row —
    never an exception (the reference's pass_on_exception contract)."""
    ents, triples, mentions, err = extract_file("r", "m.py", "c0", src)
    if err is None:
        assert any(e["kind"] == "Package" for e in ents)
    else:
        assert ents == [] and triples == []


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_parse_docstring_total(doc):
    desc, params, rt, rdesc = parse_docstring(doc)
    assert isinstance(params, dict)
    for name, (t, d) in params.items():
        assert isinstance(name, str)
        assert t is None or isinstance(t, str)
        assert d is None or isinstance(d, str)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_clean_description_idempotent(text):
    once = clean_description(text)
    assert clean_description(once) == once


@settings(max_examples=100, deadline=None)
@given(st.lists(st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True),
                min_size=1, max_size=5),
       st.booleans())
def test_module_fqn_laws(segments, is_init):
    path = "/".join(segments) + ("/__init__.py" if is_init else ".py")
    fqn = module_fqn_of_path(path)
    # dotted form mirrors the path segments; __init__ collapses to the dir
    assert fqn == ".".join(segments)
    # the library is always the first segment
    assert fqn.split(".", 1)[0] == segments[0]


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_structure_annotation_total(expr_src):
    """structure_annotation returns str | list | tuple | None for anything
    that parses as an expression; junk is filtered before it ever reaches
    the function, but even quoted-garbage forward refs must not raise."""
    try:
        node = ast.parse(expr_src, mode="eval").body
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return
    out = structure_annotation(node)
    assert out is None or isinstance(out, (str, list, tuple))
