"""P2 — lazy corpus pruning by import-closure expansion (SURVEY §2.2 P2,
§4 "the single biggest cost lever at 10^12-file scale").

The reference recursively parses only modules actually imported from the
project (parser.py:91-123, policy extractor.py:24-33). Relational analog: an
iterative frontier join — a cheap imports-only parse of the frontier files,
joined against the path-derived module catalog, anti-joined against the
already-selected set, looped to fixpoint. Unreferenced dependency repos are
never parsed by the expensive Stage-1 extractor.
"""

from __future__ import annotations

import ast
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codeontologypython_spark.operators.linking import module_fqn_col

_IMPORTS_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("target_fqn", T.StringType(), False),
])


def _imports_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Cheap per-file scan: just the import targets (absolute FQNs)."""
    from codeontologypython_spark.operators.pyfile import module_fqn_of_path

    for pdf in batches:
        rows = []
        for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
            try:
                tree = ast.parse(content)
            except (SyntaxError, ValueError, RecursionError):
                continue
            fqn = module_fqn_of_path(path)
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    for a in node.names:
                        rows.append((repo, path, a.name))
                elif isinstance(node, ast.ImportFrom):
                    if node.level == 0:
                        base = node.module or ""
                    else:
                        parts = fqn.split(".")
                        if not path.endswith("__init__.py"):
                            parts = parts[:-1]
                        if node.level > 1:
                            parts = parts[: len(parts) - (node.level - 1)]
                        base = ".".join(parts)
                        if node.module:
                            base = f"{base}.{node.module}" if base else node.module
                    if base:
                        rows.append((repo, path, base))
                        for a in node.names:
                            if a.name != "*":
                                rows.append((repo, path, f"{base}.{a.name}"))
        yield pd.DataFrame(rows, columns=["repo", "path", "target_fqn"])


def select_import_closure(src_df: DataFrame, root_repos: list[str],
                          max_rounds: int = 20) -> DataFrame:
    """Return the subset of ``src_df`` in the import closure of the root
    repos' files. Each round: imports-of-frontier ⋈ module catalog ⟶
    anti-join vs selected ⟶ new frontier (parser.py:91-123 as a DataFrame
    loop; 3-5 rounds in practice)."""
    files = src_df.filter(F.col("lang") == "python")
    catalog = (files.select("repo", "path")
               .withColumn("module_fqn", module_fqn_col(F.col("path"))))

    selected = files.filter(F.col("repo").isin(root_repos)).select("repo", "path")
    frontier = selected
    for _ in range(max_rounds):
        frontier_files = files.join(frontier, ["repo", "path"], "left_semi")
        imports = frontier_files.mapInPandas(_imports_only, schema=_IMPORTS_SCHEMA)
        targets = (imports
                   .select(F.col("target_fqn"))
                   .union(imports.select(
                       F.regexp_replace("target_fqn", "\\.[^.]+$", "")))
                   .distinct())
        hit = (catalog.join(targets,
                            catalog["module_fqn"] == targets["target_fqn"])
               .select("repo", "path"))
        # per-round materialization: without it the selected/frontier lineage
        # compounds quadratically over rounds (CLAUDE.md pitfall #4)
        new = (hit.join(selected, ["repo", "path"], "left_anti").distinct()
               .localCheckpoint())
        if new.isEmpty():
            break
        selected = selected.unionByName(new)
        frontier = new
    return src_df.join(selected, ["repo", "path"], "left_semi")
