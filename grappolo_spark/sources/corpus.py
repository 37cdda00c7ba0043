"""Corpus front door: source-code table → dependency edge table.

The north_rule's primary input is an Iceberg/parquet table of source files
``(repo:string, path:string, commit:string, lang:string, content:string)``.
This module:

1. synthesizes a deterministic corpus at small scale (planted community
   structure: files import mostly within their repo/module, sparse cross-repo
   imports) — seeded, no external data;
2. extracts import/include links with a **vectorized Arrow pandas UDF**
   (no per-row Python in the driver path), carrying ``sha256(content)``
   through so the per-row invariant can be asserted against the source table
   (BASELINE.json input_hint);
3. resolves module references to file paths and densifies to the canonical
   ``edges(src,dst,weight)`` via the SNAP-style renumbering
   (`InputsOutput/loadSNAP.cpp:74-108` semantics — see graph.densify_ids).

At 100 TB the corpus scan is the dominant cost: the extraction UDF is a
single mapInPandas-style pass (projection-pruned to the 3 needed columns),
the module->path resolution is a broadcast-or-shuffle equi-join on
(repo, module), and everything downstream operates on the much smaller edge
table.
"""

from __future__ import annotations

import hashlib
import random
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grappolo_spark.graph import Graph, densify_ids

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"

_PY_IMPORT = re.compile(
    r"^\s*(?:from\s+([A-Za-z_][\w.]*)\s+import|import\s+([A-Za-z_][\w.]*))",
    re.MULTILINE,
)
_C_INCLUDE = re.compile(r'^\s*#\s*include\s+"([^"]+)"', re.MULTILINE)


def synthesize_corpus(
    spark: SparkSession,
    num_repos: int = 3,
    modules_per_repo: int = 4,
    files_per_module: int = 5,
    cross_repo_p: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic corpus with planted community structure."""
    rng = random.Random(seed)
    rows = []
    repos = [f"org/repo-{i:04d}" for i in range(num_repos)]
    commits = {
        r: hashlib.sha1(r.encode()).hexdigest() for r in repos
    }  # fixed per repo
    all_files: list[tuple[str, str, str]] = []  # (repo, module, name)
    for r in repos:
        for m in range(modules_per_repo):
            for f in range(files_per_module):
                all_files.append((r, f"pkg_{m}", f"mod_{f:02d}"))
    for repo, module, name in all_files:
        lang = "python" if rng.random() < 0.7 else rng.choice(["c", "cpp"])
        lines = [f"# {repo}/{module}/{name}" if lang == "python" else f"// {name}"]
        # intra-module imports (dense — planted community)
        peers = [x for x in all_files if x[0] == repo and x[1] == module and x != (repo, module, name)]
        for p in rng.sample(peers, min(2, len(peers))):
            lines.append(_import_line(lang, p[1], p[2]))
        # intra-repo cross-module (sparser)
        others = [x for x in all_files if x[0] == repo and x[1] != module]
        if others and rng.random() < 0.5:
            p = rng.choice(others)
            lines.append(_import_line(lang, p[1], p[2]))
        # cross-repo (rare; module path encodes the target repo index)
        if rng.random() < cross_repo_p:
            p = rng.choice([x for x in all_files if x[0] != repo])
            lines.append(_import_line(lang, p[1], p[2]))
        lines.append("def main(): pass" if lang == "python" else "int main() { return 0; }")
        ext = {"python": "py", "c": "c", "cpp": "cc"}[lang]
        rows.append(
            (
                repo,
                f"src/{module}/{name}.{ext}",
                commits[repo],
                lang,
                "\n".join(lines) + "\n",
            )
        )
    return spark.createDataFrame(rows, CORPUS_SCHEMA)


def _import_line(lang: str, module: str, name: str) -> str:
    if lang == "python":
        return f"import {module}.{name}"
    return f'#include "{module}/{name}.h"'


def _extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized link extraction for one Arrow batch."""
    out_repo, out_path, out_sha, out_ref = [], [], [], []
    shas = batch["content"].map(
        lambda c: hashlib.sha256(c.encode("utf-8")).hexdigest()
    )
    for repo, path, lang, content, sha in zip(
        batch["repo"], batch["path"], batch["lang"], batch["content"], shas
    ):
        if lang == "python":
            refs = [a or b for a, b in _PY_IMPORT.findall(content)]
            refs = [r.replace(".", "/") for r in refs]
        else:
            refs = [r[:-2] if r.endswith(".h") else r for r in _C_INCLUDE.findall(content)]
        for r in refs:
            out_repo.append(repo)
            out_path.append(path)
            out_sha.append(sha)
            out_ref.append(r)
    return pd.DataFrame(
        {"repo": out_repo, "path": out_path, "sha256": out_sha, "ref": out_ref}
    )


def extract_links(corpus: DataFrame) -> DataFrame:
    """corpus → raw link table (repo, path, sha256, ref) via mapInPandas."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _extract_batch(b)

    return corpus.select("repo", "path", "lang", "content").mapInPandas(
        gen, schema="repo string, path string, sha256 string, ref string"
    )


def verify_sha256(corpus: DataFrame, links: DataFrame) -> int:
    """Per-row invariant: the UDF-carried sha256 must equal the JVM-side
    ``sha2(content, 256)`` of the source table. Returns #mismatches (0 = ok)."""
    ref = corpus.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha_jvm")
    )
    return (
        links.select("repo", "path", "sha256").distinct()
        .join(ref, ["repo", "path"])
        .filter(F.col("sha256") != F.col("sha_jvm"))
        .count()
    )


def links_to_edges(corpus: DataFrame, links: DataFrame) -> tuple[DataFrame, Graph]:
    """Resolve module refs to file paths and build the canonical graph.

    A ref ``pkg_m/mod_f`` resolves within the SAME repo first; unresolved
    refs are matched cross-repo by module path (rare). Unresolvable refs are
    dropped. Returns (vertex_map, Graph).
    """
    files = corpus.select(
        F.col("repo").alias("frepo"),
        F.col("path").alias("fpath"),
        F.regexp_replace(
            F.regexp_extract("path", r"^src/(.+)\.[a-z]+$", 1), r"\.", "/"
        ).alias("module"),
    )
    # same-repo resolution
    same = links.join(
        files,
        (links.repo == files.frepo) & (links.ref == files.module),
    ).select(
        F.concat_ws("::", "repo", "path").alias("src_id"),
        F.concat_ws("::", "frepo", "fpath").alias("dst_id"),
    )
    # cross-repo fallback for refs that did not resolve in-repo
    unresolved = links.join(
        files,
        (links.repo == files.frepo) & (links.ref == files.module),
        "left_anti",
    )
    cross = unresolved.join(
        files, unresolved.ref == files.module
    ).select(
        F.concat_ws("::", "repo", "path").alias("src_id"),
        F.concat_ws("::", "frepo", "fpath").alias("dst_id"),
    )
    pairs = same.unionByName(cross).filter(F.col("src_id") != F.col("dst_id"))
    vertex_map, dense = densify_ids(pairs, "src_id", "dst_id")
    g = Graph.from_edgelist(dense.withColumnRenamed("src_id", "src").withColumnRenamed("dst_id", "dst"))
    return vertex_map, g


def build_graph_from_corpus(corpus: DataFrame) -> tuple[DataFrame, Graph]:
    """Full front door: extract links (verifying sha256) → canonical Graph."""
    links = extract_links(corpus)
    mismatches = verify_sha256(corpus, links)
    if mismatches:
        raise ValueError(f"sha256 invariant violated for {mismatches} rows")
    return links_to_edges(corpus, links)
