"""Distributed graph primitives as DataFrame compositions.

The reference engine has no graph operators (SURVEY §2.8); these back
the LLM-pipeline corpus diagnostics (duplicate-cluster connected
components live in queries/dedup.py; the PageRank power iteration
lives here as a reusable operator so any edge list — word graphs,
near-dup graphs, citation graphs — can be ranked).

Design notes for 100 TB:
- Each iteration is ONE equi-join of the edge list against the
  vertex-dim rank table plus one keyed aggregation — O(|E|) with
  map-side partial sums. AQE broadcasts the rank side when the vertex
  dimension fits.
- `localCheckpoint` between iterations keeps the lineage flat; an
  unbounded iterative plan re-optimizes (and can re-execute) the
  whole history each round.
- The arithmetic is ENTIRELY integer (fixed-point ranks, truncating
  integer division per edge, integer sums), so results are
  bit-reproducible across partitionings, retry orders and engines —
  the property any replayable filtering/weighting decision needs.
  Float PageRank sums are order-dependent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    checkpoint: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a DIRECTED edge list in pure
    integer arithmetic. Returns (v, rank) with rank in fixed-point
    units of 1/scale.

    The recurrence per iteration, all in bigint:

        contrib(u -> v) = (rank(u) * damping_num)
                            div (damping_den * outdeg(u))
        rank'(v) = (scale - scale*damping_num div damping_den)
                     + sum(contribs into v)

    Vertices with no in-edges disappear after the first iteration
    (their mass still flows out); symmetric graphs — the common
    corpus-diagnostic case — keep every vertex. Dangling vertices
    (no out-edges) are legal: their rank simply leaks, which matches
    the uncorrected textbook recurrence; callers that need mass
    conservation should symmetrize or add self-loops first.
    """
    base = scale - scale * damping_num // damping_den
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = deg.select(
        F.col(src).alias("v"), F.lit(scale).cast("long").alias("rank")
    )
    expr = f"(rank * {damping_num}) div ({damping_den} * outdeg)"
    for _ in range(iters):
        contrib = (
            edges.join(deg, src)
            .join(ranks.withColumnRenamed("v", src), src)
            .select(F.col(dst).alias("v"), F.expr(expr).alias("c"))
        )
        ranks = (
            contrib.groupBy("v")
            .agg(F.sum("c").cast("long").alias("in_sum"))
            .select("v", (F.lit(base) + F.col("in_sum")).cast("long").alias("rank"))
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_fixed_point_py(
    edges: list[tuple],
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> dict:
    """Sequential reference implementation of the IDENTICAL integer
    recurrence (for property tests): same truncating division, same
    init, same per-iteration vertex set semantics."""
    base = scale - scale * damping_num // damping_den
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: scale for v in outdeg}
    for _ in range(iters):
        nxt: dict = {}
        for s, d in edges:
            if s not in ranks:
                continue
            c = (ranks[s] * damping_num) // (damping_den * outdeg[s])
            nxt[d] = nxt.get(d, 0) + c
        ranks = {v: base + c for v, c in nxt.items()}
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Min-label propagation over a SYMMETRIC edge list; returns
    (v, label) where label is the smallest vertex id in v's component
    — the duplicate-cluster primitive behind dedup keeper election
    (queries/dedup.py wraps it with minhash edges).

    Callers pass both directions of each undirected edge (labels flow
    along edge direction only). Singleton vertices are omitted — they
    can't change label; union the vertex dim back in if needed.

    Scale: each round is one equi-join + keyed min + a convergence
    count, and `localCheckpoint` truncates lineage per round (the
    classic Spark iterative pitfall: an unbounded plan re-executes the
    whole history each iteration). Rounds needed = graph diameter,
    which for near-dup clusters is tiny; max_iters is the safety
    bound. Column names "v"/"label" must not collide with src/dst.
    """
    if src in ("v", "label") or dst in ("v", "label"):
        raise ValueError("src/dst column names collide with output names v/label")
    edge_vs = edges.select(F.col(src).alias("v")).distinct()
    labels = edge_vs.select("v", F.col("v").alias("label")).localCheckpoint()
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, F.col(src) == F.col("v"))
            .groupBy(F.col(dst).alias("v"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_py(edges: list[tuple]) -> dict:
    """Union-find reference (property tests): min vertex id per
    component over the same symmetric edge list, restricted to
    vertices that appear in an edge."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}
