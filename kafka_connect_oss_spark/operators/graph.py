"""Fixed-iteration PageRank over a pair graph (similarity-graph centrality).

Training-data role: a centrality score over the near-dup graph is a
redundancy-aware quality prior — documents at the center of a large
near-duplicate neighborhood are (a) the natural canonical pick when a
cluster keeps one representative and (b) over-represented content a
mixture planner may down-weight. The same operator runs over any edge
table (URL link graphs being the classic corpus-quality instance).

Semantics (deliberately pinned so the oracle can mirror them exactly):

* the edge set is SYMMETRIZED (similarity pairs are undirected), so no
  incident node is dangling — the classic dangling-mass redistribution
  is intentionally omitted;
* rank iterates r_{t+1}(v) = (1-d)/N + d * sum_{u~v} r_t(u)/deg(u) for a
  FIXED n_iters (no convergence test — a data-dependent stopping rule
  would make the result non-reproducible across partitionings);
* every iterate is rounded to 9 decimals IN BOTH ENGINES: parallel
  double summation is order-dependent at ~1e-16 relative error, far
  below the 0.5e-9 rounding bin, so the per-round rounding makes the
  fixed point bit-identical across engines and partitionings (the
  k-means/quality-model determinism discipline); the final score rounds
  to 6.

Scale shape: per iteration ONE join of the (staged) degree-annotated
edge list with the current rank frame + one aggregation on the dst key —
both shuffles are on the same key, and AQE handles the skew of hub
nodes. The rank frame is localCheckpoint-staged each round and the
previous round's blocks are released (the dedup_clusters loop
discipline), so plan depth and executor storage stay flat at any
iteration count. The driver loop never collects anything.

Oracle: ``pagerank_oracle_sql`` unrolls the same iterations as chained
CTEs over a caller-supplied undirected pair CTE — DuckDB hash-checks
every round's arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(pairs: DataFrame, n_iters: int = 5, damping: float = 0.85,
             src_col: str = "id_a", dst_col: str = "id_b",
             ) -> DataFrame:
    """(node, rank) over the symmetrized ``pairs`` graph; rank rounded to
    6 decimals. Nodes = edge-incident ids (an isolated doc is its own
    trivial component and would sit at exactly (1-d)/N forever — append
    it downstream if the report needs it)."""
    from kafka_connect_oss_spark.operators.dedup import (
        _release_local_checkpoint)
    from kafka_connect_oss_spark.operators.lifecycle import stage_local

    d = float(damping)
    # stage the caller's pair pipeline FIRST: the symmetrizing union
    # consumes it twice and the degree count reads the union again, so
    # an unstaged frame re-runs the (typically expensive) upstream pair
    # generation four times before the first round begins — measured
    # 36-99 s vs ~14 s at sf1 over the jaccard edge set (r11 fix, the
    # containment_pairs lesson applied here)
    e = stage_local(pairs.select(F.col(src_col).alias("s"),
                                 F.col(dst_col).alias("d")))
    edges = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("od"))
    # one staged materialization feeds every round's join
    edges = stage_local(edges.join(deg, "s"))
    nodes = stage_local(edges.select(F.col("s").alias("v")).distinct())
    # N enters the formula as 1.0/N computed IN-ENGINE from the same
    # count both sides take (no driver literal to drift on repr)
    nn = nodes.agg((F.lit(1.0) / F.count(F.lit(1))).alias("inv_n"))
    ranks = (nodes.crossJoin(F.broadcast(nn))
             .select("v", F.round(F.col("inv_n"), 9).alias("r")))
    prev = None
    for t in range(int(n_iters)):
        contrib = (edges.join(ranks, edges.s == ranks.v)
                   .groupBy(F.col("d").alias("v"))
                   .agg(F.sum(F.col("r") / F.col("od")).alias("c")))
        ranks_new = (nodes.join(contrib, "v", "left")
                     .crossJoin(F.broadcast(nn))
                     .select("v", F.round(
                         (1.0 - d) * F.col("inv_n")
                         + d * F.coalesce(F.col("c"), F.lit(0.0)),
                         9).alias("r")))
        if t == int(n_iters) - 1:
            # the last round stays unstaged: the caller's action runs it
            # directly over round N-1's staged blocks (one less
            # materialization, and the returned frame's plan SHOWS the
            # flat per-round join+agg instead of a Scan ExistingRDD)
            ranks = ranks_new
            break
        ranks_new = stage_local(ranks_new)
        if prev is not None:
            _release_local_checkpoint(prev)
        prev, ranks = ranks, ranks_new
    return ranks.select(F.col("v").alias("node"),
                        F.round("r", 6).alias("rank"))


def pagerank_oracle_sql(pairs_cte: str, n_iters: int = 5,
                        damping: float = 0.85, src_col: str = "id_a",
                        dst_col: str = "id_b") -> str:
    """DuckDB mirror: ``pairs_cte`` is the body of a SELECT producing the
    undirected pair table (columns ``src_col``, ``dst_col``); iterations
    unroll as chained CTEs with the identical per-round rounding."""
    d = float(damping)
    ctes = [
        f"p AS ({pairs_cte})",
        f"e AS (SELECT {src_col} AS s, {dst_col} AS d FROM p"
        f" UNION ALL SELECT {dst_col}, {src_col} FROM p)",
        "deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS od"
        " FROM e GROUP BY s)",
        "nodes AS (SELECT DISTINCT s AS v FROM e)",
        "nn AS (SELECT 1.0 / COUNT(*) AS inv_n FROM nodes)",
        "r0 AS (SELECT v, ROUND(inv_n, 9) AS r FROM nodes, nn)",
    ]
    for t in range(int(n_iters)):
        ctes.append(
            f"c{t} AS (SELECT e.d AS v, SUM(r.r / deg.od) AS c"
            f" FROM e JOIN deg ON e.s = deg.s"
            f" JOIN r{t} r ON r.v = e.s GROUP BY e.d)")
        ctes.append(
            f"r{t + 1} AS (SELECT nodes.v,"
            f" ROUND({1.0 - d} * inv_n"
            f" + {d} * coalesce(c{t}.c, 0.0), 9) AS r"
            f" FROM nodes LEFT JOIN c{t} ON nodes.v = c{t}.v, nn)")
    return ("WITH " + ", ".join(ctes)
            + f" SELECT v AS node, ROUND(r, 6) AS rank FROM r{int(n_iters)}")
