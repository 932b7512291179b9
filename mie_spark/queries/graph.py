"""Join & graph-traversal coverage: SURVEY.md §2.3 (J1-J7) plus the
relationship-analytics layer the north star adds (multi-hop, triangles,
connected components) — all expressed as DataFrame joins so Catalyst
picks broadcast-hash vs sort-merge per side size, with AQE re-planning
at runtime.

The reference's graph is relational adjacency (edge tables joined to
node tables, schema.go:97-132); the TPC-H-ish corpus plays the same
role here: `lineitem` is an edge table (order)-[lineitem]->(part,supplier),
`orders` is an edge (customer)-[orders]->(...), `nation`/`region` are
small dimension nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mie_spark.operators.graph import bfs, connected_components, pagerank
from mie_spark.queries import query
from mie_spark.queries.relational import (
    REVENUE_SQL,
    cents,
    revenue_col,
    share_half_up_4dp,
)
from mie_spark.sources import load_table

def _ring_base(s: DataFrame, *extra_cols: str) -> DataFrame:
    """Shared synthetic-graph construction for the iterative-analytics
    queries: each supplier points at the next suppkey in its nation
    (wrapping to the nation minimum), so every nation forms a directed
    ring. Returns (u, nxt, mn[, extra...]); ``_ring_edges`` folds the
    wrap. One definition — the four oracles' `base`/`e` CTEs replay it
    and MUST stay in lockstep with this."""
    wo = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    wp = Window.partitionBy("s_nationkey")
    return s.select(
        F.col("s_suppkey").alias("u"),
        *extra_cols,
        F.lead("s_suppkey").over(wo).alias("nxt"),
        F.min("s_suppkey").over(wp).alias("mn"),
    )


def _ring_edges(s: DataFrame) -> DataFrame:
    base = _ring_base(s)
    return base.select(
        F.col("u").alias("src"), F.coalesce("nxt", "mn").alias("dst")
    )


# --- J1: edge→node 2-hop traversal (reader.go:463-487) --------------------

@query(
    "j1_two_hop_traversal",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {REVENUE_SQL} AS revenue,
           strftime(any_value(o.o_orderdate), '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey
    """,
)
def j1_two_hop_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact→edge→entity 2-hop parity (filtered start node, hop across an
    edge table, project the far node). Customer side is filtered *before*
    the join so the broadcast side is small; at cluster scale AQE sees
    the post-filter size and converts to a broadcast-hash join."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(li.l_orderkey.alias("orderkey"))
        .agg(
            revenue_col().alias("revenue"),
            F.date_format(F.any_value(F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "orderdate"
            ),
        )
    )


# --- J3: traversal carrying edge attribute (reader.go:515-545) -------------

@query(
    "j3_edge_attr_traversal",
    oracle="""
    SELECT p.p_partkey, p.p_name, s.s_name AS supplier_name,
           l.l_quantity AS qty, l.l_orderkey, l.l_linenumber
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity > 45
    """,
)
def j3_edge_attr_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision→entity-with-role parity: the edge's own attribute
    (l_quantity ≈ `role`) survives the join. Both dimension sides are
    broadcast-sized; explicit hint on supplier (always tiny) keeps the
    plan shuffle-free even without AQE."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("supplier_name"),
            F.col("l_quantity").alias("qty"),
            "l_orderkey",
            "l_linenumber",
        )
    )


# --- J4: reverse traversal (reader.go:590-614) -----------------------------

@query(
    "j4_reverse_traversal",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_suppliers,
           sum(CAST(round(s.s_acctbal * 100) AS BIGINT))::DOUBLE / 100
             AS total_bal
    FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j4_reverse_traversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity→incoming-edges parity (which suppliers point at this
    nation), aggregated per target node. Balance totals sum in integer
    cents (the `cents` convention): a double sum's accumulation order
    differs across engines, and at enough suppliers per nation a 1-ulp
    drift near a .xx5 boundary flips round(x, 2)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (F.sum(cents("s_acctbal")).cast("double") / 100).alias("total_bal"),
        )
    )


# --- J6: two-direction union join as ONE pass (reader.go:547-583) ----------

@query(
    "j6_union_join_single_pass",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
    FROM lineitem
    WHERE l_partkey = 7 OR l_suppkey = 7
    """,
)
def j6_union_join_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invalidation-chain parity: the reference unions two Datalog rules
    because CozoDB's or() can't wrap `=` (reader.go:550). One OR filter
    replaces the union — a single scan instead of two."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_partkey") == 7) | (F.col("l_suppkey") == 7))
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    )


# --- multi-way join: TPC-H-Q5-style local supplier volume ------------------

@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           {REVENUE_SQL} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way join. Join order: facts (lineitem⋈orders⋈customer) shuffle on
    keys; dimensions (supplier, nation, region) broadcast. The
    c_nationkey = s_nationkey equi-condition rides the supplier join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(revenue_col().alias("revenue"))
    )


# --- graph analytics: triangle count (north-star extension) ----------------

@query(
    "g_triangle_count",
    oracle="""
    WITH e AS (
      SELECT a.s_suppkey AS u, b.s_suppkey AS v
      FROM supplier a JOIN supplier b
        ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    )
    SELECT count(*) AS triangles
    FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the co-located-supplier graph via the
    canonical oriented-edge 3-way self-join (u<v ordering kills the 6×
    symmetry). This is the standard distributed formulation — shuffle on
    edge endpoints, no vertex-centric state."""
    s = load_table(spark, sf_dir, "supplier")
    a, b = s.alias("a"), s.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
            & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
        )
        .select(F.col("a.s_suppkey").alias("u"), F.col("b.s_suppkey").alias("v"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


# --- iterative analytics: connected components & PageRank ------------------
# (north-star extension; operators in mie_spark/operators/graph.py)

@query(
    "g_connected_components",
    oracle="""
    SELECT s_suppkey AS node,
           min(s_suppkey) OVER (PARTITION BY s_nationkey) AS component
    FROM supplier
    """,
)
def g_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic iterative connected components (hash-min + pointer
    jumping) run on a supplier chain graph: each supplier links to the
    next suppkey in its nation, so every nation forms one path. The
    oracle derives the same answer in closed form (component = min
    suppkey per nation) — the Spark side has no idea the graph is a
    path, so the hash proves the fixpoint loop converged correctly."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    edges = (
        s.select(
            F.col("s_suppkey").alias("src"),
            F.lead("s_suppkey").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    nodes = s.select(F.col("s_suppkey").alias("node"))
    return connected_components(edges, nodes)


@query(
    "g_pagerank",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT s_suppkey AS u,
             lead(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS nxt,
             min(s_suppkey) OVER (PARTITION BY s_nationkey) AS mn
      FROM supplier
    ),
    e AS (
      SELECT u, v FROM (
        SELECT u, coalesce(nxt, mn) AS v FROM base
        UNION ALL
        SELECT u, mn AS v FROM base WHERE u <> mn
      ) t
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) t
    ),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT u, count(*)::DOUBLE AS d FROM e GROUP BY u),
    pr(iter, node, rank) AS (
      SELECT 0, node, 1.0::DOUBLE / (SELECT n FROM nn) FROM nodes
      UNION ALL
      SELECT p.iter + 1, e.v AS node,
             0.15::DOUBLE / (SELECT n FROM nn)
               + 0.85::DOUBLE * sum(p.rank / deg.d)
      FROM pr p
      JOIN deg ON deg.u = p.node
      JOIN e ON e.u = p.node
      WHERE p.iter < 8
      GROUP BY p.iter, e.v
    )
    SELECT node, round(rank, 6) AS rank FROM pr WHERE iter = 8
    """,
)
def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (8 rounds, d=0.85) on a supplier graph
    where every node has in- and out-edges: a ring per nation (next
    suppkey, wrapping) plus a shortcut edge to the nation minimum. The
    oracle replays the exact recurrence as a DuckDB recursive CTE —
    two engines, one recurrence, matching to 1e-6.

    NOTE (DuckDB quirk): under WITH RECURSIVE, DuckDB 1.0 treats any
    CTE whose top level is a set operation as seed/step and duplicates
    rows — every union above is wrapped in a derived table to avoid it.
    """
    s = load_table(spark, sf_dir, "supplier")
    base = _ring_base(s)
    ring = base.select("u", F.coalesce("nxt", "mn").alias("v"))
    tomin = base.filter(F.col("u") != F.col("mn")).select("u", F.col("mn").alias("v"))
    edges = ring.unionByName(tomin).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    ranks = pagerank(edges, iterations=8, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# --- multi-hop BFS traversal (north-star extension) -------------------------

@query(
    "g_bfs_hops",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT s_suppkey AS u,
             lead(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS nxt,
             min(s_suppkey) OVER (PARTITION BY s_nationkey) AS mn
      FROM supplier
    ),
    e AS (SELECT u, coalesce(nxt, mn) AS v FROM base),
    walk(node, dist) AS (
      SELECT (SELECT min(s_suppkey) FROM supplier), 0
      UNION ALL
      SELECT e.v, w.dist + 1
      FROM walk w JOIN e ON e.u = w.node
      WHERE w.dist < 12
    )
    SELECT node, min(dist) AS dist FROM walk GROUP BY node
    """,
)
def g_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-hop BFS neighborhood: hop distance from the minimum supplier
    around its nation's directed ring (next suppkey, wrapping). The
    reference's graph mode only ever does 1-hop joins
    (pkg/tools/query.go:153-165); this is the generic frontier-expansion
    traversal, truncated at a fixed radius — the realistic "k-hop
    neighborhood" ask, whose job count is bounded by k rather than by
    graph diameter (an unbounded-diameter walk over a 100 TB graph is a
    diameter-length chain of barriers no engine should sign up for).
    The oracle replays the walk as a recursive CTE with min-dist
    aggregation — the Spark side's visited-set dedup must produce
    exactly those minima."""
    s = load_table(spark, sf_dir, "supplier")
    edges = _ring_edges(s)
    # lazy 1-row aggregate, not .first(): no eager driver job at plan
    # construction, and an empty supplier table yields an empty (typed)
    # source frontier instead of a createDataFrame inference crash
    sources = s.agg(F.min("s_suppkey").alias("node")).filter(
        F.col("node").isNotNull()
    )
    return bfs(edges, sources, max_hops=12)


@query(
    "g_chain_motif",
    oracle="""
    WITH base AS (
      SELECT s_suppkey AS u,
             lead(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS nxt,
             min(s_suppkey) OVER (PARTITION BY s_nationkey) AS mn
      FROM supplier
    ),
    e AS (SELECT u AS src, coalesce(nxt, mn) AS dst FROM base)
    SELECT a.src AS n0, a.dst AS n1, b.dst AS n2
    FROM e a JOIN e b ON a.dst = b.src
    WHERE a.src <> a.dst AND a.src <> b.dst AND a.dst <> b.dst
    """,
)
def g_chain_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop path motif (a)->(b)->(c) with distinct nodes over the
    supplier ring — the generic join-chain traversal the reference's
    fixed graph modes special-case. The oracle is the same motif as
    explicit SQL self-joins."""
    s = load_table(spark, sf_dir, "supplier")
    edges = _ring_edges(s)
    from mie_spark.operators.graph import chain_motif

    return chain_motif(edges, hops=2, distinct_nodes=True)


@query(
    "g_sssp",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT s_suppkey AS u, s_acctbal,
             lead(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS nxt,
             min(s_suppkey) OVER (PARTITION BY s_nationkey) AS mn
      FROM supplier
    ),
    e AS (
      SELECT u AS src, coalesce(nxt, mn) AS dst,
             abs(CAST(round(s_acctbal * 100) AS BIGINT)) % 997 + 1 AS w
      FROM base
    ),
    walk(node, dist, hops) AS (
      SELECT (SELECT min(s_suppkey) FROM supplier), 0::BIGINT, 0
      UNION
      SELECT e.dst, w.dist + e.w, w.hops + 1
      FROM walk w JOIN e ON e.src = w.node
      WHERE w.hops < 12
    )
    SELECT node, min(dist)::BIGINT AS dist FROM walk GROUP BY node
    """,
)
def g_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (bounded Bellman-Ford, 12 relaxation
    rounds) over the per-nation supplier ring, edge weight derived
    from the source supplier's account balance in integer cents
    (order-independent integer arithmetic — engine-exact). Completes
    the iterative-graph family: CC (convergence loop), PageRank
    (fixed-point numeric), BFS (unweighted frontier), SSSP (weighted
    relaxation with early exit). The oracle enumerates every walk of
    at most 12 edges as a recursive CTE and takes per-node minima —
    exactly the set Bellman-Ford with 12 rounds minimizes over."""
    from mie_spark.operators.graph import sssp
    from mie_spark.queries.relational import REVENUE_SQL, cents, revenue_col

    s = load_table(spark, sf_dir, "supplier")
    base = _ring_base(s, "s_acctbal")
    edges = base.select(
        F.col("u").alias("src"),
        F.coalesce("nxt", "mn").alias("dst"),
        (F.abs(cents("s_acctbal")) % 997 + 1).alias("w"),
    )
    # lazy typed frontier (see g_bfs_hops): empty-safe, no eager job
    sources = s.agg(F.min("s_suppkey").alias("node")).filter(
        F.col("node").isNotNull()
    )
    return sssp(edges, sources, max_hops=12)


# THE planted-density doc graph — single source of truth for every
# query that analyzes it (g_kcore, g_labelprop): nodes pair within
# 50-doc blocks, an md5 rule keeps each candidate edge with a
# per-block density from ~6% to ~72%. The oracle CTE prefix and the
# Spark helper below MUST stay in lockstep; that is the point of there
# being exactly one of each (same convention as _ring_base).
_PLANTED_EDGES_CTE = """
    WITH ids AS MATERIALIZED (SELECT doc_id, doc_id // 50 AS blk FROM documents),
    e0 AS MATERIALIZED (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM ids a JOIN ids b ON a.blk = b.blk AND a.doc_id < b.doc_id
      WHERE ('0x' || substr(md5(a.doc_id::VARCHAR || '_' || b.doc_id::VARCHAR), 1, 2))::INTEGER
            < 16 + 24 * (a.blk % 8)
    )"""


def _planted_edges(docs: DataFrame) -> DataFrame:
    """Spark twin of ``_PLANTED_EDGES_CTE``: (src, dst) with src < dst."""
    ids = docs.select("doc_id", F.expr("doc_id div 50").alias("blk"))
    a = ids.alias("a")
    b = ids.alias("b")
    pair_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("a.doc_id").cast("string"),
                    F.lit("_"),
                    F.col("b.doc_id").cast("string"),
                )
            ),
            1,
            2,
        ),
        16,
        10,
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(pair_hash < 16 + 24 * (F.col("a.blk") % 8))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )


def _kcore_oracle(k: int = 10, rounds: int = 8) -> str:
    """Unrolled peel oracle. Each round MUST be MATERIALIZED: the peel
    references the previous round three times (degree count + two IN
    filters), so naive CTE inlining is 3^rounds copies of the base —
    DuckDB actually exhausts file handles on the inlined form."""
    s = _PLANTED_EDGES_CTE
    cur = "e0"
    for i in range(rounds):
        s += f""",
    d{i} AS MATERIALIZED (
      SELECT node, count(*) AS c FROM (
        SELECT src AS node FROM {cur} UNION ALL SELECT dst FROM {cur}
      ) GROUP BY node),
    keep{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE c >= {k}),
    e{i + 1} AS MATERIALIZED (
      SELECT src, dst FROM {cur}
      WHERE src IN (SELECT node FROM keep{i})
        AND dst IN (SELECT node FROM keep{i}))"""
        cur = f"e{i + 1}"
    return s + f"""
    SELECT node, count(*) AS deg FROM (
      SELECT src AS node FROM {cur} UNION ALL SELECT dst FROM {cur}
    ) GROUP BY node
    """


@query("g_kcore", oracle=_kcore_oracle())
def g_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=10, peel budget 8 rounds) — the
    community-pruning / spam-filtering primitive — over a planted-
    density graph derived deterministically from doc ids: nodes pair
    within 50-doc blocks, an md5 rule keeps each candidate edge with a
    per-block density from ~6% to ~72%, so sparse blocks peel away
    entirely while marginal blocks cascade over several rounds (the
    sf0.01 graph takes 4 peels to converge: 4105→3546→3397→3283→3239
    edges). The Spark side runs the generic bounded-round peel
    (operators/graph.py kcore: degree agg + two semi-joins per round,
    checkpoint-truncated lineage, early exit); the oracle replays
    exactly the same rounds as unrolled MATERIALIZED CTEs, so the hash
    proves the iterative loop converged to the identical core."""
    from mie_spark.operators.graph import kcore

    docs = load_table(spark, sf_dir, "documents")
    return kcore(_planted_edges(docs), k=10, rounds=8)


def _labelprop_oracle(rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation oracle over the same
    planted-density doc graph as g_kcore. Every round is MATERIALIZED
    for the same reason as the kcore oracle (each round is referenced
    by count + argmax + join; naive inlining is exponential)."""
    s = _PLANTED_EDGES_CTE + """,
    und AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM und)"""
    for i in range(rounds):
        s += f""",
    c{i} AS MATERIALIZED (
      SELECT u.src AS node, l.label, count(*) AS c
      FROM und u JOIN l{i} l ON l.node = u.dst GROUP BY 1, 2),
    p{i} AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
        FROM c{i}) WHERE rn = 1),
    l{i + 1} AS MATERIALIZED (
      SELECT o.node, coalesce(p.label, o.label) AS label
      FROM l{i} o LEFT JOIN p{i} p USING (node))"""
    return s + f"""
    SELECT node, label FROM l{rounds}
    """


@query("g_labelprop", oracle=_labelprop_oracle())
def g_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (4 rounds)
    over the planted-density doc graph — the lighter-weight sibling of
    connected components for community structure: where CC's hash-min
    collapses every connected block to one id, majority-vote labels
    settle into intra-block communities shaped by the planted edge
    density. The oracle replays the IDENTICAL synchronous rounds as
    unrolled MATERIALIZED CTEs (count → deterministic argmax → update),
    so the hash proves the distributed loop's every round, not just a
    fixpoint. Same graph construction as g_kcore — one definition of
    the planted edges on each side."""
    from mie_spark.operators.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents")
    return label_propagation(_planted_edges(docs), rounds=4)


# --- link prediction: co-purchase neighborhood Jaccard ----------------------

@query(
    "g_copurchase_jaccard",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1996-07-01'
    ), cold AS (
      SELECT part FROM e GROUP BY part HAVING count(*) <= 32
    ), deg AS (
      SELECT cust, count(*)::BIGINT AS deg FROM e GROUP BY cust
    ), pairs AS (
      SELECT a.cust AS cust_a, b.cust AS cust_b, count(*)::BIGINT AS common
      FROM e a
      JOIN e b ON a.part = b.part AND a.cust < b.cust
      JOIN cold ON cold.part = a.part
      GROUP BY a.cust, b.cust
    )
    SELECT p.cust_a, p.cust_b, p.common,
           da.deg AS deg_a, db.deg AS deg_b,
           ((2 * p.common * 10000 + (da.deg + db.deg - p.common))
            // (2 * (da.deg + db.deg - p.common))) / 10000.0 AS jaccard
    FROM pairs p
    JOIN deg da ON da.cust = p.cust_a
    JOIN deg db ON db.cust = p.cust_b
    WHERE p.common >= 2
      AND 5 * p.common >= da.deg + db.deg
    """,
)
def g_copurchase_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard over the customer-part
    co-purchase bipartite graph (one ship-half-year window): customer
    pairs whose purchased-part sets overlap by >= 2 parts and Jaccard
    >= 0.25. The pair generation is an INVERTED-INDEX equi-join on
    part (a.cust < b.cust kills symmetry) with a document-frequency
    cap on hot parts (> 32 buyers contribute no pairs — the same
    candidate-blowup bound as dedup_ngram_jaccard, mirrored in the
    oracle so the cap is part of the graded semantics). The Jaccard
    cut is cross-multiplied (5*common >= deg_a+deg_b <=> J >= 1/4):
    pure BIGINT, no float boundary; the reported jaccard is integer
    half-up to 4 decimals. Shuffles carry (cust, part, deg) ids only —
    never text or vectors. At 100 TB the cap bounds per-part pair
    fan-out at C(32,2), so the pair stream is linear in edges.

    Plan shape (4 exchanges, no recompute): the naive form (edge set
    referenced by the index join, both self-join sides, AND two degree
    joins) re-evaluates the lineitem⋈orders subtree five times — 13
    exchanges. Instead the degree is attached to each edge by a window
    over the SAME edge pass, the per-part member list is collected
    once ((cust, deg) structs, cap-filtered), pairs are generated
    IN-ROW by a double explode of the cap-bounded list (map-side,
    a.cust < b.cust kills symmetry), and the final aggregate counts
    common parts per pair — degrees ride along, so no join back."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    e = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    w = Window.partitionBy("cust")
    ed = e.withColumn("deg", F.count(F.lit(1)).over(w))
    members = (
        ed.groupBy("part")
        .agg(F.collect_list(F.struct("cust", "deg")).alias("ms"))
        .filter(F.size("ms") <= 32)
    )
    pairs = (
        members.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.cust") < F.col("b.cust"))
        .groupBy(
            F.col("a.cust").alias("cust_a"),
            F.col("b.cust").alias("cust_b"),
            F.col("a.deg").alias("deg_a"),
            F.col("b.deg").alias("deg_b"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    union_sz = F.col("deg_a") + F.col("deg_b") - F.col("common")
    jac = share_half_up_4dp(F.col("common"), union_sz)
    return (
        pairs.filter(
            (F.col("common") >= 2)
            & (5 * F.col("common") >= F.col("deg_a") + F.col("deg_b"))
        )
        .select("cust_a", "cust_b", "common", "deg_a", "deg_b", jac.alias("jaccard"))
    )


@query(
    "g_ppr",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT s_suppkey AS u,
             lead(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS nxt,
             min(s_suppkey) OVER (PARTITION BY s_nationkey) AS mn
      FROM supplier
    ),
    e AS (
      SELECT u, v FROM (
        SELECT u, coalesce(nxt, mn) AS v FROM base
        UNION ALL
        SELECT u, mn AS v FROM base WHERE u <> mn
      ) t
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) t
    ),
    srcs AS (SELECT min(s_suppkey) AS node FROM supplier GROUP BY s_nationkey),
    ns AS (SELECT count(*)::DOUBLE AS k FROM srcs),
    tele AS (
      SELECT node,
             CASE WHEN node IN (SELECT node FROM srcs)
                  THEN 1.0::DOUBLE / (SELECT k FROM ns) ELSE 0.0::DOUBLE END AS t
      FROM nodes
    ),
    deg AS (SELECT u, count(*)::DOUBLE AS d FROM e GROUP BY u),
    pr(iter, node, rank) AS (
      SELECT 0, node, t FROM tele
      UNION ALL
      SELECT p.iter + 1, e.v AS node,
             0.15::DOUBLE * min(tl.t) + 0.85::DOUBLE * sum(p.rank / deg.d)
      FROM pr p
      JOIN deg ON deg.u = p.node
      JOIN e ON e.u = p.node
      JOIN tele tl ON tl.node = e.v
      WHERE p.iter < 8
      GROUP BY p.iter, e.v
    )
    SELECT node, round(rank, 6) AS rank FROM pr WHERE iter = 8
    """,
)
def g_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank on the same supplier ring graph as
    g_pagerank, with teleport landing uniformly on the nation-minimum
    hub set (the seed-set-similarity ranking recommenders run). The
    algorithm is a NEW step closure over the shared
    aggregate_messages/pregel primitive — same superstep shuffle
    discipline, same lazy-checkpoint cadence as pagerank, zero new loop
    code. Oracle replays the identical recurrence (init = teleport
    vector, 8 rounds of 0.15*tele + 0.85*incoming) as a recursive CTE,
    wrapped-unions per the DuckDB seed/step quirk noted on g_pagerank."""
    from mie_spark.operators.graph import personalized_pagerank

    s = load_table(spark, sf_dir, "supplier")
    base = _ring_base(s)
    ring = base.select("u", F.coalesce("nxt", "mn").alias("v"))
    tomin = base.filter(F.col("u") != F.col("mn")).select("u", F.col("mn").alias("v"))
    edges = ring.unionByName(tomin).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    srcs = s.groupBy("s_nationkey").agg(F.min("s_suppkey").alias("node")).select("node")
    ranks = personalized_pagerank(edges, srcs, iterations=8, damping=0.85)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


@query(
    "g_hits",
    oracle="""
    WITH RECURSIVE
    base AS (
      SELECT s_suppkey AS u,
             lead(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS nxt,
             min(s_suppkey) OVER (PARTITION BY s_nationkey) AS mn
      FROM supplier
    ),
    e AS (
      SELECT u, v FROM (
        SELECT u, coalesce(nxt, mn) AS v FROM base
        UNION ALL
        SELECT u, mn AS v FROM base WHERE u <> mn
      ) t
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) t
    ),
    d AS (
      SELECT sender, receiver, fwd FROM (
        SELECT u AS sender, v AS receiver, 1 AS fwd FROM e
        UNION ALL
        SELECT v AS sender, u AS receiver, 0 AS fwd FROM e
      ) t
    ),
    hs(iter, node, hub, auth) AS (
      SELECT 0, node, 1.0::DOUBLE, 1.0::DOUBLE FROM nodes
      UNION ALL
      SELECT h.iter + 1, d.receiver AS node,
             sum(CASE WHEN d.fwd = 0 THEN h.auth ELSE 0.0::DOUBLE END),
             sum(CASE WHEN d.fwd = 1 THEN h.hub ELSE 0.0::DOUBLE END)
      FROM hs h JOIN d ON d.sender = h.node
      WHERE h.iter < 8
      GROUP BY h.iter, d.receiver
    ),
    fin AS (SELECT node, hub, auth FROM hs WHERE iter = 8),
    nrm AS (SELECT sum(hub) AS hn, sum(auth) AS an FROM fin)
    SELECT node, round(hub / nrm.hn, 6) AS hub, round(auth / nrm.an, 6) AS auth
    FROM fin CROSS JOIN nrm
    """,
)
def g_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the supplier ring graph — the
    link-analysis complement of g_pagerank (authority = pointed at by
    good hubs, hub = points at good authorities), 8 simultaneous-update
    rounds, one L1 normalization at the end. Third algorithm composed
    from the shared aggregate_messages/pregel primitive with zero new
    loop code; the first to exercise the primitive's BIDIRECTIONAL
    message path (struct messages both ways in one superstep). The
    oracle replays the identical recurrence as a recursive CTE with a
    direction-tagged edge union (one recursive reference), wrapped
    unions per the DuckDB seed/step quirk noted on g_pagerank."""
    from mie_spark.operators.graph import hits

    s = load_table(spark, sf_dir, "supplier")
    # ring + nation-min shortcut (the g_ppr graph): the pure cycle has
    # in-degree 1 everywhere, where HITS is degenerately uniform — the
    # shortcut edges give the hubs/authorities something to rank.
    base = _ring_base(s)
    ring = base.select("u", F.coalesce("nxt", "mn").alias("v"))
    tomin = base.filter(F.col("u") != F.col("mn")).select(
        "u", F.col("mn").alias("v")
    )
    edges = ring.unionByName(tomin).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    out = hits(edges, iterations=8)
    return out.select(
        "node", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    )


# --- deterministic random-walk corpus (graph-ML sampling) --------------------

@query(
    "g_random_walks",
    oracle="""
    WITH e AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    s0 AS (SELECT DISTINCT c FROM e WHERE c % 50 = 0),
    s1 AS (
      SELECT e.c, arg_min(e.p, md5('s1:' || e.c || ':' || e.p)) AS p1
      FROM e JOIN s0 USING (c) GROUP BY e.c
    ),
    s2 AS (
      SELECT s1.c, s1.p1,
             arg_min(e.c, md5('s2:' || s1.p1 || ':' || e.c)) AS c2
      FROM s1 JOIN e ON e.p = s1.p1 GROUP BY s1.c, s1.p1
    ),
    s3 AS (
      SELECT s2.c, s2.p1, s2.c2,
             arg_min(e.p, md5('s3:' || s2.c2 || ':' || e.p)) AS p3
      FROM s2 JOIN e ON e.c = s2.c2 GROUP BY s2.c, s2.p1, s2.c2
    )
    SELECT c AS start_c, p1, c2, p3 FROM s3
    """,
)
def g_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-walk corpus over the customer-part
    co-purchase bipartite graph — the sampling pass graph-embedding
    pipelines (DeepWalk/node2vec/Pixie) run before training: from each
    sampled start customer, walk c -> p1 -> c2 -> p3, each hop chosen
    by argmin md5(step, src, dst) over the out-neighbors. The md5 key
    makes the walk a PURE FUNCTION of the graph (reproducible shards,
    resumable jobs, and a DuckDB-replayable oracle) while distributing
    choice uniformly like a seeded RNG would.

    Scale shape: each hop is one equi-join on the frontier key plus a
    map-combined arg-min aggregate — per-walk state is one row, never
    a collected neighbor list, so a hot node (10^6 out-edges) costs
    one combine pass instead of a memory spike. The edge table is
    localCheckpoint-ed once (the pregel convention) so the three hops
    reuse the materialized edges instead of re-running the
    orders x lineitem join per step. Walk length and start-sampling
    rate are the two knobs; at 100 TB both scale the corpus linearly
    — the plan shape is constant in walk length."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def hop_key(step: str, src, dst) -> F.Column:
        return F.md5(
            F.concat_ws(
                ":", F.lit(step), src.cast("string"), dst.cast("string")
            )
        )

    starts = e.select("c").distinct().filter(F.col("c") % 50 == 0)
    s1 = (
        starts.join(e, "c")
        .groupBy("c")
        .agg(F.min_by("p", hop_key("s1", F.col("c"), F.col("p"))).alias("p1"))
    )
    # each hop joins a RENAMED copy of the edge table — self-join
    # lineage makes bare column references ambiguous
    e2 = e.select(F.col("p").alias("p_in"), F.col("c").alias("c_out"))
    s2 = (
        s1.join(e2, F.col("p1") == F.col("p_in"))
        .groupBy("c", "p1")
        .agg(
            F.min_by(
                "c_out", hop_key("s2", F.col("p1"), F.col("c_out"))
            ).alias("c2")
        )
    )
    e3 = e.select(F.col("c").alias("c_in"), F.col("p").alias("p_out"))
    s3 = (
        s2.join(e3, F.col("c2") == F.col("c_in"))
        .groupBy("c", "p1", "c2")
        .agg(
            F.min_by(
                "p_out", hop_key("s3", F.col("c2"), F.col("p_out"))
            ).alias("p3")
        )
    )
    return s3.select(F.col("c").alias("start_c"), "p1", "c2", "p3")


# --- maximal independent set (Luby, deterministic priorities) ----------------


def _mis_oracle(rounds: int = 3) -> str:
    """Unrolled Luby oracle over the planted graph: per round,
    MATERIALIZED CTEs replay phase 1 (join the set when (md5(r:node),
    node) is strictly below every undecided neighbor's) and phase 2
    (neighbors of new members drop out) — ROW() comparison matches
    Spark's struct ordering, md5-of-varchar matches F.md5 byte for
    byte (both hash UTF-8)."""
    s = _PLANTED_EDGES_CTE + """,
    sym AS MATERIALIZED (
      SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
    ),
    s0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, 0 AS status FROM sym
    )"""
    cur = "s0"
    for i in range(rounds):
        s += f""",
    m1_{i} AS MATERIALIZED (
      SELECT e.dst AS node,
             min(ROW(md5('{i}:' || e.src::VARCHAR), e.src)) AS minp
      FROM sym e JOIN {cur} st ON st.node = e.src
      WHERE st.status = 0
      GROUP BY e.dst
    ),
    a{i} AS MATERIALIZED (
      SELECT st.node,
             CASE WHEN st.status <> 0 THEN st.status
                  WHEN m.minp IS NULL
                    OR ROW(md5('{i}:' || st.node::VARCHAR), st.node) < m.minp
                    THEN 1
                  ELSE 0 END AS status
      FROM {cur} st LEFT JOIN m1_{i} m ON m.node = st.node
    ),
    m2_{i} AS MATERIALIZED (
      SELECT e.dst AS node, max(1) AS near_mis
      FROM sym e JOIN a{i} st ON st.node = e.src
      WHERE st.status = 1
      GROUP BY e.dst
    ),
    s{i + 1} AS MATERIALIZED (
      SELECT st.node,
             CASE WHEN st.status = 0 AND m.near_mis = 1 THEN 2
                  ELSE st.status END AS status
      FROM a{i} st LEFT JOIN m2_{i} m ON m.node = st.node
    )"""
        cur = f"s{i + 1}"
    return s + f"""
    SELECT node, status::BIGINT AS status FROM {cur}
    """


@query("g_mis", oracle=_mis_oracle(rounds=3))
def g_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set (Luby) over the planted-density doc
    graph, THREE fixed rounds graded exactly: the oracle unrolls both
    phases of each round (priority argmin among undecided neighbors;
    out-propagation from new members), so the hash proves the pregel
    loop's message/reduce/update cadence — including how ties, nulls
    (no undecided neighbor), and the round budget interact — is
    bit-identical to the spec. Nodes still undecided after the budget
    report status 0 (part of the graded contract, the same
    bounded-round stance as g_kcore). MIS itself is the scheduling /
    conflict-free-batching primitive (pick a set of mutually
    non-conflicting items per wave)."""
    from mie_spark.operators.graph import luby_mis
    from mie_spark.queries.graph import _planted_edges

    docs = load_table(spark, sf_dir, "documents")
    return luby_mis(_planted_edges(docs), rounds=3, statuses=True)


@query(
    "g_link_prediction",
    oracle=_PLANTED_EDGES_CTE
    + """,
    und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src AS z, count(*)::BIGINT AS deg_z FROM und GROUP BY src),
    adj AS (
      SELECT u.src AS z, u.dst AS nbr, d.deg_z
      FROM und u JOIN deg d ON d.z = u.src
    ),
    pr AS (
      SELECT a.nbr AS node_a, b.nbr AS node_b,
             count(*)::BIGINT AS common,
             sum(1000000 // a.deg_z)::BIGINT AS ra_micro
      FROM adj a JOIN adj b ON a.z = b.z AND a.nbr < b.nbr
      GROUP BY a.nbr, b.nbr
    )
    SELECT p.node_a, p.node_b, p.common, p.ra_micro
    FROM pr p
    LEFT JOIN e0 ON e0.src = p.node_a AND e0.dst = p.node_b
    WHERE e0.src IS NULL AND p.common >= 2
    """,
)
def g_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by the Resource-Allocation index (Zhou, Lü &
    Zhang 2009) — for every NON-adjacent pair with ≥2 common
    neighbors, score = Σ_z 1/deg(z) over the common neighbors z. The
    per-neighbor contribution is emitted in integer micro-units
    (1e6 div deg_z, exact integral quotient on both engines), so the
    score hash-grades exactly — the graph-ML scoring analog of the
    cents doctrine; Adamic-Adar's ln(deg) would put a transcendental
    in every term, RA keeps it rational.

    Plan shape mirrors g_copurchase_jaccard's inverted index: deg(z)
    attaches to the adjacency by ONE window over the same pass (no
    join back), each hub z collects its (bounded, ≤ block-size)
    neighbor list once, candidate pairs generate IN-ROW by a double
    explode with a<b, and existing edges drop by a single left-anti
    join at the end. Shuffles carry (z, nbr, deg) longs only; the
    planted-graph block structure bounds fan-out at C(49,2) per hub —
    at open-web scale the same cap the copurchase query applies to
    hot hubs slots in here."""
    docs = load_table(spark, sf_dir, "documents")
    edges = _planted_edges(docs)
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = und.select(
        F.col("src").alias("z"),
        F.col("dst").alias("nbr"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg_z"),
    )
    hubs = adj.groupBy("z").agg(
        F.collect_list(F.struct("nbr", "deg_z")).alias("ms")
    )
    pairs = (
        hubs.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.nbr") < F.col("b.nbr"))
        .groupBy(
            F.col("a.nbr").alias("node_a"), F.col("b.nbr").alias("node_b")
        )
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.expr("1000000 div a.deg_z")).alias("ra_micro"),
        )
    )
    return (
        pairs.filter(F.col("common") >= 2)
        .join(
            edges,
            (pairs["node_a"] == edges["src"])
            & (pairs["node_b"] == edges["dst"]),
            "left_anti",
        )
        .select("node_a", "node_b", "common", "ra_micro")
    )
