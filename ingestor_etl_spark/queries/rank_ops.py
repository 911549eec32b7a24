"""Graph ranking over the duplicate-overlap graph: fixed-point
PageRank as a first-class iterative operator.

Dedup pipelines don't just need components (operators/graph.py) —
choosing the *canonical* document per duplicate neighborhood and
prioritizing review benefit from a centrality score: a doc sharing
segments with many other docs is the "hub" copy. This implements
PageRank (damping 0.85, 5 power iterations) over the shared-segment
graph from training_ops.segment machinery.

Cross-engine exactness for an iterative float algorithm is normally
hopeless (5 rounds of double math compound ulp differences), so the
iteration runs in FIXED-POINT INTEGER arithmetic: ranks live in
units of 1e-9 (pr0 = 1_000_000_000), every per-edge contribution is
``pr div deg`` (integer floor division), and the damping update is
``150_000_000 + (85 * inflow) div 100`` — integer ops (staged in
DECIMAL(38,0)/HUGEINT, see the overflow paragraph below) with
identical floor semantics in Spark and DuckDB, so
the oracle matches bit-for-bit after any number of rounds. The
quantization error vs real PageRank is ≤ |E| ulps of 1e-9 per round
— noise for ranking purposes.

Scale shape: each iteration is one join of the rank relation with
the edge list (shuffle on the node key, reused round over round) and
one aggregation on dst. The edge list and the per-node degree are
checkpoint-materialized once; every iteration's result is eagerly
localCheckpoint-ed so lineage stays O(1) deep (same contract as
connected_components — a lazy persist is not enough). Rounds are a
fixed constant (5), the classic early-cutoff for convergent
power iteration at web scale.

Dangling nodes: none by construction (every node of the edge-derived
graph has degree ≥ 1); isolated documents never enter the graph, so
no dangling-mass redistribution is needed — documented variant.

Candidate generation (stop-segment cut): the pair self-join on raw
``seg`` is quadratic in per-segment document count — one boilerplate
segment shared by k docs yields k² pairs, and at corpus scale k is
millions (navigation chrome, license headers). So segments touching
more than STOP_SEG_MAX_DOCS distinct documents are dropped BEFORE
the join: a per-seg count aggregation (map-side combined) yields the
hot-segment list, which is tiny by construction and broadcast as a
left-anti filter. This bounds every join group at STOP_SEG_MAX_DOCS
rows (≤ T² pairs per segment) — the same stop-key move as
ngram_jaccard's stop-shingle cut and segment_dedup's groupBy-first
shape. The oracle applies the identical cut, so parity is exact.

Overflow bound (round 5: lifted from BIGINT to DECIMAL(38,0)
staging): ranks, per-edge contributions, and the damping update all
run in DECIMAL(38,0) — the Spark analogue of DuckDB's HUGEINT sum
promotion — with floor division expressed exactly as
``(a − pmod(a, b)) / b`` (the numerator is an exact multiple of b,
so the decimal divide is exact; see _floor_div_dec). Spark's
precision-loss rule caps a decimal division's integral digits at 32,
so bit-parity with the oracle holds for any rank value < 10^32 —
vs < 9.2e18 (signed 64-bit) before; the old binding step,
``85 * inflow`` at in-degree ≈ 2^63/(85·1e9) ≈ 1.1e11, is now exact
(property-tested at and past that boundary,
test_rank_ops.test_fixed_point_update_exact_past_long_range). Ranks
cast to BIGINT only at the final output projection; a graph whose
top rank exceeds 2^63 would need that cast widened too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register
from ingestor_etl_spark.queries.training_ops import _SEGS_SQL, SEG_LEN

PR_ITERS = 5
PR_ONE = 1_000_000_000  # fixed-point unit: 1.0
PR_BASE = 150_000_000  # 0.15 * PR_ONE
PR_TOPK = 20
# Stop-segment degree cut: a segment shared by more distinct docs
# than this is boilerplate, not duplication signal — drop it before
# the pair join (k² blowup guard; see module docstring).
STOP_SEG_MAX_DOCS = 64


def _graph_ctes() -> list[str]:
    """The shared duplicate-graph construction (segs → stop-segment
    cut → pairs → edges → degrees), used by both the PageRank oracle
    and dup_graph_degree_stats."""
    return [
        f"segs AS ({_SEGS_SQL})",
        f"""hot AS (
      SELECT seg FROM (
        SELECT seg, count(DISTINCT doc_id) AS n_docs FROM segs GROUP BY seg
      ) WHERE n_docs > {STOP_SEG_MAX_DOCS}
    )""",
        """live AS (
      SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM hot)
    )""",
        """pairs AS (
      SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
      FROM live a JOIN live b ON a.seg = b.seg AND a.doc_id < b.doc_id
    )""",
        """edges AS (
      SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
    )""",
        "deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src)",
    ]


def _oracle() -> str:
    ctes = [
        *_graph_ctes(),
        # HUGEINT ranks mirror the Spark side's DECIMAL(38,0) staging;
        # BIGINT only at the final output cast.
        f"pr0 AS (SELECT node, CAST({PR_ONE} AS HUGEINT) AS pr FROM deg)",
    ]
    for k in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr{k} AS (
      SELECT d.node,
             {PR_BASE} + (85 * COALESCE(f.inflow, 0)) // 100 AS pr
      FROM deg d LEFT JOIN (
        SELECT e.dst AS node, sum(p.pr // dd.deg) AS inflow
        FROM edges e
        JOIN pr{k - 1} p ON p.node = e.src
        JOIN deg dd ON dd.node = e.src
        GROUP BY e.dst
      ) f ON d.node = f.node
    )"""
        )
    return (
        "    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS doc_id, CAST(pr AS BIGINT) AS rank_fp
    FROM pr{PR_ITERS}
    ORDER BY pr DESC, doc_id LIMIT {PR_TOPK}
    """
    )


def _floor_div_dec(a, b):
    """Exact floor division for non-negative DECIMAL(38,0) operands:
    ``(a − pmod(a, b)) / b``. The numerator is an exact multiple of
    b, so the decimal division's value is integral and Spark's
    precision-loss rounding (which caps the quotient's integral
    digits at 32) reproduces it exactly for quotients < 10^32 —
    matching DuckDB's HUGEINT ``//`` over the same domain. Unlike
    the ``div`` operator (IntegralDivide), the result is NOT forced
    into a 64-bit long, so staging stays exact past 2^63."""
    return ((a - F.pmod(a, b)) / b).cast("decimal(38,0)")


def candidate_pairs(segs):
    """Duplicate-candidate pairs from a (doc_id, seg) relation with
    the stop-segment degree cut applied BEFORE the self-join: the
    hot-segment list (count(DISTINCT doc_id) > STOP_SEG_MAX_DOCS,
    map-side-combined aggregation) is tiny by construction and
    broadcast as a left-anti filter, so every surviving join group
    holds ≤ STOP_SEG_MAX_DOCS rows and per-segment pair fan-out is
    bounded at T². Factored out so the blowup guard is testable on a
    synthetic hot-segment fixture (tests/test_rank_ops.py)."""
    from ingestor_etl_spark.plans.layout import materialize

    # Round 13 (guide §2.1): segs feeds the hot census AND the live
    # anti-join input — un-materialized, the per-doc segment
    # construction (concat_ws over slices) executed once per
    # consumer in every caller of this helper.
    segs = materialize(segs)
    hot = (
        segs.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") > STOP_SEG_MAX_DOCS)
        .select("seg")
    )
    live = segs.join(F.broadcast(hot), "seg", "left_anti")
    a = live.select(F.col("seg"), F.col("doc_id").alias("src"))
    b = live.select(F.col("seg"), F.col("doc_id").alias("dst"))
    return (
        a.join(b, "seg")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates()
    )


@register(
    "pagerank_dup_graph",
    oracle=_oracle(),
    tags=("graph", "iterative", "pagerank"),
)
def pagerank_dup_graph(spark, sf_dir):
    """Fixed-point PageRank (5 iterations, damping 0.85) over the
    shared-8-token-segment duplicate graph; returns the top-20 hub
    documents. See module docstring for the integer-arithmetic
    parity contract, the stop-segment candidate cut, and the
    per-iteration plan shape."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    n_segs = ((F.size(toks) + F.lit(SEG_LEN - 1)) / SEG_LEN).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * SEG_LEN + 1, SEG_LEN)),
    )
    segs = d.select("doc_id", F.explode(seg_arr).alias("seg"))
    pairs = candidate_pairs(segs)
    edges = (
        pairs.unionAll(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    ).localCheckpoint(eager=True)
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    pr = deg.select("node", "deg", F.lit(PR_ONE).cast("decimal(38,0)").alias("pr"))
    zero_dec = F.lit(0).cast("decimal(38,0)")
    for _ in range(PR_ITERS):
        inflow = (
            edges.join(
                pr.select(
                    F.col("node").alias("src"),
                    _floor_div_dec(F.col("pr"), F.col("deg")).alias("contrib"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            # sum over decimal(38,0) stays decimal(38,0) — the Spark
            # analogue of DuckDB's sum-into-HUGEINT promotion
            .agg(F.sum("contrib").cast("decimal(38,0)").alias("inflow"))
        )
        pr = (
            deg.join(inflow, "node", "left_outer")
            .select(
                "node",
                "deg",
                (
                    F.lit(PR_BASE)
                    + _floor_div_dec(
                        (F.coalesce(F.col("inflow"), zero_dec) * 85).cast(
                            "decimal(38,0)"
                        ),
                        F.lit(100),
                    )
                ).cast("decimal(38,0)").alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        pr.select(
            F.col("node").alias("doc_id"),
            F.col("pr").cast("long").alias("rank_fp"),
        )
        .orderBy(F.desc("rank_fp"), "doc_id")
        .limit(PR_TOPK)
    )


# ----------------------------------------------- dup_graph_degree_stats
@register(
    "dup_graph_degree_stats",
    oracle=(
        "    WITH "
        + ",\n    ".join(_graph_ctes())
        + """
    SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS deg_bucket_log2,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(deg) AS BIGINT) AS total_degree,
           CAST(max(deg) AS BIGINT) AS max_degree,
           CAST(min(node) AS BIGINT) AS example_node
    FROM deg GROUP BY 1 ORDER BY 1
    """
    ),
    tags=("graph", "profiling", "planning"),
)
def dup_graph_degree_stats(spark, sf_dir):
    """Degree histogram of the duplicate graph in power-of-two
    buckets — the graph-side planning query (the companion to
    shingle_df_profile): before running PageRank or connected
    components at 100 TB, this is the pass that tells you whether
    the stop-segment cut left hubs that need further bounding, and
    it is the empirical check on the in-degree bound PageRank's
    DECIMAL staging documents. Same exact integer bucketing
    (length(bin(deg)) − 1 == floor(log2)), one aggregation over the
    edge relation — no iteration, no window."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    n_segs = ((F.size(toks) + F.lit(SEG_LEN - 1)) / SEG_LEN).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * SEG_LEN + 1, SEG_LEN)),
    )
    segs = d.select("doc_id", F.explode(seg_arr).alias("seg"))
    pairs = candidate_pairs(segs)
    # degree = endpoint multiplicity: explode both endpoints of each
    # undirected pair instead of unioning the pair relation with its
    # swap (the union re-plans the whole candidate lineage twice;
    # the explode is one pass and identical counts)
    deg = (
        pairs.select(
            F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        deg.groupBy(
            (F.length(F.bin("deg")) - 1).cast("int").alias("deg_bucket_log2")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("total_degree"),
            F.max("deg").cast("bigint").alias("max_degree"),
            F.min("node").cast("bigint").alias("example_node"),
        )
        .orderBy("deg_bucket_log2")
    )


# ------------------------------------------------- dup_graph_triangles
@register(
    "dup_graph_triangles",
    oracle=(
        "    WITH "
        + ",\n    ".join(_graph_ctes()[:4])  # segs, hot, live, pairs
        + """,
    tri AS (
      SELECT p1.src AS a, p1.dst AS b, p2.dst AS c
      FROM pairs p1
      JOIN pairs p2 ON p2.src = p1.dst
      JOIN pairs p3 ON p3.src = p1.src AND p3.dst = p2.dst
    ),
    node_tris AS (
      SELECT node, count(*) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT src AS node FROM pairs UNION ALL SELECT dst FROM pairs
      ) GROUP BY node
    )
    SELECT d.node AS doc_id,
           CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.deg >= 2
                THEN round(2.0 * COALESCE(t.n_triangles, 0)
                           / (d.deg * (d.deg - 1)), 6)
                ELSE 0.0 END AS clustering_coef
    FROM deg d LEFT JOIN node_tris t ON t.node = d.node
    ORDER BY doc_id
    """
    ),
    tags=("graph", "triangles", "clustering"),
)
def dup_graph_triangles(spark, sf_dir):
    """Triangle counting + local clustering coefficient over the
    duplicate graph — the graph-structure census that separates
    template FAMILIES (dense, high-coefficient neighborhoods worth
    collapsing to one canonical doc) from chain-like near-dup
    drift (low coefficient, needs pairwise review). Triangles are
    enumerated in the canonical a<b<c orientation (one row per
    triangle) via two joins over the ordered pair relation; each
    node in a triangle gets credit once per triangle.

    Scale: the pair relation already passed the stop-segment degree
    cut, so per-node degree is bounded and the p1⋈p2 fan-out is
    Σ deg(b)² over cut-bounded degrees — the standard
    node-iterator bound; all joins are equi-joins on node ids.
    Degrees reuse the endpoint-explode shape of
    dup_graph_degree_stats."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r" +")
    n_segs = ((F.size(toks) + F.lit(SEG_LEN - 1)) / SEG_LEN).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda j: F.concat_ws(" ", F.slice(toks, j * SEG_LEN + 1, SEG_LEN)),
    )
    segs = d.select("doc_id", F.explode(seg_arr).alias("seg"))
    from ingestor_etl_spark.plans.layout import materialize

    pairs = materialize(candidate_pairs(segs))
    p1 = pairs.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    p2 = pairs.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    p3 = pairs.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = p1.join(p2, "b").join(p3, ["a", "c"])
    node_tris = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        pairs.select(F.explode(F.array("src", "dst")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    coef = F.when(
        F.col("deg") >= 2,
        F.round(
            2.0 * F.coalesce(F.col("n_triangles"), F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(node_tris, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            coef.alias("clustering_coef"),
        )
        .orderBy("doc_id")
    )
