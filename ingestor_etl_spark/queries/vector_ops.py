"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the exact baseline; the LSH-bucketed
variant is the 100 TB scale path (bucket key turns the O(n²) cross
join into a per-bucket join). All vector math is native Spark
higher-order functions over array<double> — sequential left-fold
dot products match DuckDB's list_dot_product op-for-op, and outputs
are rounded to 4 decimals to absorb any residual FP noise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ingestor_etl_spark.catalog import load_table
from ingestor_etl_spark.queries import register

TOPK = 5
N_QUERIES = 20  # vec_id < 20 are the query vectors


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))), 4) AS cos_sim
      FROM e q JOIN e c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM pairs
    )
    SELECT query_id, neighbor_id, cos_sim, rnk
    FROM ranked WHERE rnk <= {TOPK}
    ORDER BY query_id, rnk
    """,
    tags=("vector", "ann", "brute-force"),
)
def ann_cosine_topk(spark, sf_dir):
    """Exact cosine top-k: broadcast the query vectors against the
    corpus (no shuffle of the big side), rank per query. This is the
    correctness baseline for ann_lsh_bucketed."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        F.broadcast(q)
        .join(e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")),
              F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOPK)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
        .orderBy("query_id", "rnk")
    )
