"""Similarity search over embedding columns (array<float>).

  * `ann_brute` — exact cosine top-k: broadcast the query set, cross join,
    JVM-side dot product via zip_with + aggregate (no Python), window
    re-rank. The right baseline at any scale when |Q| is modest: one pass
    over the corpus, no shuffle of the corpus side, map-side top-k via
    the windowed rank over (query_id) partitions.
  * `ann_lsh` — scale path: sign-bit bucketing on the first SIGN_BITS
    dimensions (a deterministic hyperplane LSH with axis-aligned planes);
    probe only the query's bucket. Turns top-k into an equi-join on the
    bucket id. Recall < 1 by construction; the oracle replicates the same
    bucketing so correctness of the *implementation* is exactly testable,
    and recall itself is measured in tests against ann_brute.

Cross-engine determinism: ranks (not raw cosines) are the output; cosine
comparisons on random embeddings are never ulp-close, and exact ties
tie-break by vec_id on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import topk_per_group

SIGN_BITS = 8


def _rerank_cos(cand: DataFrame, k: int) -> DataFrame:
    """Salted two-phase top-k by cosine desc (no single-task-per-query
    sort; see operators/topk.py). Ties break by vec_id on both engines."""
    return topk_per_group(
        cand.withColumn("_negcos", -F.col("cos")),
        ["query_id"],
        [F.col("_negcos"), F.col("vec_id")],
        ["vec_id"],
        k,
        salt_col=F.pmod(F.col("vec_id"), F.lit(64)),
    ).select("query_id", "vec_id", F.col("rank").cast("int").alias("rank"))


def _cos_expr(a: str, b: str) -> str:
    """Cosine via explicit fold — mirrors the oracle's list_sum order."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
    na = f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v)"
    nb = f"aggregate({b}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * v)"
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def _cos_duck(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * {b}[i]))"
    na = f"list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * v))"
    nb = f"list_sum(list_transform({b}, v -> CAST(v AS DOUBLE) * v))"
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def queries_subset(emb: DataFrame, modulus: int = 50) -> DataFrame:
    return emb.filter(F.col("vec_id") % modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def ann_brute(emb: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, rank)."""
    cand = emb.crossJoin(F.broadcast(queries)).withColumn(
        "cos", F.expr(_cos_expr("embedding", "qvec"))
    )
    return _rerank_cos(cand, k)


def ann_brute_sql(k: int, modulus: int = 50, rel: str = "embeddings") -> str:
    cos = _cos_duck("e.embedding", "q.qvec")
    return f"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM {rel}
                 WHERE vec_id % {modulus} = 0)
      SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos} DESC, e.vec_id) AS rank
        FROM {rel} e, q
      ) WHERE rank <= {k}
    """


def _bucket_expr(vec: str) -> str:
    parts = [f"(CASE WHEN {vec}[{i}] > 0 THEN {2 ** i} ELSE 0 END)" for i in range(SIGN_BITS)]
    return "(" + " + ".join(parts) + ")"


def _bucket_duck(vec: str) -> str:
    parts = [
        f"(CASE WHEN {vec}[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END)" for i in range(SIGN_BITS)
    ]
    return "(" + " + ".join(parts) + ")"


def ann_lsh(emb: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Bucketed ANN: equi-join on sign-bit bucket, rank within bucket."""
    e = emb.withColumn("bucket", F.expr(_bucket_expr("embedding")))
    q = queries.withColumn("bucket", F.expr(_bucket_expr("qvec")))
    cand = e.join(F.broadcast(q), "bucket").withColumn(
        "cos", F.expr(_cos_expr("embedding", "qvec"))
    )
    return _rerank_cos(cand, k)


def ann_lsh_sql(k: int, modulus: int = 50, rel: str = "embeddings") -> str:
    cos = _cos_duck("e.embedding", "q.qvec")
    return f"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qvec,
                        {_bucket_duck('embedding')} AS bucket
                 FROM {rel} WHERE vec_id % {modulus} = 0)
      SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {cos} DESC, e.vec_id) AS rank
        FROM (SELECT vec_id, embedding, {_bucket_duck('embedding')} AS bucket
              FROM {rel}) e
        JOIN q ON e.bucket = q.bucket
      ) WHERE rank <= {k}
    """
