"""dedup_embeddings: cluster correctness vs a numpy exact scan, and
LSH candidate recall vs the quadratic brute-force pair set."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
THRESH = 0.95


@pytest.fixture(scope="module")
def aug(spark):
    import __spark_entry__ as E

    return E._aug_embeddings(spark, SF).persist()


@pytest.fixture(scope="module")
def aug_np(aug):
    rows = aug.collect()
    ids = np.array([r["vid"] for r in rows])
    V = np.array([np.array(r["vec"], dtype=np.float64) for r in rows])
    return ids, V


def _brute_components(ids, V, thresh):
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    n = len(ids)
    # union-find over thresholded pairs
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    iu, ju = np.where(np.triu(C >= thresh, 1))
    for i, j in zip(iu, ju):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    rep = {}
    for i in range(n):
        r = find(i)
        rep.setdefault(r, []).append(i)
    out = {}
    for members in rep.values():
        m = min(int(ids[i]) for i in members)
        for i in members:
            out[int(ids[i])] = m
    return out, set(zip(ids[iu], ids[ju]))


def test_planted_clusters(spark, aug):
    """Exact copies ALWAYS land in their origin's cluster (identical
    vectors share every band bucket); blend chains (cos ~0.98, band
    collision ~1-(1-.35)^8 per edge) must cluster for >= 80% of groups —
    the operator is approximate by design, and the driver oracle
    replicates the banding so parity is still exact."""
    from gdal_spark.operators.dedup import dedup_embeddings

    got = {
        r["vec_id"]: r["rep_id"]
        for r in dedup_embeddings(aug, THRESH, id_col="vid", vec_col="vec").collect()
    }
    base_ids = [v for v in got if v < 100000]
    chain_ok = chain_n = 0
    for vid in base_ids:
        if vid % 25 == 0:
            assert got[vid + 100000] == got[vid]
        if vid % 50 == 0:
            chain_n += 1
            if got[vid + 200000] == got[vid] and got[vid + 300000] == got[vid]:
                chain_ok += 1
    assert chain_n > 0
    assert chain_ok / chain_n >= 0.8, (chain_ok, chain_n)


def test_candidate_recall_vs_brute(spark, aug, aug_np):
    """Banded LSH candidates must cover >= 90% of true cos>=0.95 pairs
    on the planted fixture (dups collide in every band; blends with
    cos ~0.98 collide in ~1-(1-0.35)^8 of cases)."""
    from gdal_spark.operators.similarity import _mp_bucket_expr, _mp_pairs

    ids, V = aug_np
    _, true_pairs = _brute_components(ids, V, THRESH)
    if not true_pairs:
        pytest.skip("fixture produced no true pairs")
    e = aug
    cand = set()
    for b in range(8):
        pairs = _mp_pairs(16, 64, seed=421 + b)
        eb = e.select(
            "vid",
            F.expr(_mp_bucket_expr("vec", pairs, False)).cast("long").alias("bucket"),
        )
        got = (
            eb.alias("a")
            .join(eb.alias("b"), "bucket")
            .filter(F.col("a.vid") < F.col("b.vid"))
            .select(F.col("a.vid").alias("la"), F.col("b.vid").alias("lb"))
            .collect()
        )
        cand.update((r["la"], r["lb"]) for r in got)
    hit = sum(1 for p in true_pairs if tuple(sorted(p)) in cand)
    recall = hit / len(true_pairs)
    assert recall >= 0.9, (recall, len(true_pairs))


def test_distributed_cc_matches_driver(spark, aug):
    """edge_threshold=0 forces the distributed min-label path; clusters
    must equal the driver union-find's."""
    from gdal_spark.operators.dedup import dedup_embeddings

    a = {
        r["vec_id"]: r["rep_id"]
        for r in dedup_embeddings(aug, THRESH, id_col="vid", vec_col="vec").collect()
    }
    b = {
        r["vec_id"]: r["rep_id"]
        for r in dedup_embeddings(
            aug, THRESH, id_col="vid", vec_col="vec", edge_threshold=0
        ).collect()
    }
    assert a == b


def test_matches_exact_union_find(spark, aug, aug_np):
    """Clusters computed by the Spark operator equal the exact scan's
    union-find RESTRICTED to pairs the banding surfaced — i.e. the
    operator is exactly 'candidates + threshold + CC', no more/less."""
    from gdal_spark.operators.dedup import dedup_embeddings

    ids, V = aug_np
    exact_rep, _ = _brute_components(ids, V, THRESH)
    got = {
        r["vec_id"]: r["rep_id"]
        for r in dedup_embeddings(aug, THRESH, id_col="vid", vec_col="vec").collect()
    }
    # operator reps can only be coarser-or-equal (missed candidates split
    # clusters, never merge wrong ones): every operator cluster must be a
    # subset of an exact cluster
    for vid, rep in got.items():
        assert exact_rep[vid] == exact_rep[rep], (vid, rep)
