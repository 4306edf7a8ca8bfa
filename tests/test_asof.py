"""asof_join vs pandas.merge_asof (the reference semantics) on random
keyed time series, plus tolerance and tie rules."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    from gdal_spark.session import local_df

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2024-01-01")
    lrows = [
        (i, int(rng.integers(0, 5)),
         base + pd.Timedelta(seconds=int(rng.integers(0, 10_000))),
         float(i))
        for i in range(200)
    ]
    rrows = [
        (1000 + i, int(rng.integers(0, 5)),
         base + pd.Timedelta(seconds=int(rng.integers(0, 10_000))),
         float(1000 + i))
        for i in range(150)
    ]
    lf = local_df(spark, lrows, "event_id long, k int, ts timestamp, v double")
    rf = local_df(spark, rrows, "event_id long, k int, ts timestamp, v double")
    lp = pd.DataFrame(lrows, columns=["event_id", "k", "ts", "v"])
    rp = pd.DataFrame(rrows, columns=["event_id", "k", "ts", "v"])
    return lf, rf, lp, rp


def _merge_asof(lp, rp, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    # pre-dedup ties like the operator: keep max event_id per (k, ts)
    rp2 = (
        rp.sort_values(["k", "ts", "event_id"])
        .groupby(["k", "ts"], as_index=False)
        .last()
    )
    m = pd.merge_asof(
        lp.sort_values("ts"),
        rp2.sort_values("ts")[["k", "ts", "event_id", "v"]].rename(
            columns={"event_id": "asof_event_id", "v": "asof_v"}
        ),
        on="ts", by="k", direction="backward", allow_exact_matches=True, **kw,
    )
    return m.set_index("event_id")[["asof_event_id", "asof_v"]].to_dict("index")


def test_matches_merge_asof(spark, frames):
    lf, rf, lp, rp = frames
    got = {
        r["event_id"]: (r["asof_event_id"], r["asof_v"])
        for r in asof_join(
            lf, rf, on="k", value_cols=["event_id", "v"], seq_col="event_id"
        ).collect()
    }
    want = _merge_asof(lp, rp)
    assert len(got) == len(want)
    for eid, w in want.items():
        g = got[eid]
        we = None if pd.isna(w["asof_event_id"]) else int(w["asof_event_id"])
        wv = None if pd.isna(w["asof_v"]) else w["asof_v"]
        assert (g[0], g[1]) == (we, wv), (eid, g, w)


def test_tolerance(spark, frames):
    lf, rf, lp, rp = frames
    got = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(
            lf, rf, on="k", value_cols=["event_id", "v"], seq_col="event_id",
            tolerance_seconds=300,
        ).collect()
    }
    want = _merge_asof(lp, rp, tolerance=300)
    for eid, w in want.items():
        wv = None if pd.isna(w["asof_v"]) else w["asof_v"]
        assert got[eid] == wv, (eid, got[eid], w)


def test_exact_match_inclusive(spark):
    from gdal_spark.session import local_df

    t = pd.Timestamp("2024-01-01 12:00:00")
    lf = local_df(spark, [(1, 0, t, 1.0)], "event_id long, k int, ts timestamp, v double")
    rf = local_df(
        spark,
        [(10, 0, t, 5.0), (11, 0, t, 7.0)],  # tie at identical ts
        "event_id long, k int, ts timestamp, v double",
    )
    out = asof_join(
        lf, rf, on="k", value_cols=["event_id", "v"], seq_col="event_id"
    ).collect()
    assert out[0]["asof_event_id"] == 11  # inclusive + max-seq tie rule
    assert out[0]["asof_v"] == 7.0


def test_range_join_vs_quadratic(spark, frames):
    """Bucketed interval join == the quadratic BETWEEN join, including
    pairs spanning bucket boundaries; left mode keeps unmatched points."""
    from gdal_spark.operators.asof import range_join

    lf, rf, lp, rp = frames
    intervals = rf.select(
        "k",
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 17 MINUTES")).alias("end_ts"),
    )
    got = {
        (r["event_id"], r["iv_id"])
        for r in range_join(
            lf, intervals, on="k", bucket_seconds=300
        ).collect()
    }
    want = {
        (l["event_id"], r["event_id"])
        for _, l in lp.iterrows()
        for _, r in rp.iterrows()
        if l["k"] == r["k"]
        and r["ts"] <= l["ts"] <= r["ts"] + pd.Timedelta(minutes=17)
    }
    assert got == want
    left = range_join(lf, intervals, on="k", bucket_seconds=300, how="left")
    assert left.filter(F.col("iv_id").isNull()).count() == len(
        set(lp["event_id"]) - {e for e, _ in want}
    )


def test_range_join_left_null_payload(spark):
    """A matched point with a NULL payload column must appear exactly
    once (the unmatched-detection anti-join is by row id, not by
    null-unsafe column equality)."""
    import pandas as pd
    from gdal_spark.session import local_df
    from gdal_spark.operators.asof import range_join

    t = pd.Timestamp("2024-01-01 12:00:00")
    pts = local_df(
        spark,
        [(1, 0, t, None), (2, 0, t + pd.Timedelta(days=30), "x"),
         (3, 0, t, None)],
        "pid int, k int, ts timestamp, payload string",
    )
    ivs = local_df(
        spark,
        [(0, 100, t - pd.Timedelta(hours=1), t + pd.Timedelta(hours=1))],
        "k int, iv_id int, start_ts timestamp, end_ts timestamp",
    )
    out = range_join(pts, ivs, on="k", how="left").collect()
    by_pid = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r)
    assert len(by_pid[1]) == 1 and by_pid[1][0]["iv_id"] == 100
    assert len(by_pid[3]) == 1 and by_pid[3][0]["iv_id"] == 100
    assert len(by_pid[2]) == 1 and by_pid[2][0]["iv_id"] is None
    assert len(out) == 3
