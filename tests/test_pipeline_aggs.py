"""histogram_pipeline: ES pipeline aggregations (derivative /
cumulative_sum / moving_fn trailing avg) over a parent histogram's
buckets — verified against a brute-force pandas recomputation of the
same definitions.
"""

import datetime as dt

import pytest

from gofias_spark.operators.events import date_histogram, histogram_pipeline


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for day, (a, b) in enumerate([(3, 1), (5, 2), (2, 2), (7, 0), (4, 3)]):
        for i in range(a):
            rows.append((eid, "u1", base + dt.timedelta(days=day, hours=i),
                         "click", float(i)))
            eid += 1
        for i in range(b):
            rows.append((eid, "u2", base + dt.timedelta(days=day, hours=i),
                         "view", float(i * 2)))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, user_id string, ts timestamp, event_type string, "
        "value double",
    )


def test_pipeline_matches_bruteforce(events):
    out = (
        histogram_pipeline(date_histogram(events, "day"), window=3)
        .orderBy("event_type", "bucket")
        .toPandas()
    )
    for _, g in out.groupby("event_type"):
        cnts = g["cnt"].tolist()
        # derivative: bucket-over-bucket delta, first bucket null
        assert g["derivative"].iloc[0] is None or g["derivative"].isna().iloc[0]
        for i in range(1, len(cnts)):
            assert g["derivative"].iloc[i] == cnts[i] - cnts[i - 1]
        # cumulative_sum: running total
        run = 0
        for i, c in enumerate(cnts):
            run += c
            assert g["cumulative_sum"].iloc[i] == run
        # moving_avg: trailing window of 3 INCLUDING current
        for i in range(len(cnts)):
            w = cnts[max(0, i - 2) : i + 1]
            assert g["moving_avg"].iloc[i] == pytest.approx(
                round(sum(w) / len(w), 6)
            )


def test_no_group_single_series(events):
    h = date_histogram(events, "day", group_col=None, value_col=None)
    out = histogram_pipeline(h, group_col=None, window=2).toPandas()
    cnts = out["cnt"].tolist()
    assert out["cumulative_sum"].tolist() == [
        sum(cnts[: i + 1]) for i in range(len(cnts))
    ]
    assert out["moving_avg"].iloc[-1] == pytest.approx(
        round((cnts[-2] + cnts[-1]) / 2, 6)
    )


def test_window_validation(events):
    h = date_histogram(events, "day")
    with pytest.raises(ValueError):
        histogram_pipeline(h, window=0)


# ---- bucket_script / bucket_selector / bucket_sort / bucket_stats -------

from gofias_spark.operators.events import (  # noqa: E402
    bucket_script,
    bucket_selector,
    bucket_sort,
    bucket_stats,
)


@pytest.fixture(scope="module")
def hist(spark, events):
    return date_histogram(events, "day")


def test_bucket_script_derives_expression(hist):
    out = bucket_script(hist, {"ratio": "round(sum_value / cnt, 4)"})
    pdf = out.toPandas()
    for _, r in pdf.iterrows():
        assert r["ratio"] == round(r["sum_value"] / r["cnt"], 4)


def test_bucket_selector_filters_buckets(hist):
    pdf = hist.toPandas()
    kept = bucket_selector(hist, "cnt >= 3").toPandas()
    assert len(kept) == (pdf["cnt"] >= 3).sum()
    assert (kept["cnt"] >= 3).all()


def test_bucket_sort_per_group_topk(hist):
    out = bucket_sort(
        hist, [("cnt", "desc"), ("bucket", "asc")], size=2,
        group_col="event_type",
    ).toPandas()
    exp = (
        hist.toPandas()
        .sort_values(["cnt", "bucket"], ascending=[False, True])
        .groupby("event_type")
        .head(2)
    )
    for et in exp["event_type"].unique():
        got = out[out["event_type"] == et][["bucket", "cnt"]].values.tolist()
        want = exp[exp["event_type"] == et][["bucket", "cnt"]]
        want = want.sort_values(
            ["cnt", "bucket"], ascending=[False, True]
        ).values.tolist()
        assert got == want, et


def test_bucket_sort_global_offset_limit(hist):
    allb = bucket_sort(hist, [("cnt", "desc"), ("bucket", "asc")]).toPandas()
    page = bucket_sort(
        hist, [("cnt", "desc"), ("bucket", "asc")], size=2, from_=1
    ).toPandas()
    assert page.values.tolist() == allb.iloc[1:3].values.tolist()


def test_bucket_stats_across_siblings(hist):
    out = bucket_stats(hist, value_col="cnt", group_col="event_type")
    pdf = out.toPandas().set_index("event_type")
    exp = hist.toPandas().groupby("event_type")["cnt"]
    for et, g in exp:
        assert pdf.loc[et, "n_buckets"] == len(g)
        assert pdf.loc[et, "min_v"] == g.min()
        assert pdf.loc[et, "max_v"] == g.max()
        assert pdf.loc[et, "sum_v"] == round(float(g.sum()), 4)
        assert pdf.loc[et, "avg_v"] == round(g.mean(), 4)


def test_bucket_stats_global_row(hist):
    out = bucket_stats(hist, value_col="cnt").toPandas()
    assert len(out) == 1
    assert out.loc[0, "n_buckets"] == hist.count()


# ---- date_range_agg ------------------------------------------------------

from gofias_spark.operators.events import date_range_agg  # noqa: E402


def test_date_range_counts(spark, events):
    out = date_range_agg(events, [
        (None, "2026-01-03"),
        ("2026-01-03", "2026-01-05"),
        ("2026-01-04", None),       # overlaps previous — counted alone
        ("2030-01-01", None),       # empty range -> 0, not missing
    ]).toPandas().set_index("range")
    ev = events.toPandas()
    assert out.loc["*-2026-01-03", "cnt"] == \
        (ev["ts"] < dt.datetime(2026, 1, 3)).sum()
    assert out.loc["2026-01-03-2026-01-05", "cnt"] == (
        (ev["ts"] >= dt.datetime(2026, 1, 3))
        & (ev["ts"] < dt.datetime(2026, 1, 5))
    ).sum()
    assert out.loc["2026-01-04-*", "cnt"] == \
        (ev["ts"] >= dt.datetime(2026, 1, 4)).sum()
    assert out.loc["2030-01-01-*", "cnt"] == 0


def test_date_range_requires_ranges(spark, events):
    with pytest.raises(ValueError, match="non-empty"):
        date_range_agg(events, [])
