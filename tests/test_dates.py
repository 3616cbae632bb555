"""functions/dates.py (X7/F2): reference layouts, active predicate,
watermark, version-text extraction."""

from datetime import date

from pyspark.sql import functions as F

from gofias_spark.functions import dates as DT


def test_parse_both_layouts(spark):
    df = spark.createDataFrame(
        [("2006-01-02",), ("2006-01-02T15:04:00Z",), ("garbage",), (None,)],
        "s string",
    ).select(DT.parse_date("s").alias("d"), DT.parse_timestamp("s").alias("t"))
    rows = df.collect()
    assert rows[0]["d"] == date(2006, 1, 2)
    assert rows[1]["d"] == date(2006, 1, 2)
    assert rows[1]["t"].hour == 15 and rows[1]["t"].minute == 4
    assert rows[2]["d"] is None and rows[3]["d"] is None


def test_is_active_matches_reference_semantics(spark):
    # jsonHouseDto.go:77-79: active iff end_date parses AND is in the future
    df = spark.createDataFrame(
        [("2079-06-06",), ("1999-01-01",), ("unparseable",), (None,)],
        "end_date string",
    ).select(
        "end_date",
        DT.is_active("end_date", as_of=F.to_date(F.lit("2020-01-01"))).alias(
            "active"
        ),
    )
    got = {r["end_date"]: r["active"] for r in df.collect()}
    assert got == {
        "2079-06-06": True,
        "1999-01-01": False,
        "unparseable": False,
        None: False,
    }


def test_watermark_and_version_text(spark):
    df = spark.createDataFrame(
        [("2021-05-05", "FIAS update from 05.05.2021"),
         ("2019-01-01", "old dump 01.01.2019")],
        "d string, title string",
    )
    kept = df.filter(DT.watermark_filter("d", "2020-01-01")).collect()
    assert [r["d"] for r in kept] == ["2021-05-05"]
    vd = df.select(DT.version_date_from_text("title").alias("v")).collect()
    assert vd[0]["v"] == date(2021, 5, 5)
    assert vd[1]["v"] == date(2019, 1, 1)
