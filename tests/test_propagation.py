"""ST5 change propagation: parent (street) changes re-derive and re-index
dependent (house) documents — mirrors importService.go:222-293 +
elasticHouseRepository.go:537-581."""

from pyspark.sql import functions as F

from gofias_spark.config import IndexConfig
from gofias_spark.query.engine import SearchEngine
from gofias_spark.streaming.incremental import check_updates, propagate_dependents

CFG = IndexConfig(n_buckets=3, block_size=16)


def _house_docs(houses, streets):
    """Dependent doc derivation: house content embeds its street's name
    (the X6 path-concat analogue)."""
    return (
        houses.join(streets, "street_id")
        .select(
            F.lit("fias").alias("repo"),
            F.concat(F.lit("house/"), F.col("house_id")).alias("path"),
            F.lit("v1").alias("commit"),
            F.lit("ru").alias("lang"),
            F.concat_ws(
                " ", F.col("street_name"), F.lit("dom"), F.col("num")
            ).alias("content"),
        )
    )


def test_street_change_reindexes_houses(spark, tmp_path):
    streets = spark.createDataFrame(
        [(1, "lenina"), (2, "pushkina"), (3, "gagarina")],
        "street_id int, street_name string",
    )
    houses = spark.createDataFrame(
        [(10, 1, "5"), (11, 1, "7k2"), (12, 2, "1"), (13, 3, "9")],
        "house_id int, street_id int, num string",
    )
    root = str(tmp_path / "idx")
    base = _house_docs(houses, streets)
    check_updates(spark, root, base, versions=[], cfg=CFG)

    eng = SearchEngine(spark, root, cache=False)
    n0 = eng.stats()["n_docs"]
    assert eng.count("lenina") == 2
    assert eng.count("sovetskaya") == 0

    # street 1 renamed: lenina -> sovetskaya
    changed = spark.createDataFrame(
        [(1, "sovetskaya")], "street_id int, street_name string"
    )
    new_streets = (
        streets.filter(F.col("street_id") != 1).unionByName(changed)
    )
    propagate_dependents(
        spark,
        root,
        changed_parents=changed,
        dependents=houses,
        fk="street_id",
        derive=lambda aff, ch: _house_docs(aff, new_streets),
        cfg=CFG,
    )

    eng2 = SearchEngine(spark, root, cache=False)
    # same doc count: dependents were UPDATED in place (same identity keys)
    assert eng2.stats()["n_docs"] == n0
    assert eng2.count("sovetskaya") == 2
    assert eng2.count("lenina") == 0
    # untouched dependents unaffected
    assert eng2.count("pushkina") == 1
    assert eng2.count("gagarina") == 1
    # re-derived content is searchable end-to-end
    hits = eng2.search("sovetskaya dom", k=5, mode="and").collect()
    assert {r["path"] for r in hits} == {"house/10", "house/11"}
