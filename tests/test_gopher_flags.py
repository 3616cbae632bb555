"""Gopher quality-filter ruleset (Rae et al. 2021 A1.1): each rule is
exercised by a handcrafted violating doc, and a clean doc passes all."""

import pytest

from gofias_spark.operators.textstats import gopher_quality_flags

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back "
    "to the barn where it can have a rest with all of its friends "
    "because that was quite a long run for such a small animal and "
    "everyone agreed that it deserved the break it was given today"
)  # >50 words, sane lengths, stopwords present

DOCS = [
    ("good", GOOD),
    ("short", "only four words here"),                      # word count
    ("longwords", " ".join(["extraordinarily"] * 60)),      # mean word len
    ("symbols", " ".join(["#tag"] * 60)),                   # symbol ratio
    ("bullets", "\n".join(["- item " + str(i) for i in range(20)])),
    ("ellipsis", "\n".join([f"the line {i} trails off..."
                            for i in range(10)])),
    ("numeric", " ".join(["12345"] * 60)),                  # alpha ratio
    ("nostop", " ".join(["lorem"] * 60)),                   # stop words
]


@pytest.fixture(scope="module")
def flags(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, content string")
    pdf = gopher_quality_flags(df).toPandas().set_index("doc_id")
    return pdf


def test_good_doc_passes(flags):
    assert bool(flags.loc["good", "gopher_pass"])


@pytest.mark.parametrize(
    "doc,flag",
    [
        ("short", "ok_words"),
        ("longwords", "ok_word_len"),
        ("symbols", "ok_symbols"),
        ("bullets", "ok_bullets"),
        ("ellipsis", "ok_ellipsis"),
        ("numeric", "ok_alpha"),
        ("nostop", "ok_stopwords"),
    ],
)
def test_each_rule_fires(flags, doc, flag):
    assert not bool(flags.loc[doc, flag]), (doc, flag)
    assert not bool(flags.loc[doc, "gopher_pass"])


def test_metrics_sane(flags):
    assert flags.loc["good", "n_words"] > 50
    assert 3.0 <= flags.loc["good", "mean_word_len"] <= 10.0
    assert flags.loc["bullets", "bullet_line_ratio"] == 1.0
    assert flags.loc["ellipsis", "ellipsis_line_ratio"] == 1.0
    assert flags.loc["numeric", "alpha_word_ratio"] == 0.0
    assert flags.loc["good", "stop_hits"] >= 2


def test_plan_is_map_only(spark):
    from gofias_spark.plans import checks as C

    df = spark.createDataFrame(DOCS, "doc_id string, content string")
    plan = C.physical_plan(gopher_quality_flags(df))
    assert "Exchange" not in plan, plan


def test_repetition_flags_and_full_filter(spark):
    from gofias_spark.operators.textstats import (
        gopher_filter,
        gopher_repetition_flags,
    )

    docs = spark.createDataFrame(
        [("clean", GOOD),
         ("looped", "\n".join(["the same line again and again ok"] * 20))],
        "doc_id string, content string",
    )
    rf = gopher_repetition_flags(docs).toPandas().set_index("doc_id")
    assert bool(rf.loc["clean", "repetition_pass"])
    assert not bool(rf.loc["looped", "ok_dup_lines"])
    assert not bool(rf.loc["looped", "repetition_pass"])

    kept = gopher_filter(docs).toPandas()
    assert list(kept["doc_id"]) == ["clean"]
