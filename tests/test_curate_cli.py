"""The curate CLI drives each pipeline step end-to-end (in-process main;
spark-submit launch mechanics are covered by test_spark_submit.py)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import curate  # noqa: E402


@pytest.fixture(scope="module")
def io_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("curate_cli")
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
        (2, "unrelated words entirely different tokens here now ok", "de"),
        (3, "contact me at someone@example.com for details", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, content string, lang string"
    )
    inp = str(root / "docs.parquet")
    docs.write.parquet(inp)
    tgt = str(root / "target.parquet")
    docs.filter("lang = 'en'").write.parquet(tgt)
    return spark, root, inp, tgt


def _run(args):
    curate.main(args)


def test_strip_spans_and_classify(io_dirs):
    spark, root, inp, _ = io_dirs
    out = str(root / "stripped.parquet")
    _run(["strip-spans", "--input", inp, "--output", out, "-n", "5"])
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(got) == 4
    assert got[1].n_tokens_removed == 10  # exact dup of doc 0, canonical kept
    assert got[0].n_tokens_removed == 0

    out2 = str(root / "scores.parquet")
    _run(["classify", "--input", inp, "--output", out2, "--bias", "0.5"])
    sc = spark.read.parquet(out2)
    assert sc.count() == 4 and "quality_score" in sc.columns


def test_dsir_sample_and_redact(io_dirs):
    spark, root, inp, tgt = io_dirs
    out = str(root / "dsir.parquet")
    _run(["dsir", "--input", inp, "--output", out, "--target", tgt,
          "--dim", "256"])
    w = {r.doc_id: r.log_weight for r in spark.read.parquet(out).collect()}
    assert set(w) == {0, 1, 2, 3}
    assert w[2] < max(w[0], w[3])  # the 'de' doc leans away from target

    out2 = str(root / "red.parquet")
    _run(["redact", "--input", inp, "--output", out2])
    red = {r.doc_id: r.redacted for r in
           spark.read.parquet(out2).collect()}
    assert "someone@example.com" not in red[3]
    assert "<EMAIL>" in red[3]


def test_sample_and_pack(io_dirs):
    spark, root, inp, _ = io_dirs
    out = str(root / "sampled.parquet")
    _run(["sample", "--input", inp, "--output", out,
          "--rates", "en=1.0,de=0.0"])
    assert {r.lang for r in spark.read.parquet(out).collect()} == {"en"}

    out2 = str(root / "packed.parquet")
    _run(["pack", "--input", inp, "--output", out2, "--budget", "15"])
    packed = spark.read.parquet(out2)
    assert packed.count() == 4
    assert {"doc_id", "n_tokens", "bin_id"} <= set(packed.columns)


def test_bad_rates(io_dirs):
    _, root, inp, _ = io_dirs
    with pytest.raises(SystemExit):
        _run(["sample", "--input", inp,
              "--output", str(root / "x.parquet"), "--rates", "nonsense"])


def test_gopher_filter_and_flags(io_dirs):
    spark, root, inp, _ = io_dirs
    # flags mode: one row per input doc with the per-rule booleans
    out = str(root / "gflags.parquet")
    _run(["gopher", "--input", inp, "--output", out, "--flags-only"])
    fl = spark.read.parquet(out)
    assert fl.count() == 4
    assert {"gopher_pass", "ok_words", "ok_stopwords"} <= set(fl.columns)
    # filter mode: the short test docs all fail the 50-word floor
    out2 = str(root / "gpass.parquet")
    _run(["gopher", "--input", inp, "--output", out2])
    assert spark.read.parquet(out2).count() == 0


def test_code_flags_rollup_and_temperature(io_dirs):
    spark, root, inp, _ = io_dirs
    out = str(root / "codeflags.parquet")
    _run(["code-flags", "--input", inp, "--output", out, "--flags-only"])
    flags = spark.read.parquet(out)
    assert flags.count() == 4
    assert "code_pass" in flags.columns and "ok_max_line" in flags.columns

    out2 = str(root / "codekept.parquet")
    _run(["code-flags", "--input", inp, "--output", out2])
    kept = spark.read.parquet(out2)
    assert 0 < kept.count() <= 4
    assert set(kept.columns) == {"doc_id", "content", "lang"}

    out3 = str(root / "rollup.parquet")
    _run(["repo-rollup", "--input", inp, "--output", out3,
          "--group-col", "lang"])
    roll = spark.read.parquet(out3)
    assert {r["lang"] for r in roll.collect()} == {"en", "de"}
    assert roll.filter("lang = 'en'").collect()[0]["n_files"] == 3

    out4 = str(root / "tempsample.parquet")
    _run(["temperature-sample", "--input", inp, "--output", out4,
          "--alpha", "0.5"])
    samp = spark.read.parquet(out4)
    assert samp.count() <= 4
