"""XML attribute scan (SURVEY.md §2.1 S3): parse-parity vs the source rows,
mirroring the reference's streaming XML import (util/xml.go:15-43)."""

import xml.sax.saxutils as sx

import pytest
from pyspark.sql import functions as F

from gofias_spark.sources.xml import read_attribute_xml


def _write_xml(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n<Objects>\n')
        for r in rows:
            attrs = " ".join(f'{k}={sx.quoteattr(v)}' for k, v in r.items())
            f.write(f"  <Object {attrs} />\n")
        f.write("</Objects>\n")


def test_xml_scan_roundtrip(spark, tmp_path):
    rows1 = [
        {"AOGUID": "g1", "FORMALNAME": "Москва", "AOLEVEL": "1"},
        {"AOGUID": "g2", "FORMALNAME": 'quo"te <&>', "AOLEVEL": "7"},
    ]
    rows2 = [{"AOGUID": "g3", "FORMALNAME": "Тверская", "AOLEVEL": "7"}]
    p1, p2 = str(tmp_path / "a.xml"), str(tmp_path / "b.xml")
    _write_xml(p1, rows1)
    _write_xml(p2, rows2)

    df = read_attribute_xml(
        spark, [p1, p2], "Object",
        {"AOGUID": "guid", "FORMALNAME": "name", "AOLEVEL": "level"},
    )
    got = {tuple(r) for r in df.select("guid", "name", "level").collect()}
    exp = {
        ("g1", "Москва", "1"),
        ("g2", 'quo"te <&>', "7"),
        ("g3", "Тверская", "7"),
    }
    assert got == exp


def test_xml_scan_missing_and_unknown_attrs(spark, tmp_path):
    p = str(tmp_path / "c.xml")
    _write_xml(p, [{"AOGUID": "g9", "EXTRA": "dropped"}])
    df = read_attribute_xml(
        spark, [p], "Object", {"AOGUID": "guid", "FORMALNAME": "name"}
    )
    [r] = df.collect()
    assert r["guid"] == "g9" and r["name"] is None
    assert df.columns == ["guid", "name"]


# -- iceberg/docs-table input adapter ---------------------------------------


def test_read_docs_table_parquet_path(spark, tmp_path):
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.sources.iceberg import DOCS_COLS, read_docs_table

    p = str(tmp_path / "docs_pq")
    synth_corpus(spark, 20).withColumn(
        "extra", F.lit(1)
    ).write.parquet(p)
    df = read_docs_table(spark, p)
    assert df.columns == DOCS_COLS  # narrow projection, extras pruned
    assert df.count() == 20


def test_read_docs_table_validates_contract(spark, tmp_path):
    from gofias_spark.sources.iceberg import read_docs_table

    p = str(tmp_path / "bad_pq")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="docs-contract columns"):
        read_docs_table(spark, p)


def test_read_docs_table_catalog_errors_are_actionable(spark):
    from gofias_spark.sources.iceberg import read_docs_table

    with pytest.raises(RuntimeError, match="catalog table"):
        read_docs_table(spark, "nocat.nodb.notable")
    with pytest.raises(ValueError, match="not both"):
        read_docs_table(
            spark, "t", snapshot_id=1, as_of_timestamp="2026-01-01"
        )


def test_read_docs_table_rejects_time_travel_on_paths(spark, tmp_path):
    """A snapshot pin on a filesystem source must fail loudly: silently
    reading whatever bytes are at the path would defeat the
    reproducibility the pin exists for."""
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.sources.iceberg import read_docs_table

    p = str(tmp_path / "tt_pq")
    synth_corpus(spark, 5).write.parquet(p)
    with pytest.raises(ValueError, match="time travel"):
        read_docs_table(spark, p, snapshot_id=42)
    with pytest.raises(ValueError, match="time travel"):
        read_docs_table(spark, p, as_of_timestamp="2026-01-01 00:00:00")


def test_read_docs_table_catalog_wins_over_cwd_file(spark, tmp_path, monkeypatch):
    """Routing is cwd-independent and catalog-first for bare identifiers:
    a stray local file/dir named like the table must not shadow the
    catalog table (r3 review), while unambiguous path shapes (a
    separator or .parquet suffix) still read as parquet."""
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.sources.iceberg import DOCS_COLS, read_docs_table

    docs = synth_corpus(spark, 10)
    docs.createOrReplaceTempView("docs_route_probe")
    try:
        # a cwd-local dir with the same bare name as the served view
        monkeypatch.chdir(tmp_path)
        (tmp_path / "docs_route_probe").mkdir()
        df = read_docs_table(spark, "docs_route_probe")
        assert df.columns == DOCS_COLS and df.count() == 10
    finally:
        spark.catalog.dropTempView("docs_route_probe")

    # a bare name the catalog does NOT serve still falls back to a
    # matching local path
    p = tmp_path / "plaindir_pq"
    docs.write.parquet(str(p))
    monkeypatch.chdir(tmp_path)
    df = read_docs_table(spark, "plaindir_pq")
    assert df.count() == 10


def test_iceberg_roundtrip_parquet_path(spark, tmp_path):
    """build_index_from_table -> export_docs_table round-trip on the
    parquet fallback (no Iceberg runtime in this container): the exported
    docs table equals the live doc store, and a rebuild from the export
    searches identically."""
    from gofias_spark.config import IndexConfig
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.query.engine import SearchEngine
    from gofias_spark.sources.iceberg import (
        build_index_from_table, export_docs_table,
    )

    src = str(tmp_path / "docs_src")
    synth_corpus(spark, 40).write.parquet(src)
    root = str(tmp_path / "idx")
    build_index_from_table(
        spark, src, root, IndexConfig(n_buckets=3, block_size=16)
    )
    out = str(tmp_path / "docs_export")
    n = export_docs_table(spark, root, out)
    assert n == 40
    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(
        ["repo", "path", "commit", "lang", "content"]
    )
    assert back.count() == 40
    # identical corpus -> identical search results after a rebuild
    root2 = str(tmp_path / "idx2")
    build_index_from_table(
        spark, out, root2, IndexConfig(n_buckets=3, block_size=16)
    )
    a = SearchEngine(spark, root, cache=False)
    b = SearchEngine(spark, root2, cache=False)
    ra = [(r["repo"], r["path"], round(r["score"], 9))
          for r in a.search("common_util", k=10).collect()]
    rb = [(r["repo"], r["path"], round(r["score"], 9))
          for r in b.search("common_util", k=10).collect()]
    assert ra == rb


def test_iceberg_export_excludes_tombstones(spark, tmp_path):
    from gofias_spark.config import IndexConfig
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.index.build import build_segment
    from gofias_spark.index.merge import apply_delta
    from gofias_spark.sources.iceberg import export_docs_table

    root = str(tmp_path / "idxt")
    docs = synth_corpus(spark, 20)
    build_segment(spark, docs, root, IndexConfig(n_buckets=3, block_size=16))
    victim = docs.limit(1).collect()[0]
    apply_delta(
        spark, root,
        deletes=spark.createDataFrame(
            [(victim["repo"], victim["path"])], "repo string, path string"
        ),
    )
    out = str(tmp_path / "docs_live")
    n = export_docs_table(spark, root, out)
    assert n == 19
    back = spark.read.parquet(out)
    assert back.filter(
        (back["repo"] == victim["repo"]) & (back["path"] == victim["path"])
    ).count() == 0


def test_iceberg_export_catalog_error_actionable(spark, tmp_path):
    """A catalog-table dest without an Iceberg runtime fails with install
    guidance (same gate pattern as rpc.serve_grpc), not a raw JVM error."""
    import pytest as _pytest

    from gofias_spark.config import IndexConfig
    from gofias_spark.corpus import synth_corpus
    from gofias_spark.index.build import build_segment
    from gofias_spark.sources.iceberg import export_docs_table

    root = str(tmp_path / "idxe")
    build_segment(
        spark, synth_corpus(spark, 10), root,
        IndexConfig(n_buckets=3, block_size=16),
    )
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        export_docs_table(spark, root, "nocat.nodb.docs_out")
