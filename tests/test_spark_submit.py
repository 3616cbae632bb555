"""The deployment shape the north rule mandates, end-to-end for real:
``spark-submit --py-files gofias_spark.zip`` launching the build and query
entry points as separate applications against an on-disk index."""

import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)


def _pkg_zip(tmp: Path) -> Path:
    zp = tmp / "gofias_spark.zip"
    pkg = REPO / "gofias_spark"
    with zipfile.ZipFile(zp, "w") as zf:
        for p in sorted(pkg.rglob("*.py")):
            zf.write(p, f"gofias_spark/{p.relative_to(pkg)}")
    return zp


def _submit(zp: Path, script: str, *args: str) -> str:
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zp),
            str(REPO / "scripts" / script),
            *args,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        # the scripts also sys.path-insert the repo root for the DRIVER;
        # --py-files is what ships the package to executors. Run from a
        # neutral cwd so a bare `import gofias_spark` can't resolve via
        # the working directory by accident.
        cwd=str(zp.parent),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_build_then_query_via_spark_submit(spark, tmp_path):
    from gofias_spark.corpus import synth_corpus

    docs_path = tmp_path / "docs_parquet"
    synth_corpus(spark, 60).write.parquet(str(docs_path))
    zp = _pkg_zip(tmp_path)
    index = tmp_path / "idx"

    _submit(
        zp, "build_index.py",
        "--input", str(docs_path), "--index", str(index),
        "--n-buckets", "3", "--block-size", "16",
    )
    assert (index / "manifest.json").exists()

    got = _submit(
        zp, "query_cli.py", "--index", str(index), "search", "func",
        "--k", "5", "--highlight",
    )
    frag_lines = [ln for ln in got.splitlines() if "[h]func[/h]" in ln]
    assert frag_lines, got[-2000:]
    lines = [
        ln for ln in got.splitlines() if "\t" in ln and ln.count("\t") >= 2
    ]
    assert 0 < len(lines) <= 5
    score0 = float(lines[0].split("\t")[0])
    scores = [float(ln.split("\t")[0]) for ln in lines]
    assert scores == sorted(scores, reverse=True) and score0 > 0

    # the same app, asked for a count — exercises a second analyzer pass
    got = _submit(zp, "query_cli.py", "--index", str(index), "count", "func")
    count_lines = [ln for ln in got.splitlines() if ln.strip().isdigit()]
    assert count_lines and int(count_lines[-1]) >= len(lines)
