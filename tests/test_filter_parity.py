"""Property-based parity: ``pandas_filter_mask`` (the driver-side filter
evaluator used by the local searcher and the serve tier) must select
EXACTLY the rows ``compile_filters`` selects in Spark SQL — including the
null semantics where a null attribute fails every predicate (eq, IN,
range, and especially neq, where pandas' native ``!=`` keeps nulls)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gofias_spark.query.engine import compile_filters, pandas_filter_mask

LANGS = ["py", "go", "js", None]
REPOS = ["org/a", "org/b", None]


def _meta_pdf():
    rng = np.random.default_rng(7)
    n = 60
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": [LANGS[i] for i in rng.integers(0, len(LANGS), n)],
            "repo": [REPOS[i] for i in rng.integers(0, len(REPOS), n)],
            "path": [f"src/m{i % 7}/f{i}.py" for i in range(n)],
            "doclen": rng.integers(0, 500, n).astype(np.int32),
        }
    )


_scalar = st.sampled_from(["py", "go", "zz", "org/a"])
_range_op = st.sampled_from(["gte", "gt", "lte", "lt", "neq"])

_filter_clause = st.one_of(
    st.tuples(st.sampled_from(["lang", "repo"]), _scalar),
    st.tuples(
        st.sampled_from(["lang", "repo"]),
        st.lists(_scalar, min_size=1, max_size=3),
    ),
    st.tuples(st.just("path_prefix"), st.sampled_from(["src/m1", "src/", "x"])),
    st.tuples(
        st.just("doclen"),
        st.dictionaries(
            _range_op, st.integers(min_value=0, max_value=500),
            min_size=1, max_size=2,
        ),
    ),
    st.tuples(
        st.just("lang"),
        st.fixed_dictionaries({"neq": st.sampled_from(["py", "zz"])}),
    ),
    st.tuples(
        st.sampled_from(["lang", "repo"]),
        st.fixed_dictionaries({"exists": st.booleans()}),
    ),
)

_filters = st.dictionaries(
    st.just(0), st.just(0), max_size=0
).flatmap(  # force clause-list shape, dedup by field
    lambda _: st.lists(_filter_clause, min_size=1, max_size=3).map(
        lambda cs: {f: v for f, v in cs}
    )
)


@pytest.fixture(scope="module")
def frames(spark):
    pdf = _meta_pdf()
    sdf = spark.createDataFrame(
        pdf,
        "doc_id long, lang string, repo string, path string, doclen int",
    )
    sdf = sdf.cache()
    sdf.count()
    return pdf, sdf


@given(filters=_filters)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pandas_mask_matches_spark(frames, filters):
    pdf, sdf = frames
    got = set(pdf.loc[pandas_filter_mask(pdf, filters), "doc_id"])
    cond = compile_filters(filters)
    want = {
        r["doc_id"] for r in sdf.filter(cond).select("doc_id").collect()
    }
    assert got == want, filters
