"""spark-submit entry point: query a built index (the reference's API
surface as a CLI — GetAddressByTerm/GetSuggests/count/version analogues).

    spark-submit --py-files gofias_spark.zip scripts/query_cli.py \
        --index /path/index search "bulk index" --k 10 [--mode or] \
        [--filter lang=go] [--filter path_prefix=app/] [--offset 0]
    ... search "bulk index" --exclude "deprecated" --after 1.234567,8910
    ... count "bulk index" [--filter lang=go] [--exclude term]
    ... histogram doclen 100 "bulk index" [--mode or] [--filter lang=go]
    ... get --repo R --path P
    ... stats
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gofias_spark.query.engine import SearchEngine  # noqa: E402
from gofias_spark.session import get_spark  # noqa: E402


def _filters(pairs: list[str] | None) -> dict | None:
    """``field=v`` equality; ``field>=v`` ``field<=v`` ``field>v`` ``field<v``
    ``field!=v`` range ops (F4); ``field=a,b,c`` IN-list. Numeric-looking
    range values are cast."""
    if not pairs:
        return None
    ops = [(">=", "gte"), ("<=", "lte"), ("!=", "neq"), (">", "gt"), ("<", "lt")]
    out: dict = {}
    for p in pairs:
        for sym, op in ops:
            if sym in p:
                field, val = p.split(sym, 1)
                try:
                    v: object = int(val)
                except ValueError:
                    v = val
                out.setdefault(field, {})[op] = v
                break
        else:
            field, val = p.split("=", 1)
            out[field] = val.split(",") if "," in val else val
    return out


def _sort_by(spec: str | None) -> list[tuple[str, str]] | None:
    """``lang:asc,_score:desc`` -> sort_by list (O1 composite orders)."""
    if not spec:
        return None
    out = []
    for part in spec.split(","):
        field, _, direction = part.partition(":")
        out.append((field, direction or "asc"))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument(
        "--alias-registry", default=None,
        help="aliases.json path: --index may then name an alias",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("search")
    s.add_argument("query")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--offset", type=int, default=0)
    s.add_argument("--mode", default="and", choices=["and", "or"])
    s.add_argument(
        "--match", default=None,
        choices=["phrase", "fuzzy", "wildcard", "regexp"],
        help="r3 extensions: exact-phrase / edit-distance-1 / */? pattern "
             "/ anchored-regexp matching (default: plain --mode match)",
    )
    s.add_argument("--filter", action="append")
    s.add_argument(
        "--sort", default=None,
        help="composite order, e.g. lang:asc,_score:desc (O1)",
    )
    s.add_argument(
        "--highlight", action="store_true",
        help="append window-bounded match fragments per hit "
             "(plain/phrase matches only)",
    )
    s.add_argument(
        "--exclude", default=None,
        help="bool.must_not: drop docs containing ANY analyzed term of "
             "this string (plain match only)",
    )
    s.add_argument(
        "--after", default=None, metavar="SCORE,DOC_ID",
        help="cursor paging (search_after): the previous page's last hit, "
             "verbatim; O(k) at any depth. Cursor equality is exact — use "
             "the gateway's JSON score (full precision), not this CLI's "
             "6-dp display, when ties matter",
    )

    qs = sub.add_parser(
        "query-string",
        help="Lucene-ish query syntax: +must -not \"phrase\" field:value "
             "field:[a TO b] term^2 wild* fuzz~ AND/OR/NOT",
    )
    qs.add_argument("query")
    qs.add_argument("--k", type=int, default=10)
    qs.add_argument("--offset", type=int, default=0)
    qs.add_argument("--default-operator", default="or",
                    choices=["or", "and"])
    qs.add_argument("--msm", type=int, default=None,
                    help="minimum_should_match over should clauses")

    c = sub.add_parser("count")
    c.add_argument("query", nargs="?")
    c.add_argument("--filter", action="append")
    c.add_argument("--exclude", default=None)

    sp = sub.add_parser(
        "suggest-phrase",
        help="did-you-mean over a multi-token query (unigram LM + error "
             "likelihood); --collate drops suggestions with no matches",
    )
    sp.add_argument("query")
    sp.add_argument("--k", type=int, default=5)
    sp.add_argument("--collate", action="store_true")

    cm = sub.add_parser(
        "count-many",
        help="named counts for a batch of queries in ONE postings pass "
             "(ES filters agg); repeat id:text args",
    )
    cm.add_argument("queries", nargs="+", metavar="id:text")
    cm.add_argument("--mode", default="and", choices=["and", "or"])
    cm.add_argument("--filter", action="append")

    pp = sub.add_parser(
        "phrase-prefix",
        help="match_phrase_prefix autocomplete: fixed tokens + any "
             "vocabulary completion of the final prefix",
    )
    pp.add_argument("query")
    pp.add_argument("--k", type=int, default=10)
    pp.add_argument("--max-expansions", type=int, default=None)
    pp.add_argument("--filter", action="append")

    h = sub.add_parser("histogram")
    h.add_argument("field")
    h.add_argument("interval", type=float)
    h.add_argument("query", nargs="?")
    h.add_argument("--mode", default="and", choices=["and", "or"])
    h.add_argument("--filter", action="append")

    fs = sub.add_parser("field-stats")
    fs.add_argument("field")
    fs.add_argument("query", nargs="?")
    fs.add_argument("--mode", default="and", choices=["and", "or"])
    fs.add_argument("--filter", action="append")

    st = sub.add_parser("sig-terms")
    st.add_argument("query")
    st.add_argument("--k", type=int, default=10)
    st.add_argument("--mode", default="and", choices=["and", "or"])
    st.add_argument("--filter", action="append")
    st.add_argument("--min-doc-count", type=int, default=3)

    ml = sub.add_parser("more-like-this")
    ml.add_argument("doc_id", type=int)
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--filter", action="append")

    rsc = sub.add_parser("rescore", help="phrase-rescored top window "
                         "(ES rescore API)")
    rsc.add_argument("query")
    rsc.add_argument("rescore_query")
    rsc.add_argument("--k", type=int, default=10)
    rsc.add_argument("--window", type=int, default=50)
    rsc.add_argument("--query-weight", type=float, default=1.0)
    rsc.add_argument("--rescore-weight", type=float, default=1.0)
    rsc.add_argument("--slop", type=int, default=0)
    rsc.add_argument("--mode", default="and", choices=["and", "or"])

    fsc = sub.add_parser("function-score", help="field_value_factor "
                         "scoring modifier (ES function_score)")
    fsc.add_argument("query")
    fsc.add_argument("--k", type=int, default=10)
    fsc.add_argument("--field", default="doclen")
    fsc.add_argument("--modifier", default="log1p",
                     choices=["none", "log1p", "sqrt"])
    fsc.add_argument("--factor", type=float, default=1.0)
    fsc.add_argument("--boost-mode", default="multiply",
                     choices=["multiply", "sum"])
    fsc.add_argument("--mode", default="and", choices=["and", "or"])
    fsc.add_argument("--filter", action="append")

    cl = sub.add_parser("collapse", help="best hit per field value "
                        "(ES field collapsing)")
    cl.add_argument("field")
    cl.add_argument("query")
    cl.add_argument("--k", type=int, default=10)
    cl.add_argument("--mode", default="and", choices=["and", "or"])
    cl.add_argument("--filter", action="append")

    g = sub.add_parser("get")
    g.add_argument("--repo")
    g.add_argument("--path")
    g.add_argument("--commit")
    g.add_argument("--doc-id", type=int)

    sub.add_parser("stats")

    sn = sub.add_parser("snapshot", help="point-in-time snapshot (O(1) "
                        "hardlinks; survives compact)")
    sn.add_argument("name")
    sub.add_parser("snapshots", help="list snapshots")
    dsn = sub.add_parser("delete-snapshot")
    dsn.add_argument("name")
    rs = sub.add_parser("restore", help="materialize a snapshot as a new "
                        "independent index")
    rs.add_argument("name")
    rs.add_argument("dest")
    al = sub.add_parser("alias", help="alias registry ops "
                        "(--alias-registry required)")
    al.add_argument("action", choices=["set", "remove", "list"])
    al.add_argument("name", nargs="?")
    al.add_argument("target", nargs="?")

    args = ap.parse_args()
    index = args.index
    if args.alias_registry:
        from gofias_spark.index.aliases import AliasRegistry
        index = AliasRegistry(args.alias_registry).resolve(index)

    # store-only commands: no Spark session needed
    if args.cmd in ("snapshot", "snapshots", "delete-snapshot", "restore",
                    "alias"):
        from gofias_spark.index.aliases import AliasRegistry
        from gofias_spark.index.store import IndexStore
        store = IndexStore(index)
        if args.cmd == "snapshot":
            info = store.snapshot(args.name)
            print(json.dumps({k: info[k] for k in
                              ("name", "ts", "n_files", "bytes")}))
        elif args.cmd == "snapshots":
            for s in store.list_snapshots():
                print(json.dumps({k: s[k] for k in
                                  ("name", "ts", "n_files", "bytes")}))
        elif args.cmd == "delete-snapshot":
            store.delete_snapshot(args.name)
        elif args.cmd == "restore":
            info = store.restore_snapshot(args.name, args.dest)
            print(json.dumps({"restored": args.name, "dest": args.dest,
                              "n_files": info["n_files"]}))
        else:  # alias
            if not args.alias_registry:
                ap.error("alias requires --alias-registry")
            reg = AliasRegistry(args.alias_registry)
            if args.action == "list":
                print(json.dumps(reg.list()))
            elif args.action == "set":
                if not (args.name and args.target):
                    ap.error("alias set NAME TARGET")
                reg.set(args.name, args.target)
            else:
                if not args.name:
                    ap.error("alias remove NAME")
                reg.remove(args.name)
        return

    spark = get_spark("gofias_query")
    eng = SearchEngine(spark, index)

    if args.cmd == "search":
        common = dict(
            k=args.k, offset=args.offset, filters=_filters(args.filter)
        )
        if args.match and (args.exclude or args.after):
            ap.error("--exclude/--after support the plain match only")
        after = None
        if args.after:
            s_, d_ = args.after.split(",", 1)
            after = (float(s_), int(d_))
        if args.match == "phrase":
            res = eng.search_phrase(args.query, **common)
        elif args.match == "fuzzy":
            res = eng.search_fuzzy(args.query, **common)
        elif args.match == "wildcard":
            res = eng.search_wildcard(args.query, **common)
        elif args.match == "regexp":
            res = eng.search_regexp(args.query, **common)
        else:
            res = eng.search(
                args.query,
                mode=args.mode,
                sort_by=_sort_by(args.sort),
                must_not=args.exclude,
                after=after,
                **common,
            )
        rows = res.collect()
        frags = {}
        if getattr(args, "highlight", False):
            if args.match in ("fuzzy", "wildcard", "regexp"):
                ap.error("--highlight supports plain or phrase matches only")
            f = eng.snippets(args.query, [r["doc_id"] for r in rows])
            frags = dict(zip(f["doc_id"], f["fragments"]))
        for r in rows:
            print(
                f"{r['score']:.6f}\t{r['doc_id']}\t{r['repo']}/{r['path']}"
                f"@{r['commit']}\t{r['lang']}"
            )
            for frag in frags.get(r["doc_id"], []):
                print(f"    … {frag} …")
    elif args.cmd == "query-string":
        from gofias_spark.query.querystring import execute_query_string

        res = execute_query_string(
            eng, args.query, k=args.k, offset=args.offset,
            default_operator=args.default_operator,
            minimum_should_match=args.msm,
        )
        for r in res.collect():
            print(
                f"{r['score']:.6f}\t{r['doc_id']}\t{r['repo']}/{r['path']}"
                f"@{r['commit']}\t{r['lang']}"
            )
    elif args.cmd == "count":
        print(eng.count(args.query, _filters(args.filter),
                        must_not=args.exclude))
    elif args.cmd == "suggest-phrase":
        pdf = eng.suggest_phrase(args.query, k=args.k,
                                 collate=args.collate)
        for _, r in pdf.iterrows():
            extra = f"\t{int(r['matches'])}" if "matches" in pdf else ""
            print(f"{r['score']:.4f}\t{r['suggestion']}{extra}")
    elif args.cmd == "count-many":
        qmap = {}
        for raw in args.queries:
            qid, sep, text = raw.partition(":")
            if not sep or not qid or not text:
                raise SystemExit(f"query must be id:text, got {raw!r}")
            qmap[qid] = text
        pdf = eng.count_many(qmap, mode=args.mode,
                             filters=_filters(args.filter))
        for _, r in pdf.iterrows():
            print(f"{r['query']}\t{int(r['cnt'])}")
    elif args.cmd == "phrase-prefix":
        out = eng.search_phrase_prefix(
            args.query, k=args.k, filters=_filters(args.filter),
            max_expansions=args.max_expansions, as_pandas=True,
        )
        for _, r in out.iterrows():
            print(
                f"{r['score']:.4f}\t{r['repo']}/{r['path']}"
                f"@{r['commit']}\t{r['lang']}"
            )
    elif args.cmd == "histogram":
        pdf = eng.histogram(
            args.field, args.interval, args.query,
            mode=args.mode, filters=_filters(args.filter),
        )
        for _, r in pdf.iterrows():
            print(f"{r['bucket']:g}\t{int(r['cnt'])}")
    elif args.cmd == "field-stats":
        print(json.dumps(eng.field_stats(
            args.field, args.query, mode=args.mode,
            filters=_filters(args.filter),
        )))
    elif args.cmd == "sig-terms":
        pdf = eng.significant_terms(
            args.query, k=args.k, mode=args.mode,
            filters=_filters(args.filter),
            min_doc_count=args.min_doc_count,
        )
        for _, r in pdf.iterrows():
            print(f"{r['score']:.6f}\t{int(r['hits'])}\t{r['term']}")
    elif args.cmd == "rescore":
        res = eng.rescore(
            args.query, args.rescore_query, k=args.k,
            window_size=args.window, query_weight=args.query_weight,
            rescore_weight=args.rescore_weight, slop=args.slop,
            mode=args.mode,
        )
        for r in res.collect():
            print(
                f"{r['score']:.6f}\t{r['doc_id']}\t{r['repo']}/{r['path']}"
                f"@{r['commit']}\t{r['lang']}"
            )
    elif args.cmd == "function-score":
        res = eng.function_score(
            args.query, k=args.k, field=args.field,
            modifier=args.modifier, factor=args.factor,
            boost_mode=args.boost_mode, mode=args.mode,
            filters=_filters(args.filter),
        )
        for r in res.collect():
            print(
                f"{r['score']:.6f}\t{r['doc_id']}\t{r['repo']}/{r['path']}"
                f"@{r['commit']}\t{r['lang']}"
            )
    elif args.cmd == "collapse":
        pdf = eng.collapse(
            args.field, args.query, k=args.k, mode=args.mode,
            filters=_filters(args.filter),
        )
        for _, r in pdf.iterrows():
            print(f"{r['score']:.6f}\t{int(r['doc_id'])}\t{r[args.field]}")
    elif args.cmd == "more-like-this":
        res = eng.more_like_this(
            args.doc_id, k=args.k, filters=_filters(args.filter)
        )
        for r in res.collect():
            print(
                f"{r['score']:.6f}\t{r['doc_id']}\t{r['repo']}/{r['path']}"
                f"@{r['commit']}\t{r['lang']}"
            )
    elif args.cmd == "get":
        key = {
            k: v
            for k, v in [
                ("repo", args.repo), ("path", args.path),
                ("commit", args.commit),
            ]
            if v
        }
        rows = eng.get_doc(doc_id=args.doc_id, **key).collect()
        for r in rows:
            print(json.dumps({k: r[k] for k in
                              ("doc_id", "repo", "path", "commit", "lang",
                               "sha256")}))
    else:
        print(json.dumps(eng.stats(), indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
