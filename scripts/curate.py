"""spark-submit entry point: corpus-curation pipeline steps over a docs
table — the batch CLI for the training-data operators (SURVEY §8).

    spark-submit --py-files gofias_spark.zip scripts/curate.py <step> \
        --input /path/docs.parquet --output /path/out.parquet [step opts]

Steps (all read (doc_id, <text-col>, ...) parquet, write parquet):

  dedup-spans       duplicated n-gram token spans (Lee et al. 2022 shape)
  strip-spans       corpus with duplicated spans removed (canonical kept)
  classify          linear quality-classifier scores (fastText shape);
                    optional --weights parquet (term, weight)
  dsir              DSIR importance log-weights vs a --target corpus
  dsir-sample       DSIR-resampled subset (--frac) vs a --target corpus
  sample            deterministic stratified sample (--rates lang=0.3,..)
  pack              token-budget sequence packing (--budget)
  code-flags        The Stack / StarCoder code-quality filter (or
                    per-rule flags with --flags-only)
  repo-rollup       per-repo curation report (files/tokens/pass-rate)
  temperature-sample GPT-3/PaLM temperature mixture sampling (--alpha)
  redact            PII/link redaction pass
  decontaminate     n-gram overlap vs a --benchmark corpus

Every step is deterministic: identical inputs produce identical outputs
at any parallelism (the property dataset cards need).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gofias_spark.session import get_spark  # noqa: E402


def _add_io(p, target=False, benchmark=False):
    p.add_argument("--input", required=True, help="input docs parquet")
    p.add_argument("--output", required=True, help="output parquet path")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="content")
    if target:
        p.add_argument("--target", required=True,
                       help="target-distribution docs parquet")
    if benchmark:
        p.add_argument("--benchmark", required=True,
                       help="benchmark docs parquet")


def _parse_rates(s: str) -> dict[str, float]:
    out = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise SystemExit(f"bad --rates entry {part!r} (want k=v,...)")
        out[k] = float(v)
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    sub = ap.add_subparsers(dest="step", required=True)

    sp = sub.add_parser("dedup-spans")
    _add_io(sp)
    sp.add_argument("-n", type=int, default=20, help="token window")

    st = sub.add_parser("strip-spans")
    _add_io(st)
    st.add_argument("-n", type=int, default=20)

    cl = sub.add_parser("classify")
    _add_io(cl)
    cl.add_argument("--weights", default=None,
                    help="optional (term, weight) parquet; hashed "
                         "stand-in weights when absent")
    cl.add_argument("--bias", type=float, default=0.0)

    ds = sub.add_parser("dsir")
    _add_io(ds, target=True)
    ds.add_argument("--dim", type=int, default=8192)

    dss = sub.add_parser("dsir-sample")
    _add_io(dss, target=True)
    dss.add_argument("--dim", type=int, default=8192)
    dss.add_argument("--frac", type=float, required=True)

    sm = sub.add_parser("sample")
    _add_io(sm)
    sm.add_argument("--rates", required=True,
                    help="stratum=rate,... e.g. en=0.3,de=0.1")
    sm.add_argument("--stratum-col", default="lang")
    sm.add_argument("--default-rate", type=float, default=0.0)

    pk = sub.add_parser("pack")
    _add_io(pk)
    pk.add_argument("--budget", type=int, required=True)

    gf = sub.add_parser("gopher")
    _add_io(gf)
    gf.add_argument("--flags-only", action="store_true",
                    help="emit per-rule flags for every doc instead of "
                         "filtering to gopher_pass docs")
    gf.add_argument("--with-repetition", action="store_true",
                    help="also apply the Gopher repetition thresholds "
                         "(dup lines / dup line chars / top bigram)")

    cf = sub.add_parser("code-flags")
    _add_io(cf)
    cf.add_argument("--flags-only", action="store_true",
                    help="emit per-rule flags for every doc instead of "
                         "filtering to code_pass docs")

    rr = sub.add_parser("repo-rollup")
    _add_io(rr)
    rr.add_argument("--group-col", default="repo")
    rr.add_argument("--lang-col", default="lang")

    ts = sub.add_parser("temperature-sample")
    _add_io(ts)
    ts.add_argument("--alpha", type=float, default=0.7)
    ts.add_argument("--group-col", default="lang")

    rd = sub.add_parser("redact")
    _add_io(rd)

    dc = sub.add_parser("decontaminate")
    _add_io(dc, benchmark=True)
    dc.add_argument("-n", type=int, default=13)

    args = ap.parse_args(argv)
    spark = get_spark(
        f"curate_{args.step}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.input)
    ic, tc = args.id_col, args.text_col

    if args.step == "dedup-spans":
        from gofias_spark.operators.dedup import duplicate_spans

        out = duplicate_spans(docs, n=args.n, id_col=ic, text_col=tc)
    elif args.step == "strip-spans":
        from gofias_spark.operators.dedup import strip_duplicate_spans

        out = strip_duplicate_spans(docs, n=args.n, id_col=ic, text_col=tc)
    elif args.step == "gopher":
        from gofias_spark.operators.textstats import (
            gopher_filter,
            gopher_quality_flags,
            gopher_repetition_flags,
        )

        if args.flags_only:
            out = gopher_quality_flags(docs, id_col=ic, text_col=tc)
            if args.with_repetition:
                out = out.join(
                    gopher_repetition_flags(docs, id_col=ic, text_col=tc),
                    ic,
                )
        elif args.with_repetition:
            out = gopher_filter(docs, id_col=ic, text_col=tc)
        else:
            # filter mode: keep passing docs, all original columns
            flags = gopher_quality_flags(docs, id_col=ic, text_col=tc)
            out = docs.join(
                flags.filter("gopher_pass").select(ic), ic, "inner"
            )
    elif args.step == "classify":
        from gofias_spark.operators.textstats import (
            classifier_quality_score,
        )

        w = spark.read.parquet(args.weights) if args.weights else None
        out = classifier_quality_score(
            docs, weights=w, bias=args.bias, id_col=ic, text_col=tc
        )
    elif args.step == "dsir":
        from gofias_spark.operators.selection import dsir_log_weights

        tgt = spark.read.parquet(args.target)
        out = dsir_log_weights(
            docs, tgt, dim=args.dim, id_col=ic, text_col=tc
        )
    elif args.step == "dsir-sample":
        from gofias_spark.operators.selection import dsir_sample

        tgt = spark.read.parquet(args.target)
        out = dsir_sample(
            docs, tgt, frac=args.frac, dim=args.dim, id_col=ic, text_col=tc
        )
    elif args.step == "sample":
        from gofias_spark.operators.sampling import stratified_sample

        out = stratified_sample(
            docs,
            _parse_rates(args.rates),
            stratum_col=args.stratum_col,
            id_col=ic,
            default_rate=args.default_rate,
        )
    elif args.step == "pack":
        from gofias_spark.operators.sampling import pack_sequences

        out = pack_sequences(docs, budget=args.budget, id_col=ic,
                             text_col=tc)
    elif args.step == "code-flags":
        from gofias_spark.operators.textstats import code_quality_flags

        if args.flags_only:
            out = code_quality_flags(docs, id_col=ic, text_col=tc)
        else:
            flags = code_quality_flags(docs, id_col=ic, text_col=tc)
            out = docs.join(
                flags.filter("code_pass").select(ic), ic, "inner"
            )
    elif args.step == "repo-rollup":
        from gofias_spark.operators.textstats import repo_rollup

        out = repo_rollup(docs, group_col=args.group_col, id_col=ic,
                          text_col=tc, lang_col=args.lang_col)
    elif args.step == "temperature-sample":
        from gofias_spark.operators.sampling import temperature_sample

        out = temperature_sample(docs, alpha=args.alpha,
                                 group_col=args.group_col, id_col=ic)
    elif args.step == "redact":
        from gofias_spark.operators.textstats import redact_pii

        out = redact_pii(docs, id_col=ic, text_col=tc)
    else:  # decontaminate
        from gofias_spark.operators.dedup import decontaminate

        bench = spark.read.parquet(args.benchmark)
        out = decontaminate(docs, bench, n=args.n, id_col=ic, text_col=tc)

    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"curate {args.step}: wrote {n} rows -> {args.output}")


if __name__ == "__main__":
    main()
