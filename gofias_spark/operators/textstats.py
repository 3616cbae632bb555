"""Text analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting — the per-document curation signals of a
training-data pipeline, all as JVM column expressions (codegen'd, no Python).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofias_spark.query.naive import tokens_col

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de_es", "es"],
}

STOPWORDS = ["the", "a", "of", "to", "in", "and", "is", "for"]


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Per-doc quality signals: lengths, punctuation ratio, stopword ratio,
    distinct-token ratio, mean token length."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias(
            "punct_ratio"
        ),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 4).alias(
            "stopword_ratio"
        ),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tok, F.lit(1)), 4
        ).alias("distinct_ratio"),
        F.round(
            F.aggregate(
                toks, F.lit(0), lambda acc, t: acc + F.length(t)
            )
            / F.greatest(n_tok, F.lit(1)),
            4,
        ).alias("mean_token_len"),
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher document-quality ruleset (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", appendix A1.1 filtering heuristics) as
    per-rule boolean flags plus the conjunctive ``gopher_pass``:

    * word count in [min_words, max_words] (words = whitespace tokens)
    * mean word length in [min_mean_word_len, max_mean_word_len]
    * symbol-to-word ratio (``#`` and ``...`` occurrences / words) <= 0.1
    * lines starting with a bullet (•, -, *) <= 90%
    * lines ending with an ellipsis (``...`` or …) <= 30%
    * words containing at least one alphabetic character >= 80%
    * at least ``min_stop_hits`` DISTINCT Gopher stop words present
      (the / be / to / of / and / that / have / with)

    Everything is one JVM expression tree over the text column — no
    shuffle, no Python; at 100 TB this is a pure map stage that fuses
    into whatever scan feeds it. Returns the metrics, one boolean per
    rule, and ``gopher_pass``.
    """
    txt = F.col(text_col)
    words = F.filter(F.split(F.trim(txt), r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1))
    mean_wl = (
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
        / safe_n
    )
    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    n_ellipsis = F.size(F.split(txt, r"\.\.\.")) - 1
    symbol_ratio = (n_hash + n_ellipsis) / safe_n
    lines = F.filter(F.split(txt, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.ltrim(l), 1, 1).isin("•", "-", "*"),
            )
        )
        / n_lines
    )
    ellipsis_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.rtrim(l).endswith("...")
                | F.rtrim(l).endswith("…"),
            )
        )
        / n_lines
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / safe_n
    )
    low_words = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(
            F.array([F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(low_words, s),
        )
    )
    f_words = (n_words >= min_words) & (n_words <= max_words)
    f_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    f_sym = symbol_ratio <= max_symbol_word_ratio
    f_bullet = bullet_ratio <= max_bullet_line_ratio
    f_ell = ellipsis_ratio <= max_ellipsis_line_ratio
    f_alpha = alpha_ratio >= min_alpha_word_ratio
    f_stop = stop_hits >= min_stop_hits
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 4).alias("symbol_word_ratio"),
        F.round(bullet_ratio, 4).alias("bullet_line_ratio"),
        F.round(ellipsis_ratio, 4).alias("ellipsis_line_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        f_words.alias("ok_words"),
        f_wl.alias("ok_word_len"),
        f_sym.alias("ok_symbols"),
        f_bullet.alias("ok_bullets"),
        f_ell.alias("ok_ellipsis"),
        f_alpha.alias("ok_alpha"),
        f_stop.alias("ok_stopwords"),
        (
            f_words & f_wl & f_sym & f_bullet & f_ell & f_alpha & f_stop
        ).alias("gopher_pass"),
    )


def gopher_repetition_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top_bigram_char_frac: float = 0.20,
) -> DataFrame:
    """The Gopher repetition thresholds (Rae et al. 2021 A1.1, Table A1)
    applied to :func:`repetition_features`'s signals: duplicate-line
    fraction <= 0.30, duplicate-line character fraction <= 0.20, top
    2-gram character fraction <= 0.20. Same map-only shape as the
    underlying features; emits the fractions, one flag per threshold,
    and the conjunctive ``repetition_pass``."""
    rf = repetition_features(docs, id_col=id_col, text_col=text_col)
    ok_l = F.col("dup_line_frac") <= max_dup_line_frac
    ok_c = F.col("dup_line_char_frac") <= max_dup_line_char_frac
    ok_b = F.col("top_bigram_char_frac") <= max_top_bigram_char_frac
    return rf.select(
        "*",
        ok_l.alias("ok_dup_lines"),
        ok_c.alias("ok_dup_line_chars"),
        ok_b.alias("ok_top_bigram"),
        (ok_l & ok_c & ok_b).alias("repetition_pass"),
    )


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Full Gopher document filter: quality heuristics
    (:func:`gopher_quality_flags`) AND repetition thresholds
    (:func:`gopher_repetition_flags`) at their published defaults. Keeps
    passing docs with all their original columns. The two flag stages are
    both map-only, so the whole filter is scan -> project -> filter with
    a co-keyed join on ``id_col`` that AQE turns into a broadcast when
    one side is small; at 100 TB the honest cost is the two text passes,
    not any shuffle of content."""
    q = gopher_quality_flags(docs, id_col=id_col, text_col=text_col)
    r = gopher_repetition_flags(docs, id_col=id_col, text_col=text_col)
    keep = (
        q.filter("gopher_pass")
        .select(id_col)
        .join(r.filter("repetition_pass").select(id_col), id_col)
    )
    return docs.join(keep, id_col, "inner")


def langid_heuristic(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Stopword-marker language guess: the language whose marker set hits
    the most tokens (ties -> lexicographic language order; no hits -> 'und')."""
    toks = tokens_col(F.col(text_col))
    scores = [
        (
            lang,
            F.size(F.filter(toks, lambda t: t.isin(markers))),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties
        guess = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return docs.select(F.col(id_col), guess.alias("lang_guess"))


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (ceil(len/4) per word
    — the standard 4-chars-per-token heuristic)."""
    toks = tokens_col(F.col(text_col))
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    )
    bpe = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return docs.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        F.size(toks).alias("word_tokens"),
        bpe.alias("bpe_tokens_est"),
    )


def fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Document fingerprints: md5 of the normalized token stream (exact
    content identity modulo whitespace/punctuation) + min-token-hash (a
    1-hash MinHash for cheap near-dup bucketing)."""
    toks = tokens_col(F.col(text_col))
    norm = F.concat_ws(" ", toks)
    min_tok_hash = F.array_min(F.transform(toks, lambda t: F.md5(t)))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        min_tok_hash.alias("min_token_md5"),
    )


# PII / link scrubbing: the pre-training redaction pass (C4/Dolma-style).
# Patterns are deliberately lookaround-free so the SAME source strings are
# valid in Java regex (Spark JVM, codegen'd regexp_replace), RE2 (DuckDB
# oracles), and Python re. Order matters and is part of the contract: URLs
# first (an email inside a URL redacts as the URL), then emails, IPs,
# phone-shaped tails.
PII_PATTERNS: list[tuple[str, str]] = [
    ("url", r"https?://[^\s<>\"']+"),
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+\d[\d\-()]{7,}\d"),
]


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    kinds: list[str] | None = None,
) -> DataFrame:
    """Redact links/emails/IPs/phone-shaped spans with ``<KIND>`` tokens
    and report per-kind match counts.

    Returns ``(id_col, redacted, n_<kind>...)``. Counts are independent
    per-kind matches against the RAW text (an email inside a URL counts
    for both); the redaction itself applies sequentially in
    ``PII_PATTERNS`` order, so overlapping spans redact once as the
    earlier kind. Everything is a JVM column expression — chained
    ``regexp_replace`` + ``regexp_count`` inside whole-stage codegen; at
    100 TB this is a pure map stage with zero shuffle and the filters/
    projections around it still push down to the scan."""
    sel = [p for p in PII_PATTERNS if kinds is None or p[0] in kinds]
    if kinds is not None and len(sel) != len(kinds):
        known = {k for k, _ in PII_PATTERNS}
        raise ValueError(f"unknown PII kinds {sorted(set(kinds) - known)}")
    red = F.col(text_col)
    for kind, pat in sel:
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return docs.select(
        F.col(id_col),
        red.alias("redacted"),
        *[
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long").alias(f"n_{kind}")
            for kind, pat in sel
        ],
    )


def _norm_line(col):
    """Line normalization shared by detect + strip: collapse whitespace,
    trim, lowercase. Java \\s == [ \\t\\n\\x0B\\f\\r]; the python scrub UDF
    mirrors it exactly (not python \\s, which is unicode-wide)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def frequent_lines(
    docs: DataFrame,
    text_col: str = "content",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
    min_line_chars: int = 8,
    n_total: int | None = None,
) -> DataFrame:
    """Corpus-level boilerplate detection (C4/CCNet-style frequent-line
    scrubbing): a normalized line occurring in >= ``min_doc_frac`` of docs
    is boilerplate — license banners, nav chrome, generated headers — the
    highest-yield cleanup in a web-scale training corpus.

    Scale shape: lines are deduped INSIDE each doc first (array_distinct
    over the split — pure JVM, no exchange), so the only shuffle is the
    map-side-combinable groupBy(line) over per-doc-distinct lines; there
    is no (doc, line)-wide distinct exchange. Returns (line, n_docs)
    ordered n_docs desc, line asc."""
    if n_total is None:
        n_total = docs.count()
    thr = max(int(min_docs), int(math.ceil(min_doc_frac * n_total)))
    lines = F.array_distinct(
        F.filter(
            F.transform(
                F.split(F.col(text_col), "\n"), lambda l: _norm_line(l)
            ),
            lambda l: F.length(l) >= min_line_chars,
        )
    )
    return (
        docs.select(F.explode(lines).alias("line"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= thr)
        .orderBy(F.desc("n_docs"), F.asc("line"))
    )


def strip_frequent_lines(
    docs: DataFrame,
    text_col: str = "content",
    frequent: DataFrame | None = None,
    max_lines: int = 100_000,
    **detect_kwargs,
) -> DataFrame:
    """Remove detected boilerplate lines from every doc. The frequent-line
    set is tiny by Zipf (guarded by ``max_lines`` — fail loudly rather
    than broadcast an unbounded set), so it broadcasts into an
    Arrow-batched scrub over ``mapInPandas``-style pandas UDF: the corpus
    text itself never shuffles. Adds ``n_lines_removed`` per doc; all
    other columns pass through."""
    if frequent is None:
        frequent = frequent_lines(docs, text_col=text_col, **detect_kwargs)
    rows = frequent.select("line").limit(max_lines + 1).collect()
    if len(rows) > max_lines:
        raise ValueError(
            f"frequent-line set exceeds max_lines={max_lines}; raise the "
            "detection threshold (min_doc_frac) or max_lines"
        )
    banned = frozenset(r["line"] for r in rows)
    bc = docs.sparkSession.sparkContext.broadcast(banned)
    ws = re.compile("[ \t\n\x0b\f\r]+")  # Java \s, not unicode python \s

    @F.pandas_udf("struct<text: string, n_removed: int>")
    def scrub(s: pd.Series) -> pd.DataFrame:
        bset = bc.value
        texts, removed = [], []
        for t in s:
            if t is None:
                texts.append(None)
                removed.append(0)
                continue
            kept, n = [], 0
            for line in t.split("\n"):
                if ws.sub(" ", line).strip().lower() in bset:
                    n += 1
                else:
                    kept.append(line)
            texts.append("\n".join(kept))
            removed.append(n)
        return pd.DataFrame({"text": texts, "n_removed": removed})

    out = docs.withColumn("_scrub", scrub(F.col(text_col)))
    return (
        out.withColumn(text_col, F.col("_scrub.text"))
        .withColumn("n_lines_removed", F.col("_scrub.n_removed"))
        .drop("_scrub")
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters): the standard
    pre-training quality gates for machine-generated / template spam.

    Per doc:
      * ``dup_line_frac``      — 1 - distinct(lines)/lines over non-blank
        raw lines (identity on the raw line text; blank = whitespace-only)
      * ``dup_line_char_frac`` — chars inside lines occurring >1 time /
        total non-blank line chars (every occurrence of a duplicated line
        counts)
      * ``top_bigram_char_frac`` — chars covered by the most frequent word
        bigram (count x combined token length, ties -> lexicographically
        smallest bigram) / total token chars; 0 when < 2 tokens

    All three are pure per-row functions — ONE Arrow-batched pandas UDF,
    a map-only stage with no shuffle at any corpus size (fractions are
    rounded to 4 JVM-side, HALF_UP like the DuckDB oracle). (Bigram counting
    is per-doc Counter work inside the Arrow batch: cross-doc
    vectorization buys nothing here because the hot loop is already
    O(tokens) with tiny constants, unlike the analyzer's vocab-scaled
    gram expansion.)"""
    word = re.compile("[a-z0-9_]+")

    @F.pandas_udf(
        "struct<dup_line_frac: double, dup_line_char_frac: double, "
        "top_bigram_char_frac: double>"
    )
    def rep(s: pd.Series) -> pd.DataFrame:
        from collections import Counter

        dlf, dlcf, tbcf = [], [], []
        for t in s:
            t = t or ""
            lines = [l for l in t.split("\n") if l.strip()]
            if lines:
                cnt = Counter(lines)
                n = len(lines)
                dlf.append(1.0 - len(cnt) / n)
                tot = sum(len(l) for l in lines)
                dup = sum(len(l) * c for l, c in cnt.items() if c > 1)
                dlcf.append(dup / tot if tot else 0.0)
            else:
                dlf.append(0.0)
                dlcf.append(0.0)
            toks = word.findall(t.lower())
            tok_chars = sum(len(w) for w in toks)
            if len(toks) < 2 or tok_chars == 0:
                tbcf.append(0.0)
                continue
            bg = Counter(zip(toks, toks[1:]))
            # max count, ties -> lexicographically smallest bigram
            top, c = min(bg.items(), key=lambda kv: (-kv[1], kv[0]))
            tbcf.append(c * (len(top[0]) + len(top[1])) / tok_chars)
        return pd.DataFrame(
            {
                "dup_line_frac": dlf,
                "dup_line_char_frac": dlcf,
                "top_bigram_char_frac": tbcf,
            }
        )

    out = docs.select(F.col(id_col), rep(F.col(text_col)).alias("_r"))
    # rounding happens JVM-side (HALF_UP, matching SQL round()) — a python
    # round() inside the UDF would banker's-round exact halves like 1/32
    # the other way and break oracle parity at the 4th decimal
    return out.select(
        id_col,
        F.round("_r.dup_line_frac", 4).alias("dup_line_frac"),
        F.round("_r.dup_line_char_frac", 4).alias("dup_line_char_frac"),
        F.round("_r.top_bigram_char_frac", 4).alias("top_bigram_char_frac"),
    )


def classifier_quality_score(
    docs: DataFrame,
    weights: dict[str, float] | DataFrame | None = None,
    bias: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Linear text-quality classifier scoring — the fastText/CCNet shape
    (logistic regression over mean-pooled per-token weights) used for
    classifier-based quality filtering of pre-training corpora:
    ``score = sigmoid(bias + mean over tokens of w(token))``.

    Three weight sources, three scale shapes:

    * ``weights`` a small dict (a distilled vocabulary, <= ~10k terms):
      compiled into a single map literal riding the plan; the whole score
      is one JVM expression over the token array — zero shuffle, zero
      Python, column-pruned scan. OOV tokens weigh 0.0.
    * ``weights`` a DataFrame ``(term, weight)`` (a full fastText-sized
      vocabulary): explode tokens -> broadcast join -> per-doc mean — the
      corpus text never shuffles, only (id, weight) pairs aggregate
      (map-side combinable).
    * ``weights=None``: deterministic hash-derived stand-in weights
      ``w(t) = md5-unit(t) - 0.5`` (same md5 convention as
      ``sampling._unit_hash`` so exact SQL oracles exist in any engine).
      The plumbing — tokenize, per-token lookup, mean pooling, sigmoid —
      is the deliverable; a real model's weights drop in via the other
      two forms without changing the plan shape.

    Docs that analyze to zero tokens score ``sigmoid(bias)`` (the
    classifier's prior), mirroring fastText's empty-input behavior.
    Returns ``(id_col, quality_score)`` with the score rounded to 6
    decimals (enough to order/threshold on; keeps float64 sum-order
    noise out of oracle comparisons).
    """
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    sig = lambda x: F.lit(1.0) / (F.lit(1.0) + F.exp(-x))  # noqa: E731
    if isinstance(weights, DataFrame):
        exploded = docs.select(
            F.col(id_col), F.explode(toks).alias("term")
        )
        per_doc = (
            exploded.join(F.broadcast(weights), "term", "left")
            .groupBy(id_col)
            .agg(
                F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
        scored = per_doc.select(
            F.col(id_col),
            F.round(
                sig(F.lit(float(bias)) + F.col("_s") / F.col("_n")), 6
            ).alias("quality_score"),
        )
        # zero-token docs never explode a row: union their prior back in
        # (size(null content) is NULL, not 0 — coalesce catches those too)
        empties = docs.filter(F.coalesce(n, F.lit(0)) <= 0).select(
            F.col(id_col),
            F.round(sig(F.lit(float(bias))), 6).alias("quality_score"),
        )
        return scored.unionByName(empties)
    if weights is None:
        w = lambda t: (  # noqa: E731
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("double")
            / F.lit(float(1 << 32))
            - F.lit(0.5)
        )
    else:
        if len(weights) > 10000:
            raise ValueError(
                "dict weights are compiled into a plan literal; pass a "
                f"(term, weight) DataFrame for {len(weights)} terms"
            )
        pairs = sorted(weights.items())
        wmap = F.map_from_arrays(
            F.array(*[F.lit(k) for k, _ in pairs]),
            F.array(*[F.lit(float(v)) for _, v in pairs]),
        )
        w = lambda t: F.coalesce(  # noqa: E731
            F.element_at(wmap, t), F.lit(0.0)
        )
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + w(t)
    )
    mean = F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        F.round(sig(F.lit(float(bias)) + mean), 6).alias("quality_score"),
    )


AUTOGEN_MARKERS = (
    "auto-generated",
    "autogenerated",
    "automatically generated",
    "generated by",
    "do not edit",
)


def code_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    max_line_len: int = 1000,
    max_avg_line_len: float = 100.0,
    min_alnum_ratio: float = 0.25,
    autogen_head_lines: int = 5,
) -> DataFrame:
    """Source-code file-quality ruleset in the shape of The Stack /
    StarCoder preprocessing (Kocetkov et al. 2022 "The Stack", Li et al.
    2023 "StarCoder", Allal et al. 2023 "SantaCoder" data filters) as
    per-rule boolean flags plus the conjunctive ``code_pass``:

    * longest line <= ``max_line_len`` chars (drops minified/data files)
    * mean line length <= ``max_avg_line_len``
    * alphanumeric character fraction >= ``min_alnum_ratio`` (drops
      binary-ish / encoded payloads)
    * not an XML document (``<?xml version=`` within the first 100 chars)
    * no auto-generation marker ("auto-generated", "generated by",
      "do not edit", ...) in the first ``autogen_head_lines`` lines
      (CodeParrot-style generated-file removal)

    Lines = ``split(text, '\\n')`` (empty lines count toward the mean,
    matching a bytes/lines definition). Like the Gopher ruleset this is
    one JVM expression tree per doc — a pure map stage, no shuffle, no
    Python; at 100 TB it fuses into the scan that feeds it.
    """
    exprs = _code_quality_exprs(
        text_col, max_line_len, max_avg_line_len, min_alnum_ratio,
        autogen_head_lines,
    )
    return docs.select(
        F.col(id_col),
        *(c.alias(name) for name, c in exprs.items()),
    )


def _code_quality_exprs(
    text_col: str,
    max_line_len: int = 1000,
    max_avg_line_len: float = 100.0,
    min_alnum_ratio: float = 0.25,
    autogen_head_lines: int = 5,
) -> dict:
    """The Stack/StarCoder ruleset as a named dict of pure column
    expressions — shared by :func:`code_quality_flags` (full per-rule
    report) and :func:`repo_rollup` (which fuses only ``code_pass`` into
    its scan instead of joining the flags frame back to the corpus)."""
    txt = F.col(text_col)
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    line_lens = F.transform(lines, lambda l: F.length(l))
    maxl = F.coalesce(F.array_max(line_lens), F.lit(0))
    avgl = F.aggregate(
        line_lens, F.lit(0), lambda a, x: a + x
    ) / F.greatest(n_lines, F.lit(1))
    n_chars = F.length(txt)
    n_alnum = F.length(F.regexp_replace(txt, r"[^A-Za-z0-9]", ""))
    alnum = n_alnum / F.greatest(n_chars, F.lit(1))
    is_xml = F.substring(txt, 1, 100).contains("<?xml version=")
    head = F.lower(
        F.array_join(F.slice(lines, 1, autogen_head_lines), "\n")
    )
    is_autogen = F.lit(False)
    for m in AUTOGEN_MARKERS:
        is_autogen = is_autogen | head.contains(m)
    ok_max_line = maxl <= max_line_len
    ok_avg_line = avgl <= max_avg_line_len
    ok_alnum = alnum >= min_alnum_ratio
    ok_not_xml = ~is_xml
    ok_not_autogen = ~is_autogen
    return {
        "n_lines": n_lines,
        "max_line_len": maxl,
        "avg_line_len": F.round(avgl, 4),
        "alnum_ratio": F.round(alnum, 4),
        "ok_max_line": ok_max_line,
        "ok_avg_line": ok_avg_line,
        "ok_alnum": ok_alnum,
        "ok_not_xml": ok_not_xml,
        "ok_not_autogen": ok_not_autogen,
        "code_pass": (
            ok_max_line
            & ok_avg_line
            & ok_alnum
            & ok_not_xml
            & ok_not_autogen
        ),
    }


def repo_rollup(
    docs: DataFrame,
    group_col: str = "repo",
    id_col: str = "doc_id",
    text_col: str = "content",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-repository curation report — the code-corpus analogue of the
    reference's parent-hierarchy rollup (J1: children aggregate up the
    address tree; here files aggregate up to their repo): file count,
    whitespace-token volume, total chars, mean quality-pass rate from
    :func:`code_quality_flags`, and distinct languages. The shape a
    training-data pipeline reports before choosing per-repo sampling
    weights.

    Plan: the per-file flags/metrics are pure map-stage column
    expressions fused into the ONE corpus scan — ``code_pass`` comes
    from the shared :func:`_code_quality_exprs` tree inline, NOT by
    joining the flags frame back to the corpus (the previous shape: a
    corpus×corpus sort-merge self-join on a computed uid, a full extra
    shuffle of every row that dominated the op at small-op scale and
    would be the bottleneck at 100 TB). The rollup is then ONE map-side-
    combinable groupBy on ``group_col`` whose shuffle carries a partial
    row per (repo, partition) — never files. Returns
    ``(group_col, n_files, n_tokens, n_chars, pass_rate, n_langs)``
    ordered by ``n_files`` desc, group asc.
    """
    txt = F.col(text_col)
    code_pass = _code_quality_exprs(text_col)["code_pass"]
    per_doc = docs.select(
        F.col(group_col),
        F.size(
            F.filter(F.split(F.trim(txt), r"\s+"), lambda w: w != "")
        ).alias("_tok"),
        F.length(txt).alias("_chars"),
        code_pass.alias("code_pass"),
        *([F.col(lang_col)] if lang_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_files"),
        F.sum("_tok").alias("n_tokens"),
        F.sum("_chars").alias("n_chars"),
        F.round(F.avg(F.col("code_pass").cast("int")), 4).alias(
            "pass_rate"
        ),
    ]
    if lang_col:
        aggs.append(F.count_distinct(F.col(lang_col)).alias("n_langs"))
    return (
        per_doc.groupBy(group_col)
        .agg(*aggs)
        .orderBy(F.desc("n_files"), F.asc(group_col))
    )
