"""Text analysis operators: language-ID heuristic, quality scoring, token
counting, document fingerprinting — the per-document curation signals of a
training-data pipeline, all as JVM column expressions (codegen'd, no Python).
"""

from __future__ import annotations

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
