"""Deduplication operators for large-scale corpus curation.

Beyond the reference's dedup surface (order-preserving unique,
/root/reference/app/util/utils.go:19-31; last-wins batch dedup,
elasticAddressRepository.go:654-667), these are the document-level dedup
primitives a training-data pipeline needs. All JVM-side DataFrame ops (no
Python in the hot path) except MinHash, which uses numpy in a vectorized
pandas UDF.

Scale notes:
  * exact_duplicates: one hash-groupBy shuffle keyed by content digest.
  * shingle-join near-dup: candidate generation via a distinct-shingle
    equi-join (exact blocking — any pair with Jaccard > 0 shares a shingle),
    then exact Jaccard verification; prune hyper-common shingles by df cap
    to bound the join fan-out (standard blocking trick at web scale).
  * minhash_lsh: signatures via xxhash64 permutations, banded into buckets;
    bucket equi-join yields candidates — probabilistic recall, linear cost.
  * simhash: 64-bit md5-derived simhash; equal hashes => near-identical
    token multisets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gofias_spark.query.naive import tokens_col


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """Group identical texts: (digest, keep_id, n_dupes), keep = min id.
    Hash-groupBy, map-side combinable."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_dupes"),
        )
    )


def _shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array column (JVM-side).

    Docs with fewer than ``n`` tokens yield an EMPTY array: the previous
    ``greatest(size-n, -1)`` guard made Spark's ``sequence(0, -1)``
    generate a DESCENDING [0, -1] (step defaults to -1 when stop < start),
    whose ``slice(toks, 0, n)`` then failed the whole job on the first
    short/empty doc in the corpus."""
    toks = tokens_col(text_col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array())


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "content",
    max_shingle_df: int | None = 10000,
) -> DataFrame:
    """Exact near-duplicate pairs (a < b) with shingle-Jaccard >= threshold.

    Blocking join on shared shingles (a superset of all qualifying pairs),
    then exact |A∩B| / (|A|+|B|−|A∩B|). ``max_shingle_df`` drops
    stop-shingles from candidate generation only — the exact Jaccard is
    still computed on full shingle sets, so results stay exact as long as
    every qualifying pair shares at least one sub-cap shingle."""
    sh = docs.select(
        F.col(id_col).alias("id"), _shingles(F.col(text_col), n).alias("sh")
    ).persist()
    sizes = sh.select("id", F.size("sh").alias("sz"))
    exploded = sh.select("id", F.explode("sh").alias("s"))
    if max_shingle_df is not None:
        hot = (
            exploded.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("s")
        )
        exploded = exploded.join(F.broadcast(hot), "s", "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Benchmark decontamination (GPT-3/Pile-style n-gram overlap): flag
    every training doc sharing ANY word-level ``n``-gram (default 13, the
    published decontamination window) with the benchmark set. Returns
    ``(id, n_hit_grams)`` — distinct overlapping grams per contaminated
    doc, id asc; clean docs are absent.

    Scale shape: the benchmark side is tiny next to a training corpus, so
    its distinct gram hashes broadcast into the join against the exploded
    per-doc-distinct training grams — the training corpus text itself
    never shuffles; what does shuffle is the map-side-combinable per-doc
    hit count. Grams compare as xxhash64 of the space-joined window, so
    no gram STRINGS cross the wire either."""
    def gram_rows(df):
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    _shingles(F.col(text_col), n),
                    lambda s: F.xxhash64(s),
                )
            ).alias("gram"),
        )

    bench = gram_rows(benchmark).select("gram").distinct()
    return (
        gram_rows(train)
        .join(F.broadcast(bench), "gram")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
        .orderBy("id")
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """MinHash signatures over word-shingles: (id, sig array<long>).
    Permutations simulated as xxhash64(shingle, seed=i) minima — all
    JVM-side aggregation, no Python."""
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(F.col(text_col), n)).alias("s"),
    )
    mins = exploded.groupBy("id").agg(
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on equal bands.
    Returns (id_a, id_b, n_bands_matched)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(
                            *[
                                F.element_at("sig", i * rows_per_band + j + 1)
                                for j in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_matched"))
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """64-bit SimHash per doc from xxhash64(token) weighted by tf: bit b of
    the result is 1 iff sum over tokens of tf * sign(bit b of hash) > 0.
    Pure JVM expression tree (64 conditional sums)."""
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("t"))
        .groupBy("id", "t")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.xxhash64("t"))
    )
    bit_sums = tf.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                    F.col("tf"),
                ).otherwise(-F.col("tf"))
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(
            F.col(f"b{b}") > 0, F.lit(1).cast("long") * F.lit(2 ** b if b < 63 else -(2 ** 63))
        ).otherwise(F.lit(0).cast("long"))
    return bit_sums.select("id", sim.alias("simhash"))


def _cc_large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every neighbor v > u re-attaches to min(N(u) u {u}).

    Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14).
    Pure DataFrame ops: symmetrize, per-node min via one map-side-combinable
    groupBy, re-emit. No neighbor lists are ever collected."""
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.union(sym.select("u", F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _cc_small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges u > v; every neighbor (all < u) and u
    itself re-attach to min(N(u) u {u})."""
    o = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = (
        o.union(o.select("u", F.col("u").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("m"))
    )
    return (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _cc_local(spark, edge_rows) -> DataFrame:
    """Driver-side union-find over a SMALL edge list — exact same output
    contract as the distributed path (id -> min id of its component, ids
    from the edge set only). Near-dup pair sets are usually tiny relative
    to the corpus (the whole point of deduplication), so below the
    threshold the O(log n) star rounds' 10+ Spark jobs cost more than the
    entire problem; parity with the distributed path is pytest-gated
    (test_connected_components.test_local_path_matches_distributed)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in edge_rows:
        a, b = find(int(r["u"])), find(int(r["v"]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    rows = []
    for members in comp.values():
        m = min(members)
        rows.extend((n, m) for n in members)
    return spark.createDataFrame(rows, "id long, cluster_id long")


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    local_max_edges: int | None = 100_000,
) -> DataFrame:
    """Resolve candidate near-dup PAIRS into transitive CLUSTERS:
    (id, cluster_id) where cluster_id = min doc id of the component.

    The missing piece between pair generation (minhash_lsh_candidates /
    ngram_jaccard_pairs) and actual deduplication: near-duplication is
    transitive in practice (A~B, B~C => drop two of three), so pairs must
    be folded into components before choosing canonicals.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    SOCC'14) — converges in O(log n) rounds on any graph (vs O(diameter)
    for naive min-label propagation, which dies on chain-shaped clusters),
    every round is two shuffles keyed by node id, and no step materializes
    a neighbor list, so hub nodes (a shingle-bucket blowup) cannot OOM an
    executor. Each round is localCheckpoint'ed to truncate lineage.
    Convergence = (count, xxhash64-xor) signature of the edge set stable
    across one full round — O(1) driver data per round.

    Only ids that appear in ``pairs`` are returned; singleton docs are
    their own cluster by definition (left-join the output and coalesce to
    own id, as dedup_clusters does).

    ``local_max_edges``: edge sets at or below this size resolve with a
    driver-side union-find (one job to collect the distinct edges) —
    identical labeling, none of the per-round job overhead. ``None``/0
    forces the distributed star rounds (tests, forced-scale runs)."""
    edges = (
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if local_max_edges:
        # limit(n+1) bounds the probe: never collects more than the
        # threshold + 1 rows even on a billion-edge pair set
        head = edges.limit(local_max_edges + 1).collect()
        if len(head) <= local_max_edges:
            return _cc_local(pairs.sparkSession, head)
    prev_sig = None
    for _ in range(max_iterations):
        edges = _cc_small_star(_cc_large_star(edges)).localCheckpoint(
            eager=True
        )
        sig = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (log2(n_nodes) rounds expected)"
        )
    # converged edge set is a star forest oriented (child > root)
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = (
        edges.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    return labels.union(roots).distinct()


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Per-doc cluster assignment over the WHOLE corpus:
    (id, cluster_id, is_canonical). Docs absent from ``pairs`` are
    singletons (own cluster, canonical). Canonical = min id per cluster,
    so ``filter(is_canonical)`` IS the deduplicated corpus."""
    cc = connected_components(pairs, src=src, dst=dst)
    out = (
        docs.select(F.col(id_col).cast("long").alias("id"))
        .join(cc, "id", "left")
        .select(
            "id",
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("id") == F.col("cluster_id"))
    )
    return out


def last_wins_dedup(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """A3 analogue (upsert buffer keyed last-wins,
    elasticAddressRepository.go:654-667): latest row per key."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _positioned_gram_hashes(docs, n, id_col, text_col):
    """(id, pos, gram) rows: xxhash64 of every n-token window, with its
    0-based start position. One JVM expression tree — tokens, windows,
    hashes all codegen'd; only (id, pos, 8-byte gram hash) leaves the
    scan.

    The window hash is computed in two stages: each token is hashed ONCE
    (xxhash64 string -> long, its own projection so the hash array is
    materialized per row, not re-derived per window), then a window's
    gram is the xxhash64 of the n-long slice of that hash array. Hashing
    long slices instead of re-concatenating token strings per window
    drops the per-window cost from O(window chars) string building to 8n
    bytes of long copies, and removes the concat_ws separator ambiguity
    outright (token boundaries are structural, not textual).
    Same-window => same gram either way, which is the only property
    duplicate detection uses."""
    toks = tokens_col(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("_th"),
    )
    th = F.col("_th")
    windows = F.when(
        F.size(th) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(th) - n),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(F.slice(th, i + 1, n)).alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:long>>"))
    return base.select("id", F.explode(windows).alias("w")).select(
        "id", F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram")
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Span-level exact-substring duplicate detection — the distributed
    word-n-gram form of suffix-array training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a token
    position is duplicated iff its n-token window occurs at MORE THAN ONE
    (doc, position) site corpus-wide — including self-repetition within a
    single doc. The canonical site (globally smallest (doc_id, pos) per
    gram) is exempt, so exactly one copy of every duplicated substring
    survives a strip. Overlapping duplicated windows merge into maximal
    per-doc token spans (gaps-and-islands over a per-doc window).

    Returns ``(id_col, start_tok, end_tok)`` — inclusive 0-based token
    positions, one row per maximal span, sorted (id, start).

    Scale shape: the only corpus-sized exchange is the (gram-hash, id,
    pos) aggregation — 16 bytes/window, map-side combinable count+min;
    gram STRINGS never shuffle (xxhash64). The join back to positions is
    gram-keyed (AQE broadcasts it when the duplicated set is small, which
    it is on real corpora); span merging is a per-doc window — partitioned
    by doc, never global.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    grams = _positioned_gram_hashes(docs, n, id_col, text_col)
    dup = (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("_sites"),
            F.min(F.struct("id", "pos")).alias("_canon"),
        )
        .filter(F.col("_sites") > 1)
        .select("gram", "_canon")
    )
    marks = (
        grams.join(dup, "gram")
        .filter(
            ~(
                (F.col("id") == F.col("_canon.id"))
                & (F.col("pos") == F.col("_canon.pos"))
            )
        )
        .select("id", "pos")
    )
    w = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + n - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marks.withColumn(
        "_new", (F.col("pos") > F.coalesce(prev_max_end, F.lit(-1))).cast("int")
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + n - 1).alias("end_tok"),
        )
        .select(F.col("id").alias(id_col), "start_tok", "end_tok")
        .orderBy(id_col, "start_tok")
    )


def strip_duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Remove the duplicated spans found by :func:`duplicate_spans` from
    each doc's token stream, keeping the canonical copy corpus-wide.
    Returns ``(id_col, content_stripped, n_tokens_removed)`` for EVERY
    input doc (clean docs pass through with 0 removed).

    The rebuilt text is the surviving tokens joined by single spaces —
    token-stream fidelity, not byte fidelity (the analyzer already
    normalized case/punctuation), which is what the downstream tokenizer
    consumes anyway.

    Scale shape: spans per doc ride a (small) gram-keyed aggregation back
    onto the doc via an id-keyed join; the strip itself is one JVM
    filter-with-index over the token array — no Python, no extra shuffle
    beyond the span join.
    """
    spans = (
        duplicate_spans(docs, n, id_col, text_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
        )
    )
    joined = docs.join(spans, id_col, "left")
    toks = tokens_col(F.col(text_col))
    sp = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<start_tok:int,end_tok:long>>"),
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            sp, lambda s: (i >= s.start_tok) & (i <= s.end_tok)
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("content_stripped"),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )
