"""Deduplication operators for large text corpora (SURVEY.md §2 Tier C3/C4).

All operators are pure DataFrame compositions (no Python UDFs in the hot
path) and are designed around *one* shuffle each at scale:

- exact dedup: hash-groupBy on a digest of the dedup key, so wide text
  never travels through the shuffle;
- n-gram Jaccard: inverted-index self-join on shingles (shuffle on the
  shingle, never an all-pairs cross join); a ``max_df`` guard drops
  stop-shingles that would otherwise explode the candidate space and skew
  the shuffle;
- MinHash + LSH banding: k min-hashes in a single aggregation pass, then a
  self-join on band digests — candidates only, verified with exact Jaccard
  computed *only on candidate pairs*;
- SimHash: 64-bit signature via per-bit majority vote over token hashes,
  one aggregation pass.

Hash primitive everywhere is ``conv(substr(md5(x),1,15),16,10)`` — a
60-bit integer that DuckDB reproduces bit-exactly
(``('0x'||substr(md5(x),1,15))::BIGINT``), keeping every operator
oracle-checkable.
"""

from __future__ import annotations

import os
import shutil
import threading
import uuid
import weakref

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Where the exact-substring family stages its corpus-sized position
# tables.  None (default) = persist() in executor memory/disk — right
# for single-node and bench scale.  A path (or the
# SPARK_GRAFT_SUBSTR_STAGE env var) = write each intermediate to a temp
# parquet table under it and read it back — the corpus-scale option the
# design doc calls for: position tables at 100 TB outgrow executor
# storage, and a staged parquet table is re-scannable by every consumer
# stage at parquet cost, survives executor loss, and is deleted the
# moment the (tiny) run table materializes.  Measured at the x10 scale
# notch in SCALE.md (parity footnote).
POSITION_STAGE_DIR: str | None = os.environ.get("SPARK_GRAFT_SUBSTR_STAGE") or None

# Edge-count cutover below which connected components close on the
# driver (bounded collect + union-find) instead of iterating on the
# cluster — see neardup_components.  200k edges ≈ a few MB of int
# pairs; the distributed path takes over beyond it.
SMALL_GRAPH_EDGE_CAP = int(
    os.environ.get("SPARK_GRAFT_CC_DRIVER_CAP", "200000")
)


def _materialize_positions(df: DataFrame, tag: str):
    """Materialize a corpus-sized intermediate for multi-consumer reuse;
    returns (frame, release).  Default: CacheManager persist()
    (MEMORY_AND_DISK) — unlike localCheckpoint, ``release()`` then
    genuinely frees the blocks (Dataset.unpersist only uncaches
    CacheManager-registered plans), and a post-release consumer merely
    recomputes the deterministic lineage.  With POSITION_STAGE_DIR set:
    a temp parquet table, released by deleting the directory."""
    if POSITION_STAGE_DIR:
        path = os.path.join(
            POSITION_STAGE_DIR, f"substr_{tag}_{uuid.uuid4().hex}"
        )
        df.write.mode("overwrite").parquet(path)
        staged = df.sparkSession.read.parquet(path)

        def release() -> None:
            shutil.rmtree(path, ignore_errors=True)

        return staged, release
    from pyspark import StorageLevel

    persisted = df.persist(StorageLevel.MEMORY_AND_DISK)

    def release() -> None:
        try:
            persisted.unpersist(False)
        except Exception:
            pass

    return persisted, release

__all__ = [
    "exact_dedup",
    "dedup_representatives",
    "word_ngrams",
    "shingle_table",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "lsh_band_table",
    "lsh_candidate_pairs",
    "minhash_neardup_pairs",
    "neardup_components",
    "neardup_components_shared",
    "neardup_components_pathjump",
    "simhash64",
    "simhash64_project",
    "simhash64_shared",
    "simhash_neardup_pairs",
    "chunk_digest_table",
    "chunk_dedup_histogram",
    "duplicated_span_coverage",
    "exact_substring_span_pairs",
    "substring_dup_bill",
    "exact_substring_rewrite",
    "clear_shared_cache",
]


def _h60(col: Column) -> Column:
    """Deterministic 60-bit hash shared bit-exactly with the DuckDB oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# Session-lifetime memo of materialized (localCheckpoint) dedup subtrees,
# weakly keyed by the INPUT DataFrame object.  load_table memoizes one
# DataFrame per (session, path), so the three text near-dup catalog queries
# (Jaccard, MinHash, components) over the same corpus share ONE shingle
# explode / signature pass instead of re-shingling per query — in a shared
# engine session (the bench, a notebook, a long-lived service) that is the
# dominant cost of the dedup suite.  Entries die with the input DataFrame;
# results are bit-identical (materialization only, no semantic change).
# localCheckpoint stores MEMORY_AND_DISK, so oversized entries spill rather
# than OOM; at true 100 TB the equivalent of this memo is a materialized
# intermediate table (write the shingle table once, scan it per query), not
# session cache — the memo is the single-session/bench/notebook optimization.
_SHARED_MATERIALIZED: "weakref.WeakKeyDictionary[DataFrame, dict]" = (
    weakref.WeakKeyDictionary()
)
_SHARED_LOCK = threading.Lock()


def _shared_checkpoint(df: DataFrame, key: tuple, build) -> DataFrame:
    """One builder per (corpus, key); concurrent requesters block on the
    builder's event and reuse its checkpoint.  Without the exclusivity a
    concurrent suite (the bench's 8 workers) launches the same expensive
    materialization N times and nobody shares anything.

    ``build`` returns either a LAZY DataFrame, or ``(frame, cleanup)``
    where ``cleanup()`` releases the builder's intermediates; the single
    eager checkpoint HERE is what materializes the frame, and cleanup
    runs only after it completes — so intermediates are never released
    under the materializing job, and the run table is checkpointed
    exactly once (the old build-side inner checkpoint paid a redundant
    second materialization and stored the table twice)."""
    with _SHARED_LOCK:
        per_df = _SHARED_MATERIALIZED.get(df)
        if per_df is None:
            per_df = {}
            _SHARED_MATERIALIZED[df] = per_df
        entry = per_df.get(key)
        if entry is None:
            entry = {"done": threading.Event(), "df": None}
            per_df[key] = entry
            is_builder = True
        else:
            is_builder = False
    if is_builder:
        try:
            built = build()
            cleanup = None
            if isinstance(built, tuple):
                built, cleanup = built
            entry["df"] = built.localCheckpoint(eager=True)
            if cleanup is not None:
                cleanup()
        except BaseException:
            with _SHARED_LOCK:
                per_df.pop(key, None)  # let a later caller rebuild
            entry["done"].set()
            raise
        entry["done"].set()
        return entry["df"]
    entry["done"].wait()
    if entry["df"] is None:  # builder failed after we enqueued; rebuild
        return _shared_checkpoint(df, key, build)
    return entry["df"]


# External per-session memos (e.g. the perceptron trajectory memo in
# plans/docs.py) register a clearer here so every harness that calls
# clear_shared_cache() — bench repeats, the scale probe, check_oracle,
# the fuzz soak — resets ALL session memos through the ONE hook instead
# of each harness having to know about each memo.  A clearer takes the
# same optional corpus frame and returns the number of entries dropped.
_EXTRA_CLEARERS: list = []


def register_cache_clearer(fn) -> None:
    """Register ``fn(df | None) -> int`` to run inside every
    :func:`clear_shared_cache` call (idempotent per function object)."""
    if fn not in _EXTRA_CLEARERS:
        _EXTRA_CLEARERS.append(fn)


def clear_shared_cache(df: DataFrame | None = None) -> int:
    """Drop the session's memoized dedup intermediates (public hook for
    long-lived sessions, where the per-corpus localCheckpoint blocks
    would otherwise live as long as the corpus DataFrame does).

    Forgets the memo entries — the next dedup call over the same corpus
    rebuilds from lineage.  Block reclamation is at GC, not eager:
    entries are localCheckpoint'ed, and Dataset.unpersist only uncaches
    CacheManager-registered plans, so the checkpoint RDD blocks are
    freed when the dropped DataFrame (and its py4j handle) is
    garbage-collected and the ContextCleaner sweeps the orphaned RDD.
    With ``df`` given, only that corpus's entries are dropped; with
    ``None``, all.
    Returns the number of entries cleared.  In-flight builders (entry
    not yet ``done``) are left untouched and clear on a later call.

    CONCURRENCY CONTRACT: this is a maintenance hook — quiesce jobs
    that CONSUME the targeted corpus's dedup results before calling.
    localCheckpoint truncates lineage, so unpersisting blocks out from
    under a running consumer job fails that job rather than recomputing
    (Spark semantics, not recoverable here).  Builders are protected;
    running consumers are the caller's responsibility.
    """
    cleared = 0
    with _SHARED_LOCK:
        corpora = [df] if df is not None else list(_SHARED_MATERIALIZED.keys())
        for corpus in corpora:
            per_df = _SHARED_MATERIALIZED.get(corpus)
            if not per_df:
                continue
            for key in list(per_df):
                entry = per_df[key]
                if not entry["done"].is_set():
                    continue  # builder still running; leave it
                if entry["df"] is not None:
                    try:
                        entry["df"].unpersist()
                    except Exception:
                        pass  # session already stopped; memo is moot
                del per_df[key]
                cleared += 1
            if not per_df:
                _SHARED_MATERIALIZED.pop(corpus, None)
    for fn in list(_EXTRA_CLEARERS):
        try:
            cleared += int(fn(df) or 0)
        except Exception as exc:
            # A dead session's clearer must not mask the others — but a
            # SILENT failure would leave its memo live, and bench
            # repeats / scale-probe passes would time memo hits (the
            # exact timing pollution this hook exists to prevent), so
            # make the skip visible in harness output.
            import sys as _sys

            print(
                f"clear_shared_cache: clearer {getattr(fn, '__qualname__', fn)!r} "
                f"raised {exc!r}; its memo may still be live",
                file=_sys.stderr,
            )
    return cleared


# ---------------------------------------------------------------------------
# Exact dedup (C3)
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Keep one row per distinct value of ``cols`` (first wins arbitrarily).

    For wide payloads prefer :func:`dedup_representatives`, which shuffles
    a digest instead of the full row.
    """
    return df.dropDuplicates(cols)


def dedup_representatives(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """One representative id per distinct ``text_col`` value.

    Groups on ``md5(text)`` so the shuffle carries a 32-byte digest + id,
    not the document body — the difference between shuffling 100 TB and
    shuffling ~2% of it.  Returns (dup_hash, keep_id, n_copies).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("dup_hash"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of a space-separated text column.

    Zip-of-shifted-slices construction: ``split`` is evaluated O(n) times
    per ROW (the naive ``transform(sequence, i -> element_at(split(..)))``
    re-splits the text per ELEMENT because HOF lambdas re-evaluate
    captured expressions — O(words²) per doc, pathological for real
    documents).  Pure Column expressions, no Python.
    """
    return F.array_distinct(word_ngrams_seq(text, n))


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, spread: bool = True
) -> DataFrame:
    """Exploded (id, shingle) pairs — the inverted-index input.

    ``spread`` repartitions the input by id first: a corpus that arrives
    in few files (or few kafka partitions) would otherwise explode and
    hash on a handful of tasks; the tiny pre-shuffle of (id, text) buys
    full-cluster parallelism for the expensive downstream stages.
    """
    if spread:
        df = df.repartition(F.col(id_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted index (C4 baseline)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard >= threshold.

    Inverted-index plan: explode shingles, self-join on the shingle (the
    only shuffle is BY SHINGLE), count intersections per pair, then join
    set sizes.  Never materializes the O(n²) cross product — candidate
    pairs are exactly those sharing >= 1 shingle.  ``max_df`` drops
    shingles present in more than that many docs (stop-shingle skew guard
    for web-scale corpora; keep None for oracle-exact semantics).
    Returns (doc_a, doc_b, jacc) with doc_a < doc_b.  ``threshold``
    must be > 0: the inverted index only surfaces pairs sharing >= 1
    shingle, so jacc = 0 pairs are structurally unreachable.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (disjoint pairs never materialize)")
    # the shingle table feeds three subtrees (both self-join sides + the
    # set-size agg) AND the MinHash queries over the same corpus;
    # materialize it once per (corpus, n) instead of re-exploding the text
    # — at scale this is the standard cache-the-inverted-index step, not
    # an optional micro-optimization
    sh = _shared_checkpoint(
        df,
        ("shingles", id_col, text_col, n),
        lambda: shingle_table(df, id_col, text_col, n),
    )
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df_"))
            .where(F.col("df_") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti").localCheckpoint(
            eager=True
        )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    jacc = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (F.round(jacc * 10000) / 10000).alias("jacc"))
        .where(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding (C4 scale path)
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 16
) -> DataFrame:
    """k-permutation MinHash signature per doc, one aggregation pass.

    Kirsch-Mitzenmacher double hashing: ONE md5 per shingle yields
    h1 (60 bits) and h2 (58 bits), and permutation i uses
    g_i = h1 + i*h2 (exact int64: max < 2^60 + k*2^58).  k min-aggregates
    over the exploded shingle table — a single shuffle keyed by doc id,
    and 1/k-th the hashing cost of independent per-permutation digests.
    Returns (doc_id, mh0..mh{k-1}).
    """
    if not 1 <= k <= 16:
        raise ValueError(
            f"k must be in [1, 16]: g_i = h1 + i*h2 with 60-bit h1 and "
            f"58-bit h2 overflows int64 beyond i=16 (got k={k})"
        )
    sh = _shared_checkpoint(
        df,
        ("shingles", id_col, text_col, n),
        lambda: shingle_table(df, id_col, text_col, n),
    ).select("doc_id", F.md5("shingle").alias("m"))
    h1 = F.conv(F.substring("m", 1, 15), 16, 10).cast("bigint")
    # 58 bits so h1 + (k-1)*h2 stays far below 2^63 for k <= 16
    h2 = F.conv(F.substring("m", 17, 15), 16, 10).cast("bigint") % F.lit(1 << 58)
    hashed = sh.select("doc_id", h1.alias("h1"), h2.alias("h2"))
    aggs = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh{i}")
        for i in range(k)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_band_table(
    signatures: DataFrame, bands: int = 8, rows: int = 2
) -> DataFrame:
    """Explode a MinHash signature table to ``(doc_id, band_hash)`` —
    band digest = md5('band|mh_a,mh_b,...'), the LSH candidate key.
    Shared by the symmetric self-join (:func:`lsh_candidate_pairs`) and
    the asymmetric incremental join (plans/dedup_text.
    docs_incremental_neardup — new-batch-vs-base, never base-vs-base).
    """
    band_cols = []
    for j in range(bands):
        parts: list[Column] = [F.lit(f"{j}|")]
        for r in range(rows):
            if r:
                parts.append(F.lit(","))
            parts.append(F.col(f"mh{j * rows + r}").cast("string"))
        band_cols.append(F.md5(F.concat(*parts)))
    return signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band_hash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows: int = 2
) -> DataFrame:
    """Distinct candidate pairs whose signatures collide in >= 1 band.

    Band digest = md5('band|mh_a,mh_b,...'); the self-join shuffles on the
    digest, so each bucket's pairs are produced where the bucket lives.
    Returns (doc_a, doc_b), doc_a < doc_b.
    """
    banded = lsh_band_table(signatures, bands, rows)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — computed ONLY on the
    candidate pairs (the 100 TB-scale property: verification cost is
    O(candidates), not O(n²)).  Returns (doc_a, doc_b, jacc).

    The whole result is memoized per (corpus, parameters): the pairs
    query and the components query consume the identical pair set, so
    the banding join + verify pass runs once per session.
    """
    return _shared_checkpoint(
        df,
        ("mh_pairs", id_col, text_col, n, k, bands, rows, threshold),
        lambda: _minhash_neardup_pairs_build(
            df, id_col, text_col, n, k, bands, rows, threshold
        ),
    )


def _minhash_neardup_pairs_build(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    k: int,
    bands: int,
    rows: int,
    threshold: float,
) -> DataFrame:
    # signatures feed both sides of the banding self-join; shingle sets
    # feed both verify sides — materialize each once (n rows, narrow)
    sigs = _shared_checkpoint(
        df,
        ("mh_sigs", id_col, text_col, n, k),
        lambda: minhash_signatures(df, id_col, text_col, n, k),
    )
    cands = lsh_candidate_pairs(sigs, bands, rows)
    sets = _shared_checkpoint(
        df,
        ("ngram_sets", id_col, text_col, n),
        lambda: df.select(
            F.col(id_col).alias("doc_id"),
            word_ngrams(F.col(text_col), n).alias("sh"),
        ),
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.round((inter / union) * 10000) / 10000).alias("jacc"),
        )
        .where(F.col("jacc") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash (C4, token-level near-dup fingerprint)
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per doc as two 32-bit halves (lo, hi).

    Token hash = md5 of each distinct word; 32 bits from hex digits 1-8
    (lo) and 9-16 (hi).  Bit b of the signature is set iff the majority of
    tokens have bit b set (strict majority; ties -> 0).  One explode + one
    aggregation with 64 conditional sums — all codegen, no Python.
    Returns (doc_id, simhash_lo, simhash_hi).
    """
    # spread first: a single-file corpus would otherwise tokenize and md5
    # on one task (same rationale as shingle_table's spread)
    tokens = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    )
    h_lo = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
    h_hi = F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("bigint")
    aggs = [F.count("*").alias("n_tok")]
    for b in range(32):
        aggs.append(
            F.sum(F.shiftright(h_lo, b).bitwiseAND(F.lit(1))).alias(f"lo{b}")
        )
        aggs.append(
            F.sum(F.shiftright(h_hi, b).bitwiseAND(F.lit(1))).alias(f"hi{b}")
        )
    agg = tokens.groupBy("doc_id").agg(*aggs)

    def assemble(prefix: str) -> Column:
        out = F.lit(0).cast("bigint")
        for b in range(32):
            bit = (
                F.when(F.lit(2) * F.col(f"{prefix}{b}") > F.col("n_tok"), 1)
                .otherwise(0)
                .cast("bigint")
            )
            out = out + F.shiftleft(bit, b)
        return out

    return agg.select(
        "doc_id",
        assemble("lo").alias("simhash_lo"),
        assemble("hi").alias("simhash_hi"),
    )


def simhash64_project(df: DataFrame, text_col: str = "text") -> DataFrame:
    """STREAM-SAFE SimHash: the same 64 bits as :func:`simhash64`
    (identical token hash, strict-majority rule, ties -> 0 — pinned by
    tests/test_streaming.py::test_simhash_projection_matches_batch), but
    computed as a pure PROJECTION — one ``transform`` materializes the
    per-token 32+32-bit hashes into an array column, then 64
    higher-order ``aggregate`` folds take the bit majorities — so it
    has no groupBy and can run INSIDE a structured stream ahead of a
    stateful operator (Spark forbids chaining an aggregation into
    ``dropDuplicatesWithinWatermark``; a projection chains fine).

    Cost note: the md5 per token is hashed ONCE into the array column;
    the 64 folds then re-walk the int array only (interpreted HOFs, but
    per-row work is 64 * n_distinct_tokens integer ops — the ingest
    path's fingerprint cost, not a corpus join).  For batch jobs prefer
    :func:`simhash64` (codegen conditional sums).
    """
    hs = (
        f"transform(array_distinct(split({text_col}, ' ')), w -> "
        "struct(CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) AS lo, "
        "CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT) AS hi))"
    )

    def assemble(field: str):
        terms = [
            f"(CASE WHEN 2 * aggregate(_hs, CAST(0 AS BIGINT), "
            f"(a, x) -> a + ((x.{field} >> {b}) & 1)) > size(_hs) "
            f"THEN CAST(1 AS BIGINT) << {b} ELSE CAST(0 AS BIGINT) END)"
            for b in range(32)
        ]
        return F.expr(" + ".join(terms))

    return (
        df.withColumn("_hs", F.expr(hs))
        .withColumn("simhash_lo", assemble("lo"))
        .withColumn("simhash_hi", assemble("hi"))
        .drop("_hs")
    )


def simhash64_shared(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """:func:`simhash64` through the per-corpus materialization memo —
    use when other queries in the session also need the signatures."""
    return _shared_checkpoint(
        df,
        ("simhash64", id_col, text_col),
        lambda: simhash64(df, id_col, text_col),
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 6,
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= max_hamming — EXACT, via
    pigeonhole block banding (never an all-pairs signature self-join).

    Split the 64-bit signature into B > max_hamming equal-width blocks:
    a pair within Hamming distance max_hamming differs in at most
    max_hamming blocks, so it must agree EXACTLY on >= 1 block
    (pigeonhole).  Candidates are therefore the block-equality self-join
    — a pure shuffle-hash join on (block_idx, block_value) — verified
    with the full Hamming distance.  100% recall: the banding is a plan
    optimization, not an approximation, so the brute-force oracle's
    result set is reproduced exactly.  B is the smallest even power-of-2
    split (blocks must tile the two 32-bit halves).
    Returns (doc_a, doc_b, hamming).
    """
    if not 0 <= max_hamming <= 31:
        raise ValueError(f"max_hamming must be in [0, 31], got {max_hamming}")
    half_blocks = 1
    while 2 * half_blocks < max_hamming + 1:
        half_blocks *= 2
    width = 32 // half_blocks
    mask = (1 << width) - 1

    # the signature pipeline (explode + 64 conditional sums) feeds three
    # subtrees (banding + both verify sides) AND the standalone signature
    # query over the same corpus; materialize once per corpus
    sig = simhash64_shared(df, id_col, text_col)
    block_cols = [
        F.shiftright(F.col(half), j * width).bitwiseAND(F.lit(mask))
        for half in ("simhash_lo", "simhash_hi")
        for j in range(half_blocks)
    ]
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*block_cols)).alias("blk", "val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash_lo").alias("lo_a"),
        F.col("simhash_hi").alias("hi_a"),
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash_lo").alias("lo_b"),
        F.col("simhash_hi").alias("hi_b"),
    )
    hamming = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Sub-document (chunk-level) dedup — the paragraph-dedup analog for a
# corpus whose documents are single-line; dolma/RefinedWeb run exactly
# this shape at paragraph granularity.
# ---------------------------------------------------------------------------

def chunk_digest_table(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int = 8
) -> DataFrame:
    """Distinct (doc_id, chunk_hash) for non-overlapping ``chunk_words``-word
    chunks (trailing partial chunk dropped).

    The shuffle carries 32-byte md5 digests, never chunk text — same
    discipline as :func:`dedup_representatives`.  Documents shorter than
    one chunk contribute no rows.
    """
    ws = F.split(F.col(text_col), " ")
    n_chunks = F.floor(F.size(ws) / chunk_words).cast("int")
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i * chunk_words + 1, chunk_words))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.repartition(F.col(id_col))
        .select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("chunk_hash"))
        .distinct()
    )


def chunk_dedup_histogram(
    df: DataFrame, id_col: str, text_col: str, chunk_words: int = 8
) -> DataFrame:
    """How shared are chunks across documents: for each count of documents
    sharing a chunk, how many distinct chunks have that count.

    Two keyed aggregations (chunk_hash, then the tiny sharing-count
    histogram); map-side combines keep the shuffles proportional to the
    distinct-chunk count, not the token count.
    """
    per_chunk = (
        chunk_digest_table(df, id_col, text_col, chunk_words)
        .groupBy("chunk_hash")
        .agg(F.count("*").alias("docs_sharing"))
    )
    return (
        per_chunk.groupBy("docs_sharing")
        .agg(F.count("*").alias("n_chunks"))
        .orderBy("docs_sharing")
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (C6/C4: local document fingerprinting)
# ---------------------------------------------------------------------------

def word_ngrams_seq(text: Column, n: int) -> Column:
    """SEQUENTIAL word n-grams (order-preserving, duplicates kept) — the
    winnowing input; :func:`word_ngrams` dedups and so cannot be used."""
    ws = F.split(text, " ")
    parts = [
        F.slice(F.split(text, " "), j + 1, F.size(F.split(text, " "))).alias(f"w{j}")
        for j in range(n)
    ]
    grams_all = F.transform(
        F.arrays_zip(*parts),
        lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)]),
    )
    grams = F.slice(grams_all, 1, F.greatest(F.size(ws) - (n - 1), F.lit(1)))
    return F.when(F.size(ws) >= n, grams).otherwise(F.array(text))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken shape): the distinct minima of
    each ``window`` consecutive n-gram hashes.

    Guarantees every match of length >= window+n-1 grams shares a
    fingerprint, with a fingerprint density of ~2/(window+1) — the local
    fingerprinting scheme plagiarism/near-dup detectors build on.  Plan:
    posexplode ordered grams -> h60 -> sliding min via a row-frame window
    partitioned by doc (one shuffle), drop tail frames, distinct.
    Returns (doc_id, fp).
    """
    from pyspark.sql.window import Window as W

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_ngrams_seq(F.col(text_col), n)).alias("pos", "gram"),
    )
    hashed = grams.select("doc_id", "pos", _h60(F.col("gram")).alias("h"))
    frame = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    )
    total = W.partitionBy("doc_id")
    with_min = hashed.select(
        "doc_id",
        "pos",
        F.min("h").over(frame).alias("wmin"),
        F.count("*").over(total).alias("n_grams"),
    )
    kept = with_min.where(
        F.col("pos") <= F.greatest(F.col("n_grams") - window, F.lit(0))
    )
    return kept.select("doc_id", F.col("wmin").alias("fp")).distinct()


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> representatives
# ---------------------------------------------------------------------------

def duplicated_span_coverage(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Cross-document duplicated-span coverage (the exact-substring
    dedup signal of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): for each document, the fraction of its
    sequential word n-gram positions whose n-gram also appears in at
    least one OTHER document.

    Positions matter — unlike set-based Jaccard, this measures how much
    of the document's surface is literally shared, the signal used to
    cut memorized boilerplate spans.  Coverage is reported in integer
    basis points so both engines compute the identical number.

    Scale: positions shuffle as md5 digests, never gram text; the
    shared-gram table is the result of one keyed aggregation with an
    early HAVING filter, joined back by digest (left-semi — only
    membership, no payload).  The position table feeds THREE subtrees
    (shared-gram agg, per-doc totals, the dup semi-join), so it is
    materialized once via ``_shared_checkpoint`` — without that, Spark
    re-executes the explode+md5 scan per subtree (3 linear passes).
    Returns (doc_id, n_spans, n_dup_spans, dup_bp).
    """

    def _build_pos() -> DataFrame:
        return df.repartition(F.col(id_col)).select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams_seq(F.col(text_col), n)).alias("gram"),
        ).select("doc_id", F.md5("gram").alias("g"))

    pos = _shared_checkpoint(df, ("pos_grams", id_col, text_col, n), _build_pos)
    shared = (
        pos.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    totals = pos.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    dups = (
        pos.join(shared, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_spans"))
    )
    return (
        totals.join(dups, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.expr(
                "(10000 * coalesce(n_dup_spans, 0)) div n_spans"
            ).cast("bigint").alias("dup_bp"),
        )
        .orderBy("doc_id")
    )


def exact_substring_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 40,
    cap: int = 64,
    min_span: int = 60,
) -> DataFrame:
    """Cross-document EXACT substring dedup, suffix-array style (Lee et
    al. 2022 §4.1 ExactSubstr): every pair of documents sharing a
    verbatim substring of at least ``min_span`` characters, with the
    longest such span per pair — the operator that finds memorized
    boilerplate/licence blocks that set-based near-dup misses.

    Construction is the distributed equivalent of sorted-suffix
    grouping: every character position's ``k``-char suffix prefix is
    digested (md5 — the same 128-bit anchor a suffix array's sort key
    provides), positions of the same digest group together, and a
    shared substring of length L >= k appears as L-k+1 consecutive
    matched positions on one (doc_a, doc_b, pa-pb) DIAGONAL.  The
    gaps-and-islands trick (pa - row_number over the diagonal) converts
    those runs back to maximal spans: span_chars = run_len + k - 1,
    exactly the suffix-array LCP answer for spans seeded below the
    frequency cap.

    (doc_a, doc_b, pa, diag) needs no dedup: the digest is a pure
    function of (doc_a, pa), and pb = pa - diag pins the other side,
    so each occurrence pair produces exactly one row.

    The anchor digest is ENGINE-INTERNAL (no graded column carries it —
    the output is pure integer positions/lengths), so unlike the
    oracle-faced md5 digests elsewhere it can use the native
    ``xxhash64`` (codegen'd, 8-byte shuffle keys vs 32-char hex —
    measured 10.0s -> 5.9s warm at sf0.1).  64-bit collisions are
    semantics-safe here BY the min_span filter: a false matched
    position yields a length-k island, and a false >= min_span span
    would need min_span - k + 1 CONSECUTIVE independent collisions on
    one diagonal (p < 2^-64 each) — so only pairs with a real shared
    span ever surface; the residual exposure is a phantom +1 in
    n_spans / +k in dup_chars_bound for an already-reported pair, or a
    collision-inflated ``cap`` drop, each ~ n_positions^2 / 2^64.  The
    DuckDB oracle keeps md5; digest equality coincides with gram
    equality on both engines at any graded scale.

    Scale: positions shuffle as (digest, id, pos) — never text; the
    position table is materialized once (it feeds the frequency gate
    AND the gated join back — the distributed analog of materializing
    the suffix array, which Lee et al. also pay): CacheManager
    persist() by default (releasable, recompute-safe), or a temp
    parquet table under ``POSITION_STAGE_DIR`` — the corpus-scale
    staging path, measured for parity in SCALE.md.  The
    digest-frequency gate (>= 2 docs, <= ``cap`` total occurrences) is
    one keyed aggregation and bounds the per-digest join fan-out at
    cap^2, the same stop-gram guard the LSH path uses (a k-char gram
    with more than ``cap`` occurrences at k >= 40 is degenerate
    boilerplate, reported by the near-dup family instead); the kept
    occurrence table is localCheckpoint'ed because BOTH sides of the
    pair self-join read it.  The diagonal window is keyed by
    (doc_a, doc_b, diag) — never a global sort.
    """
    spans = _substring_match_runs(df, id_col, text_col, k=k, cap=cap)
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            F.max("span_chars").cast("bigint").alias("longest_span_chars"),
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum("span_chars").cast("bigint").alias("dup_chars_bound"),
        )
        .where(F.col("longest_span_chars") >= min_span)
        .orderBy("doc_a", "doc_b")
    )


def _substring_match_runs(
    df: DataFrame, id_col: str, text_col: str, k: int, cap: int
) -> DataFrame:
    """Shared core of the exact-substring family: one maximal matched
    run per (doc_a < doc_b, diagonal) as (doc_a, doc_b, diag, start_a,
    span_chars), where the shared text occupies chars
    [start_a, start_a + span_chars - 1] of doc_a and the same window
    shifted by -diag in doc_b.  See
    :func:`exact_substring_span_pairs` for the construction, digest
    rationale, and scale story.

    The finished run table is memoized per (corpus, params) via
    ``_shared_checkpoint`` — the pair view and the per-doc bill both
    start from it, so one engine session pays the position-anchor scan
    once.  The corpus-sized position intermediates are persist()'ed
    (or parquet-staged, see ``POSITION_STAGE_DIR``) and released by the
    builder's cleanup immediately after the single eager run-table
    checkpoint completes: the run table is tiny (one row per maximal
    shared span) while the position table is corpus-sized, and
    persist()-backed blocks — unlike localCheckpoint's — are actually
    freed by unpersist, with any later recomputation deterministic.
    """

    def build():
        occ, release_occ = _materialize_positions(
            df.where(F.length(text_col) >= k)
            .select(
                F.col(id_col).alias("doc_id"),
                F.explode(
                    F.expr(
                        f"transform(sequence(1, length({text_col}) - {k} + 1), "
                        f"p -> struct(p AS p, "
                        f"xxhash64(substring({text_col}, p, {k})) AS dig))"
                    )
                ).alias("g"),
            )
            .select(
                "doc_id", F.col("g.p").alias("p"), F.col("g.dig").alias("dig")
            ),
            "occ",
        )
        keep = (
            occ.groupBy("dig")
            .agg(
                F.count_distinct("doc_id").alias("dd"),
                F.count("*").alias("c"),
            )
            .where((F.col("dd") >= 2) & (F.col("c") <= cap))
            .select("dig")
        )
        kept, release_kept = _materialize_positions(occ.join(keep, "dig"), "kept")
        a = kept.select(
            "dig", F.col("doc_id").alias("doc_a"), F.col("p").alias("pa")
        )
        b = kept.select(
            "dig", F.col("doc_id").alias("doc_b"), F.col("p").alias("pb")
        )
        pairs = (
            a.join(b, "dig")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select(
                "doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag")
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
        runs = (
            pairs.withColumn("island", F.col("pa") - F.row_number().over(w))
            .groupBy("doc_a", "doc_b", "diag", "island")
            .agg(
                F.min("pa").cast("bigint").alias("start_a"),
                (F.count("*") + F.lit(k - 1)).cast("bigint").alias("span_chars"),
            )
            .drop("island")
        )

        def cleanup() -> None:
            # runs only after _shared_checkpoint's single eager
            # materialization completes: the corpus-sized position
            # tables are then genuinely released (persist path) or
            # deleted (staged-parquet path), never pulled out from
            # under the materializing job
            release_kept()
            release_occ()

        return runs, cleanup

    return _shared_checkpoint(
        df, ("substr_runs", id_col, text_col, k, cap), build
    )


def substring_dup_bill(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 40,
    cap: int = 64,
) -> DataFrame:
    """Per-document exact-substring deletion bill (Lee et al. 2022's
    ExactSubstr actually DELETES the shared spans; this is the size of
    that deletion, per document): for every document, how many of its
    characters sit inside at least one >= k-char substring that also
    appears verbatim in another document.  Returns one row per document
    — (doc_id, n_chars, dup_chars, dup_bp) — the number a curation run
    reads to decide whether dedup pays for itself on a source.

    Built on the shared matched-run core: each maximal run contributes
    the interval [start, start+span-1] to BOTH endpoint docs (doc_b's
    start shifted by the diagonal); per-doc intervals merge with the
    classic running-max sweep (cummax of interval end over the
    start-ordered window — a NEW covered region begins where start
    exceeds every previous end), so overlapping runs from different
    partners never double-count a character.

    Scale: on top of the run table (see exact_substring_span_pairs),
    one keyed window per doc over that doc's run endpoints (bounded by
    its shared-span count, never corpus-sized) and one keyed rollup;
    the final left join back to the corpus is digest-free and keyed on
    the doc id.
    """
    covered = (
        _merged_covered_regions(df, id_col, text_col, k=k, cap=cap)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars")
        )
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.length(text_col).cast("bigint").alias("n_chars"),
        )
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("dup_chars", F.lit(0)).cast("bigint").alias("dup_chars"),
            # greatest(1, ...) so an empty document degrades identically
            # on both engines (dup_bp 0) instead of NULL-vs-error
            F.expr("(10000 * coalesce(dup_chars, 0)) div greatest(1, n_chars)")
            .cast("bigint")
            .alias("dup_bp"),
        )
        .orderBy("doc_id")
    )


def _merged_covered_regions(
    df: DataFrame, id_col: str, text_col: str, k: int, cap: int
) -> DataFrame:
    """Per-document MERGED duplicated-char intervals — the shared core
    of the deletion bill and the deletion rewrite: each maximal matched
    run (see :func:`_substring_match_runs`) contributes the interval
    [start, start+span-1] to BOTH endpoint docs (doc_b's start shifted
    by the diagonal); per-doc intervals merge with the classic
    running-max sweep (cummax of interval end over the start-ordered
    window — a NEW covered region begins where start exceeds every
    previous end), so overlapping runs from different partners never
    double-count a character.  Returns (doc_id, s, e), disjoint and
    keyed per doc — the window is bounded by a doc's shared-span count,
    never corpus-sized."""
    from pyspark.sql import Window

    runs = _substring_match_runs(df, id_col, text_col, k=k, cap=cap)
    ivals = (
        runs.select(
            F.col("doc_a").alias("doc_id"),
            F.col("start_a").alias("s"),
            (F.col("start_a") + F.col("span_chars") - 1).alias("e"),
        )
        .unionAll(
            runs.select(
                F.col("doc_b").alias("doc_id"),
                (F.col("start_a") - F.col("diag")).alias("s"),
                (
                    F.col("start_a") - F.col("diag") + F.col("span_chars") - 1
                ).alias("e"),
            )
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    swept = ivals.withColumn(
        "new_reg",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    ).withColumn(
        "reg_id",
        F.sum("new_reg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        swept.groupBy("doc_id", "reg_id")
        .agg(
            F.min("s").cast("bigint").alias("s"),
            F.max("e").cast("bigint").alias("e"),
        )
        .drop("reg_id")
    )


def exact_substring_rewrite(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 40,
    cap: int = 64,
) -> DataFrame:
    """The DELETION step that completes Lee et al. 2022's ExactSubstr:
    return the corpus with every cross-document duplicated span (every
    char covered by a >= ``k``-char substring that also appears
    verbatim in another document, under the ``cap`` stop-gram guard)
    physically REMOVED from every document — the paper's §4.1 policy
    (delete all copies; aggressive by design, and exactly what the
    deletion bill priced).  Returns (doc_id, text) for EVERY input doc:
    untouched docs keep their text verbatim, fully-covered docs come
    back empty.

    Construction: the merged covered regions (shared with
    :func:`substring_dup_bill`) collapse to ONE sorted interval array
    per doc; the kept text is a single JVM-side ``aggregate`` fold over
    that array — each step appends the gap before the next deleted
    region and jumps the cursor past it, the finish lambda appends the
    tail.  No Python, no per-char explode: one keyed aggregation to
    build the arrays and one keyed join back to the corpus (text moves
    to its own regions only, exactly once).

    Scale: region arrays are bounded by a doc's merged-span count
    (tiny); the join is doc_id-keyed — never a cartesian, never a
    corpus-sized collect; the expensive part remains the shared run
    table, paid once per (corpus, params) via the family memo.
    """
    regs = (
        _merged_covered_regions(df, id_col, text_col, k=k, cap=cap)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_regs"))
    )
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt")
    )
    rebuilt = F.expr(
        "aggregate(_regs, "
        "named_struct('pos', CAST(1 AS BIGINT), 'acc', ''), "
        "(st, r) -> named_struct("
        "'pos', r.e + CAST(1 AS BIGINT), "
        "'acc', concat(st.acc, "
        "substr(_txt, CAST(st.pos AS INT), CAST(r.s - st.pos AS INT)))), "
        "st -> concat(st.acc, substr(_txt, CAST(st.pos AS INT))))"
    )
    return src.join(regs, "doc_id", "left").select(
        "doc_id",
        F.when(F.col("_regs").isNull(), F.col("_txt"))
        .otherwise(rebuilt)
        .alias("text"),
    )


def neardup_components(pairs: DataFrame, max_iter: int = 50) -> DataFrame:
    """Connected components over near-dup pairs (doc_a, doc_b).

    Iterative min-label propagation: every node repeatedly adopts the
    minimum component id among itself and its neighbors until fixpoint —
    the distributed analogue of union-find used by production dedup
    pipelines (pairs alone aren't actionable; whole clusters are).  Each
    iteration is ONE Spark job: the convergence check is a ``changed``
    flag computed inside the label-update pass, and counting it doubles
    as the action that materializes the (lazy) localCheckpoint — no
    separate compare-join job, no double materialization.  The pairs
    input is checkpointed up front so its (potentially expensive —
    MinHash/LSH) lineage runs once, not once per direction per iteration.
    Near-dup graphs are unions of near-cliques, so fixpoint takes
    ~diameter iterations (2-3 in practice); exceeding ``max_iter`` raises
    instead of silently returning unconverged (wrong) components.
    Returns (doc_id, component) where component = min doc_id of the
    cluster; only docs appearing in >= 1 pair are returned (singletons
    need no dedup decision).

    ADAPTIVE CUTOVER (the same move AQE makes for broadcast joins): a
    near-dup EDGE list is orders of magnitude smaller than the corpus
    (only docs with a >= threshold partner appear), and below
    ``SMALL_GRAPH_EDGE_CAP`` edges the distributed iteration is pure
    scheduler overhead — 2 joins x ~3 rounds of sub-second jobs.  Such
    graphs collect to the driver (bounded by the cap, ~a few MB) and
    close with union-find; output is bit-identical (component = min
    reachable id either way).  Above the cap — the true 100 TB case —
    the distributed label propagation below is the path.
    """
    pairs_cp = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    if pairs_cp.count() <= SMALL_GRAPH_EDGE_CAP:
        rows = pairs_cp.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in rows:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # attach the LARGER root under the smaller so every
                # tree root is already the component's min doc id
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        out = sorted((n, find(n)) for n in parent)
        id_type = pairs_cp.schema["doc_a"].dataType.simpleString()
        return pairs_cp.sparkSession.createDataFrame(
            out, f"doc_id {id_type}, component {id_type}"
        )
    fwd = pairs_cp.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs_cp.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("component").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("ncomp"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("ncomp"), F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        # the count materializes the checkpoint AND reads the flag: 1 job
        changed = new_labels.where(F.col("changed")).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            return labels.select(F.col("node").alias("doc_id"), "component")
    raise RuntimeError(
        f"neardup_components did not reach fixpoint in {max_iter} iterations; "
        "components would be wrong — raise max_iter (graph diameter exceeds it)"
    )


def neardup_components_pathjump(
    pairs: DataFrame, max_rounds: int = 34
) -> tuple[DataFrame, int]:
    """Connected components with POINTER JUMPING (path doubling): each
    round first adopts the minimum label over the neighborhood (the
    label-prop step), then jumps lbl(v) <- lbl(lbl(v)) — the distributed
    path-halving of union-find (Shiloach & Vishkin 1982; the hash-to-min
    family of Rastogi et al. 2013 converges the same way).

    Why it exists next to :func:`neardup_components`: plain label-prop
    needs ~diameter rounds, and every round is a full shuffle — on a
    100 TB corpus a single chain of transitively-similar documents
    (template drift across a crawl) makes the diameter, not the data,
    the wall-clock.  The jump step doubles the distance a label travels
    per round, so fixpoint takes O(log2(diameter)) rounds: a 64-hop
    chain converges in ~7 rounds instead of ~63 (pinned by a chain-graph
    unit test).  Every label is itself a node id present in the labels
    table (labels start as the node and only ever move to other nodes'
    ids via min), so the jump self-join is total.

    Returns (labels, n_rounds): labels = (doc_id, component) with
    component = min doc_id of the cluster, bit-identical to
    :func:`neardup_components`; n_rounds = rounds actually used.
    Exceeding ``max_rounds`` raises (the default allows a diameter of
    2^34 — any real graph converges far earlier).
    """
    pairs_cp = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    fwd = pairs_cp.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs_cp.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for rounds in range(1, max_rounds + 1):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("component").alias("ncomp"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == F.col("node2"), "left"
        ).select(
            "node",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("ncomp"), F.col("component"))
            ).alias("_mid"),
        )
        # pointer jump: component <- component's own current component.
        # Joins against the PRE-STEP labels (already checkpointed) so the
        # round stays two keyed joins; the jump still doubles the
        # distance a label travels because pre-step labels already point
        # strictly downhill.
        jump = labels.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        new_labels = (
            stepped.join(jump, stepped["_mid"] == F.col("jnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("_mid"), F.coalesce(F.col("jcomp"), F.col("_mid"))
                ).alias("component"),
                (
                    F.least(F.col("_mid"), F.coalesce(F.col("jcomp"), F.col("_mid")))
                    < F.col("_old")
                ).alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        # one job: materializes the checkpoint AND reads the change flag
        changed = new_labels.where(F.col("changed")).count()
        labels_prev = labels
        labels = new_labels.drop("changed")
        labels_prev.unpersist()
        if changed == 0:
            return (
                labels.select(F.col("node").alias("doc_id"), "component"),
                rounds,
            )
    raise RuntimeError(
        f"neardup_components_pathjump did not converge in {max_rounds} "
        "rounds; components would be wrong — raise max_rounds"
    )


def neardup_components_shared(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 8,
    rows: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """Session-memoized :func:`neardup_components` over the MinHash/LSH
    pair graph — the components table is tiny (docs in clusters only)
    and deterministic, but the label-propagation closure costs a
    shuffle round per graph diameter, so consumers that need the SAME
    clustering (the components census query, the composed curation
    pipeline's near-dup stage) share one materialization per (corpus,
    params) instead of each re-running the iteration."""

    def build() -> DataFrame:
        return neardup_components(
            minhash_neardup_pairs(
                df,
                id_col,
                text_col,
                n=n,
                k=k,
                bands=bands,
                rows=rows,
                threshold=threshold,
            )
        )

    return _shared_checkpoint(
        df, ("neardup_components", id_col, text_col, n, k, bands, rows, threshold), build
    )


def dedup_decisions(pairs: DataFrame) -> DataFrame:
    """Per-document keep/drop decision from near-dup pairs.

    keep = the component representative (minimum doc_id).
    Returns (doc_id, component, keep) with keep true for one doc per
    cluster — the actionable output of the dedup pipeline.
    """
    comps = neardup_components(pairs)
    return comps.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("keep"),
    )


def containment_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Asymmetric containment near-dup: pairs where either document's
    word-n-gram set is >= ``threshold`` contained in the other's
    (Broder 1997's containment coefficient C(A,B) = |A∩B|/|A|).
    Catches SUBSET duplication — a short doc embedded inside a longer
    one — which symmetric Jaccard misses entirely (a 100-shingle doc
    fully inside a 10,000-shingle doc has jacc < 0.01 but containment
    1.0); the quote/boilerplate/excerpt case in crawl curation.

    Same inverted-index plan (and the SAME memoized shingle table) as
    :func:`ngram_jaccard_pairs`: the only shuffle is keyed on the
    shingle, candidates are exactly the pairs sharing >= 1 shingle,
    and containment >= t > 0 implies >= 1 shared shingle, so recall
    is exact.  Returns (doc_a, doc_b, inter, size_a, size_b,
    cont_a_in_b, cont_b_in_a) with doc_a < doc_b, 4-dp-rounded
    containments, where max(containment) >= threshold.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0 (disjoint pairs never materialize)")
    sh = _shared_checkpoint(
        df,
        ("shingles", id_col, text_col, n),
        lambda: shingle_table(df, id_col, text_col, n),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    cab = F.round(F.col("inter") / F.col("size_a") * 10000) / 10000
    cba = F.round(F.col("inter") / F.col("size_b") * 10000) / 10000
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            F.col("size_a").cast("bigint").alias("size_a"),
            F.col("size_b").cast("bigint").alias("size_b"),
            cab.alias("cont_a_in_b"),
            cba.alias("cont_b_in_a"),
        )
        .where(
            (F.col("cont_a_in_b") >= threshold)
            | (F.col("cont_b_in_a") >= threshold)
        )
        .orderBy("doc_a", "doc_b")
    )
