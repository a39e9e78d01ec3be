"""Distributed global ranking — row_number / ntile without the
single-partition sort (SURVEY.md §2 scale notes).

``Window.orderBy(...)`` with no partition key forces ``Exchange
SinglePartition``: the whole input crosses one reducer — the classic
scale killer for "rank every customer / document globally" queries.
The exact, scalable alternative is a two-level construction whose
bucket assignment is a PURE FUNCTION of the data:

1. **Frozen cut points.** One fixed-seed sample pass picks up to
   ``n_buckets - 1`` composite-key cut tuples; they are collected to
   the driver ONCE and embedded in the plan as literals.  Bucket id is
   then an UNROLLED binary search over one constant-folded literal
   array (``_with_bucket``) — ceil(log2 B) struct comparisons per row,
   O(B) plan size, evaluated JVM-side, and (crucially) replayable: any
   recomputation — AQE re-plan, stage retry, executor loss,
   ``spark.sql.exchange.reuse=false`` — re-derives the SAME bucket for
   every row, because the cuts are literals, not a sampled exchange.
2. ``row_number`` / running-sum windows partitioned by the bucket id —
   N independent parallel sorts (hash exchange on the bucket column).
3. Per-bucket row counts (one tiny ≤ n_buckets-row table) prefix-summed
   into offsets and broadcast back: ``global = offset + local``.

Only the bucket-counts table is ever globally ordered.  This replaces
the earlier ``repartitionByRange`` + ``spark_partition_id`` +
``localCheckpoint`` construction, whose correctness relied on
checkpoint-block SURVIVAL: ``repartitionByRange`` samples boundaries
with a per-execution seed and partition ids are layout-dependent, so
losing the checkpointed blocks (executor loss on a real cluster —
localCheckpoint is unreplicated) would hand the two consumer branches
different partitionings and silently corrupt ranks.  Here nothing
needs pinning for correctness: both branches recompute identical
bucket ids from the data and the literal cuts.  The input is still
``persist()``-ed (MEMORY_AND_DISK, CacheManager-tracked, so
``unpersist`` genuinely releases blocks — unlike localCheckpoint) as a
pure optimization: the count/sample pass and the two plan branches
share one materialization, and :func:`release_rank_pins` / the FIFO
cap reclaim the blocks, with recomputation always safe.

Cut quality affects only BALANCE, never correctness: equal composite
keys cannot straddle a bucket (cuts are compared with the full
tie-broken key), and a skewed sample merely yields uneven buckets.
Order-key columns must be non-null and non-NaN (the same "total
order, add a unique tie-break" contract as before; null keys would
land in bucket 0 regardless of direction).

ntile is then a pure expression over (rank, total): the SQL-standard
allocation gives the first ``n mod k`` tiles ``ceil(n/k)`` rows and
the rest ``floor(n/k)`` — integer arithmetic both engines reproduce
exactly; ``total`` is the sum of the per-bucket counts the
construction already aggregates (step 3), carried on the same tiny
broadcast offsets table — no separate ``count()`` job.

Cost model (the r12 regression fix): nothing here runs an exact count
job, and the bucket count ADAPTS to the data.  The input row count is
ESTIMATED from the optimized plan's statistics (exact for
``range``/fully-materialized caches, sizeInBytes/row-width otherwise)
— a mis-estimate can only skew bucket BALANCE, never a rank, and the
driver-side sample collect is hard-capped with ``limit``.  The
effective bucket count is ``min(n_buckets, ceil(n_est / 8192))``: a
15k-row frame gets 1-2 buckets (plan literals, search depth, sample
size all shrink with it — driver plan-build time was the dominant
cost at B=256), while a 100 TB input saturates the caller's
``n_buckets`` cap exactly as before.
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = [
    "clear_cut_memo",
    "global_row_number",
    "grouped_row_number",
    "ntile_exact",
    "ordered_prefix_sum",
    "release_rank_pins",
]

# persist() the input so the cut-sample pass and both plan branches share
# one materialization.  Purely an optimization: bucket ids are literal-cut
# pure functions of the data, so cache loss / recomputation cannot change
# any rank.  Plan tests may flip this off to see the un-cached lineage.
PIN_INPUT = True

# FIFO cap on concurrently-pinned frames (each call pins its input AND
# its bucketed frame): evicted entries are unpersisted (safe — see
# above), bounding executor storage in a long-lived session.  Sized for
# one suite-worker's working set, NOT a whole 241-query run — a cap of
# 64 let cached batches accumulate until the single-JVM bench hit
# GCLocker starvation and died; suite harnesses additionally call
# release_rank_pins() at family boundaries (next to the dedup memo
# clear) so pinned storage never spans families.
_PIN_CAP = 12
_PINNED: list[DataFrame] = []
_PIN_LOCK = threading.Lock()

_SAMPLE_SEED = 0x5EEDCA7  # fixed: the sample pass is replay-stable
_SAMPLE_PER_BUCKET = 24  # ~24 sampled keys per cut ≈ ±20% bucket balance

# Rows-per-bucket target for the ADAPTIVE bucket count: effective
# B = min(caller's n_buckets cap, ceil(n_est / this)).  8192 keeps a
# bucket's sort trivially in-task while bounding cut-literal count,
# search depth, and sample size to what the data needs; tests shrink it
# to force multi-bucket paths on tiny frames.
_TARGET_ROWS_PER_BUCKET = 8192

# Driver-side memo of cut tuples keyed by the ANALYZED plan's semantic
# hash + order spec: re-constructing the same ranking over the same
# frame (a benchmark repeat, a notebook re-run) skips the sample job
# entirely.  Same immutability contract as Spark's own CacheManager:
# if the underlying storage is rewritten between constructions, call
# clear_cut_memo() — though stale cuts can only skew bucket balance,
# never a rank (ntile's total is computed in-plan from the per-bucket
# counts).  Tiny (collected key tuples only) and bounded.
_CUT_MEMO: dict = {}
_CUT_MEMO_CAP = 512

_B, _LRN, _OFF, _LCUM, _T = "_rkb", "_lrn", "_off", "_lcum", "_t"

# Column<'name DESC NULLS LAST'> / Column<'name ASC NULLS FIRST'> — the
# default F.desc / F.asc renderings over a plain column reference.
_SORT_REPR = re.compile(
    r"^Column<'([A-Za-z_][A-Za-z0-9_]*) (ASC NULLS FIRST|DESC NULLS LAST)'>$"
)


def release_rank_pins() -> int:
    """Unpersist every input frame pinned by the ranking family and
    forget them; returns the number released.  Always safe: ranks are a
    pure function of data + literal cuts, so a consumer collected after
    release simply recomputes."""
    with _PIN_LOCK:
        pinned, _PINNED[:] = list(_PINNED), []
    for d in pinned:
        try:
            d.unpersist(False)
        except Exception:
            pass
    return len(pinned)


def _pin(df: DataFrame) -> DataFrame:
    if not PIN_INPUT:
        return df
    from pyspark import StorageLevel

    try:
        df.persist(StorageLevel.MEMORY_AND_DISK)
    except Exception:
        return df
    evicted: list[DataFrame] = []
    with _PIN_LOCK:
        _PINNED.append(df)
        while len(_PINNED) > _PIN_CAP:
            evicted.append(_PINNED.pop(0))
    for old in evicted:
        try:
            old.unpersist(False)
        except Exception:
            pass
    return df


def _order_specs(order_cols: list[Column]) -> list[tuple[Column, bool]]:
    """Normalize the caller's order list to (value column, is_desc).

    Accepts plain Columns / names (ascending) and the default
    ``F.asc(name)`` / ``F.desc(name)`` sort wrappers over simple column
    references (parsed from the stable Column repr — PySpark exposes no
    public accessor for a SortOrder's child).  Exotic combinations
    (nulls-first descents, sort-wrapped compound expressions) are
    rejected loudly rather than mis-bucketed: wrap the expression in a
    named column first (``df.withColumn``), then order by the name.
    """
    specs: list[tuple[Column, bool]] = []
    for c in order_cols:
        if isinstance(c, str):
            specs.append((F.col(c), False))
            continue
        r = str(c)
        if " NULLS " in r:
            m = _SORT_REPR.match(r)
            if not m:
                raise ValueError(
                    f"unsupported order column {r}: use F.asc/F.desc over a "
                    "plain column name, or pre-compute the expression into "
                    "a named column"
                )
            specs.append((F.col(m.group(1)), m.group(2).startswith("DESC")))
        else:
            specs.append((c, False))
    return specs


def _sort_cols(specs: list[tuple[Column, bool]]) -> list[Column]:
    return [c.desc() if d else c.asc() for c, d in specs]


def _key_fields(
    df: DataFrame, specs: list[tuple[Column, bool]]
) -> list[Column]:
    """Ascending-normalized key fields: descending components are
    negated so one plain ascending struct comparison realizes the whole
    composite order.  Negation requires a numeric component (every
    catalog descent is a score/amount); a descending string would need
    an order-reversing transform that does not exist for UTF8 binary
    order, so it is rejected explicitly."""
    fields = []
    for i, (c, is_desc) in enumerate(specs):
        if is_desc:
            dt = df.select(c).schema[0].dataType
            if not isinstance(dt, NumericType):
                raise ValueError(
                    f"descending order component {i} has non-numeric type "
                    f"{dt}; only numeric descents are bucket-normalizable"
                )
            c = -c
        fields.append(c.alias(f"_k{i}"))
    return fields


def _sql_literal(v, dt) -> str:
    """Render one collected cut value as SQL text of exactly ``dt`` —
    the cuts array is parsed as ONE expression string because building
    B struct literals through per-Column py4j calls costs seconds of
    driver time per ranking call (measured ~2s at B=256).  Strings go
    through base64 so no quoting/escaping rule can corrupt a cut."""
    import base64

    from pyspark.sql.types import (
        BooleanType,
        DateType,
        DoubleType,
        FloatType,
        StringType,
        TimestampType,
    )

    s = dt.simpleString()
    if isinstance(dt, StringType):
        b = base64.b64encode(v.encode("utf-8")).decode("ascii")
        return f"decode(unbase64('{b}'), 'UTF-8')"
    if isinstance(dt, (DoubleType, FloatType)):
        return f"CAST('{v!r}' AS {s})"
    if isinstance(dt, BooleanType):
        return "true" if v else "false"
    if isinstance(dt, DateType):
        return f"DATE'{v.isoformat()}'"
    if isinstance(dt, TimestampType):
        return f"TIMESTAMP'{v.isoformat(sep=' ')}'"
    return f"CAST({v} AS {s})"  # integral / decimal


def clear_cut_memo() -> int:
    """Forget memoized cut points / counts (call after rewriting the
    storage a previously-ranked frame reads)."""
    n = len(_CUT_MEMO)
    _CUT_MEMO.clear()
    return n


def _memo_key(df: DataFrame, specs, n_buckets: int):
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return None
    return (
        int(h),
        tuple(str(c) for c, _ in specs),
        tuple(d for _, d in specs),
        int(n_buckets),
    )


_TYPE_WIDTH_GUESS = 20  # bytes/column when no better stats exist


def _estimate_rows(df: DataFrame) -> "int | None":
    """Cheap driver-side row-count ESTIMATE from the optimized plan's
    statistics — no job.  Exact when the plan carries a rowCount
    (``range``, a materialized cache); otherwise sizeInBytes divided by
    a crude per-column width.  A mis-estimate can only affect bucket
    BALANCE and the sample fraction (the collect is limit-capped), so
    order-of-magnitude accuracy is all this needs; returns None when
    stats are unavailable (caller falls back to an exact count)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return max(0, int(str(rc.get())))
        size = int(str(stats.sizeInBytes()))
    except Exception:
        return None
    width = max(8, _TYPE_WIDTH_GUESS * max(1, len(df.schema.fields)))
    return max(1, size // width)


def _cut_array(
    df: DataFrame, specs: list[tuple[Column, bool]], n_buckets: int
) -> tuple["Column | None", int]:
    """One fixed-seed sample pass → up to ``B_eff - 1`` strictly
    increasing composite cut tuples, frozen as plan literals; returns
    (cuts array Column or None, cut count).  ``B_eff`` adapts to the
    estimated input size (see _TARGET_ROWS_PER_BUCKET) under the
    caller's ``n_buckets`` cap; the sample fraction comes from the same
    estimate and the driver collect is hard-capped with ``limit`` so a
    low estimate can never blow the driver (a truncated sample is
    layout-biased, which skews balance only).  No exact count job runs
    on this path.  Memoized per (semantic plan, spec) — see
    _CUT_MEMO."""
    import math as _math

    proj = df.select(*_key_fields(df, specs))
    ktypes = [f.dataType for f in proj.schema.fields]
    mk = _memo_key(df, specs, n_buckets)
    if mk is not None and mk in _CUT_MEMO:
        cuts = _CUT_MEMO[mk]
    else:
        n_est = _estimate_rows(df)
        if n_est is None:
            n_est = df.count()
        b_est = max(1, -(-int(n_est) // _TARGET_ROWS_PER_BUCKET))
        if b_est < int(n_buckets):
            # FLOOR by the scan's partition count: _estimate_rows divides
            # compressed sizeInBytes by a flat width guess, so wide-text /
            # highly-compressed inputs can under-estimate by orders of
            # magnitude, and a collapsed b_eff funnels the whole frame
            # through one window task (perf/OOM risk; ranks stay exact
            # either way).  A multi-partition scan is planner evidence the
            # input is not tiny; extra near-empty buckets on genuinely
            # small frames only add ≤ n_buckets broadcast rows.
            try:
                b_est = max(
                    b_est,
                    min(proj.rdd.getNumPartitions(), int(n_buckets)),
                )
            except Exception:
                pass
        b_eff = min(int(n_buckets), b_est)
        cuts = []
        if b_eff > 1:
            want = _SAMPLE_PER_BUCKET * b_eff
            frac = min(1.0, (want * 1.3) / max(int(n_est), 1))
            rows = (
                proj.sample(False, frac, seed=_SAMPLE_SEED)
                .limit(4 * want)
                .collect()
            )
            vals = sorted(
                {
                    tuple(r)
                    for r in rows
                    if all(
                        v is not None
                        and not (isinstance(v, float) and _math.isnan(v))
                        for v in r
                    )
                }
            )
            if vals:
                m = len(vals)
                prev = None
                for j in range(1, b_eff):
                    v = vals[min(m - 1, (j * m) // b_eff)]
                    if v != prev:
                        cuts.append(v)
                        prev = v
        if mk is not None and len(_CUT_MEMO) < _CUT_MEMO_CAP:
            _CUT_MEMO[mk] = cuts
    if not cuts:
        return None, 0
    structs = [
        "named_struct("
        + ", ".join(
            f"'_k{i}', {_sql_literal(v, ktypes[i])}" for i, v in enumerate(t)
        )
        + ")"
        for t in cuts
    ]
    return F.expr("array(" + ", ".join(structs) + ")"), len(cuts)


def _with_bucket(
    df: DataFrame,
    specs: list[tuple[Column, bool]],
    arr: "Column | None",
    m: int,
) -> DataFrame:
    """Add the deterministic bucket id ``_rkb`` = |{i : key > cut_i}| by
    UNROLLED binary search over one constant-folded literal array:
    ceil(log2 B) struct comparisons per row, with each search step its
    own projection column so the plan stays O(B) total (one folded
    array literal per step) — never the O(B)-literal CASE tree (its
    codegen cost made multi-consumer plans ~40x slower) and never a
    per-row HOF fold over all B cuts (measured ~40x slower than this
    at B=256 on 1M rows).  Each level is TWO batched ``withColumns``
    calls (mid+comparison, then lo+hi), not four ``withColumn`` calls:
    per-call plan re-analysis dominated driver time on deep-lineage
    inputs (measured 1-2.2 s per construction at B=256 — the r12
    ranking regression's largest term)."""
    if arr is None or m == 0:
        return df.withColumn(_B, F.lit(0))
    import math
    out = df.withColumns(
        {
            "_rkbk": F.struct(*_key_fields(df, specs)),
            "_rklo": F.lit(0),
            "_rkhi": F.lit(m),
        }
    )
    for _ in range(max(1, math.ceil(math.log2(m + 1)))):
        lo, hi = F.col("_rklo"), F.col("_rkhi")
        out = out.withColumns(
            {
                "_rkmid": F.shiftright(lo + hi, 1),
                "_rkc": (lo < hi)
                & (
                    F.col("_rkbk")
                    > F.element_at(arr, F.shiftright(lo + hi, 1) + 1)
                ),
            }
        )
        out = out.withColumns(
            {
                "_rkhi": F.when(
                    F.col("_rkc") | (lo >= hi), hi
                ).otherwise(F.col("_rkmid")),
                "_rklo": F.when(
                    F.col("_rkc"), F.col("_rkmid") + 1
                ).otherwise(lo),
            }
        )
    return out.withColumn(_B, F.col("_rklo").cast("int")).drop(
        "_rkbk", "_rklo", "_rkhi", "_rkmid", "_rkc"
    )


def _keyed_frame(
    df: DataFrame, specs: list[tuple[Column, bool]], n_buckets: int
) -> DataFrame:
    """Pin the input (sample pass + bucket evaluation share one
    materialization), assign buckets, then pin the BUCKETED frame too:
    every plan branch and every downstream consumer (a quantile-leg
    query may reference the ranked frame a dozen times) reads the
    bucket column from cache instead of re-evaluating the search —
    with recomputation still exact if any cache is lost."""
    src = _pin(df)
    arr, m = _cut_array(src, specs, n_buckets)
    return _pin(_with_bucket(src, specs, arr, m))


def _global_rn(
    df: DataFrame,
    specs: list[tuple[Column, bool]],
    n_buckets: int,
    out_col: str,
    carry_total: "str | None" = None,
) -> DataFrame:
    """Rank via per-bucket windows + broadcast offsets.  When
    ``carry_total`` names a column, the exact input row count — the sum
    of the per-bucket counts this construction already aggregates —
    rides along on the same ≤ B-row broadcast table (ntile's total, no
    separate count job)."""
    keyed = _keyed_frame(df, specs, n_buckets)
    local = keyed.withColumn(
        _LRN,
        F.row_number().over(Window.partitionBy(_B).orderBy(*_sort_cols(specs))),
    )
    counts = keyed.groupBy(_B).agg(F.count("*").alias("_c"))
    # the ONLY globally-ordered data: one row per bucket
    over_b = Window.orderBy(_B).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    off_cols = [
        F.col(_B),
        (F.sum("_c").over(over_b) - F.col("_c")).alias(_OFF),
    ]
    if carry_total:
        over_all = Window.orderBy(_B).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("_c").over(over_all).alias(carry_total))
    offsets = counts.select(*off_cols)
    return (
        local.join(F.broadcast(offsets), _B)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
        .drop(_B, _LRN, _OFF)
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    n_buckets: int = 256,
    out_col: str = "rn",
) -> DataFrame:
    """Add a 1-based global row number in ``order_cols`` order without a
    single-partition sort.  The order key must be total (add a unique
    tie-break column) and non-null; equal keys never straddle a bucket
    (cuts compare the full composite key), so ranks are exact for any
    sampled cuts — cut quality affects balance only.

    Size ``n_buckets`` so a bucket's rows fit one executor's sort budget
    (rows/n_buckets per task): 256 suits up to ~10^9 input rows; beyond
    that pass a larger value — the offsets table stays ≤ n_buckets rows
    and is the only globally-ordered data either way.

    Determinism: bucket ids are a pure function of (row values, literal
    cut points frozen at build time) — see the module docstring.  No
    stage retry, AQE re-plan, executor loss, or cache eviction can move
    a row across buckets, so the two consumers (local windows, counts)
    always agree without any checkpoint.
    """
    return _global_rn(df, _order_specs(order_cols), n_buckets, out_col)


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n_buckets: int = 256,
    out_col: str = "rn",
) -> DataFrame:
    """Per-group 1-based row number in ``order_cols`` order — the
    stratified twin of :func:`global_row_number`.

    A plain ``Window.partitionBy(group).orderBy(...)`` is keyed, but one
    hot stratum (one language holding 60% of a 100 TB corpus) becomes a
    single reducer's sort.  Same two-level fix: the literal cut points
    are computed over the COMPOSITE (group, order, tie-break) key, so a
    hot group splits across many buckets; per-(bucket, group) local
    windows rank in parallel, and per-group offsets prefix-sum over the
    tiny ≤ n_buckets × |groups| counts table (the only data ordered
    outside the buckets; broadcast back).  Order key must be total
    within each group and non-null.
    """
    gspecs = [(F.col(g), False) for g in group_cols]
    ospecs = _order_specs(order_cols)
    keyed = _keyed_frame(df, gspecs + ospecs, n_buckets)
    local = keyed.withColumn(
        _LRN,
        F.row_number().over(
            Window.partitionBy(_B, *group_cols).orderBy(*_sort_cols(ospecs))
        ),
    )
    counts = keyed.groupBy(_B, *group_cols).agg(F.count("*").alias("_c"))
    over_b = (
        Window.partitionBy(*group_cols)
        .orderBy(_B)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = counts.select(
        _B,
        *group_cols,
        (F.sum("_c").over(over_b) - F.col("_c")).alias(_OFF),
    )
    return (
        local.join(F.broadcast(offsets), [_B, *group_cols])
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRN)).cast("bigint"))
        .drop(_B, _LRN, _OFF)
    )


def ntile_exact(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    n_buckets: int = 256,
    out_col: str = "tile",
) -> DataFrame:
    """SQL-standard ``ntile(k)`` over a total order, scalably.

    Allocation rule (what Spark's and DuckDB's ntile both implement):
    with q = n div k and rem = n mod k, the first ``rem`` tiles hold
    q+1 rows, the rest q.  For 1-based rank r:

    - r <= rem*(q+1):  tile = ceil(r / (q+1))
    - else:            tile = rem + ceil((r - rem*(q+1)) / q)

    ``n`` is the SUM of the per-bucket counts the rank construction
    already aggregates, carried on the same ≤ B-row broadcast offsets
    table (``_t``) — no driver-side count job, no extra join.  Pure
    integer arithmetic (``div`` quotients and ``(a + d - 1) div d``
    ceilings, no double-precision division), bit-exact on both engines
    at any row count; ``greatest(q, 1)`` guards the k >= n case where
    the else branch is dead anyway (rem = n there, so every rank takes
    the first branch and tile = r).
    """
    k = int(k)
    if k < 1:
        # non-ANSI Spark turns `div 0` / `% 0` into NULL tiles — fail
        # loudly instead of degrading an invalid k to NULL output
        raise ValueError(f"ntile_exact requires k >= 1, got {k}")
    ranked = _global_rn(
        df, _order_specs(order_cols), n_buckets, "_rn", carry_total=_T
    )
    tile = F.expr(
        "CAST(CASE WHEN _rn <= (_t % {k}) * ((_t div {k}) + 1) "
        "THEN (_rn + (_t div {k})) div ((_t div {k}) + 1) "
        "ELSE (_t % {k}) + (_rn - (_t % {k}) * ((_t div {k}) + 1) "
        "+ greatest(_t div {k}, 1) - 1) div greatest(_t div {k}, 1) "
        "END AS INT)".format(k=k)
    )
    return ranked.withColumn(out_col, tile).drop("_rn", _T)


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    val_col: str,
    n_buckets: int = 256,
    out_col: str = "cum",
) -> DataFrame:
    """Add an INCLUSIVE running sum of ``val_col`` in ``order_cols``
    order without a single-partition sort — the cumulative-share /
    Pareto primitive, built exactly like :func:`global_row_number`:
    literal-cut buckets, N parallel local running sums, then broadcast
    per-bucket totals prefix-summed over the only globally-ordered
    table (≤ n_buckets rows).

    The order key must be total (include a unique tie-break) and
    non-null so the running sum is a pure function of the data, not
    the layout; bucket determinism per the module docstring.
    """
    specs = _order_specs(order_cols)
    keyed = _keyed_frame(df, specs, n_buckets)
    in_bucket = (
        Window.partitionBy(_B)
        .orderBy(*_sort_cols(specs))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn(_LCUM, F.sum(val_col).over(in_bucket))
    totals = keyed.groupBy(_B).agg(F.sum(val_col).alias(_T))
    over_b = Window.orderBy(_B).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        _B, (F.sum(_T).over(over_b) - F.col(_T)).alias(_OFF)
    )
    return (
        local.join(F.broadcast(offsets), _B)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LCUM)).cast("bigint"))
        .drop(_B, _LCUM, _OFF)
    )
