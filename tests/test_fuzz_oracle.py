"""Differential fuzz gate: Spark vs DuckDB on RANDOM documents corpora.

The oracle gate (scripts/check_oracle.py, mirrored from the driver) only
ever runs on the fixed testdata; a data-dependent divergence — tie-breaks,
duplicate collapse, empty strings, boundary counts — can hide behind one
lucky dataset.  This module regenerates a small seeded corpus engineered
for those edges (exact duplicates, near-duplicates, repeated-letter words,
ties in frequency, empty text, a deliberate n_chars violation) and runs
every documents-only catalog query against its DuckDB oracle with the
same normalization the driver uses.

Kept in-distribution on purpose: ASCII text, valid 2-char langs, non-null
columns — the contract is the driver's testdata shape, and fuzzing
outside it would only manufacture out-of-contract noise.
"""

from __future__ import annotations

import os
import random
import re
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from check_oracle import normalize  # noqa: E402  (driver-mirroring comparison)

from duckdb_cluster_hash_spark.plans.catalog import ORACLES, QUERIES  # noqa: E402

_OTHER_TABLES = re.compile(
    r"\b(region|nation|customer|supplier|part|orders|lineitem|events|embeddings)\b",
    re.I,
)
# iterated trainers (16 BPE merges; the unigram trainer's 140-CTE
# unrolled oracle) have dedicated tiny-corpus + independent-reference
# tests and are too slow to re-run per fuzz seed
_SKIP = {
    "docs_bpe_training_loop",
    "docs_bpe_encode",
    "docs_unigram_lm_train",
    "docs_unigram_lm_encode",
}

FUZZ_QUERIES = sorted(
    n
    for n, sql in ORACLES.items()
    if n.startswith("docs_")
    and "_streaming_" not in n  # real micro-batch engine: dedicated
    # tests + temp stage dirs per corpus; too slow to replay per seed
    and not _OTHER_TABLES.search(sql)
    and n not in _SKIP
)

_VOCAB = (
    "aa ab abab banana band data dataset deep deduplication learning "
    "model near pipeline quality spark test text the token training "
    "zz qqq"
).split()


def _make_corpus(seed: int):
    rng = random.Random(seed)
    rows = []
    texts = []
    for i in range(80):
        n_words = rng.randint(0, 40)
        words = [rng.choice(_VOCAB) for _ in range(n_words)]
        text = " ".join(words)
        if i % 11 == 3 and texts:
            text = rng.choice(texts)  # exact duplicate
        elif i % 13 == 5 and texts:
            base = rng.choice(texts).split()
            if base:
                base[rng.randrange(len(base))] = rng.choice(_VOCAB)
            text = " ".join(base)  # near duplicate
        texts.append(text)
        lang = rng.choice(["en", "de", "fr"])
        source = rng.choice(["web", "books", "code"])
        n_chars = len(text)
        if i == 17:
            n_chars += 3  # one deliberate constraint violation
        rows.append((i, text, lang, source, n_chars))
    return rows


@pytest.fixture(scope="module", params=[11, 29])
def fuzz_dir(request, spark, tmp_path_factory):
    seed = request.param
    sf_dir = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
    df = spark.createDataFrame(
        _make_corpus(seed),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    yield sf_dir
    from duckdb_cluster_hash_spark.operators import dedup

    dedup.clear_shared_cache()  # per-corpus memos die with the corpus


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS FROM "
        f"read_parquet('{fuzz_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_docs_query_matches_oracle_on_fuzz_corpus(spark, fuzz_dir, fuzz_con, name):
    sdf = QUERIES[name](spark, fuzz_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = fuzz_con.sql(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert normalize(srows, scols) == normalize(orows, ocols)


# ---------------------------------------------------------------------------
# Events family — same differential gate over a random event log
# ---------------------------------------------------------------------------

_EVENTS_SKIP_PREFIX = "events_streaming_"  # real micro-batch engine: has its
# own dedicated tests; too slow to replay per fuzz seed

EVENTS_FUZZ_QUERIES = sorted(
    n
    for n, sql in ORACLES.items()
    if n.startswith("events_")
    and not n.startswith(_EVENTS_SKIP_PREFIX)
    and not re.search(
        r"\b(region|nation|customer|supplier|part|orders|lineitem|documents|embeddings)\b",
        sql,
        re.I,
    )
)


def _make_events(seed: int):
    import datetime as dt

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    types = ["click", "view", "purchase", "error", "signup"]
    for i in range(1200):
        ts = t0 + dt.timedelta(
            seconds=rng.randint(0, 30 * 86400 - 1), microseconds=rng.randint(0, 999999)
        )
        user = rng.randint(0, 39)  # user 0 exists (similarity anchor)
        etype = rng.choice(types)
        value = round(rng.uniform(0.01, 500.0), 2)
        props = '{"k": %d}' % rng.randint(0, 99)
        rows.append((i, ts, user, etype, value, props))
    return rows


@pytest.fixture(scope="module", params=[7])
def fuzz_events_dir(request, spark, tmp_path_factory):
    seed = request.param
    sf_dir = str(tmp_path_factory.mktemp(f"fuzzev{seed}"))
    df = spark.createDataFrame(
        _make_events(seed),
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.fixture(scope="module")
def fuzz_events_con(fuzz_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS FROM "
        f"read_parquet('{fuzz_events_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_FUZZ_QUERIES)
def test_events_query_matches_oracle_on_fuzz_corpus(
    spark, fuzz_events_dir, fuzz_events_con, name
):
    sdf = QUERIES[name](spark, fuzz_events_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = fuzz_events_con.sql(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert normalize(srows, scols) == normalize(orows, ocols)


# ---------------------------------------------------------------------------
# Star schema (TPC-H-ish) — the DECIMAL money path and rank/tie machinery
# ---------------------------------------------------------------------------

_STAR = re.compile(r"\b(region|nation|customer|supplier|part|orders|lineitem)\b", re.I)
_NONSTAR = re.compile(r"\b(events|documents|embeddings)\b", re.I)

STAR_FUZZ_QUERIES = sorted(
    n
    for n, sql in ORACLES.items()
    if _STAR.search(sql)
    and not _NONSTAR.search(sql)
    # file-format round-trips exercise IO mechanics, not data semantics
    and not n.startswith("formats_")
)


def _make_star(seed: int):
    """Mini star schema mirroring the testdata's synthetic conventions:
    NATION_n names, Customer#%09d keys, Brand#1..25, cent-grid discounts,
    integer-valued double quantities, midnight TIMESTAMP dates — plus
    deliberate edge salt: FK orphans (the audit must COUNT them
    identically), childless orders, and heavy key ties."""
    import datetime as dt

    rng = random.Random(seed)
    day = lambda y, m, d: dt.datetime(y, m, d)  # noqa: E731
    region = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION_{i}", i % 5) for i in range(25)]
    customer = [
        (i, f"Customer#{i:09d}", rng.randrange(25),
         round(rng.uniform(0.0, 9999.0), 2),
         rng.choice(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]))
        for i in range(80)
    ]
    supplier = [
        (i, f"Supplier#{i:09d}", rng.randrange(25),
         round(rng.uniform(0.0, 9999.0), 2))
        for i in range(12)
    ]
    adjectives = ["red", "blue", "green", "small", "large", "shiny"]
    nouns = ["ring", "widget", "bolt", "gear", "cog"]
    part = [
        (i, f"{rng.choice(adjectives)} {rng.choice(nouns)}",
         f"Brand#{rng.randrange(1, 26)}",
         rng.choice(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]),
         rng.randrange(1, 51), round(900 + i * 0.1, 2))
        for i in range(60)
    ]
    base = day(1995, 1, 1)
    orders, lineitem = [], []
    for ok in range(400):
        custkey = 900 if ok in (398, 399) else rng.randrange(80)  # 2 FK orphans
        odate = base + dt.timedelta(days=rng.randrange(2400))
        orders.append(
            (ok, custkey, rng.choice(["P", "O", "F"]),
             round(rng.uniform(1000.0, 500000.0), 2), odate,
             rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]))
        )
        if ok % 17 == 11:
            continue  # childless order
        for ln in range(1, rng.randint(1, 7) + 1):
            rf, ls = rng.choice(
                [("A", "F"), ("A", "O"), ("N", "F"), ("N", "O"), ("R", "F"), ("R", "O")]
            )
            qty = float(rng.randrange(1, 51))
            lineitem.append(
                (ok, rng.randrange(60), rng.randrange(12), ln, qty,
                 round(qty * rng.uniform(900.0, 2100.0), 2),
                 rng.randrange(0, 11) / 100.0, rng.randrange(0, 9) / 100.0,
                 rf, ls, odate + dt.timedelta(days=rng.randrange(1, 96)))
            )
    # 3 lineitem orphans: dangling order/part/supplier keys
    lineitem += [
        (900, 0, 0, 1, 5.0, 4900.11, 0.05, 0.02, "N", "O", day(1999, 6, 1)),
        (10, 900, 0, 99, 4.0, 3900.22, 0.0, 0.0, "A", "F", day(1999, 6, 2)),
        (11, 0, 900, 99, 3.0, 2900.33, 0.1, 0.08, "R", "F", day(1999, 6, 3)),
    ]
    return {
        "region": (region, "r_regionkey int, r_name string"),
        "nation": (nation, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (customer,
                     "c_custkey bigint, c_name string, c_nationkey int, "
                     "c_acctbal double, c_mktsegment string"),
        "supplier": (supplier,
                     "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double"),
        "part": (part,
                 "p_partkey bigint, p_name string, p_brand string, p_type string, "
                 "p_size int, p_retailprice double"),
        "orders": (orders,
                   "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
                   "o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
        "lineitem": (lineitem,
                     "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
                     "l_linenumber int, l_quantity double, l_extendedprice double, "
                     "l_discount double, l_tax double, l_returnflag string, "
                     "l_linestatus string, l_shipdate timestamp"),
    }


@pytest.fixture(scope="module", params=[13])
def fuzz_star_dir(request, spark, tmp_path_factory):
    seed = request.param
    sf_dir = str(tmp_path_factory.mktemp(f"fuzzstar{seed}"))
    for t, (rows, schema) in _make_star(seed).items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{sf_dir}/{t}.parquet")
    return sf_dir


@pytest.fixture(scope="module")
def fuzz_star_con(fuzz_star_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS FROM "
            f"read_parquet('{fuzz_star_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", STAR_FUZZ_QUERIES)
def test_star_query_matches_oracle_on_fuzz_corpus(
    spark, fuzz_star_dir, fuzz_star_con, name
):
    sdf = QUERIES[name](spark, fuzz_star_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = fuzz_star_con.sql(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert normalize(srows, scols) == normalize(orows, ocols)


# ---------------------------------------------------------------------------
# Embeddings — exact / md5-deterministic queries only.  The *_recall
# contract oracles (IVF, LSH, PQ, Matryoshka, Hamming) are tuned to the
# testdata's Gaussian distribution: adversarial random vectors could miss
# a recall floor without any engine bug, so fuzzing them would only
# manufacture out-of-contract noise.
# ---------------------------------------------------------------------------

EMB_FUZZ_QUERIES = sorted(
    n
    for n, sql in ORACLES.items()
    if n.startswith("emb_")
    and not n.endswith("_recall")
    and not re.search(
        r"\b(region|nation|customer|supplier|part|orders|lineitem|events|documents)\b",
        sql,
        re.I,
    )
)


def _make_embeddings(seed: int):
    rng = random.Random(seed)
    rows = []
    prev = None
    for i in range(120):
        if i % 19 == 7 and prev is not None:
            emb = list(prev)  # exact duplicate vector (dedup edge)
        else:
            # multiples of 1/1024: exactly float32-representable, so the
            # parquet round-trip is bit-identical on both engines
            emb = [rng.randrange(-512, 513) / 1024 for _ in range(64)]
            if not any(emb):
                emb[0] = 1 / 1024  # keep norms nonzero (in-distribution)
        prev = emb
        rows.append((i, emb, rng.randrange(10)))
    return rows


@pytest.fixture(scope="module", params=[17])
def fuzz_emb_dir(request, spark, tmp_path_factory):
    seed = request.param
    sf_dir = str(tmp_path_factory.mktemp(f"fuzzemb{seed}"))
    df = spark.createDataFrame(
        _make_embeddings(seed), "vec_id bigint, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    yield sf_dir
    from duckdb_cluster_hash_spark.operators import dedup

    dedup.clear_shared_cache()


@pytest.fixture(scope="module")
def fuzz_emb_con(fuzz_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS FROM "
        f"read_parquet('{fuzz_emb_dir}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_FUZZ_QUERIES)
def test_emb_query_matches_oracle_on_fuzz_corpus(
    spark, fuzz_emb_dir, fuzz_emb_con, name
):
    sdf = QUERIES[name](spark, fuzz_emb_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = fuzz_emb_con.sql(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert normalize(srows, scols) == normalize(orows, ocols)


# ---------------------------------------------------------------------------
# TRUE streaming — the whole micro-batch replay (staging, watermarks,
# stateful operators) against the batch-equivalent oracles on a random
# event log.  The subtlest cross-engine machinery in the repo: the
# oracles encode Spark's actual eviction semantics (one-batch-behind
# watermark, per-leg watermark minimum, trailing no-data batch), and
# this gate proves those encodings are data-general, not tuned to the
# fixed testdata.  One seed: each query spins a real streaming engine.
# ---------------------------------------------------------------------------

STREAMING_FUZZ_QUERIES = sorted(
    n for n in ORACLES if n.startswith("events_streaming_")
)


@pytest.fixture(scope="module", params=[23])
def fuzz_stream_dir(request, spark, tmp_path_factory):
    seed = request.param
    sf_dir = str(tmp_path_factory.mktemp(f"fuzzstream{seed}"))
    df = spark.createDataFrame(
        _make_events(seed),
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    df.coalesce(2).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.fixture(scope="module")
def fuzz_stream_con(fuzz_stream_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS FROM "
        f"read_parquet('{fuzz_stream_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", STREAMING_FUZZ_QUERIES)
def test_streaming_query_matches_oracle_on_fuzz_corpus(
    spark, fuzz_stream_dir, fuzz_stream_con, name
):
    sdf = QUERIES[name](spark, fuzz_stream_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = fuzz_stream_con.sql(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert normalize(srows, scols) == normalize(orows, ocols)


# ---------------------------------------------------------------------------
# Mixed corpus — cross-family joins and file-format round-trips.  With
# this, every catalog query is fuzz-covered except: table-free probes
# (data-independent by construction), the *_recall contracts (tuned to
# the testdata distribution), and the two 16-iteration BPE trainers
# (dedicated tiny-corpus oracle tests).
# ---------------------------------------------------------------------------

MIXED_FUZZ_QUERIES = [
    "cluster_node_arity_sweep",      # events
    "events_enriched_by_segment",    # customer x events
    "docs_hybrid_rrf_search",        # documents x embeddings
    "formats_csv_roundtrip",
    "formats_json_roundtrip",
    "formats_orc_roundtrip",
    "formats_text_roundtrip",
    "formats_schema_evolution",
    "formats_partitioned_overwrite",
    "formats_compaction",
    "formats_merge_on_read",
]


@pytest.fixture(scope="module", params=[31])
def fuzz_mixed_dir(request, spark, tmp_path_factory):
    seed = request.param
    sf_dir = str(tmp_path_factory.mktemp(f"fuzzmix{seed}"))
    spark.createDataFrame(
        _make_corpus(seed),
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    spark.createDataFrame(
        _make_events(seed),
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(2).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    spark.createDataFrame(
        _make_embeddings(seed), "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    for t, (rows, schema) in _make_star(seed).items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{sf_dir}/{t}.parquet")
    yield sf_dir
    from duckdb_cluster_hash_spark.operators import dedup

    dedup.clear_shared_cache()


@pytest.fixture(scope="module")
def fuzz_mixed_con(fuzz_mixed_dir):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS FROM "
            f"read_parquet('{fuzz_mixed_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", MIXED_FUZZ_QUERIES)
def test_mixed_query_matches_oracle_on_fuzz_corpus(
    spark, fuzz_mixed_dir, fuzz_mixed_con, name
):
    sdf = QUERIES[name](spark, fuzz_mixed_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = fuzz_mixed_con.sql(ORACLES[name])
    ocols = [d[0] for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert normalize(srows, scols) == normalize(orows, ocols)
