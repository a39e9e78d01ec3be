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
# 16-iteration trainers have dedicated tiny-corpus tests and are too slow
# to re-run per fuzz seed
_SKIP = {"docs_bpe_training_loop", "docs_bpe_encode"}

FUZZ_QUERIES = sorted(
    n
    for n, sql in ORACLES.items()
    if n.startswith("docs_") and not _OTHER_TABLES.search(sql) and n not in _SKIP
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
