"""As-of and range join semantics on hand-computable inputs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.operators.joins import asof_join, range_join


def ts(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [("A", ts(0), 100.0), ("A", ts(10), 101.0), ("A", ts(20), 102.0),
         ("B", ts(5), 50.0)],
        "sym string, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [("A", ts(9)), ("A", ts(10)), ("A", ts(25)), ("B", ts(1)), ("C", ts(7))],
        "sym string, tts timestamp",
    )
    return quotes, trades


def test_asof_join_semantics(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, by="sym", left_ts="tts", right_ts="qts", value_cols=["px"]
    )
    got = {(r["sym"], r["tts"].second + r["tts"].minute * 60): r["asof_px"]
           for r in out.collect()}
    assert got[("A", 9)] == 100.0    # latest quote at t<=9 is t=0
    assert got[("A", 10)] == 101.0   # equal timestamps match (inclusive)
    assert got[("A", 25)] == 102.0
    assert got[("B", 1)] is None     # no prior quote
    assert got[("C", 7)] is None     # key absent on the right


def test_asof_join_row_count_preserved(quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, by="sym", left_ts="tts", right_ts="qts", value_cols=["px"]
    )
    assert out.count() == trades.count()  # left join: no fan-out, no loss


def test_range_join_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = range_join(
        trades, quotes, by="sym", left_ts="tts", right_ts="qts",
        lower_us=0, upper_us=15_000_000,
        left_cols=["tts"], right_cols=["px"],
    )
    rows = {(r["sym"], r["l_tts"].second + 60 * r["l_tts"].minute, r["r_px"])
            for r in out.collect()}
    # trade A@9 sees quotes at 10 (+1s) and 20 (+11s); not 0 (delta<0)
    assert ("A", 9, 101.0) in rows and ("A", 9, 102.0) in rows
    assert ("A", 9, 100.0) not in rows
    # trade B@1 sees quote at 5 (+4s)
    assert ("B", 1, 50.0) in rows


def test_range_join_plan_not_cartesian(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = range_join(
        trades, quotes, by="sym", left_ts="tts", right_ts="qts",
        lower_us=0, upper_us=15_000_000,
        left_cols=["tts"], right_cols=["px"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
