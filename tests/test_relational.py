"""as-of join unit coverage: directions, tiebreaks, unmatched rows, and
the no-left_key grouping path (the corpus query asof_join_events_orders
pins the backward+tiebreak path against a SQL oracle at sf0.01)."""

from __future__ import annotations

import pytest

from lakeshack_spark.operators.relational import asof_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            (1, "A", 100),
            (2, "A", 205),
            (3, "B", 150),
            (4, "C", 50),  # no trades for C at all
            (5, "A", 10),  # before every A trade
        ],
        "quote_id long, sym string, qts long",
    )
    trades = spark.createDataFrame(
        [
            ("A", 90, 10.0, 901),
            ("A", 100, 11.0, 902),  # equal-time vs quote 1
            ("A", 100, 12.0, 903),  # equal time, higher trade_id
            ("A", 200, 13.0, 904),
            ("B", 149, 20.0, 905),
            ("B", 151, 21.0, 906),
        ],
        "sym string, tts long, price double, trade_id long",
    )
    return quotes, trades


def _by_quote(df):
    return {r["quote_id"]: r for r in df.collect()}

def test_backward_with_tiebreak(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = _by_quote(
        asof_join(
            quotes, trades, on="sym", left_time="qts", right_time="tts",
            left_key="quote_id", right_tiebreak="trade_id",
        )
    )
    assert len(out) == 5
    # quote 1 @100: trades at 90,100,100 qualify; max (tts, trade_id) = 903
    assert (out[1]["trade_id"], out[1]["price"]) == (903, 12.0)
    # quote 2 @205: latest A trade 200
    assert out[2]["trade_id"] == 904
    # quote 3 @150: only the 149 B trade is at-or-before
    assert out[3]["trade_id"] == 905
    # quote 4: symbol with no trades -> NULL right side, row preserved
    assert out[4]["trade_id"] is None and out[4]["price"] is None
    # quote 5 @10: earlier than every A trade -> NULL
    assert out[5]["trade_id"] is None


def test_forward(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = _by_quote(
        asof_join(
            quotes, trades, on="sym", left_time="qts", right_time="tts",
            left_key="quote_id", right_tiebreak="trade_id", direction="forward",
        )
    )
    # forward = least (tts, trade_id) with tts >= qts
    assert out[1]["trade_id"] == 902  # 100 ties broken toward smaller id
    assert out[2]["trade_id"] is None  # nothing at-or-after 205
    assert out[3]["trade_id"] == 906
    assert out[5]["trade_id"] == 901


def test_no_left_key_groups_all_columns(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        quotes, trades, on="sym", left_time="qts", right_time="tts",
        right_tiebreak="trade_id",
    )
    assert out.count() == quotes.count()
    got = _by_quote(out)
    assert got[1]["trade_id"] == 903
    assert got[4]["trade_id"] is None


def test_column_collision_suffix(spark):
    left = spark.createDataFrame([(1, "k", 10, 1.0)], "id long, k string, t long, price double")
    right = spark.createDataFrame([("k", 5, 2.0)], "k string, rt long, price double")
    out = asof_join(left, right, on="k", left_time="t", right_time="rt", left_key="id")
    assert set(out.columns) == {"id", "k", "t", "price", "rt", "price_right"}
    row = out.collect()[0]
    assert (row["price"], row["price_right"]) == (1.0, 2.0)
