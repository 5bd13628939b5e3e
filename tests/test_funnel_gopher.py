"""Funnel ordering semantics + Gopher quality-rule edge cases."""

from __future__ import annotations

from datetime import datetime

from retailfeaturestore_spark.operators.funnel import funnel_stage_times, funnel_summary
from retailfeaturestore_spark.operators.textops import gopher_quality

STAGES = ("view", "click", "purchase")


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def _t(s):
    return datetime.fromisoformat(s)


def test_funnel_strict_ordering(spark):
    ev = _events(
        spark,
        [
            # user 1: full ordered funnel
            (1, _t("2024-01-01T10:00:00"), "view"),
            (1, _t("2024-01-01T11:00:00"), "click"),
            (1, _t("2024-01-01T12:00:00"), "purchase"),
            # user 2: purchase BEFORE the click -> purchase must not count
            (2, _t("2024-01-01T10:00:00"), "view"),
            (2, _t("2024-01-01T10:30:00"), "purchase"),
            (2, _t("2024-01-01T11:00:00"), "click"),
            # user 3: click with no prior view -> click must not count
            (3, _t("2024-01-01T09:00:00"), "click"),
            # user 4: equal timestamps are NOT "after" (strict >)
            (4, _t("2024-01-01T10:00:00"), "view"),
            (4, _t("2024-01-01T10:00:00"), "click"),
        ],
    )
    rows = {r.user_id: r for r in funnel_stage_times(ev, STAGES).collect()}
    assert rows[1].stage_purchase == _t("2024-01-01T12:00:00")
    assert rows[2].stage_click == _t("2024-01-01T11:00:00")
    assert rows[2].stage_purchase is None
    assert rows[3].stage_view is None and rows[3].stage_click is None
    assert rows[4].stage_view is not None and rows[4].stage_click is None


def test_funnel_picks_first_qualifying_event(spark):
    ev = _events(
        spark,
        [
            (1, _t("2024-01-01T08:00:00"), "click"),  # before any view: skip
            (1, _t("2024-01-01T10:00:00"), "view"),
            (1, _t("2024-01-01T11:00:00"), "click"),  # first AFTER the view
            (1, _t("2024-01-01T12:00:00"), "click"),
        ],
    )
    row = funnel_stage_times(ev, STAGES).collect()[0]
    assert row.stage_view == _t("2024-01-01T10:00:00")
    assert row.stage_click == _t("2024-01-01T11:00:00")


def test_funnel_summary_counts_and_rates(spark):
    ev = _events(
        spark,
        [
            (1, _t("2024-01-01T10:00:00"), "view"),
            (1, _t("2024-01-01T11:00:00"), "click"),
            (2, _t("2024-01-01T10:00:00"), "view"),
            (3, _t("2024-01-01T10:00:00"), "error"),
        ],
    )
    row = funnel_summary(funnel_stage_times(ev, STAGES), STAGES).collect()[0]
    assert (row.n_users, row.n_view, row.n_click, row.n_purchase) == (3, 2, 1, 0)
    assert row.rate_click == 0.5
    assert row.rate_purchase == 0.0


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_flags(spark):
    good = "the " + " ".join(f"word{i}" for i in range(60)) + " of and to"
    short = "the cat of and to sat"  # < 50 words
    symbols = " ".join(["the", "of", "and", "to"] * 15 + ["#"] * 30)  # symbol-heavy
    nostop = " ".join(f"w{i}" for i in range(60))  # no stopwords
    d = _docs(spark, [(1, good), (2, short), (3, symbols), (4, nostop)])
    out = {r.doc_id: r for r in gopher_quality(d).collect()}
    assert out[1].gopher_pass == 1
    assert out[2].flag_word_count == 0 and out[2].gopher_pass == 0
    assert out[3].flag_symbol_ratio == 0 and out[3].gopher_pass == 0
    assert out[4].flag_stopwords == 0 and out[4].gopher_pass == 0


def test_gopher_mean_word_len_bounds(spark):
    # all 2-char words -> mean < 3 -> flag off; all 12-char -> mean > 10 -> off
    tiny = " ".join(["ab"] * 60)
    long_w = " ".join(["abcdefghijkl"] * 60)
    d = _docs(spark, [(1, tiny), (2, long_w)])
    out = {r.doc_id: r for r in gopher_quality(d).collect()}
    assert out[1].flag_mean_word_len == 0
    assert out[2].flag_mean_word_len == 0
    assert out[1].mean_word_len == 2.0
    assert out[2].mean_word_len == 12.0
