"""Property-based checks (hypothesis): slice is CPython-exact over the
whole (begin, end, stride) space, and cron_next always returns a
strictly-future matching time that is the MINIMUM such time."""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

N = 47  # prime-ish row count so stride patterns don't align


@pytest.fixture(scope="module")
def numbered_df(spark):
    return spark.range(N).selectExpr("id AS seq", "id * 3 AS payload")


idx = st.one_of(st.none(), st.integers(min_value=-2 * N, max_value=2 * N))
stride = st.one_of(st.none(),
                   st.integers(min_value=-2 * N, max_value=2 * N).filter(lambda s: s != 0))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(begin=idx, end=idx, step=stride)
def test_slice_matches_cpython(numbered_df, begin, end, step):
    from tenzir_spark.operators.core import slice_rows

    got = sorted(
        r["seq"] for r in
        slice_rows(numbered_df, begin, end, step, order_by="seq").collect()
    )
    expected = sorted(list(range(N))[begin:end:step])
    assert got == expected, (begin, end, step)


_SEC = st.sampled_from(["0", "*", "*/15", "7,30", "5-20"])
_MIN = st.sampled_from(["*", "0", "*/5", "3,17,59", "10-40/10"])
_HOUR = st.sampled_from(["*", "0", "6-18", "*/3", "23"])
_DOM = st.sampled_from(["*", "1", "15", "1-7", "*/10", "28"])
_MON = st.sampled_from(["*", "1", "6", "JAN,JUL", "3-9"])
_DOW = st.sampled_from(["*", "0", "MON-FRI", "6", "1,3,5"])


@settings(max_examples=150, deadline=None)
@given(sec=_SEC, mi=_MIN, h=_HOUR, dom=_DOM, mon=_MON, dow=_DOW,
       offset=st.integers(min_value=0, max_value=10_000_000))
def test_cron_next_is_minimal_future_match(sec, mi, h, dom, mon, dow, offset):
    from tenzir_spark.streaming.schedule import cron_next, parse_cron

    expr = parse_cron(f"{sec} {mi} {h} {dom} {mon} {dow}")
    after = datetime(2024, 1, 1) + timedelta(seconds=offset)
    nxt = cron_next(expr, after)
    assert nxt > after
    assert expr.matches(nxt), (sec, mi, h, dom, mon, dow, after, nxt)
    # minimality: nothing in (after, nxt) matches — spot-check the same
    # calendar day by re-deriving from one second before
    again = cron_next(expr, nxt - timedelta(seconds=1))
    assert again == nxt
