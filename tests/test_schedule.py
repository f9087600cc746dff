"""every/cron scheduling (streaming/schedule.py): cron calendar math and
the scheduled-execution driver with a fake clock — parity with
libtenzir/builtins/operators/every_cron.cpp (every = fixed interval,
immediate; cron = croncpp expression, waits for first fire)."""

from datetime import datetime, timedelta

import pytest

from tenzir_spark.streaming.schedule import (
    BadCronExpr,
    CronScheduler,
    EveryScheduler,
    cron_next,
    parse_cron,
    run_scheduled,
)

T0 = datetime(2024, 1, 12, 3, 4, 5)


def test_cron_next_basic_fields():
    # every minute
    assert cron_next("* * * * *", T0) == datetime(2024, 1, 12, 3, 5, 0)
    # hourly at :30
    assert cron_next("30 * * * *", T0) == datetime(2024, 1, 12, 3, 30, 0)
    # daily at 02:15 — already past today
    assert cron_next("15 2 * * *", T0) == datetime(2024, 1, 13, 2, 15, 0)
    # monthly on the 1st at midnight
    assert cron_next("0 0 1 * *", T0) == datetime(2024, 2, 1, 0, 0, 0)
    # yearly: Dec 25 06:00
    assert cron_next("0 6 25 12 *", T0) == datetime(2024, 12, 25, 6, 0, 0)


def test_cron_six_field_seconds():
    assert cron_next("*/15 * * * * *", T0) == datetime(2024, 1, 12, 3, 4, 15)
    assert cron_next("0 */5 * * * *", T0) == datetime(2024, 1, 12, 3, 5, 0)


def test_cron_names_ranges_steps():
    # weekdays at 09:00
    nxt = cron_next("0 9 * * MON-FRI", T0)  # Jan 12 2024 is a Friday
    assert nxt == datetime(2024, 1, 12, 9, 0, 0)
    # after Friday 09:00 → Monday
    assert cron_next("0 9 * * MON-FRI", nxt) == datetime(2024, 1, 15, 9, 0, 0)
    # named month + step minutes
    assert cron_next("*/20 * * FEB *", T0) == datetime(2024, 2, 1, 0, 0, 0)
    # list
    assert cron_next("5,35 * * * *", T0) == datetime(2024, 1, 12, 3, 5, 0)


def test_cron_vixie_dom_dow_either():
    # both restricted: fires on the 13th OR on Monday (vixie rule)
    e = parse_cron("0 0 13 * MON")
    # Jan 13 2024 is a Saturday — dom match fires first
    assert cron_next(e, T0) == datetime(2024, 1, 13, 0, 0, 0)
    # next after that is Monday Jan 15 (dow match)
    assert cron_next(e, datetime(2024, 1, 13, 0, 0, 0)) == datetime(2024, 1, 15)


def test_cron_list_mixing_step_and_plain():
    """A plain value in a list must stay a single value even when a
    SIBLING element carries a step (`1,30/15` ≠ `1-59,30/15`)."""
    e = parse_cron("1,30/15 * * * *")
    assert e.min == frozenset({1, 30, 45})
    assert cron_next(e, T0) == T0.replace(minute=30, second=0)


def test_cron_sunday_aliases():
    assert parse_cron("0 0 * * 7").dow == parse_cron("0 0 * * 0").dow
    assert parse_cron("0 0 * * SUN").dow == frozenset({0})


def test_cron_leap_and_impossible():
    # Feb 29 exists in 2024
    assert cron_next("0 0 29 2 *", T0) == datetime(2024, 2, 29, 0, 0, 0)
    with pytest.raises(BadCronExpr, match="never fires"):
        cron_next("0 0 30 2 *", T0)
    with pytest.raises(BadCronExpr):
        parse_cron("61 * * * *")
    with pytest.raises(BadCronExpr):
        parse_cron("* * *")


def test_every_scheduler_immediate_and_interval():
    sch = EveryScheduler(timedelta(minutes=10))
    assert sch.immediate is True
    assert sch.next_after(T0) == T0 + timedelta(minutes=10)
    with pytest.raises(ValueError):
        EveryScheduler(timedelta(0))


def test_run_scheduled_fake_clock():
    """Drive both schedulers with a fake clock: no sleeping, exact fire
    count, late wakeups skip to the next future fire."""
    clock = {"now": T0}
    fired = []

    def now_fn():
        return clock["now"]

    def sleep_fn(s):
        clock["now"] += timedelta(seconds=s)

    def fn():
        fired.append(clock["now"])

    n = run_scheduled(fn, EveryScheduler(timedelta(minutes=2)),
                      n_runs=3, now_fn=now_fn, sleep_fn=sleep_fn)
    assert n == 3
    # immediate first run, then +2min cadence
    assert fired == [T0, T0 + timedelta(minutes=2), T0 + timedelta(minutes=4)]

    fired.clear()
    clock["now"] = T0
    n = run_scheduled(fn, CronScheduler.parse("*/5 * * * *"),
                      n_runs=2, now_fn=now_fn, sleep_fn=sleep_fn)
    assert n == 2
    assert fired == [datetime(2024, 1, 12, 3, 5), datetime(2024, 1, 12, 3, 10)]


def test_run_scheduled_stop_on_false():
    clock = {"now": T0}
    calls = []

    def fn():
        calls.append(1)
        return False  # source exhausted → stop

    n = run_scheduled(fn, EveryScheduler(timedelta(minutes=1)),
                      now_fn=lambda: clock["now"],
                      sleep_fn=lambda s: clock.__setitem__(
                          "now", clock["now"] + timedelta(seconds=s)))
    assert n == 1 and len(calls) == 1
