"""``every``/``cron`` scheduled execution (reference:
libtenzir/builtins/operators/every_cron.cpp — an ``every_scheduler``
(fixed interval, immediate first run) and a ``cron_scheduler`` (croncpp
expression, waits for the next fire), both exposing
``next_after(now) -> time_point`` to a shared scheduled-execution driver,
:265-360).

Spark's Structured Streaming triggers cover fixed intervals
(``processingTime``) but not cron expressions; this module provides the
cron calendar math plus a driver loop with an injectable clock so tests
never sleep. The cron dialect is the reference's croncpp one: six fields
``sec min hour day-of-month month day-of-week`` (a 5-field classic
expression is accepted and gets ``0`` seconds), with ``*`` ``,`` ``-``
``/`` and month/day names, and the vixie-cron rule that a restricted
day-of-month OR day-of-week matches when either does.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

_MONTHS = {n: i + 1 for i, n in enumerate(
    "JAN FEB MAR APR MAY JUN JUL AUG SEP OCT NOV DEC".split())}
_DAYS = {n: i for i, n in enumerate("SUN MON TUE WED THU FRI SAT".split())}

#: per-field (lo, hi) bounds: sec min hour dom mon dow
_BOUNDS = [(0, 59), (0, 59), (0, 23), (1, 31), (1, 12), (0, 7)]


class BadCronExpr(ValueError):
    pass


def _parse_field(text: str, idx: int) -> frozenset[int]:
    lo, hi = _BOUNDS[idx]
    names = _MONTHS if idx == 4 else _DAYS if idx == 5 else {}
    out: set[int] = set()
    for part in text.split(","):
        step, had_step = 1, False
        if "/" in part:
            part, step_s = part.split("/", 1)
            had_step = True
            try:
                step = int(step_s)
            except ValueError as e:
                raise BadCronExpr(f"bad step {step_s!r}") from e
            if step <= 0:
                raise BadCronExpr(f"step must be positive: {step}")
        if part in ("*", "?", ""):
            a, b = lo, hi
        elif "-" in part.lstrip("-"):
            a_s, b_s = part.split("-", 1)
            a, b = _value(a_s, names, idx), _value(b_s, names, idx)
        else:
            a = b = _value(part, names, idx)
            if had_step:
                b = hi  # `5/15` == `5-max/15` (croncpp semantics)
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise BadCronExpr(f"field {idx}: {text!r} out of range [{lo},{hi}]")
        out.update(range(a, b + 1, step))
    if idx == 5 and 7 in out:  # both 0 and 7 mean Sunday
        out.discard(7)
        out.add(0)
    return frozenset(out)


def _value(s: str, names: dict[str, int], idx: int) -> int:
    s = s.strip()
    if s.upper() in names:
        return names[s.upper()]
    try:
        return int(s)
    except ValueError as e:
        raise BadCronExpr(f"bad value {s!r} in field {idx}") from e


@dataclass(frozen=True)
class CronExpr:
    sec: frozenset[int]
    min: frozenset[int]
    hour: frozenset[int]
    dom: frozenset[int]
    mon: frozenset[int]
    dow: frozenset[int]
    dom_star: bool
    dow_star: bool

    def matches(self, t: datetime) -> bool:
        if (t.second not in self.sec or t.minute not in self.min
                or t.hour not in self.hour or t.month not in self.mon):
            return False
        dom_ok = t.day in self.dom
        dow_ok = (t.weekday() + 1) % 7 in self.dow  # python Mon=0 → cron Sun=0
        if self.dom_star or self.dow_star:
            return dom_ok and dow_ok
        return dom_ok or dow_ok  # vixie: either restricted field may match


def parse_cron(expr: str) -> CronExpr:
    fields = expr.split()
    if len(fields) == 5:  # classic 5-field: prepend seconds=0
        fields = ["0", *fields]
    if len(fields) != 6:
        raise BadCronExpr(
            f"expected 5 or 6 fields (sec min hour dom mon dow), got {expr!r}")
    parsed = [_parse_field(f, i) for i, f in enumerate(fields)]
    return CronExpr(
        sec=parsed[0], min=parsed[1], hour=parsed[2], dom=parsed[3],
        mon=parsed[4], dow=parsed[5],
        dom_star=fields[3] in ("*", "?"), dow_star=fields[5] in ("*", "?"),
    )


def cron_next(cron: CronExpr | str, after: datetime) -> datetime:
    """Strictly-next fire time after ``after`` (the reference's
    ``cron_next(cronexpr, tt)``). Walks minutes with per-field skips —
    bounded by a 4-year horizon (past which the expression is impossible,
    e.g. Feb 30)."""
    if isinstance(cron, str):
        cron = parse_cron(cron)
    t = (after + timedelta(seconds=1)).replace(microsecond=0)
    horizon = after + timedelta(days=4 * 366)
    while t <= horizon:
        if t.month not in cron.mon:
            # jump to the 1st of the next month
            t = (t.replace(day=1, hour=0, minute=0, second=0)
                 + timedelta(days=32)).replace(day=1)
            continue
        # day check (dom/dow): skip whole days fast
        day_probe = t.replace(hour=0, minute=0, second=0)
        dom_ok = t.day in cron.dom
        dow_ok = (t.weekday() + 1) % 7 in cron.dow
        day_match = (dom_ok and dow_ok) if (cron.dom_star or cron.dow_star) \
            else (dom_ok or dow_ok)
        if not day_match:
            t = day_probe + timedelta(days=1)
            continue
        if t.hour not in cron.hour:
            t = t.replace(minute=0, second=0) + timedelta(hours=1)
            continue
        if t.minute not in cron.min:
            t = t.replace(second=0) + timedelta(minutes=1)
            continue
        secs = sorted(s for s in cron.sec if s >= t.second)
        if secs:
            return t.replace(second=secs[0])
        t = t.replace(second=0) + timedelta(minutes=1)
    raise BadCronExpr("cron expression never fires within 4 years")


@dataclass
class EveryScheduler:
    """Fixed interval; first run immediate (every_cron.cpp:268 -
    ``immediate = true``)."""
    interval: timedelta
    immediate = True

    def __post_init__(self):
        if self.interval <= timedelta(0):
            raise ValueError("interval must be a positive duration")

    def next_after(self, now: datetime) -> datetime:
        return now + self.interval


@dataclass
class CronScheduler:
    """croncpp-style schedule; waits for the first matching time
    (every_cron.cpp:308 - ``immediate = false``)."""
    expr: CronExpr
    immediate = False

    @classmethod
    def parse(cls, text: str) -> CronScheduler:
        return cls(parse_cron(text))

    def next_after(self, now: datetime) -> datetime:
        return cron_next(self.expr, now)


def run_scheduled(fn, scheduler, *, n_runs: int | None = None,
                  now_fn=datetime.now, sleep_fn=None) -> int:
    """The scheduled-execution driver (every_cron.cpp:90-150): run ``fn``
    at each fire time until it returns False or ``n_runs`` is reached.
    ``now_fn``/``sleep_fn`` are injectable so tests drive a fake clock.
    Late wakeups skip straight to the next future fire, same as the
    reference's re-derivation of ``next_run`` from ``now``."""
    import time as _time

    sleep = sleep_fn or (lambda s: _time.sleep(s))
    runs = 0
    if scheduler.immediate:
        if fn() is False:
            return 1
        runs = 1
    nxt = scheduler.next_after(now_fn())
    while n_runs is None or runs < n_runs:
        now = now_fn()
        if now < nxt:
            sleep((nxt - now).total_seconds())
            continue
        if fn() is False:
            return runs + 1
        runs += 1
        now = now_fn()
        # late wakeup → schedule from now; on time → from the fire time
        # (every_cron.cpp:144-147)
        nxt = scheduler.next_after(now if now > nxt else nxt)
    return runs
