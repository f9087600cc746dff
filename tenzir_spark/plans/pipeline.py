"""TQL pipeline-text front-end: ``run_tql("where … | summarize … | sort …")``.

The reference executes textual operator pipelines (parser:
libtenzir/src/tql/parser.cpp — operator names + arguments split on ``|``,
each operator parsing its own argument grammar; operator docs under
web/docs/operators/). This module re-states that front door over the
existing operator library: the pipeline text compiles to a DataFrame plan,
so Catalyst still sees ONE declarative query — predicate pushdown, pruning
and join planning work across operator boundaries exactly as if the user
had written the DataFrame calls directly (the reference implements
where/head pushdown by hand in its pipeline optimizer;
libtenzir/include/tenzir/pipeline.hpp:150-155).

Order semantics: Tenzir streams are ordered; DataFrames are not. Operators
whose semantics depend on stream order (tail/slice/enumerate/unique/
deduplicate/reverse) take the pipeline's CURRENT order — the ``order_by``
argument of :func:`run_tql` (the stream position column, e.g. the LSN),
updated by any ``sort`` stage. Using them with no order in scope is a
compile error, not silently nondeterministic output.

Grammar per stage (subset relevant to batch analytics; streaming-only
modifiers like ``timeout`` and source/sink operators are handled by the
dedicated modules: sources/, streaming/, lake/):

    where <expr>                      select <f>...          drop <f>...
    rename <new>=<old>...             set|extend|replace <f>=<vexpr>...
    put <f>=<vexpr>...                summarize [n=]f(x)... by e...
                                        [resolution <dur>]
    sort [--stable] <f> [asc|desc] [nulls-first|nulls-last] ...
    head [n]    tail [n]    taste [n]    slice a:b[:c]    reverse
    top <f> [--count-field=<c>]       rare <f> [--count-field=<c>]
    unique      deduplicate [<f>...] [--limit <n>]    enumerate [<f>]
    measure     unroll <f>    flatten    unflatten    yield <a.b[].c>
    decapsulate [<data-col>]          yara <rules-file> [--field <col>]
    hash <f> [--salt=<s>]    batch [n]    timeshift <f> [<start>]
    parse <f> kv|json|grok|syslog3164|syslog5424|cef|leef|gelf ["<arg>"]
    apply <file.tql>    enrich <ctx> [--field <f>] [--filter]
    lookup <ctx> --field <f>          pass    discard    repeat [n]
    chart <type> [--x <f>] [--y <f>]  shell <cmd>    version
    sigma <rules-file|dir>            pseudonymize [--seed <s>] <f>...
    compress <codec> [--field <f>]    decompress <codec> [--field <f>]
    python "<code>" [--schema "<ddl>"]    python --file <path>.py
    publish <warehouse>/<topic>
    local <op …>    remote <op …>     unordered <op …>

:func:`run_tql_source` adds the source/sink stages:

    from <path> [read <fmt>] | … | to <path> [write <fmt>]
    from http(s)://… [read <fmt>]    | … | to http(s)://…
    from -|stdin [read <fmt>]      to -|stdout   (the reference's `dash`
                             connector: `-` aliases stdin/stdout,
                             builtins/connectors/dash.cpp)
    export <table_root> [--changes-since <v> [--to <v>]]
                             | … | import <table_root>
    subscribe <warehouse>/<topic>  (publish is an operator stage)
    metrics <warehouse>      (ingest telemetry as a source)
    every <interval> <pipeline>    cron "<expr>" <pipeline>
      (run_tql_every — scheduled re-execution, injectable clock)

(formats: parquet json csv/tsv/ssv lines zeek-tsv feather pcap bitz
 msgpack fluentbit/fwd — fluent forward-protocol chunk files)

Value expressions (<vexpr>) support literals, field refs, arithmetic
(+ - * / %), parentheses and a function whitelist (round abs length lower
upper trim coalesce concat substring) — the subset of the reference's
assignment grammar that covers its documented examples.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.operators import aggregate as agg_ops
from tenzir_spark.operators import core, meta, structural, transform
from tenzir_spark.plans.expr import _fields_for_suffix, compile_expr


class TqlError(ValueError):
    """Pipeline-text compile error (operator, argument or expression)."""


# ---------------------------------------------------------------------------
# pipeline splitting: top-level single `|`, never `||`, never inside
# quotes or brackets
# ---------------------------------------------------------------------------


def split_pipeline(text: str) -> list[str]:
    stages, buf, depth, i, in_str = [], [], 0, 0, False
    while i < len(text):
        ch = text[i]
        if in_str:
            buf.append(ch)
            if ch == "\\" and i + 1 < len(text):
                buf.append(text[i + 1])
                i += 1
            elif ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
            buf.append(ch)
        elif ch in "([":
            depth += 1
            buf.append(ch)
        elif ch in ")]":
            depth -= 1
            buf.append(ch)
        elif ch == "|" and depth == 0:
            if i + 1 < len(text) and text[i + 1] == "|":
                buf += ["|", "|"]
                i += 1
            else:
                stages.append("".join(buf).strip())
                buf = []
        else:
            buf.append(ch)
        i += 1
    if in_str:
        raise TqlError("unterminated string literal in pipeline")
    stages.append("".join(buf).strip())
    out = [s for s in stages if s]
    if not out:
        raise TqlError("empty pipeline")
    return out


# ---------------------------------------------------------------------------
# value expressions (assignment RHS)
# ---------------------------------------------------------------------------

_VTOKEN = re.compile(
    r"""\s*(?:
        (?P<num>-?\d+\.\d+|-?\d+)|
        (?P<str>"(?:[^"\\]|\\.)*")|
        (?P<op>[+\-*/%(),])|
        (?P<word>[A-Za-z_][\w.]*)
    )""",
    re.X,
)

_VFUNCS = {
    "round": lambda a: F.round(*a),
    "abs": lambda a: F.abs(*a),
    "length": lambda a: F.length(*a),
    "lower": lambda a: F.lower(*a),
    "upper": lambda a: F.upper(*a),
    "trim": lambda a: F.trim(*a),
    "coalesce": lambda a: F.coalesce(*a),
    "concat": lambda a: F.concat(*a),
    "substring": lambda a: F.substring(a[0], a[1], a[2]),
}

_VKEYWORDS = {"true": True, "false": False, "null": None}


def _vtokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _VTOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise TqlError(f"bad token in expression at {text[pos:pos + 20]!r}")
        pos = m.end()
        out.append((m.lastgroup, m.group(m.lastgroup)))
    out.append(("eof", ""))
    return out


class _VParser:
    def __init__(self, text: str, schema: T.StructType):
        self.toks = _vtokenize(text)
        self.i = 0
        self.schema = schema

    def peek(self):
        return self.toks[self.i]

    def eat(self, val: str | None = None):
        t = self.toks[self.i]
        if val is not None and t[1] != val:
            raise TqlError(f"expected {val!r}, got {t[1]!r}")
        self.i += 1
        return t

    def expr(self) -> Column:
        out = self.term()
        while self.peek()[1] in ("+", "-"):
            op = self.eat()[1]
            rhs = self.term()
            out = out + rhs if op == "+" else out - rhs
        return out

    def term(self) -> Column:
        out = self.factor()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.eat()[1]
            rhs = self.factor()
            out = {"*": out * rhs, "/": out / rhs, "%": out % rhs}[op]
        return out

    def factor(self) -> Column:
        k, v = self.peek()
        if v == "(":
            self.eat()
            e = self.expr()
            self.eat(")")
            return e
        if v == "-":
            self.eat()
            return -self.factor()
        if k == "num":
            self.eat()
            return F.lit(float(v) if "." in v else int(v))
        if k == "str":
            self.eat()
            return F.lit(v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if k == "word":
            self.eat()
            if v in _VKEYWORDS:
                return F.lit(_VKEYWORDS[v])
            if self.peek()[1] == "(":
                fn = _VFUNCS.get(v)
                if fn is None:
                    raise TqlError(f"unknown function {v!r} "
                                   f"(available: {sorted(_VFUNCS)})")
                self.eat("(")
                args = []
                while self.peek()[1] != ")":
                    args.append(self.expr())
                    if self.peek()[1] == ",":
                        self.eat()
                self.eat(")")
                return fn(args)
            return _field_col(self.schema, v)
        raise TqlError(f"bad expression token {v!r}")


def _field_col(schema: T.StructType, name: str) -> Column:
    """Resolve a field reference with suffix semantics; an assignment RHS
    needs exactly one binding (a predicate may fan out into a disjunction,
    a value cannot)."""
    fields = _fields_for_suffix(schema, name)
    if not fields:
        raise TqlError(f"unknown field {name!r}")
    if len(fields) > 1:
        raise TqlError(
            f"ambiguous field {name!r} matches {[p for p, _t in fields]}")
    path = fields[0][0]
    from tenzir_spark.plans.expr import field_col

    return field_col(path)


def compile_value(text: str, schema: T.StructType) -> Column:
    p = _VParser(text, schema)
    c = p.expr()
    if p.peek()[0] != "eof":
        raise TqlError(f"trailing input in expression: {p.peek()[1]!r}")
    return c


# ---------------------------------------------------------------------------
# per-stage argument helpers
# ---------------------------------------------------------------------------


def _fields_list(args: str) -> list[str]:
    out = [a for a in re.split(r"[,\s]+", args.strip()) if a]
    if not out:
        raise TqlError("expected at least one field")
    return out


def _assignments(args: str) -> list[tuple[str, str]]:
    """``name=expr, name=expr ...`` — split on top-level commas, then on
    the first ``=`` (the RHS may contain nested commas in function calls)."""
    parts, buf, depth = [], [], 0
    in_str = False
    esc = False  # true escape STATE, not just prev=='\\' — x="a\\" must
    # close its string (the second backslash is itself escaped)
    for ch in args:
        if esc:
            esc = False
            buf.append(ch)
            continue
        if ch == "\\" and in_str:
            esc = True
            buf.append(ch)
            continue
        if ch == '"':
            in_str = not in_str
        elif not in_str:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
        if ch == "," and depth == 0 and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    out = []
    for p in parts:
        p = p.strip()
        if not p:
            continue
        if "=" not in p:
            raise TqlError(f"expected name=expression, got {p!r}")
        name, expr = p.split("=", 1)
        out.append((name.strip(), expr.strip()))
    if not out:
        raise TqlError("expected at least one assignment")
    return out


_DUR_UNITS = {
    "s": "second", "sec": "second", "second": "second", "seconds": "second",
    "m": "minute", "min": "minute", "minute": "minute", "minutes": "minute",
    "h": "hour", "hour": "hour", "hours": "hour",
    "d": "day", "day": "day", "days": "day",
}


def _resolution_unit(dur: str) -> str:
    """``1 hour`` / ``1h`` → date_trunc unit (summarize.md resolution is a
    bucket tolerance; unit-granularity durations map to date_trunc)."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-z]+)\s*", dur.strip().lower())
    if not m or m.group(2) not in _DUR_UNITS:
        raise TqlError(f"bad resolution duration {dur!r}")
    if m.group(1) != "1":
        raise TqlError(
            f"only unit-granularity resolutions supported, got {dur!r}")
    return _DUR_UNITS[m.group(2)]


def _parse_summarize(args: str, schema: T.StructType):
    """``[name=]f(x)... by e... [resolution <dur>]``"""
    m = re.search(r"\bby\b", args)
    agg_part = args[: m.start()] if m else args
    by_part = args[m.end():] if m else ""
    resolution = None
    rm = re.search(r"\bresolution\b(.*)$", by_part)
    if rm:
        resolution = _resolution_unit(rm.group(1))
        by_part = by_part[: rm.start()]

    aggs: dict[str, Column] = {}
    agg_re = re.compile(r"(?:([\w.]+)\s*=\s*)?(\w+)\(\s*([\w.*]*)\s*\)")
    for am in agg_re.finditer(agg_part):
        name, fn, arg = am.group(1), am.group(2), am.group(3)
        builder = agg_ops.AGG_FUNCTIONS.get(fn)
        if builder is None:
            raise TqlError(f"unknown aggregation {fn!r} "
                           f"(available: {sorted(agg_ops.AGG_FUNCTIONS)})")
        col = F.lit(1) if arg in ("", "*", ".") else _field_col(schema, arg)
        aggs[name or f"{fn}({arg})"] = builder(col)
    if not aggs:
        raise TqlError(f"summarize: no aggregations in {agg_part!r}")
    leftover = agg_re.sub("", agg_part).strip(" ,\t\n")
    if leftover:
        raise TqlError(
            f"summarize: unparsed text {leftover!r} between aggregations")
    keys = [a for a in re.split(r"[,\s]+", by_part.strip()) if a]
    return aggs, keys, resolution


_SORT_WORDS = {"asc": ("asc", None), "desc": ("desc", None),
               "nulls-first": (None, "first"), "nulls-last": (None, "last")}


def _parse_sort(args: str, schema: T.StructType):
    """``[--stable] f [asc|desc] [nulls-first|nulls-last] ...`` → list of
    (column, RESOLVED key path, ascending) — the path (not the typed
    suffix) becomes the downstream stream-order column."""
    toks = [t for t in re.split(r"[,\s]+", args.strip()) if t and t != "--stable"]
    if not toks:
        raise TqlError("sort: expected at least one field")
    specs: list[tuple[str, str, str | None]] = []  # (field, dir, nulls)
    for t in toks:
        if t in _SORT_WORDS:
            if not specs:
                raise TqlError(f"sort: {t!r} before any field")
            f, d, nl = specs[-1]
            nd, nn = _SORT_WORDS[t]
            specs[-1] = (f, nd or d, nn or nl)
        else:
            specs.append((t, "asc", None))
    out = []
    for fname, d, nl in specs:
        path = _one_path(schema, fname)
        c = _field_col(schema, fname)
        if d == "asc":
            c = c.asc_nulls_first() if nl == "first" else c.asc_nulls_last() \
                if nl == "last" else c.asc()
        else:
            c = c.desc_nulls_first() if nl == "first" else c.desc_nulls_last() \
                if nl == "last" else c.desc()
        out.append((c, path, d == "asc"))
    return out


def _flag(args: str, name: str) -> tuple[str, str | None]:
    """Extract ``--name=value`` (or ``--name value``) from an arg string."""
    m = re.search(rf"--{name}(?:=|\s+)(\S+)", args)
    if not m:
        return args, None
    return (args[: m.start()] + args[m.end():]).strip(), m.group(1)


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------


def _guard_insert_only(df: DataFrame, stage: str, allow: bool) -> DataFrame:
    """Enforce the dedup indexes' append-only contract on CDC envelopes:
    the index records accepted content forever, so an UPDATE whose new
    content matches the doc's own earlier accepted version would be
    silently dropped pre-merge — wrong on a general binlog tail. When
    the stream carries an ``op`` column, any non-insert row raises at
    execution (one codegen comparison per row; insert-only streams pass
    untouched) unless ``--allow-updates`` opts in."""
    if allow or "op" not in df.columns:
        return df
    return df.filter(
        F.when(F.col("op") == "insert", F.lit(True)).otherwise(
            F.raise_error(F.concat(
                F.lit(f"{stage}: stream carries non-insert op '"),
                F.col("op"),
                F.lit("' — the dedup index is append-only (re-ingested "
                      "UPDATE content matching an earlier accepted "
                      "version is silently dropped); filter to inserts "
                      "upstream or pass --allow-updates")))))


def _dedup_batch_id(arg: str | None, stream_batch_id: int | None,
                    stage: str) -> int:
    """Resolve the dedup-index stages' ``batch`` argument: a literal
    int, ``auto`` = the streaming driver's per-micro-batch id, and — in
    a streaming context — OMITTED also defaults to the micro-batch id
    (a static id there would make every micro-batch overwrite one index
    partition and probe nothing; silently disabling dedup is the worse
    failure). ``auto`` outside streaming is a targeted error — and so is
    OMITTING ``batch`` in a batch pipeline: defaulting to 0 would make
    every run probe ``batch < 0`` (nothing) and overwrite partition 0,
    silently never dedupping against prior state."""
    if arg == "auto":
        if stream_batch_id is None:
            raise TqlError(
                f"{stage}: `batch auto` needs a streaming context "
                "(run_tql_stream threads the micro-batch id); in batch "
                "pipelines pass a literal `batch <n>`")
        return int(stream_batch_id)
    if arg is None:
        if stream_batch_id is not None:
            return int(stream_batch_id)
        raise TqlError(
            f"{stage}: `batch <n>` is required in a batch pipeline — "
            "each run must advance the index partition (defaulting to 0 "
            "would probe nothing and overwrite partition 0 every run); "
            "in streaming pipelines omit it or pass `batch auto`")
    return int(arg)


def run_tql(df: DataFrame, text: str, order_by: str | None = None,
            context_store=None,
            stream_batch_id: int | None = None) -> DataFrame:
    """Compile pipeline text onto ``df`` and return the resulting
    DataFrame (lazy — one Catalyst plan for the whole pipeline).

    ``order_by`` declares the stream-position column for order-sensitive
    operators; a ``sort`` stage re-declares it for everything downstream.
    ``stream_batch_id`` is the per-micro-batch id a streaming driver
    (run_tql_stream) threads through — ``near-dedup``/``semantic-dedup``
    stages with ``batch auto`` resolve to it, so the dedup index advances
    one partition per micro-batch with redelivery staying idempotent.

    ``context_store`` (an operators.contexts.ContextStore) enables the
    ``enrich <ctx> [--field <f>] [--filter]`` and ``lookup <ctx> --field
    <f>`` stages against named lake-backed contexts.
    """
    order: str | None = order_by
    for stage in split_pipeline(text):
        parts = stage.split(None, 1)
        name, args = parts[0], (parts[1] if len(parts) > 1 else "")
        # location/order modifiers wrap the next operator (reference:
        # local_remote.cpp:28-70 wraps an operator with a location tag;
        # unordered.cpp drops its ordering requirement). One engine, one
        # location — local/remote are accepted and recorded as no-ops
        # (Catalyst places the work); unordered clears the declared
        # stream order so order-sensitive ops downstream must re-sort.
        while name in ("local", "remote", "unordered"):
            if name == "unordered":
                order = None
            if not args.strip():
                raise TqlError(f"{name}: expected a wrapped operator")
            parts = args.split(None, 1)
            name, args = parts[0], (parts[1] if len(parts) > 1 else "")
        schema = df.schema

        def need_order(opname: str) -> str:
            if order is None:
                raise TqlError(
                    f"{opname} needs stream order: pass order_by= or put a "
                    f"`sort` stage before it")
            return order

        try:
            if name == "where":
                df = df.filter(compile_expr(args, schema))
            elif name == "select":
                df = core.select(df, *[_one_path(schema, f) for f in _fields_list(args)])
            elif name == "drop":
                df = core.drop(df, *[_one_path(schema, f) for f in _fields_list(args)])
            elif name == "rename":
                mapping = {new: _one_path(schema, old)
                           for new, old in _assignments(args)}
                df = core.rename(df, mapping)
            elif name in ("set", "extend", "replace", "put"):
                fields = {n: compile_value(e, schema) for n, e in _assignments(args)}
                df = {"set": core.set_fields, "extend": core.extend,
                      "replace": core.replace_fields, "put": core.put}[name](df, fields)
            elif name == "summarize":
                aggs, keys, resolution = _parse_summarize(args, schema)
                key_paths = [_one_path(schema, k) for k in keys]
                time_col = None
                if resolution:
                    from tenzir_spark.plans.expr import dtype_of

                    ts = [k for k in key_paths
                          if isinstance(dtype_of(schema, k),
                                        (T.TimestampType, T.TimestampNTZType, T.DateType))]
                    if not ts:
                        raise TqlError("resolution needs a time-typed by key")
                    time_col = ts[0]
                    key_paths = [k for k in key_paths if k != time_col]
                df = agg_ops.summarize(df, aggs, by=key_paths,
                                       resolution=resolution, time_col=time_col)
                order = None
            elif name == "sort":
                specs = _parse_sort(args, schema)
                df = agg_ops.sort(df, *[c for c, _f, _a in specs])
                # an ascending first key re-declares the stream order for
                # downstream order-sensitive ops; a descending key does not
                # (their position column must ascend) — explicit None beats a
                # silently wrong order
                order = specs[0][1] if specs[0][2] else None
            elif name == "head":
                df = core.head(df, int(args) if args.strip() else 10)
            elif name == "tail":
                df = core.tail(df, int(args) if args.strip() else 10,
                               order_by=need_order("tail"))
            elif name == "taste":
                # `taste [n] [by <col>]` — the per-"schema" discriminator
                # column; defaults to the first column (the multi-schema
                # stream id in the reference becomes an ordinary column
                # in a typed DataFrame world)
                tm = re.fullmatch(r"\s*(\d+)?\s*(?:by\s+([\w.]+))?\s*", args)
                if not tm:
                    raise TqlError(f"taste: expected [n] [by <col>], got {args!r}")
                n = int(tm.group(1)) if tm.group(1) else 10
                disc = (_one_path(schema, tm.group(2)) if tm.group(2)
                        else df.columns[0])
                df = core.taste(df, n, schema_col=disc,
                                order_by=need_order("taste"))
            elif name == "slice":
                m = re.fullmatch(
                    r"\s*(-?\d+)?\s*:\s*(-?\d+)?\s*(?::\s*(-?\d+)\s*)?", args)
                if not m:
                    raise TqlError(f"slice: expected a:b[:c], got {args!r}")
                b, e, s = (int(g) if g is not None else None for g in m.groups())
                df = core.slice_rows(df, b, e, s, order_by=need_order("slice"))
                if (s or 1) < 0:
                    # a negative stride REVERSES the stream (slice ::-1 ==
                    # reverse): the ascending order column no longer
                    # describes downstream positions — clear it, like
                    # `reverse` does, instead of silently handing tail/
                    # taste the wrong end of the stream
                    order = None
            elif name == "reverse":
                df = core.reverse(df, order_by=need_order("reverse"))
                order = None
            elif name == "parse":
                # parse <field> <parser> [<arg>] (parse.md:16-21); the
                # parser inventory mirrors sources/formats.py
                pm = re.fullmatch(
                    r'\s*([\w.]+)\s+(\w+)(?:\s+"((?:[^"\\]|\\.)*)")?\s*', args)
                if not pm:
                    raise TqlError(
                        f'parse: expected <field> <parser> ["<arg>"], got {args!r}')
                fld = _one_path(schema, pm.group(1))
                parser, parg = pm.group(2), pm.group(3)
                if parser == "kv":
                    df = transform.parse_kv_field(df, fld)
                elif parser == "json":
                    if not parg:
                        raise TqlError('parse json needs a "<ddl schema>" arg')
                    df = transform.parse_json_field(df, fld, parg)
                elif parser == "grok":
                    if not parg:
                        raise TqlError('parse grok needs a "<pattern>" arg')
                    from tenzir_spark.sources.grok import parse_grok

                    df = parse_grok(df, fld, parg)
                elif parser in ("syslog3164", "syslog5424", "cef", "leef",
                                "gelf"):
                    from tenzir_spark.sources import formats as fmt

                    cols = {
                        "syslog3164": fmt.parse_syslog3164,
                        "syslog5424": fmt.parse_syslog5424,
                        "cef": fmt.parse_cef,
                        "leef": fmt.parse_leef,
                        "gelf": fmt.parse_gelf,
                    }[parser](fld)
                    df = df.select("*", *cols)
                else:
                    raise TqlError(
                        f"unknown parser {parser!r} (kv|json|grok|"
                        f"syslog3164|syslog5424|cef|leef|gelf)")
            elif name in ("top", "rare"):
                rest, cf = _flag(args, "count-field")
                rest2, cf2 = _flag(rest, "c")
                field = rest2.strip()
                if not field:
                    raise TqlError(f"{name}: expected a field")
                out_count = cf or cf2 or "count"
                fn = agg_ops.top if name == "top" else agg_ops.rare
                df = fn(df, _one_path(schema, field)).withColumnRenamed(
                    "count", out_count)
                order = None
            elif name == "unique":
                df = core.unique_adjacent(df, order_by=need_order("unique"))
            elif name == "deduplicate":
                ob = need_order("deduplicate")
                rest, limit = _flag(args, "limit")
                keys = _fields_list(rest) if rest.strip() else \
                    [c for c in df.columns if c != ob]
                df = core.deduplicate(df, [_one_path(schema, k) for k in keys],
                                      limit=int(limit) if limit else 1,
                                      order_by=ob)
            elif name == "enumerate":
                df = core.enumerate_rows(df, field=args.strip() or "index",
                                         order_by=need_order("enumerate"))
            elif name == "measure":
                df = agg_ops.measure(df)
                order = None
            elif name == "unroll":
                df = structural.unroll(df, _one_path(schema, args.strip()))
                order = None  # exploded siblings share one order value
            elif name == "flatten":
                df = structural.flatten(df)
            elif name == "yara":
                # `yara <rules-file> [--field <col>]` — the reference CLI
                # takes rule file paths (yara.md synopsis)
                rest, fld = _flag(args, "field")
                rpath = rest.strip()
                if not rpath:
                    raise TqlError("yara: expected a rules file")
                from tenzir_spark.operators.yara import yara_match

                with open(rpath) as fh:
                    df = yara_match(df, fh.read(),
                                    _one_path(schema, fld or "data"))
            elif name == "decapsulate":
                from tenzir_spark.sources.pcap import decapsulate as _decap

                df = _decap(df, data_col=args.strip() or "data")
            elif name == "unflatten":
                df = structural.unflatten(df)
            elif name == "yield":
                if not args.strip():
                    raise TqlError("yield: expected an extractor (a.b[].c)")
                df = structural.yield_(df, args.strip())
            elif name == "batch":
                df = meta.batch(df, int(args) if args.strip() else 65536)
            elif name == "timeshift":
                import shlex

                ts_args = shlex.split(args)
                if not ts_args:
                    raise TqlError("timeshift: expected a time field")
                # the start instant may contain a space ("2024-01-01
                # 00:00:00"), quoted or not — join the remaining tokens
                start = " ".join(ts_args[1:]) or None
                df = transform.timeshift(
                    df, _one_path(schema, ts_args[0]), start=start)
            elif name == "hash":
                rest, salt = _flag(args, "salt")
                df = transform.hash_field(df, _one_path(schema, rest.strip()),
                                          salt=salt)
            elif name == "sigma":
                # `sigma <rules-file|dir>` (sigma.md: rule file or
                # directory); several YAML documents / files run as ONE
                # multi-rule scan (operators/sigma.py)
                import os as _os

                from tenzir_spark.operators.sigma import sigma as _sigma
                from tenzir_spark.operators.sigma import sigma_multi

                rpath = args.strip()
                if not rpath:
                    raise TqlError("sigma: expected a rules file")
                raws = []
                if _os.path.isdir(rpath):
                    for f_ in sorted(_os.listdir(rpath)):
                        if f_.endswith((".yml", ".yaml")):
                            with open(_os.path.join(rpath, f_)) as fh:
                                raws.append(fh.read())
                else:
                    with open(rpath) as fh:
                        raws.append(fh.read())
                # every file may hold several ----separated documents
                texts = [t for raw_ in raws
                         for t in re.split(r"(?m)^---\s*$", raw_)
                         if t.strip()]
                if not texts:
                    raise TqlError(f"sigma: no rules found at {rpath!r}")
                df = (sigma_multi(df, texts) if len(texts) > 1
                      else _sigma(df, texts[0]))
            elif name == "pseudonymize":
                # `pseudonymize [--method crypto-pan] [--seed <s>] <f>...`
                # (pseudonymize.md's flags; crypto-pan is the only method
                # the reference implements too)
                rest, method = _flag(args, "method")
                rest, seed = _flag(rest, "seed")
                if method not in (None, "crypto-pan"):
                    raise TqlError(
                        f"pseudonymize: unknown method {method!r}")
                flds = rest.split()
                if not flds:
                    raise TqlError("pseudonymize: expected a field")
                for f_ in flds:
                    p_ = _one_path(schema, f_)
                    # the reference replaces the field in place
                    df = transform.pseudonymize_ip(
                        df, p_, seed=seed or "tenzir", out=p_)
            elif name in ("compress", "decompress"):
                # `compress <codec> [--field <f>]` (compress.md takes the
                # codec positionally; here per-value on a binary column)
                rest, fld = _flag(args, "field")
                codec = rest.strip() or "gzip"
                fn_ = (transform.compress_field if name == "compress"
                       else transform.decompress_field)
                p_ = _one_path(schema, fld or "data")
                # the reference transforms the byte stream in place
                df = fn_(df, p_, codec=codec, out=p_)
            elif name == "publish":
                # `publish <warehouse>/<topic>` — append the CURRENT
                # pipeline state as one topic segment and pass the rows
                # through (publish.md forwards its input). Eager by
                # necessity: the segment is the side effect.
                import os as _os

                from tenzir_spark.operators.topics import publish as _pub

                root = args.strip().rstrip("/")
                if not root or "/" not in root:
                    raise TqlError("publish: expected <warehouse>/<topic>")
                _pub(df, _os.path.basename(root), _os.path.dirname(root))
            elif name in ("enrich", "lookup"):
                if context_store is None:
                    raise TqlError(
                        f"{name} needs a ContextStore: pass context_store= "
                        "to run_tql (contexts live in the lake warehouse)")
                rest, fld = _flag(args, "field")
                rest, _live = _flag(rest, "live")
                do_filter = name == "lookup"
                if "--filter" in rest:
                    rest = rest.replace("--filter", "")
                    do_filter = True
                cname = rest.strip()
                if not cname:
                    raise TqlError(f"{name}: expected a context name")
                key = context_store._table(cname).properties()["key"]
                df = context_store.apply(df, cname, on=fld or key,
                                         filter=do_filter)
            elif name == "apply":
                # include the pipeline defined in another file (apply.md:
                # search as-given, then with `.tql` appended, then the
                # TENZIR_SPARK_APPLY_PATH directories — the analog of the
                # reference's <config>/apply/ search list)
                fname = args.strip()
                if not fname:
                    raise TqlError("apply: expected a pipeline file")
                path = _find_apply(fname)
                with open(path) as fh:
                    df = run_tql(df, fh.read(), order_by=order)
                # the sub-pipeline may have re-aggregated or re-sorted;
                # a conservative unknown order errors later rather than
                # silently mis-ordering downstream order-sensitive ops
                order = None
            elif name == "chart":
                # `chart <type> [-x|--x-axis f] [-y|--y-axis f]` (chart.md;
                # rendering hints ride the schema metadata)
                rest, x = _flag(args, "x-axis")
                rest, x2 = _flag(rest, "x")
                rest, y = _flag(rest, "y-axis")
                rest, y2 = _flag(rest, "y")
                ctype = rest.strip()
                if not ctype:
                    raise TqlError("chart: expected a chart type")
                cols = df.columns
                df = meta.chart(df, ctype,
                                _one_path(schema, x or x2 or cols[0]),
                                _one_path(schema, y or y2 or cols[min(1, len(cols) - 1)]))
            elif name == "shell":
                if not args.strip():
                    raise TqlError("shell: expected a command")
                df = meta.shell(df, args.strip())
                order = None  # child output order is per-partition
            elif name == "python":
                # python "<code>" [--schema "<ddl>"] | python --file <path>
                # (python.md; vectorized self-batch semantics, python_op.py)
                from tenzir_spark.operators.python_op import python_transform

                a = args.strip()
                schema = None
                sm_ = re.search(r'--schema\s+"((?:[^"\\]|\\.)*)"', a)
                if sm_:
                    schema = sm_.group(1)
                    a = (a[:sm_.start()] + a[sm_.end():]).strip()
                fm_ = re.match(r"--file\s+(\S+)\s*$", a)
                if fm_:
                    with open(fm_.group(1)) as fh:
                        code = fh.read()
                elif a.startswith('"') and a.endswith('"') and len(a) >= 2:
                    code = a[1:-1].replace('\\"', '"').replace("\\n", "\n")
                else:
                    raise TqlError(
                        'python: expected "<code>" or --file <path>')
                df = python_transform(df, code, schema=schema)
            elif name == "version":
                df = meta.version(df.sparkSession)
                order = None
            elif name == "pass":
                df = meta.pass_(df)
            elif name == "discard":
                df = df.filter(F.lit(False))
            elif name == "repeat":
                n = int(args) if args.strip() else 1
                rep = df.sparkSession.range(n).select(F.lit(1).alias("_rep"))
                df = df.crossJoin(rep).drop("_rep")
                # copies share the order column's values — duplicated
                # positions break _global_positions' uniqueness contract,
                # so the declared order leaves scope (like summarize)
                order = None
            elif name == "sample":
                # `sample 0.3 by <key> [seed <n>]` — deterministic
                # hash-threshold sampling (operators/sampling.py): the
                # kept set is a pure function of (seed, key), replayable
                m2 = re.fullmatch(
                    r"([0-9.]+)\s+by\s+(\S+)(?:\s+seed\s+(\d+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "sample: usage `sample <fraction> by <key> "
                        "[seed <n>]`")
                from tenzir_spark.operators.sampling import (
                    deterministic_sample,
                )

                df = deterministic_sample(
                    df, _one_path(schema, m2.group(2)),
                    float(m2.group(1)), int(m2.group(3) or 42))
            elif name == "c4-filter":
                from tenzir_spark.operators.text import c4_filter

                df = c4_filter(
                    df, _one_path(schema, args.strip() or "text"))
            elif name == "gopher-filter":
                # Gopher §A1.1 quality thresholds (operators/text.py
                # gopher_quality_filter); the repetition thresholds are
                # the sibling stage `repetition-filter`
                from tenzir_spark.operators.text import gopher_quality_filter

                df = gopher_quality_filter(
                    df, _one_path(schema, args.strip() or "text"))
            elif name == "repetition-filter":
                from tenzir_spark.operators.text import repetition_filter

                df = repetition_filter(
                    df, _one_path(schema, args.strip() or "text"))
            elif name == "cross-dedup":
                # `cross-dedup <field> against <path>` — drop rows whose
                # content appears in a PRIOR corpus (parquet path);
                # operators/dedup.py cross_dedup, anti-join on md5
                m2 = re.fullmatch(r"(\S+)\s+against\s+(\S+)", args.strip())
                if not m2:
                    raise TqlError(
                        "cross-dedup: usage `cross-dedup <field> "
                        "against <parquet-path>`")
                from tenzir_spark.operators.dedup import cross_dedup

                prior = df.sparkSession.read.parquet(m2.group(2))
                df = cross_dedup(
                    df, prior, _one_path(schema, m2.group(1)))
            elif name == "html-extract":
                # `html-extract [<field>]` — C4/RefinedWeb boilerplate
                # strip (operators/web.py html_extract); rewrites the
                # field in place and adds n_links/n_tags
                from tenzir_spark.operators.web import html_extract

                fld = _one_path(schema, args.strip() or "text")
                df = html_extract(df, fld, out=fld)
            elif name == "url-filter":
                # `url-filter <field> block <d1,d2,...>` — scheme/IP/
                # blocklist URL curation (operators/web.py url_filter;
                # broadcast anti-join). Adds the url_* parse columns.
                m2 = re.fullmatch(r"(\S+)\s+block\s+(\S+)", args.strip())
                if not m2:
                    raise TqlError(
                        "url-filter: usage `url-filter <field> "
                        "block <domain1,domain2,...>`")
                from tenzir_spark.operators.web import url_filter

                df = url_filter(
                    df, _one_path(schema, m2.group(1)),
                    [d for d in m2.group(2).split(",") if d])
            elif name == "quality-filter":
                # `quality-filter [<field>] [min-prob <f>]` — fastText-
                # shape hashed-ngram classifier (operators/selection.py
                # quality_classifier); keeps rows the classifier accepts
                # and drops the scoring columns (filter semantics, like
                # c4-filter / gopher-filter)
                m2 = re.fullmatch(
                    r"(?:(\S+))?(?:\s+min-prob\s+([0-9.]+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "quality-filter: usage `quality-filter "
                        "[<field>] [min-prob <f>]`")
                from tenzir_spark.operators.selection import (
                    quality_classifier,
                )

                fld = _one_path(schema, m2.group(1) or "text")
                scored = quality_classifier(df, fld)
                pred = (F.col("qc_prob") >= float(m2.group(2))
                        if m2.group(2) else F.col("qc_keep"))
                df = scored.filter(pred).select(*df.columns)
            elif name == "window-dedup":
                # `window-dedup <text-field> by <id-field> [w <n>]`
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+w\s+(\d+))?", args.strip())
                if not m2:
                    raise TqlError(
                        "window-dedup: usage `window-dedup <text-field> "
                        "by <id-field> [w <n>]`")
                from tenzir_spark.operators.dedup import window_dedup

                # the operator dispatches on dtype itself (array-typed
                # fields are pre-tokenized sequences; w defaults to 8
                # words / 50 tokens accordingly)
                df = window_dedup(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    w=int(m2.group(3)) if m2.group(3) else None)
            elif name == "dedup-spans":
                # `dedup-spans <array-field> by <id-field> [w <n>]
                # [--drop-empty]` — Lee et al. ExactSubstr span removal
                # (dedup.py dedup_spans): duplicated w-token spans are
                # deleted from all but their globally-first occurrence
                a = args.strip()
                drop_empty = "--drop-empty" in a
                a = a.replace("--drop-empty", "").strip()
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+w\s+(\d+))?", a)
                if not m2:
                    raise TqlError(
                        "dedup-spans: usage `dedup-spans <array-field> "
                        "by <id-field> [w <n>] [--drop-empty]`")
                from tenzir_spark.operators.dedup import dedup_spans

                df = dedup_spans(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    w=int(m2.group(3)) if m2.group(3) else 50,
                    drop_empty=drop_empty)
            elif name == "semdedup":
                # `semdedup <emb-field> by <id-field> [k <n>]
                # [threshold <f>]` — SemDeDup semantic-duplicate flags
                # (operators/similarity.py semdedup); schema changes, so
                # any declared order leaves scope
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+k\s+(\d+))?"
                    r"(?:\s+threshold\s+([0-9.]+))?", args.strip())
                if not m2:
                    raise TqlError(
                        "semdedup: usage `semdedup <emb-field> by "
                        "<id-field> [k <n>] [threshold <f>]`")
                from tenzir_spark.operators.similarity import semdedup

                df = semdedup(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    n_clusters=int(m2.group(3) or 8),
                    threshold=float(m2.group(4) or 0.3))
                order = None
            elif name == "cluster-dedup":
                # `cluster-dedup <text-field> by <id-field>
                #  [threshold <f>]` — minhash near-dup pairs grouped into
                # connected components (operators/clustering.py); adds
                # component/cluster_size/is_canonical flag columns, so
                # `where is_canonical` downstream is keep-one-per-cluster.
                # Schema changes and the attach joins, so declared order
                # leaves scope.
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+threshold\s+([0-9.]+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "cluster-dedup: usage `cluster-dedup <text-field> "
                        "by <id-field> [threshold <f>]`")
                from tenzir_spark.operators.clustering import dup_clusters
                from tenzir_spark.operators.dedup import (
                    minhash_near_dup_pairs,
                )

                idc = _one_path(schema, m2.group(2))
                pairs = minhash_near_dup_pairs(
                    df, idc, _one_path(schema, m2.group(1)),
                    jaccard_threshold=float(m2.group(3) or 0.5))
                df = dup_clusters(df, idc, pairs)
                order = None
            elif name == "near-dedup":
                # `near-dedup <text-field> by <id-field> index <path>
                #  [batch <n>] [threshold <f>]` — incremental near-dup
                # dedup against the persisted MinHash index at <path>
                # (operators/dedup_index.py NearDupIndex): the batch is
                # classified against everything previously accepted,
                # kept rows flow on AND are appended to the index under
                # batch <n> (default 0). Joins reorder rows, so declared
                # stream order leaves scope.
                nd_args = args.strip()
                allow_upd = "--allow-updates" in nd_args
                if allow_upd:
                    nd_args = nd_args.replace(
                        "--allow-updates", "").strip()
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)\s+index\s+(\S+)"
                    r"(?:\s+batch\s+(\d+|auto))?"
                    r"(?:\s+threshold\s+([0-9.]+))?",
                    nd_args)
                if not m2:
                    raise TqlError(
                        "near-dedup: usage `near-dedup <text-field> by "
                        "<id-field> index <path> [batch <n>|auto] "
                        "[threshold <f>] [--allow-updates]`")
                from tenzir_spark.operators.dedup_index import NearDupIndex

                ndi = NearDupIndex(
                    m2.group(3),
                    sig_threshold=float(m2.group(5) or 0.5))
                df = _guard_insert_only(df, "near-dedup", allow_upd)
                df = (
                    ndi.ingest(
                        df, _one_path(schema, m2.group(1)),
                        _one_path(schema, m2.group(2)),
                        _dedup_batch_id(m2.group(4), stream_batch_id,
                                        "near-dedup"))
                    .filter(F.col("kept")).drop("kept"))
                order = None
            elif name == "semantic-dedup":
                # `semantic-dedup <emb-field> by <id-field> index <path>
                #  dim <d> [batch <n>] [threshold <f>]` — incremental
                # SemDeDup against the persisted sign-LSH embedding
                # index at <path> (operators/dedup_index.py
                # CosineDupIndex); kept rows flow on and are appended
                # under batch <n>.
                sd_args = args.strip()
                allow_upd = "--allow-updates" in sd_args
                if allow_upd:
                    sd_args = sd_args.replace(
                        "--allow-updates", "").strip()
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)\s+index\s+(\S+)\s+dim\s+(\d+)"
                    r"(?:\s+batch\s+(\d+|auto))?"
                    r"(?:\s+threshold\s+([0-9.]+))?",
                    sd_args)
                if not m2:
                    raise TqlError(
                        "semantic-dedup: usage `semantic-dedup "
                        "<emb-field> by <id-field> index <path> dim <d> "
                        "[batch <n>|auto] [threshold <f>] "
                        "[--allow-updates]`")
                from tenzir_spark.operators.dedup_index import (
                    CosineDupIndex,
                )

                cdi = CosineDupIndex(
                    m2.group(3), dim=int(m2.group(4)),
                    threshold=float(m2.group(6) or 0.9))
                df = _guard_insert_only(df, "semantic-dedup", allow_upd)
                df = (
                    cdi.ingest(
                        df, _one_path(schema, m2.group(1)),
                        _one_path(schema, m2.group(2)),
                        _dedup_batch_id(m2.group(5), stream_batch_id,
                                        "semantic-dedup"))
                    .filter(F.col("kept")).drop("kept"))
                order = None
            elif name == "lm-filter":
                # `lm-filter <text-field> by <id-field> ref <f>=<v>
                #  max-ppl <f>` — CCNet-style stupid-backoff bigram LM
                # perplexity filter (operators/lm.py) trained on the rows
                # where field <f> equals <v>; keeps the input schema but
                # joins, so declared order leaves scope
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)\s+ref\s+(\S+?)=(\S+)"
                    r"\s+max-ppl\s+([0-9.]+)", args.strip())
                if not m2:
                    raise TqlError(
                        "lm-filter: usage `lm-filter <text-field> by "
                        "<id-field> ref <field>=<value> max-ppl <f>`")
                from tenzir_spark.operators.lm import lm_filter

                # the ref value is a literal: strip quotes / parse
                # numbers and bools so `ref source="src0"` and
                # `ref shard=3` both select the intended subset
                val: object = m2.group(4)
                if (len(val) >= 2 and val[0] == val[-1]
                        and val[0] in "\"'"):
                    val = val[1:-1]
                elif val in ("true", "false"):
                    val = val == "true"
                else:
                    try:
                        val = int(val)
                    except ValueError:
                        try:
                            val = float(val)
                        except ValueError:
                            pass
                df = lm_filter(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    _field_col(schema, _one_path(schema, m2.group(3)))
                    == F.lit(val),
                    max_ppl=float(m2.group(5)))
                order = None
            elif name == "asof-join":
                # `asof-join <parquet-path> on <key-field> ts <ts-field>
                #  [direction forward] [tolerance <duration>]` — temporal
                # enrich from a parquet right side (operators/asof.py);
                # adds the matched right columns, so order leaves scope
                m2 = re.fullmatch(
                    r"(\S+)\s+on\s+(\S+)\s+ts\s+(\S+)"
                    r"(?:\s+direction\s+(backward|forward))?"
                    r"(?:\s+tolerance\s+(\S+))?", args.strip())
                if not m2:
                    raise TqlError(
                        "asof-join: usage `asof-join <parquet-path> on "
                        "<key-field> ts <ts-field> [direction forward] "
                        "[tolerance <duration>]`")
                from tenzir_spark.operators.asof import asof_join

                right = df.sparkSession.read.parquet(m2.group(1))
                df = asof_join(
                    df, right, on=_temporal_path(schema, m2.group(2), name),
                    left_ts=_temporal_path(schema, m2.group(3), name),
                    direction=m2.group(4) or "backward",
                    tolerance_s=parse_duration(m2.group(5)).total_seconds()
                    if m2.group(5) else None)
                order = None
            elif name == "sessionize":
                # `sessionize <ts-field> by <key-field> gap <duration>
                #  [tiebreak <field>]` — inactivity-gap session numbers
                # (operators/asof.py sessionize); appends session_no,
                # keeps row order undefined (window re-sorts per key)
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)\s+gap\s+(\S+)"
                    r"(?:\s+tiebreak\s+(\S+))?", args.strip())
                if not m2:
                    raise TqlError(
                        "sessionize: usage `sessionize <ts-field> by "
                        "<key-field> gap <duration> [tiebreak <field>]`")
                from tenzir_spark.operators.asof import sessionize

                df = sessionize(
                    df, on=_temporal_path(schema, m2.group(2), name),
                    ts=_temporal_path(schema, m2.group(1), name),
                    gap_s=parse_duration(m2.group(3)).total_seconds(),
                    order=[_temporal_path(schema, m2.group(4), name)]
                    if m2.group(4) else None)
                order = None
            elif name == "fill-forward":
                # `fill-forward <field>[,<field>…] by <key-field> ts
                #  <ts-field> [tiebreak <field>]` — LOCF gap-fill
                # (operators/asof.py); tiebreak makes fills at duplicate
                # timestamps deterministic
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)\s+ts\s+(\S+)"
                    r"(?:\s+tiebreak\s+(\S+))?", args.strip())
                if not m2:
                    raise TqlError(
                        "fill-forward: usage `fill-forward <field>[,"
                        "<field>…] by <key-field> ts <ts-field> "
                        "[tiebreak <field>]`")
                from tenzir_spark.operators.asof import fill_forward

                df = fill_forward(
                    df, on=_temporal_path(schema, m2.group(2), name),
                    ts=_temporal_path(schema, m2.group(3), name),
                    cols=[_temporal_path(schema, c, name)
                          for c in m2.group(1).split(",") if c],
                    order=[_temporal_path(schema, m2.group(4), name)]
                    if m2.group(4) else None)
                order = None
            elif name == "rolling":
                # `rolling <fn>[,fn…] <value-field> by <key-field> ts
                #  <ts-field> window <duration>` — trailing time-window
                # aggregates (operators/asof.py rolling_agg)
                m2 = re.fullmatch(
                    r"([a-z,]+)\s+(\S+)\s+by\s+(\S+)\s+ts\s+(\S+)"
                    r"\s+window\s+(\S+)", args.strip())
                if not m2:
                    raise TqlError(
                        "rolling: usage `rolling <fn>[,fn…] <value-field>"
                        " by <key-field> ts <ts-field> window <duration>`")
                from tenzir_spark.operators.asof import rolling_agg

                try:
                    df = rolling_agg(
                        df, on=_temporal_path(schema, m2.group(3), name),
                        ts=_temporal_path(schema, m2.group(4), name),
                        col=_temporal_path(schema, m2.group(2), name),
                        window_s=parse_duration(m2.group(5)).total_seconds(),
                        fns=tuple(f for f in m2.group(1).split(",") if f))
                except ValueError as exc:
                    raise TqlError(f"rolling: {exc}")
                order = None
            elif name == "pack":
                # `pack <count-field> by <id-field> [block <n>]` — span
                # assignment (id, block_id, offsets); schema changes, so
                # any declared order leaves scope
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+block\s+(\d+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "pack: usage `pack <count-field> by <id-field> "
                        "[block <n>]`")
                from tenzir_spark.operators.packing import pack_sequences

                df = pack_sequences(
                    df, _one_path(schema, m2.group(2)),
                    _one_path(schema, m2.group(1)),
                    block=int(m2.group(3) or 2048))
                order = None
            elif name == "fim":
                # `fim <tokens-field> by <id-field> [rate <pct>]
                #  [mode psm|spm]` — fill-in-the-middle reorder
                # (packing.fim_transform); adds fim_applied/fim_tokens
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+rate\s+(\d+))?"
                    r"(?:\s+mode\s+(psm|spm))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "fim: usage `fim <tokens-field> by <id-field> "
                        "[rate <pct>] [mode psm|spm]`")
                from tenzir_spark.operators.packing import fim_transform

                df = fim_transform(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    rate_pct=int(m2.group(3) or 50),
                    mode=m2.group(4) or "psm")
            elif name == "chunk":
                # `chunk <tokens-field> by <id-field> [max <n>]
                #  [overlap <n>]` — long-document striding
                # (packing.chunk_documents); schema changes, order leaves
                # scope
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+max\s+(\d+))?"
                    r"(?:\s+overlap\s+(\d+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "chunk: usage `chunk <tokens-field> by <id-field> "
                        "[max <n>] [overlap <n>]`")
                from tenzir_spark.operators.packing import chunk_documents

                df = chunk_documents(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    max_len=int(m2.group(3) or 512),
                    overlap=int(m2.group(4) or 0))
                order = None
            elif name == "line-dedup":
                # `line-dedup <text-field> by <id-field> [min <n>]
                #  [mode keep_first|drop_all]` — corpus-level CCNet/
                # RefinedWeb line dedup (operators/dedup.py line_dedup)
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+min\s+(\d+))?"
                    r"(?:\s+mode\s+(keep_first|drop_all))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "line-dedup: usage `line-dedup <text-field> by "
                        "<id-field> [min <n>] [mode keep_first|drop_all]`")
                from tenzir_spark.operators.dedup import line_dedup

                df = line_dedup(
                    df, _one_path(schema, m2.group(1)),
                    _one_path(schema, m2.group(2)),
                    min_count=int(m2.group(3) or 2),
                    mode=m2.group(4) or "keep_first")
            elif name == "redact-pii":
                # `redact-pii [<text-field>] [kinds email,ipv4,...]`
                m2 = re.fullmatch(
                    r"(?:(\S+))?(?:\s*kinds\s+([a-z0-9,]+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "redact-pii: usage `redact-pii [<text-field>] "
                        "[kinds email,ssn,card,phone,ipv4]`")
                from tenzir_spark.operators.text import PII_RULES, pii_redact

                kinds = (m2.group(2).split(",") if m2.group(2) else None)
                known = {k for k, _, _ in PII_RULES}
                if kinds and not set(kinds) <= known:
                    raise TqlError(
                        f"redact-pii: unknown kinds "
                        f"{sorted(set(kinds) - known)} (have {sorted(known)})")
                df = pii_redact(
                    df, _one_path(schema, m2.group(1) or "text"),
                    kinds=kinds)
            elif name == "dsir-sample":
                # `dsir-sample <fraction> <text-field> by <id-field>
                #  [d <n>] [seed <n>] target <expr...>` — DSIR importance
                # resampling toward the target subset (selection.py)
                m2 = re.fullmatch(
                    r"([0-9.]+)\s+(\S+)\s+by\s+(\S+)(?:\s+d\s+(\d+))?"
                    r"(?:\s+seed\s+(\d+))?\s+target\s+(.+)",
                    args.strip(), re.DOTALL)
                if not m2:
                    raise TqlError(
                        "dsir-sample: usage `dsir-sample <fraction> "
                        "<text-field> by <id-field> [d <n>] [seed <n>] "
                        "target <expr>`")
                from tenzir_spark.operators.selection import dsir_resample

                df = dsir_resample(
                    df, _one_path(schema, m2.group(2)),
                    _one_path(schema, m2.group(3)),
                    compile_expr(m2.group(6), df.schema),
                    fraction=float(m2.group(1)),
                    d=int(m2.group(4) or 8192),
                    seed=int(m2.group(5) or 42))
                order = None
            elif name == "bpe":
                # `bpe <text-field> by <id-field> [merges <n>]
                #  [sample <mod>]` — train merges on the (sampled) input,
                # add bpe_tokens (operators/bpe.py; two-pass by nature:
                # tokenizer training IS a separate pass in any pipeline)
                m2 = re.fullmatch(
                    r"(\S+)\s+by\s+(\S+)(?:\s+merges\s+(\d+))?"
                    r"(?:\s+sample\s+(\d+))?",
                    args.strip())
                if not m2:
                    raise TqlError(
                        "bpe: usage `bpe <text-field> by <id-field> "
                        "[merges <n>] [sample <mod>]`")
                from tenzir_spark.operators.bpe import bpe_encode, bpe_train

                tcol = _one_path(schema, m2.group(1))
                merges = bpe_train(
                    df, tcol, num_merges=int(m2.group(3) or 256),
                    sample_mod=int(m2.group(4) or 1),
                    id_col=_one_path(schema, m2.group(2)))
                df = bpe_encode(df, tcol, merges)
                order = None  # mapInPandas re-emits; declared order leaves
            elif name in ("every", "cron"):
                # source modifiers, not stream stages (operator-modifiers.md)
                raise TqlError(
                    f"{name} is a source modifier — put it before the "
                    "source stage and run via run_tql_every()")
            else:
                raise TqlError(f"unknown operator {name!r}")
        except TqlError:
            raise
        except (ValueError, TypeError, KeyError) as e:
            # operator-library / parser errors surface as pipeline
            # compile errors with the failing operator named
            raise TqlError(f"{name}: {e}") from e
    return df


def _find_apply(fname: str) -> str:
    import os

    candidates = [fname]
    if "." not in os.path.basename(fname):
        candidates.append(fname + ".tql")
    for d in os.environ.get("TENZIR_SPARK_APPLY_PATH", "").split(os.pathsep):
        if d:
            candidates += [os.path.join(d, c) for c in list(candidates)]
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise TqlError(f"apply: pipeline file {fname!r} not found "
                   f"(tried {candidates})")


def _one_path(schema: T.StructType, name: str) -> str:
    fields = _fields_for_suffix(schema, name)
    if not fields:
        raise TqlError(f"unknown field {name!r}")
    if len(fields) > 1:
        raise TqlError(
            f"ambiguous field {name!r} matches {[p for p, _t in fields]}")
    return fields[0][0]


def _temporal_path(schema: T.StructType, name: str, stage: str) -> str:
    """The temporal stages (asof-join/sessionize/fill-forward/rolling)
    key their underlying operators by TOP-LEVEL column name — a dotted
    suffix resolution would silently mis-key the window (or withColumn
    a literal 'a.b'). Resolve like _one_path but refuse nested paths
    with a clear error."""
    p = _one_path(schema, name)
    if "." in p:
        raise TqlError(
            f"{stage}: nested field {p!r} is not supported — materialize "
            f"it to a top-level column first (`set {name.rsplit('.', 1)[-1]}"
            f"={p}`)")
    return p


# ---------------------------------------------------------------------------
# source/sink stages: `from <path> [read <fmt>] | … | to <path> [write <fmt>]`
# (from.md / to.md: connector ⊕ format, format inferred from the file
# extension when omitted; compression suffixes are transparent — Spark's
# text-based readers decompress .gz/.bz2 natively)
# ---------------------------------------------------------------------------

_EXT_FORMAT = {
    "parquet": "parquet", "json": "json", "ndjson": "json", "jsonl": "json",
    "csv": "csv", "tsv": "tsv", "ssv": "ssv", "txt": "lines",
    "log": "lines", "feather": "feather", "arrow": "feather",
    "pcap": "pcap", "bitz": "bitz", "msgpack": "msgpack", "fwd": "fluentbit",
}


def _infer_format(path: str, explicit: str | None) -> str:
    if explicit:
        return explicit
    base = path.rstrip("/").rsplit("/", 1)[-1]
    parts = base.split(".")
    # skip compression suffixes for inference (from.md's `.json.gz` rule)
    while len(parts) > 1 and parts[-1] in ("gz", "bz2", "zst", "xz"):
        parts.pop()
    fmt = _EXT_FORMAT.get(parts[-1] if len(parts) > 1 else "")
    if fmt is None:
        return "json"  # the reference's default format for most connectors
    return fmt


def _read_source(spark, path: str, fmt: str | None) -> DataFrame:
    from tenzir_spark.sources import formats as fmts

    fmt = _infer_format(path, fmt)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt in ("csv", "tsv", "ssv", "xsv"):
        sep = {"csv": ",", "tsv": "\t", "ssv": " "}.get(fmt, ",")
        return (spark.read.option("header", True).option("sep", sep)
                .option("inferSchema", True).csv(path))
    if fmt == "lines":
        return fmts.read_lines(spark, path)
    if fmt in ("zeek-tsv", "zeek"):
        return fmts.read_zeek_tsv(spark, path)
    if fmt == "gelf":
        return fmts.read_gelf(spark, path)
    if fmt == "suricata":
        return fmts.read_suricata(spark, path)
    if fmt == "zeek-json":
        return fmts.read_zeek_json(spark, path)
    if fmt == "feather":
        from tenzir_spark.sources.feather import read_feather

        return read_feather(spark, path)
    if fmt == "pcap":
        from tenzir_spark.sources.pcap import read_pcap

        return read_pcap(spark, path)
    if fmt == "bitz":
        from tenzir_spark.sources.bitz import read_bitz

        return read_bitz(spark, path)
    if fmt == "msgpack":
        from tenzir_spark.sources.msgpack import read_msgpack

        return read_msgpack(spark, path)
    if fmt in ("fluentbit", "fluent-bit", "forward"):
        from tenzir_spark.sources.fluentbit import read_forward

        return read_forward(spark, path)
    raise TqlError(f"unknown read format {fmt!r}")


def _write_sink(df: DataFrame, path: str, fmt: str | None) -> None:
    if path.startswith(("http://", "https://")):
        from tenzir_spark.sources.http import http_save

        http_save(df, path, fmt=fmt or "json")
        return
    if path in ("-", "stdout"):
        # `to stdout` / `to -` (stdout.md): ndjson to the driver's
        # stdout, streamed partition-by-partition (no full collect)
        import sys

        for line in df.toJSON().toLocalIterator():
            sys.stdout.write(line + "\n")
        return
    fmt = _infer_format(path, fmt)
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif fmt == "json":
        df.write.mode("overwrite").json(path)
    elif fmt in ("csv", "tsv", "ssv"):
        sep = {"csv": ",", "tsv": "\t", "ssv": " "}[fmt]
        df.write.mode("overwrite").option("header", True).option("sep", sep).csv(path)
    elif fmt == "feather":
        from tenzir_spark.sources.feather import write_feather

        write_feather(df, path)
    elif fmt == "bitz":
        from tenzir_spark.sources.bitz import write_bitz

        write_bitz(df, path)
    elif fmt == "msgpack":
        from tenzir_spark.sources.msgpack import write_msgpack

        write_msgpack(df, path)
    elif fmt in ("fluentbit", "fluent-bit", "forward"):
        from tenzir_spark.sources.fluentbit import write_forward

        write_forward(df, path)
    else:
        raise TqlError(f"unknown write format {fmt!r}")


_FROM_RE = re.compile(r"from\s+(\S+)(?:\s+read\s+(\S+))?\s*$")
_TO_RE = re.compile(
    r"(?:to\s+(\S+)(?:\s+write\s+(\S+))?|write\s+(\S+)\s+to\s+(\S+))\s*$")
_EXPORT_RE = re.compile(r"export\s+(\S+)(\s+.+)?\s*$")


def _parse_export_opts(tail: str | None) -> tuple[int | None, int | None]:
    """Tokenize ``export`` options so flag ORDER does not matter —
    ``--to 5 --changes-since 3`` and the reverse both parse, and an
    unknown/malformed flag gets a targeted error instead of falling
    through to the generic 'pipeline must start with…' message."""
    since = to = None
    toks = (tail or "").split()
    i = 0
    while i < len(toks):
        t = toks[i]
        if t in ("--changes-since", "--to"):
            if i + 1 >= len(toks) or not toks[i + 1].isdigit():
                raise TqlError(
                    f"export: {t} expects an integer snapshot version")
            if t == "--changes-since":
                since = int(toks[i + 1])
            else:
                to = int(toks[i + 1])
            i += 2
        else:
            raise TqlError(f"export: unknown option {t!r} (supported: "
                           "--changes-since <v>, --to <v>)")
    return since, to
_IMPORT_RE = re.compile(r"import\s+(\S+)\s*$")
_SUBSCRIBE_RE = re.compile(r"subscribe\s+(\S+)\s*$")
_METRICS_RE = re.compile(r"metrics\s+(\S+)\s*$")
# `show <aspect> [<table_root>]` — introspection as a pipeline SOURCE
# (show.md: "show <aspect> | where …"); registry aspects
# (operators/formats/connectors) need no table, lake aspects do
_SHOW_RE = re.compile(r"show\s+(\S+)(?:\s+(\S+))?\s*$")
# host-inventory sources (files.md/processes.md/sockets.md/nics.md):
# `files <root>` walks a directory; the other three take no argument
_HOST_RE = re.compile(r"(files|processes|sockets|nics)(?:\s+(\S+))?\s*$")
_LOOKUP_RE = re.compile(r"lookup\s+(\S+)\s+(\S+)(\s+.+)?\s*$")


def _lake_table(root: str):
    import os

    from tenzir_spark.lake.table import LakeTable

    root = root.rstrip("/")
    return LakeTable(os.path.dirname(root), os.path.basename(root))


def run_tql_source(spark, text: str, order_by: str | None = None,
                   source_df: DataFrame | None = None,
                   context_store=None) -> DataFrame:
    """End-to-end textual pipeline with source and optional sink stages:

        from <path> [read <format>] | <operators…> [| to <path> [write <fmt>]]

    The `from` stage resolves connector+format (extension-inferred when
    `read` is omitted, json default — from.md); a trailing `to`/`write …
    to` stage EXECUTES the write (the sink side-effect) and the written
    DataFrame is returned either way for inspection/chaining.
    ``source_df`` supplies the input DataFrame instead of a `from`/
    `export` head — the programmatic analogue of piping events in.
    ``context_store`` enables the `lookup` source head and mid-pipeline
    enrich/lookup stages (threaded to run_tql)."""
    stages = split_pipeline(text)
    head = stages[0].strip()
    m = _FROM_RE.fullmatch(head)
    em = _EXPORT_RE.fullmatch(head)
    sm = _SUBSCRIBE_RE.fullmatch(head)
    km = _METRICS_RE.fullmatch(head)
    wm = _SHOW_RE.fullmatch(head)
    hm = _HOST_RE.fullmatch(head)
    lum = _LOOKUP_RE.fullmatch(head)
    if lum and lum.group(2).startswith("--"):
        # `lookup <ctx> --field <f>` is the MID-pipeline enrich form
        # (run_tql stage), not the source head `lookup <root> <ctx> …`
        lum = None
    if source_df is not None and not (m or em or sm or km or wm or hm or lum):
        df = source_df
        stages = ["__source__", *stages]  # operator stages start at [1]
        m = em = sm = km = wm = hm = lum = None
    elif lum:
        # `lookup <table_root> <ctx> [--field <f>] [--retro | --snapshot]
        #  [--since-version N] [--context-version N] [--data-version N]`
        # — the reference's lookup SOURCE operator (lookup.md:23-84):
        # context state drives a scan of historical data. --retro
        # (default) scans with CURRENT context state, optionally only for
        # entries added after --since-version; --snapshot pins context
        # AND data versions at execution time (or the explicit versions).
        if context_store is None:
            raise TqlError("lookup needs a ContextStore: pass "
                           "context_store= to run_tql_source (contexts "
                           "live in the lake warehouse)")
        root, cname, opts = lum.group(1), lum.group(2), lum.group(3) or ""
        toks = []
        for t in opts.split():
            # accept `--opt=value` exactly like the mid-pipeline stages'
            # _flag grammar (`(?:=|\s+)`)
            if t.startswith("--") and "=" in t:
                k, _, v = t.partition("=")
                toks.extend([k, v])
            else:
                toks.append(t)
        mode, vals = "retro", {}
        i = 0
        while i < len(toks):
            t = toks[i]
            if t in ("--retro", "--snapshot"):
                mode = t[2:]
                i += 1
            elif t in ("--field", "--since-version", "--context-version",
                       "--data-version"):
                if i + 1 >= len(toks):
                    raise TqlError(f"lookup: {t} needs a value")
                vals[t] = toks[i + 1]
                i += 2
            else:
                raise TqlError(f"lookup: unknown option {t!r}")

        def _ver(name):
            v = vals.get(name)
            if v is None:
                return None
            try:
                return int(v)
            except ValueError:
                raise TqlError(f"lookup: {name} expects an integer version")

        t_data = _lake_table(root)
        key = context_store._table(cname).properties()["key"]
        on = vals.get("--field", key)
        if mode == "snapshot":
            if "--since-version" in vals:
                raise TqlError("lookup: --since-version is a --retro "
                               "option (snapshot pins versions instead)")
            df = context_store.lookup_snapshot(
                t_data, cname, on=on,
                context_version=_ver("--context-version"),
                data_version=_ver("--data-version"))
        else:
            if "--context-version" in vals or "--data-version" in vals:
                raise TqlError("lookup: --context-version/--data-version "
                               "are --snapshot options")
            df = context_store.lookup_retro(
                t_data, cname, on=on,
                since_version=_ver("--since-version"))
    elif wm:
        # `show <aspect> [<table_root>]` — introspection rows as events
        from tenzir_spark.operators import meta as _meta

        aspect, root = wm.group(1), wm.group(2)
        if aspect in ("operators", "formats", "connectors"):
            df = _meta.show_registry(spark, aspect)
        elif aspect == "version":
            df = _meta.show(spark, "version")
        else:
            if not root:
                raise TqlError(
                    f"show {aspect}: needs a lake table root "
                    f"(`show {aspect} <warehouse>/<table>`)")
            try:
                df = _meta.show(spark, aspect, _lake_table(root))
            except ValueError as exc:  # unknown aspect → pipeline error
                raise TqlError(f"show: {exc}")
    elif hm:
        from tenzir_spark.sources import host as _host

        kind, arg = hm.group(1), hm.group(2)
        if kind == "files":
            if not arg:
                raise TqlError("files: needs a root directory")
            df = _host.files(spark, arg)
        elif arg:
            raise TqlError(f"{kind}: takes no argument")
        else:
            df = getattr(_host, kind)(spark)
    elif km:
        # `metrics <warehouse>` — the engine's own ingest telemetry as a
        # pipeline source (reference: operators/metrics.cpp feeds node
        # metrics into a pipeline); one row per (batch, source partition)
        import os as _os

        from tenzir_spark.cdc.runner import METRICS_SCHEMA

        df = spark.read.schema(METRICS_SCHEMA).parquet(
            _os.path.join(km.group(1).rstrip("/"), "ingest_metrics"))
    elif sm:
        # `subscribe <warehouse>/<topic>` — batch read of everything the
        # topic holds so far (publish.md's counterpart; operators/topics)
        import os as _os

        from tenzir_spark.operators.topics import subscribe as _sub

        root = sm.group(1).rstrip("/")
        if "/" not in root:
            raise TqlError("subscribe: expected <warehouse>/<topic>")
        df = _sub(spark, _os.path.basename(root), _os.path.dirname(root))
    elif m:
        path = m.group(1)
        if path.startswith(("http://", "https://", "ftp://")):
            # ftp rides the same spool-then-distributed-parse path as
            # http (ftp.md; urllib handles the scheme natively)
            from tenzir_spark.sources.http import http_load

            df = http_load(spark, path, fmt=m.group(2))
        elif path in ("-", "stdin"):
            # `from stdin [read <fmt>]` (reference stdin connector): spool
            # the stream and parse with the shared format inventory
            import sys
            import tempfile

            raw = (sys.stdin.buffer.read()
                   if hasattr(sys.stdin, "buffer") else
                   sys.stdin.read().encode())
            fd, tmp = tempfile.mkstemp(prefix="tenzir_spark_stdin_")
            import os as _os

            with _os.fdopen(fd, "wb") as fh:
                fh.write(raw)
            df = _read_source(spark, tmp, m.group(2) or "json")
        else:
            df = _read_source(spark, path, m.group(2))
    elif em:
        # `export <table_root>` — read the lake table's current state
        # (export.md: events from the node's storage; internal bucket/
        # commit columns are implementation detail, dropped).
        # `--changes-since <v> [--to <v>]`: incremental changelog read —
        # NET change per key between two snapshots, shaped as a change
        # batch (payload + op), LakeTable.read_changes.
        from tenzir_spark.lake.table import BUCKET_COL, COMMIT_COL

        since, to_v = _parse_export_opts(em.group(2))
        if since is not None:
            df = _lake_table(em.group(1)).read_changes(spark, since, to_v)
        elif to_v is not None:
            raise TqlError(
                "export: --to requires --changes-since (a full read has "
                "no window; use --changes-since 0 --to <v> for a bounded "
                "changelog)")
        else:
            df = _lake_table(em.group(1)).read(spark).drop(BUCKET_COL, COMMIT_COL)
    else:
        raise TqlError(
            "pipeline must start with `from <path> [read <format>]`, "
            "`export <table_root>`, `subscribe`, `metrics`, `show "
            "<aspect>`, `lookup <table_root> <ctx>`, or a host source "
            "(files/processes/sockets/nics) "
            f"(got {stages[0]!r}); use run_tql() to apply operator text "
            "to an existing DataFrame")
    rest = stages[1:]
    sink = None
    if rest:
        tail_stage = rest[-1].strip()
        tm = _TO_RE.fullmatch(tail_stage)
        im = _IMPORT_RE.fullmatch(tail_stage)
        if tm:
            sink = ("file", tm.group(1) or tm.group(4), tm.group(2) or tm.group(3))
            rest = rest[:-1]
        elif im:
            sink = ("lake", im.group(1), None)
            rest = rest[:-1]
    if rest:
        df = run_tql(df, " | ".join(rest), order_by=order_by,
                     context_store=context_store)
    if sink and sink[0] == "file":
        _write_sink(df, sink[1], sink[2])
    elif sink and sink[0] == "lake":
        # `import <table_root>` — append-commit into the lake table on its
        # declared primary key (import.md: store events durably; the CDC
        # MERGE path is IngestRunner for keyed change streams)
        t = _lake_table(sink[1])
        t.append(df, t.snapshot().get("key", "doc_id"))
    return df


# ---------------------------------------------------------------------------
# streaming pipelines as TEXT (the reference's implicit closed pipelines)
# ---------------------------------------------------------------------------

_ENVELOPE_COLS = ("lsn", "part_id", "op")


def run_tql_stream(spark, text: str, *, connector=None,
                   max_batches: int | None = None,
                   runner_kwargs: dict | None = None,
                   checkpoint_dir: str | None = None,
                   processing_time: str | None = None,
                   max_files_per_trigger: int | None = None,
                   context_store=None):
    """Streaming TQL text front-end — the reference's implicit CLOSED
    streaming pipelines (`tenzir 'from kafka … | where … | import'`,
    libtenzir/src/exec_pipeline.cpp:118-184 runs such a pipeline until
    the source is exhausted or the node stops): the head names a
    CONTINUOUS source, the tail must be `import <table_root>`, and the
    operator stages in between are compiled by run_tql per micro-batch.

    Head schemes:

    - ``from kafka://<bootstrap>/<topic>`` — real broker via
      KafkaConnector (kafka-python client; broker-gated in this sandbox)
    - ``from stream://<changes_dir>`` — Structured Streaming file tail
      (readStream → foreachBatch); RETURNS the started StreamingQuery
      (continuous with ``processing_time``, one-shot drain otherwise)
    - ``from broker://…`` or any head with ``connector=`` injected — a
      seek/poll/ack loop over the given ChangeConnector; returns a stats
      dict with the runner under ``"runner"``

    Exactly-once is run_connector's discipline: seek from the TABLE's
    committed per-partition watermarks, apply the idempotent MERGE, ack
    only after the snapshot commit. A forced restart — new process,
    fresh connector object — re-seeks from the durable watermarks;
    redelivered events are absorbed by the watermark filter, so the
    final table state is independent of where the kill landed.

    Operator stages must preserve the envelope columns (lsn, part_id,
    op) — they carry the exactly-once bookkeeping; a stage that drops
    them raises TqlError before anything is applied."""
    from tenzir_spark.cdc.runner import IngestRunner
    from tenzir_spark.sources.connector import (
        FileLogConnector,
        KafkaConnector,
        run_connector,
    )

    stages = split_pipeline(text)
    head = stages[0].strip()
    m = _FROM_RE.fullmatch(head)
    if not m:
        raise TqlError(
            "streaming pipeline must start with `from <stream-url>` "
            f"(got {stages[0]!r})")
    url = m.group(1)
    tail_stage = stages[-1].strip() if len(stages) > 1 else ""
    im = _IMPORT_RE.fullmatch(tail_stage)
    if not im:
        raise TqlError(
            "streaming pipeline must end with `import <table_root>` — a "
            "continuous source needs a durable, idempotent sink (got "
            f"{tail_stage!r})")
    middle = " | ".join(s.strip() for s in stages[1:-1])
    root = im.group(1).rstrip("/")
    import os as _os

    def _transform(df: DataFrame, batch_id: int = 0) -> DataFrame:
        out = run_tql(df, middle, context_store=context_store,
                      stream_batch_id=int(batch_id)) \
            if middle else df
        missing = [c for c in _ENVELOPE_COLS if c not in out.columns]
        if missing:
            raise TqlError(
                f"streaming stages dropped envelope column(s) {missing}; "
                "lsn/part_id/op carry the exactly-once bookkeeping — "
                "select/drop payload fields only")
        return out

    if url.startswith("stream://"):
        # Structured Streaming file tail: checkpoint ⊕ idempotent sink
        from tenzir_spark.streaming.ingest import stream_ingest

        return stream_ingest(
            spark, url[len("stream://"):],
            _os.path.dirname(root),
            runner_kwargs={"table_name": _os.path.basename(root),
                           **(runner_kwargs or {})},
            checkpoint_dir=checkpoint_dir,
            processing_time=processing_time,
            max_files_per_trigger=max_files_per_trigger,
            transform=_transform if middle else None,
        )
    if connector is None:
        if url.startswith("kafka://"):
            bootstrap, _, topic = url[len("kafka://"):].partition("/")
            if not topic:
                raise TqlError(
                    "from kafka://<bootstrap>/<topic>: topic missing")
            connector = KafkaConnector(spark, bootstrap, topic)
        elif url.startswith("log://"):
            # an on-disk batch-directory change log tailed through the
            # connector protocol (footer-pruned seek) instead of
            # readStream — same loop as a broker
            connector = FileLogConnector(spark, url[len("log://"):])
        else:
            raise TqlError(
                f"no connector for {url!r}: pass connector= for "
                "broker:// (tests) or use kafka:// / stream:// / log://")
    runner = IngestRunner(spark, _os.path.dirname(root),
                          table_name=_os.path.basename(root),
                          **(runner_kwargs or {}))
    stats = run_connector(runner, connector, max_batches=max_batches,
                          transform=_transform)
    stats["runner"] = runner
    return stats


# ---------------------------------------------------------------------------
# `every <interval>` / `cron "<expr>"` scheduled pipelines
# ---------------------------------------------------------------------------

_DURATION_RE = re.compile(
    r"(\d+(?:\.\d+)?)\s*(ms|us|s|sec|m|min|h|d)(?![A-Za-z])")

_DUR_SECONDS = {"us": 1e-6, "ms": 1e-3, "s": 1, "sec": 1, "m": 60,
                "min": 60, "h": 3600, "d": 86400}


def parse_duration(text: str):
    """``10s`` / ``1.5min`` / ``2h30m`` → timedelta (the reference's
    duration literal grammar, e.g. every_cron.cpp's `every 10s`)."""
    from datetime import timedelta

    total, pos = 0.0, 0
    t = text.strip()
    while pos < len(t):
        m2 = _DURATION_RE.match(t, pos)
        if not m2:
            raise TqlError(f"bad duration {text!r}")
        total += float(m2.group(1)) * _DUR_SECONDS[m2.group(2)]
        pos = m2.end()
        while pos < len(t) and t[pos] == " ":
            pos += 1
    if total <= 0:
        raise TqlError(f"duration must be positive: {text!r}")
    return timedelta(seconds=total)


_EVERY_RE = re.compile(r'(every)\s+(\S+)\s+(.*)$|(cron)\s+"([^"]+)"\s+(.*)$',
                       re.DOTALL)


def run_tql_every(spark, text: str, *, n_runs: int, order_by=None,
                  source_df=None, context_store=None,
                  now_fn=None, sleep_fn=None) -> list:
    """Scheduled pipeline execution — the reference's `every`/`cron`
    source modifiers (every_cron.cpp:265-360; operator-modifiers.md):

        every 10s from http://feed read json | …
        cron "0 */5 * * * *" from s3://bucket/file | …

    Runs the remaining pipeline once per fire (every: immediate first
    run; cron: waits for the first match, matching the reference), up to
    ``n_runs`` times; returns the per-run result DataFrames.
    ``now_fn``/``sleep_fn`` inject a fake clock for tests — the trigger
    loop is streaming/schedule.run_scheduled."""
    from datetime import datetime as _dt

    from tenzir_spark.streaming.schedule import (
        CronScheduler,
        EveryScheduler,
        run_scheduled,
    )

    m2 = _EVERY_RE.match(text.strip())
    if not m2:
        raise TqlError(
            'expected `every <interval> <pipeline>` or `cron "<expr>" <pipeline>`')
    if m2.group(1) == "every":
        sched = EveryScheduler(parse_duration(m2.group(2)))
        rest = m2.group(3)
    else:
        sched = CronScheduler.parse(m2.group(5))
        rest = m2.group(6)

    results = []

    def fire():
        results.append(run_tql_source(
            spark, rest, order_by=order_by, source_df=source_df,
            context_store=context_store))

    run_scheduled(fire, sched, n_runs=n_runs,
                  now_fn=now_fn or _dt.now,
                  sleep_fn=sleep_fn)
    return results
