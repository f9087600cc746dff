"""TQL2 front-end (subset) — the reference's second-generation pipeline
language, experimental in this reference version
(libtenzir/src/tql2/parser.cpp:85-245, tokens.cpp:17-120).

Grammar implemented (the documented, stable core):

    pipeline   = statement (NEWLINE | "|" statement)*
    statement  = "let" "$"ident "=" expr          (constant binding)
               | "if" expr "{" pipeline "}"
                 ["else" ("{" pipeline "}" | if-statement)]   (else-if chains)
               | selector "=" expr                (assignment → set column)
               | ident args                       (operator invocation)
    args       = expr ("," expr)*
    expr       = or-chain of: and/or/not, == != < <= > >=, in, + - * /,
                 unary -, literals (string/number/bool/null), selectors
                 (dotted paths), "$"bindings, method calls
                 (.starts_with/.ends_with/.contains/.lower/.upper/
                  .length/.trim/.abs/.round/.split/.replace/…, list
                  methods .sort/.reverse/.distinct/.flatten/.first/
                  .last/.min/.max/.sum/.join), function calls, [lists]

Operators: where, select, drop, head, tail, sort (`-field` descending),
summarize (bare selector args = group keys, assignments = aggregates —
`summarize src, n=count(), total=sum(x)`), set (assignment statement),
rename (new=old), from "<path>" / to "<path>" in run_tql2_source; plus
the order-sensitive family threaded through the same declared-order
accounting the TQL1 front-end uses (`run_tql2(df, text, order_by=...)`):
slice (begin/end/stride named args, python-exact negatives), taste,
enumerate, reverse, unique, deduplicate (selectors + limit=), top, rare,
unroll, flatten, unflatten. A `sort` on a single ascending key
re-declares the order for downstream order-sensitive statements;
summarize/unroll/reverse clear it (same rules as plans/pipeline.py).

Each statement compiles to the SAME DataFrame operator library the TQL1
front-end uses — one engine, two surface syntaxes. `if` splits the
stream on the condition, runs both branch pipelines, and reunifies with
unionByName(allowMissingColumns) — the reference's stream-routing
semantics (parser.cpp:130-148).

`match expr { v1, v2 => { pipeline }, ... }` (parser.cpp:150-190): the
reference PARSES match statements but ships no executor for them
(ast.hpp:477 has no exec path), so the routing semantics here are this
engine's documented choice: an event runs the FIRST arm whose filter
list contains a value equal to the subject, later arms never see it,
and events matching no arm are dropped (match is a total router, like
`if` without an implicit pass-through else). Arms compile to disjoint
filters + per-arm pipelines + unionByName — same mechanics as if/else.

Records `{name: expr, ...}` (parser.cpp:431-476) compile to
F.struct(...aliased fields...); string field names are accepted like
the reference. Selector paths may start with `this` (parser.cpp:402),
nested assignment targets (`x.y = e`, `this.x.y = e`) compile to
withField on the root struct column, and `this = {record}` replaces
the whole event with the record's fields.

Lambdas `x => expr` (parser.cpp:340-360) are valid ONLY as the argument
of the list methods `.map(x => e)` / `.where(x => p)` — the two lambda
consumers the reference documents (web/docs/functions/map.md,
where.md). They compile to Catalyst higher-order functions
(``F.transform`` / ``F.filter``): the body runs JVM-side inside
whole-stage codegen, the parameter shadows any same-named column, and
outer columns stay referencable (same-row correlation). A lambda in
any other position is a clear TqlError.

Subpipeline `{...}` arguments are implemented for their one documented
stable consumer — the `every`/`cron` operator modifiers
(run_tql2_every: `every 10s { from ... | ... }`, body re-executed per
fire on the shared scheduler). `{...}` in any other argument position
stays a clear TqlError — an experimental edge that changed across
reference releases.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from tenzir_spark.operators.aggregate import AGG_FUNCTIONS
from tenzir_spark.plans.pipeline import TqlError


# --------------------------------------------------------------- tokenizer
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<newline>\n)
  | (?P<string>"(?:\\.|[^"\\])*")
  | (?P<number>\d[\d_]*(?:\.\d[\d_]*)?(?:[kMGT]i?)?)
  | (?P<dollar>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|>=|<=|=>|&&|\|\||[-+*/=<>|.,:(){}\[\]!])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = {"let", "if", "else", "and", "or", "not", "in", "true", "false",
             "null", "match"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise TqlError(f"tql2: cannot tokenize at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "ident" and val in _KEYWORDS:
            out.append((val, val))
        else:
            out.append((kind, val))
    out.append(("eof", ""))
    return out


_NUM_SUFFIX = {"k": 10**3, "M": 10**6, "G": 10**9, "T": 10**12,
               "ki": 2**10, "Mi": 2**20, "Gi": 2**30, "Ti": 2**40}


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "0": "\0",
            "\\": "\\", '"': '"', "'": "'"}


def _unescape(body: str) -> str:
    """String-literal escapes (tokens.cpp string scanning). A hand
    loop, not codecs' unicode_escape — that codec latin-1-decodes the
    bytes and mangles any non-ASCII literal."""
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = body[i + 1]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 2
        elif e in "xu":
            n = 2 if e == "x" else 4
            hexs = body[i + 2:i + 2 + n]
            try:
                out.append(chr(int(hexs, 16)))
            except ValueError:
                raise TqlError(f"tql2: bad \\{e} escape in string literal")
            i += 2 + n
        else:
            out.append(e)
            i += 2
    return "".join(out)


def _parse_number(text: str):
    m = re.fullmatch(r"(\d[\d_]*(?:\.\d[\d_]*)?)([kMGT]i?)?", text)
    base, suffix = m.group(1).replace("_", ""), m.group(2)
    v = float(base) if "." in base else int(base)
    if suffix:
        v = v * _NUM_SUFFIX[suffix]
        v = int(v) if float(v).is_integer() else v
    return v


# ------------------------------------------------------------------ parser
class _Parser:
    """Recursive descent over the token list; mirrors the reference's
    statement/expression split (parser.cpp:100, :246)."""

    _PREC = [  # low → high; parser.cpp precedence ladder
        {"or"}, {"and"}, {"==", "!=", "<", "<=", ">", ">=", "in"},
        {"+", "-"}, {"*", "/"},
    ]

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, val=None):
        k, v = self.peek()
        if k == kind and (val is None or v == val):
            return self.next()
        return None

    def expect(self, kind, val=None):
        t = self.accept(kind, val)
        if t is None:
            raise TqlError(
                f"tql2: expected {val or kind}, got {self.peek()[1]!r}")
        return t

    # -- pipeline / statements
    def pipeline(self, stop_at_rbrace=False) -> list:
        body = []
        while True:
            while self.accept("newline") or self.accept("op", "|"):
                pass
            k, v = self.peek()
            if k == "eof" or (stop_at_rbrace and (k, v) == ("op", "}")):
                return body
            body.append(self.statement())

    def statement(self):
        if self.peek()[0] == "let":
            self.next()
            name = self.expect("dollar")[1]
            self.expect("op", "=")
            return ("let", name, self.expr())
        if self.peek()[0] == "if":
            self.next()
            cond = self.expr()
            self.expect("op", "{")
            cons = self.pipeline(stop_at_rbrace=True)
            self.expect("op", "}")
            alt = []
            if self.accept("else"):
                if self.peek()[0] == "if":
                    # `else if …` chains desugar to a nested if statement
                    alt = [self.statement()]
                else:
                    self.expect("op", "{")
                    alt = self.pipeline(stop_at_rbrace=True)
                    self.expect("op", "}")
            return ("if", cond, cons, alt)
        if self.peek()[0] == "match":
            return self._match_stmt()
        # selector `=` expr  |  ident args
        if self.peek()[0] != "ident":
            raise TqlError(f"tql2: expected a statement, got {self.peek()[1]!r}")
        start = self.i
        path = self._selector_path()
        if self.accept("op", "="):
            return ("assign", path, self.expr())
        if len(path) == 1:
            self.i = start + 1
            return ("invoke", path[0], self._args())
        raise TqlError("tql2: expected operator name or `=` after selector")

    def _skip_newlines(self):
        while self.accept("newline"):
            pass

    def _match_stmt(self):
        """match subject { v1, v2 => { pipeline } ... } — arm grammar
        mirrors parser.cpp:150-190 (filters until `=>`, optional comma
        between arms, newlines ignored inside the braces)."""
        self.next()  # 'match'
        subject = self.expr()
        self.expect("op", "{")
        arms = []
        self._skip_newlines()
        while not self.accept("op", "}"):
            filters = []
            while True:
                filters.append(self.expr())
                if self.accept("op", "=>"):
                    break
                self.expect("op", ",")
            self.expect("op", "{")
            body = self.pipeline(stop_at_rbrace=True)
            self.expect("op", "}")
            self.accept("op", ",")
            self._skip_newlines()
            arms.append((filters, body))
        if not arms:
            raise TqlError("tql2: match needs at least one arm")
        return ("match", subject, arms)

    def _selector_path(self) -> list[str]:
        path = [self.expect("ident")[1]]
        while self.accept("op", "."):
            path.append(self.expect("ident")[1])
        return path

    def _args(self) -> list:
        """Invocation arguments; `ident = expr` named pairs are allowed
        (the reference parses assignments as operator arguments,
        parser.cpp:195) — that is how summarize names its aggregates and
        rename maps new=old."""
        args = []
        while self.peek()[0] not in ("newline", "eof") and \
                self.peek() != ("op", "|") and self.peek() != ("op", "}"):
            if args:
                # the reference allows `{ ... }` WITHOUT a comma as the
                # final argument (parser.cpp:215-230)
                if self.peek() != ("op", "{"):
                    self.expect("op", ",")
            if (self.peek()[0] == "ident"
                    and self.toks[self.i + 1] == ("op", "=")
                    and self.toks[self.i + 2] != ("op", "=")):
                name = self.next()[1]
                self.next()  # '='
                args.append(("named", name, self.expr()))
            else:
                args.append(self.expr())
            if args[-1][0] == "pipe":
                # a subpipeline is always the FINAL argument
                # (parser.cpp:225-236)
                if self.peek()[0] not in ("newline", "eof") and \
                        self.peek() not in (("op", "|"), ("op", "}")):
                    raise TqlError(
                        "tql2: expected end of statement after a final "
                        "subpipeline argument")
                break
        return args

    # -- expressions (precedence climbing, parser.cpp:246)
    def expr(self, level=0):
        if level >= len(self._PREC):
            return self._unary()
        left = self.expr(level + 1)
        while True:
            k, v = self.peek()
            word = v if k in ("and", "or", "in") else (v if k == "op" else None)
            if word in self._PREC[level]:
                self.next()
                right = self.expr(level + 1)
                left = ("bin", word, left, right)
            else:
                return left

    def _unary(self):
        if self.accept("not"):
            return ("not", self._unary())
        if self.accept("op", "-"):
            return ("neg", self._unary())
        return self._postfix()

    def _postfix(self):
        e = self._primary()
        while True:
            if self.accept("op", "."):
                name = self.expect("ident")[1]
                if self.accept("op", "("):
                    args = []
                    while not self.accept("op", ")"):
                        if args:
                            self.expect("op", ",")
                        args.append(self._arg_expr())
                    e = ("method", name, e, args)
                else:
                    e = ("field", e, name)
            else:
                return e

    def _arg_expr(self):
        """An argument position admits a lambda `x => expr`
        (parser.cpp:340-360); everywhere else `=>` is a tokenize-level
        stray."""
        if (self.peek()[0] == "ident"
                and self.toks[self.i + 1] == ("op", "=>")):
            param = self.next()[1]
            self.next()  # '=>'
            return ("lambda", param, self.expr())
        return self.expr()

    def _primary(self):
        k, v = self.peek()
        if k == "string":
            self.next()
            return ("lit", _unescape(v[1:-1]))
        if k == "number":
            self.next()
            return ("lit", _parse_number(v))
        if k in ("true", "false"):
            self.next()
            return ("lit", k == "true")
        if k == "null":
            self.next()
            return ("lit", None)
        if k == "dollar":
            self.next()
            return ("var", v)
        if (k, v) == ("op", "("):
            self.next()
            e = self.expr()
            self.expect("op", ")")
            return e
        if (k, v) == ("op", "["):
            self.next()
            items = []
            while not self.accept("op", "]"):
                if items:
                    self.expect("op", ",")
                items.append(self.expr())
            return ("list", items)
        if (k, v) == ("op", "{"):
            return self._record()
        if k == "ident":
            name = self.next()[1]
            if self.accept("op", "("):
                args = []
                while not self.accept("op", ")"):
                    if args:
                        self.expect("op", ",")
                    args.append(self._arg_expr())
                return ("call", name, args)
            return ("sel", name)
        raise TqlError(f"tql2: unexpected token {v!r} in expression")

    def _record(self):
        """The reference's parse_record_or_pipeline_expr
        (parser.cpp:431-449): `{}` or `{ident|"str" : …}` is a RECORD
        (parser.cpp:451-476); any other brace content parses as a
        PIPELINE EXPRESSION — a subpipeline argument (`apply {…}`,
        every/cron's braced body). Where an operator has no subpipeline
        semantics the executor raises a clear TqlError."""
        self.next()  # '{'
        self._skip_newlines()
        # record iff empty or (ident|string) ':' follows — the
        # reference's exact discrimination (parser.cpp:436-440)
        is_record = self.peek() == ("op", "}") or (
            self.peek()[0] in ("ident", "string")
            and self.toks[self.i + 1] == ("op", ":"))
        if not is_record:
            body = self.pipeline(stop_at_rbrace=True)
            self.expect("op", "}")
            return ("pipe", body)
        fields = []
        while not self.accept("op", "}"):
            if fields:
                self.expect("op", ",")
                self._skip_newlines()
            name_tok = self.accept("ident") or self.accept("string")
            if name_tok is None or not (self.peek() == ("op", ":")):
                raise TqlError(
                    "tql2: expected a record field `name: expr` "
                    "(a brace holding statements is a pipeline "
                    "expression and must be an operator's final argument)")
            name = name_tok[1]
            if name_tok[0] == "string":
                name = name[1:-1]
            self.expect("op", ":")
            fields.append((name, self.expr()))
            self._skip_newlines()
        return ("record", fields)


# ---------------------------------------------------------------- compiler
_METHODS = {
    "starts_with": lambda c, a: c.startswith(a[0]),
    "ends_with": lambda c, a: c.endswith(a[0]),
    "contains": lambda c, a: c.contains(a[0]),
    "lower": lambda c, a: F.lower(c),
    "upper": lambda c, a: F.upper(c),
    "length": lambda c, a: F.length(c),
    "trim": lambda c, a: F.trim(c),
    "trim_start": lambda c, a: F.ltrim(c),
    "trim_end": lambda c, a: F.rtrim(c),
    "abs": lambda c, a: F.abs(c),
    "round": lambda c, a: F.round(c, *[int(x) for x in a[:1]] or [0]),
    "split": lambda c, a: F.split(c, re.escape(_str_args("split", a, 1)[0])),
    "replace": lambda c, a: F.replace(
        c, *[F.lit(x) for x in _str_args("replace", a, 2)]),
    "capitalize": lambda c, a: F.initcap(c),
    "to_int": lambda c, a: c.cast("long"),
    "to_float": lambda c, a: c.cast("double"),
    "to_string": lambda c, a: c.cast("string"),
    # TQL2 function-library names (docs list to_upper/to_lower alongside
    # the legacy lower/upper)
    "to_lower": lambda c, a: F.lower(c),
    "to_upper": lambda c, a: F.upper(c),
    # list methods — pure Catalyst array functions, JVM-side
    "sort": lambda c, a: F.array_sort(c),
    "reverse": lambda c, a: F.reverse(c),
    "distinct": lambda c, a: F.array_distinct(c),
    "flatten": lambda c, a: F.flatten(c),
    # try_element_at: null on empty lists (plain element_at THROWS under
    # ANSI mode, Spark 4's default and this engine's session setting)
    "first": lambda c, a: F.try_element_at(c, F.lit(1)),
    "last": lambda c, a: F.try_element_at(c, F.lit(-1)),
    "min": lambda c, a: F.array_min(c),
    "max": lambda c, a: F.array_max(c),
    # numeric fold: double result; null elements are SKIPPED (SQL
    # aggregate semantics, same as the sibling .min()/.max()) — a bare
    # acc + x would null-poison the whole total
    "sum": lambda c, a: F.aggregate(
        c, F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x.cast("double"), F.lit(0.0))),
    "join": lambda c, a: F.array_join(c, _str_args("join", a, 1)[0]),
}


def _arity(name: str):
    raise TqlError(f"tql2: {name}() expects at least two arguments")


def _str_args(name: str, a: list, n: int) -> list:
    """Methods that need n LITERAL string arguments raise the front-end's
    TqlError (with usage) on wrong arity or computed arguments, never a
    raw IndexError/TypeError from the compile internals."""
    if len(a) != n or not all(isinstance(x, str) for x in a):
        raise TqlError(
            f"tql2: .{name}() expects {n} string literal argument(s)")
    return a

# TQL2 aggregation registry = the TQL1 registry adapted to the parsed
# argument list — ONE owner (operators/aggregate.py AGG_FUNCTIONS), so
# the dialects cannot drift by parallel maintenance (TQL2 `distinct` had
# silently diverged to unsorted before they were unified). TQL2-only
# extras: bare count() and the avg/median alias spellings.
def _adapt_agg(f):
    return lambda a: f(a[0])


_AGGS = {name: _adapt_agg(f) for name, f in AGG_FUNCTIONS.items()}
_AGGS["count"] = lambda a: F.count(a[0]) if a else F.count("*")
_AGGS["avg"] = _AGGS["mean"]
_AGGS["median"] = _AGGS["approximate_median"]

_FUNCS = {
    "length": lambda a: F.length(a[0]),
    "round": lambda a: F.round(a[0], *[a[1]] if len(a) > 1 else []),
    "abs": lambda a: F.abs(a[0]),
    "lower": lambda a: F.lower(a[0]),
    "upper": lambda a: F.upper(a[0]),
    "coalesce": lambda a: F.coalesce(*a),
    "concat": lambda a: F.concat(*a),
    "sqrt": lambda a: F.sqrt(a[0]),
    "ceil": lambda a: F.ceil(a[0]),
    "floor": lambda a: F.floor(a[0]),
    "exp": lambda a: F.exp(a[0]),
    "ln": lambda a: F.log(a[0]),
    "min": lambda a: F.least(*a) if len(a) >= 2 else _arity("min"),
    "max": lambda a: F.greatest(*a) if len(a) >= 2 else _arity("max"),
    # type constructors (functions.md int/uint/float/string families)
    "int": lambda a: a[0].cast("long"),
    "float": lambda a: a[0].cast("double"),
    "string": lambda a: a[0].cast("string"),
}


def _lit(v):
    return F.lit(v)


def _hof_fn(param: str, body, env: dict):
    """Closure factory for Catalyst higher-order functions. MUST be a
    factory with a single-positional-arg inner fn: pyspark inspects the
    signature, and a default arg (``lambda x, b=body:``) is read as the
    (element, index) form — the documented shadowing pitfall."""
    def fn(x):
        inner = dict(env)
        inner[("local", param)] = x
        return _compile(body, inner)
    return fn


def _compile(e, env: dict):
    kind = e[0]
    if kind == "pipe":
        raise TqlError(
            "tql2: a `{ pipeline }` subpipeline is not a value — it is "
            "only valid as an operator's final argument (apply/every/"
            "cron)")
    if kind == "lit":
        return _lit(e[1])
    if kind == "var":
        if e[1] not in env:
            raise TqlError(f"tql2: unbound binding {e[1]} (declare with let)")
        return _lit(env[e[1]])
    if kind == "sel":
        if ("local", e[1]) in env:  # lambda parameter shadows columns
            return env[("local", e[1])]
        if e[1] == "this":
            raise TqlError("tql2: bare `this` is only valid as an "
                           "assignment target (`this = {...}`) or a "
                           "selector prefix (`this.field`)")
        return F.col(e[1])
    if kind == "field":
        if e[1] == ("sel", "this"):  # this.field == field (parser.cpp:402)
            return F.col(e[2])
        base = _compile(e[1], env)
        return base.getField(e[2])
    if kind == "record":
        if not e[1]:
            raise TqlError("tql2: empty records are not supported")
        return F.struct(*[_compile(x, env).alias(n) for n, x in e[1]])
    if kind == "list":
        return F.array(*[_compile(x, env) for x in e[1]])
    if kind == "neg":
        return -_compile(e[1], env)
    if kind == "not":
        return ~_compile(e[1], env)
    if kind == "bin":
        op, l, r = e[1], _compile(e[2], env), None
        if op == "in":
            # `x in [..]` with a literal list → isin (pushdown-friendly)
            if e[3][0] == "list" and all(i[0] == "lit" for i in e[3][1]):
                return l.isin([i[1] for i in e[3][1]])
            r = _compile(e[3], env)
            return F.array_contains(r, l)
        r = _compile(e[3], env)
        return {
            "and": l & r, "or": l | r,
            "==": l == r, "!=": l != r,
            "<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r,
            "+": l + r, "-": l - r, "*": l * r, "/": l / r,
        }[op]
    if kind == "method":
        name, recv_ast, args = e[1], e[2], e[3]
        if name in ("map", "where"):
            # list HOFs (web/docs/functions/map.md, where.md): the only
            # lambda consumers. Catalyst transform/filter — the body is
            # a same-row JVM expression, never a Python UDF.
            if len(args) != 1 or args[0][0] != "lambda":
                raise TqlError(
                    f"tql2: .{name}() expects exactly one lambda "
                    f"argument (`.{name}(x => expr)`)")
            fn = _hof_fn(args[0][1], args[0][2], env)
            recv = _compile(recv_ast, env)
            return F.transform(recv, fn) if name == "map" else \
                F.filter(recv, fn)
        recv = _compile(recv_ast, env)
        if name not in _METHODS:
            raise TqlError(f"tql2: unknown method .{name}()")
        cargs = [a[1] if a[0] == "lit" else _compile(a, env) for a in args]
        return _METHODS[name](recv, cargs)
    if kind == "lambda":
        raise TqlError(
            "tql2: lambdas `x => expr` are only valid as the argument of "
            ".map() / .where() on a list")
    if kind == "call":
        name, args = e[1], [_compile(a, env) for a in e[2]]
        if name in _FUNCS:
            return _FUNCS[name](args)
        raise TqlError(f"tql2: unknown function {name}()")
    raise TqlError(f"tql2: cannot compile expression node {kind!r}")


def _const_eval(e, env: dict):
    """let bindings fold driver-side (parser.cpp let_stmt) — only
    literal arithmetic, so plans stay codegen-cache-stable."""
    kind = e[0]
    if kind == "lit":
        return e[1]
    if kind == "var":
        return env[e[1]]
    if kind == "neg":
        return -_const_eval(e[1], env)
    if kind == "bin" and e[1] in ("+", "-", "*", "/"):
        l, r = _const_eval(e[2], env), _const_eval(e[3], env)
        return {"+": l + r, "-": l - r, "*": l * r, "/": l / r}[e[1]]
    raise TqlError("tql2: let bindings must be constant expressions")


def _apply_statements(df: DataFrame, body: list, env: dict,
                      order: str | None = None) -> tuple:
    from tenzir_spark.operators import aggregate as agg_ops
    from tenzir_spark.operators import core as ops

    for st in body:
        kind = st[0]
        if kind == "let":
            env[st[1]] = _const_eval(st[2], env)
        elif kind == "assign":
            path = st[1]
            if path and path[0] == "this":
                path = path[1:]
            if not path:
                # `this = {record}` replaces the whole event
                if st[2][0] != "record" or not st[2][1]:
                    raise TqlError("tql2: `this = ...` expects a non-empty "
                                   "record expression")
                df = df.select(
                    *[_compile(x, env).alias(n) for n, x in st[2][1]])
                order = None  # the record replaced every column
            elif len(path) == 1:
                if path[0] == order:
                    order = None  # the order column was overwritten
                df = df.withColumn(path[0], _compile(st[2], env))
            else:
                # nested target: withField on the root struct column
                if path[0] not in df.columns:
                    raise TqlError(
                        f"tql2: nested assignment target {'.'.join(path)} "
                        f"needs an existing struct column {path[0]!r}")
                df = df.withColumn(
                    path[0],
                    F.col(path[0]).withField(
                        ".".join(path[1:]), _compile(st[2], env)))
        elif kind == "if":
            cond = _compile(st[1], env)
            then_df, o1 = _apply_statements(
                df.filter(cond), st[2], dict(env), order)
            else_df, o2 = _apply_statements(
                df.filter(~F.coalesce(cond, F.lit(False))), st[3],
                dict(env), order)
            df = then_df.unionByName(else_df, allowMissingColumns=True)
            # the union keeps the declared order only if BOTH branches did
            order = order if o1 == order and o2 == order else None
        elif kind == "match":
            # first-match-wins routing; unmatched events drop (docstring —
            # the reference parses match but ships no executor for it).
            subject = _compile(st[1], env)
            matched_so_far = F.lit(False)
            parts, orders = [], []
            for filters, body in st[2]:
                cond = subject == _compile(filters[0], env)
                for f in filters[1:]:
                    cond = cond | (subject == _compile(f, env))
                eff = cond & ~matched_so_far
                p, o = _apply_statements(df.filter(eff), body, dict(env),
                                         order)
                parts.append(p)
                orders.append(o)
                matched_so_far = matched_so_far | F.coalesce(cond, F.lit(False))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p, allowMissingColumns=True)
            df = out
            order = order if all(o == order for o in orders) else None
        elif kind == "invoke":
            df, order = _invoke(df, st[1], st[2], env, ops, agg_ops, order)
        else:  # pragma: no cover
            raise TqlError(f"tql2: unknown statement {kind!r}")
    return df, order


def _sel_name(e, what: str) -> str:
    if e[0] == "sel":
        return e[1]
    raise TqlError(f"tql2: {what} expects field names")


def _int_lit(args, i, name, default=None):
    if len(args) <= i:
        if default is None:
            raise TqlError(f"tql2: {name} expects an integer literal")
        return default
    a = args[i]
    if a[0] == "neg" and a[1][0] == "lit" and isinstance(a[1][1], int):
        return -a[1][1]
    if a[0] != "lit" or not isinstance(a[1], int):
        raise TqlError(f"tql2: {name} expects an integer literal")
    return a[1]


def _need_order(order, name):
    if order is None:
        raise TqlError(
            f"tql2: {name} needs stream order — pass order_by= to "
            f"run_tql2 or put an ascending single-key `sort` before it")
    return order


def _invoke(df, name, args, env, ops, agg_ops, order) -> tuple:
    if name == "apply":
        # `apply { pipeline }` — inline subpipeline include: the braced
        # body runs on the stream in place (the executable TQL2 form of
        # the reference's apply, builtins/operators/apply.cpp — there it
        # includes a named pipeline from disk; the braced-argument
        # grammar is parser.cpp:215-230 + 431-449)
        if len(args) != 1 or args[0][0] != "pipe":
            raise TqlError("tql2: apply expects one `{ pipeline }` "
                           "subpipeline argument")
        return _apply_statements(df, args[0][1], dict(env), order)
    if any(a[0] == "pipe" or (a[0] == "named" and a[2][0] == "pipe")
           for a in args):
        raise TqlError(
            f"tql2: operator {name!r} does not take a subpipeline "
            "argument (subpipeline consumers: apply, every, cron, "
            "if/else, match arms)")
    if name == "where":
        if len(args) != 1:
            raise TqlError("tql2: where expects one expression")
        return df.filter(_compile(args[0], env)), order
    if name == "select":
        cols = [_sel_name(a, "select") for a in args]
        return (df.select(*cols),
                order if order in cols else None)
    if name == "drop":
        cols = [_sel_name(a, "drop") for a in args]
        return df.drop(*cols), (None if order in cols else order)
    if name == "head":
        return ops.head(df, _int_lit(args, 0, "head", 10),
                        order_by=order), order
    if name == "tail":
        return ops.tail(df, _int_lit(args, 0, "tail", 10),
                        order_by=_need_order(order, "tail")), order
    if name == "sort":
        cols, keys = [], []
        for a in args:
            if a[0] == "neg":
                cols.append(F.col(_sel_name(a[1], "sort")).desc())
                keys.append(None)
            else:
                cols.append(F.col(_sel_name(a, "sort")).asc())
                keys.append(_sel_name(a, "sort"))
        # an ascending first key re-declares the stream order downstream;
        # a descending one does not (same rule as plans/pipeline.py)
        return df.orderBy(*cols), (keys[0] if keys else None)
    if name == "slice":
        spec = {"begin": None, "end": None, "stride": None}
        for i, a in enumerate(args):
            if a[0] == "named" and a[1] in spec:
                spec[a[1]] = _int_lit([a[2]], 0, f"slice {a[1]}=")
            else:
                pos = ("begin", "end", "stride")
                if i >= 3:
                    raise TqlError("tql2: slice takes begin, end, stride")
                spec[pos[i]] = _int_lit(args, i, "slice")
        out = ops.slice_rows(df, spec["begin"], spec["end"], spec["stride"],
                             order_by=_need_order(order, "slice"))
        # a negative stride reverses the stream (slice ::-1 == reverse):
        # the ascending order column no longer describes downstream
        # positions, so it leaves scope — same rule as `reverse`
        return out, (None if (spec["stride"] or 1) < 0 else order)
    if name == "taste":
        # `taste [n][, discriminator]` in either order: the count is the
        # first integer literal (default 10), the discriminator the
        # first selector (default: first column)
        ints = [a for a in args if a[0] != "sel"]
        n = _int_lit(ints, 0, "taste", 10)
        sel = [a for a in args if a[0] == "sel"]
        schema_col = sel[0][1] if sel else df.columns[0]
        return ops.taste(df, n, schema_col=schema_col,
                         order_by=_need_order(order, "taste")), order
    if name == "enumerate":
        field = _sel_name(args[0], "enumerate") if args else "index"
        return ops.enumerate_rows(df, field=field, order_by=order), order
    if name == "reverse":
        return ops.reverse(df, order_by=_need_order(order, "reverse")), None
    if name == "unique":
        cols = [_sel_name(a, "unique") for a in args] or None
        return ops.unique_adjacent(df, cols,
                                   order_by=_need_order(order, "unique")), order
    if name == "deduplicate":
        keys, limit = [], 1
        for a in args:
            if a[0] == "named" and a[1] == "limit":
                limit = _int_lit([a[2]], 0, "deduplicate limit=")
            else:
                keys.append(_sel_name(a, "deduplicate"))
        if not keys:
            raise TqlError("tql2: deduplicate expects at least one field")
        return ops.deduplicate(df, keys, limit=limit,
                               order_by=_need_order(order, "deduplicate")), order
    if name in ("top", "rare"):
        if not args or args[0][0] != "sel":
            raise TqlError(f"tql2: {name} expects a field")
        n = _int_lit(args, 1, name, 0) or None
        fn = agg_ops.top if name == "top" else agg_ops.rare
        return fn(df, args[0][1], n), None
    if name == "unroll":
        from tenzir_spark.operators.structural import unroll

        if len(args) != 1 or args[0][0] != "sel":
            raise TqlError("tql2: unroll expects one field")
        # exploded siblings share one order value — order leaves scope
        return unroll(df, args[0][1]), None
    if name in ("flatten", "unflatten"):
        from tenzir_spark.operators import structural

        return getattr(structural, name)(df), order
    if name == "summarize":
        return _summarize(df, args, env), None
    if name == "rename":
        for a in args:
            if a[0] != "named" or a[2][0] != "sel":
                raise TqlError("tql2: rename expects new_name=old_name pairs")
            if a[2][1] == order:
                order = a[1]
            df = df.withColumnRenamed(a[2][1], a[1])
        return df, order
    if name == "pass":
        return df, order
    raise TqlError(f"tql2: unknown operator {name!r}")


def _summarize(df, args, env):
    keys, aggs = [], []
    for a in args:
        if a[0] == "sel":
            keys.append(a[1])
        elif a[0] == "named":
            out, call = a[1], a[2]
            if call[0] != "call" or call[1] not in _AGGS:
                raise TqlError(
                    f"tql2: summarize {out}= expects an aggregation function")
            cargs = [_compile(x, env) for x in call[2]]
            aggs.append(_AGGS[call[1]](cargs).alias(out))
        else:
            raise TqlError("tql2: summarize arguments are group keys or "
                           "`name=agg(...)` assignments")
    if not aggs:
        raise TqlError("tql2: summarize needs at least one aggregate")
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


# ------------------------------------------------------------------- API
def run_tql2(df: DataFrame, text: str,
             order_by: str | None = None) -> DataFrame:
    """Apply a TQL2 pipeline (subset above) to a DataFrame.

    ``order_by`` declares the stream-position column for the
    order-sensitive statements (tail/slice/taste/enumerate/reverse/
    unique/deduplicate) — same contract as plans.pipeline.run_tql."""
    body = _Parser(_tokenize(text)).pipeline()
    out, _order = _apply_statements(df, body, {}, order_by)
    return out


def _one_quoted_path(args, name: str) -> str:
    if len(args) != 1 or args[0][0] != "lit" or not isinstance(args[0][1], str):
        raise TqlError(f'tql2: {name} expects one quoted path')
    return args[0][1]


# TQL2 source heads beyond `from`: rendered as the equivalent TQL1 head
# text and resolved by run_tql_source, so both dialects share ONE source
# resolver (lake export/changelog, pub-sub topics, ingest metrics,
# introspection aspects, host inventory — plans/pipeline.py).
_SOURCE_HEADS = ("export", "subscribe", "metrics", "show",
                 "files", "processes", "sockets", "nics")


def _head_token(name: str, v) -> str:
    """One TQL1 head token: literal str/int/bool from the TQL2 arg list.
    TQL1 heads are whitespace-split, so embedded spaces cannot round-trip."""
    if isinstance(v, bool) or v is None:
        raise TqlError(f"tql2: {name} expects string or integer arguments")
    s = str(v)
    if not s or any(ch.isspace() for ch in s) or "|" in s:
        raise TqlError(
            f"tql2: {name} argument {s!r} cannot contain spaces or '|'")
    return s


def _head_to_tql1(name: str, args: list) -> str:
    pos: list[str] = []
    named: dict[str, str] = {}
    for a in args:
        if a[0] == "named":
            if a[2][0] != "lit":
                raise TqlError(f"tql2: {name} options must be literal values")
            named[a[1]] = _head_token(name, a[2][1])
        elif a[0] == "lit":
            pos.append(_head_token(name, a[1]))
        else:
            raise TqlError(f"tql2: {name} arguments must be literal values")
    if name in ("processes", "sockets", "nics"):
        if pos or named:
            raise TqlError(f"tql2: {name} takes no arguments")
        return name
    if name == "export":
        if len(pos) != 1 or set(named) - {"changes_since", "to"}:
            raise TqlError('tql2: export expects "<table_root>" '
                           '[, changes_since=<v>] [, to=<v>]')
        out = f"export {pos[0]}"
        if "changes_since" in named:
            out += f" --changes-since {named['changes_since']}"
        if "to" in named:
            out += f" --to {named['to']}"
        return out
    if named:
        raise TqlError(f"tql2: {name} takes no named options")
    arity = {"subscribe": (1, 1), "metrics": (1, 1),
             "show": (1, 2), "files": (1, 1)}[name]
    if not (arity[0] <= len(pos) <= arity[1]):
        raise TqlError(f"tql2: {name} expects "
                       f"{' or '.join(map(str, sorted(set(arity))))} "
                       f"argument(s)")
    return " ".join([name, *pos])


def run_tql2_source(spark, text: str) -> DataFrame:
    """TQL2 pipeline starting with `from "<path>"` (parquet/json/csv by
    extension, the TQL1 front door's inference) or any shared source
    operator — `export "<root>", changes_since=<v>`, `subscribe
    "<topic>"`, `metrics "<warehouse>"`, `show "<aspect>" [, "<root>"]`,
    `files "<dir>"`, `processes`, `sockets`, `nics` — resolved by the
    same machinery as the TQL1 text path. A trailing `to "<path>"`
    writes through the shared sink (same formats/transports as the TQL1
    `to`) and returns the written DataFrame."""
    body = _Parser(_tokenize(text)).pipeline()
    if not body or body[0][0] != "invoke" or \
            body[0][1] not in ("from", *_SOURCE_HEADS):
        raise TqlError(
            'tql2: source pipeline must start with from "<path>" or a '
            'source operator (export/subscribe/metrics/show/files/'
            'processes/sockets/nics)')
    from tenzir_spark.plans.pipeline import (_read_source, _write_sink,
                                             run_tql_source)

    sink = None
    if body[-1][0] == "invoke" and body[-1][1] == "to":
        sink = _one_quoted_path(body[-1][2], "to")
        body = body[:-1]
    if body[0][1] == "from":
        df = _read_source(spark, _one_quoted_path(body[0][2], "from"), None)
    else:
        df = run_tql_source(spark, _head_to_tql1(body[0][1], body[0][2]))
    out, _order = _apply_statements(df, body[1:], {})
    if sink is not None:
        _write_sink(out, sink, None)
    return out


_EVERY2_RE = re.compile(
    r'\s*(?:every\s+(\S+)|cron\s+"([^"]+)")\s*\{(.*)\}\s*$', re.DOTALL)


def run_tql2_every(spark, text: str, *, n_runs: int,
                   now_fn=None, sleep_fn=None) -> list:
    """TQL2 scheduled pipelines — the dialect's subpipeline-argument form
    of the `every`/`cron` operator modifiers (operator-modifiers.md; TQL1
    spells the same thing without braces):

        every 10s { from "feed.json" | where k >= 10 | select k }
        cron "0 */5 * * * *" { export "wh/t" | summarize n=count() }

    The braced body is a full TQL2 SOURCE pipeline re-parsed and
    re-executed per fire (matching run_tql_every's re-read semantics —
    each fire sees current data). Returns the per-run result DataFrames.
    Same scheduler/driver as TQL1 (streaming/schedule.py): `every` fires
    immediately, `cron` waits for the first match; ``now_fn``/``sleep_fn``
    inject a fake clock for tests. This is the one subpipeline consumer
    implemented; `{...}` anywhere else stays a clear TqlError."""
    from datetime import datetime as _dt

    from tenzir_spark.streaming.schedule import (
        CronScheduler,
        EveryScheduler,
        run_scheduled,
    )

    m = _EVERY2_RE.match(text)
    if not m:
        raise TqlError(
            'tql2: expected `every <interval> { <pipeline> }` or '
            '`cron "<expr>" { <pipeline> }`')
    from tenzir_spark.plans.pipeline import parse_duration

    if m.group(1) is not None:
        sched = EveryScheduler(parse_duration(m.group(1)))
    else:
        # .parse validates the expression NOW — a bad cron string must
        # error at call time, not at the first fire
        sched = CronScheduler.parse(m.group(2))
    body = m.group(3).strip()
    if not body:
        raise TqlError("tql2: scheduled subpipeline is empty")
    # validate up front so errors surface before the first sleep, not at
    # fire time (a cron schedule can sleep hours before its first match):
    # syntax, the source-head requirement, AND head-argument shape — the
    # same checks run_tql2_source applies per fire
    parsed = _Parser(_tokenize(body)).pipeline()
    if not parsed or parsed[0][0] != "invoke" or \
            parsed[0][1] not in ("from", *_SOURCE_HEADS):
        raise TqlError(
            'tql2: scheduled subpipeline must start with from "<path>" '
            'or a source operator (export/subscribe/metrics/show/files/'
            'processes/sockets/nics)')
    if parsed[0][1] == "from":
        _one_quoted_path(parsed[0][2], "from")
    else:
        _head_to_tql1(parsed[0][1], parsed[0][2])
    results: list = []

    def _fire():
        results.append(run_tql2_source(spark, body))

    run_scheduled(_fire, sched, n_runs=n_runs,
                  now_fn=now_fn or _dt.now, sleep_fn=sleep_fn)
    return results
