"""TQL expression language → Catalyst Column compiler.

The reference's query language is a multi-schema predicate expression
language (web/docs/language/expressions.md): an and/or/not tree over
predicates ``LHS op RHS`` where an operand is a *field extractor*, a
*type extractor*, or a literal (libtenzir/include/tenzir/expression.hpp:
137-149; relational ops libtenzir/include/tenzir/operator.hpp:44-55).

Key non-standard semantics we preserve (expressions.md:95-199):

- **suffix resolution**: field extractor ``z`` ≡ ``*.z`` — it matches any
  field whose dotted path ends in ``z``; binding against several matching
  fields "implicitly creates a disjunction of all matching fields".
- **type extractors**: ``:string == "x"`` matches every string-typed field
  (disjunction again); with our Spark types, ``:ip``/``:subnet`` map to
  strings tagged by naming convention and ``:time`` to timestamps.
- **short forms**: bare ``field`` → ``field != null``; a bare literal
  ``value`` → ``:type-of-value == value``.
- **membership**: ``x in [a, b]``, substring ``"str" in field``, and
  ``ip in subnet`` CIDR containment (value matrix expressions.md:71-93).
- ``!=``/``!in`` follow the reference's *not* semantics (conjunction over
  multi-field bindings — expression_visitors.cpp:443-445 — i.e. the
  disjunction over matching fields).

The reference evaluates an expression by ``tailor``-ing it to each slice's
schema then producing a row bitmap (libtenzir/src/evaluate.cpp:441,
table_slice.hpp:307-308). Here, resolution against ``df.schema`` happens
once at plan time and yields a plain Catalyst predicate — Spark then does
the vectorized evaluation, predicate pushdown and pruning for free.

This is plain-Python recursive descent over the public grammar — no code
from the reference (its parser is C++, libtenzir/src/tql/parser.cpp).
"""

from __future__ import annotations

import ipaddress
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Pred:
    lhs: object  # FieldX | TypeX | Lit
    op: str      # == != < <= > >= in !in ni !ni
    rhs: object


@dataclass
class FieldX:
    path: str  # dotted suffix


@dataclass
class TypeX:
    name: str  # ip subnet string int64 uint64 double bool time duration blob


@dataclass
class Lit:
    value: object
    kind: str  # int float str bool null ip subnet list


@dataclass
class And:
    items: list


@dataclass
class Or:
    items: list


@dataclass
class Not:
    item: object


# ---------------------------------------------------------------------------
# tokenizer + recursive-descent parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lpar>\()|(?P<rpar>\))|
        (?P<land>&&)|(?P<lor>\|\|)|
        (?P<op>==|!=|<=|>=|<|>|!in\b|\bin\b|!ni\b|\bni\b)|
        (?P<lbrack>\[)|(?P<rbrack>\])|(?P<comma>,)|
        (?P<str>"(?:[^"\\]|\\.)*")|
        (?P<subnet>\d{1,3}(?:\.\d{1,3}){3}/\d{1,2})|
        (?P<ip>\d{1,3}(?:\.\d{1,3}){3}|[0-9a-fA-F:]*::[0-9a-fA-F:]+)|
        (?P<num>-?\d+\.\d+|-?\d+)|
        (?P<typex>:[a-z][a-z0-9_]*)|
        (?P<bang>!)|
        (?P<word>[A-Za-z_#][\w.#]*)
    )""",
    re.X,
)

_KEYWORD_LITS = {"true": (True, "bool"), "false": (False, "bool"), "null": (None, "null")}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"bad token at {text[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    out.append(("eof", ""))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def eat(self, kind: str | None = None) -> tuple[str, str]:
        t = self.toks[self.i]
        if kind and t[0] != kind:
            raise ValueError(f"expected {kind}, got {t}")
        self.i += 1
        return t

    # disjunction := conjunction (|| conjunction)*
    def disjunction(self):
        items = [self.conjunction()]
        while self.peek()[0] == "lor":
            self.eat()
            items.append(self.conjunction())
        return items[0] if len(items) == 1 else Or(items)

    # conjunction := unary (&& unary)*
    def conjunction(self):
        items = [self.unary()]
        while self.peek()[0] == "land":
            self.eat()
            items.append(self.unary())
        return items[0] if len(items) == 1 else And(items)

    def unary(self):
        k, _v = self.peek()
        if k == "bang":
            self.eat()
            return Not(self.unary())
        if k == "lpar":
            self.eat()
            e = self.disjunction()
            self.eat("rpar")
            return e
        return self.predicate()

    def operand(self):
        k, v = self.peek()
        if k == "word" and v in _KEYWORD_LITS:
            self.eat()
            val, kind = _KEYWORD_LITS[v]
            return Lit(val, kind)
        if k == "word":
            self.eat()
            return FieldX(v)
        if k == "typex":
            self.eat()
            return TypeX(v[1:])
        if k == "str":
            self.eat()
            return Lit(v[1:-1].replace('\\"', '"').replace("\\\\", "\\"), "str")
        if k == "subnet":
            self.eat()
            return Lit(v, "subnet")
        if k == "ip":
            self.eat()
            return Lit(v, "ip")
        if k == "num":
            self.eat()
            return Lit(float(v), "float") if "." in v else Lit(int(v), "int")
        if k == "lbrack":
            self.eat()
            items = []
            while self.peek()[0] != "rbrack":
                lit = self.operand()
                if not isinstance(lit, Lit):
                    raise ValueError("lists may only contain literals")
                items.append(lit)
                if self.peek()[0] == "comma":
                    self.eat()
            self.eat("rbrack")
            return Lit(items, "list")
        raise ValueError(f"bad operand {self.peek()}")

    def predicate(self):
        lhs = self.operand()
        k, _ = self.peek()
        if k != "op":  # short forms (expressions.md:172-199)
            if isinstance(lhs, FieldX):       # `field` → field != null
                return Pred(lhs, "!=", Lit(None, "null"))
            if isinstance(lhs, Lit):          # `value` → :type == value
                return Pred(TypeX(_lit_type(lhs)), "==", lhs)
            if isinstance(lhs, TypeX):        # `:type` → any field of type non-null
                return Pred(lhs, "!=", Lit(None, "null"))
            raise ValueError("bad short-form predicate")
        op = self.eat("op")[1]
        rhs = self.operand()
        return Pred(lhs, op, rhs)


def _lit_type(lit: Lit) -> str:
    return {
        "int": "int64", "float": "double", "str": "string", "bool": "bool",
        "ip": "ip", "subnet": "subnet",
    }.get(lit.kind, lit.kind)


def parse_expr(text: str):
    """Parse TQL expression text into an AST."""
    p = _Parser(_tokenize(text))
    e = p.disjunction()
    p.eat("eof")
    return e


# ---------------------------------------------------------------------------
# schema resolution (the `tailor` analog) + compilation to Column
# ---------------------------------------------------------------------------


def _walk_fields(schema: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    out = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        out.append((path, f.dataType))
        if isinstance(f.dataType, T.StructType):
            out.extend(_walk_fields(f.dataType, prefix=f"{path}."))
    return out


def _fields_for_suffix(schema: T.StructType, suffix: str) -> list[tuple[str, T.DataType]]:
    """Suffix semantics: `z` ≡ `*.z` (expressions.md:95-127). An exact
    full-path match wins; otherwise every field whose dotted path ends
    with `.suffix` participates in the disjunction."""
    fields = _walk_fields(schema)
    exact = [(p, t) for p, t in fields if p == suffix]
    if exact:
        return exact
    return [(p, t) for p, t in fields if p.endswith("." + suffix)]


_TYPE_MATCH = {
    "string": lambda dt, path: isinstance(dt, T.StringType) and not _is_ip_like(path),
    "int64": lambda dt, path: isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)),
    "uint64": lambda dt, path: isinstance(dt, (T.LongType, T.IntegerType)),
    "double": lambda dt, path: isinstance(dt, (T.DoubleType, T.FloatType)),
    "bool": lambda dt, path: isinstance(dt, T.BooleanType),
    "time": lambda dt, path: isinstance(dt, T.TimestampType),
    "duration": lambda dt, path: isinstance(dt, T.DayTimeIntervalType),
    "blob": lambda dt, path: isinstance(dt, T.BinaryType),
    # ip/subnet are Arrow extension types in the reference
    # (type-system.md:111-118); our storage convention is strings on
    # ip-suffixed column names
    "ip": lambda dt, path: isinstance(dt, T.StringType) and _is_ip_like(path),
    "subnet": lambda dt, path: isinstance(dt, T.StringType) and path.split(".")[-1].endswith(("subnet", "cidr", "net")),
}


def _is_ip_like(path: str) -> bool:
    leaf = path.split(".")[-1]
    return leaf == "ip" or leaf.endswith(("_ip", ".ip", "_h", "addr", "address"))


def _fields_for_type(schema: T.StructType, name: str) -> list[tuple[str, T.DataType]]:
    match = _TYPE_MATCH.get(name)
    if match is None:
        raise ValueError(f"unknown type extractor :{name}")
    return [(p, t) for p, t in _walk_fields(schema) if match(t, p)]


def _subnet_pred(col: Column, cidr: str) -> Column:
    """ip in subnet (expressions.md:82-88): compile the CIDR to a prefix
    test on the canonical string form for /8,/16,/24,/32; otherwise to a
    numeric range test on the packed address — all JVM-side."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4 and net.prefixlen in (0, 8, 16, 24, 32):
        parts = str(net.network_address).split(".")
        keep = net.prefixlen // 8
        if keep == 0:
            return col.isNotNull()
        if keep == 4:
            # /32 is an exact host: startswith("10.0.0.1") would also
            # match 10.0.0.10-19, 10.0.0.100-199, ...
            return col == str(net.network_address)
        prefix = ".".join(parts[:keep]) + "."
        return col.startswith(prefix)
    lo, hi = int(net[0]), int(net[-1])
    packed = (
        F.split(col, r"\.")[0].cast("long") * 16777216
        + F.split(col, r"\.")[1].cast("long") * 65536
        + F.split(col, r"\.")[2].cast("long") * 256
        + F.split(col, r"\.")[3].cast("long")
    )
    return packed.between(lo, hi)


def _lit_col(lit: Lit):
    if lit.kind == "list":
        return [x.value for x in lit.value]
    return lit.value


def field_col(path: str):
    """Backtick-quoted Column for a (possibly nested, dotted) path — the
    ONE builder every module uses (expr/pipeline/sigma/core), so quoting
    rules live in a single place."""
    return F.col("`" + path.replace(".", "`.`") + "`")


def dtype_of(schema: T.StructType, path: str) -> T.DataType:
    """Resolve a (possibly nested, dotted) path to its DataType —
    StructType.__getitem__ only accepts top-level names, so every caller
    handling `a.b.c` paths from the extractors goes through here."""
    cur: T.DataType = schema
    for part in path.split("."):
        if not isinstance(cur, T.StructType):
            raise KeyError(f"{path!r}: {part!r} is not a struct field")
        cur = cur[part].dataType
    return cur


def _one_pred(path: str, dt: T.DataType, op: str, rhs: Lit) -> Column:
    c = field_col(path)
    if op in ("==", "!="):
        if rhs.kind == "null":
            base = c.isNull()
        elif rhs.kind == "subnet":
            base = _subnet_pred(c, rhs.value)  # ip == subnet ≡ containment
        else:
            base = c == F.lit(rhs.value)
        return ~base if op == "!=" else base
    if op in ("<", "<=", ">", ">="):
        lit = F.lit(rhs.value)
        return {"<": c < lit, "<=": c <= lit, ">": c > lit, ">=": c >= lit}[op]
    if op in ("in", "!in"):
        if rhs.kind == "subnet":
            base = _subnet_pred(c, rhs.value)
        elif rhs.kind == "list":
            base = c.isin(_lit_col(rhs))
        elif rhs.kind == "str" and isinstance(dt, T.StringType):
            # "sub" in field → substring (value matrix expressions.md:74)
            raise ValueError("substring uses `lhs-literal in field` form")
        else:
            raise ValueError(f"unsupported in-rhs {rhs.kind}")
        return ~base if op == "!in" else base
    if op in ("ni", "!ni"):
        # field ni value == value in field (reference "in" read right to
        # left): substring for strings, membership for arrays
        if isinstance(dt, T.ArrayType):
            base = F.array_contains(c, F.lit(rhs.value))
        else:
            base = c.contains(F.lit(str(rhs.value)))
        return ~base if op == "!ni" else base
    raise ValueError(f"unsupported op {op}")


def _compile_pred(pred: Pred, schema: T.StructType) -> Column:
    lhs, op, rhs = pred.lhs, pred.op, pred.rhs

    # literal-lhs forms: "sub" in field / value ni field
    if isinstance(lhs, Lit) and isinstance(rhs, (FieldX, TypeX)):
        fields = (
            _fields_for_suffix(schema, rhs.path)
            if isinstance(rhs, FieldX)
            else _fields_for_type(schema, rhs.name)
        )
        if op in ("in", "ni", "!in", "!ni"):
            # value contained in field (string/list); negated forms bind
            # as a CONJUNCTION over matching fields (reference
            # expression_visitors.cpp:443-445: is_negated -> conjunction)
            neg = op.startswith("!")
            cols = []
            for p, dt in fields:
                if not isinstance(dt, (T.ArrayType, T.StringType)):
                    # type-incompatible field: the reference's
                    # type_resolver silently drops it from the connective
                    # (expression_visitors.cpp compatible() filter) — a
                    # numeric/bool field cannot host substring containment
                    continue
                c = field_col(p)
                if isinstance(dt, T.ArrayType):
                    base = F.array_contains(c, F.lit(lhs.value))
                else:
                    base = c.contains(F.lit(str(lhs.value)))
                cols.append(~base if neg else base)
            if not cols:
                return F.lit(False)
            out = cols[0]
            for c in cols[1:]:
                out = out & c if neg else out | c
            return out
        # mirrored comparison: 42 < x ≡ x > 42
        mirror = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==", "!=": "!="}
        return _compile_pred(Pred(rhs, mirror[op], lhs), schema)

    if not isinstance(rhs, Lit):
        raise ValueError("field-to-field predicates are not in TQL1")

    fields = (
        _fields_for_suffix(schema, lhs.path)
        if isinstance(lhs, FieldX)
        else _fields_for_type(schema, lhs.name)
    )
    if not fields:
        # unresolved extractor: the reference skips schemas with no match →
        # the predicate is false for every row of this schema, for EVERY
        # operator including '!=' (an unmatched extractor never binds, so
        # `x != 5` does not fire either; `!(x == 5)` — a Not around the
        # predicate — still negates to true, matching reference semantics)
        return F.lit(False)
    if op in ("ni", "!ni"):
        # substring/membership only binds string and array fields; the
        # reference's type_resolver drops incompatible fields from the
        # connective instead of erroring (expression_visitors.cpp
        # compatible() filter) — without this a numeric field bound by a
        # suffix extractor raises AnalysisException at plan time
        fields = [(p, dt) for p, dt in fields
                  if isinstance(dt, (T.ArrayType, T.StringType))]
        if not fields:
            return F.lit(False)
    cols = [_one_pred(p, dt, op, rhs) for p, dt in fields]
    # a multi-field binding is a DISJUNCTION for positive operators but a
    # CONJUNCTION for negated ones (reference expression_visitors.cpp:
    # 443-445, is_negated(op) -> conjunction): `port != 443` must reject
    # a row where ANY bound field is 443 (_one_pred already returns the
    # per-field negative, so the combine is AND)
    neg = op in ("!=", "!in", "!ni")
    out = cols[0]
    for c in cols[1:]:
        out = out & c if neg else out | c
    return out


def compile_expr(expr, schema: T.StructType) -> Column:
    """Compile a parsed (or textual) TQL expression against a schema."""
    if isinstance(expr, str):
        expr = parse_expr(expr)
    if isinstance(expr, And):
        out = compile_expr(expr.items[0], schema)
        for e in expr.items[1:]:
            out = out & compile_expr(e, schema)
        return out
    if isinstance(expr, Or):
        out = compile_expr(expr.items[0], schema)
        for e in expr.items[1:]:
            out = out | compile_expr(e, schema)
        return out
    if isinstance(expr, Not):
        return ~compile_expr(expr.item, schema)
    if isinstance(expr, Pred):
        return _compile_pred(expr, schema)
    raise ValueError(f"bad node {expr}")


def where_tql(df: DataFrame, text: str) -> DataFrame:
    """`where <expr>` with TQL expression text (where.cpp:72-104); the
    compiled predicate is a plain Catalyst filter → pushdown/pruning free."""
    return df.filter(compile_expr(text, df.schema))
