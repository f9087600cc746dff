"""Sigma detection-rule transpiler → Catalyst predicate.

Reference parity: the `sigma` operator compiles Sigma YAML rules into the
expression language and runs them as `where` + `put`
(web/docs/operators/sigma.md:20-60, plugins/sigma). We compile straight to
a Catalyst Column instead — same pipeline position, Spark-vectorized
evaluation, pushdown-eligible.

Supported (public Sigma spec, sigmahq.io):
- detection: named selections (maps and lists), `condition` expression with
  and/or/not, parentheses, `1 of <pat>`, `all of <pat>`, `them`
- field modifiers: contains, startswith, endswith, re, cased (exact-case);
  list values OR together; map entries AND together
- field names resolve with the engine's suffix semantics (plans/expr.py) so
  one rule matches any schema carrying the field — the reference's
  multi-schema behavior.

Matching events are tagged (the reference `put`s the rule title into the
event) via ``sigma_tag``.
"""

from __future__ import annotations

import fnmatch
import re

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tenzir_spark.plans.expr import _fields_for_suffix


def _field_col(schema: T.StructType, name: str) -> list[Column]:
    fields = _fields_for_suffix(schema, name)
    from tenzir_spark.plans.expr import field_col

    return [field_col(p) for p, _t in fields]


def _sigma_scan(s: str) -> list[tuple[str, str]]:
    """Sigma escaping (spec §escaping): ``\\\\`` → literal backslash,
    ``\\*``/``\\?`` → literal wildcard char, bare ``*``/``?`` → wildcard.
    Returns [(kind, char)] with kind in {lit, wild}."""
    out, i = [], 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s) and s[i + 1] in ("\\", "*", "?"):
            out.append(("lit", s[i + 1]))
            i += 2
        elif ch in ("*", "?"):
            out.append(("wild", ch))
            i += 1
        else:
            out.append(("lit", ch))
            i += 1
    return out


def _value_pred(col: Column, value, modifiers: list[str]) -> Column:
    """One (field, value) predicate under Sigma modifiers. Sigma matching is
    case-insensitive by default; wildcards * and ? are honored in plain
    matches."""
    cased = "cased" in modifiers
    if value is None:
        return col.isNull()
    if "re" in modifiers:
        return col.cast("string").rlike(str(value))
    if isinstance(value, (int, float)) and not isinstance(value, bool) and not modifiers:
        return col == F.lit(value)
    if isinstance(value, bool) and not modifiers:
        return col == F.lit(value)

    toks = _sigma_scan(str(value))
    c = col.cast("string")
    lit = "".join(ch for _k, ch in toks)  # wildcards treated literally
    if not cased:
        c = F.lower(c)
        lit = lit.lower()
    if "contains" in modifiers:
        return c.contains(lit)
    if "startswith" in modifiers:
        return c.startswith(lit)
    if "endswith" in modifiers:
        return c.endswith(lit)
    if any(k == "wild" for k, _ in toks):
        rx = "^" + "".join(
            ".*" if k == "wild" and ch == "*"
            else "." if k == "wild"
            else re.escape(ch if cased else ch.lower())
            for k, ch in toks
        ) + "$"
        return c.rlike(rx)
    return c == F.lit(lit)


def _or_all(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _and_all(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _selection_pred(schema: T.StructType, sel) -> Column:
    """A selection: map → AND of field predicates (each field's value list
    ORs); list of maps → OR of the maps; list of scalars → keyword search
    over all string fields."""
    if isinstance(sel, list):
        if sel and isinstance(sel[0], dict):
            return _or_all([_selection_pred(schema, m) for m in sel])
        # keyword list: any string field contains any keyword
        from tenzir_spark.plans.expr import _walk_fields, field_col

        str_cols = [
            field_col(p)
            for p, t in _walk_fields(schema)
            if isinstance(t, T.StringType)
        ]
        if not str_cols:
            return F.lit(False)
        preds = [
            F.lower(c).contains(str(kw).lower()) for c in str_cols for kw in sel
        ]
        return _or_all(preds)
    if not isinstance(sel, dict):
        raise ValueError(f"bad selection {sel!r}")
    parts: list[Column] = []
    for key, value in sel.items():
        name, *modifiers = key.split("|")
        cols = _field_col(schema, name)
        if not cols:
            parts.append(F.lit(False))
            continue
        values = value if isinstance(value, list) else [value]
        per_field = [
            _or_all([_value_pred(c, v, modifiers) for v in values]) for c in cols
        ]
        parts.append(_or_all(per_field))
    return _and_all(parts) if parts else F.lit(False)


_COND_TOKEN = re.compile(r"\(|\)|\band\b|\bor\b|\bnot\b|1 of [\w*]+|all of [\w*]+|\bthem\b|[\w*]+")


def _compile_condition(cond: str, sel_preds: dict[str, Column]) -> Column:
    toks = _COND_TOKEN.findall(cond)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def names_matching(pat: str) -> list[Column]:
        if pat == "them":
            return list(sel_preds.values())
        matches = [v for k, v in sel_preds.items() if fnmatch.fnmatch(k, pat)]
        if not matches:
            raise ValueError(f"no selection matches {pat!r}")
        return matches

    def atom() -> Column:
        t = eat()
        if t == "(":
            e = disj()
            assert eat() == ")"
            return e
        if t == "not":
            return ~atom()
        if t.startswith("1 of "):
            return _or_all(names_matching(t[5:]))
        if t.startswith("all of "):
            return _and_all(names_matching(t[7:]))
        if t == "them":
            return _and_all(list(sel_preds.values()))
        if t in sel_preds:
            return sel_preds[t]
        raise ValueError(f"unknown selection {t!r} in condition")

    def conj() -> Column:
        e = atom()
        while peek() == "and":
            eat()
            e = e & atom()
        return e

    def disj() -> Column:
        e = conj()
        while peek() == "or":
            eat()
            e = e | conj()
        return e

    out = disj()
    if pos != len(toks):
        raise ValueError(f"trailing condition tokens {toks[pos:]}")
    return out


def compile_sigma(rule_yaml: str, schema: T.StructType) -> tuple[str, Column]:
    """Compile one Sigma rule; returns (title, predicate)."""
    rule = yaml.safe_load(rule_yaml)
    det = rule["detection"]
    cond = det.get("condition", "them")
    sel_preds = {
        name: _selection_pred(schema, sel)
        for name, sel in det.items()
        if name != "condition"
    }
    if not sel_preds:
        raise ValueError("rule has no selections")
    return rule.get("title", "sigma_rule"), _compile_condition(cond, sel_preds)


def sigma(df: DataFrame, rule_yaml: str, tag_col: str = "sigma_tag") -> DataFrame:
    """`sigma <rule>`: keep matching events, tagged with the rule title."""
    title, pred = compile_sigma(rule_yaml, df.schema)
    return df.filter(pred).withColumn(tag_col, F.lit(title))


def sigma_multi(df: DataFrame, rules: list[str], tag_col: str = "sigma_tag") -> DataFrame:
    """Run many rules in ONE pass: a single projection computes every
    predicate; matching rows fan out per matching rule via an array+explode
    (no per-rule scans — at 100 TB you never rescan per rule)."""
    compiled = [compile_sigma(r, df.schema) for r in rules]
    tags = F.array_compact(
        F.array(*[F.when(pred, F.lit(title)) for title, pred in compiled])
    )
    return (
        df.withColumn("_tags", tags)
        .filter(F.size("_tags") > 0)
        .withColumn(tag_col, F.explode("_tags"))
        .drop("_tags")
    )
