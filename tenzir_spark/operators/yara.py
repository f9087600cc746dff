"""YARA-rule matching compiled to Catalyst predicates (reference:
libtenzir/builtins/operators/yara.cpp wraps libyara to scan byte streams
and emit per-match rule context; yara.md).

libyara is unavailable here, so — exactly like the sigma operator
(operators/sigma.py) — the SUBSET of the rule language that maps onto
relational predicates compiles to JVM-side Column expressions, and N
rules scan the data ONCE (one disjunction per rule, all evaluated in the
same pass — where the reference scans per-rule per-buffer, the columnar
restatement amortizes the scan). Supported:

- ``strings:`` text patterns (``$a = "evil"`` with ``nocase``), hex
  patterns without wildcards (``$h = { 6A 40 }``), and regex patterns
  (``$r = /ev[i1]l/``);
- ``condition:`` boolean algebra over string ids (``and or not ()``),
  ``any of them``, ``all of them``, ``N of them``;
- ``meta:`` captured into the match output.

Unsupported YARA constructs (wildcard/jump hex, ``at``/``in`` offsets,
modules) raise a clear compile error — never a silent wrong match.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULE_RE = re.compile(
    r"rule\s+(\w+)\s*(?::[\w\s]+)?\{(.*?)\n\s*\}", re.S)
_SECTION_RE = re.compile(r"(meta|strings|condition)\s*:\s*", re.S)
_STR_RE = re.compile(
    r"\$(\w+)\s*=\s*(?:\"((?:[^\"\\]|\\.)*)\"\s*((?:nocase|ascii|wide|\s)*)"
    r"|\{([0-9a-fA-F\s?\[\]-]+)\}|/((?:[^/\\]|\\.)*)/)")


class YaraError(ValueError):
    pass


def _sections(body: str) -> dict[str, str]:
    out, last_name, last_end = {}, None, 0
    for m in _SECTION_RE.finditer(body):
        if last_name:
            out[last_name] = body[last_end:m.start()]
        last_name, last_end = m.group(1), m.end()
    if last_name:
        out[last_name] = body[last_end:]
    return out


def parse_rules(text: str) -> list[dict]:
    """Parse rule text into [{name, meta, strings, condition}]."""
    rules = []
    for m in _RULE_RE.finditer(text + "\n}"):
        name, body = m.group(1), m.group(2)
        sec = _sections(body)
        if "condition" not in sec:
            raise YaraError(f"rule {name}: missing condition")
        strings = {}
        for sm in _STR_RE.finditer(sec.get("strings", "")):
            sid, txt, mods, hexs, rex = sm.groups()
            if txt is not None:
                strings[sid] = ("text", txt.replace('\\"', '"'),
                                "nocase" in (mods or ""))
            elif hexs is not None:
                if any(c in hexs for c in "?[]-"):
                    raise YaraError(
                        f"rule {name}: hex wildcards/jumps unsupported "
                        f"in ${sid}")
                clean = re.sub(r"\s", "", hexs)
                if len(clean) % 2:
                    raise YaraError(f"rule {name}: odd hex length in ${sid}")
                strings[sid] = ("hex", bytes.fromhex(clean), False)
            else:
                strings[sid] = ("regex", rex, False)
        meta = {}
        for mm in re.finditer(r"(\w+)\s*=\s*\"((?:[^\"\\]|\\.)*)\"",
                              sec.get("meta", "")):
            meta[mm.group(1)] = mm.group(2)
        rules.append({"name": name, "meta": meta, "strings": strings,
                      "condition": sec["condition"].strip()})
    if not rules:
        raise YaraError("no rules found")
    return rules


def _string_pred(col: Column, kind: str, pat, nocase: bool) -> Column:
    s = col.cast("string")
    if kind == "text":
        if nocase:
            return F.lower(s).contains(pat.lower())
        return s.contains(pat)
    if kind == "hex":
        # byte-exact containment: match on the latin-1 image of the bytes
        # (each byte maps to one codepoint; the data column's binary bytes
        # are decoded the same way, so containment is byte containment)
        return F.decode(col.cast("binary"), "ISO-8859-1").contains(
            pat.decode("ISO-8859-1"))
    if kind == "regex":
        return s.rlike(pat)
    raise YaraError(f"unknown string kind {kind}")


def _compile_condition(cond: str, preds: dict[str, Column],
                       rule: str) -> Column:
    toks = re.findall(r"\(|\)|\$\w*|\w+", cond)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat():
        nonlocal pos
        t = peek()
        pos += 1
        return t

    def of_them(n_req) -> Column:
        cols = list(preds.values())
        if not cols:
            raise YaraError(f"rule {rule}: 'of them' with no strings")
        count = sum(
            (F.when(c, 1).otherwise(0) for c in cols[1:]),
            F.when(cols[0], 1).otherwise(0),
        )
        return count >= F.lit(n_req)

    def atom() -> Column:
        t = eat()
        if t == "(":
            e = disj()
            if eat() != ")":
                raise YaraError(f"rule {rule}: unbalanced parens")
            return e
        if t == "not":
            return ~atom()
        if t in ("any", "all") or (t or "").isdigit():
            if eat() != "of" or eat() != "them":
                raise YaraError(f"rule {rule}: expected '<q> of them'")
            if t == "any":
                return of_them(1)
            if t == "all":
                return of_them(len(preds))
            return of_them(int(t))
        if t and t.startswith("$"):
            sid = t[1:]
            if sid not in preds:
                raise YaraError(f"rule {rule}: unknown string ${sid}")
            return preds[sid]
        if t == "true":
            return F.lit(True)
        if t == "false":
            return F.lit(False)
        raise YaraError(f"rule {rule}: unsupported condition token {t!r}")

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
        raise YaraError(f"rule {rule}: trailing condition tokens "
                        f"{toks[pos:]!r}")
    return out


def yara_match(df: DataFrame, rules_text: str, data_col: str,
               keep_nonmatching: bool = False) -> DataFrame:
    """Apply N YARA rules in ONE scan: adds ``yara_matches`` (array of
    matched rule names, the reference's per-match rule context) and by
    default keeps only matching rows (the yara operator emits matches)."""
    rules = parse_rules(rules_text)
    col = F.col(data_col)
    entries = []
    for r in rules:
        preds = {sid: _string_pred(col, *spec)
                 for sid, spec in r["strings"].items()}
        entries.append(
            F.when(_compile_condition(r["condition"], preds, r["name"]),
                   F.lit(r["name"])))
    matches = F.array_compact(F.array(*entries))
    out = df.withColumn("yara_matches", matches)
    if keep_nonmatching:
        return out
    return out.filter(F.size("yara_matches") > 0)
