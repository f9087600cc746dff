"""Grok pattern library + compiler (reference:
libtenzir/builtins/formats/grok.cpp, which bundles the standard
logstash-style pattern set and resolves ``%{NAME:field}`` recursively).

Re-implemented from public knowledge of the grok convention: a pattern
library maps names to regex fragments which may themselves reference
``%{OTHER}``; ``%{NAME:field}`` binds the expansion to a named capture.
The compiler expands to ONE Java regex with named groups, then extracts
each bound field with ``regexp_extract`` on its group index — plain
Catalyst expressions, codegen'd, no Python in the row path.

Library fragments use non-capturing groups ``(?:...)`` exclusively, so
group indices are exactly the user's bindings in source order.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Standard grok base patterns (public logstash convention), written as
# non-capturing regexes. Not exhaustive — the common log-parsing core.
PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "BASE10NUM": r"(?:[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "BOOLEAN": r"(?i)(?:true|false)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    ),
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|%{IPV4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"]+)*\"|'(?:\\.|[^\\']+)*')",
    "QS": r"%{QUOTEDSTRING}",
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+.-]+)+",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    # calendar / time
    "MONTH": (
        r"\b(?:[Jj]an(?:uary)?|[Ff]eb(?:ruary)?|[Mm]ar(?:ch)?|[Aa]pr(?:il)?"
        r"|[Mm]ay|[Jj]un(?:e)?|[Jj]ul(?:y)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?"
        r"|[Oo]ct(?:ober)?|[Nn]ov(?:ember)?|[Dd]ec(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"%{SECOND}",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE"
        r"|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?"
        r"|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?"
        r"|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
    # composites
    "SYSLOGPROG": r"%{NOTSPACE}(?:\[%{POSINT}\])?",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} "
        r"%{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": (
        r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}"
    ),
}

_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


def expand(pattern: str, library: dict[str, str] | None = None,
           _depth: int = 0) -> tuple[str, list[str]]:
    """Expand ``%{NAME}`` / ``%{NAME:field}`` references recursively into
    one Java regex. Returns (regex, fields-in-capture-order). Bindings
    become plain capturing groups; everything else stays non-capturing,
    so group i+1 <=> fields[i]."""
    lib = {**PATTERNS, **(library or {})}
    if _depth > 20:
        raise ValueError("grok pattern recursion too deep (cycle?)")
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        name, bind = m.group(1), m.group(2)
        if name not in lib:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        inner, inner_fields = expand(lib[name], library, _depth + 1)
        if bind:
            fields.append(bind)
            out = f"({inner})"
            # inner bindings capture AFTER the enclosing group opens
            fields.extend(inner_fields)
            return out
        fields.extend(inner_fields)
        return f"(?:{inner})"

    out = _REF.sub(sub, pattern)
    return out, fields


def parse_grok(df: DataFrame, field: str, pattern: str,
               library: dict[str, str] | None = None) -> DataFrame:
    """``read grok`` / ``parse <f> grok`` (grok.cpp): expand the pattern
    against the library and extract every bound field into a column.
    Non-matching lines yield empty strings (regexp_extract semantics),
    matching the reference's null-on-miss behavior closely enough for
    filters; each extraction is a codegen'd JVM regex evaluation."""
    regex, fields = expand(pattern, library)
    out = df
    for i, name in enumerate(fields, start=1):
        out = out.withColumn(name.replace(".", "_"),
                             F.regexp_extract(F.col(field), regex, i))
    return out
