"""Format parsers — the reference's bytes→events layer (SURVEY.md §2.2).

Each reference format plugin becomes either a thin ``spark.read`` wrapper
(file level) or a Column-level parser usable on any string column (the
``parse <field> <fmt>`` form, libtenzir/builtins/operators/parse.cpp).
Everything stays JVM-side (split/regexp/from_csv — whole-stage codegen);
no Python in the hot path.

Reference parity map:
- lines     -> libtenzir/builtins/formats/lines.cpp (newline-split strings)
- csv/tsv/ssv/xsv -> libtenzir/builtins/formats/xsv.cpp (configurable
  field separator, ``:36-75``)
- syslog    -> libtenzir/builtins/formats/syslog.cpp (RFC3164 + RFC5424)
- cef       -> libtenzir/builtins/formats/cef.cpp (header '|' split +
  key=value extension)
- leef      -> libtenzir/builtins/formats/leef.cpp (LEEF:1.0/2.0 header +
  tab- or custom-delimited extension)
- zeek-tsv  -> libtenzir/builtins/formats/zeek_tsv.cpp (typed TSV with
  #fields/#types directives)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# file-level sources
# ---------------------------------------------------------------------------


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """``read lines`` — one string event per line (lines.cpp)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_xsv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    infer: bool = True,
) -> DataFrame:
    """``read csv|tsv|ssv`` (xsv.cpp) — separator-configurable, schema
    inference like the reference's series_builder."""
    return (
        spark.read.option("header", header)
        .option("inferSchema", infer)
        .option("sep", sep)
        .csv(path)
    )


def read_zeek_tsv(spark: SparkSession, path: str) -> DataFrame:
    """``read zeek-tsv`` (zeek_tsv.cpp): Zeek's typed TSV — ``#fields`` /
    ``#types`` directive lines drive names and casts.

    The directives live in the first few lines of each file; they are tiny
    and driver-read once (the reference parses them per-file too). The data
    rows are then a plain distributed CSV scan with explicit names+casts —
    no inference, no Python.
    """
    head = [r[0] for r in spark.read.text(path).limit(16).collect()]
    fields: list[str] = []
    types: list[str] = []
    set_sep = "\t"
    unset = "-"
    empty = "(empty)"
    for line in head:
        if line.startswith("#separator"):
            v = line.split(" ", 1)[1].strip()
            set_sep = bytes(v, "utf-8").decode("unicode_escape") if v.startswith("\\x") else v
        elif line.startswith("#unset_field"):
            unset = line.split(set_sep, 1)[1]
        elif line.startswith("#empty_field"):
            empty = line.split(set_sep, 1)[1]
        elif line.startswith("#fields"):
            fields = line.split(set_sep)[1:]
        elif line.startswith("#types"):
            types = line.split(set_sep)[1:]
    if not fields:
        raise ValueError(f"no #fields directive found in {path}")

    zeek_to_spark = {
        "bool": "boolean",
        "count": "bigint",
        "int": "bigint",
        "double": "double",
        "time": "double",      # epoch seconds; cast to timestamp downstream
        "interval": "double",
        "string": "string",
        "port": "int",
        "addr": "string",
        "subnet": "string",
        "enum": "string",
    }
    raw = (
        spark.read.option("sep", set_sep)
        .option("header", False)
        .schema(" ".join(f"`{f}` string," for f in fields).rstrip(",").replace(",", ", "))
        .csv(path)
        .filter(~F.col(f"`{fields[0]}`").startswith("#"))
    )
    cols = []
    for f_name, z_type in zip(fields, types or ["string"] * len(fields)):
        c = F.col(f"`{f_name}`")  # zeek names contain dots (id.orig_h)
        c = F.when((c == unset) | (c == empty), None).otherwise(c)
        base = z_type.split("[", 1)[0]  # vector[x] -> x handled as string list
        if z_type.startswith(("vector[", "set[")):
            cols.append(F.split(c, ",").alias(f_name))
        else:
            cols.append(c.cast(zeek_to_spark.get(base, "string")).alias(f_name))
    return raw.select(*cols)


# ---------------------------------------------------------------------------
# column-level parsers (``parse <field> <fmt>``)
# ---------------------------------------------------------------------------


def parse_xsv_line(col: Column | str, field_names: list[str], sep: str = ",") -> list[Column]:
    """Split one xsv line into named string columns (xsv.cpp row path)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, sep)
    return [parts.getItem(i).alias(n) for i, n in enumerate(field_names)]


# RFC3164: <PRI>Mmm dd hh:mm:ss host tag[pid]: content   (syslog.cpp legacy path)
_RFC3164 = (
    r"^(?:<(\d+)>)?"                                  # 1 pri
    r"([A-Z][a-z]{2}\s+\d{1,2}\s\d{2}:\d{2}:\d{2})\s" # 2 timestamp
    r"(\S+)\s"                                        # 3 hostname
    r"([^\s\[:]+)(?:\[(\d+)\])?:?\s?"                 # 4 app, 5 pid
    r"(.*)$"                                          # 6 content
)


def parse_syslog3164(col: Column | str) -> list[Column]:
    """RFC3164 (BSD syslog) fields; pri decomposes into facility/severity
    (facility = pri >> 3, severity = pri & 7)."""
    c = F.col(col) if isinstance(col, str) else col
    pri = F.nullif(F.regexp_extract(c, _RFC3164, 1), F.lit("")).cast("int")
    return [
        (pri / 8).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        F.regexp_extract(c, _RFC3164, 2).alias("timestamp"),
        F.regexp_extract(c, _RFC3164, 3).alias("hostname"),
        F.regexp_extract(c, _RFC3164, 4).alias("app_name"),
        F.nullif(F.regexp_extract(c, _RFC3164, 5), F.lit("")).cast("long").alias("process_id"),
        F.regexp_extract(c, _RFC3164, 6).alias("content"),
    ]


# RFC5424: <PRI>VERSION TS HOST APP PROCID MSGID [SD] MSG  (syslog.cpp:header parser)
_RFC5424 = (
    r"^<(\d+)>(\d+)\s(\S+)\s(\S+)\s(\S+)\s(\S+)\s(\S+)\s(?:(\[.*\])|-)\s?(.*)$"
)


def _sd_map(sd: Column) -> Column:
    """RFC5424 STRUCTURED-DATA → map<string,string> keyed ``sdid.param``
    (reference parses SD into a record of records, syslog.cpp's
    structured-data parser; the flattened dotted-key map is the engine's
    record-flattening convention). Pure higher-order expressions:
    regexp_extract_all over elements, nested transform over params,
    map_from_entries. Limitation (documented): param values containing an
    escaped ``\\]`` split the element early — fine for conformant
    producers, which must escape ``]`` as ``\\]`` only inside values."""
    elems = F.regexp_extract_all(sd, F.lit(r"\[([^\]]*)\]"), F.lit(1))

    def entries(e: Column) -> Column:
        sid = F.regexp_extract(e, r"^(\S+)", 1)
        kvs = F.regexp_extract_all(e, F.lit(r'[\w.@-]+="[^"]*"'), F.lit(0))
        return F.transform(
            kvs,
            lambda kv: F.struct(
                F.concat(
                    sid, F.lit("."), F.regexp_extract(kv, r'^([\w.@-]+)=', 1)
                ).alias("key"),
                F.regexp_extract(kv, r'^[\w.@-]+="([^"]*)"', 1).alias("value"),
            ),
        )

    return F.map_from_entries(F.flatten(F.transform(elems, entries)))


def parse_syslog5424(col: Column | str) -> list[Column]:
    """RFC5424 fields; octet-framing tolerant (RFC6587 ``123 <34>1 …``
    length prefixes are stripped), STRUCTURED-DATA parsed into a
    ``sdid.param`` → value map (raw form kept in structured_data_raw)."""
    raw = F.col(col) if isinstance(col, str) else col
    # octet-counting frame (RFC6587 §3.4.1): leading MSG-LEN digits + SP
    c = F.regexp_replace(raw, r"^\d+\s+(?=<)", "")
    pri = F.regexp_extract(c, _RFC5424, 1).cast("int")

    def g(i: int, name: str, typ: str | None = None) -> Column:
        e = F.nullif(F.regexp_extract(c, _RFC5424, i), F.lit("-"))
        return (e.cast(typ) if typ else e).alias(name)

    sd_raw = F.nullif(F.regexp_extract(c, _RFC5424, 8), F.lit(""))
    return [
        (pri / 8).cast("int").alias("facility"),
        F.pmod(pri, F.lit(8)).cast("int").alias("severity"),
        g(2, "version", "int"),
        g(3, "timestamp"),
        g(4, "hostname"),
        g(5, "app_name"),
        g(6, "process_id"),
        g(7, "message_id"),
        _sd_map(sd_raw).alias("structured_data"),
        sd_raw.alias("structured_data_raw"),
        g(9, "message"),
    ]


def parse_cef(col: Column | str) -> list[Column]:
    """CEF:version|vendor|product|device_version|sig_id|name|severity|ext
    (cef.cpp). Header is a 7-way '|' split; the extension is key=value
    pairs → map column."""
    c = F.col(col) if isinstance(col, str) else col
    body = F.regexp_replace(c, r"^CEF:", "")
    parts = F.split(body, r"(?<!\\)\|", 8)
    names = [
        "cef_version", "device_vendor", "device_product",
        "device_version", "signature_id", "name", "severity",
    ]
    out = [parts.getItem(i).alias(n) for i, n in enumerate(names)]
    out[0] = parts.getItem(0).cast("int").alias("cef_version")
    ext = parts.getItem(7)
    out.append(F.str_to_map(ext, F.lit(r"\s+(?=\S+=)"), F.lit("=")).alias("extension"))
    return out


def parse_yaml_field(df: DataFrame, field: str, schema: str,
                     out: str = "parsed") -> DataFrame:
    """``read yaml`` analog (yaml.cpp): YAML documents in a string column →
    typed struct. YAML needs a real parser (pyyaml) — Arrow-batched
    mapInPandas keeps it out of the row-at-a-time path; the JSON hop lets
    Spark's schema machinery do the typing."""
    import json

    import pandas as pd
    import yaml as _yaml

    src_cols = df.columns

    def _parse(batches):
        for pdf in batches:
            js = pdf[field].map(
                lambda s: None if s is None else json.dumps(_yaml.safe_load(s))
            )
            yield pdf.assign(_yaml_json=js)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("_yaml_json", T.StringType())]
    )
    with_json = df.mapInPandas(_parse, out_schema)
    return with_json.select(
        *src_cols, F.from_json("_yaml_json", schema).alias(out)
    )


def parse_leef(col: Column | str, delim: str = r"\t") -> list[Column]:
    """LEEF:version|vendor|product|product_version|event_id|attrs
    (leef.cpp); attributes are delimiter-separated key=value pairs."""
    c = F.col(col) if isinstance(col, str) else col
    body = F.regexp_replace(c, r"^LEEF:", "")
    parts = F.split(body, r"(?<!\\)\|", 6)
    names = ["leef_version", "vendor", "product_name", "product_version", "event_id"]
    out = [parts.getItem(i).alias(n) for i, n in enumerate(names)]
    out.append(F.str_to_map(parts.getItem(5), F.lit(delim), F.lit("=")).alias("attributes"))
    return out


# ---------------------------------------------------------------------------
# gelf / suricata / zeek-json (web/docs/formats/{gelf,suricata,zeek-json}.md)
# ---------------------------------------------------------------------------

_GELF_KNOWN = ("version string, host string, short_message string, "
               "full_message string, timestamp double, level int, "
               "facility string, line bigint, file string")


def parse_gelf(col: Column | str) -> list[Column]:
    """GELF 1.1 (gelf.md; public Graylog spec): the spec's named fields
    become typed columns (``level`` defaults to 1 per the spec), and the
    user-defined ``_``-prefixed additional fields land in an
    ``additional`` map — two ``from_json`` passes over the same string,
    both Catalyst-native (struct for the known shape, open string map
    filtered to ``_`` keys for the rest)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.from_json(c, _GELF_KNOWN)
    extras = F.map_filter(
        F.from_json(c, "map<string,string>"),
        lambda k, _v: k.startswith("_"),
    )
    return [
        s["version"].alias("version"),
        s["host"].alias("host"),
        s["short_message"].alias("short_message"),
        s["full_message"].alias("full_message"),
        F.timestamp_seconds(s["timestamp"]).alias("timestamp"),
        F.coalesce(s["level"], F.lit(1)).alias("level"),
        extras.alias("additional"),
    ]


def read_gelf(spark: SparkSession, path: str) -> DataFrame:
    """``read gelf`` — a stream of JSON records separated by ``\\0``
    bytes (gelf.md: "Tenzir parses GELF as a stream of JSON records
    separated by a \\0 byte"; lone unframed messages parse too, since a
    separator-free file is one record). Chunked-mode datagrams are not
    supported, matching the reference."""
    raw = spark.read.option("lineSep", "\x00").text(path)
    return (
        raw.filter(F.trim(F.col("value")) != "")
        .select(*parse_gelf(F.col("value")))
    )


def read_suricata(spark: SparkSession, path: str) -> DataFrame:
    """``read suricata`` — EVE JSON; per suricata.md this is exactly
    ``json --ndjson --selector=event_type:suricata``, so the schema name
    is derived from the ``event_type`` field into ``_schema``."""
    df = spark.read.json(path)
    return df.withColumn(
        "_schema", F.concat(F.lit("suricata."), F.col("event_type")))


def read_zeek_json(spark: SparkSession, path: str) -> DataFrame:
    """``read zeek-json`` — per zeek-json.md an alias for ``json
    --ndjson --selector=_path:zeek --unnest-separator="."``: dotted keys
    (``id.orig_h``) rebuild into nested records via the shared unflatten
    operator, and ``_schema`` carries ``zeek.<_path>``."""
    from tenzir_spark.operators.structural import unflatten

    df = spark.read.json(path)
    df = df.withColumn("_schema", F.concat(F.lit("zeek."), F.col("_path")))
    return unflatten(df.drop("_path"))
