from tenzir_spark.sources.formats import (
    parse_cef,
    parse_leef,
    parse_syslog3164,
    parse_syslog5424,
    parse_xsv_line,
    read_lines,
    read_xsv,
    read_zeek_tsv,
)

__all__ = [
    "parse_cef",
    "parse_leef",
    "parse_syslog3164",
    "parse_syslog5424",
    "parse_xsv_line",
    "read_lines",
    "read_xsv",
    "read_zeek_tsv",
]
