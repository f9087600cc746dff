"""YARA-subset matching (operators/yara.py): text/hex/regex strings,
condition algebra, N-rules-one-scan, unsupported constructs rejected."""

import pytest
from pyspark.sql import Row

from tenzir_spark.operators.yara import YaraError, parse_rules, yara_match

RULES = r"""
rule EvilString
{
    meta:
        author = "analyst"
    strings:
        $a = "EVIL" nocase
        $b = "badurl.example"
    condition:
        any of them
}

rule HexAndRegex
{
    strings:
        $h = { DE AD BE EF }
        $r = /cmd\.exe\s+\/c/
    condition:
        $h and not $r
}

rule TwoOfThree
{
    strings:
        $x = "alpha"
        $y = "beta"
        $z = "gamma"
    condition:
        2 of them
}
"""


@pytest.fixture(scope="module")
def data(spark):
    rows = [
        Row(id=0, blob=b"nothing interesting here"),
        Row(id=1, blob=b"contains eViL stuff"),
        Row(id=2, blob=b"link to badurl.example/payload"),
        Row(id=3, blob=b"\x00\x01\xde\xad\xbe\xef\x02"),
        Row(id=4, blob=b"\xde\xad\xbe\xef cmd.exe /c whoami"),
        Row(id=5, blob=b"alpha then beta"),
        Row(id=6, blob=b"alpha only"),
    ]
    return spark.createDataFrame(rows)


def test_rules_parse():
    rules = parse_rules(RULES)
    assert [r["name"] for r in rules] == ["EvilString", "HexAndRegex", "TwoOfThree"]
    assert rules[0]["meta"] == {"author": "analyst"}
    assert rules[0]["strings"]["a"] == ("text", "EVIL", True)
    assert rules[1]["strings"]["h"] == ("hex", b"\xde\xad\xbe\xef", False)


def test_match_semantics(data):
    got = {r["id"]: list(r["yara_matches"])
           for r in yara_match(data, RULES, "blob").collect()}
    assert got == {
        1: ["EvilString"],           # nocase text
        2: ["EvilString"],           # second string, any-of
        3: ["HexAndRegex"],          # hex bytes, regex absent
        5: ["TwoOfThree"],           # 2 of 3 strings
    }
    # id 4 has the hex AND the regex -> `$h and not $r` fails; id 6 has 1/3


def test_keep_nonmatching(data):
    all_rows = yara_match(data, RULES, "blob", keep_nonmatching=True).collect()
    assert len(all_rows) == 7
    assert [r for r in all_rows if r["id"] == 0][0]["yara_matches"] == []


def test_unsupported_constructs_rejected(data):
    with pytest.raises(YaraError, match="wildcards"):
        yara_match(data, 'rule W { strings: $a = { 6A ?? } condition: $a }\n',
                   "blob")
    with pytest.raises(YaraError, match="unknown string"):
        yara_match(data, "rule U { strings: $a = \"x\" condition: $missing }\n",
                   "blob")
    with pytest.raises(YaraError, match="missing condition"):
        parse_rules("rule M { strings: $a = \"x\"\n}\n")
    with pytest.raises(YaraError, match="no rules"):
        parse_rules("not yara at all")
