"""Web curation operators: HTML extraction + URL filtering +
classifier-based quality scoring."""

from pyspark.sql import functions as F

from tenzir_spark.operators.selection import quality_classifier
from tenzir_spark.operators.web import (
    html_extract,
    registrable_domain,
    url_filter,
    url_stats,
)


def _one(df, col):
    return df.select(col).first()[0]


def test_html_extract_basic(spark):
    df = spark.createDataFrame(
        [("<html><body><h1>Title</h1><p>Hello   world</p>"
          "<a href='/x'>link</a></body></html>",)],
        "html string")
    out = html_extract(df, "html").first()
    assert out["extracted"] == "Title Hello world link"
    assert out["n_links"] == 1
    assert out["n_tags"] > 0


def test_html_extract_script_style_content_removed(spark):
    # script bodies may contain '<' and quotes; their TEXT must vanish,
    # not merely their tags
    df = spark.createDataFrame(
        [("<script>if(1<2){alert('hi')}</script><style>.a{x:1}</style>"
          "<p>kept</p><!-- gone -->",)],
        "html string")
    out = html_extract(df, "html").first()
    assert out["extracted"] == "kept"


def test_html_extract_entity_decode_order(spark):
    # &amp; decodes LAST: the encoded-encoded form &amp;lt; is content
    # and must surface as the literal string "&lt;", never as "<"
    df = spark.createDataFrame(
        [("a &amp;lt;b&gt; &nbsp;&quot;c&#39;d&amp;e",)], "html string")
    out = html_extract(df, "html").first()
    assert out["extracted"] == 'a &lt;b> "c\'d&e'


def test_registrable_domain_multi_tld(spark):
    df = spark.createDataFrame(
        [("www.example.co.uk",), ("a.b.example.org",), ("localhost",),
         ("shop.example.com.au",), ("co.uk",)],
        "host string")
    got = [r[0] for r in
           df.select(registrable_domain(F.col("host"))).collect()]
    assert got == ["example.co.uk", "example.org", "localhost",
                   "example.com.au", "co.uk"]


def test_url_stats_parse(spark):
    df = spark.createDataFrame(
        [("https://User@Blog.Example.COM:8443/p?q=1#f",),
         ("not a url",),
         ("http://203.0.113.7/x",)],
        "url string")
    rows = url_stats(df, "url").collect()
    assert rows[0]["url_scheme"] == "https"
    assert rows[0]["url_host"] == "blog.example.com"
    assert rows[0]["url_domain"] == "example.com"
    assert not rows[0]["url_is_ip"]
    assert rows[1]["url_host"] == ""
    assert rows[2]["url_is_ip"]


def test_url_filter_blocklist_schemes_ips(spark):
    df = spark.createDataFrame(
        [(1, "https://good.example.com/a"),
         (2, "https://ads.tracker.net/b"),      # blocked domain
         (3, "ftp://files.example.com/c"),      # bad scheme
         (4, "http://203.0.113.7/d"),           # IP literal
         (5, "https://sub.spam.co.uk/e"),       # blocked eTLD+1
         (6, "garbage")],                       # unparseable
        "id int, url string")
    kept = url_filter(df, "url", ["tracker.net", "spam.co.uk"])
    assert sorted(r["id"] for r in kept.collect()) == [1]
    # broadcast anti-join, never a shuffled join on the corpus
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_url_filter_keeps_ip_hosts_when_asked(spark):
    df = spark.createDataFrame(
        [(1, "https://203.0.113.7/d")], "id int, url string")
    assert url_filter(df, "url", [], drop_ip_hosts=False).count() == 1
    assert url_filter(df, "url", []).count() == 0


def test_quality_classifier_deterministic_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, ""), (3, "...")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in
            quality_classifier(df, "text").collect()}
    # empty / punctuation-only docs: no features, stated neutral result
    for d in (2, 3):
        assert rows[d]["n_features"] == 0
        assert rows[d]["qc_margin"] == 0
        assert rows[d]["qc_prob"] == 0.5
        assert rows[d]["qc_keep"]
    # 9 unigrams + 8 bigrams
    assert rows[1]["n_features"] == 17
    assert rows[1]["qc_keep"] == (rows[1]["qc_margin"] >= 0)
    # same text twice -> identical margin (pure function of content)
    again = quality_classifier(df, "text").collect()
    assert {r["doc_id"]: r["qc_margin"] for r in again} \
        == {d: r["qc_margin"] for d, r in rows.items()}


def test_quality_classifier_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id int, text string")
    plan = (quality_classifier(df, "text")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_cross_dedup(spark, tmp_path):
    from tenzir_spark.operators.dedup import cross_dedup

    cur = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "beta")],
        "doc_id int, text string")
    prior = spark.createDataFrame(
        [(90, "beta"), (91, "delta"), (92, "beta")],
        "doc_id int, text string")
    kept = cross_dedup(cur, prior, "text")
    assert kept.columns == cur.columns
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]

    # pipeline text: prior corpus from a parquet path
    p = str(tmp_path / "prior")
    prior.write.parquet(p)
    from tenzir_spark.plans.pipeline import run_tql

    got = run_tql(cur, f"cross-dedup text against {p} | select doc_id")
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3]

    # a user column literally named _ch must survive (scratch-name dodge)
    cur2 = cur.withColumn("_ch", cur.doc_id * 10)
    kept2 = cross_dedup(cur2, prior, "text")
    assert kept2.columns == cur2.columns
    assert sorted((r["doc_id"], r["_ch"]) for r in kept2.collect()) == [
        (1, 10), (3, 30)]
