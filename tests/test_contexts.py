"""Context lifecycle (context.md:16-45): create/update/remove/reset/
inspect/time-travel/apply."""

import pytest
from pyspark.sql import Row

from tenzir_spark.operators.contexts import ContextStore


@pytest.fixture()
def store(spark, tmp_path):
    return ContextStore(spark, str(tmp_path))


def _ctx_rows(spark):
    return spark.createDataFrame(
        [Row(ioc="1.2.3.4", label="bad"), Row(ioc="5.6.7.8", label="worse")]
    )


def test_create_inspect_apply(spark, store):
    store.create("threats", _ctx_rows(spark), key="ioc")
    assert store.list() == ["threats"]
    assert store.inspect("threats").count() == 2

    events = spark.createDataFrame(
        [Row(src="1.2.3.4", n=1), Row(src="9.9.9.9", n=2)]
    )
    out = store.apply(events, "threats", on="src")
    got = {r["src"]: r["label"] for r in out.collect()}
    assert got == {"1.2.3.4": "bad", "9.9.9.9": None}
    # --filter form
    assert store.apply(events, "threats", on="src", filter=True).count() == 1


def test_update_lww_and_remove(spark, store):
    store.create("threats", _ctx_rows(spark), key="ioc")
    store.update(
        "threats",
        spark.createDataFrame([Row(ioc="1.2.3.4", label="worst"), Row(ioc="9.9.9.9", label="new")]),
    )
    got = {r["ioc"]: r["label"] for r in store.inspect("threats").collect()}
    assert got == {"1.2.3.4": "worst", "5.6.7.8": "worse", "9.9.9.9": "new"}

    store.remove("threats", spark.createDataFrame([Row(ioc="5.6.7.8")]))
    assert {r["ioc"] for r in store.inspect("threats").collect()} == {"1.2.3.4", "9.9.9.9"}


def test_reset_delete_timetravel(spark, store):
    store.create("threats", _ctx_rows(spark), key="ioc")
    v_full = store._table("threats").current_version()
    store.reset("threats")
    assert store.inspect("threats").count() == 0
    # the pre-reset snapshot is still queryable (save/load analog)
    assert store.inspect_at("threats", v_full).count() == 2
    store.delete("threats")
    assert store.list() == []


def test_lookup_live_and_retro(spark, store, tmp_path):
    import pyspark.sql.types as T

    from tenzir_spark.lake.table import LakeTable

    store.create("threats", _ctx_rows(spark), key="ioc")
    v0 = store._table("threats").current_version()

    # --live: filter a feed to matches
    feed = spark.createDataFrame([Row(src="1.2.3.4", n=1), Row(src="9.9.9.9", n=2)])
    assert [r["src"] for r in store.lookup_live(feed, "threats", on="src").collect()] == ["1.2.3.4"]

    # --retro: a context UPDATE triggers a historical query for NEW iocs only
    hist = LakeTable(str(tmp_path), "hist")
    schema = T.StructType([T.StructField("src", T.StringType()),
                           T.StructField("n", T.LongType())])
    hist.create(schema, n_buckets=2, key="src")
    hist.append(spark.createDataFrame(
        [Row(src="1.2.3.4", n=10), Row(src="7.7.7.7", n=11), Row(src="9.9.9.9", n=12)]), "src")

    store.update("threats", spark.createDataFrame([Row(ioc="7.7.7.7", label="fresh")]))
    got = store.lookup_retro(hist, "threats", on="src", since_version=v0).collect()
    # only the NEWLY added ioc matches retro (1.2.3.4 was known before v0)
    assert [(r["src"], r["label"]) for r in got] == [("7.7.7.7", "fresh")]


def test_lookup_snapshot_pins_context_and_data(spark, store, tmp_path):
    """--snapshot (lookup.md:80-84): the retro scan runs with the context
    state AND data snapshot pinned at execution time — a context update
    and a data import landing afterwards do not change the result."""
    import pyspark.sql.types as T

    from tenzir_spark.lake.table import LakeTable

    store.create("threats", _ctx_rows(spark), key="ioc")

    hist = LakeTable(str(tmp_path), "hist")
    schema = T.StructType([T.StructField("src", T.StringType()),
                           T.StructField("n", T.LongType())])
    hist.create(schema, n_buckets=2, key="src")
    hist.append(spark.createDataFrame(
        [Row(src="1.2.3.4", n=10), Row(src="7.7.7.7", n=11)]), "src")

    # pin at execution time
    cv = store._table("threats").current_version()
    dv = hist.current_version()

    # later: a context update AND a new import, both post-snapshot
    store.update("threats", spark.createDataFrame([Row(ioc="7.7.7.7", label="fresh")]))
    hist.append(spark.createDataFrame([Row(src="5.6.7.8", n=12)]), "src")

    pinned = store.lookup_snapshot(hist, "threats", on="src",
                                   context_version=cv, data_version=dv)
    assert [(r["src"], r["label"]) for r in pinned.collect()] == [("1.2.3.4", "bad")]

    # unpinned (defaults = now) sees both post-snapshot changes
    live = store.lookup_snapshot(hist, "threats", on="src")
    got = sorted((r["src"], r["label"]) for r in live.collect())
    assert got == [("1.2.3.4", "bad"), ("5.6.7.8", "worse"), ("7.7.7.7", "fresh")]


def test_lookup_source_head_text(spark, store, tmp_path):
    """`lookup <table_root> <ctx> [--retro|--snapshot] …` as a pipeline
    SOURCE head (lookup.md:23-84 as TEXT): retro scans with current
    context state; snapshot pins context AND data versions; option
    misuse gets targeted TqlErrors."""
    import pyspark.sql.types as T

    from tenzir_spark.lake.table import LakeTable
    from tenzir_spark.plans.pipeline import TqlError, run_tql_source

    store.create("threats", _ctx_rows(spark), key="ioc")
    hist = LakeTable(str(tmp_path), "hist")
    schema = T.StructType([T.StructField("src", T.StringType()),
                           T.StructField("n", T.LongType())])
    hist.create(schema, n_buckets=2, key="src")
    hist.append(spark.createDataFrame(
        [Row(src="1.2.3.4", n=10), Row(src="7.7.7.7", n=11)]), "src")
    cv = store._table("threats").current_version()
    dv = hist.current_version()

    # retro (default mode) + a downstream operator stage
    out = run_tql_source(
        spark, f"lookup {tmp_path}/hist threats --field src | select src",
        context_store=store)
    assert [r["src"] for r in out.collect()] == ["1.2.3.4"]

    # post-snapshot context update + import: pinned snapshot ignores both
    store.update("threats",
                 spark.createDataFrame([Row(ioc="7.7.7.7", label="fresh")]))
    hist.append(spark.createDataFrame([Row(src="5.6.7.8", n=12)]), "src")
    pinned = run_tql_source(
        spark,
        f"lookup {tmp_path}/hist threats --field src --snapshot"
        f" --context-version {cv} --data-version {dv}",
        context_store=store)
    assert [(r["src"], r["label"]) for r in pinned.collect()] == \
        [("1.2.3.4", "bad")]
    retro_now = run_tql_source(
        spark, f"lookup {tmp_path}/hist threats --field src --retro",
        context_store=store)
    assert retro_now.count() == 3

    # `--field=src` form accepted, matching the mid-pipeline _flag grammar
    eq_form = run_tql_source(
        spark, f"lookup {tmp_path}/hist threats --field=src --retro",
        context_store=store)
    assert eq_form.count() == 3

    # the MID-pipeline form (`lookup <ctx> --field <f>`) with an explicit
    # source_df is NOT shadowed by the source head: second token is an
    # option, so the head routes to run_tql's enrich/lookup stage
    mid = run_tql_source(
        spark, "lookup threats --field src | select src",
        source_df=hist.read(spark), context_store=store)
    assert sorted(r["src"] for r in mid.collect()) == \
        ["1.2.3.4", "5.6.7.8", "7.7.7.7"]

    # scheduled fires thread context_store through run_tql_every
    from datetime import datetime, timedelta

    from tenzir_spark.plans.pipeline import run_tql_every
    clock = {"now": datetime(2026, 1, 1)}
    fired = run_tql_every(
        spark, f"every 1s lookup {tmp_path}/hist threats --field src --retro",
        n_runs=2, context_store=store,
        now_fn=lambda: clock["now"],
        sleep_fn=lambda s: clock.__setitem__(
            "now", clock["now"] + timedelta(seconds=s)))
    assert [d.count() for d in fired] == [3, 3]

    # targeted errors
    with pytest.raises(TqlError, match="needs a ContextStore"):
        run_tql_source(spark, f"lookup {tmp_path}/hist threats")
    with pytest.raises(TqlError, match="snapshot options"):
        run_tql_source(
            spark, f"lookup {tmp_path}/hist threats --context-version 1",
            context_store=store)
    with pytest.raises(TqlError, match="unknown option"):
        run_tql_source(spark, f"lookup {tmp_path}/hist threats --bogus",
                       context_store=store)
