"""Physical-plan audit: print `explain(formatted)` for headline queries and
grep for the properties that must hold at 100 TB:

- parquet scans carry PushedFilters / narrow ReadSchema (pushdown+pruning)
- small-side joins are BroadcastHashJoin (no shuffle of the big side)
- aggregations are partial (HashAggregate x2 around the exchange)
- the hot path stays inside WholeStageCodegen spans
- no CartesianProduct / row-at-a-time Python UDF in the hot path

Usage: python scripts/explain_audit.py [name ...]   (default: audit set)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

AUDIT = {
    # name: (must-contain regexes, must-NOT-contain regexes)
    "summarize_q1": ([r"PushedFilters: \[.*LessThanOrEqual", r"HashAggregate"], [r"CartesianProduct"]),
    "join_q3": ([r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin", r"PushedFilters: \[.*EqualTo"], [r"CartesianProduct"]),
    "where_filter": ([r"PushedFilters: \[.*GreaterThan", r"ReadSchema: [^\n]*value"], []),
    "select_project": ([r"ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"], []),
    "enrich_lookup": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    "enrich_subnet": ([r"BroadcastHashJoin"], [r"SortMergeJoin"]),
    # range enrich must be the bucket-expanded EQUI-join, never the
    # O(rows × intervals) BroadcastNestedLoopJoin a BETWEEN join plans to
    "enrich_range": ([r"BroadcastHashJoin"], [r"BroadcastNestedLoopJoin|CartesianProduct"]),
    "dedup_exact": ([r"HashAggregate"], []),
    # chunking is scan -> generate(posexplode) -> project(slice), one
    # fused codegen pipeline: any Exchange or Python eval means the
    # zero-shuffle contract broke
    "chunk_documents": ([r"Generate"],
                        [r"Exchange", r"BatchEvalPython", r"CartesianProduct"]),
    # decontamination: eval n-grams broadcast, corpus explode pipelines
    # into the join — no corpus-wide shuffle, no cartesian, no Python
    "decontaminate_ngrams": ([r"BroadcastHashJoin", r"HashAggregate"],
                             [r"CartesianProduct", r"SortMergeJoin",
                              r"BatchEvalPython"]),
    # window dedup: one REPARTITION_BY_COL exchange feeds both consumers
    # (ReusedExchange is asserted post-AQE in tests/test_operators.py);
    # no cartesian, no Python, and the window build stays in codegen
    "window_dedup": ([r"REPARTITION_BY_COL", r"HashAggregate"],
                     [r"CartesianProduct", r"BatchEvalPython"]),
    # token-array twin: same one-exchange contract, windows sliced from
    # the array<int> payload in codegen'd expressions
    "token_window_dedup": ([r"REPARTITION_BY_COL", r"HashAggregate"],
                           [r"CartesianProduct", r"BatchEvalPython"]),
    # ExactSubstr span removal: same one-exchange contract as
    # window_dedup (occurrence repartition reused by the count+keeper
    # aggregate and the loser join-back); the min(struct(id,p)) keeper
    # buffer plans as SortAggregate (struct-typed buffer — the
    # documented Spark 4.1 max_by/min-struct behavior), interval merge
    # and position filter stay codegen'd expressions, no Python
    "dedup_spans": ([r"REPARTITION_BY_COL",
                     r"HashAggregate|SortAggregate"],
                    [r"CartesianProduct", r"BatchEvalPython"]),
    # as-of join: union + per-key running last() — a keyed Window behind
    # ONE hash exchange; never a join node (a range sort-merge would
    # degenerate per key, a cartesian is out of the question)
    "asof_join": ([r"Window", r"hashpartitioning"],
                  [r"Join", r"CartesianProduct", r"BatchEvalPython"]),
    # same contract for the rest of the temporal family: keyed Window
    # behind a hash exchange, no join node, no Python in the hot path
    "fill_forward": ([r"Window", r"hashpartitioning"],
                     [r"Join", r"CartesianProduct", r"BatchEvalPython"]),
    "sessionize_gap": ([r"Window", r"hashpartitioning"],
                       [r"Join", r"CartesianProduct", r"BatchEvalPython"]),
    "rolling_agg": ([r"Window", r"hashpartitioning"],
                    [r"Join", r"CartesianProduct", r"BatchEvalPython"]),
    "summarize_resolution": ([r"HashAggregate"], []),
    "top_values": ([r"HashAggregate", r"TakeOrderedAndProject|Sort"], []),
    # global top-k: per-partition TakeOrdered + bounded merge; the rank
    # window runs on the LIMITED 500 rows, never the full table
    "sort_ranked": ([r"TakeOrderedAndProject"], []),
    "minhash_lsh_pairs": ([r"HashAggregate|SortAggregate"], [r"CartesianProduct"]),
    # exact n-gram Jaccard is the PPJoin-style prefix-filtered equi-join:
    # frequency agg + per-doc prefix window + gram-keyed candidate join —
    # the old cartesian baseline must never come back
    "ngram_jaccard_pairs": ([r"HashAggregate", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                            [r"CartesianProduct", r"BroadcastNestedLoopJoin",
                             r"BatchEvalPython"]),
    "ann_cosine_topk": ([], [r"CartesianProduct"]),  # broadcast NL join on 1-row query side is fine
    "token_count": ([r"codegen id"], [r"BatchEvalPython"]),
    # global-order ops must use the two-phase distributed numbering: a
    # keyed Window behind a hash exchange, NEVER a single-partition
    # global sort/window exchange (the 100 TB serialization point)
    "slice_stride": ([r"Window"], [r"SinglePartition"]),
    "slice_negative": ([r"Window"], [r"SinglePartition"]),
    "enumerate_rows": ([r"Window"], [r"SinglePartition"]),
    "unique_adjacent": ([r"Window", r"BroadcastHashJoin"], [r"SinglePartition"]),
    # LSH near-dup: the quadratic band join must be an equi-join (never a
    # cartesian) and the candidate re-attach a broadcast
    "cosine_near_dup_lsh": ([r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"], [r"CartesianProduct"]),
    # format parsing stays entirely in codegen'd JVM expressions
    "parse_grok": ([r"codegen id"], [r"BatchEvalPython"]),
    "parse_kv": ([r"codegen id"], [r"BatchEvalPython"]),
    "median_exact": ([r"HashAggregate|SortAggregate|ObjectHashAggregate"], [r"BatchEvalPython"]),
    # timeshift anchors on a 1-row scalar aggregate broadcast back in — a
    # BroadcastNestedLoopJoin over one row, NEVER an unbounded window that
    # would drag every row through one task. (The scalar agg's own exchange
    # moves O(partitions) partial rows — scale-safe — so the gate here is
    # "no Window", not "no SinglePartition".)
    "timeshift": ([r"BroadcastNestedLoopJoin"], [r"Window"]),
    # reverse_enumerate = total - ascending two-phase position: keyed
    # window behind a hash exchange, no single-task global sort
    "reverse_enumerate": ([r"Window"], [r"SinglePartition"]),
    # pipeline TEXT compiles to one Catalyst plan: the `where` inside the
    # string still reaches the parquet scan as a pushed filter
    "tql_summarize_pipeline": (
        [r"PushedFilters: \[.*GreaterThan\(value", r"HashAggregate",
         r"TakeOrderedAndProject"],
        [r"CartesianProduct", r"BatchEvalPython"],
    ),
    # YARA rules compile to pure JVM contains/rlike predicates — N rules,
    # ONE scan, zero Python in the hot path
    "yara_text_rules": ([r"PushedFilters"], [r"BatchEvalPython"]),
    # grok parsing via the textual front-end stays codegen'd JVM regex
    "tql_parse_grok": ([], [r"BatchEvalPython", r"CartesianProduct"]),
    # corpus line dedup: one REPARTITION_BY_COL exchange feeds both the
    # winner aggregate and the occurrence join (ReusedExchange asserted
    # post-AQE in tests); line text never rides the hash shuffle
    "line_dedup_keep_first": ([r"REPARTITION_BY_COL", r"HashAggregate"],
                              [r"CartesianProduct", r"BatchEvalPython"]),
    # PII redaction is a pure projection off the scan — no shuffle at
    # all (the witness's orderBy adds only a rangepartitioning sort)
    "pii_redact": ([r"Scan parquet"],
                   [r"Exchange hashpartitioning", r"BatchEvalPython"]),
    # SemDeDup: the argmax-assignment projection feeds the ONE cluster
    # exchange (ReusedExchange across the self-join sides is asserted
    # post-AQE in tests); cluster-keyed equi-join, never all-pairs, and
    # the cosine math stays in codegen'd JVM expressions
    "semdedup_flags": ([r"REPARTITION_BY_COL",
                        r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"],
                       [r"CartesianProduct", r"BatchEvalPython"]),
    # DSIR: d-row log-ratio table broadcast; histogram + score share the
    # bucket exchange; nothing cartesian, nothing Python
    "dsir_weights": ([r"REPARTITION_BY_COL", r"BroadcastHashJoin",
                      r"HashAggregate"],
                     [r"CartesianProduct", r"BatchEvalPython",
                      r"SortMergeJoin"]),
    # Gopher quality rules are a pure projection off the scan — no
    # exchange at all (witness orderBy adds only a range sort), no Python
    "gopher_quality": ([r"Scan parquet"],
                       [r"Exchange hashpartitioning", r"BatchEvalPython"]),
    # duplicate-cluster attach: component table (≤2×|pairs| rows) rides a
    # broadcast join onto the corpus — never a corpus-wide shuffle, and
    # the label-propagation loop itself is checkpointed out of this plan
    "dup_clusters": ([r"BroadcastHashJoin"],
                     [r"CartesianProduct", r"BatchEvalPython",
                      r"SortMergeJoin"]),
    # LM scoring: count-table joins are hash joins (AQE broadcasts when
    # the model fits; shuffle join is the at-scale fallback), totals ride
    # a 1-row broadcast, per-doc mean is a partial agg — no cartesian,
    # no Python
    "lm_perplexity": ([r"HashAggregate",
                       r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin",
                       r"BroadcastNestedLoopJoin"],
                      [r"CartesianProduct", r"BatchEvalPython"]),
    # HTML strip is a pure regexp projection — no exchange (witness
    # orderBy adds only a range sort), no Python
    "html_extract": ([r"Scan parquet"],
                     [r"Exchange hashpartitioning", r"BatchEvalPython"]),
    # URL curation: the blocklist is the BROADCAST side of an anti-join;
    # the corpus never shuffles
    "url_filter": ([r"BroadcastHashJoin [^\n]*LeftAnti"],
                   [r"Exchange hashpartitioning", r"SortMergeJoin",
                    r"BatchEvalPython"]),
    # cross-corpus dedup: anti-join on 16-byte hashes (AQE broadcasts the
    # small prior here; shuffle anti-join is the at-scale fallback) —
    # never cartesian, never Python
    "cross_dedup": ([r"LeftAnti"],
                    [r"CartesianProduct", r"BatchEvalPython"]),
    # classifier scoring is a per-row aggregate over the feature array —
    # pure projection, no exchange, no Python
    "quality_classifier": ([r"Scan parquet"],
                           [r"Exchange hashpartitioning",
                            r"BatchEvalPython"]),
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from tenzir_spark.queries import queries
    from tenzir_spark.session import get_spark

    names = sys.argv[1:] or list(AUDIT)
    spark = get_spark("explain_audit", cores=4)
    reg = queries()
    failures = 0
    for name in names:
        fn = reg.get(name)
        if fn is None:
            print(f"SKIP {name}: not in registry")
            continue
        txt = plan_text(fn(spark, SF_DIR))
        must, must_not = AUDIT.get(name, ([], []))
        bad = [m for m in must if not re.search(m, txt)]
        worse = [m for m in must_not if re.search(m, txt)]
        if bad or worse:
            failures += 1
            print(f"FAIL {name}: missing={bad} forbidden-present={worse}")
            if os.environ.get("AUDIT_VERBOSE"):
                print(txt)
        else:
            spans = len(set(re.findall(r"codegen id : (\d+)", txt)))
            print(f"PASS {name}: codegen_spans={spans}")
    print(f"\n{len(names) - failures} ok, {failures} failing")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
