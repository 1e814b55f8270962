"""Physical-plan audit across the suite.

Prints one line per query with Exchange / ReusedExchange / scan /
Python-stage node counts from the *executed* (final adaptive) plan,
flagging cartesians and unusually exchange-heavy plans. This is how
the round-5 recompute bugs were found (a sizes-join recomputing the
ngram posting pipeline 3x, an Arrow bucketer running once per
self-join side, a funnel re-scanning the corpus per stage count).

Usage::

    python tools/audit_plans.py [sf_dir] [query ...]   # default: headline set
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402


def audit(spark, name: str, sf_dir: str) -> dict:
    df = suite.REGISTRY[name].spark(spark, sf_dir)
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return {
        "exchanges": plan.count("Exchange ("),
        "reused": plan.count("ReusedExchange"),
        "scans": plan.count("Scan parquet")
        + plan.count("InMemoryTableScan")
        + plan.count("Scan ExistingRDD"),
        "python": plan.count("ArrowEvalPython") + plan.count("MapInPandas"),
        "cartesian": plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin"),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in suite.REGISTRY]
    spark = get_session("audit_plans")
    worst = 0
    # deliberate BroadcastNestedLoopJoins: the query-batch broadcast
    # (brute-force ANN) and 1-row scalar broadcasts (tf-idf corpus
    # count, PageRank per-iteration dangling mass) — each is a scalar-
    # subquery pattern, not an accidental cross product
    scalar_bnlj_ok = {
        "ann_brute_force_cosine",
        # same query-batch broadcast shape as brute-force ANN: the
        # 5-row query side broadcasts against the corpus scan (the
        # label-mismatch filter is not an equi-key)
        "embedding_hard_negatives",
        "doc_tfidf_topk",
        "nation_trade_pagerank",
        # 1-row aggregate broadcast onto the keyed table (total/mean
        # scalars for the share and x-mean columns)
        "events_skew_report",
        # recall evals: the one-row report row is assembled by
        # crossJoining four 1-row count aggregates
        "dedup_lsh_recall",
        "multimodal_hash_recall",
        # 1-row broadcasts: the unigram totals onto the token join
        # and the global reference loss onto the k-row domain table
        "corpus_doremi_weights",
        # the ECDF drift gates crossJoin their 1-row (tb, tc) totals
        # onto the V-row distinct-value table — the scalar-subquery
        # pattern; which of the four shows the BNLJ in its FINAL plan
        # depends on where the checkpoint truncates lineage
        "events_ks_drift",
        "events_mann_whitney",
        "events_cvm_drift",
        "events_ad_drift",
    }
    for name in names:
        c = audit(spark, name, sf_dir)
        flag = ""
        if c["cartesian"] and name not in scalar_bnlj_ok:
            flag = "  <== CARTESIAN"
            worst = 1
        print(
            f"{name}: exch={c['exchanges']} reuse={c['reused']} "
            f"scans={c['scans']} py={c['python']}{flag}"
        )
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
