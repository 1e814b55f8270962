"""Physical-plan audit across the suite.

Prints one line per query with Exchange / ReusedExchange / scan /
Python-stage node counts from the *executed* (final adaptive) plan,
flagging cartesians and unusually exchange-heavy plans. This is how
the round-5 recompute bugs were found (a sizes-join recomputing the
ngram posting pipeline 3x, an Arrow bucketer running once per
self-join side, a funnel re-scanning the corpus per stage count).

Cartesian classification (r14): a ``BroadcastNestedLoopJoin`` whose
build side is PROVABLY bounded at any scale (a no-grouping-key
aggregate => exactly 1 row; a literal local relation => compile-time
constant size; a global limit) or OBSERVABLY tiny (executed broadcast
``numOutputRows`` <= 128 — deliberate query batches are tens of rows,
a real accidental cartesian builds a data-scaled side) is the
scalar-subquery / bounded-batch pattern and is exempt, so the
CARTESIAN flag only fires on real unbounded crosses. The named
allowlist that remains covers deliberate broadcasts bigger than the
observed bound.

Usage::

    python tools/audit_plans.py [sf_dir] [query ...]   # default: headline set
    python tools/audit_plans.py [sf_dir] --all         # full registry sweep
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402

_STAGES = {
    "BroadcastQueryStageExec",
    "ShuffleQueryStageExec",
    "TableCacheQueryStageExec",
    "ResultQueryStageExec",
}

# row-count-preserving (or reducing) wrappers a 1-row proof may walk
# through on the build path; anything else (join, generate, expand,
# union, ...) can multiply rows and stops the walk
_NON_EXPANDING = {
    "WholeStageCodegenExec",
    "InputAdapter",
    "ProjectExec",
    "FilterExec",
    "SortExec",
    "BroadcastExchangeExec",
    "ShuffleExchangeExec",
    "CoalesceExec",
    "ColumnarToRowExec",
    "AQEShuffleReadExec",
}


def _kids(node) -> list:
    cn = node.getClass().getSimpleName()
    if cn in _STAGES:
        return [node.plan()]
    if cn == "ReusedExchangeExec":
        return [node.child()]
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


# observed-build-size exemption bound: a deliberate broadcast of a
# bounded batch (query sets, band tables) is tens of rows; a real
# accidental cartesian builds a data-scaled side — thousands even at
# the sf0.001 audit scale
_OBSERVED_BUILD_OK = 128


def _bounded_build(node) -> bool:
    """True if this (build-side) subtree is provably bounded at any
    scale (a no-grouping-key aggregate => exactly 1 row; a local
    constant relation => compile-time size; a global limit) or
    observably tiny (executed broadcast numOutputRows <=
    ``_OBSERVED_BUILD_OK``)."""
    cn = node.getClass().getSimpleName()
    if "Aggregate" in cn:
        try:
            if node.groupingExpressions().isEmpty():
                return True  # no-keys aggregate: exactly 1 row, any scale
        except Exception:
            pass
        # keyed aggregate: bounded only if its input is
        return any(_bounded_build(c) for c in _kids(node))
    if cn == "LocalTableScanExec":
        return True  # literal relation: size is a compile-time constant
    if cn in ("GlobalLimitExec", "CollectLimitExec",
              "TakeOrderedAndProjectExec"):
        return True  # bounded by the limit constant at any scale
    if cn == "BroadcastExchangeExec":
        try:
            if (
                node.metrics().apply("numOutputRows").value()
                <= _OBSERVED_BUILD_OK
            ):
                return True
        except Exception:
            pass
    if cn in _STAGES or cn == "ReusedExchangeExec" or cn in _NON_EXPANDING:
        return any(_bounded_build(c) for c in _kids(node))
    return False


def _walk(node, out: list) -> None:
    out.append(node)
    for c in _kids(node):
        _walk(c, out)


def unexplained_crosses(df) -> list[str]:
    """Names of cross-join nodes in the EXECUTED plan whose build side
    is not provably/observably <= 1 row. Run after an action."""
    try:
        ep = df._jdf.queryExecution().executedPlan()
        if ep.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            ep = ep.finalPhysicalPlan()
    except Exception:
        return ["<plan-walk-failed>"]
    nodes: list = []
    _walk(ep, nodes)
    bad = []
    for n in nodes:
        cn = n.getClass().getSimpleName()
        if cn == "CartesianProductExec":
            bad.append("CartesianProduct")
        elif cn == "BroadcastNestedLoopJoinExec":
            side = n.buildSide().toString()
            ch = n.children()
            build = ch.apply(1) if side == "BuildRight" else ch.apply(0)
            if not _bounded_build(build):
                bad.append(f"BNLJ {side}")
    return bad


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
        "unexplained": unexplained_crosses(df),
    }


# named escape hatch for deliberate BroadcastNestedLoopJoins the
# classifier cannot clear. EMPTY as of r14: the bounded-build
# classification (1-row aggregates, literal relations, limits,
# observed tiny broadcasts) clears every deliberate shape in the
# registry — including the former members (query-batch ANN
# broadcasts, drift-gate scalar totals). Add a name here ONLY with a
# justification comment; tests/test_full_plan_audit.py sweeps the
# whole registry against this.
SCALAR_BNLJ_OK: set[str] = set()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if len(sys.argv) > 2 and sys.argv[2] == "--all":
        names = list(suite.REGISTRY)
    elif len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import bench

        names = [n for n in bench.HEADLINE if n in suite.REGISTRY]
    spark = get_session("audit_plans")
    worst = 0
    for name in names:
        c = audit(spark, name, sf_dir)
        flag = ""
        if c["unexplained"] and name not in SCALAR_BNLJ_OK:
            flag = f"  <== CARTESIAN {c['unexplained']}"
            worst = 1
        print(
            f"{name}: exch={c['exchanges']} reuse={c['reused']} "
            f"scans={c['scans']} py={c['python']} "
            f"cross={c['cartesian']}{flag}"
        )
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
