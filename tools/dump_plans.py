"""Dump ``explain("formatted")`` for suite queries to plans/<round>/.

Deliverable helper for the optimization rounds: captures the BEFORE /
AFTER physical plan of every query an optimization touches, so plan
claims ("2 Exchange -> 1", "SortMergeJoin -> BroadcastHashJoin") are
checkable against committed artifacts without running Spark.

Usage::

    python tools/dump_plans.py r16 before q1_pricing_summary dedup_ngram_jaccard
    python tools/dump_plans.py r16 after --headline   # the whole headline set
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    rnd, tag = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    registry = suite.queries()
    if rest == ["--headline"]:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]
    else:
        names = rest
    outdir = Path(__file__).resolve().parent.parent / "plans" / rnd
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_session("dump_plans")
    for name in names:
        fn = registry[name]
        try:
            df = fn(spark, SF_DIR)
            text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            text = f"EXPLAIN FAILED: {exc!r}\n"
        (outdir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
