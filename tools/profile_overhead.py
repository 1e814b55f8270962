"""Decompose one suite query's wall clock into fixed-overhead stages.

The r13/r15 VERDICTs flagged a per-query fixed-overhead creep
(sub-second queries ~1.17x vs r14-close in A/B while >=2 s
heavyweights read ~1.05). This tool names where a sub-second query's
time actually goes, so the creep can be attributed to code (plan
build? analysis? job submission?) or machine state:

- ``build``     — Python DataFrame construction (the suite function)
- ``analyze``   — Catalyst analysis + optimization + physical planning
  (forced via ``df._jdf.queryExecution().executedPlan()``)
- ``execute``   — the noop write (job submission + run)
- ``rerun``     — a second noop write of the SAME DataFrame (job
  submission + run with plan/codegen warm: the floor a resident
  cluster job sees)

Usage::

    python tools/profile_overhead.py [sf_dir] query [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    rest = args[1:] if args and "/" in args[0] else args
    if not rest:
        print(__doc__)
        return 2
    name = rest[0]
    reps = int(rest[1]) if len(rest) > 1 else 5

    spark = get_session("profile_overhead")
    registry = suite.queries()
    fn = registry[name]

    # warmup: compile plan + codegen at the smoke scale
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    out = {"build": [], "analyze": [], "execute": [], "rerun": []}
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        out["build"].append(round(t1 - t0, 4))
        out["analyze"].append(round(t2 - t1, 4))
        out["execute"].append(round(t3 - t2, 4))
        out["rerun"].append(round(t4 - t3, 4))
    summary = {k: {"min": min(v), "med": sorted(v)[len(v) // 2]}
               for k, v in out.items()}
    print(json.dumps({"query": name, "sf_dir": sf_dir,
                      "stages": summary, "raw": out}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
