"""Time a list of suite queries end-to-end with the noop sink.

Same methodology as bench.py (plan+codegen warmup at sf0.001, then
timed reps at the target SF, min reported) but for an arbitrary query
list — the paired A/B measurement harness for rotation (non-headline)
queries. Usage::

    python tools/time_queries.py [sf_dir] query [query ...] [--reps N]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    spark = get_session("time_queries")
    registry = suite.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        spark.sparkContext.setJobDescription(f"warmup {name}")
        fn(spark, WARMUP_SF_DIR).write.format("noop").mode("overwrite").save()
        obs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"timed {name} rep{r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            obs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(obs), "obs": obs}
        print(json.dumps({name: out[name]}), flush=True)
    print("RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
