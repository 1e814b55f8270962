"""Per-TASK decomposition of one suite query's slowest stages.

``profile_jobs.py`` names which Spark job is slow; this tool goes one
level further and prints the task-duration distribution (min / median /
max, plus the top tasks' run time and shuffle-read bytes) for the N
slowest stages — the §2.5 skew check (max/median ratio) when a stage's
wall does not match its task count.

Usage::

    python tools/profile_tasks.py [sf_dir] query [n_stages]
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isilon_hadoop_tools_spark import suite  # noqa: E402
from isilon_hadoop_tools_spark.session import get_session  # noqa: E402


def main() -> int:
    args = list(sys.argv[1:])
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    rest = args[1:] if args and "/" in args[0] else args
    if not rest:
        print(__doc__)
        return 2
    name = rest[0]
    n_stages = int(rest[1]) if len(rest) > 1 else 3

    log_dir = Path(tempfile.mkdtemp(prefix="spark-events-"))
    spark = get_session(
        "profile_tasks",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(log_dir),
            "spark.eventLog.compress": "false",
        },
    )
    fn = suite.queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.stop()
    import time as _time

    _time.sleep(0.5)

    tasks: dict[int, list[dict]] = {}
    stage_name: dict[int, str] = {}
    for f in sorted(log_dir.rglob("*")):
        if f.name.startswith(".") or not f.is_file():
            continue
        for line in f.read_bytes().decode("utf-8", "replace").splitlines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if not isinstance(ev, dict):
                continue
            if ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev["Task Info"]
                tm = ev.get("Task Metrics") or {}
                sh = tm.get("Shuffle Read Metrics") or {}
                tasks.setdefault(sid, []).append(
                    {
                        "ms": ti["Finish Time"] - ti["Launch Time"],
                        "sh_read": sh.get("Local Bytes Read", 0)
                        + sh.get("Remote Bytes Read", 0),
                        "records": sh.get("Total Records Read", 0),
                    }
                )
            elif ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_name[si["Stage ID"]] = si.get("Stage Name", "")

    by_wall = sorted(
        tasks.items(), key=lambda kv: -max(t["ms"] for t in kv[1])
    )[:n_stages]
    for sid, ts in by_wall:
        ds = sorted(t["ms"] for t in ts)
        n = len(ds)
        med = ds[n // 2]
        print(
            f"stage {sid} ({stage_name.get(sid, '?')[:50]}): n_tasks={n} "
            f"min={ds[0]}ms med={med}ms max={ds[-1]}ms "
            f"max/med={ds[-1] / max(med, 1):.1f}"
        )
        top = sorted(ts, key=lambda t: -t["ms"])[:5]
        for t in top:
            print(
                f"    task ms={t['ms']} sh_read={t['sh_read']} "
                f"records={t['records']}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
