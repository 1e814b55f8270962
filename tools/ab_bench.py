"""Back-to-back A/B bench: HEAD vs a past commit on their SHARED
headline set — the drift-attribution protocol for round-over-round
wall-clock movement.

Why: identical code has shown up to ±10-16% run-to-run drift on this
shared sandbox, so a cross-round ratio alone cannot distinguish "code
regressed" from "machine state differed". This tool removes the
machine variable: both versions run back-to-back in ONE otherwise-idle
session (the two Spark sessions are strictly sequential — concurrent
Spark corrupts timings), each with bench.py's warmup discipline and
min-of-N reps, with machine-state markers recorded before/between/
after. A back-to-back ratio ~1.0x proves a cross-round drift was
environmental; a reproducible per-query ratio names the regression.

Writes ``AB_BENCH.json`` at the repo root; bench.py copies its
``summary`` into the BENCH_local sidecar on every subsequent run.

Usage::

    python tools/ab_bench.py <ref> [reps]     # e.g. the r10-close hash
"""

from __future__ import annotations

import json
import math
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _headline(cwd: Path) -> list[str]:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, json; sys.path.insert(0, '.');"
            "import bench; print('ABHEAD' + json.dumps(list(bench.HEADLINE)))",
        ],
        cwd=cwd,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("ABHEAD"):
            return json.loads(line[len("ABHEAD"):])
    raise RuntimeError(f"no ABHEAD line from {cwd}")


def _run_side(cwd: Path, names: list[str], reps: int) -> dict[str, float]:
    env = dict(**__import__("os").environ)
    env["AB_QUERIES"] = json.dumps(names)
    env["AB_REPS"] = str(reps)
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "_ab_child.py")],
        cwd=cwd,
        capture_output=True,
        text=True,
        env=env,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("ABRESULT"):
            return json.loads(line[len("ABRESULT"):])
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
    raise RuntimeError(f"no ABRESULT line from {cwd}")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ref = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from bench import _machine_state  # noqa: E402 — HEAD's marker fn

    wt = ROOT / ".scratch" / "ab_worktree"
    subprocess.run(
        ["git", "worktree", "remove", "--force", str(wt)],
        cwd=ROOT,
        capture_output=True,
    )
    subprocess.run(
        ["git", "worktree", "add", "--detach", str(wt), ref],
        cwd=ROOT,
        check=True,
        capture_output=True,
    )
    try:
        shared = sorted(set(_headline(ROOT)) & set(_headline(wt)))
        m0 = _machine_state()
        head_times = _run_side(ROOT, shared, reps)
        m1 = _machine_state()
        ref_times = _run_side(wt, shared, reps)
        m2 = _machine_state()
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(wt)],
            cwd=ROOT,
            capture_output=True,
        )

    both = sorted(set(head_times) & set(ref_times))
    ratios = {
        n: round(head_times[n] / ref_times[n], 3)
        for n in both
        if ref_times[n] > 0
    }
    geo = (
        round(
            math.exp(
                sum(math.log(r) for r in ratios.values()) / len(ratios)
            ),
            3,
        )
        if ratios
        else None  # no comparable queries (empty shared set / 0s refs)
    )
    head_sum = round(sum(head_times[n] for n in both), 2)
    ref_sum = round(sum(ref_times[n] for n in both), 2)
    worst = dict(
        sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    )
    result = {
        "ref": ref,
        "reps": reps,
        "n_shared": len(both),
        "head_sum_sec": head_sum,
        "ref_sum_sec": ref_sum,
        "ratio_geomean": geo,
        "ratio_sum": round(head_sum / ref_sum, 3) if ref_sum else None,
        "worst_ratios": worst,
        "head": head_times,
        "ref_times": ref_times,
        "machine": {"before": m0, "between": m1, "after": m2},
        "summary": (
            f"back-to-back HEAD vs {ref[:9]} on {len(both)} shared headline "
            f"queries (min-of-{reps} each, sequential sessions, idle box): "
            f"sum {head_sum}s vs {ref_sum}s, geomean ratio {geo}"
        ),
    }
    (ROOT / "AB_BENCH.json").write_text(
        json.dumps(result, indent=1, sort_keys=True) + "\n"
    )
    print(json.dumps({k: result[k] for k in (
        "ref", "n_shared", "head_sum_sec", "ref_sum_sec",
        "ratio_geomean", "ratio_sum", "worst_ratios", "summary",
    )}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
