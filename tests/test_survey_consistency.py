"""Anti-vaporware guards: every query name the docs claim must exist
in the driver contract, and every registered query must have both a
callable and (unless explicitly rows-only) an oracle."""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry

REPO = Path(__file__).resolve().parent.parent

# queries with no SQL-expressible oracle (driver records rows-only);
# empty since r5: even the ANN queries are deterministic (md5 planes /
# lowest-id centroids) and carry full DuckDB oracles
ROWS_ONLY: set[str] = set()


def test_survey_2_12_query_names_exist():
    text = (REPO / "SURVEY.md").read_text()
    qs = set(entry.queries())
    # table rows cite suite queries in backticks in the last column
    sec = text.split("### 2.12")[1].split("## 3.")[0]
    cited = set()
    for cell in re.findall(r"\| `([a-z0-9_,` ]+)` \|", sec):
        for name in re.split(r"[,` ]+", cell):
            if name:
                cited.add(name)
    def satisfied(c: str) -> bool:
        # SC6 cites TPC-H queries by short prefix (q1, q21, ...)
        return c in qs or c.endswith("*") or any(
            q.startswith(c + "_") for q in qs
        )

    missing = {c for c in cited if not satisfied(c)}
    assert not missing, f"SURVEY.md cites nonexistent queries: {sorted(missing)}"


def test_every_query_is_cited_in_survey_section_2():
    # the REVERSE direction of the anti-vaporware guard: §2 is the
    # coverage contract, so an operator landing with a suite query but
    # no SURVEY row is invisible staleness (caught the round-8
    # `dup_span_merge` gap). Citation forms allowed: exact backticked
    # name, TPC-H short prefix (`q14` covers q14_promo_revenue), and
    # star glob (`multimodal_*`).
    text = (REPO / "SURVEY.md").read_text()
    sec = text.split("## 2. Operator inventory")[1].split("\n## 3.")[0]
    cited = set()
    for span in re.findall(r"`([a-z0-9_,]+)`", sec):
        cited.update(n for n in span.split(",") if n)
    globs = {g[:-1] for g in re.findall(r"`([a-z0-9_]+\*)`", sec)}

    def covered(q: str) -> bool:
        if q in cited:
            return True
        if any(q.startswith(g) for g in globs):
            return True
        # short-prefix cites: `q14` covers `q14_promo_revenue`
        return any(q.startswith(c + "_") for c in cited)

    missing = sorted(q for q in entry.queries() if not covered(q))
    assert not missing, (
        f"{len(missing)} registered queries have no SURVEY §2 citation: "
        f"{missing}"
    )


def test_survey_2_13_coverage_map_names_exist():
    text = (REPO / "SURVEY.md").read_text()
    qs = set(entry.queries())
    sec = text.split("### 2.13")[1].split("## 3.")[0]
    known_non_queries = {
        "__spark_entry__",  # contract module
        "lower",  # function mention
        "posix_join",
    }
    missing = set()
    for name in re.findall(r"`([a-z0-9_]+)`", sec):
        if name in known_non_queries or name.startswith(("tests", "test_")):
            continue
        if name not in qs and not any(q.startswith(name + "_") for q in qs):
            missing.add(name)
    assert not missing, f"SURVEY §2.13 cites nonexistent queries: {sorted(missing)}"


def test_readme_query_mentions_exist():
    text = (REPO / "README.md").read_text()
    qs = set(entry.queries())
    for name in re.findall(r"`([a-z0-9_]+)`", text):
        if name.startswith(("q1_", "q3_", "dedup_", "doc_", "events_", "ann_")):
            assert name in qs, f"README cites nonexistent query {name}"


def test_every_query_has_oracle_or_declared_rows_only():
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs
    assert qs - oracles == ROWS_ONLY


def test_module_docstring_layout_lists_only_real_modules():
    import importlib

    import isilon_hadoop_tools_spark as pkg

    for mod in re.findall(r"^- ``(\w+)``", pkg.__doc__, re.M):
        importlib.import_module(f"isilon_hadoop_tools_spark.{mod}")


def test_driver_window_covers_all_unverified_queries():
    # the driver checks ~the first 50 registration-order queries; every
    # query without a green driver row (new, red, or never-checked)
    # must sort inside that window or it can never earn one
    from isilon_hadoop_tools_spark import suite

    names = list(entry.queries())
    last = suite._driver_last_green()
    if not last:  # fresh clone without CORRECTNESS files
        weak = [
            n
            for n in names
            if n not in suite._R04_DRIVER_GREEN
            and n not in suite._WELL_VERIFIED_TAIL
        ]
    else:
        weak = [n for n in names if n not in last]
    outside = [n for n in weak if names.index(n) >= 50]
    assert not outside, (
        f"{len(outside)} never/least-verified queries fall outside the "
        f"50-query gate window: {outside[:5]}"
    )


def test_driver_window_rotates_round_robin():
    # regression cover: the gate ordering must put least-recently-green
    # queries first, so each round's ~50-query window is the complement
    # of the previous rounds' — no query goes unmonitored > ceil(n/50)
    # rounds
    import json

    from isilon_hadoop_tools_spark import suite

    last = suite._driver_last_green()
    if not last:
        import pytest

        pytest.skip("no CORRECTNESS files in this checkout")
    names = list(entry.queries())
    rounds = [last.get(n, -1) for n in names]
    assert rounds == sorted(rounds), "ordering is not least-recent-first"
    # the most recent round's green rows must all sort AFTER any query
    # lacking a green row from that round
    latest = max(last.values())
    files = sorted((REPO).glob("CORRECTNESS_r*.json"))
    latest_checked = set(json.loads(files[-1].read_text()))
    window = set(names[:50])
    stale = [n for n in names if last.get(n, -1) < latest]
    if len(stale) >= 40:
        assert len(window - latest_checked) >= 40, (
            "next driver window re-checks mostly already-fresh queries"
        )


def test_gate_freshness_within_rotation_guarantee():
    """Every registered query's latest driver-green round must be
    within the rotation guarantee (current − 5): with ~50 checks per
    round over the least-recently-verified ordering, an older green
    means the driver window silently skipped a query — which should
    fail HERE, locally, instead of surviving as a stale green. New
    queries with no driver row are exempt (they sort to the window's
    front)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import check as checkmod

    stale = checkmod.gate_freshness_stale()
    assert stale == [], (
        "driver-green rows older than the rotation guarantee: "
        f"{stale} — the driver window missed these; investigate "
        "suite._ordered_names ordering"
    )


def test_registration_order_is_fully_canonical():
    """Every registered query must appear in _CANONICAL_ORDER (the
    split package's explicit registration order): a query added to a
    family module without the canonical-list append would silently
    register after the canonical block, changing the driver window's
    fallback tie-break — fail loudly here instead."""
    from isilon_hadoop_tools_spark import suite
    from isilon_hadoop_tools_spark.suite._shared import _CANONICAL_ORDER

    assert list(suite.REGISTRY) == list(_CANONICAL_ORDER)


def test_survey_2_12_row_ids_unique():
    # r12 VERDICT: the §2.12 table used `L16g` for two different rows
    # (JPEG codec + audio fingerprint); the row id is how rounds refer
    # to operators, so duplicates make the ledger ambiguous.
    text = (REPO / "SURVEY.md").read_text()
    sec = text.split("### 2.12")[1].split("## 3.")[0]
    ids = re.findall(r"^\| ([A-Z][A-Za-z0-9]*) \|", sec, re.M)
    dupes = {i for i in ids if ids.count(i) > 1}
    assert not dupes, f"duplicate SURVEY §2.12 row ids: {sorted(dupes)}"
