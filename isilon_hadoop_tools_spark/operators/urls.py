"""URL canonicalization and per-domain curation operators (SURVEY §2.12
L63/L64).

Reference parity: the reference tool has no URL surface (it provisions
identities over REST, ``identities.py``); these are brief-mandated
web-corpus curation extensions — every large-scale web pipeline
(CCNet, C4, RefinedWeb, FineWeb) canonicalizes URLs before URL-level
dedup and applies per-registrable-domain frequency caps before mixing.

Everything here is stateless column algebra (regexp extracts + array
higher-order functions — JVM-side, no UDFs) except the cap rank,
which is split so the per-domain window runs ONLY on above-cap
domains' rows (the heavy tail); the long tail of small domains never
enters a window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking / click-id query parameters stripped during
# canonicalization (the CCNet/FineWeb-style hygiene list). Matched
# case-sensitively against the start of each `name=value` pair —
# tracking params are emitted lowercase by the ad platforms that
# define them.
TRACKING_PARAM_RE = (
    r"^(utm_[A-Za-z0-9_]*|gclid|dclid|fbclid|msclkid|mc_eid|mc_cid"
    r"|igshid|yclid|twclid|_ga|_gl|ref_src|spm)(=|$)"
)

# Two-level public suffixes recognized by the registrable-domain
# heuristic. A full Public Suffix List is an external artifact this
# container does not ship; the fixed set below covers the common
# ccTLD second-level registries and is DOCUMENTED as a heuristic —
# swap in the full PSL as a broadcast table for production use.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au",
    "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "com.sg", "co.za",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"

_IPV4_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"


def _host_of_hostport(hostport: Column) -> Column:
    """Host part of an RFC 3986 authority's host[:port], handling
    bracketed IPv6 literals (``[::1]``, ``[::1]:8080``): a ``[``
    prefix means the host is the whole bracketed group (colons inside
    are address bytes, not a port separator), otherwise everything
    before the first ``:``. Without the bracket branch ``[::1]`` and
    ``[::2]`` would both extract host ``[`` and falsely merge under
    canonicalization (ADVICE r12)."""
    return F.when(
        hostport.startswith("["),
        F.lower(F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)),
    ).otherwise(F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)))


def canonical_url_expr(url) -> Column:
    """Canonical form of a URL as ONE JVM-side expression:

    - scheme and host lowercased (RFC 3986 §6.2.2.1 case
      normalization; the path/query keep their case — they are
      case-sensitive on most servers),
    - userinfo (``user:pass@``) dropped,
    - default ports stripped (``:80`` for http, ``:443`` for https;
      other ports kept),
    - empty path normalized to ``/``,
    - fragment dropped (never sent to the server),
    - tracking query params (:data:`TRACKING_PARAM_RE`) and empty
      pairs removed, the surviving pairs SORTED byte-wise and
      rejoined (order-insensitive canonical form — two URLs differing
      only in param order dedup together).

    Pure regexp/array column algebra: scan-bound at 100 TB, no
    shuffle, no UDF. Punycode (``xn--``) hosts pass through as-is —
    IDN decode is presentation, not identity.
    """
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_extract(u, r"^([^#]*)", 1)
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    rest = F.regexp_replace(nofrag, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
    host = _host_of_hostport(hostport)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path0 = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    q = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qc = F.array_join(F.array_sort(kept), "&")
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qc != "", F.concat(F.lit("?"), qc)).otherwise(F.lit("")),
    )


def host_expr(url) -> Column:
    """Lowercased host of a URL (userinfo and port stripped)."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_extract(u, r"^([^#]*)", 1)
    rest = F.regexp_replace(nofrag, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    hostport = F.regexp_extract(authority, r"([^@]*)$", 1)
    return _host_of_hostport(hostport)


def registrable_domain_expr(host) -> Column:
    """Registrable domain (eTLD+1) of a lowercased host under the
    :data:`TWO_LEVEL_SUFFIXES` heuristic: the last two labels, or the
    last three when the host ends in a recognized two-level public
    suffix; IPv4 literals and one/two-label hosts pass through whole.
    Pure array algebra on the split host — no shuffle, no UDF."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return (
        F.when(h.startswith("[") | h.rlike(_IPV4_RE) | (n <= 2), h)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES), last3)
        .otherwise(last2)
    )


class PslRules:
    """Parsed Public Suffix List rules, grouped by matched label count
    for InSet evaluation: ``plain[k]`` / ``wild[k]`` / ``exc[k]`` are
    frozensets of k-label suffix strings. Bounded driver state (the
    full published PSL is ~10k rules — a few hundred KB), compiled
    once into a single JVM-side when/InSet expression chain; no
    broadcast join, no UDF, no shuffle."""

    def __init__(
        self,
        plain: dict[int, frozenset[str]],
        wild: dict[int, frozenset[str]],
        exc: dict[int, frozenset[str]],
    ) -> None:
        self.plain = plain
        self.wild = wild
        self.exc = exc


def parse_psl(lines) -> PslRules:
    """Parse Public Suffix List file-format lines (one rule per line,
    ``//`` comments, ``*.`` leftmost-wildcard rules, ``!`` exception
    rules — publicsuffix.org/list semantics). Wildcards are stored by
    the label count of their FIXED tail (``*.ck`` under k=1), since
    that is the part matched by suffix equality."""
    plain: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}
    for raw in lines:
        rule = raw.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        if rule.startswith("!"):
            tail = rule[1:]
            exc.setdefault(tail.count(".") + 1, set()).add(tail)
        elif rule.startswith("*."):
            tail = rule[2:]
            wild.setdefault(tail.count(".") + 1, set()).add(tail)
        else:
            plain.setdefault(rule.count(".") + 1, set()).add(rule)
    return PslRules(
        {k: frozenset(v) for k, v in plain.items()},
        {k: frozenset(v) for k, v in wild.items()},
        {k: frozenset(v) for k, v in exc.items()},
    )


def load_psl(path: str | None = None) -> PslRules:
    """Load PSL rules from ``path`` (the published file format), or
    the packaged pinned snapshot fixture when ``path`` is None.
    Production: download the complete list once, pin it next to the
    job, and pass its path — the parser and the expression compiler
    are format-complete for the published file."""
    import pathlib

    if path is None:
        path = str(
            pathlib.Path(__file__).resolve().parent.parent
            / "data"
            / "public_suffix_snapshot.dat"
        )
    with open(path, encoding="utf-8") as fh:
        return parse_psl(fh)


def psl_match_plan(rules: PslRules) -> list[tuple[str, int, int]]:
    """The rule-evaluation order shared by the Spark expression and
    the DuckDB oracle generator: ``(kind, k, ps_len)`` tuples where
    ``kind`` is 'exc'/'wild'/'plain', ``k`` is the suffix label count
    matched by equality, and ``ps_len`` the public-suffix label count
    when that branch wins. PSL precedence: exception rules first,
    then most-labels-wins (a wildcard rule counts its ``*``, so
    ``*.ck`` outranks plain ``ck``)."""
    order: list[tuple[tuple[int, int], str, int, int]] = []
    for k in rules.exc:
        order.append(((1, k), "exc", k, k - 1))
    for k in rules.wild:
        order.append(((0, k + 1), "wild", k, k + 1))
    for k in rules.plain:
        order.append(((0, k), "plain", k, k))
    order.sort(reverse=True)
    return [(kind, k, ps) for _, kind, k, ps in order]


def registrable_domain_psl_expr(host, rules: PslRules) -> Column:
    """Registrable domain (eTLD+1) under full Public Suffix List
    semantics — the production replacement for the
    :data:`TWO_LEVEL_SUFFIXES` heuristic (r12 VERDICT #2: ``github.io``
    / ``blogspot.*`` / wildcard+exception ccTLD registries mis-group
    under any fixed two-level set).

    Compiled as ONE when-chain over per-label-count InSet membership
    tests (`last-k labels`.isin(rules)) ordered by PSL precedence; the
    fallback is the list's implicit ``*`` rule (TLD itself public →
    last two labels). Hosts that ARE a public suffix, IPv4 literals,
    bracketed IPv6 and single labels pass through whole. Pure array
    algebra + InSets — JVM-side, scan-bound, zero shuffle at 100 TB.
    """
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)

    def lastk(k: int) -> Column:
        return F.array_join(F.slice(labels, -k, k), ".")

    out = F.when(h.startswith("[") | h.rlike(_IPV4_RE) | (n <= 1), h)
    for kind, k, ps_len in psl_match_plan(rules):
        vals = getattr(
            rules, {"exc": "exc", "wild": "wild", "plain": "plain"}[kind]
        )[k]
        cond = lastk(k).isin(*sorted(vals))
        if kind == "wild":
            cond = cond & (n >= k + 1)
        win = (
            F.when(n > ps_len, lastk(ps_len + 1)).otherwise(h)
            if ps_len >= 1
            else h
        )
        out = out.when(cond, win)
    return out.otherwise(F.when(n >= 2, lastk(2)).otherwise(h))


def _domain_expr(host, psl: PslRules | None):
    return (
        registrable_domain_psl_expr(host, psl)
        if psl is not None
        else registrable_domain_expr(host)
    )


def url_canonicalize(
    df: DataFrame,
    url_col: str,
    id_col: str,
    psl: PslRules | None = None,
) -> DataFrame:
    """Per-document URL canonicalization readout: ``id``, ``url``
    (original), ``canon_url``, ``host``, ``domain`` (registrable —
    PSL longest-match when ``psl`` is given, else the two-level
    heuristic). One stateless projection — scan-bound at 100 TB, no
    shuffle."""
    host = host_expr(url_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        canonical_url_expr(url_col).alias("canon_url"),
        host.alias("host"),
        _domain_expr(host, psl).alias("domain"),
    )


def domain_caps(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    psl: PslRules | None = None,
) -> DataFrame:
    """Per-registrable-domain frequency cap (the FineWeb per-domain
    discipline): keep at most ``cap`` documents per domain, keeping
    the LOWEST ids (deterministic, replay-stable).

    Scale shape: domain sizes are heavy-tailed on web corpora, so the
    rank window runs ONLY on rows of ABOVE-cap domains — one count
    aggregate splits the corpus, the long tail of small domains (the
    overwhelming majority of rows after the head) bypasses the window
    entirely with ``kept = true``, and the window partitions by
    domain so the per-task working set is one heavy domain's rows.
    If one domain alone exceeds a task's memory, pre-truncate with a
    per-(domain, salt) local top-``cap`` before the exact rank —
    bounded to ``salt · cap`` rows per domain — which is safe because
    only the global lowest ``cap`` ids can survive any local
    top-``cap``.

    Output: ``id``, ``domain``, ``kept``.
    """
    # consumed by THREE branches (counts, light anti-join, heavy rank):
    # pin the skinny (id, domain) projection or the domain expression —
    # a ~60-branch InSet chain under PSL rules — re-derives per
    # consumer (3 scans + 3 codegen passes of the giant CASE; measured
    # 4.4 s -> 1.5 s at sf0.1 for the PSL variant). The materialized
    # table is one skinny row per doc — far cheaper than re-scanning
    # the corpus at 100 TB.
    d = df.select(
        F.col(id_col).alias("id"),
        _domain_expr(host_expr(url_col), psl).alias("domain"),
    ).localCheckpoint(eager=False)
    counts = d.groupBy("domain").agg(F.count(F.lit(1)).alias("_n"))
    heavy = counts.filter(F.col("_n") > cap).select("domain")
    light = d.join(heavy, "domain", "left_anti").select(
        "id", "domain", F.lit(True).alias("kept")
    )
    w = Window.partitionBy("domain").orderBy("id")
    ranked = (
        d.join(heavy, "domain")
        .withColumn("_rk", F.row_number().over(w))
        .select("id", "domain", (F.col("_rk") <= cap).alias("kept"))
    )
    return light.unionByName(ranked)


def domain_mix_report(
    df: DataFrame,
    url_col: str,
    id_col: str,
    cap: int,
    psl: PslRules | None = None,
) -> DataFrame:
    """Per-domain corpus-mix report around the cap: for every
    registrable domain, the doc count before/after capping and each
    side's corpus share (6 dp) — the "what did the cap change about
    the mix" readout a curation run ships with its snapshot. All
    work happens on the per-domain table after one keyed aggregate.

    Output: ``domain``, ``n_docs``, ``n_kept``, ``share_before``,
    ``share_after``.
    """
    if cap < 1:
        raise ValueError(
            f"domain_mix_report requires cap >= 1 (got {cap}): with cap=0 "
            "nothing is kept and the after-cap shares are undefined"
        )
    per_doc = domain_caps(df, url_col, id_col, cap, psl=psl)
    agg = per_doc.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
    # consumed twice (totals + the report join): pin the per-domain
    # table or the whole cap plan (including its window) recomputes
    # per consumer
    ).localCheckpoint(eager=False)
    totals = agg.agg(
        F.sum("n_docs").alias("_tot"), F.sum("n_kept").alias("_tot_kept")
    )
    return agg.crossJoin(F.broadcast(totals)).select(
        "domain",
        "n_docs",
        "n_kept",
        F.round(F.col("n_docs") / F.col("_tot"), 6).alias("share_before"),
        # _tot_kept = 0 cannot happen with cap >= 1 on a non-empty
        # corpus, but keep the share defined (0.0) rather than NULL
        F.round(
            F.when(F.col("_tot_kept") > 0, F.col("n_kept") / F.col("_tot_kept"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("share_after"),
    )


def url_keep_one(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-level exact dedup over CANONICAL urls — the pass the
    canonicalizer exists for (CCNet dedups crawl snapshots by URL
    before any content pass, so the same page fetched with different
    tracking params / fragments / casing collapses): group by
    ``canonical_url_expr``, keep the LOWEST id per group
    (deterministic, replay-stable).

    Output: ``id``, ``canon_url``, ``n_dups`` (group size), ``kept``.
    One keyed aggregate with map-side partials plus the join back —
    both shuffles on the canonical URL; at 100 TB AQE handles the
    header-URL skew (the same mega-duplicated URL is one group)."""
    d = df.select(
        F.col(id_col).alias("id"),
        canonical_url_expr(url_col).alias("canon_url"),
    )
    g = d.groupBy("canon_url").agg(
        F.min("id").alias("_keep_id"), F.count(F.lit(1)).alias("n_dups")
    )
    return d.join(g, "canon_url").select(
        "id",
        "canon_url",
        "n_dups",
        (F.col("id") == F.col("_keep_id")).alias("kept"),
    )


def domain_quality_report(
    df: DataFrame,
    url_col: str,
    id_col: str,
    quality_expr,
    min_quality: float,
    min_docs: int = 1,
    psl: PslRules | None = None,
) -> DataFrame:
    """Per-registrable-domain QUALITY rollup — the FineWeb domain-level
    discipline applied to content quality: web domains are curated as
    UNITS (a spam domain's occasional good page still goes, because
    the domain signal is more robust than any single-page score), so
    aggregate a per-document quality score by registrable domain and
    flag domains whose MEAN falls below the floor. Domains with fewer
    than ``min_docs`` documents are never flagged (too thin to judge —
    they fall through to per-document filters instead).

    ``quality_expr`` is any per-row numeric Column over ``df``'s
    columns (e.g. a stopword ratio, a classifier score) — the rollup
    is score-agnostic so one operator serves every quality signal.

    Shape: ONE domain-keyed aggregate with map-side partials; the
    report is domain-cardinality-sized.

    Output: ``domain``, ``n_docs``, ``mean_quality`` (6 dp),
    ``flagged``.
    """
    d = df.select(
        F.col(id_col).alias("id"),
        _domain_expr(host_expr(url_col), psl).alias("domain"),
        quality_expr.cast("double").alias("_q"),
    )
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("_q"), 6).alias("mean_quality"),
    ).select(
        "domain",
        "n_docs",
        "mean_quality",
        (
            (F.col("n_docs") >= min_docs)
            & (F.col("mean_quality") < min_quality)
        ).alias("flagged"),
    )
