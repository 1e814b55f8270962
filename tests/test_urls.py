"""URL canonicalization + per-domain cap operators (SURVEY §2.12
L63/L64)."""

from __future__ import annotations

from isilon_hadoop_tools_spark.operators.urls import (
    domain_caps,
    domain_mix_report,
    url_canonicalize,
)


def _canon(spark, urls: list[str]) -> list[dict]:
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    return [
        r.asDict()
        for r in url_canonicalize(df, "url", "id").orderBy("id").collect()
    ]


def test_canonicalize_edge_cases(spark):
    rows = _canon(
        spark,
        [
            # scheme/host lowercased, path case preserved, default port
            # stripped, fragment dropped
            "HTTPS://WWW.Example.COM:443/Articles/Item1#frag",
            # non-default port kept; userinfo stripped
            "http://user:pw@example.org:8080/x",
            # tracking params stripped, survivors sorted; empty pairs out
            "http://example.com/p?utm_source=f&b=2&a=1&gclid=x&&utm_campaign=",
            # ONLY tracking params -> no query at all
            "http://example.com/p?utm_source=f&fbclid=1",
            # empty path -> '/', default http port stripped
            "http://Example.com:80",
            # fragment containing '?' must not leak a query
            "http://example.com/a#sec?notaquery=1",
            # IDN punycode passes through (lowercased only)
            "http://XN--BCHER-KVA.example/b",
            # IPv4 host
            "http://192.168.1.7:8080/x?z=1",
        ],
    )
    assert rows[0]["canon_url"] == "https://www.example.com/Articles/Item1"
    assert rows[1]["canon_url"] == "http://example.org:8080/x"
    assert rows[1]["host"] == "example.org"
    assert rows[2]["canon_url"] == "http://example.com/p?a=1&b=2"
    assert rows[3]["canon_url"] == "http://example.com/p"
    assert rows[4]["canon_url"] == "http://example.com/"
    assert rows[5]["canon_url"] == "http://example.com/a"
    assert rows[6]["canon_url"] == "http://xn--bcher-kva.example/b"
    assert rows[7]["canon_url"] == "http://192.168.1.7:8080/x?z=1"


def test_registrable_domain_heuristic(spark):
    rows = _canon(
        spark,
        [
            "http://a.b.news.example.co.uk/",      # two-level suffix -> 3 labels
            "http://sub.blog.example.org/",         # generic -> last 2
            "http://example.com/",                  # already eTLD+1
            "http://localhost/",                    # single label
            "http://192.168.1.250/",                # IPv4 passes whole
            "http://shop.example.com.au/",          # com.au
            "http://xn--bcher-kva.example/",        # 2 labels -> whole
        ],
    )
    assert [r["domain"] for r in rows] == [
        "example.co.uk",
        "example.org",
        "example.com",
        "localhost",
        "192.168.1.250",
        "example.com.au",
        "xn--bcher-kva.example",
    ]


def test_domain_caps_keeps_lowest_ids_and_skips_small_domains(spark):
    # domain A: 5 docs, cap 3 -> ids 0,1,2 kept; domain B: 2 docs (under
    # cap -> bypasses the rank window entirely, all kept)
    urls = [(i, "http://a.example.com/x") for i in range(5)] + [
        (10, "http://b.example.org/y"),
        (11, "http://b.example.org/z"),
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {
        r["id"]: (r["domain"], r["kept"])
        for r in domain_caps(df, "url", "id", cap=3).collect()
    }
    assert {i for i, (d, k) in got.items() if k} == {0, 1, 2, 10, 11}
    assert got[3] == ("example.com", False)
    assert got[4] == ("example.com", False)
    assert got[10][0] == "example.org"

    rep = {
        r["domain"]: r
        for r in domain_mix_report(df, "url", "id", cap=3).collect()
    }
    assert rep["example.com"]["n_docs"] == 5
    assert rep["example.com"]["n_kept"] == 3
    assert rep["example.org"]["n_kept"] == 2
    assert abs(rep["example.com"]["share_before"] - 5 / 7) < 5e-7  # 6-dp rounded
    assert abs(rep["example.com"]["share_after"] - 3 / 5) < 5e-7  # 6-dp rounded


def test_url_keep_one_collapses_canonical_duplicates(spark):
    from isilon_hadoop_tools_spark.operators.urls import url_keep_one

    urls = [
        (3, "http://Example.COM/a?utm_source=x&b=1#f3"),
        (1, "https://irrelevant.org/other"),
        (7, "http://example.com:80/a?b=1&gclid=z"),   # same canon as 3
        (9, "HTTP://EXAMPLE.com/a?b=1"),              # same canon as 3
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {r["id"]: r for r in url_keep_one(df, "url", "id").collect()}
    assert got[3]["canon_url"] == "http://example.com/a?b=1"
    assert [got[i]["kept"] for i in (3, 7, 9)] == [True, False, False]
    assert got[3]["n_dups"] == 3
    assert got[1]["kept"] and got[1]["n_dups"] == 1


def test_web_curation_pipeline_stages(spark):
    """Capstone composition: URL keep-one -> domain cap -> decon cut,
    each stage's fate visible per doc."""
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.corpus import (
        web_curation_pipeline,
    )

    rows = [
        (0, "http://eval.example.net/e", "secret bench phrase here tail"),
        (1, "http://A.example.com/x?utm_source=1", "clean words only here one"),
        (2, "http://a.example.com/x", "another clean doc two"),
        (3, "http://b.example.com/y", "intro secret bench phrase here end"),
        (4, "http://c.example.com/z", "yet more clean text four"),
        (5, "http://other.org/w", "totally separate domain text five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {
        r["id"]: (r["domain"], r["stage"], r["n_removed"])
        for r in web_curation_pipeline(
            df, "url", "text", "doc_id", cap=2,
            is_eval=F.col("id") == 0, n=3,
        ).collect()
    }
    # docs 1/2 share canon http://a.example.com/x -> 1 kept, 2 url_dup;
    # example.com survivors 1,3,4 -> cap 2 keeps 1,3; 4 domain_cap;
    # doc 3 overlaps eval grams 'secret bench phrase'/'bench phrase
    # here' -> merged span [1,5) -> 4 tokens cut; eval doc 0 absent
    assert got == {
        1: ("example.com", "kept", 0),
        2: ("example.com", "url_dup", 0),
        3: ("example.com", "kept", 4),
        4: ("example.com", "domain_cap", 0),
        5: ("other.org", "kept", 0),
    }


def test_canonicalize_is_idempotent_on_randomized_urls(spark):
    """canon(canon(u)) == canon(u): canonicalization must be a
    projection (a second pass finds nothing left to normalize) over a
    randomized component grid — schemes x hosts x userinfo x ports x
    paths x tracking/real params x fragments. A non-idempotent canon
    would mean URL-level dedup keys depend on how many times the
    hygiene pass ran."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.urls import canonical_url_expr

    rng = random.Random(7)
    schemes = ["http", "HTTPS", "ftp"]
    users = ["", "u:p@"]
    hosts = ["Example.COM", "a.b.example.co.uk", "192.168.7.9",
             "xn--bcher-kva.example", "localhost"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/A/b", "/x%20y"]
    queries = ["", "?utm_source=t&b=2&a=1", "?z=9&gclid=x&z=1", "?utm_campaign="]
    frags = ["", "#Sec?x=1"]
    combos = list(itertools.product(schemes, users, hosts, ports, paths,
                                    queries, frags))
    rng.shuffle(combos)
    urls = ["".join((s + "://", u, h, po, pa, q, f))
            for s, u, h, po, pa, q, f in combos[:150]]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonical_url_expr("url").alias("c1")
    ).select(
        "c1", canonical_url_expr(F.col("c1")).alias("c2")
    )
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]


def test_domain_caps_property_matches_python_replay(spark):
    """Random (id, domain) multisets: per domain, kept ids are exactly
    the lowest min(n, cap) ids — the engine's light/heavy split must
    be invisible in the result."""
    import random

    from isilon_hadoop_tools_spark.operators.urls import domain_caps

    rng = random.Random(13)
    rows = []
    ids = rng.sample(range(10_000), 400)
    for i in ids:
        d = rng.randrange(12)
        rows.append((i, f"http://h{d}.dom{d}.org/p"))
    cap = 7
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r["id"]: (r["domain"], r["kept"])
        for r in domain_caps(df, "url", "id", cap).collect()
    }
    # recompute domain exactly as the operator defines it (last two
    # labels of hN.domN.org -> domN.org)
    bydom: dict = {}
    for i, u in rows:
        host = u.split("://")[1].split("/")[0]
        dom = ".".join(host.split(".")[-2:])
        bydom.setdefault(dom, []).append(i)
    want = {}
    for dom, ds in bydom.items():
        keep = set(sorted(ds)[:cap])
        for i in ds:
            want[i] = (dom, i in keep)
    assert got == want


def test_domain_quality_report_flags_low_mean_domains(spark):
    from pyspark.sql import functions as F

    from isilon_hadoop_tools_spark.operators.urls import (
        domain_quality_report,
    )

    rows = [
        # spam.org: 3 docs, mean quality 0.1 -> flagged
        (1, "http://a.spam.org/x", 0.1),
        (2, "http://b.spam.org/y", 0.1),
        (3, "http://c.spam.org/z", 0.1),
        # good.org: 3 docs, mean 0.6 -> kept
        (4, "http://good.org/a", 0.5),
        (5, "http://good.org/b", 0.6),
        (6, "http://good.org/c", 0.7),
        # thin.org: 2 low docs but < min_docs -> never flagged
        (7, "http://thin.org/a", 0.0),
        (8, "http://thin.org/b", 0.0),
    ]
    df = spark.createDataFrame(rows, "id long, url string, q double")
    got = {
        r["domain"]: (r["n_docs"], r["mean_quality"], r["flagged"])
        for r in domain_quality_report(
            df, "url", "id", F.col("q"), min_quality=0.3, min_docs=3
        ).collect()
    }
    assert got["spam.org"] == (3, 0.1, True)
    assert got["good.org"] == (3, 0.6, False)
    assert got["thin.org"] == (2, 0.0, False)


def test_ipv6_bracketed_hosts_stay_distinct(spark):
    # ADVICE r12: '[::1]' and '[::2]' must NOT both parse to host '['
    # and falsely merge under url_keep_one / domain_caps.
    rows = _canon(
        spark,
        [
            "http://[::1]/x",
            "http://[::2]/x",
            "HTTP://[2001:DB8::1]:8080/y",
            "http://[2001:db8::1]:80/y",   # non-default port for http? no: 80 IS default
            "http://[::ffff:1.2.3.4]/z",
        ],
    )
    assert rows[0]["host"] == "[::1]"
    assert rows[1]["host"] == "[::2]"
    assert rows[0]["canon_url"] == "http://[::1]/x"
    assert rows[1]["canon_url"] == "http://[::2]/x"
    assert rows[0]["canon_url"] != rows[1]["canon_url"]
    # brackets keep the port separator unambiguous; non-default kept
    assert rows[2]["canon_url"] == "http://[2001:db8::1]:8080/y"
    # default port stripped even behind brackets
    assert rows[3]["canon_url"] == "http://[2001:db8::1]/y"
    # IPv4-mapped IPv6 contains dots: domain must stay the whole literal
    assert rows[4]["domain"] == "[::ffff:1.2.3.4]"
    assert rows[2]["domain"] == "[2001:db8::1]"


def test_domain_mix_report_rejects_cap_zero(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "http://a.com/x")], "id long, url string"
    )
    with _pytest.raises(ValueError, match="cap >= 1"):
        domain_mix_report(df, "url", "id", 0)


def test_psl_registrable_domain_hand_cases(spark):
    from isilon_hadoop_tools_spark.operators.urls import (
        load_psl,
        registrable_domain_expr,
        registrable_domain_psl_expr,
    )

    psl = load_psl()
    cases = [
        # (host, expected PSL registrable, expected heuristic)
        ("user1.github.io", "user1.github.io", "github.io"),  # private suffix
        ("a.b.user1.github.io", "user1.github.io", "github.io"),
        ("blog9.blogspot.com", "blog9.blogspot.com", "blogspot.com"),
        ("x.blogspot.co.uk", "x.blogspot.co.uk", "blogspot.co.uk"),
        ("www.example.co.uk", "example.co.uk", "example.co.uk"),  # agree
        ("news.example.com", "example.com", "example.com"),       # agree
        # wildcard *.kawasaki.jp: townN.kawasaki.jp is a PUBLIC suffix
        ("a.town1.kawasaki.jp", "a.town1.kawasaki.jp", "kawasaki.jp"),
        ("town1.kawasaki.jp", "town1.kawasaki.jp", "kawasaki.jp"),
        # exception !city.kawasaki.jp: city.kawasaki.jp is REGISTRABLE
        ("deep.sub.city.kawasaki.jp", "city.kawasaki.jp", "kawasaki.jp"),
        ("city.kawasaki.jp", "city.kawasaki.jp", "kawasaki.jp"),
        # *.ck wildcard with !www.ck exception
        ("shop.example.ck", "shop.example.ck", "example.ck"),
        ("example.ck", "example.ck", "example.ck"),
        ("www.ck", "www.ck", "www.ck"),
        ("sub.www.ck", "www.ck", "www.ck"),
        # unknown TLD -> implicit * rule: last two labels
        ("foo.bar.unknowntld", "bar.unknowntld", "bar.unknowntld"),
        # pass-throughs
        ("192.168.1.7", "192.168.1.7", "192.168.1.7"),
        ("[::1]", "[::1]", "[::1]"),
        ("localhost", "localhost", "localhost"),
    ]
    df = spark.createDataFrame([(h,) for h, _, _ in cases], "host string")
    rows = df.select(
        "host",
        registrable_domain_psl_expr("host", psl).alias("psl_dom"),
        registrable_domain_expr("host").alias("heur_dom"),
    ).collect()
    got = {r["host"]: (r["psl_dom"], r["heur_dom"]) for r in rows}
    for host, want_psl, want_heur in cases:
        assert got[host][0] == want_psl, (host, got[host][0], want_psl)
        assert got[host][1] == want_heur, (host, got[host][1], want_heur)


def test_psl_parse_and_plan_precedence():
    from isilon_hadoop_tools_spark.operators.urls import (
        parse_psl,
        psl_match_plan,
    )

    rules = parse_psl(
        ["// comment", "", "com", "co.uk", "*.ck", "!www.ck", "github.io"]
    )
    assert rules.plain[1] == frozenset({"com"})
    assert rules.plain[2] == frozenset({"co.uk", "github.io"})
    assert rules.wild[1] == frozenset({"ck"})
    assert rules.exc[2] == frozenset({"www.ck"})
    plan = psl_match_plan(rules)
    # exceptions first, then most-labels (wildcard counts its *)
    assert plan[0] == ("exc", 2, 1)
    kinds = [p[0] for p in plan]
    assert kinds.index("exc") < kinds.index("wild") < kinds.index("plain")
