"""robots.txt parse + frontier filter (functions/robots.py)."""

from neleval_spark.functions.robots import parse_robots, robots_filter

BODY = """# site policy
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:

User-agent: greedybot
User-agent: otherbot
Disallow: /
"""


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, body string")


def _frontier(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _allowed(spark, urls, body_rows, agent="*"):
    rules = parse_robots(_robots(spark, body_rows))
    out = robots_filter(_frontier(spark, urls), rules, agent=agent,
                        keep_disallowed=True)
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_parse_groups_and_directives(spark):
    rules = parse_robots(_robots(spark, [("h", BODY)])).collect()
    got = {(r.agent, r.rule, r.prefix) for r in rules}
    # empty Disallow dropped; comment line dropped; two-UA group
    assert got == {("*", 0, "/private"), ("*", 1, "/private/ok"),
                   ("greedybot", 0, "/"), ("otherbot", 0, "/")}


def test_longest_prefix_and_allow_wins(spark):
    urls = ["http://h/private/ok/a", "http://h/private/no",
            "http://h/pub", "http://h/"]
    got = _allowed(spark, urls, [("h", BODY)])
    assert got == {"http://h/private/ok/a": True,   # longer Allow
                   "http://h/private/no": False,
                   "http://h/pub": True,            # no rule matches
                   "http://h/": True}


def test_tie_allow_wins(spark):
    body = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    got = _allowed(spark, ["http://h/a/x"], [("h", body)])
    assert got == {"http://h/a/x": True}


def test_specific_agent_group_overrides_star(spark):
    got = _allowed(spark, ["http://h/anything"], [("h", BODY)],
                   agent="greedybot")
    assert got == {"http://h/anything": False}
    # agent matching is case-insensitive
    got = _allowed(spark, ["http://h/anything"], [("h", BODY)],
                   agent="GreedyBot")
    assert got == {"http://h/anything": False}


def test_host_without_robots_allowed(spark):
    got = _allowed(spark, ["http://nowhere/x"], [("h", BODY)])
    assert got == {"http://nowhere/x": True}


def test_drop_mode_filters(spark):
    rules = parse_robots(_robots(spark, [("h", BODY)]))
    kept = robots_filter(
        _frontier(spark, ["http://h/private/no", "http://h/pub"]),
        rules)
    assert [r["url"] for r in kept.collect()] == ["http://h/pub"]
    assert "allowed" not in kept.columns


def test_rootless_url_defaults_to_root_path(spark):
    body = "User-agent: *\nDisallow: /\n"
    got = _allowed(spark, ["http://h"], [("h", body)])
    assert got == {"http://h": False}


def test_query_string_matching(spark):
    """RFC 9309 matches against path?query — 'Disallow: /search?q='
    must block search result urls but not the bare /search page."""
    body = "User-agent: *\nDisallow: /search?q=\nDisallow: /?sort=\n"
    urls = ["http://h/search?q=cats", "http://h/search",
            "http://h/search?lang=en", "http://h/?sort=price",
            "http://h/"]
    got = _allowed(spark, urls, [("h", body)])
    assert got == {"http://h/search?q=cats": False,
                   "http://h/search": True,
                   "http://h/search?lang=en": True,
                   "http://h/?sort=price": False,
                   "http://h/": True}


def test_schedule_frontier(spark):
    from neleval_spark.functions.robots import schedule_frontier

    urls = [f"http://a/{i}" for i in range(6)] + ["http://b/x"]
    out = schedule_frontier(_frontier(spark, urls), delay_s=10,
                            start_ts=100).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert len(by_host["a"]) == 6 and len(by_host["b"]) == 1
    slots = sorted(r.slot for r in by_host["a"])
    assert slots == [0, 1, 2, 3, 4, 5]
    for r in out:
        assert r.fetch_ts == 100 + r.slot * 10
    # deterministic across invocations
    again = schedule_frontier(_frontier(spark, urls), delay_s=10,
                              start_ts=100).collect()
    assert {(r.url, r.slot) for r in again} == \
        {(r.url, r.slot) for r in out}


def test_schedule_frontier_budget(spark):
    from neleval_spark.functions.robots import schedule_frontier

    urls = [f"http://hot/{i}" for i in range(100)] + ["http://b/x"]
    out = schedule_frontier(_frontier(spark, urls), delay_s=1,
                            max_per_host=10).collect()
    hot = [r for r in out if r.host == "hot"]
    assert len(hot) == 10
    assert sorted(r.slot for r in hot) == list(range(10))


def test_robots_filter_plan_never_windows_frontier(spark):
    """PLANS.md claim: FILTERING is join + max_by aggregate — given a
    materialized rule table, the executed plan has no Window operator
    (parse_robots itself windows only KB-sized robots LINES; that
    side is materialized here to isolate the frontier plan)."""
    rows = parse_robots(_robots(spark, [("h", BODY)])).collect()
    rules = spark.createDataFrame(
        rows, "host string, agent string, rule int, prefix string, "
              "prefix_len int")
    out = robots_filter(_frontier(spark, ["http://h/a"]), rules,
                        keep_disallowed=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_sitemap_directives_global_and_comments(spark):
    from neleval_spark.functions.robots import sitemap_directives
    body = ("User-agent: *\n"
            "Disallow: /private\n"
            "Sitemap: https://a.com/sitemap.xml\n"
            "User-agent: bot\n"
            "SITEMAP:https://a.com/news.xml  # daily\n"
            "# Sitemap: https://a.com/commented.xml\n"
            "NotADirective: x\n")
    df = spark.createDataFrame([("a.com", body), ("b.com", "none")],
                               "host string, body string")
    got = [(r["host"], r["sitemap"])
           for r in sitemap_directives(df).orderBy("pos").collect()]
    # global: both directives surface regardless of their group; the
    # fully-commented line does not
    assert got == [("a.com", "https://a.com/sitemap.xml"),
                   ("a.com", "https://a.com/news.xml")]
