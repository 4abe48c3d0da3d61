"""robots.txt kernel: RFC 9309 matching, group selection, wiring-free."""

import pickle

from pyontutils_spark.kernel.robots import (
    is_allowed, parse_robots, url_path_for)


ROBOTS = """\
# comment line
User-agent: *
Disallow: /private/
Allow: /private/open$
Crawl-delay: 2

User-agent: ontobot
User-agent: ontobot-images
Disallow: /no-onto/
Allow: /

User-agent: greedy
Disallow: /

Sitemap: https://example.org/sitemap.xml
"""


def test_group_selection_longest_prefix():
    pol = parse_robots(ROBOTS)
    # exact token
    assert pol.allowed("ontobot/2.1", "/private/x")       # own group: Allow /
    assert not pol.allowed("ontobot", "/no-onto/page")
    # longer agent wins over shorter when both prefix-match
    assert not pol.allowed("ontobot-images/1.0", "/no-onto/a")
    # unknown agent falls back to *
    assert not pol.allowed("otherbot", "/private/x")
    assert pol.allowed("otherbot", "/public/x")


def test_longest_match_and_allow_tiebreak():
    pol = parse_robots(ROBOTS)
    # /private/open$ (anchor) beats /private/ by length
    assert pol.allowed("otherbot", "/private/open")
    assert not pol.allowed("otherbot", "/private/open2")   # $ anchor
    # equal-length allow beats disallow
    tie = parse_robots("User-agent: *\nDisallow: /dir/\nAllow: /dir*\n")
    assert tie.allowed("x", "/dir/")


def test_wildcards():
    pol = parse_robots(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/cache\n")
    assert not pol.allowed("x", "/docs/a.pdf")
    assert pol.allowed("x", "/docs/a.pdf.html")
    assert not pol.allowed("x", "/tmp123/cache")
    assert pol.allowed("x", "/tmp123/cachx")


def test_disallow_all_and_empty_disallow():
    pol = parse_robots(ROBOTS)
    assert not pol.allowed("greedy", "/")
    assert not pol.allowed("greedy", "/anything")
    # empty Disallow: allows everything
    assert parse_robots("User-agent: *\nDisallow:\n").allowed("x", "/a")


def test_full_urls_and_percent_decoding():
    pol = parse_robots("User-agent: *\nDisallow: /café/\n")
    assert not pol.allowed("x", "https://e.org/caf%C3%A9/page?q=1")
    # %2F must NOT decode to a path slash
    pol2 = parse_robots("User-agent: *\nDisallow: /a/b\n")
    assert pol2.allowed("x", "/a%2Fb")
    assert url_path_for("https://e.org") == "/"
    assert url_path_for("https://e.org/p?q=1") == "/p?q=1"


def test_crawl_delay_and_sitemaps():
    pol = parse_robots(ROBOTS)
    assert pol.delay_for("otherbot") == 2.0
    assert pol.sitemaps == ["https://example.org/sitemap.xml"]


def test_missing_robots_allows():
    assert is_allowed(None, "x", "/anything")
    assert is_allowed("", "x", "/anything")
    assert not is_allowed(ROBOTS, "greedy", "/x")


def test_rule_before_agent_is_skipped_and_garbage_tolerated():
    pol = parse_robots("Disallow: /lost\nnonsense line\nUser-agent: *\n"
                       "Crawl-delay: fast\nDisallow: /x\n")
    assert pol.allowed("a", "/lost")
    assert not pol.allowed("a", "/x")
    assert pol.delay_for("a") is None


def test_policy_pickles_for_broadcast():
    pol = parse_robots(ROBOTS)
    pol.allowed("x", "/private/a")          # force some compiled regexes
    p2 = pickle.loads(pickle.dumps(pol))
    assert not p2.allowed("otherbot", "/private/a")
    assert p2.allowed("ontobot", "/private/a")
