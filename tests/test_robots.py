"""robots.txt (operators/robots.py): RFC 9309 group selection, rule
precedence, pattern semantics."""

from __future__ import annotations

from pyiceberg_lakehouse_spark.operators.robots import (
    crawl_delay,
    is_allowed,
    parse_robots,
)


def test_group_selection_most_specific_wins():
    p = parse_robots(
        "User-agent: bot\nDisallow: /\n\n"
        "User-agent: bot-images\nDisallow: /img/\n\n"
        "User-agent: *\nDisallow: /star/\n"
    )
    # 'bot-images-crawler' prefix-matches both 'bot' and 'bot-images';
    # the longer token wins, so only /img/ is blocked
    assert not is_allowed(p, "bot-images-crawler", "/img/a")
    assert is_allowed(p, "bot-images-crawler", "/anything")
    assert not is_allowed(p, "bot", "/anything")
    assert not is_allowed(p, "unrelated", "/star/x")
    assert is_allowed(p, "unrelated", "/elsewhere")


def test_longest_match_beats_order_and_allow_wins_ties():
    p = parse_robots(
        "User-agent: *\nAllow: /dir/keep\nDisallow: /dir/\n"
    )
    assert not is_allowed(p, "b", "/dir/x")
    assert is_allowed(p, "b", "/dir/keepsake")
    # exact tie: allow wins
    p2 = parse_robots("User-agent: *\nDisallow: /t/\nAllow: /t/\n")
    assert is_allowed(p2, "b", "/t/x")


def test_wildcards_and_anchor():
    p = parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
    assert not is_allowed(p, "b", "/docs/file.pdf")
    assert is_allowed(p, "b", "/docs/file.pdf.html")
    p2 = parse_robots("User-agent: *\nDisallow: /a*b\n")
    assert not is_allowed(p2, "b", "/aXXXbZZ")
    assert is_allowed(p2, "b", "/aXXX")


def test_empty_disallow_comments_unknown_directives():
    p = parse_robots(
        "User-agent: *  # trailing comment\n"
        "Disallow:\n"
        "Nonsense: ignored\n"
        "Crawl-delay: not-a-number\n"
    )
    assert is_allowed(p, "b", "/anything")
    assert crawl_delay(p, "b") is None
    # rules before any user-agent are ignored; empty file allows
    assert is_allowed(parse_robots("Disallow: /\n"), "b", "/x")
    assert is_allowed(parse_robots(""), "b", "/x")


def test_shared_groups_and_sitemaps():
    p = parse_robots(
        "User-agent: a\nUser-agent: b\nDisallow: /x/\n"
        "Sitemap: https://s/1.xml\nSitemap: https://s/2.xml\n"
    )
    assert not is_allowed(p, "a", "/x/1")
    assert not is_allowed(p, "b", "/x/1")
    assert p["sitemaps"] == ["https://s/1.xml", "https://s/2.xml"]


def test_crawl_delay_per_group():
    p = parse_robots(
        "User-agent: fast\nCrawl-delay: 0.5\nDisallow: /z/\n\n"
        "User-agent: *\nCrawl-delay: 10\n"
    )
    assert crawl_delay(p, "fast") == 0.5
    assert crawl_delay(p, "slowpoke") == 10
