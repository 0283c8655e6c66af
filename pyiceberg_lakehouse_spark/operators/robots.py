"""robots.txt parsing + the RFC 9309 allow/disallow decision.

A compliant crawl pipeline decides fetchability BEFORE a URL enters
the corpus; re-deciding at curation time (was this page allowed when
crawled?) needs the same engine. This implements RFC 9309's actual
semantics — the parts naive implementations get wrong:

- group selection: the MOST SPECIFIC matching user-agent line wins
  (longest product-token match, '*' only when nothing else matches);
  consecutive user-agent lines share one group;
- rule precedence: the LONGEST matching path pattern wins regardless
  of allow/disallow order; on an exact length tie, allow wins;
- patterns: '*' matches any char sequence, '$' anchors the end;
  everything else is literal;
- an empty Disallow ("Disallow:") allows everything; a missing or
  unfetchable robots.txt (caller's policy) means allow;
- unknown directives and comments ('#') are ignored; Crawl-delay and
  Sitemap are surfaced as data, not interpreted.
"""

from __future__ import annotations

import re


def parse_robots(text: str) -> dict:
    """-> {groups: [{agents: [lower str], rules: [(allow: bool,
    pattern: str)], crawl_delay: float|None}], sitemaps: [str]}."""
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
            cur["agents"].append(val.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            sitemaps.append(val)
            continue
        if cur is None:
            continue  # rules before any user-agent line are ignored
        if key in ("allow", "disallow"):
            if key == "disallow" and val == "":
                continue  # empty Disallow = no rule (allows everything)
            cur["rules"].append((key == "allow", val))
        elif key == "crawl-delay":
            try:
                cur["crawl_delay"] = float(val)
            except ValueError:
                pass
    return {"groups": groups, "sitemaps": sitemaps}


def _pattern_matches(pattern: str, path: str) -> bool:
    rx = "".join(
        ".*" if c == "*" else "$" if c == "$" else re.escape(c)
        for c in pattern
    )
    return re.match(rx, path) is not None


def _select_group(parsed: dict, agent: str) -> dict | None:
    agent = agent.lower()
    best = None
    best_len = -1
    star = None
    for g in parsed["groups"]:
        for a in g["agents"]:
            if a == "*":
                star = star or g
            elif agent.startswith(a) and len(a) > best_len:
                best, best_len = g, len(a)
    return best if best is not None else star


def is_allowed(parsed: dict, agent: str, path: str) -> bool:
    """RFC 9309 decision: longest matching pattern wins; allow wins
    ties; no matching rule (or no matching group) allows."""
    g = _select_group(parsed, agent)
    if g is None:
        return True
    best_len = -1
    verdict = True
    for allow, pattern in g["rules"]:
        if _pattern_matches(pattern, path):
            # '$' anchors but should not count toward specificity
            plen = len(pattern.rstrip("$"))
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                verdict = allow
    return verdict


def crawl_delay(parsed: dict, agent: str) -> float | None:
    g = _select_group(parsed, agent)
    return g["crawl_delay"] if g else None
