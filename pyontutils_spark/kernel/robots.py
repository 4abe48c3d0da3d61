"""robots.txt parsing + URL admission (RFC 9309, pure stdlib).

A Common-Crawl-style curation funnel needs a crawl-politeness gate:
drop pages whose URL the site's robots.txt disallows for the pipeline's
user agent.  This kernel implements the REP exactly as specified in
RFC 9309 (public spec):

- group selection: the group whose ``User-agent`` line is the LONGEST
  case-insensitive prefix-token match of the product token wins; the
  ``*`` group is the fallback; multiple ``User-agent`` lines stack onto
  one group.
- rule matching: percent-decoded path+query matched against each rule;
  ``*`` matches any run, ``$`` anchors the end; the rule with the
  LONGEST pattern wins; on a tie between allow and disallow of equal
  length, allow wins.  No rules / no robots.txt -> allowed.
- an empty ``Disallow:`` value allows everything (common idiom).
- ``Crawl-delay`` and ``Sitemap`` lines are surfaced as data (the
  reference pipeline uses them for scheduling, not admission).

Everything is deterministic and pickles cleanly, so a compiled
``RobotsPolicy`` per host can ship to executors inside a broadcast map.
"""

from __future__ import annotations

import re
from urllib.parse import unquote, urlsplit

__all__ = ["RobotsPolicy", "parse_robots", "is_allowed", "url_path_for"]


class _Rule:
    __slots__ = ("allow", "pattern", "length", "_rx")

    def __init__(self, allow: bool, pattern: str):
        self.allow = allow
        self.pattern = pattern
        self.length = len(pattern)
        self._rx = None

    def _compiled(self):
        rx = self._rx
        if rx is None:
            parts = []
            pat = self.pattern
            end_anchor = pat.endswith("$")
            if end_anchor:
                pat = pat[:-1]
            for piece in pat.split("*"):
                parts.append(re.escape(piece))
            body = "^" + ".*".join(parts) + ("$" if end_anchor else "")
            rx = self._rx = re.compile(body)
        return rx

    def matches(self, path: str) -> bool:
        if "*" not in self.pattern and not self.pattern.endswith("$"):
            return path.startswith(self.pattern)
        return self._compiled().match(path) is not None

    def __getstate__(self):
        return (self.allow, self.pattern)

    def __setstate__(self, st):
        self.allow, self.pattern = st
        self.length = len(self.pattern)
        self._rx = None


class RobotsPolicy:
    """Parsed robots.txt: agent groups + crawl delays + sitemaps."""

    def __init__(self):
        self.groups: dict[str, list[_Rule]] = {}
        self.crawl_delay: dict[str, float] = {}
        self.sitemaps: list[str] = []

    # -- group selection (RFC 9309 §2.2.1) -------------------------------
    def _group_for(self, user_agent: str) -> list[_Rule]:
        ua = user_agent.lower()
        # product token = chars up to the first / or space
        token = re.split(r"[/\s]", ua, 1)[0]
        best, best_len = None, -1
        for agent, rules in self.groups.items():
            if agent == "*":
                continue
            if token.startswith(agent) and len(agent) > best_len:
                best, best_len = rules, len(agent)
        if best is not None:
            return best
        return self.groups.get("*", [])

    def allowed(self, user_agent: str, url_or_path: str) -> bool:
        path = url_path_for(url_or_path)
        rules = self._group_for(user_agent)
        # most-octets rule wins; equal-length allow beats disallow
        # (RFC 9309 §2.2.2) — exactly max() on the (length, allow) pair
        best = max((
            (r.length, r.allow) for r in rules
            if r.pattern and r.matches(path)   # empty Disallow: no-op
        ), default=None)
        return True if best is None else best[1]

    def delay_for(self, user_agent: str) -> float | None:
        ua = re.split(r"[/\s]", user_agent.lower(), 1)[0]
        best, best_len = None, -1
        for agent, d in self.crawl_delay.items():
            if agent == "*":
                continue
            if ua.startswith(agent) and len(agent) > best_len:
                best, best_len = d, len(agent)
        if best is not None:
            return best
        return self.crawl_delay.get("*")


def url_path_for(url_or_path: str) -> str:
    """Percent-decoded path+query component used for rule matching."""
    if "://" in url_or_path:
        sp = urlsplit(url_or_path)
        path = sp.path or "/"
        if sp.query:
            path += "?" + sp.query
    else:
        path = url_or_path or "/"
    # decode everything except %2F (an encoded slash is NOT a slash)
    return unquote(path.replace("%2F", "\x00").replace("%2f", "\x00")) \
        .replace("\x00", "%2F")


def parse_robots(text: str) -> RobotsPolicy:
    """Parse robots.txt content into a :class:`RobotsPolicy`."""
    pol = RobotsPolicy()
    current_agents: list[str] = []
    seen_rule_since_agent = True
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            agent = val.lower()
            if seen_rule_since_agent:
                current_agents = []
                seen_rule_since_agent = False
            current_agents.append(agent)
            pol.groups.setdefault(agent, [])
        elif key in ("allow", "disallow"):
            seen_rule_since_agent = True
            if not current_agents:
                continue               # rule before any user-agent: skip
            rule = _Rule(key == "allow", val)
            for a in current_agents:
                pol.groups.setdefault(a, []).append(rule)
        elif key == "crawl-delay":
            seen_rule_since_agent = True
            try:
                d = float(val)
            except ValueError:
                continue
            for a in (current_agents or ["*"]):
                pol.crawl_delay.setdefault(a, d)
        elif key == "sitemap":
            pol.sitemaps.append(val)
    return pol


def is_allowed(robots_text: str | None, user_agent: str, url: str) -> bool:
    """One-shot convenience: None/empty robots.txt allows everything."""
    if not robots_text:
        return True
    return parse_robots(robots_text).allowed(user_agent, url)
