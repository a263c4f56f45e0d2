"""robots.txt parsing + matching — contract from the reference test suite.

The reference delegates to an external ``Robots`` lib behind
``Abot/Core/Robots/RobotsDotText.cs``; the binding contract we reproduce is
``Abot.Tests.Unit/Core/RobotsDotTextTest.cs:17-278``:

- group = consecutive ``User-agent`` lines + following rules; a named group
  does **not** inherit the ``*`` group's rules (``IsUrlAllowed_AllowedPages``:
  agent with only Crawl-delay allows everything).
- agent match: case-insensitive substring (``badagent`` group matches UA
  "badagent"); unmatched UA falls back to the ``*`` group.
- URLs not under the root URI are always allowed
  (``RobotsDotText.cs:78-82``; ``IsUrlAllowed_ExternalPages``).
- matching is on the **path only** — query strings never match
  (``IsUrlAllowed_QuerystringOnRoot`` / ``QuerystringMatch_NotSupported``).
- empty/whitespace ``Disallow:`` = allow all (``WildCardAgentWithEmptyDisallow``).
- longest-match wins, Allow wins ties (Google REP; superset of the tests).
  ``*`` wildcards and ``$`` anchors in rule paths are supported (needed for
  the ``Disallow: /*`` root-escape probe in
  ``Abot/Crawler/PoliteWebCrawler.cs:191-203``).
- ``Crawl-delay`` per group, 0 when absent/empty/invalid
  (``GetCrawlDelay_*``); ``Sitemap:`` lines collected globally.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from abot_spark.urls import is_base_of


@dataclass
class _Group:
    agents: list[str] = field(default_factory=list)
    # (is_allow, rule_path) in file order
    rules: list[tuple[bool, str]] = field(default_factory=list)
    crawl_delay: float = 0.0


def _rule_matches(rule: str, path: str) -> int:
    """Return match specificity (len of rule) if ``rule`` matches ``path``,
    else -1.  Supports ``*`` wildcards and a ``$`` end anchor."""
    if not rule:
        return -1
    if "*" in rule or rule.endswith("$"):
        pattern = re.escape(rule).replace(r"\*", ".*")
        if pattern.endswith(r"\$"):
            pattern = pattern[: -len(r"\$")] + "$"
        if re.match(pattern, path):
            return len(rule)
        return -1
    if path.startswith(rule):
        return len(rule)
    return -1


class RobotsDotText:
    """Parsed robots.txt bound to a root URI (cf. RobotsDotText.cs:30-110)."""

    def __init__(self, root_url: str, content: str):
        if root_url is None:
            raise ValueError("root_url is required")
        if content is None:
            raise ValueError("content is required")
        self.root_url = root_url
        self.sitemaps: list[str] = []
        self._groups: list[_Group] = []
        self._parse(content)

    # -- parsing -----------------------------------------------------------

    def _parse(self, content: str) -> None:
        current: _Group | None = None
        expecting_more_agents = False
        for raw_line in content.splitlines():
            line = raw_line.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if current is None or not expecting_more_agents:
                    current = _Group()
                    self._groups.append(current)
                current.agents.append(value.lower())
                expecting_more_agents = True
                continue
            expecting_more_agents = False
            if key == "sitemap":
                if value:
                    self.sitemaps.append(value)
            elif current is None:
                continue
            elif key == "disallow":
                if value:  # empty Disallow = allow all (no rule)
                    current.rules.append((False, value))
                else:
                    current.rules.append((True, ""))  # marker, never matches
            elif key == "allow":
                if value:
                    current.rules.append((True, value))
            elif key == "crawl-delay":
                try:
                    current.crawl_delay = float(value)
                except ValueError:
                    current.crawl_delay = 0.0

    def _group_for(self, user_agent: str | None) -> _Group | None:
        ua = (user_agent or "").lower()
        wildcard = None
        for group in self._groups:
            for agent in group.agents:
                if agent == "*":
                    if wildcard is None:
                        wildcard = group
                elif agent and agent in ua:
                    return group
        return wildcard

    # -- public API (parity surface) ----------------------------------------

    def is_url_allowed(self, url: str, user_agent: str | None) -> bool:
        """RobotsDotText.IsUrlAllowed: external URLs always allowed; else
        longest-match path rules of the UA's group."""
        if not is_base_of(self.root_url, url):
            return True
        group = self._group_for(user_agent)
        if group is None:
            return True
        try:
            path = urlsplit(url).path or "/"
        except ValueError:
            path = "/"
        best_len, best_allow = -1, True
        for is_allow, rule in group.rules:
            specificity = _rule_matches(rule, path)
            if specificity > best_len or (
                specificity == best_len and is_allow and not best_allow
            ):
                if specificity >= 0:
                    best_len, best_allow = specificity, is_allow
        return best_allow

    def is_user_agent_allowed(self, user_agent: str | None) -> bool:
        """Null/empty UA allowed; else: is the root path allowed for it."""
        if not user_agent:
            return True
        group = self._group_for(user_agent)
        if group is None:
            return True
        return self.is_url_allowed(self.root_url, user_agent)

    def get_crawl_delay(self, user_agent: str | None) -> float:
        group = self._group_for(user_agent)
        return group.crawl_delay if group is not None else 0.0


def parse_robots_rules(root_url: str, content: str | None, user_agent: str) -> dict:
    """Flatten one domain's robots.txt for the UA into plain columns —
    the shape stored in the per-domain robots rules table joined onto the
    frontier (broadcast join; see plans/wave.py)."""
    if content is None:
        return {
            "allow_rules": [], "disallow_rules": [], "crawl_delay_s": 0.0,
            "sitemaps": [], "has_robots": False,
        }
    robots = RobotsDotText(root_url, content)
    group = robots._group_for(user_agent)
    allow, disallow = [], []
    if group is not None:
        for is_allow, rule in group.rules:
            (allow if is_allow else disallow).append(rule)
    return {
        "allow_rules": allow,
        "disallow_rules": disallow,
        "crawl_delay_s": robots.get_crawl_delay(user_agent),
        "sitemaps": robots.sitemaps,
        "has_robots": True,
    }


def path_allowed(path: str, allow_rules: list[str], disallow_rules: list[str]) -> bool:
    """Longest-match verdict over pre-flattened rules (executor-side)."""
    best_len, best_allow = -1, True
    for rules, verdict in ((allow_rules, True), (disallow_rules, False)):
        for rule in rules:
            specificity = _rule_matches(rule, path)
            if specificity > best_len or (
                specificity == best_len and verdict and not best_allow
            ):
                if specificity >= 0:
                    best_len, best_allow = specificity, verdict
    return best_allow


def robots_rules_table(robots_df, user_agent: str, max_delay_s: float):
    """Distributed per-domain robots parse (S5 scale mode): ``(domain,
    robots_txt)`` rows -> ``(domain, allow_rules, disallow_rules,
    delay_ms)`` via an Arrow ``mapInPandas`` kernel — one parse per domain
    row, executor-side.

    The reference's ``RobotsDotTextFinder`` parses on the crawl driver,
    which is fine for its single-site scope (and our parity mode keeps
    that path for the root domain); gating millions of domains through a
    driver loop + collect is a bottleneck, so scale mode produces the
    rules dim table as a DataFrame that joins onto candidates
    (``plans/wave.py`` F6 gate) and onto the frontier for per-domain
    Crawl-delay pacing (C3) without any driver round-trip.

    ``delay_ms`` is already capped at ``max_delay_s``
    (MaxRobotsDotTextCrawlDelayInSeconds, PoliteWebCrawler.cs:146-167).
    """

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            doms, allows, disallows, delays = [], [], [], []
            for dom, txt in zip(pdf["domain"], pdf["robots_txt"]):
                flat = parse_robots_rules(f"http://{dom}/", txt, user_agent)
                doms.append(dom)
                allows.append(flat["allow_rules"])
                disallows.append(flat["disallow_rules"])
                delays.append(
                    int(min(flat["crawl_delay_s"], max_delay_s) * 1000))
            yield pd.DataFrame({
                "domain": doms, "allow_rules": allows,
                "disallow_rules": disallows, "delay_ms": delays})

    return robots_df.select("domain", "robots_txt").mapInPandas(
        parse, "domain string, allow_rules array<string>, "
               "disallow_rules array<string>, delay_ms long")
