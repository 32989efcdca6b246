"""Robots-exclusion kernel: a statement-level port of the reference's
RobotExclusionProtocol.java:11-65 plus the crawl-delay parser from
Crawler.java:512-520 — the last crawl-control behaviors without a batch
analog until now.

Reference semantics pinned exactly:
- user-agent-specific rules take absolute priority: if the named agent's
  section has any Allow/Disallow lines, ONLY those are evaluated; else
  the ``*`` section; else everything is allowed
  (RobotExclusionProtocol.java:12-24).
- section extraction quirk (java:27-41): a section stays "relevant" only
  while no rules have been collected yet (``relevantLines.isEmpty()`` in
  the conjunction), so only the FIRST matching user-agent section
  contributes rules.
- rules evaluate in file order; the first whose pattern matches the URL
  PATH decides (Allow -> allowed, Disallow -> blocked); no match ->
  allowed (java:44-57). The caller passes url.getPath()
  (Crawler.java:223, 551).
- pattern-conversion quirk (java:59-64): ``*`` expands to ``.*`` BEFORE
  dots are escaped, so a robots wildcard ends up as ``\\.*`` (zero or
  more literal dots). Reproduced faithfully — coverage identity with the
  reference matters more than RFC 9309 conformance.
- a robots body of ``NaN`` (the reference's fetch-failure sentinel,
  Crawler.java:208-215) allows everything.
- crawl-delay: first ``crawl-delay:`` occurrence (case-insensitive),
  value in seconds -> milliseconds, default 1000 ms (java:512-520).
"""

from __future__ import annotations

import re
from functools import lru_cache

RULE_RE = re.compile(r"(Allow|Disallow):\s*(.*)")

USER_AGENT = "cis5550-crawler"  # Crawler.java:223


def _extract_relevant_lines(robot_txt: str, user_agent: str) -> list:
    is_relevant = False
    relevant: list = []
    for line in robot_txt.split("\n"):
        line = line.strip()
        if line.lower().startswith("user-agent:"):
            ua = line[len("user-agent:"):].strip()
            is_relevant = ua.lower() == user_agent.lower() and not relevant
        elif is_relevant and (line.startswith("Allow:") or line.startswith("Disallow:")):
            relevant.append(line)
    return relevant


def _path_to_regex(path: str) -> str:
    # Java: replace("*", ".*") then replace("?", "\\?") then
    # replaceAll("[.]", "\\.") — dot-escape AFTER wildcard expansion
    p = path.strip().replace("*", ".*").replace("?", "\\?").replace(".", "\\.")
    return "^" + p + ".*$"


def _evaluate(rules: list, path: str) -> bool:
    for line in rules:
        m = RULE_RE.fullmatch(line)
        if m:
            pattern = _path_to_regex(m.group(2))
            if re.fullmatch(pattern, path):
                return m.group(1).lower() == "allow"
    return True


@lru_cache(maxsize=4096)
def _compiled_rules(robot_txt: str, user_agent: str) -> tuple:
    """(rules for the agent) resolved once per distinct robots body."""
    specific = _extract_relevant_lines(robot_txt, user_agent)
    if specific:
        return tuple(specific)
    return tuple(_extract_relevant_lines(robot_txt, "*"))


def is_url_allowed(robot_txt: str, path: str, user_agent: str = USER_AGENT) -> bool:
    """True when ``path`` may be crawled under ``robot_txt``."""
    if robot_txt is None or robot_txt.lower() == "nan":
        return True
    rules = _compiled_rules(robot_txt, user_agent)
    if not rules:
        return True
    return _evaluate(list(rules), path)


def parse_crawl_delay(robot_txt: str) -> float:
    """Crawl delay in milliseconds (default 1000.0, Crawler.java:512-520)."""
    if not robot_txt:
        return 1000.0
    idx = robot_txt.lower().find("crawl-delay:")
    if idx < 0:
        return 1000.0
    try:
        return float(robot_txt[idx + 12:].split("\n")[0]) * 1000
    except ValueError:
        return 1000.0
