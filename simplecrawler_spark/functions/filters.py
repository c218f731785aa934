"""Candidate-URL filter predicates (reference parity kernels).

Parity targets:
- domain_valid ⇔ Crawler.domainValid  crawler.ts:1003-1065
- depth gate   ⇔ crawler.ts:1086-1090 (enqueue-time), maxDepth semantics

These are expressed both as pure Python (used in golden tests and inside
Arrow UDF batches) and as Spark Column expressions in
simplecrawler_spark.operators.filters for the hot path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List

__all__ = ["DomainRules", "domain_valid"]

_WWW_RE = re.compile(r"^www\.", re.I)
_WWW_RE_G = re.compile(r"^www.", re.I)  # reference uses /^www./ig (dot unescaped)


@dataclass
class DomainRules:
    """The crawler config knobs that drive domainValid."""
    host: str = ""
    filter_by_domain: bool = True
    ignore_www_domain: bool = True
    scan_subdomains: bool = False
    domain_whitelist: List[str] = field(default_factory=list)


def _in_whitelist(host: str, rules: DomainRules) -> bool:
    if not rules.domain_whitelist:
        return False
    for entry in rules.domain_whitelist:
        if host == entry:
            return True
        if rules.ignore_www_domain and host == _WWW_RE.sub("", entry, count=1):
            return True
    return False


def _is_subdomain_of(subdomain: str, host: str, ignore_www: bool) -> bool:
    subdomain = subdomain.lower()
    host = host.lower()
    if ignore_www:
        subdomain = _WWW_RE_G.sub("", subdomain, count=1)
        host = _WWW_RE_G.sub("", host, count=1)
    return subdomain[::-1][: len(host)] == host[::-1]


def domain_valid(host: str, rules: DomainRules) -> bool:
    """crawler.ts:1003-1065 — crawl-host equality (www-insensitive by
    default), whitelist, and reversed-prefix subdomain matching."""
    if rules.ignore_www_domain:
        host = _WWW_RE.sub("", host, count=1)
    return (not rules.filter_by_domain
            or host == rules.host
            or (rules.ignore_www_domain
                and _WWW_RE.sub("", rules.host, count=1) == _WWW_RE.sub("", host, count=1))
            or _in_whitelist(host, rules)
            or (rules.scan_subdomains
                and _is_subdomain_of(host, rules.host, rules.ignore_www_domain)))
