"""URL / domain column functions for web-corpus curation.

A large-scale training-data pipeline filters and rolls up by URL
structure: host extraction, registrable-domain grouping (C4 and
RefinedWeb both apply domain-level block/allow lists and per-domain
caps before any content filtering). All functions here are pure JVM
column expressions — ``parse_url`` is a built-in Catalyst expression,
so host/path/query extraction stays inside whole-stage codegen and
predicate pushdown still applies to any filter built from them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Domain-level blocklist, the shape C4 uses for its "bad domains" list.
# Matched against the registrable domain, so every subdomain is covered.
DEFAULT_DOMAIN_BLOCKLIST = ("spam.example.net", "junk.example.org")


def url_host(url: Column) -> Column:
    """Hostname of a URL (JVM ``parse_url``, no UDF)."""
    return F.parse_url(url, F.lit("HOST"))


def url_path(url: Column) -> Column:
    """Path component of a URL."""
    return F.parse_url(url, F.lit("PATH"))


def url_query_param(url: Column, key: str) -> Column:
    """A single query parameter's value (``parse_url`` QUERY form)."""
    return F.parse_url(url, F.lit("QUERY"), F.lit(key))


def registrable_domain(host: Column) -> Column:
    """Last two labels of the hostname — the registrable domain under
    generic TLDs (a public-suffix list would extend this to ccTLDs; the
    expression shape is the same: strip labels left of the suffix).
    """
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= 2, host).otherwise(
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    )


def domain_blocked(domain: Column, blocklist: tuple[str, ...]) -> Column:
    """True when the registrable domain is on the blocklist. A literal
    IN-list compiles to a hash-set probe; for million-entry lists use a
    broadcast left-semi join against a blocklist table instead."""
    return domain.isin(*blocklist)
