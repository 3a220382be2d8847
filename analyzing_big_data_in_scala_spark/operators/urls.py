"""URL / domain extraction and domain filtering for corpus curation.

Web-scraped training corpora are filtered by the domains their documents
cite or originate from (CommonCrawl-style blocklists: spam, adult, SEO
farms). This module extracts URLs from document text, normalizes their
domains (lowercase, leading ``www.`` stripped), and gates documents whose
domains intersect a blocklist.

Every pattern lives in the Java-regex ∩ RE2 common subset (no
lookarounds, no backreferences), so extraction is bit-identical in DuckDB
and the operator is fully oracle-checkable — same contract as
``operators/pii.py``.

Scale shape: pure per-row array expressions in whole-stage codegen — no
UDF, no shuffle, no join. The blocklist is an in-expression array literal
(blocklists are KBs–MBs; at the point a blocklist outgrows an expression,
swap the `arrays_overlap` for a broadcast semi join on an exploded domain
column — same semantics, still no corpus shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Scheme + host, then any non-space path. The host is the only capture
# group, so extract-all with group 1 yields domains directly.
URL_PATTERN = r"https?://([a-zA-Z0-9.-]+)(?:/[^\s]*)?"


def extract_domains(text: Column | str) -> Column:
    """Normalized domain per URL occurrence (lowercased, ``www.``
    stripped), in document order — duplicates preserved."""
    c = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.regexp_extract_all(c, F.lit(URL_PATTERN), 1),
        lambda d: F.regexp_replace(F.lower(d), r"^www\.", ""),
    )


def url_stats(
    docs: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_urls, n_domains, primary_domain, blocked) per document.

    `primary_domain` is the lexicographic minimum of the distinct domains
    (a deterministic representative; NULL when the doc has no URLs);
    `blocked` is true iff any domain matches the blocklist exactly."""
    domains = extract_domains(text_col)
    distinct = F.array_distinct(domains)
    blocked = F.coalesce(
        F.arrays_overlap(distinct, F.array(*[F.lit(d) for d in blocklist])),
        F.lit(False),
    )
    return docs.select(
        F.col(id_col),
        F.size(domains).alias("n_urls"),
        F.size(distinct).alias("n_domains"),
        F.array_min(distinct).alias("primary_domain"),
        blocked.alias("blocked"),
    )


def sql_url_stats(
    blocklist: list[str], doc_expr: str = "text"
) -> dict[str, str]:
    """DuckDB twins of :func:`url_stats`'s expressions, over `doc_expr`."""
    pat = URL_PATTERN
    doms = (
        f"list_transform(regexp_extract_all({doc_expr}, '{pat}', 1), "
        "d -> regexp_replace(lower(d), '^www\\.', ''))"
    )
    distinct = f"list_distinct({doms})"
    blist = "[" + ", ".join(f"'{d}'" for d in blocklist) + "]"
    return {
        "n_urls": f"len(regexp_extract_all({doc_expr}, '{pat}', 1))",
        "n_domains": f"len({distinct})",
        "primary_domain": f"list_min({distinct})",
        "blocked": f"COALESCE(len(list_intersect({distinct}, {blist})) > 0, FALSE)",
    }
