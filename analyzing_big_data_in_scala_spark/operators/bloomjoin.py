"""Bloom-filter semi-join pruning: cut the probe (fact) side of a join
BEFORE its shuffle using a tiny bit-set summary of the build side's join
keys — the explicit, testable form of what Spark's runtime row-level
bloom filter and dynamic partition pruning inject automatically when
their heuristics fire.

Why it matters at 100 TB: when the build side is selective but too large
to broadcast as ROWS (e.g. 30M filtered order keys), the shuffle of the
untrimmed fact side dominates the join. A Bloom filter of those keys is
a few hundred KB regardless of row width, broadcasts for free, and drops
most non-matching fact rows map-side — the shuffle then carries only
(matches + false positives). False positives are removed by the exact
join that follows, so the END RESULT IS EXACTLY the plain join (Bloom
filters have no false negatives when built over all build keys): the
DuckDB oracle for any query using this path is the plain join itself.

Representation: a dense array<bigint> of m_bits/64 words built in-plan
(one hash aggregate over the build keys, then a single-row
map->dense-array transform), broadcast via a 1-row cross join. Probes
are O(1): `element_at(words, pos DIV 64 + 1)` bit-tests, k per row, all
whole-stage-codegen'd — no Python anywhere.

Determinism: xxhash64 seeds the k probe functions with literal 0..k-1;
build and probe share _position_sql so they can never disagree.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    """The key column is interpolated into SQL expression strings; require a
    plain unqualified identifier so a qualified/aliased name cannot silently
    reference the wrong column (the lesson from _lsh_plane_bucket's r5
    advice note)."""
    if not _IDENT.match(name):
        raise ValueError(f"key_col must be a plain unqualified identifier, got {name!r}")
    return name


def _position_sql(key_col: str, seed: int, m_bits: int) -> str:
    """Bit position of hash `seed` for `key_col` — shared verbatim by build
    and probe. pmod keeps it in [0, m_bits) for negative hashes."""
    return f"pmod(xxhash64(`{key_col}`, {seed}L), {m_bits}L)"


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """1-row DataFrame with column `bloom_words`: a dense array<bigint> of
    m_bits/64 words with the k hash positions of every build key set.

    Scale shape: explode-to-k-positions is map-side; ONE hash aggregate on
    word index (<= m_bits/64 = 16384 groups for the 1 MiB default — bounded
    by the filter geometry, not the key count); the dense-array transform
    runs on a single 1-row stage. Size m_bits from an approx build-key
    count upfront (~10 bits/key for ~1% fpp) — the array costs
    m_bits/8 bytes to broadcast no matter how many keys went in.
    """
    _check_ident(key_col)
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    positions = keys.select(
        F.explode(F.array(*[F.expr(_position_sql(key_col, i, m_bits)) for i in range(k)])).alias("pos")
    )
    words = positions.select(
        F.expr("CAST(pos DIV 64 AS INT)").alias("widx"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
    ).groupBy("widx").agg(F.expr("bit_or(mask)").alias("word"))
    # Densify via a word-index spine + one sorted collect: O(n_words log
    # n_words). (A map_from_entries + per-index try_element_at transform is
    # the tempting one-liner, but Spark map lookup is a LINEAR scan of
    # ArrayBasedMapData — 16384 lookups x 16384-entry map measured ~19 s in
    # a single task; this form is ~0.5 s.)
    spine = keys.sparkSession.range(n_words).select(F.col("id").cast("int").alias("widx"))
    return (
        spine.join(F.broadcast(words), "widx", "left")
        .agg(F.array_sort(F.collect_list(F.struct("widx", F.coalesce("word", F.lit(0).cast("long")).alias("word")))).alias("entries"))
        .select(F.expr("transform(entries, e -> e.word)").alias("bloom_words"))
    )


def bloom_prune(big: DataFrame, key_col: str, bloom: DataFrame, m_bits: int = 1 << 20, k: int = 3) -> DataFrame:
    """Rows of `big` whose key MIGHT be in the filter (superset of the true
    matches — never drops a real match). The 1-row `bloom` frame is
    broadcast; each probe is k O(1) bit tests inside codegen."""
    _check_ident(key_col)
    probed = big.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for i in range(k):
        pos = _position_sql(key_col, i, m_bits)
        cond = cond & F.expr(
            f"(element_at(bloom_words, CAST({pos} DIV 64 AS INT) + 1) & shiftleft(1L, CAST({pos} % 64 AS INT))) != 0"
        )
    return probed.filter(cond).drop("bloom_words")


def bloom_pruned_join(
    big: DataFrame,
    build: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Exact inner equi-join of `big` with `build` on `key_col`, with the
    big side Bloom-pruned map-side before the join's shuffle. `build`'s
    keys need not be distinct (the filter is built over DISTINCT keys; the
    join itself keeps plain join multiplicity). Result is row-for-row the
    plain inner join — the Bloom stage only removes rows the join would
    drop anyway."""
    bloom = bloom_build(build.select(key_col).distinct(), key_col, m_bits=m_bits, k=k)
    pruned = bloom_prune(big, key_col, bloom, m_bits=m_bits, k=k)
    return pruned.join(build, on=key_col, how="inner")
