"""Python brute-force differentials for the r13 queries — independent
recomputation from the same fixture parquet, so shared-tree bugs the
engine-parity hash cannot see are pinned (the r11 CUSUM lesson; the
multilingual micro-fixture differentials live in test_r13_unicode.py)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from .conftest import SF_SMALL

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _docs(sf: str):
    con = duckdb.connect()
    return con.sql(
        f"SELECT doc_id, text, source FROM '{sf}/documents.parquet'"
    ).fetchall()


def _div_half_up(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def test_temperature_mixture_matches_bruteforce(spark):
    """w_s ∝ n_s^alpha recomputed with math.pow + integer ppm in plain
    Python (no SQL tree shared with either engine)."""
    counts = Counter(src for _, _, src in _docs(SF_MID))
    w03 = {s: int(round(math.pow(n, 0.3) * 1_000_000)) for s, n in counts.items()}
    w07 = {s: int(round(math.pow(n, 0.7) * 1_000_000)) for s, n in counts.items()}
    t, t03, t07 = sum(counts.values()), sum(w03.values()), sum(w07.values())
    expected = {
        s: (
            n,
            _div_half_up(1_000_000 * n, t),
            _div_half_up(1_000_000 * w03[s], t03),
            _div_half_up(1_000_000 * w07[s], t07),
        )
        for s, n in counts.items()
    }
    got = {
        r["source"]: (r["n_docs"], r["share_ppm"], r["w03_ppm"], r["w07_ppm"])
        for r in QUERIES["corpus_temperature_mixture"].fn(spark, SF_MID).collect()
    }
    assert got == expected


def test_script_mix_matches_bruteforce_on_driver_fixture(spark):
    """The driver fixture is pure ASCII, so every source must report
    exactly one 'latin' row whose char count equals the Python count of
    ASCII alphanumerics... minus digits (letters only) — recomputed by
    codepoint in plain Python. (The multi-script behavior is pinned on
    the genuine multilingual fixture in test_r13_unicode.py.)"""
    chars: Counter = Counter()
    docs_n: Counter = Counter()
    for _, text, src in _docs(SF_MID):
        n = sum(1 for ch in text if ("a" <= ch <= "z") or ("A" <= ch <= "Z"))
        chars[src] += n
        if n > 0:
            docs_n[src] += 1
    rows = QUERIES["doc_script_mix_by_source"].fn(spark, SF_MID).collect()
    assert {r["script"] for r in rows} == {"latin"}
    got = {
        r["source"]: (r["n_docs_dominant"], r["n_chars"], r["char_share_ppm"])
        for r in rows
    }
    expected = {
        s: (docs_n[s], c, _div_half_up(1_000_000 * c, c))
        for s, c in chars.items()
    }
    # share of latin within a latin-only source is exactly 1e6 ppm
    assert got == expected
    assert all(v[2] == 1_000_000 for v in got.values())


def test_recall_sampled_truth_side_matches_raw_shingles(spark):
    """The sampled audit's ground-truth band totals recomputed from raw
    3-shingle sets in plain Python over the hash-sampled doc subset —
    the same differential shape that graded the full recall audit in
    r12, applied after an independently recomputed md5 sample filter."""
    import hashlib
    import re as _re

    def keep(doc_id: int) -> bool:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % 2 == 0

    shingle_sets: dict = {}
    for doc_id, text, _ in _docs(SF_SMALL):
        if not keep(doc_id):
            continue
        toks = [t for t in _re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
        if len(toks) >= 3:
            shingle_sets[doc_id] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
    ids = sorted(shingle_sets)
    band_true: Counter = Counter()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(shingle_sets[a] & shingle_sets[b])
            if inter == 0:
                continue
            j = inter / (len(shingle_sets[a]) + len(shingle_sets[b]) - inter)
            if j >= 0.2:
                band_true[min(int(round(j, 6) * 5), 4)] += 1
    got = {
        r["jaccard_band"]: r["n_true"]
        for r in QUERIES["dedup_minhash_recall_sampled"].fn(spark, SF_SMALL).collect()
    }
    assert got == dict(band_true)
