"""Third r14 batch of plain-Python brute-force differentials for
r9-cohort queries (VERDICT r13 item 6): the shingle/leakage/cluster
family, sub-document chunk dedup, benchmark decontamination, the
stemmed document frequencies, and the JL random projection. Same
conventions as the first two batches (exact ints ==, rounded doubles to
~1e-6; raw hashes recomputed with hashlib — no Spark, no SQL)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import duckdb
import pytest

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(table: str, cols: str):
    con = duckdb.connect()
    return con.sql(f"SELECT {cols} FROM '{SF_MID}/{table}.parquet'").fetchall()


def _h64(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def _shingle_hashes(text: str, k: int = 3) -> set[int]:
    toks = _tokens(text)
    return {
        _h64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)
    }


def _jaccard_pairs(threshold: float = 0.2):
    """{(id_a, id_b): raw jaccard} over shared-shingle candidates —
    inverted-index semantics recomputed with dict/set code."""
    sh = {
        doc_id: _shingle_hashes(text)
        for doc_id, text in _rows("documents", "doc_id, text")
    }
    by_h = defaultdict(list)
    for d, hs in sh.items():
        for h in hs:
            by_h[h].append(d)
    cand = set()
    for ds in by_h.values():
        ds.sort()
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                cand.add((a, b))
    out = {}
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if j >= threshold:
            out[(a, b)] = j
    return out, sh


def _clusters(pairs) -> dict[int, int]:
    """min-reachable-id labels via union-find over the pair edges."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_split_leakage_audit_matches_bruteforce(spark):
    pairs, _ = _jaccard_pairs()
    expected = {}
    for (a, b), j in pairs.items():
        a_test = _h64(f"{a}split") % 10000 < 1000
        b_test = _h64(f"{b}split") % 10000 < 1000
        if a_test != b_test:
            train, test = (b, a) if a_test else (a, b)
            expected[(train, test)] = round(j, 6)
    got = {
        (r["train_doc"], r["test_doc"]): r["jaccard"]
        for r in QUERIES["corpus_split_leakage_audit"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, j in expected.items():
        assert got[k] == pytest.approx(j, abs=2e-6), k
    assert expected  # fixture actually leaks across the naive split


def test_near_clusters_match_bruteforce(spark):
    pairs, _ = _jaccard_pairs()
    labels = _clusters(pairs)
    all_ids = [r[0] for r in _rows("documents", "doc_id")]
    expected = {}
    sizes: Counter = Counter()
    for d in all_ids:
        c = labels.get(d, d)
        sizes[c] += 1
    for d in all_ids:
        c = labels.get(d, d)
        expected[d] = (c, sizes[c], d == c)
    got = {
        r["doc_id"]: (r["cluster"], r["cluster_size"], r["kept"])
        for r in QUERIES["dedup_near_clusters"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert max(sizes.values()) >= 2  # a real multi-doc cluster exists


def test_leakage_safe_split_matches_bruteforce(spark):
    pairs, _ = _jaccard_pairs()
    labels = _clusters(pairs)
    expected = {}
    for (d,) in _rows("documents", "doc_id"):
        c = labels.get(d, d)
        split = "test" if _h64(f"{c}split") % 10000 < 1000 else "train"
        expected[d] = (c, split)
    got = {
        r["doc_id"]: (r["cluster"], r["split"])
        for r in QUERIES["corpus_leakage_safe_split"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    # the safety property itself: no near-dup pair straddles the split
    for a, b in pairs:
        assert expected[a][1] == expected[b][1], (a, b)


def test_chunk_dedup_matches_bruteforce(spark):
    chunks_by_doc = {}
    df: Counter = Counter()
    for doc_id, text in _rows("documents", "doc_id, text"):
        toks = _tokens(text)
        hs = [
            _h64(" ".join(toks[i * 32 : i * 32 + 32]))
            for i in range(math.ceil(len(toks) / 32))
        ]
        chunks_by_doc[doc_id] = hs
        for h in set(hs):
            df[h] += 1
    expected = {}
    for doc_id, hs in chunks_by_doc.items():
        n = len(hs)
        dup = sum(1 for h in hs if df[h] > 1)
        ppm = (dup * 2_000_000 + n) // (2 * n) if n else None
        expected[doc_id] = (n, dup, ppm)
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_chunk_ppm"])
        for r in QUERIES["doc_chunk_dedup"].fn(spark, SF_MID).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in expected.values())


def test_decontamination_matches_bruteforce(spark):
    grams = {}
    for doc_id, text in _rows("documents", "doc_id, text"):
        toks = _tokens(text)
        grams[doc_id] = {
            _h64(" ".join(toks[i : i + 5])) for i in range(len(toks) - 4)
        }
    bench = set()
    for d, hs in grams.items():
        if d % 25 == 0:
            bench |= hs
    expected = {}
    for d, hs in grams.items():
        if d % 25 == 0:
            continue
        n = len(hs)
        hits = len(hs & bench)
        frac = round(hits / n, 6) if n else None
        expected[d] = (n, hits, frac, hits >= 3)
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_hits"], r["hit_frac"], r["contaminated"])
        for r in QUERIES["doc_decontamination"].fn(spark, SF_MID).collect()
    }
    assert set(got) == set(expected)
    for k, (n, h, frac, c) in expected.items():
        gn, gh, gfrac, gc = got[k]
        assert (gn, gh, gc) == (n, h, c), k
        if frac is None:
            assert gfrac is None, k
        else:
            assert gfrac == pytest.approx(frac, abs=2e-6), k
    assert any(v[3] for v in expected.values())


STEM_RULES = (
    (r"sses$", "ss"),
    (r"ies$", "i"),
    (r"([^s])s$", r"\1"),
    (r"(.{3})ing$", r"\1"),
    (r"(.{3})ed$", r"\1"),
    (r"(.{3})ly$", r"\1"),
)


def test_stemmed_doc_frequencies_match_bruteforce(spark):
    def stem(t: str) -> str:
        for pat, repl in STEM_RULES:
            t = re.sub(pat, repl, t)
        return t

    df: Counter = Counter()
    for doc_id, text in _rows("documents", "doc_id, text"):
        for s in {stem(t) for t in set(_tokens(text))}:
            df[s] += 1
    got = {
        r["term"]: r["df"]
        for r in QUERIES["tfidf_doc_frequencies_stemmed"].fn(spark, SF_MID).collect()
    }
    assert got == dict(df)
    # The sf0.01 fixture vocabulary happens to be stem-INVARIANT (no term
    # matches any rule), so the df compare above only exercises the
    # chain's no-op path. Drive the rule set itself through the SPARK
    # expression on inflected words and compare with the Python chain —
    # every rule fires at least once in this list.
    from analyzing_big_data_in_scala_spark.functions.text import stem_light
    from pyspark.sql import functions as F

    words = ["classes", "queries", "windows", "streaming", "batched",
             "quickly", "glass", "s", "ties", "axes", "doing", "red"]
    spark_stems = [
        r["s"]
        for r in spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i int, w string")
        .orderBy("i")
        .select(stem_light(F.col("w")).alias("s"))
        .collect()
    ]
    assert spark_stems == [stem(w) for w in words]
    assert sum(1 for w, s in zip(words, spark_stems) if w != s) >= 6


def test_random_projection_matches_bruteforce(spark):
    vecs = {r[0]: list(r[1]) for r in _rows("embeddings", "vec_id, embedding")}

    def sign(k, j):
        h = int(hashlib.md5(f"rp:{k}:{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    expected = {}
    for vid, v in vecs.items():
        amax = max((abs(float(x)) for x in v), default=0.0)
        if amax == 0.0:
            q = [0] * len(v)
        else:
            scale = amax / 127.0
            q = [int(math.floor(float(x) / scale + 0.5)) for x in v]
        for k in range(16):
            expected[(vid, k)] = sum(
                qi * sign(k, j) for j, qi in enumerate(q)
            )
    got = {
        (r["vec_id"], r["dim_idx"]): r["value"]
        for r in QUERIES["embeddings_random_projection"].fn(spark, SF_MID).collect()
    }
    assert got == expected
