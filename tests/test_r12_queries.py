"""Python brute-force differentials for the r12 queries — independent
recomputation from the same sf0.001 parquet, so shared-tree bugs the
engine-parity hash cannot see are pinned (the r11 CUSUM lesson)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from .conftest import SF_SMALL

from analyzing_big_data_in_scala_spark.plans import QUERIES

SF_MID = "/root/testdata/sf0.01"


def _rows(sql: str, sf: str = SF_SMALL):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "events", "documents", "part",
              "lineitem", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con.sql(sql).fetchall()


def _div_half_up(a: int, b: int) -> int:
    assert a >= 0 and b > 0
    return (2 * a + b) // (2 * b)


def test_jaccard_link_topk_matches_bruteforce(spark):
    """Plain-Python Jaccard over the canonical undirected graph — the
    sf0.001 graph yields no candidates (too dense), so this runs at
    sf0.01, the driver's grading scale."""
    canon_sql = QUERIES["graph_jaccard_link_topk"].oracle
    prefix = canon_sql[: canon_sql.index("adj AS")].rstrip().rstrip(",")
    edges = _rows(prefix + " SELECT a, b FROM canon", SF_MID)
    nbr = defaultdict(set)
    eset = set()
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
        eset.add((a, b))
    scored = []
    seen = set()
    for w, ns in nbr.items():
        if len(ns) < 2:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1:]:
                if (u, v) in eset or (u, v) in seen:
                    continue
                seen.add((u, v))
                common = len(nbr[u] & nbr[v])
                den = len(nbr[u]) + len(nbr[v]) - common
                scored.append((u, v, common, _div_half_up(1_000_000 * common, den)))
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = scored[:20]
    got = [
        (r.u, r.v, r.common_neighbors, r.jaccard_ppm)
        for r in QUERIES["graph_jaccard_link_topk"].fn(spark, SF_MID).collect()
    ]
    assert got == want


def test_language_mix_by_source_matches_bruteforce(spark):
    from analyzing_big_data_in_scala_spark.functions.text import (
        LANG_STOP_PROFILES,
    )
    import re as _re

    profiles = {
        lg: {w.lower() for w in ws} for lg, ws in LANG_STOP_PROFILES.items()
    }
    cells = Counter()
    for doc_id, source, text in _rows("SELECT doc_id, source, text FROM documents"):
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        if not toks:
            continue
        counts = {lg: sum(1 for t in toks if t in ws) for lg, ws in profiles.items()}
        m = max(counts.values())
        if m * 20 < len(toks):
            pred = "unknown"
        elif counts["en"] == m:
            pred = "en"
        else:
            pred = min(lg for lg, c in counts.items() if c == m)
        cells[(source, pred)] += 1
    tot = Counter()
    for (src, _p), n in cells.items():
        tot[src] += n
    want = {k: (n, _div_half_up(1_000_000 * n, tot[k[0]])) for k, n in cells.items()}
    got = {
        (r.source, r.pred_lang): (r.n_docs, r.share_ppm)
        for r in QUERIES["doc_language_mix_by_source"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_minhash_precision_truth_matches_raw_shingles(spark):
    """The truth half of the LSH precision audit, recomputed from RAW
    3-shingle STRING sets (no shared hashing with either engine):
    per-candidate exact Jaccard >= 0.2 counts must match."""
    cands = {
        (r.id_a, r.id_b): r.n_bands
        for r in QUERIES["dedup_minhash_candidates"].fn(spark, SF_SMALL).collect()
    }
    import re as _re

    sets: dict[int, set] = {}
    for doc_id, text in _rows("SELECT doc_id, text FROM documents"):
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        sets[doc_id] = {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
    per_bands = defaultdict(lambda: [0, 0])
    for (a, b), nb in cands.items():
        i = len(sets[a] & sets[b])
        den = len(sets[a]) + len(sets[b]) - i
        per_bands[nb][0] += 1
        per_bands[nb][1] += 1 if (den > 0 and 100 * i >= 20 * den) else 0
    want = {
        nb: (n, t, _div_half_up(1_000_000 * t, n))
        for nb, (n, t) in per_bands.items()
    }
    got = {
        r.n_bands: (r.n_candidates, r.n_true, r.precision_ppm)
        for r in QUERIES["dedup_minhash_precision"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_interarrival_profile_matches_bruteforce(spark):
    rows = _rows("""
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id
        FROM events
    """)
    by_type = defaultdict(list)
    for et, t, eid in rows:
        by_type[et].append((t, eid))
    want = {}
    for et, evs in by_type.items():
        evs.sort()
        gaps = sorted(b[0] - a[0] for a, b in zip(evs, evs[1:]))
        if not gaps:
            continue
        n = len(gaps)
        want[et] = (
            n,
            gaps[(n + 1) // 2 - 1],
            gaps[(n * 9 + 9) // 10 - 1],
            gaps[0],
            gaps[-1],
        )
    got = {
        r.event_type: (r.n_gaps, r.median_secs, r.p90_secs, r.min_secs, r.max_secs)
        for r in QUERIES["events_interarrival_profile"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_norm_profile_matches_bruteforce(spark):
    import numpy as np

    buckets = Counter()
    for vid, emb in _rows("SELECT vec_id, embedding FROM embeddings"):
        q = np.array([round(float(x) * 10000) for x in emb], dtype=np.int64)
        ns = int((q * q).sum())
        buckets[int(math.floor(math.sqrt(float(ns)) / 10000 * 10))] += 1
    tot = sum(buckets.values())
    want = {b: (n, _div_half_up(1_000_000 * n, tot)) for b, n in buckets.items()}
    got = {
        r.bucket: (r.n_vecs, r.share_ppm)
        for r in QUERIES["embeddings_norm_profile"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_chunk_dup_histogram_matches_bruteforce(spark):
    """Raw-STRING 32-token chunk df histogram — no shared hashing with
    either engine (hash collisions would surface as a diff here)."""
    import re as _re

    df_counter = Counter()
    for doc_id, text in _rows("SELECT doc_id, text FROM documents"):
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        chunks = {
            " ".join(toks[i:i + 32]) for i in range(0, len(toks), 32)
        } if toks else set()
        for c in chunks:
            df_counter[c] += 1
    hist = Counter(df_counter.values())
    tot = sum(d * n for d, n in hist.items())
    want = {
        d: (n, d * n, _div_half_up(1_000_000 * d * n, tot))
        for d, n in hist.items()
    }
    got = {
        r.chunk_df: (r.n_chunks, r.n_instances, r.instance_share_ppm)
        for r in QUERIES["corpus_chunk_dup_histogram"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_burstiness_matches_bruteforce(spark):
    rows = _rows("""
        SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id
        FROM events
    """)
    by_type = defaultdict(list)
    for et, t, eid in rows:
        by_type[et].append((t, eid))
    want = {}
    for et, evs in by_type.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if not gaps:
            continue
        n, s, ss = len(gaps), sum(gaps), sum(g * g for g in gaps)
        r = math.sqrt(float(n) * float(ss) - float(s) * float(s))
        b = (r - float(s)) / (r + float(s))
        want[et] = (n, math.floor(b * 1_000_000 + 0.5) if b >= 0
                    else -math.floor(-b * 1_000_000 + 0.5))
    got = {
        r.event_type: (r.n_gaps, r.burstiness_ppm)
        for r in QUERIES["events_burstiness_index"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_preferential_attachment_matches_bruteforce(spark):
    """Plain-Python PA over the 2-hop candidate set at sf0.01 (the
    driver's grading scale; sf0.001 yields no candidates)."""
    canon_sql = QUERIES["graph_preferential_attachment_topk"].oracle
    prefix = canon_sql[: canon_sql.index("adj AS")].rstrip().rstrip(",")
    edges = _rows(prefix + " SELECT a, b FROM canon", SF_MID)
    nbr = defaultdict(set)
    eset = set()
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
        eset.add((a, b))
    seen = {}
    for w, ns in nbr.items():
        if len(ns) < 2:
            continue
        ns_sorted = sorted(ns)
        for i, u in enumerate(ns_sorted):
            for v in ns_sorted[i + 1:]:
                if (u, v) in eset:
                    continue
                seen[(u, v)] = seen.get((u, v), 0) + 1
    scored = [
        (u, v, c, len(nbr[u]) * len(nbr[v])) for (u, v), c in seen.items()
    ]
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = scored[:20]
    got = [
        (r.u, r.v, r.common_neighbors, r.pa_score)
        for r in QUERIES["graph_preferential_attachment_topk"].fn(spark, SF_MID).collect()
    ]
    assert got == want


def test_dau_wau_stickiness_matches_bruteforce(spark):
    rows = _rows("""
        SELECT DISTINCT user_id, CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day
        FROM events
    """)
    dau = Counter()
    active_days = defaultdict(set)
    for u, d in rows:
        dau[d] += 1
        active_days[u].add(d)
    wau = Counter()
    for u, days in active_days.items():
        covered = set()
        for d in days:
            covered.update(range(d, d + 7))
        for c in covered:
            wau[c] += 1
    want = {
        d: (n, wau[d], _div_half_up(1_000_000 * n, wau[d]))
        for d, n in dau.items()
    }
    got = {
        r.day: (r.dau, r.wau, r.stickiness_ppm)
        for r in QUERIES["events_dau_wau_stickiness"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_minhash_recall_matches_raw_shingles(spark):
    """Recall audit recomputed from raw shingle STRINGS: true pairs by
    exact Jaccard >= 0.2 over all doc pairs (brute force — fine at
    sf0.001), candidates from the (already-differentialed) candidate
    query, banding on the rounded jaccard."""
    import re as _re

    sets: dict[int, set] = {}
    for doc_id, text in _rows("SELECT doc_id, text FROM documents"):
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        sets[doc_id] = {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
    cands = {
        (r.id_a, r.id_b)
        for r in QUERIES["dedup_minhash_candidates"].fn(spark, SF_SMALL).collect()
    }
    ids = sorted(sets)
    per_band = defaultdict(lambda: [0, 0])
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j < 0.2:
                continue
            band = min(int(round(j, 6) * 5), 4)
            per_band[band][0] += 1
            per_band[band][1] += 1 if (a, b) in cands else 0
    import math as _math

    want = {
        band: (n, h, _div_half_up(1_000_000 * h, n))
        for band, (n, h) in per_band.items()
    }
    got = {
        r.jaccard_band: (r.n_true, r.n_recalled, r.recall_ppm)
        for r in QUERIES["dedup_minhash_recall"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_top_transition_paths_match_bruteforce(spark):
    rows = _rows("""
        SELECT user_id, event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, event_id
        FROM events
    """)
    by_user = defaultdict(list)
    for u, et, t, eid in rows:
        by_user[u].append((t, eid, et))
    paths = Counter()
    for u, evs in by_user.items():
        evs.sort()
        types = [e[2] for e in evs]
        for i in range(len(types) - 2):
            paths[">".join(types[i:i + 3])] += 1
    ranked = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.path, r.n)
        for r in QUERIES["events_top_transition_paths"].fn(spark, SF_SMALL).collect()
    ]
    assert got == ranked


def test_simhash_hamming_histogram_matches_bruteforce(spark):
    """Ring-pair hamming histogram recomputed from the engine's OWN
    fingerprints re-derived in plain Python (portable md5 hash + bit
    votes) — the full simhash pipeline, no shared SQL tree."""
    import hashlib
    import re as _re

    def h64(s: str) -> int:
        return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)

    fp = {}
    for doc_id, text in _rows("SELECT doc_id, text FROM documents"):
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        if not toks:
            continue
        votes = [0] * 32
        for t in toks:
            h = h64(t)
            for j in range(32):
                votes[j] += 1 if (h >> j) & 1 else -1
        fp[doc_id] = sum(1 << j for j in range(32) if votes[j] > 0)
    cells = Counter()
    for step in (1, 17):
        for i, s in fp.items():
            other = fp.get(i + step)
            if other is not None:
                cells[(step, bin(s ^ other).count("1"))] += 1
    tot = Counter()
    for (st, _h), n in cells.items():
        tot[st] += n
    want = {
        k: (n, _div_half_up(1_000_000 * n, tot[k[0]])) for k, n in cells.items()
    }
    got = {
        (r.step, r.hamming): (r.n_pairs, r.share_ppm)
        for r in QUERIES["doc_simhash_hamming_histogram"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_vocab_growth_matches_bruteforce(spark):
    import re as _re

    rows = _rows("SELECT doc_id, text FROM documents")
    ids = [d for d, _ in rows]
    mn, mx = min(ids), max(ids)
    cutoffs = {i: mn + ((mx - mn) * i) // 10 for i in range(1, 11)}
    per_doc = {}
    first_occ = {}
    for doc_id, text in rows:
        toks = [t for t in _re.split(r"\s+",
                _re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()) if t]
        if toks:
            per_doc[doc_id] = len(toks)
        for t in toks:
            if t not in first_occ or doc_id < first_occ[t]:
                first_occ[t] = doc_id
    want = {}
    for i, cut in cutoffs.items():
        nd = sum(1 for d in per_doc if d <= cut)
        nt = sum(n for d, n in per_doc.items() if d <= cut)
        v = sum(1 for fd in first_occ.values() if fd <= cut)
        want[i] = (cut, nd, nt, v)
    got = {
        r.checkpoint: (r.cutoff_id, r.n_docs, r.n_tokens, r.vocab)
        for r in QUERIES["corpus_vocab_growth"].fn(spark, SF_SMALL).collect()
    }
    assert got == want
