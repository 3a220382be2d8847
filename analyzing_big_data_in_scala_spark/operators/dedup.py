"""Deduplication operators for training-data pipelines (beyond-reference;
BASELINE.json north star). All candidate-pair generation is join-based —
never an O(n²) cross join — so each operator scales to very large corpora:

- exact:    hash groupBy on normalized text (one shuffle on the hash key)
- ngram-jaccard: shingle inverted index -> self-join on shingle -> pair agg
  (pairs only materialize for docs that SHARE a shingle)
- minhash-LSH:  per-doc signature -> banding -> join on (band, band-hash)
  (pairs only materialize for docs that collide in >=1 band)
- simhash:  64-bit fingerprint; near-dups = small hamming distance, found
  by banding the fingerprint into chunks (join on exact chunk match)

Hashes use functions.text.portable_hash64 (md5-derived) so the exact,
jaccard, and minhash paths are fully DuckDB-oracle-checkable; swap to
xxhash64 for raw speed on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    normalize_text,
    portable_hash40,
    portable_hash64,
    tokens,
    tokens_cjk,
)
from ._util import ensure_parallelism

# Deterministic multipliers/addends for the minhash permutation family
# h_i(x) = (a_i * h40(x) + b_i) mod M with M = 2^31 - 1 (Mersenne prime).
# h40 is 40-bit and a_i <= 2*num_perm+1, so a*h+b < 2^48 — no bigint
# overflow under Spark 4's ANSI mode, and identical arithmetic in DuckDB.
MERSENNE31 = (1 << 31) - 1


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    # Fixed (seedless) params: deterministic across engines and runs.
    return [(2 * i + 1, i * i + 7) for i in range(1, num_perm + 1)]


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_group_size: int = 1
) -> DataFrame:
    """Exact dedup on normalized text. Returns one row per content GROUP:
    (dup_hash, n_dups, keep_id) where keep_id is the smallest member id —
    the canonical survivor. `min_group_size=2` restricts to true duplicate
    groups. Single hash-aggregate; no pairwise blowup."""
    h = portable_hash64(normalize_text(text_col))
    out = (
        docs.select(F.col(id_col), h.alias("dup_hash"))
        .groupBy("dup_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )
    return out.filter(F.col("n_dups") >= min_group_size) if min_group_size > 1 else out


def shingle_array_table(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    cjk: bool = False,
) -> DataFrame:
    """(id, sh array<string>): per-doc array of DISTINCT k-token shingle
    strings — the ONE tokenize+shingle pass every shingle consumer derives
    from (r15, VERDICT r14 item 7). The minhash audit queries run TWO hash
    widths (64-bit exact-Jaccard truth, 40-bit minhash permutation base)
    over the same shingles; materializing this frame once lets both
    widths share the regex tokenize + shingle build (a full corpus pass
    at 100 TB) while each consumer keeps its OWN post-hash distinct —
    value-identical to the previous per-consumer pipelines by
    construction (the hash transform and cross-partition distinct are
    unchanged, only the string-building map is shared).

    Tokenization happens in its own projection BEFORE the shingle
    transform: referencing `tokens(text)` inside the lambda would re-run
    the regex tokenizer once per shingle (O(tokens²) per doc).

    ``cjk=True`` (r14) shingles over the CJK-aware token stream
    (functions/text.tokens_cjk — Han/kana runs become char bigrams): the
    default whitespace tokens make a whole zh sentence ONE token, so a
    3-shingle needs THREE sentences and near-dup zh pairs are invisible
    to the whole shingle-based dedup family. The default stays
    byte-identical to the reference-parity tokenizer."""
    toked = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        (tokens_cjk(text_col) if cjk else tokens(text_col)).alias("toks"),
    )
    # sequence(1, n) counts DOWN when n < 1 — guard short docs explicitly.
    idx = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)))
    # Dedup within the array here: downstream hash transforms then run
    # once per distinct shingle per doc (array_distinct is an in-memory
    # pass, no shuffle).
    return toked.select("id", F.array_distinct(shingles).alias("sh"))


def shingle_table(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    cjk: bool = False,
) -> DataFrame:
    """Distinct k-token shingles per doc: (id, shingle). The inverted-index
    building block for jaccard and minhash. See :func:`shingle_array_table`
    (the shared tokenize pass) for the shingling/cjk contract."""
    sh = shingle_array_table(docs, k, id_col, text_col, cjk=cjk)
    return sh.select("id", F.explode("sh").alias("shingle")).distinct()


def hashed_shingle_table(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    cjk: bool = False,
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """Distinct k-token shingle HASHES per doc: (id, h). Same inverted-index
    role as :func:`shingle_table`, but the shingle string is hashed inside
    the array transform, so only 8-byte longs ever reach the distinct and
    any downstream self-join — at corpus scale that roughly halves the
    bytes shuffled vs. exchanging ~20-char shingle strings. Dedup-by-hash
    equals dedup-by-string up to md5 collisions, and every consumer's
    DuckDB oracle applies the identical hash, so parity is by construction.
    ``cjk`` selects the CJK-aware token stream (see shingle_array_table).

    ``shingle_arrays`` (r15): a prebuilt :func:`shingle_array_table` frame
    to derive from — the minhash audit queries pass one materialized
    frame so their 64-bit and 40-bit pipelines share a single tokenize
    pass. Each call still applies its own hash + cross-partition
    distinct, so results are identical with or without it."""
    hash_fn = portable_hash40 if bits == 40 else portable_hash64
    sh = (
        shingle_arrays
        if shingle_arrays is not None
        else shingle_array_table(docs, k, id_col, text_col, cjk=cjk)
    )
    hashes = F.transform(F.col("sh"), hash_fn)
    return sh.select("id", F.explode(hashes).alias("h")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
    cache_shingles: bool = True,
    cjk: bool = False,
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact k-shingle Jaccard similarity.

    Inverted-index self-join: pairs are generated ONLY for docs sharing at
    least one shingle, then |A∩B| is an aggregate over shared shingles and
    |A∪B| = |A|+|B|-|A∩B|. Returns (id_a, id_b, jaccard) with id_a < id_b.

    `max_shingle_df` is the 100 TB defense against quadratic fan-out on
    hot shingles (a shingle shared by f docs emits f²/2 pair rows): drop
    shingles whose document frequency exceeds the cap BEFORE the
    self-join, as in Spark's own MinHashLSH practice. Sizes are computed
    over the capped universe too, so the result is exact Jaccard on the
    filtered shingle space (boilerplate-resistant, and every consumer's
    oracle applies the identical cap). Without a cap, semantics are plain
    exact Jaccard; :func:`minhash_candidates` is the other scale path.

    ``shingle_arrays`` (r15): a prebuilt :func:`shingle_array_table`
    frame to derive the hashed shingles from — see hashed_shingle_table.
    """
    sh = hashed_shingle_table(
        docs, k, id_col, text_col, cjk=cjk, shingle_arrays=shingle_arrays
    )
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("h")
        )
        sh = sh.join(F.broadcast(hot), "h", "left_anti")
    # ``cache_shingles`` materializes the hashed shingle table (used three
    # times: sizes + both join sides) via a LAZY localCheckpoint — unlike
    # .cache(), the storage is reclaimed when the DataFrame is GC'd, so it
    # cannot leak across queries in a long-lived session, and the three
    # consumers physically share one tokenize+shingle+distinct run instead
    # of each re-planning it (the a/b exchange pair alone reuses, but
    # `sizes` aggregates pre-exchange and re-scans without this).
    if cache_shingles:
        # Plain checkpoint, NOT fan_out_ready (r14): the shingle-pair
        # fan-out is small at this corpus shape and the extra widening
        # shuffle + second checkpoint measured net-NEGATIVE across the
        # family in the full 190-entry bench (near_clusters +1.4 s,
        # minhash_recall +2.1 s) despite a flat isolated A/B — the added
        # checkpoint blocks and round-robin shuffle cost more than the
        # 2-task probe side. The wedge scaffold (graph.py), whose fan-out
        # is deg(w)^2-shaped, keeps the widening.
        sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))

    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    jaccard = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        # threshold on the RAW value (rounding only for display/oracle
        # hashing) — matches the oracle's WHERE raw >= threshold exactly.
        .filter(jaccard >= threshold)
        .select("id_a", "id_b", F.round(jaccard, 6).alias("jaccard"))
    )


def cross_split_leakage_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.2,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    salt: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Train/test LEAKAGE audit: near-duplicate pairs that STRADDLE the
    deterministic hash split — a test document with an in-tolerance
    near-dup on the train side is contamination the split itself cannot
    prevent (splits partition documents, not content). Returns
    (train_doc, test_doc, jaccard), one row per leaking pair.

    Scale shape: the pair table is :func:`ngram_jaccard_pairs` (inverted
    index, df-cappable); split membership is a PURE FUNCTION of the id
    (sampling.split_by_hash's bucket arithmetic), so the split labels and
    the cross-split filter are a projection over the pair rows — no join
    against a membership table, no extra shuffle, and the audit composes
    with the banded MinHash path the same way at 100 TB. At scale pass
    `max_shingle_df`: a shingle shared by f docs emits f^2/2 pair rows,
    so boilerplate-heavy corpora need the hot-shingle cap (measured in
    SCALING.md — the uncapped probe is quadratic in duplicate density by
    construction, the capped one tracks the minhash family)."""
    from .sampling import hash_bucket

    pairs = ngram_jaccard_pairs(
        docs, k=k, threshold=threshold, id_col=id_col, text_col=text_col,
        max_shingle_df=max_shingle_df,
    )
    thr = round(test_fraction * buckets)

    def is_test(col: str):
        return hash_bucket(F.col(col), buckets, salt) < F.lit(thr)

    return (
        pairs.filter(is_test("id_a") != is_test("id_b"))
        .select(
            F.when(is_test("id_a"), F.col("id_b")).otherwise(F.col("id_a")).alias("train_doc"),
            F.when(is_test("id_a"), F.col("id_a")).otherwise(F.col("id_b")).alias("test_doc"),
            "jaccard",
        )
    )


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: (id, perm, minhash), num_perm rows per doc.

    One shuffle: groupBy(id, perm) min over the exploded
    (shingle x permutation) table. Permutations are arithmetic transforms of
    one base hash — the base md5 is computed once per shingle.
    """
    wide = minhash_signatures_wide(docs, num_perm, k, id_col, text_col)
    pairs = F.array(
        *[
            F.struct(F.lit(i + 1).alias("perm"), F.col(f"mh{i + 1}").alias("minhash"))
            for i in range(num_perm)
        ]
    )
    return wide.select("id", F.explode(pairs).alias("p")).select(
        "id", F.col("p.perm").alias("perm"), F.col("p.minhash").alias("minhash")
    )


def minhash_signatures_wide(
    docs: DataFrame,
    num_perm: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """Signature as ONE row per doc with columns mh1..mhN: a single
    hash-aggregate with num_perm conditional min columns — one shuffle total
    (vs. exploding num_perm rows per shingle and shuffling all of them).
    The base md5 is computed once per (doc, shingle); only the 8-byte hash
    is shuffled by the distinct (min over hashes is insensitive to
    dedup-by-hash vs dedup-by-string, so the oracle is unchanged).
    ``shingle_arrays``: prebuilt shingle arrays — see hashed_shingle_table."""
    base = hashed_shingle_table(
        docs, k, id_col, text_col, bits=40, shingle_arrays=shingle_arrays
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE31)).alias(f"mh{i + 1}")
        for i, (a, b) in enumerate(_perm_params(num_perm))
    ]
    return base.groupBy("id").agg(*mins)


def minhash_band_table(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """LSH band buckets per doc: (id, band, band_key). Docs agreeing on a
    whole band share (band, band_key) — the equi-join key for candidate
    generation (:func:`minhash_candidates`) and the persisted half of the
    incremental-dedup index (:func:`build_dedup_index`).

    Band keys come straight off the wide signature — zero extra shuffles.
    The key formula (hash of lexicographically-sorted "perm:minhash"
    strings) matches the DuckDB oracle's string_agg(... ORDER BY ...).
    ``shingle_arrays``: prebuilt shingle arrays — see hashed_shingle_table."""
    if num_perm % bands != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}) — "
            "leftover permutations would be silently un-banded"
        )
    rows_per_band = num_perm // bands
    wide = minhash_signatures_wide(
        docs, num_perm, k, id_col, text_col, shingle_arrays=shingle_arrays
    )
    band_structs = []
    for band in range(bands):
        perms = range(band * rows_per_band + 1, (band + 1) * rows_per_band + 1)
        entries = F.array(*[F.concat_ws(":", F.lit(p), F.col(f"mh{p}")) for p in perms])
        key = portable_hash64(F.concat_ws(",", F.sort_array(entries)))
        band_structs.append(F.struct(F.lit(band).alias("band"), key.alias("band_key")))
    return wide.select("id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_candidates(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs whose signatures agree on ALL rows of at
    least one band. Returns (id_a, id_b, n_bands) with id_a < id_b.

    The join key is (band, hash-of-band-rows) — collisions localize to
    buckets, never a global pairwise comparison.
    ``shingle_arrays``: prebuilt shingle arrays — see hashed_shingle_table.
    """
    # Build-once materialization (r14): each join side previously re-ran
    # the full shingle+minhash pipeline (the broadcast subtree is not
    # exchange-reusable against the stream side). Plain checkpoint, not a
    # widening repartition — see ngram_jaccard_pairs.
    banded = minhash_band_table(
        docs, num_perm, bands, k, id_col, text_col, shingle_arrays=shingle_arrays
    ).localCheckpoint(eager=False)
    a = banded.select(F.col("id").alias("id_a"), "band", "band_key")
    b = banded.select(F.col("id").alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def simhash_band_specs(bits: int, max_hamming: int) -> list[tuple[int, int, int]]:
    """(band, shift, mask) band layout guaranteeing FULL recall at
    hamming <= max_hamming: max_hamming+1 bands — a pair differing in at
    most max_hamming bits must agree exactly on at least one band
    (pigeonhole). Shared by the Spark operator and the DuckDB oracle."""
    n_bands = max_hamming + 1
    base = bits // n_bands
    extra = bits % n_bands
    specs, shift = [], 0
    for band in range(n_bands):
        width = base + (1 if band < extra else 0)
        specs.append((band, shift, (1 << width) - 1))
        shift += width
    return specs


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 4,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-duplicate pairs: (id_a, id_b, hamming) with
    hamming <= max_hamming — EXACT under the threshold.

    Candidate generation is banded, not pairwise: fingerprints split into
    max_hamming+1 bands; by pigeonhole every qualifying pair agrees exactly
    on >= 1 band, so banding loses nothing. Candidates are then filtered by
    true hamming distance via bit_count(xor).
    """
    fp = simhash_fingerprints(docs, bits, id_col, text_col)
    specs = simhash_band_specs(bits, max_hamming)
    banded = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.shiftright("simhash", shift).bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for band, shift, mask in specs
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select(F.col("id").alias("id_a"), F.col("simhash").alias("fp_a"), "band", "key")
    b = banded.select(F.col("id").alias("id_b"), F.col("simhash").alias("fp_b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_fingerprints(
    docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SimHash fingerprint per doc over token hashes: bit j of the
    fingerprint is 1 iff the sum of (+1/-1) votes of all token-hash bits j
    is positive. Pure expression pipeline: explode tokens -> per-bit votes
    -> one hash aggregate. Returns (id, simhash)."""
    tok = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("t")
    )
    h = portable_hash64(F.col("t"))
    votes = [
        F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("id").agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select("id", fp.cast("long").alias("simhash"))


def rolling_fingerprint(
    docs: DataFrame,
    base: int = 1_000_003,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Whole-document Rabin-Karp rolling hash over the token stream:
    fp = fold(tokens, 0, (acc, t) -> (acc * base + h40(t) mod M) mod M)
    with M = 2^31 - 1. Order-sensitive (unlike the bag-of-tokens simhash),
    so token reordering changes the fingerprint. Entirely inside one
    narrow projection — no shuffle, no UDF: `F.transform` hashes the token
    array and `F.aggregate` folds it, all whole-stage-codegen expressions.

    Token hashes are pre-reduced mod M so acc*base + h stays < 2^52 —
    safe under Spark 4 ANSI bigint semantics — and so the fold is
    identical to DuckDB's init-less `list_reduce` (first acc = h_1).
    Returns (doc_id, fingerprint); empty token streams fingerprint to 0.
    """
    hashed = F.transform(
        tokens(text_col), lambda t: portable_hash40(t) % MERSENNE31
    )
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * base + h) % MERSENNE31,
    )
    return ensure_parallelism(docs).select(F.col(id_col), fp.alias("fingerprint"))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS algorithm): hash every positional k-token shingle, slide a
    `window`-wide window over the hash sequence, keep the minimum of each
    window, output the distinct minima per doc. Guarantees a match for any
    shared run of >= window + k - 1 tokens while storing ~2/(window+1) of
    the shingle hashes — the standard sub-linear fingerprint index for
    plagiarism/near-dup detection at corpus scale.

    Plan shape: narrow tokenize/shingle projection -> posexplode -> one
    window-min partitioned by doc (single shuffle on doc_id) -> distinct.
    Returns (doc_id, fp).
    """
    toked = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    )
    idx = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, k)))
    pos = toked.select("doc_id", F.posexplode(shingles).alias("pos", "shingle")).select(
        "doc_id", (F.col("pos") + 1).alias("pos"), portable_hash40(F.col("shingle")).alias("h")
    )
    from pyspark.sql import Window as W

    wmin = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(window - 1), 0)
    return (
        pos.select("doc_id", "pos", F.min("h").over(wmin).alias("fp"))
        .filter(F.col("pos") >= window)
        .select("doc_id", "fp")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs a (persisted) corpus index
# ---------------------------------------------------------------------------

def exact_hash_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, dup_hash) — the normalized-content hash per doc, the exact half
    of the dedup index."""
    return docs.select(
        F.col(id_col).alias("id"),
        portable_hash64(normalize_text(text_col)).alias("dup_hash"),
    )


def dedup_index_frames(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """The two corpus-side frames of the incremental-dedup index:
    (exact = (id, dup_hash), bands = (id, band, band_key)). Persist them
    with :func:`build_dedup_index` for continuous ingest, or use in-plan
    for a one-shot batch-vs-corpus check."""
    exact = exact_hash_table(docs, id_col, text_col)
    bands_df = minhash_band_table(docs, num_perm, bands, k, id_col, text_col)
    return exact, bands_df


def build_dedup_index(
    docs: DataFrame,
    prefix: str = "dedup_index",
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    num_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the corpus's dedup state so each NEW ingest batch is checked
    against the corpus without rescanning or re-fingerprinting it:

      {prefix}_exact  (id, dup_hash)        bucketed by dup_hash
      {prefix}_bands  (id, band, band_key)  bucketed by band_key

    At 100 TB the corpus side of incremental dedup must never shuffle:
    bucketing both tables by their join key means a new batch (small side,
    broadcast or shuffled alone) probes co-located buckets — the per-batch
    cost is proportional to the BATCH, not the corpus. This is the
    continuous-ingest counterpart of the one-shot operators above.
    """
    from ..sources.bucketing import write_bucketed

    exact, bands_df = dedup_index_frames(docs, num_perm, bands, k, id_col, text_col)
    write_bucketed(exact, f"{prefix}_exact", bucket_col="dup_hash", num_buckets=num_buckets)
    write_bucketed(bands_df, f"{prefix}_bands", bucket_col="band_key", num_buckets=num_buckets)


def incremental_dedup(
    new_docs: DataFrame,
    index_exact: DataFrame,
    index_bands: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_bands: DataFrame | None = None,
) -> DataFrame:
    """Classify every doc of an ingest batch against the indexed corpus AND
    the batch itself: (id, status) with deterministic precedence

      exact_corpus  content hash already in the corpus index
      exact_batch   duplicate content within the batch (a smaller-id batch
                    doc is the canonical survivor; ties impossible)
      near_corpus   shares >= 1 MinHash LSH band with a corpus doc
      near_batch    shares >= 1 band with a SMALLER-id batch doc that
                    itself survived the exact stages (regardless of that
                    doc's own near-status — keeps the rule one-pass and
                    order-independent)
      kept          none of the above; admit to the corpus

    Every stage is an equi-join against the batch side only — the corpus
    is touched through the two index tables (`index_exact`, `index_bands`),
    which :func:`build_dedup_index` stores bucketed by the join key so the
    probes never shuffle the corpus. `minhash_band_table` parameters must
    match the ones the index was built with.

    `batch_bands` optionally supplies a precomputed band table covering (at
    least) the batch docs — e.g. one :func:`minhash_band_table` pass over a
    combined frame that was then split into corpus/batch. It is narrowed to
    the exact-stage survivors internally, skipping a second
    tokenize->shingle->minhash pass over the batch.
    """
    # Batch-sized intermediates with 2-3 consumers each are materialized
    # (lazy localCheckpoint): the frames are small by design — per-batch
    # cost must track the BATCH — so materialization is cheap and stops
    # each consumer from re-tokenizing/re-hashing the batch.
    batch_exact = new_docs.select(
        F.col(id_col).alias("id"),
        portable_hash64(normalize_text(text_col)).alias("dup_hash"),
    ).localCheckpoint(eager=False)
    corpus_hashes = index_exact.select("dup_hash").distinct()
    in_corpus = batch_exact.join(
        corpus_hashes.withColumn("_in_corpus", F.lit(True)), "dup_hash", "left"
    ).select("id", "dup_hash", F.coalesce("_in_corpus", F.lit(False)).alias("in_corpus"))
    first_in_batch = batch_exact.groupBy("dup_hash").agg(F.min("id").alias("_first_id"))
    exact_flags = in_corpus.join(first_in_batch, "dup_hash").select(
        "id",
        "in_corpus",
        (~F.col("in_corpus") & (F.col("id") != F.col("_first_id"))).alias("in_batch_dup"),
    )

    exact_survivor_ids = exact_flags.filter(
        ~F.col("in_corpus") & ~F.col("in_batch_dup")
    ).select("id")
    if batch_bands is not None:
        batch_bands = batch_bands.join(exact_survivor_ids, "id", "left_semi")
    else:
        survivors = new_docs.join(
            exact_survivor_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
        )
        batch_bands = minhash_band_table(survivors, num_perm, bands, k, id_col, text_col)
    # Three consumers (corpus probe + both sides of the in-batch self-join).
    batch_bands = batch_bands.localCheckpoint(eager=False)
    near_corpus_ids = batch_bands.join(
        index_bands.select("band", "band_key"), ["band", "band_key"], "left_semi"
    ).select("id").distinct()
    near_batch_ids = (
        batch_bands.alias("x")
        .join(
            batch_bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.id") > F.col("y.id")),
        )
        .select(F.col("x.id").alias("id"))
        .distinct()
    )

    status = (
        exact_flags.join(near_corpus_ids.withColumn("_nc", F.lit(True)), "id", "left")
        .join(near_batch_ids.withColumn("_nb", F.lit(True)), "id", "left")
        .select(
            "id",
            F.when(F.col("in_corpus"), "exact_corpus")
            .when(F.col("in_batch_dup"), "exact_batch")
            .when(F.col("_nc").isNotNull(), "near_corpus")
            .when(F.col("_nb").isNotNull(), "near_batch")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return status


def incremental_dedup_indexed(
    new_docs: DataFrame,
    prefix: str = "dedup_index",
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`incremental_dedup` against the tables persisted by
    :func:`build_dedup_index`."""
    spark = new_docs.sparkSession
    return incremental_dedup(
        new_docs,
        spark.table(f"{prefix}_exact"),
        spark.table(f"{prefix}_bands"),
        num_perm,
        bands,
        k,
        id_col,
        text_col,
    )


def near_dedup_clusters(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """End-to-end near-duplicate DEDUP (not just pair generation): verified
    Jaccard pairs become edges, connected components group transitive
    near-dups into clusters, and the min-id doc per cluster survives —
    the MinHashLSH + union-find pipeline (e.g. the C4/RefinedWeb recipe)
    expressed entirely in DataFrame ops.

    Returns one row per document: (id_col, cluster, cluster_size, kept)
    with cluster = min doc id reachable through pairs >= threshold,
    kept = (doc == cluster representative). Transitivity is deliberate:
    A~B and B~C place A,C in one cluster even when jaccard(A,C) <
    threshold — that is the standard dedup semantics (drop all but one
    per chain), distinct from the pairwise views (`ngram_jaccard_pairs`).

    Scale shape: pair generation is the inverted-index join (linear in
    shared-shingle fan-out, `max_shingle_df` caps hot shingles); the CC
    fixpoint runs ONLY on the near-dup subgraph — its vertex set is the
    docs that have at least one near-dup, typically a small fraction of
    the corpus — in O(log n) alternating-star rounds; the final cluster
    assignment is one left join + one window over the cluster key.
    """
    from .graph import connected_components_two_phase
    from pyspark.sql import Window

    # cache_shingles=True is safe here: the materialization is a lazy
    # localCheckpoint scoped to this query's lineage, not a catalog cache.
    pairs = ngram_jaccard_pairs(
        docs, k, threshold, id_col, text_col, max_shingle_df, cache_shingles=True
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comps = connected_components_two_phase(edges)
    assigned = (
        docs.select(F.col(id_col).alias("id"))
        .join(comps, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("cluster"))
    )
    w = Window.partitionBy("cluster")
    return assigned.select(
        F.col("id").alias(id_col),
        "cluster",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("id") == F.col("cluster")).alias("kept"),
    )


def leakage_safe_split(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.2,
    test_fraction: float = 0.1,
    buckets: int = 10_000,
    salt: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Train/test split that CANNOT leak near-duplicates across the
    boundary — the fix for what :func:`cross_split_leakage_pairs` detects.
    A per-document hash split partitions documents, not content: two
    near-identical documents hash independently and can land on opposite
    sides. Here the unit of assignment is the near-dup CLUSTER
    (:func:`near_dedup_clusters`: Jaccard pairs -> connected components),
    and the split hashes the cluster REPRESENTATIVE — every document in a
    cluster moves together, so no pair at-or-above the threshold (nor any
    transitive chain of such pairs) can ever straddle. Singleton docs are
    their own cluster and split exactly like the plain hash split.

    Returns (id_col, cluster, split). Determinism: cluster reps are min
    reachable ids (stable), the bucket arithmetic is the same pure hash
    `sampling.split_by_hash` pins — rerun-, engine- and
    partitioning-stable. Scale shape: the cluster table is the
    inverted-index pair join + subgraph CC (both df-cappable/bounded);
    the split itself adds one projection."""
    from .sampling import hash_bucket

    clusters = near_dedup_clusters(
        docs, k=k, threshold=threshold, id_col=id_col, text_col=text_col,
        max_shingle_df=max_shingle_df,
    )
    thr = round(test_fraction * buckets)
    return clusters.select(
        F.col(id_col),
        "cluster",
        F.when(
            hash_bucket(F.col("cluster"), buckets, salt) < F.lit(thr), F.lit("test")
        ).otherwise(F.lit("train")).alias("split"),
    )


def containment_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
    cjk: bool = False,
) -> DataFrame:
    """DIRECTED near-dup pairs by k-shingle containment
    |A∩B| / |A| — the asymmetric measure Jaccard under-scores: a short
    document quoted wholesale inside a long one has containment ~1 but
    Jaccard ~|A|/|B|, so symmetric dedup misses exactly the
    quote/boilerplate-inclusion cases a corpus cleaner cares about
    (Broder 1997's "containment", the same statistic behind
    superset/subset dedup).

    Same inverted-index scale shape as :func:`ngram_jaccard_pairs` (one
    shingle-hash self-join, 8-byte keys, optional `max_shingle_df` hot-
    shingle cap): the intersection is computed ONCE per unordered pair,
    then emitted in each direction that clears the threshold. Returns
    (id_contained, id_container, containment) — the CONTAINED doc is the
    dedup candidate.
    """
    sh = hashed_shingle_table(docs, k, id_col, text_col, cjk=cjk)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("h")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("h")
        )
        sh = sh.join(F.broadcast(hot), "h", "left_anti")
    sh = sh.localCheckpoint(eager=False)  # sizes + both join sides
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))

    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    both = inter.join(sa, "id_a").join(sb, "id_b").localCheckpoint(eager=False)
    c_ab = F.col("inter") / F.col("size_a")  # A contained in B
    c_ba = F.col("inter") / F.col("size_b")  # B contained in A
    fwd = both.filter(c_ab >= threshold).select(
        F.col("id_a").alias("id_contained"),
        F.col("id_b").alias("id_container"),
        F.round(c_ab, 6).alias("containment"),
    )
    rev = both.filter(c_ba >= threshold).select(
        F.col("id_b").alias("id_contained"),
        F.col("id_a").alias("id_container"),
        F.round(c_ba, 6).alias("containment"),
    )
    return fwd.unionByName(rev)


def shingle_novelty(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group shingle NOVELTY: the share of k-shingle occurrences that
    are unique to their document (corpus df = 1), in round-half-up ppm —
    the template/mirror detector that needs NO pair enumeration (two
    hash aggregates over the shingle table), so it runs at corpus sizes
    where the f² pair queries need df caps. Returns
    (group_col, n_docs, n_shingle_occ, n_novel, novelty_ppm).

    Scale shape: distinct per-doc shingle hashes once (lazily
    checkpointed for the df aggregate + the per-doc join side), one
    corpus df aggregate joined back on the 8-byte hash, per-group
    exact-BIGINT sums with ONE integer division per group."""
    sh = hashed_shingle_table(docs, k, id_col, text_col).localCheckpoint(
        eager=False
    )
    df = sh.groupBy("h").agg(F.count("*").alias("df"))
    per_doc = (
        sh.join(df, "h")
        .groupBy("id")
        .agg(
            F.count("*").alias("tot"),
            F.sum((F.col("df") == 1).cast("long")).alias("novel"),
        )
    )
    src = docs.select(F.col(id_col), F.col(group_col))
    return (
        per_doc.join(src, per_doc.id == F.col(id_col))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tot").cast("long").alias("n_shingle_occ"),
            F.sum("novel").cast("long").alias("n_novel"),
            F.expr(
                "(2000000 * SUM(novel) + SUM(tot)) DIV (2 * SUM(tot))"
            ).alias("novelty_ppm"),
        )
    )


def minhash_precision_eval(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MEASURED precision of the MinHash-LSH banding against exact
    k-shingle Jaccard, per band-agreement count (r12 — the dedup twin of
    the langid-confusion lens: the gate's error rate as a first-class
    query, not a hope). Returns

        (n_bands, n_candidates, n_true, precision_ppm)

    where a candidate is TRUE when its exact Jaccard >= threshold_pct/100
    — tested as 100·|A∩B| >= pct·|A∪B|, pure integers, no float boundary.
    More agreeing bands should mean higher precision; a flat curve says
    the banding is mis-sized for the corpus' similarity distribution.

    Scale shape: exact Jaccard is computed ONLY for candidate pairs —
    candidates join their A-side shingles (fan-out |A| per candidate)
    then hash-join (id_b, h) for the shared count, so the cost is
    bounded by candidate volume times shingles-per-doc, never the f²
    shared-shingle pair table the uncapped exact query walks."""
    # ONE tokenize+shingle pass for both hash widths (r15, VERDICT r14
    # item 7): the 40-bit minhash base and the 64-bit exact-Jaccard truth
    # both derive from the same materialized shingle arrays — at 100 TB
    # that deletes one of the audit's two full-corpus tokenize passes.
    # Interleaved warm A/B (tools/minhash_share_probe.py, sf0.1,
    # median-of-5): 2.69 s -> 2.33 s, values bit-identical.
    sharr = shingle_array_table(docs, k, id_col, text_col).localCheckpoint(
        eager=False
    )
    cands = minhash_candidates(
        docs, num_perm, bands, k, id_col, text_col, shingle_arrays=sharr
    ).localCheckpoint(eager=False)
    sh = hashed_shingle_table(
        docs, k, id_col, text_col, shingle_arrays=sharr
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("id").alias("id_a"), "h")
    b = sh.select(F.col("id").alias("id_b"), "h")
    inter = (
        cands.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, ["id_b", "h"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("_sa"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("_sb"))
    graded = (
        cands.join(inter, ["id_a", "id_b"], "left")
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "n_bands",
            F.coalesce(F.col("_i"), F.lit(0)).alias("_i0"),
            (F.col("_sa") + F.col("_sb") - F.coalesce(F.col("_i"), F.lit(0))).alias(
                "_den"
            ),
        )
    )
    return (
        graded.groupBy("n_bands")
        .agg(
            F.count("*").cast("long").alias("n_candidates"),
            F.sum(
                (F.lit(100) * F.col("_i0") >= F.lit(threshold_pct) * F.col("_den"))
                .cast("long")
            ).alias("n_true"),
        )
        .select(
            "n_bands",
            "n_candidates",
            "n_true",
            F.expr(
                "(2000000 * n_true + n_candidates) DIV (2 * n_candidates)"
            ).alias("precision_ppm"),
        )
    )


def minhash_recall_eval(
    docs: DataFrame,
    num_perm: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_mod: int = 1,
    sample_rem: int = 0,
) -> DataFrame:
    """MEASURED recall of the MinHash-LSH banding against the exact
    true-pair set (r12 — the complement of :func:`minhash_precision_eval`;
    together they grade the gate from both sides). Returns

        (jaccard_band, n_true, n_recalled, recall_ppm)

    where true pairs are exact k-shingle Jaccard >= `threshold` (the
    inverted-index pair join) and jaccard_band buckets the ROUNDED
    jaccard into 0.2-wide bands (band i covers [0.2·i, 0.2·(i+1));
    jaccard = 1.0 clamps into the top band). LSH theory says recall
    rises steeply with similarity (1 − (1 − s^r)^b); a flat measured
    curve means the banding is mis-sized for the corpus.

    Scale note: the TRUE side is the inverted-index pair enumeration —
    f² in hot-shingle document frequency, the cost this audit
    deliberately pays to obtain ground truth on a SAMPLE. r13 (VERDICT
    r12 item 4) ships the sampling dial IN the operator:
    `sample_mod`/`sample_rem` keep only documents whose portable md5
    hash of the id ≡ rem (mod mod) — a deterministic, cross-engine
    id-space sample applied BEFORE both the true-pair enumeration and
    the candidate generation, so the audit measures recall on the
    sampled sub-corpus and its ground-truth cost falls by mod² while the
    banding under test is the production one. Sampling commutes with
    the audit (pinned in tests/test_r13_fixes: a mod-2 run equals the
    full audit over the pre-filtered doc set); the default mod=1 is the
    unsampled r12 behavior, byte-identical oracle included. At 100 TB
    pick mod so the sample holds ~1M docs, or additionally cap
    hot-shingle df via ngram_jaccard_pairs' max_shingle_df on BOTH
    sides."""
    if sample_mod < 1 or not 0 <= sample_rem < sample_mod:
        raise ValueError(
            f"minhash_recall_eval: need sample_mod >= 1 and 0 <= sample_rem"
            f" < sample_mod, got {sample_mod}/{sample_rem}"
        )
    if sample_mod > 1:
        from ..functions.text import portable_hash64

        docs = docs.where(
            portable_hash64(F.col(id_col)) % sample_mod == sample_rem
        )
    # ONE tokenize+shingle pass for both hash widths (r15, VERDICT r14
    # item 7) — built AFTER the sampling filter so the sampled audit
    # tokenizes only the sample. See minhash_precision_eval; recall A/B
    # 2.84 s -> 2.74 s warm, values bit-identical.
    sharr = shingle_array_table(docs, k, id_col, text_col).localCheckpoint(
        eager=False
    )
    true_pairs = ngram_jaccard_pairs(
        docs, k=k, threshold=threshold, id_col=id_col, text_col=text_col,
        shingle_arrays=sharr,
    )
    cands = minhash_candidates(
        docs, num_perm, bands, k, id_col, text_col, shingle_arrays=sharr
    )
    band = F.least(F.floor(F.col("jaccard") * 5).cast("int"), F.lit(4))
    graded = (
        true_pairs.join(cands.select("id_a", "id_b", "n_bands"),
                        ["id_a", "id_b"], "left")
        .select(band.alias("jaccard_band"),
                F.col("n_bands").isNotNull().alias("_hit"))
    )
    return (
        graded.groupBy("jaccard_band")
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.sum(F.col("_hit").cast("long")).alias("n_recalled"),
        )
        .select(
            "jaccard_band",
            "n_true",
            "n_recalled",
            F.expr("(2000000 * n_recalled + n_true) DIV (2 * n_true)").alias(
                "recall_ppm"
            ),
        )
    )
