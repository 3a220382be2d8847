"""Round-14 NFC-normalization pins (VERDICT r13 item 3).

The two engines run genuinely independent NFC implementations — Python's
unicodedata (Spark's Arrow-batched nfc_col) vs DuckDB's utf8proc
nfc_normalize — so every test here is a cross-implementation
differential. The fuzz pins idempotence (NFC(NFD(x)) == NFC(x)) and
implementation agreement on adversarial pools (combining marks, Hangul
jamo — whose NFD forms leave the 가-힣 keep range entirely — boundary
codepoints, already-NFC text); the fixture tests prove the r13 langid
trio goes green on NFD-encoded crawl text once the ingest pre-pass
composes it, and that WITHOUT the pre-pass NFD accents split tokens and
miss the accented profiles (the failure the operator exists to fix).
"""

from __future__ import annotations

import random
import unicodedata

import duckdb
import pytest

from tests.oracle_check import compare
from tests.test_r13_unicode import FIXTURE


def _nfd(s: str) -> str:
    return unicodedata.normalize("NFD", s)


def test_nfc_fuzz_cross_implementation_and_idempotence(spark):
    """300 deterministic random strings over adversarial pools, driven
    through Spark's nfc_col (unicodedata), DuckDB's nfc_normalize
    (utf8proc), and the idempotence law — all three must agree."""
    from analyzing_big_data_in_scala_spark.functions.text import nfc_col

    pools = [
        "für über schön déjà crème brûlée",        # NFC accented Latin
        _nfd("für über schön déjà crème brûlée"),  # the same, NFD
        "가각힣한국어",                                  # Hangul syllables
        _nfd("가나다한글"),                             # NFD jamo sequences
        "éàüôñ",     # raw combining marks
        "ΚΟΣΜΟΣ τις ώρα",                           # Greek (tonos forms)
        _nfd("ώρα ευχή"),
        "中文漢字かなカナ",                              # CJK (NFC-invariant)
        "plain ascii 123 .,!?",
        "ÅΩ",  # ANGSTROM SIGN, OHM SIGN — NFC singletons
    ]
    rng = random.Random(1404)
    strings = []
    for _ in range(300):
        n = rng.randint(1, 24)
        strings.append("".join(rng.choice(rng.choice(pools)) for _ in range(n)))
    strings += pools

    got = [
        r["n"]
        for r in spark.createDataFrame(
            [(i, s) for i, s in enumerate(strings)], "i int, s string"
        )
        .orderBy("i")
        .select(nfc_col("s").alias("n"))
        .collect()
    ]
    con = duckdb.connect()
    for s, g in zip(strings, got):
        assert g == unicodedata.normalize("NFC", s), repr(s)  # plumbing
        (o,) = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()
        assert o == g, (repr(s), repr(o), repr(g))  # utf8proc agrees
        # idempotence / NFD-insensitivity on both implementations
        assert unicodedata.normalize("NFC", _nfd(s)) == g, repr(s)
        (o2,) = con.execute("SELECT nfc_normalize(?)", [_nfd(s)]).fetchone()
        assert o2 == g, repr(s)


def test_nfd_accents_split_tokens_without_nfc_and_not_with_it(spark):
    """The motivating failure, pinned both ways: NFD 'für über' splits
    into garbage tokens under the plain unicode tokenizer (combining
    marks are outside every keep range), and tokens(nfc=True) restores
    the NFC tokenization exactly."""
    from analyzing_big_data_in_scala_spark.functions.text import tokens

    nfc_text = "für über schön"
    rows = [(1, nfc_text), (2, _nfd(nfc_text))]
    df = spark.createDataFrame(rows, "i int, s string").orderBy("i")
    plain = [r["t"] for r in df.select(tokens("s", unicode=True).alias("t")).collect()]
    assert plain[0] == ["für", "über", "schön"]
    assert plain[1] == ["fu", "r", "u", "ber", "scho", "n"]  # the breakage
    fixed = [r["t"] for r in df.select(
        tokens("s", unicode=True, nfc=True).alias("t")
    ).collect()]
    assert fixed[0] == fixed[1] == ["für", "über", "schön"]


def test_nfc_requires_unicode_mode(spark):
    from analyzing_big_data_in_scala_spark.functions.text import (
        normalize_text,
        sql_normalize,
    )

    with pytest.raises(ValueError, match="requires unicode=True"):
        normalize_text("text", nfc=True)
    with pytest.raises(ValueError, match="requires unicode=True"):
        sql_normalize("text", nfc=True)


def test_langid_trio_green_on_nfd_fixture_after_nfc_prepass(spark, tmp_path):
    """VERDICT r13 item 3's done-bar: NFD-encode the whole multilingual
    micro-fixture, run the ingest pre-pass (nfc_col — the curation-side
    usage), and the r13 langid trio must (a) label every doc correctly
    and (b) hash-match its DuckDB oracle at driver strength. The oracle
    reads the SAME pre-composed parquet, so this also proves the
    pre-pass output round-trips through parquet identically for both
    engines."""
    from analyzing_big_data_in_scala_spark.functions.text import nfc_col
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    sf = str(tmp_path / "sf")
    raw = spark.createDataFrame(
        [(i, _nfd(t), exp, "src%d" % (i % 2), len(t)) for i, t, exp in FIXTURE],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # ingest pre-pass: compose BEFORE the corpus lands
    raw.withColumn("text", nfc_col("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")

    spec = QUERIES["doc_language_id"]
    got = {r["doc_id"]: r["pred_lang"] for r in spec.fn(spark, sf).collect()}
    for doc_id, _, expected in FIXTURE:
        assert got[doc_id] == expected, (doc_id, got[doc_id], expected)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    for name in ("doc_language_id", "doc_langid_confusion",
                 "doc_language_mix_by_source"):
        s = QUERIES[name]
        out = compare(s.fn(spark, sf), con, s.oracle)
        assert out["values_match"], (name, out)


def test_nfc_audit_counts_on_nfd_fixture(spark, tmp_path):
    """doc_nfc_audit on a half-NFD corpus: n_docs_changed counts exactly
    the NFD docs, chars_removed equals the combining marks composed away
    — cross-checked by unicodedata AND hash-matched against utf8proc at
    driver strength."""
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    texts = [
        (1, "für über schön", "src0"),          # NFC — unchanged
        (2, _nfd("für über schön"), "src0"),    # NFD — 3 marks removed
        (3, "plain ascii", "src1"),             # unchanged
        (4, _nfd("déjà vu"), "src1"),           # NFD — 2 marks removed
        (5, _nfd("가나다"), "src1"),              # NFD jamo → syllables
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in texts],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    spec = QUERIES["doc_nfc_audit"]
    got = {
        r["source"]: (r["n_docs"], r["n_docs_changed"], r["chars_removed"])
        for r in spec.fn(spark, sf).collect()
    }
    exp = {}
    for _, t, s in texts:
        n, c, r = exp.get(s, (0, 0, 0))
        nfc = unicodedata.normalize("NFC", t)
        exp[s] = (n + 1, c + (t != nfc), r + (len(t) - len(nfc)))
    assert got == exp, (got, exp)
    assert got["src0"] == (2, 1, 3)
    assert got["src1"] == (3, 2, 2 + 3)  # déjà: 2 marks; 가나다: 3 jamo

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    out = compare(spec.fn(spark, sf), con, spec.oracle)
    assert out["values_match"], out
