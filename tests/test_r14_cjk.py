"""Round-14 CJK-aware tokenization pins (VERDICT r13 item 2).

The driver fixture's text is ASCII, so these tests are where the CJK
tokenizer is actually graded: whitespace-free zh/ja strings, mixed
Latin+CJK tokens, single-character runs, Hangul (deliberately NOT
bigrammed — Korean uses spaces) — driven through the Spark expression,
the DuckDB twin, and a plain-Python brute-force reimplementation that
shares no code with either, plus the registered doc_token_stats_by_script
query compared cross-engine at driver strength on a multilingual fixture.
"""

from __future__ import annotations

import duckdb

from tests.oracle_check import compare

# Strings exercising every rule: pure CJK (no spaces), kana, mixed
# Latin/CJK inside one "token", length-1 runs, Hangul (word-split),
# Cyrillic, digits, punctuation stripping, the İ/ς neutralizations.
STRINGS = [
    "Hello 世界と日本語のテスト world",
    "这是一个完全没有空格的中文句子用来测试语言识别",
    "漢",
    "abc漢字def",
    "中文mixed英文tokens测试",
    "これは日本語のテキストです漢字も含まれています",
    "한국어 텍스트입니다 서울에서 쓴 글",
    "Это русский текст",
    "plain ascii only 123",
    "一二 三 四五六",
    "カタカナとひらがな",
    "İstanbul 漢字 ΚΟΣΜΟΣ τις",
    "punctuation,。！does not survive：中文；here",
    "",
]

_KANA = ("぀", "ヿ")
_HAN = ("一", "鿿")
_KEEP = [("a", "z"), ("0", "9"), ("À", "Ö"), ("Ø", "ö"), ("ø", "ɏ"),
         ("؀", "ۿ"), ("Ѐ", "ӿ"), ("ऀ", "ॿ"), ("Ͱ", "Ͽ"), ("가", "힣"),
         ("֐", "׿"), _KANA, _HAN]


def _is_cjk(ch: str) -> bool:
    return _KANA[0] <= ch <= _KANA[1] or _HAN[0] <= ch <= _HAN[1]


def _brute_cjk_tokens(text: str) -> list[str]:
    """Plain-Python reimplementation of the documented rule — per-char
    range checks and string slicing, no regex, no shared code."""
    s = text.replace("İ", "I").lower().replace("ς", "σ")
    norm = "".join(
        ch if any(lo <= ch <= hi for lo, hi in _KEEP) else " " for ch in s
    )
    out: list[str] = []
    for tok in norm.split():
        runs: list[tuple[str, bool]] = []
        for ch in tok:
            if runs and runs[-1][1] == _is_cjk(ch):
                runs[-1] = (runs[-1][0] + ch, runs[-1][1])
            else:
                runs.append((ch, _is_cjk(ch)))
        for run, cjk in runs:
            if not cjk or len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
    return out


def test_tokens_cjk_matches_python_brute_force(spark):
    from analyzing_big_data_in_scala_spark.functions.text import tokens_cjk

    got = [
        r["t"]
        for r in spark.createDataFrame(
            [(i, s) for i, s in enumerate(STRINGS)], "i int, s string"
        )
        .orderBy("i")
        .select(tokens_cjk("s").alias("t"))
        .collect()
    ]
    for s, g in zip(STRINGS, got):
        assert g == _brute_cjk_tokens(s), (s, g, _brute_cjk_tokens(s))
    # Spot-pin the load-bearing behaviors by value.
    by_s = dict(zip(STRINGS, got))
    assert by_s["漢"] == ["漢"]  # length-1 run → single char
    assert by_s["abc漢字def"] == ["abc", "漢字", "def"]  # mixed token splits
    assert by_s["一二 三 四五六"] == ["一二", "三", "四五", "五六"]
    # Hangul stays word-split (no bigrams):
    assert by_s["한국어 텍스트입니다 서울에서 쓴 글"] == [
        "한국어", "텍스트입니다", "서울에서", "쓴", "글"]
    # whitespace-free zh: n-1 bigrams instead of ONE giant token
    zh = "这是一个完全没有空格的中文句子用来测试语言识别"
    assert len(by_s[zh]) == len(zh) - 1
    assert by_s[""] == []


def test_tokens_cjk_cross_engine(spark):
    from analyzing_big_data_in_scala_spark.functions.text import (
        sql_tokens_cjk,
        tokens_cjk,
    )

    got = [
        r["t"]
        for r in spark.createDataFrame(
            [(i, s) for i, s in enumerate(STRINGS)], "i int, s string"
        )
        .orderBy("i")
        .select(tokens_cjk("s").alias("t"))
        .collect()
    ]
    con = duckdb.connect()
    for s, g in zip(STRINGS, got):
        (o,) = con.execute(
            f"SELECT {sql_tokens_cjk('?')}", [s]
        ).fetchone()
        assert list(o) == g, (s, list(o), g)


def test_token_stats_by_script_multilingual_cross_engine(spark, tmp_path):
    """The registered query at driver strength (rows+schema+value hash)
    on a fixture where han/kana/latin buckets all exist — plus the
    semantic pins: latin blowup is exactly 1e6 (tokenizers agree
    off-CJK) and the han bucket's blowup is the measured budget error."""
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    rows = [
        (1, "The quick brown fox jumps over the lazy dog", "en", "src0", 0),
        (2, "这是一个完全没有空格的中文句子用来测试语言识别", "zh", "src0", 0),
        (3, "これは日本語のテキストです", "ja", "src1", 0),
        (4, "Это русский текст про Москву", "ru", "src1", 0),
        (5, "mixed 中文 and english words here", "en", "src0", 0),
        (6, "12345 67890", "en", "src1", 0),  # letterless → 'none'
        (7, "カタカナとひらがなのテキスト", "ja", "src0", 0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    spec = QUERIES["doc_token_stats_by_script"]
    got = {
        r["script"]: (r["n_docs"], r["tokens_plain"], r["tokens_cjk"],
                      r["cjk_blowup_ppm"])
        for r in spec.fn(spark, sf).collect()
    }
    # brute-force expectations from the Python tokenizers
    from collections import defaultdict
    exp = defaultdict(lambda: [0, 0, 0])
    for _, text, _, _, _ in rows:
        counts = {
            "han": sum(1 for ch in text if _HAN[0] <= ch <= _HAN[1]),
            "kana": sum(1 for ch in text if _KANA[0] <= ch <= _KANA[1]),
            "cyrillic": sum(1 for ch in text if "Ѐ" <= ch <= "ӿ"),
            "latin": sum(
                1 for ch in text
                if "a" <= ch <= "z" or "A" <= ch <= "Z" or "À" <= ch <= "Ö"
                or "Ø" <= ch <= "ö" or "ø" <= ch <= "ɏ"
            ),
        }
        m = max(counts.values())
        script = "none" if m == 0 else min(
            k for k, v in counts.items() if v == m
        )
        plain = len([t for t in __import__("re").sub(
            r"[^a-z0-9぀-ヿ一-鿿À-ÖØ-öø-ɏЀ-ӿ؀-ۿऀ-ॿͰ-Ͽ가-힣֐-׿]+", " ",
            text.replace("İ", "I").lower().replace("ς", "σ")).split()])
        exp[script][0] += 1
        exp[script][1] += plain
        exp[script][2] += len(_brute_cjk_tokens(text))
    for script, (n, p, c) in exp.items():
        ppm = (2_000_000 * c + p) // (2 * p) if p > 0 else None
        assert got[script] == (n, p, c, ppm), (script, got[script], (n, p, c, ppm))
    # latin bucket: tokenizers agree off-CJK... except doc 5's 中文 run,
    # which the cjk tokenizer keeps as ONE bigram where plain merges it
    # into the token stream identically (len-2 run → 1 bigram == 1 token),
    # so latin's blowup is still exactly 1e6.
    assert got["latin"][3] == 1_000_000
    # han bucket blowup: doc 2 alone — 22 chars: 1 plain token vs 21 bigrams.
    assert got["han"][1] < got["han"][2]
    assert got["han"][3] > 10_000_000  # >10x token-budget error measured

    # driver-strength cross-engine compare
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    out = compare(spec.fn(spark, sf), con, spec.oracle)
    assert out["values_match"], out


def test_cjk_jaccard_finds_zh_near_dups_invisible_to_default(spark, tmp_path):
    """The dedup loop closed: two near-identical whitespace-free zh docs
    are INVISIBLE to the default shingle family (each doc is ONE token —
    no 3-shingle exists), and dedup_ngram_jaccard_cjk finds them with a
    jaccard matching a raw-Python shingle recomputation. Cross-engine at
    driver strength on the same fixture."""
    from analyzing_big_data_in_scala_spark.plans import QUERIES

    zh_a = "这是一个完全没有空格的中文句子用来测试语言识别"
    zh_b = "这是一个完全没有空格的中文句子用来测试重复检测"  # near-dup of zh_a
    rows = [
        (1, zh_a, "zh", "src0", 0),
        (2, zh_b, "zh", "src0", 0),
        (3, "the quick brown fox jumps over the lazy dog", "en", "src1", 0),
        (4, "the quick brown fox jumps over the lazy cat", "en", "src1", 0),
        (5, "totally unrelated english text here", "en", "src1", 0),
    ]
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    plain = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, sf).collect()
    }
    cjk = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in QUERIES["dedup_ngram_jaccard_cjk"].fn(spark, sf).collect()
    }
    assert (1, 2) not in plain  # the blindness VERDICT r13 named
    assert (1, 2) in cjk        # the r14 fix sees it
    assert (3, 4) in cjk        # off-CJK behavior preserved

    # raw-shingle brute force for the zh pair
    def shingles(text):
        toks = _brute_cjk_tokens(text)
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sa, sb = shingles(zh_a), shingles(zh_b)
    expect_j = round(len(sa & sb) / len(sa | sb), 6)
    assert cjk[(1, 2)] == expect_j and expect_j >= 0.2

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    spec = QUERIES["dedup_ngram_jaccard_cjk"]
    out = compare(spec.fn(spark, sf), con, spec.oracle)
    assert out["values_match"], out


def test_cjk_jaccard_identical_to_default_on_ascii_corpus(spark):
    """Off-CJK the two tokenizers agree by construction, so the cjk twin
    must reproduce dedup_ngram_jaccard EXACTLY on the (ASCII) fixture."""
    from tests.conftest import SF_SMALL

    from analyzing_big_data_in_scala_spark.plans import QUERIES

    plain = sorted(
        tuple(r)
        for r in QUERIES["dedup_ngram_jaccard"].fn(spark, SF_SMALL).collect()
    )
    cjk = sorted(
        tuple(r)
        for r in QUERIES["dedup_ngram_jaccard_cjk"].fn(spark, SF_SMALL).collect()
    )
    assert plain == cjk
    assert len(plain) > 0


def test_default_tokenizer_untouched_on_cjk(spark):
    """Contrast pin: the reference-parity DEFAULT tokenizer still
    destroys CJK (empty token list — the exact degenerate behavior
    tokens_cjk exists to fix), and tokens(unicode=True) still yields the
    one-giant-token shape. Both are load-bearing: the first is F11/N4
    reference parity, the second is what doc_token_stats_by_script
    measures against."""
    from analyzing_big_data_in_scala_spark.functions.text import tokens

    zh = "这是一个完全没有空格的中文句子用来测试语言识别"
    df = spark.createDataFrame([(zh,)], "s string").select(
        tokens("s").alias("ascii_t"), tokens("s", unicode=True).alias("uni_t")
    )
    r = df.collect()[0]
    assert r["ascii_t"] == []
    assert r["uni_t"] == [zh]
