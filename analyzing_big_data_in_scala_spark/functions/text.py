"""Column-level text building blocks.

Covers the reference's normalization/tokenization surface (SURVEY.md §2.7
F6-F11 and §2.8 N1-N8) as pure `pyspark.sql.functions` expressions — JVM-side,
whole-stage-codegen friendly, no Python UDFs in the hot path.

Reference sites:
- tokenize on whitespace/punctuation: ScalaNotebooks/MovieSearchEngine.scala:114-118
- normalize (lowercase, strip non-alphanumeric): ScalaNotebooks/MovieSearchEngine.scala:59-63
- stop-word removal with custom case-insensitive list: ScalaNotebooks/MovieSearchEngine.scala:71-75
- entity cleanup regex: ScalaNotebooks/NamedEntitiesWordCount.scala:55-56
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Compact english stop-word list; stands in for the reference's StopWords.txt
# driver file (ScalaNotebooks/MovieSearchEngine.scala:38). Deterministic and
# mirrored verbatim into the DuckDB oracle SQL, so both sides agree.
STOP_WORDS = (
    "a",
    "an",
    "and",
    "are",
    "as",
    "at",
    "be",
    "but",
    "by",
    "for",
    "if",
    "in",
    "into",
    "is",
    "it",
    "no",
    "not",
    "of",
    "on",
    "or",
    "such",
    "that",
    "the",
    "their",
    "then",
    "there",
    "these",
    "they",
    "this",
    "to",
    "was",
    "will",
    "with",
)


def sql_stopword_list() -> str:
    """The stop-word list as a SQL literal, for oracle queries."""
    return "(" + ", ".join(f"'{w}'" for w in STOP_WORDS) + ")"


# Per-language stop-word PROFILES for the r12 language classifier
# (doc_language_id): the en-only hit-ratio gate leaked any non-English
# text containing incidental English stopwords ('in'/'was'/'an' are also
# German words, 'a'/'no' Spanish, 'a' French) — the leak
# doc_langid_confusion measures. Scoring every language's profile and
# taking the argmax closes that class. Lists are ASCII-ONLY by
# construction: `normalize_text` collapses every non-[a-z0-9] rune to a
# space, so accented stopwords (fuer/für, mas/más) never survive
# tokenization — each list holds only forms that do. Keep these tuples in
# sync with the oracle literals via `sql_lang_profile`.
LANG_STOP_PROFILES: dict[str, tuple[str, ...]] = {
    "en": STOP_WORDS,
    "de": (
        "der", "die", "das", "und", "ist", "nicht", "ein", "eine", "einer",
        "mit", "von", "zu", "den", "dem", "des", "im", "am", "auf", "als",
        "auch", "sich", "sie", "er", "ich", "wir", "ihr", "aber", "oder",
        "wenn", "nur", "noch", "bei", "nach", "aus", "wie", "war", "waren",
        "sind", "werden", "wird", "hat", "haben", "kann", "mehr", "schon",
        "dann", "doch", "hier", "alle", "durch",
    ),
    "fr": (
        "le", "la", "les", "de", "des", "du", "un", "une", "et", "est",
        "que", "qui", "dans", "pour", "pas", "sur", "avec", "au", "aux",
        "ce", "cette", "ces", "il", "elle", "nous", "vous", "ils", "elles",
        "ne", "se", "son", "sa", "ses", "mais", "ou", "si", "plus", "par",
        "sont", "tout", "tous", "comme", "bien", "leur", "votre", "notre",
        "a",
    ),
    "es": (
        "el", "la", "los", "las", "de", "del", "un", "una", "unos", "unas",
        "y", "es", "que", "en", "no", "se", "por", "con", "para", "su",
        "sus", "al", "lo", "como", "pero", "este", "esta", "estos", "estas",
        "son", "fue", "ser", "hay", "muy", "o", "si", "ya", "cuando",
        "sobre", "entre", "sin", "me", "mi", "tu", "a",
    ),
}


def sql_lang_profile(lang: str) -> str:
    """One language's stop-word profile as a SQL literal (oracle twin of
    LANG_STOP_PROFILES)."""
    return "(" + ", ".join(f"'{w}'" for w in LANG_STOP_PROFILES[lang]) + ")"


def normalize_text(col: Column | str) -> Column:
    """N4/F11: lowercase and collapse every non-alphanumeric run to a single
    space (ScalaNotebooks/MovieSearchEngine.scala:59-63)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def tokens(col: Column | str, normalize: bool = True) -> Column:
    """F6/N3: normalized token array; empty strings filtered out
    (ScalaNotebooks/MovieSearchEngine.scala:114-118)."""
    c = normalize_text(col) if normalize else (F.col(col) if isinstance(col, str) else col)
    return F.filter(F.split(c, r"\s+"), lambda t: F.length(t) > 0)


def remove_stopwords(token_col: Column, stop_words: tuple[str, ...] = STOP_WORDS) -> Column:
    """N6: case-insensitive stop-word removal (the reference's
    StopWordsCleaner is configured caseSensitive=false,
    ScalaNotebooks/MovieSearchEngine.scala:71-75). Duplicates and order of
    the surviving tokens are preserved (`filter`, not `array_except`)."""
    lowered = tuple(w.lower() for w in stop_words)
    return F.filter(token_col, lambda t: ~F.lower(t).isin(*lowered))


# N5 stemmer (ScalaNotebooks/MovieSearchEngine.scala:66-68 — the reference
# wires a Stemmer stage but leaves it commented out, so this operator is
# optional-by-definition; we ship it as a deterministic "Porter-light"
# suffix chain). Rules run IN ORDER, each at most once (patterns are
# $-anchored so only one match is possible); `<1>` marks a backreference,
# rendered `$1` for Spark's Java regex and `\1` for DuckDB's RE2 — both
# engines apply the identical chain, keeping stemmed queries
# oracle-checkable. Length guards (`.{3}`) stand in for Porter's measure
# condition: never strip a suffix that would leave a stem under 3 chars.
STEM_RULES: tuple[tuple[str, str], ...] = (
    (r"sses$", "ss"),
    (r"ies$", "i"),
    (r"([^s])s$", "<1>"),
    (r"(.{3})ing$", "<1>"),
    (r"(.{3})ed$", "<1>"),
    (r"(.{3})ly$", "<1>"),
)


def stem_light(col: Column | str) -> Column:
    """Apply the STEM_RULES suffix chain to a single token column."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in STEM_RULES:
        c = F.regexp_replace(c, pat, repl.replace("<1>", "$1"))
    return c


def sql_stem_light(expr: str) -> str:
    """DuckDB-side twin of :func:`stem_light` (RE2 backrefs use \\1)."""
    out = expr
    for pat, repl in STEM_RULES:
        out = f"regexp_replace({out}, '{pat}', '{repl.replace('<1>', chr(92) + '1')}')"
    return out


def portable_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit hash computable identically in Spark and DuckDB:
    first 15 hex digits of md5, parsed base-16.

    Spark:  conv(substring(md5(x), 1, 15), 16, 10) :: bigint
    DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)

    Used by MinHash/SimHash so the dedup operators are fully oracle-checkable.
    On the hot path at 100 TB scale you would swap in xxhash64 (cheaper,
    JVM-intrinsic); the md5 form exists for cross-engine verifiability.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def sql_portable_hash64(expr: str) -> str:
    """DuckDB-side twin of :func:`portable_hash64`."""
    return f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"


def portable_hash40(col: Column | str) -> Column:
    """40-bit variant (first 10 hex digits of md5) for arithmetic hashing:
    small enough that `a * h + b` stays far below 2^63 (Spark 4 runs in ANSI
    mode, where bigint overflow raises instead of wrapping)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 10), 16, 10).cast("long")


def sql_portable_hash40(expr: str) -> str:
    """DuckDB-side twin of :func:`portable_hash40`."""
    return f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 10)) AS BIGINT)"
