"""Text-analysis building blocks for the LLM-data-pipeline operators
(SURVEY §2.2 Q43–Q46) — all JVM-side ``pyspark.sql.functions``
expressions; no Python in any hot path.

Every helper has an exact DuckDB twin (documented per function) so the
ops built on them stay differential-testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the language-ID heuristic.
# Public common-word lists; deliberately small so the SQL twin is a
# readable IN-list.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single
# non-alphanumeric glyphs — the common pre-split of public BPE
# implementations. DuckDB twin: regexp_extract_all(text, <same>).
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text_col: Column | str) -> Column:
    """Whitespace tokens, lowercased.
    DuckDB twin: ``string_split_regex(lower(text), '\\s+')``."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), r"\s+")


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the MinHash/Jaccard unit).
    DuckDB twin::

        list_distinct(list_transform(range(1, len(t) - {n-2}),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
    """
    # Spark's sequence(1, 0) yields a DESCENDING [1, 0] (not empty like
    # DuckDB's range), so short docs need an explicit empty-array guard.
    idx = F.when(
        F.size(tokens_col) >= n,
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
    )
    return F.array_distinct(F.transform(idx, gram))


def token_count_bpe(text_col: Column | str) -> Column:
    """Token count under the BPE-ish pre-split.
    DuckDB twin: ``len(regexp_extract_all(text, <BPE_SPLIT_RE>))``."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    # group 0 = whole match (Spark defaults to group 1, DuckDB to 0)
    return F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_RE), 0))


def rolling_fingerprint(tokens_col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token lengths —
    a cheap document fingerprint that changes on any reorder/edit,
    computable identically in both engines (no engine hash functions).
    DuckDB twin::

        list_reduce(list_prepend(0, list_transform(t, w -> len(w))),
                    (a, b) -> (a * 31 + b) % 1073741789)
    """
    lens = F.transform(tokens_col, F.length)
    return F.aggregate(
        lens,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % 1073741789,
    )


def stopword_hits(tokens_col: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens in a marker set.
    DuckDB twin: ``len(list_filter(t, x -> x IN (...)))``."""
    wset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens_col, lambda x: F.array_contains(wset, x)))


def language_guess(tokens_col: Column) -> Column:
    """Marker-frequency language-ID heuristic: most marker hits wins,
    alphabetical language code breaks ties, 'und' (undetermined) when
    no marker hits at all. Deterministic by construction, so the SQL
    twin is the same GREATEST/CASE cascade."""
    hits = {lang: stopword_hits(tokens_col, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    # Build the when() chain reversed so the earliest alphabetical
    # language wins ties (when() chains evaluate top-down).
    expr = F.lit("und")
    for lang in sorted(hits, reverse=True):
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def ordered_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Positional (non-distinct) n-word shingles — winnowing needs
    document order, unlike the set-semantics ``word_shingles``.
    DuckDB twin::

        CASE WHEN len(t) >= {n} THEN
          list_transform(range(1, len(t) - {n-2}),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        ELSE [] END
    """
    idx = F.when(
        F.size(tokens_col) >= n,
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
    )
    return F.transform(idx, gram)


POLY_MOD = 1073741789  # largest prime < 2^30: a*31+cp stays < 2^35 « 2^63


def poly_hash(s: Column) -> Column:
    """Engine-neutral string hash: polynomial over codepoints mod a
    prime — identical arithmetic in Spark and DuckDB (no engine hash
    functions, which never agree across engines).
    DuckDB twin::

        list_reduce(list_prepend(0::BIGINT,
                    list_transform(string_split(s, ''), c -> ascii(c)::BIGINT)),
                    (a, b) -> (a * 31 + b) % 1073741789)
    """
    codes = F.transform(F.split(s, ""), F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % POLY_MOD,
    )
