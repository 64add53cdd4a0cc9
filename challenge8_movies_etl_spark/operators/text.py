"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting (north star,
BASELINE.json:6; lexicon pattern per the EDBT'16 Spark sentiment paper,
PAPERS.md).

Everything is native column expressions (codegen, no UDF). Counting
uses word-boundary regexes shared between Java and RE2 dialects.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Valence lexicon: a subset of AFINN-111 (Finn Årup Nielsen, public
# word list, valences -5..+5) plus four fixture-domain terms in the
# same convention (marked; FIXTURES.md: documents.text is a technical
# word soup whose sentiment targets are 'fast'/'slow'/'big'/'small').
# No word in the list is a prefix of another, so the \b-bounded regex
# alternation matches identically under Java (leftmost-first) and RE2
# (leftmost-longest) semantics.
AFINN_VALENCE: dict[str, int] = {
    # AFINN-111 subset
    "good": 3, "great": 3, "excellent": 3, "amazing": 4, "awesome": 4,
    "best": 3, "better": 2, "fantastic": 4, "happy": 3, "love": 3,
    "wonderful": 4, "superb": 5, "brilliant": 4, "outstanding": 5,
    "nice": 3, "perfect": 3, "fun": 4, "success": 2, "win": 4,
    "clean": 2, "improved": 2,
    "bad": -3, "terrible": -3, "awful": -3, "horrible": -3,
    "worst": -3, "hate": -3, "poor": -2, "wrong": -2, "fail": -2,
    "broken": -1, "error": -2, "problem": -2, "sad": -2, "angry": -3,
    "disappointing": -2, "ugly": -3, "nasty": -3, "damage": -3,
    "crash": -2, "dead": -3, "worse": -3,
    # fixture-domain extension (AFINN convention, not AFINN-111 terms)
    "fast": 2, "big": 1, "slow": -2, "small": -1,
}
POSITIVE = tuple(sorted(w for w, v in AFINN_VALENCE.items() if v > 0))
NEGATIVE = tuple(sorted(w for w, v in AFINN_VALENCE.items() if v < 0))
EN_STOPWORDS = ("the", "a")

# BPE-ish tokenization: letter runs | digit runs | single punctuation
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_ish_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH)).cast("bigint")


def bpe_ish_count_sql(expr: str) -> str:
    return (f"cast(len(regexp_extract_all({expr}, "
            f"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) as bigint)")


def lexicon_count(text: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of any lexicon word, word-bounded."""
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(text, F.lit(pat)).cast("bigint")


def lexicon_count_sql(expr: str, words: tuple[str, ...]) -> str:
    # DuckDB string literals keep backslashes verbatim — single '\b' here
    pat = r"\b(" + "|".join(words) + r")\b"
    return f"cast(len(regexp_extract_all({expr}, '{pat}')) as bigint)"


def weighted_sentiment(text: Column) -> Column:
    """AFINN-weighted valence: Σ valence(word) over the document's
    whitespace tokens, via a literal map lookup folded with
    ``aggregate`` — one codegen pass, no regex, no UDF, no shuffle.
    """
    vmap = F.create_map(*[F.lit(x) for kv in AFINN_VALENCE.items()
                          for x in kv])
    return F.aggregate(
        tokens(text), F.lit(0).cast("bigint"),
        lambda acc, w: acc + F.coalesce(F.element_at(vmap, w),
                                        F.lit(0).cast("bigint")))


def weighted_sentiment_sql(expr: str) -> str:
    """DuckDB twin: list_transform CASE lookup + list_sum."""
    cases = " ".join(f"WHEN '{w}' THEN {v}"
                     for w, v in AFINN_VALENCE.items())
    return (f"cast(coalesce(list_sum(list_transform(string_split({expr},"
            f" ' '), w -> CASE w {cases} ELSE 0 END)), 0) as bigint)")


def sentiment_score(text: Column) -> Column:
    """Lexicon polarity: #positive - #negative (EDBT'16 pattern)."""
    return lexicon_count(text, POSITIVE) - lexicon_count(text, NEGATIVE)


def stopword_count(text: Column) -> Column:
    return lexicon_count(text, EN_STOPWORDS)


def quality_score(n_tokens: Column, n_distinct: Column, n_chars: Column,
                  n_stop: Column) -> Column:
    """Heuristic document quality in [0, ~2]: type-token ratio +
    stopword-rate band + length band. Rational arithmetic only
    (deterministic across engines), rounded at the edge."""
    ttr = n_distinct.cast("double") / (n_tokens.cast("double") + 1.0)
    stop_rate = n_stop.cast("double") / (n_tokens.cast("double") + 1.0)
    len_ok = ((n_chars >= 100) & (n_chars <= 450)).cast("double")
    return F.round(ttr + stop_rate + len_ok * 0.5, 4)


def quality_score_sql(n_tokens: str, n_distinct: str, n_chars: str,
                      n_stop: str) -> str:
    return (f"round(cast({n_distinct} as double) / (cast({n_tokens} as double) + 1.0)"
            f" + cast({n_stop} as double) / (cast({n_tokens} as double) + 1.0)"
            f" + (CASE WHEN {n_chars} >= 100 AND {n_chars} <= 450"
            f" THEN 1.0 ELSE 0.0 END) * 0.5, 4)")


def fingerprint_exact(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text (lowercase,
    collapsed whitespace). Identical across engines."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def fingerprint_tokenset(text: Column) -> Column:
    """Order-insensitive fingerprint: md5 of sorted distinct tokens —
    catches shuffled near-duplicates."""
    return F.md5(F.concat_ws(
        " ", F.sort_array(F.array_distinct(F.split(F.lower(text), " ")))))
