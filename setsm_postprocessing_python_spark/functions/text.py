"""Text-analysis functions for the training-data pipeline.

All JVM-side expressions (dual-dialect via sql/dialect.py idioms):
- token counting: whitespace tokens + a BPE-ish alphanumeric-run count,
- quality scoring: length / diversity / stopword ratios,
- language-ID: stopword-profile scoring with deterministic argmax,
- document fingerprint: position-weighted polynomial rolling hash
  (mod 2^31-1) — order-sensitive, exact integer arithmetic.

Also extract_text: the deterministic html->text extractor. The engine's
pages derive html by wrapping text (sources/pages.py), so extraction is
the exact inverse — byte-identical text per url, the input_hint invariant
(verified in tests/test_text.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sql import dialect as D

MERSENNE31 = 2147483647
FP_BASE_POWERS = [pow(31, e, MERSENNE31) for e in range(8)]  # 31^(pos%8) mod M31

STOPWORDS = {
    "en": ["the", "a", "of", "and", "in"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "la", "les", "et", "un"],
    "es": ["el", "la", "los", "y", "un"],
    "zh": ["de", "le", "shi", "he", "zai"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic argmax tie-break


def extract_text(html_col):
    """Deterministic html -> text: strip the fixed wrapper the engine's
    page synthesis adds. Byte-identical per url by construction."""
    s = F.decode(html_col, "utf-8")
    return F.regexp_replace(
        F.regexp_replace(s, "^<html><body>", ""), "</body></html>$", "")


def _stopword_count(dialect: str, words: list[str], text: str = "text") -> str:
    toks = D.tokens_expr(dialect, text)
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == D.SPARK:
        return f"size(filter({toks}, t -> t IN ({lst})))"
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def token_stats_exprs(dialect: str, text: str = "text") -> dict[str, str]:
    """n_tokens (whitespace), n_unique, n_bpe (alphanumeric runs — a
    BPE-ish proxy for subword count), mean token length x1000 (integer)."""
    nt = D.n_tokens_expr(dialect, text)
    nu = D.n_unique_tokens_expr(dialect, text)
    if dialect == D.SPARK:
        nbpe = f"size(regexp_extract_all({text}, '[a-z0-9]+', 0))"
    else:
        nbpe = f"len(regexp_extract_all({text}, '[a-z0-9]+'))"
    return {
        "n_tokens": f"cast({nt} as bigint)",
        "n_unique": f"cast({nu} as bigint)",
        "n_bpe": f"cast({nbpe} as bigint)",
        "ttr_x1000": f"cast(floor(cast({nu} as double) * 1000.0 / {nt}) as bigint)",
    }


def quality_exprs(dialect: str, text: str = "text", n_chars: str = "n_chars") -> dict[str, str]:
    """Quality score components + integer composite score (0-100):
    length band, lexical diversity, stopword presence. Integer arithmetic
    for exact parity."""
    nt = D.n_tokens_expr(dialect, text)
    nu = D.n_unique_tokens_expr(dialect, text)
    sw = _stopword_count(dialect, STOPWORDS["en"], text)
    len_score = (f"(CASE WHEN {n_chars} BETWEEN 200 AND 400 THEN 40 "
                 f"WHEN {n_chars} BETWEEN 100 AND 600 THEN 20 ELSE 0 END)")
    div_score = f"cast(floor(cast({nu} as double) * 40.0 / {nt}) as int)"
    sw_score = f"(CASE WHEN {sw} > 0 THEN 20 ELSE 0 END)"
    return {
        "len_score": f"cast({len_score} as int)",
        "div_score": div_score,
        "sw_score": f"cast({sw_score} as int)",
        "quality": f"cast({len_score} + {div_score} + {sw_score} as int)",
    }


def gopher_exprs(dialect: str, text: str = "text",
                 n_chars: str = "n_chars") -> dict[str, str]:
    """Gopher-rules-style document filters (public heuristics family:
    word-count band, mean-word-length band, symbol-ratio cap), exact
    integer arithmetic for cross-engine parity. Columns:
    mean_tok_len_x100, n_symbols, gopher_ok."""
    toks = D.tokens_expr(dialect, text)
    nt = D.n_tokens_expr(dialect, text)
    if dialect == D.SPARK:
        sumlen = (f"aggregate(transform({toks}, t -> length(t)), 0, "
                  f"(a, x) -> a + x)")
    else:
        sumlen = f"list_sum(list_transform({toks}, t -> length(t)))"
    mean_len = f"cast(floor({sumlen} * 100 / {nt}) as bigint)"
    if dialect == D.SPARK:
        syms = f"length(regexp_replace({text}, '[a-z0-9 ]', ''))"
    else:
        # DuckDB regexp_replace is first-match-only without the 'g' flag
        syms = f"length(regexp_replace({text}, '[a-z0-9 ]', '', 'g'))"
    ok = (f"({nt} >= 5 AND {nt} <= 100000"
          f" AND {mean_len} >= 300 AND {mean_len} < 450"
          f" AND {syms} * 10 <= {n_chars})")
    return {
        "mean_tok_len_x100": mean_len,
        "n_symbols": f"cast({syms} as bigint)",
        "gopher_ok": ok,
    }


def with_gopher(df: DataFrame, text: str = "text",
                n_chars: str = "n_chars") -> DataFrame:
    out = df
    for name, expr in gopher_exprs(D.SPARK, text, n_chars).items():
        out = out.withColumn(name, F.expr(expr))
    return out


def langid_expr(dialect: str, text: str = "text") -> str:
    """Predicted language = argmax of stopword-profile hits, ties broken
    by LANG_ORDER. Rendered as a deterministic CASE chain (strictly-greater
    comparison against earlier languages = first-max-wins)."""
    scores = {lang: _stopword_count(dialect, STOPWORDS[lang], text)
              for lang in LANG_ORDER}
    # first-max-wins: lang_i is chosen iff its score beats every earlier
    # language strictly and every later language non-strictly
    cases = []
    for i, lang in enumerate(LANG_ORDER):
        conds = []
        for j, other in enumerate(LANG_ORDER):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"({scores[lang]}) {op} ({scores[other]})")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"(CASE {' '.join(cases)} ELSE '{LANG_ORDER[0]}' END)"


def _lang_bigram_profiles() -> dict[str, list[str]]:
    """Deterministic char-bigram profile per language, derived from the
    stopword lists (public-knowledge n-gram language-ID heuristic)."""
    profiles = {}
    for lang, words in STOPWORDS.items():
        bigrams = sorted({w[i:i + 2] for w in words for i in range(len(w) - 1)})
        profiles[lang] = bigrams
    return profiles


def langid_ngram_expr(dialect: str, text: str = "text") -> str:
    """Character-n-gram language-ID: score = number of text bigram
    positions found in the language's profile; argmax with first-max-wins
    (same tie rule as the stopword variant). Dual-dialect."""
    profiles = _lang_bigram_profiles()

    def score(lang: str) -> str:
        lst = ", ".join(f"'{b}'" for b in profiles[lang])
        if dialect == D.SPARK:
            grams = f"transform(sequence(1, greatest(length({text}) - 1, 1)), i -> substr({text}, i, 2))"
            return f"size(filter({grams}, b -> b IN ({lst})))"
        grams = f"list_transform(range(1, greatest(length({text}), 2)), i -> substr({text}, i, 2))"
        return f"len(list_filter({grams}, b -> b IN ({lst})))"

    scores = {lang: score(lang) for lang in LANG_ORDER}
    cases = []
    for i, lang in enumerate(LANG_ORDER):
        conds = []
        for j, other in enumerate(LANG_ORDER):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"({scores[lang]}) {op} ({scores[other]})")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"(CASE {' '.join(cases)} ELSE '{LANG_ORDER[0]}' END)"


def with_langid_ngram(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("lang_pred_ngram", F.expr(langid_ngram_expr(D.SPARK, text)))


def fingerprint_sql(dialect: str, table: str = "cells",
                    id_col: str = "doc_id", text: str = "text") -> str:
    """Rolling-hash document fingerprint:
    fp = sum over token positions of (hash32(token) * 31^(pos % 8)) mod M31,
    all exact integer arithmetic. Dialect-specific only in the
    explode-with-position idiom."""
    powers = ", ".join(str(p) for p in FP_BASE_POWERS)
    h = D.hex8_i64("tok", 1, dialect)
    if dialect == D.SPARK:
        exploded = (f"SELECT {id_col}, pos, tok FROM {table} "
                    f"LATERAL VIEW posexplode({D.tokens_expr(dialect, text)}) t AS pos, tok")
        powexp = f"element_at(array({powers}), cast(pos % 8 + 1 as int))"
    else:
        exploded = (f"SELECT {id_col}, "
                    f"generate_subscripts({D.tokens_expr(dialect, text)}, 1) - 1 AS pos, "
                    f"unnest({D.tokens_expr(dialect, text)}) AS tok FROM {table}")
        powexp = f"([{powers}])[cast(pos % 8 + 1 as int)]"
    return (f"SELECT {id_col}, CAST(sum(({h} % {MERSENNE31}) * {powexp} "
            f"% {MERSENNE31}) % {MERSENNE31} AS BIGINT) AS fingerprint "
            f"FROM ({exploded}) GROUP BY {id_col}")


def with_token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    out = df
    for name, expr in token_stats_exprs(D.SPARK, text).items():
        out = out.withColumn(name, F.expr(expr))
    return out


def with_quality(df: DataFrame, text: str = "text", n_chars: str = "n_chars") -> DataFrame:
    out = df
    for name, expr in quality_exprs(D.SPARK, text, n_chars).items():
        out = out.withColumn(name, F.expr(expr))
    return out


def with_langid(df: DataFrame, text: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", F.expr(langid_expr(D.SPARK, text)))
