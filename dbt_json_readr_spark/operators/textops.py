"""Text-analysis operators for corpus curation (SURVEY.md §2 C8-C11):
language-ID, quality scoring, token counting, winnowing fingerprints.
All pure column expressions — one scan, no shuffle, no Python row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H

# Fixed stopword profiles (the n-gram-free heuristic: score = stopword
# hits per language; deterministic argmax with a fixed priority order).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "que"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}

BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _hits(toks: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = H.tokens(text)
    return {lang: _hits(toks, words) for lang, words in LANG_PROFILES.items()}


def predict_lang(text: Column) -> tuple[Column, Column]:
    """(predicted_lang, score): argmax of stopword hits, ties resolved by
    the fixed profile order."""
    scores = lang_scores(text)
    langs = list(LANG_PROFILES)
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        gt = scores[lang] > best_score
        best_lang = F.when(gt, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(gt, scores[lang]).otherwise(best_score)
    return best_lang, best_score


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality heuristics (Gopher/C4-style cheap filters):
    everything integer-derived so engines agree bitwise."""
    toks = H.tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(text, F.lit("[^a-zA-Z0-9\\s]"), 0))
    n_digit = F.size(F.regexp_extract_all(text, F.lit("[0-9]"), 0))
    n_stop = _hits(toks, LANG_PROFILES["en"])
    mean_word_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens
    return {
        "n_chars": n_chars.cast("int"),
        "n_tokens": n_tokens.cast("int"),
        "punct_ratio": n_punct.cast("double") / n_chars,
        "digit_ratio": n_digit.cast("double") / n_chars,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "mean_word_len": mean_word_len,
    }


def quality_score(feats: dict[str, Column]) -> Column:
    """Linear combination in a fixed evaluation order (no reassociation
    across engines)."""
    return (
        (F.lit(1.0) - feats["punct_ratio"]) * 0.25
        + (F.lit(1.0) - feats["digit_ratio"]) * 0.25
        + feats["stopword_ratio"] * 0.25
        + F.when(
            (feats["mean_word_len"] >= 3.0) & (feats["mean_word_len"] <= 10.0), 0.25
        ).otherwise(0.0)
    )


def token_counts(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        "n_ws_tokens": F.size(H.tokens(text)).cast("int"),
        "n_bpe_tokens": F.size(F.regexp_extract_all(low, F.lit(BPE_ISH_PATTERN), 0)).cast("int"),
        "n_chars": F.length(text).cast("int"),
    }


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram rolling hashes,
    min per sliding window of w, distinct minima = document fingerprint
    set."""
    grams = H.char_shingles_ordered(text, k)
    hs = F.transform(grams, lambda g: H.hash64(g, "fp"))
    n_windows = F.greatest(F.size(hs) - w + 1, F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(hs, i, w)),
    )
    return F.array_distinct(mins)


# ----------------------------------------------------------- PII scrub

# dialect-portable patterns (identical semantics in Java regex & RE2)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9 ()-]{6,}[0-9]"


def pii_features(text: Column) -> dict[str, Column]:
    """Counts + redacted form for the two high-volume PII shapes a
    training-data pipeline scrubs first.  Emails redact before phones so
    digit runs inside addresses can't double-match."""
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).cast("int"),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).cast("int"),
        "redacted": redacted,
    }


# --------------------------------------------------- DuckDB SQL twins


def sql_hits(toks_expr: str, words: list[str]) -> str:
    arr = "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + "]"
    return f"len(list_filter({toks_expr}, t -> list_contains({arr}, t)))"


def sql_predict_lang(toks_expr: str) -> tuple[str, str]:
    langs = list(LANG_PROFILES)
    score = {lang: sql_hits(toks_expr, LANG_PROFILES[lang]) for lang in langs}
    lang_expr = f"'{langs[0]}'"
    score_expr = score[langs[0]]
    for lang in langs[1:]:
        lang_expr = f"(CASE WHEN {score[lang]} > {score_expr} THEN '{lang}' ELSE {lang_expr} END)"
        score_expr = f"(CASE WHEN {score[lang]} > {score_expr} THEN {score[lang]} ELSE {score_expr} END)"
    return lang_expr, score_expr


def sql_winnow_fingerprints(text_expr: str, k: int = 8, w: int = 4) -> str:
    grams = (
        f"CASE WHEN len({text_expr}) < {k} THEN [{text_expr}] "
        f"ELSE list_transform(range(1, len({text_expr})-{k}+2), i -> substr({text_expr}, i, {k})) END"
    )
    hs = f"list_transform({grams}, g -> {H.sql_hash64('g', 'fp')})"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({hs}) - {w} + 1, 1) + 1), "
        f"i -> list_min(list_slice({hs}, i, i + {w} - 1))))"
    )
