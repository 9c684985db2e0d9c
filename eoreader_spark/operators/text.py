"""Text-analysis operators for training-data pipelines — all pure JVM column
expressions (regexp / split / hashing built-ins, whole-stage codegen): no UDFs.

- token_count:    whitespace tokens + a BPE-ish subword estimate
- lang_id:        stopword-hit heuristic over a tiny per-language lexicon
- quality_score:  length / punctuation / stopword-ratio composite
- fingerprint:    order-sensitive rolling hash of normalized tokens
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "de", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}


def tokens(text: Column | str) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def subword_count(text: Column | str) -> Column:
    """BPE-ish proxy: ceil(chars/4) per token summed — a standard tokens-per-
    char heuristic, computed without any vocab."""
    return F.aggregate(
        tokens(text),
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int"),
    )


def _hit_count(text: Column | str, words: list[str]) -> Column:
    toks = tokens(F.lower(text))
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column | str) -> Column:
    """Language with the most stopword hits; ties broken by language code
    order (deterministic); no hits -> 'unk'."""
    scored = [(lang, _hit_count(text, ws)) for lang, ws in sorted(STOPWORDS.items())]
    best = None
    best_score = None
    for lang, score in scored:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("unk"))


def quality_score(text: Column | str) -> Column:
    """[0,1] composite: penalize very short docs, extreme punctuation ratio,
    and missing stopwords (the reference-style threshold/classify family,
    F8, applied to text)."""
    n = F.greatest(F.length(text), F.lit(1))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")) / n
    len_ok = F.least(F.length(text) / 200.0, F.lit(1.0))
    punct_ok = F.when(punct <= 0.1, 1.0).otherwise(F.greatest(F.lit(0.0), 1.0 - (punct - 0.1) * 5.0))
    all_stop = [w for ws in STOPWORDS.values() for w in ws]
    stop_ok = F.when(_hit_count(text, all_stop) > 0, 1.0).otherwise(0.5)
    return F.round((len_ok * 0.4 + punct_ok * 0.4 + stop_ok * 0.2), 6)


def fingerprint(text: Column | str, hash_algo: str = "xxhash64") -> Column:
    """Order-sensitive rolling document hash: h = (h*31 + hash(token)) mod M
    with M < 2^56 so the fold never overflows long (ANSI mode errors on
    wraparound; modular fold keeps identical semantics everywhere).

    hash_algo='xxhash64' is the fast JVM default; 'md5x15' keys each token on
    the first 15 hex digits of md5 — an algorithm every engine shares, so the
    whole fold replays in ANSI SQL (the minhash md5 bridge, same recipe):
    acc*31 < 2^61 and token hash < 2^60 keep every intermediate in long."""
    M = F.lit(72057594037927931).cast("long")  # 2^56 - 5
    if hash_algo == "md5x15":
        def th(t: Column) -> Column:
            return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    elif hash_algo == "xxhash64":
        th = F.xxhash64
    else:
        raise ValueError(f"unknown hash_algo {hash_algo!r}")
    return F.aggregate(
        tokens(F.lower(text)),
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(31).cast("long") + F.pmod(th(t), M), M),
    )


def analyze(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All analyzers in one projection (single pass over the text column)."""
    t = F.col(text_col)
    return docs.withColumns(
        {
            "n_tokens": token_count(t),
            "n_subwords": subword_count(t),
            "lang_pred": lang_id(t),
            "quality": quality_score(t),
            "fp": fingerprint(t),
        }
    )
