"""Text analysis over the documents table — language-ID heuristic,
quality scoring, token counting, rolling-hash fingerprints.

All JVM-side column expressions (split/regexp/aggregate) — these run
per document at corpus scale inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "y"],
}


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda x: x != "")


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len)."""
    toks = _tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, alpha_ratio, ws_ratio, quality) — simple layout/char
    heuristics: fraction of alphanumeric chars, whitespace density, and
    a combined score in [0,1]. Deterministic closed form, so it has an
    exact SQL oracle."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1))
    alpha = F.length(F.regexp_replace(t, r"[^a-zA-Z0-9]", ""))
    ws = F.length(F.regexp_replace(t, r"[^ ]", ""))
    alpha_ratio = F.round(alpha / n, 6)
    ws_ratio = F.round(ws / n, 6)
    quality = F.round(
        F.least(
            F.lit(1.0),
            alpha / n
            + F.when((F.length(t) >= 100) & (F.length(t) <= 5000), 0.1).otherwise(0.0),
        ),
        6,
    )
    return docs.select(
        "doc_id",
        alpha_ratio.alias("alpha_ratio"),
        ws_ratio.alias("ws_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — stopword-hit heuristic: the language whose
    stopword list scores the most token hits; ties and zero-hit
    documents → 'unk'. (On synthetic word-salad corpora this mostly
    yields 'unk'/'en'; the operator contract is determinism, and real
    text is the target.)"""
    toks = _tokens(F.col(text_col))
    score_cols = []
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
        score_cols.append(score.alias(f"s_{lang}"))
    scored = docs.select("doc_id", *score_cols)
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"s_{la}") for la in langs])
    pred = F.lit("unk")
    # first language (in fixed order) achieving the max, if max > 0
    for la in reversed(langs):
        pred = F.when((F.col(f"s_{la}") == best) & (best > 0), F.lit(la)).otherwise(pred)
    return scored.select("doc_id", pred.alias("pred_lang"))


def rolling_fingerprint(docs: DataFrame, text_col: str = "text", window: int = 16) -> DataFrame:
    """(doc_id, fp) — polynomial rolling hash of the token stream
    sampled every `window` tokens, combined with md5: a cheap document
    fingerprint robust to small local edits at the sampling boundary."""
    toks = _tokens(F.col(text_col))
    sampled = F.transform(
        F.sequence(F.lit(0), F.greatest((F.size(toks) - 1) / window, F.lit(0)).cast("int")),
        lambda i: F.element_at(toks, (i * window + 1).cast("int")),
    )
    return docs.select(
        "doc_id", F.md5(F.array_join(sampled, "")).alias("fp")
    )
