"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All hot-path expressions are JVM built-ins
(codegen'd); the winnowing fingerprint is the one pandas stage (rolling
hash is inherently sequential per doc, batched via Arrow)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PUNCT_CLASS = "[.,;:!?]"

STOPWORDS = [
    "the", "a", "of", "and", "in", "to", "is", "on", "for", "with",
]

# language marker words, disjoint across languages (heuristic n-gram/stopword ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "with"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "les", "une", "et"],
    "es": ["el", "los", "una", "y"],
}
_LANG_ORDER = ["en", "de", "fr", "es"]


def _tokens(text_col: str):
    return F.split(F.lower(F.col(text_col)), " ")


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, punct_ratio, stopword_ratio, quality)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    punct_ratio = F.round(n_punct / n_chars, 6)
    stop_ratio = F.round(stop_hits / n_tokens, 6)
    # quality: long-enough docs with natural stopword density, low punct noise
    quality = F.round(
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * (F.lit(0.5) + stop_ratio)
        - punct_ratio,
        6,
    )
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language guess; deterministic precedence en>de>fr>es>und."""
    toks = _tokens(text_col)
    counts = {
        lang: F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))
        for lang in _LANG_ORDER
    }
    guess = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(_LANG_ORDER):
        others = [counts[o] for o in _LANG_ORDER if o != lang]
        cond = (counts[lang] > 0) & (counts[lang] >= F.greatest(*others))
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return df.select(id_col, guess.alias("lang_guess"))


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint: md5 over lower+punct-strip+ws-collapse."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), PUNCT_CLASS, ""), " +", " "
        )
    )
    return df.select(id_col, F.md5(norm).alias("fingerprint"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer et al. MOSS): k-gram rolling hashes, min per
    sliding window -> sparse fingerprint set per doc. Pandas/Arrow batched;
    output exploded (id, pos, fp) for downstream overlap joins."""
    schema = f"{id_col} long, pos int, fp long"
    B, MOD = 1_000_003, (1 << 61) - 1

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_pos, out_fp = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = str(text).lower()
                n = len(s)
                if n < k:
                    continue
                # rolling polynomial hash over k-grams
                h = 0
                top = pow(B, k - 1, MOD)
                hashes = []
                for i, ch in enumerate(s):
                    h = (h * B + ord(ch)) % MOD
                    if i >= k - 1:
                        hashes.append(h)
                        h = (h - ord(s[i - k + 1]) * top) % MOD
                prev = -1
                for w in range(max(1, len(hashes) - window + 1)):
                    win = hashes[w : w + window]
                    m = min(win)
                    pos = w + win.index(m)
                    if pos != prev:
                        out_id.append(did)
                        out_pos.append(pos)
                        out_fp.append(m)
                        prev = pos
            yield pd.DataFrame({id_col: out_id, "pos": out_pos, "fp": out_fp})

    return df.select(id_col, text_col).mapInPandas(run, schema)
