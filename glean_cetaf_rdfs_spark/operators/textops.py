"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in-function expressions (JVM codegen)
except the rolling-hash winnowing fingerprint, which is the designated
Arrow-batched pandas stage.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic —
# deterministic data, good enough to discriminate synthetic fixtures
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "una", "y"],
}


def tokens(text_col) -> Column:
    return F.filter(F.split(text_col, " "), lambda w: w != "")


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (ceil(chars/4) — the standard chars-per-token heuristic)."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast("int").alias("n_subwords_est"),
    )


def corpus_stats(df: DataFrame, id_col: str, text_col: str,
                 exact: bool = True,
                 approx_accuracy: int = 10000) -> DataFrame:
    """Per predicted language: doc count, mean token count, p50/p90
    token counts — the corpus profile curation decisions read.

    ``exact=True`` uses ``F.percentile`` (exact interpolation — DuckDB
    ``quantile_cont`` matches bit-for-bit, so q43 carries a full
    oracle). ``exact=False`` is the 100 TB path: ``approx_percentile``
    (Greenwald-Khanna sketch; mergeable partials, bounded memory per
    group) — exact percentiles materialize every group's values at one
    reducer, which is the straggler/OOM shape on a trillion-row corpus.
    One scan + one shuffle either way."""
    toks = token_count(df, id_col, text_col).select("id", "n_tokens")
    lang = lang_id(df, id_col, text_col)
    if exact:
        p50 = F.percentile("n_tokens", F.lit(0.5))
        p90 = F.percentile("n_tokens", F.lit(0.9))
    else:
        p50 = F.approx_percentile("n_tokens", F.lit(0.5),
                                  F.lit(approx_accuracy))
        p90 = F.approx_percentile("n_tokens", F.lit(0.9),
                                  F.lit(approx_accuracy))
    return (toks.join(lang, "id")
            .groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
                 F.round(p50.cast("double"), 4).alias("p50_tokens"),
                 F.round(p90.cast("double"), 4).alias("p90_tokens"))
            .orderBy("lang_pred"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features and a
    composite score — the standard cheap pre-training quality gate."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop = F.size(F.filter(toks, lambda w: w.isin(*LANG_PROFILES["en"])))
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
        F.round(n_chars / F.greatest(n_tok, F.lit(1)), 4).alias("avg_token_len"),
        F.round(stop / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
    )


def quality_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Integer-exact quality features: token / char / punctuation COUNTS
    (no ratios, no doubles). The aggregation-safe companion to
    :func:`quality_score` — ratios of summed integers are bit-identical
    across engines and partition orders, whereas summing per-doc rounded
    doubles is partition-order-dependent (the round-3 q44 oracle flake).
    → (id, n_tokens, n_chars, n_punct)."""
    toks = tokens(F.col(text_col))
    n_chars = F.length(text_col)
    punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        punct.cast("long").alias("n_punct"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: per language, count profile-word hits
    among tokens; argmax wins (deterministic tiebreak by language code);
    no hits → 'und'. → (id, lang_pred)."""
    toks = tokens(F.col(text_col))

    def score(words: list[str]):
        # factory closure — a default-arg lambda would change the
        # higher-order function's arity for PySpark
        return F.size(F.filter(toks, lambda w: w.isin(*words)))

    scores = [score(words).alias(f"s_{lang}")
              for lang, words in sorted(LANG_PROFILES.items())]
    scored = df.select(F.col(id_col).alias("id"), *scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_PROFILES)])
    pred = F.lit("und")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), lang).otherwise(pred)
    return scored.select("id", pred.alias("lang_pred"))


def md5_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized content fingerprint: lowercase, strip non-alnum/space,
    collapse whitespace, md5. → (id, fp)."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9 ]", ""),
        r" +", " ")
    return df.select(F.col(id_col).alias("id"), F.md5(F.trim(norm)).alias("fp"))


# --- greedy-BPE subword token counting (pandas/Arrow stage) ----------------

# Frozen subword vocabulary fixture (BPE-merge products over the fixture
# corpus's character distribution, hand-frozen). Order is irrelevant —
# the encoder resolves longest-match-first; any character outside the
# vocab falls back to a single-char token, so every text tokenizes.
BPE_VOCAB: list[str] = [
    "table", "stream", "spark", "query", "value", "customer", "window",
    "merge", "batch", "filter", "column", "vector", "order", "group",
    "join", "scan", "sort", "hash", "line", "data", "part", "row",
    "key", "agg", "the", "th", "er", "an", "st", "qu", "ing", "on",
    "re", "ar", "al", " ",
]


def bpe_pattern(vocab: list[str] | None = None) -> str:
    """Regex encoding greedy longest-match tokenization: alternation
    sorted longest-first (Python/Java regex alternation is
    leftmost-FIRST, so longest-first ordering makes each match the
    longest vocab piece at the cursor — exactly the greedy subword
    scan), with a single-char fallback. Counting non-overlapping
    matches IS the token count, at C speed — no per-character Python
    loop."""
    import re

    pieces = sorted((vocab or BPE_VOCAB), key=len, reverse=True)
    return "|".join(re.escape(p) for p in pieces) + "|[\\s\\S]"


def bpe_count_py(text: str, vocab: list[str] | None = None) -> int:
    """Pure-Python reference encoder (drives the frozen q49 oracle and
    the drift guard)."""
    import re

    return len(re.findall(bpe_pattern(vocab), text or ""))


def bpe_token_count(df: DataFrame, id_col: str, text_col: str,
                    vocab: list[str] | None = None) -> DataFrame:
    """Tokenizer-real subword counts: greedy longest-match against a
    shared vocabulary, replacing :func:`token_count`'s chars/4 estimate
    for token-budget queries. → (id, n_bpe_tokens).

    The compiled pattern ships to executors once per task via the
    closure (the vocab is KBs; a production-sized 50k-merge vocab would
    ride ``sparkContext.broadcast`` instead — same contract). Counting
    runs inside the existing Arrow batch stage via the pandas
    vectorized ``str.count``."""
    pat = bpe_pattern(vocab)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_col],
                "n_bpe_tokens": pdf[text_col].fillna("").str.count(pat)
                .astype("int64"),
            })

    return (df.select(id_col, text_col)
            .mapInPandas(run, schema="id long, n_bpe_tokens long"))


def learn_bpe_merges_py(texts: list[str], n_merges: int = 16,
                        min_count: int = 2) -> list[str]:
    """Classic BPE merge learning (Sennrich et al., ACL'16) over word
    character sequences: repeatedly merge the most frequent adjacent
    symbol pair (deterministic tiebreak by the pair itself), stop when
    no pair reaches ``min_count``. Returns the merged PIECES (vocab
    entries for :func:`bpe_pattern`), most-frequent merge first. Pure
    function — drives the learner below and its tests."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in (t or "").split():
            if w:
                words[tuple(w)] += 1
    merges: list[str] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        (a, b), best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best < min_count:
            break
        merges.append(a + b)
        merged = Counter()
        for sym, cnt in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] += cnt
        words = merged
    return merges


def learn_bpe_merges(df: DataFrame, id_col: str, text_col: str,
                     n_merges: int = 16, sample: int = 512,
                     min_count: int = 2) -> list[str]:
    """Corpus-learned subword vocabulary: BPE merges trained on a
    DETERMINISTIC driver-side sample and applied distributed — the
    sample-train/distributed-apply split the IVF index already uses
    (similarity.py trains centroids on a collected sample for the same
    reason): merge learning is inherently sequential (each round's
    counts depend on the previous merge), so iterating it as ``sample``
    Spark rounds would be ``n_merges`` full-corpus passes for a
    vocabulary that converges on kilobytes of text. The sample is the
    ``sample`` texts with the smallest md5(id) — engine- and
    partition-order-independent, no rand() seed drift.

    Feed the result (plus any base alphabet) to :func:`bpe_pattern` /
    :func:`bpe_token_count` for the distributed encoding pass. At 100
    TB the sample clause is unchanged: TABLESAMPLE-like pushdown is
    unnecessary because the md5 ranking prunes to ``sample`` rows in
    one TakeOrdered."""
    from .similarity import _check_sample_n

    _check_sample_n("learn_bpe_merges", sample)
    rows = (df.select(F.col(text_col).alias("t"),
                      F.md5(F.col(id_col).cast("string")).alias("_r"))
            .orderBy("_r").limit(sample).collect())
    return learn_bpe_merges_py([r["t"] for r in rows],
                               n_merges=n_merges, min_count=min_count)


# --- rolling-hash winnowing fingerprint (pandas/Arrow stage) ---------------

_B, _WIN, _GRAM = 257, 8, 16


def winnow_py(text: str) -> list[int]:
    """Karp-Rabin hash over char 16-grams + winnowing (window minimum) —
    the classic document-fingerprint scheme (Schleimer et al.,
    SIGMOD'03). Pure function; used by the UDF and the tests.

    Vectorized: per-gram hashes are one numpy sliding-window dot product
    in natural uint64 wrap arithmetic (mod 2^64 — engine-internal
    scheme), window minima one sliding-window ``min`` — the per-character
    Python loop was the single slow Python hot path in round 1. Values
    are returned as the two's-complement int64 view so they fit Spark's
    ``long`` column."""
    import numpy as np

    n = len(text)
    if n < _GRAM:
        return []
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    powers = np.array([pow(_B, _GRAM - 1 - j, 1 << 64) for j in range(_GRAM)],
                      dtype=np.uint64)
    grams = np.lib.stride_tricks.sliding_window_view(codes, _GRAM)
    hashes = (grams * powers).sum(axis=1, dtype=np.uint64)
    if len(hashes) >= _WIN:
        mins = np.lib.stride_tricks.sliding_window_view(hashes, _WIN).min(axis=1)
    else:
        mins = hashes.min(keepdims=True)
    keep = np.ones(len(mins), dtype=bool)
    keep[1:] = mins[1:] != mins[:-1]  # drop consecutive repeats
    return mins[keep].view(np.int64).tolist()


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (id, fps array<long>) via mapInPandas (Arrow batches)."""
    cols = [id_col, text_col]

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_col],
                "fps": pdf[text_col].map(lambda t: winnow_py(t or "")),
            })

    return df.select(*cols).mapInPandas(run, schema="id long, fps array<long>")
