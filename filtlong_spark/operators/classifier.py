"""Model-based quality classifier — the fastText / DCLM-classifier slot.

Production web pipelines (CCNet, DCLM, FineWeb-Edu) gate documents with a
TRAINED quality model, not only hand rules: a linear classifier over
cheap per-doc features, trained OFFLINE on a labeled sample, whose
coefficients then ship to the cluster as literals. This module renders
that shape exactly:

- ``classifier_features``: one explode + hash aggregate (the shared
  ``textstats.token_stats`` pass) + two map-side columns -> five
  per-doc features. Zero-token / zero-char docs get concrete 0.0
  features (every doc is scored — a classifier gate must not silently
  drop rows the way an inner join would).
- ``fit_weights``: the offline training step — closed-form least
  squares on a driver-side labeled sample (numpy lstsq; deterministic,
  no RNG), the same sample-to-driver posture as IVF's k-means training
  in operators/similarity.py. At production scale the sample is a few
  thousand labeled docs; the corpus never leaves the cluster.
- ``quality_classifier``: broadcast-free map-only scoring — the
  weights are plain Python floats folded into the plan as literals, so
  the score is a single codegen'd expression. The linear LOGIT is
  emitted (not a sigmoid): monotone in the probability, and bit-exact
  across engines (each feature is one guarded divide; the combination
  is a fixed left-associative multiply-add chain mirrored term-for-term
  by the DuckDB oracle).

Swap-in point: replace DEFAULT_WEIGHTS with coefficients from a real
fastText / logistic-regression fit; the plumbing (feature pass, literal
fold, keep threshold) is unchanged. Analog of the reference's composite
final-score gate (src/read.cpp:246-253) with learned instead of fixed
weights.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import textstats as ts

# feature order is the contract between fit_weights and the scorer
FEATURES = ("mean_word_len", "stopword_frac", "vocab_frac",
            "symbol_ratio", "dup_frac")

# checked-in stand-in coefficients (documented swap-in for a trained
# model): reward in-vocabulary and stopword-bearing prose, punish
# symbol soup and repetition; bias places the decision boundary so
# clean fixture prose lands positive.
DEFAULT_WEIGHTS = {
    "bias": -3.0,
    "mean_word_len": 0.25,
    "stopword_frac": 2.0,
    "vocab_frac": 4.0,
    "symbol_ratio": -5.0,
    "dup_frac": -2.0,
}


def _ratio(num: Column, den: Column) -> Column:
    """Guarded single divide: 0.0 when the denominator is 0 — concrete
    in BOTH engines (Spark would yield NULL, DuckDB NaN)."""
    return (F.when(den > 0, num.cast("double") / den)
            .otherwise(F.lit(0.0)))


def classifier_features(docs: DataFrame, vocab,
                        key: str = "doc_id") -> DataFrame:
    """(key, mean_word_len, stopword_frac, vocab_frac, symbol_ratio,
    dup_frac) for EVERY input doc — left join + guarded divides, so
    token-less docs score rather than vanish."""
    st = ts.token_stats(docs, vocab, key)
    base = docs.select(key, F.length("text").alias("n_chars"),
                       ts.symbol_count_col().alias("symbols"))
    j = base.join(st, key, "left").na.fill(
        {"n_tokens": 0, "good_tokens": 0, "sum_token_len": 0,
         "stop_count": 0, "n_distinct": 0})
    n = F.col("n_tokens")
    return j.select(
        key,
        _ratio(F.col("sum_token_len"), n).alias("mean_word_len"),
        _ratio(F.col("stop_count"), n).alias("stopword_frac"),
        _ratio(F.col("good_tokens"), n).alias("vocab_frac"),
        _ratio(F.col("symbols"), F.col("n_chars")).alias("symbol_ratio"),
        F.when(n > 0, 1.0 - F.col("n_distinct").cast("double") / n)
        .otherwise(F.lit(0.0)).alias("dup_frac"))


def classifier_features_arrow(docs: DataFrame, vocab,
                              key: str = "doc_id") -> DataFrame:
    """The SAME five features as classifier_features, computed in one
    Arrow-batched map-only pass (no aggregate, no join) — the
    streaming-safe rendering: Structured Streaming append mode cannot
    run classifier_features' groupBy + self-join, but a stateless
    mapInPandas streams unchanged. Semantics are kept identical
    (\\S+ tokens, same stopword/vocab/symbol definitions, guarded
    ratios) and pytest-asserted equal to the aggregate path."""
    import re
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    vocab_set = frozenset(vocab)
    stop_set = frozenset(ts.STOPWORDS)
    # re.ASCII: Python's default \s is UNICODE (NBSP, ideographic space,
    # line separator...), but Spark's Java regex and DuckDB's RE2 both
    # treat \s as ASCII-only — without the flag this path would tokenize
    # U+00A0-bearing text differently from the agg path it must mirror
    tok_re = re.compile(r"\S+", re.ASCII)
    sym_re = re.compile(r"[A-Za-z0-9 ]")

    def mapper(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for k, text in zip(pdf[key], pdf["text"]):
                t = text if isinstance(text, str) else ""
                toks = tok_re.findall(t)
                n = len(toks)
                n_chars = len(t)
                if n:
                    mwl = sum(len(x) for x in toks) / n
                    stop = sum(x in stop_set for x in toks) / n
                    voc = sum(x in vocab_set for x in toks) / n
                    dup = 1.0 - len(set(toks)) / n
                else:
                    mwl = stop = voc = dup = 0.0
                sym = (len(sym_re.sub("", t)) / n_chars) if n_chars else 0.0
                rows.append((k, mwl, stop, voc, sym, dup))
            yield pd.DataFrame(rows, columns=[key, *FEATURES])

    key_type = dict(docs.dtypes)[key]
    schema = f"{key} {key_type}, " + ", ".join(
        f"{f} double" for f in FEATURES)
    return docs.select(key, "text").mapInPandas(mapper, schema=schema)


def quality_classifier(docs: DataFrame, vocab,
                       weights: dict | None = None,
                       threshold: float = 0.0,
                       key: str = "doc_id",
                       engine: str = "agg") -> DataFrame:
    """Score every doc with the linear model and decide keep.
    Returns (key, <features>, clf_score, keep). The logit is built as
    bias + w1*f1 + w2*f2 + ... in FEATURES order — the oracle SQL
    repeats the identical chain, so doubles match bit-for-bit.
    ``engine``: 'agg' (codegen explode + hash aggregate — the batch
    default) or 'arrow' (map-only stateless pass — required under
    Structured Streaming, same semantics)."""
    w = dict(DEFAULT_WEIGHTS if weights is None else weights)
    if engine == "agg":
        feats = classifier_features(docs, vocab, key)
    elif engine == "arrow":
        feats = classifier_features_arrow(docs, vocab, key)
    else:
        raise ValueError(f"unknown engine {engine!r}")
    logit = F.lit(float(w["bias"]))
    for f in FEATURES:
        logit = logit + F.lit(float(w[f])) * F.col(f)
    return (feats
            .withColumn("clf_score", logit)
            .withColumn("keep", F.col("clf_score") >= F.lit(threshold)))


def weights_from_tuple(t) -> dict:
    """(bias, w_mean_word_len, ..., w_dup_frac) in FEATURES order — the
    flat form FilterConfig.clf_weights carries — back to a dict."""
    vals = tuple(float(x) for x in t)
    if len(vals) != len(FEATURES) + 1:
        raise ValueError(f"need {len(FEATURES) + 1} weights, got {len(vals)}")
    out = {"bias": vals[0]}
    out.update(dict(zip(FEATURES, vals[1:])))
    return out


def fit_weights(features_rows, labels) -> dict:
    """OFFLINE training: least-squares fit of the linear model on a
    labeled sample (rows: sequences in FEATURES order; labels: 1.0 keep
    / 0.0 drop, shifted to +-1 targets). Deterministic (numpy lstsq, no
    RNG). Returns a weights dict consumable by quality_classifier."""
    import numpy as np
    X = np.asarray(features_rows, dtype=np.float64)
    y = np.asarray(labels, dtype=np.float64) * 2.0 - 1.0
    Xb = np.hstack([np.ones((X.shape[0], 1)), X])
    coef, *_ = np.linalg.lstsq(Xb, y, rcond=None)
    out = {"bias": float(coef[0])}
    out.update({f: float(c) for f, c in zip(FEATURES, coef[1:])})
    return out
