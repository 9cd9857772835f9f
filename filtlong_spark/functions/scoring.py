"""Arrow-vectorized scoring UDFs (the slow-path kernels, batched).

Per-token work never materializes as a Spark column (mirrors the reference
discarding the quality string after scoring, src/read.cpp:25-62): each
batch is tokenized, painted against the broadcast accepted set, and reduced
to per-doc metrics (+ child spans when scrubbing) inside one Arrow batch.

All math delegates to ``filtlong_spark.core`` so the pandas UDFs and the
pure-Python oracle are bit-identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import core
from ..config import FilterConfig


def _register_self_contained_pickling() -> None:
    """Ship the kernel code inside the UDF pickle itself.

    cloudpickle serializes functions from importable modules BY REFERENCE,
    so a Python worker that doesn't have this package on its sys.path
    (consumer ran without --py-files) dies with ModuleNotFoundError.
    Registering the kernel modules for by-value pickling makes every UDF
    self-contained — the deployment still works with --py-files, it just
    no longer requires it."""
    import sys
    try:
        from pyspark import cloudpickle
    except ImportError:  # fall back to standalone cloudpickle
        import cloudpickle  # type: ignore
    for mod in ("filtlong_spark.core", "filtlong_spark.functions.scoring",
                "filtlong_spark.operators.similarity",
                "filtlong_spark.operators.dedup",
                "filtlong_spark.functions.seqscore",
                "filtlong_spark.sources.fastx"):
        if mod in sys.modules:
            cloudpickle.register_pickle_by_value(sys.modules[mod])

SCORE_FIELDS = T.StructType([
    T.StructField("n_chars", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("mean_q", T.DoubleType()),
    T.StructField("window_q", T.DoubleType()),
    T.StructField("ratio", T.DoubleType()),
    T.StructField("child_spans", T.ArrayType(T.StructType([
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
    ]))),
    T.StructField("scrubbed", T.BooleanType()),
])


def _score_batch(texts: pd.Series, accepted: set[str], cfg_dict: dict) -> pd.DataFrame:
    window_size = cfg_dict["window_size"]
    trim = cfg_dict["trim"]
    split = cfg_dict["split"]
    want_spans = trim or split is not None
    out = {k: [] for k in ("n_chars", "n_tokens", "mean_q", "window_q",
                           "ratio", "child_spans", "scrubbed")}
    qfn = core.quality_for(accepted)
    for text in texts:
        text = text or ""
        toks = core.tokenize(text)
        q = qfn([t for t, _, _ in toks])
        mq = core.mean_quality(q)
        wq = core.window_quality(q, window_size)
        out["n_chars"].append(len(text))
        out["n_tokens"].append(len(toks))
        out["mean_q"].append(mq)
        out["window_q"].append(wq)
        out["ratio"].append(core.window_ratio(mq, wq))
        if want_spans:
            spans_q = [(s, e, float(q[i])) for i, (_, s, e) in enumerate(toks)]
            res = core.scrub_spans(text, spans_q, trim, split)
            out["child_spans"].append(
                [{"start": s, "end": e} for s, e in res.child_spans])
            out["scrubbed"].append(res.changed)
        else:
            out["child_spans"].append(None)
            out["scrubbed"].append(False)
    return pd.DataFrame(out)


def make_score_udf(accepted_bc, cfg: FilterConfig):
    """Scalar pandas UDF text -> struct of per-doc metrics.

    ``accepted_bc`` is a SparkContext broadcast of the accepted-token set —
    the web analog of the broadcast k-mer set probed per base
    (src/kmers.cpp:170-172): a broadcast semi-join at sub-row granularity,
    which is why it's a broadcast *variable*, not a df.join.
    """
    _register_self_contained_pickling()
    cfg_dict = {"window_size": cfg.window_size, "trim": cfg.trim,
                "split": cfg.split}

    @F.pandas_udf(SCORE_FIELDS)
    def score_udf(texts: pd.Series) -> pd.DataFrame:
        return _score_batch(texts, accepted_bc.value, cfg_dict)

    return score_udf


READS2_SCHEMA = ("url string, parent_url string, "
                 "n_chars long, n_tokens long, mean_q double, "
                 "window_q double, ratio double, "
                 "child_start int, child_end int, is_child boolean, "
                 "lang_pred string, lang_ok boolean")


def make_reads2_mapper(accepted_bc, cfg: FilterConfig):
    """One fused mapInPandas pass: score each doc, compute trim/split child
    spans, and emit either the scored parent or the fully re-scored
    children — mirroring the recursive Read constructor
    (src/read.cpp:25-143) where children are built and scored inline.

    Fusing scoring + scrub + child re-scoring into a single Python stage
    avoids the naive plan (UDF -> explode -> second UDF -> union of two
    Python branches): one narrow stage, no shuffle, one worker pass.

    The output carries METRICS ONLY — no text. Like the reference, which
    discards sequences after scoring and re-reads the input at output time
    (src/read.cpp:25-62, src/main.cpp:263-311), survivor text is
    reconstructed later by joining labels back to the source table and
    substring-ing child spans. That keeps the committed snapshot ~50x
    smaller and the text column moves through the cluster exactly once.
    """
    _register_self_contained_pickling()
    window_size = cfg.window_size
    trim, split = cfg.trim, cfg.split
    pii = cfg.pii_scrub
    scrub = trim or split is not None or pii
    langid = cfg.langid_enabled
    lang_expected = cfg.langid_expected

    def score_one(text):
        toks = core.tokenize(text)
        q = core.quality_for(accepted_bc.value)([t for t, _, _ in toks])
        mq = core.mean_quality(q)
        wq = core.window_quality(q, window_size)
        return toks, q, mq, wq

    COLS = ["url", "parent_url", "n_chars", "n_tokens", "mean_q",
            "window_q", "ratio", "child_start", "child_end", "is_child",
            "lang_pred", "lang_ok"]

    def mapper(batches):
        import pandas as pd  # noqa: F811 (worker-side)
        for pdf in batches:
            # row-major accumulation; only url+text cross the Arrow
            # boundary inward, metrics-only outward (no timestamps — pandas
            # timestamp conversion was a measured hotspot)
            rows = []
            for url, text in zip(pdf["url"], pdf["text"]):
                text = text or ""
                if langid:
                    pred, _conf = core.predict_lang(
                        [m.group(0) for m in core.TOKEN_RE.finditer(text)])
                    if lang_expected is not None and pred != lang_expected:
                        # gated out before scoring (A2 analog) — emitted
                        # with lang_ok=False so the pipeline can count and
                        # quarantine it; never enters normalization
                        rows.append((url, url, len(text), 0, 0.0, 0.0, 1.0,
                                     0, len(text), False, pred, False))
                        continue
                else:
                    pred = None
                toks, q, mq, wq = score_one(text)
                if scrub:
                    spans_q = [(s, e, float(q[i]))
                               for i, (_, s, e) in enumerate(toks)]
                    extra = core.pii_spans(text) if pii else None
                    res = core.scrub_spans(text, spans_q, trim, split, extra)
                    if res.changed:
                        for (s, e) in res.child_spans:
                            ctoks, cq, cmq, cwq = score_one(text[s:e])
                            rows.append((core.child_name(url, s, e), url,
                                         e - s, len(ctoks), cmq, cwq,
                                         core.window_ratio(cmq, cwq),
                                         s, e, True, pred, True))
                        continue
                rows.append((url, url, len(text), len(toks), mq, wq,
                             core.window_ratio(mq, wq),
                             0, len(text), False, pred, True))
            yield pd.DataFrame(rows, columns=COLS)

    return mapper, READS2_SCHEMA


def length_score_col(n_chars_col):
    """C5 as a pure Catalyst expression (whole-stage codegen)."""
    return 100.0 * n_chars_col / (n_chars_col + F.lit(core.HALF_LENGTH_SCORE))


def hard_pass_col(cfg: FilterConfig):
    """D1 hard thresholds on RAW metrics as Catalyst predicates
    (src/read.cpp:64-73)."""
    cond = F.lit(True)
    if cfg.min_length is not None:
        cond = cond & (F.col("n_chars") >= F.lit(cfg.min_length))
    if cfg.max_length is not None:
        cond = cond & (F.col("n_chars") <= F.lit(cfg.max_length))
    if cfg.min_mean_q is not None:
        cond = cond & (F.col("mean_q") >= F.lit(cfg.min_mean_q))
    if cfg.min_window_q is not None:
        cond = cond & (F.col("window_q") >= F.lit(cfg.min_window_q))
    return cond
