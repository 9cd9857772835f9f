"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: the full quality-filter pipeline on
  sf0.001, returning the kept documents.
- ``queries()``      — one entry per implemented operator (SURVEY.md §2 +
  the training-data extras); each callable is (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``   — exactly-mirroring DuckDB SQL for each query. All
  compared doubles are either exact integer ratios (identical bit-for-bit
  across engines) or explicitly rounded (cosine), so the driver's
  value-hash comparison is stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from filtlong_spark import FilterConfig
from filtlong_spark import fixtures as fx
from filtlong_spark.functions import textstats as ts
from filtlong_spark.operators import dedup as dedup_op
from filtlong_spark.operators import refset as refset_op
from filtlong_spark.operators import score as score_op
from filtlong_spark.operators import similarity as sim_op
from filtlong_spark.plans.pipeline import run_filter
from filtlong_spark.sources import tables

# ---------------------------------------------------------------------------
# shared constants (MUST stay in sync between the Spark exprs and the SQL)
# ---------------------------------------------------------------------------

VOCAB = sorted(fx.VOCAB)                       # the testdata "good" tokens
VOCAB_SQL = ", ".join(f"'{w}'" for w in VOCAB)
WINDOW = 50                                    # token window for window_q
MIN_LENGTH = 100
MAX_LENGTH = 10_000
MIN_MEAN_Q = 90.0
BUDGET_TARGET = 400_000                        # chars, for the budget query
SPLIT_THR = 30  # pipeline_labels scrub threshold (mirrored in its SQL)
TOKENS_SQL = r"regexp_extract_all(text, '\S+')"
DOCS = "documents"

_STOP_SQL = ", ".join(f"'{w}'" for w in ts.STOPWORDS)


def _docs(spark, sf_dir, spread=True):
    """``spread=False`` skips the unsplittable-input repartition guard
    (tables.spread) for queries whose plan is a single cheap map or
    aggregation — there the extra exchange costs more than the
    parallelism it buys (measured: dedup_exact 0.44 -> 0.98 s with the
    guard, events_rollup 0.55 -> 1.93 s)."""
    return tables.load(spark, sf_dir, "documents", spread=spread)


def _emb(spark, sf_dir):
    # spread=False: the ann_* plans filter probes straight off the scan
    # (PushedFilters) and their numpy passes are matmul-cheap — the
    # repartition guard only added an exchange and broke the pushdown
    # (measured: ann_lsh 1.3 -> 2.5 s, ann_ivf 1.4 -> 3.3 s with it).
    return tables.load(spark, sf_dir, "embeddings", spread=False)


# ---------------------------------------------------------------------------
# entry — flagship pipeline
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    pages = tables.documents_as_pages(spark, "/root/testdata/sf0.001")
    cfg = FilterConfig(min_length=MIN_LENGTH, keep_percent=90.0,
                       window_size=WINDOW, mode="intrinsic",
                       vocab=frozenset(VOCAB), budget_algorithm="approx")
    res = run_filter(spark, pages, cfg)
    return res.kept.select("url", "n_chars", "n_tokens", "mean_q",
                           "window_q", "final_score")


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def q_hard_rules(spark, sf_dir):
    """D1: hard thresholds on raw metrics (src/read.cpp:64-73). Token
    stats via explode + hash aggregate (codegen; no interpreted HOFs)."""
    d = _docs(spark, sf_dir)
    st = ts.token_stats(d, VOCAB)
    mean_q = 100.0 * F.col("good_tokens") / F.col("n_tokens")
    return (d.select("doc_id", "n_chars")
            .join(st.select("doc_id", "n_tokens", "good_tokens"), "doc_id")
            .withColumn("mean_q", mean_q)
            .withColumn("keep",
                        (F.col("n_chars") >= MIN_LENGTH)
                        & (F.col("n_chars") <= MAX_LENGTH)
                        & (F.col("mean_q") >= MIN_MEAN_Q))
            .orderBy("doc_id"))


def _scored(spark, sf_dir, with_spans=False):
    """Score the documents table with the real pipeline UDF."""
    # the scorer recomputes n_chars; drop the table's own copy
    d = _docs(spark, sf_dir).drop("n_chars")
    cfg = FilterConfig(min_length=1, window_size=WINDOW, mode="intrinsic",
                       vocab=frozenset(VOCAB),
                       split=3 if with_spans else None)
    bc = refset_op.build_broadcast(spark, cfg, None)
    return score_op.score_pandas(d, cfg, bc)


def q_window_quality(spark, sf_dir):
    """C3+C4: mean + sliding-min-window quality (src/read.cpp:208-236),
    via the production pandas-UDF scorer."""
    return (_scored(spark, sf_dir)
            .select("doc_id", "n_tokens", "mean_q", "window_q")
            .orderBy("doc_id"))


def q_length_score(spark, sf_dir):
    """C5: 100*n/(n+5000) (src/read.cpp:238-244)."""
    d = _docs(spark, sf_dir, spread=False)
    return (d.select("doc_id",
                     (100.0 * F.col("n_chars")
                      / (F.col("n_chars") + F.lit(5000.0)))
                     .alias("length_score"))
            .orderBy("doc_id"))


def q_normalize_scores(spark, sf_dir):
    """E1+E2: closed-form z-score scaling to 0..100 (src/main.cpp:169-212)."""
    s = _scored(spark, sf_dir)
    w = Window.partitionBy()
    out = s.select(
        "doc_id", "mean_q",
        (100.0 * (F.col("mean_q") - F.min("mean_q").over(w))
         / (F.max("mean_q").over(w) - F.min("mean_q").over(w)))
        .alias("mean_q_score"))
    return out.orderBy("doc_id")


def _final_scored(spark, sf_dir):
    s = _scored(spark, sf_dir)
    w = Window.partitionBy()
    mean_q_score = (100.0 * (F.col("mean_q") - F.min("mean_q").over(w))
                    / (F.max("mean_q").over(w) - F.min("mean_q").over(w)))
    length_s = 100.0 * F.col("n_chars") / (F.col("n_chars") + F.lit(5000.0))
    s = (s.withColumn("mean_q_score", mean_q_score)
         .withColumn("length_s", length_s)
         .withColumn("final_score",
                     F.sqrt(F.col("length_s") * F.col("mean_q_score"))
                     * (F.lit(1.0 - 1.0 / 3.0)
                        + F.col("ratio") * F.lit(1.0 / 3.0))))
    return s


def q_final_score(spark, sf_dir):
    """C6+E3: weighted geometric mean scaled by the window ratio
    (src/read.cpp:247-267, src/main.cpp:198-212)."""
    return (_final_scored(spark, sf_dir)
            .select("doc_id", "mean_q_score", "ratio", "final_score")
            .orderBy("doc_id"))


def q_keep_budget(spark, sf_dir):
    """F3+F4 exact: greedy score-desc prefix with cum-before-check
    (src/main.cpp:246-257); deterministic tiebreak doc_id asc."""
    s = _final_scored(spark, sf_dir)
    eligible = F.col("n_chars") >= MIN_LENGTH
    w = (Window.orderBy(F.desc("final_score"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(
        F.sum(F.when(eligible, F.col("n_chars"))).over(w), F.lit(0))
    return (s.withColumn("eligible", eligible)
            .withColumn("keep", eligible & (cum_before < BUDGET_TARGET))
            .select("doc_id", "n_chars", "final_score", "eligible", "keep")
            .orderBy("doc_id"))


def q_refset_build(spark, sf_dir):
    """B2+B3: exact count-thresholded accepted-token set
    (src/kmers.cpp:142-166 reborn as groupBy.count >= 4)."""
    d = _docs(spark, sf_dir)
    return (refset_op.accepted_df(d, required_copies=4)
            .orderBy("token"))


def q_refset_quality(spark, sf_dir):
    """B4+C2: per-doc quality against the corpus-built accepted set via
    explode + broadcast join (pure Catalyst spill path)."""
    d = _docs(spark, sf_dir)
    acc = refset_op.accepted_df(d, required_copies=4)
    return (score_op.quality_catalyst(d, acc, doc_key="doc_id")
            .orderBy("doc_id"))


def q_scrub_children(spark, sf_dir):
    """G2+G4+G5: split-mode scrub — bad-token runs >= 3 chars become cut
    points; children = complementary spans, named {id}_{start+1}-{end}
    (src/read.cpp:88-141). Text returned as md5 for compact comparison."""
    s = _scored(spark, sf_dir, with_spans=True)
    # ONE pass instead of a parents/children union: the scorer already
    # gives unscrubbed docs a single full-doc span ([0, n_chars] — see
    # scoring._score_batch), so exploding child_spans unconditionally
    # yields the parent rows too (md5(substring(text,1,n_chars)) ==
    # md5(text) byte-for-byte) — the union's two filtered branches each
    # re-evaluated the whole Arrow scoring UDF (2x ArrowEvalPython).
    scrubbed = F.col("scrubbed")
    e = s.select("doc_id", "text", "scrubbed",
                 F.explode("child_spans").alias("sp"))
    return (e.select(
        F.when(scrubbed,
               F.concat_ws("", F.col("doc_id").cast("string"), F.lit("_"),
                           (F.col("sp.start") + 1).cast("string"),
                           F.lit("-"), F.col("sp.end").cast("string")))
        .otherwise(F.col("doc_id").cast("string")).alias("child_id"),
        F.col("sp.start").alias("start"),
        F.col("sp.end").alias("end"),
        F.md5(F.substring("text", F.col("sp.start") + 1,
                          F.col("sp.end") - F.col("sp.start"))
              .cast("binary")).alias("text_md5"))
        .orderBy("child_id"))


def q_langid(spark, sf_dir):
    """A2 analog: deterministic char-trigram-profile language ID (the
    textcat/fastText n-gram family; profiles trained from the bundled
    sample corpus, mirrored as literal tables in the SQL oracle)."""
    d = _docs(spark, sf_dir)
    st = ts.langid_df(d)
    return st.select("doc_id", "lang_pred", "lang_conf").orderBy("doc_id")


def q_quality_heuristics(spark, sf_dir):
    """Gopher/C4-style heuristic rules (north_star slot): word length,
    stopword fraction, symbol ratio, type-token ratio + keep decision."""
    d = _docs(spark, sf_dir)
    st = ts.token_stats(d, VOCAB)
    out = (d.select("doc_id", "n_chars",
                    ts.symbol_count_col().alias("symbols"))
           .join(st, "doc_id")
           .select(
               "doc_id", "n_tokens",
               (F.col("sum_token_len").cast("double") / F.col("n_tokens"))
               .alias("mean_word_len"),
               (F.col("stop_count").cast("double") / F.col("n_tokens"))
               .alias("stopword_frac"),
               (F.col("symbols").cast("double") / F.col("n_chars"))
               .alias("symbol_ratio"),
               (F.col("n_distinct").cast("double") / F.col("n_tokens"))
               .alias("ttr")))
    return (out.withColumn(
        "gopher_keep",
        (F.col("n_tokens") >= 10) & (F.col("mean_word_len") >= 2.0)
        & (F.col("mean_word_len") <= 12.0) & (F.col("symbol_ratio") <= 0.1))
        .orderBy("doc_id"))


def q_clf_score(spark, sf_dir):
    """Model-based quality classifier (the fastText/DCLM-classifier
    slot): linear logit over five per-doc features with checked-in
    coefficients (offline-trained weights fold into the plan as
    literals; operators/classifier.py documents the swap-in). Every doc
    scored — guarded divides, left join."""
    from filtlong_spark.operators import classifier as clf
    return (clf.quality_classifier(_docs(spark, sf_dir), VOCAB)
            .orderBy("doc_id"))


def q_repetition(spark, sf_dir):
    """Gopher repetition signals: top-bigram token fraction + duplicate
    token fraction. Bigrams via arrays_zip(slice, slice) — codegen array
    functions, no window shuffle, one hash aggregate."""
    return ts.repetition_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def q_repetition_ngrams(spark, sf_dir):
    """The character-grain half of Gopher's repetition table: most
    frequent 3-gram's char share + chars covered by repeated 5-grams
    beyond their first occurrence. Deterministic tie-break (count desc,
    gram asc), all-integer counts, single same-order divide -> DuckDB
    bit-identical."""
    return (ts.ngram_repetition_stats(_docs(spark, sf_dir))
            .orderBy("doc_id"))


def q_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pieces."""
    d = _docs(spark, sf_dir)
    bpe = F.size(F.expr(
        r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
    return (d.select("doc_id", ts.n_tokens_col().alias("n_tokens"),
                     bpe.alias("n_bpe_pieces"))
            .orderBy("doc_id"))


def q_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (web analog of the 2-bit k-mer
    rolling encode, src/kmers.cpp:106-121)."""
    return ts.fingerprint_df(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dedup_exact(spark, sf_dir):
    return (dedup_op.exact_dupes(_docs(spark, sf_dir, spread=False))
            .orderBy("text_hash"))


def q_dedup_minhash(spark, sf_dir):
    return (dedup_op.minhash_signatures(_docs(spark, sf_dir))
            .orderBy("doc_id", "h"))


def q_dedup_lsh_pairs(spark, sf_dir):
    return (dedup_op.lsh_candidate_pairs(_docs(spark, sf_dir))
            .orderBy("doc_a", "doc_b"))


def q_dedup_jaccard(spark, sf_dir):
    return (dedup_op.jaccard_pairs(_docs(spark, sf_dir))
            .orderBy("doc_a", "doc_b"))


DECONTAM_MOD = 7   # fixture benchmark slice: doc_id % 7 == 2 is "the eval set"
DECONTAM_RES = 2


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: a deterministic 1/7 slice of the
    documents table stands in for the held-out eval set; every remaining
    corpus doc is flagged when it shares >= 3 distinct 5-gram shingles
    with ANY benchmark doc (the GPT-3/Gopher n-gram overlap rule at the
    fixture's document length)."""
    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % DECONTAM_MOD == DECONTAM_RES)
    corpus = d.filter(F.col("doc_id") % DECONTAM_MOD != DECONTAM_RES)
    # A shared-shingle-pass variant (shingle d once, localCheckpoint,
    # split by the mod rule) was measured NEUTRAL at sf0.1 (0.99 vs
    # 1.01 s min-of-5) and reverted: the two slices shingle DISJOINT
    # doc sets, so no shingle work is duplicated — only the pruned text
    # scan — while the checkpoint materializes the full corpus-side
    # shingle table (~5x the text bytes) that is otherwise consumed
    # exactly once. At scale that trade only gets worse.
    return dedup_op.decontaminate(corpus, bench).orderBy("doc_id")


SUBSTR_K = 8   # window width (tokens) for exact substring-level dedup


def q_dedup_substring(spark, sf_dir):
    """Exact substring-level dedup at 8-token window grain (the Lee et
    al. 2022 repeated-substring rule, distributable rendering): any
    window occurring >= 2 times anywhere in the corpus is duplicated;
    covered tokens are cut from clean_text."""
    return (dedup_op.substring_dedup(_docs(spark, sf_dir), k=SUBSTR_K)
            .orderBy("doc_id"))


def q_dedup_groups(spark, sf_dir):
    """Candidate pairs -> keep/drop GROUPS: connected components of the
    minhash-LSH pair graph via min-label propagation (checked against a
    recursive-CTE DuckDB oracle)."""
    d = _docs(spark, sf_dir)
    pairs = dedup_op.lsh_candidate_pairs(d)
    return dedup_op.dedup_assign(d, pairs).orderBy("doc_id")


LINE_WIDTH = 8          # tokens per derived line (fixture scaffolding)
LINE_HEADER = "subscribe to our newsletter today"
LINE_FOOTER = "copyright footer all rights reserved"


def _lined_docs(spark, sf_dir):
    """Deterministic multi-line variant of the documents table (the
    testdata text is single-line): the token stream re-wraps into
    8-token lines, doc_id%3 docs get a shared boilerplate header line
    and doc_id%4 docs a shared footer — so line-level dedup has real
    cross-document boilerplate to find. Mirrored verbatim in the SQL
    oracle (same grouping arithmetic, same injected strings)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ", -1)
    ngroups = F.ceil(F.size(toks) / F.lit(LINE_WIDTH)).cast("int")
    body = F.array_join(
        F.transform(F.sequence(F.lit(0), ngroups - 1),
                    lambda i: F.array_join(
                        F.slice(toks, i * LINE_WIDTH + 1, LINE_WIDTH),
                        " ")), "\n")
    text = F.concat(
        F.when(F.col("doc_id") % 3 == 0,
               F.lit(LINE_HEADER + "\n")).otherwise(F.lit("")),
        body,
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\n" + LINE_FOOTER)).otherwise(F.lit("")))
    return d.select("doc_id", text.alias("text"))


def q_dedup_lines(spark, sf_dir):
    """CCNet/RefinedWeb-style LINE-level boilerplate dedup: lines
    occurring in >= min_df distinct docs are removed everywhere,
    survivors re-join in order (dedup.line_dedup)."""
    return (dedup_op.line_dedup(_lined_docs(spark, sf_dir), min_df=50)
            .orderBy("doc_id"))


def q_simhash(spark, sf_dir):
    return dedup_op.simhash(_docs(spark, sf_dir)).orderBy("doc_id")


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: bit-sampling LSH bands (4x4 bits) + exact
    hamming check on candidates only (never all-pairs)."""
    return (dedup_op.simhash_pairs(_docs(spark, sf_dir))
            .orderBy("doc_a", "doc_b"))


LSH_ORACLE_BAND_BITS = 6  # driver-gate width: the synthetic embeddings
# have NO near-dups (max pairwise cos ~0.51), so the production 4x16-bit
# banding correctly returns ~nothing on them; 4x6-bit bands push real
# values through the identical banding+cap+cosine path in both engines.


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup over the whole corpus: banded sign-LSH
    SELF-join (capped buckets) + exact cosine on candidates."""
    return (sim_op.near_dup_pairs(_emb(spark, sf_dir), threshold=0.3,
                                  band_bits=LSH_ORACLE_BAND_BITS)
            .orderBy("probe_id", "vec_id"))


def q_ann_cosine(spark, sf_dir):
    return (sim_op.cosine_pairs(_emb(spark, sf_dir), probe_max_id=20,
                                threshold=0.2)
            .orderBy("probe_id", "vec_id"))


def q_ann_topk(spark, sf_dir):
    return (sim_op.cosine_topk(_emb(spark, sf_dir), probe_max_id=10, k=5)
            .orderBy("probe_id", "rank"))


LM_THRESHOLD = 0.01


def q_lm_quality(spark, sf_dir):
    """Bigram-LM (KenLM-style perplexity slot) quality: self-corpus bigram
    model with unigram backoff; token good iff p(tok|prev) >= threshold.
    Pure Catalyst: posexplode + lag window + two count aggs + joins —
    integer-count-exact, so DuckDB produces identical doubles."""
    from pyspark.sql import Window
    d = _docs(spark, sf_dir)
    # (pos, tok, prev) WITHOUT a lag window: prev is the token array
    # shifted by one (null-padded at position 0), zipped and exploded —
    # map-only, so the 7.5M-token exchange+sort the window paid is gone.
    # Rows are identical to lag() over (doc_id, pos): prev[i] =
    # toks[i-1], null at i=0. arrays_zip pads a zero-token doc to one
    # all-null row — real tokens are \S+ (never null), so the filter
    # drops exactly those padding rows (empty docs emitted no row under
    # posexplode either).
    toks_arr = F.expr(ts.TOKENS)
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(toks_arr, 1, F.greatest(F.size(toks_arr) - 1, F.lit(0))))
    toks = (d.select(
        "doc_id",
        F.posexplode(F.arrays_zip(toks_arr.alias("tok"),
                                  prevs.alias("prev"))).alias("pos", "z"))
        .select("doc_id", "pos", F.col("z.tok").alias("tok"),
                F.col("z.prev").alias("prev"))
        # the token table feeds THREE consumers (c1, c2, and the probe
        # side of the final join); without materialization the
        # tokenize+zip+explode executed three times (once in the c1
        # checkpoint job, twice inside the final plan). One eager
        # localCheckpoint makes it exactly once — guide §5
        # cache-when-reused (MEMORY_AND_DISK, spills at scale)
        .filter(F.col("tok").isNotNull()).localCheckpoint(eager=True))
    # c1 is consumed three times (the driver-side total and both count
    # joins); materializing the tiny distinct-token table once saves a
    # full aggregate recompute for the total collect
    c1 = (toks.groupBy("tok").agg(F.count("*").alias("c1"))
          .localCheckpoint(eager=True))
    total = c1.agg(F.sum("c1")).collect()[0][0]
    c2 = (toks.filter(F.col("prev").isNotNull())
          .groupBy("prev", "tok").agg(F.count("*").alias("c2")))
    j = (toks
         .join(F.broadcast(c2), ["prev", "tok"], "left")
         .join(F.broadcast(c1.withColumnRenamed("tok", "prev")
                           .withColumnRenamed("c1", "c_prev")), "prev", "left")
         .join(F.broadcast(c1), "tok", "left"))
    p = (F.when(F.col("prev").isNull(),
                F.col("c1").cast("double") / F.lit(float(total)))
         .when(F.col("c2").isNotNull(),
               F.col("c2").cast("double") / F.col("c_prev"))
         .otherwise(F.lit(0.4) * (F.col("c1").cast("double")
                                  / F.lit(float(total)))))
    good = F.when(p >= F.lit(LM_THRESHOLD), 1).otherwise(0)
    return (j.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(good).alias("good_tokens"),
                 (100.0 * F.sum(good) / F.count(F.lit(1))).alias("lm_mean_q"))
            .orderBy("doc_id"))


def q_dedup_text_embedding(spark, sf_dir):
    """Text -> hashing-trick BoW embedding -> banded sign-LSH near-dup
    dedup at FULL PRODUCTION WIDTH (4 bands x 16 bits): the documents
    table's planted near-dups give genuinely near-identical vectors, so
    this query proves the production banding end-to-end (the synthetic
    embeddings table has no near-dups, which is why ann_lsh/
    dedup_embedding run the same code at a narrower band width)."""
    emb = sim_op.embed_text(_docs(spark, sf_dir))
    # center=True: BoW counts are exact integers, so the corpus mean is
    # bit-identical across engines and the clustered-corpus banding fix
    # can be oracle-checked too (10x fewer candidates, see lsh_band_keys)
    return (sim_op.near_dup_pairs(emb, threshold=0.99, center=True)
            .orderBy("probe_id", "vec_id"))


def q_ann_lsh(spark, sf_dir):
    """Banded sign-LSH ANN candidates (the scale path: equi-join on
    (band, key), hot buckets capped, no broadcast of the corpus). Sign
    bits come from md5-derived INTEGER hyperplanes over
    floor(x*1000+0.5)-quantized embeddings, so the band keys are exact
    int64 in both engines and the DuckDB oracle reproduces them
    bit-for-bit."""
    return (sim_op.ann_lsh_candidates(_emb(spark, sf_dir), probe_max_id=20,
                                      band_bits=LSH_ORACLE_BAND_BITS)
            .orderBy("probe_id", "vec_id"))


IVF_PROBE_MAX = 20


def q_ann_ivf(spark, sf_dir):
    """IVF (inverted-file) ANN top-k: deterministic sample-trained coarse
    quantizer, one inverted list per corpus vector, nprobe multi-probe
    fan-out, list equi-join (never a cross product), exact-cosine re-rank.
    Assignment uses round(dot(raw vec, normalized centroid), 6) with
    lowest-list ties, so the DuckDB oracle — which embeds the identical
    trained centroids as literals (similarity.ivf_train_matrix is pure
    numpy over the first 4096 vectors in vec_id order) — reproduces every
    list assignment, probe fan-out, candidate set, and rank exactly."""
    return (sim_op.ann_ivf_topk(_emb(spark, sf_dir),
                                probe_max_id=IVF_PROBE_MAX, k=5)
            .orderBy("probe_id", "rank"))


def q_pipeline_labels(spark, sf_dir):
    """The FULL pipeline (scoring + split scrub + child re-scoring +
    normalization + keep_percent budget) over the documents table mapped
    to the input_hint page shape; returns per-survivor labels. Checked
    end-to-end against a DuckDB oracle reproducing every stage (the
    PII/langid variants of the pipeline are pytest-oracle-verified —
    regex match SPANS are not SQL-expressible)."""
    from filtlong_spark.plans.pipeline import run_filter
    pages = tables.documents_as_pages(spark, sf_dir)
    cfg = FilterConfig(min_length=MIN_LENGTH, keep_percent=90.0,
                       window_size=WINDOW, split=SPLIT_THR,
                       mode="intrinsic", vocab=frozenset(VOCAB),
                       budget_algorithm="approx")
    res = run_filter(spark, pages, cfg)
    return res.kept.select("url", "n_chars", "mean_q", "window_q",
                           "final_score").orderBy("url")


def _lined_pages(spark, sf_dir):
    """The multi-line documents variant (_lined_docs) mapped to the
    input_hint page shape — the fixture for the COMPOSED dedup pipeline
    (line boilerplate + near-dup stages need multi-line text and planted
    near-dups to have anything to do)."""
    d = _docs(spark, sf_dir).drop("text")
    lined = _lined_docs(spark, sf_dir)
    return d.join(lined, "doc_id").select(
        F.concat(F.lit("https://"), F.col("source"),
                 F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double")))
        .alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"), F.col("lang"))


def q_pipeline_dedup(spark, sf_dir):
    """The COMPOSED dedup pipeline (round-5 composition slot): ingest ->
    line-level boilerplate dedup (min_df=50) -> simhash near-dup dedup
    (banded LSH -> connected components -> min-key survivor) -> scoring
    over the CLEANED text -> normalization -> keep_percent budget — all
    as FilterConfig stages of one run_filter call (cfg.line_dedup_min_df
    + cfg.near_dup_dedup), not hand-chained operators. The DuckDB oracle
    reproduces every stage end-to-end: same lined fixture arithmetic,
    same min_df threshold, same md5-60 url keys, same 4x15-bit simhash
    bands with the hot-bucket cap, transitive closure via a recursive
    walk, then the pipeline_labels scoring/budget SQL over survivors."""
    from filtlong_spark.plans.pipeline import run_filter
    pages = _lined_pages(spark, sf_dir)
    cfg = FilterConfig(min_length=MIN_LENGTH, keep_percent=90.0,
                       window_size=WINDOW, mode="intrinsic",
                       vocab=frozenset(VOCAB),
                       line_dedup_min_df=50, near_dup_dedup="simhash",
                       budget_algorithm="approx")
    res = run_filter(spark, pages, cfg)
    return res.kept.select("url", "n_chars", "mean_q", "window_q",
                           "final_score").orderBy("url")


PII_NAMED = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"(?:\+?\d{1,2}[ -])?(?:\(\d{3}\)|\d{3})[ -]\d{3}[ -]\d{4}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("toxic", r"\b(?:frobnak|grubbix|zlorty)\b"),
]


def q_pii_stats(spark, sf_dir):
    """PII/toxicity detection stats per doc (north_rule scrub slot), fully
    Catalyst: regexp_extract_all per pattern -> match count + matched
    chars. (Span-level scrub semantics are pytest-verified; match counts
    are the SQL-expressible projection.)"""
    d = _docs(spark, sf_dir)
    cols = [F.col("doc_id")]
    for name, pat in PII_NAMED:
        arr = F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
        cols.append(F.size(arr).alias(f"n_{name}"))
        cols.append(F.aggregate(F.transform(arr, F.length),
                                F.lit(0), lambda a, x: a + x)
                    .alias(f"chars_{name}"))
    return d.select(*cols).orderBy("doc_id")


def q_events_rollup(spark, sf_dir):
    """Tumbling 1-hour rollup per event type over the events table (the
    hypertable-rollup slot): one partial+final hash aggregate. Money sums
    travel as integer cents, timestamps as epoch micros -> exact."""
    from filtlong_spark.operators import events as ev_op
    ev = tables.load(spark, sf_dir, "events", spread=False)
    return (ev_op.windowed_rollup(ev)
            .orderBy("win_start_us", "event_type"))


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (30 min) per user: lag + running-sum
    window, one shuffle on user_id."""
    from filtlong_spark.operators import events as ev_op
    ev = tables.load(spark, sf_dir, "events", spread=False)
    return (ev_op.sessionize(ev, gap_minutes=30)
            .orderBy("user_id", "session_idx"))


def _noisy_urls(spark, sf_dir):
    """Deterministic crawl-noise url variants derived from the documents
    table (test scaffolding for the canonicalizer: upper-cased hosts,
    fragments, default ports, tracking params, trailing slashes,
    percent-encoded unreserved chars, duplicate/empty query params;
    doc_id//2 pairs share a page so canonicalization creates dup
    groups). Mirrored verbatim in the SQL oracle."""
    d = _docs(spark, sf_dir)
    id2 = F.expr("doc_id DIV 2").cast("string")
    host = F.concat(F.lit("w"), (F.expr("doc_id DIV 2") % 7).cast("string"))
    v = F.col("doc_id") % 6
    url = (F.when(v == 0, F.concat(F.lit("https://"), host,
                                   F.lit(".example.com/doc/"), id2))
           .when(v == 1, F.concat(F.lit("HTTPS://"), F.upper(host),
                                  F.lit(".EXAMPLE.COM/doc/"), id2,
                                  F.lit("#top")))
           .when(v == 2, F.concat(F.lit("https://"), host,
                                  F.lit(".example.com/doc/"), id2,
                                  F.lit("/?utm_source=feed&x=1")))
           .when(v == 3, F.concat(F.lit("https://"), host,
                                  F.lit(".example.com:443/doc/"), id2,
                                  F.lit("?utm_campaign=a")))
           # %64='d', %75='u': unreserved octets decode, so the path
           # collapses onto the v=0 canonical and the decoded utm param
           # is then dropped by the tracking filter (normalization runs
           # BEFORE the param filter — this variant pins that order)
           .when(v == 4, F.concat(F.lit("https://"), host,
                                  F.lit(".example.com/%64oc/"), id2,
                                  F.lit("?%75tm_source=x")))
           # duplicate/empty params collapse; reserved octet %3b (';')
           # stays encoded but its hex uppercases
           .otherwise(F.concat(F.lit("https://"), host,
                               F.lit(".example.com/doc/"), id2,
                               F.lit("?&&x=a%3b&&"))))
    return d.select("doc_id", url.alias("url"))


def q_url_canon(spark, sf_dir):
    """URL canonicalization (functions/weburl.py): fragment/default-port/
    tracking-param/trailing-slash/case noise collapses to one key."""
    from filtlong_spark.functions import weburl
    n = _noisy_urls(spark, sf_dir)
    return (n.withColumn("canonical_url",
                         weburl.canonical_url_col(F.col("url")))
            .orderBy("doc_id"))


def q_dedup_url(spark, sf_dir):
    """Exact dedup keyed on the CANONICAL url — the first dedup pass of
    a crawl pipeline (one key-only shuffle)."""
    from filtlong_spark.functions import weburl
    n = _noisy_urls(spark, sf_dir)
    canon = n.withColumn("canonical_url",
                         weburl.canonical_url_col(F.col("url")))
    return (canon.groupBy("canonical_url")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1)
            .orderBy("canonical_url"))


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test split: md5-bucket of the key — a
    pure function of the document, stable across re-runs/resumes (what
    randomSplit cannot give you across jobs). Map-only."""
    from filtlong_spark.operators import sampling
    return sampling.split_assign(_docs(spark, sf_dir, spread=False)).orderBy("doc_id")


def q_ppl_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail bucketing: within each language,
    rank docs by quality (here the exact token-quality ratio standing
    in for negated LM perplexity — at production scale plug in
    lm_quality's lm_mean_q) and ntile(3) the ranking. Total order
    (score desc, doc_id) makes the assignment deterministic and
    engine-identical; the approx (percentile-threshold, no-sort) path
    is exercised by pytest."""
    from filtlong_spark.operators import sampling
    from filtlong_spark.functions import textstats as ts
    d = _docs(spark, sf_dir)
    # explode + conditional agg (codegen'd), NOT an interpreted array
    # HOF — see the textstats module docstring's physical-design note
    stats = ts.token_stats(d, VOCAB)
    scored = (d.select("doc_id", "lang")
              .join(stats, "doc_id", "left")
              .select("doc_id", "lang",
                      F.when(F.col("n_tokens") > 0,
                             100.0 * F.col("good_tokens").cast("double")
                             / F.col("n_tokens"))
                      .otherwise(F.lit(0.0)).alias("q")))
    return (sampling.quality_buckets(scored, "q", lang_col="lang")
            .orderBy("doc_id"))


PR_ITERS = 8


def q_host_rank(spark, sf_dir):
    """Host-graph link analysis: integer fixed-point PageRank (8
    synchronous iterations at SCALE=10^12 — floor division + exact
    int64 sums only, so the recursive computation is bit-identical in
    Spark, DuckDB's unrolled CTE chain, and Python). Edges derived
    deterministically from the doc key (no html in the testdata; the
    operator documents the real-outlink swap-in)."""
    from filtlong_spark.operators import graph
    d = _docs(spark, sf_dir, spread=False)
    return (graph.pagerank_int(graph.host_edges(d), PR_ITERS)
            .orderBy("host"))


MIXTURE_SHARES = {"de": 0.5, "en": 0.5, "zh": 0.25}
MIXTURE_BUDGET = 8000


def q_mixture_sample(spark, sf_dir):
    """Static-mixture downsampling to a target token distribution (the
    Pile/DoReMi domain-mixing slot): p_keep = min(1, share*budget/
    group_tokens) per language (de's slice exceeds its corpus -> p_keep
    caps at 1.0; fr/es are absent -> excluded at 0.0), decided per doc
    by the deterministic md5 uniform. Key-only group agg + broadcast
    back, map-only draw."""
    from filtlong_spark.operators import sampling
    return (sampling.mixture_sample(_docs(spark, sf_dir), MIXTURE_SHARES,
                                    MIXTURE_BUDGET)
            .orderBy("doc_id"))


PACK_CAPACITY = 2048


def q_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing: per language, docs
    laid end-to-end in doc_id order, token stream cut into 2048-token
    training sequences (straddling docs split across neighbors). One
    window running-sum partitioned by language — each group packs
    independently, the production sharding shape. All-integer."""
    from filtlong_spark.operators import sampling
    return (sampling.pack_sequences(_docs(spark, sf_dir), PACK_CAPACITY)
            .orderBy("doc_id"))


HOST_GATE_MIN_Q = 99.9


def q_host_gate(spark, sf_dir):
    """Host/domain-level quality gate: per-host mean token quality
    decides keep/drop for every doc of the host (the UT1/domain-filter
    stage, derived from data)."""
    from filtlong_spark.operators import partitioning as pt
    return (pt.host_quality_gate(_docs(spark, sf_dir), VOCAB,
                                 HOST_GATE_MIN_Q)
            .orderBy("doc_id"))


BLOCK_WORDS = ("casino", "big big")   # fixture deny-words (one no-op,
# one ~6%-of-docs hit); the host slice below stands in for the UT1 list


def q_blocklist(spark, sf_dir):
    """UT1-style deny-list gate: a deterministic md5 slice of hosts is
    'the blocklist' (broadcast), plus lower-cased substring word rules;
    keep = neither fired."""
    from filtlong_spark.operators import partitioning as pt
    d = _docs(spark, sf_dir, spread=False)
    blocked = (d.select(F.col("source").alias("host")).distinct()
               .filter(F.substring(F.md5(F.col("host").cast("binary")), 1, 1)
                       .isin("0", "1")))
    return (pt.blocklist_gate(d, blocked, BLOCK_WORDS)
            .orderBy("doc_id"))


HOST_SAMPLE_TARGET = 10   # docs per host the sampler damps toward


def q_host_sample(spark, sf_dir):
    """Temperature-damped per-host downsampling (domain mixing):
    p_keep = min(1, sqrt(target/n_host)), decided per doc by a
    deterministic md5 uniform — reproducible across engines."""
    from filtlong_spark.operators import partitioning as pt
    return (pt.host_temperature_sample(_docs(spark, sf_dir, spread=False),
                                       HOST_SAMPLE_TARGET, alpha=0.5)
            .orderBy("doc_id"))


def q_dup_check(spark, sf_dir):
    """A4: duplicate-key data-quality gate (src/main.cpp:113-117)."""
    d = _docs(spark, sf_dir, spread=False)
    return (d.groupBy("doc_id").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1).orderBy("doc_id"))


def q_lang_profile(spark, sf_dir):
    """Per-language corpus profile — all ratios of exact integer sums."""
    d = _docs(spark, sf_dir)
    st = ts.token_stats(d, VOCAB)
    per_doc = (d.select("doc_id", "lang", "n_chars")
               .join(st.select("doc_id",
                               F.col("n_tokens").alias("n_tok"),
                               F.col("good_tokens").alias("good")), "doc_id"))
    return (per_doc.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("chars"),
                 F.sum("n_tok").alias("tokens"),
                 (100.0 * F.sum("good") / F.sum("n_tok")).alias("mean_q"))
            .orderBy("lang"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "hard_rules": q_hard_rules,
        "window_quality": q_window_quality,
        "length_score": q_length_score,
        "normalize_scores": q_normalize_scores,
        "final_score": q_final_score,
        "keep_budget": q_keep_budget,
        "refset_build": q_refset_build,
        "refset_quality": q_refset_quality,
        "scrub_children": q_scrub_children,
        "langid": q_langid,
        "quality_heuristics": q_quality_heuristics,
        "repetition": q_repetition,
        "repetition_ngrams": q_repetition_ngrams,
        "clf_score": q_clf_score,
        "token_count": q_token_count,
        "fingerprint": q_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_lsh_pairs": q_dedup_lsh_pairs,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_groups": q_dedup_groups,
        "decontaminate": q_decontaminate,
        "dedup_substring": q_dedup_substring,
        "dedup_lines": q_dedup_lines,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "dedup_embedding": q_dedup_embedding,
        "dedup_text_embedding": q_dedup_text_embedding,
        "lm_quality": q_lm_quality,
        "ann_cosine": q_ann_cosine,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "pipeline_labels": q_pipeline_labels,
        "pipeline_dedup": q_pipeline_dedup,
        "pii_stats": q_pii_stats,
        "events_rollup": q_events_rollup,
        "events_sessions": q_events_sessions,
        "url_canon": q_url_canon,
        "dedup_url": q_dedup_url,
        "split_assign": q_split_assign,
        "ppl_buckets": q_ppl_buckets,
        "pack_sequences": q_pack_sequences,
        "mixture_sample": q_mixture_sample,
        "host_rank": q_host_rank,
        "host_gate": q_host_gate,
        "host_sample": q_host_sample,
        "blocklist": q_blocklist,
        "dup_check": q_dup_check,
        "lang_profile": q_lang_profile,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL — each mirrors its query EXACTLY (same arithmetic order)
# ---------------------------------------------------------------------------

_MEAN_Q = (f"100.0 * len(list_filter({TOKENS_SQL}, t -> t IN ({VOCAB_SQL})))"
           f" / len({TOKENS_SQL})")

_WINDOW_CTE = f"""
toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS tok,
         generate_subscripts({TOKENS_SQL}, 1) AS pos
  FROM {DOCS}
),
q AS (
  SELECT doc_id, pos,
         CASE WHEN tok IN ({VOCAB_SQL}) THEN 1 ELSE 0 END AS ok,
         count(*) OVER (PARTITION BY doc_id) AS n
  FROM toks
),
wsums AS (
  SELECT doc_id, pos, n,
         sum(ok) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINDOW - 1} FOLLOWING)
           AS wsum,
         sum(ok) OVER (PARTITION BY doc_id) AS total_ok
  FROM q
),
winq AS (
  SELECT doc_id,
         max(n) AS n_tokens,
         100.0 * max(total_ok) / max(n) AS mean_q,
         CASE WHEN max(n) <= {WINDOW}
              THEN 100.0 * max(total_ok) / max(n)
              ELSE CASE WHEN (min(wsum) FILTER (WHERE pos <= n - {WINDOW} + 1)
                              / {WINDOW}.0) < 0.5 / {WINDOW}.0
                        THEN 0.0
                        ELSE 100.0 * (min(wsum) FILTER (WHERE pos <= n - {WINDOW} + 1)
                                      / {WINDOW}.0)
                   END
         END AS window_q
  FROM wsums
  GROUP BY doc_id
)"""

_RATIO = ("CASE WHEN mean_q <= 0.0 THEN 1.0 "
          "WHEN window_q / mean_q > 1.0 THEN 1.0 "
          "ELSE window_q / mean_q END")

_FINAL_CTE = f"""
WITH {_WINDOW_CTE},
normed AS (
  SELECT w.doc_id, d.n_chars, w.mean_q, w.window_q,
         {_RATIO} AS ratio,
         100.0 * (w.mean_q - min(w.mean_q) OVER ())
           / (max(w.mean_q) OVER () - min(w.mean_q) OVER ()) AS mean_q_score,
         100.0 * d.n_chars / (d.n_chars + 5000.0) AS length_s
  FROM winq w JOIN {DOCS} d USING (doc_id)
),
finals AS (
  SELECT *,
         sqrt(length_s * mean_q_score)
           * ((1.0 - 1.0/3.0) + ratio * (1.0/3.0)) AS final_score
  FROM normed
)"""

_SHINGLE3 = ("list_transform(generate_series(1, greatest(len(toks) - 2, 0)), "
             "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])")
_SHINGLE5 = ("list_transform(generate_series(1, greatest(len(toks) - 4, 0)), "
             "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || "
             "toks[i+3] || ' ' || toks[i+4])")

_COS_PAIR_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
pairs AS (
  SELECT p.vec_id AS probe_id, c.vec_id,
         round(
           list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, len(p.v)),
                            i -> p.v[i] * c.v[i])), (a,b) -> a + b)
           / (sqrt(list_reduce(list_prepend(0.0,
                list_transform(p.v, x -> x*x)), (a,b) -> a + b))
              * sqrt(list_reduce(list_prepend(0.0,
                list_transform(c.v, x -> x*x)), (a,b) -> a + b))), 6) AS cos
  FROM e p JOIN e c ON p.vec_id < c.vec_id
  WHERE p.vec_id <= {probe_max}
)
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["hard_rules"] = f"""
SELECT doc_id, n_chars,
       len({TOKENS_SQL}) AS n_tokens,
       len(list_filter({TOKENS_SQL}, t -> t IN ({VOCAB_SQL}))) AS good_tokens,
       {_MEAN_Q} AS mean_q,
       n_chars >= {MIN_LENGTH} AND n_chars <= {MAX_LENGTH}
         AND {_MEAN_Q} >= {MIN_MEAN_Q} AS keep
FROM {DOCS} ORDER BY doc_id"""

    sql["window_quality"] = f"""
WITH {_WINDOW_CTE}
SELECT doc_id, n_tokens, mean_q, window_q FROM winq ORDER BY doc_id"""

    sql["length_score"] = f"""
SELECT doc_id, 100.0 * n_chars / (n_chars + 5000.0) AS length_score
FROM {DOCS} ORDER BY doc_id"""

    sql["normalize_scores"] = f"""
WITH {_WINDOW_CTE}
SELECT doc_id, mean_q,
       100.0 * (mean_q - min(mean_q) OVER ())
         / (max(mean_q) OVER () - min(mean_q) OVER ()) AS mean_q_score
FROM winq ORDER BY doc_id"""

    sql["final_score"] = f"""
{_FINAL_CTE}
SELECT doc_id, mean_q_score, ratio, final_score FROM finals ORDER BY doc_id"""

    sql["keep_budget"] = f"""
{_FINAL_CTE},
cum AS (
  SELECT doc_id, n_chars, final_score,
         n_chars >= {MIN_LENGTH} AS eligible,
         coalesce(sum(CASE WHEN n_chars >= {MIN_LENGTH} THEN n_chars END)
           OVER (ORDER BY final_score DESC, doc_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM finals
)
SELECT doc_id, n_chars, final_score, eligible,
       eligible AND cum_before < {BUDGET_TARGET} AS keep
FROM cum ORDER BY doc_id"""

    sql["refset_build"] = f"""
WITH toks AS (SELECT unnest({TOKENS_SQL}) AS token FROM {DOCS})
SELECT token, count(*) AS cnt FROM toks
GROUP BY token HAVING count(*) >= 4 ORDER BY token"""

    sql["refset_quality"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS token FROM {DOCS}
),
acc AS (
  SELECT token FROM toks GROUP BY token HAVING count(*) >= 4
),
j AS (
  SELECT t.doc_id, CASE WHEN a.token IS NULL THEN 0 ELSE 1 END AS hit
  FROM toks t LEFT JOIN acc a USING (token)
)
SELECT doc_id, count(*) AS n_tokens, sum(hit)::BIGINT AS good_tokens,
       100.0 * sum(hit) / count(*) AS mean_q
FROM j GROUP BY doc_id ORDER BY doc_id"""

    # scrub: single-space tokenization -> char offsets derivable in SQL
    sql["scrub_children"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS tok,
         generate_subscripts({TOKENS_SQL}, 1) AS pos
  FROM {DOCS}
),
pos AS (
  SELECT doc_id, tok, pos,
         sum(len(tok)) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           + (pos - 1) AS start_c,
         sum(len(tok)) OVER (PARTITION BY doc_id ORDER BY pos)
           + (pos - 1) AS end_c,
         tok NOT IN ({VOCAB_SQL}) AS bad
  FROM toks
),
runs AS (
  SELECT doc_id, pos, start_c, end_c, bad,
         pos - row_number() OVER (PARTITION BY doc_id, bad ORDER BY pos)
           AS grp
  FROM pos
),
bad_runs AS (
  SELECT doc_id, min(coalesce(start_c, 0)) AS bs, max(end_c) AS be
  FROM runs WHERE bad GROUP BY doc_id, grp
  HAVING max(end_c) - min(coalesce(start_c, 0)) >= 3
),
doc_len AS (SELECT doc_id, n_chars, text FROM {DOCS}),
edges AS (
  SELECT d.doc_id, d.n_chars, d.text, b.bs, b.be,
         coalesce(lag(b.be) OVER (PARTITION BY d.doc_id ORDER BY b.bs), 0)
           AS prev_end
  FROM doc_len d JOIN bad_runs b USING (doc_id)
),
spans AS (
  SELECT doc_id, n_chars, text, prev_end AS s, bs AS e FROM edges
  UNION ALL
  SELECT doc_id, n_chars, text, max(be) AS s, max(n_chars) AS e
  FROM edges GROUP BY doc_id, n_chars, text
),
children AS (
  SELECT doc_id::VARCHAR || '_' || (s + 1)::VARCHAR || '-' || e::VARCHAR
           AS child_id,
         s::INT AS start, e::INT AS "end",
         md5(substr(text, s::INT + 1, e::INT - s::INT)) AS text_md5
  FROM spans WHERE e > s
),
parents AS (
  SELECT doc_id::VARCHAR AS child_id, 0 AS start, n_chars::INT AS "end",
         md5(text) AS text_md5
  FROM doc_len WHERE doc_id NOT IN (SELECT doc_id FROM bad_runs)
)
SELECT * FROM parents UNION ALL SELECT * FROM children ORDER BY child_id"""

    from filtlong_spark import core as _core
    prof = _core.trigram_profiles()
    langs = sorted(prof)
    lang_cases = []
    for lang in langs:
        tgs = ", ".join("'" + t.replace("'", "''") + "'"
                        for t in sorted(prof[lang]))
        lang_cases.append(
            f"sum(CASE WHEN tg IN ({tgs}) THEN 1 ELSE 0 END) AS s_{lang}")
    # script-exclusive short-circuit, mirroring core.flat_predict_lang_texts:
    # unicode(tg) = the codepoint of each trigram's FIRST char — the same
    # [0, n-2) char stream the kernel counts via key >> 42
    lang_cases += [
        "sum(CASE WHEN unicode(tg) BETWEEN 44032 AND 55215 "
        "THEN 1 ELSE 0 END) AS s_hangul",
        "sum(CASE WHEN unicode(tg) BETWEEN 12352 AND 12543 "
        "THEN 1 ELSE 0 END) AS s_kana",
        "sum(CASE WHEN unicode(tg) BETWEEN 19968 AND 40959 "
        "THEN 1 ELSE 0 END) AS s_han",
        "count(*) AS n_tg",
    ]
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    # script routing gated on >= 5% of trigram positions (20*n >= n_tg),
    # exactly like the kernel — bare presence would reroute on one
    # quoted CJK name
    pred = ("CASE WHEN s_hangul > 0 AND s_hangul * 20 >= n_tg THEN 'ko' "
            "WHEN s_kana > 0 AND s_kana * 20 >= n_tg THEN 'ja' "
            "WHEN s_han > 0 AND s_han * 20 >= n_tg THEN 'zh' "
            "WHEN " + best + " = 0 THEN 'und' " + " ".join(
                f"WHEN s_{l} = {best} THEN '{l}'" for l in langs) + " END")
    total = " + ".join(f"s_{l}" for l in langs)
    coalesced = ", ".join(
        f"coalesce(s_{l}, 0) AS s_{l}"
        for l in langs + ["hangul", "kana", "han"]) \
        + ", coalesce(n_tg, 0) AS n_tg"
    # LID reads only the first core.LID_SAMPLE_CHARS chars (the bounded
    # production-LID sample) — substr BEFORE lower, exactly like the
    # kernel slices the raw text before lowercasing
    sql["langid"] = f"""
WITH lt AS (SELECT doc_id,
                   lower(substr(text, 1, {_core.LID_SAMPLE_CHARS})) AS lt
            FROM {DOCS}),
pos AS (
  SELECT doc_id, lt,
         unnest(generate_series(1, greatest(length(lt) - 2, 0))) AS i
  FROM lt
),
tg AS (SELECT doc_id, substr(lt, i, 3) AS tg FROM pos),
s0 AS (SELECT doc_id, {', '.join(lang_cases)} FROM tg GROUP BY doc_id),
s AS (
  SELECT d.doc_id, {coalesced}
  FROM {DOCS} d LEFT JOIN s0 USING (doc_id)
)
SELECT doc_id, {pred} AS lang_pred,
       CASE WHEN s_hangul > 0 AND s_hangul * 20 >= n_tg
            THEN s_hangul::DOUBLE / greatest(n_tg, 1)
            WHEN s_kana > 0 AND s_kana * 20 >= n_tg
            THEN s_kana::DOUBLE / greatest(n_tg, 1)
            WHEN s_han > 0 AND s_han * 20 >= n_tg
            THEN s_han::DOUBLE / greatest(n_tg, 1)
            WHEN ({total}) > 0
            THEN {best}::DOUBLE / ({total}) ELSE 0.0 END AS lang_conf
FROM s ORDER BY doc_id"""

    sql["quality_heuristics"] = f"""
WITH s AS (
  SELECT doc_id, n_chars,
         len({TOKENS_SQL}) AS n_tokens,
         list_reduce(list_prepend(0::BIGINT,
           list_transform({TOKENS_SQL}, t -> len(t)::BIGINT)),
           (a, b) -> a + b) AS sum_len,
         len(list_filter({TOKENS_SQL}, t -> t IN ({_STOP_SQL}))) AS stop,
         len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS symbols,
         len(list_distinct({TOKENS_SQL})) AS n_distinct
  FROM {DOCS}
)
SELECT doc_id, n_tokens,
       sum_len::DOUBLE / n_tokens AS mean_word_len,
       stop::DOUBLE / n_tokens AS stopword_frac,
       symbols::DOUBLE / n_chars AS symbol_ratio,
       n_distinct::DOUBLE / n_tokens AS ttr,
       n_tokens >= 10 AND sum_len::DOUBLE / n_tokens >= 2.0
         AND sum_len::DOUBLE / n_tokens <= 12.0
         AND symbols::DOUBLE / n_chars <= 0.1 AS gopher_keep
FROM s ORDER BY doc_id"""

    # weights literal-mirror operators/classifier.DEFAULT_WEIGHTS; the
    # logit chain is the same left-associative multiply-add order as
    # quality_classifier, so doubles are bit-identical
    sql["clf_score"] = f"""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         len({TOKENS_SQL}) AS n_tokens,
         coalesce(list_reduce(list_prepend(0::BIGINT,
           list_transform({TOKENS_SQL}, t -> len(t)::BIGINT)),
           (a, b) -> a + b), 0) AS sum_len,
         len(list_filter({TOKENS_SQL}, t -> t IN ({_STOP_SQL}))) AS stop,
         len(list_filter({TOKENS_SQL}, t -> t IN ({VOCAB_SQL}))) AS good,
         len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS symbols,
         len(list_distinct({TOKENS_SQL})) AS n_distinct
  FROM {DOCS}
),
f AS (
  SELECT doc_id,
    CASE WHEN n_tokens > 0 THEN sum_len::DOUBLE / n_tokens
         ELSE 0.0 END AS mean_word_len,
    CASE WHEN n_tokens > 0 THEN stop::DOUBLE / n_tokens
         ELSE 0.0 END AS stopword_frac,
    CASE WHEN n_tokens > 0 THEN good::DOUBLE / n_tokens
         ELSE 0.0 END AS vocab_frac,
    CASE WHEN n_chars > 0 THEN symbols::DOUBLE / n_chars
         ELSE 0.0 END AS symbol_ratio,
    CASE WHEN n_tokens > 0 THEN 1.0 - n_distinct::DOUBLE / n_tokens
         ELSE 0.0 END AS dup_frac
  FROM s
)
SELECT doc_id, mean_word_len, stopword_frac, vocab_frac, symbol_ratio,
       dup_frac,
       -3.0 + 0.25 * mean_word_len + 2.0 * stopword_frac
            + 4.0 * vocab_frac + -5.0 * symbol_ratio
            + -2.0 * dup_frac AS clf_score,
       -3.0 + 0.25 * mean_word_len + 2.0 * stopword_frac
            + 4.0 * vocab_frac + -5.0 * symbol_ratio
            + -2.0 * dup_frac >= 0.0 AS keep
FROM f ORDER BY doc_id"""

    # bigram key joined with ' ' — tokens are \\S+ runs, so a space can
    # never appear inside one and the string key equals the Spark struct
    sql["repetition"] = f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM {DOCS}),
bg AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(toks) - 1, 0)),
    i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM d
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c)::BIGINT AS top_bigram_n
  FROM bc GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_bigrams, 0) AS n_bigrams,
       coalesce(a.top_bigram_n, 0) AS top_bigram_n,
       CASE WHEN a.n_bigrams > 0
            THEN a.top_bigram_n::DOUBLE / a.n_bigrams ELSE 0.0
       END AS top_bigram_frac,
       CASE WHEN len(toks) > 0
            THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
            ELSE 0.0
       END AS dup_token_frac
FROM d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""

    sql["repetition_ngrams"] = f"""
WITH d AS (SELECT doc_id, length(text) AS n_chars, {TOKENS_SQL} AS toks
           FROM {DOCS}),
g3 AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(toks) - 2, 0)),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
  FROM d
),
c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY doc_id, gram),
m3 AS (SELECT doc_id, max(c) AS mc FROM c3 GROUP BY doc_id),
t3 AS (
  SELECT c3.doc_id, min(gram) AS top_gram, max(c) AS top_c
  FROM c3 JOIN m3 ON c3.doc_id = m3.doc_id AND c3.c = m3.mc
  GROUP BY c3.doc_id
),
g5 AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(toks) - 4, 0)),
    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
         || toks[i+3] || ' ' || toks[i+4])) AS gram
  FROM d
),
c5 AS (SELECT doc_id, gram, count(*) AS c FROM g5 GROUP BY doc_id, gram),
d5 AS (
  SELECT doc_id, sum((c - 1) * length(gram))::BIGINT AS dup_chars
  FROM c5 WHERE c >= 2 GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(t3.top_gram, '') AS top_gram,
       CASE WHEN t3.top_c IS NOT NULL AND d.n_chars > 0
            THEN 100.0 * t3.top_c * length(t3.top_gram) / d.n_chars
            ELSE 0.0 END AS top_3gram_pct,
       CASE WHEN d5.dup_chars IS NOT NULL AND d.n_chars > 0
            THEN 100.0 * d5.dup_chars / d.n_chars
            ELSE 0.0 END AS dup_5gram_pct
FROM d LEFT JOIN t3 USING (doc_id) LEFT JOIN d5 USING (doc_id)
ORDER BY doc_id"""

    sql["token_count"] = f"""
SELECT doc_id, len({TOKENS_SQL}) AS n_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         AS n_bpe_pieces
FROM {DOCS} ORDER BY doc_id"""

    sql["fingerprint"] = f"""
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT,
         list_transform({TOKENS_SQL},
           t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
         (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM {DOCS} ORDER BY doc_id"""

    sql["dedup_exact"] = f"""
SELECT md5(replace(text, ' dup', '')) AS text_hash,
       count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM {DOCS} GROUP BY 1 HAVING count(*) > 1 ORDER BY text_hash"""

    mh_a, mh_b = dedup_op._mh_params(dedup_op.N_HASHES)
    mh_values = ", ".join(f"({h}, {mh_a[h]}, {mh_b[h]})"
                          for h in range(dedup_op.N_HASHES))
    _MH_CTES = f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM {DOCS}),
sh AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLE3}) AS shingle FROM d
),
params AS (SELECT * FROM (VALUES {mh_values}) t(h, a, b)),
perms AS (
  SELECT doc_id, h,
         ((a * (('0x' || substr(md5(shingle), 1, 15))::BIGINT
                % {dedup_op.MH_PRIME}) + b) % {dedup_op.MH_PRIME}) AS hval
  FROM sh CROSS JOIN params
),
sig AS (SELECT doc_id, h, min(hval) AS minhash FROM perms GROUP BY doc_id, h)"""

    sql["dedup_minhash"] = f"""
{_MH_CTES}
SELECT doc_id, h, minhash FROM sig ORDER BY doc_id, h"""

    sql["dedup_lsh_pairs"] = f"""
{_MH_CTES},
bands0 AS (
  SELECT doc_id, h // {dedup_op.BAND_ROWS} AS band,
         string_agg(h::VARCHAR || ':' || minhash, '|' ORDER BY
                    h::VARCHAR || ':' || minhash) AS band_key
  FROM sig GROUP BY doc_id, h // {dedup_op.BAND_ROWS}
),
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, band_key)
          <= {dedup_op.MAX_BAND_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b"""

    # keep/drop groups: recursive-CTE connected components over the SAME
    # minhash-LSH candidate pairs (rep = min doc_id reachable)
    sql["decontaminate"] = f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM {DOCS}),
corp AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLE5}) AS shingle FROM d
  WHERE doc_id % {DECONTAM_MOD} <> {DECONTAM_RES}
),
ben AS (
  SELECT DISTINCT unnest({_SHINGLE5}) AS shingle FROM d
  WHERE doc_id % {DECONTAM_MOD} = {DECONTAM_RES}
),
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM corp JOIN ben USING (shingle)
  GROUP BY doc_id
)
SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       coalesce(h.n_hits, 0) >= 3 AS contaminated
FROM d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {DECONTAM_MOD} <> {DECONTAM_RES}
ORDER BY doc_id"""

    _K = SUBSTR_K
    sql["dedup_substring"] = f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM {DOCS}),
w AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(toks) - {_K - 1}, 0)))
           AS pos,
         unnest(list_transform(
             generate_series(1, greatest(len(toks) - {_K - 1}, 0)),
             i -> array_to_string(toks[i:i+{_K - 1}], ' '))) AS win
  FROM d),
wh AS (SELECT doc_id, pos,
              ('0x' || substr(md5(win), 1, 15))::BIGINT AS whash
       FROM w),
dup AS (SELECT whash FROM wh GROUP BY 1 HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM wh JOIN dup USING (whash)),
covpos AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id, unnest(generate_series(pos, pos + {_K - 1})) AS tpos
    FROM hits)),
t AS (SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM d),
clean AS (
  SELECT t.doc_id,
         coalesce(string_agg(tok, ' ' ORDER BY t.pos)
                  FILTER (WHERE c.tpos IS NULL), '') AS clean_text
  FROM t LEFT JOIN covpos c ON t.doc_id = c.doc_id AND t.pos = c.tpos
  GROUP BY t.doc_id),
hd AS (SELECT doc_id, count(*) AS dup_windows FROM hits GROUP BY 1)
SELECT d.doc_id,
       greatest(len(toks) - {_K - 1}, 0) AS n_windows,
       coalesce(hd.dup_windows, 0) AS dup_windows,
       CASE WHEN len(toks) > {_K - 1}
            THEN coalesce(hd.dup_windows, 0)::DOUBLE
                 / (len(toks) - {_K - 1})
            ELSE 0.0 END AS dup_frac,
       coalesce(cl.clean_text, '') AS clean_text
FROM d LEFT JOIN hd USING (doc_id) LEFT JOIN clean cl USING (doc_id)
ORDER BY doc_id"""

    sql["dedup_groups"] = (
        _MH_CTES.replace("\nWITH d AS", "\nWITH RECURSIVE d AS", 1)
        + f""",
bands0 AS (
  SELECT doc_id, h // {dedup_op.BAND_ROWS} AS band,
         string_agg(h::VARCHAR || ':' || minhash, '|' ORDER BY
                    h::VARCHAR || ':' || minhash) AS band_key
  FROM sig GROUP BY doc_id, h // {dedup_op.BAND_ROWS}
),
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, band_key)
          <= {dedup_op.MAX_BAND_BUCKET}
),
cpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
cedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cpairs
  UNION
  SELECT doc_b, doc_a FROM cpairs
),
walk(node, rep) AS (
  SELECT src, src FROM cedges
  UNION
  SELECT e.dst, w.rep FROM walk w JOIN cedges e ON e.src = w.node
),
comps AS (SELECT node, min(rep) AS rep FROM walk GROUP BY node)
SELECT x.doc_id, coalesce(c.rep, x.doc_id) AS rep_id,
       coalesce(c.rep, x.doc_id) != x.doc_id AS is_dup
FROM {DOCS} x LEFT JOIN comps c ON c.node = x.doc_id
ORDER BY doc_id""")

    sql["dedup_jaccard"] = f"""
WITH d AS (SELECT doc_id, {TOKENS_SQL} AS toks FROM {DOCS}),
sh0 AS (
  SELECT DISTINCT doc_id, unnest({_SHINGLE5}) AS shingle FROM d
),
dfreq AS (
  SELECT shingle FROM sh0 GROUP BY shingle
  HAVING count(*) <= {dedup_op.MAX_SHINGLE_DF}
),
sh AS (SELECT sh0.* FROM sh0 JOIN dfreq USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter::DOUBLE / (sa.n_sh + sb.n_sh - inter) >= 0.5
ORDER BY doc_a, doc_b"""

    sql["dedup_lines"] = f"""
WITH lined AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN '{LINE_HEADER}' || chr(10) ELSE '' END
         || array_to_string(list_transform(
              generate_series(1, ((len(string_split(text, ' ')) - 1)
                                  // {LINE_WIDTH}) + 1),
              g -> array_to_string(
                string_split(text, ' ')[(g-1)*{LINE_WIDTH}+1
                                        : (g-1)*{LINE_WIDTH}+{LINE_WIDTH}],
                ' ')), chr(10))
         || CASE WHEN doc_id % 4 = 0
                 THEN chr(10) || '{LINE_FOOTER}' ELSE '' END AS text
  FROM {DOCS}
),
lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM lined
),
hot AS (
  SELECT line FROM lines WHERE trim(line) <> ''
  GROUP BY line HAVING count(DISTINCT doc_id) >= 50
),
kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l LEFT JOIN hot h USING (line)
  WHERE h.line IS NULL
),
clean AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(c.text_clean, '') AS text_clean
FROM {DOCS} d LEFT JOIN clean c USING (doc_id)
ORDER BY doc_id"""

    sql["simhash"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM {DOCS}
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT >> b) & 1 = 1
              THEN 1 ELSE -1 END AS vote
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, {dedup_op.SIMHASH_BITS - 1})) AS b)
),
votes AS (SELECT doc_id, b, sum(vote) AS v FROM bits GROUP BY doc_id, b)
SELECT doc_id,
       sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
         AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id"""

    band_w = dedup_op.SIMHASH_BITS // dedup_op.SIMHASH_BANDS
    sql["simhash_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM {DOCS}
),
bits AS (
  SELECT doc_id, b,
         CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT >> b) & 1 = 1
              THEN 1 ELSE -1 END AS vote
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, {dedup_op.SIMHASH_BITS - 1})) AS b)
),
votes AS (SELECT doc_id, b, sum(vote) AS v FROM bits GROUP BY doc_id, b),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
           AS simhash
  FROM votes GROUP BY doc_id
),
bands0 AS (
  SELECT doc_id, simhash, b AS band,
         (simhash >> (b * {band_w})) & {(1 << band_w) - 1} AS key
  FROM fp CROSS JOIN (SELECT unnest(generate_series(0, {dedup_op.SIMHASH_BANDS - 1})) AS b)
),
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, key)
          <= {dedup_op.MAX_BAND_BUCKET}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM bands a JOIN bands b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {dedup_op.SIMHASH_MAX_DIST}
ORDER BY doc_a, doc_b"""

    sql["lm_quality"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS tok,
         generate_subscripts({TOKENS_SQL}, 1) AS pos
  FROM {DOCS}
),
seq AS (
  SELECT doc_id, pos, tok,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM toks
),
c1 AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY tok),
tot AS (SELECT sum(c1) AS total FROM c1),
c2 AS (
  SELECT prev, tok, count(*) AS c2 FROM seq
  WHERE prev IS NOT NULL GROUP BY prev, tok
),
p AS (
  SELECT s.doc_id,
         CASE WHEN s.prev IS NULL THEN u.c1::DOUBLE / t.total::DOUBLE
              WHEN b.c2 IS NOT NULL THEN b.c2::DOUBLE / up.c1
              ELSE 0.4 * (u.c1::DOUBLE / t.total::DOUBLE)
         END AS p
  FROM seq s
  LEFT JOIN c2 b ON b.prev = s.prev AND b.tok = s.tok
  LEFT JOIN c1 up ON up.tok = s.prev
  LEFT JOIN c1 u ON u.tok = s.tok
  CROSS JOIN tot t
)
SELECT doc_id, count(*) AS n_tokens,
       sum(CASE WHEN p >= {LM_THRESHOLD} THEN 1 ELSE 0 END)::BIGINT
         AS good_tokens,
       100.0 * sum(CASE WHEN p >= {LM_THRESHOLD} THEN 1 ELSE 0 END)
         / count(*) AS lm_mean_q
FROM p GROUP BY doc_id ORDER BY doc_id"""

    sql["ann_cosine"] = (_COS_PAIR_SQL.format(probe_max=20)
                         + "SELECT probe_id, vec_id, cos FROM pairs "
                           "WHERE cos >= 0.2 ORDER BY probe_id, vec_id")

    def _lsh_pairs_sql(e_body: str, band_bits: int,
                       center: bool = False) -> str:
        """Banded sign-LSH candidate+cosine CTE chain over a (vec_id,
        v: DOUBLE list) source — EXACTLY mirrors similarity.lsh_band_keys
        / lsh_candidate_pairs / _pair_cosines at the given band width.
        center mirrors the corpus-mean subtraction (exact for
        integer-valued sources: sums are exact in double, and the
        mean's division is the same IEEE op in both engines)."""
        if center:
            q_cte = """
mu AS (
  SELECT i, sum(val) / count(*) AS m
  FROM (SELECT unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e)
  GROUP BY i
),
mulist AS (SELECT list(m ORDER BY i) AS mv FROM mu),
q AS (
  SELECT vec_id,
         list_transform(generate_series(1, len(v)),
           i -> floor((v[i] - mulist.mv[i]) * 1000.0 + 0.5)::BIGINT)
           AS qv
  FROM e CROSS JOIN mulist
),"""
        else:
            q_cte = """
q AS (
  SELECT vec_id,
         list_transform(v, x -> floor(x * 1000.0 + 0.5)::BIGINT) AS qv
  FROM e
),"""
        return f"""
WITH e AS ({e_body}),{q_cte}
sums AS (
  SELECT vec_id, p,
         list_reduce(list_prepend(0::BIGINT,
           list_transform(generate_series(1, len(qv)),
             i -> qv[i] * ((('0x' || substr(md5(p::VARCHAR || ':'
                             || (i-1)::VARCHAR), 1, 8))::BIGINT
                            % {sim_op.PLANE_MOD}) - 1000))),
           (a, b) -> a + b) AS s
  FROM q CROSS JOIN (SELECT unnest(generate_series(0,
    {sim_op.LSH_BANDS * band_bits - 1})) AS p)
),
bands0 AS (
  SELECT vec_id, p // {band_bits} AS band,
         sum(CASE WHEN s > 0
                  THEN (1::BIGINT << ({band_bits - 1}
                                      - (p % {band_bits})))
                  ELSE 0 END)::BIGINT AS key
  FROM sums GROUP BY vec_id, p // {band_bits}
),
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, key)
          <= {dedup_op.MAX_BAND_BUCKET}
),
cand AS (
  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id
  FROM bands p JOIN bands c
    ON p.band = c.band AND p.key = c.key AND p.vec_id < c.vec_id
),
pairs AS (
  SELECT cand.probe_id, cand.vec_id,
         round(
           list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, len(pe.v)),
                            i -> pe.v[i] * ce.v[i])), (a,b) -> a + b)
           / (sqrt(list_reduce(list_prepend(0.0,
                list_transform(pe.v, x -> x*x)), (a,b) -> a + b))
              * sqrt(list_reduce(list_prepend(0.0,
                list_transform(ce.v, x -> x*x)), (a,b) -> a + b))), 6) AS cos
  FROM cand JOIN e pe ON pe.vec_id = cand.probe_id
            JOIN e ce ON ce.vec_id = cand.vec_id
)"""

    _EMB_SRC = ("SELECT vec_id, list_transform(embedding, x -> x::DOUBLE)"
                " AS v\n  FROM embeddings")

    sql["ann_lsh"] = _lsh_pairs_sql(_EMB_SRC, LSH_ORACLE_BAND_BITS) + """
SELECT probe_id, vec_id, cos FROM pairs
WHERE probe_id <= 20 ORDER BY probe_id, vec_id"""

    sql["dedup_embedding"] = (
        _lsh_pairs_sql(_EMB_SRC, LSH_ORACLE_BAND_BITS) + """
SELECT probe_id, vec_id, cos FROM pairs
WHERE cos >= 0.3 ORDER BY probe_id, vec_id""")

    _bow_sums = ", ".join(
        f"sum(CASE WHEN d = {i} THEN 1 ELSE 0 END)::DOUBLE"
        for i in range(32))
    _BOW_SRC = f"""SELECT vec_id, [{_bow_sums}] AS v
  FROM (
    SELECT doc_id AS vec_id,
           (('0x' || substr(md5(tok), 1, 15))::BIGINT % 32) AS d
    FROM (SELECT doc_id, unnest({TOKENS_SQL}) AS tok FROM {DOCS})
  ) GROUP BY vec_id"""

    # production band width (16 bits) + mean-centered planes: the
    # documents table's planted near-dups make the full-width banding
    # non-trivially exercised, and integer BoW counts keep the centered
    # quantization bit-exact across engines
    sql["dedup_text_embedding"] = (
        _lsh_pairs_sql(_BOW_SRC, sim_op.BAND_BITS, center=True) + """
SELECT probe_id, vec_id, cos FROM pairs
WHERE cos >= 0.99 ORDER BY probe_id, vec_id""")

    # IVF oracle: the trained centroids are a DETERMINISTIC function of
    # the embeddings table (pure-numpy k-means over the first 4096 vectors
    # in vec_id order — similarity.ivf_train_matrix, shared verbatim), so
    # they embed as literals the same way the LSH plane matrix does. The
    # oracle is built against the driver's comparison scale
    # ($SPARK_GRAFT_ORACLE_SF_DIR, default sf0.01): DuckDB independently
    # recomputes every dot product, list assignment, probe fan-out,
    # candidate join, cosine, and rank from those literals.
    try:
        import numpy as np
        import pyarrow.parquet as pq
        _osf = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                              "/root/testdata/sf0.01")
        _edf = (pq.read_table(os.path.join(_osf, "embeddings.parquet"),
                              columns=["vec_id", "embedding"])
                .to_pandas().sort_values("vec_id").head(4096))
        _C = sim_op.ivf_train_matrix(
            np.array(list(_edf["embedding"]), dtype=np.float64))
        _cent_values = ", ".join(
            "(%d, [%s])" % (j, ", ".join(repr(float(v)) for v in _C[j]))
            for j in range(len(_C)))
    except Exception:
        # comparison-scale parquet unavailable -> omit only this key
        # (the driver then records a rows-only check for ann_ivf instead
        # of the whole oracle dict failing)
        _cent_values = None
    if _cent_values is not None:
        sql["ann_ivf"] = f"""
WITH e AS ({_EMB_SRC}),
cent(cid, c) AS (VALUES {_cent_values}),
dots AS (
  SELECT e.vec_id, cent.cid,
         round(list_reduce(list_prepend(0.0,
           list_transform(generate_series(1, len(e.v)),
                          i -> e.v[i] * cent.c[i])), (a,b) -> a + b), 6)
           AS d
  FROM e CROSS JOIN cent
),
ranked_lists AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d DESC, cid ASC) AS rn
  FROM dots
),
assigned AS (SELECT vec_id, cid AS list_id FROM ranked_lists WHERE rn = 1),
probes AS (
  SELECT vec_id AS probe_id, cid AS list_id FROM ranked_lists
  WHERE vec_id <= {IVF_PROBE_MAX} AND rn <= {sim_op.IVF_NPROBE}
),
cand AS (
  SELECT p.probe_id, a.vec_id
  FROM probes p JOIN assigned a USING (list_id)
  WHERE p.probe_id != a.vec_id
),
pairs AS (
  SELECT cand.probe_id, cand.vec_id,
         round(
           list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, len(pe.v)),
                            i -> pe.v[i] * ce.v[i])), (a,b) -> a + b)
           / (sqrt(list_reduce(list_prepend(0.0,
                list_transform(pe.v, x -> x*x)), (a,b) -> a + b))
              * sqrt(list_reduce(list_prepend(0.0,
                list_transform(ce.v, x -> x*x)), (a,b) -> a + b))), 6)
           AS cos
  FROM cand JOIN e pe ON pe.vec_id = cand.probe_id
            JOIN e ce ON ce.vec_id = cand.vec_id
),
ranked AS (
  SELECT probe_id, vec_id, cos,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT probe_id, vec_id, cos, rank FROM ranked WHERE rank <= 5
ORDER BY probe_id, rank"""

    sql["ann_topk"] = (_COS_PAIR_SQL.format(probe_max=10) + """
, ranked AS (
  SELECT probe_id, vec_id, cos,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT probe_id, vec_id, cos, rank FROM ranked
WHERE rank <= 5 ORDER BY probe_id, rank""")

    # end-to-end pipeline oracle: scoring -> split scrub -> child
    # re-scoring -> z-normalize over the post-scrub set -> keep_percent
    # budget (greedy cum-before rule with (final desc, url asc) tiebreak)
    sql["pipeline_labels"] = f"""
WITH base AS (
  SELECT doc_id,
         'https://' || source || '.example.com/doc/' || doc_id::VARCHAR
           AS url,
         text, length(text) AS n
  FROM {DOCS}
),
total AS (SELECT sum(n) AS total_chars FROM base),
toks AS (
  SELECT doc_id, unnest({TOKENS_SQL}) AS tok,
         generate_subscripts({TOKENS_SQL}, 1) AS pos
  FROM base
),
pos AS (
  SELECT doc_id, tok, pos,
         coalesce(sum(len(tok)) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (pos - 1) AS start_c,
         sum(len(tok)) OVER (PARTITION BY doc_id ORDER BY pos)
           + (pos - 1) AS end_c,
         tok NOT IN ({VOCAB_SQL}) AS bad
  FROM toks
),
runs AS (
  SELECT doc_id, pos, start_c, end_c, bad,
         pos - row_number() OVER (PARTITION BY doc_id, bad ORDER BY pos)
           AS grp
  FROM pos
),
bad_runs AS (
  SELECT doc_id, min(start_c) AS bs, max(end_c) AS be
  FROM runs WHERE bad GROUP BY doc_id, grp
  HAVING max(end_c) - min(start_c) >= {SPLIT_THR}
),
edges AS (
  SELECT b.doc_id, d.n, b.bs, b.be,
         coalesce(lag(b.be) OVER (PARTITION BY b.doc_id ORDER BY b.bs), 0)
           AS prev_end
  FROM bad_runs b JOIN base d USING (doc_id)
),
child_spans AS (
  SELECT doc_id, prev_end AS s, bs AS e FROM edges
  UNION ALL
  SELECT doc_id, max(be) AS s, max(n) AS e FROM edges GROUP BY doc_id
),
children AS (SELECT doc_id, s, e FROM child_spans WHERE e > s),
recs AS (
  SELECT b.doc_id,
         b.url || '_' || (c.s + 1)::VARCHAR || '-' || c.e::VARCHAR AS url,
         c.s AS cs, c.e AS ce, (c.e - c.s)::BIGINT AS n_chars
  FROM children c JOIN base b USING (doc_id)
  UNION ALL
  SELECT doc_id, url, 0, n, n::BIGINT FROM base
  WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM children)
),
rtoks AS (
  SELECT r.url, r.n_chars,
         row_number() OVER (PARTITION BY r.url ORDER BY p.pos) AS rpos,
         CASE WHEN p.tok IN ({VOCAB_SQL}) THEN 1 ELSE 0 END AS ok
  FROM recs r JOIN pos p ON p.doc_id = r.doc_id
       AND p.start_c >= r.cs AND p.end_c <= r.ce
),
wsums AS (
  SELECT url, n_chars, rpos,
         count(*) OVER (PARTITION BY url) AS nt,
         sum(ok) OVER (PARTITION BY url) AS total_ok,
         sum(ok) OVER (PARTITION BY url ORDER BY rpos
                       ROWS BETWEEN CURRENT ROW AND {WINDOW - 1} FOLLOWING)
           AS wsum
  FROM rtoks
),
winq AS (
  SELECT url, max(n_chars) AS n_chars,
         100.0 * max(total_ok) / max(nt) AS mean_q,
         CASE WHEN max(nt) <= {WINDOW}
              THEN 100.0 * max(total_ok) / max(nt)
              ELSE CASE WHEN (min(wsum) FILTER (WHERE rpos <= nt - {WINDOW} + 1)
                              / {WINDOW}.0) < 0.5 / {WINDOW}.0
                        THEN 0.0
                        ELSE 100.0 * (min(wsum)
                               FILTER (WHERE rpos <= nt - {WINDOW} + 1)
                               / {WINDOW}.0)
                   END
         END AS window_q
  FROM wsums GROUP BY url
),
normed AS (
  SELECT url, n_chars, mean_q, window_q,
         {_RATIO} AS ratio,
         CASE WHEN max(mean_q) OVER () <= min(mean_q) OVER () THEN 50.0
              ELSE 100.0 * (mean_q - min(mean_q) OVER ())
                   / (max(mean_q) OVER () - min(mean_q) OVER ())
         END AS mean_q_score,
         100.0 * n_chars / (n_chars + 5000.0) AS length_s
  FROM winq
),
finals AS (
  SELECT *, sqrt(length_s * mean_q_score)
              * ((1.0 - 1.0/3.0) + ratio * (1.0/3.0)) AS final_score
  FROM normed
),
cum AS (
  SELECT f.*, n_chars >= {MIN_LENGTH} AS eligible,
         coalesce(sum(CASE WHEN n_chars >= {MIN_LENGTH} THEN n_chars END)
           OVER (ORDER BY final_score DESC, url ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM finals f
)
SELECT url, n_chars, mean_q, window_q, final_score
FROM cum, total
WHERE eligible AND cum_before < floor(0.9 * total_chars)
ORDER BY url"""

    # the COMPOSED dedup pipeline (pipeline_dedup): lined fixture ->
    # line-boilerplate dedup (min_df=50) -> simhash near-dup dedup over
    # the CLEANED text keyed by md5-60(url) (4x15-bit bands, hot-bucket
    # cap, hamming <= 3, recursive-walk connected components, min-key
    # survivor) -> the pipeline_labels scoring/normalize/budget SQL over
    # survivors. Budget base = RAW (pre-clean) char total, matching
    # run_filter's Observation placement.
    _band_w = dedup_op.SIMHASH_BITS // dedup_op.SIMHASH_BANDS
    sql["pipeline_dedup"] = f"""
WITH RECURSIVE lined AS (
  SELECT doc_id,
         'https://' || source || '.example.com/doc/' || doc_id::VARCHAR
           AS url,
         CASE WHEN doc_id % 3 = 0
              THEN '{LINE_HEADER}' || chr(10) ELSE '' END
         || array_to_string(list_transform(
              generate_series(1, ((len(string_split(text, ' ')) - 1)
                                  // {LINE_WIDTH}) + 1),
              g -> array_to_string(
                string_split(text, ' ')[(g-1)*{LINE_WIDTH}+1
                                        : (g-1)*{LINE_WIDTH}+{LINE_WIDTH}],
                ' ')), chr(10))
         || CASE WHEN doc_id % 4 = 0
                 THEN chr(10) || '{LINE_FOOTER}' ELSE '' END AS text
  FROM {DOCS}
),
total AS (SELECT sum(len(text)) AS total_chars FROM lined),
llines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM lined
),
lhot AS (
  SELECT line FROM llines WHERE trim(line) <> ''
  GROUP BY line HAVING count(DISTINCT doc_id) >= 50
),
lkept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM llines l LEFT JOIN lhot h USING (line) WHERE h.line IS NULL
),
clean0 AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM lkept GROUP BY doc_id
),
clean AS (
  SELECT ld.doc_id, ld.url,
         ('0x' || substr(md5(ld.url), 1, 15))::BIGINT AS key,
         coalesce(c.text, '') AS text
  FROM lined ld LEFT JOIN clean0 c USING (doc_id)
),
shtoks AS (SELECT key, unnest({TOKENS_SQL}) AS tok FROM clean),
shbits AS (
  SELECT key, b,
         CASE WHEN (('0x' || substr(md5(tok), 1, 15))::BIGINT >> b) & 1 = 1
              THEN 1 ELSE -1 END AS vote
  FROM shtoks CROSS JOIN (SELECT unnest(generate_series(
       0, {dedup_op.SIMHASH_BITS - 1})) AS b)
),
shvotes AS (SELECT key, b, sum(vote) AS v FROM shbits GROUP BY key, b),
fp AS (
  SELECT key,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
           AS simhash
  FROM shvotes GROUP BY key
),
bands0 AS (
  SELECT key, simhash, b AS band,
         (simhash >> (b * {_band_w})) & {(1 << _band_w) - 1} AS bkey
  FROM fp CROSS JOIN (SELECT unnest(generate_series(
       0, {dedup_op.SIMHASH_BANDS - 1})) AS b)
),
bands AS (
  SELECT * FROM bands0
  QUALIFY count(*) OVER (PARTITION BY band, bkey)
          <= {dedup_op.MAX_BAND_BUCKET}
),
cpairs AS (
  SELECT DISTINCT a.key AS ka, b.key AS kb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.key < b.key
  WHERE bit_count(xor(a.simhash, b.simhash))
        <= {dedup_op.SIMHASH_MAX_DIST}
),
cedges AS (
  SELECT ka AS src, kb AS dst FROM cpairs
  UNION
  SELECT kb, ka FROM cpairs
),
walk(node, rep) AS (
  SELECT src, src FROM cedges
  UNION
  SELECT e.dst, w.rep FROM walk w JOIN cedges e ON e.src = w.node
),
comps AS (SELECT node, min(rep) AS rep FROM walk GROUP BY node),
surv AS (
  SELECT c.url, c.text, len(c.text)::BIGINT AS n_chars
  FROM clean c LEFT JOIN comps ON comps.node = c.key
  WHERE coalesce(comps.rep, c.key) = c.key
),
rtoks AS (
  SELECT url, n_chars,
         generate_subscripts({TOKENS_SQL}, 1) AS rpos,
         CASE WHEN unnest({TOKENS_SQL}) IN ({VOCAB_SQL})
              THEN 1 ELSE 0 END AS ok
  FROM surv
),
wsums AS (
  SELECT url, n_chars, rpos,
         count(*) OVER (PARTITION BY url) AS nt,
         sum(ok) OVER (PARTITION BY url) AS total_ok,
         sum(ok) OVER (PARTITION BY url ORDER BY rpos
                       ROWS BETWEEN CURRENT ROW AND {WINDOW - 1} FOLLOWING)
           AS wsum
  FROM rtoks
),
winq AS (
  SELECT url, max(n_chars) AS n_chars,
         100.0 * max(total_ok) / max(nt) AS mean_q,
         CASE WHEN max(nt) <= {WINDOW}
              THEN 100.0 * max(total_ok) / max(nt)
              ELSE CASE WHEN (min(wsum) FILTER (WHERE rpos <= nt - {WINDOW} + 1)
                              / {WINDOW}.0) < 0.5 / {WINDOW}.0
                        THEN 0.0
                        ELSE 100.0 * (min(wsum)
                               FILTER (WHERE rpos <= nt - {WINDOW} + 1)
                               / {WINDOW}.0)
                   END
         END AS window_q
  FROM wsums GROUP BY url
),
normed AS (
  SELECT url, n_chars, mean_q, window_q,
         {_RATIO} AS ratio,
         CASE WHEN max(mean_q) OVER () <= min(mean_q) OVER () THEN 50.0
              ELSE 100.0 * (mean_q - min(mean_q) OVER ())
                   / (max(mean_q) OVER () - min(mean_q) OVER ())
         END AS mean_q_score,
         100.0 * n_chars / (n_chars + 5000.0) AS length_s
  FROM winq
),
finals AS (
  SELECT *, sqrt(length_s * mean_q_score)
              * ((1.0 - 1.0/3.0) + ratio * (1.0/3.0)) AS final_score
  FROM normed
),
cum AS (
  SELECT f.*, n_chars >= {MIN_LENGTH} AS eligible,
         coalesce(sum(CASE WHEN n_chars >= {MIN_LENGTH} THEN n_chars END)
           OVER (ORDER BY final_score DESC, url ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM finals f
)
SELECT url, n_chars, mean_q, window_q, final_score
FROM cum, total
WHERE eligible AND cum_before < floor(0.9 * total_chars)
ORDER BY url"""

    pii_cols = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}, "
        f"coalesce(list_reduce(list_prepend(0::INT, list_transform("
        f"regexp_extract_all(text, '{pat}'), m -> len(m)::INT)), "
        f"(a, b) -> a + b), 0) AS chars_{name}"
        for name, pat in PII_NAMED)
    sql["pii_stats"] = f"""
SELECT doc_id, {pii_cols} FROM {DOCS} ORDER BY doc_id"""

    sql["events_rollup"] = """
SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
       count(*) AS n_events,
       sum(cast(round(value * 100) AS BIGINT))::BIGINT AS value_cents
FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type"""

    sql["events_sessions"] = """
WITH e AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us, value FROM events
),
s AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 30 * 60 * 1000000
                 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s2 AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
  FROM s
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       sum(cast(round(value * 100) AS BIGINT))::BIGINT AS value_cents
FROM s2 GROUP BY user_id, session_idx ORDER BY user_id, session_idx"""

    from filtlong_spark.functions import weburl as _weburl
    # percent-encoding normalization: the identical literal rule chain
    # (same rules, same order) as weburl.percent_rules(), rendered as
    # nested replace() calls — chunked into layered CTEs of 100 because
    # DuckDB's binder caps expression nesting at 128
    _pn_rules = list(_weburl.percent_rules())
    _pn_ctes, _pn_prev = [], "s3a"
    for _ci in range(0, len(_pn_rules), 100):
        _pn_expr = "u"
        for _pat, _rep in _pn_rules[_ci:_ci + 100]:
            _pn_expr = f"replace({_pn_expr}, '{_pat}', '{_rep}')"
        # mirror the Spark side's %-gate: the chain only runs on URLs
        # that contain encoding (identity otherwise)
        _pn_expr = (f"CASE WHEN position('%' IN u) > 0 "
                    f"THEN {_pn_expr} ELSE u END")
        _name = (f"pn{_ci // 100}"
                 if _ci + 100 < len(_pn_rules) else "s3")
        _pn_ctes.append(f"{_name} AS (SELECT doc_id, url, {_pn_expr} AS u "
                        f"FROM {_pn_prev})")
        _pn_prev = _name
    _PN_CTES = ",\n".join(_pn_ctes)
    _CANON_CTES = f"""
WITH base AS (
  SELECT doc_id, (doc_id // 2)::VARCHAR AS id2,
         'w' || ((doc_id // 2) % 7)::VARCHAR AS host, doc_id % 6 AS v
  FROM {DOCS}
),
noisy AS (
  SELECT doc_id, CASE v
    WHEN 0 THEN 'https://' || host || '.example.com/doc/' || id2
    WHEN 1 THEN 'HTTPS://' || upper(host) || '.EXAMPLE.COM/doc/' || id2
                || '#top'
    WHEN 2 THEN 'https://' || host || '.example.com/doc/' || id2
                || '/?utm_source=feed&x=1'
    WHEN 3 THEN 'https://' || host || '.example.com:443/doc/' || id2
                || '?utm_campaign=a'
    WHEN 4 THEN 'https://' || host || '.example.com/%64oc/' || id2
                || '?%75tm_source=x'
    ELSE 'https://' || host || '.example.com/doc/' || id2
         || '?&&x=a%3b&&' END AS url
  FROM base
),
s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM noisy),
s2 AS (
  SELECT doc_id, url,
         lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
         || substr(u, length(regexp_extract(u,
              '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) + 1) AS u
  FROM s1
),
s3a AS (
  SELECT doc_id, url,
         regexp_replace(regexp_replace(u,
           '^(http://[^/?#:]*):80($|[/?#])', '\\1\\2'),
           '^(https://[^/?#:]*):443($|[/?#])', '\\1\\2') AS u
  FROM s2
),
{_PN_CTES},
s4 AS (
  SELECT doc_id, url, u,
         regexp_replace(u, '\\?.*$', '') AS b,
         CASE WHEN position('?' IN u) > 0
              THEN list_filter(
                     string_split(regexp_replace(u, '^[^?]*\\?', ''), '&'),
                     p -> NOT regexp_matches(p,
                            '{_weburl.TRACKING_RE}') AND p <> '')
              ELSE [] END AS kept
  FROM s3
),
s5 AS (
  SELECT doc_id, url,
         CASE WHEN len(kept) = 0 THEN b
              ELSE b || '?' || array_to_string(kept, '&') END AS u
  FROM s4
),
canon AS (
  SELECT doc_id, url,
         regexp_replace(u,
           '(://[^/?#]+/[^?#]*[^/?#])/((\\?[^#]*)?)$', '\\1\\2')
           AS canonical_url
  FROM s5
)"""

    sql["url_canon"] = _CANON_CTES + """
SELECT doc_id, url, canonical_url FROM canon ORDER BY doc_id"""

    sql["dedup_url"] = _CANON_CTES + """
SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM canon GROUP BY canonical_url HAVING count(*) > 1
ORDER BY canonical_url"""

    sql["split_assign"] = f"""
WITH b AS (
  SELECT doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100)
           AS bucket
  FROM {DOCS}
)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id"""

    _PR_SCALE = 10 ** 12
    _pr_steps = []
    for k in range(1, PR_ITERS + 1):
        _pr_steps.append(f"""r{k} AS (
  SELECT nd.host,
         (15 * {_PR_SCALE}::BIGINT) // (100 * (SELECT count(*) FROM nodes))
           + (85 * coalesce(s.inflow, 0)) // 100 AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS host, sum(p.rank // d.deg)::BIGINT AS inflow
    FROM r{k - 1} p JOIN edges e ON p.host = e.src
                    JOIN deg d ON e.src = d.src
    GROUP BY e.dst) s USING (host))""")
    _PR_STEPS_SQL = ",\n".join(_pr_steps)
    sql["host_rank"] = f"""
WITH hosts AS (SELECT DISTINCT source AS dst FROM {DOCS}),
idx AS (SELECT dst, row_number() OVER (ORDER BY dst) - 1 AS idx
        FROM hosts),
doc_edges AS (
  SELECT source AS src,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
           % (SELECT count(*) FROM hosts) AS idx
  FROM {DOCS}
),
edges AS (SELECT DISTINCT e.src, i.dst
          FROM doc_edges e JOIN idx i USING (idx)),
nodes AS (SELECT src AS host FROM edges
          UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT host,
              {_PR_SCALE}::BIGINT // (SELECT count(*) FROM nodes) AS rank
       FROM nodes),
{_PR_STEPS_SQL}
SELECT host, rank FROM r{PR_ITERS} ORDER BY host"""

    _SHARES_SQL = ", ".join(f"('{g}', {s!r}::DOUBLE)"
                            for g, s in sorted(MIXTURE_SHARES.items()))
    sql["mixture_sample"] = f"""
WITH t AS (
  SELECT doc_id, lang AS "group",
         len({TOKENS_SQL})::BIGINT AS n_tok
  FROM {DOCS}
),
c AS (
  SELECT "group", sum(n_tok)::BIGINT AS group_tokens
  FROM t GROUP BY "group"
),
s("group", share) AS (VALUES {_SHARES_SQL}),
p AS (
  SELECT c."group", c.group_tokens,
         CASE WHEN s.share IS NOT NULL AND c.group_tokens > 0
              THEN least(1.0::DOUBLE,
                         s.share * {float(MIXTURE_BUDGET)!r}
                           / c.group_tokens)
              ELSE 0.0 END AS p_keep
  FROM c LEFT JOIN s USING ("group")
)
SELECT t.doc_id, t."group", t.n_tok, p.group_tokens, p.p_keep,
       (('0x' || substr(md5(t.doc_id::VARCHAR), 1, 15))::BIGINT
          / {float(1 << 60)!r}) < p.p_keep AS sampled
FROM t JOIN p USING ("group") ORDER BY doc_id"""

    sql["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id, lang AS "group",
         len({TOKENS_SQL})::BIGINT AS n_tok
  FROM {DOCS}
),
c AS (
  SELECT doc_id, "group", n_tok,
         sum(n_tok) OVER (PARTITION BY "group"
                          ORDER BY doc_id, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, "group", n_tok,
       (cum - n_tok)::BIGINT AS start_tok,
       (cum - n_tok)::BIGINT // {PACK_CAPACITY} AS first_seq,
       greatest(cum - 1, cum - n_tok)::BIGINT // {PACK_CAPACITY}
         AS last_seq
FROM c ORDER BY doc_id"""

    sql["ppl_buckets"] = f"""
WITH per AS (
  SELECT doc_id, lang,
         CASE WHEN len({TOKENS_SQL}) > 0
              THEN 100.0 * len(list_filter({TOKENS_SQL},
                                           t -> t IN ({VOCAB_SQL})))
                   / len({TOKENS_SQL})
              ELSE 0.0 END AS score
  FROM {DOCS}
),
b AS (
  SELECT doc_id, lang, score,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY score DESC, doc_id) AS bucket
  FROM per
)
SELECT doc_id, lang, score, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS label
FROM b ORDER BY doc_id"""

    _words_hit = " OR ".join(
        f"contains(lower(text), '{w.lower()}')" for w in BLOCK_WORDS)
    sql["blocklist"] = f"""
WITH blocked AS (
  SELECT DISTINCT source AS host FROM {DOCS}
  WHERE substr(md5(source), 1, 1) IN ('0', '1')
)
SELECT doc_id, d.source AS host,
       b.host IS NOT NULL AS blocked_host,
       ({_words_hit}) AS blocked_word,
       NOT (b.host IS NOT NULL OR ({_words_hit})) AS keep
FROM {DOCS} d LEFT JOIN blocked b ON d.source = b.host
ORDER BY doc_id"""

    sql["host_sample"] = f"""
WITH counts AS (
  SELECT source AS host, count(*) AS n_host FROM {DOCS} GROUP BY 1
),
scored AS (
  SELECT d.doc_id, c.host, c.n_host,
         least(1.0, sqrt({HOST_SAMPLE_TARGET}.0 / c.n_host)) AS p_keep,
         ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT
           / {float(1 << 60)!r} AS u01
  FROM {DOCS} d JOIN counts c ON d.source = c.host
)
SELECT doc_id, host, n_host, p_keep, u01 < p_keep AS sampled
FROM scored ORDER BY doc_id"""

    sql["host_gate"] = f"""
WITH per AS (
  SELECT doc_id, source AS host,
         len({TOKENS_SQL}) AS n_tok,
         len(list_filter({TOKENS_SQL}, t -> t IN ({VOCAB_SQL}))) AS good
  FROM {DOCS}
),
hs AS (
  SELECT host, CASE WHEN sum(n_tok) > 0
              THEN 100.0 * sum(good) / sum(n_tok)
              ELSE 0.0 END AS host_mean_q
  FROM per GROUP BY host
)
SELECT p.doc_id, p.host, h.host_mean_q,
       h.host_mean_q >= {HOST_GATE_MIN_Q} AS keep
FROM per p JOIN hs h USING (host) ORDER BY doc_id"""

    sql["dup_check"] = f"""
SELECT doc_id, count(*) AS n FROM {DOCS}
GROUP BY doc_id HAVING count(*) > 1 ORDER BY doc_id"""

    sql["lang_profile"] = f"""
WITH per AS (
  SELECT lang, n_chars,
         len({TOKENS_SQL}) AS n_tok,
         len(list_filter({TOKENS_SQL}, t -> t IN ({VOCAB_SQL}))) AS good
  FROM {DOCS}
)
SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS chars,
       sum(n_tok)::BIGINT AS tokens,
       100.0 * sum(good) / sum(n_tok) AS mean_q
FROM per GROUP BY lang ORDER BY lang"""

    return sql
