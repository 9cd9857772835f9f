"""Deduplication operators for a training-data pipeline.

Beyond the reference's scope (it aborts on duplicate names,
src/main.cpp:113-117) — these are the dedup stages a 100 TB corpus needs:

- exact: normalize -> md5 -> groupBy (one shuffle on the hash; at scale,
  pre-partition by hash prefix and the agg is map-side-heavy)
- minhash + LSH: shingle -> k md5-permutation minhashes -> band -> bucket
  join. All JVM-side (explode + groupBy min), no Python.
- simhash: 16-bit weighted-bit fingerprint from token md5s
- n-gram Jaccard: shared-shingle candidate join + exact Jaccard
- embedding cosine near-dup lives in operators/similarity.py

Every operator here is mirrored by an exact DuckDB SQL oracle in
__spark_entry__.py (same md5-derived hashes -> identical values in both
engines, no float ambiguity except cosine, which is rounded).

Tokenization note (round-5 ADVICE item): the Python window/shingle
kernels tokenize with core.TOKEN_RE (Python Unicode \\S), while the
DuckDB oracles use RE2 \\S semantics — on text containing non-ASCII
whitespace (NBSP, ideographic space) the two can split differently.
The corpora this repo is checked against are ASCII (verified across
every SF, incl. the driver-generated ones), where both agree exactly;
a production deployment mixing the Python kernels with the SQL mirrors
on non-ASCII text should pin one convention (re.ASCII matches RE2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

NORM_EXPR = "replace(text, ' dup', '')"  # testdata near-dup normalizer


def _doc_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle): distinct word n-gram shingles per doc, built
    MAP-SIDE in one Arrow pass — zero shuffle, parallelism = input
    partitions. Fully vectorized (the round-5 per-doc Python loop with
    a per-shingle ' '.join is gone): flat batch tokenization
    (core.batch_tokenize), all windows via shifted-slice binary_join
    (core.flat_ngram_windows), per-doc distinct via an Arrow C++ hash
    group_by, and the result yielded as a RecordBatch — shingle strings
    never materialize as Python objects. (A Catalyst array-HOF
    formulation stays rejected: interpreted per element; a lead()-window
    one shuffles.)"""
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    from .. import core  # definition-time capture -> pickled by value

    def mapper(batches):
        import numpy as np
        import pyarrow as pa
        for rb in batches:
            texts = [t if t is not None else ""
                     for t in rb.column("text").to_pylist()]
            ids = rb.column("doc_id").to_numpy(zero_copy_only=False)
            tb = core.batch_tokenize(texts)
            d, _, wins = core.flat_ngram_windows(tb, n)
            if not len(d):
                continue
            uniq = (pa.table({"d": pa.array(d), "shingle": wins})
                    .group_by(["d", "shingle"]).aggregate([]))
            du = uniq.column("d").to_numpy()
            yield pa.record_batch(
                [pa.array(ids[du].astype(np.int64)),
                 uniq.column("shingle").combine_chunks()],
                names=["doc_id", "shingle"])

    return docs.select("doc_id", "text").mapInArrow(
        mapper, schema="doc_id long, shingle string")


# Affine minhash permutations over the md5-derived 60-bit shingle hash:
# mh_h(s) = (A_h * (h60(s) mod P) + B_h) mod P, P = 2^31 - 1. One md5 per
# shingle (not one per seed!) and every product fits exactly in int64 /
# BIGINT, so both engines compute identical values. Constants are fixed
# literals mirrored into the SQL oracle.
MH_PRIME = (1 << 31) - 1


def _mh_params(n_hashes: int) -> tuple[list[int], list[int]]:
    a = [(2 * h + 1) * 2654435761 % MH_PRIME for h in range(n_hashes)]
    b = [(h * 40503 + 17) % MH_PRIME for h in range(n_hashes)]
    return a, b


def _doc_shingle_h60(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, h60): the md5-60 hash of every DISTINCT word n-gram
    shingle per doc — _doc_shingles with the hashing pulled INTO the
    mapper: shingle strings never leave Python (the JVM previously
    md5'd every (doc, shingle) row; here each distinct window of a
    batch hashes once via dictionary_encode + _md5_60_arrow, and the
    per-doc distinct runs on packed ints). Values equal
    conv(substring(md5(shingle), 1, 15), 16, 10) exactly."""
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    from .. import core  # definition-time capture -> pickled by value

    def mapper(batches):
        import numpy as np
        import pyarrow as pa
        for rb in batches:
            texts = [t if t is not None else ""
                     for t in rb.column("text").to_pylist()]
            ids = rb.column("doc_id").to_numpy(zero_copy_only=False)
            tb = core.batch_tokenize(texts)
            d, _, wins = core.flat_ngram_windows(tb, n)
            if not len(d):
                continue
            de = wins.dictionary_encode()
            codes = de.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            h60 = _md5_60_arrow(de.dictionary)
            K = len(de.dictionary)
            pairs = np.unique(d * K + codes)
            yield pa.record_batch(
                [pa.array(ids[pairs // K].astype(np.int64)),
                 pa.array(h60[pairs % K])],
                names=["doc_id", "h60"])

    return docs.select("doc_id", "text").mapInArrow(
        mapper, schema="doc_id long, h60 long")


def minhash_wide(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, mh0..mh7): one Python shingling+hashing pass
    (_doc_shingle_h60 — shingle text never reaches the JVM) -> 8 affine
    permutations -> groupBy(doc_id).min. Partial aggregation collapses
    each partition to one row per doc before the shuffle, so the
    exchange carries ~32 bytes per doc — at corpus scale the plan is
    one Python pass + a near-free min-combine. mh values are identical
    to the previous JVM-md5 rendering (same 60-bit prefix; min over
    the same per-doc hash set)."""
    sh = _doc_shingle_h60(docs, shingle_n)
    a, b = _mh_params(N_HASHES)
    hm = F.col("h60") % F.lit(MH_PRIME)
    aggs = [F.min((F.lit(a[h]) * hm + F.lit(b[h])) % F.lit(MH_PRIME))
            .alias(f"mh{h}") for h in range(N_HASHES)]
    return sh.groupBy("doc_id").agg(*aggs)


def exact_dupes(docs: DataFrame, key_expr: str = NORM_EXPR) -> DataFrame:
    """Exact dedup groups: (text_hash, n_docs, keep_doc_id). keep = min id
    (first writer wins); groups of 1 are excluded (nothing to dedupe)."""
    return (docs
            .withColumn("text_hash", F.md5(F.expr(key_expr).cast("binary")))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


N_HASHES = 8
BAND_ROWS = 2  # 4 bands x 2 rows


def minhash_signatures(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, h (0..7), minhash): minhash_i = lexicographic min over the
    doc's shingles of md5(i || ':' || shingle). Explode + groupBy min —
    partial aggregation does the heavy lifting map-side."""
    wide = minhash_wide(docs, shingle_n)
    stack = ", ".join(f"{h}, mh{h}" for h in range(N_HASHES))
    return wide.selectExpr(
        "doc_id", f"stack({N_HASHES}, {stack}) AS (h, minhash)")


MAX_BAND_BUCKET = 1000  # hot-bucket guard (mirrored in the SQL oracle)


def _cap_buckets(bands: DataFrame, keys: list[str],
                 max_bucket: int | None) -> DataFrame:
    """Drop band buckets holding more than max_bucket docs — a bucket of
    B docs yields B^2/2 candidate pairs, so one 10^6-doc duplicate
    cluster would otherwise explode the self-join. Clusters that large
    belong to EXACT dedup (run first in a real pipeline); the cap is
    mirrored in the DuckDB oracles."""
    if max_bucket is None:
        return bands
    sizes = (bands.groupBy(*keys).agg(F.count("*").alias("_bs"))
             .filter(F.col("_bs") <= max_bucket).drop("_bs"))
    return bands.join(sizes, keys)


def lsh_candidate_pairs(docs: DataFrame, shingle_n: int = 3,
                        max_bucket: int | None = MAX_BAND_BUCKET
                        ) -> DataFrame:
    """LSH banding: band key = concat of the band's minhashes; docs sharing
    a band bucket become candidate pairs (a < b). The join is on band_key —
    a self-equi-join on a high-cardinality key, shuffle-partitioned, no
    cross product; buckets above max_bucket docs are dropped (hot-key
    guard, see _cap_buckets)."""
    wide = minhash_wide(docs, shingle_n)
    n_bands = N_HASHES // BAND_ROWS
    band_rows = []
    for b in range(n_bands):
        hs = range(b * BAND_ROWS, (b + 1) * BAND_ROWS)
        band_rows.append(
            (b, F.concat_ws("|", *[
                F.concat_ws(":", F.lit(str(h)), F.col(f"mh{h}")) for h in hs])))
    bands = wide.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), key.alias("band_key"))
            for b, key in band_rows])).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"),
             F.col("bk.band_key").alias("band_key"))
    # the band table is consumed 4x (bucket sizes + both self-join
    # sides): localCheckpoint materializes the Python shingling pass
    # ONCE (~40 B/doc rows) instead of re-executing it per consumer.
    # MUST be eager: a lazy localCheckpoint fires the query-execution
    # listener with an empty CollectMetrics accumulator, permanently
    # poisoning any upstream Observation (pipeline.py's raw-char
    # counter) with None — eager fires it AFTER the job, with the
    # correct totals.
    bands = bands.localCheckpoint(eager=True)
    bands = _cap_buckets(bands, ["band", "band_key"], max_bucket)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    return pairs


MAX_SHINGLE_DF = 1000  # hot-shingle guard (mirrored in the SQL oracle)


def jaccard_pairs(docs: DataFrame, shingle_n: int = 5,
                  threshold: float = 0.5,
                  max_doc_freq: int | None = MAX_SHINGLE_DF) -> DataFrame:
    """Exact n-gram Jaccard over shared-shingle candidates:
    (doc_a, doc_b, inter, union, jaccard >= threshold). Candidate
    generation via shingle equi-join (docs with no shared shingle never
    pair). Jaccard kept as an exact ratio of integers.

    Hot-shingle guard (the 100 TB survival rule): a boilerplate shingle
    appearing in 10^6 docs would turn the self-join into a 10^12-pair key.
    Shingles with document frequency > max_doc_freq are dropped from the
    UNIVERSE (both intersections and sizes), so Jaccard is computed over
    the informative shingles only — the standard stop-shingle semantics,
    mirrored exactly in the DuckDB oracle."""
    sh = _doc_shingles(docs, shingle_n)
    # consumed 4x (doc-frequency count, sizes, both join sides):
    # materialize the shingling pass once (eager: see the Observation
    # note in lsh_candidate_pairs)
    sh = sh.localCheckpoint(eager=True)
    if max_doc_freq is not None:
        dfreq = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
                 .filter(F.col("df") <= max_doc_freq))
        sh = sh.join(dfreq.select("shingle"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n_sh", "n_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n_sh", "n_b"), "doc_b")
           .withColumn("jaccard",
                       F.col("inter").cast("double")
                       / (F.col("n_a") + F.col("n_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("doc_a", "doc_b", "inter", "jaccard"))
    return out


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(node, rep): connected components of the near-dup pair graph via
    min-label propagation to fixpoint — the step that turns candidate
    PAIRS into keep/drop GROUPS (rep = smallest doc_id reachable).

    Scale shape: each iteration is one equi-join of the (pairs-only) edge
    list with the label table, a min-aggregate, and a pointer-jump
    (rep := rep's rep — path halving, so even long chains converge in
    O(log n) rounds); only docs that appear in a pair participate.
    localCheckpoint truncates the lineage each round (the iterative-Spark
    requirement — without it the logical plan grows without bound)."""
    edges = (pairs.select(F.col("doc_a").alias("src"),
                          F.col("doc_b").alias("dst"))
             .union(pairs.select(F.col("doc_b").alias("src"),
                                 F.col("doc_a").alias("dst")))
             .distinct().localCheckpoint())
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("rep", F.col("node")).localCheckpoint())
    changed = 0
    for _ in range(max_iter):
        msgs = (edges.join(labels, edges.src == labels.node)
                .select(F.col("dst").alias("node"), "rep"))
        new_labels = (msgs.union(labels.select("node", "rep"))
                      .groupBy("node").agg(F.min("rep").alias("rep")))
        # pointer jump: follow one extra hop through the rep chain
        # (renamed-column self-join: alias() resolution through a pending
        # localCheckpoint trips an AttributeMap miss in Spark 4.1)
        hop = new_labels.select(F.col("node").alias("jnode"),
                                F.col("rep").alias("jrep"))
        new_labels = (new_labels
                      .join(hop, F.col("rep") == F.col("jnode"), "left")
                      .select("node",
                              F.coalesce("jrep", "rep").alias("rep"))
                      .localCheckpoint())
        changed = (new_labels.join(
            labels.withColumnRenamed("rep", "old"), "node")
            .filter(F.col("rep") < F.col("old")).count())
        labels = new_labels
        if changed == 0:
            break
    if changed > 0:
        # exiting via the iteration cap with labels still moving means a
        # WRONG dedup grouping, not a crash — make it loud (pointer
        # jumping needs a pathological component diameter to get here)
        raise RuntimeError(
            f"Error: connected_components did not converge within "
            f"{max_iter} iterations ({changed} labels still changing); "
            "raise max_iter")
    return labels


def dedup_assign(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Final dedup labels for EVERY doc: (doc_id, rep_id, is_dup) — docs
    outside any pair represent themselves; within a component the
    smallest doc_id survives (first-writer-wins, like exact_dupes)."""
    comps = connected_components(pairs)
    return (docs.select("doc_id")
            .join(comps.withColumnRenamed("node", "doc_id"), "doc_id",
                  "left")
            .select("doc_id",
                    F.coalesce("rep", F.col("doc_id")).alias("rep_id"))
            .withColumn("is_dup", F.col("rep_id") != F.col("doc_id")))


# --- pipeline composition (FilterConfig.near_dup_dedup /
# --- line_dedup_min_df): the bridges from url-keyed PAGES to the
# --- doc_id-keyed dedup operators above ------------------------------------

def url_doc_key(col: Column | str = "url") -> Column:
    """int64 dedup key for a url-keyed page: the md5-60 prefix (the
    repo's one shared hash kernel, md5_60_of_distinct — mirrored in
    DuckDB as ('0x' || substr(md5(url), 1, 15))::BIGINT). 60-bit
    collisions (expected ~n^2/2^61 pairs, ~10^5 at 10^12 docs) can only
    cause a FALSE near-dup drop of one page — acceptable for a dedup
    verdict, unlike a scoring-identity key (see lm.py's loud-failure
    stance for that case)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15),
                  16, 10).cast("long")


def near_dup_url_labels(pages: DataFrame, method: str) -> DataFrame:
    """(url, is_dup) for every page: banded near-dup candidate pairs
    ('simhash' | 'minhash') -> connected components -> within each
    component the min-key page survives, the rest are duplicates. The
    scale shape is the underlying operators' (capped banded equi-joins +
    min-label propagation); this adds only a doc-grain key projection
    and the verdict join back to urls."""
    docs = pages.select("url", url_doc_key("url").alias("doc_id"), "text")
    if method == "simhash":
        pairs = simhash_pairs(docs)
    elif method == "minhash":
        pairs = lsh_candidate_pairs(docs, shingle_n=3)
    else:
        raise ValueError(f"Error: unknown near_dup_dedup {method!r}")
    assign = dedup_assign(docs, pairs)
    return (docs.select("url", "doc_id").join(assign, "doc_id")
            .select("url", "is_dup"))


def line_clean_pages(pages: DataFrame, min_df: int,
                     text_col: str = "text") -> DataFrame:
    """Replace each page's text with its line-dedup-cleaned text (see
    line_dedup), preserving every other column. One extra doc-grain
    equi-join on url to reattach the cleaned text — the cleaned side
    carries text only, so at scale AQE plans it as a plain shuffled
    hash join keyed on the url (both sides corpus-sized, no broadcast
    expectation)."""
    docs = pages.select(F.col("url").alias("doc_id"), F.col(text_col))
    cleaned = line_dedup(docs, min_df, text_col=text_col)
    return (pages.drop(text_col)
            .join(cleaned.withColumnRenamed("doc_id", "url")
                  .withColumnRenamed("text_clean", text_col), "url"))


LINE_DEDUP_MIN_DF = 50


def line_dedup(docs: DataFrame, min_df: int = LINE_DEDUP_MIN_DF,
               text_col: str = "text") -> DataFrame:
    """(doc_id, text_clean): LINE-level boilerplate removal — the
    CCNet/RefinedWeb dedup grain between exact-doc and near-doc: a line
    occurring in >= min_df DISTINCT documents (cookie banners,
    nav/footer boilerplate) is removed from every document; surviving
    lines re-join in original order. Blank lines are never counted as
    boilerplate (they'd all collapse onto one key).

    Scale shape: ONE line-grain shuffle of (md5-60 hash, doc_id) int
    pairs — line TEXT never rides an exchange (the round-5 shape
    shuffled line strings through the count, an anti-join, and a
    collect_list reassembly) — then the boilerplate hash set (tiny by
    construction: <= total_lines / min_df entries) collects to the
    driver, broadcasts, and one map-only Arrow pass splits, hashes
    (dedup._md5_60_arrow over the value buffer), drops members, and
    re-joins survivors in order. The 60-bit key follows the
    url_doc_key precedent: a collision (expected ~n^2/2^61 line pairs)
    can only misclassify one line as boilerplate — acceptable for a
    dedup verdict. Mirrored by the dedup_lines DuckDB oracle (same
    split, same trim-blank exclusion, same min_df)."""
    import numpy as np

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    lines = docs.select(
        "doc_id",
        F.explode(F.split(F.col(text_col), "\n", -1)).alias("line"))
    hline = F.conv(F.substring(F.md5(F.col("line").cast("binary")), 1, 15),
                   16, 10).cast("long")
    hot_rows = (lines.filter(F.trim(F.col("line")) != "")
                .select(hline.alias("h"), "doc_id")
                .groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
                .filter(F.col("df") >= min_df)
                .select("h").collect())
    hot = np.sort(np.array([r["h"] for r in hot_rows], dtype=np.int64))
    bc = docs.sparkSession.sparkContext.broadcast(hot)

    def mapper(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        hot_v = bc.value
        for rb in batches:
            if not rb.num_rows:
                continue
            key_col = rb.column("doc_id")
            txt = pc.fill_null(rb.column(text_col), "")
            parts = pc.split_pattern(txt, "\n")
            counts = pc.list_value_length(parts).to_numpy(
                zero_copy_only=False).astype(np.int64)
            flat = parts.flatten()
            if hot_v.size and len(flat):
                h = _md5_60_arrow(flat.combine_chunks()
                                  if isinstance(flat, pa.ChunkedArray)
                                  else flat)
                idx = np.searchsorted(hot_v, h)
                idx[idx == hot_v.size] = 0
                keep = hot_v[idx] != h
            else:
                keep = np.ones(len(flat), dtype=bool)
            surv = np.zeros(rb.num_rows, dtype=np.int64)
            if len(flat):
                doc_of = np.repeat(np.arange(rb.num_rows), counts)
                surv = np.bincount(doc_of[keep], minlength=rb.num_rows)
            soff = np.zeros(rb.num_rows + 1, dtype=np.int64)
            np.cumsum(surv, out=soff[1:])
            values = flat.filter(pa.array(keep)) if len(flat) \
                else flat
            clean = pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(soff, type=pa.int32()), values), "\n")
            yield pa.record_batch([key_col, clean],
                                  names=["doc_id", "text_clean"])

    key_type = dict(docs.dtypes)["doc_id"]
    return docs.select("doc_id", text_col).mapInArrow(
        mapper, schema=f"doc_id {key_type}, text_clean string")


SIMHASH_BITS = 60     # production width: first 15 md5 hex chars -> exact
SIMHASH_BANDS = 4     # BIGINT in both engines; 4 bands x 15 bits
SIMHASH_MAX_DIST = 3  # any d<=3 pair must agree on >=1 band (pigeonhole)


def simhash_pairs(docs: DataFrame,
                  max_dist: int = SIMHASH_MAX_DIST,
                  max_bucket: int | None = MAX_BAND_BUCKET) -> DataFrame:
    """SimHash near-duplicate PAIRS: bit-sampling LSH over the 60-bit
    fingerprints (4 bands x 15 bits — two docs within hamming distance 3
    must agree on at least one band, since 3 flipped bits touch at most 3
    bands), then the exact hamming check bit_count(a XOR b) <= max_dist
    on candidates only. The join is a banded self-equi-join, never
    all-pairs, with a 2^15 key universe per band and the hot-bucket cap
    on top — at real corpus size band buckets stay small instead of
    collapsing onto 16 keys (the round-2 toy width's failure mode)."""
    return simhash_band_pairs(simhash(docs), max_dist, max_bucket)


def simhash_band_pairs(fps: DataFrame,
                       max_dist: int = SIMHASH_MAX_DIST,
                       max_bucket: int | None = MAX_BAND_BUCKET
                       ) -> DataFrame:
    """Banded near-dup join over precomputed (doc_id, simhash)
    fingerprints (see simhash_pairs for the semantics)."""
    band_w = SIMHASH_BITS // SIMHASH_BANDS
    bands = fps.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.shiftright("simhash", b * band_w)
                     .bitwiseAND(F.lit((1 << band_w) - 1)).alias("key"))
            for b in range(SIMHASH_BANDS)])).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"),
             F.col("bk.key").alias("key"))
    # consumed 4x (bucket sizes + both self-join sides): materialize the
    # fingerprint mapper once instead of re-running it per consumer
    # (eager: see the Observation note in lsh_candidate_pairs)
    bands = bands.localCheckpoint(eager=True)
    bands = _cap_buckets(bands, ["band", "key"], max_bucket)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.expr("bit_count(a.simhash ^ b.simhash)")
                     .alias("hamming"))
             .filter(F.col("hamming") <= max_dist)
             .distinct())
    return pairs


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit simhash — bit b of md5's first 60 bits
    per token votes +1/-1 weighted by token multiplicity; fingerprint
    bit = 1 iff the vote sum > 0. MAP-ONLY: one Arrow-batched numpy pass
    per input partition hashes each DISTINCT token once (web tokens
    repeat heavily), unpacks its 60 bits, and segment-sums the votes per
    doc — a document is one row, so the whole fingerprint computes
    without ANY shuffle (the previous explode + 60-wide conditional
    aggregate paid two shuffles and a 60-column agg; at corpus scale
    this is a pure scan). Integer votes + the identical md5-prefix hash
    -> bit-identical values in the DuckDB oracle. Docs with zero tokens
    emit no row (same semantics as the aggregate formulation)."""
    import pandas as pd

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    from .. import core  # definition-time capture -> pickled by value

    def mapper(batches):
        import numpy as np
        for pdf in batches:
            texts = [t if isinstance(t, str) else "" for t in pdf["text"]]
            ids = np.asarray(pdf["doc_id"], dtype=np.int64)
            nz, fp = simhash_of_texts(texts, core)
            if not nz.any():
                continue
            yield pd.DataFrame({"doc_id": ids[nz], "simhash": fp})

    return docs.select("doc_id", "text").mapInPandas(
        mapper, schema="doc_id long, simhash long")


def md5_60_of_distinct(tokens):
    """(codes, h60): factorize a flat token list and md5-hash each
    DISTINCT token once to its 60-bit prefix (first 15 hex chars) — the
    ONE hash kernel every md5-keyed operator shares (simhash votes,
    hashed-BoW embedding dims); both DuckDB oracles depend on this exact
    prefix width, so there is exactly one copy of it."""
    import hashlib

    import numpy as np
    import pandas as pd
    codes, uniq = pd.factorize(np.array(tokens, dtype=object), sort=False)
    h60 = np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
         for t in uniq), dtype=np.uint64, count=len(uniq))
    return codes, h60


def md5_60_of_distinct_batch(tb, core):
    """md5_60_of_distinct for a whole TokenBatch without Python token
    strings: Arrow dictionary_encode over the buffer-built token array
    (first-appearance codes, same as pd.factorize) + _md5_60_arrow over
    the distinct dictionary. Identical (codes, h60) values."""
    import numpy as np
    arr = core.batch_token_array(tb)
    de = arr.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    h60 = _md5_60_arrow(de.dictionary).astype(np.uint64)
    return codes, h60


def simhash_of_texts(texts, core):
    """Per-batch fingerprint kernel shared by the batch operator and the
    streaming ingest dedup: (has_tokens mask, int64 fingerprints for the
    masked docs). One md5 per DISTINCT token, segment-summed bit votes
    per doc. ``core`` is passed in (not imported here) so callers
    capture it at closure-definition time and the pickled UDF stays
    self-contained on workers without --py-files."""
    import numpy as np

    shifts = np.arange(SIMHASH_BITS, dtype=np.uint64)
    weights = (np.uint64(1) << shifts)
    tb = core.batch_tokenize(texts, need_tokens=False)
    counts = np.asarray(tb.counts, dtype=np.int64)
    nz = counts > 0
    if not nz.any():
        return nz, np.zeros(0, dtype=np.int64)
    codes, h60 = md5_60_of_distinct_batch(tb, core)
    # (U, 60) bit matrix for the distinct tokens, gathered back to
    # token grain; vote[d, b] = 2*sum(bits) - n_tokens[d]
    bits = ((h60[:, None] >> shifts[None, :])
            & np.uint64(1)).astype(np.int64)
    tok_bits = bits[codes]
    offsets = np.concatenate(([0], np.cumsum(counts)))[:-1][nz]
    seg = np.add.reduceat(tok_bits, offsets, axis=0)
    votes = 2 * seg - counts[nz][:, None]
    fp = ((votes > 0).astype(np.uint64) * weights[None, :]) \
        .sum(axis=1).astype(np.int64)
    return nz, fp


def decontaminate(docs: DataFrame, bench_docs: DataFrame,
                  shingle_n: int = 5, min_hits: int = 3) -> DataFrame:
    """Benchmark decontamination — the 'remove evaluation-set overlap'
    stage every LLM training pipeline runs before the corpus ships
    (GPT-3 appendix C / Gopher A.8 13-gram rule): (doc_id, n_hits,
    contaminated) for every corpus doc, where n_hits counts the DISTINCT
    word n-grams the doc shares with ANY benchmark document and
    contaminated = n_hits >= min_hits.

    Scale shape: the benchmark side is small by construction (eval sets
    are 10^3-10^6 docs vs the 10^12-doc corpus), so its distinct shingle
    set is broadcast and the corpus-side probe is a map-only hash-join
    on the existing zero-shuffle shingling pass — no corpus-grain
    shuffle of anything but the (doc_id, n_hits) hit counts, which
    partial-aggregate map-side. The left join back to the full doc list
    keys on doc_id only (no text movement). Mirrored exactly by the
    decontaminate DuckDB oracle."""
    corpus_sh = _doc_shingles(docs, shingle_n)
    bench_sh = (_doc_shingles(bench_docs, shingle_n)
                .select("shingle").distinct())
    # _doc_shingles already emits DISTINCT shingles per doc, so the
    # post-probe count(*) is a distinct-shingle count.
    hits = (corpus_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy("doc_id").agg(F.count("*").alias("n_hits")))
    return (docs.select("doc_id").join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)) >= min_hits)
                    .alias("contaminated")))


def _md5_60_arrow(arr) -> "np.ndarray":
    """60-bit md5 prefix of every element of an Arrow StringArray,
    hashing the utf-8 VALUE BUFFER directly through memoryview slices —
    no Python string objects, no hexdigest parse
    (int.from_bytes(digest[:8]) >> 4 == int(hexdigest[:15], 16))."""
    import hashlib

    import numpy as np
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + n + 1]
    mv = memoryview(arr.buffers()[2])
    md5 = hashlib.md5
    return np.fromiter(
        (int.from_bytes(md5(mv[offs[i]:offs[i + 1]]).digest()[:8],
                        "big") >> 4 for i in range(n)),
        dtype=np.int64, count=n)


def _doc_windows(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, pos, whash): EVERY k-token window of every doc (1-based
    start position, NOT distinct — within-doc repeats count), whash =
    60-bit md5 prefix of the space-joined window. Hashing happens inside
    the Arrow mapper so the exchange downstream carries 16-byte rows,
    never window text. Zero shuffle; vectorized end-to-end (the round-5
    per-window ' '.join + hexdigest loop is gone): windows via
    core.flat_ngram_windows, md5 via _md5_60_arrow over the Arrow value
    buffer."""
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    from .. import core

    def mapper(batches):
        import numpy as np
        import pyarrow as pa
        for rb in batches:
            texts = [t if t is not None else ""
                     for t in rb.column("text").to_pylist()]
            ids = rb.column("doc_id").to_numpy(zero_copy_only=False)
            tb = core.batch_tokenize(texts)
            d, pos, wins = core.flat_ngram_windows(tb, k)
            if not len(d):
                continue
            yield pa.record_batch(
                [pa.array(ids[d].astype(np.int64)),
                 pa.array(pos.astype(np.int32)),
                 pa.array(_md5_60_arrow(wins))],
                names=["doc_id", "pos", "whash"])

    return docs.select("doc_id", "text").mapInArrow(
        mapper, schema="doc_id long, pos int, whash long")


def substring_dedup(docs: DataFrame, k: int = 8,
                    min_count: int = 2) -> DataFrame:
    """EXACT substring-level dedup at k-token window grain — the 'remove
    repeated substrings, not just repeated documents' stage (Lee et al.
    2022, 'Deduplicating Training Data Makes Language Models Better',
    which found ~1% of tokens sit in >=50-token spans repeated verbatim
    across web corpora; their suffix-array rule rendered distributable
    as fixed-width window hashing). A window occurring >= min_count
    times ANYWHERE in the corpus (other docs or the same doc) is
    duplicated; every token covered by a duplicated window is cut.
    Returns for EVERY input doc: (doc_id, n_windows, dup_windows,
    dup_frac, clean_text) where clean_text re-joins surviving tokens
    with single spaces (the token-grain contract; byte-level
    whitespace is not preserved at this grain by design).

    Scale shape: one map-only window-hash pass (text never leaves the
    scan), one window-grain count on 8-byte keys (partial agg collapses
    repeats map-side), one window-grain hash join back (duplicated-hash
    table is a small fraction of the corpus by Lee et al.'s own
    measurement), one doc-grain position list, and a final map-side
    rebuild that re-tokenizes locally instead of shuffling token text.
    No suffix array, no sort of the corpus, no all-pairs. Mirrored
    exactly by the dedup_substring DuckDB oracle."""
    import numpy as np
    import pandas as pd

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()
    from .. import core

    # the window table is consumed twice (dup-hash count + the
    # join-back); materialize the hashing mapper once (16 B/row — the
    # plan previously showed TWO MapInPandas window passes). Eager:
    # see the Observation note in lsh_candidate_pairs.
    win = _doc_windows(docs, k).localCheckpoint(eager=True)
    dup = (win.groupBy("whash").agg(F.count("*").alias("c"))
           .filter(F.col("c") >= min_count).select("whash"))
    hits = win.join(dup, "whash").select("doc_id", "pos")
    per_doc = hits.groupBy("doc_id").agg(
        F.collect_list("pos").alias("dup_pos"))
    joined = (docs.select("doc_id", "text")
              .join(per_doc, "doc_id", "left"))

    def rebuild(batches):
        # vectorized (round-5 looped per doc, re-tokenizing and joining
        # in Python): flat batch tokenize, covered-token mask via an
        # interval diff array + cumsum, survivor re-join via the Arrow
        # C++ binary_join over one ListArray — identical output
        # (windows never straddle docs, so every [p-1, p-1+k) interval
        # stays inside its doc's token range).
        import pyarrow as pa
        import pyarrow.compute as pc
        for rb in batches:
            ids = rb.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            texts = [t if t is not None else ""
                     for t in rb.column("text").to_pylist()]
            nd = len(texts)
            tb = core.batch_tokenize(texts)
            counts = tb.counts
            T = tb.starts.size
            off = np.zeros(nd + 1, dtype=np.int64)
            np.cumsum(counts, out=off[1:])
            dp_col = rb.column("dup_pos").to_pylist()
            dup_n = np.fromiter(
                (0 if v is None else len(v) for v in dp_col),
                dtype=np.int64, count=nd)
            covered = np.zeros(T, dtype=bool)
            if dup_n.sum():
                flat_d = np.repeat(np.arange(nd), dup_n)
                flat_p = np.concatenate(
                    [np.asarray(v, dtype=np.int64)
                     for v in dp_col if v is not None and len(v)])
                starts = off[flat_d] + flat_p - 1
                diff = np.zeros(T + 1, dtype=np.int64)
                np.add.at(diff, starts, 1)
                np.add.at(diff, starts + k, -1)
                covered = np.cumsum(diff[:-1]) > 0
            keep = ~covered
            surv = np.bincount(tb.doc_of[keep], minlength=nd) \
                if T else np.zeros(nd, dtype=np.int64)
            soff = np.zeros(nd + 1, dtype=np.int64)
            np.cumsum(surv, out=soff[1:])
            values = core.batch_token_array(tb).filter(
                pa.array(keep)) if T else pa.array([], type=pa.string())
            clean = pc.binary_join(
                pa.ListArray.from_arrays(
                    pa.array(soff, type=pa.int32()), values),
                " ")
            n_win = np.maximum(counts - k + 1, 0)
            dup_frac = np.where(
                n_win > 0, dup_n / np.maximum(n_win, 1), 0.0)
            yield pa.record_batch(
                [pa.array(ids), pa.array(n_win.astype(np.int32)),
                 pa.array(dup_n.astype(np.int32)), pa.array(dup_frac),
                 clean],
                names=["doc_id", "n_windows", "dup_windows", "dup_frac",
                       "clean_text"])

    return joined.mapInArrow(
        rebuild, schema="doc_id long, n_windows int, dup_windows int, "
                        "dup_frac double, clean_text string")
