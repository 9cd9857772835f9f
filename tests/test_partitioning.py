"""Salted repartitioning / skew utilities."""

from pyspark.sql import functions as F

from filtlong_spark import fixtures as fx
from filtlong_spark.operators import partitioning as pt


def test_salt_deterministic_and_bounded(spark):
    df = fx.to_spark_df(spark, fx.volume(sf=0.0002))
    a = {(r["url"], r["_salt"])
         for r in pt.with_salt(df, key="url", salt_from="text").collect()}
    b = {(r["url"], r["_salt"])
         for r in pt.with_salt(df, key="url", salt_from="text").collect()}
    assert a == b
    assert all(0 <= s < 16 for _, s in a)


def test_salt_varies_within_hot_key(spark):
    # ONE host repeated 400x: the salt must take >1 value within the key
    # (a salt that is a pure function of the key spreads nothing)
    rows = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                 text="join hash sort") for i in range(400)]
    df = (fx.to_spark_df(spark, rows)
          .withColumn("host", pt.host_of(F.col("url"))))
    salts = {r["_salt"] for r in
             pt.with_salt(df, key="host", salt_from="url").collect()}
    assert len(salts) > 1


def test_salted_repartition_spreads_identical_key(spark):
    # ONE url repeated 400x (rows bit-identical in the key) + 50 cold docs:
    # counter-based salting must still spread the hot key over >1 partition
    rows = [dict(fx.sort_suite()[0], url="https://hot.example.com/d",
                 text=f"join hash sort {i}") for i in range(400)]
    rows += [dict(fx.sort_suite()[0], url=f"https://cold{i}.example.com/d",
                  text="join hash sort") for i in range(50)]
    df = fx.to_spark_df(spark, rows)
    hot_pids = (pt.repartition_salted(df, 8, key="url", salt_from=None)
                .filter(F.col("url") == "https://hot.example.com/d")
                .select(F.spark_partition_id().alias("pid"))
                .distinct().count())
    assert hot_pids > 1
    # and the deterministic payload-salt path spreads a hot HOST key
    # (urls distinct, host identical — the canonical web-skew shape)
    rows2 = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                  text="join hash sort") for i in range(400)]
    df2 = (fx.to_spark_df(spark, rows2)
           .withColumn("host", pt.host_of(F.col("url"))))
    hot_pids2 = (pt.repartition_salted(df2, 8, key="host", salt_from="url")
                 .filter(F.col("host") == "hot.example.com")
                 .select(F.spark_partition_id().alias("pid"))
                 .distinct().count())
    assert hot_pids2 > 1


def test_skew_aware_host_agg_correct(spark):
    rows = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                 text="abcde") for i in range(100)]
    df = fx.to_spark_df(spark, rows)
    out = {(r["host"], r["n_docs"], r["chars"])
           for r in pt.skew_aware_host_agg(df).collect()}
    assert out == {("hot.example.com", 100, 500)}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located bucketed join (the Iceberg bucket(key, N) rendering):
    two tables bucketed the same way on doc_id must equi-join with ZERO
    shuffle Exchange in the physical plan — the repeated-join shape a
    100 TB pipeline uses for its fact tables — and return exactly the
    plain join's rows."""
    # (warehouse dir is a static conf — tables land in the session
    # default and are dropped below, which deletes managed-table data)
    docs = fx.to_spark_df(spark, fx.volume(sf=0.002)) \
        .withColumn("doc_id", F.xxhash64("url")) \
        .select("doc_id", "url", "text")
    scores = docs.select("doc_id", F.length("text").alias("n_chars"))
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast: test-sized tables would otherwise take a
        # BroadcastHashJoin (which ignores bucketing); at fact-table
        # scale neither side broadcasts and SMJ-over-buckets is the plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        pt.write_bucketed(docs, "b_docs", "doc_id", n_buckets=8,
                          sort_cols=("doc_id",))
        pt.write_bucketed(scores, "b_scores", "doc_id", n_buckets=8,
                          sort_cols=("doc_id",))
        joined = pt.bucketed_join(spark, "b_docs", "b_scores", "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        got = joined.count()
        exp = docs.join(scores, "doc_id").count()
        assert got == exp > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_scores")


def test_host_quality_gate_cuts_bad_domain(spark):
    """Host-level gate: every doc of a low-quality domain drops, even
    pages that would pass a per-doc threshold; good-domain docs keep."""
    rows = []
    for i in range(10):
        rows.append((i, "the fast sort join hash", "en", "good.com", 23))
    for i in range(10, 20):
        # 9 junk pages + 1 clean page on the spam domain: the clean page
        # must STILL drop (host-level semantics)
        text = "the fast sort join hash" if i == 10 else "zz xx qq ww vv"
        rows.append((i, text, "en", "spam.com", len(text)))
    rows.append((20, "   ", "en", "good.com", 3))  # zero-token doc
    # a host whose docs ALL tokenize empty: 0/0 must yield a CONCRETE
    # keep=False (host_mean_q 0.0), not a NULL silently dropped by
    # filter(keep) — the ADVICE r4 divergence vs DuckDB NaN semantics
    rows.append((21, "", "en", "void.com", 0))
    rows.append((22, " \t ", "en", "void.com", 3))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    vocab = ["the", "fast", "sort", "join", "hash"]
    out = {r["doc_id"]: (r["host"], r["keep"])
           for r in pt.host_quality_gate(df, vocab, 50.0).collect()}
    assert all(out[i] == ("good.com", True) for i in range(10))
    assert all(out[i] == ("spam.com", False) for i in range(10, 20))
    # a token-less doc still gets its host's verdict (not dropped)
    assert out[20] == ("good.com", True)
    # all-zero-token host: keep is a concrete False, never NULL
    assert out[21] == ("void.com", False)
    assert out[22] == ("void.com", False)
    assert len(out) == 23


def test_host_temperature_sample_damps_hot_host(spark):
    """A 200-doc host is sampled at p=sqrt(10/200)~0.22 while a 5-doc
    host keeps everything (p_keep clamped to 1.0); the draw is
    deterministic across invocations."""
    import pytest
    rows = ([(i, "t", "hot") for i in range(200)]
            + [(1000 + i, "t", "cold") for i in range(5)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    out = pt.host_temperature_sample(docs, 10, alpha=0.5)
    agg = {r["host"]: r for r in
           out.groupBy("host").agg(
               F.count("*").alias("n"),
               F.sum(F.col("sampled").cast("int")).alias("kept"),
               F.min("p_keep").alias("p")).collect()}
    assert agg["cold"]["p"] == 1.0 and agg["cold"]["kept"] == 5
    assert abs(agg["hot"]["p"] - (10 / 200) ** 0.5) < 1e-12
    # md5 uniforms: kept count concentrates near n*p (binomial-ish bound)
    assert 20 <= agg["hot"]["kept"] <= 70
    # deterministic: same rows sampled on a second evaluation
    first = {r["doc_id"] for r in out.filter("sampled").collect()}
    second = {r["doc_id"] for r in out.filter("sampled").collect()}
    assert first == second
    with pytest.raises(ValueError):
        pt.host_temperature_sample(docs, 10, alpha=0.3)


def test_blocklist_gate_rules(spark):
    """Host rule and word rule fire independently; keep = neither; the
    deny-list reaches the probe as a broadcast."""
    docs = spark.createDataFrame(
        [(1, "clean words here", "good.com"),
         (2, "clean words here", "evil.com"),          # host rule
         (3, "win at the CASINO now", "good.com"),     # word rule (case)
         (4, "casino text", "evil.com")],              # both
        "doc_id long, text string, source string")
    blocked = spark.createDataFrame([("evil.com",)], "host string")
    out = {r["doc_id"]: r for r in
           pt.blocklist_gate(docs, blocked, ("casino",)).collect()}
    assert out[1]["keep"] and not out[1]["blocked_host"] \
        and not out[1]["blocked_word"]
    assert out[2]["blocked_host"] and not out[2]["blocked_word"] \
        and not out[2]["keep"]
    assert out[3]["blocked_word"] and not out[3]["blocked_host"] \
        and not out[3]["keep"]
    assert out[4]["blocked_host"] and out[4]["blocked_word"] \
        and not out[4]["keep"]
    plan = (pt.blocklist_gate(docs, blocked, ("casino",))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
