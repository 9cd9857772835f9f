"""URL canonicalization rules + deterministic split assignment."""

import pytest

from pyspark.sql import functions as F

from filtlong_spark.functions import weburl
from filtlong_spark.operators import sampling


CANON_CASES = [
    # fragment stripped
    ("https://a.test/p#sec", "https://a.test/p"),
    # scheme+host lowercased, path case kept
    ("HTTPS://A.Test/Path", "https://a.test/Path"),
    # default ports dropped (matching scheme only)
    ("http://a.test:80/p", "http://a.test/p"),
    ("https://a.test:443/p", "https://a.test/p"),
    ("http://a.test:8080/p", "http://a.test:8080/p"),
    ("https://a.test:80/p", "https://a.test:80/p"),
    # tracking params dropped, others kept, '?' dropped when empty
    ("https://a.test/p?utm_source=x&q=1&fbclid=z", "https://a.test/p?q=1"),
    ("https://a.test/p?utm_campaign=x", "https://a.test/p"),
    ("https://a.test/p?gclid", "https://a.test/p"),
    # trailing slash stripped except root
    ("https://a.test/p/", "https://a.test/p"),
    ("https://a.test/", "https://a.test/"),
    ("https://a.test/p/?q=1", "https://a.test/p?q=1"),
    # everything at once
    ("HTTPS://A.Test:443/p/?utm_source=s&k=v#f", "https://a.test/p?k=v"),
    # already canonical -> unchanged
    ("https://a.test/doc/7?q=1", "https://a.test/doc/7?q=1"),
    # percent-encoding: unreserved octets decode (either hex case)
    ("https://a.test/%7euser", "https://a.test/~user"),
    ("https://a.test/%7Euser/%64oc", "https://a.test/~user/doc"),
    # reserved octets stay encoded but hex uppercases
    ("https://a.test/a%2fb%3fq", "https://a.test/a%2Fb%3Fq"),
    # %25 ('%') is reserved: no decode -> no double-decode cascade (the
    # trailing '2e' is literal text, not an octet — unchanged)
    ("https://a.test/p%252e", "https://a.test/p%252e"),
    # encoded tracking-param NAME decodes, then the filter drops it
    ("https://a.test/p?%75tm_source=x&q=1", "https://a.test/p?q=1"),
    # duplicate/empty params collapse; lone '&' query -> '?' dropped
    ("https://a.test/p?&&x=a%3b&&", "https://a.test/p?x=a%3B"),
    ("https://a.test/p?&&&", "https://a.test/p"),
    # mixed-case hex (%aB) is outside the rule list: untouched
    ("https://a.test/p%aB", "https://a.test/p%aB"),
    # SEQUENTIAL-chain semantics (what the DuckDB oracle renders): the
    # %37 decode forms a new %77 which a LATER rule then decodes to 'w'
    # — a one-pass left-to-right scanner would stop at '%77'. The Arrow
    # kernel must emulate the chain, and this case pins that.
    ("https://a.test/%7%37", "https://a.test/w"),
]


def test_percent_kernel_null_and_plain_passthrough(spark):
    """The kernel's %-mask path: NULL urls stay NULL, %-free urls are
    byte-identical (never copied through the replace chain)."""
    df = spark.createDataFrame(
        [(1, None), (2, "https://plain.test/x?q=1")],
        "i long, url string")
    rows = {r["i"]: r["c"] for r in
            df.select("i", weburl._percent_normalize(F.col("url"))
                      .alias("c")).collect()}
    assert rows[1] is None
    assert rows[2] == "https://plain.test/x?q=1"


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    got = [r["c"] for r in
           df.select(weburl.canonical_url_col(F.col("url")).alias("c"))
           .collect()]
    assert got == [want for _, want in CANON_CASES]


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CANON_CASES], "url string")
    once = df.select(weburl.canonical_url_col(F.col("url")).alias("url"))
    twice = once.select(weburl.canonical_url_col(F.col("url")).alias("url"))
    assert [r["url"] for r in once.collect()] == \
        [r["url"] for r in twice.collect()]


def test_split_assign_stable_and_proportioned(spark):
    docs = spark.range(10_000).toDF("doc_id")
    a = sampling.split_assign(docs).collect()
    b = sampling.split_assign(docs).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))  # pure function
    frac = {s: sum(1 for r in a if r["split"] == s) / len(a)
            for s in ("train", "val", "test")}
    assert frac["train"] == pytest.approx(0.90, abs=0.02)
    assert frac["val"] == pytest.approx(0.05, abs=0.01)
    assert frac["test"] == pytest.approx(0.05, abs=0.01)
    # stable under subsetting: the same doc keeps its split in any run
    sub = {r["doc_id"]: r["split"]
           for r in sampling.split_assign(docs.filter("doc_id % 3 = 0"))
           .collect()}
    full = {r["doc_id"]: r["split"] for r in a}
    assert all(full[k] == v for k, v in sub.items())


def test_pipeline_canonical_url_dedup(spark):
    """canonical_url_dedup=True: crawl-noise variants of one page
    collapse at ingest — one scored survivor, the variant quarantined as
    duplicate_canonical_url; with the flag off both score."""
    import datetime
    from filtlong_spark.config import FilterConfig
    from filtlong_spark.plans.pipeline import run_filter
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    text = "the fast sort joins the hash table rows " * 10
    rows = [
        ("https://a.test/page?utm_source=feed", t0, None, text, None),
        ("HTTPS://A.test/page#top",
         t0 + datetime.timedelta(minutes=1), None, text + "later", None),
        ("https://a.test/other", t0, None, text, None),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, "
              "text string, lang string")
    cfg = dict(min_length=10, mode="intrinsic",
               vocab=frozenset(text.split()))
    res = run_filter(spark, pages, FilterConfig(**cfg))
    assert res.kept.count() == 3  # raw urls differ -> no dedup
    res2 = run_filter(spark, pages,
                      FilterConfig(**cfg, canonical_url_dedup=True))
    kept = sorted(r["url"] for r in res2.kept.collect())
    assert kept == ["https://a.test/other",
                    "https://a.test/page?utm_source=feed"]  # first wins
    q = {r["url"]: r["reason"] for r in res2.quarantine.collect()}
    assert q == {"HTTPS://A.test/page#top": "duplicate_canonical_url"}


def test_canonical_url_idempotent_property(spark):
    """Property: canonicalization is a projection — applying it twice
    equals applying it once, over randomized crawl-noise URLs built from
    every rule family (case, ports, fragments, tracking/empty params,
    percent-encoding in either hex case)."""
    import random
    rng = random.Random(7)
    parts = ["%7e", "%7E", "%2f", "a", "Doc", "7", "%64", "x%3by"]
    urls = []
    for i in range(120):
        scheme = rng.choice(["http", "https", "HTTPS"])
        host = rng.choice(["A.Test", "b.example.COM"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = "/" + "/".join(rng.sample(parts, rng.randint(1, 3)))
        path += rng.choice(["", "/"])
        q = rng.choice(["", "?utm_source=s", "?&&", "?q=1&utm_x=2",
                        "?%75tm_source=x&k=v", "?a=%3b"])
        frag = rng.choice(["", "#top"])
        urls.append((f"{scheme}://{host}{port}{path}{q}{frag}",))
    df = spark.createDataFrame(urls, "url string")
    once = df.select(weburl.canonical_url_col(F.col("url")).alias("u"))
    twice = once.select(weburl.canonical_url_col(F.col("u")).alias("u"))
    assert [r["u"] for r in once.collect()] == \
        [r["u"] for r in twice.collect()]


def test_quality_buckets_exact_equal_counts_and_labels(spark):
    """CCNet head/middle/tail: exact ntile gives per-language bucket
    counts differing by at most 1, head holds the best scores, and the
    assignment is a pure function of (score, key) — stable across
    repartitioning."""
    rows = [(f"d{i:03d}", "en" if i % 3 else "de", float((i * 37) % 101))
            for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, q double")
    out = sampling.quality_buckets(docs, "q").collect()
    assert len(out) == 100
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = [sum(1 for r in rs if r["bucket"] == b) for b in (1, 2, 3)]
        assert max(counts) - min(counts) <= 1, (lang, counts)
        # every head score >= every tail score
        head = [r["score"] for r in rs if r["label"] == "head"]
        tail = [r["score"] for r in rs if r["label"] == "tail"]
        assert min(head) >= max(tail)
    assert {r["label"] for r in out} == {"head", "middle", "tail"}
    # stability under a different physical layout
    out2 = sampling.quality_buckets(docs.repartition(7), "q").collect()
    assert {(r["doc_id"], r["bucket"]) for r in out} == \
        {(r["doc_id"], r["bucket"]) for r in out2}


def test_quality_buckets_approx_matches_exact_on_separated_scores(spark):
    """The no-sort percentile-threshold path agrees with exact ntile
    when scores are well separated (the only divergence allowed is at
    quantile boundaries), and keeps every doc."""
    rows = [(f"d{i:03d}", "en", float(i)) for i in range(90)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, q double")
    exact = {r["doc_id"]: r["bucket"]
             for r in sampling.quality_buckets(docs, "q").collect()}
    approx = {r["doc_id"]: r["bucket"]
              for r in sampling.quality_buckets(
                  docs, "q", algorithm="approx").collect()}
    assert set(approx) == set(exact)
    off = [d for d in exact if exact[d] != approx[d]]
    assert len(off) <= 2, off  # boundary docs only


def test_quality_buckets_validation(spark):
    docs = spark.createDataFrame([("a", "en", 1.0)],
                                 "doc_id string, lang string, q double")
    with pytest.raises(ValueError):
        sampling.quality_buckets(docs, "q", labels=("only",))
    with pytest.raises(ValueError):
        sampling.quality_buckets(docs, "q", algorithm="nope")


def test_pack_sequences_known_layout(spark):
    """Concat-and-chunk with capacity 5: per-group token offsets,
    boundary straddles, and empty docs pinned on a hand-checked layout."""
    rows = [
        # group g1: docs of 3, 4, 0, 6 tokens -> offsets 0, 3, 7, 7
        ("a1", "g1", "t t t"),
        ("a2", "g1", "t t t t"),
        ("a3", "g1", ""),
        ("a4", "g1", "t t t t t t"),
        # group g2 packs independently from offset 0
        ("b1", "g2", "t t t t t t t"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = {r["doc_id"]: r
           for r in sampling.pack_sequences(docs, 5).collect()}
    # a1: toks 0-2 -> seq 0 only
    assert (out["a1"]["start_tok"], out["a1"]["first_seq"],
            out["a1"]["last_seq"]) == (0, 0, 0)
    # a2: toks 3-6 -> straddles seqs 0 and 1
    assert (out["a2"]["start_tok"], out["a2"]["first_seq"],
            out["a2"]["last_seq"]) == (3, 0, 1)
    # a3: empty at offset 7 -> pinned to seq 1
    assert (out["a3"]["start_tok"], out["a3"]["first_seq"],
            out["a3"]["last_seq"]) == (7, 1, 1)
    # a4: toks 7-12 -> seqs 1..2
    assert (out["a4"]["start_tok"], out["a4"]["first_seq"],
            out["a4"]["last_seq"]) == (7, 1, 2)
    # b1: independent group, toks 0-6 -> seqs 0..1
    assert (out["b1"]["start_tok"], out["b1"]["first_seq"],
            out["b1"]["last_seq"]) == (0, 0, 1)


def test_pack_sequences_stable_and_validates(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "en", "w " * (i % 7)) for i in range(40)],
        "doc_id string, lang string, text string")
    a = sampling.pack_sequences(docs, 8).collect()
    b = sampling.pack_sequences(docs.repartition(5), 8).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}
    with pytest.raises(ValueError):
        sampling.pack_sequences(docs, 0)


def test_mixture_sample_semantics(spark):
    """Target-mixture downsampling: p_keep = min(1, share*budget/
    group_tokens); a group smaller than its slice keeps everything;
    absent groups are excluded; the draw is a pure function of the key
    (stable under repartitioning); expected kept-token mass tracks the
    slice."""
    rows = ([(f"a{i}", "big", "w " * 40) for i in range(100)]     # 4000 tok
            + [(f"b{i}", "small", "w " * 10) for i in range(10)]  # 100 tok
            + [(f"c{i}", "other", "w " * 10) for i in range(5)])
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = sampling.mixture_sample(
        docs, {"big": 0.5, "small": 0.5}, 2000, key="doc_id")
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 115
    # big: 0.5*2000/4000 = 0.25; small: slice 1000 > 100 tokens -> 1.0
    assert got["a0"]["p_keep"] == 0.25
    assert got["b0"]["p_keep"] == 1.0
    assert all(got[f"b{i}"]["sampled"] for i in range(10))
    assert all(not got[f"c{i}"]["sampled"] and got[f"c{i}"]["p_keep"] == 0.0
               for i in range(5))
    kept_tok = sum(r["n_tok"] for r in got.values()
                   if r["sampled"] and r["group"] == "big")
    assert 600 <= kept_tok <= 1400  # E=1000, md5 draw concentrates
    out2 = sampling.mixture_sample(
        docs.repartition(7), {"big": 0.5, "small": 0.5}, 2000)
    assert {(r["doc_id"], r["sampled"]) for r in out2.collect()} == \
        {(k, v["sampled"]) for k, v in got.items()}
    with pytest.raises(ValueError):
        sampling.mixture_sample(docs, {"big": 1.0}, 0)


def test_quality_buckets_single_bucket_degenerate(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "en", float(i)) for i in range(5)],
        "doc_id string, lang string, q double")
    for algo in ("exact", "approx"):
        out = sampling.quality_buckets(docs, "q", n_buckets=1,
                                       labels=("all",),
                                       algorithm=algo).collect()
        assert len(out) == 5
        assert {r["bucket"] for r in out} == {1}
        assert {r["label"] for r in out} == {"all"}
    with pytest.raises(ValueError):
        sampling.quality_buckets(docs, "q", n_buckets=0, labels=())
