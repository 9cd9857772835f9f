"""Randomized-corpus invariant checks for the dataset-construction
operators (one Spark call per test over a seeded random corpus, with an
INDEPENDENT pure-Python reference implementation — the
test_canonical_url_idempotent_property pattern)."""

import hashlib
import random

from filtlong_spark.operators import sampling


def _corpus(n=300, langs=("en", "de", "zh", "fr")):
    rng = random.Random(23)
    rows = []
    for i in range(n):
        k = rng.randint(0, 12)  # includes zero-token docs
        rows.append((f"d{i:04d}", rng.choice(langs),
                     " ".join(f"w{rng.randint(0, 30)}" for _ in range(k))))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, lang string, text string")


def test_pack_sequences_random_invariants(spark):
    """Against an independent Python packer: offsets are the exact
    per-group prefix sums in (doc_id) order; every token is covered
    exactly once (no gaps, no overlaps); seq ids are offset // C."""
    rows = _corpus()
    cap = 17
    out = {r["doc_id"]: r
           for r in sampling.pack_sequences(_df(spark, rows), cap).collect()}
    assert len(out) == len(rows)
    # python reference
    by_group = {}
    for doc_id, lang, text in sorted(rows):
        n = len(text.split())
        start = by_group.get(lang, 0)
        by_group[lang] = start + n
        r = out[doc_id]
        assert (r["n_tok"], r["start_tok"]) == (n, start), doc_id
        last = max(start + n - 1, start)
        assert r["first_seq"] == start // cap
        assert r["last_seq"] == last // cap
    # coverage: per group, the final cumsum equals the sum of tokens
    for lang, total in by_group.items():
        got = sum(r["n_tok"] for r in out.values() if r["group"] == lang)
        assert got == total


def test_quality_buckets_random_matches_python_ntile(spark):
    """Exact path vs an independent Python ntile (first rows%n buckets
    take the extra row) over random scores with ties."""
    rng = random.Random(7)
    rows = [(f"d{i:04d}", rng.choice(("en", "de")),
             float(rng.randint(0, 20)))  # ties guaranteed
            for i in range(250)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, q double")
    out = {r["doc_id"]: r["bucket"]
           for r in sampling.quality_buckets(docs, "q").collect()}
    by_lang = {}
    for doc_id, lang, q in rows:
        by_lang.setdefault(lang, []).append((doc_id, q))
    for lang, items in by_lang.items():
        ordered = sorted(items, key=lambda t: (-t[1], t[0]))
        n = len(ordered)
        base, extra = divmod(n, 3)
        sizes = [base + (1 if b < extra else 0) for b in range(3)]
        i = 0
        for b, sz in enumerate(sizes, start=1):
            for doc_id, _q in ordered[i:i + sz]:
                assert out[doc_id] == b, (lang, doc_id)
            i += sz


def test_mixture_sample_random_matches_python(spark):
    """p_keep and the md5 draw against an independent Python
    implementation; expected kept-token mass per targeted group within
    a loose concentration band."""
    rows = _corpus(n=400)
    shares = {"en": 0.5, "zh": 0.25}
    budget = 600
    out = {r["doc_id"]: r for r in sampling.mixture_sample(
        _df(spark, rows), shares, budget).collect()}
    tok = {d: len(t.split()) for d, _l, t in rows}
    group_tokens = {}
    for d, lang, _t in rows:
        group_tokens[lang] = group_tokens.get(lang, 0) + tok[d]
    for d, lang, _t in rows:
        share = shares.get(lang)
        if share is None or group_tokens[lang] == 0:
            p = 0.0
        else:
            p = min(1.0, share * float(budget) / group_tokens[lang])
        r = out[d]
        assert r["p_keep"] == p, d
        u = int(hashlib.md5(d.encode()).hexdigest()[:15], 16) / float(1 << 60)
        assert r["sampled"] == (u < p), d
    kept_en = sum(tok[d] for d, lang, _t in rows
                  if lang == "en" and out[d]["sampled"])
    target_en = shares["en"] * budget
    assert 0.4 * target_en <= kept_en <= 1.9 * target_en
