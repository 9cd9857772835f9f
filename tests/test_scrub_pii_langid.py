"""PII/toxicity regex scrub + language-ID gate (north_rule stages)."""


from filtlong_spark import core
from filtlong_spark import fixtures as fx
from filtlong_spark import oracle
from filtlong_spark.config import FilterConfig
from filtlong_spark.plans.pipeline import run_filter


def _cfg(**kw):
    kw.setdefault("mode", "intrinsic")
    kw.setdefault("vocab", fx.VOCAB)
    return FilterConfig(**kw)


class TestPiiCore:
    def test_email_span(self):
        t = "write to bob@example.com today"
        assert core.pii_spans(t) == [(9, 24)]
        assert t[9:24] == "bob@example.com"

    def test_phone_and_ssn(self):
        t = "call (555) 123-4567 or 123-45-6789"
        spans = core.pii_spans(t)
        assert t[spans[0][0]:spans[0][1]] == "(555) 123-4567"
        assert t[spans[1][0]:spans[1][1]] == "123-45-6789"

    def test_toxic_word(self):
        t = "you frobnak fool"
        (s, e), = core.pii_spans(t)
        assert t[s:e] == "frobnak"

    def test_no_threshold_always_removed(self):
        # PII spans bypass the split length threshold entirely
        t = "good a@b.co good"
        spans_q = [(s, e, 1.0) for _, s, e in core.tokenize(t)]
        res = core.scrub_spans(t, spans_q, trim=False, split_threshold=None,
                               extra_bad=core.pii_spans(t))
        assert res.changed
        assert [t[s:e] for s, e in res.child_spans] == ["good ", " good"]


import os

from hypothesis import given, settings
from hypothesis import strategies as st

_EXAMPLES = int(os.environ.get("HYP_EXAMPLES", "200"))

_PII_FRAGMENTS = [
    "bob@example.com", "a@b.co", "+1 (555) 123-4567", "555 123-4567",
    "123-45-6789", "frobnak", "grubbix", "zlorty", "hello", "world",
    "no pii here", "12", "@", "x.y", "-", "(", ")",
]


@given(st.lists(st.one_of(st.sampled_from(_PII_FRAGMENTS),
                          st.text(max_size=8)), max_size=12))
@settings(max_examples=_EXAMPLES, deadline=None)
def test_pii_possible_is_necessary_condition(parts):
    """pii_possible is kept in sync with PII_PATTERNS/TOXIC_RE only by a
    comment — this property makes a future pattern that needs neither
    '@', a digit, nor a toxic literal fail LOUDLY instead of silently
    skipping those docs in the batch and LM prefilter paths."""
    text = " ".join(parts)
    if core.pii_spans(text):
        assert core.pii_possible(text)


def test_pii_possible_admits_every_pattern_family():
    for sample in ("a@b.co", "(555) 123-4567", "123-45-6789",
                   "say frobnak", "grubbix", "zlorty!"):
        assert core.pii_spans(sample), sample
        assert core.pii_possible(sample), sample


class TestLangidCore:
    def test_predict(self):
        assert core.predict_lang(
            "the children read their books in the morning")[0] == "en"
        assert core.predict_lang(
            "die kinder lesen ihre buecher und sprechen")[0] == "de"
        assert core.predict_lang("zz")[0] == "und"   # < 3 chars
        assert core.predict_lang("")[0] == "und"

    def test_no_stopwords_still_classifies(self):
        """No marker/stop words at all — the char-trigram profiles decide
        from suffix/letter patterns (the failure mode of the old
        5-marker-word model)."""
        lang, conf = core.predict_lang(
            "lumiere matin travail journee enfants marchent")
        assert lang == "fr" and conf > 0
        assert core.predict_lang(
            "morgenlicht arbeit kinder sprechen waehrend")[0] == "de"

    def test_profiles_deterministic(self):
        p1 = core.trigram_profiles()
        assert len(p1) == 12
        # zh's sample has fewer distinct trigrams than TOP_K (every char
        # trigram is near-unique) — profiles are capped, not padded
        assert all(0 < len(v) <= core.TRIGRAM_TOP_K for v in p1.values())
        assert p1 == core.trigram_profiles()

    def test_non_latin_scripts_classify(self):
        """CJK (no word spaces), Cyrillic and Arabic all classify — char
        trigrams need no tokenization; a non-Latin doc must never fall
        through to 'und' (which the langid_expected gate would then
        mass-reject)."""
        assert core.predict_lang(
            "дети читают свои книги утром в городе")[0] == "ru"
        assert core.predict_lang("孩子们早晨在学校读着他们的书")[0] == "zh"
        assert core.predict_lang(
            "يقرا الاطفال كتبهم في الصباح في المدينة")[0] == "ar"
        assert core.predict_lang(
            "子どもたちは朝に学校で本をよみます")[0] == "ja"
        assert core.predict_lang(
            "아이들은 아침에 학교에서 책을 읽습니다")[0] == "ko"
        assert core.predict_lang(
            "बच्चे सुबह स्कूल में किताबें पढ़ते हैं")[0] == "hi"
        # Latin-script additions too
        assert core.predict_lang(
            "i bambini leggono i loro libri al mattino")[0] == "it"
        assert core.predict_lang(
            "as criancas leem os seus livros pela manha")[0] == "pt"


class TestPipeline:
    def test_pii_scrub_byte_identical(self, spark):
        rows = fx.pii_suite()
        cfg = dict(pii_scrub=True, min_length=1)
        res_o = oracle.run_pipeline(rows, _cfg(**cfg))
        res_s = run_filter(spark, fx.to_spark_df(spark, rows), _cfg(**cfg))
        got = sorted((r["url"], r["text"]) for r in res_s.kept.collect())
        exp = sorted((d.url, d.text) for d in res_o.kept)
        assert got == exp
        # the email doc must have been split around the address
        assert not any("bob@example.com" in t for _, t in got)
        assert any("_" in u.rsplit("/", 1)[-1] for u, _ in got)

    def test_langid_gate(self, spark):
        rows = fx.langid_suite()
        cfg = dict(langid_enabled=True, langid_expected="en", min_length=1)
        res_o = oracle.run_pipeline(rows, _cfg(**cfg))
        res_s = run_filter(spark, fx.to_spark_df(spark, rows), _cfg(**cfg))
        got = sorted(r["url"] for r in res_s.kept.collect())
        exp = sorted(d.url for d in res_o.kept)
        assert got == exp == ["https://fixture.test/lang/en"]
        rejected = {r["url"]: r["lang_pred"]
                    for r in res_s.lang_rejected.collect()}
        assert rejected == {
            f"https://fixture.test/lang/{lang}": lang
            for lang in ("de", "fr", "es", "ru", "zh", "ar", "ja", "ko", "hi")}

    def test_langid_gate_non_latin_expected(self, spark):
        """langid_expected='zh': the CJK doc survives the gate — a
        non-Latin corpus is NOT mass-rejected (round-3 failure mode:
        everything non-European classified 'und')."""
        rows = fx.langid_suite()
        cfg = dict(langid_enabled=True, langid_expected="zh", min_length=1)
        res_o = oracle.run_pipeline(rows, _cfg(**cfg))
        res_s = run_filter(spark, fx.to_spark_df(spark, rows), _cfg(**cfg))
        got = sorted(r["url"] for r in res_s.kept.collect())
        exp = sorted(d.url for d in res_o.kept)
        assert got == exp == ["https://fixture.test/lang/zh"]

    def test_pii_with_quality_split_combined(self, spark):
        rows = fx.split_suite() + fx.pii_suite()
        cfg = dict(split=50, pii_scrub=True)
        res_o = oracle.run_pipeline(rows, _cfg(**cfg))
        res_s = run_filter(spark, fx.to_spark_df(spark, rows), _cfg(**cfg))
        got = sorted((r["url"], r["text"]) for r in res_s.kept.collect())
        exp = sorted((d.url, d.text) for d in res_o.kept)
        assert got == exp
