"""Text-analysis functions: quality heuristics, language-ID, token counting,
document fingerprinting. All pure Catalyst expressions (whole-stage codegen,
no Python in the hot path); each has an exactly-mirroring ANSI/DuckDB SQL
so the driver's oracle can verify values bit-for-bit.

These are the Gopher/C4-style heuristic-rule slot of the north_star (the
web rendering of Filtlong's hard thresholds, src/read.cpp:64-73) plus the
language-ID gate (analog of FASTA/FASTQ format detection,
src/main.cpp:92-106).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKENS = r"regexp_extract_all(text, '\\S+', 0)"

# Stopword marker sets for the heuristic language-ID (deterministic n-gram/
# stopword profile — the fastText slot; fastText itself isn't in this
# container, so the gate is a transparent heuristic with the same shape).
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "y", "las", "es"),
    "fr": ("le", "la", "et", "les", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def tokens_col() -> Column:
    return F.expr(TOKENS)


def n_tokens_col() -> Column:
    return F.size(tokens_col())


def sum_token_len_col() -> Column:
    """Sum of token lengths (exact integer; JVM-side fold)."""
    return F.aggregate(tokens_col(), F.lit(0).cast("long"),
                       lambda acc, t: acc + F.length(t))


def mean_word_len_col() -> Column:
    return sum_token_len_col().cast("double") / n_tokens_col()


def stopword_count_col(words=STOPWORDS) -> Column:
    return F.size(F.filter(tokens_col(), lambda t: t.isin(*words)))


def distinct_token_count_col() -> Column:
    return F.size(F.array_distinct(tokens_col()))


def symbol_count_col() -> Column:
    """Chars that are not alphanumeric or space."""
    return F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", ""))


def _isin(words):
    # single-arg closure: a 2-arg lambda would be bound as (element, index)
    # by the higher-order-function machinery
    def fn(t):
        return t.isin(*words)
    return fn


def lang_scores() -> dict[str, Column]:
    return {lang: F.size(F.filter(tokens_col(), _isin(words)))
            for lang, words in LANG_MARKERS.items()}


def langid_cols() -> list[Column]:
    """lang_pred + lang_conf via argmax over marker counts; deterministic
    lexicographic tiebreak (greatest-count, first-alphabetical wins)."""
    scores = lang_scores()
    langs = sorted(scores)  # de, en, es, fr — tie -> alphabetical
    best = F.greatest(*[scores[l] for l in langs])
    pred = F.lit("und")
    # build reversed so earlier-alphabetical wins ties
    for l in reversed(langs):
        pred = F.when(scores[l] == best, F.lit(l)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    total = sum([scores[l] for l in langs], F.lit(0))
    conf = F.when(total > 0, best.cast("double") / total).otherwise(F.lit(0.0))
    return [pred.alias("lang_pred"), conf.alias("lang_conf")]


FINGERPRINT_MOD = 1_000_000_007


def token_hash(t: Column) -> Column:
    """First 8 hex chars of md5 as a bigint (< 2^32) — identical in Spark
    (conv) and DuckDB (('0x'||substr(md5(t),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10).cast("long")


def fingerprint_col() -> Column:
    """Order-sensitive rolling hash over token hashes:
    acc = (acc*31 + h) % 1e9+7 — a polynomial rolling fingerprint
    (the web analog of the reference's rolling 2-bit k-mer encode,
    src/kmers.cpp:106-121). Exact integer math in both engines."""
    hashes = F.transform(tokens_col(), token_hash)
    return F.aggregate(hashes, F.lit(0).cast("long"),
                       lambda acc, h: (acc * 31 + h) % FINGERPRINT_MOD)
