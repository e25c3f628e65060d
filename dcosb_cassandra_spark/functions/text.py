"""Text-analysis column expressions (SURVEY.md §2 D5/D6): tokenization,
quality scoring, language-ID heuristics, fingerprinting. Pure built-in
expressions (split/filter/transform/md5) — no Python in the hot path; the
lexicons are tiny literal arrays that constant-fold into codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: function-word list for the language-ID heuristic (articles/glue tokens)
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "for", "on", "with")

#: tiny sentiment-ish lexicon over the corpus vocabulary (db-domain words;
#: FIXTURES.md: the synthetic docs are db-domain word salad)
SENTIMENT_LEXICON: tuple[tuple[str, float], ...] = (
    ("fast", 1.0),
    ("big", 0.5),
    ("merge", 0.25),
    ("slow", -1.0),
    ("small", -0.5),
    ("error", -1.0),
)

#: BPE-ish tokenizer regex: word pieces, digit runs, single punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def stopword_hits(text: Column) -> Column:
    """Occurrences (not distinct) of stopwords among tokens."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(stop, t)))


def fingerprint(text: Column) -> Column:
    """Order-insensitive bag-of-words fingerprint (sorted distinct tokens →
    md5) — catches shuffled-token duplicates that exact dedup misses."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def hash_split() -> Column:
    """Deterministic ~80/10/10 train/val/test label from the first md5
    byte of the frame's ``doc_id`` column — content-stable,
    engine-identical byte arithmetic (shared by d_split_train_val_test
    and the leakage audit/repair; the SQL twin lives in each oracle)."""
    h = F.expr(
        "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) * 16"
        " + instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1))) - 17"
    )
    return F.when(h < 204, "train").when(h < 230, "val").otherwise("test")
