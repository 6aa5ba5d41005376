"""Text-analysis operators for training-data pipelines: tokenization,
token counting, quality scoring, language-ID, fingerprinting.

Everything is built-in expressions except language-ID's profile
training, which is a small aggregate (vocab x lang) collected once —
the classification itself is a broadcast join + expression scoring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A small English stopword list (public, standard) for quality ratios.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
]


def tokenize(df: DataFrame, text_col: str = "text") -> Column:
    return F.split(F.col(text_col), r"\s+")


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: token count (whitespace), a
    BPE-ish subword count (regex splits on word boundaries and digit
    runs), char count."""
    toks = F.split(F.col(text_col), r"\s+")
    # BPE-ish: split on whitespace AND intra-word transitions
    # (letter/digit boundary), the cheap deterministic stand-in for a
    # real tokenizer's piece count.
    bpe = F.split(F.col(text_col), r"\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])")
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(bpe).alias("n_subwords"),
        F.length(text_col).alias("n_chars"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, mean word length, stopword
    ratio, alpha ratio, repetition ratio (distinct/total tokens). All
    pure expressions — one pass, no shuffle."""
    toks = F.split(F.col(text_col), r"\s+")
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(F.length(text_col) / n_tok, 4).alias("mean_word_len"),
        F.round(n_stop / n_tok, 4).alias("stopword_ratio"),
        F.round(n_alpha / F.length(text_col), 4).alias("alpha_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 of the normalized text
    (lowercase, collapsed whitespace) plus a 64-bit xxhash — the
    dedup-key primitives (md5 is cross-engine checkable)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


def train_char_profiles(
    df: DataFrame, lang_col: str = "lang", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Per-language character-n-gram frequency profile learned from a
    labeled corpus: (lang, ngram, freq). Aggregate is vocab x lang
    sized — tiny, broadcastable."""
    grams = F.explode(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
            f"i -> substring({text_col}, i, {n}))"
        )
    ).alias("ngram")
    counts = df.select(F.col(lang_col).alias("lang"), grams).groupBy("lang", "ngram").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("lang").agg(F.sum("c").alias("total"))
    return counts.join(totals, "lang").select(
        "lang", "ngram", (F.col("c") / F.col("total")).alias("freq")
    )


def language_id(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Classify each document to the language whose n-gram profile
    maximizes sum(log freq) over the document's n-grams (naive-Bayes
    style). profiles is broadcast; the scoring is an explode + join +
    sum — shuffles on (doc, lang), never materializes n² anything."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
                f"i -> substring({text_col}, i, {n}))"
            )
        ).alias("ngram"),
    )
    scored = (
        grams.join(F.broadcast(profiles), "ngram")
        .groupBy("id", "lang")
        .agg(F.sum(F.log("freq")).alias("score"), F.count(F.lit(1)).alias("matched"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("id").alias(id_col), F.col("lang").alias("predicted_lang"))
    )


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL: lowercase, fragment and query string
    stripped, ``www.`` host prefix dropped, trailing slash removed.

    Pure expression chain (anchored regexes, no capture-group
    replacements so Java-regex and RE2 oracles agree); at scale this
    is the key of a hash-shuffle dedup, exactly like any other exact
    dedup key."""
    c = F.lower(col)
    c = F.regexp_replace(c, "#.*$", "")
    c = F.regexp_replace(c, "\\?.*$", "")
    c = F.regexp_replace(c, "://www\\.", "://")
    c = F.regexp_replace(c, "/$", "")
    return c
