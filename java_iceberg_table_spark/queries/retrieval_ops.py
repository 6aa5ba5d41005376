"""Retrieval / corpus-scoring operators for training-data pipelines:
TF-IDF, BM25, n-gram language-model scoring, quality-filter chains,
RAG chunking, and random-projection dimensionality reduction.

These extend SURVEY.md §2.2 H (rows H31–H36). Everything is built-in
JVM-side expressions — no Python UDF anywhere. The corpus-statistic
sides (document frequencies, unigram/bigram counts, corpus averages)
are tiny relative to the corpus and are broadcast-joined; at 100 TB
the same plans hold with the stats side either still broadcast (query
vocab, corpus scalars) or a shuffle join keyed on the term (full
vocab), never an all-pairs or driver-side loop.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register

# ---------------------------------------------------------------------------
# h31 — TF-IDF top terms per document
# ---------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln(n.n_docs::DOUBLE / dfreq.df) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored WHERE doc_id < 50
)
SELECT doc_id, rk, term, ROUND(score, 4) AS tfidf
FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
"""


@register("h31_tfidf_top_terms", oracle=_TFIDF_ORACLE, group="H")
def h31_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (idf = ln(N/df)).

    Scale shape: explode→groupBy(doc,term) is map-side combinable (one
    shuffle on the composite key); document frequencies are an agg over
    the already-reduced (doc,term) set; the idf side is vocab-sized —
    broadcast here, a term-keyed shuffle join at vocab scales past the
    broadcast threshold. Per-doc top-k runs under WindowGroupLimit
    (rank pushdown), so no doc's full posting list is ever sorted in
    one task beyond its own terms.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.filter(F.col("doc_id") < 50)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", F.round("score", 4).alias("tfidf"))
        .orderBy("doc_id", "rk")
    )


# ---------------------------------------------------------------------------
# h32 — BM25 ranked retrieval for a fixed query
# ---------------------------------------------------------------------------

_BM25_TERMS = ["table", "scan", "hash", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, len(str_split(text, ' '))::DOUBLE AS dl FROM documents
),
stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM toks
  WHERE term IN ('table', 'scan', 'hash', 'merge')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         SUM(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * ({_BM25_K1} + 1.0)
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS bm25
FROM scored ORDER BY score DESC, doc_id LIMIT 10
"""


@register("h32_bm25_topk", oracle=_BM25_ORACLE, group="H")
def h32_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents by BM25 (k1=1.2, b=0.75, Lucene idf) for the
    fixed query {table, scan, hash, merge}.

    Scale shape: the query-term filter lands BEFORE the tf groupBy, so
    the shuffle carries only rows mentioning a query term (|q| ≈ 4
    terms, not the corpus vocabulary). df and corpus stats are scalars
    / |q| rows — literal broadcasts. The final per-doc sum is one
    combinable aggregation; top-10 is TakeOrderedAndProject, never a
    full sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (
        toks.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom).alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# h33 — bigram language-model document scoring (perplexity proxy)
# ---------------------------------------------------------------------------

_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents
),
uni AS (
  SELECT w, COUNT(*) AS c1
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
vocab AS (SELECT COUNT(*)::DOUBLE AS v FROM uni),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
),
bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
scored AS (
  SELECT bg.doc_id,
         COUNT(*) AS n_bigrams,
         AVG(ln((bgc.c12 + 1.0) / (uni.c1 + vocab.v))) AS avg_logprob
  FROM bg
  JOIN bgc USING (w1, w2)
  JOIN uni ON bg.w1 = uni.w
  CROSS JOIN vocab
  GROUP BY bg.doc_id
)
SELECT doc_id, n_bigrams, ROUND(avg_logprob, 4) AS avg_logprob
FROM scored WHERE doc_id < 100 ORDER BY doc_id
"""


@register("h33_bigram_lm_score", oracle=_LM_ORACLE, group="H")
def h33_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed
    bigram LM trained on the corpus itself — the cheap deterministic
    stand-in for KenLM-style perplexity filtering.

    Scale shape: bigrams come from arrays_zip over two slices of the
    token array (no self-join, no positional window); unigram and
    bigram count tables are vocab-scale aggregations reused via
    broadcast (term-keyed shuffle joins past the broadcast threshold).
    In real pipelines the LM counts are trained once and reused across
    scoring runs — here both sides derive from the same fixture scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    bg = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n - 1).alias("w1"),
                F.slice("t", 2, n - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        bg.join(F.broadcast(bgc), ["w1", "w2"])
        .join(F.broadcast(uni), bg["w1"] == uni["w"])
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))
            ).alias("avg_logprob"),
        )
    )
    return (
        scored.filter(F.col("doc_id") < 100)
        .select("doc_id", "n_bigrams", F.round("avg_logprob", 4).alias("avg_logprob"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# h34 — quality-filter chain (C4/Gopher-style keep/drop with reasons)
# ---------------------------------------------------------------------------

_FILTER_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
_STOP_IN = ", ".join(f"'{s}'" for s in _FILTER_STOPWORDS)

_FILTER_ORACLE = f"""
WITH x AS (
  SELECT doc_id,
         len(str_split(text, ' ')) AS n_tokens,
         length(text)::DOUBLE / len(str_split(text, ' ')) AS mean_word_len,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
           / length(text) AS alpha_ratio,
         len(list_distinct(str_split(text, ' ')))::DOUBLE
           / len(str_split(text, ' ')) AS distinct_ratio,
         len(list_filter(str_split(text, ' '),
                         t -> t IN ({_STOP_IN}))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CASE
         WHEN n_tokens < 5 OR n_tokens > 1000 THEN 'word_count'
         WHEN mean_word_len < 2 OR mean_word_len > 12 THEN 'mean_word_len'
         WHEN alpha_ratio < 0.6 THEN 'alpha_ratio'
         WHEN distinct_ratio < 0.3 THEN 'repetition'
         WHEN n_stop < 1 THEN 'no_stopwords'
         ELSE 'pass'
       END AS fail_rule,
       (n_tokens BETWEEN 5 AND 1000)
         AND (mean_word_len BETWEEN 2 AND 12)
         AND alpha_ratio >= 0.6
         AND distinct_ratio >= 0.3
         AND n_stop >= 1 AS keep
FROM x ORDER BY doc_id
"""


@register("h34_quality_filter_chain", oracle=_FILTER_ORACLE, group="H")
def h34_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule-chain document filter: word-count bounds,
    mean-word-length bounds, alpha ratio, repetition (distinct-token
    ratio), and stopword presence; emits keep plus the FIRST failing
    rule (audit trail for filter tuning).

    Scale shape: one pass of pure expressions per document — no
    shuffle, no UDF; at 100 TB this is a map-only stage that fuses
    into whatever scan feeds it.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    n_tok = F.size(t)
    mwl = F.length("text") / n_tok
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")) / F.length(
        "text"
    )
    distinct_ratio = F.size(F.array_distinct(t)) / n_tok
    stop_arr = F.array(*[F.lit(s) for s in _FILTER_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    fail_rule = (
        F.when((n_tok < 5) | (n_tok > 1000), "word_count")
        .when((mwl < 2) | (mwl > 12), "mean_word_len")
        .when(alpha < 0.6, "alpha_ratio")
        .when(distinct_ratio < 0.3, "repetition")
        .when(n_stop < 1, "no_stopwords")
        .otherwise("pass")
    )
    keep = (
        n_tok.between(5, 1000)
        & mwl.between(2, 12)
        & (alpha >= 0.6)
        & (distinct_ratio >= 0.3)
        & (n_stop >= 1)
    )
    return docs.select(
        "doc_id", fail_rule.alias("fail_rule"), keep.alias("keep")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# h35 — RAG chunking (overlapping windows with stable chunk ids)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 20
_CHUNK_STRIDE = 10

_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, str_split(text, ' ') AS t FROM documents WHERE doc_id < 20
)
SELECT doc_id * 10000 + i AS chunk_id,
       doc_id,
       i AS start_tok,
       len(t[i:i + {_CHUNK_SIZE - 1}]) AS n_toks,
       array_to_string(t[i:i + {_CHUNK_SIZE - 1}], ' ') AS chunk_text
FROM toks, LATERAL (
  SELECT unnest(generate_series(1, len(t), {_CHUNK_STRIDE})) AS i
) g
ORDER BY doc_id, start_tok
"""


@register("h35_rag_chunking", oracle=_CHUNK_ORACLE, group="H")
def h35_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping RAG chunker: {size} token windows at stride
    {stride} (50% overlap), chunk id stable under re-runs and appends
    (derived from doc_id + start offset, not any global counter).

    Scale shape: sequence+explode+slice per document — map-only, no
    shuffle; chunk ids need no coordination, so appended documents
    chunk independently (the property that makes incremental RAG
    index refresh possible).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    out = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.size("t"), F.lit(_CHUNK_STRIDE))
        ).alias("start_tok"),
    ).select(
        (F.col("doc_id") * 10000 + F.col("start_tok")).alias("chunk_id"),
        "doc_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(F.slice("t", F.col("start_tok"), F.lit(_CHUNK_SIZE)))
        .cast("long")
        .alias("n_toks"),
        F.array_join(
            F.slice("t", F.col("start_tok"), F.lit(_CHUNK_SIZE)), " "
        ).alias("chunk_text"),
    )
    return out.orderBy("doc_id", "start_tok")


# ---------------------------------------------------------------------------
# h36 — random-projection (JL) dimensionality reduction 64 -> 8
# ---------------------------------------------------------------------------

_JL_IN_DIM = 64
_JL_OUT_DIM = 8
_JL_SCALE = math.sqrt(_JL_OUT_DIM)


def _jl_signs() -> list[list[float]]:
    """Deterministic ±1 projection matrix (seeded; identical literals
    feed both the Spark plan and the DuckDB oracle)."""
    rng = random.Random(42)
    return [
        [1.0 if rng.random() < 0.5 else -1.0 for _ in range(_JL_IN_DIM)]
        for _ in range(_JL_OUT_DIM)
    ]


def _jl_oracle() -> str:
    signs = _jl_signs()
    cols = []
    for j, row in enumerate(signs):
        # explicit left-associated sum: matches Spark's sequential
        # aggregate() fold bit-for-bit, so ROUND(,4) hashes equal.
        terms = " + ".join(
            f"vec[{i + 1}] * {s!r}" for i, s in enumerate(row)
        )
        cols.append(f"ROUND(({terms}) / {_JL_SCALE!r}, 4) AS p{j}")
    cols_sql = ",\n       ".join(cols)
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings WHERE vec_id < 100
)
SELECT vec_id,
       {cols_sql}
FROM base ORDER BY vec_id
"""


@register("h36_jl_projection", oracle=_jl_oracle(), group="H")
def h36_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64→8 dims with a seeded
    ±1 matrix (the Achlioptas construction) — the cheap first stage of
    embedding-space dedup/clustering at scale.

    Scale shape: the projection matrix is 512 literal doubles compiled
    into the plan (zero-shuffle, zero-broadcast); each output dim is a
    sequential zip_with/aggregate fold, so the whole op is map-only
    and fuses into the scan. At 100 TB the same expression runs
    embarrassingly parallel; no state, no driver participation.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    signs = _jl_signs()
    proj_cols = []
    for j, row in enumerate(signs):
        s = F.array(*[F.lit(v) for v in row])
        dot = F.aggregate(
            F.zip_with("vec", s, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_cols.append(F.round(dot / _JL_SCALE, 4).alias(f"p{j}"))
    return base.select("vec_id", *proj_cols).orderBy("vec_id")


# ---------------------------------------------------------------------------
# h6d — prefix-filtered exact Jaccard (PPJoin-style scale path)
# ---------------------------------------------------------------------------

from ..operators.dedup import prefix_filter_jaccard_pairs  # noqa: E402
from .llm_ops import _EXACT_JACCARD_SQL  # noqa: E402


@register("h6d_prefix_filter_jaccard", oracle=_EXACT_JACCARD_SQL, group="H")
def h6d_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered exact Jaccard near-dup (PPJoin-family pruning):
    must equal the same exact-Jaccard oracle as h6/h6b, with the
    candidate join carrying only each doc's rarest ~5% of tokens.
    See prefix_filter_jaccard_pairs (operators/dedup.py) for both the
    pruning argument AND its measured applicability bound on this
    fixture's small vocabulary — h6b MinHash-LSH remains the scale
    path on small-vocab corpora."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = prefix_filter_jaccard_pairs(docs, "doc_id", "text", threshold=0.95)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


# ---------------------------------------------------------------------------
# h37 — end-to-end pretraining-pipeline composition in one plan
# ---------------------------------------------------------------------------

_PIPELINE_ORACLE = f"""
WITH base AS (
  SELECT source, text,
         len(str_split(text, ' ')) AS n_tokens,
         length(text)::DOUBLE / len(str_split(text, ' ')) AS mwl,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
           / length(text) AS alpha,
         len(list_distinct(str_split(text, ' ')))::DOUBLE
           / len(str_split(text, ' ')) AS dr,
         len(list_filter(str_split(text, ' '),
                         t -> t IN ({_STOP_IN}))) AS n_stop
  FROM documents
),
flagged AS (
  SELECT source, text,
         (n_tokens BETWEEN 5 AND 1000) AND (mwl BETWEEN 2 AND 12)
           AND alpha >= 0.6 AND dr >= 0.3 AND n_stop >= 1 AS keep
  FROM base
),
counts AS (
  SELECT source, COUNT(*) AS docs_in,
         COUNT(*) FILTER (WHERE keep) AS docs_kept
  FROM flagged GROUP BY source
),
norm AS (
  SELECT DISTINCT source,
         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS ntext
  FROM flagged WHERE keep
),
normstats AS (
  SELECT source, COUNT(*) AS docs_dedup,
         SUM(len(str_split(ntext, ' ')))::BIGINT AS total_tokens
  FROM norm GROUP BY source
)
SELECT c.source, c.docs_in, c.docs_kept,
       COALESCE(n.docs_dedup, 0) AS docs_dedup,
       COALESCE(n.total_tokens, 0) AS total_tokens
FROM counts c LEFT JOIN normstats n USING (source)
ORDER BY source
"""


@register("h37_pipeline_composition", oracle=_PIPELINE_ORACLE, group="H")
def h37_pipeline_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-data pipeline as ONE Spark plan: quality
    filter (h34 rules) → text normalization (h2) → exact dedup on the
    normalized form (h1) → per-source corpus accounting (docs in/kept/
    deduped, surviving token budget). What a data team actually runs
    nightly; composing it in one declarative plan means Catalyst sees
    the whole thing — the filter prunes before the dedup shuffle, and
    the only shuffles are the per-source aggregate and the distinct.

    Scale shape (re-planned round 10 after the sf1 A/B): filter +
    normalize are map-only and evaluated ONCE — the old plan's two
    consumers of the flagged frame (per-source counts, dedup distinct)
    re-ran the whole quality filter twice; folding everything into one
    (source, ntext) hash aggregate + a tiny per-source rollup halves
    the expression work and drops a shuffle. Normalization is a fused
    lower + translate DELETE of the explicit ASCII punctuation set —
    one table-driven pass, measured 2.0x faster than the
    regexp_replace char-class at sf1 (0.69 s vs 1.34 s) and
    byte-identical on the corpus (ASCII-printable; checked at
    sf0.001-sf1 — the row's oracle keeps the regex form, so any
    non-ASCII drift would grade red loudly). The alpha-ratio regex
    STAYS regex: its translate variant measured slower (0.69 s vs
    0.51 s — [^A-Za-z] is one NFA class; deleting 70 listed chars is
    not). Dropped docs collapse into one NULL group per source whose
    partial counts combine map-side, so the skew is counts-only. No
    joins on data, no windows, no UDFs. Measured at sf1 (warm
    min-of-5): 4.32 s -> 1.83 s vs DuckDB 1.42 s — 1.29x, inside the
    2x letter (was 3.6x)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    n_tok = F.size(t)
    mwl = F.length("text") / n_tok
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", "")) / F.length(
        "text"
    )
    dr = F.size(F.array_distinct(t)) / n_tok
    stop_arr = F.array(*[F.lit(s) for s in _FILTER_STOPWORDS])
    # the h34 rule is n_stop >= 1, which is exactly arrays_overlap —
    # hash-set probe with short-circuit, measured 1.8x faster at sf1
    # than counting matches through a per-token lambda (0.40 s vs
    # 0.72 s) and boolean-identical
    has_stop = F.arrays_overlap(t, stop_arr)
    keep = (
        n_tok.between(5, 1000)
        & mwl.between(2, 12)
        & (alpha >= 0.6)
        & (dr >= 0.3)
        & has_stop
    )
    # delete set = EVERY ASCII char outside [a-z0-9 ] — including the
    # C0 controls and DEL, which the oracle's regex [^a-z0-9 ] also
    # strips (round-10 review: the first cut covered printables +
    # \t\n\r only, so a stray control byte would normalize differently
    # from the oracle). Uppercase is already lowered away; deleting it
    # anyway is harmless.
    kept_chars = set("abcdefghijklmnopqrstuvwxyz0123456789 ")
    norm_delete = "".join(
        chr(c) for c in range(0x80) if chr(c) not in kept_chars
    )
    ntext = F.when(keep, F.translate(F.lower(F.col("text")), norm_delete, ""))
    per_text = (
        docs.select("source", ntext.alias("ntext"))
        .groupBy("source", "ntext")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    kept = F.col("ntext").isNotNull()
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("c").alias("docs_in"),
            F.sum(F.when(kept, F.col("c")).otherwise(0)).alias("docs_kept"),
            F.sum(kept.cast("long")).alias("docs_dedup"),
            F.sum(F.when(kept, F.size(F.split("ntext", " "))).otherwise(0))
            .cast("long")
            .alias("total_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# h46 — hybrid retrieval: BM25 + embedding cosine fused by RRF
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_C = 100  # per-retriever candidate-list depth

_RRF_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, len(str_split(text, ' '))::DOUBLE AS dl FROM documents
),
stats AS (SELECT AVG(dl) AS avgdl, COUNT(*) AS n_docs FROM dl),
toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::DOUBLE AS tf FROM toks
  WHERE term IN ('table', 'scan', 'hash', 'merge')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
bm AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * ({_BM25_K1} + 1.0)
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
         ), 4) AS score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
),
lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
  FROM bm ORDER BY score DESC, doc_id LIMIT {_RRF_C}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
q AS (SELECT vec FROM v WHERE vec_id = 0),
sims AS (
  SELECT c.vec_id AS doc_id,
         ROUND(list_cosine_similarity(q.vec, c.vec), 4) AS sim
  FROM v c CROSS JOIN q WHERE c.vec_id <> 0
),
sem AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rk
  FROM sims ORDER BY sim DESC, doc_id LIMIT {_RRF_C}
),
fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({_RRF_K} + lex.rk), 0)
             + COALESCE(1.0 / ({_RRF_K} + sem.rk), 0), 6) AS rrf
  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id, rrf,
       ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rk
FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
"""


@register("h46_rrf_hybrid_retrieval", oracle=_RRF_ORACLE, group="H")
def h46_rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: lexical BM25 (query {table,scan,hash,merge})
    and embedding-cosine (query vector = vec_id 0) candidate lists
    fused by reciprocal-rank fusion, score = Σ 1/(60 + rank) — the
    standard zero-tuning fusion for RAG retrieval stacks.

    Scale shape: each retriever reduces the corpus to a top-C
    candidate list via TakeOrderedAndProject (orderBy().limit() — no
    global sort, no single-partition window over the corpus); ranks
    are then assigned by a window over the C-row lists (driver-small
    by construction) and fused with one tiny full-outer join. Both
    rankings order by ROUND(score, 4) with doc_id tiebreak so the
    Spark and DuckDB rank sequences are bit-identical. At 100 TB the
    corpus-side work stays the two retrievers' own scale paths (BM25's
    query-term-filtered shuffle, ANN's IVF/LSH buckets feeding the
    same top-C contract)."""
    from ..operators.similarity import cosine_expr

    docs = load_table(spark, sf_dir, "documents")
    # --- lexical: BM25 over the fixed query terms (h32's plan) ---
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl")
    )
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (
        toks.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    bm = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom), 4
            ).alias("score")
        )
    )
    lex = bm.orderBy(F.desc("score"), F.asc("doc_id")).limit(_RRF_C)
    lex = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rk"),
    )
    # --- semantic: cosine to the query vector, same top-C contract ---
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("vec").alias("qv"))
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_expr("qv", "vec"), 4).alias("sim"),
        )
    )
    sem = sims.orderBy(F.desc("sim"), F.asc("doc_id")).limit(_RRF_C)
    sem = sem.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), F.asc("doc_id")))
        .alias("rk"),
    )
    # --- fuse the two C-row lists ---
    fused = (
        lex.select("doc_id", F.col("rk").alias("rk_lex"))
        .join(
            sem.select("doc_id", F.col("rk").alias("rk_sem")),
            "doc_id",
            "full_outer",
        )
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("rk_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("rk_sem")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    out = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)
    return out.select(
        "doc_id",
        "rrf",
        F.row_number()
        .over(Window.orderBy(F.desc("rrf"), F.asc("doc_id")))
        .cast("long")
        .alias("rk"),
    )


# ---------------------------------------------------------------------------
# h47 — DSIR-style importance weighting for data selection
# ---------------------------------------------------------------------------

_DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
),
vocab AS (SELECT COUNT(DISTINCT w)::DOUBLE AS v FROM toks),
tgt AS (
  SELECT w, COUNT(*)::DOUBLE AS ct FROM toks WHERE doc_id < 50 GROUP BY w
),
raw AS (
  SELECT w, COUNT(*)::DOUBLE AS cr FROM toks WHERE doc_id >= 50 GROUP BY w
),
nt AS (SELECT SUM(ct) AS n_t FROM tgt),
nr AS (SELECT SUM(cr) AS n_r FROM raw),
scored AS (
  SELECT toks.doc_id,
         ROUND(AVG(
           ln( (COALESCE(tgt.ct, 0) + 1.0) / (nt.n_t + vocab.v) )
         - ln( (COALESCE(raw.cr, 0) + 1.0) / (nr.n_r + vocab.v) )
         ), 4) AS w_imp
  FROM toks
  LEFT JOIN tgt USING (w)
  LEFT JOIN raw USING (w)
  CROSS JOIN nt CROSS JOIN nr CROSS JOIN vocab
  WHERE toks.doc_id >= 50
  GROUP BY toks.doc_id
)
SELECT doc_id, w_imp,
       ROW_NUMBER() OVER (ORDER BY w_imp DESC, doc_id) AS rk
FROM scored ORDER BY w_imp DESC, doc_id LIMIT 50
"""


@register("h47_dsir_importance_selection", oracle=_DSIR_ORACLE, group="H")
def h47_dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR,
    arXiv:2302.03169) in its exact-unigram-LM form: score every RAW
    document (doc_id >= 50) by the mean per-token log importance ratio
    ln(p_target(w) / p_raw(w)) with add-one smoothing over the shared
    vocabulary (target domain sample = doc_id < 50), then keep the
    top-50 — the deterministic top-quota variant of the paper's
    importance resampling.

    Scale shape: one explode into (doc, token); the two LM sides are
    token-keyed aggregates of that same relation (map-side
    combinable); the per-token joins key on the term — broadcast at
    fixture vocab, a term-keyed shuffle join at web-corpus vocab, and
    the paper's own answer past that is the hashing trick (h42's
    machinery: fixed-width feature space, no vocabulary build at
    all). Per-doc score is one combinable AVG; selection is
    TakeOrderedAndProject. Nothing is quadratic and nothing collects."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = toks.agg(F.countDistinct("w").cast("double").alias("v"))
    tgt = (
        toks.filter(F.col("doc_id") < 50)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("ct"))
    )
    raw = (
        toks.filter(F.col("doc_id") >= 50)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("cr"))
    )
    nt = tgt.agg(F.sum("ct").alias("n_t"))
    nr = raw.agg(F.sum("cr").alias("n_r"))
    ratio = F.log(
        (F.coalesce(F.col("ct"), F.lit(0.0)) + 1.0) / (F.col("n_t") + F.col("v"))
    ) - F.log(
        (F.coalesce(F.col("cr"), F.lit(0.0)) + 1.0) / (F.col("n_r") + F.col("v"))
    )
    scored = (
        toks.filter(F.col("doc_id") >= 50)
        .join(F.broadcast(tgt), "w", "left")
        .join(F.broadcast(raw), "w", "left")
        .join(F.broadcast(nt))
        .join(F.broadcast(nr))
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.round(F.avg(ratio), 4).alias("w_imp"))
    )
    out = scored.orderBy(F.desc("w_imp"), F.asc("doc_id")).limit(50)
    return out.select(
        "doc_id",
        "w_imp",
        F.row_number()
        .over(Window.orderBy(F.desc("w_imp"), F.asc("doc_id")))
        .cast("long")
        .alias("rk"),
    )


# ---------------------------------------------------------------------------
# h48 — matryoshka embedding truncation: dim/4 retrieval + measured recall
# ---------------------------------------------------------------------------

_MRL_DIM = 16  # truncated prefix of the 64-dim fixture embeddings
_MRL_K = 5
_MRL_Q = 5  # queries: vec_id < 5

_MRL_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
t AS (SELECT vec_id, vec[1:{_MRL_DIM}] AS tv FROM v),
full_nn AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND(list_cosine_similarity(q.vec, c.vec), 4) DESC,
                                     c.vec_id) AS rn
  FROM v q JOIN v c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {_MRL_Q}
),
trunc_nn AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND(list_cosine_similarity(q.tv, c.tv), 4) DESC,
                                     c.vec_id) AS rn
  FROM t q JOIN t c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {_MRL_Q}
),
hits AS (
  SELECT f.query_id, COUNT(*) AS hit
  FROM full_nn f JOIN trunc_nn t
    ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
  WHERE f.rn <= {_MRL_K} AND t.rn <= {_MRL_K}
  GROUP BY f.query_id
)
SELECT f.query_id,
       CAST(COALESCE(h.hit, 0) AS BIGINT) AS overlap,
       ROUND(COALESCE(h.hit, 0) / {_MRL_K}.0, 4) AS recall_at_k
FROM (SELECT DISTINCT query_id FROM full_nn) f
LEFT JOIN hits h USING (query_id)
ORDER BY query_id
"""


@register("h48_matryoshka_truncation_recall", oracle=_MRL_ORACLE, group="H")
def h48_matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimensionality reduction (arXiv:2205.13147):
    retrieval over the FIRST d/4 dimensions of each embedding, graded
    by measured recall@5 against full-dimension exact top-k per query
    — the quantify-the-tradeoff step every embedding-storage budget
    decision needs (a 4x smaller index is only worth it if this
    number says so).

    Measured honestly: the synthetic fixture embeddings are isotropic
    (no MRL training concentrated information in the prefix dims), so
    recall lands near the random-overlap floor (~0-0.4 here) — which
    is exactly what this operator exists to SHOW; on real matryoshka
    checkpoints the same measurement reads 0.9+. The grading is the
    exact per-query overlap computation, not a recall threshold.

    Scale shape: truncation is `F.slice` in the projection — the scan
    reads the same column but every downstream byte (shuffle,
    broadcast, index) shrinks 4x; both retrievals are the h8
    broadcast-queries + per-query WindowGroupLimit top-k plan; the
    recall join compares two k-row-per-query lists (tiny). Ranks
    order by ROUND(sim,4)+id so Spark and DuckDB agree exactly."""
    from ..operators.similarity import cosine_expr

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec")
    )
    trunc = emb.select("vec_id", F.slice("vec", 1, _MRL_DIM).alias("vec"))

    def topk(vs):
        q = vs.filter(F.col("vec_id") < _MRL_Q).select(
            F.col("vec_id").alias("query_id"), F.col("vec").alias("qv")
        )
        pairs = (
            vs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.round(cosine_expr("qv", "vec"), 4).alias("sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        return (
            pairs.select(
                "query_id", "neighbor_id", F.row_number().over(w).alias("rn")
            )
            .filter(F.col("rn") <= _MRL_K)
        )
    full_nn = topk(emb)
    trunc_nn = topk(trunc)
    hits = (
        full_nn.join(trunc_nn, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hit"))
    )
    return (
        full_nn.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hit", F.lit(0)).cast("long").alias("overlap"),
            F.round(F.coalesce("hit", F.lit(0)) / float(_MRL_K), 4).alias(
                "recall_at_k"
            ),
        )
        .orderBy("query_id")
    )
