"""Distributed BPE vocabulary induction (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer-training step of an LLM data
pipeline, Spark-first.

Scale design: the corpus is touched EXACTLY ONCE — a tokenize +
groupBy(word) pass that reduces 100 TB of text to a word-type
frequency table (bounded by vocabulary size, ~10M rows for web-scale
corpora, i.e. model-scale not data-scale). Every merge iteration then
runs on that small table only:

  - pair counting: explode adjacent symbol pairs weighted by word
    frequency, groupBy(pair) → sum — a shuffle over O(|vocab| x
    avg_word_len) rows, independent of corpus size;
  - argmax: 1-row collect (the model update, not data);
  - merge application: a left-to-right fold compiled into a single
    JVM-side `aggregate` higher-order expression — no Python UDF.

The per-iteration persist() caps plan growth so N merges stay N small
jobs rather than one exponentially nested plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_MARK = "</w>"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """ONE corpus pass: lowercase, whitespace-tokenize, count word
    types. Returns (word, freq) — everything after this is
    vocabulary-scale."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(wf: DataFrame) -> DataFrame:
    """Split each word type into characters + an end-of-word marker
    (the marker makes suffix merges distinct from in-word merges,
    as in the original BPE formulation). Keeps the word string so the
    trained table doubles as the encode lookup (word -> segmentation)."""
    chars = F.filter(F.split("word", ""), lambda c: F.length(c) > 0)
    return wf.select(
        "word", "freq", F.concat(chars, F.array(F.lit(END_MARK))).alias("syms")
    )


def _adjacent_pairs(syms: DataFrame) -> DataFrame:
    """(a, b, count) for every adjacent symbol pair, weighted by word
    frequency. Overlapping occurrences each count once (Sennrich's
    get_stats semantics)."""
    pair = F.expr(
        "transform(slice(syms, 1, size(syms) - 1), (s, i) -> "
        "struct(s AS a, syms[i + 1] AS b))"
    )
    return (
        syms.select("freq", F.explode(pair).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_expr(a: str, b: str) -> Column:
    """Left-to-right single-pass merge of adjacent (a, b) -> ab inside
    a symbol array, as one JVM-side fold: the accumulator carries the
    emitted prefix and one pending symbol; a pending `a` followed by
    `b` emits the merged token instead. Non-overlapping, leftmost
    first — 'aaa' under (a,a) becomes ['aa','a']."""
    qa, qb, qm = _sql_quote(a), _sql_quote(b), _sql_quote(a + b)
    return F.expr(
        "aggregate(syms, "
        "  named_struct('acc', cast(array() AS array<string>), "
        "               'pend', cast(null AS string)), "
        "  (st, s) -> CASE "
        "    WHEN st.pend IS NULL THEN named_struct('acc', st.acc, 'pend', s) "
        f"   WHEN st.pend = {qa} AND s = {qb} THEN "
        f"     named_struct('acc', concat(st.acc, array({qm})), "
        "                   'pend', cast(null AS string)) "
        "    ELSE named_struct('acc', concat(st.acc, array(st.pend)), "
        "                      'pend', s) END, "
        "  st -> CASE WHEN st.pend IS NULL THEN st.acc "
        "             ELSE concat(st.acc, array(st.pend)) END)"
    )


def _symbol_mass(syms: DataFrame) -> int:
    """Total corpus token length under the current segmentation:
    sum over word types of freq * len(syms). Every applied merge
    occurrence shortens one word by exactly 1, so mass strictly
    decreases on every successful merge (overlap-safe: 'aaa' under
    (a,a) applies once, mass -1)."""
    row = syms.agg(
        F.sum(F.col("freq") * F.size("syms")).alias("m")
    ).collect()[0]
    return int(row["m"] or 0)


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> tuple[list[tuple[str, str, int]], DataFrame, list[int]]:
    """Learn ``n_merges`` BPE merges over ``df[text_col]``.

    Returns (merges, final_symbols, masses) where merges is a list of
    (a, b, pair_count_at_selection) in order, final_symbols is the
    (freq, syms) word-type table after all merges, and masses is the
    corpus symbol mass before/after each merge (len(merges)+1 values).
    Ties on pair count break by (a, b) lexicographic order — fully
    deterministic, so the same corpus always yields the same
    vocabulary (retry-safe)."""
    syms = _initial_symbols(word_freq_table(df, text_col)).persist()
    masses = [_symbol_mass(syms)]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _adjacent_pairs(syms)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] <= 0:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        nxt = syms.select(
            "word", "freq", _merge_expr(a, b).alias("syms")
        ).persist()
        masses.append(_symbol_mass(nxt))
        syms.unpersist()
        syms = nxt
    return merges, syms, masses


def bpe_selfcheck(
    spark,
    merges: list[tuple[str, str, int]],
    masses: list[int],
    n_merges: int,
) -> DataFrame:
    """Collapse a BPE run to driver-gradable invariants:
    - n_merges: every requested merge found a positive-count pair;
    - all_counts_positive: every selected pair had cnt > 0;
    - mass_strictly_decreasing: corpus symbol mass dropped on EVERY
      merge step — the selected pair was actually applied, not just
      chosen. (Pair counts themselves are not monotonic in BPE, so no
      ordering is claimed on them.)
    """
    dec = all(m2 < m1 for m1, m2 in zip(masses, masses[1:]))
    return spark.createDataFrame(
        [
            (
                len(merges),
                all(c > 0 for _, _, c in merges),
                bool(dec) if merges else False,
            )
        ],
        "n_merges long, all_counts_positive boolean, "
        "mass_strictly_decreasing boolean",
    )


def bpe_encode_tokens(docs: DataFrame, text_col: str, trained_syms: DataFrame) -> DataFrame:
    """Encode a corpus with a trained BPE table the scale-correct way:
    the (word -> segmentation) table from training IS the encoder, so
    applying BPE to 100 TB is ONE broadcast join on word types — the
    merge folds never re-run over the corpus. Unseen words (encoding a
    different corpus than trained on) fall back to character + </w>
    segmentation, exactly their untrained state.

    Returns (doc tokens) per document: (id-cols.., n_words, n_tokens).
    """
    words = docs.select(
        "*", F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    lut = trained_syms.select("word", F.size("syms").alias("__n_tok_lut"))
    fallback = F.length("word") + F.lit(1)  # chars + </w>
    return (
        words.join(F.broadcast(lut), "word", "left")
        .withColumn("mapped", F.col("__n_tok_lut").isNotNull())
        .withColumn("n_tok", F.coalesce("__n_tok_lut", fallback))
        .drop("__n_tok_lut")
    )
