"""Sequence packing: greedy bin-packing of documents into fixed
token-budget training sequences.

Packing is inherently sequential WITHIN a pack group (each document's
bin depends on everything packed before it), so the group is the unit
of parallelism: ``applyInPandas`` over the grouping key runs one
Arrow-batched pandas loop per group, and groups pack independently
across executors. At 100 TB the group key is whatever bounds a group
to executor memory (source, date bucket, shard id) — the algorithm
never needs the corpus in one place, only one group's (id, token
count) pairs, which is metadata-scale even for millions of docs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SUMMARY_SCHEMA = (
    "group_key string, n_bins bigint, n_docs bigint, "
    "total_tokens bigint, max_bin_tokens bigint"
)

PACK_ASSIGN_SCHEMA = "group_key string, doc_id bigint, n_tokens bigint, bin bigint"


def _greedy_assign(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """First-fit-sequential greedy packing of one group, ordered by id.

    A document longer than the budget gets a bin of its own (real
    pipelines truncate or split it downstream; the packer must not
    loop forever on it).
    """
    pdf = pdf.sort_values("doc_id")
    bins, fills = [], []
    cur_bin, cur_fill = 1, 0
    for tok in pdf["n_tokens"]:
        if cur_fill > 0 and cur_fill + tok > budget:
            cur_bin += 1
            cur_fill = 0
        cur_fill += int(tok)
        bins.append(cur_bin)
        fills.append(cur_fill)
    out = pdf.copy()
    out["bin"] = bins
    return out


def pack_assignments(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col,
    budget: int = 512,
) -> DataFrame:
    """(group_key, doc_id, n_tokens, bin) — greedy sequence packing.

    ``tokens_col`` may be a column name or Column expression producing
    the per-document token count.
    """
    base = df.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(id_col).cast("long").alias("doc_id"),
        (tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col))
        .cast("long")
        .alias("n_tokens"),
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        return _greedy_assign(pdf, budget)[["group_key", "doc_id", "n_tokens", "bin"]]

    return base.groupBy("group_key").applyInPandas(pack_group, PACK_ASSIGN_SCHEMA)


def pack_summary(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col,
    budget: int = 512,
) -> DataFrame:
    """Per-group packing summary: bins used, docs, tokens, fullest bin."""
    assigned = pack_assignments(df, group_col, id_col, tokens_col, budget)
    per_bin = assigned.groupBy("group_key", "bin").agg(
        F.sum("n_tokens").alias("bin_tokens"), F.count(F.lit(1)).alias("bin_docs")
    )
    return per_bin.groupBy("group_key").agg(
        F.max("bin").alias("n_bins"),
        F.sum("bin_docs").alias("n_docs"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.max("bin_tokens").alias("max_bin_tokens"),
    )
