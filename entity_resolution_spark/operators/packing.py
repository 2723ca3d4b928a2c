"""Training-sequence packing — fixed-token-budget grouping of documents.

LLM pretraining consumes fixed-length sequences; loaders pack variable-
length documents into budgeted rows to avoid padding waste.  True optimal
bin packing is sequential, so the distributed form used here is next-fit
within hash-ordered shards:

  1. each doc gets a deterministic shard ``pmod(60-bit md5(id), n_shards)``
     (the shard count bounds per-task state and sets write parallelism);
  2. within a shard, docs are ordered by that same hash (deterministic,
     content-defined — NOT by size, which would cluster long docs);
  3. a running token total over that order assigns
     ``pack_id = floor(pre_cumsum / budget)`` — the classic next-fit rule,
     where a pack may overflow the budget by at most one document (the
     overflowing doc opens the next pack on loader side, or is truncated;
     that policy belongs to the consumer).

Everything is one partitioned window (cumulative sum per shard — never a
global window) over integer token counts: deterministic at any
partitioning and engine, hence oracle-checkable.  Waste vs optimal is the
usual next-fit bound; raising ``n_shards`` trades pack quality for
parallelism exactly like loader worker counts do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .sampling import sample_hash


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    salt: str = "pack-v1",
) -> DataFrame:
    """Assign ``(shard, pack_id)`` to each doc; packs respect
    ``budget_tokens`` under next-fit (each pack's pre-assignment total is
    below the budget; the last doc may overflow it)."""
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    h = sample_hash(F.col(id_col), salt)
    d = docs.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("_h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        d.select(id_col, "n_tokens", "shard", pre.alias("_pre"))
        .select(
            id_col,
            "n_tokens",
            "shard",
            # exact integer division (no float floor): cumulative sums are
            # longs and stay longs
            F.expr(f"_pre div {int(budget_tokens)}").cast("long").alias(
                "pack_id"
            ),
        )
    )


def packed_texts(
    docs: DataFrame,
    budget_tokens: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str = "n_tokens",
    salt: str = "pack-v1",
    separator: str = "\n\n",
) -> DataFrame:
    """Materialize the packs: one output row per (shard, pack_id) with the
    member documents concatenated in the SAME hash order the packing used
    (struct-sort of (hash, id, text) inside the group — deterministic at
    any partitioning, no second window).  Returns
    ``shard, pack_id, n_docs, n_tokens, text``.
    """
    assignments = pack_sequences(
        docs,
        budget_tokens,
        n_shards=n_shards,
        id_col=id_col,
        n_tokens_col=n_tokens_col,
        salt=salt,
    )
    h = sample_hash(F.col(id_col), salt)
    joined = assignments.join(
        docs.select(id_col, text_col), id_col
    ).withColumn("_h", h)
    member = F.struct(F.col("_h"), F.col(id_col), F.col(text_col).alias("t"))
    return (
        joined.groupBy("shard", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(member)), lambda x: x["t"]
                ),
                separator,
            ).alias("text"),
        )
    )
