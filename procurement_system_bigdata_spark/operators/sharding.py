"""Deterministic global shuffle + sharding for training-data delivery.

The last stage of every pretraining pipeline: the curated corpus must be
(a) split into a fixed number of shards that trainer ranks read
independently, and (b) *globally shuffled* so a shard is not a run of one
source/crawl (order correlation measurably hurts LM convergence).  At
100 TB a true global sort-by-random is one giant all-to-all; the standard
trick (used by every webtext pipeline) is HASH ordering: assign
``shard = H1(doc_id) mod n_shards`` and order within the shard by
``H2(doc_id)`` — a pseudo-random permutation that needs only ONE shuffle
keyed by shard, with a per-shard (i.e. per-output-file) local sort, and is
reproducible across runs, engines, and partitionings (unlike
``ORDER BY rand()``, whose seeded per-partition RNG changes with the
partitioning).

Scale shape: the window is partitioned by ``shard_id``, so the sort is
per-shard; dial ``n_shards`` so a shard fits an executor (100 TB / 10k
shards = 10 GB/shard).  Salted prefixes decouple H1 from H2 and from every
other hash use in the engine (same discipline as the CMS/minhash seed
families).

The reference has no sharding operator (its outputs are single CSV/JSON
reports — SURVEY §2.6); this is a training-data extension (EXT class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as P

N_SHARDS = 16
_SHARD_SALT = "shard|"
_ORDER_SALT = "order|"

# Polynomial char hashes of CONSECUTIVE integers are near-monotone (the
# strings share every char but the last, so hashes differ by the last-char
# delta) — ordering by the raw hash would barely shuffle, and sharding
# would stripe consecutive ids.  One multiplicative scramble fixes it:
# h -> (h * MIX) mod P is a bijection on [0, P) (P prime, MIX not a
# multiple), and consecutive h land MIX apart — decorrelated.  BIGINT-safe:
# h < 2^31, MIX < 2^32, product < 2^63 in both engines.
_MIX = 2654435761  # Knuth's 2^32 / phi multiplier


def _scramble(h):
    return (h * F.lit(_MIX)) % F.lit(P.HASH_P)


def _duck_scramble(h: str) -> str:
    return f"(({h}) * {_MIX}) % {P.HASH_P}"


def training_shards(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """(doc_id, shard_id, pos, n_tokens): deterministic shard assignment and
    0-based position of every document within its shard's pseudo-random
    order.  A writer materializes shard files with
    ``repartition(shard_id).sortWithinPartitions(pos)``; a trainer rank r of
    R reads shards ``shard_id % R == r``.

    Tiebreak: ``H2`` collisions fall back to ``doc_id`` so the permutation
    is total and the operator is bit-reproducible."""
    norm = P.spark_norm_text(F.col("text"))
    n_words = F.when(
        F.coalesce(F.length(norm), F.lit(0)) == 0, F.lit(0)
    ).otherwise(F.size(P.spark_words(norm)))
    keyed = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (
            _scramble(
                P.spark_str_hash(
                    F.concat(
                        F.lit(_SHARD_SALT), F.col("doc_id").cast("string")
                    )
                )
            )
            % n_shards
        ).alias("shard_id"),
        _scramble(
            P.spark_str_hash(
                F.concat(F.lit(_ORDER_SALT), F.col("doc_id").cast("string"))
            )
        ).alias("h2"),
        n_words.cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard_id").orderBy(F.asc("h2"), F.asc("doc_id"))
    return keyed.select(
        "doc_id",
        "shard_id",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        "n_tokens",
    )


def training_shards_sql(
    table: str = "documents", n_shards: int = N_SHARDS
) -> str:
    nt = P.duck_norm_text("text")
    h1 = _duck_scramble(
        P.duck_str_hash(f"'{_SHARD_SALT}' || CAST(doc_id AS VARCHAR)")
    )
    h2 = _duck_scramble(
        P.duck_str_hash(f"'{_ORDER_SALT}' || CAST(doc_id AS VARCHAR)")
    )
    return f"""
    WITH keyed AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               ({h1}) % {n_shards} AS shard_id,
               ({h2}) AS h2,
               CAST(CASE WHEN nt IS NULL OR nt = '' THEN 0
                    ELSE len({P.duck_words('nt')}) END AS BIGINT) AS n_tokens
        FROM (SELECT doc_id, {nt} AS nt FROM {table})
    )
    SELECT doc_id, shard_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard_id ORDER BY h2 ASC, doc_id ASC
           ) - 1 AS BIGINT) AS pos,
           n_tokens
    FROM keyed
    """


def shard_balance(shards: DataFrame) -> DataFrame:
    """(shard_id, n_docs, sum_tokens): the balance check run before handing
    shards to trainer ranks — hash sharding balances DOC counts by
    construction, and this surfaces the token-level spread (a shard that
    drew the long-doc tail).  One shard_id-keyed aggregation."""
    return (
        shards.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select("shard_id", "n_docs", "sum_tokens")
    )


def shard_balance_sql(
    table: str = "documents", n_shards: int = N_SHARDS
) -> str:
    return f"""
    WITH shards AS ({training_shards_sql(table, n_shards)})
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM shards GROUP BY shard_id
    """


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int = N_SHARDS
) -> None:
    """Materialize the shards physically: parquet partitioned by
    ``shard_id``, each shard's rows written in ``pos`` order (ONE shuffle —
    repartition on the same key the window already used — plus a per-shard
    local sort; no global sort anywhere).  A trainer rank r of R streams
    files under ``shard_id=s`` for every s with s % R == r and reads rows
    in stored order.

    Parquet preserves within-file row order and Spark writes one file per
    (task, partition-dir) here because the data was repartitioned BY the
    partition column first — without that repartition, every task holding
    rows of shard s would emit its own fragment and the pos order across
    fragments would be lost."""
    shards = training_shards(docs, n_shards)
    with_text = shards.join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        "doc_id",
    )
    (
        with_text.repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def shard_key_exprs(doc_id_col, n_shards: int = N_SHARDS):
    """(shard_id, h2) column expressions for a doc_id column — the exact
    keys ``training_shards`` uses, exported so the delivery audit can
    re-derive shard assignment and within-shard order independently of the
    window output it is checking."""
    h1 = _scramble(
        P.spark_str_hash(
            F.concat(F.lit(_SHARD_SALT), doc_id_col.cast("string"))
        )
    )
    h2 = _scramble(
        P.spark_str_hash(
            F.concat(F.lit(_ORDER_SALT), doc_id_col.cast("string"))
        )
    )
    return (h1 % n_shards), h2


def shard_id_sql(doc_id_expr: str, n_shards: int = N_SHARDS) -> str:
    """DuckDB expression for the shard assignment of a doc_id expression —
    the oracle-side twin of ``shard_key_exprs`` (subset-independent, so an
    audit can recompute it for docs outside the delivered set)."""
    h1 = _duck_scramble(
        P.duck_str_hash(f"'{_SHARD_SALT}' || CAST({doc_id_expr} AS VARCHAR)")
    )
    return f"({h1}) % {n_shards}"


def n_tokens_sql(text_expr: str) -> str:
    """DuckDB expression for the token count ``training_shards`` reports."""
    nt = P.duck_norm_text(text_expr)
    return (
        f"CAST(CASE WHEN {nt} IS NULL OR {nt} = '' THEN 0 "
        f"ELSE len({P.duck_words(nt)}) END AS BIGINT)"
    )
