"""Deterministic dataset sampling / splitting for training-data pipelines.

A train/val/test split over a 100 TB corpus must be (a) reproducible across
runs and engines, (b) computable without any shuffle (a pure per-row map),
and (c) stable under repartitioning — which rules out ``df.sample`` /
``randomSplit`` (seeded per-partition RNG: the assignment changes when the
partitioning changes).  The standard practice is hash-splitting: bucket =
H(stable_id) mod 100, then threshold the bucket.  We use the engine's
portable polynomial hash so the DuckDB oracle reproduces the assignment
bit-for-bit.

The reference has no sampling operator (SURVEY §2.4 — no DISTINCT/sample);
this is a training-data extension (EXT class), same family as dedup/text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remaining 10


def train_val_test_split(
    docs: DataFrame, train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT
) -> DataFrame:
    """Assign every document to train/val/test by hashing its stable id.

    Scale shape: narrow map only — no shuffle, no RNG state, no driver
    collect; adding documents never reassigns existing ones.  The split is
    stratification-friendly: downstream per-``source`` counts stay
    proportional because the hash is independent of ``source``.
    """
    bucket = P.spark_str_hash(F.col("doc_id").cast("string")) % 100
    return docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def train_val_test_split_sql(
    table: str = "documents", train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT
) -> str:
    bucket = f"({P.duck_str_hash('CAST(doc_id AS VARCHAR)')}) % 100"
    return f"""
    SELECT doc_id, source, {bucket} AS bucket,
           CASE WHEN {bucket} < {train_pct} THEN 'train'
                WHEN {bucket} < {train_pct + val_pct} THEN 'val'
                ELSE 'test' END AS split
    FROM {table}
    """


def split_summary(docs: DataFrame) -> DataFrame:
    """Per-(source, split) counts — the sanity report a pipeline emits to
    confirm the hash split is proportional within every stratum."""
    return (
        train_val_test_split(docs)
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- stratified deterministic sampling -------------------------------------

# Per-language keep rates (percent): downsample dominant English, keep rare
# languages whole — the standard corpus-rebalancing shape.
LANG_RATES: dict[str, int] = {"en": 25, "de": 75, "es": 75, "fr": 75, "zh": 100}
DEFAULT_RATE_PCT = 50
SAMPLE_SALT = "sample:"  # decorrelates the sample hash from the split hash


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    rates: dict[str, int] = LANG_RATES,
    default_pct: int = DEFAULT_RATE_PCT,
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff
    H(salt || doc_id) mod 100 < rate(stratum).

    Same scale properties as the split (pure per-row map, shuffle-free,
    repartition-stable, grows monotonically with the corpus), plus
    per-stratum control: changing one stratum's rate never touches rows kept
    in another, and raising a rate only ADDS rows (bucket thresholding), so
    successive curation rounds are supersets — the property training-data
    reruns rely on.  The salt decorrelates sampling from train/val/test
    bucketing: P(keep AND train) = rate x train_pct.
    """
    bucket = (
        P.spark_str_hash(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))) % 100
    )
    rate_map = F.create_map(*[F.lit(x) for kv in sorted(rates.items()) for x in kv])
    rate = F.coalesce(rate_map[F.col(strata_col)], F.lit(default_pct))
    return docs.withColumn("sample_bucket", bucket).filter(
        F.col("sample_bucket") < rate
    )


def stratified_sample_sql(
    table: str = "documents",
    strata_col: str = "lang",
    rates: dict[str, int] = LANG_RATES,
    default_pct: int = DEFAULT_RATE_PCT,
    cols: tuple[str, ...] = ("doc_id", "lang", "source"),
) -> str:
    """SQL twin of ``stratified_sample``.  ``cols`` must list exactly the
    columns of the frame fed to the Spark side (which passes its input
    through plus ``sample_bucket``) or the oracle compare diverges."""
    salted = f"'{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)"
    bucket = f"({P.duck_str_hash(salted)}) % 100"
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(rates.items())
    )
    col_list = ", ".join(cols)
    return f"""
    SELECT *
    FROM (SELECT {col_list}, {bucket} AS sample_bucket FROM {table})
    WHERE sample_bucket < (CASE {strata_col} {whens} ELSE {default_pct} END)
    """


def group_sample_k(
    df: DataFrame,
    group_cols: tuple[str, ...] = ("lang",),
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-group sample: within each group keep the k rows
    with the smallest salted hash of the id (ties broken by the id itself).

    The distributed replacement for per-group reservoir sampling: the hash
    order is a uniform random permutation fixed by the salt, so the first k
    rows OF THAT ORDER are a uniform k-subset — but unlike a true
    reservoir, the selection is reproducible across reruns, stable under
    repartitioning, and monotone in k (raising k only ADDS rows, so
    successive curation rounds are supersets, matching the stratified
    sampler's contract).  One shuffle (the window's partitionBy); at 100 TB
    group cardinality bounds the state, not corpus size — a group's k
    survivors reduce map-side per partition before the shuffle when k is
    small via the rank filter.
    """
    from pyspark.sql.window import Window

    h = P.spark_str_hash(
        F.concat(F.lit(SAMPLE_SALT), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        h.asc(), F.col(id_col).cast("long").asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def group_sample_k_sql(
    table: str = "documents",
    group_cols: tuple[str, ...] = ("lang",),
    k: int = 5,
    id_col: str = "doc_id",
    cols: tuple[str, ...] = ("doc_id", "text", "lang", "source", "n_chars"),
) -> str:
    """SQL twin of ``group_sample_k`` (``cols`` = the Spark frame's columns)."""
    salted = f"'{SAMPLE_SALT}' || CAST({id_col} AS VARCHAR)"
    h = P.duck_str_hash(salted)
    groups = ", ".join(group_cols)
    col_list = ", ".join(cols)
    return f"""
    SELECT {col_list}, sample_rank FROM (
        SELECT {col_list},
               ROW_NUMBER() OVER (
                   PARTITION BY {groups}
                   ORDER BY {h} ASC, CAST({id_col} AS BIGINT) ASC
               ) AS sample_rank
        FROM {table}
    ) WHERE sample_rank <= {k}
    """
