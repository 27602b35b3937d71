"""Batch MERGE / CDC operators without a table format.

The reference's only mutation semantic is Cassandra's last-write-wins upsert
(reference init-scripts/cassandra/init.cql:15); these operators generalize it
to the patterns a warehouse needs: keyed MERGE (upsert a changes batch into a
base snapshot) and SCD2 history maintenance — emulated with anti-join +
union + window, the standard approach when Delta/Iceberg jars are absent
(they are not in this environment; with a table format these become
``MERGE INTO`` against the same logical semantics).

Scale: every step is keyed by the merge key — one shuffle each side, no
driver-side state; SCD2's window is per-key (bounded partitions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_upsert(
    base: DataFrame, changes: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Keyed MERGE: rows from ``changes`` replace same-key rows in ``base``;
    unmatched change rows insert.  Column sets must match.  Equivalent to
    ``MERGE INTO base USING changes WHEN MATCHED UPDATE * WHEN NOT MATCHED
    INSERT *`` with last-write-wins inside the changes batch handled by the
    caller (see sources.readers.read_snapshots_json)."""
    keep = base.join(changes.select(*keys), list(keys), "left_anti")
    return keep.unionByName(changes)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    effective_col: str = "effective_from",
    end_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close out current rows whose key
    receives a change (end = the change's effective date) and append the new
    versions as current.

    ``dim`` carries (attrs..., effective_from, effective_to, is_current);
    ``changes`` carries (attrs..., effective_from).  History rows pass
    through untouched.

    Exact-duplicate change rows are collapsed; a batch containing the SAME
    key with DIFFERENT attributes is ambiguous (which version is current?)
    and must be resolved by the caller before applying — e.g. with the
    last-write-wins dedup in sources.readers.
    """
    changes = changes.dropDuplicates()
    chg = changes.select(
        *keys,
        F.col(effective_col).alias("_new_from"),
    ).dropDuplicates(list(keys))

    current = dim.filter(F.col(current_col))
    history = dim.filter(~F.col(current_col))

    closed = (
        current.join(F.broadcast(chg), list(keys), "inner")
        .withColumn(end_col, F.col("_new_from"))
        .withColumn(current_col, F.lit(False))
        .drop("_new_from")
    )
    untouched = current.join(chg.select(*keys), list(keys), "left_anti")
    new_rows = changes.withColumn(end_col, F.lit(None).cast(dim.schema[end_col].dataType)).withColumn(
        current_col, F.lit(True)
    )
    return history.unionByName(closed).unionByName(untouched).unionByName(new_rows)


def dataset_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, change, old_fp, new_fp): content diff between two dataset
    versions — ``added`` / ``removed`` / ``modified`` / ``unchanged`` by
    normalized-text fingerprint.  The audit a pipeline runs between
    versioned snapshots (sources/versioned.py) before retraining: what
    actually changed, and how much.

    Scale: one fingerprint projection per side (map-side), one doc_id-keyed
    full outer join — the same shape as MERGE, no text comparison (32-byte
    md5s travel, not documents)."""
    from ..functions import portable as P

    def fps(df, col):
        # NULL text must fingerprint (as the empty string), not produce a
        # NULL fp: the change CASE reads fp-nullness as row-ABSENCE, so an
        # un-coalesced NULL-text row would misclassify as added/removed
        return df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5(
                F.coalesce(P.spark_norm_text(F.col("text")), F.lit(""))
            ).alias(col),
        )

    o = fps(old, "old_fp")
    n = fps(new, "new_fp")
    change = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", change.alias("change"), "old_fp", "new_fp"
    )


def dataset_diff_summary(diff: DataFrame) -> DataFrame:
    """(change, n_docs): the release-note roll-up of a dataset diff."""
    return diff.groupBy("change").agg(F.count(F.lit(1)).alias("n_docs"))
