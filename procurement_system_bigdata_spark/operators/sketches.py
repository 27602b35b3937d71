"""Count-min sketch over token streams, as a mergeable DataFrame table.

The second mergeable sketch in the engine (HLL distinct-count rollup lives
in queries/analytics.py): a CMS answers "how often does token t appear in
this 100 TB corpus?" from a d x w counter grid that is thousands of times
smaller than the token stream, with one-sided error
(estimate >= truth, estimate <= truth + eps*N with probability 1 - delta,
eps = e/w, delta = e^-d).

Spark-native design choice: the sketch is a (hash_idx, bucket, cnt)
DataFrame — d*w rows — rather than an opaque binary blob.  That makes the
three sketch operations plain relational algebra:

* BUILD  = explode tokens -> d affine bucket hashes -> one groupBy count
  (map-side partial aggregation does the heavy lifting; the shuffle carries
  at most d*w rows per map partition, regardless of corpus size);
* MERGE  = unionByName + groupBy sum — associative, commutative, exactly
  the property that lets per-day/per-shard sketches roll up without
  rescanning raw data (tested: merge(sketch(A), sketch(B)) == sketch(A|B)
  EXACTLY, since counters are additive);
* QUERY  = join candidate tokens against the d (hash_idx, bucket) cells,
  take MIN over the d estimates.

Hash family: the engine-portable affine transforms over the char-fold
token hash (functions/portable.py), so the whole sketch is deterministic
and DuckDB-mirrored — the ORACLE covers the sketch bits, not just row
counts.  No UDFs anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import portable as P

CMS_DEPTH = 4
CMS_WIDTH = 512
# dedicated seed family, DISJOINT from every minhash/simhash dial: indices
# 32-35 of minhash_params(64) (the old choice) are bit-identical to
# coefficients 32-35 of the K=128 production family, so CMS buckets
# correlated with minhash band 8.  The offset sits far above any reachable
# signature width K (same fix as similarity._PROJECTION_TABLE = 1<<20), so
# no K can ever reach into this range.
CMS_SEED_OFFSET = 1 << 20


def _cms_coeffs(depth: int):
    """Per-call coefficient family: derived for the REQUESTED depth (the
    module used to pin a 4-entry list, so depth > 4 raised IndexError at
    plan-build time).  Same generator + offset, so depths <= 4 are
    bit-identical to the old family."""
    return P.minhash_params(depth, offset=CMS_SEED_OFFSET)


def _tokens(docs: DataFrame) -> DataFrame:
    words = P.spark_words(P.spark_norm_text(F.col("text")))
    return docs.select(F.explode(words).alias("w")).filter(F.col("w") != "")


def token_cms(docs: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """(hash_idx, bucket, cnt): the CMS counter grid for the corpus token
    stream (occurrences, not distinct).  One explode + one groupBy."""
    cms_a, cms_b = _cms_coeffs(depth)
    tok = _tokens(docs).select(P.spark_str_hash(F.col("w")).alias("h"))
    cells = tok.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_idx"),
                        (
                            (F.lit(cms_a[i]) * F.col("h") + F.lit(cms_b[i]))
                            % P.HASH_P
                            % width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.hash_idx", "c.bucket")
    return cells.groupBy("hash_idx", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Additive union: merge(sketch(A), sketch(B)) == sketch(A ++ B) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("hash_idx", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate_tokens(
    sketch: DataFrame,
    tokens: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(token, est): point estimates for a candidate token column ``w`` —
    min over the d cells each token hashes to.  The sketch side is d*w rows
    and broadcast; candidates stream."""
    cms_a, cms_b = _cms_coeffs(depth)
    cand = tokens.select(
        "w",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hash_idx"),
                        (
                            (
                                F.lit(cms_a[i]) * P.spark_str_hash(F.col("w"))
                                + F.lit(cms_b[i])
                            )
                            % P.HASH_P
                            % width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select("w", "c.hash_idx", "c.bucket")
    # LEFT join + coalesce-0: a candidate cell ABSENT from the sketch is a
    # zero counter, and the CMS min over d cells must see it — the old
    # inner join dropped empty cells, so an unseen token's estimate was the
    # min over only its colliding cells (arbitrarily inflated) or the token
    # vanished from the output entirely when all d cells were empty
    return (
        cand.join(F.broadcast(sketch), ["hash_idx", "bucket"], "left")
        .groupBy("w")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
        .select(F.col("w").alias("token"), "est")
    )


def cms_heavy_hitters(
    docs: DataFrame,
    min_count: int = 50,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(token, est) for every distinct token whose CMS estimate reaches
    ``min_count``.  One-sided: every TRUE heavy hitter is reported
    (est >= truth); over-reporting is bounded by eps*N.  The candidate set
    is the corpus's distinct tokens — at 100 TB, feed a sampled or
    domain-known candidate list instead and the sketch answers from d*w
    counters without rescanning."""
    sketch = token_cms(docs, depth, width)
    cand = _tokens(docs).distinct()
    return cms_estimate_tokens(sketch, cand, depth, width).filter(
        F.col("est") >= min_count
    )


# --- DuckDB mirrors --------------------------------------------------------


def _duck_tokens(table: str) -> str:
    nt = P.duck_norm_text("text")
    return (
        f"SELECT w FROM (SELECT unnest({P.duck_words('nt')}) AS w FROM "
        f"(SELECT {nt} AS nt FROM {table})) WHERE w <> ''"
    )


def _duck_cells(src: str, depth: int, width: int) -> str:
    """src must yield (w); emits (hash_idx, bucket) per token per hash."""
    h = P.duck_str_hash("w")
    cms_a, cms_b = _cms_coeffs(depth)
    rows = " UNION ALL ".join(
        f"SELECT {i} AS hash_idx, (({cms_a[i]} * hh + {cms_b[i]}) % {P.HASH_P})"
        f" % {width} AS bucket, w FROM hashed"
        for i in range(depth)
    )
    return f"WITH toks AS ({src}), hashed AS (SELECT w, {h} AS hh FROM toks) {rows}"


def token_cms_sql(
    table: str = "documents", depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    cells = _duck_cells(_duck_tokens(table), depth, width)
    return (
        f"SELECT hash_idx, bucket, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM ({cells}) GROUP BY hash_idx, bucket"
    )


def cms_heavy_hitters_sql(
    table: str = "documents",
    min_count: int = 50,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    cells = _duck_cells(_duck_tokens(table), depth, width)
    return f"""
    WITH sketch AS (
        SELECT hash_idx, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ({cells}) GROUP BY hash_idx, bucket
    ),
    cand_cells AS (
        SELECT DISTINCT hash_idx, bucket, w FROM ({cells})
    ),
    est AS (
        SELECT c.w AS token, MIN(COALESCE(s.cnt, 0)) AS est
        FROM cand_cells c LEFT JOIN sketch s USING (hash_idx, bucket)
        GROUP BY c.w
    )
    SELECT token, est FROM est WHERE est >= {min_count}
    """


# ---------------------------------------------------------------------------
# Fixed-grid histogram sketch (mergeable quantile estimates)
# ---------------------------------------------------------------------------

HIST_LO = 0.0
HIST_HI = 500.0
HIST_BINS = 100


def _bin_col(col: str, lo: float, hi: float, n_bins: int):
    """Shared fixed-grid bin expression (Spark side).  Single definition:
    the grouped/ungrouped variants and both SQL twins must bin identically
    or the sketches silently stop merging exactly."""
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col).cast("double") - lo) / width).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def _bin_sql(col: str, lo: float, hi: float, n_bins: int) -> str:
    width = (hi - lo) / n_bins
    return (
        f"least(greatest(CAST(floor((CAST({col} AS DOUBLE) - {lo}) / {width})"
        f" AS BIGINT), 0), {n_bins - 1})"
    )


def _finite(col: str):
    """NULL/NaN/Inf guard (both engines must agree): NULLs used to clamp
    into bin 0 (Spark greatest() skips nulls), NaN crashed only the DuckDB
    mirror's CAST, and ±Inf survived Spark's clamp into the edge bins while
    still crashing DuckDB's CAST — histograms now count finite values only,
    matching the exact quantile companion's NULL-skipping semantics.
    Delegates to the shared portable definition (functions/portable.py) so
    every fixed-point pipeline filters identically."""
    return P.spark_finite(F.col(col))


def _finite_sql(col: str) -> str:
    return P.duck_finite(col)



def value_histogram(
    df: DataFrame,
    col: str = "value",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """(bin, cnt): fixed-grid histogram of ``col`` — the third mergeable
    sketch (counts: CMS; distinct: HLL; quantiles: this).  A FIXED grid
    (static lo/hi, agreed across all shards) is what makes merging exact:
    per-day/per-shard histograms sum bin-wise with no re-binning, unlike
    adaptive sketches (t-digest) whose merges approximate.  Out-of-range
    values clamp to the edge bins (never dropped) — the estimate's error
    stays <= one bin width inside the grid, unbounded only for the clamped
    tails, which is the documented trade for exact mergeability.
    One groupBy over n_bins keys; map-side partials do the reduction.
    """
    return (
        df.filter(_finite(col))
        .select(_bin_col(col, lo, hi, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*sketches: DataFrame) -> DataFrame:
    """Bin-wise additive union — exact (same fixed grid on every input)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """(q, est): quantile estimates from the cumulative histogram — the
    upper edge of the first bin whose cumulative count reaches q*N.  Error
    <= one bin width by construction (tested).  Deterministic double math
    over exact BIGINT counts, so the oracle hash-matches."""
    width = (hi - lo) / n_bins
    # the sketch is <= n_bins rows but each of the len(qs) probe branches
    # below re-derives it — without this checkpoint that means re-scanning
    # the FACT table once per quantile (scan audit: 4 events scans)
    sketch = sketch.localCheckpoint()
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    out = None
    for q in qs:
        hit = (
            cum.filter(
                F.col("cum") >= F.lit(float(q)) * F.col("total").cast("double")
            )
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(float(q)).alias("q"),
                (F.lit(lo) + (F.col("bin").cast("double") + 1) * width).alias(
                    "est"
                ),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def value_histogram_sql(
    table: str = "events",
    col: str = "value",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    n_bins: int = HIST_BINS,
) -> str:
    return f"""
    SELECT {_bin_sql(col, lo, hi, n_bins)} AS bin,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM {table}
    WHERE {_finite_sql(col)}
    GROUP BY 1
    """


def histogram_quantiles_sql(
    table: str = "events",
    col: str = "value",
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    n_bins: int = HIST_BINS,
) -> str:
    width = (hi - lo) / n_bins
    hist = value_histogram_sql(table, col, lo, hi, n_bins)
    selects = " UNION ALL ".join(
        f"""(SELECT CAST({float(q)} AS DOUBLE) AS q,
                    {lo} + (CAST(bin AS DOUBLE) + 1) * {width} AS est
             FROM cum WHERE cum >= {float(q)} * CAST(total AS DOUBLE)
             ORDER BY bin LIMIT 1)"""
        for q in qs
    )
    return f"""
    WITH hist AS ({hist}),
    cum AS (
        SELECT bin,
               SUM(cnt) OVER (ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS total
        FROM hist
    )
    {selects}
    """


def value_histogram_by(
    df: DataFrame,
    group_col: str = "event_type",
    col: str = "value",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """(group, bin, cnt): per-group fixed-grid histograms on the SHARED
    grid — so group sketches merge with each other (roll subgroups up to
    totals by dropping the group key and summing) and with whole-table
    sketches, bin-wise exactly.  One groupBy on (group, bin)."""
    return (
        df.filter(_finite(col))
        .select(F.col(group_col).alias("grp"), _bin_col(col, lo, hi, n_bins).alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def value_histogram_by_sql(
    table: str = "events",
    group_col: str = "event_type",
    col: str = "value",
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    n_bins: int = HIST_BINS,
) -> str:
    return f"""
    SELECT {group_col} AS grp,
           {_bin_sql(col, lo, hi, n_bins)} AS bin,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM {table}
    WHERE {_finite_sql(col)}
    GROUP BY 1, 2
    """
