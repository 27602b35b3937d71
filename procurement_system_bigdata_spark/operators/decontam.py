"""Train/test decontamination: n-gram collision between corpus and benchmark.

The standard LLM-pipeline hygiene step (GPT-2/GPT-3-style 13-gram
decontamination): a training document is contaminated if it shares at least
one (configurable) normalized n-gram with any document in a held-out
benchmark/eval set; contaminated docs are dropped or flagged before
training.

Scale shape (the part that matters at 100 TB): the benchmark side is tiny —
thousands of eval documents against billions of training docs — so its
distinct-gram set is BROADCAST and the corpus-side explode never shuffles;
per-doc gram sets are `array_distinct` before explode so a gram repeated
inside one document contributes one row; the only shuffle is the final
(doc_id, bench_id) overlap count, bounded by actual collisions.  Grams join
on md5(gram) (deterministic in both engines) so shuffle/broadcast rows
carry 32-byte keys instead of raw 13-word strings.

Parity model: no decontamination exists in the reference (SURVEY §2 EXT) —
this is the training-data extension surface, oracle-mirrored in DuckDB.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

# Registry/oracle dial: the synthetic corpus has a 31-word vocabulary, so
# 13-grams (the production default) almost never collide across the
# benchmark carve-out — 3-grams give a few thousand deterministic hits,
# exercising the join/count path with real volume.  Production calls pass
# n=13 explicitly (decontaminate's own default).
DECONTAM_NGRAM = 3
DECONTAM_BENCH_MOD = 7


def _gram_hashes(df: DataFrame, id_col: str, out_id: str, n: int) -> DataFrame:
    words = P.spark_words(P.spark_norm_text(F.col("text")))
    return df.select(
        F.col(id_col).cast("long").alias(out_id),
        F.explode(F.array_distinct(P.spark_word_shingles(words, n))).alias("g"),
    ).select(out_id, F.md5(F.col("g")).alias("gh"))


def decontaminate(
    corpus: DataFrame,
    benchmarks: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, n_overlap, bench_grams, contamination) for every
    corpus document sharing >= ``min_overlap`` distinct normalized n-grams
    with a benchmark document.  ``contamination`` is the fraction of the
    benchmark's distinct grams found in the doc (1.0 = the doc contains the
    whole benchmark item, the canonical drop signal).

    Inputs: corpus (doc_id, text), benchmarks (bench_id OR doc_id, text).
    """
    bid = "bench_id" if "bench_id" in benchmarks.columns else "doc_id"
    doc_g = _gram_hashes(corpus, "doc_id", "doc_id", n)
    bench_g = _gram_hashes(benchmarks, bid, "bench_id", n)
    bench_sizes = bench_g.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    hits = (
        doc_g.join(F.broadcast(bench_g), "gh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )
    return hits.join(F.broadcast(bench_sizes), "bench_id").select(
        "doc_id",
        "bench_id",
        "n_overlap",
        "bench_grams",
        (
            F.col("n_overlap").cast("double") / F.col("bench_grams")
        ).alias("contamination"),
    )


def decontaminate_sql(
    table: str = "documents",
    n: int = DECONTAM_NGRAM,
    min_overlap: int = 1,
    bench_mod: int = DECONTAM_BENCH_MOD,
) -> str:
    """DuckDB mirror of the registry query: benchmark = docs with
    doc_id %% bench_mod == 0, corpus = the rest."""
    norm = P.duck_norm_text("text")
    shingles = P.duck_word_shingles("ws", n)
    return f"""
    WITH corpus AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, {norm} AS nt
        FROM {table} WHERE doc_id % {bench_mod} <> 0
    ),
    bench AS (
        SELECT CAST(doc_id AS BIGINT) AS bench_id, {norm} AS nt
        FROM {table} WHERE doc_id % {bench_mod} = 0
    ),
    corpus_w AS (SELECT doc_id, {P.duck_words('nt')} AS ws FROM corpus),
    bench_w AS (SELECT bench_id, {P.duck_words('nt')} AS ws FROM bench),
    doc_g AS (
        SELECT doc_id, md5(g) AS gh
        FROM (SELECT doc_id, unnest(list_distinct({shingles})) AS g FROM corpus_w)
    ),
    bench_g AS (
        SELECT bench_id, md5(g) AS gh
        FROM (SELECT bench_id, unnest(list_distinct({shingles})) AS g FROM bench_w)
    ),
    bench_sizes AS (
        SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS bench_grams
        FROM bench_g GROUP BY bench_id
    ),
    hits AS (
        SELECT doc_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM doc_g JOIN bench_g USING (gh)
        GROUP BY doc_id, bench_id
        HAVING COUNT(*) >= {min_overlap}
    )
    SELECT h.doc_id, h.bench_id, h.n_overlap, s.bench_grams,
           CAST(h.n_overlap AS DOUBLE) / s.bench_grams AS contamination
    FROM hits h JOIN bench_sizes s USING (bench_id)
    """
