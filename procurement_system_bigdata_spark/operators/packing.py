"""Training-sequence packing: assemble chunks into fixed-budget sequences.

The step between chunking and tokenization in an LLM data pipeline: greedy
in-order packing of each document's chunks into sequences of at most
``budget_words`` words, minimizing padding waste.  Greedy packing is a
SEQUENTIAL scan (each decision depends on the running fill), which plain
window functions cannot express — this is exactly the applyInPandas case:
the groupBy shuffle shards state by document, and each group's scan runs
in one Arrow batch.

Scale: state is one document's chunk list (bounded by document length);
parallelism = number of documents.  Cross-document packing (filling the
tail of one doc's sequence with the next doc's chunks) would serialize the
whole corpus — deliberately NOT offered; padding waste at realistic budget
sizes is < 1/budget per document, the standard trade.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PACKED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seq_idx", IntegerType()),
        StructField("n_chunks", IntegerType()),
        StructField("n_words", LongType()),
        StructField("seq_text", StringType()),
    ]
)


def pack_chunks(chunks: DataFrame, budget_words: int = 128) -> DataFrame:
    """Pack each doc's chunks (rows with doc_id, chunk_idx, n_chunk_words,
    chunk_text — the chunk_documents output) into sequences of at most
    ``budget_words`` words, greedy first-fit in chunk order.

    A single chunk larger than the budget still becomes its own (oversize)
    sequence — dropping data silently would be worse; count them downstream.
    Deterministic: input order is pinned by the explicit chunk_idx sort.
    """

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("chunk_idx")
        doc_id = int(group["doc_id"].iloc[0])
        rows, cur_texts, cur_words = [], [], 0

        def flush():
            if cur_texts:
                rows.append(
                    (doc_id, len(rows), len(cur_texts), cur_words, " ".join(cur_texts))
                )

        for _, r in group.iterrows():
            w = int(r["n_chunk_words"])
            if cur_texts and cur_words + w > budget_words:
                flush()
                cur_texts, cur_words = [], 0
            cur_texts.append(r["chunk_text"])
            cur_words += w
        flush()
        return pd.DataFrame(
            rows, columns=["doc_id", "seq_idx", "n_chunks", "n_words", "seq_text"]
        )

    return chunks.groupBy("doc_id").applyInPandas(pack, schema=PACKED_SCHEMA)
