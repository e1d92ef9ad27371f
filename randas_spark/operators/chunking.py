"""Document chunking and sequence packing — the two reshaping ops
between a cleaned corpus and a training run.

- :func:`chunk_documents` — split each doc into fixed-size token windows
  with configurable overlap (the RAG/pretraining chunker). Pure array
  expressions: tokenize once, then slice per window — the per-row
  expansion is an explode, so no shuffle at all.
- :func:`pack_sequences` — assign docs to fixed-capacity training bins
  by cumulative token count in a deterministic order (the streaming
  approximation of bin packing: contiguous fill, one window pass).
  True first-fit-decreasing is inherently sequential; the cumulative
  form is what large pipelines actually run because it's one scan and
  deterministic under re-runs.

Scale: chunking is narrow (scan-side). Packing's window runs over a
single global order — at 100 TB, partition the corpus first (e.g. by
shard = hash(doc_id) % n_shards, pack within shards: the window then
partitions by shard and parallelizes; bin ids become (shard, local_bin)).
The query layer exposes the per-shard form for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from randas_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 50,
    stride: int = 25,
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_text, n_tokens): overlapping token
    windows; stride < chunk_size → overlap of chunk_size - stride.
    Short docs yield one chunk. Deterministic chunk count:
    1 + ceil(max(n - chunk_size, 0) / stride).

    Rows with a NULL text are dropped EXPLICITLY (explode of a null
    token array would drop them silently — this makes the contract
    visible; pre-fill if null docs must survive chunking). stride must
    not exceed chunk_size: a larger stride skips tokens AND can compute
    a chunk offset past the doc's end, emitting an empty chunk with
    NEGATIVE n_tokens."""
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        raise ValueError(
            f"stride ({stride}) must be <= chunk_size ({chunk_size}): larger "
            "strides skip tokens and emit phantom negative-length chunks"
        )
    df = df.filter(F.col(text_col).isNotNull())
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - chunk_size, F.lit(0)).cast("double") / stride
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_size)).alias(
                "chunk_text"
            ),
            F.least(n - i * stride, F.lit(chunk_size)).alias("n_tokens"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    capacity: int = 2048,
    shard_col=None,
) -> DataFrame:
    """(id, n_tokens, shard, bin): contiguous greedy packing — docs are
    laid out in deterministic id order and cut into bins every
    ``capacity`` tokens (bin = floor(preceding-cumsum / capacity)).
    A doc never splits across bins; a bin may overflow by at most one
    doc's tokens (the classic one-pass trade-off — cap doc length
    upstream with chunk_documents).

    ``shard_col`` partitions the packing (parallel, independent bins per
    shard — the scale path); None packs globally (single window
    partition: fine for shortlists, not for a corpus).
    """
    shard = shard_col if shard_col is not None else F.lit(0)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(token_count_col).cast("long").alias("n_tokens")
        if isinstance(token_count_col, str)
        else token_count_col.cast("long").alias("n_tokens"),
        shard.alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "id",
        "n_tokens",
        "shard",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / capacity)
        .cast("long")
        .alias("bin"),
    )
