"""WebDataset-style tar shard source/sink (beyond the reference's
formats) — the de-facto layout for large multimodal training corpora:
samples are tar members named ``<key>.<ext>`` (``0001.jpg`` +
``0001.txt`` + ``0001.json`` …), grouped into shard files that stream
sequentially and parallelize at the shard level.

Read side: ``binaryFile`` listing (one task per shard; tars are not
block-splittable, the shard IS the split unit — exactly how these
corpora are laid out) → ``mapInPandas`` parsing each shard with stdlib
``tarfile`` into LONG rows ``(key, ext, payload, shard)``. Schema is
fixed and extension-agnostic; downstream pivots or filters by ext.

Write side: rows carry a key plus one column per extension; a
deterministic shard id (``crc32(key) % n_shards``) groups samples, and
an ``applyInPandas`` writer emits one tar per shard group — executors
write shards in parallel (the path must be a shared filesystem or
object store on a real cluster; local[*] in tests). The returned
manifest (shard_id, n_samples, n_bytes, sha256) forces execution and
doubles as the audit artifact.

Reproducibility: members are written key-sorted with zeroed
mtime/uid/gid/uname, so the SAME data yields byte-identical shards —
pinned by test; content-addressed caching and diff-based corpus audits
depend on this.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

READ_SCHEMA = "key string, ext string, payload binary, shard string"
MANIFEST_SCHEMA = "shard_id long, n_samples long, n_bytes long, sha256 string"


def _shard_bytes(pdf: pd.DataFrame, key_col: str, ext_cols: list[str]) -> bytes:
    """One reproducible tar: members key-sorted then ext-sorted, all
    metadata zeroed."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for _, row in pdf.sort_values(key_col).iterrows():
            for ext in sorted(ext_cols):
                raw = row[ext]
                if raw is None:
                    continue
                data = raw if isinstance(raw, (bytes, bytearray)) else str(raw).encode()
                info = tarfile.TarInfo(name=f"{row[key_col]}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(bytes(data)))
    return buf.getvalue()


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    ext_cols: list[str],
    n_shards: int = 4,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path`` and return
    the manifest DataFrame (collect/inspect it — the write happens when
    the manifest is materialized, like every Spark sink expression).

    Sharding is CONTENT-deterministic (crc32 of the key), not
    partition-deterministic, so re-running on a differently-partitioned
    copy of the same data produces the same shards."""
    os.makedirs(path, exist_ok=True)
    keyed = df.select(
        F.col(key_col).cast("string").alias("__key__"),
        *[F.col(c) for c in ext_cols],
    ).withColumn(
        "__shard__",
        F.crc32(F.col("__key__").cast("binary")) % n_shards,
    )

    def writer(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["__shard__"].iloc[0])
        blob = _shard_bytes(pdf, "__key__", ext_cols)
        fname = os.path.join(path, f"shard-{shard_id:05d}.tar")
        with open(fname, "wb") as f:
            f.write(blob)
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "n_samples": [len(pdf)],
                "n_bytes": [len(blob)],
                "sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    return keyed.groupBy("__shard__").applyInPandas(writer, schema=MANIFEST_SCHEMA)


def read_webdataset(spark, path: str) -> DataFrame:
    """Read tar shards under ``path`` into long rows
    ``(key, ext, payload, shard)`` — one binaryFile task per shard,
    stdlib tarfile decode inside mapInPandas, Arrow-batched out."""
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, exts, payloads, shards = [], [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(p)
                with tarfile.open(fileobj=io.BytesIO(content)) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        keys.append(stem if dot else m.name)
                        exts.append(ext if dot else "")
                        payloads.append(tar.extractfile(m).read())
                        shards.append(shard)
            yield pd.DataFrame(
                {"key": keys, "ext": exts, "payload": payloads, "shard": shards}
            )

    return listing.mapInPandas(kernel, schema=READ_SCHEMA)
