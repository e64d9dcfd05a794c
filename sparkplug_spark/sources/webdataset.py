"""WebDataset tar-shard sink + source: the de-facto container format
for multimodal training data (image/text/metadata files grouped per
sample inside plain ``.tar`` shards, streamed sequentially by data
loaders).  A sample is the set of entries sharing one basename key:
``000123.jpg`` + ``000123.txt`` + ``000123.json``.

Scale shape: shards are written one-per-task from ``applyInPandas``
groups (the same executor-side writer pattern as the WARC fixtures —
bytes never visit the driver), read back one-file-per-row via
``binaryFile`` into an Arrow kernel that walks tar headers
sequentially (tar is a 512-byte-block header-payload chain — no
central directory needed, which is exactly why loaders stream it).
Tar metadata is pinned (mtime 0, uid/gid 0, fixed modes) so a shard's
bytes are a pure function of its rows — resharding is reproducible and
shard-level md5 dedup works.

No counterpart in the reference engine; the format follows the public
webdataset spec (POSIX ustar entries, samples contiguous, keys sorted
within shard).
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_webdataset", "read_webdataset"]


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    ext_cols: dict[str, str],
    num_shards: int = 8,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``path``:
    ``shard-NNNNN.tar`` files, each holding the samples whose
    ``md5(key) % num_shards`` lands there, keys sorted within the
    shard, one tar entry per ``ext_cols`` mapping (``{"txt": "text",
    "json": "meta"}`` → ``<key>.txt`` from column ``text`` …).

    Entry bytes: ``binary`` columns verbatim, anything else UTF-8 of
    its string form; NULL values skip that entry (a sample may lack a
    modality).  Deterministic end-to-end: md5 sharding, sorted keys,
    zeroed tar metadata — the same rows always produce byte-identical
    shards.  Returns the (collected-size) manifest as a DataFrame
    ``(shard, n_samples, n_bytes)``; one task writes one shard, so
    ``num_shards`` is the write parallelism AND the reader's file-level
    parallelism.

    ``path`` must be a filesystem every executor can reach (local mode,
    NFS, a fuse-mounted object store) — the shard writer is a plain
    task-side ``open()``, the standard WebDataset production pattern of
    writing shards locally/mounted and syncing to object storage after;
    for direct ``s3://``-style output, point ``path`` at a mount or
    copy the finished shards with your uploader.  Byte-determinism
    makes the post-copy verifiable by md5."""
    if not ext_cols:
        raise ValueError("ext_cols must be non-empty")
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    import os

    os.makedirs(path, exist_ok=True)
    exts = dict(ext_cols)
    key_s = F.col(key_col).cast("string")
    src = df.select(
        key_s.alias("__key"),
        (
            F.conv(F.substring(F.md5(key_s), 1, 8), 16, 10).cast("long")
            % int(num_shards)
        ).alias("__shard"),
        *[F.col(c).alias(f"__c_{e}") for e, c in exts.items()],
    )

    def write_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        fname = os.path.join(path, f"shard-{shard:05d}.tar")
        pdf = pdf.sort_values("__key")
        n = 0
        with open(fname, "wb") as fh:
            with tarfile.open(fileobj=fh, mode="w") as tar:
                for _, row in pdf.iterrows():
                    n += 1
                    for e in exts:
                        v = row[f"__c_{e}"]
                        if v is None or (
                            isinstance(v, float) and pd.isna(v)
                        ):
                            continue
                        data = (
                            bytes(v)
                            if isinstance(v, (bytes, bytearray, memoryview))
                            else str(v).encode("utf-8")
                        )
                        info = tarfile.TarInfo(name=f"{row['__key']}.{e}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        info.mode = 0o644
                        tar.addfile(info, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard": [fname],
                "n_samples": [n],
                "n_bytes": [os.path.getsize(fname)],
            }
        )

    manifest = (
        src.groupBy("__shard")
        .applyInPandas(
            write_shard, "shard string, n_samples long, n_bytes long"
        )
        .collect()  # bounded: one row per shard
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        manifest, "shard string, n_samples long, n_bytes long"
    )


WEBDATASET_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset tar shards at ``path`` (glob ok) into
    ``(shard, key, ext, data)`` rows — one row per tar entry; group by
    ``key`` downstream to reassemble samples.  Shards land one-per-row
    via ``binaryFile`` and are walked sequentially in an Arrow kernel
    (bounded memory: one entry at a time); non-regular entries and
    directory members are skipped."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                rows = []
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(row["content"])), mode="r"
                ) as tar:
                    for info in tar:
                        if not info.isreg():
                            continue
                        name = info.name
                        key, dot, ext = name.rpartition(".")
                        if not dot:
                            key, ext = name, ""
                        data = tar.extractfile(info).read()
                        rows.append(
                            {
                                "shard": row["path"],
                                "key": key,
                                "ext": ext,
                                "data": data,
                            }
                        )
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(kernel, WEBDATASET_SCHEMA)
