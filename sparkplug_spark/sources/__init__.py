"""Sources & sinks.

The reference's only source is a JSON-lines rule file read via
``spark.read.json(path).as[PlugRule].collect()``
(``SparkPlugHelper.scala:8-12``).  Rules are tiny driver-side objects, so the
local-path fast path parses without a Spark job; non-local paths (hdfs://,
s3a://, ...) go through ``spark.read`` so any Hadoop-compatible filesystem
works on a real cluster.

Input/output tables are plain ``spark.read`` / ``df.write`` — thin helpers
only (the reference takes/returns DataFrames, ``SparkPlug.scala:29-40``).
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from ..models import PlugRule, rule_from_dict, rules_from_json_lines

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_plug_rules",
    "read_table",
    "read_corpus",
    "write_table",
    "write_bucketed",
    "write_sharded",
    "write_sorted",
    "write_zordered",
    "zorder_value",
    "overwrite_partitions",
    "compact_table",
    "schema_drift",
    "layout_skipping_report",
    "manifest_publish",
    "manifest_resolve",
    "read_store",
    "read_warc",
    "read_wet",
    "index_warc_offsets",
    "read_warc_ranges",
    "read_cdx",
    "cdxj_line",
    "CDX_SCHEMA",
    "write_webdataset",
    "read_webdataset",
    "warcinfo_metadata",
    "parse_warc_records",
    "warc_record",
    "warc_response_record",
    "warc_conversion_record",
    "gzip_member",
    "WARC_SCHEMA",
]

from .webdataset import (  # noqa: E402  (facade re-export)
    read_webdataset,
    write_webdataset,
)
from .cdx import (  # noqa: E402  (facade re-export)
    CDX_SCHEMA,
    cdxj_line,
    read_cdx,
)
from .warc import (  # noqa: E402  (facade re-export)
    WARC_SCHEMA,
    gzip_member,
    index_warc_offsets,
    read_warc_ranges,
    parse_warc_records,
    read_warc,
    read_wet,
    warc_conversion_record,
    warc_record,
    warc_response_record,
    warcinfo_metadata,
)

_LOCAL_SCHEMES = ("", "file")


def read_plug_rules(spark: "SparkSession", path: str) -> list[PlugRule]:
    """Load JSON-lines rules (reference ``SparkPlugHelper.scala:8-12``)."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme in _LOCAL_SCHEMES and os.path.exists(path.removeprefix("file://")):
        with open(path.removeprefix("file://"), encoding="utf-8") as f:
            return rules_from_json_lines(f)
    rows = spark.read.json(path).collect()
    return [
        rule_from_dict(
            {
                "name": r["name"],
                "version": r["version"],
                "condition": r["condition"],
                "actions": [
                    {"key": a["key"], "value": a["value"]} for a in (r["actions"] or [])
                ],
            }
        )
        for r in rows
    ]


def read_table(spark: "SparkSession", path: str, fmt: str = "parquet") -> "DataFrame":
    """Scan helper.  Declarative reads keep Catalyst's pushdown/pruning —
    filters and projections applied by callers reach the parquet scan."""
    return spark.read.format(fmt).load(path)


def read_corpus(
    spark: "SparkSession",
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    corrupt_col: str = "_corrupt_record",
) -> "DataFrame":
    """Document-corpus ingestion for the common raw formats.

    - ``parquet``/``orc``: schema from the footer; predicate pushdown and
      column pruning work as usual.
    - ``jsonl``/``csv``: pass an explicit ``schema`` DDL — schema INFERENCE
      runs an extra full scan of the input before the real read, which at
      100 TB doubles ingest cost and (for JSON) silently widens types.
      With a schema supplied, malformed lines land in ``corrupt_col``
      (PERMISSIVE mode) instead of failing the job; filter on it to
      quarantine bad records.
    """
    if fmt in ("parquet", "orc"):
        return spark.read.format(fmt).load(path)
    if fmt in ("jsonl", "json", "csv"):
        reader = spark.read
        if schema is not None:
            reader = reader.schema(f"{schema}, {corrupt_col} string")
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
        if fmt == "csv":
            reader = reader.option("header", "true")
            return reader.csv(path)
        return reader.json(path)
    raise ValueError(f"unsupported corpus format {fmt!r}")


def write_table(
    df: "DataFrame",
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def overwrite_partitions(
    df: "DataFrame",
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
) -> None:
    """Incremental refresh on vanilla parquet: DYNAMIC partition
    overwrite replaces only the partitions present in ``df`` and leaves
    every other partition untouched — the day-N reprocess pattern without
    a table format.  (Static mode, the default, would silently TRUNCATE
    the whole table first; the conf is set per-write here and restored.)"""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.format(fmt)
            .mode("overwrite")
            .partitionBy(*partition_by)
            .save(path)
        )
    finally:
        spark.conf.set(key, prev)


def write_bucketed(
    df: "DataFrame",
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED table (``bucketBy`` + ``saveAsTable``): both
    sides of a repeated equi-join bucketed the same way join with ZERO
    shuffle — the scan partitioning already satisfies the join's
    distribution.  The knob that turns an every-run 100 TB shuffle into a
    one-time write cost for fact-to-fact joins."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_sorted(
    df: "DataFrame",
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with a data-skipping layout: range-partition on
    ``sort_cols`` then sort within each partition, so every output file
    covers a narrow, non-overlapping slice of the sort key and its
    parquet footer min/max statistics actually prune.

    Why this matters at 100 TB: a selective filter on an UNSORTED corpus
    still reads every file (each file's min/max spans the whole key
    domain); after a one-time sorted rewrite, point/range scans on the
    leading sort column touch only the files whose slice overlaps —
    Spark's parquet reader skips the rest from footer stats alone, no
    table format needed.  Cost is one range shuffle (sampling pass +
    exchange) at write time.  Sort by the column(s) your queries filter
    on; for multi-column skipping with equal weight consider interleaving
    (Z-order) keys instead — not implemented here."""
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def zorder_value(df: "DataFrame", cols: list[str], bits: int = 16):
    """Column expression: Z-order (Morton) key over numeric columns.

    Each column is scaled to a ``bits``-bit bucket id using its observed
    min/max (ONE small agg job, driver-side constants), then the bucket
    bits are interleaved.  Sorting by the result gives files whose
    min/max footer stats are narrow in EVERY interleaved dimension at
    once — the multi-column data-skipping layout a single-column sort
    can't provide.  All-integer arithmetic (exact, engine-reproducible;
    bucket = (value - min) div ceil(span / 2^bits), so wide domains like
    epoch-micros never overflow a long).  Returns the key Column; 2 cols
    × 16 bits = 32-bit keys."""
    from pyspark.sql import functions as F

    if not 1 <= len(cols) * bits <= 62:
        raise ValueError("need 1 <= len(cols) * bits <= 62")
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"min_{c}") for c in cols],
        *[F.max(c).cast("long").alias(f"max_{c}") for c in cols],
    ).collect()[0]
    n_buckets = 1 << bits
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo = bounds[f"min_{c}"] or 0
        span = max((bounds[f"max_{c}"] or 0) - lo + 1, 1)
        chunk = max(1, -(-span // n_buckets))  # ceil; bucket < n_buckets
        bucket = F.expr(f"(cast(`{c}` as bigint) - ({lo})) div {chunk}")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    return z


def write_zordered(
    df: "DataFrame",
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """:func:`write_sorted` on a :func:`zorder_value` key: one layout
    rewrite that lets selective filters on ANY of ``cols`` prune files
    from parquet footer stats.  Use when queries filter on several
    independent columns; prefer plain :func:`write_sorted` when one
    column dominates (Z-order dilutes per-column locality ~√ per added
    dimension)."""
    z = zorder_value(df, cols, bits)
    tmp = df.withColumn("__z", z)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        tmp.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )


def write_sharded(
    df: "DataFrame",
    path: str,
    target_weight: int,
    weight_col: str,
    id_col: str = "doc_id",
    num_groups: int = 64,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> "DataFrame":
    """Write ``df`` as weight-targeted shards (dataloader-sized output
    files) and return a MANIFEST DataFrame describing every file written.

    Rows are packed into shards of ~``target_weight`` cumulative
    ``weight_col`` (tokens, chars, bytes) by
    :func:`~sparkplug_spark.operators.pack_token_budget` — deterministic
    md5 order, so the same corpus shards identically on any run, cluster
    size, or engine.  One directory per shard (``shard=<group>-<id>``),
    exactly one data file per shard: the pre-write ``repartition`` on the
    shard key means every shard's rows land in a single task.

    Manifest columns: (shard, file, n_rows, total_weight, bytes).  Rows
    and weights are aggregated distributively from a read-back of the
    written files; byte sizes come from one recursive filesystem listing
    (one row per OUTPUT FILE — bounded by corpus_weight/target_weight,
    driver-safe by construction: ~200k entries for 100 TB at 512 MB
    shards).

    The training-serving hand-off: the manifest is what a dataloader
    consumes (file list + sizes for deterministic epoch scheduling), and
    re-running the pipeline reproduces both files and manifest
    bit-for-bit."""
    from pyspark.sql import functions as F

    from ..operators.cleaning import pack_token_budget

    packed = pack_token_budget(
        df, budget=target_weight, weight_col=weight_col, id_col=id_col,
        num_groups=num_groups,
    ).withColumn(
        "shard", F.format_string("%04d-%06d", "pack_group", "shard_id")
    ).drop("pack_group", "shard_id")
    (
        packed.repartition("shard")
        .write.format(fmt)
        .mode(mode)
        .partitionBy("shard")
        .save(path)
    )

    spark = df.sparkSession
    # one recursive listing for byte sizes (works on any Hadoop FS)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    # keyed by (shard, basename): basenames repeat across shard dirs
    # (every partition dir gets a part-00000-<job-uuid> file)
    sizes: dict[tuple[str, str], int] = {}
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if "/shard=" in name and not name.endswith("_SUCCESS"):
            shard = name.split("/shard=", 1)[1].split("/", 1)[0]
            sizes[(shard, name.rsplit("/", 1)[-1])] = int(st.getLen())

    per_file = (
        read_table(spark, path, fmt)
        .withColumn(
            "file", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        .groupBy("shard", "file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(weight_col).cast("long").alias("total_weight"),
        )
        .collect()
    )
    manifest = [
        (r["shard"], r["file"], r["n_rows"], r["total_weight"],
         sizes.get((r["shard"], r["file"]), 0))
        for r in per_file
    ]
    return spark.createDataFrame(
        manifest,
        "shard string, file string, n_rows long, total_weight long, bytes long",
    )


def _fs_for(spark: "SparkSession", path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def recover_swap(spark: "SparkSession", path: str) -> bool:
    """Repair a half-finished :func:`publish_over` swap: if the live path
    is missing but its ``.swap_old`` backup exists (crash landed between
    the two renames), restore the backup.  Returns True when the live
    path exists afterwards.  Callers that CHECK for a store before
    merging into it must call this first, or a crash window would make
    them silently restart from empty while the next publish deletes the
    only backup."""
    jvm, jpath, fs = _fs_for(spark, path)
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".swap_old")
    if not fs.exists(jpath) and fs.exists(old):
        if not fs.rename(old, jpath):
            raise IOError(f"recover_swap: could not restore {path}")
    return bool(fs.exists(jpath))


def publish_over(spark: "SparkSession", path: str, write_fn) -> None:
    """Atomically-as-renames-allow publish over a directory a plan may be
    READING: ``write_fn(tmp_path)`` writes the new contents aside, then
    the swap runs tmp → live with the previous live kept as ``.swap_old``
    until the new live lands (rollback on failure).  A half-finished
    previous swap is recovered first.  NOT atomic for concurrent readers
    — that guarantee needs a table format; run maintenance swaps in a
    window.  Shared by ``compact_table`` and the streaming sketch stores
    so durability fixes land in one place."""
    jvm, jpath, fs = _fs_for(spark, path)
    recover_swap(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".swap_tmp")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".swap_old")
    fs.delete(tmp, True)
    write_fn(tmp.toString())
    if fs.exists(jpath):
        fs.delete(old, True)
        if not fs.rename(jpath, old):
            raise IOError(f"publish_over: could not move {path} aside")
    if not fs.rename(tmp, jpath):
        if fs.exists(old):
            fs.rename(old, jpath)  # roll back
        raise IOError(f"publish_over: could not publish {path}")
    fs.delete(old, True)


#: Pointer file naming the live version directory of a manifest store.
#: Underscore-prefixed so any accidental direct parquet read of the root
#: ignores it (and finds no data — versions are underscore-dirs too —
#: rather than silently double-reading two versions).
_MANIFEST = "_MANIFEST"
_COMMITTED = "_COMMITTED"


def _manifest_versions(fs, jvm, path: str) -> list[tuple[int, str]]:
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("_v") and name[2:].isdigit():
            out.append((int(name[2:]), name))
    return sorted(out)


def manifest_resolve(spark: "SparkSession", path: str) -> "str | None":
    """Live data directory of a manifest store (see
    :func:`manifest_publish`), or None when ``path`` is not one.
    Resolution order: the ``_MANIFEST`` pointer; else (first-publish
    crash window on filesystems without atomic overwrite-rename) the
    highest ``_COMMITTED`` version — a version directory is only marked
    committed after its writer finished, so a half-written publish can
    never be served."""
    jvm, jpath, fs = _fs_for(spark, path)
    base = path.rstrip("/")
    mf = jvm.org.apache.hadoop.fs.Path(base + "/" + _MANIFEST)
    if fs.exists(mf):
        stream = fs.open(mf)
        try:
            raw = bytes(
                jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        vname = raw.decode("utf-8").strip().splitlines()[0]
        vdir = base + "/" + vname
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(vdir)):
            raise IOError(
                f"manifest store {path} names missing version {vname!r} — "
                "external deletion of a live version"
            )
        return vdir
    committed = [
        (n, name)
        for n, name in _manifest_versions(fs, jvm, base)
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{base}/{name}/{_COMMITTED}")
        )
    ]
    if committed:
        return f"{base}/{committed[-1][1]}"
    return None


def _manifest_write_version(
    spark: "SparkSession", path: str, write_fn
) -> str:
    """Step 1 of a manifest publish: write the next version directory and
    its ``_COMMITTED`` marker.  Crash anywhere in here leaves the pointer
    untouched — readers keep serving the previous version."""
    jvm, jpath, fs = _fs_for(spark, path)
    base = path.rstrip("/")
    fs.mkdirs(jpath)
    versions = _manifest_versions(fs, jvm, base)
    n = (versions[-1][0] + 1) if versions else 1
    vname = f"_v{n:08d}"
    write_fn(f"{base}/{vname}")
    marker = jvm.org.apache.hadoop.fs.Path(f"{base}/{vname}/{_COMMITTED}")
    fs.create(marker, True).close()
    return vname


def _manifest_commit(spark: "SparkSession", path: str, vname: str) -> None:
    """Step 2: atomically repoint ``_MANIFEST`` at ``vname``.  Uses
    FileContext overwrite-rename (atomic on HDFS and local posix); if
    FileContext is unavailable the delete+rename fallback's missing-
    pointer window is covered by :func:`manifest_resolve`'s highest-
    ``_COMMITTED`` fallback."""
    jvm, jpath, fs = _fs_for(spark, path)
    base = path.rstrip("/")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{base}/{_MANIFEST}.tmp")
    mf = jvm.org.apache.hadoop.fs.Path(f"{base}/{_MANIFEST}")
    out = fs.create(tmp, True)
    out.write(bytearray((vname + "\n").encode("utf-8")))
    try:
        out.hsync()
    except Exception:
        pass  # local FS streams may not support hsync; close() persists
    out.close()
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            spark._jsc.hadoopConfiguration()
        )
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, mf, overwrite)
    except Exception:
        fs.delete(mf, False)
        if not fs.rename(tmp, mf):
            raise IOError(f"manifest_commit: could not publish {path}")


def _manifest_gc(
    spark: "SparkSession", path: str, keep_versions: int = 1
) -> None:
    """Step 3 (idempotent): delete version directories older than the
    newest ``keep_versions`` — the live pointer target is always within
    the kept set because versions are monotonically numbered."""
    jvm, jpath, fs = _fs_for(spark, path)
    base = path.rstrip("/")
    live = manifest_resolve(spark, base)
    keep = {live.rsplit("/", 1)[1]} if live else set()
    versions = _manifest_versions(fs, jvm, base)
    for _, name in versions[: max(0, len(versions) - max(1, keep_versions))]:
        if name not in keep:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{base}/{name}"), True
            )


def manifest_publish(
    spark: "SparkSession", path: str, write_fn, keep_versions: int = 1
) -> None:
    """ATOMIC store publish via a manifest pointer — the crash-safe
    replacement for :func:`publish_over`'s directory rename-swap (which
    has a window with NO live directory).  Layout: ``path/_vNNNNNNNN/``
    version directories plus a one-line ``_MANIFEST`` file naming the
    live one.  Publish = write the next version aside → mark it
    ``_COMMITTED`` → atomically repoint ``_MANIFEST`` → GC old versions.
    A crash at ANY point leaves readers serving a complete version —
    the old one until the pointer lands, the new one after; never half.
    Concurrent readers that resolved before a publish keep reading their
    version's files until GC (raise ``keep_versions`` to widen that
    window).  Read back with :func:`read_store`."""
    vname = _manifest_write_version(spark, path, write_fn)
    _manifest_commit(spark, path, vname)
    _manifest_gc(spark, path, keep_versions)


def read_store(
    spark: "SparkSession", path: str, fmt: str = "parquet"
) -> "DataFrame":
    """Read a store published by :func:`manifest_publish` (resolves the
    live version) or, for backward compatibility, a legacy
    :func:`publish_over` directory (recovering a half-finished swap
    first)."""
    live = manifest_resolve(spark, path)
    if live is not None:
        return spark.read.format(fmt).load(live)
    recover_swap(spark, path)
    return spark.read.format(fmt).load(path)


def compact_table(
    spark: "SparkSession",
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    fmt: str = "parquet",
    shuffle: bool = False,
) -> dict:
    """Rewrite a directory-backed table into ~``target_file_bytes`` files
    — the small-files maintenance pass a long-running ingest needs (every
    micro-batch/append leaves part-files; thousands of tiny files tax
    listing, footers, and task scheduling at 100 TB).

    ``shuffle=False`` (default) uses ``coalesce`` — a NARROW rewrite, no
    exchange, file sizes approximate; ``shuffle=True`` uses
    ``repartition`` for even output at the cost of shuffling the data.

    MANIFEST stores (:func:`manifest_publish` layout) compact ATOMICALLY:
    the live version is read, the compacted copy lands as the next
    version, and the pointer repoints — crash-safe at every step, and
    in-flight readers of the old version finish against its files.
    Legacy flat directories fall back to the rename-swap
    (:func:`publish_over`), which is NOT atomic for concurrent readers —
    run those in a maintenance window or migrate the store.  Returns
    {files_before, files_after, bytes}.

    Hive-partitioned layouts (``col=value`` directories) are refused: a
    flat rewrite would silently demote partition columns to data columns
    and destroy pruning — point this at each partition directory instead
    (their layouts are flat)."""
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    live = manifest_resolve(spark, path)
    data_root = live if live is not None else path
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(data_root)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def data_files(p):
        out = []
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if not name.startswith(("_", ".")):
                out.append((st.getPath().toString(), st.getLen()))
        return out

    before = data_files(jpath)
    # qualified root (scheme included) so the relative slice lines up with
    # listFiles' fully-qualified paths
    root = fs.makeQualified(jpath).toString().rstrip("/")
    partitioned = [
        f for f, _ in before
        if "=" in f[len(root):].rsplit("/", 1)[0]
    ]
    if partitioned:
        raise ValueError(
            "compact_table: hive-partitioned layout detected "
            f"(e.g. {partitioned[0]!r}); compact each partition directory "
            "individually to preserve the layout"
        )
    total = sum(b for _, b in before)
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = read_table(spark, data_root, fmt)
    df = df.repartition(n_files) if shuffle else df.coalesce(n_files)

    write_fn = lambda tmp: (  # noqa: E731
        df.write.format(fmt).mode("overwrite").save(tmp)
    )
    if live is not None:
        manifest_publish(spark, path, write_fn)
        after_root = jvm.org.apache.hadoop.fs.Path(
            manifest_resolve(spark, path)
        )
    else:
        publish_over(spark, path, write_fn)
        after_root = jpath
    after = data_files(after_root)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": sum(b for _, b in after),
    }


def schema_drift(old: "DataFrame", new: "DataFrame") -> list[dict]:
    """Column-level schema drift between two snapshots/tables: a list of
    {column, status, old_type, new_type} with status in
    added / removed / type_changed — the metadata companion of
    :func:`sparkplug_spark.operators.snapshot_diff` (which compares rows).
    Pure driver-side metadata; order follows the NEW schema, removed
    columns last."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out: list[dict] = []
    for name, ty in n.items():
        if name not in o:
            out.append({"column": name, "status": "added",
                        "old_type": None, "new_type": ty})
        elif o[name] != ty:
            out.append({"column": name, "status": "type_changed",
                        "old_type": o[name], "new_type": ty})
    for name, ty in o.items():
        if name not in n:
            out.append({"column": name, "status": "removed",
                        "old_type": ty, "new_type": None})
    return out


def layout_skipping_report(
    spark: "SparkSession",
    path: str,
    col: str,
    fmt: str = "parquet",
) -> "DataFrame":
    """Measure whether a table's FILE LAYOUT can actually skip: per
    output file, the row count and [min, max] envelope of ``col``, plus
    how many OTHER files' envelopes overlap it.  The verification step
    after :func:`write_sorted`/:func:`write_zordered` (and the
    diagnosis BEFORE them): a selective filter reads every file whose
    envelope contains the predicate value, so ``n_overlapping ≈ 0``
    means footer stats prune to ~one file per point query, while
    envelopes that all span the whole domain mean the 100 TB scan reads
    100 TB no matter how selective the filter is.

    Files are reported as 1-based ``file_rank`` in (min, max, n) order —
    deterministic content even though part-file NAMES are random UUIDs.

    Scale shape: one aggregation over the table grouped by
    ``input_file_name()`` (map-side combined: one in-flight row per
    file), then an interval self-join over the files-sized table
    (broadcast — file counts are bounded); the raw data is read once,
    projection pruned to one column.
    """
    from pyspark.sql import functions as F

    df = spark.read.format(fmt).load(path)
    per_file = (
        df.groupBy(F.input_file_name().alias("__f"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v"),
        )
        .persist()
    )
    other = per_file.select(
        F.col("__f").alias("__g"),
        F.col("min_v").alias("min_o"),
        F.col("max_v").alias("max_o"),
    )
    overlaps = (
        per_file.join(
            F.broadcast(other),
            (F.col("__f") != F.col("__g"))
            & (F.col("min_o") <= F.col("max_v"))
            & (F.col("max_o") >= F.col("min_v")),
            "left",
        )
        .groupBy("__f", "n_rows", "min_v", "max_v")
        .agg(
            F.count(F.col("__g")).cast("long").alias("n_overlapping"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("min_v", "max_v", "n_rows", "__f")
    out = (
        overlaps.withColumn("file_rank", F.row_number().over(w).cast("long"))
        .select("file_rank", "n_rows", "min_v", "max_v", "n_overlapping")
    )
    # files-sized result: materialize, then drop the per-file cache
    from ..caching import materialize_release

    return materialize_release(out, per_file)
