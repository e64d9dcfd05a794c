"""Semi-structured (JSON) column operators.

Event/props payloads in real pipelines arrive as JSON strings inside a
column (the testdata ``events.props`` column is exactly this shape).
Both operators stay JVM-side narrow projections — ``get_json_object`` /
``from_json`` are Catalyst expressions, so extraction is zero-shuffle
and whole-stage-codegen'd; no Python touches the hot path.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["extract_json_fields", "flatten_json", "quarantine_json"]


def extract_json_fields(
    df: DataFrame,
    col: str,
    fields: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Extract typed scalar fields from a JSON-string column.

    ``fields`` maps output column name → ``(json_path, spark_type)``,
    e.g. ``{"k": ("$.k", "bigint"), "tag": ("$.meta.tag", "string")}``.
    Missing paths, malformed JSON, and uncastable values all yield null
    (pair with :func:`check_expectations` to gate the null rate).

    Path-per-field extraction (``get_json_object``) re-parses the JSON
    once per field; for many fields from the same column prefer
    :func:`flatten_json` with an explicit schema (single parse)."""
    if not fields:
        raise ValueError("fields must be non-empty")
    out = df
    for name, (path, dtype) in fields.items():
        # try_cast, not cast: under ANSI mode a malformed value must yield
        # null per this function's contract, not kill the job
        out = out.withColumn(
            name, F.get_json_object(F.col(col), path).try_cast(dtype)
        )
    return out


def flatten_json(
    df: DataFrame,
    col: str,
    schema: StructType | str,
    prefix: str = "",
    drop: bool = True,
) -> DataFrame:
    """Parse a JSON-string column against an explicit schema and promote
    its top-level fields to columns (``{prefix}{field}``).

    One ``from_json`` parse per row regardless of field count.  The
    schema is explicit by design: schema inference over a 100 TB corpus
    is a full extra scan — sample offline, pin the schema in code, let
    rows that do not match yield nulls."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    parsed = df.withColumn("__parsed", F.from_json(F.col(col), schema))
    out = parsed.select(
        "*",
        *[
            F.col(f"__parsed.{f.name}").alias(f"{prefix}{f.name}")
            for f in schema.fields
        ],
    ).drop("__parsed")
    return out.drop(col) if drop else out


def quarantine_json(
    df: DataFrame,
    col: str,
    fields: Mapping[str, str],
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Robust JSON ingestion with a corrupt-record quarantine lane: parse
    ``col`` against a typed schema and split good rows from bad ones
    WITHOUT dropping either — the operational contract of reading a
    crawl/firehose where some payloads are always mangled.

    ``fields`` maps output column name → Spark DDL type (e.g.
    ``{"k": "bigint"}``).  Appends each field (null when absent or
    unparseable), ``is_corrupt`` (true when the payload failed to
    parse), and ``corrupt_col`` holding the ORIGINAL string of failed
    payloads for replay/debugging.  NULL inputs are not corrupt — they
    parse to an all-null row with ``is_corrupt=false`` (absence, not
    breakage; same stance as `referential_audit`'s NULL keys).

    Built on ``from_json`` in PERMISSIVE mode with
    ``columnNameOfCorruptRecord`` — a Catalyst expression: the whole
    parse+split is a zero-shuffle, codegen'd narrow projection, so the
    quarantine lane costs nothing extra at 100 TB.  Note Spark also
    quarantines VALID JSON whose values can't meet the schema types
    (e.g. ``{"k": "abc"}`` for ``k bigint``) — stricter than a bare
    json-validity check."""
    if corrupt_col in fields:
        raise ValueError("corrupt_col collides with a requested field")
    clash = [n for n in list(fields) + [corrupt_col, "is_corrupt"] if n in df.columns]
    if clash:
        raise ValueError(f"output columns already exist: {clash}")
    schema = ", ".join(
        [f"`{n}` {t}" for n, t in fields.items()]
        + [f"`{corrupt_col}` string"]
    )
    parsed = F.from_json(
        F.col(col),
        schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
    )
    out = df.withColumn("__parsed", parsed)
    for n in fields:
        out = out.withColumn(n, F.col("__parsed")[n])
    return (
        out.withColumn(
            "is_corrupt", F.col("__parsed")[corrupt_col].isNotNull()
        )
        .withColumn(corrupt_col, F.col("__parsed")[corrupt_col])
        .drop("__parsed")
    )
