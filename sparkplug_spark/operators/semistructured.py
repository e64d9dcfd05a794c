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

__all__ = ["extract_json_fields", "flatten_json"]


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
