"""Jupyter-notebook ingestion: .ipynb JSON → relational cell rows — the
notebook slice of a code corpus (The Stack converts notebooks to
script-like documents; the cell table is what that conversion, dedup,
and quality screening consume).

No reference counterpart (the reference is a 387-LoC rule engine,
``SparkPlug.scala:1-159``); the format is the public nbformat 4 schema.

Scale notes: one ``from_json`` + ``posexplode`` — fully JVM-side, no
Python in the parse path; the only data movement is the row fan-out
from documents to cells (narrow, no shuffle).  Malformed JSON yields no
rows (document-level quarantine, the ``pdf_images`` convention);
``quarantine_json`` in ``semistructured.py`` is the tier for auditing
the corrupt slice itself.

Boundary (documented): nbformat allows a cell's ``source`` as EITHER a
list of strings (what jupyter writes) or one plain string; the typed
schema binds the canonical list form, so string-form sources surface as
NULL ``source`` with the cell's type/metadata intact — count them
before trusting text-level stats on a wild notebook corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = ["parse_notebooks"]

#: nbformat-4 subset the parser binds (PERMISSIVE: unknown keys ignored,
#: mistyped fields null out per-field, not per-document)
_NB_SCHEMA = (
    "struct<"
    "cells: array<struct<"
    "cell_type: string, source: array<string>,"
    "execution_count: int,"
    "outputs: array<struct<output_type: string>>"
    ">>,"
    "metadata: struct<kernelspec: struct<language: string, name: string>>,"
    "nbformat: int"
    ">"
)


def parse_notebooks(
    df: DataFrame,
    json_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-cell rows of every parseable notebook: ``(id_col, cell_idx,
    cell_type, source, n_source_lines, execution_count, n_outputs,
    language, nbformat)``.

    ``source`` is the cell text with the list-form fragments
    concatenated verbatim (nbformat fragments carry their own trailing
    newlines); ``n_source_lines`` is the fragment count.  Documents
    whose payload is not valid notebook JSON (or has no cells array)
    contribute no rows."""
    parsed = spread(df).select(
        F.col(id_col),
        F.from_json(F.col(json_col).cast("string"), _NB_SCHEMA).alias(
            "__nb"
        ),
    )
    good = parsed.where(F.col("__nb.cells").isNotNull())
    cells = good.select(
        F.col(id_col),
        F.col("__nb.metadata.kernelspec.language").alias("language"),
        F.col("__nb.nbformat").alias("nbformat"),
        F.posexplode(F.col("__nb.cells")).alias("cell_idx", "__c"),
    )
    return cells.select(
        F.col(id_col),
        F.col("cell_idx").cast("long").alias("cell_idx"),
        F.col("__c.cell_type").alias("cell_type"),
        F.array_join(F.col("__c.source"), "").alias("source"),
        F.when(
            F.col("__c.source").isNotNull(), F.size(F.col("__c.source"))
        )
        .cast("long")
        .alias("n_source_lines"),
        F.col("__c.execution_count").cast("long").alias("execution_count"),
        F.coalesce(F.size(F.col("__c.outputs")), F.lit(0))
        .cast("long")
        .alias("n_outputs"),
        "language",
        F.col("nbformat").cast("long").alias("nbformat"),
    )
