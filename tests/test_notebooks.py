"""Notebook ingestion (E287): typed nbformat parse, quarantine, and the
documented string-form-source boundary."""

import json

import pytest

from sparkplug_spark.operators import parse_notebooks


def _nb(cells):
    return json.dumps(
        {
            "cells": cells,
            "metadata": {
                "kernelspec": {"language": "python", "name": "py3"}
            },
            "nbformat": 4,
            "nbformat_minor": 5,
        }
    )


class TestParseNotebooks:
    def test_cells_round_trip(self, spark):
        nb = _nb(
            [
                {
                    "cell_type": "code",
                    "source": ["import os\n", "print(os.sep)"],
                    "execution_count": 3,
                    "outputs": [
                        {"output_type": "stream"},
                        {"output_type": "execute_result"},
                    ],
                    "metadata": {},
                },
                {
                    "cell_type": "markdown",
                    "source": ["# Title"],
                    "metadata": {},
                },
            ]
        )
        df = spark.createDataFrame(
            [(1, nb)], "doc_id long, payload string"
        )
        rows = sorted(
            parse_notebooks(df).collect(), key=lambda r: r["cell_idx"]
        )
        assert len(rows) == 2
        c0, c1 = rows
        assert c0["cell_type"] == "code"
        assert c0["source"] == "import os\nprint(os.sep)"
        assert c0["n_source_lines"] == 2
        assert c0["execution_count"] == 3
        assert c0["n_outputs"] == 2
        assert c0["language"] == "python" and c0["nbformat"] == 4
        assert c1["cell_type"] == "markdown"
        assert c1["execution_count"] is None
        assert c1["n_outputs"] == 0

    def test_corrupt_and_cell_less_json_quarantine(self, spark):
        df = spark.createDataFrame(
            [
                (1, "{not json"),
                (2, json.dumps({"metadata": {}})),  # no cells array
                (3, None),
                (4, _nb([{"cell_type": "code", "source": ["x"]}])),
            ],
            "doc_id long, payload string",
        )
        rows = parse_notebooks(df).collect()
        assert {r["doc_id"] for r in rows} == {4}

    def test_string_form_source_boundary(self, spark):
        # nbformat tolerates source as one string; the typed schema
        # binds the canonical list form — string form surfaces as NULL
        # source with the cell shell intact (documented boundary)
        nb = _nb([{"cell_type": "code", "source": "x = 1\n"}])
        df = spark.createDataFrame(
            [(1, nb)], "doc_id long, payload string"
        )
        (r,) = parse_notebooks(df).collect()
        assert r["cell_type"] == "code"
        assert r["source"] is None
        assert r["n_source_lines"] is None
