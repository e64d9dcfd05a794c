"""Model-based document scoring plumbing: the quality-classifier stage of
a training-data pipeline (fastText/DistilBERT-style filters), with the
Spark side — Arrow batch iteration, per-executor model loading, schema,
partition sizing — real and tested, and the model itself pluggable.

No ML runtime ships in this container, so the default scorer is a
deterministic md5-seeded stand-in (same pattern as the multimodal decode
stubs, ``multimodal.py``): pipelines are built and tested against the
exact production shape, then ``scorer=`` swaps in the real model without
touching the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..partitioning import spread

__all__ = ["score_with_model", "fake_quality_scorer"]


def fake_quality_scorer(texts: pd.Series) -> pd.Series:
    """Deterministic stand-in scorer: md5-seeded uniform [0, 1).  Engine-
    and partitioning-independent, so tests (and oracles, if ever needed)
    reproduce it exactly."""
    return pd.Series(
        [
            int(hashlib.md5((t or "").encode()).hexdigest()[:8], 16) / 0x100000000
            for t in texts
        ],
        dtype="float64",
    )


def score_with_model(
    df: DataFrame,
    text_col: str = "text",
    score_col: str = "model_score",
    scorer: Callable[[pd.Series], pd.Series] | None = None,
    model_loader: Callable[[], Callable[[pd.Series], pd.Series]] | None = None,
    batch_rows: int = 1024,
) -> DataFrame:
    """Append a model score per document via ``mapInPandas``.

    Exactly one of:

    - ``scorer``: a picklable ``pd.Series -> pd.Series`` batch function
      (default: :func:`fake_quality_scorer`);
    - ``model_loader``: a zero-arg callable run ONCE PER PYTHON WORKER that
      returns the batch function — the production path for heavyweight
      models (the loader pattern keeps the model out of the closure so
      only the loading recipe is pickled, and each executor pays
      deserialization once, not per batch).

    The iterator contract re-batches to ``batch_rows`` so a model with a
    fixed-size input buffer (tokenizer padding, GPU batch) sees bounded
    batches regardless of Arrow's ``maxRecordsPerBatch``."""
    if scorer is not None and model_loader is not None:
        raise ValueError("pass either scorer or model_loader, not both")
    loader = model_loader
    if loader is None:
        fn = scorer or fake_quality_scorer
        loader = lambda: fn  # noqa: E731

    out_schema = T.StructType(
        df.schema.fields + [T.StructField(score_col, T.DoubleType())]
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = loader()  # once per worker-task, NOT per batch
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                scores = model(chunk[text_col])
                yield chunk.assign(**{score_col: scores.to_numpy()})

    return spread(df).mapInPandas(_score, schema=out_schema)
