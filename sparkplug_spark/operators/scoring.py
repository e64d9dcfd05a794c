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
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..partitioning import spread

__all__ = [
    "calibration_report",
    "isotonic_fit_exact",
    "label_noise_report",
    "source_influence",
    "score_with_model",
    "fake_quality_scorer",
    "compression_signals",
    "naive_bayes_classifier",
    "export_nb_model",
    "nb_model_loader",
    "conformal_thresholds",
    "calibrate_isotonic",
]


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


def compression_signals(
    df: DataFrame,
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Append zlib-compressibility columns — the classic cheap quality
    signal for pretraining corpora (boilerplate, repeated spans and
    machine-generated filler compress far better than natural prose;
    near-incompressible text flags binary junk or ciphertext):

    - ``n_bytes`` BIGINT — UTF-8 byte length
    - ``n_bytes_zlib`` BIGINT — ``zlib.compress(..., level)`` byte length
    - ``compress_ppm`` BIGINT — ``n_bytes_zlib * 1_000_000 div
      max(n_bytes, 1)``: compressed/raw ratio in exact integer ppm
      (lower = more redundant)

    The ratio is deterministic for a fixed zlib version/level (tests pin
    it against direct ``zlib`` calls), but NOT portable across engines —
    DuckDB exposes no deflate — so queries built on it are rows-only.

    Plan: one Arrow-vectorized pandas UDF (CPU-bound; ``spread`` first so
    single-file test inputs use every core); everything downstream of the
    two byte counts is JVM-side integer arithmetic."""
    from pyspark.sql import functions as F

    @F.pandas_udf("n_bytes long, n_bytes_zlib long")
    def _z(texts: pd.Series) -> pd.DataFrame:
        import zlib

        raw = [(t or "").encode("utf-8") for t in texts]
        return pd.DataFrame(
            {
                "n_bytes": [len(b) for b in raw],
                "n_bytes_zlib": [len(zlib.compress(b, level)) for b in raw],
            }
        )

    with_sig = spread(df).withColumn("__sig", _z(F.col(text_col)))
    return with_sig.select(
        *df.columns,
        F.col("__sig.n_bytes").alias("n_bytes"),
        F.col("__sig.n_bytes_zlib").alias("n_bytes_zlib"),
        F.expr("__sig.n_bytes_zlib * 1000000 div greatest(__sig.n_bytes, 1)")
        .cast("long")
        .alias("compress_ppm"),
    )


def naive_bayes_classifier(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    positive_value: str = "en",
    release: bool = True,
) -> DataFrame:
    """REAL trained text classifier, end-to-end distributed and
    engine-exact: multinomial naive Bayes with Laplace smoothing over the
    corpus's own tokens (the classical fastText-precursor quality/language
    filter of training-data pipelines), trained AND applied in one job —
    no driver-side model object, no ML runtime, no randomness.

    Label: ``label_col == positive_value`` (binary).  Per-token log-odds

        w(t) = ln(c_pos(t)+1) - ln(T_pos+V) - ln(c_neg(t)+1) + ln(T_neg+V)

    (c = class token counts, T = class totals, V = vocabulary size) are
    quantized to INTEGER MICRO-NATS (floor(x*1e6 + 0.5)) the moment they
    are computed, so document scores are EXACT integer sums — immune to
    float summation order across partitions/engines (the ``keyword_search``
    integer-tf·idf trick applied to NB).  Score = prior + sum of token
    weights with multiplicity; prediction is its sign.

    Returns (id, label boolean, score_micros bigint, predicted boolean).

    Scale shape (100 TB): training is ONE groupBy on the token (counts
    partially aggregated map-side; the class totals ride a 1-row broadcast
    join); the weight table is vocabulary-sized — orders of magnitude
    smaller than the corpus, AQE broadcasts it under the apply join when
    it fits.  Applying is explode + join + per-doc integer sum.  The
    tokenized (id, token) stream is computed once, persisted, and shared
    by the train and apply sides (released on return)."""
    from ..caching import materialize_release
    from ..functions.text import tokens_pd

    pos = F.col("__lab")
    toks = (
        spread(df)
        .select(
            F.col(id_col).alias("__id"),
            (F.col(label_col) == F.lit(positive_value)).alias("__lab"),
            F.explode(tokens_pd(F.col(text_col))).alias("__t"),
        )
        .persist()
    )
    counts = toks.groupBy("__t").agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("__cp"),
        F.sum(F.when(pos, 0).otherwise(1)).cast("long").alias("__cn"),
    )
    totals = counts.agg(
        F.sum("__cp").alias("__tp"),
        F.sum("__cn").alias("__tn"),
        F.count(F.lit(1)).alias("__v"),
    )
    micros = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "__t",
        micros(
            F.log(F.col("__cp") + 1)
            - F.log(F.col("__tp") + F.col("__v"))
            - F.log(F.col("__cn") + 1)
            + F.log(F.col("__tn") + F.col("__v"))
        ).alias("__w"),
    )
    # class prior from DOCUMENT counts (add-one smoothed so a single-class
    # corpus stays finite)
    docs = toks.select("__id", "__lab").distinct()
    prior = docs.agg(
        micros(
            F.log(F.sum(F.when(pos, 1).otherwise(0)) + 1)
            - F.log(F.sum(F.when(pos, 0).otherwise(1)) + 1)
        ).alias("__prior")
    )
    scores = (
        toks.join(weights, "__t")
        .groupBy("__id", "__lab")
        .agg(F.sum("__w").alias("__s"))
        .crossJoin(F.broadcast(prior))
        .select(
            F.col("__id").alias(id_col),
            F.col("__lab").alias("label"),
            (F.col("__s") + F.col("__prior")).alias("score_micros"),
            ((F.col("__s") + F.col("__prior")) > 0).alias("predicted"),
        )
    )
    return materialize_release(scores, toks, release=release)


def export_nb_model(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    label_col: str = "lang",
    positive_value: str = "en",
) -> None:
    """Train the :func:`naive_bayes_classifier` model and persist it as a
    REAL on-disk artifact: ``<path>/weights`` — the (token, w_micros)
    integer micro-nat log-odds table — and ``<path>/prior`` — the 1-row
    smoothed document-prior.  The training math is identical expression
    for expression to the relational tier, so a model exported here and
    re-applied through :func:`nb_model_loader` reproduces
    ``score_micros`` bit-for-bit (pytest pins it).

    This is the missing half of the ``score_with_model`` production
    story: train distributed, snapshot the model as columnar data, and
    serve it through the once-per-worker loader with no ML runtime and
    no Spark dependency on the executor side."""
    from ..functions.text import tokens_pd

    pos = F.col("__lab")
    toks = spread(df).select(
        (F.col(label_col) == F.lit(positive_value)).alias("__lab"),
        F.explode(tokens_pd(F.col(text_col))).alias("__t"),
    )
    counts = toks.groupBy("__t").agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("__cp"),
        F.sum(F.when(pos, 0).otherwise(1)).cast("long").alias("__cn"),
    )
    totals = counts.agg(
        F.sum("__cp").alias("__tp"),
        F.sum("__cn").alias("__tn"),
        F.count(F.lit(1)).alias("__v"),
    )
    micros = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")  # noqa: E731
    weights = counts.crossJoin(F.broadcast(totals)).select(
        F.col("__t").alias("token"),
        micros(
            F.log(F.col("__cp") + 1)
            - F.log(F.col("__tp") + F.col("__v"))
            - F.log(F.col("__cn") + 1)
            + F.log(F.col("__tn") + F.col("__v"))
        ).alias("w_micros"),
    )
    prior = (
        spread(df)
        .select((F.col(label_col) == F.lit(positive_value)).alias("__lab"))
        .agg(
            micros(
                F.log(F.sum(F.when(pos, 1).otherwise(0)) + 1)
                - F.log(F.sum(F.when(pos, 0).otherwise(1)) + 1)
            ).alias("prior_micros")
        )
    )
    weights.write.mode("overwrite").parquet(path.rstrip("/") + "/weights")
    prior.write.mode("overwrite").parquet(path.rstrip("/") + "/prior")


def nb_model_loader(
    path: str,
) -> Callable[[], Callable[[pd.Series], pd.Series]]:
    """Loader factory for :func:`score_with_model`: returns the zero-arg
    callable that, ONCE PER PYTHON WORKER, reads the
    :func:`export_nb_model` artifact with pyarrow (no Spark on the
    executor), builds the token→micro-nat dict, and scores batches as
    exact integer sums over the shared normalization
    (:func:`~..functions.text.norm_tokens_py`) divided by 1e6 — integer
    micro-nat totals sit far below 2^53, so the double is exact and
    equals ``naive_bayes_classifier``'s ``score_micros / 1e6``
    bit-for-bit.  Out-of-vocabulary tokens weigh 0, matching the
    relational tier's inner join."""
    wdir = path.rstrip("/") + "/weights"
    pdir = path.rstrip("/") + "/prior"

    def _load() -> Callable[[pd.Series], pd.Series]:
        import pyarrow.dataset as ds

        from ..functions.text import norm_tokens_py

        wt = ds.dataset(wdir).to_table().to_pydict()
        weights = dict(zip(wt["token"], wt["w_micros"]))
        prior = ds.dataset(pdir).to_table().to_pydict()["prior_micros"][0]

        def _score(texts: pd.Series) -> pd.Series:
            return pd.Series(
                [
                    (
                        prior
                        + sum(
                            weights.get(tok, 0)
                            for tok in norm_tokens_py(t)
                        )
                    )
                    / 1e6
                    for t in texts
                ],
                dtype="float64",
            )

        return _score

    return _load


def calibration_report(
    scores: DataFrame,
    score_col: str = "score_micros",
    label_col: str = "label",
    id_col: str = "id",
    buckets: int = 10,
) -> DataFrame:
    """Reliability / calibration table for a classifier's scores: rank
    every row by (score, id), cut EXACT equal-count buckets, and report
    per bucket how often the label is actually positive — the monotone
    pos-rate-vs-score check that gates a learned quality filter before
    its threshold ships (and the input to choosing that threshold).

    Bucket is ``((rank−1)·buckets) DIV n + 1`` over exact global ranks —
    pure integer arithmetic on a deterministic total order, NOT
    ``ntile()`` (whose remainder-distribution rule differs between
    engines) and not a single-partition window (ranks come from
    :func:`partitioning.global_row_numbers`' range-distributed prefix
    sums).  Output per bucket: (bucket, n, n_pos, pos_ppm,
    min_score, max_score, sum_score) — counts/extremes/sum are exact
    BIGINTs, ``pos_ppm`` an integer floor division.

    Scale shape: one range-distributed rank pass + one ``buckets``-row
    aggregate; no global window, no collect."""
    from ..partitioning import global_row_numbers

    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    ranked = global_row_numbers(
        scores.select(
            F.col(id_col).alias("__id"),
            F.col(score_col).cast("long").alias("__s"),
            F.col(label_col).cast("boolean").alias("__lab"),
        ),
        ["__s", "__id"],
        rn_col="__rn",
    )
    n_df = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n_df))
        .select(
            F.expr(f"((__rn - 1) * {int(buckets)}) div __n + 1")
            .cast("long")
            .alias("bucket"),
            "__s",
            "__lab",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("__lab"), 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.expr(
                "sum(case when __lab then 1 else 0 end) * 1000000"
                " div count(1)"
            )
            .cast("long")
            .alias("pos_ppm"),
            F.min("__s").alias("min_score"),
            F.max("__s").alias("max_score"),
            F.sum("__s").cast("long").alias("sum_score"),
        )
    )


def conformal_thresholds(
    df: DataFrame,
    score_col: str,
    alpha_ppm: int = 100000,
    group_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Split-conformal calibration thresholds: the exact
    ``⌈(n+1)·(1−α)⌉``-th smallest nonconformity score per group — the
    quantile q̂ such that predictions with score ≤ q̂ form a
    (1−α)-coverage prediction set on exchangeable data (Vovk et al.;
    the distribution-free guarantee a learned quality filter ships
    with, next to E148's calibration table and E165's ranking gate).

    Exactness discipline: the rank is pure integer arithmetic —
    ``k = (n+1)·(1000000−alpha_ppm) ceil-div 1000000`` clamped to
    ``[1, n]`` — and the threshold is an integer PICK at that rank
    (never an interpolation; lower-rank convention like E45), with
    ``id_col`` breaking score ties deterministically.  Emits k and n so
    the consumer can audit the finite-sample coverage level actually
    achieved.

    Returns one row per group: (group…, n, k, threshold) where
    ``threshold`` keeps the score column's type.

    Scale shape: grouped tier = one rank window per group key (groups
    numerous) + one fold; GLOBAL tier (``group_col=None``) rides
    ``partitioning.global_row_numbers`` — range-distributed prefix
    sums, never a single-partition window.  NULL scores dropped
    (engines disagree on NULL sort order).
    """
    from pyspark.sql import Window

    if not (0 < alpha_ppm < 1000000):
        raise ValueError(f"alpha_ppm must be in (0, 1e6), got {alpha_ppm}")
    keys = [group_col] if group_col else []
    base = spread(df).filter(F.col(score_col).isNotNull())
    if group_col is None:
        # global tier: range-distributed prefix sums, never a
        # single-partition window (the rank_normalize discipline)
        from ..partitioning import global_row_numbers

        order_cols = [score_col] + ([id_col] if id_col else [])
        n_df = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        ranked = global_row_numbers(base, order_cols, rn_col="__rn").join(
            F.broadcast(n_df)
        )
    else:
        order = [F.col(score_col)] + ([F.col(id_col)] if id_col else [])
        w = Window.partitionBy(*keys).orderBy(*order)
        ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
        )
    keep = 1000000 - alpha_ppm
    k = F.expr(
        f"greatest(least(((__n + 1) * {keep} + 999999) div 1000000, __n), 1)"
    )
    return (
        ranked.withColumn("__k", k)
        .groupBy(*keys)
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.max("__k").cast("long").alias("k"),
            F.max(
                F.when(F.col("__rn") == F.col("__k"), F.col(score_col))
            ).alias("threshold"),
        )
    )


def calibrate_isotonic(
    df: DataFrame,
    score_col: str,
    label_col: str,
    output_col: str = "calibrated",
) -> DataFrame:
    """Isotonic (monotone) probability calibration of a classifier
    score against observed binary labels — the PAVA fit that turns
    E128's raw NB scores (or any ranker output) into probabilities a
    threshold can be set on, next to E148 (which DIAGNOSES calibration;
    this one FIXES it) and E168 (which wraps it in a coverage
    guarantee).

    Spark-first: rides ``pyspark.ml.regression.IsotonicRegression``
    (distributed parallel PAVA — per-partition pools merged on
    ``boundaries``), then applies the fitted step function.  The fit is
    deterministic for fixed data but its pooled boundaries are not
    SQL-expressible (sequential pooling), so this is a rows-only tier;
    the pytest gate twins it against a pure-Python PAVA on the same
    data and pins monotonicity + bounded range.

    Returns the input rows plus ``output_col`` (calibrated probability)
    and a broadcastable model summary is avoided on purpose: the fitted
    boundaries live in the returned plan only.

    Scale shape: one fit pass (Spark ML's isotonic aggregates
    per-partition pools; boundaries are bounded by distinct scores) +
    one model.transform projection.  NULL scores/labels dropped.
    """
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    base = spread(df).filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    # feature in a TEMP column: overwriting score_col with a double cast
    # would change the caller's column type in the returned rows
    fit_in = VectorAssembler(
        inputCols=["__score_d"], outputCol="__feat"
    ).transform(
        base.withColumn("__score_d", F.col(score_col).cast("double"))
        .withColumn("__lbl", F.col(label_col).cast("double"))
    )
    model = IsotonicRegression(
        featuresCol="__feat", labelCol="__lbl", predictionCol=output_col
    ).fit(fit_in)
    return model.transform(fit_in).drop("__feat", "__lbl", "__score_d")


def isotonic_fit_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    max_blocks: int = 8192,
) -> DataFrame:
    """Exact isotonic fit per DISTINCT score, via the closed-form PAVA
    solution (Robertson/Barlow): with score blocks 1..D ordered
    ascending, fitted(i) = max_{a<=i} min_{b>=i} mean(labels in blocks
    a..b).  Returns one row per block: (score, n, n_pos,
    calibrated_ppm) with calibrated_ppm = floor(fit * 1e6).

    The oracle-checkable twin of :func:`calibrate_isotonic` (pyspark.ml
    parallel PAVA, whose pooled boundaries aren't SQL-expressible).
    Every intermediate here is either exact integer (block counts,
    label sums, both range-prefix accumulated) or IEEE mul/div/min/max
    of those integers — deterministic bit-for-bit across engines, so
    the output value-hashes against a DuckDB oracle (no libm; see the
    JVM-vs-libm ln() 1–2-ulp hazard).

    Scale: the pair join materializes O(D^2) SMALL rows (three longs) —
    the price of the closed form.  D is the number of DISTINCT scores;
    calibration inputs at 100 TB should be binned scores (quantized
    probabilities, length buckets), keeping D in the thousands and the
    pair set in the millions, distributed over the b-range.  Raises
    beyond ``max_blocks`` (D^2 > ~64M pairs) — bin first, or use the
    ml tier and accept rows-only checking.  NULL scores/labels drop
    (same as the ml tier)."""
    from pyspark.sql import Window

    base = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    blocks = (
        base.groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
        )
    )
    d = blocks.count()
    if d > max_blocks:
        raise ValueError(
            f"{d} distinct scores exceeds max_blocks={max_blocks}: the "
            "closed-form fit is O(D^2) — bin scores first (e.g. floor to "
            "a fixed grid) or use calibrate_isotonic (ml tier)"
        )
    # D is bounded by max_blocks, so one global window over D rows is a
    # single small task; the O(D^2) pair stage below is the heavy part
    # and is hash-distributed on a
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    pre = blocks.select(
        F.row_number().over(Window.orderBy("score")).alias("rk"),
        "score",
        "n",
        "n_pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("n_pos").over(w).alias("cum_pos"),
    )
    a = pre.select(
        F.col("rk").alias("a"),
        F.col("n").alias("na"),
        F.col("n_pos").alias("pa"),
        F.col("cum_n").alias("cna"),
        F.col("cum_pos").alias("cpa"),
    )
    b = pre.select(
        F.col("rk").alias("b"),
        F.col("cum_n").alias("cnb"),
        F.col("cum_pos").alias("cpb"),
    )
    pairs = a.join(b, F.col("b") >= F.col("a")).select(
        "a",
        "b",
        (
            (F.col("cpb") - F.col("cpa") + F.col("pa")).cast("double")
            / (F.col("cnb") - F.col("cna") + F.col("na")).cast("double")
        ).alias("avg"),
    )
    # g(a, i) = min over b >= i of avg(a, b): suffix min within each a
    g = pairs.withColumn(
        "g",
        F.min("avg").over(
            Window.partitionBy("a")
            .orderBy(F.col("b").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).select(F.col("b").alias("i"), "g")
    # fitted(i) = max over a <= i of g(a, i); every (a, i) row has a <= i
    fit = g.groupBy("i").agg(F.max("g").alias("fit"))
    return (
        pre.join(fit, pre.rk == fit.i)
        .select(
            "score",
            "n",
            "n_pos",
            F.floor(F.col("fit") * F.lit(1000000.0)).cast("long").alias(
                "calibrated_ppm"
            ),
        )
    )


def label_noise_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    positive_value: str = "en",
    threshold_micros: int = 2_000_000,
) -> DataFrame:
    """Confident-learning-style label-noise screen: train the
    :func:`naive_bayes_classifier` on the labeled corpus, then flag
    examples the model CONFIDENTLY disagrees with — the standard first
    pass before paying humans to re-annotate (Northcutt et al.'s
    cleanlab intuition on the engine's exact-integer NB).

    ``noise_micros`` is the signed disagreement in micro-nats
    (−score for positive-labeled rows, +score for negative-labeled:
    positive = "the model argues against your label", magnitude = how
    hard); ``flag_noise`` fires above ``threshold_micros`` (2.0 nats ≈
    7:1 odds by default).  Exact integers end to end, so the report
    value-hash-matches the oracle's retrained twin.

    Returns (id, label, score_micros, noise_micros, flag_noise).  Same
    scale shape as the classifier (one token groupBy + vocabulary-sized
    apply join); the report adds a projection."""
    nb = naive_bayes_classifier(
        df, text_col, id_col, label_col, positive_value
    )
    noise = F.when(
        F.col("label"), -F.col("score_micros")
    ).otherwise(F.col("score_micros"))
    return nb.select(
        id_col,
        "label",
        "score_micros",
        noise.alias("noise_micros"),
        (noise > F.lit(int(threshold_micros))).alias("flag_noise"),
    )


def source_influence(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    positive_value: str = "en",
    source_col: str = "source",
    max_variants: int = 1000,
) -> DataFrame:
    """Data valuation by ADDITIVE leave-one-out: for every training
    source, what happens to held-out NB accuracy if that source is
    removed?  The per-source answer behind "which corpus slice is
    earning its tokens" (Shapley-lite, the group-LOO baseline).

    The trick that makes LOO free: multinomial-NB sufficient statistics
    are ADDITIVE, so the model trained without source s is derived
    arithmetically from ONE counting pass — per-token LOO counts are
    (global − source), class totals and the doc-prior likewise, and the
    LOO vocabulary drops exactly the tokens exclusive to s.  No
    retraining jobs: 1 + |sources| models from one groupBy.  Weights
    are E128's integer micro-nats (ln quantized the moment computed),
    scores exact integer sums, so the whole report value-hash-matches a
    SQL oracle that re-derives the same algebra.

    Output per variant ('__full__' + one row per source): (source,
    n_removed_docs, n_eval, n_correct, accuracy_ppm, delta_ppm) with
    delta vs the full model (positive = removing the source HELPS).

    Scale: the weight table is vocabulary × (|sources|+1) rows
    (``max_variants`` guards the source count — valuation is for
    dozens-to-hundreds of slices, not per-document attribution), built
    from a broadcast of per-source token counts; eval scoring is one
    token join fanned out by variant."""
    from ..caching import materialize_release
    from ..functions.text import tokens_pd

    pos = F.col("__lab")
    micros = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
    tok_train = (
        spread(train)
        .select(
            F.col(source_col).alias("__src"),
            F.col(id_col).alias("__id"),
            (F.col(label_col) == F.lit(positive_value)).alias("__lab"),
            F.explode(tokens_pd(F.col(text_col))).alias("__t"),
        )
        .persist()
    )
    # one bounded collect builds the variant spine (sources + the full
    # model): a DataFrame spine would recompute the distinct over the
    # token stream once per consumer (it feeds three cross joins)
    src_rows = (
        tok_train.select("__src").distinct().limit(max_variants + 1).collect()
    )
    if len(src_rows) > max_variants:
        raise ValueError(
            f"over {max_variants} sources (max_variants): group slices "
            "coarser — LOO valuation is for dozens of sources, not "
            "per-document attribution"
        )
    # per_src feeds BOTH the global roll-up and the LOO join — persisted
    # so the corpus-sized (token, source) aggregation runs once, not once
    # per consumer (the fan-out-intermediates invariant)
    per_src = tok_train.groupBy("__t", "__src").agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("__cps"),
        F.sum(F.when(pos, 0).otherwise(1)).cast("long").alias("__cns"),
    ).persist()
    glob = per_src.groupBy("__t").agg(
        F.sum("__cps").alias("__cp"), F.sum("__cns").alias("__cn")
    )
    variants = tok_train.sparkSession.createDataFrame(
        [(r["__src"],) for r in src_rows] + [("__full__",)],
        "variant string",
    )
    # LOO counts for EVERY (variant, token): global minus the removed
    # source's contribution (zero when the token never appears there)
    loo = (
        glob.crossJoin(F.broadcast(variants))
        .join(
            per_src.select(
                "__t",
                F.col("__src").alias("variant"),
                "__cps",
                "__cns",
            ),
            ["__t", "variant"],
            "left",
        )
        .select(
            "__t",
            "variant",
            (F.col("__cp") - F.coalesce("__cps", F.lit(0))).alias("__lcp"),
            (F.col("__cn") - F.coalesce("__cns", F.lit(0))).alias("__lcn"),
        )
        # the LOO vocabulary: tokens exclusive to the removed source drop
        .filter(F.col("__lcp") + F.col("__lcn") > 0)
    )
    vtot = loo.groupBy("variant").agg(
        F.sum("__lcp").alias("__tp"),
        F.sum("__lcn").alias("__tn"),
        F.count(F.lit(1)).alias("__v"),
    )
    weights = loo.join(F.broadcast(vtot), "variant").select(
        "variant",
        "__t",
        micros(
            F.log(F.col("__lcp") + 1)
            - F.log(F.col("__tp") + F.col("__v"))
            - F.log(F.col("__lcn") + 1)
            + F.log(F.col("__tn") + F.col("__v"))
        ).alias("__w"),
    )
    # doc-count priors, same LOO algebra (add-one smoothed)
    docs = tok_train.select("__src", "__id", "__lab").distinct()
    dsrc = docs.groupBy("__src").agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("__dps"),
        F.sum(F.when(pos, 0).otherwise(1)).cast("long").alias("__dns"),
        F.count(F.lit(1)).alias("__nd"),
    )
    dglob = dsrc.agg(
        F.sum("__dps").alias("__dp"),
        F.sum("__dns").alias("__dn"),
        F.sum("__nd").alias("__ndall"),
    )
    priors = (
        variants.crossJoin(F.broadcast(dglob))
        .join(
            dsrc.select(
                F.col("__src").alias("variant"), "__dps", "__dns", "__nd"
            ),
            "variant",
            "left",
        )
        .select(
            "variant",
            micros(
                F.log(
                    F.col("__dp") - F.coalesce("__dps", F.lit(0)) + 1
                )
                - F.log(
                    F.col("__dn") - F.coalesce("__dns", F.lit(0)) + 1
                )
            ).alias("__prior"),
            F.coalesce("__nd", F.lit(0)).cast("long").alias(
                "n_removed_docs"
            ),
        )
    )
    tok_eval = (
        eval_df.select(
            F.col(id_col).alias("__id"),
            (F.col(label_col) == F.lit(positive_value)).alias("__lab"),
            F.explode(tokens_pd(F.col(text_col))).alias("__t"),
        )
        .persist()
    )
    tok_scores = (
        tok_eval.join(weights, "__t")
        .groupBy("__id", "__lab", "variant")
        .agg(F.sum("__w").alias("__s"))
    )
    # every (eval doc, variant) keeps a row: docs whose tokens all fall
    # outside the LOO vocabulary score on the prior alone
    eval_docs = tok_eval.select("__id", "__lab").distinct()
    scored = (
        eval_docs.crossJoin(F.broadcast(variants))
        .join(tok_scores, ["__id", "__lab", "variant"], "left")
        .join(F.broadcast(priors), "variant")
        .select(
            "variant",
            "n_removed_docs",
            "__lab",
            (
                F.coalesce("__s", F.lit(0)) + F.col("__prior") > 0
            ).alias("__pred"),
        )
    )
    rep = scored.groupBy("variant", "n_removed_docs").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum((F.col("__pred") == F.col("__lab")).cast("long")).alias(
            "n_correct"
        ),
    ).withColumn(
        "accuracy_ppm", F.expr("n_correct * 1000000L div n_eval")
    )
    full = rep.filter(F.col("variant") == "__full__").select(
        F.col("accuracy_ppm").alias("__full_acc")
    )
    out = rep.crossJoin(F.broadcast(full)).select(
        F.col("variant").alias("source"),
        "n_removed_docs",
        "n_eval",
        "n_correct",
        "accuracy_ppm",
        (F.col("accuracy_ppm") - F.col("__full_acc")).alias("delta_ppm"),
    )
    return materialize_release(out, tok_train, tok_eval, per_src)
