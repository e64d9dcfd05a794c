"""Randomized invariants for the round-3 additions: trim band math vs
numpy, z-order round-trip, mixture ppm accounting, snapshot diff
reconstruction.  Seeded RNG (not hypothesis) — each case is one Spark
job over a few hundred rows."""

import random

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators import (
    mixture_report,
    snapshot_diff,
    trim_by_quantile,
)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_trim_exact_matches_rank_model(spark, seed):
    rng = random.Random(seed)
    rows = [
        (i, rng.choice("ab"), float(rng.randint(0, 50)))  # heavy ties
        for i in range(200)
    ]
    lo, hi = 0.1, 0.9
    out = trim_by_quantile(
        spark.createDataFrame(rows, "doc_id long, g string, v double"),
        "v", lo=lo, hi=hi, by=("g",), id_col="doc_id",
    )
    got = {r["doc_id"] for r in out.collect()}
    # reference model: rank by (v, doc_id), keep floor(lo*n) < rn <= ceil(hi*n)
    import math

    expect = set()
    for g in "ab":
        grp = sorted((v, i) for i, gg, v in rows if gg == g)
        n = len(grp)
        for rn, (_, i) in enumerate(grp, start=1):
            if math.floor(lo * n) < rn <= math.ceil(hi * n):
                expect.add(i)
    assert got == expect


@pytest.mark.parametrize("seed", [3, 11])
def test_zorder_roundtrip(spark, seed):
    from sparkplug_spark.sources import zorder_value

    rng = random.Random(seed)
    bits = 6
    rows = [(rng.randint(0, 63), rng.randint(0, 63)) for _ in range(300)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.withColumn("z", zorder_value(df, ["a", "b"], bits=bits)).collect()
    # domain exactly [0, 2^bits): bucket == value, so de-interleaving the
    # even/odd bits of z must reproduce (a, b)
    lo_a = min(a for a, _ in rows)
    lo_b = min(b for _, b in rows)
    chunk_a = max(1, -(-(max(a for a, _ in rows) - lo_a + 1) // (1 << bits)))
    chunk_b = max(1, -(-(max(b for _, b in rows) - lo_b + 1) // (1 << bits)))
    for r in got:
        ba = (r["a"] - lo_a) // chunk_a
        bb = (r["b"] - lo_b) // chunk_b
        da = db = 0
        for i in range(bits):
            da |= ((r["z"] >> (2 * i)) & 1) << i
            db |= ((r["z"] >> (2 * i + 1)) & 1) << i
        assert (da, db) == (ba, bb)


def test_mixture_ppm_accounting(spark):
    rng = random.Random(5)
    rows = [
        (i, f"s{rng.randint(0, 4)}", rng.randint(1, 1000)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    rep = mixture_report(
        df, {"s0": 1.0, "s1": 1.0}, key="source", weight_col="w"
    ).collect()
    total = sum(r["actual_weight"] for r in rep)
    assert total == sum(w for _, _, w in rows)
    # floor'd shares: sum within n_keys of 1e6, never above
    s = sum(r["actual_ppm"] for r in rep)
    assert 1_000_000 - len(rep) <= s <= 1_000_000
    assert sum(r["target_ppm"] for r in rep) == 1_000_000


def test_snapshot_diff_reconstructs_mutations(spark):
    rng = random.Random(13)
    base = {i: f"text-{rng.randint(0, 9)}" for i in range(150)}
    removed = set(rng.sample(sorted(base), 20))
    added = {1000 + i: "new" for i in range(15)}
    changed = set(rng.sample(sorted(set(base) - removed), 25))
    new = {
        **{k: (v + "!" if k in changed else v) for k, v in base.items() if k not in removed},
        **added,
    }
    old_df = spark.createDataFrame(list(base.items()), "id long, t string")
    new_df = spark.createDataFrame(list(new.items()), "id long, t string")
    got = {
        s: {r["id"] for r in rows}
        for s, rows in __import__("itertools").groupby(
            sorted(
                snapshot_diff(old_df, new_df, ["id"], ["t"]).collect(),
                key=lambda r: r["status"],
            ),
            key=lambda r: r["status"],
        )
    }
    assert got.get("added", set()) == set(added)
    assert got.get("removed", set()) == removed
    assert got.get("changed", set()) == changed


@pytest.mark.parametrize("seed", [2, 9])
def test_impute_median_mode_match_python_model(spark, seed):
    from sparkplug_spark.operators import impute_nulls

    rng = random.Random(seed)
    rows = []
    for i in range(200):
        g = rng.choice("abc")
        v = None if rng.random() < 0.2 else float(rng.randint(0, 20))
        s = None if rng.random() < 0.2 else rng.choice("xyz")
        rows.append((i, g, v, s))
    df = spark.createDataFrame(rows, "id long, g string, v double, s string")
    out = {
        r["id"]: r
        for r in impute_nulls(df, {"v": "median", "s": "mode"}, by=("g",)).collect()
    }
    # python model: lower median (ceil(n/2)-th sorted), mode w/ min-value tie
    import math
    from collections import Counter

    fills = {}
    for g in "abc":
        vals = sorted(v for i, gg, v, s in rows if gg == g and v is not None)
        med = vals[math.ceil(len(vals) / 2) - 1] if vals else None
        ss = [s for i, gg, v, s in rows if gg == g and s is not None]
        mode = (
            min(
                (t for t in Counter(ss).items()),
                key=lambda t: (-t[1], t[0]),
            )[0]
            if ss
            else None
        )
        fills[g] = (med, mode)
    for i, g, v, s in rows:
        assert out[i]["v"] == (v if v is not None else fills[g][0])
        assert out[i]["s"] == (s if s is not None else fills[g][1])


@pytest.mark.parametrize("seed", [0, 1])
def test_assign_splits_matches_python_md5_model(spark, seed):
    """The split coin is pure md5 arithmetic — a python twin must agree
    row for row (engine-reproducibility is the operator's whole point)."""
    import hashlib

    from sparkplug_spark.operators import assign_splits

    rng = random.Random(seed)
    ids = rng.sample(range(100_000), 300)
    weights = {"train": 8, "val": 1, "test": 1}
    salt = f"s{seed}"

    def py_split(doc_id: int) -> str:
        h = hashlib.md5(f"{salt}\x1f{doc_id}".encode()).hexdigest()
        coin = int(h[:15], 16) % 1_000_000
        total = sum(weights.values())
        acc = 0
        for name in list(weights)[:-1]:
            acc += weights[name] * 1_000_000 // total
            if coin < acc:
                return name
        return list(weights)[-1]

    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: r["split"]
        for r in assign_splits(docs, weights=weights, salt=salt).collect()
    }
    assert got == {i: py_split(i) for i in ids}


@pytest.mark.parametrize("seed", [0, 1])
def test_keyword_search_matches_python_scoring_model(spark, seed):
    """Integer tf-idf twin: brute-force python scoring over random tiny
    corpora reproduces scores, ranks, and require_all filtering."""
    from sparkplug_spark.operators import keyword_search

    rng = random.Random(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 12))))
        for i in range(40)
    ]
    terms = rng.sample(vocab, 2)
    tf_cap, smooth, k = 3, 10, 7

    toks = {i: t.split() for i, t in docs}
    n_docs = len(docs)
    dfreq = {
        t: sum(1 for ts in toks.values() if t in ts) for t in terms
    }
    expected = []
    for i, ts in toks.items():
        matched = [t for t in terms if t in ts]
        if not matched:
            continue
        score = sum(
            min(ts.count(t), tf_cap) * (n_docs // dfreq[t]) for t in matched
        )
        expected.append((i, score * 1000 // (smooth + len(ts)), len(matched)))
    for require_all in (False, True):
        want = [
            (i, s)
            for i, s, m in expected
            if not require_all or m == len(terms)
        ]
        want.sort(key=lambda x: (-x[1], x[0]))
        want = [(i, s, r + 1) for r, (i, s) in enumerate(want[:k])]
        got = sorted(
            (r["doc_id"], r["score_ppk"], r["rank"])
            for r in keyword_search(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                {"q": terms},
                k=k,
                tf_cap=tf_cap,
                len_smooth=smooth,
                require_all=require_all,
            ).collect()
        )
        assert got == sorted(want), f"require_all={require_all}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_throttle_matches_python_fold(spark, seed):
    """Burst-chain collapse twin: a sequential python fold over the sorted
    log reproduces the window implementation exactly, including tied
    timestamps and multi-key logs."""
    import datetime as dtm

    from sparkplug_spark.operators import throttle_events

    rng = random.Random(seed)
    base = dtm.datetime(2024, 1, 1)
    rows = []
    for eid in range(120):
        rows.append(
            (
                eid,
                base + dtm.timedelta(seconds=rng.randint(0, 400)),
                rng.randint(1, 3),
                rng.choice(["a", "b"]),
                0.0,
            )
        )
    gap = 30

    def fold():
        kept = []
        by = {}
        for eid, t, u, e, _ in sorted(
            rows, key=lambda r: (r[2], r[3], r[1], r[0])
        ):
            ts = int(t.replace(tzinfo=dtm.timezone.utc).timestamp())
            prev = by.get((u, e))
            if prev is None or ts - prev > gap:
                kept.append(eid)
            by[(u, e)] = ts  # chain semantics: clock resets on EVERY event
        return set(kept)

    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {
        r["event_id"] for r in throttle_events(ev, gap_seconds=gap).collect()
    }
    assert got == fold()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rolling_features_match_python_quadratic(spark, seed):
    """Trailing-window twin: brute-force O(n^2) python over random logs
    reproduces counts and micros sums for both the global and the
    bucketed-overlap plan."""
    import datetime as dtm

    from sparkplug_spark.operators import rolling_window_features

    rng = random.Random(seed)
    base = dtm.datetime(2024, 1, 1)
    rows = [
        (
            eid,
            base + dtm.timedelta(seconds=rng.randint(0, 500)),
            1,
            rng.choice(["a", "b"]),
            round(rng.uniform(-5, 5), 3),
        )
        for eid in range(80)
    ]
    win = 60

    def epoch(t):
        return int(t.replace(tzinfo=dtm.timezone.utc).timestamp())

    expected = {}
    for eid, t, _, e, _v in rows:
        ts = epoch(t)
        n = 0
        micros = 0
        for _eid2, t2, _, e2, v2 in rows:
            ts2 = epoch(t2)
            if e2 == e and ts - win <= ts2 <= ts:
                n += 1
                micros += int(round(v2 * 1_000_000))
        expected[eid] = (n, micros)

    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    for kwargs in ({}, {"bucket_seconds": 120}):
        got = {
            r["event_id"]: (r["n_trailing"], r["value_micros_trailing"])
            for r in rolling_window_features(
                ev, window_seconds=win, **kwargs
            ).collect()
        }
        assert got == expected, kwargs
