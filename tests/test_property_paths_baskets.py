"""Randomized twins for the path/basket/linkage batch: each Spark result
is replayed against a direct pure-Python model on the same seeded rows.
Seeded RNG (not hypothesis) — each case is one Spark job over a few
hundred rows."""

import datetime as dt
import random
from collections import Counter, defaultdict

import pytest

from sparkplug_spark.operators import (
    basket_pairs,
    blocked_link,
    event_transitions,
    session_paths,
)

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _events(rng, n_users=12, n_events=250, max_gap=4000):
    rows = []
    t0 = dt.datetime(2024, 3, 1)
    clocks = {u: 0 for u in range(n_users)}
    for i in range(n_events):
        u = rng.randrange(n_users)
        clocks[u] += rng.randrange(max_gap)
        rows.append(
            (i, t0 + dt.timedelta(seconds=clocks[u]), u,
             rng.choice("abcde"), 0.0)
        )
    return rows


@pytest.mark.parametrize("seed", [2, 19])
def test_event_transitions_twin(spark, seed):
    rng = random.Random(seed)
    rows = _events(rng)
    got = {
        (r["src_type"], r["dst_type"]): (
            r["n_transitions"], r["p_ppm"], r["avg_gap_us"]
        )
        for r in event_transitions(
            spark.createDataFrame(rows, EVENT_SCHEMA)
        ).collect()
    }
    # pure-python model over the (epoch_s, id) total order
    per_user = defaultdict(list)
    for i, ts, u, t, _ in rows:
        per_user[u].append((int(ts.timestamp()), i, t))
    counts, gaps = Counter(), Counter()
    for seq in per_user.values():
        seq.sort()
        for (s1, _, t1), (s2, _, t2) in zip(seq, seq[1:]):
            counts[(t1, t2)] += 1
            gaps[(t1, t2)] += s2 - s1
    src_tot = Counter()
    for (s, _), n in counts.items():
        src_tot[s] += n
    want = {
        k: (n, n * 1_000_000 // src_tot[k[0]], gaps[k] * 1_000_000 // n)
        for k, n in counts.items()
    }
    assert got == want


@pytest.mark.parametrize("seed", [5, 31])
def test_session_paths_twin(spark, seed):
    rng = random.Random(seed)
    rows = _events(rng, max_gap=3000)
    gap, max_steps, min_sessions = 1800, 3, 1
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(
            spark.createDataFrame(rows, EVENT_SCHEMA),
            gap_seconds=gap, max_steps=max_steps, min_sessions=min_sessions,
        ).collect()
    }
    per_user = defaultdict(list)
    for i, ts, u, t, _ in rows:
        per_user[u].append((int(ts.timestamp()), i, t))
    paths = Counter()
    for seq in per_user.values():
        seq.sort()
        sessions, cur, prev = [], [], None
        for s, _, t in seq:
            if prev is None or s - prev > gap:
                cur = []
                sessions.append(cur)
            cur.append(t)
            prev = s
        for sess in sessions:
            paths[">".join(sess[:max_steps])] += 1
    want = {p: n for p, n in paths.items() if n >= min_sessions}
    assert got == want


@pytest.mark.parametrize("seed", [13, 41])
def test_basket_pairs_twin(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.randrange(60), rng.randrange(25)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "b long, i long")
    got = {
        (r["item_a"], r["item_b"]): (r["n_baskets"], r["lift_ppm"])
        for r in basket_pairs(df, "b", "i", min_count=1).collect()
    }
    baskets = defaultdict(set)
    for b, i in rows:
        baskets[b].add(i)
    n_total = len(baskets)
    item_n = Counter(i for s in baskets.values() for i in s)
    pair_n = Counter()
    for s in baskets.values():
        items = sorted(s)
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pair_n[(items[x], items[y])] += 1
    want = {
        p: (n, n * n_total * 1_000_000 // (item_n[p[0]] * item_n[p[1]]))
        for p, n in pair_n.items()
    }
    assert got == want


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", [8, 27])
def test_blocked_link_twin(spark, seed):
    rng = random.Random(seed)
    alphabet = "abcd"
    rows = [
        (
            i,
            "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 7))),
            rng.choice("xy"),
        )
        for i in range(120)
    ]
    d = 2
    df = spark.createDataFrame(rows, "id long, name string, blk string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in blocked_link(df, "id", "name", ["blk"], max_distance=d).collect()
    }
    want = {}
    for ia, na, ba in rows:
        for ib, nb, bb in rows:
            if ia < ib and ba == bb:
                dist = _lev(na, nb)
                if dist <= d:
                    want[(ia, ib)] = dist
    assert got == want


@pytest.mark.parametrize("seed", [6, 37])
def test_windowed_funnel_twin(spark, seed):
    from sparkplug_spark.operators import funnel_counts

    rng = random.Random(seed)
    steps, w = ["a", "b", "c"], 900
    rows = _events(rng, n_users=10, n_events=200, max_gap=1500)
    # restrict types to the funnel alphabet + noise
    rows = [
        (i, ts, u, rng.choice(["a", "b", "c", "z"]), v)
        for (i, ts, u, _, v) in rows
    ]
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            spark.createDataFrame(rows, EVENT_SCHEMA),
            steps,
            within_seconds=w,
        ).collect()
    }
    # brute-force model: valid_k = step-k events with SOME valid step-(k-1)
    # event in [t-w, t)
    per_user = defaultdict(list)
    for i, ts, u, t, _ in rows:
        per_user[u].append((int(ts.timestamp()), t))
    want = {s: 0 for s in steps}
    for seq in per_user.values():
        valid = {0: [t for t, e in seq if e == steps[0]]}
        for k in range(1, len(steps)):
            valid[k] = [
                t
                for t, e in seq
                if e == steps[k]
                and any(t - w <= p < t for p in valid[k - 1])
            ]
        for k, s in enumerate(steps):
            if valid[k]:
                want[s] += 1
    assert got == want


@pytest.mark.parametrize("seed", [9, 44])
def test_decay_attribution_twin(spark, seed):
    from sparkplug_spark.operators import attribution_counts

    rng = random.Random(seed)
    hl = 300
    rows, eid = [], 0
    for u in range(15):
        t = 0
        for _ in range(rng.randint(0, 7)):
            t += rng.randint(1, 2000)
            rows.append((eid, dt.datetime(2024, 3, 1) + dt.timedelta(seconds=t), u,
                         rng.choice(["ad", "email", "social"]), 0.0))
            eid += 1
        if rng.random() < 0.8:
            t += rng.randint(1, 2000)
            rows.append((eid, dt.datetime(2024, 3, 1) + dt.timedelta(seconds=t), u, "buy", 0.0))
            eid += 1
    got = {
        r["touch_type"]: r["credit_ppm"]
        for r in attribution_counts(
            spark.createDataFrame(rows, EVENT_SCHEMA),
            conversion="buy",
            touch_types=("ad", "email", "social"),
            model="decay",
            half_life_seconds=hl,
        ).collect()
    }
    # pure-python model
    per_user = defaultdict(list)
    conv = {}
    for i, ts, u, t, _ in rows:
        s = int(ts.timestamp())
        if t == "buy":
            conv[u] = min(conv.get(u, s), s)
        else:
            per_user[u].append((s, i, t))
    want = Counter()
    for u, tc in conv.items():
        touches = sorted(
            [(s, i, t) for s, i, t in per_user.get(u, []) if s < tc],
            key=lambda x: (-x[0], -x[1]),
        )
        if not touches:
            want["(none)"] += 1_000_000
            continue
        ws = [1_000_000 // (1 << min((tc - s) // hl, 30)) for s, _, _ in touches]
        W = sum(ws)
        shares = [w * 1_000_000 // W if W else 0 for w in ws]
        shares[0] += 1_000_000 - sum(shares)  # remainder to rn=1 (last touch)
        for (s_, i_, t_), c in zip(touches, shares):
            want[t_] += c
    assert got == dict(want)


@pytest.mark.parametrize("seed", [14, 52])
def test_cohort_ltv_twin(spark, seed):
    from sparkplug_spark.operators import cohort_ltv

    rng = random.Random(seed)
    P = 500
    rows, eid = [], 0
    for u in range(12):
        t = rng.randint(0, 3 * P)
        for _ in range(rng.randint(1, 8)):
            rows.append((eid, dt.datetime(2024, 3, 1) + dt.timedelta(seconds=t), u,
                         "x", round(rng.uniform(0, 20), 3)))
            eid += 1
            t += rng.randint(1, 2 * P)
    got = {
        (r["cohort_period"], r["period_offset"]): (
            r["revenue_micros"], r["cum_revenue_micros"],
            r["n_users"], r["cum_ltv_per_user_micros"],
        )
        for r in cohort_ltv(
            spark.createDataFrame(rows, EVENT_SCHEMA), period_seconds=P
        ).collect()
    }
    # pure-python model
    from decimal import Decimal

    first, cells, sizes = {}, Counter(), Counter()
    for _, ts, u, _, v in rows:
        p = int(ts.timestamp()) // P
        first[u] = min(first.get(u, p), p)
    for u, c in first.items():
        sizes[c] += 1
    for _, ts, u, _, v in rows:
        p = int(ts.timestamp()) // P
        micros = int(Decimal(str(v)).scaleb(6))
        cells[(first[u], p - first[u])] += micros
    want = {}
    for (c, o) in sorted(cells):
        prev = sum(m for (cc, oo), m in cells.items() if cc == c and oo <= o)
        want[(c, o)] = (
            cells[(c, o)], prev, sizes[c], prev * 1_000_000 // (sizes[c] * 1_000_000),
        )
    # fix ltv: prev // n_users directly (micros)
    want = {
        k: (rev, cum, n, cum // n) for k, (rev, cum, n, _) in want.items()
    }
    assert got == want


@pytest.mark.parametrize("seed", [21, 58])
def test_conversion_paths_twin(spark, seed):
    from sparkplug_spark.operators import session_paths

    rng = random.Random(seed)
    rows = _events(rng, n_users=10, n_events=220, max_gap=2500)
    rows = [
        (i, ts, u, rng.choice(["a", "b", "buy"]), v)
        for (i, ts, u, _, v) in rows
    ]
    gap, max_steps = 1800, 3
    got = {
        r["path"]: r["n_sessions"]
        for r in session_paths(
            spark.createDataFrame(rows, EVENT_SCHEMA),
            gap_seconds=gap, max_steps=max_steps, min_sessions=1,
            end_at="buy",
        ).collect()
    }
    per_user = defaultdict(list)
    for i, ts, u, t, _ in rows:
        per_user[u].append((int(ts.timestamp()), i, t))
    paths = Counter()
    for seq in per_user.values():
        seq.sort()
        sessions, cur, prev = [], [], None
        for s, _, t in seq:
            if prev is None or s - prev > gap:
                cur = []
                sessions.append(cur)
            cur.append(t)
            prev = s
        for sess in sessions:
            if "buy" not in sess:
                continue
            end = sess.index("buy") + 1  # first occurrence, 1-based
            band = sess[max(0, end - max_steps):end]
            paths[">".join(band)] += 1
    assert got == dict(paths)
