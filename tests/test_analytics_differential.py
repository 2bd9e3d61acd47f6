"""Third-implementation differentials for the round-4 analytics batch:
each contract's Spark plan is checked bit-for-bit against an independent
pure-Python reference (NOT the DuckDB oracle — that's the driver's
check) computed straight from the sf0.001 parquet via pandas.

Exact equality is asserted everywhere: these contracts are built on the
quantize-to-integers / single-expression-tree / ordered-fold recipes, so
a correct reference lands on the identical doubles.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _events():
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    one_s = pd.Timedelta(seconds=1)
    ev["hour"] = ((ev["ts"].dt.floor("h") - epoch) / one_s).astype("int64")
    ev["day"] = ((ev["ts"].dt.floor("d") - epoch) / one_s).astype("int64")
    ev["v_ms"] = (ev["value"] * 1000).apply(math.floor).astype("int64")
    return ev


def test_acf_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = _events()
    xs = [
        int(c) for _, c in sorted(Counter(ev["hour"]).items())
    ]  # hourly counts in hour order
    n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
    xbar = float(s) / n
    want = {}
    for k in range(1, 7):
        pairs = list(zip(xs[:-k], xs[k:]))
        nk = len(pairs)
        c = sum(a * b for a, b in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(b for _, b in pairs)
        want[k] = (
            nk,
            (float(c) - xbar * float(sh + st) + float(nk) * xbar * xbar)
            / (float(q) - float(s) * xbar),
        )
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in QUERIES["q_acf_lags"](spark, SF_DIR).collect()
    }
    assert got == want  # identical IEEE op tree → exact doubles


def test_holt_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = _events()
    want = {}
    for et, g in ev.groupby("event_type"):
        hourly = g.groupby("hour")["v_ms"].agg(["sum", "count"]).sort_index()
        xs = [s / (1000.0 * n) for s, n in zip(hourly["sum"], hourly["count"])]
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            new_l = 0.5 * x + 0.5 * (level + trend)
            trend = 0.25 * ((0.5 * x + 0.5 * (level + trend)) - level) + 0.75 * trend
            level = new_l
        want[et] = (len(xs), level, trend, level + 3.0 * trend)
    got = {
        r["event_type"]: (r["n_hours"], r["level"], r["trend"], r["forecast_3"])
        for r in QUERIES["q_holt_linear"](spark, SF_DIR).collect()
    }
    assert got == want  # identical ordered fold → exact doubles


def test_cusum_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = _events()
    want = {}
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("day")["v_ms"].sum().sort_index()
        days, vals = list(daily.index), [int(v) for v in daily]
        n, total, cum = len(vals), sum(vals), 0
        best = None
        for t, (d, x) in enumerate(zip(days, vals), start=1):
            cum += x
            dev = abs(n * cum - t * total)
            key = (-dev, d)
            if best is None or key < best[0]:
                best = (key, (n, int(d), dev))
        want[et] = best[1]
    got = {
        r["event_type"]: (r["n_days"], r["cp_day_epoch"], r["max_abs_dev"])
        for r in QUERIES["q_cusum_changepoint"](spark, SF_DIR).collect()
    }
    assert got == want


def test_gini_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"] * 100 + 0.5).apply(math.floor).astype("int64")
    want = {}
    for nk, g in j.groupby("c_nationkey"):
        rev = sorted(
            g.groupby("o_custkey")["cents"].sum().items(),
            key=lambda kv: (kv[1], kv[0]),
        )
        n = len(rev)
        t = sum(v for _, v in rev)
        w = sum(i * v for i, (_, v) in enumerate(rev, start=1))
        name = nation.loc[nation["n_nationkey"] == nk, "n_name"].iloc[0]
        want[name] = (n, t, float(2 * w - (n + 1) * t) / float(n * t))
    got = {
        r["n_name"]: (r["n_customers"], r["total_cents"], r["gini"])
        for r in QUERIES["q_gini_concentration"](spark, SF_DIR).collect()
    }
    assert got == want


def test_als_step_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j["r"] = j["l_quantity"].astype("int64")
    ratings = j.groupby(["o_custkey", "l_partkey"])["r"].sum()
    mom = defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0, 0.0])
    for (u, item), r in ratings.items():
        q1 = (item * 2654435761) % 16 / 16.0 - 0.5
        q2 = (item * 40503) % 16 / 16.0 - 0.5
        m = mom[u]
        m[0] += 1
        m[1] += q1 * q1
        m[2] += q1 * q2
        m[3] += q2 * q2
        m[4] += float(r) * q1
        m[5] += float(r) * q2
    want = {}
    for u, (n, a11, a12, a22, b1, b2) in mom.items():
        det = (a11 + 0.5) * (a22 + 0.5) - a12 * a12
        want[u] = (
            n,
            ((a22 + 0.5) * b1 - a12 * b2) / det,
            ((a11 + 0.5) * b2 - a12 * b1) / det,
        )
    got = {
        r["user_id"]: (r["n_items"], r["p1"], r["p2"])
        for r in QUERIES["q_als_user_step"](spark, SF_DIR).collect()
    }
    # dyadic moments sum exactly in ANY order → exact doubles
    assert got == want


def test_association_rules_match_bruteforce(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    baskets = li.groupby("l_orderkey")["l_partkey"].agg(lambda s: set(s))
    n_orders = len(baskets)
    supp: Counter = Counter()
    pair: Counter = Counter()
    for items in baskets:
        for a in items:
            supp[a] += 1
        items = sorted(items)
        for i, a in enumerate(items):
            for b in items[i + 1 :]:
                pair[(a, b)] += 1
    rules = []
    for (a, b), s_ab in pair.items():
        if s_ab < 2:
            continue
        for ant, con in ((a, b), (b, a)):
            lift = float(s_ab * n_orders) / float(supp[ant] * supp[con])
            rules.append(
                (-lift, ant, con, s_ab, float(s_ab) / supp[ant], lift)
            )
    want = [r[1:] for r in sorted(rules)[:20]]
    got = [
        (r["antecedent"], r["consequent"], r["s_ab"], r["confidence"], r["lift"])
        for r in QUERIES["q_association_rules"](spark, SF_DIR).collect()
    ]
    assert got == want


def test_mad_outliers_match_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = _events()
    want = {}
    for et, g in ev.groupby("event_type"):
        vs = sorted(int(v) for v in g["v_ms"])

        def med(sorted_vals):
            m = len(sorted_vals)
            if m % 2:
                return float(sorted_vals[m // 2])
            return (sorted_vals[m // 2 - 1] + sorted_vals[m // 2]) / 2

        med_v = med(vs)
        devs = sorted(abs(v - med_v) for v in vs)
        mad_v = med(devs)
        n_out = sum(1 for d in devs if d * 0.6745 > 3.5 * mad_v)
        want[et] = (len(vs), med_v, mad_v, n_out)
    got = {
        r["event_type"]: (r["n"], r["med_v"], r["mad_v"], r["n_outliers"])
        for r in QUERIES["q_mad_outliers"](spark, SF_DIR).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", range(8))
def test_link_prediction_matches_bruteforce(spark, seed):
    from mapreduce_hw05_spark.operators.graph import (
        link_prediction_common_neighbors,
    )

    rng = random.Random(seed)
    n_nodes = rng.randint(5, 14)
    edges = set()
    for _ in range(rng.randint(4, 30)):
        a, b = rng.sample(range(n_nodes), 2)
        edges.add((min(a, b), max(a, b)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = set()
    for a in adj:
        for b in adj:
            if a >= b or (a, b) in edges:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                want.add(
                    (a, b, cn, float(cn) / float(len(adj[a]) + len(adj[b]) - cn))
                )
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        (r["src"], r["dst"], r["cn"], r["jaccard"])
        for r in link_prediction_common_neighbors(df).collect()
    }
    assert got == want, f"seed={seed}"


def test_spearman_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    customer = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    orders["cents"] = (orders["o_totalprice"] * 100 + 0.5).apply(
        math.floor
    ).astype("int64")
    rev = orders.groupby("o_custkey")["cents"].sum()
    cust = customer.set_index("c_custkey").loc[rev.index]
    frame = pd.DataFrame(
        {
            "c_custkey": rev.index.to_numpy(),
            "nk": cust["c_nationkey"].to_numpy(),
            "bal": (cust["c_acctbal"] * 100 + 0.5)
            .apply(math.floor)
            .astype("int64")
            .to_numpy(),
            "cents": rev.to_numpy(),
        }
    )
    want = {}
    for nk, g in frame.groupby("nk"):
        rx = {
            c: i + 1
            for i, c in enumerate(
                g.sort_values(["bal", "c_custkey"])["c_custkey"]
            )
        }
        ry = {
            c: i + 1
            for i, c in enumerate(
                g.sort_values(["cents", "c_custkey"])["c_custkey"]
            )
        }
        n = len(g)
        s = sum((rx[c] - ry[c]) ** 2 for c in g["c_custkey"])
        name = nation.set_index("n_nationkey").loc[nk, "n_name"]
        want[name] = (n, s, 1.0 - float(6 * s) / float(n * (n * n - 1)))
    got = {
        r["n_name"]: (r["n_customers"], r["sum_d2"], r["rho"])
        for r in QUERIES["q_spearman_corr"](spark, SF_DIR).collect()
    }
    assert got == want  # exact ranks + one divide → exact doubles


def test_mutual_information_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["hr"] = ev["ts"].dt.hour.astype("int64")
    cells = Counter(zip(ev["event_type"], ev["hr"]))
    mx = Counter(ev["event_type"])
    my = Counter(ev["hr"])
    n = len(ev)
    want = {
        (et, hr): (
            c,
            round(
                (float(c) / n)
                * math.log(float(c * n) / float(mx[et] * my[hr])),
                9,
            ),
        )
        for (et, hr), c in cells.items()
    }
    got = {
        (r["event_type"], r["hr"]): (r["n_xy"], r["mi_term"])
        for r in QUERIES["q_mutual_information"](spark, SF_DIR).collect()
    }
    assert got == want


def test_welch_ttest_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    # the contract rounds-to-nearest (floor(v*1000 + 0.5)); _events()'s
    # v_ms is plain floor, so quantize locally
    ev["v_ms"] = (ev["value"] * 1000 + 0.5).apply(math.floor).astype("int64")
    stats = {}
    for et in ("purchase", "view"):
        xs = ev.loc[ev["event_type"] == et, "v_ms"]
        stats[et] = (len(xs), int(xs.sum()), int((xs * xs).sum()))
    (n1, s1a, s2a), (n2, s1b, s2b) = stats["purchase"], stats["view"]
    m1, m2 = float(s1a) / n1, float(s1b) / n2
    v1 = (float(n1) * float(s2a) - float(s1a) * float(s1a)) / (
        float(n1) * (float(n1) - 1.0)
    )
    v2 = (float(n2) * float(s2b) - float(s1b) * float(s1b)) / (
        float(n2) * (float(n2) - 1.0)
    )
    se1, se2 = v1 / n1, v2 / n2
    want = (
        n1,
        n2,
        m1,
        m2,
        (m1 - m2) / math.sqrt(se1 + se2),
        ((se1 + se2) * (se1 + se2))
        / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)),
    )
    [r] = QUERIES["q_welch_ttest"](spark, SF_DIR).collect()
    got = (r["n1"], r["n2"], r["m1"], r["m2"], r["t_stat"], r["welch_df"])
    assert got == want  # fixed-shape IEEE chain → exact doubles


def test_theil_deciles_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    customer = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nation = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    orders["cents"] = (orders["o_totalprice"] * 100 + 0.5).apply(
        math.floor
    ).astype("int64")
    rev = orders.groupby("o_custkey")["cents"].sum()
    nk = customer.set_index("c_custkey").loc[rev.index, "c_nationkey"]
    names = nation.set_index("n_nationkey")["n_name"]
    want = {}
    for nat, g in pd.DataFrame(
        {"cust": rev.index.to_numpy(), "nk": nk.to_numpy(),
         "cents": rev.to_numpy()}
    ).groupby("nk"):
        rows = sorted(zip(g["cents"], g["cust"]))
        m = len(rows)
        # SQL-standard ntile: first (m % 10) buckets get ceil(m/10)
        big, small = m % 10, m // 10
        deciles = []
        i = 0
        for d in range(1, 11):
            size = small + (1 if d <= big else 0)
            deciles.append((d, rows[i : i + size]))
            i += size
        n_tot = m
        x_tot = sum(c for c, _ in rows)
        for d, chunk in deciles:
            if not chunk:
                continue
            n_g, x_g = len(chunk), sum(c for c, _ in chunk)
            share_x = float(x_g) / x_tot
            share_n = float(n_g) / n_tot
            term = round(share_x * math.log(share_x / share_n), 9)
            want[(names[nat], d)] = (n_g, x_g, term)
    got = {
        (r["n_name"], r["decile"]): (
            r["n_customers"], r["x_g_cents"], r["theil_term"]
        )
        for r in QUERIES["q_theil_deciles"](spark, SF_DIR).collect()
    }
    assert got == want


def test_growth_accounting_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    epoch = pd.Timestamp("1970-01-01")
    ev["week"] = ((ev["ts"].dt.floor("d") - epoch).dt.days // 7).astype(
        "int64"
    )
    weeks = defaultdict(set)
    for u, w in set(zip(ev["user_id"], ev["week"])):
        weeks[u].add(w)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for u, ws in weeks.items():
        ordered = sorted(ws)
        for i, w in enumerate(ordered):
            prev = ordered[i - 1] if i else None
            nxt = ordered[i + 1] if i + 1 < len(ordered) else None
            a = agg[w]
            a[0] += 1
            if prev is None:
                a[1] += 1
            elif prev == w - 1:
                a[2] += 1
            else:
                a[3] += 1
            if nxt is None or nxt > w + 1:
                a[4] += 1
    want = {w: tuple(v) for w, v in agg.items()}
    got = {
        r["week"]: (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churning_out"],
        )
        for r in QUERIES["q_growth_accounting"](spark, SF_DIR).collect()
    }
    assert got == want


def test_lift_deciles_matches_python(spark):
    from mapreduce_hw05_spark.plans import QUERIES

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    customer = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    responders = set(
        orders.loc[
            pd.to_datetime(orders["o_orderdate"]).dt.year == 1995,
            "o_custkey",
        ]
    )
    rows = sorted(
        zip(
            (-(customer["c_acctbal"] * 100 + 0.5).apply(math.floor)).astype(
                "int64"
            ),
            customer["c_custkey"],
        )
    )
    m = len(rows)
    big, small = m % 10, m // 10
    want = {}
    i = 0
    hits_all = sum(1 for _, c in rows if c in responders)
    for d in range(1, 11):
        size = small + (1 if d <= big else 0)
        chunk = rows[i : i + size]
        i += size
        n, h = len(chunk), sum(1 for _, c in chunk if c in responders)
        want[d] = (
            n,
            h,
            float(h) / n,
            float(h * m) / float(n * hits_all),
        )
    got = {
        r["decile"]: (r["n"], r["n_hits"], r["response_rate"], r["lift"])
        for r in QUERIES["q_lift_deciles"](spark, SF_DIR).collect()
    }
    assert got == want
