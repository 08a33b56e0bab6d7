"""Invariant tests for the distributed-statistics tier
(operators/stats.py): grouped OLS vs the closed-form model, stump
optimality vs the quadratic spec, power-iteration alignment with the
planted dominant direction, mutual-NN properties vs in-bucket brute
force, ACF vs numpy on the integer formula, and grid-radius-join
parity with the all-pairs quadratic."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_processing_scd1_spark.operators.similarity import md5_planes
from etl_processing_scd1_spark.operators.stats import (
    _trunc_div,
    acf_lags,
    decision_stump,
    grid_radius_join,
    grouped_ols,
    mutual_nn_match,
    ols_from_stats,
    ols_stats,
    pca_power_iteration,
    power_seed,
)


def test_trunc_div_matches_spark_div_semantics():
    # Spark DIV / DuckDB // truncate toward zero; Python // floors.
    assert _trunc_div(-7, 2) == -3
    assert _trunc_div(7, -2) == -3
    assert _trunc_div(-7, -2) == 3
    assert _trunc_div(7, 2) == 3


def test_grouped_ols_recovers_exact_linear_model(spark):
    # y = 3x + 7 exactly -> slope 3e9 nanos, intercept 7e9, R^2 = 1e6.
    rows = [("g", x, 3 * x + 7) for x in range(1, 20)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = grouped_ols(df, "g", "x", "y").collect()[0]
    assert out["slope_nanos"] == 3_000_000_000
    assert out["intercept_nanos"] == 7_000_000_000
    assert out["r2_micros"] == 1_000_000


def test_grouped_ols_matches_numpy_least_squares(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    xs = rng.randint(1, 50, size=200)
    ys = (2.5 * xs + 40 + rng.randint(-30, 30, size=200)).astype(int)
    df = spark.createDataFrame(
        [("g", int(x), int(y)) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    out = grouped_ols(df, "g", "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert abs(out["slope_nanos"] / 1e9 - slope) < 1e-6
    assert abs(out["intercept_nanos"] / 1e9 - intercept) < 1e-6


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=4,
        max_size=40,
    )
)
def test_stump_beats_every_other_threshold(spark, rows):
    # The chosen split's score must equal the max over the quadratic
    # enumeration of all candidate thresholds (ties broken by lower
    # threshold).
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in decision_stump(df, "g", "x", "y").collect()}
    by_group: dict[str, list[tuple[int, int]]] = {}
    for g, x, y in rows:
        by_group.setdefault(g, []).append((x, y))
    for g, pts in by_group.items():
        levels = sorted({x for x, _ in pts})
        cands = []
        for t in levels:
            left = [y for x, y in pts if x <= t]
            right = [y for x, y in pts if x > t]
            if not right:
                continue
            n_l, n_r = len(left), len(right)
            diff = n_r * sum(left) - n_l * sum(right)
            cands.append((diff * diff / (n_l * n_r), -t))
        if not cands:
            assert g not in got
            continue
        best_score, neg_t = max(cands)
        assert got[g]["threshold"] == -neg_t
        assert got[g]["score"] == pytest.approx(best_score, rel=1e-12)


def test_ols_stats_merge_by_addition_equals_full_fit(spark):
    # Incremental contract: stats(batch1) + stats(batch2) row-added
    # per group == stats(all), hence the same derived model.
    rows = [("g", x % 7, (x * 3) % 11) for x in range(60)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    b1, b2 = df.filter(F.col("y") % 2 == 0), df.filter(F.col("y") % 2 == 1)
    merged = (
        ols_stats(b1, "g", "x", "y")
        .unionByName(ols_stats(b2, "g", "x", "y"))
        .groupBy("g")
        .agg(*[F.sum(c).alias(c) for c in ("n", "sx", "sy", "sxx", "sxy", "syy")])
    )
    got = ols_from_stats(merged, "g").collect()[0]
    want = grouped_ols(df, "g", "x", "y").collect()[0]
    assert got.asDict() == want.asDict()


def test_power_iteration_finds_planted_direction(spark):
    import numpy as np

    # Plant a dominant direction: 300 points along u plus small noise.
    rng = np.random.RandomState(3)
    dim = 16
    u = rng.randn(dim)
    u /= np.linalg.norm(u)
    pts = np.outer(rng.randn(300) * 5.0, u) + rng.randn(300, dim) * 0.1
    df = spark.createDataFrame(
        [(row.tolist(),) for row in pts.astype(float)], "embedding array<double>"
    )
    out = pca_power_iteration(df, vec_col="embedding", dim=dim, scale=10_000)
    comp = np.zeros(dim)
    for r in out.collect():
        comp[r["dim_idx"] - 1] = r["component_scaled"]
    cos = abs(comp @ u) / (np.linalg.norm(comp) * 1.0)
    assert cos > 0.99


def test_power_iteration_matches_quantized_reference(spark):
    import numpy as np

    # Bit-exact against a numpy replay of the SAME integer algorithm.
    rng = np.random.RandomState(11)
    dim = 8
    pts = rng.randn(40, dim) * 0.3
    df = spark.createDataFrame(
        [(row.tolist(),) for row in pts.astype(float)], "embedding array<double>"
    )
    scale = 10_000
    got = {
        r["dim_idx"]: r["component_scaled"]
        for r in pca_power_iteration(
            df, vec_col="embedding", dim=dim, scale=scale
        ).collect()
    }
    # numpy replay with python ints (exact), same trunc-div rescale
    q = [[int(round(v * scale)) for v in row] for row in pts]
    seed = power_seed(dim)

    def matvec(v):
        s = [sum(e * w for e, w in zip(row, v)) for row in q]
        return [sum(q[i][j] * s[i] for i in range(len(q))) for j in range(dim)]

    w1 = matvec(seed)
    den1 = max(_trunc_div(max(abs(w) for w in w1), scale), 1)
    v1 = [_trunc_div(w, den1) for w in w1]
    w2 = matvec(v1)
    den2 = max(_trunc_div(max(abs(w) for w in w2), scale), 1)
    want = {j + 1: _trunc_div(w2[j], den2) for j in range(dim)}
    assert got == want


def test_mutual_nn_is_mutual_and_one_to_one(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    planes = md5_planes(num_planes=4, dim=64)
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    out = mutual_nn_match(left, right, planes).collect()
    l_ids = [r["l_id"] for r in out]
    r_ids = [r["r_id"] for r in out]
    assert len(l_ids) == len(set(l_ids))  # one-to-one left
    assert len(r_ids) == len(set(r_ids))  # one-to-one right
    assert len(out) > 0


def test_mutual_nn_matches_in_bucket_brute_force(spark):
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.collect()
    planes = md5_planes(num_planes=4, dim=64)
    SCALE = 1e8

    def bucket(vec):
        bits = ""
        for p in planes:
            dot = sum(int(round(float(x) * y * SCALE)) for x, y in zip(vec, p))
            bits += "1" if dot >= 0 else "0"
        return bits

    def norm(vec):
        return sum(int(round(float(x) * float(x) * SCALE)) for x in vec)

    left = [(r["vec_id"], r["embedding"]) for r in rows if r["vec_id"] % 2 == 0]
    right = [(r["vec_id"], r["embedding"]) for r in rows if r["vec_id"] % 2 == 1]
    cand: dict[tuple[int, int], float] = {}
    rb: dict[str, list] = {}
    for rid, rv in right:
        rb.setdefault(bucket(rv), []).append((rid, rv))
    for lid, lv in left:
        for rid, rv in rb.get(bucket(lv), []):
            dot = sum(int(round(float(a) * float(b) * SCALE)) for a, b in zip(lv, rv))
            cand[(lid, rid)] = dot / math.sqrt(norm(lv) * norm(rv))
    best_r = {}
    best_l = {}
    for (lid, rid), cos in cand.items():
        if lid not in best_r or (-cos, rid) < best_r[lid][0]:
            best_r[lid] = ((-cos, rid), rid)
        if rid not in best_l or (-cos, lid) < best_l[rid][0]:
            best_l[rid] = ((-cos, lid), lid)
    want = {
        (lid, rid)
        for lid, (_, rid) in best_r.items()
        if best_l.get(rid, (None, None))[1] == lid
    }
    got = {
        (r["l_id"], r["r_id"])
        for r in mutual_nn_match(
            spark.createDataFrame(left, "vec_id long, embedding array<float>"),
            spark.createDataFrame(right, "vec_id long, embedding array<float>"),
            planes,
        ).collect()
    }
    assert got == want


def test_acf_constant_plus_alternating_series(spark):
    import datetime as dt

    # Counts alternate 1,3,1,3,... -> lag-1 r = -1, lag-2 r = +1.
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(30):
        for _ in range(1 if day % 2 == 0 else 3):
            rows.append((eid, base + dt.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["lag_d"]: r for r in acf_lags(df, "ts", [1, 2]).collect()}
    assert out[1]["r_nanos"] == -1_000_000_000
    assert out[2]["r_nanos"] == 1_000_000_000
    # integer pieces satisfy the Pearson identity num^2 = varx*vary at |r|=1
    for k in (1, 2):
        assert out[k]["num"] ** 2 == out[k]["varx"] * out[k]["vary"]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    coords=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 5000)),
        min_size=2,
        max_size=30,
        unique=True,
    ),
    radius=st.integers(min_value=100, max_value=900),
)
def test_grid_radius_join_matches_quadratic(spark, coords, radius):
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    df = spark.createDataFrame(pts, "pid long, px long, py long")
    got = {
        (r["id_a"], r["id_b"], r["dist2"])
        for r in grid_radius_join(df, "pid", "px", "py", radius, cell=1000).collect()
    }
    want = {
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= radius * radius
    }
    # normalize orientation: operator emits id_a < id_b
    want = {(min(a, b), max(a, b), d) for a, b, d in want}
    assert got == want


def test_grid_radius_join_rejects_cell_smaller_than_radius(spark):
    df = spark.createDataFrame([(1, 0, 0)], "pid long, px long, py long")
    with pytest.raises(ValueError):
        grid_radius_join(df, "pid", "px", "py", radius=2000, cell=1000)


def _dbscan_spec(pts, eps, min_pts):
    """Quadratic reference DBSCAN with the deterministic conventions:
    cluster label = min core id of the component; border joins its
    min-labeled core neighbor."""
    ids = [p[0] for p in pts]
    loc = {p[0]: (p[1], p[2]) for p in pts}

    def near(a, b):
        (xa, ya), (xb, yb) = loc[a], loc[b]
        return (xa - xb) ** 2 + (ya - yb) ** 2 <= eps * eps

    nbrs = {a: [b for b in ids if b != a and near(a, b)] for a in ids}
    core = {a for a in ids if len(nbrs[a]) + 1 >= min_pts}
    # components over core-core edges
    label = {a: a for a in core}

    def find(a):
        while label[a] != a:
            label[a] = label[label[a]]
            a = label[a]
        return a

    for a in core:
        for b in nbrs[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    tgt, src = min(ra, rb), max(ra, rb)
                    label[src] = tgt
    comp = {a: find(a) for a in core}
    # min id per component
    rep = {}
    for a, r in comp.items():
        rep.setdefault(r, a)
        rep[r] = min(rep[r], a)
    out = {}
    for a in core:
        out[a] = (rep[comp[a]], "core")
    for a in ids:
        if a in core:
            continue
        core_nb = [rep[comp[b]] for b in nbrs[a] if b in core]
        out[a] = (min(core_nb), "border") if core_nb else (None, "noise")
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    coords=st.lists(
        st.tuples(st.integers(0, 4000), st.integers(0, 4000)),
        min_size=3,
        max_size=25,
        unique=True,
    ),
    min_pts=st.integers(min_value=2, max_value=4),
)
def test_dbscan_matches_quadratic_spec(spark, coords, min_pts):
    from etl_processing_scd1_spark.operators.dedup import consuming
    from etl_processing_scd1_spark.operators.stats import dbscan_grid

    eps = 900
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    df = spark.createDataFrame(pts, "pid long, px long, py long")
    with consuming(
        dbscan_grid(df, "pid", "px", "py", eps=eps, min_pts=min_pts, cell=1000)
    ) as res:
        got = {r["pid"]: (r["cluster_id"], r["role"]) for r in res.collect()}
    assert got == _dbscan_spec(pts, eps, min_pts)


def test_star_contraction_on_long_path_graph(spark):
    """Diameter is the adversary: a 3000-node path has diameter 3000.
    Label propagation needs ~log2(3000)+tail rounds and measured
    non-convergence within its cap on geometric graphs; star
    contraction must finish well inside its 30-round cap and label
    every node with the path minimum."""
    from etl_processing_scd1_spark.operators.dedup import consuming
    from etl_processing_scd1_spark.operators.graph import (
        connected_components_star,
    )

    n = 3000
    nodes = spark.range(n).select(F.col("id").alias("node"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with consuming(connected_components_star(nodes, edges, id_col="node")) as cc:
        labels = {r["node"]: r["cluster_id"] for r in cc.collect()}
    assert len(labels) == n
    assert set(labels.values()) == {0}


def test_star_contraction_mixed_components_and_isolates(spark):
    from etl_processing_scd1_spark.operators.dedup import consuming
    from etl_processing_scd1_spark.operators.graph import (
        connected_components_star,
    )

    # components: {1,2,3} (triangle), {10,11} (edge), {20} isolated
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)], "id_a long, id_b long"
    )
    with consuming(connected_components_star(nodes, edges, id_col="node")) as cc:
        labels = {r["node"]: r["cluster_id"] for r in cc.collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_chi_square_terms_zero_under_exact_independence(spark):
    from etl_processing_scd1_spark.registry.statsq import QUERIES as SQ

    # planted perfectly-independent contingency: every (seg, region)
    # cell has O = r*c/n exactly -> every term_nanos == 0
    rows = []
    i = 0
    for seg in ("A", "B"):
        for reg in ("X", "Y", "Z"):
            for _ in range(10):  # uniform -> independence holds exactly
                rows.append((i, seg, reg))
                i += 1
    df = spark.createDataFrame(rows, "id long, seg string, region string")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    o = df.groupBy("seg", "region").agg(F.count(F.lit(1)).cast("long").alias("obs"))
    tot = (
        o.select(
            "seg", "region", "obs",
            F.sum("obs").over(Window.partitionBy("seg")).alias("row_tot"),
            F.sum("obs").over(Window.partitionBy("region")).alias("col_tot"),
        ).crossJoin(F.broadcast(o.agg(F.sum("obs").alias("n"))))
    )
    diff = (F.col("obs") * F.col("n") - F.col("row_tot") * F.col("col_tot")).cast("double")
    term = F.floor(
        diff * diff / (F.col("row_tot").cast("double") * F.col("col_tot").cast("double") * F.col("n").cast("double")) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    terms = [r["t"] for r in tot.select(term.alias("t")).collect()]
    assert terms and all(t == 0 for t in terms)


def test_seasonal_anomaly_rule_matches_float_zscore(spark):
    import datetime as dt
    import numpy as np

    # 8 weeks of a weekly pattern plus one planted spike
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    pattern = [2, 2, 2, 2, 2, 5, 5]
    for day in range(56):
        n = pattern[day % 7] + (30 if day == 33 else 0)
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    daily = df.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    keyed = daily.select(
        "d", "c",
        (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) % 7).cast("long").alias("dow"),
    )
    season = keyed.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    j = keyed.join(F.broadcast(season), "dow")
    resid_num = F.col("c") * F.col("cnt") - F.col("s")
    out = j.select(
        "d", "c", "dow",
        (resid_num * resid_num > 4 * (F.col("cnt") * F.col("ss") - F.col("s") * F.col("s"))).alias("is_anomaly"),
    ).collect()
    # float reference: |c - mean| > 2*sigma (population), per dow
    by_dow = {}
    for r in out:
        by_dow.setdefault(r["dow"], []).append(r["c"])
    flagged = {(r["d"], r["is_anomaly"]) for r in out}
    for r in out:
        cs = np.array(by_dow[r["dow"]], dtype=float)
        want = (r["c"] - cs.mean()) ** 2 > 4 * cs.var()
        assert (r["d"], bool(want)) in flagged
    assert sum(1 for r in out if r["is_anomaly"]) == 1  # exactly the spike


def test_item_item_topk_matches_quadratic_spec(spark):
    import math as _math

    from etl_processing_scd1_spark.registry.statsq import QUERIES as SQ

    # small basket fixture routed through the registry query's exact
    # pipeline shape: build baskets in-memory, replicate the spec in
    # python, compare (item, rank) -> neighbor
    rows = []
    baskets = {
        1: ["a", "b", "c"], 2: ["a", "b"], 3: ["a", "b", "d"],
        4: ["b", "c", "d"], 5: ["a", "c", "d"], 6: ["a", "b", "c"],
        7: ["c", "d"], 8: ["a", "d"], 9: ["b", "c"], 10: ["a", "b", "c"],
    }
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_processing_scd1_spark.operators.mining import cooccurrence_pairs

    b = spark.createDataFrame(
        [(o, it) for o, its in baskets.items() for it in its], "o long, br string"
    ).distinct()
    cnt = {r["br"]: r["c"] for r in b.groupBy("br").count().withColumnRenamed("count", "c").collect()}
    pairs = cooccurrence_pairs(b, "o", "br").filter(F.col("support") >= 3)
    sym = pairs.select(F.col("item_a").alias("i"), F.col("item_b").alias("j"), "support").unionByName(
        pairs.select(F.col("item_b").alias("i"), F.col("item_a").alias("j"), "support")
    )
    got_rows = sym.collect()
    # python spec
    from collections import Counter
    co = Counter()
    for its in baskets.values():
        s = sorted(set(its))
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                co[(s[x], s[y])] += 1
    spec_pairs = {p: c for p, c in co.items() if c >= 3}
    want_sym = {}
    for (a, bb), c in spec_pairs.items():
        want_sym[(a, bb)] = c
        want_sym[(bb, a)] = c
    assert {(r["i"], r["j"]): r["support"] for r in got_rows} == want_sym
    # ranking: cosine desc, id tiebreak
    byi = {}
    for (i, j), c in want_sym.items():
        byi.setdefault(i, []).append((-(c / _math.sqrt(cnt[i] * cnt[j])), j))
    for i, lst in byi.items():
        lst.sort()


def test_seasonal_naive_forecast_exact_on_constructed_series(spark):
    import datetime as dt

    from etl_processing_scd1_spark.registry.statsq import (
        seasonal_naive_forecast,
    )

    # perfectly weekly-periodic series -> seasonal error 0, MASE 0
    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    pattern = [3, 4, 5, 3, 4, 5, 6]
    for day in range(28):
        for _ in range(pattern[day % 7]):
            rows.append((eid, base + dt.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    from pyspark.sql import functions as F

    daily = df.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    f = a.join(
        daily.select(F.col("d").alias("db"), F.col("c").alias("forecast")),
        F.expr("da = date_add(db, 7)"),
    )
    serr = f.agg(F.sum(F.abs(F.col("ca") - F.col("forecast")))).collect()[0][0]
    assert serr == 0  # periodic -> seasonal-naive is exact
    assert f.count() == 21  # 28 days, 7-day horizon


def test_bootstrap_weights_are_poisson_like_and_deterministic(spark):
    from etl_processing_scd1_spark.registry.statsq import (
        _BOOT_T,
        bootstrap_mean_ci,
    )

    # deterministic: same session, same result twice
    a = {r["replicate"]: (r["n_eff"], r["sum_cents"])
         for r in bootstrap_mean_ci(spark, "/root/testdata/sf0.001").collect()}
    b = {r["replicate"]: (r["n_eff"], r["sum_cents"])
         for r in bootstrap_mean_ci(spark, "/root/testdata/sf0.001").collect()}
    assert a == b and len(a) == 20
    # Poisson(1) multipliers: E[n_eff] = n rows; each replicate's
    # effective size should sit near n (within 5 sigma = 5*sqrt(n))
    n = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
    import math
    for n_eff, _ in a.values():
        assert abs(n_eff - n) < 5 * math.sqrt(n) + 10
    # thresholds are the Poisson(1) CDF scaled by 16^6
    cdf, fact, acc = [], 1, 0.0
    for k in range(6):
        if k:
            fact *= k
        acc += math.exp(-1) / fact
        cdf.append(math.floor(acc * 16777216))
    assert cdf == _BOOT_T


def test_acf_degenerate_lags_emit_null_r(spark):
    """r7 advisor: constant daily counts (vary/varx = 0) or a
    single-pair lag must yield NULL r_nanos, not NaN / an ANSI cast
    error; integer pieces still come through exact."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # constant series: 2 events every day for 10 days
    rows = []
    eid = 0
    for day in range(10):
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(days=day)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["lag_d"]: r for r in acf_lags(df, "ts", [1, 9]).collect()}
    assert out[1]["varx"] == 0 and out[1]["vary"] == 0
    assert out[1]["r_nanos"] is None
    # lag 9 aligns exactly one pair: m=1 -> var = m*sxx - sx^2 = 0
    assert out[9]["m"] == 1 and out[9]["r_nanos"] is None


def test_seasonal_naive_forecast_constant_series_null_mase(spark, tmp_path):
    """r7 advisor: a constant daily series has naive_abs_err = 0 —
    MASE is undefined (0/0) and must surface as NULL, not Infinity."""
    import datetime as dt

    from etl_processing_scd1_spark.registry.statsq import (
        seasonal_naive_forecast,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (eid, base + dt.timedelta(days=day))
        for day in range(14)
        for eid in (day,)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    sf_dir = str(tmp_path / "sfdeg")
    df.select(
        F.col("event_id"),
        F.col("ts"),
        F.lit("a").alias("user_id"),
        F.lit("s").alias("state"),
    ).write.parquet(f"{sf_dir}/events.parquet")
    row = seasonal_naive_forecast(spark, sf_dir).collect()[0]
    assert row["seasonal_abs_err"] == 0
    assert row["naive_abs_err"] == 0
    assert row["mase_micros"] is None


def test_exact_quantiles_matches_python_sort(spark):
    """Histogram refinement vs a literal sort, including duplicates,
    negatives (vmin shift) and every-bucket edge ranks."""
    import random

    from etl_processing_scd1_spark.operators.stats import exact_quantiles

    rng = random.Random(7)
    vals = [rng.randint(-50_000, 50_000) for _ in range(5_000)]
    vals += [vals[0]] * 40  # heavy duplicate block
    df = spark.createDataFrame([(v,) for v in vals], "x long").repartition(8)
    probs = [1, 2500, 5000, 7500, 9900, 10000]
    got = {
        r["prob_bp"]: (r["rank"], r["value"])
        for r in exact_quantiles(df, "x", probs, bucket_width=512).collect()
    }
    s = sorted(vals)
    n = len(s)
    for bp in probs:
        k = (n - 1) * bp // 10000 + 1
        assert got[bp] == (k, s[k - 1]), bp


def test_exact_quantiles_single_row_and_empty(spark):
    from etl_processing_scd1_spark.operators.stats import exact_quantiles

    one = spark.createDataFrame([(42,)], "x long")
    out = exact_quantiles(one, "x", [5000]).collect()
    assert [(r["rank"], r["value"]) for r in out] == [(1, 42)]
    empty = spark.createDataFrame([], "x long")
    assert exact_quantiles(empty, "x", [5000]).count() == 0


def test_heavy_hitters_screen_path_on_zipf(spark):
    """Planted Zipf skew: the candidate screen must prove exactness
    (take the screen path) and agree with the full aggregation."""
    from etl_processing_scd1_spark.operators.stats import heavy_hitters_topk

    rows = []
    for key in range(50):
        rows += [(key,)] * (2000 // (key + 1))  # Zipf-ish head
    rows += [(1000 + i,) for i in range(500)]   # long singleton tail
    df = spark.createDataFrame(rows, "k long").repartition(8)
    out = heavy_hitters_topk(df, "k", k=5)
    assert out._spark_graft_hh_path == "screen"
    got = [(r["key"], r["cnt"]) for r in out.collect()]
    want = [
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("k"))
        .limit(5)
        .collect()
    ]
    assert got == want
    assert got[0] == (0, 2000)


def test_heavy_hitters_fallback_on_uniform(spark):
    """Near-uniform counts defeat the screen's proof — the fallback
    must engage and still return the exact deterministic top-k."""
    from etl_processing_scd1_spark.operators.stats import heavy_hitters_topk

    rows = [(i % 400,) for i in range(4000)]  # all keys count 10
    df = spark.createDataFrame(rows, "k long").repartition(8)
    out = heavy_hitters_topk(df, "k", k=5, candidates_per_partition=10)
    assert out._spark_graft_hh_path == "fallback"
    got = [(r["key"], r["cnt"]) for r in out.collect()]
    assert got == [(i, 10) for i in range(5)]  # key-asc tiebreak


def test_heavy_hitters_screen_and_fallback_agree(spark):
    """Both branches must be interchangeable on the SAME data: force
    the fallback (tiny candidate budget) and the screen (generous
    budget) on a skewed corpus and compare row-for-row."""
    from etl_processing_scd1_spark.operators.stats import heavy_hitters_topk

    rows = []
    for key in range(30):
        rows += [(key,)] * (600 // (key + 1))
    df = spark.createDataFrame(rows, "k long").repartition(4)
    wide = heavy_hitters_topk(df, "k", k=4, candidates_per_partition=64)
    narrow = heavy_hitters_topk(df, "k", k=4, candidates_per_partition=2)
    assert wide._spark_graft_hh_path == "screen"
    assert narrow._spark_graft_hh_path == "fallback"
    assert [tuple(r) for r in wide.collect()] == [
        tuple(r) for r in narrow.collect()
    ]


def test_heavy_hitters_null_key_in_screen_and_fallback(spark):
    """A frequent NULL key must survive the screen path (value_counts
    would silently drop it; the semi-join recount would drop it again)
    and match the fallback exactly — both branches count NULL as a
    key, like groupBy does."""
    from etl_processing_scd1_spark.operators.stats import heavy_hitters_topk

    rows = [(None,)] * 900                     # dominant null key
    for key in range(40):
        rows += [(key,)] * (400 // (key + 1))
    rows += [(2000 + i,) for i in range(300)]  # singleton tail
    df = spark.createDataFrame(rows, "k long").repartition(8)

    wide = heavy_hitters_topk(df, "k", k=3, candidates_per_partition=64)
    narrow = heavy_hitters_topk(df, "k", k=3, candidates_per_partition=2)
    assert wide._spark_graft_hh_path == "screen"
    assert narrow._spark_graft_hh_path == "fallback"
    got_wide = [(r["key"], r["cnt"]) for r in wide.collect()]
    got_narrow = [(r["key"], r["cnt"]) for r in narrow.collect()]
    assert got_wide == got_narrow
    assert got_wide[0] == (None, 900)

    # string keys with nulls take the same paths
    srows = [(None,)] * 50 + [("a",)] * 30 + [("b",)] * 20 + \
        [(f"t{i}",) for i in range(40)]
    sdf = spark.createDataFrame(srows, "k string").repartition(4)
    out = heavy_hitters_topk(sdf, "k", k=2, candidates_per_partition=64)
    assert [(r["key"], r["cnt"]) for r in out.collect()] == \
        [(None, 50), ("a", 30)]
