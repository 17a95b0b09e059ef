"""Round-11 analytics set: UNPIVOT, interval range frames, transitive
closure, skyline, association rules, CUSUM drift. The oracle sweep
(tools/check_oracle.py) is the hash gate; these tests pin the semantic
invariants the hash alone doesn't explain — and the skyline test proves
the O(n log n) prefix-max reformulation equals the textbook quadratic
NOT EXISTS definition (the oracle uses the fast form for sf1 sweep
tractability, so the cross-check lives here)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_unpivot_melt_is_3x_and_reconciles(spark):
    out = {(r["l_returnflag"], r["charge"]): r
           for r in em.queries()["unpivot"](spark, SF).collect()}
    flags = {k[0] for k in out}
    # every flag carries all three charge rows, each with the same n
    for f in flags:
        ns = {out[(f, c)]["n"] for c in
              ("base_price", "discount_amt", "tax_amt")}
        assert len(ns) == 1
        # base price dominates its own discount and tax components
        assert (out[(f, "base_price")]["total_amount"]
                > out[(f, "discount_amt")]["total_amount"])
        assert (out[(f, "base_price")]["total_amount"]
                > out[(f, "tax_amt")]["total_amount"])


def test_rolling_interval_window_bounds(spark):
    rows = em.queries()["rolling_interval_window"](spark, SF).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    checked = 0
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: (r["day"], r["o_orderkey"]))
        for i, r in enumerate(rs):
            in_frame = [x for x in rs if r["day"] - 89 <= x["day"]
                        <= r["day"]]
            assert r["n_orders_90d"] == len(in_frame)
            checked += 1
    assert checked == len(rows) > 0


def test_graph_reachability_closure_properties(spark):
    dist = {(r["src"], r["dst"]): r["min_hops"]
            for r in em.queries()["graph_reachability"](spark, SF)
            .collect()}
    assert dist, "state graph should not be empty at sf0.001"
    direct = {k for k, h in dist.items() if h == 1}
    # triangle inequality via composition: a 1-hop edge out of any
    # reachable dst extends reachability by at most one hop
    for (a, b), h in dist.items():
        for (c, d) in direct:
            if c == b and a != d:
                assert dist.get((a, d), 10) <= h + 1
    # multi-hop pairs are genuinely indirect: no multi-hop pair that is
    # also a direct edge (min() would have kept 1)
    assert all(h == 1 for (k, h) in dist.items() if k in direct)


def test_pareto_window_form_equals_not_exists():
    """The oracle's prefix-max skyline == the quadratic dominance
    definition, on the real small fixture via DuckDB."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{SF}/part.parquet')")
    naive = con.execute(
        "SELECT p_partkey FROM part a WHERE NOT EXISTS ("
        "SELECT 1 FROM part b WHERE b.p_retailprice <= a.p_retailprice "
        "AND b.p_size >= a.p_size AND (b.p_retailprice < a.p_retailprice "
        "OR b.p_size > a.p_size)) ORDER BY 1").fetchall()
    fast = con.execute(
        em.oracle_sql()["pareto_frontier"]
        + " ORDER BY p_partkey").fetchall()
    assert [r[0] for r in naive] == [r[0] for r in fast]
    assert naive, "frontier should be non-empty"


def test_pareto_frontier_is_undominated(spark):
    sky = em.queries()["pareto_frontier"](spark, SF).collect()
    assert sky
    pts = [(r["p_retailprice"], r["p_size"]) for r in sky]
    for (pa, sa) in pts:
        for (pb, sb) in pts:
            dominated = (pb <= pa and sb >= sa
                         and (pb < pa or sb > sa))
            assert not dominated


def test_assoc_rules_identities(spark):
    rows = em.queries()["assoc_rules"](spark, SF).collect()
    assert rows
    for r in rows:
        # symmetry of the joint: n_both(a,b) == n_both(b,a)
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1
        assert r["lift"] > 0
    joint = {(r["antecedent"], r["consequent"]): r["n_both"]
             for r in rows}
    for (a, b), n in joint.items():
        assert joint[(b, a)] == n


def test_pagerank_is_a_distribution_up_to_floor_loss(spark):
    rows = em.queries()["pagerank_states"](spark, SF).collect()
    assert rows
    total = sum(r["rank_micro"] for r in rows)
    # floor divisions and dangling leakage only ever LOSE micro units:
    # the mass stays in (0.5, 1.0] of the initial 1e6
    assert 500_000 < total <= 1_000_000
    assert all(r["rank_micro"] > 0 for r in rows)


def test_pagerank_matches_pure_python_model(spark):
    """Independent re-implementation of the integer-micro fixpoint from
    the same edge set — pins the Spark loop against a dict model."""
    edges = [(r["src"], r["dst"]) for r in
             em._transition_edges(spark, SF).collect()]
    nodes = sorted({n for e in edges for n in e})
    nn = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = {n: 1_000_000 // nn for n in nodes}
    for _ in range(10):
        contrib = {n: 0 for n in nodes}
        for s, ds in out.items():
            share = r[s] // len(ds)
            for d in ds:
                contrib[d] += share
        r = {n: 150_000 // nn + (85 * contrib[n]) // 100 for n in nodes}
    got = {row["node"]: row["rank_micro"] for row in
           em.queries()["pagerank_states"](spark, SF).collect()}
    assert got == r


def test_gini_bounds_and_uniform_zero(spark):
    rows = em.queries()["gini_activity"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["gini"] < 1
        assert r["n_users"] > 0 and r["total_events"] >= r["n_users"]


def test_ks_drift_bounds(spark):
    [r] = em.queries()["ks_drift"](spark, SF).collect()
    assert 0 <= r["ks_stat"] <= 1
    assert r["n_view"] > 0 and r["n_purchase"] > 0


def test_wow_growth_reconstructs(spark):
    rows = sorted(em.queries()["wow_growth"](spark, SF).collect(),
                  key=lambda r: r["week"])
    assert rows
    assert rows[0]["wow_pct"] is None  # no predecessor week
    for i, r in enumerate(rows[1:], start=1):
        prev = rows[i - 1]["n"]
        assert math.isclose(r["wow_pct"],
                            round((r["n"] - prev) * 100.0 / prev, 4),
                            abs_tol=1e-9)
        lo = max(0, i - 3)
        window = [x["n"] for x in rows[lo:i + 1]]
        assert math.isclose(r["ma_4w"],
                            round(sum(window) / len(window), 4),
                            abs_tol=1e-9)


def test_ks_matrix_covers_all_pairs_and_is_bounded(spark):
    rows = em.queries()["ks_matrix"](spark, SF).collect()
    srcs = {r["source"] for r in
            em._load(spark, SF, "documents").select("source")
            .distinct().collect()}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["ks_stat"] <= 1


def test_target_encoding_shrinks_toward_global_mean(spark):
    rows = em.queries()["target_encoding"](spark, SF).collect()
    assert rows
    naive = {}
    ev = em._load(spark, SF, "events").collect()
    tot, cnt = 0.0, 0
    for e in ev:
        naive.setdefault(e["event_type"], []).append(e["value"])
        tot += e["value"]
        cnt += 1
    gmean = tot / cnt
    for r in rows:
        vals = naive[r["event_type"]]
        cat_mean = sum(vals) / len(vals)
        # smoothed encoding lies between the category mean and the
        # global mean (shrinkage direction)
        lo, hi = sorted((cat_mean, gmean))
        assert lo - 1e-6 <= r["te"] <= hi + 1e-6


def test_chi2_statistic_reconstructs(spark):
    [r] = em.queries()["chi2_source_lang"](spark, SF).collect()
    docs = em._load(spark, SF, "documents").select("source",
                                                   "lang").collect()
    from collections import Counter
    cells = Counter((d["source"], d["lang"]) for d in docs)
    rt = Counter(d["source"] for d in docs)
    ct = Counter(d["lang"] for d in docs)
    n = len(docs)
    chi2_micro = 0
    for (s, l), o in cells.items():
        e = rt[s] * ct[l] / n
        chi2_micro += round((o - e) * (o - e) / e * 1e6)
    assert r["chi2_micro"] == chi2_micro
    assert r["n_cells"] == len(cells)
    assert r["dof"] == (len(rt) - 1) * (len(ct) - 1)


def test_quantile_normalize_invariants(spark):
    rows = em.queries()["quantile_normalize"](spark, SF).collect()
    doc = em._load(spark, SF, "documents").select("doc_id", "source",
                                                  "n_chars").collect()
    assert len(rows) == len(doc)
    gvals = sorted(d["n_chars"] for d in doc)
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
        # normalized values come from the global value set and range
        assert gvals[0] <= r["norm_chars"] <= gvals[-1]
    for rs in by_src.values():
        rs.sort(key=lambda r: r["n_chars"])
        # monotone: a longer doc never normalizes below a shorter one
        for a, b in zip(rs, rs[1:]):
            assert a["norm_chars"] <= b["norm_chars"]
    # the top-ranked doc of every source maps to the global maximum
    for rs in by_src.values():
        assert rs[-1]["norm_chars"] == gvals[-1]


def test_mutual_information_nonnegative_and_bounded(spark):
    [r] = em.queries()["mutual_information"](spark, SF).collect()
    # MI >= 0 (up to per-cell micro rounding) and <= min(H(S), H(L))
    # <= log2(min(|sources|, |langs|)) bits
    import math as m
    doc = em._load(spark, SF, "documents").select("source",
                                                  "lang").collect()
    n_src = len({d["source"] for d in doc})
    n_lang = len({d["lang"] for d in doc})
    bound = m.log2(min(n_src, n_lang)) * 1e6
    assert -r["n_cells"] <= r["mi_micro_bits"] <= bound + r["n_cells"]


def test_entropy_rate_bounded_by_log_states(spark):
    [r] = em.queries()["entropy_rate"](spark, SF).collect()
    import math as m
    assert 0 <= r["entropy_rate_micro_bits"] \
        <= m.log2(r["n_states"] + 1) * 1e6 + r["n_states"] ** 2
    assert r["n_transitions"] > 0


def test_benford_shares_sum_to_one(spark):
    rows = em.queries()["benford_deviation"](spark, SF).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    # observed shares sum to 1e6 micro up to per-digit rounding
    assert abs(sum(r["obs_micro"] for r in rows) - 1_000_000) \
        <= len(rows)
    # the Benford column is the fixed expectation, independent of data
    import math as m
    for r in rows:
        assert r["benford_micro"] == round(
            m.log10(1.0 + 1.0 / r["digit"]) * 1e6)


def test_ewma_reconstructs_from_daily_counts(spark):
    rows = sorted(em.queries()["ewma_volume"](spark, SF).collect(),
                  key=lambda r: r["day"])
    daily = {r["day"]: r["n"] for r in rows}
    for r in rows:
        num = den = 0.0
        for d, n in daily.items():
            k = r["day"] - d
            if 0 <= k <= 20:
                num += n / (1 << k)
                den += 1.0 / (1 << k)
        assert math.isclose(r["ewma"], round(num / den, 4), abs_tol=1e-9)
    # a flat-ish series keeps the EWMA near the daily counts
    assert rows


def test_rfm_segments_partition_customers(spark):
    rows = em.queries()["rfm_segments"](spark, SF).collect()
    n_cust = em._load(spark, SF, "orders").select("o_custkey") \
        .distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        s = r["segment"]
        assert 111 <= s <= 444
        assert all(1 <= int(c) <= 4 for c in str(s))


def test_histogram2d_reconciles_totals(spark):
    rows = em.queries()["histogram2d"](spark, SF).collect()
    o = em._load(spark, SF, "orders")
    assert sum(r["n"] for r in rows) == o.count()
    from decimal import Decimal
    tot = sum(Decimal(str(round(x["o_totalprice"], 2)))
              for x in o.select("o_totalprice").collect())
    assert math.isclose(sum(r["revenue"] for r in rows), float(tot),
                        rel_tol=1e-9)
    for r in rows:
        assert 1 <= r["month"] <= 12 and r["price_band"] >= 0


def test_decile_lift_partitions_and_signals(spark):
    rows = sorted(em.queries()["decile_lift"](spark, SF).collect(),
                  key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    doc = em._load(spark, SF, "documents")
    assert sum(r["n"] for r in rows) == doc.count()
    n_en = doc.where("lang = 'en'").count()
    assert sum(r["n_target"] for r in rows) == n_en
    # the DSIR ranking must concentrate the target: top decile beats
    # the bottom decile's rate, and average lift is 1 by construction
    assert rows[0]["target_rate"] >= rows[-1]["target_rate"]
    wavg = sum(r["lift"] * r["n"] for r in rows) / sum(r["n"]
                                                       for r in rows)
    assert math.isclose(wavg, 1.0, abs_tol=0.01)


def test_mann_whitney_u_identity(spark):
    [r] = em.queries()["mann_whitney"](spark, SF).collect()
    # U_a + U_b == n_a * n_b (exact, ranks are dyadic halves)
    assert r["u_view"] + r["u_purchase"] \
        == r["n_view"] * r["n_purchase"]
    assert 0 <= r["u_view"] <= r["n_view"] * r["n_purchase"]


def test_ab_ztest_reconstructs(spark):
    [r] = em.queries()["ab_ztest"](spark, SF).collect()
    assert r["n_a"] > 0 and r["n_b"] > 0
    p_a, p_b = r["conv_a"] / r["n_a"], r["conv_b"] / r["n_b"]
    pool = (r["conv_a"] + r["conv_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(pool * (1 - pool) * (1 / r["n_a"] + 1 / r["n_b"]))
    assert math.isclose(r["z_score"], round((p_a - p_b) / se, 4),
                        abs_tol=1e-9)
    assert math.isclose(r["rate_a"], round(p_a, 4), abs_tol=1e-9)


def test_weekday_seasonality_profile(spark):
    rows = em.queries()["weekday_seasonality"](spark, SF).collect()
    assert {r["weekday"] for r in rows} <= set(range(7))
    # seasonal indices are positive and day-weighted-average to ~1
    dd = sum(r["n_days"] for r in rows)
    wavg = sum(r["seasonal_index"] * r["n_days"] for r in rows) / dd
    assert all(r["seasonal_index"] > 0 for r in rows)
    assert math.isclose(wavg, 1.0, rel_tol=0.02)


def test_cusum_ends_near_zero(spark):
    rows = sorted(em.queries()["cusum_drift"](spark, SF).collect(),
                  key=lambda r: r["day"])
    assert rows
    # by construction sum(n) - n_days * mean == 0: the last cusum value
    # is 0 up to the 1e-4 rounding the entry applies
    assert math.isclose(rows[-1]["cusum"], 0.0, abs_tol=0.01)
    # and the running sums are monotone consistent: cusum_k - cusum_{k-1}
    # == n_k - mean, so reconstructed mean is constant across steps
    if len(rows) >= 3:
        means = [rows[i]["n"] - (rows[i]["cusum"] - rows[i - 1]["cusum"])
                 for i in range(1, len(rows))]
        assert max(means) - min(means) < 0.01
