"""Property tests for the late round-6 additions (ML eval trio,
moments, Spearman, OHLC, feature hashing): numpy/python brute force
independent of both engines."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF0001


def _scored():
    t = pq.read_table(f"{SF0001}/embeddings.parquet")
    emb = t.column("embedding").to_pylist()
    lab = t.column("label").to_numpy()
    # embedding is array<float>: Spark's round(float, 6) STAYS float32
    # (and DuckDB's round on REAL matches), so the engine-visible score
    # is the float32 nearest to the 6-dp decimal — mirror that here
    s = np.round([e[0] for e in emb], 6).astype(np.float32).astype(np.float64)
    y = (lab < 5).astype(int)
    return s, y


def test_auc_matches_bruteforce_pairs(spark, registry):
    s, y = _scored()
    r = registry["ml_auc_roc"].fn(spark, SF0001).collect()[0]
    pos, neg = s[y == 1], s[y == 0]
    # O(P*N) pair count — the definition the collapsed-axis formula
    # must reproduce exactly
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert abs(r["auc"] - round(auc, 6)) <= 1e-6


def test_stump_is_argmin_over_all_thresholds(spark, registry):
    s, y = _scored()
    r = registry["ml_decision_stump"].fn(spark, SF0001).collect()[0]
    nt, post = len(s), int(y.sum())

    def wgini(thr):
        left = s <= thr
        n_l, pos_l = int(left.sum()), int(y[left].sum())
        n_r, pos_r = nt - n_l, post - pos_l

        def g(n, p):
            if n == 0:
                return 0.0
            q = p / n
            return 1 - q * q - (1 - q) * (1 - q)

        return round(n_l / nt * g(n_l, pos_l) + n_r / nt * g(n_r, pos_r), 6)

    best = min((wgini(t), t) for t in np.unique(s))
    assert (r["wgini"], r["thr"]) == best
    left = s <= r["thr"]
    assert r["n_left"] == int(left.sum()) and r["n_right"] == int((~left).sum())


def test_calibration_bins_partition_and_rates(spark, registry):
    s, y = _scored()
    rows = registry["ml_calibration_bins"].fn(spark, SF0001).collect()
    assert sum(r["n"] for r in rows) == len(s)
    for r in rows:
        b = r["bin"]
        m = np.minimum(9, np.maximum(0, np.floor((s + 0.5) * 10))).astype(int) == b
        assert r["n"] == int(m.sum())
        assert abs(r["pos_rate"] - round(float(y[m].mean()), 6)) <= 1e-6
        assert abs(r["mean_score"] - round(float(s[m].mean()), 6)) <= 1e-6


def test_moments_match_numpy(spark, registry):
    li = pq.read_table(f"{SF0001}/lineitem.parquet")
    q = li.column("l_quantity").to_numpy()
    flag = np.array(li.column("l_returnflag").to_pylist())
    for r in registry["agg_moments"].fn(spark, SF0001).collect():
        x = q[flag == r["grp"]]
        m2 = x.var()  # population variance, matching the s2/n - mean² form
        skew = ((x - x.mean()) ** 3).mean() / m2**1.5
        kurt = ((x - x.mean()) ** 4).mean() / m2**2 - 3
        assert r["n"] == len(x)
        assert abs(r["mean"] - x.mean()) <= 1e-5
        assert abs(r["m2"] - m2) <= 1e-4
        assert abs(r["skew"] - skew) <= 1e-4
        assert abs(r["ex_kurtosis"] - kurt) <= 1e-4


def test_spearman_matches_numpy(spark, registry):
    li = pq.read_table(f"{SF0001}/lineitem.parquet")
    qty = li.column("l_quantity").to_numpy()
    price = li.column("l_extendedprice").to_numpy()
    flag = np.array(li.column("l_returnflag").to_pylist())

    def frank(x):
        # average ranks with ties (1-based)
        order = np.argsort(x, kind="stable")
        ranks = np.empty(len(x))
        sx = x[order]
        i = 0
        while i < len(sx):
            j = i
            while j < len(sx) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    for r in registry["corr_spearman"].fn(spark, SF0001).collect():
        m = flag == r["grp"]
        r1, r2 = frank(qty[m]), frank(price[m])
        rho = np.corrcoef(r1, r2)[0, 1]
        assert r["n"] == int(m.sum())
        assert abs(r["spearman_rho"] - rho) <= 1e-5


def test_ohlc_matches_python(spark, registry):
    ev = pq.read_table(f"{SF0001}/events.parquet")
    tsec = ev.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64)
    eid = ev.column("event_id").to_numpy()
    etype = np.array(ev.column("event_type").to_pylist())
    val = np.round(ev.column("value").to_numpy(), 4)
    got = {
        (r["event_type"], r["hour_bkt"]): r
        for r in registry["ts_ohlc"].fn(spark, SF0001).collect()
    }
    groups: dict[tuple, list[int]] = {}
    for i in range(len(eid)):
        groups.setdefault((etype[i], tsec[i] // 3600), []).append(i)
    assert set(got) == set(groups)
    for key, idxs in groups.items():
        idxs = sorted(idxs, key=lambda i: (tsec[i], eid[i]))
        r = got[key]
        assert r["n_ticks"] == len(idxs)
        assert abs(r["open"] - val[idxs[0]]) <= 1e-9
        assert abs(r["close"] - val[idxs[-1]]) <= 1e-9
        assert abs(r["high"] - max(val[i] for i in idxs)) <= 1e-9
        assert abs(r["low"] - min(val[i] for i in idxs)) <= 1e-9


def test_feature_hashing_matches_python(spark, registry):
    docs = pq.read_table(f"{SF0001}/documents.parquet")
    texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    got: dict[tuple, int] = {}
    for r in registry["feature_hashing"].fn(spark, SF0001).collect():
        got[(r["doc_id"], r["feat"])] = r["n"]
    expect: dict[tuple, int] = {}
    for d, txt in texts.items():
        for w in txt.split(" "):
            if not w:
                continue
            f = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 64
            expect[(d, f)] = expect.get((d, f), 0) + 1
    assert got == expect


def test_rolling_median_is_true_median(spark, registry):
    ev = pq.read_table(f"{SF0001}/events.parquet")
    tsec = ev.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64)
    eid = ev.column("event_id").to_numpy()
    uid = ev.column("user_id").to_numpy()
    val = np.round(ev.column("value").to_numpy(), 4)
    got = {
        r["event_id"]: r["med10"]
        for r in registry["win_rolling_median"].fn(spark, SF0001).collect()
    }
    for u in np.unique(uid):
        m = uid == u
        order = np.lexsort((eid[m], tsec[m]))
        vs, ids = val[m][order], eid[m][order]
        for i in range(len(vs)):
            frame = vs[max(0, i - 9) : i + 1]
            med = float(np.median(frame))  # numpy = linear interpolation
            assert abs(got[int(ids[i])] - round(med, 4)) <= 1e-4, int(ids[i])


def test_linreg_matches_numpy_lstsq(spark, registry):
    t = pq.read_table(f"{SF0001}/embeddings.parquet")
    emb = t.column("embedding").to_pylist()
    x1 = np.round(np.array([e[0] for e in emb], dtype=np.float64), 6)
    x2 = np.round(np.array([e[1] for e in emb], dtype=np.float64), 6)
    y = np.round(np.array([e[3] for e in emb], dtype=np.float64), 6)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()
    r = registry["ml_linreg_normal"].fn(spark, SF0001).collect()[0]
    assert abs(r["beta0"] - beta[0]) <= 1e-5
    assert abs(r["beta1"] - beta[1]) <= 1e-5
    assert abs(r["beta2"] - beta[2]) <= 1e-5
    assert abs(r["r2"] - r2) <= 1e-5


def test_xcorr_matches_numpy(spark, registry):
    ev = pq.read_table(f"{SF0001}/events.parquet")
    tsec = ev.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64)
    etype = np.array(ev.column("event_type").to_pylist())
    m = np.isin(etype, ["click", "purchase"])
    h = tsec[m] // 3600
    et = etype[m]
    h0, h1 = h.min(), h.max()
    spine = np.arange(h0, h1 + 1)
    a = np.array([(h[et == "click"] == hh).sum() for hh in spine], dtype=float)
    b = np.array([(h[et == "purchase"] == hh).sum() for hh in spine], dtype=float)
    rows = {r["lag"]: r for r in registry["ts_cross_correlation"].fn(spark, SF0001).collect()}
    for lag in (0, 1, 2):
        aa = a[: len(a) - lag] if lag else a
        bb = b[lag:]
        rho = np.corrcoef(aa, bb)[0, 1]
        assert rows[lag]["n_hours"] == len(aa)
        assert abs(rows[lag]["xcorr"] - rho) <= 1e-5, lag


def test_release_gate_matches_python(spark, registry):
    docs = pq.read_table(f"{SF0001}/documents.parquet")
    ids = docs.column("doc_id").to_pylist()
    lang = docs.column("lang").to_pylist()
    src = docs.column("source").to_pylist()
    nch = docs.column("n_chars").to_pylist()
    txt = docs.column("text").to_pylist()
    ka: dict[tuple, int] = {}
    ld: dict[tuple, set] = {}
    for i in range(len(ids)):
        ka[(lang[i], src[i], nch[i] // 100)] = ka.get((lang[i], src[i], nch[i] // 100), 0) + 1
        ld.setdefault((lang[i], nch[i] // 200), set()).add(src[i])
    got = {r["doc_id"]: r for r in registry["pipeline_release_gate"].fn(spark, SF0001).collect()}
    assert set(got) == set(ids)
    for i, d in enumerate(ids):
        kn = ka[(lang[i], src[i], nch[i] // 100)]
        ldiv = len(ld[(lang[i], nch[i] // 200)])
        flags = (1 if kn < 5 else 0) + (2 if ldiv < 3 else 0) + (4 if "customer" in txt[i] else 0)
        r = got[d]
        assert (r["reject_flags"], r["keep"], r["k_class_size"], r["l_diversity"]) == (
            flags, 1 if flags == 0 else 0, kn, ldiv), d


def test_cogrouped_attribution_matches_python(spark, registry):
    ev = pq.read_table(f"{SF0001}/events.parquet")
    tsec = ev.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64)
    uid = ev.column("user_id").to_numpy()
    et = np.array(ev.column("event_type").to_pylist())
    got = {r["user_id"]: r for r in registry["udf_cogrouped_map"].fn(spark, SF0001).collect()}
    users = set()
    for u in np.unique(uid):
        pu = tsec[(uid == u) & (et == "purchase")]
        if len(pu) == 0:
            continue
        users.add(int(u))
        cl = np.sort(tsec[(uid == u) & (et == "click")])
        assisted = sum(
            bool(((cl <= p) & (cl > p - 3600)).any()) for p in pu
        )
        r = got[int(u)]
        assert r["n_purchases"] == len(pu) and r["n_click_assisted"] == assisted, u
    assert set(got) == users
