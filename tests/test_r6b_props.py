"""Property tests for the round-6 continuation operators (TPC-H
widening, gap repair, DQ firewall, shard shuffle, boilerplate strip,
grid-local NN): each re-derives the operator's guarantee from the raw
parquet with numpy/python brute force — independent of BOTH engines,
so a bug shared by the Spark plan and its DuckDB oracle twin still
gets caught here."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq

from tests.conftest import SF0001

GRID64 = "fixtures/grid/grid64.parquet"


def _events():
    t = pq.read_table(f"{SF0001}/events.parquet")
    return {
        "event_id": t.column("event_id").to_numpy(),
        "tsec": t.column("ts").to_numpy().astype("datetime64[s]").astype(np.int64),
        "user_id": t.column("user_id").to_numpy(),
        "value": t.column("value").to_numpy(),
    }


def test_interpolate_linear_matches_python(spark, registry):
    # sequential per-user replication of the bracketing + line formula
    ev = _events()
    got = {
        r["event_id"]: r["interp"]
        for r in registry["ts_interpolate_linear"].fn(spark, SF0001).collect()
    }
    order = np.lexsort((ev["event_id"], ev["tsec"], ev["user_id"]))
    by_user: dict[int, list[tuple[int, int, float | None]]] = {}
    for i in order:
        u = int(ev["user_id"][i])
        eid = int(ev["event_id"][i])
        obs = round(float(ev["value"][i]), 4) if eid % 7 == 0 else None
        by_user.setdefault(u, []).append((int(ev["tsec"][i]), eid, obs))
    n_checked = 0
    for rows in by_user.values():
        obs_idx = [k for k, r in enumerate(rows) if r[2] is not None]
        for k, (tsec, eid, obs) in enumerate(rows):
            if obs is not None:
                expect = obs
            else:
                prev = max((j for j in obs_idx if j < k), default=None)
                nxt = min((j for j in obs_idx if j > k), default=None)
                if prev is None and nxt is None:
                    expect = None
                elif prev is None:
                    expect = rows[nxt][2]
                elif nxt is None:
                    expect = rows[prev][2]
                else:
                    pt, _, pv = rows[prev]
                    nt, _, nv = rows[nxt]
                    if nt == pt:
                        expect = None  # nullif-guarded degenerate case
                    else:
                        expect = pv + (nv - pv) * (tsec - pt) / (nt - pt)
            gotv = got[eid]
            if expect is None:
                assert gotv is None, (eid, gotv)
            else:
                assert gotv is not None and abs(gotv - round(expect, 4)) <= 1e-4, (
                    eid,
                    gotv,
                    expect,
                )
            n_checked += 1
    assert n_checked == len(got)


def test_interpolation_within_bracket_range(spark, registry):
    # a linear interpolant never over/undershoots its brackets: every
    # interior interpolated value lies within [min, max] of the user's
    # observed values
    rows = registry["ts_interpolate_linear"].fn(spark, SF0001).collect()
    by_user: dict[int, list] = {}
    ev = _events()
    uid_of = {int(e): int(u) for e, u in zip(ev["event_id"], ev["user_id"])}
    for r in rows:
        by_user.setdefault(uid_of[r["event_id"]], []).append(r)
    for u, rs in by_user.items():
        obs = [r["obs"] for r in rs if r["obs"] is not None]
        if not obs:
            continue
        lo, hi = min(obs), max(obs)
        for r in rs:
            if r["interp"] is not None:
                assert lo - 1e-4 <= r["interp"] <= hi + 1e-4, (u, r)


def test_shuffle_shards_is_deterministic_permutation(spark, registry):
    out1 = registry["shuffle_shards"].fn(spark, SF0001).collect()
    out2 = registry["shuffle_shards"].fn(spark, SF0001).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # reproducible
    docs = pq.read_table(f"{SF0001}/documents.parquet").column("doc_id").to_pylist()
    assert sorted(r["doc_id"] for r in out1) == sorted(docs)  # partition, no loss
    by_shard: dict[int, list[int]] = {}
    for r in out1:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
        # shard formula replicated from raw md5
        h = hashlib.md5(f"shard#{r['doc_id']}".encode()).hexdigest()
        assert (int(h[:15], 16) % 16) == r["shard"], r
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard  # dense 1..n


def test_dq_expectations_matches_pyarrow_bruteforce(spark, registry):
    got = {
        r["rule"]: (r["violations"], r["n_checked"])
        for r in registry["dq_expectations"].fn(spark, SF0001).collect()
    }
    o = pq.read_table(f"{SF0001}/orders.parquet")
    price = o.column("o_totalprice").to_numpy()
    custkey = o.column("o_custkey").to_numpy(zero_copy_only=False)
    dates = o.column("o_orderdate").to_numpy().astype("datetime64[D]")
    status = np.array(o.column("o_orderstatus").to_pylist())
    okey = o.column("o_orderkey").to_numpy()
    n = len(price)
    ckeys = set(
        pq.read_table(f"{SF0001}/customer.parquet").column("c_custkey").to_pylist()
    )
    lo, hi = np.datetime64("1995-01-01"), np.datetime64("2002-01-01")
    expect = {
        "nonpositive_price": int((price <= 0).sum()),
        "null_custkey": int(sum(c is None for c in o.column("o_custkey").to_pylist())),
        "date_out_of_range": int(((dates < lo) | (dates >= hi)).sum()),
        "bad_status": int((~np.isin(status, ["F", "O", "P"])).sum()),
        "orphan_custkey": int(sum(int(c) not in ckeys for c in custkey)),
        "duplicate_orderkey": int(n - len(set(okey.tolist()))),
    }
    assert set(got) == set(expect)
    for rule, v in expect.items():
        assert got[rule] == (v, n), (rule, got[rule], v)


def test_boilerplate_matches_python(spark, registry):
    docs = pq.read_table(f"{SF0001}/documents.parquet")
    texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    srcs = dict(zip(docs.column("doc_id").to_pylist(), docs.column("source").to_pylist()))

    def chunks(txt):
        w = txt.split(" ")
        return [" ".join(w[i * 5 : i * 5 + 5]) for i in range(math.ceil(len(w) / 5))]

    df: dict[tuple[str, str], set[int]] = {}
    for d, txt in texts.items():
        for c in chunks(txt):
            df.setdefault((srcs[d], c), set()).add(d)
    rows = registry["text_boilerplate"].fn(spark, SF0001).collect()
    assert {r["doc_id"] for r in rows} == set(texts)
    for r in rows:
        cs = chunks(texts[r["doc_id"]])
        boiler = [c for c in cs if len(df[(srcs[r["doc_id"]], c)]) >= 3]
        assert r["n_chunks"] == len(cs)
        assert r["n_boiler"] == len(boiler), (r["doc_id"], r["n_boiler"], len(boiler))
        clean = " ".join(c for c in cs if len(df[(srcs[r["doc_id"]], c)]) < 3)
        assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest(), r["doc_id"]


def _grid_pixels():
    g = pq.read_table(GRID64)
    out = []
    for i in range(g.num_rows):
        row = {c: g.column(c)[i].as_py() for c in g.column_names}
        width = row["width"]
        for pos, v in enumerate(row["data"]):
            out.append(
                {
                    "band_id": row["band_id"],
                    "tile_id": row["tile_id"],
                    "pos": pos,
                    "col": row["col_off"] + pos % width,
                    "row": row["row_off"] + pos // width,
                    "value": None if v == row["nodata"] else v,
                    "transform": row["transform"],
                }
            )
    return out


def test_spatial_nearest_matches_bruteforce(spark, registry):
    px = _grid_pixels()
    cands = {}
    for p in px:
        if p["band_id"] == "b1" and p["value"] is not None:
            tr = p["transform"]
            cands[(p["col"], p["row"])] = (
                tr[2] + (p["col"] + 0.5) * tr[0],
                tr[5] + (p["row"] + 0.5) * tr[4],
                p["value"],
            )
    # NOTE: duckdb's transform[k] is 1-indexed; pyarrow lists are
    # 0-indexed, hence tr[2]/tr[0]/tr[5]/tr[4] above for [3]/[1]/[6]/[5].
    got = {
        (r["site_tile"], r["pos"]): r
        for r in registry["spatial_nearest"].fn(spark, SF0001).collect()
    }
    n_sites = 0
    for p in px:
        if p["band_id"] != "b2" or p["pos"] % 11 != 0:
            continue
        n_sites += 1
        tr = p["transform"]
        lon = tr[2] + (p["col"] + 0.5) * tr[0]
        lat = tr[5] + (p["row"] + 0.5) * tr[4]
        cc = math.floor((lon - tr[2]) / tr[0])
        cr = math.floor((lat - tr[5]) / tr[4])
        best, n_cand = None, 0
        for dc in (-1, 0, 1):
            for dr in (-1, 0, 1):
                hit = cands.get((cc + dc, cr + dr))
                if hit is None:
                    continue
                n_cand += 1
                d2 = ((lon - hit[0]) / tr[0]) ** 2 + ((lat - hit[1]) / tr[4]) ** 2
                key = (d2, cc + dc, cr + dr)
                if best is None or key < best[0]:
                    best = (key, hit)
        r = got.get((p["tile_id"], p["pos"]))
        if best is None:
            assert r is None
            continue
        (d2, bc, br), hit = best
        assert r is not None, (p["tile_id"], p["pos"])
        assert (r["near_col"], r["near_row"]) == (bc, br)
        assert r["n_cand"] == n_cand
        assert abs(r["d2_px"] - round(d2, 6)) <= 1e-6
    assert len(got) <= n_sites


def test_range_frame_matches_numpy(spark, registry):
    ev = _events()
    got = {
        r["event_id"]: (r["n_1h"], r["sum_1h"])
        for r in registry["win_range_frame"].fn(spark, SF0001).collect()
    }
    for u in np.unique(ev["user_id"]):
        m = ev["user_id"] == u
        ts, eid, val = ev["tsec"][m], ev["event_id"][m], np.round(ev["value"][m], 4)
        for i in range(len(ts)):
            inframe = (ts >= ts[i] - 3599) & (ts <= ts[i])
            n, s = int(inframe.sum()), float(val[inframe].sum())
            gn, gs = got[int(eid[i])]
            assert gn == n, (int(eid[i]), gn, n)
            assert abs(gs - round(s, 4)) <= 2e-4, (int(eid[i]), gs, s)
