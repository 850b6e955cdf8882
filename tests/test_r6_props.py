"""Property tests for the round-6 late-addition operators: each
re-derives the operator's guarantee from raw data with numpy/python
brute force — independent of BOTH engines, so a bug shared by the
Spark plan and its DuckDB oracle twin (the one failure mode the gate
can't see) still gets caught here."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF0001


def _embeddings():
    t = pq.read_table(f"{SF0001}/embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    embs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vec_ids)
    return vec_ids[order], embs[order]


def test_kcenter_greedy_separation_property(spark, registry):
    # Farthest-point-first invariant (the 2-approximation argument):
    # every pair of chosen centers is separated by at least the final
    # covering radius — if any two centers were closer, the later one
    # could not have been the farthest point when it was picked.
    rows = registry["sample_kcenter"].fn(spark, SF0001).collect()
    ids = [r["vec_id"] for r in rows]
    radius_sq = rows[0]["final_radius_sq"]
    vec_ids, embs = _embeddings()
    idx = {v: i for i, v in enumerate(vec_ids)}
    centers = embs[[idx[i] for i in ids]]
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = float(((centers[a] - centers[b]) ** 2).sum())
            assert d >= radius_sq - 1e-6, (ids[a], ids[b], d, radius_sq)
    assert len(set(ids)) == len(ids)


def test_kmeans_matches_numpy_lloyd(spark, registry):
    # independent replication: 3 Lloyd rounds in numpy from the same
    # deterministic seed must land on the same cluster sizes and
    # centroid statistics (1e-6 — far below the operator's 4-dp round)
    vec_ids, embs = _embeddings()
    cent = embs[vec_ids < 8].copy()
    for _ in range(3):
        d = ((embs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(8):
            members = embs[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    rows = registry["ml_kmeans_lloyd"].fn(spark, SF0001).collect()
    got = {r["cid"]: r for r in rows}
    for c in range(8):
        n = int((assign == c).sum())
        assert got[c]["n"] == n, (c, got[c]["n"], n)
        assert abs(got[c]["c_head"] - cent[c][0]) < 1e-3
        assert abs(got[c]["c_sq"] - float((cent[c] ** 2).sum())) < 1e-3


def test_mips_matches_bruteforce_inner_product(spark, registry):
    vec_ids, embs = _embeddings()
    rows = registry["sim_mips"].fn(spark, SF0001).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], []).append(r)
    for pid, rs in by_probe.items():
        p = embs[vec_ids == pid][0]
        ips = embs @ p
        cand = [
            (float(ips[i]), int(vec_ids[i]))
            for i in range(len(vec_ids))
            if vec_ids[i] != pid
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        want = [v for _, v in cand[:10]]
        got = [r["vec_id"] for r in sorted(rs, key=lambda r: r["rn"])]
        assert got == want, (pid, got, want)


def test_interval_coverage_matches_bruteforce(spark, registry):
    t = pq.read_table(f"{SF0001}/events.parquet", columns=["user_id", "ts"])
    users = t.column("user_id").to_numpy()
    # match the operator: whole-second epoch granularity
    secs = (t.column("ts").cast("int64").to_numpy() // 10**6)
    rows = registry["interval_coverage"].fn(spark, SF0001).collect()
    got = {r["user_id"]: (r["n_islands"], r["covered_s"]) for r in rows}
    for u in np.unique(users)[:25]:
        iv = sorted((int(s), int(s) + 300) for s in secs[users == u])
        n_isl, covered, cur_s, cur_e = 0, 0, None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                n_isl, cur_s, cur_e = n_isl + 1, s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        assert got[int(u)] == (n_isl, covered), (u, got[int(u)], (n_isl, covered))


def test_bilinear_matches_numpy(spark, registry):
    # independent bilinear replication over the committed grid fixture
    t = pq.read_table("fixtures/grid/grid64.parquet")
    grid = np.full((64, 64), np.nan)
    for b, tid, co, ro, w, data, nod in zip(
        t.column("band_id").to_pylist(),
        t.column("tile_id").to_pylist(),
        t.column("col_off").to_pylist(),
        t.column("row_off").to_pylist(),
        t.column("width").to_pylist(),
        t.column("data").to_pylist(),
        t.column("nodata").to_pylist(),
    ):
        if b != "b1":
            continue
        arr = np.array(data, dtype=np.float64).reshape(-1, w)
        arr[arr == nod] = np.nan
        grid[ro : ro + arr.shape[0], co : co + w] = arr
    rows = registry["raster_resample_bilinear"].fn(spark, SF0001).collect()
    assert rows, "no bilinear output"
    for r in rows[:200]:
        tc, tr = r["tc"], r["tr"]
        x = -19.9 + (tc + 0.5) * 0.03
        y = 59.9 - (tr + 0.5) * 0.03
        fx = (x + 20.0) / 0.05 - 0.5
        fy = (60.0 - y) / 0.05 - 0.5
        c0, r0 = int(np.floor(fx)), int(np.floor(fy))
        dx, dy = fx - c0, fy - r0
        q = grid[r0 : r0 + 2, c0 : c0 + 2]
        assert not np.isnan(q).any()
        v = (
            q[0, 0] * (1 - dx) * (1 - dy)
            + q[0, 1] * dx * (1 - dy)
            + q[1, 0] * (1 - dx) * dy
            + q[1, 1] * dx * dy
        )
        assert abs(r["value"] - v) < 1e-4, (tc, tr, r["value"], v)


def test_wilson_interval_sane(spark, registry):
    rows = registry["ab_test_proportions"].fn(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1.0
        # Wilson never collapses to zero width on finite n
        assert r["wilson_hi"] - r["wilson_lo"] > 0


def _grid_b1():
    t = pq.read_table("fixtures/grid/grid64.parquet")
    grid = np.full((64, 64), np.nan)
    for b, co, ro, w, data, nod in zip(
        t.column("band_id").to_pylist(),
        t.column("col_off").to_pylist(),
        t.column("row_off").to_pylist(),
        t.column("width").to_pylist(),
        t.column("data").to_pylist(),
        t.column("nodata").to_pylist(),
    ):
        if b != "b1":
            continue
        arr = np.array(data, dtype=np.float64).reshape(-1, w)
        arr[arr == nod] = np.nan
        grid[ro : ro + arr.shape[0], co : co + w] = arr
    return grid


_D8 = [  # (dir, dc, dr, dist) — must match the operator's offset table
    (0, 1, 0, 1.0),
    (1, 1, 1, np.sqrt(2.0)),
    (2, 0, 1, 1.0),
    (3, -1, 1, np.sqrt(2.0)),
    (4, -1, 0, 1.0),
    (5, -1, -1, np.sqrt(2.0)),
    (6, 0, -1, 1.0),
    (7, 1, -1, np.sqrt(2.0)),
]


def _numpy_flow_edges(grid):
    edges = {}
    for r in range(64):
        for c in range(64):
            if np.isnan(grid[r, c]):
                continue
            best = None
            for d, dc, dr, dist in _D8:
                nc, nr = c + dc, r + dr
                if not (0 <= nc < 64 and 0 <= nr < 64) or np.isnan(grid[nr, nc]):
                    continue
                g = (grid[r, c] - grid[nr, nc]) / dist
                if best is None or g > best[0] or (g == best[0] and d < best[1]):
                    best = (g, d, nc, nr)
            if best and best[0] > 0:
                edges[(c, r)] = (best[2], best[3])
    return edges


def test_flow_direction_matches_numpy(spark, registry):
    grid = _grid_b1()
    edges = _numpy_flow_edges(grid)
    rows = registry["raster_flow_direction"].fn(spark, SF0001).collect()
    for row in rows:
        c, r = row["col"], row["row"]
        if row["flow_dir"] == -1:
            assert (c, r) not in edges, (c, r)
        else:
            d, dc, dr, _ = _D8[row["flow_dir"]]
            assert edges[(c, r)] == (c + dc, r + dr), (c, r, row["flow_dir"])


def test_flow_accumulation_matches_numpy(spark, registry):
    grid = _grid_b1()
    edges = _numpy_flow_edges(grid)
    acc = {
        (c, r): 1
        for r in range(64)
        for c in range(64)
        if not np.isnan(grid[r, c])
    }
    for _ in range(5):  # the operator's unrolled fixpoint prefix
        nxt = {k: 1 for k in acc}
        for src, dst in edges.items():
            nxt[dst] += acc[src]
        acc = nxt
    rows = registry["raster_flow_accumulation"].fn(spark, SF0001).collect()
    for row in rows:
        assert acc[(row["col"], row["row"])] == row["acc"], (
            row["col"],
            row["row"],
            row["acc"],
        )


def test_region_label_matches_numpy(spark, registry):
    grid = _grid_b1()
    valid = {
        (c, r): int(np.floor(grid[r, c] / 10))
        for r in range(64)
        for c in range(64)
        if not np.isnan(grid[r, c])
    }
    lbl = {(c, r): r * 64 + c for (c, r) in valid}
    for _ in range(6):  # the operator's unrolled rounds
        nxt = {}
        for (c, r), l in lbl.items():
            best = l
            for dc, dr in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (c + dc, r + dr)
                if nb in valid and valid[nb] == valid[(c, r)]:
                    best = min(best, lbl[nb])
            nxt[(c, r)] = best
        lbl = nxt
    rows = registry["raster_region_label"].fn(spark, SF0001).collect()
    for row in rows:
        assert lbl[(row["col"], row["row"])] == row["lbl"], (row["col"], row["row"])
