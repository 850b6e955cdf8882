"""Property tests for the final round-6 additions (BM25, proximity,
Allen relations, UUID minting, RAG index, LSH recall): pure-python
brute force independent of both engines."""

from __future__ import annotations

import collections
import math
import re

import pyarrow.parquet as pq

from tests.conftest import SF0001


def _toks(text):
    return [w for w in text.lower().split(" ") if w]


def test_bm25_matches_python_reference(spark, registry):
    t = pq.read_table(f"{SF0001}/documents.parquet").to_pandas()
    docs = {r.doc_id: _toks(r.text) for r in t.itertuples()}
    q = ["stream", "window", "merge"]
    nd = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / nd
    df = {w: sum(1 for v in docs.values() if w in v) for w in q}
    scores = {}
    for d, ws in docs.items():
        tf = collections.Counter(ws)
        s = 0.0
        for w in q:
            if tf[w] == 0 or df[w] == 0:
                continue
            idf = math.log((nd - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            s += idf * tf[w] * 2.2 / (tf[w] + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
        if s > 0:
            scores[d] = round(s, 4)
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = registry["text_bm25"].fn(spark, SF0001).collect()
    got = [(r["doc_id"], r["bm25"]) for r in rows]
    assert got == top


def test_phrase_near_matches_bruteforce(spark, registry):
    t = pq.read_table(f"{SF0001}/documents.parquet").to_pandas()
    expect = {}
    for r in t.itertuples():
        ws = _toks(r.text)
        pa = [i + 1 for i, w in enumerate(ws) if w == "hash"]
        pb = [i + 1 for i, w in enumerate(ws) if w == "join"]
        pairs = [(x, y) for x in pa for y in pb if abs(x - y) <= 3]
        if pairs:
            expect[r.doc_id] = (len(pairs), min(abs(x - y) for x, y in pairs))
    rows = registry["text_phrase_near"].fn(spark, SF0001).collect()
    got = {r["doc_id"]: (r["n_pairs"], r["min_dist"]) for r in rows}
    assert got == expect


def test_allen_relations_bruteforce(spark, registry):
    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    # unit-independent epoch seconds: the corpus has shipped both
    # ns- and us-stored timestamps (SURVEY R3) — truncate via [s] cast
    t["tsec"] = t.ts.values.astype("datetime64[s]").astype("int64")
    iv = t.groupby(["user_id", "event_type"]).tsec.agg(["min", "max"])

    def rel(sa, ea, sb, eb):
        if sa == sb and ea == eb:
            return "equals"
        if ea < sb:
            return "before"
        if eb < sa:
            return "after"
        if ea == sb:
            return "meets"
        if eb == sa:
            return "met_by"
        if sa == sb:
            return "starts" if ea < eb else "started_by"
        if ea == eb:
            return "finishes" if sa > sb else "finished_by"
        if sa > sb and ea < eb:
            return "during"
        if sa < sb and ea > eb:
            return "contains"
        return "overlaps" if sa < sb else "overlapped_by"

    counts = collections.Counter()
    for uid, grp in iv.groupby(level=0):
        types = sorted(grp.index.get_level_values(1))
        for i, ta in enumerate(types):
            for tb in types[i + 1 :]:
                sa, ea = grp.loc[(uid, ta)]
                sb, eb = grp.loc[(uid, tb)]
                counts[rel(sa, ea, sb, eb)] += 1
    rows = registry["join_allen_relations"].fn(spark, SF0001).collect()
    got = {r["relation"]: r["n_pairs"] for r in rows}
    assert got == dict(counts)


def test_uuid_name_is_rfc4122_and_content_stable(spark, registry):
    rows1 = {r["doc_id"]: r["doc_uuid"] for r in registry["fn_uuid_name"].fn(spark, SF0001).collect()}
    rows2 = {r["doc_id"]: r["doc_uuid"] for r in registry["fn_uuid_name"].fn(spark, SF0001).collect()}
    assert rows1 == rows2  # content-stable across runs
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
    assert len(set(rows1.values())) == len(rows1)  # unique per doc
    for u in rows1.values():
        assert pat.match(u), u  # version 5 nibble + variant 10xx


def test_rag_index_accounting(spark, registry):
    t = pq.read_table(f"{SF0001}/documents.parquet").to_pandas()
    gated = t[(t.n_chars >= 50) & (t.n_chars <= 2000)]
    # keep lowest doc_id per exact text
    kept = gated.sort_values("doc_id").drop_duplicates("text", keep="first")
    rows = registry["pipeline_rag_index"].fn(spark, SF0001).collect()
    assert sum(r["n_docs"] for r in rows) == len(kept)
    n_tok = sum(len(_toks(x)) for x in kept.text)
    assert sum(r["n_tokens"] for r in rows) == n_tok
    for r in rows:
        assert 0 <= r["n_with_embedding"] <= r["n_docs"]


def test_lsh_recall_consistent_with_members(spark, registry):
    r = registry["dedup_near_recall"].fn(spark, SF0001).collect()[0]
    truth = {
        (x["doc_a"], x["doc_b"])
        for x in registry["dedup_jaccard"].fn(spark, SF0001).collect()
    }
    lsh = {
        (x["doc_a"], x["doc_b"])
        for x in registry["dedup_near"].fn(spark, SF0001).collect()
    }
    assert r["n_true"] == len(truth)
    assert r["n_found"] == len(truth & lsh)
    assert 0.0 <= r["recall"] <= 1.0


def test_grouped_p99_equals_numpy(spark, registry):
    import numpy as np

    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    rows = {r["event_type"]: r for r in registry["agg_exact_p99_grouped"].fn(spark, SF0001).collect()}
    for etype, grp in t.groupby("event_type"):
        x = np.sort(grp.value.to_numpy())
        k = math.ceil(0.99 * len(x))
        r = rows[etype]
        assert r["n_rows"] == len(x)
        assert abs(r["p99"] - round(float(x[k - 1]), 2)) < 1e-9
        assert 0 < r["pass2_rows"] < len(x)


def test_asof_tolerance_nulls_stale_matches(spark, registry):
    rows = registry["join_asof_tolerance"].fn(spark, SF0001).collect()
    base = {
        r["event_id"]: r["last_view_tsec"]
        for r in registry["join_asof"].fn(spark, SF0001).collect()
    }
    assert rows
    for r in rows:
        last = base[r["event_id"]]
        fresh = last != -1 and r["purchase_tsec"] - last <= 3600
        assert r["within_tolerance"] == fresh
        assert (r["matched_view_tsec"] is None) == (not fresh)
        if fresh:
            assert r["matched_view_tsec"] == last


def test_groups_frame_is_tie_invariant_and_complete(spark, registry):
    import collections

    rows = registry["win_groups_frame"].fn(spark, SF0001).collect()
    # every (type, day) present; ties (same n) share identical frame sums
    t = pq.read_table(f"{SF0001}/events.parquet").to_pandas()
    n_days = t.assign(day=t.ts.values.astype("datetime64[D]")).groupby(
        ["event_type", "day"]
    ).ngroups
    assert len(rows) == n_days
    by_key = collections.defaultdict(set)
    for r in rows:
        by_key[(r["event_type"], r["n"])].add(r["groups_frame_sum"])
    for k, sums in by_key.items():
        assert len(sums) == 1, f"peers {k} disagree: {sums}"


def test_entity_resolution_closure_properties(spark, registry):
    rows = registry["pipeline_entity_resolution"].fn(spark, SF0001).collect()
    t = pq.read_table(f"{SF0001}/part.parquet").to_pandas()
    names = t.groupby("p_name").p_partkey.min()
    assert len(rows) == len(names)
    # canonical id is a member's min id; cluster sizes account for all rows
    import collections

    by_ent = collections.defaultdict(list)
    for r in rows:
        by_ent[r["entity_id"]].append(r)
    for ent, members in by_ent.items():
        assert min(int(names[m["p_name"]]) for m in members) == ent
        for m in members:
            assert m["cluster_size"] == len(members)
