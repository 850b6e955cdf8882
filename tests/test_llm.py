"""LLM-pipeline operator semantics on tiny literal inputs + the sf0.001
corpus (golden where hand-checkable, invariants elsewhere)."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001


def test_dedup_exact_no_dups_at_small_sf(spark, registry):
    """FIXTURES.md: duplicate texts exist only at sf0.1 — at sf0.001
    every text is unique, so survivors == docs and n_copies == 1."""
    out = registry["dedup_exact"].fn(spark, SF0001)
    n_docs = spark.read.parquet(f"{SF0001}/documents.parquet").count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r.n_copies == 1 for r in rows)


def test_dedup_jaccard_self_pairs_excluded(spark, registry):
    out = registry["dedup_jaccard"].fn(spark, SF0001)
    assert all(r.doc_a < r.doc_b for r in out.collect())


def test_simhash_identical_texts_collide(spark):
    """SimHash is a pure function of the token multiset."""
    from raster2points_spark.registry import load_all

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zeta eta theta iota")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("documents_tmp")
    # reuse the registered plan by swapping the table: simplest is to
    # re-run its expression logic on the literal frame
    fn = load_all()["dedup_simhash"].fn

    class FakeDir(str):
        pass

    # monkey-route: write literal docs to a temp dir the key can read
    import tempfile, os

    d = tempfile.mkdtemp(prefix="simhash_t_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r.simhash for r in fn(spark, d).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_knn_is_top10_per_probe(spark, registry):
    out = registry["sim_knn"].fn(spark, SF0001).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == {0, 1, 2, 3, 4}
    for probe, rows in by_probe.items():
        assert len(rows) == 10
        assert all(r.vec_id != probe for r in rows), "self excluded"
        sims = [r.sim for r in sorted(rows, key=lambda r: r.rn)]
        assert sims == sorted(sims, reverse=True), "ranked by similarity"
        assert all(-1.0001 <= s <= 1.0001 for s in sims), "cosine bounds (unit-norm)"


def test_knn_label_majority(spark, registry):
    knn = registry["sim_knn"].fn(spark, SF0001)
    labels = registry["sim_knn_label"].fn(spark, SF0001).collect()
    assert len(labels) == 5
    assert all(0 <= r.pred_label <= 9 for r in labels)
    assert all(1 <= r.votes <= 10 for r in labels)


def test_text_tokens_counts(spark):
    from raster2points_spark.registry import load_all
    import tempfile, os

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a  c")], "doc_id long, text string"
    ).withColumn("lang", __import__("pyspark").sql.functions.lit("en"))
    d = tempfile.mkdtemp(prefix="tok_t_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.word: r.n for r in load_all()["text_tokens"].fn(spark, d).collect()}
    assert out == {"a": 3, "b": 1, "c": 1}  # double space yields no empty token


def test_tfidf_rare_term_outranks_common(spark):
    from raster2points_spark.registry import load_all
    import tempfile, os

    df = spark.createDataFrame(
        [(1, "common rare common"), (2, "common common common"), (3, "common other common")],
        "doc_id long, text string",
    )
    d = tempfile.mkdtemp(prefix="tfidf_t_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = load_all()["text_tfidf"].fn(spark, d).collect()
    doc1 = sorted((r for r in out if r.doc_id == 1), key=lambda r: r.rn)
    assert doc1[0].word == "rare", "idf must dominate the common term"


def test_mm_struct_join_integrity(spark, registry):
    out = registry["mm_struct"].fn(spark, SF0001)
    rows = out.collect()
    assert all(r.emb_dim == 64 for r in rows)
    assert all(r.text_len > 0 for r in rows)


def test_lsh_pairs_subset_of_exhaustive(spark, registry):
    """dedup_near (MinHash banding + exact verify) can only MISS pairs
    vs the exhaustive shingle join at the same τ — never invent them,
    and surviving pairs carry identical jaccard values."""
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry["dedup_jaccard"].fn(spark, SF0001).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry["dedup_near"].fn(spark, SF0001).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]


def test_ivf_neighbors_subset_of_corpus(spark, registry):
    out = registry["sim_ivf"].fn(spark, SF0001).collect()
    for r in out:
        assert r.vec_id != r.probe_id
        assert 1 <= r.rn <= 5


def test_connected_components_chain_and_df_cap(spark, registry):
    """Chain 1-2-3 collapses to one component (transitivity the pair
    list alone can't give); 5-6 stays separate; the shingle df cap
    drops ubiquitous shingles from the dedup_jaccard universe."""
    from raster2points_spark.queries.llm import MAX_SHINGLE_DF, connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r.doc: r.lab for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}
    assert MAX_SHINGLE_DF == 100  # oracle SQL embeds the same constant


def test_ivf_recall_floor_vs_exact_knn(spark, registry):
    """IVF searches only the probe's own cluster — recall vs exact kNN
    is the accuracy/cost trade.  On unit-norm embeddings with 8
    clusters the top-5 recall must stay well above chance (5/500);
    assert a conservative floor so a broken assignment (recall ~1%)
    fails loudly while normal LSH-style variance passes."""
    from tests.conftest import SF001

    knn = {
        (r.probe_id, r.vec_id)
        for r in registry["sim_knn"].fn(spark, SF001).collect()
        if r.rn <= 5 and r.probe_id < 5
    }
    ivf = {
        (r.probe_id, r.vec_id)
        for r in registry["sim_ivf"].fn(spark, SF001).collect()
    }
    assert ivf, "IVF returned nothing"
    recall = len(knn & ivf) / max(len(knn), 1)
    # floor raised 0.2 -> 0.25 with the r11 Lloyd-trained codebook
    # (VERDICT r10 #4); measured 0.32 at sf0.01
    assert recall >= 0.25, f"IVF top-5 recall collapsed: {recall:.2f}"


def test_ivf_trained_codebook_beats_first_k_on_sorted_corpus(spark, registry):
    """VERDICT r10 #4, the failure mode Lloyd training fixes: first-k
    centroids track CORPUS ORDER.  Corpus here is sorted by cluster
    (real corpora are sorted — by source/crawl), so the untrained
    first-k codebook sits almost entirely inside cluster 0 and the
    spread probes (vec_id 0..4, one per far cluster) lose their
    neighborhoods; two spherical-Lloyd rounds on the stride sample
    recover them.  Asserts trained recall beats untrained AND clears
    an absolute floor."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd

    import raster2points_spark.queries.llm as L

    rng = np.random.default_rng(7)
    C, per, D = 10, 60, 64
    centers = rng.normal(size=(C, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    clusters = []
    for c in range(C):
        v = centers[c] + 0.15 * rng.normal(size=(per, D))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        clusters.append(v)
    # probes first (one vector from each of clusters 5..9), then the
    # corpus SORTED by cluster — first-k lands in probes + cluster 0
    probes = [clusters[c][0] for c in range(5, 10)]
    rest = np.vstack(
        [clusters[c][1:] if c >= 5 else clusters[c] for c in range(C)]
    )
    X = np.vstack([probes, rest])
    d = tempfile.mkdtemp(prefix="ivf_sorted_")
    pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype="int64"),
            "embedding": [row.astype("float32").tolist() for row in X],
            "label": np.zeros(len(X), dtype="int32"),
        }
    ).to_parquet(os.path.join(d, "embeddings.parquet"))

    knn = {
        (r.probe_id, r.vec_id)
        for r in registry["sim_knn"].fn(spark, d).collect()
        if r.rn <= 5
    }

    def recall(rounds):
        old = L._IVF_LLOYD_ROUNDS
        L._IVF_LLOYD_ROUNDS = rounds
        try:
            ivf = {
                (r.probe_id, r.vec_id)
                for r in registry["sim_ivf"].fn(spark, d).collect()
            }
        finally:
            L._IVF_LLOYD_ROUNDS = old
        return len(knn & ivf) / max(len(knn), 1)

    untrained, trained = recall(0), recall(L._IVF_LLOYD_ROUNDS)
    assert trained > untrained, (trained, untrained)
    assert trained >= 0.5, f"trained IVF recall too low: {trained:.2f}"


def test_gopher_rules_verdict_consistent_with_features(spark, registry):
    """passes must be exactly the conjunction of the emitted features —
    and the synthetic corpus (plain lowercase words) should mostly pass."""
    from tests.conftest import SF0001

    rows = registry["text_gopher_rules"].fn(spark, SF0001).collect()
    assert rows
    n_pass = 0
    for r in rows:
        want = (
            5 <= r.n_words <= 100000
            and 2.0 <= r.mean_word_len <= 12.0
            and r.frac_alpha_words >= 0.7
            and r.n_stop_hits >= 1
            and r.symbol_word_ratio <= 0.6
        )
        assert r.passes == want, r
        n_pass += want
    assert n_pass > 0


def test_pack_sequences_partitions_token_stream(spark, registry):
    """Packing must conserve docs and tokens per source, and seq_ids
    must be the contiguous range 0..max within each source."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from tests.conftest import SF0001
    from raster2points_spark.io import table
    from raster2points_spark.queries.llm import PACK_BUDGET, TOKS_SPARK

    out = registry["pack_sequences"].fn(spark, SF0001).collect()
    per_src_docs = defaultdict(int)
    per_src_toks = defaultdict(int)
    per_src_seqs = defaultdict(set)
    for r in out:
        per_src_docs[r.source] += r.n_docs
        per_src_toks[r.source] += r.total_tokens
        per_src_seqs[r.source].add(r.seq_id)

    truth = (
        table(spark, SF0001, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.size(F.expr(TOKS_SPARK))).alias("tok"),
        )
        .collect()
    )
    for t_ in truth:
        assert per_src_docs[t_.source] == t_.n
        assert per_src_toks[t_.source] == t_.tok
        seqs = per_src_seqs[t_.source]
        assert seqs == set(range(max(seqs) + 1))
        # the stream cut implies ~tok/BUDGET sequences (+1 boundary slack)
        assert max(seqs) <= t_.tok // PACK_BUDGET + 1


def test_sample_mixture_downsamples_toward_min(spark, registry):
    """Every source keeps ≤ its original count; the smallest source is
    kept whole; kept sizes concentrate near n_min (md5-bucket variance
    allowed)."""
    from tests.conftest import SF001

    rows = registry["sample_mixture"].fn(spark, SF001).collect()
    assert rows
    n_min = min(r.orig_n for r in rows)
    for r in rows:
        assert r.kept_n <= r.orig_n
        if r.orig_n == n_min:
            assert r.kept_n == n_min  # threshold 1000 keeps everything
        # within ±50% of the uniform target (hash variance on small n)
        assert 0.5 * n_min <= r.kept_n <= 1.5 * n_min + 1, r


def test_unigram_ppl_scores_are_sane(spark, registry):
    """NLL positive (probabilities < 1), ppl consistent with avg_nll,
    token counts conserved vs the raw tokenizer."""
    import math

    from pyspark.sql import functions as F

    from tests.conftest import SF0001
    from raster2points_spark.io import table
    from raster2points_spark.queries.llm import TOKS_SPARK

    rows = registry["text_unigram_ppl"].fn(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.avg_nll > 0
        assert abs(r.ppl - math.exp(r.avg_nll)) <= 0.011 * r.ppl + 0.02
    got_tok = {r.doc_id: r.n_tokens for r in rows}
    want_tok = {
        r.doc_id: r.n
        for r in table(spark, SF0001, "documents")
        .select("doc_id", F.size(F.expr(TOKS_SPARK)).alias("n"))
        .collect()
    }
    assert got_tok == want_tok


def test_embed_quantize_bounds_and_error(spark, registry):
    """int8 range respected, max|q| hits 127 exactly (the max-abs
    component maps to full scale), reconstruction error small vs the
    unit-norm vectors."""
    from tests.conftest import SF0001

    rows = registry["embed_quantize"].fn(spark, SF0001).collect()
    assert rows
    for r in rows:
        assert r.q_max == 127  # scale is max|x| -> that coord quantizes to ±127
        assert abs(r.q0) <= 127 and abs(r.q1) <= 127
        assert r.scale > 0
        # 64-dim unit-norm vector, step size scale/127: worst-case L2
        # error sqrt(64)*(scale/254) — allow 2x slack
        assert r.recon_err <= 2 * (64 ** 0.5) * r.scale / 254 + 1e-6, r


def test_bpe_train_matches_reference_implementation(spark):
    """The distributed trainer must learn the exact merge sequence a
    sequential reference BPE (Sennrich-style, same tiebreak) learns on
    the same corpus."""
    from collections import Counter

    import pyarrow.parquet as pq

    from tests.conftest import SF0001
    from raster2points_spark.queries.llm import N_BPE_MERGES, bpe_train

    texts = pq.read_table(f"{SF0001}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    words = Counter()
    for t_ in texts:
        for w in t_.lower().split(" "):
            if w:
                words[w] += 1
    vocab = Counter()
    for w, n in words.items():
        vocab[tuple(w)] += n
    want = []
    for rank in range(N_BPE_MERGES):
        pc = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((rank, a, b, cnt))
        new_vocab = Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab

    got = [tuple(r) for r in bpe_train(spark, SF0001).orderBy("rank").collect()]
    assert got == want


def _sequential_bpe(vocab, n_merges):
    """Pure-Python Sennrich-style trainer, (cnt desc, a, b) tiebreak —
    the ground truth the batched distributed trainer must reproduce."""
    from collections import Counter

    vocab = Counter(vocab)
    out = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, cnt))
        new_vocab = Counter()
        for syms, n in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += n
        vocab = new_vocab
    return out


def _words_df(spark, vocab):
    return spark.createDataFrame(
        [(list(syms), n) for syms, n in vocab.items()],
        "syms array<string>, n bigint",
    )


def test_bpe_batched_rounds_scale_with_rounds_not_merges(spark):
    """VERDICT r9 #4: with symbol-disjoint top pairs the trainer must
    learn several merges from ONE driver round-trip — collects scale
    with rounds, not merges — while staying exactly sequential."""
    from raster2points_spark.queries.llm import _bpe_train_words

    # four disjoint dominant pairs, no cross-symbol interference
    vocab = {
        ("a", "b"): 100,
        ("c", "d"): 90,
        ("e", "f"): 80,
        ("g", "h"): 70,
    }
    stats = {}
    got = [
        tuple(r)
        for r in _bpe_train_words(spark, _words_df(spark, vocab), 4, stats=stats)
        .orderBy("rank")
        .collect()
    ]
    assert got == _sequential_bpe(vocab, 4)
    assert stats == {"rounds": 1, "merges": 4}


def test_bpe_batched_matches_sequential_on_adversarial_vocabs(spark):
    """Exactness under the batching hazards: symbol-sharing runner-ups
    (must stop the batch), merge concatenations colliding with existing
    symbols, count ties, and chained pairs whose merge creates a new
    dominant pair."""
    import random

    from raster2points_spark.queries.llm import _bpe_train_words

    cases = [
        # merging (t,h) creates (th,e) which must beat the stale runner-up
        {("t", "h", "e"): 100, ("x", "y"): 60, ("t", "z"): 55},
        # tie counts across sharing pairs — batch must stop at the tie
        {("a", "b"): 50, ("c", "a"): 50, ("d", "e"): 50},
        # pre-existing symbol equal to a merge concatenation
        {("a", "b"): 40, ("ab", "c"): 39, ("d", "f"): 10},
    ]
    rng = random.Random(7)
    syms = list("abcdefgh")
    for _ in range(3):  # seeded random vocabularies
        vocab = {}
        for _w in range(rng.randint(4, 9)):
            word = tuple(rng.choice(syms) for _ in range(rng.randint(1, 5)))
            vocab[word] = vocab.get(word, 0) + rng.randint(1, 40)
        cases.append(vocab)

    for vocab in cases:
        got = [
            tuple(r)
            for r in _bpe_train_words(spark, _words_df(spark, vocab), 6)
            .orderBy("rank")
            .collect()
        ]
        assert got == _sequential_bpe(vocab, 6), vocab


def _greedy_merge(tokens, a, b):
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_bpe_apply_oracle_fixpoint_equals_greedy():
    """ADVICE r10 (medium): the claim the bpe_apply oracle rests on —
    leftmost-non-overlapping ``replace`` iterated to fixpoint equals
    greedy left-to-right pair merging.  A SINGLE pass is NOT equivalent
    ('banana' under (a,n) -> [b,an,a,n,a]); two passes are (pass 1
    isolates the survivors of each overlapping-adjacent run), three are
    emitted for margin.  Exhaustive to |word|=12 over {a,n}, randomized
    to 40 over {a,n,x}."""
    import itertools
    import random

    def via_replace(tokens, a, b, passes):
        s = " " + " ".join(tokens) + " "
        for _ in range(passes):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
        return s.strip().split(" ")

    # the documented single-pass counterexample
    assert via_replace(list("banana"), "a", "n", 1) == ["b", "an", "a", "n", "a"]
    assert _greedy_merge(list("banana"), "a", "n") == ["b", "an", "an", "a"]

    for L in range(1, 13):
        for tup in itertools.product("an", repeat=L):
            t_ = list(tup)
            assert via_replace(t_, "a", "n", 3) == _greedy_merge(t_, "a", "n"), t_
    rng = random.Random(0)
    for _ in range(2000):
        t_ = [rng.choice("anx") for _ in range(rng.randint(13, 40))]
        assert via_replace(t_, "a", "n", 3) == _greedy_merge(t_, "a", "n"), t_
    # multi-char symbols (the th+e rule shape)
    for _ in range(2000):
        t_ = [rng.choice(["th", "e", "x"]) for _ in range(rng.randint(1, 30))]
        assert via_replace(t_, "th", "e", 3) == _greedy_merge(t_, "th", "e"), t_
    # SELF-PAIR (a == b) counterexample that motivates the fold branch
    # in _bpe_apply_merge (ADVICE r15): replace-to-fixpoint strands
    # singles between merged pairs on runs of >= 5 identical symbols.
    assert via_replace(["a"] * 6, "a", "a", 3) == ["aa", "a", "aa", "a"]
    assert _greedy_merge(["a"] * 6, "a", "a") == ["aa", "aa", "aa"]


def test_bpe_apply_merge_self_pair_is_greedy(spark):
    """ADVICE r15 (medium): the in-engine _bpe_apply_merge must equal
    greedy left-to-right merging when the rule is a SELF-PAIR (a == b)
    — the replace-to-fixpoint path diverges on identical-symbol runs
    (6x'a' under ('a','a') → [aa, a, aa, a] instead of greedy's
    [aa, aa, aa]), so self-pairs take the aggregate() fold branch.
    Exhaustive over {a,x} words to length 10, plus the run shapes."""
    import itertools

    from raster2points_spark.queries.llm import _bpe_apply_merge

    words = [list(tup) for L in range(1, 11) for tup in itertools.product("ax", repeat=L)]
    words += [["a"] * k for k in range(11, 16)]
    # ride the word index in the n column (the helper only keeps syms, n)
    df = spark.createDataFrame(
        [(w, i) for i, w in enumerate(words)], "syms array<string>, n bigint"
    )
    got = {
        r["n"]: list(r["syms"])
        for r in _bpe_apply_merge(df, "a", "a").collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _greedy_merge(w, "a", "a"), (w, got[i])


def test_bpe_apply_oracle_matches_spark_on_adversarial_corpus(spark):
    """ADVICE r10 (medium), end-to-end guard: run the REGISTERED
    bpe_apply oracle SQL (DuckDB) and the Spark fold on a corpus built
    to contain overlapping-adjacent rule hits ('banana', 'mining',
    'remaining', 'ananan', 'thethe', 'inin') — exactly the words that
    made the r10 single-pass oracle wrong.  Values must match."""
    import os
    import tempfile

    import duckdb

    from raster2points_spark.registry import load_all

    texts = [
        "banana mining remaining ananan banana",
        "thethe thermal anther inin winning",
        "the miner can and an in inn era erer",
        "ananananan bananas thinthin nine",
    ]
    d = tempfile.mkdtemp(prefix="bpe_apply_adv_")
    spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    spec = load_all()["bpe_apply"]
    got = [
        (r.token, r.cnt) for r in spec.fn(spark, d).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    want = [(t_, int(c)) for t_, c in con.execute(spec.oracle).fetchall()]
    assert got == want


def test_bpe_apply_corpus_needs_at_most_emitted_passes():
    """VERDICT r11 #5, corpus-regeneration guard: the bpe_apply oracle
    emits replace-to-fixpoint with passes=3 per rule.  This test
    measures, on the REAL corpus vocabulary, the number of passes each
    word actually needs per rule (Python str.replace has the same
    leftmost-non-overlapping, no-rescan-of-replacement semantics as
    DuckDB replace) and fails if any word ever needs more than the
    emitted 3 — so a future testdata regen that introduces longer
    overlapping-adjacent runs (think 'anananananan...') breaks HERE
    with a clear message, not silently at the driver's hash gate."""
    import duckdb

    from raster2points_spark.queries.llm import BPE_APPLY_RULES, TOKS_DUCK
    from tests.conftest import SF001

    def passes_to_fixpoint(s, a, b):
        pat, rep = f" {a} {b} ", f" {a}{b} "
        n = 0
        while pat in s:
            s = s.replace(pat, rep)
            n += 1
        return n, s

    # the counter itself has teeth: 'banana' needs 2 passes under (a,n)
    s0 = " " + " ".join("banana") + " "
    n_banana, _ = passes_to_fixpoint(s0, "a", "n")
    assert n_banana == 2

    con = duckdb.connect()
    words = [
        w
        for (w,) in con.execute(
            f"SELECT DISTINCT unnest({TOKS_DUCK}) FROM "
            f"read_parquet('{SF001}/documents.parquet')"
        ).fetchall()
    ]
    assert len(words) > 10  # the corpus vocabulary actually loaded
    worst = 0
    for w in words:
        s = " " + " ".join(w) + " "
        for a, b in BPE_APPLY_RULES:
            n, s = passes_to_fixpoint(s, a, b)
            worst = max(worst, n)
    assert worst <= 3, (
        f"corpus words need {worst} replace passes to reach the merge "
        "fixpoint but the bpe_apply oracle emits only 3 — raise "
        "_replace_fixpoint_sql(passes=...) to cover the regenerated corpus"
    )


def test_hll_partial_merge_accuracy(spark, registry):
    """agg_hll_partial_merge is rows-only (no DuckDB oracle — different
    sketch algorithm), so exactness is pinned here instead: every
    per-source estimate AND the merged __ALL__ estimate must land
    within 5% of the exact distinct count (doc_id is unique, so exact
    distinct == row count)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF001

    out = {r.source: r for r in registry["agg_hll_partial_merge"].fn(spark, SF001).collect()}
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    exact = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = docs.count()
    assert abs(out["__ALL__"].est_distinct - total) / total <= 0.05
    assert out["__ALL__"].n_rows == total
    for src, n in exact.items():
        assert abs(out[src].est_distinct - n) / n <= 0.05, (src, out[src], n)
