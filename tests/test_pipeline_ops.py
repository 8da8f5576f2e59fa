"""Tests for the training-data-pipeline operators (dedup, ANN, text
stats, scan statistics, similarity) against self-contained Python
oracles."""

import itertools
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xdata_igraph_spark.graph import LinkGraph
from xdata_igraph_spark.operators.ann import cosine_topk, srp_topk
from xdata_igraph_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from xdata_igraph_spark.operators.multimodal import (
    extract_features,
    make_fake_media,
    sample_frames,
)
from xdata_igraph_spark.operators.scan_stats import scan0, scan1, scan0_them, scan1_them
from xdata_igraph_spark.operators.similarity import (
    bibcoupling,
    cocitation,
    jaccard_edge_pairs,
)
from xdata_igraph_spark.operators.textstats import lang_id, quality_score, token_stats


DOCS = [
    (0, "the cat sat on the mat and the cat slept"),
    (1, "the cat sat on the mat and the dog slept"),
    (2, "completely different words entirely here now friends"),
    (3, "the cat sat on the mat and the cat slept"),  # exact dup of 0
    (4, None),
    (5, "short"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    out = exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["doc_ids"] == [0, 3]


def test_minhash_similar_docs_share_hashes(spark, docs):
    sig = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sig[0] == sig[3]  # identical docs → identical signatures
    matches01 = sum(1 for a, b in zip(sig[0], sig[1]) if a == b)
    matches02 = sum(1 for a, b in zip(sig[0], sig[2]) if a == b)
    assert matches01 > matches02  # near-dup shares more minhashes


def test_lsh_candidates_contain_duplicates(spark, docs):
    cand = {(r["a"], r["b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert (0, 3) in cand
    assert (0, 2) not in cand and (2, 3) not in cand


def test_ngram_jaccard_oracle(spark, docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.0).collect()
    }

    def shingles(t):
        toks = [w for w in "".join(c if c.isalnum() else " " for c in t.lower()).split() if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    texts = {d: t for d, t in DOCS if t and len(t.split()) >= 3}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        inter = len(sa & sb)
        if inter == 0:
            assert (a, b) not in got
        else:
            assert got[(a, b)] == pytest.approx(inter / len(sa | sb), abs=1e-12)


def test_simhash_properties(spark, docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[0] == fp[3]
    ham01 = bin((fp[0] ^ fp[1]) & (2**64 - 1)).count("1")
    ham02 = bin((fp[0] ^ fp[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02
    near = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert near[(0, 3)] == 0


def test_simhash_near_pairs_complete_at_any_radius(spark):
    """The banded bucket join must return EXACTLY the brute-force
    all-pairs-within-radius set (the r3 4x16-bit split silently dropped
    pairs for max_hamming > 3)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=12)))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["simhash"] & (2**64 - 1) for r in simhash(docs).collect()}
    for radius in (3, 6, 16):
        want = {}
        for a, b in itertools.combinations(sorted(fp), 2):
            h = bin(fp[a] ^ fp[b]).count("1")
            if h <= radius:
                want[(a, b)] = h
        got = {
            (r["a"], r["b"]): r["hamming"]
            for r in simhash_near_pairs(docs, max_hamming=radius).collect()
        }
        assert got == want, f"radius {radius}: banded join != brute force"


def test_textstats(spark, docs):
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[0]["n_tokens"] == 10
    assert ts[5]["n_tokens"] == 1 and ts[5]["avg_token_len"] == 5.0
    q = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert 0 < q[0]["alpha_ratio"] < 1
    lid = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert lid[0] == "en"  # 'the'/'and' hits
    assert lid[2] == "unk"


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(40)], "vec_id long, embedding array<float>"
    )
    got = {}
    for r in cosine_topk(df, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cosine"]))
    v = vecs.astype(np.float64)
    norms = np.linalg.norm(v, axis=1)
    sims = (v @ v.T) / np.outer(norms, norms)
    for q in range(40):
        order = sorted(
            (n for n in range(40) if n != q), key=lambda n: (-sims[q, n], n)
        )[:3]
        got_ids = [n for n, _ in sorted(got[q], key=lambda t: (-t[1], t[0]))]
        assert got_ids == order
        for n, c in got[q]:
            assert c == pytest.approx(sims[q, n], abs=1e-9)


def test_srp_recall(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(60)], "vec_id long, embedding array<float>"
    )
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(df, k=1).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in srp_topk(df, k=1, n_planes=6, dim=16, n_tables=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # LSH with 6 tables on random data


def test_scan_stats_small(spark):
    # triangle 0-1-2 plus pendant 3
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 0), (0, 3)], directed=False, n=4)
    s0 = {r["id"]: r["scan0"] for r in scan0(g).collect()}
    assert s0 == {0: 3.0, 1: 2.0, 2: 2.0, 3: 1.0}
    s1 = {r["id"]: r["scan1"] for r in scan1(g).collect()}
    # N[0] = {0,1,2,3}: edges 01,12,20,03 → 4; N[1] = {0,1,2}: 3 edges
    assert s1 == {0: 4, 1: 3, 2: 3, 3: 1}


def test_scan_them(spark):
    us = LinkGraph.from_pairs(spark, [(0, 1), (1, 2)], directed=False, n=4)
    them = LinkGraph.from_pairs(spark, [(0, 2), (2, 3)], directed=False, n=4)
    s0t = {r["id"]: r["scan0_them"] for r in scan0_them(us, them).collect()}
    assert s0t == {0: 1, 1: 0, 2: 2, 3: 1}
    s1t = {r["id"]: r["scan1_them"] for r in scan1_them(us, them).collect()}
    # N_us[0]={0,1}: no them edge within; N_us[1]={0,1,2}: them edge
    # (0,2) inside → 1; N_us[2]={1,2} and N_us[3]={3}: none
    assert s1t == {0: 0, 1: 1, 2: 0, 3: 0}


def test_cocitation_bibcoupling(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (0, 2), (3, 1), (3, 2)], directed=True, n=4)
    cc = {(r["a"], r["b"]): r["n_common"] for r in cocitation(g).collect()}
    assert cc == {(1, 2): 2}
    bc = {(r["a"], r["b"]): r["n_common"] for r in bibcoupling(g).collect()}
    assert bc == {(0, 3): 2}


def test_jaccard_edge_pairs(spark):
    g = LinkGraph.from_pairs(spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=False, n=4)
    j = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_edge_pairs(g).collect()}
    # N(0)={1,2}, N(1)={0,2}: common={2} union={0,1,2} → 1/3
    assert j[(0, 1)] == pytest.approx(1 / 3)
    # N(2)={0,1,3}, N(3)={2}: common={} → 0
    assert j[(2, 3)] == 0.0


def test_multimodal_plumbing(spark):
    media = make_fake_media(spark, 10)
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["feat"]) == 16 and r["n_bytes"] >= 4
    # deterministic
    again = {r["media_id"]: r["feat"] for r in extract_features(media, dim=16).collect()}
    for r in feats:
        assert again[r["media_id"]] == r["feat"]
    frames = sample_frames(media, every_n=2).collect()
    assert len(frames) > 0
    with pytest.raises(NotImplementedError):
        extract_features(media, decode_backend="pil")


def test_dice_and_invlog_vs_oracle(spark):
    """Dice = 2J/(1+J); Adamic-Adar sum over shared neighbors."""
    import math

    from xdata_igraph_spark.operators.similarity import (
        dice_edge_pairs,
        inverse_log_weighted,
    )
    from tests.oracles import gnm_edges

    n, edges = 25, gnm_edges(25, 60, False, seed=17)
    g = LinkGraph.from_pairs(spark, edges, directed=False, n=n)
    nbrs = {i: set() for i in range(n)}
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)

    dice = {(r["a"], r["b"]): r["dice"] for r in dice_edge_pairs(g).collect()}
    for (a, b), got in dice.items():
        inter = len(nbrs[a] & nbrs[b])
        want = 2 * inter / (len(nbrs[a]) + len(nbrs[b]))
        assert abs(got - want) < 1e-12, (a, b)

    sim = {(r["a"], r["b"]): r["sim"] for r in inverse_log_weighted(g).collect()}
    for (a, b), got in sim.items():
        want = sum(
            1.0 / math.log(len(nbrs[k])) for k in nbrs[a] & nbrs[b] if len(nbrs[k]) > 1
        )
        assert abs(got - want) < 1e-9, (a, b)
    # pairs with >=1 shared neighbor must all be present
    expect_pairs = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if nbrs[a] & nbrs[b]
    }
    assert set(sim) == expect_pairs


def test_ngram_jaccard_pairs_restricted_and_pipeline(spark, docs):
    from xdata_igraph_spark.operators.dedup import lsh_verified_pairs

    # verify-stage mode returns exactly the requested pairs' jaccard
    cand = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, pairs=cand).collect()
    }
    full = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (0, 3)}
    assert got[(0, 1)] == pytest.approx(full[(0, 1)])
    assert got[(0, 3)] == pytest.approx(1.0)
    assert got[(0, 2)] == 0.0  # no shared shingle → explicit zero

    # LSH → verify pipeline finds the exact dup and the near dup
    verified = {
        (r["a"], r["b"]): r["jaccard"]
        for r in lsh_verified_pairs(docs, threshold=0.3).collect()
    }
    assert (0, 3) in verified and verified[(0, 3)] == pytest.approx(1.0)
    assert all(j >= 0.3 for j in verified.values())
