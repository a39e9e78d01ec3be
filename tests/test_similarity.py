"""Similarity-search semantics: fast path agrees with the exact fold path,
ANN recall against brute force, near-dup pair symmetry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.operators import similarity as sim
from duckdb_cluster_hash_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_medium):
    return load_table(spark, sf_medium, "embeddings").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.where(F.col("vec_id") == 7).head()["embedding"]]


def test_topk_exact_vs_fast_same_ranking(emb, qvec):
    exact = [r["vec_id"] for r in sim.cosine_topk(emb, qvec, k=10).collect()]
    fast = [r["vec_id"] for r in sim.cosine_topk_fast(emb, qvec, k=10).collect()]
    assert exact == fast
    assert exact[0] == 7  # the query vector itself is its own best match


def test_topk_values_in_range(emb, qvec):
    rows = sim.cosine_topk(emb, qvec, k=20).collect()
    assert all(-1.0 - 1e-9 <= r["cos_sim"] <= 1.0 + 1e-9 for r in rows)
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ann_lsh_recall(emb, qvec):
    exact = {r["vec_id"] for r in sim.cosine_topk_fast(emb, qvec, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in sim.ann_lsh_topk(emb, qvec, k=10, planes=4, tables=16).collect()
    }
    # this corpus has weak similarity structure (best cos ~0.5 => per-bit
    # collision ~0.67), so use wide buckets + many tables for recall
    assert len(exact & approx) >= 6
    assert 7 in approx


def test_ann_prunes_candidates(emb, qvec):
    # with narrow buckets the candidate set must be a strict subset
    approx = sim.ann_lsh_topk(emb, qvec, k=500, planes=12, tables=1)
    assert approx.count() < emb.count()


def test_neardup_pairs_threshold(emb):
    pairs = sim.embedding_neardup_pairs(emb, threshold=0.45)
    rows = pairs.collect()
    assert all(r["cos_sim"] >= 0.45 for r in rows)
    assert all(r["vec_a"] < r["vec_b"] for r in rows)


def test_ivf_topk_recall(emb, qvec):
    exact = {r["vec_id"] for r in sim.cosine_topk_fast(emb, qvec, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in sim.ivf_topk(emb, qvec, k=10, n_clusters=8, nprobe=4).collect()
    }
    # probing half the cells of a weakly-clustered corpus: most of top-10
    assert len(exact & approx) >= 5
    assert 7 in approx  # the query vector's own cell is always probed


def test_ivf_prunes_scan(emb, qvec):
    all_probed = sim.ivf_topk(emb, qvec, k=1000, n_clusters=8, nprobe=2)
    assert all_probed.count() < emb.count()


def test_semantic_dedup_summary_consistency(spark, emb):
    from duckdb_cluster_hash_spark.operators import similarity as sim

    summary = sim.semantic_dedup_summary(emb, threshold=0.6, dim=64, n_cells=16)
    rows = summary.collect()
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    assert all(0 <= r["n_dropped"] <= r["n_vecs"] for r in rows)
    # every dropped vector must have a lower-id intra-cell partner
    pairs = sim.semantic_dedup_pairs(emb, threshold=0.6, dim=64, n_cells=16)
    assert pairs.where(F.col("vec_a") >= F.col("vec_b")).count() == 0
    n_dropped_total = sum(r["n_dropped"] for r in rows)
    assert pairs.select("vec_b").distinct().count() == n_dropped_total


def test_scaled_n_cells_rule():
    # floor below 256 rows, ceil(sqrt(n)) above — mirrors the oracle's
    # GREATEST(16, CAST(ceil(sqrt(count(*))) AS BIGINT))
    assert sim.scaled_n_cells(0) == 16
    assert sim.scaled_n_cells(255) == 16
    assert sim.scaled_n_cells(256) == 16
    assert sim.scaled_n_cells(257) == 17
    assert sim.scaled_n_cells(10_000) == 100
    assert sim.scaled_n_cells(1_000_000) == 1000
    assert sim.scaled_n_cells(10**12) == 10**6  # perfect square: exact sqrt


def test_semantic_dedup_pair_budget_scales(emb):
    """With auto n_cells the intra-cell pair count must stay ~O(n^1.5),
    far under the all-pairs n(n-1)/2 a fixed cell count degenerates to."""
    n = emb.count()
    n_cells = sim.scaled_n_cells(n)
    assert n_cells >= 16 and n_cells == sim.scaled_n_cells(n)
    tagged = sim.ivf_assign_cells(emb, dim=64, n_cells=n_cells)
    sizes = [r["c"] for r in tagged.groupBy("cell").agg(F.count("*").alias("c")).collect()]
    intra_pairs = sum(s * (s - 1) // 2 for s in sizes)
    all_pairs = n * (n - 1) // 2
    # md5 cells are roughly balanced: budget 4x the balanced-cell pair count
    balanced = n_cells * ((n // n_cells + 1) * (n // n_cells) // 2)
    assert intra_pairs <= 4 * balanced
    assert intra_pairs < all_pairs / 4


def test_pq_encode_matches_numpy_reference(emb):
    """The JVM fold encoder and an independent numpy PQ encoder must
    assign identical codes (same normalize -> slice -> argmin-first-tie
    semantics) — the property that makes the Arrow ADC kernel a
    rank-identical twin of the expression path."""
    import numpy as np

    cb = sim.pq_sample_codebook(emb, m=8, n_codes=16)
    got = {
        r["vec_id"]: list(r["_codes"])
        for r in sim.pq_encode(emb, cb).select("vec_id", "_codes").collect()
    }
    cbn = np.asarray(cb)  # (m, n_codes, sub)
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows:
        v = np.asarray([float(x) for x in r["embedding"]])
        n = np.linalg.norm(v)
        if n > 0:
            v = v / n
        xs = v.reshape(8, -1)
        d = ((xs[:, None, :] - cbn) ** 2).sum(axis=2)
        want = d.argmin(axis=1).tolist()
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_adc_recall_and_exhaustive_subsumption(emb, qvec):
    """PQ+ADC with the catalog's parameters must beat the recall
    contract, and with rerank >= corpus size the rerank IS the exact
    scan — recall exactly 10/10 by construction."""
    cb = sim.pq_sample_codebook(emb, m=8, n_codes=32)
    exact = {r["vec_id"] for r in sim.cosine_topk(emb, qvec, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in sim.pq_adc_topk(emb, cb, qvec, k=10, rerank=128).collect()
    }
    assert len(approx & exact) >= 5
    n = emb.count()
    full = {
        r["vec_id"]
        for r in sim.pq_adc_topk(emb, cb, qvec, k=10, rerank=n).collect()
    }
    assert full == exact


def test_margin_bitext_pairs_properties(spark, sf_medium):
    """Structural contract of the margin miner: pairs are MUTUAL best
    (each a_id and each b_id appears at most once), sides come from the
    requested labels, cosines are positive (negative-cos candidates are
    dropped before kNN stats), and the margin of an emitted pair is the
    row maximum over every candidate sharing either endpoint's cell —
    checked against an independent numpy recomputation of cell-blocked
    cosines."""
    import numpy as np

    from duckdb_cluster_hash_spark.plans.catalog import QUERIES

    rows = QUERIES["emb_margin_bitext_pairs"](spark, sf_medium).collect()
    assert rows, "sf_medium has every label; the miner must emit pairs"
    a_ids = [r["a_id"] for r in rows]
    b_ids = [r["b_id"] for r in rows]
    assert len(a_ids) == len(set(a_ids))  # mutual best: a side unique
    assert len(b_ids) == len(set(b_ids))  # mutual best: b side unique
    assert all(r["cos_sim"] > 0 for r in rows)
    assert all(r["margin"] > 0 for r in rows)

    # independent check of one pair's cosine on the raw vectors
    emb_pd = (
        load_table(spark, sf_medium, "embeddings")
        .select("vec_id", "label", "embedding")
        .toPandas()
        .set_index("vec_id")
    )
    r0 = rows[0]
    va = np.array(emb_pd.loc[r0["a_id"], "embedding"], dtype=np.float64)
    vb = np.array(emb_pd.loc[r0["b_id"], "embedding"], dtype=np.float64)
    assert emb_pd.loc[r0["a_id"], "label"] == 0
    assert emb_pd.loc[r0["b_id"], "label"] == 1
    cos = float(va @ vb / np.sqrt((va @ va) * (vb @ vb)))
    assert abs(cos - r0["cos_sim"]) < 1e-5  # fold vs pairwise-sum tolerance


def test_round_half_away_matches_duckdb_round():
    """round_half_away is the load-bearing cross-engine rounding primitive
    (mmr_rerank + two emb oracles go through it).  Pin its half-away-from-
    zero and 1-ulp-below-tie semantics bit-exact against DuckDB
    CAST(round(x) AS BIGINT) — the floor(x+0.5) bug this replaced rounded
    0.49999999999999994 UP (the +0.5 add carries to exactly 1.0)."""
    import math

    import duckdb
    import numpy as np

    edge = [
        0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 3.5, -3.5,
        0.49999999999999994, -0.49999999999999994,  # 1 ulp below tie
        1.4999999999999998, -1.4999999999999998,
        2.4999999999999996, -2.4999999999999996,
        0.5000000000000001, -0.5000000000000001,  # 1 ulp above tie
        1e15 + 0.5, -(1e15 + 0.5),
        123456789.5, -123456789.5,
        math.nextafter(0.5, 0.0), math.nextafter(0.5, 1.0),
        math.nextafter(2.5, 0.0), math.nextafter(2.5, 3.0),
    ]
    rng = np.random.default_rng(42)
    sweep = list((rng.random(500) - 0.5) * 2e6)  # random doubles ±1e6
    # values engineered to land exactly on .5: integer/2
    sweep += [float(i) / 2.0 for i in range(-41, 42)]
    xs = edge + sweep

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE)) AS BIGINT)", [x]
        ).fetchone()[0]
        for x in xs
    ]
    got_ours = [sim.round_half_away(x) for x in xs]
    mismatches = [
        (x, o, d) for x, o, d in zip(xs, got_ours, got_duck) if o != d
    ]
    assert not mismatches, f"round_half_away != DuckDB round: {mismatches[:5]}"


def test_round_half_away_floor_bug_regression():
    """The specific ulp-boundary input where floor(x+0.5) disagrees with
    std::round/DuckDB: must round toward zero, not away."""
    assert sim.round_half_away(0.49999999999999994) == 0
    assert sim.round_half_away(-0.49999999999999994) == 0
    # the buggy form for contrast (documents why the helper exists)
    import math

    assert math.floor(0.49999999999999994 + 0.5) == 1


def test_hubness_kernel_matches_scalar_fold_reference(spark, emb):
    """The vectorized gram kernel claims bit-exact fold-order cosines:
    recompute k-occurrence with the scalar sequential fold in pure
    Python (the same arithmetic the DuckDB oracle runs) and require
    identical counts."""
    got = {
        (r["vec_id"], r["cell"]): r["k_occurrence"]
        for r in sim.hubness_k_occurrence(emb, dim=64, n_cells=16, k=5).collect()
    }

    assigned = sim.ivf_assign_cells(emb, dim=64, n_cells=16).select(
        "vec_id", "cell", "embedding"
    )
    by_cell = {}
    for r in assigned.collect():
        by_cell.setdefault(r["cell"], []).append(
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        )

    def fold(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc = acc + x * y
        return acc

    want = {}
    for cell, members in by_cell.items():
        members.sort()
        norms = {i: fold(v, v) for i, v in members}
        for s_id, s_vec in members:
            scored = []
            for n_id, n_vec in members:
                if n_id == s_id:
                    continue
                c = fold(n_vec, s_vec) / (norms[n_id] * norms[s_id]) ** 0.5
                scored.append((-sim.round_half_away(c * 1e6), n_id))
            for _, n_id in sorted(scored)[:5]:
                want[(n_id, cell)] = want.get((n_id, cell), 0) + 1
    assert got == want
