"""ANN similarity search: brute-force cosine top-k + LSH-bucketed variant."""

import numpy as np
import ray.data

from document_text_extraction_ray.stages import similarity as SIM


def _embeddings(n=200, d=16, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d)
    return ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    ), vecs


def test_brute_force_topk_exact():
    ds, vecs = _embeddings()
    queries = vecs[:3]
    out = SIM.brute_force_topk(ds, queries, query_ids=[0, 1, 2], k=5).to_pandas()
    assert len(out) == 15
    # Rank-1 neighbor of each query is itself (cosine 1.0).
    for qid in range(3):
        top = out[(out["query_id"] == qid) & (out["rank"] == 1)].iloc[0]
        assert top["neighbor_id"] == qid
        assert abs(top["cosine"] - 1.0) < 1e-9
    # Matches a full numpy reference computation.
    xn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ref_order = np.argsort(-(xn @ xn[1]))[:5]
    got = out[out["query_id"] == 1].sort_values("rank")["neighbor_id"].tolist()
    assert got == ref_order.tolist()


def test_brute_force_partial_merge_across_blocks():
    ds, vecs = _embeddings(n=500)
    ds = ds.repartition(10)  # force many blocks -> real partial top-k merge
    out = SIM.brute_force_topk(ds, vecs[:1], query_ids=[42], k=10).to_pandas()
    assert len(out) == 10
    assert out["query_id"].unique().tolist() == [42]
    assert out.sort_values("rank")["cosine"].is_monotonic_decreasing


def test_lsh_bucket_topk_finds_self():
    ds, vecs = _embeddings()
    out = SIM.lsh_bucket_topk(ds, vecs[:3], query_ids=[0, 1, 2], k=5).to_pandas()
    # Each query's own vector shares its bucket by construction.
    for qid in range(3):
        mine = out[out["query_id"] == qid]
        assert not mine.empty
        assert mine[mine["rank"] == 1]["neighbor_id"].iloc[0] == qid


def test_lsh_multiprobe_widens_recall():
    """Multiprobe: radius-r candidates are a superset of the exact bucket,
    and recall@k vs brute force is non-decreasing in the radius (strictly
    better in aggregate on gaussian vectors, where true neighbors sit a few
    Hamming bits away)."""
    ds, vecs = _embeddings(n=200, d=16, seed=3)
    q, qids = vecs[:4], [0, 1, 2, 3]
    exact = SIM.brute_force_topk(ds, q, query_ids=qids, k=10).to_pandas()
    recalls = []
    for r in (0, 2, 3):
        lsh = SIM.lsh_bucket_topk(ds, q, qids, k=10, probe_radius=r).to_pandas()
        hits = 0
        for qid in qids:
            truth = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
            got = set(lsh.loc[lsh["query_id"] == qid, "neighbor_id"])
            hits += len(truth & got)
        recalls.append(hits / (10 * len(qids)))
    assert recalls == sorted(recalls)
    assert recalls[-1] > recalls[0]


def test_embedding_dup_pairs():
    rng = np.random.RandomState(0)
    base = rng.randn(8)
    rows = [{"vec_id": 0, "embedding": base.tolist()},
            {"vec_id": 1, "embedding": (base * 2).tolist()},      # cosine 1.0
            {"vec_id": 2, "embedding": (base + rng.randn(8) * 5).tolist()}]
    ds = ray.data.from_items(rows)
    pairs = SIM.embedding_dup_pairs(ds, threshold=0.99).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got
    assert all(0.99 <= c for c in pairs["cosine"])


def test_ivf_topk():
    from document_text_extraction_ray.stages.similarity import ivf_topk

    ds, vecs = _embeddings(n=400, d=16)
    out = ivf_topk(ds, vecs[:3], query_ids=[0, 1, 2], k=5,
                   n_centroids=8, nprobe=3).to_pandas()
    # Each query's own vector lives in its top-1 probed centroid -> found.
    for qid in range(3):
        mine = out[out["query_id"] == qid]
        assert not mine.empty
        assert mine[mine["rank"] == 1]["neighbor_id"].iloc[0] == qid
    # Full-probe IVF degenerates to exact brute force.
    full = ivf_topk(ds, vecs[:2], query_ids=[0, 1], k=5,
                    n_centroids=8, nprobe=8).to_pandas()
    bf = SIM.brute_force_topk(ds, vecs[:2], query_ids=[0, 1], k=5).to_pandas()
    assert full["neighbor_id"].tolist() == bf["neighbor_id"].tolist()


def test_brute_force_topk_boundary_ties_keep_smallest_ids():
    """Duplicate vectors tie at the k-boundary: the partial top-k must keep
    the smallest neighbor ids, not an arbitrary argpartition subset.

    One-hot embeddings make the cosines EXACT floats (1.0 / 0.0) — general
    duplicated vectors can ULP-differ across BLAS column positions, which
    would make exact ties unobservable."""
    def onehot(j):
        v = [0.0] * 8
        v[j] = 1.0
        return v

    rows = [{"vec_id": i, "embedding": onehot(0 if i < 20 else 1)}
            for i in range(30)]  # ids 0..19 all cosine exactly 1.0
    ds = ray.data.from_items(rows).repartition(5)
    out = SIM.brute_force_topk(ds, np.asarray([onehot(0)]), query_ids=[99],
                               k=10).to_pandas()
    assert out.sort_values("rank")["neighbor_id"].tolist() == list(range(10))


def test_exact_dup_pairs_triangle_matches_broadcast():
    """Triangle self-join (no driver materialization, no whole-matrix
    broadcast) == broadcast all-pairs, including with multiple logical
    partitions (rows_per_part forces P>1) and multiple blocks."""
    ds, vecs = _embeddings(n=120, d=8, seed=7)
    ds = ds.repartition(6)
    bc = SIM.exact_dup_pairs(ds, threshold=0.5,
                             strategy="broadcast").to_pandas()
    tr = SIM.exact_dup_pairs(ds, threshold=0.5, strategy="triangle",
                             rows_per_part=32).to_pandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"]))
    assert key(tr) == key(bc)
    assert len(bc) > 0
    assert (tr["id_a"] < tr["id_b"]).all()


def test_exact_dup_pairs_triangle_single_partition():
    ds, _ = _embeddings(n=20, d=8, seed=9)
    bc = SIM.exact_dup_pairs(ds, threshold=0.4,
                             strategy="broadcast").to_pandas()
    tr = SIM.exact_dup_pairs(ds, threshold=0.4,
                             rows_per_part=4096).to_pandas()
    key = lambda df: sorted(zip(df["id_a"], df["id_b"]))
    assert key(tr) == key(bc)


def test_semdedup_keep_first_within_cluster():
    """Planted near-identical vectors collapse to the smallest id; vectors
    below eps survive; blocking (block < cluster size) changes nothing."""
    rng = np.random.RandomState(21)
    base = rng.randn(40, 8)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # ids 100/101 duplicate vec 5 exactly; id 102 is a tiny perturbation of
    # vec 7 (cosine ~0.9999); all must be removed at eps=0.99
    rows.append({"vec_id": 100, "embedding": base[5].tolist()})
    rows.append({"vec_id": 101, "embedding": base[5].tolist()})
    near = base[7] + 1e-3 * rng.randn(8)
    rows.append({"vec_id": 102, "embedding": near.tolist()})
    ds = ray.data.from_items(rows).repartition(4)
    out = SIM.semdedup(ds, eps=0.99, n_centroids=4, block=8).to_pandas()
    surv = set(out["vec_id"])
    assert surv == set(range(40))          # originals kept, copies removed
    assert len(out) == len(surv)

    # blocked vs unblocked plans agree
    out2 = SIM.semdedup(ds, eps=0.99, n_centroids=4, block=4096).to_pandas()
    assert set(out2["vec_id"]) == surv


def test_embedding_centroids_integer_exact():
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import (
        embedding_centroids,
    )

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 8).astype(np.float32) / 3
    labels = (np.arange(200) % 5).astype(np.int64)
    ds = rd.from_items([
        {"label": int(l), "embedding": v.tolist()}
        for l, v in zip(labels, vecs)
    ])
    out = embedding_centroids(ds, n_buckets=4).to_pandas()

    m = vecs.astype(np.float64) * 1_000_000
    ints = np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(np.int64)
    for lab in range(5):
        sel = ints[labels == lab]
        for d in range(8):
            row = out[(out["label"] == lab) & (out["dim"] == d + 1)]
            assert int(row["sum_e6"].iloc[0]) == int(sel[:, d].sum())
            assert int(row["n_vecs"].iloc[0]) == len(sel)
    assert len(out) == 40


def test_random_projection_exact_and_jl_property():
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import random_projection

    rng = np.random.default_rng(3)
    n, d, k = 200, 64, 8
    mat = rng.normal(size=(n, d)).astype(np.float32)
    ds = rd.from_items([
        {"vec_id": int(i), "embedding": mat[i].tolist()} for i in range(n)])
    out = random_projection(ds, out_dim=k).to_pandas() \
        .sort_values(["vec_id", "dim"])
    proj = out["proj"].to_numpy().reshape(n, k)

    # Exact integer replay: quantize then matmul with the same sign matrix.
    m = mat.astype(np.float64) * 1_000_000
    xq = np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(np.int64)
    i = np.arange(1, d + 1, dtype=np.int64)[:, None]
    j = np.arange(1, k + 1, dtype=np.int64)[None, :]
    v = i * 64 + j
    h = (v * v * 2654435761 % 4294967296) // 65536 % 6
    signs = np.where(h == 0, 1, np.where(h == 1, -1, 0)).astype(np.int64)
    assert (proj == xq @ signs).all()
    # Achlioptas density holds (roughly 1/6 each sign)
    assert 0.08 < (signs == 1).mean() < 0.26
    assert 0.08 < (signs == -1).mean() < 0.26


def test_random_projection_separates_clusters():
    """The JL property that matters for ANN: pairs from the same tight
    cluster stay closer in projected space than cross-cluster pairs.
    (A distance-correlation check on isotropic Gaussian data is
    uninformative at k=8 — even a TRUE Gaussian projection scores
    corr ~0.25 there because high-d distances concentrate.)"""
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import random_projection

    rng = np.random.default_rng(5)
    n, d, k = 120, 64, 8
    centers = rng.normal(size=(2, d)) * 6.0
    labels = np.repeat([0, 1], n // 2)
    mat = (centers[labels] + rng.normal(size=(n, d)) * 0.5).astype(np.float32)
    ds = rd.from_items([
        {"vec_id": int(i), "embedding": mat[i].tolist()} for i in range(n)])
    out = random_projection(ds, out_dim=k).to_pandas() \
        .sort_values(["vec_id", "dim"])
    proj = out["proj"].to_numpy().reshape(n, k).astype(np.float64)

    within = np.linalg.norm(proj[1] - proj[3:n // 2:7], axis=1)
    across = np.linalg.norm(proj[1] - proj[n // 2 + 3::7], axis=1)
    assert within.max() < across.min()


def test_embedding_quantize_bounds_and_zero_vector():
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import embedding_quantize

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(50, 16)).astype(np.float32)
    mat[7] = 0.0                                 # zero vector
    ds = rd.from_items([
        {"vec_id": int(i), "embedding": mat[i].tolist()} for i in range(50)])
    out = embedding_quantize(ds).to_pandas().sort_values(["vec_id", "dim"])
    q = out["q"].to_numpy().reshape(50, 16)
    assert np.abs(q).max() <= 127
    # max-abs element of each nonzero vector maps to +/-127
    for i in range(50):
        if i == 7:
            assert (q[i] == 0).all()
        else:
            assert np.abs(q[i]).max() == 127
    # reconstruction error bounded by half a quantization step
    ma = np.abs(mat.astype(np.float64)).max(axis=1, keepdims=True)
    ma[7] = 1.0
    err = np.abs(q / 127.0 * ma - mat.astype(np.float64))
    assert err.max() <= ma.max() / 127.0 / 2 + 1e-12


def test_persisted_ivf_index_roundtrip(tmp_path):
    """Build-to-parquet + search-from-storage: full-probe search equals
    brute force exactly; pruned search reads only its probed list dirs and
    still finds each query's own vector."""
    import glob
    import os

    from document_text_extraction_ray.stages.similarity import (
        build_ivf_index, search_ivf_index,
    )

    ds, vecs = _embeddings(n=400, d=16)
    base = str(tmp_path / "ivf")
    build_ivf_index(ds, base, n_centroids=8)
    # layout: tiny centroid table + one dir per non-empty list
    assert os.path.exists(os.path.join(base, "centroids.parquet"))
    assert glob.glob(os.path.join(base, "lists", "part=*", "*.parquet"))

    full = search_ivf_index(base, vecs[:2], [0, 1], k=5, nprobe=8).to_pandas()
    bf = SIM.brute_force_topk(ds, vecs[:2], query_ids=[0, 1], k=5).to_pandas()
    assert full["neighbor_id"].tolist() == bf["neighbor_id"].tolist()

    pruned = search_ivf_index(base, vecs[:3], [0, 1, 2], k=5,
                              nprobe=3).to_pandas()
    for qid in range(3):
        mine = pruned[pruned["query_id"] == qid]
        assert mine[mine["rank"] == 1]["neighbor_id"].iloc[0] == qid


def test_embedding_gram_equals_numpy_reference():
    """Gram partials merged across batches equal the single-matrix
    quantized numpy product; upper triangle only, 1-based dims."""
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import embedding_gram

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 6)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(len(vecs))]
    out = embedding_gram(rd.from_items(rows), scale=1000) \
        .to_pandas().sort_values(["i", "j"]).reset_index(drop=True)

    m = vecs.astype(np.float64) * 1000
    q = np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5)).astype(np.int64)
    ref = q.T @ q
    iu, ju = np.triu_indices(6)
    assert len(out) == len(iu)
    for k in range(len(iu)):
        row = out.iloc[k]
        assert (row["i"], row["j"]) == (iu[k] + 1, ju[k] + 1)
        assert row["sxy"] == ref[iu[k], ju[k]]


def test_mutual_top1_pairs_matches_brute_force(ray_session):
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import (
        mutual_top1_pairs,
    )

    # deterministic vectors with planted reciprocal pairs
    rng = np.random.RandomState(7)
    n, d = 40, 8
    base = rng.randn(n, d)
    base[11] = base[10] + 0.01  # mutual pair by construction
    base[23] = base[22] + 0.01
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(n)]

    # integer-quantized reference
    v = base * 10**4
    q = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)
    sims = q @ q.T
    np.fill_diagonal(sims, np.iinfo(np.int64).min)
    best = sims.argmax(axis=1)  # first max = smallest id on ties
    ref = {}
    for a in range(n):
        b = best[a]
        if best[b] == a and a < b:
            ref[(a, int(b))] = int(sims[a, b])
    assert ref  # planted pairs exist

    ds = rd.from_items(rows)
    out = mutual_top1_pairs(ds, rows_per_part=7, n_buckets=4).to_pandas()
    got = {(int(r.id_a), int(r.id_b)): int(r.sim_q)
           for r in out.itertuples()}
    assert got == ref


def test_embedding_dim_stats_matches_reference(ray_session):
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import (
        embedding_dim_stats,
    )

    rng = np.random.RandomState(5)
    v = rng.randn(50, 6)
    rows = [{"vec_id": i, "embedding": v[i].tolist()} for i in range(50)]
    out = embedding_dim_stats(rd.from_items(rows)).to_pandas() \
        .set_index("dim").sort_index()
    x = v * 10**4
    q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
    for d in range(6):
        assert out.loc[d, "n_rows"] == 50
        assert out.loc[d, "sum_q"] == q[:, d].sum()
        assert out.loc[d, "sum_sq"] == (q[:, d] ** 2).sum()


def test_mmr_topk_matches_brute_force(ray_session):
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import mmr_topk

    rng = np.random.RandomState(3)
    v = rng.randn(30, 8)
    v[7] = v[0] * 0.95          # near-duplicate of the most relevant
    rows = [{"vec_id": i, "embedding": v[i].tolist()} for i in range(30)]
    out = mmr_topk(rd.from_items(rows), v[0].tolist(), k=3, lambda_x2=1)

    def quant(a):
        x = np.asarray(a) * 10**4
        return np.where(x >= 0, np.floor(x + 0.5),
                        np.ceil(x - 0.5)).astype(np.int64)

    q = quant(v[0])
    vq = np.stack([quant(v[i]) for i in range(30)])
    sel, ref = [], []
    for rank in range(1, 4):
        score = vq @ q
        if sel:
            score = score - (vq @ vq[sel].T).max(axis=1)
        best = None
        for i in range(30):
            if i in sel:
                continue
            key = (-int(score[i]), i)
            if best is None or key < best:
                best = key
        ref.append((rank, best[1], -best[0]))
        sel.append(best[1])
    got = [(int(r), int(i), int(s)) for r, i, s in
           zip(out["rank"], out["id"], out["score"])]
    assert got == ref
    assert got[0][1] == 0                      # query's own vector first
    assert all(i != 7 for _, i, _ in got)      # near-dup suppressed


def test_hard_negative_topk_exclusion_rules():
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.similarity import (
        hard_negative_topk,
    )

    # query 0 (label 0); corpus: 1 = near-identical (excluded by hi_dot),
    # 2 = same label (excluded as positive), 3/4/5 = genuine negatives
    # with descending dots.
    vecs = {
        0: [1.0, 0.0], 1: [0.999, 0.04], 2: [0.9, 0.1],
        3: [0.8, 0.6], 4: [0.6, 0.8], 5: [0.1, 0.9],
    }
    labels = {0: 0, 1: 1, 2: 0, 3: 1, 4: 2, 5: 1}
    ds = rd.from_items([
        {"vec_id": i, "embedding": v, "label": labels[i]}
        for i, v in vecs.items()
    ])
    out = hard_negative_topk(
        ds, np.array([vecs[0]]), [0], [0], k=2,
        hi_dot=int(0.99 * 10**8), n_buckets=2,
    ).to_pandas().sort_values("rnk")
    # 1 excluded (dot ~0.999e8 >= hi), 2 excluded (same label),
    # top-2 negatives by dot: 3 then 4
    assert out["neighbor_id"].tolist() == [3, 4]
    assert out["rnk"].tolist() == [1, 2]
    assert (out["dot_q"] < 0.99 * 10**8).all()
