import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flapi_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vectors(sf_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    return ids, vecs


def numpy_topk(ids, vecs, n_queries=5, k=10):
    out = {}
    qmask = ids <= n_queries
    cmask = ~qmask
    cids, cvecs = ids[cmask], vecs[cmask]
    cn = cvecs / np.linalg.norm(cvecs, axis=1, keepdims=True)
    for qid, qv in zip(ids[qmask], vecs[qmask]):
        cos = cn @ (qv / np.linalg.norm(qv))
        order = np.lexsort((cids, -cos))[:k]
        out[int(qid)] = [int(cids[i]) for i in order]
    return out


def test_bruteforce_topk_matches_numpy(spark, sf_dir, vectors):
    ids, vecs = vectors
    expected = numpy_topk(ids, vecs)
    got: dict[int, list[int]] = {}
    for r in S.ann_bruteforce_topk(spark, sf_dir).orderBy("qid", "rnk").collect():
        got.setdefault(r.qid, []).append(r.cid)
    assert got == expected


def test_lsh_topk_matches_numpy_replay(spark, sf_dir, vectors):
    """The LSH path is exact *given its candidate set*: replay the same
    planes in numpy, derive the same buckets/candidates, and the top-k
    must match exactly — tests the implementation, not LSH luck."""
    ids, vecs = vectors
    planes = np.array(S.PLANES)  # (12, 64)
    bits = (vecs @ planes.T) > 0
    buckets = (bits.astype(np.int64) << np.arange(S.N_PLANES)).sum(axis=1)

    n_queries, k = 5, 10
    qmask = ids <= n_queries
    expected: dict[int, list[int]] = {}
    for qid, qb, qv in zip(ids[qmask], buckets[qmask], vecs[qmask]):
        ham = np.array([bin(int(b) ^ int(qb)).count("1") for b in buckets])
        cand = (~qmask) & (ham <= 1)
        cids, cvecs = ids[cand], vecs[cand]
        # same arithmetic shape as the engine: dot / (|a|·|b|)
        cos = (cvecs @ qv) / (np.linalg.norm(cvecs, axis=1) * np.linalg.norm(qv))
        order = np.lexsort((cids, -cos))[:k]
        if len(order):  # queries with no bucket-cohabitants yield no rows
            expected[int(qid)] = [int(cids[i]) for i in order]

    got: dict[int, list[int]] = {}
    for r in S.ann_lsh_topk(spark, sf_dir).orderBy("qid", "rnk").collect():
        got.setdefault(r.qid, []).append(r.cid)
    assert got == expected


def test_lsh_buckets_are_stable(spark, sf_dir):
    from flapi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    b1 = {r.vec_id: r.bucket for r in S.lsh_buckets(spark, emb).collect()}
    b2 = {r.vec_id: r.bucket for r in S.lsh_buckets(spark, emb).collect()}
    assert b1 == b2
    assert all(0 <= v < 2**S.N_PLANES for v in b1.values())


def test_ivf_topk_matches_numpy_replay(spark, sf_dir, vectors):
    """IVF is exact *given its cell assignments*: replay the every-25th
    centroid sample + nearest-cell assignment in numpy and the probe
    results must match exactly."""
    ids, vecs = vectors
    n_queries, k, nprobe = 5, 10, 3
    cmask_cent = ids % S.N_CELLS_MOD == 0
    cent_ids, cent_vecs = ids[cmask_cent], vecs[cmask_cent]
    cn = cent_vecs / np.linalg.norm(cent_vecs, axis=1, keepdims=True)

    def cells_for(v, n):
        cos = cn @ (v / np.linalg.norm(v))
        order = np.lexsort((cent_ids, -cos))[:n]
        return {int(cent_ids[i]) for i in order}

    corpus_cell = {
        int(i): next(iter(cells_for(v, 1)))
        for i, v in zip(ids, vecs) if i > n_queries
    }
    expected: dict[int, list[int]] = {}
    qmask = ids <= n_queries
    for qid, qv in zip(ids[qmask], vecs[qmask]):
        probe = cells_for(qv, nprobe)
        cand = [cid for cid, cell in corpus_cell.items() if cell in probe]
        cvecs = np.array([vecs[ids == c][0] for c in cand])
        cos = (cvecs @ qv) / (np.linalg.norm(cvecs, axis=1) * np.linalg.norm(qv))
        order = np.lexsort((np.array(cand), -cos))[:k]
        expected[int(qid)] = [int(np.array(cand)[i]) for i in order]

    got: dict[int, list[int]] = {}
    for r in S.ann_ivf_topk(spark, sf_dir).orderBy("qid", "rnk").collect():
        got.setdefault(r.qid, []).append(r.cid)
    assert got == expected


def test_ivf_recall_scales_with_nprobe(spark, sf_dir):
    """Structural guarantee: probing more cells can only add candidates,
    so recall vs brute force is monotone in nprobe."""
    bf = {(r.qid, r.cid) for r in S.ann_bruteforce_topk(spark, sf_dir).collect()}
    r3 = {(r.qid, r.cid) for r in S.ann_ivf_topk(spark, sf_dir, nprobe=3).collect()}
    r8 = {(r.qid, r.cid) for r in S.ann_ivf_topk(spark, sf_dir, nprobe=8).collect()}
    rec3, rec8 = len(r3 & bf) / len(bf), len(r8 & bf) / len(bf)
    assert rec3 >= 0.10  # ≥ the 3/20 scan fraction on unclustered data
    assert rec8 >= rec3


def test_quantize_error_bounds_and_roundtrip(spark, sf_dir):
    import math

    from flapi_spark.operators.similarity import embedding_quantize_error
    from flapi_spark.session import load_table

    rows = embedding_quantize_error(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    assert len(rows) == emb.count()
    for r in rows:
        assert r.mx >= r.mn
        # per-element error is at most half a quantization step
        step = (r.mx - r.mn) / 255.0
        assert r.sq_err <= 64 * (step / 2) ** 2 + 1e-12
        assert r.sq_err >= 0.0
        assert not math.isnan(r.sq_err)


def test_embedding_pca_power_properties(spark, sf_dir):
    """Power iteration semantics: loadings are unit-norm (pre-round),
    sign-fixed positive first component, eigenvalue positive, and the
    direction is a fixed point (one more iteration moves it < 1e-3)."""
    import math

    from flapi_spark.operators.similarity import embedding_pca_power

    r5 = {x.component: x for x in
          embedding_pca_power(spark, sf_dir, iters=5).collect()}
    v5 = [r5[j].loading for j in sorted(r5)]
    nrm = math.sqrt(sum(x * x for x in v5))
    assert abs(nrm - 1.0) < 1e-4
    assert v5[0] >= 0
    assert r5[1].eigenvalue > 0
    # power iteration on a PSD matrix: the eigenvalue estimate is
    # monotone nondecreasing in the iteration count (direction
    # convergence is slow on this near-isotropic synthetic corpus —
    # small spectral gap — so the Rayleigh monotonicity is the
    # invariant to pin, not a drift bound)
    r6 = {x.component: x for x in
          embedding_pca_power(spark, sf_dir, iters=6).collect()}
    assert r6[1].eigenvalue >= r5[1].eigenvalue - 1e-6


def test_embedding_pca_power_empty_table(spark, tmp_path):
    """An empty embeddings table returns the declared schema with no
    rows — not a TypeError from first() (r5 ADVICE)."""
    from flapi_spark.operators.similarity import embedding_pca_power

    d = tmp_path / "sf_empty"
    d.mkdir()
    spark.createDataFrame(
        [], "id long, embedding array<float>, label long"
    ).write.parquet(str(d / "embeddings.parquet"))
    out = embedding_pca_power(spark, str(d))
    assert out.columns == ["component", "loading", "eigenvalue"]
    assert out.count() == 0


def test_pc_removal_geometry(spark, sf_dir):
    """Removing a unit direction can only shrink norms; |cos| to the
    top PC sits in [0, 1]; the retained share matches the removed/
    original ratio."""
    from flapi_spark.operators.similarity import embedding_pc_removal_stats

    rows = embedding_pc_removal_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.mean_norm_removed <= r.mean_norm + 1e-9
        assert 0.0 <= r.mean_abs_cos_pc <= 1.0
        assert 0.0 < r.norm_retained <= 1.0 + 1e-9
        assert r.n > 0


def test_persisted_ivf_index_probe_matches_self_contained(spark, sf_dir):
    """write_ivf_index + probe equals ann_ivf_topk exactly (same
    centroid arithmetic), the appended batch becomes findable, and the
    index scan is bucketed."""
    from flapi_spark.operators.similarity import (
        ann_ivf_probe_indexed, ann_ivf_topk, append_ivf_index,
        write_ivf_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    emb = load_table(spark, sf_dir, "embeddings")
    table = "t_ivf_index"
    _rm_table(spark, table)
    try:
        write_ivf_index(spark, emb, table)
        queries = emb.where("vec_id <= 5")
        got_df = ann_ivf_probe_indexed(spark, queries, table)
        got = {(r.qid, r.cid, r.rnk) for r in got_df.collect()}
        expect = {(r.qid, r.cid, r.rnk)
                  for r in ann_ivf_topk(spark, sf_dir).collect()}
        assert got == expect and got
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
    finally:
        _rm_table(spark, table)
        _rm_table(spark, table + "__centroids")


def test_append_ivf_index_makes_batch_findable(spark, sf_dir):
    from pyspark.sql import functions as F

    from flapi_spark.operators.similarity import (
        ann_ivf_probe_indexed, append_ivf_index, write_ivf_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    emb = load_table(spark, sf_dir, "embeddings")
    table = "t_ivf_index2"
    _rm_table(spark, table)
    try:
        write_ivf_index(spark, emb.where("vec_id < 400"), table)
        batch = emb.where("vec_id >= 400")
        append_ivf_index(spark, batch, table)
        # probing with a batch member must find itself... it's excluded
        # as a candidate, so instead: a batch vector appears among some
        # query's candidates once appended
        queries = emb.where("vec_id <= 5")
        got = ann_ivf_probe_indexed(spark, queries, table,
                                    k=400, nprobe=8)
        cids = {r.cid for r in got.collect()}
        assert cids & {r.vec_id for r in batch.collect()}
        # frozen centroids: the centroid table is the bootstrap set
        # (no vec_id >= 400 centroid despite 400 % 25 == 0)
        cents = {r.cell_id for r in
                 spark.table(table + "__centroids").collect()}
        assert all(c < 400 for c in cents)
    finally:
        _rm_table(spark, table)
        _rm_table(spark, table + "__centroids")


# --- k-means refinement (round 10c) ------------------------------------------


def numpy_kmeans(ids, vecs, iters=2, mod=25, quant=10**12):
    """Pure-numpy golden twin of kmeans_refine/embedding_kmeans_refine:
    sampled init, (sim desc, cell asc) assignment, quantized-integer
    mean update, drop-empty-cell policy."""
    import numpy as np

    cents = {int(i): vecs[k].copy() for k, i in enumerate(ids) if i % mod == 0}

    def assign(cents):
        cids = sorted(cents)
        C = np.array([cents[c] for c in cids])
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        Vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = Vn @ Cn.T
        # argmax with asc cell_id tiebreak: cids sorted, argmax takes first
        best = sims.argmax(axis=1)
        return {int(i): cids[b] for i, b in zip(ids, best)}

    a = assign(cents)
    a0 = dict(a)
    for _ in range(iters):
        members = {}
        for vid, c in a.items():
            members.setdefault(c, []).append(vid)
        cents = {}
        for c, vids in members.items():
            qs = np.array(
                [
                    [
                        int(np.floor(abs(x) * quant + 0.5)) * (1 if x >= 0 else -1)
                        for x in vecs[list(ids).index(v)]
                    ]
                    for v in vids
                ],
                dtype=object,
            )
            s = qs.sum(axis=0)
            cents[c] = np.array(
                [float(si) / (len(vids) * float(quant)) for si in s]
            )
        a = assign(cents)
    return a0, a


def test_kmeans_refine_matches_numpy_replay(spark, sf_dir, vectors):
    """embedding_kmeans_refine's init and final assignments equal a
    pure-numpy Lloyd replay with the same quantized update."""
    ids, vecs = vectors
    got = {
        r.vec_id: (r.cell_init, r.cell_final, r.moved)
        for r in S.embedding_kmeans_refine(spark, sf_dir).collect()
    }
    a0, a2 = numpy_kmeans(ids, vecs)
    assert len(got) == len(ids)
    for vid in got:
        ci, cf, moved = got[vid]
        assert a0[vid] == ci, (vid, a0[vid], ci)
        assert a2[vid] == cf, (vid, a2[vid], cf)
        assert moved == (ci != cf)
    assert any(m for _, _, m in got.values())  # refinement does move some


def test_kmeans_eval_refinement_improves(spark, sf_dir):
    """Mean member→centroid cosine must not degrade under Lloyd
    refinement (each round weakly improves the k-means objective)."""
    rows = {r.phase: r for r in
            S.embedding_kmeans_eval(spark, sf_dir).collect()}
    assert rows["refined"].mean_cos >= rows["init"].mean_cos
    assert rows["refined"].n_vectors == rows["init"].n_vectors
    assert 0 < rows["refined"].n_cells <= rows["init"].n_cells


def test_write_ivf_index_refined_centroids(spark, sf_dir):
    """refine_iters>0 freezes REFINED centroids; the probe and the
    stateless rowwise assignment (the streaming-guard path) both
    inherit them — rowwise vs windowed assignment stays bit-identical
    on double-array centroids."""
    from flapi_spark.operators.similarity import (
        ann_ivf_probe_indexed, ivf_assign, rowwise_ivf_assign,
        write_ivf_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    emb = load_table(spark, sf_dir, "embeddings")
    table = "t_ivf_index_refined"
    _rm_table(spark, table)
    try:
        write_ivf_index(spark, emb, table, refine_iters=2)
        frozen = spark.table(table + "__centroids")
        # refined centroid = quantized mean, never a raw corpus vector
        assert dict(frozen.dtypes)["centroid"] == "array<double>"
        queries = emb.where("vec_id <= 5")
        got = ann_ivf_probe_indexed(spark, queries, table)
        assert got.count() > 0
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        rowwise = {
            (r.vec_id, r.cell_id)
            for r in rowwise_ivf_assign(emb, frozen.collect()).collect()
        }
        windowed = {
            (r.vec_id, r.cell_id)
            for r in ivf_assign(emb, frozen).collect()
        }
        assert rowwise == windowed
    finally:
        _rm_table(spark, table)
        _rm_table(spark, table + "__centroids")


# --- hybrid RRF retrieval (round 10c) ----------------------------------------


def test_hybrid_rrf_fusion_contract(spark, sf_dir):
    """Per query: k unique candidates, ranks 1..k, the fused score
    reproduces 1/(60+r) per contributing system, and a candidate on
    BOTH top lists outranks equal single-system evidence."""
    rows = S.hybrid_search_rrf(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert by_q
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len({r.cid for r in rs}) == len(rs)
        for r in rs:
            want = 0.0
            if r.lex_rnk != -1:
                want += 1.0 / (60 + r.lex_rnk)
            if r.vec_rnk != -1:
                want += 1.0 / (60 + r.vec_rnk)
            assert abs(r.rrf_score - round(want, 6)) < 1e-9
            assert (r.lex_rnk, r.vec_rnk) != (-1, -1)
    both = [r for r in rows if r.lex_rnk != -1 and r.vec_rnk != -1]
    assert both  # fusion actually fuses on this corpus
    for r in both:
        solo = max(1.0 / (60 + r.lex_rnk), 1.0 / (60 + r.vec_rnk))
        assert r.rrf_score > round(solo, 6) - 1e-9


def test_mmr_matches_greedy_replay(spark, sf_dir, vectors):
    """retrieval_mmr_diversify equals a pure-numpy greedy MMR replay
    over the same cosine pool, and actually diversifies (the MMR pick
    set differs from the plain top-k by relevance for some query)."""
    import numpy as np

    ids, vecs = vectors
    got = {}
    for r in S.retrieval_mmr_diversify(spark, sf_dir).collect():
        got.setdefault(r.qid, []).append((r.step, r.cid))
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    byid = {int(i): norm[k] for k, i in enumerate(ids)}
    diversified = 0
    for qid, picks in got.items():
        picks = [cid for _, cid in sorted(picks)]
        rel = {
            int(i): float(byid[qid] @ byid[int(i)])
            for i in ids if i > 5
        }
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:20]
        sel = [min(pool, key=lambda c: (-rel[c], c))]
        while len(sel) < 5:
            rest = [c for c in pool if c not in sel]
            def score(c):
                ms = max(float(byid[c] @ byid[s]) for s in sel)
                return 0.5 * rel[c] - 0.5 * ms
            sel.append(min(rest, key=lambda c: (-score(c), c)))
        assert picks == sel, (qid, picks, sel)
        if picks != pool[:5]:
            diversified += 1
    assert got and diversified > 0


def test_ivf_recall_eval_refinement_pays(spark, sf_dir):
    """ann_recall_eval_ivf: refined centroids must not lose recall vs
    the raw sample at the same nprobe (and do gain at this SF)."""
    rows = S.ann_recall_eval_ivf(spark, sf_dir).collect()
    mean = {}
    for v in ("sampled", "refined"):
        rs = [r for r in rows if r.variant == v]
        assert rs and all(r.n_true == 10 for r in rs)
        mean[v] = sum(r.n_hits for r in rs) / sum(r.n_true for r in rs)
    assert mean["refined"] >= mean["sampled"]


def test_rankmetrics_anchor_and_ordering(spark, sf_dir):
    """retrieval_eval_rankmetrics: the vector system IS the truth
    (nDCG = MRR = 1 anchor); hybrid recovers strictly more of the
    semantic truth than lexical-only on every query (its list is half
    vector evidence); ndcg/mrr bounded in [0, 1]."""
    rows = S.retrieval_eval_rankmetrics(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.system, {})[r.qid] = r
    assert set(by) == {"vector", "lexical", "hybrid"}
    for r in by["vector"].values():
        assert r.ndcg == 1.0 and r.mrr == 1.0 and r.n_hits == 10
    for qid, h in by["hybrid"].items():
        l = by["lexical"][qid]
        assert h.ndcg >= l.ndcg and h.n_hits >= l.n_hits
        assert 0.0 <= h.ndcg <= 1.0 and 0.0 <= h.mrr <= 1.0
    # fusion recovers a meaningful share of the truth somewhere
    assert any(r.n_hits > 0 for r in by["hybrid"].values())


def test_mmr_hybrid_pool_contract(spark, sf_dir):
    """round 10c: MMR over the hybrid pool — picks come from the
    hybrid top-20, step 1 is the fused top result, the pick set can
    differ from the cosine-pool MMR (the pools differ), and k unique
    selections come back per query."""
    hyb = {}
    for r in S.hybrid_search_rrf(spark, sf_dir, k=20).collect():
        hyb.setdefault(r.qid, {})[r.cid] = (r.rnk, r.rrf_score)
    got = {}
    for r in S.retrieval_mmr_hybrid(spark, sf_dir).collect():
        got.setdefault(r.qid, []).append(r)
    assert set(got) == set(hyb)
    for qid, rs in got.items():
        rs.sort(key=lambda r: r.step)
        assert [r.step for r in rs] == list(range(1, len(rs) + 1))
        assert len({r.cid for r in rs}) == len(rs)
        assert all(r.cid in hyb[qid] for r in rs)
        top = min(hyb[qid], key=lambda c: hyb[qid][c][0])
        assert rs[0].cid == top
        assert abs(rs[0].mmr_score - hyb[qid][top][1]) < 1e-9
