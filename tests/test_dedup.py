import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flapi_spark.operators import dedup as D


def write_docs(tmp_path, texts):
    """Write a synthetic documents.parquet so operators can run on a
    controlled corpus via their (spark, sf_dir) interface."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["synthetic"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


BASE = (
    "the quick brown fox jumps over the lazy dog while a cat naps "
    "near the warm stove and a bird sings in the tall green tree"
)


def test_exact_dedup_groups_copies(spark, tmp_path):
    sf = write_docs(
        tmp_path,
        [BASE, BASE, "  " + BASE.upper() + "  ", "something else entirely", BASE + " extra"],
    )
    out = {r.canonical_id: r.n_copies for r in D.dedup_exact(spark, sf).collect()}
    # doc 1,2,3 normalize identically (case/whitespace fold)
    assert out[1] == 3
    assert out[4] == 1 and out[5] == 1
    survivors = {r.doc_id for r in D.dedup_exact_survivors(spark, sf).collect()}
    assert survivors == {1, 4, 5}


def test_ngram_jaccard_flags_near_dups(spark, tmp_path):
    near = BASE.replace("lazy", "sleepy")
    sf = write_docs(tmp_path, [BASE, near, "totally different words here only"])
    pairs = D.dedup_ngram_jaccard(spark, sf, threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 2) in got
    assert all(p in {(1, 2)} for p in got)


def brute_force_pairs(spark, sf, threshold):
    sh = D._shingles(spark, sf)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sb"))
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    return {
        (r.doc_a, r.doc_b): r.j
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("j"))
        .where(F.col("j") >= threshold)
        .collect()
    }


def test_minhash_lsh_recall_and_precision(spark, sf_dir, tmp_path):
    # controlled corpus: strong near-dups + noise docs
    texts = [BASE]
    texts.append(BASE.replace("lazy", "sleepy"))  # j ~ high
    texts.append(BASE.replace("quick brown", "slow red"))
    texts.append(BASE + " and then some more words appear at the end here")
    texts += [
        f"unrelated document number {i} with its own distinct vocabulary set {i * 7}"
        for i in range(20)
    ]
    sf = write_docs(tmp_path, texts)

    found = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.dedup_minhash_lsh(spark, sf, threshold=0.5).collect()
    }
    strong_truth = brute_force_pairs(spark, sf, threshold=0.8)
    # recall: every strong near-dup pair must be caught (16 bands x 4
    # rows ⇒ P[miss | j>=0.8] < 1e-3)
    assert set(strong_truth) <= set(found)
    # precision: everything reported really has verified jaccard >= 0.5
    truth_all = brute_force_pairs(spark, sf, threshold=0.5)
    assert set(found) <= set(truth_all)
    for pair, j in found.items():
        assert abs(truth_all[pair] - j) < 1e-12


def test_simhash_identical_and_near(spark, tmp_path):
    near = BASE.replace("lazy", "sleepy")
    sf = write_docs(tmp_path, [BASE, BASE, near, "completely different text corpus"])
    fps = {r.doc_id: (r.hi, r.lo) for r in D.simhash_fingerprints(spark, sf).collect()}
    assert fps[1] == fps[2]  # identical text → identical fingerprint
    assert 0 <= fps[1][0] < 2**32 and 0 <= fps[1][1] < 2**32
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.dedup_simhash(spark, sf, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs  # one-word change stays within hamming 10


def test_embedding_cosine_pairs_ordered_and_thresholded(spark, sf_dir):
    out = D.dedup_embedding_cosine(spark, sf_dir, threshold=0.4)
    rows = out.collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.cosine >= 0.4 for r in rows)


def test_embedding_lsh_is_subset_with_decent_recall(spark, sf_dir):
    """LSH-blocked embedding dedup must report only true pairs
    (cosine >= threshold, verified exactly) and — given Hamming-<=1
    probing over 12 planes — recover a meaningful fraction of the
    exact operator's pairs."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in D.dedup_embedding_cosine(spark, sf_dir, threshold=0.4).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in D.dedup_embedding_lsh(spark, sf_dir, threshold=0.4).collect()
    }
    assert set(lsh) <= set(exact)  # precision 1.0: every pair is real
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9  # same exact cosine values
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.3, f"recall {recall}"


def test_embedding_lsh_bucket_cap_bounds_candidates(spark, sf_dir):
    """The max_bucket_size guard: capped output is a subset of the
    uncapped one (precision stays 1.0), and a tiny cap prunes overfull
    buckets so candidate volume shrinks on the isotropic corpus."""
    full = {
        (r.vec_a, r.vec_b)
        for r in D.dedup_embedding_lsh(spark, sf_dir, threshold=0.4).collect()
    }
    capped = {
        (r.vec_a, r.vec_b)
        for r in D.dedup_embedding_lsh(
            spark, sf_dir, threshold=0.4, max_bucket_size=8
        ).collect()
    }
    assert capped <= full
    # a permissive cap (bigger than any bucket) changes nothing
    loose = {
        (r.vec_a, r.vec_b)
        for r in D.dedup_embedding_lsh(
            spark, sf_dir, threshold=0.4, max_bucket_size=10**6
        ).collect()
    }
    assert loose == full


def test_label_components_chain_logn_rounds(spark):
    """Adversarial deep component: a 500-node path graph (the
    serialized/chained-boilerplate shape). Min-label propagation
    needs diameter=499 rounds; large-star/small-star must finish
    within ~2·log2(n) rounds (18 for n=500) AND produce correct
    min-labels."""
    from flapi_spark.operators.dedup import label_components

    n = 500
    chain = [(i, i + 1) for i in range(1, n)]
    # a second, disjoint component with a non-trivial min (ids 10_000+)
    blob = [(10_000 + a, 10_000 + b) for a, b in
            [(1, 2), (2, 3), (1, 3), (3, 4)]]
    pairs = spark.createDataFrame(chain + blob, ["doc_a", "doc_b"])
    out = label_components(pairs, max_iterations=18)
    labels = {r.doc_id: r.component_id for r in out.collect()}
    assert len(labels) == n + 4
    assert all(labels[i] == 1 for i in range(1, n + 1))
    assert all(labels[10_000 + i] == 10_001 for i in range(1, 5))


def test_label_components_nonconvergence_raises(spark):
    """Truncated labels are WRONG labels: running out of rounds must
    raise, never silently emit the partial fixpoint."""
    from flapi_spark.operators.dedup import label_components

    chain = [(i, i + 1) for i in range(1, 200)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        label_components(pairs, max_iterations=1)


def test_label_components_empty_and_reversed_pairs(spark):
    """Empty pair stream returns an empty (doc_id, component_id)
    frame; duplicate + reversed + self pairs collapse to the same
    canonical labeling."""
    from flapi_spark.operators.dedup import label_components

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = label_components(empty)
    assert out.columns == ["doc_id", "component_id"]
    assert out.count() == 0

    messy = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (3, 2), (5, 5), (7, 6)],
        ["doc_a", "doc_b"],
    )
    labels = {r.doc_id: r.component_id
              for r in label_components(messy).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 5: 5, 6: 6, 7: 6}


def test_label_components_random_graph_equals_union_find(spark):
    """Seeded random multigraph (cycles, stars, cross-links, dups,
    reversed edges) vs a pure-Python union-find with min-id roots —
    the ground truth for arbitrary topology, not just paths. Also
    pins checkpoint_pairs=False to the identical labeling (it is a
    materialization knob, not a semantic one)."""
    import random

    from flapi_spark.operators.dedup import label_components

    rng = random.Random(1137)
    nodes = rng.sample(range(1, 100_000), 400)
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(600)
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # keep the smaller root so labels are component minima
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    expected = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.doc_id: r.component_id
        for r in label_components(pairs).collect()
    }
    assert got == expected
    got_nockpt = {
        r.doc_id: r.component_id
        for r in label_components(
            pairs.localCheckpoint(), checkpoint_pairs=False
        ).collect()
    }
    assert got_nockpt == expected


def test_minhash_components_cover_their_pairs(spark, sf_dir):
    """Scale-path clustering: components over the MinHash pair stream
    place both endpoints of every candidate pair in one component."""
    from flapi_spark.operators.dedup import label_components

    pairs = D.dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    comp = {r.doc_id: r.component_id
            for r in label_components(pairs).collect()}
    collected = pairs.collect()
    assert collected
    for r in collected:
        assert comp[r.doc_a] == comp[r.doc_b]


def test_chunk_boilerplate_chunks_are_real_spans(spark, sf_dir):
    from pyspark.sql import functions as F

    from flapi_spark.operators.dedup import dedup_chunk_boilerplate
    from flapi_spark.operators.text import norm_text
    from flapi_spark.session import load_table

    out = dedup_chunk_boilerplate(spark, sf_dir).collect()
    assert out  # the synthetic corpus contains injected near-dups
    docs = load_table(spark, sf_dir, "documents").select(
        norm_text().alias("nt")
    ).collect()
    texts = [r.nt for r in docs]
    for row in out[:5]:
        assert row.n_docs >= 2
        assert row.n_occur >= row.n_docs
        assert len(row.chunk.split(" ")) == 5
        # chunk text genuinely occurs in at least n_docs documents
        assert sum(1 for t in texts if row.chunk in t) >= row.n_docs


def test_minhash_portable_matches_pipeline_semantics(spark, sf_dir):
    from flapi_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_minhash_portable,
    )

    rows = dedup_minhash_portable(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.5 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b
    # deterministic across runs
    again = {(r.doc_a, r.doc_b) for r in
             dedup_minhash_portable(spark, sf_dir).collect()}
    assert {(r.doc_a, r.doc_b) for r in rows} == again
    # the two hash families find substantially the same verified pairs
    # (identical banding params; only the token-hash differs)
    xx = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf_dir).collect()}
    pt = {(r.doc_a, r.doc_b) for r in rows}
    inter = len(xx & pt)
    assert inter >= 0.7 * max(len(xx), 1)


def test_simhash_portable_same_shape_as_default(spark, sf_dir):
    from flapi_spark.operators.dedup import (
        dedup_simhash,
        dedup_simhash_portable,
        simhash_fingerprints_portable,
    )

    fps = {r.doc_id: (r.hi, r.lo) for r in
           simhash_fingerprints_portable(spark, sf_dir).collect()}
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32
               for hi, lo in fps.values())
    pairs = dedup_simhash_portable(spark, sf_dir).collect()
    for r in pairs[:20]:
        ha, la = fps[r.doc_a]
        hb, lb = fps[r.doc_b]
        d = bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")
        assert d == r.hamming <= 6
    # identical distinct-token sets => hamming 0 under BOTH families
    # (hamming-0 pairs that are mere fingerprint collisions may differ)
    from flapi_spark.operators.dedup import _doc_tokens

    tok_sets = {r.doc_id: frozenset(r.toks)
                for r in _doc_tokens(spark, sf_dir).collect()}
    same_set = {
        (a, b)
        for a in tok_sets for b in tok_sets
        if a < b and tok_sets[a] == tok_sets[b]
    }
    assert same_set  # the corpus contains exact dups
    exact_default = {(r.doc_a, r.doc_b)
                     for r in dedup_simhash(spark, sf_dir).collect()
                     if r.hamming == 0}
    exact_portable = {(r.doc_a, r.doc_b) for r in pairs if r.hamming == 0}
    assert same_set <= exact_default
    assert same_set <= exact_portable


def test_keep_best_survivors_policy(spark, sf_dir):
    from flapi_spark.operators.dedup import dedup_keep_best_survivors

    rows = dedup_keep_best_survivors(spark, sf_dir).collect()
    assert len(rows) == 500  # every doc labeled, none dropped silently
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    multi = [c for c in by_comp.values() if len(c) > 1]
    assert multi  # the corpus has near-dup clusters
    for members in by_comp.values():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1
        best = max(members, key=lambda m: (m.n_tokens, -m.doc_id))
        assert keepers[0].doc_id == best.doc_id


def test_incremental_pairs_equal_full_recompute_on_delta(spark, sf_dir):
    """Splitting the corpus 80/20 and running the incremental operator
    on the 20% delta must find EXACTLY the full-recompute pairs that
    touch at least one new doc (same LSH bands, same Jaccard verify)."""
    from flapi_spark.operators.dedup import (
        dedup_incremental_pairs,
        dedup_minhash_lsh,
    )
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    cutoff = int(docs.agg(F.expr("percentile(doc_id, 0.8)")).first()[0])
    existing = docs.where(F.col("doc_id") <= cutoff)
    new = docs.where(F.col("doc_id") > cutoff)
    assert new.count() > 0

    inc = {
        (r.doc_a, r.doc_b)
        for r in dedup_incremental_pairs(spark, existing, new).collect()
    }
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
        if r.doc_a > cutoff or r.doc_b > cutoff
    }
    assert inc == full


def test_rowwise_minhash_matches_exploded_pipeline(spark, sf_dir):
    """The streaming-safe per-row signature builder must produce
    exactly the signatures of the exploded groupBy pipeline."""
    from flapi_spark.operators.dedup import (
        NUM_PERM,
        hashed_shingles_from,
        minhash_signatures_from_hashed,
        rowwise_minhash,
    )
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = minhash_signatures_from_hashed(hashed_shingles_from(docs))
    b = rowwise_minhash(docs).drop("hs")
    cols = ["doc_id"] + [f"m{i}" for i in range(NUM_PERM)]
    assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_containment_pairs_direction_semantics(spark, tmp_path):
    """A doc whose shingles are a strict subset of a longer doc's must
    surface with containment 1.0 in the subset direction and < 1 in
    the other; an unrelated doc must not pair."""
    d = tmp_path / "docs"
    long_text = "alpha beta gamma delta epsilon zeta eta theta"
    sub_text = "alpha beta gamma delta"            # prefix -> subset shingles
    other = "one two three four five six seven"
    spark.createDataFrame(
        [(1, long_text, "en", "s", len(long_text)),
         (2, sub_text, "en", "s", len(sub_text)),
         (3, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    from flapi_spark.operators.dedup import dedup_containment_pairs

    rows = dedup_containment_pairs(spark, str(d)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # doc 2's shingle set is contained in doc 1's
    assert r.containment_b_in_a == 1.0
    assert r.containment_a_in_b < 1.0
    assert not any(3 in p for p in pairs)


def test_persisted_band_index_flow_matches_self_contained(spark, sf_dir):
    """Bootstrap the bucketed band index on the existing corpus,
    append a batch, probe: pairs equal dedup_incremental_pairs'
    self-contained recompute; and the index side of the candidate
    join is a BUCKETED scan with no index-side exchange."""
    from pyspark.sql import functions as F

    from flapi_spark.operators.dedup import (
        append_band_index, dedup_incremental_pairs,
        incremental_pairs_indexed, write_band_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.where("doc_id % 10 != 0")
    batch = docs.where("doc_id % 10 = 0")
    table = "t_band_index"
    _rm_table(spark, table)
    try:
        write_band_index(spark, existing, table)
        # probe BEFORE the append: the new x new arm must cover
        # intra-batch pairs regardless of index state
        pre = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in incremental_pairs_indexed(
                spark, docs, batch, table
            ).collect()
        }
        append_band_index(spark, batch, table)
        persistent = spark.sparkContext._jsc.sc().getPersistentRDDs()
        cached_before = persistent.size()
        got_df = incremental_pairs_indexed(
            spark, docs, batch, table
        )
        # cache-lifecycle: the per-batch call released its candidate
        # cache (r5 ADVICE) — at most the returned result's own
        # localCheckpoint blocks remain
        cached_after = spark.sparkContext._jsc.sc() \
            .getPersistentRDDs().size()
        assert cached_after <= cached_before + 1
        got = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
               for r in got_df.collect()}
        expect = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in dedup_incremental_pairs(
                spark, existing, batch
            ).collect()
        }
        assert got == expect and got
        assert pre == expect  # order-independent of the append
        # plan: the index read is bucketed (pre-co-located on the
        # probe key) — Spark reports the scan as bucketed and the
        # index side needs no exchange before the candidate join
        # (inspected on the lazy builder; the public wrapper returns
        # a checkpointed result whose plan is an RDD scan)
        from flapi_spark.operators.dedup import (
            _incremental_pairs_indexed_plan,
        )

        lazy_df, lazy_cands = _incremental_pairs_indexed_plan(
            spark, docs, batch, table
        )
        try:
            plan = lazy_df._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
        finally:
            lazy_cands.unpersist()
    finally:
        _rm_table(spark, table)


def test_pairs_from_band_index_equals_portable_chain(spark, sf_dir):
    """Persisted-index-fed pair stream (round 7): the bucketed
    portable band index self-join + shared verify must be
    bit-identical to the self-contained dedup_minhash_portable chain,
    and the candidate join must read BOTH sides as bucketed scans
    (zero index-side exchange) even with broadcast disabled."""
    from flapi_spark.operators.dedup import (
        dedup_minhash_portable, pairs_from_band_index,
        write_band_index_portable,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    table = "t_bands_portable"
    _rm_table(spark, table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        docs = load_table(spark, sf_dir, "documents")
        write_band_index_portable(spark, docs, table)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        got_df = pairs_from_band_index(spark, docs, table)
        got = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
               for r in got_df.collect()}
        expect = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
                  for r in dedup_minhash_portable(spark, sf_dir).collect()}
        assert got == expect and got
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        # the self-join reads the index twice, both scans bucketed —
        # no exchange is needed on either side of the candidate join
        # (the AQE string repeats subtrees across Final/Initial plan
        # sections, so assert presence, not an exact count)
        assert plan.count("Bucketed: true") >= 2
        assert "SelectedBucketsCount: 16 out of 16" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        _rm_table(spark, table)


def test_incremental_pairs_store_backed_verify(spark, sf_dir):
    """Round 8: incremental_pairs_indexed(shingle_store=) — the
    corpus appears NOWHERE in the per-batch plan (bands from the
    bucketed index, corpus verify sets from the bucketed store, batch
    sets delta-sized); pairs equal the self-contained recompute both
    before and after the maintenance appends."""
    from flapi_spark.operators.dedup import (
        append_band_index, append_shingle_store,
        dedup_incremental_pairs, incremental_pairs_indexed,
        write_band_index, write_shingle_store,
        _incremental_pairs_indexed_plan,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.where("doc_id % 10 != 0")
    batch = docs.where("doc_id % 10 = 0")
    btable, stable_ = "t_band_idx_sv8", "t_shingles_sv8"
    for t in (btable, stable_):
        _rm_table(spark, t)
    try:
        write_band_index(spark, existing, btable)
        write_shingle_store(spark, existing, stable_)
        expect = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in dedup_incremental_pairs(
                spark, existing, batch
            ).collect()
        }
        # probe BEFORE append
        pre = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in incremental_pairs_indexed(
                spark, None, batch, btable, shingle_store=stable_
            ).collect()
        }
        assert pre == expect and pre
        # plan: zero corpus presence
        lazy_df, lazy_cands = _incremental_pairs_indexed_plan(
            spark, None, batch, btable, shingle_store=stable_
        )
        try:
            plan = lazy_df._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Bucketed: true") >= 1
        finally:
            lazy_cands.unpersist()
        # probe AFTER both appends — anti-join dedups the store rows
        append_band_index(spark, batch, btable)
        append_shingle_store(spark, batch, stable_)
        post = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in incremental_pairs_indexed(
                spark, None, batch, btable, shingle_store=stable_
            ).collect()
        }
        assert post == expect
        import pytest as _pytest
        with _pytest.raises(ValueError, match="all_docs is required"):
            incremental_pairs_indexed(spark, None, batch, btable)
    finally:
        for t in (btable, stable_):
            _rm_table(spark, t)


def test_pairs_fully_index_resident_with_shingle_store(spark, sf_dir):
    """Round 8: with the portable shingle store the persisted-index
    pair stream touches NO raw documents — rows stay bit-identical to
    the self-contained chain, the plan reads three bucketed scans
    (band index twice + store) and documents.parquet never appears;
    appends keep store and chain in lockstep."""
    from flapi_spark.operators.dedup import (
        append_shingle_store_portable, dedup_minhash_portable,
        pairs_from_band_index, write_band_index_portable,
        write_shingle_store_portable,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    btable, stable_ = "t_bands_p8", "t_shingles_p8"
    for t in (btable, stable_):
        _rm_table(spark, t)
    try:
        docs = load_table(spark, sf_dir, "documents")
        write_band_index_portable(spark, docs, btable)
        # bootstrap the store on HALF the corpus, append the rest —
        # exercises the insertInto maintenance path in the same run
        write_shingle_store_portable(
            spark, docs.where("doc_id % 2 = 0"), stable_
        )
        append_shingle_store_portable(
            spark, docs.where("doc_id % 2 = 1"), stable_
        )
        got_df = pairs_from_band_index(
            spark, None, btable, shingle_store=stable_
        )
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "documents.parquet" not in plan  # index-resident
        assert plan.count("Bucketed: true") >= 2
        got = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
               for r in got_df.collect()}
        expect = {(r.doc_a, r.doc_b, round(r.jaccard, 9))
                  for r in dedup_minhash_portable(spark, sf_dir).collect()}
        assert got == expect and got
        # docs required when no store given
        import pytest as _pytest
        with _pytest.raises(ValueError, match="docs is required"):
            pairs_from_band_index(spark, None, btable)
    finally:
        for t in (btable, stable_):
            _rm_table(spark, t)


def test_pagerank_kcore_indexed_twins_match_chain(spark, sf_dir):
    """Round-8 twins: pagerank_indexed / kcore_indexed (registry) fed
    from the persisted band index must return exactly the rows of the
    same algorithms fed from the self-contained portable-MinHash
    chain, and the pair source must plan as bucketed scans (the index
    changes the physical strategy, never the rows)."""
    from flapi_spark.operators.dedup import (
        dedup_minhash_portable, pairs_from_band_index,
        write_band_index_portable,
    )
    from flapi_spark.operators.graph import (
        kcore_decompose, pagerank_fixed_point,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    table = "t_bands_portable_graph"
    _rm_table(spark, table)
    try:
        docs = load_table(spark, sf_dir, "documents")
        write_band_index_portable(spark, docs, table)
        idx_pairs = pairs_from_band_index(spark, docs, table).select(
            "doc_a", "doc_b"
        )
        plan = idx_pairs._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Bucketed: true") >= 2
        chain_pairs = dedup_minhash_portable(spark, sf_dir).select(
            "doc_a", "doc_b"
        )
        got_pr = {(r.doc_id, r.pr_scaled)
                  for r in pagerank_fixed_point(idx_pairs).collect()}
        exp_pr = {(r.doc_id, r.pr_scaled)
                  for r in pagerank_fixed_point(chain_pairs).collect()}
        assert got_pr == exp_pr and got_pr
        got_kc = {(r.doc_id, r.core_degree)
                  for r in kcore_decompose(idx_pairs).collect()}
        exp_kc = {(r.doc_id, r.core_degree)
                  for r in kcore_decompose(chain_pairs).collect()}
        assert got_kc == exp_kc and got_kc
    finally:
        _rm_table(spark, table)


def test_append_band_index_preserves_bucketing(spark, sf_dir):
    from flapi_spark.operators.dedup import (
        append_band_index, write_band_index,
    )
    from flapi_spark.session import load_table
    from flapi_spark.writes import _rm_table

    docs = load_table(spark, sf_dir, "documents")
    table = "t_band_index2"
    _rm_table(spark, table)
    try:
        write_band_index(spark, docs.where("doc_id < 50"), table)
        n1 = spark.table(table).count()
        append_band_index(spark, docs.where("doc_id >= 450"), table)
        n2 = spark.table(table).count()
        assert n2 > n1
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {table}"
            ).collect()
        }
        assert "band_id" in desc.get("Bucket Columns", "")
    finally:
        _rm_table(spark, table)


def test_jaccard_prefix_filter_stats_consistent(spark, sf_dir):
    """The audit numbers cohere: candidates never exceed the prefix
    row bound, true pairs never exceed candidates, and the TRUE pair
    count equals dedup_ngram_jaccard's output (the filter is exact)."""
    from flapi_spark.operators.dedup import (
        dedup_ngram_jaccard, jaccard_prefix_filter_stats,
    )

    r = jaccard_prefix_filter_stats(spark, sf_dir).collect()[0]
    assert r.n_prefix_rows < r.n_naive_rows
    assert r.n_candidates <= r.n_prefix_rows
    assert r.n_pairs <= r.n_candidates
    assert r.n_pairs == dedup_ngram_jaccard(spark, sf_dir).count()
    assert 0.0 < r.precision <= 1.0
    assert 0.0 < r.row_reduction < 1.0


def test_scrub_duplicated_spans_applies_cut_list(spark, sf_dir):
    """round 10c: the scrub output equals a python replay of cutting
    the span intervals out of the token stream, doc by doc."""
    from flapi_spark.operators.dedup import (
        dedup_substring_spans, scrub_duplicated_spans,
    )

    spans = {}
    for r in dedup_substring_spans(spark, sf_dir).collect():
        spans.setdefault(r.doc_id, []).append((r.start_token, r.end_token))
    docs = {
        r.doc_id: " ".join(r.text.strip().lower().split())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    got = {r.doc_id: r for r in
           scrub_duplicated_spans(spark, sf_dir).collect()}
    assert set(got) == set(docs)
    scrubbed_docs = 0
    for doc_id, text in docs.items():
        toks = text.split(" ")
        cuts = spans.get(doc_id, [])
        kept = [
            t for p, t in enumerate(toks)
            if not any(a <= p <= b for a, b in cuts)
        ]
        r = got[doc_id]
        assert r.n_toks == len(toks)
        assert r.n_cut_tokens == sum(b - a + 1 for a, b in cuts)
        assert r.scrubbed_n_toks == len(kept)
        assert r.scrubbed_text == " ".join(kept)
        assert r.n_toks - r.n_cut_tokens == r.scrubbed_n_toks
        if cuts:
            scrubbed_docs += 1
    assert scrubbed_docs > 0  # the corpus has duplicated spans


def test_semdedup_refined_centroids_parity(spark, sf_dir):
    """semdedup_clusters(refine_iters=2) clusters on exactly the
    refined cells embedding_kmeans_refine reports."""
    from flapi_spark.operators.dedup import semdedup_clusters
    from flapi_spark.operators.similarity import embedding_kmeans_refine

    got = {
        r.vec_id: r.cell_id
        for r in semdedup_clusters(spark, sf_dir, refine_iters=2).collect()
    }
    want = {
        r.vec_id: r.cell_final
        for r in embedding_kmeans_refine(spark, sf_dir, iters=2).collect()
    }
    assert got == want


def test_incremental_components_equals_full_recompute(spark, sf_dir):
    """round 10c: star-forest merge of a delta batch == full CC
    recompute over the whole pair stream (the oracle equality), and a
    delta edge BRIDGING two old components merges them."""
    from pyspark.sql import Row

    from flapi_spark.operators.dedup import (
        incremental_components, label_components,
    )

    # synthetic: two old components {1,2,3} and {10,11}, delta bridges
    # 3-10 and adds a fresh pair 20-21
    labels = spark.createDataFrame(
        [Row(doc_id=d, component_id=c)
         for d, c in [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)]]
    )
    delta = spark.createDataFrame(
        [Row(doc_a=3, doc_b=10), Row(doc_a=20, doc_b=21)]
    )
    got = {(r.doc_id, r.component_id)
           for r in incremental_components(labels, delta).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 1), (11, 1),
                   (20, 20), (21, 20)}

    # corpus-scale: bootstrap <400, merge the rest; equals full CC
    from flapi_spark.operators.dedup import dedup_minhash_portable
    from pyspark.sql import functions as F

    pairs = (
        dedup_minhash_portable(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    both_old = (F.col("doc_a") < 400) & (F.col("doc_b") < 400)
    inc = incremental_components(
        label_components(pairs.where(both_old)), pairs.where(~both_old)
    )
    full = label_components(pairs)
    assert (
        {(r.doc_id, r.component_id) for r in inc.collect()}
        == {(r.doc_id, r.component_id) for r in full.collect()}
    )
