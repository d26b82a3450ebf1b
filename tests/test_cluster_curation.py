"""Round 10d: cluster-grain curation (topic cards, balanced keep-sets,
centroid-distance outlier pruning), per-source KL drift, and
label-propagation communities."""

import math

import pytest

from tests.conftest import assert_df_matches_oracle


def _oracle(name):
    from flapi_spark.queries import QUERIES

    return QUERIES[name][1]


def test_cluster_topic_card_oracle_and_invariants(spark, sf_dir, duck):
    from flapi_spark.operators.similarity import cluster_topic_card

    df = cluster_topic_card(spark, sf_dir)
    rows = df.collect()
    n_docs_total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    # every document lands in exactly one cell (vec_id == doc_id)
    assert sum(r.n_docs for r in rows) == n_docs_total
    for r in rows:
        assert 0 < r.top_source_share <= 1.0
        assert r.n_sources >= 1 and r.n_docs >= r.n_sources
        assert r.mean_chars > 0
    assert_df_matches_oracle(df, duck, _oracle("cluster_topic_card"))


def test_cluster_balanced_keepset_caps_cells(spark, sf_dir, duck):
    from flapi_spark.operators.similarity import cluster_balanced_keepset

    per_cell = 7
    df = cluster_balanced_keepset(spark, sf_dir, per_cell=per_cell)
    rows = df.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, []).append(r)
    for cell, members in by_cell.items():
        ranks = sorted(m.proto_rank for m in members)
        assert ranks == list(range(1, len(members) + 1))  # permutation
        kept = sum(m.kept for m in members)
        assert kept == min(per_cell, len(members))
        for m in members:
            assert m.kept == (m.proto_rank <= per_cell)
    # the registry default (per_cell=20) carries the exact oracle
    assert_df_matches_oracle(
        cluster_balanced_keepset(spark, sf_dir),
        duck,
        _oracle("cluster_balanced_keepset"),
    )


def test_embedding_outlier_prune_bottom_fraction(spark, sf_dir, duck):
    from flapi_spark.operators.similarity import (
        assign_with_sim, embedding_outlier_prune, ivf_centroids,
    )
    from flapi_spark.session import load_table

    frac = 0.25
    df = embedding_outlier_prune(spark, sf_dir, frac=frac)
    rows = df.collect()
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell_id, []).append(r)
    emb = load_table(spark, sf_dir, "embeddings")
    sims = {
        r.vec_id: r.sim
        for r in assign_with_sim(emb, ivf_centroids(emb, mod=25)).collect()
    }
    for cell, members in by_cell.items():
        n = members[0].cell_n
        assert len(members) == n
        flagged = [m for m in members if m.outlier]
        assert len(flagged) == math.floor(frac * n)
        # outliers are the least-prototypical members of their cell
        if flagged:
            worst_kept = min(
                sims[m.vec_id] for m in members if not m.outlier
            )
            assert all(sims[m.vec_id] <= worst_kept for m in flagged)
    assert_df_matches_oracle(df, duck, _oracle("embedding_outlier_prune"))


def test_cluster_prune_stage(spark, sf_dir):
    from flapi_spark.operators.similarity import embedding_outlier_prune
    from flapi_spark.pipeline import curate

    rep = curate(spark, sf_dir, stages=["cluster_prune"])
    got = {r.doc_id for r in rep.keep.collect()}
    want = {
        r.vec_id
        for r in embedding_outlier_prune(spark, sf_dir)
        .where("NOT outlier")
        .collect()
    }
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert got == (want & docs) and 0 < len(got) < len(docs)
    # frac=0.0 floors every cell's cut to zero — nothing drops
    keep_all = curate(
        spark, sf_dir, stages=[{"stage": "cluster_prune", "frac": 0.0}]
    ).keep
    assert keep_all.count() == len(docs)


def test_full_chain_with_cluster_prune(spark, sf_dir):
    from flapi_spark.pipeline import curate

    stages = [
        "quality", "langid", "exact_dedup", "near_dedup",
        "semantic_dedup", "cluster_prune", "decontam",
    ]
    rep = curate(spark, sf_dir, stages=stages)
    assert [s["stage"] for s in rep.stages] == stages
    counts = [rep.stages[0]["n_in"]] + [s["n_out"] for s in rep.stages]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    dropped = {s["stage"]: s["n_in"] - s["n_out"] for s in rep.stages}
    assert dropped["cluster_prune"] > 0  # the outlier gate bites


def test_source_token_kl_properties(spark, sf_dir, duck):
    from flapi_spark.operators.text import source_token_kl

    df = source_token_kl(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 2  # the corpus has multiple sources
    vocab_sizes = {r.vocab_size for r in rows}
    assert len(vocab_sizes) == 1  # V is corpus-global
    for r in rows:
        # both sides are proper (add-one smoothed) distributions, so
        # the divergence is non-negative (Gibbs) and finite
        assert r.kl_to_corpus >= 0.0
        assert r.n_tokens > 0
    assert_df_matches_oracle(df, duck, _oracle("source_token_kl"))


def test_source_token_kl_python_replay(spark, tmp_path):
    """Exact replay on a tiny handwritten corpus."""
    from flapi_spark.operators.text import source_token_kl

    docs = [
        (1, "a a b", "en", "s1", 5),
        (2, "a b b c", "en", "s2", 7),
        (3, "c c", "en", "s2", 3),
    ]
    d = str(tmp_path / "sfk")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r.source: (r.n_tokens, r.vocab_size, r.kl_to_corpus)
        for r in source_token_kl(spark, d).collect()
    }
    corpus = {"a": 3, "b": 3, "c": 3}
    by_src = {"s1": {"a": 2, "b": 1}, "s2": {"a": 1, "b": 2, "c": 3}}
    V, N = len(corpus), sum(corpus.values())
    for src, cnts in by_src.items():
        L = sum(cnts.values())
        kl = 0.0
        for tok in corpus:
            p = (cnts.get(tok, 0) + 1) / (L + V)
            q = (corpus[tok] + 1) / (N + V)
            kl += round(p * math.log(p / q), 12)
        assert got[src] == (L, V, round(kl, 6))


def _python_lpa(pairs, iterations=3):
    """Golden replay of graph.label_propagation."""
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, set()).add(b)
        edges.setdefault(b, set()).add(a)
    labels = {n: n for n in edges}
    for _ in range(iterations):
        new = {}
        for n, nbrs in edges.items():
            votes = {}
            for v in nbrs:
                votes[labels[v]] = votes.get(labels[v], 0) + 1
            votes[labels[n]] = votes.get(labels[n], 0) + 1  # self-vote
            new[n] = min(
                votes, key=lambda lab: (-votes[lab], lab)
            )
        labels = new
    return labels


def test_label_propagation_golden(spark):
    from flapi_spark.operators.graph import label_propagation

    # two triangles bridged by a chain — components would merge
    # everything; LPA keeps each triangle's identity
    pairs = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (4, 5),
        (5, 6), (6, 7), (5, 7),
        (10, 11),
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: (r.community, r.community_size)
        for r in label_propagation(df).collect()
    }
    want_labels = _python_lpa(pairs)
    sizes = {}
    for lab in want_labels.values():
        sizes[lab] = sizes.get(lab, 0) + 1
    want = {n: (lab, sizes[lab]) for n, lab in want_labels.items()}
    assert got == want
    # labels never cross edges: same community ⇒ same connected
    # component (labels are seeded from node ids)
    assert got[10][0] != got[1][0]


def test_lpa_entries_match_oracle(spark, views, sf_dir, duck):
    from flapi_spark.queries import QUERIES

    fn, sql = QUERIES["lpa_communities"]
    assert_df_matches_oracle(fn(spark, sf_dir), duck, sql)


def test_topic_cap_stage(spark, sf_dir):
    from flapi_spark.operators.similarity import cluster_balanced_keepset
    from flapi_spark.pipeline import curate

    rep = curate(
        spark, sf_dir, stages=[{"stage": "topic_cap", "per_cell": 5}]
    )
    got = {r.doc_id for r in rep.keep.collect()}
    want = {
        r.vec_id
        for r in cluster_balanced_keepset(spark, sf_dir, per_cell=5)
        .where("kept")
        .collect()
    }
    docs = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    }
    assert got == (want & docs) and 0 < len(got) < len(docs)
    # a cap above the largest cell keeps everything
    keep_all = curate(
        spark, sf_dir,
        stages=[{"stage": "topic_cap", "per_cell": 10 ** 6}],
    ).keep
    assert keep_all.count() == len(docs)


def test_label_propagation_random_graphs_match_replay(spark):
    """Seeded-random graphs (8 draws, mixed density): the distributed
    LPA equals the pure-python replay on every one — the property
    version of the golden test."""
    import random

    from flapi_spark.operators.graph import label_propagation

    rng = random.Random(42)
    for trial in range(8):
        n = rng.randint(4, 24)
        density = rng.choice([0.08, 0.2, 0.5])
        pairs = sorted(
            {
                (a, b)
                for a in range(1, n)
                for b in range(a + 1, n + 1)
                if rng.random() < density
            }
        )
        if not pairs:
            continue
        df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {
            r.doc_id: r.community
            for r in label_propagation(df).collect()
        }
        want = _python_lpa(pairs)
        assert got == want, f"trial {trial}: {pairs}"


def test_lpa_modularity_python_replay(spark):
    """Modularity replay on the bridged-triangles graph; the
    partitioned graph scores positive, and a single-community
    partition of a clique scores 0 (Q of the trivial partition)."""
    from flapi_spark.operators.graph import lpa_modularity

    pairs = [
        (1, 2), (2, 3), (1, 3),
        (3, 4), (4, 5),
        (5, 6), (6, 7), (5, 7),
        (10, 11),
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    r = lpa_modularity(df).collect()[0]
    labels = _python_lpa(pairs)
    m = len(pairs)
    comms = set(labels.values())
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    q = 0.0
    for c in comms:
        members = {n for n, lab in labels.items() if lab == c}
        lc = sum(1 for a, b in pairs if a in members and b in members)
        dc = sum(deg[n] for n in members)
        q += round(lc / m - (dc / (2 * m)) * (dc / (2 * m)), 12)
    assert r.n_communities == len(comms)
    assert r.n_edges == m
    assert r.modularity == round(q, 6)
    assert r.modularity > 0  # the partition beats random

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    rc = lpa_modularity(
        spark.createDataFrame(clique, "doc_a long, doc_b long")
    ).collect()[0]
    # LPA collapses a clique to one community; Q of the whole-graph
    # partition is m/m - 1 = 0
    assert rc.n_communities == 1 and rc.modularity == 0.0


def test_cluster_card_indexed_matches_inline_and_is_bucketed(
    spark, sf_dir
):
    """round 10d: the persisted-IVF topic card equals the inline
    entry row-for-row, and its membership side is a bucketed index
    scan (no cosine scoring in the plan)."""
    from flapi_spark.queries import QUERIES

    inline = QUERIES["cluster_topic_card"][0](spark, sf_dir)
    indexed_df = QUERIES["cluster_card_indexed"][0](spark, sf_dir)
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, indexed_df.collect())
    )
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    # zero assignment scoring: the index scan replaces the
    # centroid crossJoin entirely
    assert "aggregate(" not in plan  # cosine_col's fold is absent
