"""Round 10e: SFT / preference-data preparation operators."""

from tests.conftest import assert_df_matches_oracle


def _oracle(name):
    from flapi_spark.queries import QUERIES

    return QUERIES[name][1]


def test_dialogue_parse_matches_oracle(spark, sf_dir, duck):
    from flapi_spark.operators.sft import dialogue_turns_parse

    assert_df_matches_oracle(
        dialogue_turns_parse(spark, sf_dir),
        duck,
        _oracle("dialogue_turns_parse"),
    )


def test_dialogue_parse_semantics(spark, sf_dir):
    from flapi_spark.operators.sft import dialogue_turns_parse
    from flapi_spark.session import load_table

    rows = dialogue_turns_parse(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    for r in rows:
        # injected geometry: 2 + doc_id % 3 turns, always well-formed
        assert r.n_turns == 2 + r.doc_id % 3
        assert r.well_formed
        assert r.n_user_chars > 0
        assert r.n_assistant_chars > 0
        # user speaks turns 0 (+2), assistant 1 (+3): with equal-width
        # slices the user side never trails by more than one slice
        assert r.n_user_chars >= r.n_assistant_chars - 24


def test_dialogue_parser_flags_malformed(spark):
    """The validator earns its keep on transcripts the injection can
    never produce: assistant-first, double-user, and a clean one."""
    from flapi_spark.operators.sft import parse_dialogue

    frames = spark.createDataFrame(
        [
            (1, "<|assistant|>hello<|user|>hi"),  # assistant-first
            (2, "<|user|>a<|user|>b<|assistant|>c"),  # double user
            (3, "<|user|>q<|assistant|>a"),  # clean
        ],
        "doc_id LONG, transcript STRING",
    )
    got = {r.doc_id: r for r in parse_dialogue(frames).collect()}
    assert not got[1].well_formed
    assert not got[2].well_formed
    assert got[3].well_formed
    assert got[3].n_turns == 2
    assert got[3].n_user_chars == 1 and got[3].n_assistant_chars == 1
    assert got[2].n_user_chars == 2


def test_preference_pairs_matches_oracle(spark, sf_dir, duck):
    from flapi_spark.operators.sft import preference_pairs

    assert_df_matches_oracle(
        preference_pairs(spark, sf_dir), duck, _oracle("preference_pairs")
    )


def test_preference_pairs_semantics(spark, sf_dir):
    from flapi_spark.operators.sft import preference_pairs
    from flapi_spark.session import load_table

    rows = preference_pairs(spark, sf_dir).collect()
    n_sources = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .count()
    )
    # k pairs per source when the groups are large enough and scores
    # strictly separate (they do on this corpus)
    assert len(rows) == 5 * n_sources
    for r in rows:
        assert r.chosen_score > r.rejected_score
        assert r.score_gap > 0
        assert r.chosen_doc != r.rejected_doc
        assert 1 <= r.pair_rank <= 5
    # a chosen doc never appears as rejected (top-k and bottom-k are
    # disjoint here)
    chosen = {r.chosen_doc for r in rows}
    rejected = {r.rejected_doc for r in rows}
    assert not (chosen & rejected)


def test_preference_pairs_single_shuffle(spark, sf_dir):
    """Both rank windows ride ONE (source) partitioning; no
    cartesian anywhere."""
    from flapi_spark.operators.sft import preference_pairs

    plan = (
        preference_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # one window per rank branch, and — because each branch filters
    # on a single row_number — Catalyst inserts partial per-partition
    # top-k (WindowGroupLimit) BEFORE the source shuffle: each map
    # task forwards at most k rows per source, so the shuffle carries
    # O(k * sources) rows, not the corpus
    assert plan.count("Window [") <= 2
    assert "WindowGroupLimit" in plan
