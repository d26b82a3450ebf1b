"""SFT / preference-data preparation operators (round 10e).

The curation suite so far is pretraining-shaped (gates, dedup,
mixtures, shards). Post-training pipelines add two data shapes on
top, both first-class here:

- dialogue corpora: multi-turn role-tagged conversations that must be
  PARSED and VALIDATED (role alternation, user-first convention,
  per-role token budgets) before they are trusted for SFT — malformed
  transcripts are the dominant data bug in instruction tuning;
- preference pairs: (chosen, rejected) document pairs ranked by a
  quality signal within a comparable group — the DPO/RLHF data shape
  (Rafailov et al. 2023), built here from the corpus's own composite
  quality score with deterministic tie-breaks.

The synthetic corpus carries no dialogue markup, so the dialogue
entry injects deterministic doc_id-derived role markers first (the
text_pii_redact injection pattern) and the parser has real structure
to recover; the DuckDB oracle replays injection + parse exactly.

Reference parity: none — the reference serves tabular SQL; this is
brief-driven LLM-data-pipeline surface (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flapi_spark.session import load_table

# role markers: the parse contract, shared verbatim with the oracle
DIALOGUE_MARKER_RE = "<\\|(user|assistant)\\|>"
DIALOGUE_SPLIT_RE = "<\\|user\\|>|<\\|assistant\\|>"
# injected turn geometry: 2 + doc_id%3 turns, 24-char content slices
DIALOGUE_SLICE = 24


def _marked_dialogue() -> F.Column:
    """Deterministic dialogue construction over the text column:
    n_turns = 2 + doc_id % 3 alternating turns starting with user,
    turn i's content = chars [1 + i*24, 24] of the document text."""
    n_turns = F.lit(2) + (F.col("doc_id") % 3).cast("int")
    pieces = []
    for i in range(4):  # max 4 turns
        marker = F.lit("<|user|>" if i % 2 == 0 else "<|assistant|>")
        piece = F.concat(
            marker,
            F.substring(F.col("text"), 1 + i * DIALOGUE_SLICE, DIALOGUE_SLICE),
        )
        pieces.append(F.when(F.lit(i) < n_turns, piece).otherwise(F.lit("")))
    return F.concat(*pieces)


def dialogue_turns_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse + validate role-tagged dialogue transcripts: per
    document, the turn count, per-role content sizes, and the
    well-formedness verdict (user-first strict alternation — the SFT
    loader contract; a transcript failing it trains the model on
    swapped roles).

    Output: (doc_id, n_turns, n_user_chars, n_assistant_chars,
    well_formed).

    Scale shape: marker extraction and content splitting are
    codegen'd regexp projections; the per-turn explode is bounded by
    the turn count (rows x turns, linear); the rollup is ONE
    map-side-combined groupBy at document grain. Exact DuckDB oracle
    (same injection, same regexes, same ordinality convention)."""
    docs = load_table(spark, sf_dir, "documents")
    return parse_dialogue(
        docs.select("doc_id", _marked_dialogue().alias("transcript"))
    )


def parse_dialogue(transcripts: DataFrame) -> DataFrame:
    """The parser core over any (doc_id, transcript) frame — what a
    real SFT ingest points at its own role-tagged corpus. See
    dialogue_turns_parse for the output contract."""
    marked = transcripts.select(
        "doc_id",
        F.regexp_extract_all(
            F.col("transcript"), F.lit(DIALOGUE_MARKER_RE), 1
        ).alias("roles"),
        F.split(F.col("transcript"), DIALOGUE_SPLIT_RE).alias("contents"),
    )
    turns = marked.select(
        "doc_id",
        F.posexplode("roles").alias("pos", "role"),
        F.col("contents"),
    ).select(
        "doc_id",
        "pos",
        "role",
        # split yields a leading '' before the first marker, so turn
        # pos's content sits at array index pos+2 (1-based element_at)
        F.length(F.element_at("contents", F.col("pos") + 2)).alias("clen"),
    )
    expected = F.when(F.col("pos") % 2 == 0, "user").otherwise("assistant")
    return turns.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", F.col("clen")).otherwise(0))
        .cast("long")
        .alias("n_user_chars"),
        F.sum(
            F.when(F.col("role") == "assistant", F.col("clen")).otherwise(0)
        )
        .cast("long")
        .alias("n_assistant_chars"),
        (
            F.sum(F.when(F.col("role") != expected, 1).otherwise(0)) == 0
        ).alias("well_formed"),
    )


def dialogue_parse_oracle_sql() -> str:
    """Exact DuckDB replay: identical injected markup, identical
    marker regexes, identical split-offset convention."""
    slice_ = DIALOGUE_SLICE
    pieces = []
    for i in range(4):
        marker = "<|user|>" if i % 2 == 0 else "<|assistant|>"
        pieces.append(
            f"CASE WHEN {i} < 2 + doc_id % 3 THEN"
            f" '{marker}' || substr(text, {1 + i * slice_}, {slice_})"
            f" ELSE '' END"
        )
    marked = " || ".join(pieces)
    return (
        f"WITH m AS (SELECT doc_id, {marked} AS mk FROM documents),"
        # positional multi-unnest: DuckDB aligns select-list unnests,
        # giving (role, 1-based ordinal) pairs (no WITH ORDINALITY)
        " u AS (SELECT doc_id, mk,"
        "   unnest(regexp_extract_all(mk,"
        "     '<\\|(user|assistant)\\|>', 1)) AS role,"
        "   unnest(generate_series(1, len(regexp_extract_all(mk,"
        "     '<\\|(user|assistant)\\|>', 1)))) AS ord"
        "  FROM m),"
        " t AS (SELECT doc_id,"
        "   CAST(ord AS BIGINT) - 1 AS pos, role,"
        "   len(regexp_split_to_array(mk,"
        "     '<\\|user\\|>|<\\|assistant\\|>')[CAST(ord AS INT) + 1])"
        "    AS clen"
        "  FROM u)"
        " SELECT doc_id,"
        " CAST(count(*) AS BIGINT) AS n_turns,"
        " CAST(sum(CASE WHEN role = 'user' THEN clen ELSE 0 END)"
        "  AS BIGINT) AS n_user_chars,"
        " CAST(sum(CASE WHEN role = 'assistant' THEN clen ELSE 0 END)"
        "  AS BIGINT) AS n_assistant_chars,"
        " sum(CASE WHEN role <> (CASE WHEN pos % 2 = 0 THEN 'user'"
        "  ELSE 'assistant' END) THEN 1 ELSE 0 END) = 0 AS well_formed"
        " FROM t GROUP BY doc_id"
    )


def preference_pairs(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """DPO-style preference-pair construction: within every source,
    pair the i-th best document with the i-th worst by the composite
    quality score (i <= k), keeping only strict-gap pairs — the
    deterministic chosen/rejected data shape preference tuning
    consumes when no human labels exist (quality-signal bootstrap).

    Output: (source, pair_rank, chosen_doc, rejected_doc,
    chosen_score, rejected_score, score_gap). Ties break by doc_id
    (asc from the top, desc from the bottom) so both engines rank
    identically on the same IEEE doubles.

    Scale shape: each rank branch filters on a single row_number, so
    Catalyst plans a PARTIAL per-partition top-k (WindowGroupLimit,
    plan-asserted) before the (source) shuffle — every map task
    forwards at most k rows per source and the shuffle carries
    O(k * n_sources) rows, not the corpus; the final join is a
    rank-keyed equi-join of two k-row-per-source sides. No full
    per-source sort ever materializes."""
    from flapi_spark.operators.text import text_quality_score

    scores = text_quality_score(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    s = docs.join(scores, "doc_id")
    w_top = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    w_bot = Window.partitionBy("source").orderBy(
        F.asc("quality_score"), F.desc("doc_id")
    )
    ranked = s.select(
        "source",
        "doc_id",
        "quality_score",
        F.row_number().over(w_top).alias("rt"),
        F.row_number().over(w_bot).alias("rb"),
    )
    top = ranked.where(F.col("rt") <= k).select(
        "source",
        F.col("rt").cast("long").alias("pair_rank"),
        F.col("doc_id").alias("chosen_doc"),
        F.col("quality_score").alias("chosen_score"),
    )
    bot = ranked.where(F.col("rb") <= k).select(
        "source",
        F.col("rb").cast("long").alias("pair_rank"),
        F.col("doc_id").alias("rejected_doc"),
        F.col("quality_score").alias("rejected_score"),
    )
    return (
        top.join(bot, ["source", "pair_rank"])
        .where(F.col("chosen_score") > F.col("rejected_score"))
        .select(
            "source",
            "pair_rank",
            "chosen_doc",
            "rejected_doc",
            "chosen_score",
            "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "score_gap"
            ),
        )
    )


def preference_pairs_oracle_sql(quality_sql: str, k: int = 5) -> str:
    return (
        f"WITH q AS ({quality_sql}),"
        " s AS (SELECT d.doc_id, d.source, q.quality_score"
        "  FROM documents d JOIN q ON q.doc_id = d.doc_id),"
        " r AS (SELECT *,"
        "  row_number() OVER (PARTITION BY source"
        "   ORDER BY quality_score DESC, doc_id ASC) AS rt,"
        "  row_number() OVER (PARTITION BY source"
        "   ORDER BY quality_score ASC, doc_id DESC) AS rb"
        "  FROM s)"
        " SELECT a.source, CAST(a.rt AS BIGINT) AS pair_rank,"
        " a.doc_id AS chosen_doc, b.doc_id AS rejected_doc,"
        " a.quality_score AS chosen_score,"
        " b.quality_score AS rejected_score,"
        " a.quality_score - b.quality_score AS score_gap"
        " FROM r a JOIN r b ON a.source = b.source AND a.rt = b.rb"
        f" AND a.rt <= {k} AND b.rb <= {k}"
        " AND a.quality_score > b.quality_score"
    )


def dialogue_verdicts_rowwise(transcripts: DataFrame) -> DataFrame:
    """Per-ROW dialogue verdicts over (doc_id, transcript): the same
    output contract as parse_dialogue computed entirely with array
    intrinsics — no explode, no aggregation, no shuffle — so it runs
    UNCHANGED on a streaming DataFrame in append mode (the in-flight
    SFT ingest guard shape; see streaming.dialogue_guard_stream).
    Bit-parity with the explode/rollup path is pinned in tests.

    Unlike parse_dialogue (whose rollup naturally drops marker-free
    documents), marker-free rows are KEPT here with n_turns = 0 and
    well_formed = false — a guard must flag them, not lose them.
    NULL transcripts coalesce to '' first for the same reason: under
    ANSI semantics size(NULL) is NULL and a NULL well_formed slips
    through both sides of a quarantine filter unflagged."""
    t = F.coalesce(F.col("transcript"), F.lit(""))
    roles = F.regexp_extract_all(t, F.lit(DIALOGUE_MARKER_RE), 1)
    contents = F.slice(F.split(t, DIALOGUE_SPLIT_RE), 2, F.size(roles))
    n_user = F.aggregate(
        F.zip_with(
            roles,
            contents,
            lambda r, c: F.when(r == "user", F.length(c)).otherwise(0),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_asst = F.aggregate(
        F.zip_with(
            roles,
            contents,
            lambda r, c: F.when(r == "assistant", F.length(c)).otherwise(0),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    expected = F.transform(
        roles,
        lambda _r, i: F.when(i % 2 == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
    return transcripts.select(
        "doc_id",
        F.size(roles).cast("long").alias("n_turns"),
        n_user.alias("n_user_chars"),
        n_asst.alias("n_assistant_chars"),
        ((F.size(roles) > 0) & (roles == expected)).alias("well_formed"),
    )
