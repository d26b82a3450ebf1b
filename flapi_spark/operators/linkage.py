"""Entity resolution / record linkage over a deterministic dirty table.

The one data-integration workload the suite did not yet cover: the
same real-world entity arrives from several systems with typos and
format drift, and the engine must block, match, cluster, and merge the
records into golden rows — the classic record-linkage chain (Fellegi &
Sunter 1969; Christen, "Data Matching", 2012). flAPI itself serves
this through plain SQL templates over DuckDB (reference:
examples/sqls/customers/customers.sql is exactly the "serve the
deduplicated customer dimension" endpoint shape); here the chain is a
first-class distributed operator family.

Corpus derivation (the injected-damage oracle pattern shared with
text_pii_redact / text_unicode_sanitize): entity names are synthesized
from inline word arrays keyed by c_custkey — the synthesis and every
corruption below is a deterministic SQL expression that DuckDB replays
bit-for-bit, so each stage has an EXACT oracle:

- base record  (src 'crm',    rec_id = ck*10):   first last suffix
- typo copy    (src 'web',    rec_id = ck*10+1, ck%3==1): one char
  DELETED from the first word at position 3+ck%2 (levenshtein 1)
- swap copy    (src 'app',    rec_id = ck*10+2, ck%3==2): adjacent
  chars TRANSPOSED in the first word at position 3+ck%2 (lev <= 2)
- legacy copy  (src 'legacy', rec_id = ck*10+3, ck%12==0): token
  order flipped "last first suffix" — BEYOND the edit-distance
  threshold by design, so measured recall < 1 and the eval entry has
  a real signal instead of a tautological 1.0

Name tokens and the zip discriminator are indexed by a portable md5
mix of the custkey (the same Spark-conv / DuckDB-'0x' bridge every
portable hash in this repo uses), NOT by linear modular functions —
c_custkey % k indexes would all cycle with period lcm(k), giving
custkey and custkey+120 byte-identical record families and collisions
that grow SYSTEMATICALLY with corpus size. With md5 mixing the
(24*24*5 names) x (50 zips) identity space collides
birthday-randomly: a handful of cross-entity (same-name, same-zip)
pairs at sf0.01, so measured precision dips below 1 for real reasons
and the eval entry reports it instead of a synthesized artifact.

Scale shape (the 100 TB story):
- Blocking is the standard ER scalability lever: candidate pairs come
  from a self-equi-join on (key_kind, block_key) — one hash shuffle
  on the block key, never a cross join. Work is sum(block_size^2), so
  the block key must carry enough cardinality to keep block sizes
  BOUNDED as the corpus grows — that is what the zip discriminator in
  the key does (see ER_ZIP_MOD for the measured 160s -> sub-second
  difference at sf0.1). `er_block_stats` is the audit dial that
  reports exactly that per key kind (max block + implied pair count),
  which is what you watch before launching the join at scale.
- The verify predicate is JVM-side end to end: a length prefilter
  (|len_a-len_b| <= threshold, a classic levenshtein lower bound)
  runs before the O(len^2) `levenshtein` — both are Catalyst
  built-ins, no Python in the hot path.
- Clustering reuses dedup.label_components (large-star/small-star,
  O(log n) rounds); golden-record selection is one window over
  entity_id (single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flapi_spark.operators.dedup import label_components

# 24 x 24 x 5 name space; every first word has length >= 5 so the
# deterministic damage positions (3 or 4) always fall inside it, and
# the transposition at p needs p+1 <= len.  Words are plain lowercase
# so no normalization step hides in the comparison.
ER_FIRST = [
    "acornvale", "birchwood", "cobalt", "dunmore", "everline",
    "fairmont", "glenora", "harbourn", "ironvale", "juniper",
    "kestrel", "lakeshore", "maplecrest", "northgate", "oakridge",
    "pinnacle", "quarrystone", "riverbend", "stonebridge", "thornhill",
    "umberline", "valleyforge", "westbrook", "yellowpine",
]
ER_LAST = [
    "logistics", "holdings", "partners", "systems", "supplies",
    "trading", "fabrication", "analytics", "networks", "foundry",
    "provisions", "freight", "machining", "textiles", "robotics",
    "materials", "outfitters", "dynamics", "imports", "packaging",
    "surveying", "transport", "ventures", "works",
]
ER_SUFFIX = ["", " llc", " inc", " co", " gmbh"]

# Blocking discriminator cardinality: every record carries a zip-like
# attribute derived from the SAME md5 mix (true variants inherit it —
# they describe the same entity), and the block key is (zip, affix).
# Single-attribute affix blocking over a bounded name vocabulary is a
# scale trap: block sizes grow linearly with the corpus, so the
# candidate join grows QUADRATICALLY (measured: 160 s at sf0.1 vs
# sub-second with the zip in the key). Multi-attribute blocking is
# the standard ER answer (Christen 2012, ch. 4); the fixed mod here
# is exact-oracle plumbing — production grows the discriminator's
# cardinality with the corpus (real zips have ~40k values), which is
# the `zip_mod` knob the scale smoke turns, same contract as
# semdedup_fixed_cells.
ER_ZIP_MOD = 50

# portable custkey mixer: Spark conv(substr(md5, 1, 15), 16, 10) ==
# DuckDB CAST('0x' || substr(md5, 1, 15) AS BIGINT) — 60 bits, positive
_ER_H_SPARK = (
    "cast(conv(substr(md5(concat('er:', cast(ck as string))), 1, 15),"
    " 16, 10) as bigint)"
)
_ER_H_DUCK = (
    "CAST(concat('0x', substr(md5(concat('er:',"
    " CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT)"
)

ER_LEV_THRESHOLD = 2

# source trust order for golden-record survivorship: the system of
# record wins, ad-hoc legacy exports lose
_ER_SRC_PRIORITY = "CASE src WHEN 'crm' THEN 0 WHEN 'web' THEN 1 WHEN 'app' THEN 2 ELSE 3 END"


def _sql_array(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def er_records_sql(zip_mod: int = ER_ZIP_MOD) -> str:
    """The shared records CTE body (DuckDB dialect) — every linkage
    oracle opens with `WITH ` + this. Mirrors er_records() exactly."""
    return (
        "hashed AS (SELECT c_custkey AS ck,"
        f"  {_ER_H_DUCK} AS h,"
        "  CAST(3 + c_custkey % 2 AS INT) AS p FROM customer),"
        " rec AS (SELECT ck, p,"
        f"  list_extract({_sql_array(ER_FIRST)},"
        "   CAST(h % 24 AS INT) + 1) AS w1,"
        f"  list_extract({_sql_array(ER_LAST)},"
        "   CAST((h // 24) % 24 AS INT) + 1) AS w2,"
        f"  list_extract({_sql_array(ER_SUFFIX)},"
        "   CAST((h // 576) % 5 AS INT) + 1) AS sfx,"
        f"  CAST((h // 2880) % {zip_mod} AS INT) AS zip"
        "  FROM hashed),"
        " named AS (SELECT ck, p, zip,"
        "  w1 || ' ' || w2 || sfx AS name,"
        "  w1, w2, sfx FROM rec),"
        " recs AS ("
        "  SELECT ck * 10 AS rec_id, 'crm' AS src, name, zip"
        "  FROM named"
        "  UNION ALL"
        "  SELECT ck * 10 + 1, 'web',"
        "   substr(name, 1, p - 1) || substr(name, p + 1), zip"
        "  FROM named WHERE ck % 3 = 1"
        "  UNION ALL"
        "  SELECT ck * 10 + 2, 'app',"
        "   substr(name, 1, p - 1) || substr(name, p + 1, 1)"
        "    || substr(name, p, 1) || substr(name, p + 2), zip"
        "  FROM named WHERE ck % 3 = 2"
        "  UNION ALL"
        "  SELECT ck * 10 + 3, 'legacy',"
        "   w2 || ' ' || w1 || sfx, zip"
        "  FROM named WHERE ck % 12 = 0)"
    )


def er_records(
    spark: SparkSession, sf_dir: str, zip_mod: int = ER_ZIP_MOD
) -> DataFrame:
    """(rec_id, src, name, zip): the deterministic dirty table.

    Pure Catalyst expressions (element_at over literal arrays +
    substring surgery); ~1.9 rows out per customer row in, derived in
    the scan projection — no shuffle, no Python. Variants inherit the
    base record's zip: they are sightings of the same entity.
    """
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(F.col("c_custkey").alias("ck"))
        .withColumn("h", F.expr(_ER_H_SPARK))
    )
    first = F.array(*[F.lit(w) for w in ER_FIRST])
    last = F.array(*[F.lit(w) for w in ER_LAST])
    sfx = F.array(*[F.lit(w) for w in ER_SUFFIX])
    named = c.select(
        "ck",
        F.element_at(first, F.expr("cast(h % 24 as int) + 1")).alias("w1"),
        F.element_at(last, F.expr("cast((h div 24) % 24 as int) + 1")).alias("w2"),
        F.element_at(sfx, F.expr("cast((h div 576) % 5 as int) + 1")).alias("sfx"),
        F.expr(f"cast((h div 2880) % {zip_mod} as int)").alias("zip"),
        (F.lit(3) + F.col("ck") % 2).cast("int").alias("p"),
    ).withColumn(
        "name",
        F.concat_ws("", F.concat_ws(" ", "w1", "w2"), "sfx"),
    )
    orig = named.select(
        (F.col("ck") * 10).alias("rec_id"),
        F.lit("crm").alias("src"),
        "name",
        "zip",
    )
    web = named.filter(F.col("ck") % 3 == 1).select(
        (F.col("ck") * 10 + 1).alias("rec_id"),
        F.lit("web").alias("src"),
        F.expr(
            "concat(substring(name, 1, p - 1), substring(name, p + 1))"
        ).alias("name"),
        "zip",
    )
    app = named.filter(F.col("ck") % 3 == 2).select(
        (F.col("ck") * 10 + 2).alias("rec_id"),
        F.lit("app").alias("src"),
        F.expr(
            "concat(substring(name, 1, p - 1), substring(name, p + 1, 1),"
            " substring(name, p, 1), substring(name, p + 2))"
        ).alias("name"),
        "zip",
    )
    legacy = named.filter(F.col("ck") % 12 == 0).select(
        (F.col("ck") * 10 + 3).alias("rec_id"),
        F.lit("legacy").alias("src"),
        F.concat_ws("", F.concat_ws(" ", "w2", "w1"), "sfx").alias("name"),
        "zip",
    )
    return orig.unionByName(web).unionByName(app).unionByName(legacy)


_CORE = r" (llc|inc|co|gmbh)$"


def er_block_keys(recs: DataFrame) -> DataFrame:
    """(rec_id, name, kind, k): two blocking keys per record — the
    zip discriminator concatenated with the first 3 / last 3 chars of
    the legal-suffix-stripped core name (multi-attribute blocking: a
    single in-word edit can break at most one of the two affixes, and
    true variant pairs share the zip, so they always co-block; the
    zip bounds block sizes, which is what keeps the candidate join
    linear — see ER_ZIP_MOD)."""
    core = F.regexp_replace("name", _CORE, "")
    zipc = F.col("zip").cast("string")
    return recs.select(
        "rec_id",
        "name",
        F.explode(
            F.array(
                F.struct(
                    F.lit("pre").alias("kind"),
                    F.concat_ws(
                        ":", zipc, F.substring(core, 1, 3)
                    ).alias("k"),
                ),
                F.struct(
                    F.lit("suf").alias("kind"),
                    F.concat_ws(
                        ":",
                        zipc,
                        core.substr(F.length(core) - 2, F.lit(3)),
                    ).alias("k"),
                ),
            )
        ).alias("bk"),
    ).select("rec_id", "name", "bk.kind", "bk.k")


def er_block_keys_sql() -> str:
    """keys CTE (append after er_records_sql())."""
    return (
        " cored AS (SELECT rec_id, name, zip,"
        f"  regexp_replace(name, ' (llc|inc|co|gmbh)$', '') AS core"
        "  FROM recs),"
        " keys AS ("
        "  SELECT rec_id, name, 'pre' AS kind,"
        "   CAST(zip AS VARCHAR) || ':' || substr(core, 1, 3) AS k"
        "  FROM cored"
        "  UNION ALL"
        "  SELECT rec_id, name, 'suf',"
        "   CAST(zip AS VARCHAR) || ':'"
        "    || substr(core, length(core) - 2, 3) FROM cored)"
    )


def er_matched_pairs(recs: DataFrame) -> DataFrame:
    """(rec_a, rec_b, name_a, name_b, lev, same_entity): verified
    match pairs. Self-equi-join on the block key (hash shuffle on
    (kind, k) — never a cross join), the length lower bound BEFORE
    levenshtein, and the pair-level distinct AFTER the verify
    (round 11, measured: the distinct used to shuffle every band
    coincidence — 772 k candidate rows × two name strings at sf0.1,
    ~4 s of the 5.5 s chain — where post-verify it shuffles only the
    ~13 k surviving matches; a pair co-blocking under both affix keys
    is verified at most twice, and levenshtein + lev/same_entity are
    pure functions of the row, so filter-then-distinct is the same
    set as distinct-then-filter — the mm_video_phash_pairs ordering).
    same_entity is the ground truth (records derive from the same
    customer) used by er_eval."""
    keys = er_block_keys(recs)
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.kind") == F.col("b.kind"),
                F.col("a.k") == F.col("b.k"),
                F.col("a.rec_id") < F.col("b.rec_id"),
            ],
        )
        .select(
            F.col("a.rec_id").alias("rec_a"),
            F.col("b.rec_id").alias("rec_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= ER_LEV_THRESHOLD
        )
    )
    return (
        cand.withColumn(
            "lev",
            F.levenshtein(
                "name_a", "name_b", threshold=ER_LEV_THRESHOLD
            ).cast("bigint"),
        )
        .filter(F.col("lev") >= 0)
        .withColumn(
            "same_entity",
            F.expr("rec_a div 10") == F.expr("rec_b div 10"),
        )
        .distinct()
    )


def er_matched_pairs_sql() -> str:
    """cand + matched CTEs (append after er_block_keys_sql())."""
    return (
        " cand AS (SELECT DISTINCT a.rec_id AS rec_a,"
        "   b.rec_id AS rec_b, a.name AS name_a, b.name AS name_b"
        "  FROM keys a JOIN keys b"
        "   ON a.kind = b.kind AND a.k = b.k AND a.rec_id < b.rec_id"
        "  WHERE abs(length(a.name) - length(b.name)) <= 2),"
        " matched AS (SELECT rec_a, rec_b, name_a, name_b,"
        "   CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev,"
        "   (rec_a // 10) = (rec_b // 10) AS same_entity"
        "  FROM cand WHERE levenshtein(name_a, name_b) <= 2)"
    )


def _er_ctes() -> str:
    return er_records_sql() + "," + er_block_keys_sql() + "," + er_matched_pairs_sql()


def er_blocked_pairs(
    spark: SparkSession, sf_dir: str, zip_mod: int = ER_ZIP_MOD
) -> DataFrame:
    """Registry entry: the verified match-pair stream. `zip_mod` is
    the blocking-discriminator cardinality — the production scale
    knob (grow it with the corpus; the fixed default is exact-oracle
    plumbing)."""
    return er_matched_pairs(er_records(spark, sf_dir, zip_mod)).select(
        "rec_a", "rec_b", "name_a", "name_b", "lev", "same_entity"
    )


def er_block_stats(
    spark: SparkSession, sf_dir: str, zip_mod: int = ER_ZIP_MOD
) -> DataFrame:
    """Blocking audit — the dial you read BEFORE the candidate join
    at scale: per key kind, block count, total key rows, the largest
    block, and the implied candidate-pair workload sum(s*(s-1)/2).
    A max_block that grows super-linearly with corpus size means the
    key function is degenerating and the join will skew."""
    keys = er_block_keys(er_records(spark, sf_dir, zip_mod))
    sizes = keys.groupBy("kind", "k").agg(F.count("*").alias("s"))
    return (
        sizes.groupBy("kind")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("s").alias("n_key_rows"),
            F.max("s").alias("max_block"),
            F.sum(F.expr("(s * (s - 1)) div 2")).alias("n_candidate_pairs"),
        )
        .select("kind", "n_blocks", "n_key_rows", "max_block", "n_candidate_pairs")
    )


def er_clusters(
    spark: SparkSession, sf_dir: str, zip_mod: int = ER_ZIP_MOD
) -> DataFrame:
    """(rec_id, entity_id): transitive closure over the match pairs
    via the O(log n) large-star/small-star infrastructure. Clustering
    recovers what the pairwise threshold misses: a deletion copy and
    a transposition copy of the same entity can be 3 edits apart
    (unmatched directly) yet both within 2 of the base record."""
    pairs = er_matched_pairs(er_records(spark, sf_dir, zip_mod)).select(
        F.col("rec_a").alias("doc_a"), F.col("rec_b").alias("doc_b")
    )
    return label_components(pairs).select(
        F.col("doc_id").alias("rec_id"),
        F.col("component_id").alias("entity_id"),
    )


def er_golden_record(
    spark: SparkSession, sf_dir: str, zip_mod: int = ER_ZIP_MOD
) -> DataFrame:
    """One golden row per entity: survivor = highest-trust source
    (crm > web > app > legacy), ties to the lowest rec_id; singleton
    records are their own entity. n_members / n_sources ride the same
    single window partition — one shuffle on entity_id total."""
    recs = er_records(spark, sf_dir, zip_mod)
    pairs = er_matched_pairs(recs).select(
        F.col("rec_a").alias("doc_a"), F.col("rec_b").alias("doc_b")
    )
    comp = label_components(pairs).select(
        F.col("doc_id").alias("rec_id"), F.col("component_id").alias("eid")
    )
    tagged = (
        recs.join(comp, "rec_id", "left")
        .withColumn("entity_id", F.coalesce("eid", "rec_id"))
        .withColumn("prio", F.expr(_ER_SRC_PRIORITY))
    )
    w = Window.partitionBy("entity_id")
    ranked = tagged.select(
        "entity_id",
        "rec_id",
        "src",
        "name",
        F.row_number()
        .over(w.orderBy("prio", "rec_id"))
        .alias("rn"),
        F.count("*").over(w).alias("n_members"),
        F.size(F.collect_set("src").over(w)).cast("bigint").alias("n_sources"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "entity_id",
        F.col("rec_id").alias("survivor_rec_id"),
        F.col("src").alias("survivor_src"),
        F.col("name").alias("survivor_name"),
        "n_members",
        "n_sources",
    )


def er_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level linkage quality vs the known ground truth: true
    pairs are record pairs sharing a base customer. Recall < 1 (the
    legacy token-swap copies sit beyond the edit threshold) and
    precision < 1 (cross-entity name collisions) by construction, so
    both numbers carry signal. f1 uses the Dice identity
    2*tp/(pred+true) — one division, no chained rounding."""
    recs = er_records(spark, sf_dir)
    matched = er_matched_pairs(recs)
    per_base = recs.groupBy(F.expr("rec_id div 10").alias("base")).agg(
        F.count("*").alias("m")
    )
    truth = per_base.agg(
        F.sum(F.expr("(m * (m - 1)) div 2")).alias("n_true")
    )
    pred = matched.agg(
        F.count("*").alias("n_pred"),
        F.sum(F.col("same_entity").cast("bigint")).alias("n_tp"),
    )
    return truth.crossJoin(pred).select(
        F.col("n_true").alias("n_true_pairs"),
        F.col("n_pred").alias("n_pred_pairs"),
        F.col("n_tp").alias("n_tp"),
        F.round(F.col("n_tp") / F.col("n_pred"), 6).alias("precision"),
        F.round(F.col("n_tp") / F.col("n_true"), 6).alias("recall"),
        F.round(
            2.0 * F.col("n_tp") / (F.col("n_pred") + F.col("n_true")), 6
        ).alias("f1"),
    )


def write_er_index(
    spark: SparkSession,
    recs: DataFrame,
    table: str = "er_block_index",
    buckets: int = 16,
) -> None:
    """Materialize the blocking index (rec_id, name, kind, k) as a
    warehouse table BUCKETED on the probe key (kind, k) — the same
    persisted-index convention as dedup.write_band_index: after the
    one-time bootstrap, both the batch pair twin (a bucketed
    self-join) and the streaming ingest guard probe the index with
    ZERO index-side exchange. The name column rides in the index so
    the levenshtein verify needs no second join."""
    (
        er_block_keys(recs)
        .write.mode("overwrite")
        .bucketBy(buckets, "kind", "k")
        .sortBy("kind", "k")
        .saveAsTable(table)
    )


def append_er_index(
    spark: SparkSession,
    new_recs: DataFrame,
    table: str = "er_block_index",
) -> None:
    """Per-batch maintenance: append the new records' block keys
    (insertInto preserves the bucket spec, so appended files land in
    the right buckets and the probe stays exchange-free)."""
    er_block_keys(new_recs).write.insertInto(table)


def er_pairs_from_index(spark: SparkSession, table: str = "er_block_index") -> DataFrame:
    """The verified match-pair stream served from the PERSISTED
    blocking index: candidate generation is a self-join of the
    bucketed table on (kind, k) — both sides pre-co-located, zero
    exchange before the verify — instead of an inline re-derivation
    of records + keys. Output is bit-identical to er_matched_pairs
    (same length prefilter + levenshtein arm + post-verify distinct),
    so the indexed twin reuses er_blocked_pairs' oracle: the index
    changes the physical strategy, never the rows."""
    keys = spark.table(table)
    a = keys.alias("a")
    b = keys.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.kind") == F.col("b.kind"),
                F.col("a.k") == F.col("b.k"),
                F.col("a.rec_id") < F.col("b.rec_id"),
            ],
        )
        .select(
            F.col("a.rec_id").alias("rec_a"),
            F.col("b.rec_id").alias("rec_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= ER_LEV_THRESHOLD
        )
    )
    return (
        cand.withColumn(
            "lev",
            F.levenshtein(
                "name_a", "name_b", threshold=ER_LEV_THRESHOLD
            ).cast("bigint"),
        )
        .filter(F.col("lev") >= 0)
        .withColumn(
            "same_entity",
            F.expr("rec_a div 10") == F.expr("rec_b div 10"),
        )
        .distinct()
    )


def er_guard_probe(new_recs: DataFrame, index: DataFrame) -> DataFrame:
    """Stateless match probe of incoming records against the
    persisted blocking index — works identically on a batch or a
    streaming `new_recs` (every stage is a projection, a
    stream-static equi-join on the bucket key, or a row-local
    filter; no aggregation, so append-mode safe with zero state).
    Emits (rec_id, index_rec_id, kind, lev) — at-least-once per
    (record, index) pair (a pair co-blocking under both affix keys
    emits twice, kind as evidence); dedup belongs to the sink, as in
    neardup_guard_stream."""
    probe = er_block_keys(new_recs)
    idx = index.select(
        F.col("rec_id").alias("index_rec_id"),
        F.col("name").alias("index_name"),
        "kind",
        "k",
    )
    cands = probe.join(idx, ["kind", "k"]).filter(
        F.col("rec_id") != F.col("index_rec_id")
    )
    return (
        cands.filter(
            F.abs(F.length("name") - F.length("index_name"))
            <= ER_LEV_THRESHOLD
        )
        .withColumn(
            "lev",
            F.levenshtein(
                "name", "index_name", threshold=ER_LEV_THRESHOLD
            ).cast("bigint"),
        )
        .filter(F.col("lev") >= 0)
        .select("rec_id", "index_rec_id", "kind", "lev")
    )


def er_oracles() -> dict[str, str]:
    """Exact DuckDB oracles for the five linkage entries, all opening
    with the shared records/keys/matched CTE chain."""
    ctes = "WITH " + _er_ctes()
    return {
        "er_blocked_pairs": (
            ctes + " SELECT rec_a, rec_b, name_a, name_b, lev,"
            " same_entity FROM matched"
        ),
        "er_block_stats": (
            ctes + " SELECT kind,"
            "  CAST(count(*) AS BIGINT) AS n_blocks,"
            "  CAST(sum(s) AS BIGINT) AS n_key_rows,"
            "  CAST(max(s) AS BIGINT) AS max_block,"
            "  CAST(sum((s * (s - 1)) // 2) AS BIGINT)"
            "   AS n_candidate_pairs"
            " FROM (SELECT kind, k, count(*) AS s FROM keys"
            "  GROUP BY kind, k) t GROUP BY kind"
        ),
        "er_clusters": (
            "WITH RECURSIVE " + _er_ctes() + ","
            " edges AS (SELECT rec_a AS u, rec_b AS v FROM matched"
            "  UNION SELECT rec_b, rec_a FROM matched),"
            " reach(u, v) AS ("
            "  SELECT u, v FROM edges"
            "  UNION"
            "  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)"
            " SELECT u AS rec_id,"
            "  CAST(least(u, min(v)) AS BIGINT) AS entity_id"
            " FROM reach GROUP BY u"
        ),
        "er_golden_record": (
            "WITH RECURSIVE " + _er_ctes() + ","
            " edges AS (SELECT rec_a AS u, rec_b AS v FROM matched"
            "  UNION SELECT rec_b, rec_a FROM matched),"
            " reach(u, v) AS ("
            "  SELECT u, v FROM edges"
            "  UNION"
            "  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),"
            " comp AS (SELECT u AS rec_id,"
            "   CAST(least(u, min(v)) AS BIGINT) AS eid"
            "  FROM reach GROUP BY u),"
            " tagged AS (SELECT r.rec_id, r.src, r.name,"
            "   coalesce(c.eid, r.rec_id) AS entity_id,"
            f"   {_ER_SRC_PRIORITY} AS prio"
            "  FROM recs r LEFT JOIN comp c ON r.rec_id = c.rec_id),"
            " ranked AS (SELECT entity_id, rec_id, src, name,"
            "   row_number() OVER (PARTITION BY entity_id"
            "    ORDER BY prio, rec_id) AS rn,"
            "   count(*) OVER (PARTITION BY entity_id) AS n_members,"
            "   CAST(count(DISTINCT src) OVER"
            "    (PARTITION BY entity_id) AS BIGINT) AS n_sources"
            "  FROM tagged)"
            " SELECT entity_id, rec_id AS survivor_rec_id,"
            "  src AS survivor_src, name AS survivor_name,"
            "  n_members, n_sources FROM ranked WHERE rn = 1"
        ),
        "er_eval": (
            ctes + ","
            " truth AS (SELECT CAST(sum((m * (m - 1)) // 2) AS BIGINT)"
            "   AS n_true FROM (SELECT rec_id // 10 AS base,"
            "    count(*) AS m FROM recs GROUP BY 1) t),"
            " pred AS (SELECT CAST(count(*) AS BIGINT) AS n_pred,"
            "   CAST(sum(CASE WHEN same_entity THEN 1 ELSE 0 END)"
            "    AS BIGINT) AS n_tp FROM matched)"
            " SELECT n_true AS n_true_pairs, n_pred AS n_pred_pairs,"
            "  n_tp,"
            "  round(CAST(n_tp AS DOUBLE) / n_pred, 6) AS precision,"
            "  round(CAST(n_tp AS DOUBLE) / n_true, 6) AS recall,"
            "  round(2.0 * n_tp / (n_pred + n_true), 6) AS f1"
            " FROM truth, pred"
        ),
    }
