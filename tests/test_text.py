

def test_split_is_deterministic_and_partition_invariant(spark, sf_dir):
    from flapi_spark.operators.text import split_train_holdout
    from flapi_spark.session import load_table

    a = {r.doc_id: r.split for r in split_train_holdout(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in split_train_holdout(spark, sf_dir).collect()}
    assert a == b  # pure function of the row: stable across runs
    n = load_table(spark, sf_dir, "documents").count()
    holdout = sum(1 for v in a.values() if v == "holdout")
    assert 0.02 <= holdout / n <= 0.25  # ~10% by construction


def test_stratified_sample_subset_and_rates(spark, sf_dir):
    from flapi_spark.operators.text import sample_stratified_by_lang
    from flapi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    sample = sample_stratified_by_lang(spark, sf_dir)
    ids = {r.doc_id for r in docs.select("doc_id").collect()}
    sids = [r.doc_id for r in sample.select("doc_id").collect()]
    assert set(sids) <= ids and len(sids) == len(set(sids))
    # full-fraction strata are kept whole; en is halved (tolerance wide)
    n_de = docs.where("lang = 'de'").count()
    s_de = sample.where("lang = 'de'").count()
    assert s_de == n_de
    n_en = docs.where("lang = 'en'").count()
    s_en = sample.where("lang = 'en'").count()
    assert 0.25 * n_en <= s_en <= 0.75 * n_en
    # seeded: same seed, same sample
    again = {r.doc_id for r in sample_stratified_by_lang(spark, sf_dir).collect()}
    assert set(sids) == again
