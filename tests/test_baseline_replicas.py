"""Referential integrity of the multi-SF replica builder (round-8
correction in scripts/baseline_multi_sf.py): every foreign key in a
replicated fact table must resolve in its replicated dimension —
the property whose absence made pre-r8 TPC-H-family grid cells
measure semi-matched joins."""

import importlib.util
import os
import shutil


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "baseline_multi_sf",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "baseline_multi_sf.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_replicas_preserve_referential_integrity(spark):
    mod = _load_mod()
    base = "/root/testdata/sf0.01"
    out = mod.build_replica(spark, base, 2)
    try:
        orders = spark.read.parquet(os.path.join(out, "orders.parquet"))
        cust = spark.read.parquet(os.path.join(out, "customer.parquet"))
        li = spark.read.parquet(os.path.join(out, "lineitem.parquet"))
        part = spark.read.parquet(os.path.join(out, "part.parquet"))
        supp = spark.read.parquet(os.path.join(out, "supplier.parquet"))
        n_src = spark.read.parquet(
            os.path.join(base, "orders.parquet")).count()
        assert orders.count() == 2 * n_src
        # every FK resolves within the replica corpus
        assert orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_anti"
        ).count() == 0
        assert li.join(
            orders, li.l_orderkey == orders.o_orderkey, "left_anti"
        ).count() == 0
        assert li.join(
            part, li.l_partkey == part.p_partkey, "left_anti"
        ).count() == 0
        assert li.join(
            supp, li.l_suppkey == supp.s_suppkey, "left_anti"
        ).count() == 0
        # replica-1 keys are disjoint from replica-0 keys
        assert cust.select("c_custkey").distinct().count() == cust.count()
        # part names are replica-suffixed -> the two replicas share NO
        # names (source names repeat, so compare distinct counts)
        n_src_names = spark.read.parquet(
            os.path.join(base, "part.parquet")
        ).select("p_name").distinct().count()
        assert part.select("p_name").distinct().count() == 2 * n_src_names
    finally:
        shutil.rmtree(out, ignore_errors=True)
