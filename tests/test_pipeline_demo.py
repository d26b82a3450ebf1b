"""The composed curation pipeline (scripts/pipeline_demo.py) smoke:
runs end-to-end at sf0.01 inside the test session — per-stage
attrition is monotone (asserted inside the script), retention is
non-trivial, and the index tables are cleaned up."""

import json
import os


def test_pipeline_demo_end_to_end(spark, monkeypatch, capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "pipeline_demo",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "pipeline_demo.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    assert mod.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_train_docs"] > 0
    assert 0 < out["retention_pct"] <= 100
    stages = out["stages"]
    assert stages["raw"]["rows"] >= stages["train_split"]["rows"]
    # demo cleaned its index tables out of the shared warehouse
    tables = {t.name for t in spark.catalog.listTables()}
    assert "pipe_bands" not in tables and "pipe_shingles" not in tables
