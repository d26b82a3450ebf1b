"""Object-store credential wiring (reference: credential_manager.cpp,
examples/flapi-s3.yaml) — conf mapping asserted without a live bucket."""
import pytest

from flapi_spark.sources import objectstore as OS


def test_scheme_normalization():
    assert OS.normalize_path("s3://b/k.parquet") == "s3a://b/k.parquet"
    assert OS.normalize_path("s3a://b/k") == "s3a://b/k"
    assert OS.normalize_path("gs://b/k") == "gs://b/k"
    assert OS.normalize_path("/local/path") == "/local/path"
    assert not OS.is_object_store_path("/local/path")
    assert OS.is_object_store_path("abfss://c@acct.dfs.core.windows.net/p")


def test_env_resolution_matches_reference_variables():
    env = {
        "AWS_ACCESS_KEY_ID": "AK", "AWS_SECRET_ACCESS_KEY": "SK",
        "AWS_DEFAULT_REGION": "eu-west-1", "AWS_SESSION_TOKEN": "TOK",
        "AWS_ENDPOINT_URL": "http://localhost:9000",
    }
    c = OS.ObjectStoreCredentials.from_env(env)
    assert (c.access_key_id, c.secret_access_key) == ("AK", "SK")
    assert c.region == "eu-west-1"  # AWS_REGION falls back to DEFAULT
    assert c.session_token == "TOK" and c.endpoint == "http://localhost:9000"


def test_s3_confs_are_bucket_scoped():
    c = OS.ObjectStoreCredentials(
        access_key_id="AK", secret_access_key="SK", session_token="TOK",
        region="us-east-1", endpoint="http://minio:9000",
    )
    confs = OS.hadoop_confs("s3://warehouse/data.parquet", c)
    p = "fs.s3a.bucket.warehouse"
    assert confs[f"{p}.access.key"] == "AK"
    assert confs[f"{p}.secret.key"] == "SK"
    assert confs[f"{p}.session.token"] == "TOK"
    assert "TemporaryAWSCredentialsProvider" in confs[f"{p}.aws.credentials.provider"]
    assert confs[f"{p}.endpoint"] == "http://minio:9000"
    assert confs[f"{p}.path.style.access"] == "true"
    assert confs[f"{p}.endpoint.region"] == "us-east-1"
    # two buckets, two credential sets, no key collisions
    other = OS.hadoop_confs(
        "s3://lake/x", OS.ObjectStoreCredentials(access_key_id="AK2",
                                                 secret_access_key="SK2"))
    assert set(confs) & set(other) == set()


def test_anonymous_s3():
    confs = OS.hadoop_confs(
        "s3://public-bucket/x", OS.ObjectStoreCredentials(anonymous=True)
    )
    assert "AnonymousAWSCredentialsProvider" in (
        confs["fs.s3a.bucket.public-bucket.aws.credentials.provider"]
    )


def test_gcs_and_azure_confs():
    g = OS.hadoop_confs(
        "gs://b/x", OS.ObjectStoreCredentials(gcs_keyfile="/k.json")
    )
    assert g["fs.gs.auth.type"] == "SERVICE_ACCOUNT_JSON_KEYFILE"
    a = OS.hadoop_confs(
        "abfss://cont@myacct.dfs.core.windows.net/x",
        OS.ObjectStoreCredentials(azure_account_key="ZKEY"),
    )
    assert a["fs.azure.account.key.myacct.dfs.core.windows.net"] == "ZKEY"
    sas = OS.hadoop_confs(
        "abfss://cont@myacct.dfs.core.windows.net/x",
        OS.ObjectStoreCredentials(azure_sas_token="sv=..."),
    )
    assert sas["fs.azure.account.auth.type.myacct.dfs.core.windows.net"] == "SAS"


def test_apply_reaches_live_hadoop_conf(spark):
    OS.apply(spark, {"fs.s3a.bucket.tb.access.key": "A1"})
    got = spark.sparkContext._jsc.hadoopConfiguration().get(
        "fs.s3a.bucket.tb.access.key"
    )
    assert got == "A1"


def test_connection_properties_credentials_block(spark):
    """Connection.read wiring: a credentials block on the connection
    lands in the Hadoop conf before the read (asserted via conf; the
    read itself needs connector jars + a live bucket)."""
    props = {
        "path": "s3://wired-bucket/data.parquet",
        "credentials": {"access_key_id": "PK", "secret_access_key": "PS",
                        "region": "ap-south-1"},
    }
    out = OS.configure_connection_path(spark, props["path"], props)
    assert out == "s3a://wired-bucket/data.parquet"
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.bucket.wired-bucket.access.key") == "PK"
    assert hc.get("fs.s3a.bucket.wired-bucket.endpoint.region") == "ap-south-1"
    # local paths pass through untouched
    assert OS.configure_connection_path(spark, "/tmp/x.parquet", {}) == "/tmp/x.parquet"
