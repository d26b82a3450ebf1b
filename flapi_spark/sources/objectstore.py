"""Object-store path + credential wiring (s3:// gs:// abfss://).

The reference resolves cloud credentials from the environment or the
``storage.credentials`` config block and attaches them to its engine
before reading object-store paths (reference: src/credential_manager.cpp,
examples/flapi-s3.yaml, flapi-gcs.yaml, flapi-azure.yaml). The
Spark-first analogue: translate each connection's credentials into the
Hadoop filesystem configuration keys the S3A / GCS / ABFS connectors
read, scoped PER BUCKET where the connector supports it
(``fs.s3a.bucket.<bucket>.*``) so two connections can carry different
credentials in one SparkSession — the same isolation the reference
gets from per-connection secrets.

Everything here is conf wiring — testable without a live bucket by
asserting the Hadoop configuration after ``apply``; actual reads need
the connector jars (hadoop-aws, gcs-connector, hadoop-azure) on the
cluster classpath, which a real deployment ships.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from urllib.parse import urlparse

from pyspark.sql import SparkSession

_S3_SCHEMES = ("s3", "s3a", "s3n")
OBJECT_STORE_SCHEMES = _S3_SCHEMES + ("gs", "abfss", "abfs", "wasbs")


def scheme_of(path: str) -> str | None:
    p = urlparse(path)
    return p.scheme.lower() if p.scheme else None


def is_object_store_path(path: str) -> bool:
    return scheme_of(path) in OBJECT_STORE_SCHEMES


def normalize_path(path: str) -> str:
    """``s3://`` → ``s3a://``: Hadoop's maintained S3 connector is S3A;
    the reference accepts s3:// because DuckDB's httpfs does (same
    object layout, different client)."""
    sch = scheme_of(path)
    if sch in ("s3", "s3n"):
        return "s3a://" + path.split("://", 1)[1]
    return path


def bucket_of(path: str) -> str | None:
    p = urlparse(path)
    return p.netloc or None


@dataclass
class ObjectStoreCredentials:
    """One connection's object-store credentials.

    ``from_env`` mirrors the reference's environment resolution
    (credential_manager.cpp: AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY /
    AWS_REGION|AWS_DEFAULT_REGION / AWS_SESSION_TOKEN /
    AWS_ENDPOINT_URL)."""

    access_key_id: str | None = None
    secret_access_key: str | None = None
    session_token: str | None = None
    region: str | None = None
    endpoint: str | None = None
    anonymous: bool = False
    # GCS
    gcs_keyfile: str | None = None
    # Azure
    azure_account: str | None = None
    azure_account_key: str | None = None
    azure_sas_token: str | None = None

    @classmethod
    def from_env(cls, env: dict | None = None) -> "ObjectStoreCredentials":
        env = os.environ if env is None else env
        return cls(
            access_key_id=env.get("AWS_ACCESS_KEY_ID"),
            secret_access_key=env.get("AWS_SECRET_ACCESS_KEY"),
            session_token=env.get("AWS_SESSION_TOKEN"),
            region=env.get("AWS_REGION") or env.get("AWS_DEFAULT_REGION"),
            endpoint=env.get("AWS_ENDPOINT_URL"),
            gcs_keyfile=env.get("GOOGLE_APPLICATION_CREDENTIALS"),
            azure_account=env.get("AZURE_STORAGE_ACCOUNT"),
            azure_account_key=env.get("AZURE_STORAGE_KEY"),
            azure_sas_token=env.get("AZURE_STORAGE_SAS_TOKEN"),
        )

    @classmethod
    def from_properties(cls, props: dict) -> "ObjectStoreCredentials":
        """Credentials block from a connection's YAML properties
        (``credentials: {type: environment}`` defers to from_env,
        matching the reference's ``type: environment``)."""
        creds = props.get("credentials") or {}
        if creds.get("type") == "environment":
            base = cls.from_env()
            if creds.get("region"):
                base.region = str(creds["region"])
            return base
        return cls(
            access_key_id=creds.get("access_key_id"),
            secret_access_key=creds.get("secret_access_key"),
            session_token=creds.get("session_token"),
            region=creds.get("region"),
            endpoint=creds.get("endpoint"),
            anonymous=bool(creds.get("anonymous", False)),
            gcs_keyfile=creds.get("gcs_keyfile"),
            azure_account=creds.get("azure_account"),
            azure_account_key=creds.get("azure_account_key"),
            azure_sas_token=creds.get("azure_sas_token"),
        )


def hadoop_confs(path: str, creds: ObjectStoreCredentials) -> dict[str, str]:
    """Hadoop configuration entries for reading `path` with `creds`.

    S3 entries are bucket-scoped (``fs.s3a.bucket.<bucket>.*``) so
    per-connection credentials coexist; GCS and ABFS use their
    connector's account-scoped keys."""
    sch = scheme_of(path)
    out: dict[str, str] = {}
    if sch in _S3_SCHEMES:
        bucket = bucket_of(path)
        prefix = f"fs.s3a.bucket.{bucket}" if bucket else "fs.s3a"
        if creds.anonymous:
            out[f"{prefix}.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
            )
        else:
            if creds.access_key_id:
                out[f"{prefix}.access.key"] = creds.access_key_id
            if creds.secret_access_key:
                out[f"{prefix}.secret.key"] = creds.secret_access_key
            if creds.session_token:
                out[f"{prefix}.session.token"] = creds.session_token
                out[f"{prefix}.aws.credentials.provider"] = (
                    "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
                )
        if creds.endpoint:
            out[f"{prefix}.endpoint"] = creds.endpoint
            # S3-compatible stores (minio etc.) need path-style access
            out[f"{prefix}.path.style.access"] = "true"
        if creds.region:
            out[f"{prefix}.endpoint.region"] = creds.region
    elif sch == "gs":
        if creds.gcs_keyfile:
            out["fs.gs.auth.type"] = "SERVICE_ACCOUNT_JSON_KEYFILE"
            out["fs.gs.auth.service.account.json.keyfile"] = creds.gcs_keyfile
        else:
            out["fs.gs.auth.type"] = "APPLICATION_DEFAULT"
    elif sch in ("abfss", "abfs", "wasbs"):
        account = creds.azure_account
        if account is None:
            # abfss://container@account.dfs.core.windows.net/...
            host = urlparse(path).netloc.split("@")[-1]
            account = host.split(".")[0] if host else None
        if account and creds.azure_account_key:
            out[f"fs.azure.account.key.{account}.dfs.core.windows.net"] = (
                creds.azure_account_key
            )
        elif account and creds.azure_sas_token:
            out[f"fs.azure.account.auth.type.{account}.dfs.core.windows.net"] = "SAS"
            out[f"fs.azure.sas.fixed.token.{account}.dfs.core.windows.net"] = (
                creds.azure_sas_token
            )
    return out


def apply(spark: SparkSession, confs: dict[str, str]) -> None:
    """Set entries on the live Hadoop configuration (runtime-settable —
    the FileSystem instances are created per-read)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in confs.items():
        hconf.set(k, v)


def configure_connection_path(
    spark: SparkSession, path: str, props: dict
) -> str:
    """One-call wiring for Connection.read: normalize the scheme, apply
    the credential confs, return the path to hand to spark.read."""
    if not is_object_store_path(path):
        return path
    creds = ObjectStoreCredentials.from_properties(props)
    apply(spark, hadoop_confs(path, creds))
    return normalize_path(path)
