import textwrap

from flapi_spark.config import load_endpoint_yaml, load_endpoints_dir


def write(p, text):
    p.write_text(textwrap.dedent(text))


def test_basic_endpoint(tmp_path):
    write(
        tmp_path / "ep.yaml",
        """
        url-path: /customers/
        template-source: q.sql
        with-pagination: true
        connection:
          - customers-parquet
        request:
          - field-name: id
            field-in: query
            required: false
            validators:
              - type: int
                min: 1
        cache:
          enabled: true
          table: cust_cache
          schedule: 5m
          primary-key: [id]
          cursor:
            column: registration_date
            type: date
          retention:
            keep-last-snapshots: 3
            max-snapshot-age: 7d
        """,
    )
    (tmp_path / "q.sql").write_text("SELECT 1 AS one")
    ep = load_endpoint_yaml(tmp_path / "ep.yaml")
    assert ep.url_path == "/customers/"
    assert ep.connections == ["customers-parquet"]
    assert ep.request_fields[0].field_name == "id"
    assert ep.request_fields[0].validators[0].type == "int"
    assert ep.cache.enabled and ep.cache.table == "cust_cache"
    assert ep.cache.primary_key == ["id"]
    assert ep.cache.cursor_column == "registration_date"
    assert ep.cache.keep_last_snapshots == 3
    assert ep.load_template() == "SELECT 1 AS one"


def test_include_section(tmp_path):
    write(
        tmp_path / "common.yaml",
        """
        request:
          - field-name: segment
            validators:
              - type: enum
                allowedValues: [A, B]
        rate-limit:
          enabled: true
          max: 100
        """,
    )
    write(
        tmp_path / "ep.yaml",
        """
        url-path: /x/
        template-text: SELECT 1 AS one
        {{include:request from common.yaml}}
        {{include:rate-limit from common.yaml}}
        """,
    )
    ep = load_endpoint_yaml(tmp_path / "ep.yaml")
    assert ep.request_fields[0].field_name == "segment"
    assert ep.rate_limit["max"] == 100


def test_env_expansion(tmp_path):
    write(
        tmp_path / "ep.yaml",
        """
        url-path: /x/
        template-text: SELECT 1 AS one
        auth:
          enabled: true
          users:
            - username: '{{env.TEST_USER}}'
        """,
    )
    ep = load_endpoint_yaml(tmp_path / "ep.yaml", env={"TEST_USER": "alice"})
    assert ep.auth["users"][0]["username"] == "alice"


def test_load_endpoints_dir(tmp_path):
    write(tmp_path / "a.yaml", "url-path: /a/\ntemplate-text: SELECT 1 AS one\n")
    write(tmp_path / "notes.yaml", "just: notes\n")
    eps = load_endpoints_dir(tmp_path)
    assert [e.url_path for e in eps] == ["/a/"]
