"""CachingFileProvider + health checker, vector-mirrored from
reference test/cpp/test_vfs_cache.cpp (TTL via an injected clock
instead of sleeps)."""

import pytest

from flapi_spark.vfs import (
    CachingFileProvider,
    FileCacheConfig,
    FileOperationError,
    LocalFileProvider,
    check_health,
    check_path,
    scheme_of,
)


class MockProvider:
    provider_name = "mock"

    def __init__(self, content="cached content"):
        self.content_to_return = content
        self.read_count = 0

    def read_file(self, path):
        self.read_count += 1
        return self.content_to_return

    def file_exists(self, path):
        return True

    def list_files(self, directory, pattern="*"):
        return []

    def is_remote_path(self, path):
        from flapi_spark.vfs import is_remote_path

        return is_remote_path(path)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _cached(mock, **kw):
    clock = kw.pop("clock", FakeClock())
    cfg = FileCacheConfig(**kw) if kw else FileCacheConfig(ttl_s=60)
    return CachingFileProvider(mock, cfg, clock=clock), clock


def test_requires_underlying_provider():
    with pytest.raises(ValueError):
        CachingFileProvider(None)


def test_provider_name_includes_underlying():
    c, _ = _cached(MockProvider())
    assert c.provider_name == "caching(mock)"


def test_local_files_not_cached(tmp_path):
    mock = MockProvider("local content")
    c, _ = _cached(mock)
    f = tmp_path / "x.yaml"
    f.write_text("local content")
    c.read_file(str(f))
    c.read_file(str(f))
    assert mock.read_count == 2
    assert c.cache_entry_count() == 0


def test_remote_files_cached():
    mock = MockProvider()
    c, _ = _cached(mock)
    r1 = c.read_file("s3://bucket/key/file.yaml")
    assert mock.read_count == 1 and r1 == "cached content"
    assert c.stats.misses == 1
    r2 = c.read_file("s3://bucket/key/file.yaml")
    assert mock.read_count == 1 and r2 == "cached content"
    assert c.stats.hits == 1
    assert c.cache_entry_count() == 1


def test_different_remote_paths_cached_separately():
    mock = MockProvider()
    c, _ = _cached(mock)
    c.read_file("s3://bucket/file1.yaml")
    c.read_file("s3://bucket/file2.yaml")
    assert mock.read_count == 2 and c.cache_entry_count() == 2
    c.read_file("s3://bucket/file1.yaml")
    c.read_file("s3://bucket/file2.yaml")
    assert mock.read_count == 2 and c.stats.hits == 2


def test_ttl_expiry_refetches():
    mock = MockProvider("content v1")
    c, clock = _cached(mock, ttl_s=1.0, max_size_bytes=1 << 20)
    c.read_file("s3://bucket/file.yaml")
    c.read_file("s3://bucket/file.yaml")
    assert mock.read_count == 1
    clock.t = 1.1  # past TTL
    mock.content_to_return = "content v2"
    assert c.read_file("s3://bucket/file.yaml") == "content v2"
    assert mock.read_count == 2


def test_lru_eviction_under_max_size():
    mock = MockProvider("a" * 40)
    c, clock = _cached(mock, ttl_s=300, max_size_bytes=100)
    c.read_file("s3://bucket/file1.yaml")
    clock.t = 1
    c.read_file("s3://bucket/file2.yaml")
    clock.t = 2
    c.read_file("s3://bucket/file3.yaml")
    assert c.cache_size_bytes() <= 100
    assert c.stats.evictions > 0
    # file1 (oldest access) was the victim
    c.read_file("s3://bucket/file3.yaml")
    assert mock.read_count == 3  # still cached


def test_oversize_file_not_cached():
    mock = MockProvider("x" * 200)
    c, _ = _cached(mock, ttl_s=300, max_size_bytes=100)
    c.read_file("s3://bucket/large.yaml")
    assert c.cache_entry_count() == 0


def test_invalidate_and_clear():
    mock = MockProvider()
    c, _ = _cached(mock)
    c.read_file("s3://bucket/file1.yaml")
    c.read_file("s3://bucket/file2.yaml")
    assert c.invalidate("s3://bucket/file1.yaml") is True
    assert c.cache_entry_count() == 1
    c.read_file("s3://bucket/file1.yaml")
    assert mock.read_count == 3
    assert c.invalidate("s3://bucket/nonexistent.yaml") is False
    c.read_file("s3://bucket/file3.yaml")
    c.clear_cache()
    assert c.cache_entry_count() == 0 and c.cache_size_bytes() == 0


def test_caching_disabled_always_reads_through():
    mock = MockProvider()
    c, _ = _cached(mock, enabled=False, ttl_s=60, max_size_bytes=1 << 20)
    c.read_file("s3://bucket/file.yaml")
    c.read_file("s3://bucket/file.yaml")
    assert mock.read_count == 2
    assert c.cache_entry_count() == 0


def test_read_errors_propagate_not_cached():
    class Failing(MockProvider):
        def read_file(self, path):
            self.read_count += 1
            raise FileOperationError("boom")

    mock = Failing()
    c, _ = _cached(mock)
    with pytest.raises(FileOperationError):
        c.read_file("s3://bucket/file.yaml")
    assert c.cache_entry_count() == 0
    with pytest.raises(FileOperationError):
        c.read_file("s3://bucket/file.yaml")
    assert mock.read_count == 2  # no poisoned cache entry


def test_scheme_detection():
    assert scheme_of("s3://b/k") == "s3"
    assert scheme_of("s3a://b/k") == "s3"
    assert scheme_of("gs://b/k") == "gs"
    assert scheme_of("abfss://c@a.dfs.core.windows.net/p") == "az"
    assert scheme_of("https://host/x") == "https"
    assert scheme_of("http://host/x") == "http"
    assert scheme_of("/local/path") == "local"
    assert scheme_of("") == "local"


def test_check_path_local(tmp_path):
    f = tmp_path / "flapi.yaml"
    f.write_text("project-name: t")
    st = check_path("config", str(f))
    assert st.accessible is True and st.scheme == "local"
    # directories are accessible via the listing fallback
    st2 = check_path("templates", str(tmp_path))
    assert st2.accessible is True
    st3 = check_path("config", str(tmp_path / "missing"))
    assert st3.accessible is False and st3.error
    st4 = check_path("config", "")
    assert st4.accessible is False and st4.error == "Path is empty"


def test_check_health_aggregates(tmp_path):
    ok = tmp_path / "sqls"
    ok.mkdir()
    h = check_health(str(tmp_path), str(ok))
    assert h.healthy is True and len(h.backends) == 2
    h2 = check_health(str(tmp_path), str(tmp_path / "nope"))
    assert h2.healthy is False
    names = [b.name for b in h2.backends]
    assert names == ["config", "templates"]


def test_local_provider_list_and_read(tmp_path):
    (tmp_path / "a.sql").write_text("SELECT 1")
    (tmp_path / "b.yaml").write_text("x: 1")
    p = LocalFileProvider()
    assert p.read_file(str(tmp_path / "a.sql")) == "SELECT 1"
    assert [f.endswith("a.sql") for f in p.list_files(str(tmp_path), "*.sql")] == [True]
    with pytest.raises(FileOperationError):
        p.list_files(str(tmp_path / "nodir"))
    with pytest.raises(FileOperationError):
        p.read_file(str(tmp_path / "nofile"))


def test_remote_template_source_served_through_provider():
    """A remote template-source routes through the (caching) file
    provider instead of the local filesystem."""
    from flapi_spark.config import EndpointConfig

    ep = EndpointConfig(
        url_path="/remote",
        template_source="s3://bucket/tpl/q.sql",
    )
    mock = MockProvider("SELECT 42 AS x")
    cached = CachingFileProvider(mock, FileCacheConfig(ttl_s=60),
                                 clock=FakeClock())
    assert ep.load_template(provider=cached) == "SELECT 42 AS x"
    assert ep.load_template(provider=cached) == "SELECT 42 AS x"
    assert mock.read_count == 1  # second read served from cache
    with pytest.raises(ValueError, match="file provider"):
        ep.load_template()


class TestArchiveFileProvider:
    """In-place bundle serving (reference:
    embedded_archive_file_provider.cpp): read/exists/list straight
    from the zip, zip-slip-shaped names rejected, and an executor can
    run an endpoint whose template loads through the provider without
    any unpack."""

    def _bundle(self, tmp_path):
        from flapi_spark.bundle import pack_project

        proj = tmp_path / "proj"
        proj.mkdir()
        (proj / "customers.yaml").write_text(
            "url-path: /customers\n"
            "template-source: customers.sql\n"
            "with-pagination: false\n"
        )
        (proj / "customers.sql").write_text("SELECT 11 AS eleven")
        out = tmp_path / "proj.zip"
        pack_project(proj, out)
        return out

    def test_read_exists_list(self, tmp_path):
        from flapi_spark.vfs import ArchiveFileProvider, FileOperationError

        p = ArchiveFileProvider(str(self._bundle(tmp_path)))
        assert p.file_exists("customers.sql")
        assert "SELECT 11" in p.read_file("customers.sql")
        assert not p.file_exists("nope.sql")
        import pytest as _pytest

        with _pytest.raises(FileOperationError):
            p.read_file("nope.sql")
        with _pytest.raises(FileOperationError):
            p.read_file("../etc/passwd")
        assert not p.file_exists("/abs/path")
        names = p.list_files("", "*.sql")
        assert names == ["customers.sql"]

    def test_executor_serves_template_from_archive(self, tmp_path, spark):
        from flapi_spark.config import EndpointConfig
        from flapi_spark.executor import QueryExecutor
        from flapi_spark.vfs import ArchiveFileProvider

        provider = ArchiveFileProvider(str(self._bundle(tmp_path)))
        ep = EndpointConfig.from_dict({
            "url-path": "/customers",
            "template-source": "customers.sql",
            "with-pagination": False,
        })
        ex = QueryExecutor(spark, None, file_provider=provider)
        res = ex.execute(ep, {})
        assert res.df.collect()[0].eleven == 11
