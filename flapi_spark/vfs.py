"""VFS abstraction: caching file provider + storage health checks.

The reference serves configs/templates from remote object stores
through a TTL'd in-memory cache with LRU eviction and per-scheme
health probes (reference: src/caching_file_provider.cpp,
src/vfs_health_checker.cpp, test/cpp/test_vfs_cache.cpp,
docs/features/flapi-10-fs-abstraction.md). In this engine the same
layer fronts template/config reads so a Spark driver restarting its
endpoints doesn't hammer s3/gs on every hot-reload poll.

Only REMOTE paths cache (local reads are already cheap and must stay
fresh for hot reload); existence checks and directory listings are
never cached (freshness, mirroring the reference). Scale shape: this
is driver-side metadata caching, bounded by max_size_bytes — executor
data reads go through Hadoop FS connectors (sources/objectstore.py),
not here.
"""

from __future__ import annotations

import fnmatch
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path

_REMOTE_SCHEMES = ("s3://", "s3a://", "gs://", "gcs://", "az://",
                   "abfs://", "abfss://", "http://", "https://")


def scheme_of(path: str) -> str:
    """Scheme classification (reference: vfs_health_checker.cpp
    getSchemeType): s3 / gs / az / http / https / local."""
    low = (path or "").lower()
    if low.startswith(("s3://", "s3a://")):
        return "s3"
    if low.startswith(("gs://", "gcs://")):
        return "gs"
    if low.startswith(("az://", "abfs://", "abfss://")):
        return "az"
    if low.startswith("https://"):
        return "https"
    if low.startswith("http://"):
        return "http"
    return "local"


def is_remote_path(path: str) -> bool:
    return (path or "").lower().startswith(_REMOTE_SCHEMES)


class FileOperationError(OSError):
    """Provider-level read/list failure (reference: FileOperationError)."""


class LocalFileProvider:
    """Plain local-filesystem provider."""

    provider_name = "local"

    def read_file(self, path: str) -> str:
        try:
            return Path(path).read_text()
        except OSError as exc:
            raise FileOperationError(str(exc)) from exc

    def file_exists(self, path: str) -> bool:
        return Path(path).is_file()

    def list_files(self, directory: str, pattern: str = "*") -> list[str]:
        d = Path(directory)
        if not d.is_dir():
            raise FileOperationError(f"not a directory: {directory}")
        return sorted(
            str(p) for p in d.iterdir()
            if p.is_file() and fnmatch.fnmatch(p.name, pattern)
        )

    def is_remote_path(self, path: str) -> bool:
        return is_remote_path(path)


@dataclass
class FileCacheConfig:
    enabled: bool = True
    ttl_s: float = 60.0
    max_size_bytes: int = 1024 * 1024


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0
    current_entries: int = 0
    current_size_bytes: int = 0


@dataclass
class _Entry:
    content: str
    expires_at: float
    last_access: float
    size_bytes: int


class CachingFileProvider:
    """TTL + LRU cache over any provider; caches only remote paths
    (reference: caching_file_provider.cpp, test vectors in
    test/cpp/test_vfs_cache.cpp — hit/miss counters, TTL refetch, LRU
    eviction under max_size_bytes, oversize bypass, invalidate/clear).

    `clock` is injectable so TTL tests don't sleep."""

    def __init__(
        self,
        underlying,
        config: FileCacheConfig | None = None,
        clock=time.monotonic,
    ):
        if underlying is None:
            raise ValueError(
                "CachingFileProvider requires a non-null underlying provider"
            )
        self._underlying = underlying
        self._config = config or FileCacheConfig()
        self._clock = clock
        self._cache: dict[str, _Entry] = {}
        self._lock = threading.Lock()
        self.stats = CacheStats()

    @property
    def provider_name(self) -> str:
        return f"caching({self._underlying.provider_name})"

    def _should_cache(self, path: str) -> bool:
        return self._config.enabled and is_remote_path(path)

    def _evict_lru(self, needed: int) -> None:
        # oldest-accessed first, until the new entry fits
        target = max(self._config.max_size_bytes - needed, 0)
        for path in sorted(self._cache, key=lambda p: self._cache[p].last_access):
            if self.stats.current_size_bytes <= target:
                break
            e = self._cache.pop(path)
            self.stats.evictions += 1
            self.stats.current_entries -= 1
            self.stats.current_size_bytes -= e.size_bytes

    def read_file(self, path: str) -> str:
        if not self._should_cache(path):
            return self._underlying.read_file(path)
        now = self._clock()
        with self._lock:
            e = self._cache.get(path)
            if e is not None:
                if now < e.expires_at:
                    e.last_access = now
                    self.stats.hits += 1
                    return e.content
                self._cache.pop(path)
                self.stats.current_entries -= 1
                self.stats.current_size_bytes -= e.size_bytes
        self.stats.misses += 1
        content = self._underlying.read_file(path)
        size = len(content.encode())
        with self._lock:
            if size > self._config.max_size_bytes:
                return content  # too large to cache
            if self.stats.current_size_bytes + size > self._config.max_size_bytes:
                self._evict_lru(size)
            if path not in self._cache:
                now = self._clock()
                self._cache[path] = _Entry(
                    content, now + self._config.ttl_s, now, size
                )
                self.stats.current_entries += 1
                self.stats.current_size_bytes += size
        return content

    def file_exists(self, path: str) -> bool:
        # never cached: existence checks must stay fresh
        return self._underlying.file_exists(path)

    def list_files(self, directory: str, pattern: str = "*") -> list[str]:
        # never cached: directory listings must stay fresh
        return self._underlying.list_files(directory, pattern)

    def is_remote_path(self, path: str) -> bool:
        return self._underlying.is_remote_path(path)

    def invalidate(self, path: str) -> bool:
        with self._lock:
            e = self._cache.pop(path, None)
            if e is None:
                return False
            self.stats.current_entries -= 1
            self.stats.current_size_bytes -= e.size_bytes
            return True

    def clear_cache(self) -> None:
        with self._lock:
            self._cache.clear()
            self.stats.current_entries = 0
            self.stats.current_size_bytes = 0

    def cache_entry_count(self) -> int:
        return self.stats.current_entries

    def cache_size_bytes(self) -> int:
        return self.stats.current_size_bytes


@dataclass
class StorageBackendStatus:
    name: str
    path: str
    scheme: str
    accessible: bool = False
    latency_ms: int = 0
    error: str = ""


@dataclass
class StorageHealthStatus:
    healthy: bool = True
    total_latency_ms: int = 0
    backends: list[StorageBackendStatus] = field(default_factory=list)


def check_path(
    name: str, path: str, provider=None, clock=time.monotonic
) -> StorageBackendStatus:
    """Probe one backend (reference: vfs_health_checker.cpp
    checkPath): existence first, directory listing as the fallback,
    latency measured around the whole probe, errors captured rather
    than raised."""
    status = StorageBackendStatus(name=name, path=path, scheme=scheme_of(path))
    if not path:
        status.error = "Path is empty"
        return status
    provider = provider or LocalFileProvider()
    start = clock()
    try:
        exists = provider.file_exists(path)
        if not exists:
            try:
                provider.list_files(path, "*")
                exists = True
            except FileOperationError:
                exists = False
        status.accessible = exists
        if not exists:
            status.error = "Path not found or not accessible"
    except FileOperationError as exc:
        status.error = str(exc)
    except Exception as exc:  # pragma: no cover - defensive parity
        status.error = f"Unexpected error: {exc}"
    status.latency_ms = int((clock() - start) * 1000)
    return status


def check_health(
    config_path: str, templates_path: str, provider=None
) -> StorageHealthStatus:
    """Probe the config + templates backends (reference:
    vfs_health_checker.cpp checkHealth): healthy iff every non-empty
    path is accessible."""
    health = StorageHealthStatus()
    start = time.monotonic()
    for name, p in (("config", config_path), ("templates", templates_path)):
        if not p:
            continue
        st = check_path(name, p, provider=provider)
        health.backends.append(st)
        if not st.accessible:
            health.healthy = False
    health.total_latency_ms = int((time.monotonic() - start) * 1000)
    return health


class ArchiveFileProvider:
    """File provider serving DIRECTLY from a packed project bundle —
    no unpack, no temp dir (reference:
    embedded_archive_file_provider.cpp serves configs/templates from
    the archive appended to the self-extracting binary; this is the
    same in-place semantics over the zip bundle format of
    flapi_spark/bundle.py). Paths are archive-relative; absolute or
    parent-escaping names are rejected the same way unpack_bundle
    rejects zip-slip entries."""

    provider_name = "archive"
    # templates/configs live INSIDE the bundle: intercept every
    # template-source path, not just remote schemes
    serves_local = True

    def __init__(self, zip_path: str):
        import zipfile

        self._zip_path = str(zip_path)
        self._zf = zipfile.ZipFile(self._zip_path)
        self._names = set(self._zf.namelist())

    @staticmethod
    def _check(path: str) -> str:
        p = str(path).replace("\\", "/")
        if p.startswith("/") or ".." in p.split("/"):
            raise FileOperationError(
                f"archive path escapes the bundle: {path!r}"
            )
        return p

    def read_file(self, path: str) -> str:
        p = self._check(path)
        if p not in self._names:
            raise FileOperationError(
                f"no such entry in {self._zip_path}: {path!r}"
            )
        return self._zf.read(p).decode("utf-8")

    def file_exists(self, path: str) -> bool:
        try:
            return self._check(path) in self._names
        except FileOperationError:
            return False

    def list_files(self, directory: str, pattern: str = "*") -> list[str]:
        d = self._check(directory).rstrip("/")
        prefix = d + "/" if d else ""
        out = []
        for n in self._names:
            if not n.startswith(prefix) or n == prefix:
                continue
            rest = n[len(prefix):]
            if "/" in rest:  # direct children only, like LocalFileProvider
                continue
            if fnmatch.fnmatch(rest, pattern):
                out.append(n)
        return sorted(out)

    def glob(self, pattern: str = "*") -> list[str]:
        """Every entry at ANY depth whose basename matches `pattern`
        (the recursive companion to list_files — bundles nest their
        endpoint YAMLs under endpoints/)."""
        return sorted(
            n for n in self._names
            if fnmatch.fnmatch(n.rsplit("/", 1)[-1], pattern)
        )

    def is_remote_path(self, path: str) -> bool:
        return False

    def close(self) -> None:
        self._zf.close()
