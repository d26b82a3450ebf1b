"""Project bundles: pack endpoint configs + SQL templates into one
portable, REPRODUCIBLE archive and load endpoints straight from it.

Reference parity (`pack.cpp`, `archive_io.cpp`, `bundle_locator.cpp`,
test/cpp/pack_test.cpp): the reference appends a ZIP bundle to its own
binary to ship a self-contained API server. The Spark-side analogue
keeps the SEMANTICS and drops the executable plumbing:

- the same secrets deny-list (.env files, secrets/ dirs, .pem, .key)
  refuses to bundle credentials unless explicitly allowed;
- deterministic output — entries sorted, timestamps pinned to
  SOURCE_DATE_EPOCH (env or argument, default 0), so the same tree
  always packs to byte-identical bytes (reproducible-build contract);
- bundle info / unpack round-trip, with zip-slip containment on
  extraction (reference: path_validator.cpp).
"""

from __future__ import annotations

import os
import re
import zipfile
from datetime import datetime, timezone
from pathlib import Path


class PackError(RuntimeError):
    pass


# reference pack.cpp SecretPatterns(): one regex per deny rule
_SECRET_PATTERNS = (
    re.compile(r"(^|/)[^/]*\.env$"),
    re.compile(r"(^|/)secrets/"),
    re.compile(r"(^|/)[^/]*\.pem$"),
    re.compile(r"(^|/)[^/]*\.key$"),
)


def is_secret_excluded(relpath: str) -> bool:
    """Does `relpath` (forward-slash relative path) match the default
    secrets deny-list?"""
    p = relpath.replace(os.sep, "/")
    return any(rx.search(p) for rx in _SECRET_PATTERNS)


def _source_date_epoch(explicit: int | None) -> int:
    if explicit is not None:
        return explicit
    env = os.environ.get("SOURCE_DATE_EPOCH")
    if env:
        try:
            return int(env)
        except ValueError:
            pass
    return 0


def pack_project(
    src_dir: str | Path,
    out_zip: str | Path,
    allow_secrets: bool = False,
    source_date_epoch: int | None = None,
) -> list[str]:
    """Bundle every file under `src_dir` into `out_zip`; returns the
    packed entry names (sorted — also the archive order). Raises
    PackError listing every deny-list match unless `allow_secrets`.

    Reproducibility: entries are added in sorted order with their
    mtime pinned to SOURCE_DATE_EPOCH and a fixed compression level,
    so identical trees yield byte-identical archives regardless of
    filesystem order or wall clock."""
    src = Path(src_dir)
    if not src.is_dir():
        raise PackError(f"not a directory: {src}")
    entries: list[str] = []
    for root, dirs, files in os.walk(src):
        dirs.sort()
        for f in sorted(files):
            rel = os.path.relpath(os.path.join(root, f), src).replace(os.sep, "/")
            entries.append(rel)
    entries.sort()
    secrets = [e for e in entries if is_secret_excluded(e)]
    if secrets and not allow_secrets:
        raise PackError(
            "refusing to bundle secret-like files (pass allow_secrets"
            f" to override): {', '.join(secrets)}"
        )
    epoch = _source_date_epoch(source_date_epoch)
    dt = datetime.fromtimestamp(max(epoch, 315532800), tz=timezone.utc)
    # zip date_time floor is 1980-01-01; clamp like reproducible-build
    # tooling does
    date_time = (dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second)
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED, compresslevel=6) as z:
        for rel in entries:
            info = zipfile.ZipInfo(rel, date_time=date_time)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            with open(src / rel, "rb") as fh:
                z.writestr(info, fh.read())
    return entries


def bundle_info(zip_path: str | Path) -> list[dict]:
    """List bundle entries: (name, size, compressed size) — the
    reference's PrintBundleInfo as data."""
    with zipfile.ZipFile(zip_path) as z:
        return [
            {
                "name": i.filename,
                "size": i.file_size,
                "compressed": i.compress_size,
            }
            for i in z.infolist()
        ]


def unpack_bundle(zip_path: str | Path, dst: str | Path) -> list[str]:
    """Restore every entry under `dst`; rejects entries that would
    escape it (zip-slip: absolute paths or .. traversal)."""
    dst_p = Path(dst).resolve()
    os.makedirs(dst_p, exist_ok=True)
    out: list[str] = []
    with zipfile.ZipFile(zip_path) as z:
        for info in z.infolist():
            name = info.filename
            target = (dst_p / name).resolve()
            if not str(target).startswith(str(dst_p) + os.sep):
                raise PackError(f"bundle entry escapes destination: {name}")
            if info.is_dir():
                # foreign archives carry explicit directory entries;
                # writing them as zero-byte regular files would make
                # the later 'dir/file' member collide with a file
                target.mkdir(parents=True, exist_ok=True)
                continue
            target.parent.mkdir(parents=True, exist_ok=True)
            with z.open(info) as src, open(target, "wb") as fh:
                fh.write(src.read())
            out.append(name)
    return out


def load_endpoints_from_bundle(zip_path: str | Path, env: dict | None = None):
    """Unpack to a temp dir and load every endpoint YAML through the
    standard config loader (includes/env expansion work unchanged —
    template-source paths resolve inside the unpacked tree), returning
    (endpoints, unpacked_dir). The caller owns the directory's
    lifetime (templates are read lazily at execute time)."""
    import tempfile

    from flapi_spark.config import load_endpoints_dir

    d = tempfile.mkdtemp(prefix="flapi_bundle_")
    unpack_bundle(zip_path, d)
    return load_endpoints_dir(d, env=env), d
