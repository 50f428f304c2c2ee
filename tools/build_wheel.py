"""Build the squirtle-spark wheel WITHOUT the `build`/`wheel` frontends.

This sandbox has setuptools but neither `python -m build` nor the
`wheel` package, and no network for pip's PEP 517 build isolation — so
this script constructs the PEP 427 artifact directly: a zip of the
package tree plus a `*.dist-info/` with METADATA (metadata pulled from
pyproject.toml so the two can't drift), WHEEL, and a sha256 RECORD. pip
installs the result with no extra tooling (`pip install dist/*.whl`),
which is the durable cluster-deploy path (spark-submit
--py-files dist/*.whl) next to the session's content-addressed runtime
zip (session._package_zip — the in-session equivalent).

Deterministic like the runtime zip: sorted members, pinned timestamps,
pinned permissions — same tree, same bytes.

Usage: python tools/build_wheel.py [out_dir]   (default: <repo>/dist)
Prints the built wheel path.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile
from pathlib import Path

_TAG = "py3-none-any"


def _record_hash(data: bytes) -> str:
    return (
        "sha256="
        + base64.urlsafe_b64encode(hashlib.sha256(data).digest())
        .rstrip(b"=")
        .decode()
    )


def build_wheel(repo: str | Path, out_dir: str | Path | None = None) -> str:
    repo = Path(repo)
    meta = tomllib.loads((repo / "pyproject.toml").read_text())["project"]
    name = meta["name"].replace("-", "_")
    version = meta["version"]
    out = Path(out_dir) if out_dir else repo / "dist"
    out.mkdir(parents=True, exist_ok=True)
    whl = out / f"{name}-{version}-{_TAG}.whl"
    dist_info = f"{name}-{version}.dist-info"

    metadata_lines = [
        "Metadata-Version: 2.1",
        f"Name: {meta['name']}",
        f"Version: {version}",
        f"Summary: {meta['description']}",
        f"Requires-Python: {meta['requires-python']}",
        f"License: {meta['license']['text']}",
    ]
    for dep in meta.get("dependencies", []):
        metadata_lines.append(f"Requires-Dist: {dep}")
    for extra, deps in meta.get("optional-dependencies", {}).items():
        metadata_lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            metadata_lines.append(f'Requires-Dist: {dep} ; extra == "{extra}"')
    metadata = ("\n".join(metadata_lines) + "\n").encode()
    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: squirtle-spark build_wheel\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {_TAG}\n"
    ).encode()

    pkg_dir = repo / "squirtle_spark"
    members: list[tuple[str, bytes]] = [
        (
            str(Path("squirtle_spark") / p.relative_to(pkg_dir)),
            p.read_bytes(),
        )
        for p in sorted(pkg_dir.rglob("*.py"))
        if "__pycache__" not in p.parts
    ]
    members.append((f"{dist_info}/METADATA", metadata))
    members.append((f"{dist_info}/WHEEL", wheel_meta))

    record_rows = [
        f"{arc},{_record_hash(data)},{len(data)}" for arc, data in members
    ]
    record_rows.append(f"{dist_info}/RECORD,,")
    record = ("\n".join(record_rows) + "\n").encode()
    members.append((f"{dist_info}/RECORD", record))

    tmp = whl.with_suffix(".whl.tmp")
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, data in members:
            zi = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data, zipfile.ZIP_DEFLATED)
    os.replace(tmp, whl)
    return str(whl)


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(build_wheel(repo, sys.argv[1] if len(sys.argv) > 1 else None))
