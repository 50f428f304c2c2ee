"""Launch-directory independence for mapInPandas operators.

VERDICT r12 item 2: module-level functions passed to ``mapInPandas`` are
pickled by reference, so Python workers must ``import squirtle_spark``.
Before the ``addPyFile`` shipment in ``session._ship_package`` this only
resolved when the driver's inherited cwd was the repo root — running the
same entry from ``/tmp`` killed the worker in ``read_udfs``. The reference
avoids the class by shipping the executable stage to workers in the
function environment (flock/src/runtime/context.rs:366-407); the rebuild
must ship its Python equivalently.

The subprocess reproduces the exact failing shape: driver cwd in a temp
dir, repo root injected into the DRIVER's sys.path only (not PYTHONPATH —
workers never see driver sys.path edits, which is the whole bug).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER_SCRIPT = """
import json, sys
sys.path.insert(0, {repo!r})  # driver-side only; workers don't inherit this
from squirtle_spark.session import get_spark
from squirtle_spark import catalog
from squirtle_spark.registry import load_all

spark = get_spark(app_name="squirtle-cwd-test", cpus=4)
catalog.register_all(spark, {sf_dir!r})
qs = load_all()
out = {{}}
for name in ("multimodal_decode", "multimodal_framesample"):
    out[name] = qs[name].spark_fn(spark, {sf_dir!r}).count()
print("RESULT:" + json.dumps(out))
"""


def test_mapinpandas_runs_with_cwd_outside_repo(sf_dir, tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT.format(repo=REPO, sf_dir=sf_dir)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    counts = json.loads(line[0][len("RESULT:") :])
    assert counts["multimodal_decode"] > 0
    assert counts["multimodal_framesample"] > 0


def test_decode_stub_survives_non_utf8_payload():
    """ADVICE r12: one undecodable payload must degrade (NULL features,
    true byte length), never kill the Arrow batch."""
    from squirtle_spark.operators.multimodal import _decode_stub

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [b"hello", b"\xff\xfe\x00bad", None]}
    )
    (out,) = list(_decode_stub(iter([pdf])))
    assert list(out["doc_id"]) == [1, 2, 3]
    assert out["n_bytes"].tolist() == [5, 6, None] or [
        int(x) if pd.notna(x) else None for x in out["n_bytes"]
    ] == [5, 6, None]
    assert pd.isna(out["feat_sum"][1]) and pd.isna(out["feat_sum"][2])
    assert int(out["feat_sum"][0]) == sum(ord(c) for c in "hello")


def test_framesample_skips_non_utf8_payload():
    from squirtle_spark.operators.multimodal import _framesample_fn

    good = "x" * 200  # 3 frames -> sampled frame 0
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"\xff" * 200, good.encode()]})
    (out,) = list(_framesample_fn(iter([pdf])))
    assert set(out["doc_id"]) == {2}


def test_package_zip_is_content_addressed(tmp_path, monkeypatch):
    """The shipped archive's name embeds a source hash: unchanged tree →
    same path reused (SparkContext caches shipped files by name), changed
    tree → NEW name (Spark refuses to re-add a same-named file with
    different bytes, so a stale name would strand workers on old code)."""
    from squirtle_spark import session as s

    a = s._package_zip()
    assert a == s._package_zip()  # stable + file reused
    assert os.path.exists(a)

    import zipfile

    with zipfile.ZipFile(a) as zf:
        names = zf.namelist()
    assert all(n.startswith("squirtle_spark/") for n in names)
    assert "squirtle_spark/session.py" in names
    assert not any("__pycache__" in n for n in names)

    # simulate a source change by hashing a copied tree with one byte added
    import shutil

    pkg = os.path.dirname(os.path.abspath(s.__file__))
    clone = tmp_path / "squirtle_spark"
    shutil.copytree(pkg, clone, ignore=shutil.ignore_patterns("__pycache__"))
    (clone / "session.py").write_text(
        (clone / "session.py").read_text() + "\n# touched\n"
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "squirtle_spark_clone.session", clone / "session.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    b = mod._package_zip()
    assert b != a  # content change -> new archive name


def test_package_zip_rejects_preplanted_archive():
    """ADVICE r13 (medium): the cached archive is reused only when its
    BYTES match the deterministic rebuild — a same-named zip planted at
    the predictable path must be overwritten before addPyFile ever sees
    it — and it lives under a per-user 0700 dir, not the shared tempdir."""
    import stat

    from squirtle_spark import session as s

    path = s._package_zip()
    base = os.path.dirname(path)
    assert os.path.basename(base).startswith("squirtle-")
    mode = stat.S_IMODE(os.stat(base).st_mode)
    assert mode == 0o700, oct(mode)
    assert os.stat(base).st_uid == os.getuid()

    good = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(b"PK\x05\x06" + b"\x00" * 18)  # valid-but-empty planted zip
    again = s._package_zip()
    assert again == path
    assert open(path, "rb").read() == good  # planted bytes replaced

    # determinism: two independent builds of the same tree byte-match
    payload1, h1 = s._package_zip_bytes()
    payload2, h2 = s._package_zip_bytes()
    assert payload1 == payload2 and h1 == h2
    assert good == payload1
