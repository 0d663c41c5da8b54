"""S7 driver-side HTTP setup script, dry-run against file:// fixtures
(no network in the sandbox — main.py:639-702 semantics)."""

from __future__ import annotations

import hashlib
import io
import json
import os
import zipfile


def _make_fixture(tmp_path):
    files = tmp_path / "files"
    files.mkdir()
    blob = io.BytesIO()
    with zipfile.ZipFile(blob, "w") as zf:
        zf.writestr("aaa-words.txt", "foo\t2\nbar\t1\n")
        zf.writestr("aaa-chartrigrams.txt", " fo\t1\n")
    (files / "aaa.zip").write_bytes(blob.getvalue())
    (files / "bad.zip").write_bytes(b"not a zip archive")
    # Crubadan.csv layout: col 0 = crubadan code, col 8 = ISO code
    index = tmp_path / "Crubadan.csv"
    pad = "," * 7
    index.write_text(
        f"code,x1,x2,x3,x4,x5,x6,x7,iso\naaa{pad},aaa\nbad{pad},bbb\n"
        f"missing{pad},mmm\n", encoding="utf-8")
    return index, files, hashlib.sha256(blob.getvalue()).hexdigest()


def test_fetch_extract_and_skip(tmp_path, capsys):
    from tools.fetch_crubadan import main

    index, files, digest = _make_fixture(tmp_path)
    out = tmp_path / "lm"
    rc = main(["--index", str(index), "--base-uri", files.as_uri() + "/",
               "--out", str(out)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    by_code = {r["code"]: r for r in report["results"]}
    assert by_code["aaa"]["status"] == "ok"
    # extracted into {iso}_{code}/ like the reference (main.py:666)
    assert os.path.exists(out / "aaa_aaa" / "aaa-words.txt")
    assert by_code["bad"]["status"] == "skipped: not a zip"
    assert "skipped" in by_code["missing"]["status"]  # 404 analog


def test_checksum_pinning(tmp_path, capsys):
    from tools.fetch_crubadan import main

    index, files, digest = _make_fixture(tmp_path)
    manifest = tmp_path / "pins.csv"
    manifest.write_text(f"aaa,{'0' * 64}\n", encoding="utf-8")  # wrong pin
    out = tmp_path / "lm"
    rc = main(["--index", str(index), "--base-uri", files.as_uri() + "/",
               "--out", str(out), "--manifest", str(manifest), "--limit", "1"])
    assert rc == 1
    report = json.loads(capsys.readouterr().out)
    assert "checksum mismatch" in report["results"][0]["status"]
    assert not os.path.exists(out / "aaa_aaa")

    manifest.write_text(f"aaa,{digest}\n", encoding="utf-8")  # correct pin
    rc = main(["--index", str(index), "--base-uri", files.as_uri() + "/",
               "--out", str(out), "--manifest", str(manifest), "--limit", "1"])
    assert rc == 0
    assert os.path.exists(out / "aaa_aaa" / "aaa-words.txt")
