"""S7 HTTP source setup (driver-side, run OUTSIDE the Spark job).

The reference downloads Crúbadán per-language zip archives at job setup
(/root/reference/lgid/main.py:639-702 download_crubadan_data: index CSV
row[0]=crubadan code, row[8]=ISO code, url = base-uri/{code}.zip,
extracted to {out}/{iso}_{code}/). This script reproduces that lifecycle
with two hardening changes appropriate for a data-pipeline fleet:

  * checksum pinning — an optional manifest CSV (code,sha256) rejects
    archives whose bytes changed since the manifest was written;
  * stdlib-only urllib with `file://` support, so the whole flow is
    testable against a local fixture without network access (this
    sandbox has none — which is WHY the engine treats HTTP as a
    driver-side setup step: executors read the extracted directory tree
    through sources/crubadan.py, never the network).

Usage:
    python tools/fetch_crubadan.py --index res/Crubadan.csv \
        --base-uri http://crubadan.org/files/ --out res/crubadan_lm \
        [--manifest res/crubadan_sha256.csv] [--limit N]
"""

from __future__ import annotations

import argparse
import csv
import hashlib
import io
import json
import os
import sys
import urllib.parse
import urllib.request
import zipfile


def load_manifest(path: str | None) -> dict[str, str]:
    if not path:
        return {}
    with open(path, encoding="utf-8") as fh:
        return {row[0]: row[1].strip().lower()
                for row in csv.reader(fh) if len(row) >= 2}


def fetch_one(base_uri: str, code: str, iso: str, out_dir: str,
              manifest: dict[str, str]) -> dict:
    url = urllib.parse.urljoin(base_uri, f"{code}.zip")
    combined = f"{iso}_{code}"
    dest = os.path.join(out_dir, combined)
    result = {"code": code, "dir": combined, "url": url}
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            blob = resp.read()
    except Exception as ex:  # timeout / 404 → skip, like the reference
        result["status"] = f"skipped: {type(ex).__name__}"
        return result
    digest = hashlib.sha256(blob).hexdigest()
    result["sha256"] = digest
    pinned = manifest.get(code)
    if pinned is not None and pinned != digest:
        result["status"] = "checksum mismatch — archive NOT extracted"
        return result
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            os.makedirs(dest, exist_ok=True)
            for member in zf.namelist():
                # refuse path traversal
                target = os.path.realpath(os.path.join(dest, member))
                if not target.startswith(os.path.realpath(dest) + os.sep):
                    continue
                zf.extract(member, dest)
    except zipfile.BadZipFile:
        result["status"] = "skipped: not a zip"
        return result
    result["status"] = "ok"
    return result


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="Crubadan.csv: col 0 = crubadan code, col 8 = ISO")
    ap.add_argument("--base-uri", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--manifest", default=None,
                    help="optional code,sha256 pinning CSV")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args(argv)

    manifest = load_manifest(args.manifest)
    os.makedirs(args.out, exist_ok=True)
    results = []
    with open(args.index, encoding="utf-8") as fh:
        reader = csv.reader(fh)
        next(reader)  # discard header (main.py:661)
        for n, row in enumerate(reader):
            if args.limit is not None and n >= args.limit:
                break
            code = row[0]
            iso = row[8].strip() if len(row) > 8 else code
            results.append(
                fetch_one(args.base_uri, code, iso, args.out, manifest))
    ok = sum(1 for r in results if r["status"] == "ok")
    print(json.dumps({"fetched": ok, "total": len(results),
                      "results": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
