"""Build dist/lgid_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "lgid_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "lgid_spark")
        entries = []
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    entries.append((os.path.relpath(full, ROOT), full))
        # deterministic archive: sorted entries, fixed timestamps — a
        # rebuild from unchanged sources is byte-identical, so the
        # committed zip only shows a diff when the code really changed
        for arcname, full in sorted(entries):
            zi = zipfile.ZipInfo(arcname, date_time=(2024, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zi.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                z.writestr(zi, fh.read())
    print(out)
    return out


if __name__ == "__main__":
    main()
