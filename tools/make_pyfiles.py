"""Package ``gigaspark/`` into a deterministic ``--py-files`` zip.

north_rule: the engine must run "via spark-submit --py-files on a
multi-executor cluster".  This builds ``dist/gigaspark.zip`` with pinned
timestamps so the artifact hash is reproducible from the tree alone.

Usage: python tools/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PINNED_TS = (2020, 1, 1, 0, 0, 0)  # deterministic zip entries


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "gigaspark")
    entries = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                entries.append((os.path.relpath(p, REPO), p))
    entries.sort()
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, path in entries:
            info = zipfile.ZipInfo(arc, date_time=PINNED_TS)
            info.external_attr = 0o644 << 16
            with open(path, "rb") as fh:
                z.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "gigaspark.zip")
    print(build(out))
