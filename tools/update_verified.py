#!/usr/bin/env python
"""Regenerate the registry's `_EXTERNALLY_VERIFIED` set from the newest
CORRECTNESS_r*.json.

Run at round start: queries with a green (hash_match) driver row move to
the back of the registration order so the driver's ~50-entry correctness
window covers queries that still need an external row. Names stay
verified once green in ANY round (the union is cumulative), so a query
that rotates out of the window keeps its standing.

Usage: python tools/update_verified.py [--dry-run]
"""

from __future__ import annotations

import glob
import json
import re
import sys

REPO = "/root/repo"
REGISTRY = f"{REPO}/async_event_streams_spark/queries/__init__.py"


def green_names() -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                names.add(name)
    return names


def main() -> None:
    verified = green_names()
    if not verified:
        print("no green rows found; nothing to do")
        return
    src = open(REGISTRY).read()
    body = "\n".join(
        f'        "{n}",' for n in sorted(verified)
    )
    new_block = (
        "_EXTERNALLY_VERIFIED: frozenset[str] = frozenset(\n"
        "    {\n" + body + "\n    }\n)"
    )
    out, n_subs = re.subn(
        r"_EXTERNALLY_VERIFIED: frozenset\[str\] = frozenset\(\s*\{.*?\}\s*\)",
        new_block,
        src,
        flags=re.S,
    )
    if n_subs != 1:
        sys.exit(f"expected exactly one _EXTERNALLY_VERIFIED block, found {n_subs}")
    if "--dry-run" in sys.argv:
        print(f"would mark {len(verified)} queries verified")
        return
    open(REGISTRY, "w").write(out)
    print(f"marked {len(verified)} queries externally verified")


if __name__ == "__main__":
    main()
