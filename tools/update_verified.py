#!/usr/bin/env python
"""Regenerate the registry's `_EXTERNALLY_VERIFIED` map from the newest
CORRECTNESS_r*.json, keyed by (name, source fingerprint).

Run at ROUND START, before editing any query: "current fingerprint" is
then the fingerprint of the code the driver actually checked. Rules:

- names green (hash_match) in the NEWEST correctness file are granted
  with their current fingerprint;
- existing entries are kept only while their recorded fingerprint still
  matches the current source — a rewritten query (or oracle) silently
  loses its badge and re-enters the driver's ~50-entry check window;
- `--bootstrap` grants greens from ALL correctness rounds (one-off
  migration); `--drop NAME` removes a name entirely — both from the
  fresh grants and from retained entries (for queries whose SHARED
  HELPER was rewritten, which the fingerprint cannot see).

MID-ROUND reruns: the newest correctness file checked the code as of
round start, but greens are granted at the CURRENT fingerprint — so a
query edited since round start would wrongly re-badge. Pass --drop for
every query (or helper-consumer) edited this round.

Also refreshes `_BENCH_SEC` entries from the newest BENCH_r*.json
per-query seconds (measured values displace hand estimates).

Usage: python tools/update_verified.py [--dry-run] [--bootstrap]
       [--drop NAME]...
"""

from __future__ import annotations

import glob
import json
import re
import sys

REPO = "/root/repo"
REGISTRY = f"{REPO}/async_event_streams_spark/queries/__init__.py"

sys.path.insert(0, REPO)


def green_names(newest_only: bool) -> set[str]:
    files = sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json"))
    if newest_only:
        files = files[-1:]
    names: set[str] = set()
    for path in files:
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                names.add(name)
    return names


def last_green_rounds() -> dict[str, int]:
    """name -> newest round whose correctness file shows it green."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                last[name] = max(last.get(name, 0), rnd)
    return last


def bench_queries() -> dict[str, float]:
    """Per-query seconds, preferring the repo's BENCH_DETAIL.json
    (written whole by bench.py since r3) over the driver's BENCH_r*.json
    records (which sometimes store only an output tail — parse either
    shape as the fallback)."""
    try:
        doc = json.load(open(f"{REPO}/BENCH_DETAIL.json"))
        q = doc.get("queries")
        if q:
            return {k: float(v) for k, v in q.items()}
    except Exception:
        pass
    for path in sorted(glob.glob(f"{REPO}/BENCH_r*.json"), reverse=True):
        try:
            doc = json.load(open(path))
        except Exception:
            continue
        q = doc.get("queries") or (doc.get("parsed") or {}).get("queries")
        if q:
            return {k: float(v) for k, v in q.items()}
        tail = doc.get("tail", "")
        m = re.search(r'"queries":\s*(\{[^}]*\})', tail)
        if m:
            return {k: float(v) for k, v in json.loads(m.group(1)).items()}
        # tail truncated mid-dict: salvage every "name": seconds pair
        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
        if pairs:
            return {k: float(v) for k, v in pairs if not k.startswith(("sf", "n_"))}
    return {}


def main() -> None:
    from async_event_streams_spark.queries import (  # noqa: E402
        _EXTERNALLY_VERIFIED,
        QUERIES,
        query_fingerprint,
    )

    drops = {
        sys.argv[i + 1]
        for i, a in enumerate(sys.argv)
        if a == "--drop" and i + 1 < len(sys.argv)
    }
    fresh = green_names(newest_only="--bootstrap" not in sys.argv) - drops

    current = {n: query_fingerprint(n) for n in QUERIES}
    recorded: dict[str, str] = {}
    # keep prior entries whose source is unchanged — except explicit
    # drops: --drop marks a query whose SHARED HELPER was rewritten
    # (invisible to the fingerprint), so its badge must not survive
    for name, fp in _EXTERNALLY_VERIFIED.items():
        if name in drops:
            continue
        if current.get(name) == fp:
            recorded[name] = fp
    # grant fresh greens at their current fingerprint
    for name in fresh:
        if name in current:
            recorded[name] = current[name]

    body = "\n".join(
        f'    "{n}": "{recorded[n]}",' for n in sorted(recorded)
    )
    new_block = "_EXTERNALLY_VERIFIED: dict[str, str] = {\n" + body + "\n}"

    src = open(REGISTRY).read()
    # entries are flat "str": "str" pairs — [^{}] anchors the block end
    # safely even when the dict is empty ({}).
    out, n_subs = re.subn(
        r"_EXTERNALLY_VERIFIED: dict\[str, str\] = \{[^{}]*\}",
        lambda _m: new_block,
        src,
        count=1,
    )
    if n_subs != 1:
        sys.exit(f"expected one _EXTERNALLY_VERIFIED block, found {n_subs}")

    # regenerate the last-green-round table from ALL correctness files
    greens = last_green_rounds()
    lg_body = "\n".join(
        "    "
        + " ".join(f'"{n}": {greens[n]},' for n in chunk)
        for chunk in [
            sorted(greens)[i : i + 3] for i in range(0, len(greens), 3)
        ]
    )
    out, n_lg = re.subn(
        r"_LAST_GREEN_ROUND: dict\[str, int\] = \{[^{}]*\}",
        lambda _m: "_LAST_GREEN_ROUND: dict[str, int] = {\n" + lg_body + "\n}",
        out,
        count=1,
    )
    if n_lg != 1:
        sys.exit(f"expected one _LAST_GREEN_ROUND block, found {n_lg}")

    # refresh measured bench seconds (displacing estimates)
    bench = bench_queries()
    refreshed = 0
    if bench:
        # rewrite the whole block: substitution-only misses queries added
        # since the last refresh, which then silently fall back to the
        # 0.3 s default and skew the fast-first window ranking (r11
        # ADVICE). Merge: existing entries keep their value unless the
        # bench measured them; measured names absent from the block are
        # APPENDED.
        block = re.search(
            r"\n_BENCH_SEC: dict\[str, float\] = \{([^{}]*)\}", out
        )
        if block:
            pairs = {
                k: float(v)
                for k, v in re.findall(
                    r'"([a-z0-9_]+)": ([0-9.]+)', block.group(1)
                )
            }
            for name, sec in bench.items():
                if name in QUERIES and pairs.get(name) != sec:
                    refreshed += 1
                pairs[name] = sec
            names = sorted(n for n in pairs if n in QUERIES)

            def _fmt(v: float) -> str:
                # Fixed notation only: raw float repr can emit scientific
                # notation (5e-05), which the '"name": ([0-9.]+)' parser
                # above would silently mis-read as 5.0 on the next refresh.
                s = format(v, ".6f").rstrip("0").rstrip(".")
                return s or "0.0"

            lines = [
                "    "
                + " ".join(
                    f'"{n}": {_fmt(pairs[n])},' for n in names[i : i + 2]
                )
                for i in range(0, len(names), 2)
            ]
            new_bench = (
                "\n_BENCH_SEC: dict[str, float] = {\n"
                + "\n".join(lines)
                + "\n}"
            )
            out = out[: block.start()] + new_bench + out[block.end():]

    unverified = [n for n in QUERIES if n not in recorded]
    print(
        f"verified {len(recorded)}/{len(current)}; unverified: {sorted(unverified)}; "
        f"bench seconds refreshed for {refreshed} queries"
    )
    if "--dry-run" in sys.argv:
        return
    open(REGISTRY, "w").write(out)


if __name__ == "__main__":
    main()
