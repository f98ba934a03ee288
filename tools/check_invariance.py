"""Partition-layout invariance sweep: re-run the full oracle gate under
several shuffle-partition / core-count layouts. A query whose result
hash depends on partition count (unordered double summation crossing a
rounding boundary, approx sketches in hashed columns, driver-visible
partition iteration order) passes a single-layout check and then breaks
on the next cluster resize — this sweep is the cheap local proxy for
that failure mode.

Persists INVARIANCE_r{N}.json (or the --out path): per-query Spark
value hash under each layout plus the overall verdict, so the gate is
a diffable artifact rather than a commit-message claim (r8 verdict).

Run: python tools/check_invariance.py [sf_dir] [--out PATH]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

LAYOUTS = [
    {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "3", "SPARK_GRAFT_CPUS": "5"},
    {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "7"},
    {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "32"},
]


def _default_out(repo: str) -> str:
    """INVARIANCE_r{N}.json with N = the newest round number seen in
    the repo's driver artifacts (CORRECTNESS_r*.json) + 1 — this tool
    runs while preparing the NEXT round's artifacts."""
    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"_r(\d+)\.json$", f))
    ]
    n = (max(rounds) + 1) if rounds else 0
    return os.path.join(repo, f"INVARIANCE_r{n:02d}.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--only", default="", help="comma-separated query names (smoke)"
    )
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    out_path = args.out or _default_out(repo)

    per_layout: list[dict] = []
    ok = True
    for layout in LAYOUTS:
        env = {**os.environ, **layout}
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            tmp_json = tf.name
        cmd = [
            sys.executable,
            os.path.join(here, "check_oracle.py"),
            args.sf_dir,
            "--json",
            tmp_json,
        ]
        if args.only:
            cmd += ["--only", args.only]
        r = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
        )
        lines = r.stdout.strip().splitlines()
        tail = lines[-2] if len(lines) >= 2 else "(no output)"
        print(f"{layout}: {tail}")
        layout_ok = r.returncode == 0 and "passed" in r.stdout
        ok = ok and layout_ok
        results = {}
        try:
            with open(tmp_json) as fh:
                results = json.load(fh)["results"]
        finally:
            os.unlink(tmp_json)
        per_layout.append(
            {"layout": layout, "ok": layout_ok, "results": results}
        )

    # cross-layout hash agreement per query (the invariance itself,
    # independent of the oracle verdicts)
    names = sorted(
        set().union(*[set(pl["results"]) for pl in per_layout])
        if per_layout
        else set()
    )
    disagreeing = []
    queries: dict[str, dict] = {}
    for name in names:
        hashes = [
            pl["results"].get(name, {}).get("hash", "") for pl in per_layout
        ]
        rows = [
            pl["results"].get(name, {}).get("rows") for pl in per_layout
        ]
        oks = [pl["results"].get(name, {}).get("ok", False) for pl in per_layout]
        # rows-only queries (no oracle dual) carry no hash; their row
        # counts must still agree across layouts
        invariant = (
            len(set(hashes)) == 1 and len(set(rows)) == 1 and all(oks)
        )
        if not invariant:
            disagreeing.append(name)
        queries[name] = {
            "hashes": hashes,
            "ok": all(oks),
            "invariant": invariant,
        }
    ok = ok and not disagreeing

    artifact = {
        "sf_dir": args.sf_dir,
        "layouts": [pl["layout"] for pl in per_layout],
        "verdict": "INVARIANT" if ok else "LAYOUT-DEPENDENT",
        "n_queries": len(names),
        "disagreeing": disagreeing,
        "queries": queries,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out_path}")
    print(
        "INVARIANT"
        if ok
        else f"LAYOUT-DEPENDENT RESULTS ({disagreeing}) — fix before shipping"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
