"""Annotate a bench sweep file with ISOLATED medians (round 10 —
VERDICT r9 task 7).

In-sequence full-sweep numbers for checkpoint-heavy queries that run
late in the registry can read 3x+ their isolated medians
(localCheckpoint blocks pile up faster than the every-8-queries GC
drains them — llm_embedding_near_dup_ivf measured 228.3s in-sweep vs
66.6s isolated at sf1, round 9). A reader diffing sweep files across
rounds would re-flag those known artifacts every round; this tool makes
the sweep file self-explaining by re-measuring the named rows in a
FRESH process (median-of-3, nothing else running) and recording the
results under an ``isolated`` key next to ``queries``.

Usage:
    python tools/bench_annotate.py SWEEP.json name [name ...]

Environment: set SPARK_GRAFT_SF_DIR to the same scale directory the
sweep used (the tool refuses to annotate when the sweep's recorded sf
disagrees with the re-measure environment).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    sweep_path, names = sys.argv[1], sys.argv[2:]
    with open(sweep_path) as f:
        sweep = json.load(f)
    missing = [n for n in names if n not in sweep.get("queries", {})]
    if missing:
        print(f"not in sweep: {missing}", file=sys.stderr)
        return 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = base
    if sf != sweep.get("sf"):
        print(
            f"sf mismatch: sweep records sf={sweep.get('sf')!r} but "
            f"SPARK_GRAFT_SF_DIR={sf_dir!r} (sf={sf!r}) — set the env to "
            "the sweep's scale before annotating",
            file=sys.stderr,
        )
        return 2

    # Fresh process, subset run: bench.py prints the one JSON line with
    # per-query medians and (by design) does not overwrite the sweep file.
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), *names],
        capture_output=True,
        text=True,
        cwd=repo,
        check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    fresh = json.loads(line)["queries"]

    iso = sweep.setdefault("isolated", {})
    for n in names:
        iso[n] = fresh[n]
    sweep["isolated_note"] = (
        "isolated = median-of-3 re-measure in a fresh process with nothing "
        "else running; recorded for rows whose in-sequence number is a "
        "known sweep artifact (localCheckpoint/GC backlog late in the "
        "registry), so cross-round sweep diffs self-explain"
    )
    with open(sweep_path, "w") as f:
        json.dump(sweep, f, indent=1, sort_keys=True)
        f.write("\n")
    for n in names:
        print(f"{n}: in-sequence {sweep['queries'][n]} -> isolated {iso[n]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
