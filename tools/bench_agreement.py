"""Two-run bench agreement report: how reproducible is the full tier?

Usage: python tools/bench_agreement.py runA.json runB.json [threshold_s]

For every query whose reading exceeds the threshold (default 1.0 s) in
either run, computes the run-to-run ratio under three views:

  raw        — seconds as measured
  global     — divided by each run's begin-of-run canary ratio
  local      — divided by the host-speed ratio interpolated at the
               query's own completion time (contention_probes)

and prints the per-view agreement summary (max ratio, count > 1.5x).
The round-8 A/B study showed contention windows slow alphabetically
contiguous spans of queries for minutes at a time — the local view is
the one that should converge; if a query disagrees >1.5x even locally
normalized, suspect the code, not the host.
"""

from __future__ import annotations

import json
import sys


def _ratio(a: float, b: float) -> float:
    lo, hi = min(a, b), max(a, b)
    return hi / lo if lo > 0 else float("inf")


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

    views = {
        "raw": ("full_queries", None),
        "global": ("full_queries_normalized", None),
        "local": ("full_queries_local_norm", None),
    }
    summary = {}
    detail: dict[str, dict[str, float]] = {}
    for view, (key, _) in views.items():
        qa, qb = a.get(key, {}), b.get(key, {})
        shared = [
            k
            for k in qa
            if k in qb
            and qa[k] > 0
            and qb[k] > 0
            and max(a["full_queries"].get(k, 0), b["full_queries"].get(k, 0))
            > thresh
        ]
        ratios = {k: _ratio(qa[k], qb[k]) for k in shared}
        bad = {k: r for k, r in ratios.items() if r > 1.5}
        summary[view] = {
            "n_compared": len(shared),
            "max_ratio": round(max(ratios.values()), 3) if ratios else None,
            "n_over_1p5x": len(bad),
            "worst": sorted(
                ((round(r, 2), k) for k, r in ratios.items()), reverse=True
            )[:8],
        }
        for k, r in ratios.items():
            detail.setdefault(k, {})[view] = round(r, 3)

    out = {
        "threshold_s": thresh,
        "canary_ratio": [a.get("canary_ratio"), b.get("canary_ratio")],
        "canary_ratio_end": [
            a.get("canary_ratio_end"),
            b.get("canary_ratio_end"),
        ],
        "summary": summary,
        "disagreeing_over_1p5x_local": {
            k: v for k, v in detail.items() if v.get("local", 0) > 1.5
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
