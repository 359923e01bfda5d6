"""Compare two BENCH_r{N}.json artifacts with canary normalization.

Host speed swings ±40% between sessions, so a raw per-query ratio
mis-reads a slow host as a code regression.  The TPC-H canaries
(q5/q6/q18 — code-identical since round 1) estimate the host factor;
every per-query ratio is divided by it before flagging.

Usage: python tools/bench_diff.py BENCH_r03.json BENCH_r04.json [threshold]
Prints one line per common query whose canary-normalized ratio exceeds
the threshold (default 1.3), plus added/removed query names.  Exit code
is always 0 — this is a report, not a gate; regressions need human
reading (a deliberate trade, e.g. an exact-dup collapse, is not a bug).
"""

from __future__ import annotations

import json
import statistics
import sys

_CANARIES = ("tpch_q5", "tpch_q6", "tpch_q18")


def load(path: str) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    BENCH_r{N}.json wrapper, whose `tail` string embeds that line
    (with \\r progress noise around it)."""
    with open(path) as fh:
        txt = fh.read()
    try:
        d = json.loads(txt)
        if "queries" in d:
            return d
        txt = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    for line in reversed(txt.replace("\r", "\n").splitlines()):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                print(f"# WARNING {path}: skipped a truncated bench "
                      "line; using an earlier embedded line",
                      file=sys.stderr)
                continue
    raise SystemExit(f"{path}: no bench JSON line found")


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    # widest net: full tier plus headliners — where a query is in both
    # tiers, the headline best-of-3 wins the merge (steady-state numbers
    # compare cleanly across rounds; full-tier times are one-shot+cold)
    oq = {**old.get("full_queries", {}), **old["queries"]}
    nq = {**new.get("full_queries", {}), **new["queries"]}
    # bench.py writes -1.0 for a query that ERRORED: a query that ran
    # before but fails now is the worst regression, not a removal
    now_failing = sorted(k for k, v in nq.items() if v is not None
                         and v < 0 and oq.get(k, 0) and oq[k] > 0)
    oq = {k: v for k, v in oq.items() if v is not None and v > 0}
    nq = {k: v for k, v in nq.items() if v is not None and v > 0}

    host = [nq[c] / oq[c] for c in _CANARIES if c in oq and c in nq]
    factor = statistics.median(host) if host else 1.0
    print(f"# host factor (median canary ratio): {factor:.2f} "
          f"({', '.join(f'{c} {nq.get(c, 0):.2f}/{oq.get(c, 0):.2f}' for c in _CANARIES)})")

    for name in now_failing:
        print(f"NOW FAILING {name}: {oq[name]:.2f}s -> error (-1.0)")
    common = sorted(set(oq) & set(nq))
    flagged = []
    for name in common:
        norm = (nq[name] / oq[name]) / factor
        # absolute floor: sub-second queries are dominated by fixed
        # scheduling overhead that does NOT track the canary factor, so
        # a ratio alone mis-flags 0.15s -> 0.4s noise as a regression
        if norm >= threshold and nq[name] - oq[name] * factor >= 0.25:
            flagged.append((norm, name))
    for norm, name in sorted(flagged, reverse=True):
        print(f"REGRESSION {name}: {oq[name]:.2f}s -> {nq[name]:.2f}s "
              f"(normalized {norm:.2f}x)")
    if not flagged:
        print("# no canary-normalized regressions >= "
              f"{threshold}x across {len(common)} common queries")
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq) - set(now_failing))
    if added:
        print(f"# added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"# removed ({len(removed)}): {', '.join(removed)}")


if __name__ == "__main__":
    main()
