#!/usr/bin/env python3
"""Machine check for the 2x bench criterion (dev tool, not part of the
engine). Reads the full-precision bench artifact (bench.json) and the
authoritative baseline row embedded in BASELINE.md's `bench-gate` HTML
comment, and FAILS (exit 1) when any of:

  - per-query mean  (total / n_queries)  >  max_ratio * baseline_per_query_s
  - core82_total                         >  max_ratio * core82_freeze_s
    (only when core82_n == 82 -- a partial subset is not comparable and
    is reported as a failure in itself)
  - core153_total (if present)           >  max_ratio * core153_freeze_s

Usage:
    python3 tools/bench_gate.py [bench.json] [BASELINE.md]
    python3 tools/bench_gate.py --poison 10 [bench.json] [BASELINE.md]

--poison N multiplies the measured values by N before checking -- the
self-test that proves the gate actually trips (BenchGateSpec asserts
exit 0 on the real artifact AND exit 1 under --poison 10).
"""
import json
import re
import sys
from pathlib import Path


def parse_baseline(md_path: Path) -> dict:
    m = re.search(r"<!--\s*bench-gate:\s*(.*?)\s*-->", md_path.read_text())
    if not m:
        sys.exit(f"FAIL: no 'bench-gate' anchor comment in {md_path}")
    fields = dict(kv.split("=", 1) for kv in m.group(1).split())
    return {k: float(v) for k, v in fields.items()}


def main() -> int:
    args = sys.argv[1:]
    poison = 1.0
    if args and args[0] == "--poison":
        poison = float(args[1])
        args = args[2:]
    bench_path = Path(args[0]) if args else Path(__file__).parent.parent / "bench.json"
    md_path = Path(args[1]) if len(args) > 1 else Path(__file__).parent.parent / "BASELINE.md"

    base = parse_baseline(md_path)
    ratio = base["max_ratio"]
    bench = json.loads(bench_path.read_text())
    if bench.get("errors"):
        print(f"FAIL: bench.json records query errors: {bench['errors']}")
        return 1

    failures = []

    def check(name: str, measured: float, limit: float) -> None:
        measured *= poison
        ok = measured <= limit
        print(f"{'ok  ' if ok else 'FAIL'} {name:<18} {measured:8.3f} s  "
              f"(limit {limit:.3f} = {ratio}x baseline)")
        if not ok:
            failures.append(name)

    n = len(bench["queries"])
    check("per-query mean", bench["value"] / n, ratio * base["baseline_per_query_s"])

    if bench.get("core82_n") != 82:
        print(f"FAIL core82_n = {bench.get('core82_n')} != 82 -- subtotal not comparable")
        failures.append("core82_n")
    else:
        check("core82_total", bench["core82_total"], ratio * base["core82_freeze_s"])

    for core_n in (153, 158, 167, 192):
        total_k, n_k, freeze_k = (f"core{core_n}_total", f"core{core_n}_n",
                                  f"core{core_n}_freeze_s")
        if total_k in bench and freeze_k in base:
            if bench.get(n_k) != core_n:
                print(f"FAIL {n_k} = {bench.get(n_k)} != {core_n} -- subtotal not comparable")
                failures.append(n_k)
            else:
                check(total_k, bench[total_k], ratio * base[freeze_k])

    if failures:
        print(f"\nbench gate: FAILED ({', '.join(failures)})")
        return 1
    print("\nbench gate: passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
