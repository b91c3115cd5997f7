"""Standalone skewed-scaling pair runner.

Runs the SAME pre-registered protocol as bench.py's criterion section 3c —
N_PAIRS interleaved (N, 4N) fresh-JVM pairs in ABBA order, repeats=2 inside
each worker, --skew-only committed construction — but with no other bench
sections competing for the wall budget, so all pairs complete. Used to top
up the pair count when the in-budget bench run sheds pairs (round 6: the
2400 s driver budget left 1/3 skewed pairs).

Gate construction is identical to bench.py (pre-registered there before any
round-6 run): committed number = efficiency_scan_adjusted = median over
pairs of raw_pair_eff / scan_envelope_pair_eff, criterion >= 0.8; the raw
fused medians are reported unadjusted alongside.

Usage:
    python tools/run_skew_pairs.py --pages /tmp/bench_pages_scaling27.parquet \
        --out BENCH_local_r06_skew3.json [--pairs 3] [--n 2] [--probe skew]

``--probe uniform`` runs the worker's default uniform probe instead (same
pair/median protocol; no scan envelope — the uniform gate is raw).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def worker_run(cmd: list[str], timeout: int) -> dict:
    t0 = time.monotonic()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout>{timeout}s", "cmd": " ".join(cmd[2:])}
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    if proc.returncode != 0 or not lines:
        return {"error": f"rc={proc.returncode}",
                "stderr_tail": proc.stderr[-500:],
                "wall": round(time.monotonic() - t0, 1)}
    try:
        return json.loads(lines[-1])
    except json.JSONDecodeError:
        return {"error": "unparseable output", "stdout_tail": lines[-1][:500]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--n", type=int, default=2, help="low parallelism N")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--probe", choices=("skew", "uniform"), default="skew")
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "bench_scaling_worker.py")
    lo_c, hi_c = args.n, args.n * 4
    runs: dict[int, list[dict]] = {lo_c: [], hi_c: []}
    for i in range(args.pairs):
        order = (lo_c, hi_c) if i % 2 == 0 else (hi_c, lo_c)
        for cores in order:
            r = worker_run(
                [sys.executable, worker, "--cores", str(cores),
                 "--pages", args.pages, "--repeats", str(args.repeats)]
                + (["--skew-only"] if args.probe == "skew" else []),
                timeout=args.timeout)
            runs[cores].append(r)
            print(json.dumps({"pair": i, "cores": cores,
                              "elapsed": r.get("elapsed"),
                              "scan_extract_sec": r.get("scan_extract_sec"),
                              "error": r.get("error")}), file=sys.stderr)

    raw_effs, scan_effs, adj_effs, sub_effs = [], [], [], []
    for lo, hi in zip(runs[lo_c], runs[hi_c]):
        if "error" in lo or "error" in hi:
            continue
        raw = (lo["elapsed"] / hi["elapsed"]) / 4.0
        raw_effs.append(round(raw, 3))
        slo, shi = lo.get("scan_extract_sec"), hi.get("scan_extract_sec")
        if slo and shi:
            scan = (slo / shi) / 4.0
            scan_effs.append(round(scan, 3))
            adj_effs.append(round(raw / scan, 3))
            if hi["elapsed"] - shi > 1.0 and lo["elapsed"] - slo > 1.0:
                sub_effs.append(round(
                    ((lo["elapsed"] - slo) / (hi["elapsed"] - shi)) / 4.0, 3))

    def med(xs: list[float]) -> float | None:
        # true midpoint median (ADVICE r6: sorted[len//2] is the UPPER
        # middle for even-length lists, which biases the committed gate
        # number upward after error-pair filtering)
        import statistics

        return round(statistics.median(xs), 3) if xs else None

    out = {
        "probe": args.probe,
        "protocol": (f"{args.pairs} interleaved (N,4N)=({lo_c},{hi_c}) "
                     f"fresh-JVM pairs, ABBA order, repeats={args.repeats} "
                     "per worker, "
                     + ("--skew-only committed construction; identical to "
                        "bench.py section 3c" if args.probe == "skew" else
                        "uniform probe (worker default); identical to "
                        "bench.py section 3a")),
        "gate_construction": (
            "committed skewed number = efficiency_scan_adjusted = median "
            "over pairs of raw_pair_eff / scan_envelope_pair_eff (same-JVM "
            "raw-scan calibration); criterion >= 0.8; raw fused medians "
            "reported unadjusted alongside" if args.probe == "skew" else
            "uniform gate = raw median of pair efficiencies; criterion >= 0.8"),
        "pages": args.pages,
        "runs": {f"n{c}": rr for c, rr in runs.items()},
        "efficiency_pairs": raw_effs,
        "efficiency_raw": med(raw_effs),
        "scan_envelope_pairs": scan_effs,
        "efficiency_scan_adjusted_pairs": adj_effs,
        "efficiency_scan_adjusted": med(adj_effs),
        "efficiency_scan_subtracted_pairs_diagnostic": sub_effs,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in (
        "efficiency_raw", "efficiency_pairs", "scan_envelope_pairs",
        "efficiency_scan_adjusted_pairs", "efficiency_scan_adjusted")}))


if __name__ == "__main__":
    main()
