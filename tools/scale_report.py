#!/usr/bin/env python3
"""Scale-rehearsal report: per-query wall ratios for the heavy
operator families, from two BENCH_DETAIL-style artifacts.

Usage: scale_report.py <detail_small.json> <detail_big.json> <out.json> [factor]

`factor` is the data-size multiple between the two inputs
(tools/ScaleData's k; default 10). A perfectly linear operator shows
ratio <= ~factor minus its fixed overhead share; ratios well under
the factor mean fixed costs (plan analysis, codegen, small-table
floors) still dominate; ratios over ~1.2x the factor flag
supra-linear plans to investigate.
"""
import json
import sys


def main() -> None:
    a_path, b_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    factor = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries_min"], b["queries_min"]
    shared = sorted(set(qa) & set(qb))
    rows = {}
    for q in shared:
        if qa[q] <= 0 or qb[q] <= 0:
            continue
        rows[q] = {
            "sf01_sec": round(qa[q], 3),
            "sf1_sec": round(qb[q], 3),
            "ratio": round(qb[q] / qa[q], 2),
        }
    ratios = sorted(r["ratio"] for r in rows.values())
    med = ratios[len(ratios) // 2] if ratios else None
    out = {
        "data_factor": factor,
        "n_queries": len(rows),
        "total_sf01_sec": round(sum(r["sf01_sec"] for r in rows.values()), 2),
        "total_sf1_sec": round(sum(r["sf1_sec"] for r in rows.values()), 2),
        "median_ratio": med,
        "max_ratio": max(ratios) if ratios else None,
        "supra_linear": {q: r for q, r in rows.items()
                         if r["ratio"] > 1.2 * factor},
        "canary_med_sf01": a.get("canary_median"),
        "canary_med_sf1": b.get("canary_median"),
        "queries": dict(sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{len(rows)} queries: median ratio {med}, "
          f"max {out['max_ratio']}, supra-linear: {list(out['supra_linear'])}")


if __name__ == "__main__":
    main()
