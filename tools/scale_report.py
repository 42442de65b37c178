#!/usr/bin/env python3
"""Scale-rehearsal report: per-query sf1/sf0.1 wall ratios for the
heavy operator families, from two BENCH_DETAIL-style artifacts.

Usage: scale_report.py <detail_sf01.json> <detail_sf1.json> <out.json>

The data factor between the two inputs is 10x (tools/ScaleData with
k=10), so a perfectly linear operator shows ratio <= ~10 minus its
fixed overhead share; ratios well under 10 mean fixed costs (plan
analysis, codegen, small-table floors) still dominate at sf1; ratios
over ~12 flag supra-linear plans to investigate.
"""
import json
import sys


def main() -> None:
    a_path, b_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
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
        "data_factor": 10,
        "n_queries": len(rows),
        "total_sf01_sec": round(sum(r["sf01_sec"] for r in rows.values()), 2),
        "total_sf1_sec": round(sum(r["sf1_sec"] for r in rows.values()), 2),
        "median_ratio": med,
        "max_ratio": max(ratios) if ratios else None,
        "supra_linear": {q: r for q, r in rows.items() if r["ratio"] > 12},
        "canary_med_sf01": a.get("canary_median"),
        "canary_med_sf1": b.get("canary_median"),
        "queries": dict(sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(f"{len(rows)} queries: median ratio {med}, "
          f"max {out['max_ratio']}, supra-linear: {list(out['supra_linear'])}")


if __name__ == "__main__":
    main()
