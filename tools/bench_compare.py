#!/usr/bin/env python3
"""Per-round bench diff with host-shift normalization (r9 verdict task #3;
pooled-min mode added per r10 verdict task #4).

Full-run totals at sf0.1 swing +/-5% run-to-run and individual queries
+/-2x on this host, with the in-run noise probe unable to see CROSS-run
contention (the r9 "8.94 s text_edit_pairs" phantom). The estimator the
judge computed by hand: the median per-query ratio over the shared
queries is the uniform host shift; a query only deserves investigation
when its RESIDUAL ratio (ratio / median-shift) exceeds the flag bar.

Inputs are bench records in any of three shapes:
  * the full one-line JSON Bench prints (and archives to bench_history/),
  * the driver's BENCH_rN.json wrapper ({n, rc, tail, ...}) -- per-query
    entries are recovered from the truncated `tail` fragment, so older
    rounds still contribute their alphabetical tail as the shared set,
  * a bare {"queries": {...}} object.

Each side may be a GLOB (or comma-separated list) matching several
archives: the side is then POOLED -- per-query MIN across all matched
records -- so one noise-inflated final snapshot cannot raise phantom
flags (the r10 lesson: the driver's BENCH_r10.json was the worst of four
same-day runs and flagged two queries the judge had to reps-4 dismiss).
Pool a round's record with e.g.:

  tools/bench_compare.py 'bench_history/bench_2026081[0-5]*' NEW.json

Usage:
  tools/bench_compare.py OLD NEW [--flag 1.3] [--out report.json]

Exit code is 0 even with flags (it is a report, not a gate); the reps-4
re-check list is the actionable output:
  tools/run_main.sh graft.Bench --reps 4 <flagged...>
"""
import argparse
import glob
import json
import re
import statistics


def load_one(path):
    """Return (queries: dict name->sec, meta: dict) from any known shape."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # maybe an sbt-prefixed line file; find the JSON object
        m = re.search(r'\{"metric".*\}', raw)
        d = json.loads(m.group(0)) if m else {}
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        meta = {k: d[k] for k in ("value", "total_cold", "total_min",
                                  "host_noise", "sf", "passes") if k in d}
        return d["queries"], meta
    if isinstance(d, dict) and "tail" in d:  # driver wrapper, maybe truncated
        tail = d["tail"]
        if isinstance(d.get("parsed"), dict) and isinstance(
                d["parsed"].get("queries"), dict):
            p = d["parsed"]
            meta = {k: p[k] for k in ("value", "total_cold", "total_min",
                                      "host_noise", "sf", "passes") if k in p}
            return p["queries"], meta
        # recover per-query entries from the tail fragment: "name":sec
        qs = {}
        for m in re.finditer(r'"([a-z0-9_]+)":(\d+\.\d+)', tail):
            name, sec = m.group(1), float(m.group(2))
            if name in ("value", "probe_sec", "ratio", "total_cold",
                        "total_min", "sf"):
                continue
            qs[name] = sec  # later (short totals line) dups overwrite; same value
        meta = {"recovered_from_tail": True}
        m = re.search(r'"total_min":(\d+\.\d+)', tail)
        if m:
            meta["total_min"] = float(m.group(1))
        m = re.search(r'"total_cold":(\d+\.\d+)', tail)
        if m:
            meta["total_cold"] = float(m.group(1))
        return qs, meta
    raise SystemExit(f"{path}: unrecognized bench record shape")


def expand(spec):
    """A side spec -> list of paths: comma-separated parts, each globbed
    (a literal path is its own 1-element glob)."""
    paths = []
    for part in spec.split(","):
        hits = sorted(glob.glob(part))
        if not hits:
            raise SystemExit(f"{part}: no such file (glob matched nothing)")
        paths.extend(hits)
    return paths


def load_queries(spec):
    """Load one side. Multiple matched records pool by per-query MIN --
    a query's best observed time is its record; single files load as-is."""
    paths = expand(spec)
    if len(paths) == 1:
        return load_one(paths[0])
    pooled, metas = {}, []
    for p in paths:
        qs, meta = load_one(p)
        meta["path"] = p
        metas.append(meta)
        for q, sec in qs.items():
            if q not in pooled or sec < pooled[q]:
                pooled[q] = sec
    return pooled, {"pooled_from": [m.get("path") for m in metas],
                    "n_records": len(paths),
                    "total_min_pooled": round(sum(pooled.values()), 3),
                    "records": metas}


def compare(old_qs, new_qs, flag_bar):
    shared = sorted(set(old_qs) & set(new_qs))
    if not shared:
        raise SystemExit("no shared queries between the two records")
    ratios = {q: new_qs[q] / old_qs[q] for q in shared if old_qs[q] > 0}
    shift = statistics.median(ratios.values())
    rows = []
    for q in shared:
        if q not in ratios:
            continue
        resid = ratios[q] / shift
        rows.append({
            "query": q, "old_sec": round(old_qs[q], 3),
            "new_sec": round(new_qs[q], 3),
            "ratio": round(ratios[q], 3), "residual": round(resid, 3),
            # sub-0.3s queries jitter multiplicatively; require an absolute
            # delta too so a 0.05->0.09 s blip doesn't page anyone
            "flag": resid > flag_bar and (new_qs[q] - old_qs[q] * shift) > 0.25,
        })
    rows.sort(key=lambda r: -r["residual"])
    return shift, rows


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("old", help="old record: path, glob, or comma list "
                               "(multiple matches pool by per-query min)")
    ap.add_argument("new", help="new record: same forms as OLD")
    ap.add_argument("--flag", type=float, default=1.3,
                    help="residual ratio above which a query flags (default 1.3)")
    ap.add_argument("--out", help="write the full JSON report here")
    args = ap.parse_args()
    old_qs, old_meta = load_queries(args.old)
    new_qs, new_meta = load_queries(args.new)
    shift, rows = compare(old_qs, new_qs, args.flag)
    flagged = [r for r in rows if r["flag"]]
    only_new = sorted(set(new_qs) - set(old_qs))
    only_old = sorted(set(old_qs) - set(new_qs))
    report = {
        "old": args.old, "new": args.new,
        "old_meta": old_meta, "new_meta": new_meta,
        "n_shared": len(rows), "host_shift_median_ratio": round(shift, 3),
        "flag_bar_residual": args.flag,
        "flagged": flagged,
        "queries_only_in_new": only_new, "queries_only_in_old": only_old,
        "top10_residual": rows[:10],
        "recheck_cmd": (
            "tools/run_main.sh graft.Bench --reps 4 " +
            " ".join(r["query"] for r in flagged)) if flagged else None,
    }
    text = json.dumps(report, indent=1)
    if args.out:
        open(args.out, "w").write(text + "\n")
    print(f"shared={len(rows)} host_shift={shift:.3f} "
          f"flagged={len(flagged)} new_only={len(only_new)}")
    for r in flagged:
        print(f"  FLAG {r['query']}: {r['old_sec']}s -> {r['new_sec']}s "
              f"(ratio {r['ratio']}, residual {r['residual']})")
    if report["recheck_cmd"]:
        print("re-check: " + report["recheck_cmd"])
    if not args.out:
        print(text)


if __name__ == "__main__":
    main()
