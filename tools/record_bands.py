#!/usr/bin/env python3
"""Build bench_bands.json from N consecutive clean full-Bench runs.

Usage: python3 tools/record_bands.py out.json run1.json run2.json [...]

Per-query band = MIN over the runs' RAW first readings (`queries_raw` if
present, else `queries`); refuses if any run failed queries or if the two
closest run totals differ by more than 2% (the box was not clean).
"""
import json
import sys


def main() -> None:
    out, runs = sys.argv[1], sys.argv[2:]
    assert len(runs) >= 2, "need at least two runs"
    datas = [json.load(open(p)) for p in runs]
    for p, d in zip(runs, datas):
        failed = d.get("n_failed", 0)
        assert not failed, f"{p}: n_failed={failed}"
    totals = sorted(float(d["value"]) for d in datas)
    closest = min(b / a for a, b in zip(totals, totals[1:]))
    names = set(datas[0]["queries"])
    for d in datas[1:]:
        assert set(d["queries"]) == names, "query sets differ between runs"
    # band from the minimum over runs; fold in each run's arbitration
    # minima (first reading + 3 reps) where a query was re-read
    def reading(d: dict, q: str) -> float:
        first = float(d["queries"][q])
        arb = d.get("arbitrated", {}).get(q)
        return min(first, float(arb["min"])) if arb and "min" in arb else first

    bands = {q: round(min(reading(d, q) for d in datas), 3) for q in sorted(names)}
    # Bench matches bands by the sf dir's BASENAME (e.g. "sf0.1"); the run
    # artifact carries the full path
    sf = datas[0].get("sf", "sf0.1").rstrip("/").rsplit("/", 1)[-1]
    doc = (
        "Per-query clean bands at sf0.1 (warm box, idle, local[32], "
        "noop-write, min-of-2 interleaved-pass protocol): per-query MIN "
        "over %d consecutive clean full-Bench runs at one HEAD (%s; raw "
        "totals %s s; closest-pair ratio %.3f), folding in each run's "
        "arbitration rep minima. graft.Bench re-measures every query over "
        "2x band (unconditional), the top-6 first/band ratios, and any "
        ">=1.35x round-over-round riser; classifies each as contamination "
        "or regression and emits corrected_total_sec. Re-record (clean "
        "warm consecutive Bench runs) whenever queries change."
        % (
            len(runs),
            datas[0].get("commit", "?"),
            "/".join("%.1f" % float(d["value"]) for d in datas),
            closest,
        )
    )
    json.dump({"_doc": doc, "bands": bands, "sf": sf}, open(out, "w"), indent=1)
    print(
        "wrote %s: %d bands, totals %s, closest-pair ratio %.3f%s"
        % (
            out,
            len(bands),
            "/".join("%.1f" % t for t in totals),
            closest,
            "" if closest <= 1.02 else "  WARNING: no pair within 1.02",
        )
    )


if __name__ == "__main__":
    main()
