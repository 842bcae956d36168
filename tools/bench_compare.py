#!/usr/bin/env python3
"""Control-group comparison of two full-bench artifacts.

Usage: tools/bench_compare.py NEW.json OLD.json [touched_prefix ...]

Implements the read the round notes use every round (the box drifts
10-15% same-day, so raw totals mislead): per-query median ratios
new/old, grouped into a CONTROL group (contract/relational o*/q* —
zero code changes in a typical round) vs the named TOUCHED prefixes,
plus the list of queries moving > 1.5x against the control median.
"""
import json
import statistics
import sys


def medians(path):
    d = json.load(open(path))
    out = {}
    for k in ("queries", "secondary"):
        for name, v in (d.get(k) or {}).items():
            if isinstance(v, (int, float)):
                out[name] = float(v)
    return d, out


def main():
    new_path, old_path = sys.argv[1], sys.argv[2]
    touched_prefixes = sys.argv[3:] or ["llm_ann_index", "oref_strict_leaf"]
    dn, new = medians(new_path)
    do, old = medians(old_path)
    common = sorted(set(new) & set(old))
    ratios = {q: new[q] / old[q] for q in common if old[q] > 0}

    def group(pred, label):
        qs = [q for q in ratios if pred(q)]
        if not qs:
            print(f"{label}: (empty)")
            return None
        med = statistics.median(ratios[q] for q in qs)
        print(f"{label}: n={len(qs)} median-ratio={med:.3f}")
        return med

    control = group(lambda q: q.startswith(("o", "q")) and not q.startswith("oref_strict"), "control o*/q* (untouched)")
    group(lambda q: q.startswith(("t2", "t3", "t4", "t5", "t6", "t7", "t8", "t9", "t10", "t11")), "streaming control t2-t11")
    for p in touched_prefixes:
        group(lambda q, p=p: q.startswith(p), f"touched '{p}'")
    if control:
        movers = {q: r / control for q, r in ratios.items() if r / control > 1.5}
        print("movers >1.5x vs control median:", json.dumps(movers) if movers else "none")
    print(f"totals: new value={dn.get('value')} total_min={dn.get('total_min')} | old value={do.get('value')} total_min={do.get('total_min')}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new-only queries:", {q: new[q] for q in only_new})


if __name__ == "__main__":
    main()
