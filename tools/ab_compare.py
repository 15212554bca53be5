#!/usr/bin/env python3
"""Build the same-box cold A/B artifact from two Bench --all JSON lines.

Usage: ab_compare.py <old_arm.json> <new_arm.json> <old_label> <new_label> \
                     <meta> <out.json>

Each input file holds the single JSON line graft.Bench prints in --all
mode. The artifact mirrors BENCH_AB_r13.json: shared-query totals, the
ratio, movers >1.5x either way, and both embedded arms.
"""
import json
import sys


def main() -> None:
    old_p, new_p, old_l, new_l, meta, out_p = sys.argv[1:7]
    with open(old_p) as f:
        old = json.loads([ln for ln in f if ln.strip().startswith("{")][-1])
    with open(new_p) as f:
        new = json.loads([ln for ln in f if ln.strip().startswith("{")][-1])
    # identical labels would silently collide every f-string key below
    # (totals/arms overwriting each other in the artifact)
    assert old_l != new_l, f"old/new labels must differ, both are {old_l!r}"
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    t_old = sum(old["queries"][q] for q in shared)
    t_new = sum(new["queries"][q] for q in shared)
    assert shared and t_old > 0, (
        f"old arm shared total is {t_old} over {len(shared)} shared "
        "queries — refusing to divide; check the input artifacts")
    movers = {
        q: {old_l: round(old["queries"][q], 2),
            new_l: round(new["queries"][q], 2)}
        for q in shared
        if max(old["queries"][q], new["queries"][q]) > 0.2
        and (new["queries"][q] > 1.5 * old["queries"][q]
             or old["queries"][q] > 1.5 * new["queries"][q])
    }
    art = {
        "meta": meta,
        "shared_queries": len(shared),
        f"{old_l}_total_shared": round(t_old, 1),
        f"{new_l}_total_shared": round(t_new, 1),
        f"ratio_{new_l}_over_{old_l}": round(t_new / t_old, 3),
        "movers_gt_1_5x": movers,
        f"{old_l}_arm": old,
        f"{new_l}_arm": new,
    }
    with open(out_p, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    regress = [q for q, v in movers.items() if v[new_l] > v[old_l]]
    print(f"shared={len(shared)} {old_l}={t_old:.1f}s {new_l}={t_new:.1f}s "
          f"ratio={t_new / t_old:.3f} movers={sorted(movers)} "
          f"regressions={sorted(regress)}")


if __name__ == "__main__":
    main()
