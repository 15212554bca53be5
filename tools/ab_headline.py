#!/usr/bin/env python3
"""Build the interleaved headline A/B artifact (BENCH_AB_HEADLINE_r*).

Usage: ab_headline.py <old_runs.jsonl> <new_runs.jsonl> <old_label> \
                      <new_label> <meta> <out.json>

Each input holds one graft.Bench JSON line per SESSION (the interleaved
rig: sessions alternate old/new arms so box drift hits both alike).
Per query, each arm's number is the MIN across its sessions' min-of-5
colds — the same additive-positive-noise estimator Bench itself uses.
Mirrors BENCH_AB_HEADLINE_r15.json's shape.
"""
import json
import sys


def main() -> None:
    old_p, new_p, old_l, new_l, meta, out_p = sys.argv[1:7]
    assert old_l != new_l, "labels must differ"
    old_runs = [json.loads(ln) for ln in open(old_p) if ln.strip()]
    new_runs = [json.loads(ln) for ln in open(new_p) if ln.strip()]
    assert len(old_runs) == len(new_runs) >= 2, (
        f"need >=2 interleaved session pairs, got "
        f"{len(old_runs)}/{len(new_runs)}")
    qs = sorted(set.intersection(*[set(r["queries"]) for r in
                                   old_runs + new_runs]))
    o_min = {q: round(min(r["queries"][q] for r in old_runs), 4) for q in qs}
    n_min = {q: round(min(r["queries"][q] for r in new_runs), 4) for q in qs}
    t_o, t_n = sum(o_min.values()), sum(n_min.values())
    art = {
        "meta": meta,
        "sf": old_runs[0].get("sf"),
        f"{old_l}_min": o_min,
        f"{new_l}_min": n_min,
        f"{old_l}_total": round(t_o, 3),
        f"{new_l}_total": round(t_n, 3),
        f"ratio_{new_l}_over_{old_l}": round(t_n / t_o, 3),
        "per_query_ratio": {
            q: round(n_min[q] / o_min[q], 3) for q in qs},
        f"{old_l}_runs": old_runs,
        f"{new_l}_runs": new_runs,
    }
    with open(out_p, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    worst = max(qs, key=lambda q: n_min[q] / o_min[q])
    print(f"total {old_l}={t_o:.2f}s {new_l}={t_n:.2f}s "
          f"ratio={t_n / t_o:.3f}; worst mover {worst} "
          f"{o_min[worst]:.3f}->{n_min[worst]:.3f} "
          f"({n_min[worst] / o_min[worst]:.2f}x)")


if __name__ == "__main__":
    main()
