"""Stratified per-id bench comparator — the PRIMARY cross-round
performance signal (BASELINE.md "Cross-round comparison protocol",
promoted r15 per the r14 verdict).

Why not the canary: `canary_sec` is ONE number whose same-day spread
was measured at 0.169-0.276 s on an idle machine (r14) — wider than the
entire r12 "clean band" (0.236-0.245).  It cannot adjudicate a 4-8%
total delta.  The stratified method replaces it with ~250 numbers: the
per-id wall ratios of the two rounds' BENCH_DETAIL files, bucketed by
how much real work each id does, summarized by median (robust to the
documented C2-lottery ids and per-id jitter).

Method (mechanical; everything derives from the two JSON files):

1. Common ids of the two files' `queries` maps.
2. Strata by the BASE round's wall: trivial < 0.3 s, mid 0.3-1.0 s,
   big >= 1.0 s.
3. Per-stratum median of wall_new / wall_base.
4. Interpretation: trivial ids run no meaningful repo compute — their
   ratio is pure environment (JVM scheduling, py4j, machine load).  If
   the trivial median is inside [0.93, 1.07], conditions are
   comparable: judge the mid/big medians directly.  Otherwise divide
   the mid/big medians by the trivial median first (load
   normalization by 99-id median, not by one canary draw).  A
   normalized mid or big median outside ±10% is a real code signal;
   inside is a draw.

The canary survives only as a GROSS-contention flag: a canary ratio
above 1.3 means the run was taken under heavy load — re-measure on a
quiet machine instead of normalizing.

Worked r13->r14 example (driver files): raw medians
1.121/1.084/1.079 — trivial elevated 12% => loaded driver machine;
normalized mid 0.97, big 0.96 => code-neutral-to-better, agreeing with
the builder's quiet-machine medians (1.000/1.008/0.996).

Run: python -m tools.bench_compare BENCH_DETAIL_r13.json BENCH_DETAIL_r14.json
"""

from __future__ import annotations

import argparse
import json
import statistics

TRIVIAL_MAX = 0.3  # seconds, base-round wall
BIG_MIN = 1.0
TRIVIAL_OK = (0.93, 1.07)  # trivial-median band = comparable conditions
SIGNAL_BAND = 0.10  # normalized mid/big median outside +-10% = real
CANARY_GROSS = 1.3  # canary ratio above this: re-measure, don't normalize


def stratified(base: dict, new: dict) -> dict:
    """Per-stratum median ratios over the common ids of two
    BENCH_DETAIL `queries` maps, strata by the BASE wall."""
    common = sorted(set(base) & set(new))
    out = {}
    for name, lo, hi in (
        ("trivial", 0.0, TRIVIAL_MAX),
        ("mid", TRIVIAL_MAX, BIG_MIN),
        ("big", BIG_MIN, float("inf")),
    ):
        ids = [i for i in common if lo <= base[i] < hi]
        out[name] = {
            "n": len(ids),
            "median_ratio": (
                round(statistics.median(new[i] / base[i] for i in ids), 3)
                if ids
                else None
            ),
        }
    out["n_common"] = len(common)
    return out


def verdict(strata: dict, canary_ratio: float | None) -> list[str]:
    lines = []
    if canary_ratio is not None and canary_ratio > CANARY_GROSS:
        lines.append(
            f"canary ratio {canary_ratio:.2f} > {CANARY_GROSS}: gross "
            "contention — re-measure on a quiet machine, do not normalize"
        )
        return lines
    t = strata["trivial"]["median_ratio"]
    comparable = t is not None and TRIVIAL_OK[0] <= t <= TRIVIAL_OK[1]
    if comparable:
        lines.append(
            f"trivial median {t} inside {list(TRIVIAL_OK)}: conditions "
            "comparable, judging mid/big raw"
        )
        norm = 1.0
    else:
        lines.append(
            f"trivial median {t} outside {list(TRIVIAL_OK)}: machine "
            "conditions differ — normalizing mid/big by the trivial median"
        )
        norm = t
    for name in ("mid", "big"):
        r = strata[name]["median_ratio"]
        if r is None:
            continue
        adj = round(r / norm, 3)
        call = "REAL SIGNAL" if abs(adj - 1.0) > SIGNAL_BAND else "draw"
        lines.append(
            f"{name}: median {r}"
            + (f" normalized {adj}" if norm != 1.0 else "")
            + f" -> {call} (band ±{SIGNAL_BAND:.0%})"
        )
    return lines


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("base", help="BENCH_DETAIL json of the BASE round")
    ap.add_argument("new", help="BENCH_DETAIL json of the round under judgment")
    ap.add_argument("--top", type=int, default=8, help="largest per-id movers to list")
    args = ap.parse_args()
    with open(args.base) as f:
        b = json.load(f)
    with open(args.new) as f:
        n = json.load(f)
    bq, nq = b["queries"], n["queries"]
    strata = stratified(bq, nq)
    canary = None
    if b.get("canary_sec") and n.get("canary_sec"):
        canary = n["canary_sec"] / b["canary_sec"]
        print(f"canary: {b['canary_sec']} -> {n['canary_sec']} (ratio {canary:.3f})")
    tot_b = sum(bq[i] for i in set(bq) & set(nq))
    tot_n = sum(nq[i] for i in set(bq) & set(nq))
    print(
        f"totals over {strata['n_common']} common ids: "
        f"{tot_b:.1f} -> {tot_n:.1f} s (raw {tot_n / tot_b:.3f}x)"
    )
    for name in ("trivial", "mid", "big"):
        s = strata[name]
        print(f"  {name:8s} n={s['n']:<4d} median ratio {s['median_ratio']}")
    for line in verdict(strata, canary):
        print("  " + line)
    movers = sorted(
        ((nq[i] - bq[i], i) for i in set(bq) & set(nq)),
        key=lambda t: -abs(t[0]),
    )[: args.top]
    print(f"largest absolute movers (top {args.top}):")
    for d, i in movers:
        print(f"  {i:32s} {bq[i]:7.2f} -> {nq[i]:7.2f}  ({d:+.2f} s)")


if __name__ == "__main__":
    main()
