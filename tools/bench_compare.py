#!/usr/bin/env python3
"""Reproducibility check between two bench_full.json runs.

Usage: python3 tools/bench_compare.py <a.json> <b.json> [threshold]

Compares per-query primary timings on the shared query set whose cost
is real (>1 s in either run), reporting the worst relative deviation
and every query outside the threshold (default 0.20 = 20%). Exit 0 iff
all real-cost shared queries agree within the threshold — the
round-9 verdict's criterion for trusting a curve-flag verdict.
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.20
    shared = sorted(set(a) & set(b))
    real = [q for q in shared if max(a[q], b[q]) > 1.0]
    bad = []
    worst = (0.0, None)
    for q in real:
        dev = abs(a[q] - b[q]) / max(a[q], b[q])
        if dev > worst[0]:
            worst = (dev, q)
        if dev > thr:
            bad.append((q, round(a[q], 2), round(b[q], 2), round(dev, 2)))
    print(f"shared={len(shared)} real(>1s)={len(real)} "
          f"worst_dev={worst[0]:.2f} ({worst[1]}) threshold={thr}")
    for q, va, vb, dev in bad:
        print(f"  DISAGREE {q}: {va} vs {vb} (dev {dev})")
    print("AGREE" if not bad else f"{len(bad)} queries outside threshold")
    sys.exit(0 if not bad else 1)


if __name__ == "__main__":
    main()
