#!/usr/bin/env python3
"""Scaling-curve table from the committed bench artifacts: sf0.1 (driver
BENCH_r*.json, latest round), sf1 (BENCH_sf1.json), sf3 (BENCH_sf3.json,
headline subset), sf10 (BENCH_sf10.json, headline subset). Ratios are
wall-time multiples for 10x / 3x / 10x-vs-sf1 the data; "lin" marks
ratios at or below the data growth (linear or better).

Usage: python3 tools/scale_curve.py
"""
import glob
import json
import re


def load_latest_driver():
    best = {}
    for f in sorted(glob.glob("BENCH_r*.json")):
        d = json.load(open(f))
        p = d.get("parsed") or {}
        q = p.get("queries")
        if not q:
            m = re.search(r'"queries":(\{[^{}]*\})', d.get("tail") or "")
            if m:
                try:
                    q = json.loads(m.group(1))
                except ValueError:
                    q = None
        if q:
            best = q
    return best


def main():
    sf01 = load_latest_driver()
    sf1 = json.load(open("BENCH_sf1.json"))["queries"]
    sf3 = json.load(open("BENCH_sf3.json"))["queries"]
    try:
        sf10 = json.load(open("BENCH_sf10.json"))["queries"]
    except FileNotFoundError:
        sf10 = {}
    print("| query | sf0.1 s | sf1 s | x (10x data) | sf3 s | x (3x sf1) |"
          " sf10 s | x (10x sf1) |")
    print("|---|---|---|---|---|---|---|---|")
    for q in sorted(set(sf3) | set(sf10)):
        a, b, c, d = sf01.get(q), sf1.get(q), sf3.get(q), sf10.get(q)
        r1 = f"{b/a:.1f}x" + (" lin" if b / a <= 10 else "") if a and b else "-"
        r3 = f"{c/b:.1f}x" + (" lin" if c / b <= 3 else "") if b and c else "-"
        r10 = f"{d/b:.1f}x" + (" lin" if d / b <= 10 else "") if b and d else "-"
        print(f"| {q} | {a if a else '-'} | {b if b else '-'} | {r1} |"
              f" {c if c else '-'} | {r3} | {d if d else '-'} | {r10} |")
    # mirror the headline-row guard: a sub-millisecond sf0.1 time rounds to
    # 0 in the artifact and would divide-by-zero here
    others = [q for q in sorted(sf1) if q not in sf3 and sf01.get(q)]
    ratios = sorted(sf1[q] / sf01[q] for q in others)
    if ratios:
        print(f"\n{len(others)} non-headline queries at sf1: median ratio "
              f"{ratios[len(ratios)//2]:.1f}x for 10x data, "
              f"{sum(1 for r in ratios if r <= 10)}/{len(others)} at or below linear.")


if __name__ == "__main__":
    main()
