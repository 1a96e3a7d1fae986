#!/usr/bin/env python3
"""Per-query bench trend across rounds — the receipts behind any
"noise vs regression" call. Reads BENCH_r*.json (driver format: the
Bench JSON line under "parsed") and prints a markdown table, flagging
deltas beyond the documented ±40% cross-JVM band.

Usage: python3 tools/bench_trend.py [--update-plans]
"""
import glob, json, re, sys

def load():
    rounds = {}
    for f in sorted(glob.glob("BENCH_r*.json")):
        rn = int(re.search(r"BENCH_r(\d+)", f).group(1))
        d = json.load(open(f))
        p = d.get("parsed") or {}
        if not p.get("queries"):
            # driver tail buffers can clip the FRONT of the JSON line,
            # nulling "parsed" — the per-query dict usually survives intact
            # at the end of the tail, so recover it directly
            m = re.search(r'"queries":(\{[^{}]*\})', d.get("tail") or "")
            if m:
                try:
                    p = {"queries": json.loads(m.group(1))}
                except ValueError:
                    pass
        if not p.get("queries"):
            # worst case the clip lands INSIDE the queries dict (even mid-key)
            # — scrape the surviving "q_*": N pairs before "failed" instead;
            # only the one clipped pair is lost
            tail = (d.get("tail") or "").split('"failed"')[0]
            pairs = re.findall(r'"(q_\w+)":([0-9.]+)', tail)
            if pairs:
                p = {"queries": {k: float(v) for k, v in pairs}}
        if p.get("queries"):
            rounds[rn] = p["queries"]
    # Complete per-round data: Bench writes the full 128-query object to
    # BENCH_FULL.json (the 2000-char driver tail can physically hold only
    # the compact slowest-first subset); a quiet local full run committed
    # as BENCH_FULL_r{N}.json supplements/overrides the tail-recovered
    # numbers for that round.
    for f in sorted(glob.glob("BENCH_FULL_r*.json")):
        rn = int(re.search(r"BENCH_FULL_r(\d+)", f).group(1))
        try:
            full = json.load(open(f)).get("queries") or {}
        except ValueError:
            continue
        merged = dict(rounds.get(rn, {}))
        merged.update({k: v for k, v in full.items() if v is not None})
        rounds[rn] = merged
    return rounds

def table(rounds):
    rns = sorted(rounds)
    queries = sorted({q for qs in rounds.values() for q in qs})
    lines = ["| query | " + " | ".join(f"r{r}" for r in rns) + " | last Δ |",
             "|---|" + "---|" * (len(rns) + 1)]
    for q in queries:
        vals = [rounds[r].get(q) for r in rns]
        cells = ["—" if v is None else f"{v:.2f}" for v in vals]
        present = [v for v in vals if v is not None]
        if len(present) >= 2 and present[-2] > 0:
            ratio = present[-1] / present[-2]
            flag = " ⚠" if (ratio > 1.4 or ratio < 1 / 1.4) and abs(present[-1] - present[-2]) > 0.3 else ""
            delta = f"{(ratio - 1) * 100:+.0f}%{flag}"
        else:
            delta = "—"
        lines.append(f"| {q} | " + " | ".join(cells) + f" | {delta} |")
    totals = ["" if r not in rounds else f"{sum(v for v in rounds[r].values() if v):.1f}" for r in rns]
    lines.append("| **total** | " + " | ".join(totals) + " | |")
    return "\n".join(lines)

if __name__ == "__main__":
    t = table(load())
    print(t)
    if "--update-plans" in sys.argv:
        marker = "## Per-query bench trend (tools/bench_trend.py)"
        body = open("PLANS.md").read()
        block = (
            f"{marker}\n\n"
            "Δ = last-round change; ⚠ = outside the ±40% cross-JVM noise band AND >0.3 s.\n"
            "Alphabetically-early queries show gaps for r8–r11: the driver's 2000-char\n"
            "tail clipped the FRONT of those rounds' JSON lines (fixed in r12 — the\n"
            "compact emission + committed BENCH_FULL_r{N}.json quiet runs now keep\n"
            "columns complete, so a Δ against a many-round-old cell is cross-era, not\n"
            "last-round).\n\n"
            f"{t}\n")
        if marker in body:
            pre = body[: body.index(marker)]
            rest = body[body.index(marker) :]
            nxt = rest.find("\n## ", 1)
            body = pre + block + (rest[nxt + 1 :] if nxt != -1 else "")
        else:
            body = body.rstrip() + "\n\n" + block
        open("PLANS.md", "w").write(body)
        print("\n[updated PLANS.md]")
