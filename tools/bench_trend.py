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
    # Multiple FULL files can map to one round (BENCH_FULL_r16.json +
    # BENCH_FULL_r16B.json): the PLAIN file is the round's canonical quiet
    # run and sorts first — suffixed variants (often other host windows)
    # only fill queries the canonical run is missing, never override it.
    full_seen = {}
    for f in sorted(glob.glob("BENCH_FULL_r*.json")):
        rn = int(re.search(r"BENCH_FULL_r(\d+)", f).group(1))
        try:
            full = json.load(open(f)).get("queries") or {}
        except ValueError:
            continue
        merged = dict(rounds.get(rn, {}))
        prior = full_seen.setdefault(rn, set())
        for k, v in full.items():
            if v is None or k in prior:
                continue
            merged[k] = v
            prior.add(k)
        rounds[rn] = merged
    return rounds

# Host-window canaries: queries untouched since r9 (PLANS.md calibration
# note). Each round's "window factor" = median over canaries of
# value / cross-round-median — ~1.0 on a quiet host, ~1.3 in the r16b
# slow window. Deltas are computed on WINDOW-NORMALIZED values so ambient
# host drift stops reading as code regressions (two rounds in a row
# needed manual adjudication for exactly this).
CANARIES = ["q_tpch_q5", "q_tpch_q8", "q_tfidf"]

def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

CANARY_STABLE_FROM = 9  # canary code last changed r9 — earlier cells are
                        # code deltas, not host windows

def window_factors(rounds):
    # Baseline = each canary's median of its 3 FASTEST cells across stable
    # rounds (~the canonical fast window). The absolute min was the r17
    # ADVICE robustness gap: one anomalously fast cell would permanently
    # inflate every round's factor; the median-of-3-fastest keeps the
    # "best-known host" anchor (stable as rounds accumulate — a full
    # median would drift with the quiet/loaded window mix) while a single
    # outlier cell can no longer move it.
    base = {}
    for c in CANARIES:
        vals = [qs[c] for r, qs in rounds.items()
                if r >= CANARY_STABLE_FROM and qs.get(c)]
        if len(vals) >= 3:
            base[c] = median(sorted(vals)[:3])
    factors = {}
    for r, qs in rounds.items():
        ratios = [qs[c] / base[c] for c in base if qs.get(c)]
        factors[r] = median(ratios) if len(ratios) >= 2 and r >= CANARY_STABLE_FROM else 1.0
    return factors

def table(rounds):
    rns = sorted(rounds)
    factors = window_factors(rounds)
    queries = sorted({q for qs in rounds.values() for q in qs})
    lines = ["| query | " + " | ".join(f"r{r}" for r in rns) + " | last Δ (norm) |",
             "|---|" + "---|" * (len(rns) + 1),
             "| _window factor_ | " +
             " | ".join(f"{factors[r]:.2f}" for r in rns) + " | |"]
    for q in queries:
        vals = [rounds[r].get(q) for r in rns]
        cells = ["—" if v is None else f"{v:.2f}" for v in vals]
        # Δ shown on window-normalized values (cell / canary factor); the ⚠
        # requires BOTH the raw and the normalized delta outside the band —
        # the 3-canary factor is itself noisy, and requiring agreement means
        # neither ambient host drift (raw-only) nor canary jitter
        # (normalized-only) can manufacture a flag
        present = [(v, v / factors[r]) for v, r in zip(vals, rns) if v is not None]
        if len(present) >= 2 and present[-2][1] > 0:
            (raw0, n0), (raw1, n1) = present[-2], present[-1]
            ratio = n1 / n0
            def out(a, b):
                return (b / a > 1.4 or b / a < 1 / 1.4) and abs(b - a) > 0.3
            flag = " ⚠" if out(raw0, raw1) and out(n0, n1) else ""
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
            "Δ = last-round change on WINDOW-NORMALIZED values (each round's cells\n"
            "divided by its canary factor — the median drift of q_tpch_q5/q_tpch_q8/\n"
            "q_tfidf, untouched since r9 — so ambient host-window drift doesn't read\n"
            "as regression); ⚠ = outside the ±40% cross-JVM noise band AND >0.3 s\n"
            "normalized. The _window factor_ row shows each round's measured drift.\n"
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
