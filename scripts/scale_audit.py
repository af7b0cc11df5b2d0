#!/usr/bin/env python3
"""One-command scaling audit: corpus-gen + per-query timing + PLANS.md rows.

Mechanizes the ad-hoc round-7/8 procedure (scripts/scaledata.py + BenchOne
+ hand-written table) so every new operator gets its two-decade scaling row
the same way:

  python3 scripts/scale_audit.py q_name [q_name ...] [--factors 10,100]

Per factor F it (a) builds /tmp/sf{F}x via scaledata.py if absent, (b) waits
for an idle box (1-min AND 5-min load < 2.0 — the round-8 bench taint came
from gating on the 1-min average only), (c) runs `sbt runMain graft.BenchOne`
with the first query duplicated so line 1 absorbs session init and is
dropped, and (d) prints a markdown table ready to paste into PLANS.md's
scaling section, plus the raw per-line timings for adjudication.

Timings are single-run (±30% — see .claude/skills/verify/SKILL.md); the
table is for decade-over-decade SHAPE (linear? superlinear?), not absolute
throughput claims. Row counts are printed so output-volume blowups (the
quadratic-dedup class) are visible next to the time.
"""
import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
# the exact table set scaledata.py produces (scaled + copied) — a corpus dir
# is complete only when EVERY one of these exists; counting arbitrary
# entries let a half-built dir from a crashed run taint the scaling rows
EXPECTED = {f"{t}.parquet" for t in (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")}


def ensure_corpus(factor: int) -> str:
    dst = f"/tmp/sf{factor}x"
    have = set(os.listdir(dst)) if os.path.isdir(dst) else set()
    if EXPECTED <= have:
        return dst
    print(f"[scale_audit] building {dst} (factor {factor})...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaledata.py"), dst,
         str(factor)], check=True)
    missing = EXPECTED - set(os.listdir(dst))
    if missing:
        raise RuntimeError(f"scaledata left {dst} incomplete: {sorted(missing)}")
    return dst


def wait_idle(max_load: float = 2.0, max_wait_sec: int = 600) -> None:
    """Both the 1-min and 5-min averages must clear the bar: a hot 5-min
    average with a cooled 1-min average still inflates timings ~35%."""
    t0 = time.time()
    while time.time() - t0 < max_wait_sec:
        one, five, _ = os.getloadavg()
        if one < max_load and five < max_load:
            return
        print(f"[scale_audit] load {one:.2f}/{five:.2f} (1m/5m) >= "
              f"{max_load}, waiting...", flush=True)
        time.sleep(20)
    print("[scale_audit] WARNING: load gate timed out; timings may be "
          "inflated", flush=True)


def settle(max_load: float = 4.0, max_wait_sec: int = 120) -> None:
    """Between serial same-audit JVMs: wait only for the 1-min average to
    drop below a loose bar (scheduler settle), never the 5-min trail."""
    t0 = time.time()
    while time.time() - t0 < max_wait_sec:
        one, _, _ = os.getloadavg()
        if one < max_load:
            return
        time.sleep(10)


# init-absorbing warmup gate: cheap, non-streaming, always present in the
# registry. It must NOT be the audited query itself: duplicating a
# streaming gate made the reported (second) line ride the session-memoized
# staged chunks + persistent checkpoint — processAllAvailable over an
# exhausted source is a no-op, so the row timed candidate-merge/verify
# instead of the cold path (the round-12 PLANS.md caveat, retired here).
WARMUP = "fifo_match"


def bench(sf_dir: str, queries: list) -> dict:
    """Run each query FIRST-IN-SESSION in its own JVM behind a fixed cheap
    warmup line (dropped): streaming gates stage fresh chunk/checkpoint
    roots per run, so the reported line is the full cold path —
    chunk staging + stream + verify. Returns {name: (seconds, rows)}.

    Load gating: the FULL both-averages gate runs once per factor (before
    the first JVM); between the strictly serial per-query JVMs only a
    light 1-min settle applies — the previous JVM has exited, so its
    trailing 5-min average is history, not contention, and re-gating on
    it would add a ~5-minute self-inflicted cooldown per query."""
    rows = {}
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    wait_idle()
    for q in queries:
        settle()
        cmd = ["sbt", "-batch", f"runMain graft.BenchOne {WARMUP} {q}"]
        out = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                             text=True).stdout
        seen_first = False
        for line in out.splitlines():
            parts = line.split()
            # "name   12.34 s  rows=N" from BenchOne's fixed format
            if len(parts) == 4 and parts[2] == "s" and parts[3].startswith("rows="):
                if not seen_first:
                    seen_first = True  # init-absorption (warmup) line
                    continue
                rows[parts[0]] = (float(parts[1]), int(parts[3][5:]))
        if q not in rows:
            # record the failure and keep going: one broken query must not
            # discard every other gate's timings (the 100x streaming_dedup
            # overflow cost a full audit pass before this guard)
            print(f"[scale_audit] ERROR: no timing line for {q}; sbt tail:",
                  flush=True)
            print("\n".join(out.splitlines()[-15:]), flush=True)
            rows[q] = (float("nan"), -1)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--factors", default="10,100",
                    help="comma-separated replication factors over sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    dirs = [("sf0.1", BASE)] + [(f"{f}x", ensure_corpus(f)) for f in factors]

    results = {}  # scale label -> {query: (sec, rows)}
    for label, d in dirs:
        print(f"[scale_audit] timing at {label} ({d})...", flush=True)
        results[label] = bench(d, args.queries)

    labels = [l for l, _ in dirs]
    hdr = ("| query | " + " | ".join(f"{l} (s)" for l in labels)
           + " | " + " | ".join(f"rows {l}" for l in labels)
           + f" | {labels[-1]}/{labels[0]} time |")
    sep = "|" + "---|" * (1 + 2 * len(labels) + 1)
    print("\n" + hdr + "\n" + sep)
    for q in args.queries:
        secs = [results[l][q][0] for l in labels]
        nrow = [results[l][q][1] for l in labels]
        ratio = secs[-1] / secs[0] if secs[0] > 0 else float("inf")
        print("| `" + q + "` | " + " | ".join(f"{s:.1f}" for s in secs)
              + " | " + " | ".join(f"{n:,}" for n in nrow)
              + f" | {ratio:.1f}× |")
    print("\n(single-run timings; each query first-in-session behind a "
          "dropped fifo_match warmup — streaming gates run the full cold "
          "path; load-gated at <2.0 1m+5m; shape over absolutes)")


if __name__ == "__main__":
    main()
