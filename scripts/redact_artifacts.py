#!/usr/bin/env python3
"""Mask known-adjudicated strings in generated round artifacts before commit.

The round artifacts (LEAKCHECK.json in particular) quote scanner hits verbatim,
which re-imports previously-adjudicated strings on every regeneration. Run this
over the working tree before committing round artifacts so the committed copies
stay redacted. Redaction is PATTERN-based: this script must not itself contain
any sensitive literal (an earlier revision embedded the hostname split across a
string concatenation — recoverable, i.e. still a leak in a tracked file).
"""
import re, sys, pathlib

# Adjudicated patterns (see VERDICT rounds 6-7 "What's wrong"): the internal
# artifact-mirror hostname leaked via build-cache classpaths in old git-history
# diffs. Sources at HEAD are clean; only generated artifacts re-quote it.
# Any hostname-shaped string around the mirror product name is masked.
PATTERNS = [
    (re.compile(r"[a-z0-9.-]*artifactory[a-z0-9.-]*\.[a-z]{2,6}"),
     "<internal-mirror-host>"),
    # the split-string concatenation form ("artifactory" + ".<domain>") that
    # GITLOG quotes re-import from an old revision of this very script —
    # recoverable, so still a leak; matched by shape, never by domain.
    # GITLOG nesting stacks backslashes ( \\\" , \\\\\\\" ... ), so quote
    # escapes are matched as ANY run of backslashes before the quote. The
    # replacement PRESERVES the matched backslash runs via capture groups —
    # emitting bare quotes inside a nested-JSON string value would leave the
    # artifact unbalanced and corrupt it (round-10 advice).
    (re.compile(r'((?:\\)*")artifactory(?:\\)*"\s*\+\s*(?:\\)*"\.[a-z0-9.-]+((?:\\)*")'),
     r'\1<internal-mirror-host>\2'),
    # ...and the bare tail of that concatenation when the leading quote pair
    # was already masked in an outer GITLOG layer: + "\.<domain>" right after
    # a masked token — again keeping the trailing escape run intact.
    (re.compile(r'<internal-mirror-host>(?:\\)*"\s*\+\s*(?:\\)*"\.[a-z0-9.-]+((?:\\)*")'),
     r'<internal-mirror-host>\1'),
]

TARGETS = ["LEAKCHECK.json", "ADVICE.md", "VERDICT.md",
           "BASELINE.md", "PLANS.md",
           "BENCH_FULL.json", "BENCH_PARTIAL.json"] + sorted(
    str(p.name) for p in pathlib.Path(__file__).resolve().parent.parent
    .glob("BENCH_r*.json"))

# --- LEAKCHECK fixed-point canonicalization (round-14, verdict r13 #2/#3) ---
# The driver's GITLOG scan re-quotes the previous round's committed
# LEAKCHECK.json diff; each nesting layer doubles the JSON quote escaping, so
# the artifact grew 1,842 -> 5,402 -> 15,106 hits across rounds 11-13. The
# fixed point: a committed hit string must contain NOTHING the next round's
# scanner can match — no mirror-product token, no cache-path URL shape, no
# nested self-quote. Any such hit collapses to one short canonical marker and
# the list is deduped; the driver's raw count is preserved transparently under
# `n_hits_pre_redaction` while `n_hits` becomes the count actually committed.
_SELF_QUOTE_MARKERS = ("GITLOG:", "<internal-mirror", "artifactory",
                       "/.cache/coursier/")

def _canonicalize_leakcheck(obj):
    hits = obj.get("hits")
    if not isinstance(hits, dict):
        return obj
    total = 0
    for cat, lst in list(hits.items()):
        if not isinstance(lst, list):
            continue
        canon, seen = [], set()
        for s in lst:
            if isinstance(s, str) and any(m in s for m in _SELF_QUOTE_MARKERS):
                s = f"GITLOG:<redacted-history-quote:{cat}>"
            if s not in seen:
                seen.add(s)
                canon.append(s)
        hits[cat] = canon
        total += len(canon)
    if "n_hits" in obj and obj.get("n_hits") != total:
        obj.setdefault("n_hits_pre_redaction", obj["n_hits"])
        obj["n_hits"] = total
    return obj

def main():
    root = pathlib.Path(__file__).resolve().parent.parent
    changed, refused = [], []
    for name in TARGETS:
        p = root / name
        if not p.exists():
            continue
        text = p.read_text()
        out = text
        for rx, repl in PATTERNS:
            out = rx.sub(repl, out)
        if name == "LEAKCHECK.json":
            import json
            try:
                obj = _canonicalize_leakcheck(json.loads(out))
                out = json.dumps(obj, indent=2, sort_keys=False) + "\n"
            except Exception as e:
                print(f"LEAKCHECK canonicalization skipped ({e})", file=sys.stderr)
        if out != text:
            # never swap a parsing artifact for a corrupt one: a redaction
            # that breaks a .json target skips THAT file only — the rest of
            # the sweep must still run (a truncated bench artifact must not
            # shield later targets from redaction)
            if name.endswith(".json"):
                import json
                try:
                    json.loads(out)
                except Exception as e:
                    print(f"REFUSING {name}: redacted form no longer parses ({e})",
                          file=sys.stderr)
                    refused.append(name)
                    continue
            p.write_text(out)
            changed.append(name)
    print("redacted:", changed if changed else "nothing to do")
    if refused:
        print("REFUSED (still un-redacted, fix by hand):", refused, file=sys.stderr)
        return 1
    return 0

if __name__ == "__main__":
    sys.exit(main())
