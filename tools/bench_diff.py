#!/usr/bin/env python3
"""Per-key bench regression diff between two rounds.

Per round, prefers the self-contained BENCH_LOCAL_r{n}.json that
graft.Bench writes (and the round commits), falling back to the driver's
BENCH_r{n}.json capture — the latter wraps the one-line JSON in {n, rc,
cpus, sf, tail, parsed} and truncates long tails (r8 lost d01-d03 that
way), so the committed artifact is authoritative. Usage:

    python3 tools/bench_diff.py            # latest two rounds in repo root
    python3 tools/bench_diff.py 6 7        # explicit rounds
    python3 tools/bench_diff.py a.json b.json   # explicit files

Flags any key whose time moved more than ±20% AND more than 0.15s
(sub-0.15s deltas at sf0.1 are JVM/GC jitter, not plans). Exit code 0
always — this is a report, not a gate; the judge reads the flag lines.
"""
import glob
import json
import os
import re
import sys

THRESH_PCT = 0.20
THRESH_ABS = 0.15


def load(path):
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and "queries" in d:
        return d  # a raw graft.Bench line saved as a file
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    tail = d.get("tail", "")
    # last JSON object in the tail that has a "queries" key
    best = None
    for m in re.finditer(r"\{.*\}", tail):
        try:
            obj = json.loads(m.group(0))
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "queries" in obj:
            best = obj
    if best is None:
        # Truncated capture (the r8 failure mode: tail clipped at the
        # FRONT, losing the "queries":{ opener and the first keys).
        # Recover the surviving catalog-key-shaped pairs so the diff
        # still reports on the intersection; clipped keys go missing.
        qs = {m.group(1): float(m.group(2))
              for m in re.finditer(r'"([a-z]\d{2}_\w+)":([0-9.]+)', tail)}
        if qs:
            print(f"# WARNING: {os.path.basename(path)} is truncated; "
                  f"recovered {len(qs)} keys (prefer BENCH_LOCAL_r*.json)")
            return {"queries": qs}
        sys.exit(f"no bench JSON line found in {path}")
    return best


def round_file(root, n):
    """Committed graft.Bench artifact if present, else the driver capture."""
    local = os.path.join(root, "BENCH_LOCAL_r{:02d}.json".format(n))
    if os.path.exists(local):
        return local
    return os.path.join(root, "BENCH_r{:02d}.json".format(n))


def resolve(args, root):
    if len(args) == 2 and all(os.path.exists(a) for a in args):
        return args[0], args[1]
    # Anything that looks like a path but didn't resolve above is a
    # mistake — bail instead of silently diffing the latest two rounds.
    if any(not a.isdigit() for a in args):
        sys.exit(f"unusable args {args}: pass two existing files, two round "
                 "numbers, or nothing (latest two rounds)")
    if len(args) == 1:
        # One round number is ambiguous (vs what?) — and used to fall
        # through to the latest-two branch, silently ignoring it.
        sys.exit(f"single round {args[0]} is ambiguous: pass two rounds, "
                 "two files, or nothing (latest two rounds)")
    rounds = sorted({
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "BENCH*_r*.json"))
        if (m := re.search(r"BENCH(?:_LOCAL)?_r(\d+)\.json$", p))})
    if len(args) == 2:
        a, b = int(args[0]), int(args[1])
    elif len(rounds) >= 2:
        a, b = rounds[-2], rounds[-1]
    else:
        sys.exit("need at least two bench rounds (BENCH_LOCAL_r*/BENCH_r*)")
    return round_file(root, a), round_file(root, b)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pa, pb = resolve(sys.argv[1:], root)
    a, b = load(pa), load(pb)
    qa, qb = a["queries"], b["queries"]
    # graft.Bench records a FAILED key as null — exclude those from the
    # arithmetic but surface them (a partially-broken run is exactly when
    # this report matters).
    failed = sorted(k for k in (set(qa) | set(qb))
                    if qa.get(k, 0) is None or qb.get(k, 0) is None)
    common = sorted(k for k in set(qa) & set(qb) if k not in failed)
    added = sorted(set(qb) - set(qa) - set(failed))
    removed = sorted(set(qa) - set(qb) - set(failed))
    print(f"# bench diff: {os.path.basename(pa)} -> {os.path.basename(pb)}")
    print(f"# common {len(common)}  added {added or '-'}  removed {removed or '-'}")
    if failed:
        print(f"# FAILED (null in either round, excluded): {failed}")
    ta = sum(qa[k] for k in common)
    tb = sum(qb[k] for k in common)
    print(f"# common-key total: {ta:.2f}s -> {tb:.2f}s ({(tb - ta) / ta:+.1%})")
    flags = 0
    for k in common:
        va, vb = qa[k], qb[k]
        delta = vb - va
        pct = delta / va if va else float("inf")
        if abs(pct) > THRESH_PCT and abs(delta) > THRESH_ABS:
            flags += 1
            tag = "REGRESSED" if delta > 0 else "improved "
            print(f"FLAG {tag} {k:24s} {va:7.3f}s -> {vb:7.3f}s ({pct:+.1%})")
    if not flags:
        print("no per-key moves beyond ±20% and 0.15s")
    for k in added:
        print(f"NEW  {k:24s} {qb[k]:7.3f}s")
    # Executed-plan fingerprint diff (graft.Bench >= r11 writes plan_fp:
    # md5 of the normalized post-AQE plan of the last timed pass). A
    # fingerprint change means the two sessions ran DIFFERENT physical
    # plans — the r10 d11/q09 lesson: check this before blaming the
    # machine for a timing swing.
    fa, fb = a.get("plan_fp") or {}, b.get("plan_fp") or {}
    if fa and fb:
        flips = sorted(k for k in set(fa) & set(fb) if fa[k] != fb[k])
        for k in flips:
            t = (f" ({qa[k]:.3f}s -> {qb[k]:.3f}s)"
                 if k in qa and k in qb and qa[k] and qb[k] else "")
            print(f"PLANFLIP {k:24s} {fa[k]} -> {fb[k]}{t}")
        if not flips:
            print(f"# plan_fp: all {len(set(fa) & set(fb))} common keys unchanged")
    elif fb and not fa:
        print("# plan_fp present only in the newer artifact (older pre-dates r11)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head is fine
        pass
