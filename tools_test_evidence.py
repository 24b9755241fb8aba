#!/usr/bin/env python
"""Persisted test evidence (VERDICT r2/r3: run BOTH tiers before the
end-of-round commit and keep the receipts).

Runs the fast tier (`pytest -q`) and the slow tier (`pytest -q -m slow`)
as subprocesses at the current HEAD and writes TESTS_r0N.json at the repo
root with each tier's tail, counts, duration, and the HEAD hash — so a
"tests pass" claim is auditable against the exact commit it was made for.

Usage: python tools_test_evidence.py [round_number]
"""
import json
import re
import subprocess
import sys
import time


def run_tier(args):
    t0 = time.time()
    # stderr folded into stdout (ADVICE r04): a collection/import crash or
    # an interrupted run puts its diagnostics on stderr — without this the
    # receipt records green=false with an empty tail and no evidence.
    p = subprocess.run([sys.executable, "-m", "pytest", "tests/", "-q", *args],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    dt = time.time() - t0
    tail = "\n".join(p.stdout.strip().splitlines()[-6:])
    m = re.search(r"(\d+) passed", p.stdout)
    f = re.search(r"(\d+) failed", p.stdout)
    e = re.search(r"(\d+) error", p.stdout)
    return {
        "passed": int(m.group(1)) if m else 0,
        "failed": int(f.group(1)) if f else 0,
        "errors": int(e.group(1)) if e else 0,
        "returncode": p.returncode,
        # pytest rc 5 = "no tests collected" — a config/marker problem,
        # not a test failure; surfaced distinctly (ADVICE r04)
        "no_tests": p.returncode == 5,
        "duration_s": round(dt, 1),
        "tail": tail,
    }


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    porcelain = subprocess.run(["git", "status", "--porcelain"],
                               capture_output=True, text=True
                               ).stdout.strip().splitlines()
    modified = [l for l in porcelain if not l.startswith("??")]
    untracked = [l for l in porcelain if l.startswith("??")]
    out = {"head": head,
           # 'dirty' = TRACKED modifications (the receipt is void if the
           # tested code differs from HEAD); untracked run artifacts are
           # listed separately and do not void it
           "dirty": bool(modified),
           "untracked": untracked[:20],
           "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(f"== fast tier @ {head[:9]}{' (DIRTY)' if modified else ''}",
          flush=True)
    out["fast"] = run_tier([])
    print(json.dumps(out["fast"], indent=1), flush=True)
    print("== slow tier", flush=True)
    out["slow"] = run_tier(["-m", "slow"])
    print(json.dumps(out["slow"], indent=1), flush=True)
    ok = all(out[t]["returncode"] == 0 for t in ("fast", "slow"))
    out["green"] = ok
    path = f"TESTS_r{rnd:02d}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path} green={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
