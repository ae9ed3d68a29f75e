"""Full-suite runner that emits a driver-visible TESTS_r{N}.json artifact
(VERDICT r3 next-8: the judge sandbox cannot re-run the full suite, so the
build environment certifies it).

Usage: python run_suite.py [--round N] [pytest args...]
Writes TESTS_r{N}.json with collected/passed/failed/skipped/wall_sec and
the exact pytest invocation.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    rnd = 4
    if "--round" in args:
        i = args.index("--round")
        rnd = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    extra = args or ["tests/", "-q", "--tb=line"]
    cmd = [sys.executable, "-m", "pytest", *extra]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    tail = out[-4000:]
    sys.stdout.write(tail)

    def count(pat):
        m = re.search(rf"(\d+) {pat}", out)
        return int(m.group(1)) if m else 0

    report = {
        "round": rnd,
        "cmd": " ".join(cmd),
        "passed": count("passed"),
        "failed": count("failed"),
        "skipped": count("skipped"),
        "errors": count("error"),
        "wall_sec": round(wall, 1),
        "returncode": proc.returncode,
        "summary_line": (re.search(r"=+ .*(passed|failed|error).* =+",
                                   out).group(0).strip("= ")
                         if re.search(r"=+ .*(passed|failed|error).* =+",
                                      out) else ""),
    }
    report["collected"] = (report["passed"] + report["failed"]
                           + report["skipped"] + report["errors"])
    path = f"TESTS_r{rnd:02d}.json"
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nwrote {path}: {report['summary_line']}")
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
