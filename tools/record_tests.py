"""Run a pytest tier and append the outcome to TEST_RESULTS.md with the
commit hash (VERDICT r4 item 7: slow-tier green-ness must be recorded in
an artifact, because judges/CI cannot re-run 14 e2e proves on 2 cores).

Usage:
    python tools/record_tests.py smoke          # -m smoke
    python tools/record_tests.py mid            # -m "not smoke and not slow"
    python tools/record_tests.py slow           # -m slow
    python tools/record_tests.py all            # everything
"""

import re
import subprocess
import sys
import time
import os

TIERS = {
    "smoke": ["-m", "smoke"],
    "mid": ["-m", "not smoke and not slow"],
    "slow": ["-m", "slow"],
    "all": [],
}


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "smoke"
    extra = sys.argv[2:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=root,
                         capture_output=True, text=True).stdout.strip()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", *TIERS[tier],
         *extra],
        cwd=root, capture_output=True, text=True)
    dt = time.time() - t0
    tail = (proc.stdout.strip().splitlines() or ["<no output>"])[-1]
    tail = re.sub(r"\x1b\[[0-9;]*m", "", tail)
    line = (f"| {time.strftime('%Y-%m-%d %H:%M')} | {rev} | {tier} | "
            f"rc={proc.returncode} | {dt:.0f}s | {tail} |")
    path = os.path.join(root, "TEST_RESULTS.md")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write("# Test-run record\n\n"
                    "Appended by tools/record_tests.py — one row per tier "
                    "run, so heavy tiers have a committed last-green "
                    "record.\n\n"
                    "| when (UTC) | commit | tier | rc | wall | result |\n"
                    "|---|---|---|---|---|---|\n")
    with open(path, "a") as f:
        f.write(line + "\n")
    print(line)
    print(proc.stdout[-2000:], file=sys.stderr)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
