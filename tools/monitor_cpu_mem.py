"""Host cpu/mem sampling monitor — analogue of the reference's
infrastructure/performance_analyzer/monitor_cpu_mem.py (which shells out to
`free`/`ps`). Reads /proc directly so it has zero dependencies; emits one
CSV line per sample: unix_ts, cpu_pct, mem_used_mb, mem_total_mb[, rss_mb].

Usage: python tools/monitor_cpu_mem.py [--interval 1.0] [--pid PID]
Stop with Ctrl-C; rows stream to stdout (redirect to a file to keep them).
"""

from __future__ import annotations

import argparse
import sys
import time


def _cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return idle, sum(vals)


def _meminfo():
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            info[k] = int(v.split()[0])  # kB
    used = info["MemTotal"] - info.get("MemAvailable", info["MemFree"])
    return used / 1024.0, info["MemTotal"] / 1024.0


def _rss_mb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/statm") as f:
            pages = int(f.read().split()[1])
        return pages * 4096 / 1e6
    except OSError:
        return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=1.0)
    ap.add_argument("--pid", type=int, default=None,
                    help="also sample this process's RSS")
    args = ap.parse_args()

    header = "ts,cpu_pct,mem_used_mb,mem_total_mb"
    if args.pid:
        header += ",rss_mb"
    print(header)
    prev_idle, prev_total = _cpu_times()
    try:
        while True:
            time.sleep(args.interval)
            idle, total = _cpu_times()
            didle, dtotal = idle - prev_idle, total - prev_total
            prev_idle, prev_total = idle, total
            cpu = 100.0 * (1 - didle / dtotal) if dtotal else 0.0
            used, tot = _meminfo()
            row = f"{time.time():.1f},{cpu:.1f},{used:.0f},{tot:.0f}"
            if args.pid:
                row += f",{_rss_mb(args.pid):.0f}"
            print(row, flush=True)
    except (KeyboardInterrupt, BrokenPipeError):
        return 0


if __name__ == "__main__":
    sys.exit(main())
