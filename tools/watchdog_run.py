#!/usr/bin/env python
"""Run a chip job under a stall watchdog; kill + retry on wedge.

The axon relay occasionally wedges a process silently: it blocks on a
futex with ~zero CPU accrual and no output, typically right after a
compile completes (BASELINE.md operational notes; observed repeatedly).
A wedged process holds the single chip forever, so long unattended runs
need supervision.  Detection: host CPU time (utime+stime) accrues steadily
during real work — dispatch, fetches, loaders all burn cycles — but stops
dead on a wedge.  If the child accrues less than --min_cpu_s over a
--stall_s window, it is killed (SIGKILL, by explicit PID) and the command
retried from scratch; chunked/resumable jobs lose at most a chunk.

    python tools/watchdog_run.py --stall_s 420 --retries 3 -- \
        python tools/eval_quality.py ...
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def cpu_jiffies(pid: int) -> int:
    """utime+stime of pid AND all its live children (jiffies)."""
    total = 0
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        total += int(parts[11]) + int(parts[12])  # utime, stime
    except OSError:
        return -1
    try:
        for tid in os.listdir(f"/proc/{pid}/task"):
            with open(f"/proc/{pid}/task/{tid}/children") as f:
                for child in f.read().split():
                    c = cpu_jiffies(int(child))
                    if c > 0:
                        total += c
    except OSError:
        pass
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall_s", type=float, default=900.0,
                    help="window with no CPU accrual that counts as a wedge. "
                         "CAUTION: with PALLAS_AXON_REMOTE_COMPILE=1 the "
                         "host is quiet during XLA compiles — the window "
                         "must exceed the longest remote compile or the "
                         "watchdog false-kills a healthy compiling process")
    ap.add_argument("--min_cpu_s", type=float, default=1.0,
                    help="CPU seconds that must accrue per window")
    ap.add_argument("--poll_s", type=float, default=30.0)
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--grace_s", type=float, default=180.0,
                    help="startup grace before stall detection arms "
                         "(interpreter boot + imports are host-quiet-ish; "
                         "tracing/compile burns host CPU, so the detector "
                         "is safe to arm early)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command after `--`")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given")

    hz = os.sysconf("SC_CLK_TCK")
    for attempt in range(1, args.retries + 1):
        print(f"[watchdog] attempt {attempt}/{args.retries}: {' '.join(cmd)}",
              flush=True)
        # new session: a stall kill must take the child's WHOLE process
        # group, or a grandchild (e.g. a tool's own subprocess) survives
        # orphaned and keeps holding the chip
        proc = subprocess.Popen(cmd, start_new_session=True)
        window_start = time.time()
        window_cpu = cpu_jiffies(proc.pid)
        armed_at = time.time() + args.grace_s
        wedged = False
        while True:
            try:
                proc.wait(timeout=args.poll_s)
                break
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            cpu = cpu_jiffies(proc.pid)
            if cpu > window_cpu + args.min_cpu_s * hz:
                window_start, window_cpu = now, cpu
            elif now - window_start > args.stall_s and now > armed_at:
                print(f"[watchdog] STALL: <{args.min_cpu_s}s CPU in "
                      f"{now - window_start:.0f}s — killing group {proc.pid}",
                      flush=True)
                wedged = True
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    proc.send_signal(signal.SIGKILL)
                proc.wait()
                break
        if not wedged:
            print(f"[watchdog] exit code {proc.returncode}", flush=True)
            return proc.returncode
        time.sleep(10)
    print("[watchdog] giving up after retries", flush=True)
    return 86


if __name__ == "__main__":
    sys.exit(main())
