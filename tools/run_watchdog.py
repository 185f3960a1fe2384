#!/usr/bin/env python
"""Stall watchdog for chip runs over the axon tunnel.

MEASURED (round 4, twice): the remote-TPU tunnel occasionally hangs
mid-run — the client blocks forever in a futex inside block_until_ready,
CPU time frozen, no error raised. The climate-gate chains checkpoint
their state every ~10 minutes, so the cheap, robust recovery is
supervision: watch the run's log file, and if no output appears for
--stale seconds (default 420; a separate --grace window, default 900,
covers the silent first compile), SIGKILL the whole process group and
relaunch the identical command — the gate resumes from its state cache,
losing at most one checkpoint interval.

Usage:
    python tools/run_watchdog.py --log FILE [--stale S] [--grace S]
        [--max-attempts N] -- CMD ARG...

Exits with the supervised command's exit code once it terminates on its
own (including clean --max-wall-seconds stops, exit 0).
"""

import os
import signal
import subprocess
import sys
import time


def main(argv):
    sep = argv.index("--")
    opts, cmd = argv[:sep], argv[sep + 1:]

    def opt(name, default):
        return type(default)(opts[opts.index(name) + 1]) \
            if name in opts else default

    log = opts[opts.index("--log") + 1]
    stale_s = opt("--stale", 420.0)
    grace_s = opt("--grace", 900.0)
    max_attempts = opt("--max-attempts", 20)

    for attempt in range(1, max_attempts + 1):
        with open(log, "ab", buffering=0) as lf:
            lf.write(f"=== watchdog attempt {attempt}: "
                     f"{' '.join(cmd)} ===\n".encode())
            p = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                 start_new_session=True)
            start = time.time()
            stalled = False
            while True:
                rc = p.poll()
                if rc is not None:
                    break
                mtime = os.path.getmtime(log)
                # before first real output, allow the longer compile grace
                limit = grace_s if mtime - start < 5.0 else stale_s
                if time.time() - mtime > limit:
                    lf.write(f"=== watchdog: no output for {limit:.0f}s "
                             "(tunnel stall); killing process group for "
                             "restart ===\n".encode())
                    try:
                        os.killpg(p.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    p.wait()
                    stalled = True
                    break
                time.sleep(20)
            if not stalled:
                lf.write(f"=== watchdog: command exited rc={rc} "
                         f"(attempt {attempt}) ===\n".encode())
                return rc
    print(f"watchdog: gave up after {max_attempts} stalls", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
