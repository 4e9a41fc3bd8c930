#!/usr/bin/env python3
"""Standalone replica of graft.Bench.calibrateIo (Bench.scala:111):
64 MiB sequential write + fsync + read + delete in tmpdir, min of 3
cycles, seconds. Exists so io-band samples can be taken across boots
and across a round WITHOUT paying a full bench run — the band that
tools/io_band.json commits and tools/trajectory.py consults.

Usage: python3 tools/io_probe.py [tmpdir] [reps]
Prints one JSON line: {"io": <min>, "cycles": [..], "ts": <epoch>, "host_load": "..."}
"""
import json
import os
import sys
import time

def cycle(dirname, tag):
    buf = os.urandom(1 << 20)
    p = os.path.join(dirname, f".graft_ioprobe_py_{tag}")
    t0 = time.monotonic()
    try:
        fd = os.open(p, os.O_CREAT | os.O_WRONLY | os.O_TRUNC, 0o600)
        try:
            for _ in range(64):
                os.write(fd, buf)
            os.fsync(fd)
        finally:
            os.close(fd)
        with open(p, "rb") as fh:
            while fh.read(1 << 20):
                pass
        return time.monotonic() - t0
    finally:
        try:
            os.unlink(p)
        except OSError:
            pass

def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cycles = [round(cycle(d, i), 3) for i in range(reps)]
    load = open("/proc/loadavg").read().split()[0]
    print(json.dumps({"io": min(cycles), "cycles": cycles,
                      "ts": round(time.time(), 1), "host_load": float(load)}))

if __name__ == "__main__":
    main()
