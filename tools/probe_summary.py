"""Summarize round-3 probe logs (/tmp/probe_*.log, /tmp/frame_*.log) into
one table for ROADMAP bookkeeping.

Each probe prints rows like
    occl mix HL             :    343.2 ms    6.09 Mray/s
this collects every such row, grouped by log file, and prints a compact
markdown table plus the raw config header (tris/K/mt/ct) per file.

    python tools/probe_summary.py [logdir]
"""

from __future__ import annotations

import glob
import os
import re
import sys

ROW = re.compile(r"^(.{4,28}?)\s*:\s*([0-9.]+) ms\s+([0-9.]+) Mray/s")
HDR = re.compile(r"^tris=\d+.*build=[0-9.]+s")


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    paths = sorted(
        glob.glob(os.path.join(logdir, "probe_*.log"))
        + glob.glob(os.path.join(logdir, "frame_*.log"))
    )
    if not paths:
        print(f"no probe logs under {logdir}")
        return
    for p in paths:
        rows, hdr, tail = [], None, []
        with open(p, errors="replace") as f:
            for line in f:
                line = line.rstrip()
                m = ROW.match(line)
                if m:
                    rows.append((m.group(1).strip(), m.group(2), m.group(3)))
                elif HDR.match(line):
                    hdr = line
                elif "Error" in line or "error" in line:
                    tail.append(line)
        print(f"\n## {os.path.basename(p)}")
        if hdr:
            print(f"   {hdr}")
        if not rows and not tail:
            print("   (no result rows — empty or still running)")
        for tag, ms, mray in rows:
            print(f"   {tag:26s} {float(ms):9.1f} ms  {float(mray):7.2f} Mray/s")
        for t in tail[:3]:
            print(f"   ! {t[:100]}")


if __name__ == "__main__":
    main()
