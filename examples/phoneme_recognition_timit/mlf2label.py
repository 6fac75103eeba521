#!/usr/bin/env python3
"""HTK MLF alignment -> per-frame label text files.

Rebuild of `mlf2label.pl`: for each utterance entry `"dir/base.lab"` in the
MLF, writes `dir/base.txt` with one label per 100000-tick (10ms) frame,
repeating each segment's label for its duration.

Usage: mlf2label.py alignment.mlf
"""

import os
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print("Usage: mlf2label.py mlf", file=sys.stderr)
        return 1
    out = None
    with open(argv[0]) as f:
        for line in f:
            line = line.rstrip("\n")
            if line.startswith('"') and line.endswith('"'):
                fname = line.strip('"')
                dname = os.path.dirname(fname)
                base = os.path.basename(fname)
                if base.endswith(".lab"):
                    base = base[:-4]
                if dname:
                    os.makedirs(dname, exist_ok=True)
                print(f"{base}.txt at {dname or '.'}")
                out = open(os.path.join(dname, base + ".txt"), "w")
                continue
            if out is None:
                continue
            if line == ".":
                out.close()
                out = None
                continue
            items = line.split()
            if len(items) >= 3:
                # mlf2label.pl:42-43 float-divides the tick duration and
                # loops while i < n — i.e. CEILING frames for durations not
                # a multiple of 100000 ticks (10 ms)
                n = -(-(int(items[1]) - int(items[0])) // 100000)
                for _ in range(n):
                    out.write(items[2] + "\n")
    if out:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
