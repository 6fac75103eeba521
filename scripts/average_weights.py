#!/usr/bin/env python3
"""Checkpoint averaging over CURRENNT-format JSON networks.

Rebuild of `sandbox/average_weights.pl` (incremental mean over the weights
sections of N checkpoints; works because checkpoints are plain JSON).

Usage: average_weights.py <in_net> [<in_net> ...] <out_net>
"""

import json
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print("Usage: average_weights.py <in_nets...> <out_net>", file=sys.stderr)
        return 1
    ins, out = argv[:-1], argv[-1]
    acc = None
    for i, path in enumerate(ins):
        print(path)
        with open(path) as f:
            doc = json.load(f)
        if acc is None:
            acc = doc
            continue
        for layer, secs in doc["weights"].items():
            for sec, vals in secs.items():
                a = acc["weights"][layer][sec]
                for j, v in enumerate(vals):
                    a[j] += (v - a[j]) / (i + 1)
    with open(out, "w") as f:
        json.dump(acc, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
