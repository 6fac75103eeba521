#!/usr/bin/env python3
"""Majority vote over frame posteriors in a single_csv activation dump.

Rebuild of `sandbox/act_maj_vote.pl`: each line is `tag;v;v;...` with
n_frames * n_classes values; sums posteriors over frames and prints
`tag argmax` per sequence.

Usage: act_maj_vote.py <single_csv_file> [n_classes=41]
"""

import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("Usage: act_maj_vote.py <single_csv> [n_classes]", file=sys.stderr)
        return 1
    path = argv[0]
    nclass = int(argv[1]) if len(argv) > 1 else 41
    with open(path) as f:
        for line in f:
            els = line.rstrip("\n").split(";")
            tag, vals = els[0], [float(v) for v in els[1:]]
            if len(vals) % nclass != 0:
                print("ERROR: Wrong number of classes!")
                return 1
            scores = [0.0] * nclass
            for i in range(0, len(vals), nclass):
                for j in range(nclass):
                    scores[j] += vals[i + j]
            print(tag, scores.index(max(scores)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
