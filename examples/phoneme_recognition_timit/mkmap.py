#!/usr/bin/env python3
"""Make an htk2nc mapping file from a feature .scp list.

Rebuild of `mkmap.pl`: each scp line `dir/base.ext` becomes
`dir/base 1 <feat_prefix>/dir/base.ext dir/base.txt`.

Usage: mkmap.py feat.scp feat_prefix > map.scp
"""

import os
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 2:
        print("Usage: mkmap.py feat.scp feat_prefix > map.scp", file=sys.stderr)
        return 1
    scp, prefix = argv
    with open(scp) as f:
        for line in f:
            fname = line.strip()
            if not fname:
                continue
            dname = os.path.dirname(fname)
            base, ext = os.path.splitext(os.path.basename(fname))
            tag = os.path.join(dname, base)
            # mkmap.pl concatenates "$featpre/$dname/$base.$ext" — the
            # prefix must survive even when scp entries are absolute
            # (os.path.join would discard it for a leading '/')
            feat = os.path.join(prefix, dname.lstrip(os.sep), base + ext)
            label = os.path.join(dname, base + ".txt")
            print(f"{tag} 1 {feat} {label}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
