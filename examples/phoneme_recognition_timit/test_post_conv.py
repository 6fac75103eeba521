#!/usr/bin/env python3
"""Reorder posterior dimensions of HTK posterior dumps by a state map.

Rebuild of `test_post_conv.pl`: for HTK decoding, the posterior order
produced by the network must be permuted to the decoder's physical state
order. The map file has `<dst>:<src>` int pairs per line.

Usage: test_post_conv.py test.scp state.map output_prefix
"""

import os
import struct
import sys

import numpy as np


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 3:
        print("Usage: test_post_conv.py test.scp state.map output_prefix",
              file=sys.stderr)
        return 1
    scp, mapfile, prefix = argv
    # map line `v:k` means output position k takes the network's posterior v
    # (perl: $dict{$items[1]} = $items[0]; out[j] = in[$dict{$j}])
    perm = {}
    with open(mapfile) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            v, k = line.split(":")
            perm[int(k)] = int(v)
    n = len(perm)
    order = np.asarray([perm[j] for j in range(n)], np.int64)

    with open(scp) as f:
        for line in f:
            path = line.strip()
            if not path:
                continue
            with open(path, "rb") as g:
                hdr = g.read(12)
                nframes, period, ssize, kind = struct.unpack(">IIHH", hdr)
                ncls = ssize // 4
                if ncls != n:
                    print(f"unmatched dict({n}) and feature({ncls})")
                    return 1
                data = np.frombuffer(g.read(nframes * ssize), dtype=">f4")
                data = data.reshape(nframes, ncls)
            # test_post_conv.pl writes ">$prefix/$_": the output always
            # lands UNDER the prefix — an absolute scp path must not make
            # os.path.join drop the prefix and overwrite the input in place
            out_path = os.path.join(prefix, path.lstrip(os.sep))
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            print(f"converting {path}...")
            with open(out_path, "wb") as g:
                g.write(hdr)
                g.write(data[:, order].astype(">f4").tobytes())
    return 0


if __name__ == "__main__":
    sys.exit(main())
