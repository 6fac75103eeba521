"""Merge device-probed verdicts from the local runtime cache into the
shipped vmem_probe_defaults.json (host-only; run after a device probe
session such as scripts/tpu_relay_return.sh). Only current-version keys
are merged (k3 chunk/carry, k3m1 mask, t1 tail families); everything
else in the cache is ignored. Prints a summary diff; --dry_run to
preview.

Usage: python scripts/merge_probe_defaults.py [--dry_run]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    from lstm_rnn_tpu.ops import vmem_probe as vp

    cache_path = vp._cache_path()
    defaults_path = os.path.join(os.path.dirname(vp.__file__),
                                 "vmem_probe_defaults.json")
    try:
        with open(cache_path) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        print(f"no runtime cache at {cache_path}; nothing to merge")
        return 1
    with open(defaults_path) as f:
        defaults = json.load(f)

    current = (f"|{vp.KERNEL_VERSION}|",
               f"|{vp.KERNEL_VERSION}{vp.MASK_VERSION}|",
               f"|{vp.TAIL_VERSION}|")
    added = changed = 0
    for k, v in sorted(cache.items()):
        if not any(tag in k for tag in current):
            continue
        if k not in defaults:
            print(f"+ {k} = {v}")
            added += 1
        elif defaults[k] != v:
            print(f"! {k}: {defaults[k]} -> {v}")
            changed += 1
        defaults[k] = bool(v)
    print(f"{added} added, {changed} changed, {len(defaults)} total")
    if args.dry_run or (added == 0 and changed == 0):
        return 0
    tmp = defaults_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(defaults, f, indent=0, sort_keys=True)
        f.write("\n")
    os.replace(tmp, defaults_path)
    print(f"wrote {defaults_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
