#!/usr/bin/env python3
"""Insert a fresh hidden layer before the output layer of a network JSON.

Rebuild of `sandbox/add_layer.pl`: shifts the output/post-output layers down,
inserts {name, type, size, bias:1} in front of the output layer and deletes
the output layer's weights so it reinitializes.

Usage: add_layer.py <in_net> <out_net> <name> <type> <size>
"""

import json
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 5:
        print("Usage: add_layer.py <in_net> <out_net> <name> <type> <size>",
              file=sys.stderr)
        return 1
    in_net, out_net, name, ltype, size = argv
    with open(in_net) as f:
        doc = json.load(f)
    layers = doc["layers"]
    output_layer = layers[-2]
    layers.insert(len(layers) - 2,
                  {"name": name, "type": ltype, "size": int(size), "bias": 1.0})
    if "weights" in doc:
        doc["weights"].pop(output_layer["name"], None)
    with open(out_net, "w") as f:
        json.dump(doc, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
