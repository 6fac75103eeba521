"""Flagship model builder: the TIMIT 183-state DBLSTM recipe.

`examples/phoneme_recognition_timit/{config.cfg,network.jsn}` in the
reference: 117-dim fbank input -> 5 x BLSTM(250) -> softmax(183) ->
multiclass_classification; lr 1e-4, momentum 0.9, stochastic,
parallel_sequences 50, truncate_seq 500. This is the benchmark north star
(BASELINE.md).
"""

from __future__ import annotations

from typing import Optional

from lstm_rnn_tpu.network import Network


def timit_dblstm_layers(input_size: int = 117, hidden: int = 250,
                        depth: int = 5, num_states: int = 183):
    layers = [{"name": "input", "type": "input", "size": input_size}]
    for i in range(depth):
        layers.append({"name": f"blstm_level_{i}", "type": "blstm",
                       "size": hidden, "bias": 1.0})
    layers.append({"name": "output", "type": "softmax", "size": num_states,
                   "bias": 1.0})
    layers.append({"name": "postoutput", "type": "multiclass_classification",
                   "size": num_states})
    return layers


def build_timit_network(input_size: int = 117, hidden: int = 250,
                        depth: int = 5, num_states: int = 183,
                        seed: int = 42) -> Network:
    net = Network(timit_dblstm_layers(input_size, hidden, depth, num_states))
    net.init_params(seed)
    return net


def build_lvcsr_network(num_states: int = 10112, seed: int = 42) -> Network:
    """The fork's LVCSR target: same DBLSTM stack, softmax over PHYSICAL
    HMM-state indices (~10k decision-tree states, `htk2nc --no_label_map`
    mode — /root/reference/README.md:12, tools/htk2nc.cpp:215-243;
    examples/lvcsr_physical_states/). The wide state count routes the
    classification tail through softmax_ce_wide_fused automatically."""
    return build_timit_network(num_states=num_states, seed=seed)
