"""lstm_rnn_tpu — a TPU-native rebuild of CURRENNT (naxingyu/lstm-rnn).

A jax/XLA/Pallas framework for training recurrent neural networks (LSTM /
bidirectional LSTM with peepholes and forget gates) on variable-length
sequences, reproducing the CURRENNT toolkit's network JSON format, NetCDF
dataset format, CLI flag surface and training semantics, re-designed for
TPU hardware: time-batched MXU matmuls, `lax.scan` recurrence, fused
Pallas cells, and multi-chip data parallelism over `jax.sharding.Mesh`.

Reference: /root/reference (CURRENNT, Weninger/Bergmann/Schuller, JMLR 2014,
with LVCSR modifications by Xingyu Na).
"""

__version__ = "0.1.0"

from lstm_rnn_tpu.network import Network  # noqa: F401
