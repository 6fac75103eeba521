from lstm_rnn_tpu.utils.device import ensure_backend  # noqa: F401
