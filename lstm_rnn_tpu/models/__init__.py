from lstm_rnn_tpu.models.lstm import lstm_forward  # noqa: F401
from lstm_rnn_tpu.models.feedforward import feedforward_forward, softmax_forward  # noqa: F401
from lstm_rnn_tpu.models import losses  # noqa: F401
