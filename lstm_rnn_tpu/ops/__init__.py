from lstm_rnn_tpu.ops.activations import (  # noqa: F401
    EXP_LIMIT,
    LOG_ZERO,
    REAL_MIN,
    REAL_MAX,
    grad_clip,
    identity,
    logistic,
    safe_exp,
    tanh2,
)
from lstm_rnn_tpu.ops.masking import PATTYPE_NONE, PATTYPE_FIRST, PATTYPE_NORMAL, PATTYPE_LAST  # noqa: F401
