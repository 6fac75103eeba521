"""Device/backend helpers.

The preinstalled remote-TPU plugin ('axon') is a single-client tunnel: while
another process holds it (or for a short window after one exits), backend
initialization fails with "Unable to initialize backend 'axon'". jax
deregisters the failed factory in-process, so retrying within the process is
futile — `ensure_backend` retries by RE-EXECUTING the interpreter, bounded
by LSTM_RNN_TPU_BACKEND_RETRIES (default 20, ~10s apart).
"""

from __future__ import annotations

import os
import sys
import time

_ENV = "LSTM_RNN_TPU_BACKEND_RETRY"


def ensure_backend(max_retries: int = 8):
    """Return jax.devices(), re-exec'ing the process if backend init fails.

    A FAILED init attempt wedges the tunnel's remote side for minutes, so
    tight retry loops never recover — backoff starts at 60s and grows
    (60, 120, 180, 180, ...)."""
    import jax

    try:
        return jax.devices()
    except RuntimeError as e:
        attempt = int(os.environ.get(_ENV, "0"))
        if attempt >= max_retries:
            raise RuntimeError(
                f"backend init failed after {attempt} retries: {e}") from e
        sleep_s = min(60.0 * (attempt + 1), 180.0)
        os.environ[_ENV] = str(attempt + 1)
        sys.stderr.write(
            f"[lstm_rnn_tpu] backend init failed (attempt {attempt + 1}/"
            f"{max_retries}), re-exec in {sleep_s:.0f}s: {e}\n")
        time.sleep(sleep_s)
        os.execv(sys.executable, [sys.executable] + sys.argv)
