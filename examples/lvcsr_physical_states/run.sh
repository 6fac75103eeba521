#!/bin/sh
# Train the LVCSR physical-state DBLSTM (see config.cfg for data prep).
python -m lstm_rnn_tpu.cli config.cfg
