#!/bin/sh
python -m lstm_rnn_tpu.cli config.cfg
