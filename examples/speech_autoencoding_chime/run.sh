#!/bin/sh
[ -f train_1_speaker.nc ] && [ -f val_1_speaker.nc ] \
  || python ../make_example_data.py chime_autoencoding
python -m lstm_rnn_tpu.cli config.cfg "$@"
