#!/bin/sh
# Generate synthetic data on first run (the reference's train blobs were
# stripped from its repo too; see ../../make_example_data.py).
[ -f ../train_1_speaker.nc ] && [ -f ../val_1_speaker.nc ] \
  || python ../../make_example_data.py chime_recognition
python -m lstm_rnn_tpu.cli config.cfg "$@"
