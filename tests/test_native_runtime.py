"""Native C++ fraction assembly must match the NumPy path exactly."""

import numpy as np
import pytest

from lstm_rnn_tpu import runtime
from lstm_rnn_tpu.data.dataset import DataSet

from .test_data import _write_classification_nc


pytestmark = pytest.mark.skipif(runtime.load() is None,
                                reason="native runtime not built / no g++")


@pytest.mark.parametrize("kwargs", [
    {},
    {"input_left_context": 2, "input_right_context": 1},
    {"output_time_lag": 2},
])
def test_native_matches_python(tmp_path, kwargs):
    path = str(tmp_path / "t.nc")
    _write_classification_nc(path, [7, 3, 5], in_size=6, num_labels=4)
    ds_py = DataSet([path], parallel_sequences=2, prefetch=False,
                    use_native=False, **kwargs)
    ds_nat = DataSet([path], parallel_sequences=2, prefetch=False,
                     use_native=True, **kwargs)
    assert ds_nat._native is not None
    for fp, fn in zip(ds_py.fractions(), ds_nat.fractions()):
        np.testing.assert_array_equal(fp.inputs, fn.inputs)
        np.testing.assert_array_equal(fp.targets, fn.targets)
        np.testing.assert_array_equal(fp.pattypes, fn.pattypes)
        assert fp.seq_info == fn.seq_info


def test_native_regression(tmp_path, rng):
    from lstm_rnn_tpu.data.netcdf3 import strings_to_chars, write_netcdf
    n = 12
    dims = {"numSeqs": 2, "numTimesteps": n, "inputPattSize": 3,
            "targetPattSize": 2, "maxSeqTagLength": 8}
    path = str(tmp_path / "r.nc")
    write_netcdf(path, dims, [
        ("seqTags", ["numSeqs", "maxSeqTagLength"], strings_to_chars(["a", "b"], 8)),
        ("seqLengths", ["numSeqs"], np.asarray([7, 5], np.int32)),
        ("inputs", ["numTimesteps", "inputPattSize"],
         rng.randn(n, 3).astype(np.float32)),
        ("targetPatterns", ["numTimesteps", "targetPattSize"],
         rng.randn(n, 2).astype(np.float32)),
    ])
    ds_py = DataSet([path], parallel_sequences=2, prefetch=False,
                    use_native=False, output_time_lag=1)
    ds_nat = DataSet([path], parallel_sequences=2, prefetch=False,
                     use_native=True, output_time_lag=1)
    for fp, fn in zip(ds_py.fractions(), ds_nat.fractions()):
        np.testing.assert_array_equal(fp.inputs, fn.inputs)
        np.testing.assert_array_equal(fp.targets, fn.targets)
        np.testing.assert_array_equal(fp.pattypes, fn.pattypes)
