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


def test_fmt_f64_json_value_identical_to_python():
    """runtime.fmt_f64_json (std::to_chars in runtime/jsonfmt.cpp) must
    parse back to the EXACT same doubles as Python's json encoder —
    including zero, integral values (the '.0' rule), subnormals, huge
    exponents, and the NaN/Infinity literals json.dump emits."""
    import json
    import math

    if runtime.load() is None:
        pytest.skip("native runtime unavailable")
    rng = np.random.RandomState(3)
    a = np.concatenate([
        rng.randn(4096) * np.logspace(-30, 30, 4096),
        [0.0, -0.0, 1.0, -1.0, 0.1, 1e16, -1e16, 5e-324,
         2.2250738585072014e-308, 1.7976931348623157e308,
         np.nan, np.inf, -np.inf],
    ]).astype(np.float64)
    blob = runtime.fmt_f64_json(a)
    got = json.loads(blob.decode())
    ref = json.loads(json.dumps(a.tolist()))
    assert len(got) == len(ref)
    for i, (x, y) in enumerate(zip(got, ref)):
        if isinstance(y, float) and math.isnan(y):
            assert math.isnan(x), i
        else:
            assert x == y, (i, x, y)
    assert all(isinstance(v, float) for v in got)  # never a bare int


def test_dump_doc_json_matches_pure_python(tmp_path):
    """dump_doc_json: numpy arrays anywhere in the doc (weights sections,
    optimizer state) serialize natively yet parse identically to the
    .tolist() + json.dump fallback; small arrays take the fallback
    in-process."""
    import io
    import json

    from lstm_rnn_tpu import io_currennt as ioc

    rng = np.random.RandomState(5)
    doc = {
        "configuration": "opt = value;;;other",
        "weights": {"l1": {"input": rng.randn(3000),
                           "bias": rng.randn(12)}},
        "optimizer_best_weights": [rng.randn(2048), []],
        "layers": [{"name": "l1", "type": "lstm", "size": 4}],
    }
    buf = io.StringIO()
    ioc.dump_doc_json(doc, buf)
    got = json.loads(buf.getvalue())

    def pure(x):
        if isinstance(x, np.ndarray):
            return np.asarray(x, np.float64).tolist()
        if isinstance(x, dict):
            return {k: pure(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [pure(v) for v in x]
        return x

    ref = json.loads(json.dumps(pure(doc), indent=1))
    assert got == ref


def test_dump_doc_json_preserves_integer_arrays():
    """Integer/bool ndarrays in the doc must keep their parsed JSON types
    (ints, not floats) — only float arrays widen to float64. A label-map
    or counter array that round-trips as [0.0, 1.0, ...] would silently
    change types for every downstream reader."""
    import io
    import json

    from lstm_rnn_tpu import io_currennt as ioc

    doc = {"ints": np.arange(600, dtype=np.int32),
           "flags": np.array([True, False]),
           "floats": np.arange(600, dtype=np.float32)}
    buf = io.StringIO()
    ioc.dump_doc_json(doc, buf)
    got = json.loads(buf.getvalue())
    assert got["ints"] == list(range(600))
    assert all(isinstance(v, int) for v in got["ints"])
    assert got["flags"] == [True, False]
    assert all(isinstance(v, float) for v in got["floats"])


def test_dump_doc_json_token_collision_falls_back():
    """A doc string exactly equal to an internal splice token must not
    corrupt the output — the writer detects it and takes the pure path."""
    import io
    import json

    from lstm_rnn_tpu import io_currennt as ioc

    arr = np.arange(600, dtype=np.float64)
    doc = {"evil": "@@LRT_JSONFMT_ARRAY_0@@", "w": arr}
    buf = io.StringIO()
    ioc.dump_doc_json(doc, buf)
    got = json.loads(buf.getvalue())
    assert got["evil"] == "@@LRT_JSONFMT_ARRAY_0@@"
    assert got["w"] == arr.tolist()
