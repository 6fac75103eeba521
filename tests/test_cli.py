"""CLI integration tests: training, autosave/continue, forward modes."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from .conftest import requires_reference
from .test_data import _write_classification_nc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "lstm_rnn_tpu.cli", *args, "--device", "cpu"],
        capture_output=True, text=True, cwd=str(cwd), env=env)


def _assert_csv_close(path_a, path_b, rtol=1e-4, atol=1e-6):
    """Two single_csv posterior dumps must match line-by-line: same tags,
    values equal to the given tolerance (shared by every serving-mode
    equality test so the format and comparison cannot drift)."""
    a = path_a.read_text().strip().split("\n")
    b = path_b.read_text().strip().split("\n")
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        ca, cb = la.split(";"), lb.split(";")
        assert ca[0] == cb[0]  # sequence tag
        np.testing.assert_allclose([float(v) for v in ca[1:]],
                                   [float(v) for v in cb[1:]],
                                   rtol=rtol, atol=atol)


def _toy_setup(tmp_path, rng):
    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4, seed=7)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "lstm", "size": 4, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification", "size": 4},
        ],
    }
    net_path = tmp_path / "net.jsn"
    net_path.write_text(json.dumps(net))
    return nc, str(net_path)


def test_train_autosave_continue_equals_straight_run(tmp_path, rng):
    """3 epochs straight == 2 epochs + autosave + --continue for 1 more:
    the continued run must restore weights, momentum and counters exactly."""
    nc, net_path = _toy_setup(tmp_path, rng)
    common = ["--network", net_path, "--train", "true", "--train_file", nc,
              "--stochastic", "true", "--learning_rate", "1e-3",
              "--parallel_sequences", "2", "--random_seed", "5"]

    d1 = tmp_path / "straight"
    d1.mkdir()
    r = _cli(*common, "--max_epochs", "3", "--autosave", "true", cwd=d1)
    assert r.returncode == 0, r.stdout + r.stderr
    # per-epoch autosaves were written; the mid-run one is resumable
    autosave = d1 / "epoch002.autosave"
    assert autosave.exists()
    doc = json.loads(autosave.read_text())
    for key in ("configuration", "info_rows", "optimizer_cur_epoch",
                "optimizer_best_weights", "steepest_descent_optimizer_weight_deltas",
                "layers", "weights"):
        assert key in doc, key
    assert doc["optimizer_cur_epoch"] == 2
    assert doc["optimizer_finished"] is False

    # resume from epoch 2: must run exactly epoch 3 (stored config has
    # max_epochs=3; --continue ignores all other CLI flags)
    d2 = tmp_path / "resumed"
    d2.mkdir()
    r = _cli("--continue", str(autosave), cwd=d2)
    assert r.returncode == 0, r.stdout + r.stderr

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-6, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_autosave_snapshots_survive_pipelined_dispatch(tmp_path, rng):
    """Pipelined autosave (round 5): once epoch N+1 is dispatched, the
    trainer's live params/velocity buffers belong to it (donated), so the
    autosave writer must read epoch N's weights/deltas/number from the
    dispatch handle's snapshots — and they must equal a sequential
    (unpipelined) run's export exactly."""
    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    nc, net_path = _toy_setup(tmp_path, rng)
    layers = json.loads(open(net_path).read())["layers"]

    def make():
        net = Network(layers)
        net.init_params(9)
        ds = DataSet([nc], parallel_sequences=2, prefetch=False)
        tr = Trainer(net, ds, learning_rate=1e-3, momentum=0.9,
                     max_epochs=3, hybrid_online_batch=True,
                     device_cache=False)
        return tr

    # sequential twin: epoch 1 dispatched, finished, exported
    seq = make()
    seq.finish_epoch(seq.dispatch_epoch())
    want = seq.export_state()

    # pipelined run: epoch 2 dispatched (donating epoch 1's buffers)
    # BEFORE epoch 1's export
    pip = make()
    pip.snapshot_velocity = True
    h1 = pip.dispatch_epoch()
    h2 = pip.dispatch_epoch()
    pip.finish_epoch(h1)
    got = pip.export_state(cur_epoch=h1["epoch"], velocity=h1["snap_v"])
    assert got["optimizer_cur_epoch"] == want["optimizer_cur_epoch"] == 1
    for key in ("optimizer_best_weights",
                "steepest_descent_optimizer_weight_deltas"):
        for a, b in zip(got[key], want[key]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=key)
    # the epoch-end WEIGHTS ride h["snap"], donation-safe
    w_got = pip.exact_params(h1["snap"])
    seq2 = make()
    seq2.finish_epoch(seq2.dispatch_epoch())
    w_want = seq2.exact_params()
    for name in w_want:
        for kk in w_want[name]:
            np.testing.assert_array_equal(w_got[name][kk], w_want[name][kk],
                                          err_msg=f"{name}.{kk}")
    pip.finish_epoch(h2)  # drain the over-dispatched epoch cleanly


def test_terminal_autosave_stores_restored_best_weights(tmp_path, rng):
    """At training stop the reference restores the best weights BEFORE
    the final state save (Optimizer.cu:318 inside train(), then
    main.cpp:276-277), so --continue from a FINISHED autosave resumes on
    the best weights — not the stop epoch's end-of-epoch snapshot
    (round-5 review finding on the pipelined autosave path)."""
    nc, net_path = _toy_setup(tmp_path, rng)
    val = str(tmp_path / "val.nc")
    _write_classification_nc(val, [5, 6], in_size=3, num_labels=4, seed=11)
    d = tmp_path / "run"
    d.mkdir()
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--val_file", val, "--learning_rate", "10.0",
             "--momentum", "0.0", "--parallel_sequences", "2",
             "--max_epochs", "6", "--max_epochs_no_best", "2",
             "--autosave", "true", cwd=d)
    assert r.returncode == 0, r.stderr
    # lr=10 diverges, so the run early-stops with the best epoch >= 2
    # behind the stop epoch (max_epochs_no_best=2) — the scenario where
    # restored-best and epoch-end weights genuinely differ
    assert "No new lowest error since 2 epochs" in r.stdout, r.stdout
    saves = sorted(d.glob("epoch*.autosave"))
    assert len(saves) >= 2
    last = json.loads(saves[-1].read_text())
    assert last["optimizer_finished"] is True
    trained = json.loads((d / "trained_network.jsn").read_text())

    def layer_arrays(doc):
        return {name: {k: np.asarray(v) for k, v in sec.items()}
                for name, sec in doc["weights"].items()}

    got, want = layer_arrays(last), layer_arrays(trained)
    prev = layer_arrays(json.loads(saves[-2].read_text()))
    diffs = 0
    for name in want:
        for k in want[name]:
            np.testing.assert_array_equal(got[name][k], want[name][k],
                                          err_msg=f"{name}.{k}")
            diffs += int(not np.array_equal(got[name][k], prev[name][k]))
    # vacuity guard: the terminal autosave really is the RESTORED best,
    # different from the previous epoch's end-of-epoch weights
    assert diffs > 0


def test_autosave_worker_failure_aborts_loudly(tmp_path, rng, monkeypatch):
    """A failed checkpoint write on the autosave worker thread must abort
    the run at the next join — not silently train on with no autosaves
    landing (round-5 review finding: the default thread excepthook only
    prints to stderr)."""
    import pytest

    from lstm_rnn_tpu import cli as cli_mod
    from lstm_rnn_tpu import io_currennt as ioc
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.trainer import Trainer

    from .test_data import _write_classification_nc

    nc, net_path = _toy_setup(tmp_path, rng)
    del nc
    net = Network(json.loads(open(net_path).read())["layers"])
    net.init_params(1)
    ds_nc = str(tmp_path / "t2.nc")
    _write_classification_nc(ds_nc, [4, 4], in_size=3, num_labels=4, seed=2)
    from lstm_rnn_tpu.data.dataset import DataSet
    ds = DataSet([ds_nc], parallel_sequences=2, prefetch=False)
    tr = Trainer(net, ds, device_cache=False)
    tr.finish_epoch(tr.dispatch_epoch())
    from lstm_rnn_tpu.config import parse_config
    cfg = parse_config(["--network", net_path, "--train", "true",
                        "--train_file", ds_nc, "--autosave", "true"])
    monkeypatch.chdir(tmp_path)

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ioc, "save_network_json", boom)
    saver = cli_mod._save_autosave(cfg, net, tr, "rows")
    with pytest.raises(OSError, match="disk full"):
        cli_mod._join_saver(saver)


def test_num_devices_mesh_matches_single_device(tmp_path, rng):
    """CLI --num_devices 8 (data-parallel mesh over the 8 virtual CPU
    devices) must produce the same trained_network.jsn as --num_devices 1;
    the mesh banner must be printed."""
    nc, net_path = _toy_setup(tmp_path, rng)
    common = ["--network", net_path, "--train", "true", "--train_file", nc,
              "--stochastic", "true", "--learning_rate", "1e-3",
              "--parallel_sequences", "2", "--random_seed", "5",
              "--max_epochs", "2"]

    d1 = tmp_path / "single"
    d1.mkdir()
    r = _cli(*common, cwd=d1)
    assert r.returncode == 0, r.stdout + r.stderr

    d8 = tmp_path / "mesh8"
    d8.mkdir()
    r = _cli(*common, "--num_devices", "8", cwd=d8)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Data-parallel mesh" in r.stdout

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w8 = json.loads((d8 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w8[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_model_devices_tp_matches_single_device(tmp_path, rng):
    """--num_devices 4 --model_devices 2 (2-D DP x TP mesh: batch over
    'data', LSTM cells Megatron-sharded over 'model') must train to the
    same trained_network.jsn as a plain single-device run."""
    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4, seed=7)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification", "size": 4},
        ],
    }
    net_path = tmp_path / "net.jsn"
    net_path.write_text(json.dumps(net))
    common = ["--network", str(net_path), "--train", "true",
              "--train_file", nc, "--stochastic", "true",
              "--learning_rate", "1e-3", "--parallel_sequences", "2",
              "--random_seed", "5", "--max_epochs", "2"]

    d1 = tmp_path / "single"
    d1.mkdir()
    r = _cli(*common, cwd=d1)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "tp"
    d2.mkdir()
    r = _cli(*common, "--num_devices", "4", "--model_devices", "2", cwd=d2)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DP x TP mesh" in r.stdout

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_model_devices_must_divide_cells(tmp_path, rng):
    """An LSTM layer whose per-direction cell count does not divide
    model_devices fails with a clear error."""
    nc, net_path = _toy_setup(tmp_path, rng)  # lstm size 4 -> h=4; 3 devices
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", "--num_devices", "8",
             "--model_devices", "8", cwd=tmp_path)
    assert r.returncode == 2
    assert "must divide layer" in r.stdout


def test_rprop_rejected(tmp_path, rng):
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--optimizer", "rprop", "--max_epochs", "1", cwd=tmp_path)
    # accepted by the flag parser, then fails like the reference
    # (main.cpp:190: "Unknown optimizer type")
    assert r.returncode == 2
    assert "Unknown optimizer type" in r.stdout


def test_binary_classification_train(tmp_path, rng):
    """numLabels==2 collapses to 1 output (DataSet.cpp:493) and trains with
    the binary_classification post-output layer."""
    nc = str(tmp_path / "b.nc")
    _write_classification_nc(nc, [6, 5, 7], in_size=3, num_labels=2, seed=3)
    net = {"layers": [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "lstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "feedforward_logistic", "size": 1, "bias": 1.0},
        {"name": "postoutput", "type": "binary_classification", "size": 1},
    ]}
    (tmp_path / "net.jsn").write_text(json.dumps(net))
    r = _cli("--network", str(tmp_path / "net.jsn"), "--train", "true",
             "--train_file", nc, "--max_epochs", "2", "--stochastic", "true",
             "--learning_rate", "1e-2", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    # classification-style epoch table cell: frame-error% + objective
    assert "%" in r.stdout
    doc = json.loads((tmp_path / "trained_network.jsn").read_text())
    assert len(doc["weights"]["output"]["input"]) == 4  # 4x1


def test_regression_train_and_forward_revert_std(tmp_path, rng):
    """sse regression path end to end: standardize -> train -> forward with
    revert_std de-standardization."""
    from lstm_rnn_tpu.data.netcdf3 import strings_to_chars, write_netcdf
    from lstm_rnn_tpu.tools import nc_standardize

    n = 24
    raw = (rng.randn(n, 3) * 2 + 5).astype(np.float32)
    nc = str(tmp_path / "r.nc")
    write_netcdf(nc, {"numSeqs": 3, "numTimesteps": n, "inputPattSize": 3,
                      "targetPattSize": 3, "maxSeqTagLength": 8}, [
        ("seqTags", ["numSeqs", "maxSeqTagLength"],
         strings_to_chars(["a", "b", "c"], 8)),
        ("seqLengths", ["numSeqs"], np.asarray([8, 8, 8], np.int32)),
        ("inputs", ["numTimesteps", "inputPattSize"], raw),
        ("targetPatterns", ["numTimesteps", "targetPattSize"], raw),
    ])
    assert nc_standardize.main([nc, "-"]) == 0

    net = {"layers": [
        {"name": "input", "type": "input", "size": 3},
        {"name": "l1", "type": "lstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "feedforward_identity", "size": 3, "bias": 1.0},
        {"name": "postoutput", "type": "sse", "size": 3},
    ]}
    (tmp_path / "net.jsn").write_text(json.dumps(net))
    r = _cli("--network", str(tmp_path / "net.jsn"), "--train", "true",
             "--train_file", nc, "--max_epochs", "2", "--stochastic", "true",
             "--learning_rate", "1e-3", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr

    r = _cli("--network", str(tmp_path / "trained_network.jsn"),
             "--train", "false", "--ff_input_file", nc,
             "--ff_output_format", "single_csv", "--ff_output_file", "o.csv",
             "--revert_std", "true", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "scaled by mean and standard deviation" in r.stdout
    lines = (tmp_path / "o.csv").read_text().strip().split("\n")
    assert len(lines) == 3
    # de-standardized outputs should live on the ORIGINAL feature scale
    vals = np.array([float(v) for v in lines[0].split(";")[1:]])
    assert 0.0 < np.abs(vals.mean()) < 20.0 and vals.std() > 0.1


def test_forward_pass_csv_dir(tmp_path, rng):
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli("--network", str(tmp_path / "trained_network.jsn"),
             "--train", "false", "--ff_input_file", nc,
             "--ff_output_format", "csv", "--ff_output_file", "outdir",
             cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    files = sorted(os.listdir(tmp_path / "outdir"))
    assert files == ["seq0.csv", "seq1.csv", "seq2.csv", "seq3.csv"]
    rows = (tmp_path / "outdir/seq0.csv").read_text().strip().split("\n")
    assert len(rows) == 6  # length of seq0
    assert all(len(r.split(";")) == 4 for r in rows)

@requires_reference
def test_test1_cli_golden_vs_oracle(tmp_path):
    """The honest replacement for the reference's tests/test1/run.py: run the
    reference's own config.cfg (hybrid_online_batch, parallel_sequences 10,
    1 epoch, pinned initial weights) through the CLI and require the exported
    weight UPDATES to match the float64 oracle to float32 round-off. (The
    reference's expected_network.jsn fixture is stale/vacuous — see
    test_end_to_end.test_reference_fixture_is_vacuous.)"""
    import shutil

    from lstm_rnn_tpu.data.dataset import DataSet
    from lstm_rnn_tpu.network import Network
    from . import oracle_net

    ref = "/root/reference/tests/test1"
    nc = "/root/reference/examples/speech_recognition_chime/val_1_speaker.nc"
    shutil.copy(os.path.join(ref, "network.jsn"), tmp_path / "network.jsn")
    cfg_text = open(os.path.join(ref, "config.cfg")).read().replace(
        "../../examples/speech_recognition_chime/val_1_speaker.nc", nc)
    (tmp_path / "config.cfg").write_text(cfg_text)

    r = _cli("config.cfg", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert (tmp_path / "trained_network.jsn").exists()

    # float64 oracle over the identical fraction stream (same DataSet options
    # as cli._load_dataset: sort by length, no shuffling, no noise)
    ds = DataSet([nc], parallel_sequences=10, sort_by_length=True,
                 prefetch=False)
    net0 = Network.from_json_file(os.path.join(ref, "network.jsn"))
    params0 = {k: {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
               for k, v in net0.params.items()}
    fracs = [(f.inputs, f.targets, f.pattypes) for f in ds.fractions()]
    p_ref, _, err_ref, _ = oracle_net.train_epoch(
        net0.specs, params0, fracs, lr=1e-5, momentum=0.9, stochastic=True)

    # the CLI's epoch-table training error equals the oracle's
    err_row = [l for l in r.stdout.splitlines() if l.strip().startswith("1 |")][0]
    err_cli = float(err_row.split("|")[2].replace("%", " ").split()[-1])
    assert abs(err_cli - err_ref / ds.total_sequences) < 5e-3 * err_cli

    trained = Network.from_json_file(str(tmp_path / "trained_network.jsn"))
    for name in p_ref:
        for kk in p_ref[name]:
            upd_ref = p_ref[name][kk] - params0[name][kk]
            upd_cli = (np.asarray(trained.params[name][kk], np.float64)
                       - params0[name][kk])
            scale = np.abs(upd_ref).max() + 1e-12
            err = np.abs(upd_cli - upd_ref).max()
            assert err < 2e-3 * scale + 5e-8, (
                f"{name}.{kk}: max update err {err:.3e} vs scale {scale:.3e}")


def test_forward_mode_buckets_lengths(tmp_path, rng):
    """Forward mode always buckets fraction lengths (every distinct max
    length is otherwise a fresh XLA compile — hours on a real corpus) and
    bucketing must not change the written outputs."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr

    from lstm_rnn_tpu.config import parse_config
    from lstm_rnn_tpu.cli import _load_dataset
    cfg = parse_config(["--network", net_path, "--train", "false",
                        "--ff_input_file", nc, "--device", "cpu"])
    ds = _load_dataset(cfg, "ff")
    assert ds._buckets is not None  # bucketing forced for ff mode

    r = _cli("--network", str(tmp_path / "trained_network.jsn"),
             "--train", "false", "--ff_input_file", nc,
             "--ff_output_format", "csv", "--ff_output_file", "bucketed",
             cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    rows = (tmp_path / "bucketed/seq0.csv").read_text().strip().split("\n")
    assert len(rows) == 6  # true sequence length, not the padded bucket


def test_pipelined_early_stop_matches_serial(tmp_path, rng):
    """Pipelined epochs (default, no autosave) over-dispatch one epoch when
    early stopping triggers via max_epochs_no_best; the restored best
    weights must make the saved network identical to the serial
    (--autosave, pipeline off) run."""
    nc, net_path = _toy_setup(tmp_path, rng)
    va = str(tmp_path / "va.nc")
    _write_classification_nc(va, [5, 6, 4], in_size=3, num_labels=4, seed=42)
    # a big LR makes validation error bounce -> no-best stop fires early
    common = ["--network", net_path, "--train", "true", "--train_file", nc,
              "--val_file", va, "--stochastic", "true",
              "--learning_rate", "0.5", "--parallel_sequences", "2",
              "--random_seed", "5", "--max_epochs_no_best", "2",
              "--max_epochs", "30"]

    d1 = tmp_path / "serial"
    d1.mkdir()
    r = _cli(*common, "--autosave", "true", cwd=d1)  # pipeline disabled
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "pipelined"
    d2.mkdir()
    r2 = _cli(*common, cwd=d2)
    assert r2.returncode == 0, r2.stdout + r2.stderr
    # both stopped early for the same reason at the same epoch count
    assert "No new lowest error since 2 epochs" in r.stdout
    assert "No new lowest error since 2 epochs" in r2.stdout
    rows1 = [l.split("|")[0].strip() for l in r.stdout.splitlines()
             if l.strip() and l.strip()[0].isdigit() and "|" in l]
    rows2 = [l.split("|")[0].strip() for l in r2.stdout.splitlines()
             if l.strip() and l.strip()[0].isdigit() and "|" in l]
    assert rows1 == rows2

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-6, atol=1e-8,
                err_msg=f"{layer}.{sec}")


def test_empty_validation_set_prints_blank_columns(tmp_path, rng):
    """A 0-sequence validation .nc must behave like no validation set: the
    epoch table prints blank validation / new-best cells (main.cpp:251),
    not a stale 'inf' error, and the run reports the training error."""
    nc, net_path = _toy_setup(tmp_path, rng)
    empty_nc = str(tmp_path / "empty.nc")
    _write_classification_nc(empty_nc, [], in_size=3, num_labels=4)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--val_file", empty_nc, "--max_epochs", "2",
             "--stochastic", "true", "--learning_rate", "1e-3", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "inf" not in r.stdout
    row = [l for l in r.stdout.splitlines() if l.strip().startswith("1 |")][0]
    cells = row.split("|")
    assert cells[3].strip() == ""  # validation column blank
    assert cells[5].strip() == ""  # new-best column blank
    assert "Final training set error" in r.stdout


def test_compilation_cache_dir_flag(tmp_path, rng):
    """--compilation_cache_dir plumbs through to jax's persistent cache
    (warm repeat runs skip first-epoch compiles; 632s -> 90s measured on
    the TPU flagship) and training still works."""
    nc, net_path = _toy_setup(tmp_path, rng)
    cache = tmp_path / "xla_cache"
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", "--compilation_cache_dir", str(cache),
             cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert cache.is_dir()


def test_auto_model_devices_respects_every_layer(monkeypatch):
    """--model_devices 0 must return a shard count dividing EVERY LSTM
    layer's per-direction cells (Network.validate_tp requires it) — a wide
    layer must not force a count an unrelated narrow layer cannot shard."""
    import jax

    from lstm_rnn_tpu.cli import _auto_model_devices
    from lstm_rnn_tpu.network import Network
    from lstm_rnn_tpu.ops import lstm_cell as lc

    def net_for(sizes):
        layers = [{"name": "input", "type": "input", "size": 39}]
        for i, sz in enumerate(sizes):
            layers.append({"name": f"b{i}", "type": "blstm", "size": sz,
                           "bias": 1.0})
        layers += [{"name": "out", "type": "softmax", "size": 8,
                    "bias": 1.0},
                   {"name": "post", "type": "multiclass_classification",
                    "size": 8}]
        return Network(layers)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # fake VMEM bound: only per-shard cells <= 128 fit
    monkeypatch.setattr(lc, "fused_fits",
                        lambda hp, pp, bp, dt, ch=1: hp <= 128)

    # h=512 needs m>=4, but h=90 only admits m in {1,2} -> no valid count:
    # fall back to 1 (lax.scan) instead of a count validate_tp rejects
    n = net_for([1024, 180])
    m = _auto_model_devices(n, 8, 12)
    assert m == 1

    # h=512 needs 4, h=256 admits it -> 4, and it divides both
    n = net_for([1024, 512])
    m = _auto_model_devices(n, 8, 8)
    assert m == 4
    for h in (512, 256):
        assert h % m == 0


def test_pipeline_devices_matches_single_device(tmp_path, rng):
    """--pipeline_devices 2 (GPipe-style stages over a 'pipe' mesh,
    parallel/pipeline.py) must train to the same trained_network.jsn as a
    plain single-device run."""
    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4,
                             seed=9)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
            {"name": "ff", "type": "feedforward_tanh", "size": 5,
             "bias": 0.5},
            {"name": "l2", "type": "lstm", "size": 3, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification",
             "size": 4},
        ],
    }
    net_path = tmp_path / "net.jsn"
    net_path.write_text(json.dumps(net))
    common = ["--network", str(net_path), "--train", "true",
              "--train_file", nc, "--stochastic", "true",
              "--learning_rate", "1e-3", "--parallel_sequences", "2",
              "--random_seed", "5", "--max_epochs", "2"]

    d1 = tmp_path / "single"
    d1.mkdir()
    r = _cli(*common, cwd=d1)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "pp"
    d2.mkdir()
    r = _cli(*common, "--pipeline_devices", "2", cwd=d2)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Pipeline mesh" in r.stdout

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_dp_x_pp_cli_matches_single_device(tmp_path, rng):
    """--num_devices 4 --pipeline_devices 2 (2-D data x pipe mesh) trains
    to the same trained_network.jsn as a single-device run."""
    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4,
                             seed=13)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
            {"name": "l2", "type": "lstm", "size": 3, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification",
             "size": 4},
        ],
    }
    net_path = tmp_path / "net.jsn"
    net_path.write_text(json.dumps(net))
    common = ["--network", str(net_path), "--train", "true",
              "--train_file", nc, "--stochastic", "true",
              "--learning_rate", "1e-3", "--parallel_sequences", "4",
              "--random_seed", "5", "--max_epochs", "2"]

    d1 = tmp_path / "single"
    d1.mkdir()
    r = _cli(*common, cwd=d1)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "dpp"
    d2.mkdir()
    r = _cli(*common, "--num_devices", "4", "--pipeline_devices", "2",
             cwd=d2)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DP x PP mesh" in r.stdout

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_forward_mode_pipeline_devices_matches(tmp_path, rng):
    """--train false --pipeline_devices 2 (pipelined serving) writes the
    same posteriors as the single-device forward pass."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    fwd = ["--network", str(tmp_path / "trained_network.jsn"),
           "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv"]
    r = _cli(*fwd, "--ff_output_file", "single.csv", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli(*fwd, "--ff_output_file", "pp.csv",
             "--pipeline_devices", "2", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Pipeline mesh" in r.stdout
    _assert_csv_close(tmp_path / "single.csv", tmp_path / "pp.csv")


def test_forward_mode_dp_x_pp_and_early_validation(tmp_path, rng):
    """Forward mode composes DP x PP like training (--num_devices 4
    --pipeline_devices 2 prints the 2-D mesh and matches single-device
    posteriors), and a stage count exceeding the hidden layers fails
    cleanly up front."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    fwd = ["--network", str(tmp_path / "trained_network.jsn"),
           "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv"]
    r = _cli(*fwd, "--ff_output_file", "a.csv", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli(*fwd, "--ff_output_file", "b.csv", "--num_devices", "4",
             "--pipeline_devices", "2", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DP x PP mesh" in r.stdout
    _assert_csv_close(tmp_path / "a.csv", tmp_path / "b.csv")

    # early validation: more stages than hidden layers (toy net has 2)
    r = _cli(*fwd, "--ff_output_file", "c.csv",
             "--pipeline_devices", "5", cwd=tmp_path)
    assert r.returncode == 2
    assert "exceeds" in r.stdout + r.stderr
    assert "Computing outputs" not in r.stdout  # failed before any fraction


def test_dp_x_sp_cli_matches_single_device(tmp_path, rng):
    """--num_devices 4 --seq_devices 2 (2-D data x seq mesh,
    parallel/sequence.py) trains to the same trained_network.jsn as a
    single-device run."""
    nc = str(tmp_path / "train.nc")
    _write_classification_nc(nc, [6, 5, 4, 7], in_size=3, num_labels=4,
                             seed=17)
    net = {
        "layers": [
            {"name": "input", "type": "input", "size": 3},
            {"name": "l1", "type": "blstm", "size": 4, "bias": 1.0},
            {"name": "l2", "type": "lstm", "size": 3, "bias": 1.0},
            {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
            {"name": "postoutput", "type": "multiclass_classification",
             "size": 4},
        ],
    }
    net_path = tmp_path / "net.jsn"
    net_path.write_text(json.dumps(net))
    common = ["--network", str(net_path), "--train", "true",
              "--train_file", nc, "--stochastic", "true",
              "--learning_rate", "1e-3", "--parallel_sequences", "4",
              "--random_seed", "5", "--max_epochs", "2"]

    d1 = tmp_path / "single"
    d1.mkdir()
    r = _cli(*common, cwd=d1)
    assert r.returncode == 0, r.stdout + r.stderr

    d2 = tmp_path / "dsp"
    d2.mkdir()
    r = _cli(*common, "--num_devices", "4", "--seq_devices", "2", cwd=d2)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "DP x SP mesh" in r.stdout

    w1 = json.loads((d1 / "trained_network.jsn").read_text())["weights"]
    w2 = json.loads((d2 / "trained_network.jsn").read_text())["weights"]
    for layer in w1:
        for sec in w1[layer]:
            np.testing.assert_allclose(
                w1[layer][sec], w2[layer][sec], rtol=1e-5, atol=1e-7,
                err_msg=f"{layer}.{sec}")


def test_forward_mode_seq_devices_matches(tmp_path, rng):
    """--train false --seq_devices 2 (time-sharded serving) writes the
    same posteriors as the single-device forward pass, and combining it
    with --pipeline_devices fails cleanly."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    fwd = ["--network", str(tmp_path / "trained_network.jsn"),
           "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv"]
    r = _cli(*fwd, "--ff_output_file", "single.csv", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli(*fwd, "--ff_output_file", "sp.csv",
             "--seq_devices", "2", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Sequence-parallel mesh" in r.stdout
    _assert_csv_close(tmp_path / "single.csv", tmp_path / "sp.csv")

    r = _cli(*fwd, "--ff_output_file", "x.csv", "--seq_devices", "2",
             "--pipeline_devices", "2", cwd=tmp_path)
    assert r.returncode != 0
    assert "does not combine" in r.stdout + r.stderr


def test_forward_mode_stream_chunk_matches(tmp_path, rng):
    """--train false --stream_chunk 3 (chunked serving with carried LSTM
    state) writes the same posteriors as the whole-sequence forward, and
    a bidirectional net fails cleanly up front."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    fwd = ["--network", str(tmp_path / "trained_network.jsn"),
           "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv"]
    r = _cli(*fwd, "--ff_output_file", "whole.csv", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli(*fwd, "--ff_output_file", "stream.csv",
             "--stream_chunk", "3", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Streaming forward" in r.stdout
    _assert_csv_close(tmp_path / "whole.csv", tmp_path / "stream.csv")

    # a batch of fractions with an UNEVEN trailing one (4 sequences at
    # --parallel_sequences 3): streaming pads every fraction to ONE batch
    # width (round-5 fix — a smaller trailing fraction must neither
    # dispatch the masked kernel at an unprobed bp nor change outputs)
    r = _cli(*fwd, "--ff_output_file", "stream_uneven.csv",
             "--stream_chunk", "3", "--parallel_sequences", "3",
             cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    _assert_csv_close(tmp_path / "whole.csv", tmp_path / "stream_uneven.csv")

    # bidirectional nets cannot stream — rejected before any fraction
    bnet = {"layers": [
        {"name": "input", "type": "input", "size": 3},
        {"name": "b1", "type": "blstm", "size": 4, "bias": 1.0},
        {"name": "output", "type": "softmax", "size": 4, "bias": 1.0},
        {"name": "postoutput", "type": "multiclass_classification",
         "size": 4}]}
    bpath = tmp_path / "bnet.jsn"
    bpath.write_text(json.dumps(bnet))
    r = _cli("--network", str(bpath), "--train", "false",
             "--ff_input_file", nc, "--ff_output_format", "single_csv",
             "--ff_output_file", "x.csv", "--stream_chunk", "3",
             cwd=tmp_path)
    assert r.returncode != 0
    assert "bidirectional" in r.stdout + r.stderr
    assert "Computing outputs" not in r.stdout

    # --stream_chunk does not combine with pipeline/seq serving; the
    # guard must fire (not silently take the pipeline branch)
    for combo in (["--pipeline_devices", "2"], ["--seq_devices", "2"]):
        r = _cli(*fwd, "--ff_output_file", "x.csv", "--stream_chunk", "3",
                 *combo, cwd=tmp_path)
        assert r.returncode != 0
        assert "stream_chunk does not combine" in r.stdout + r.stderr

    # --lstm_backend pallas streams through the carry-capable fused
    # kernel (interpret mode off-TPU) — same posteriors as the scan
    # serving path to float rounding
    r = _cli(*fwd, "--ff_output_file", "stream_k.csv", "--stream_chunk",
             "3", "--lstm_backend", "pallas", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    _assert_csv_close(tmp_path / "whole.csv", tmp_path / "stream_k.csv",
                      atol=1e-5)


def test_forward_mode_num_devices_matches(tmp_path, rng):
    """--train false --num_devices 2 (data-parallel serving, the plain
    forward path with no pipeline/seq axis) writes the same posteriors as
    the single-device forward; parallel_sequences=3 exercises the NONE
    batch padding up to the mesh size."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    fwd = ["--network", str(tmp_path / "trained_network.jsn"),
           "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv", "--parallel_sequences", "3"]
    r = _cli(*fwd, "--ff_output_file", "single.csv", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli(*fwd, "--ff_output_file", "dp.csv",
             "--num_devices", "2", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Data-parallel serving mesh" in r.stdout
    _assert_csv_close(tmp_path / "single.csv", tmp_path / "dp.csv",
                      rtol=1e-5)


def test_forward_mode_stream_chunk_num_devices_matches(tmp_path, rng):
    """--stream_chunk composes with --num_devices: the batch of concurrent
    streams shards over the 'data' mesh with the carried (h, c) states
    sharded on the same axis — posteriors equal the single-device
    streamed forward (parallel_sequences=3 exercises the batch padding)."""
    nc, net_path = _toy_setup(tmp_path, rng)
    r = _cli("--network", net_path, "--train", "true", "--train_file", nc,
             "--max_epochs", "1", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    fwd = ["--network", str(tmp_path / "trained_network.jsn"),
           "--train", "false", "--ff_input_file", nc,
           "--ff_output_format", "single_csv", "--parallel_sequences", "3",
           "--stream_chunk", "3"]
    r = _cli(*fwd, "--ff_output_file", "s1.csv", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    r = _cli(*fwd, "--ff_output_file", "s2.csv",
             "--num_devices", "2", cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Data-parallel streaming mesh" in r.stdout
    _assert_csv_close(tmp_path / "s1.csv", tmp_path / "s2.csv",
                      rtol=1e-5)


def test_serving_devices_multihost_spans_global(monkeypatch, capsys):
    """Multi-host forward passes follow train_mode's rule: every process
    participates, so the serving mesh spans ALL global devices and a
    shrinking --num_devices is ignored (with a notice). Single-host
    resolution honors the flag, validated against availability."""
    import jax

    from lstm_rnn_tpu import cli
    from lstm_rnn_tpu.config import parse_config

    n_avail = len(jax.devices())
    cfg = parse_config(["--network", "x.jsn", "--train", "false",
                        "--ff_input_file", "x.nc", "--num_devices", "4"])
    assert cli._serving_devices(cfg) == 4  # single-host: flag honored

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert cli._serving_devices(cfg) == n_avail
    assert "--num_devices ignored" in capsys.readouterr().out

    cfg0 = parse_config(["--network", "x.jsn", "--train", "false",
                         "--ff_input_file", "x.nc", "--num_devices", "0"])
    assert cli._serving_devices(cfg0) == n_avail
    assert "--num_devices ignored" not in capsys.readouterr().out

    monkeypatch.setattr(jax, "process_count", lambda: 1)
    toomany = parse_config(["--network", "x.jsn", "--train", "false",
                            "--ff_input_file", "x.nc",
                            "--num_devices", "999"])
    with pytest.raises(RuntimeError, match="only .* devices available"):
        cli._serving_devices(toomany)


def test_forward_mode_multihost_rejects_nonplain_serving(monkeypatch,
                                                         tmp_path, rng):
    """Only plain DP serving is multi-host capable: pipeline/seq/streaming
    forward passes must fail loudly up front on a multi-process job."""
    import jax

    from lstm_rnn_tpu import cli
    from lstm_rnn_tpu.config import parse_config

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    for combo in (["--pipeline_devices", "2"], ["--seq_devices", "2"],
                  ["--stream_chunk", "3"]):
        cfg = parse_config(["--network", "x.jsn", "--train", "false",
                            "--ff_input_file", "x.nc", *combo])
        with pytest.raises(RuntimeError, match="single-host"):
            cli.forward_mode(cfg)
