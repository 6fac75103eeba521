"""Network container: JSON topology -> jit-compilable functional model.

Mirrors `currennt_lib/src/NeuralNetwork.cpp`: builds the layer list from the
JSON "layers" array, validates the topology (input first, exactly one
post-output last, >= 3 layers, unique names, NeuralNetwork.cpp:96-125), and
loads/initializes weights. Unlike the reference's stateful Layer objects, the
network here is a pure function of (params, batch) — the TPU-native design:
everything under one `jax.jit`, parameters as a pytree, batch as padded
[T, B, ...] arrays plus a patTypes mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lstm_rnn_tpu import io_currennt as ioc
from lstm_rnn_tpu.models import losses as losses_mod
from lstm_rnn_tpu.models.feedforward import feedforward_forward, softmax_forward
from lstm_rnn_tpu.models.lstm import lstm_forward, lstm_forward_streaming


@dataclasses.dataclass
class LayerSpec:
    name: str
    type: str
    size: int
    bias: float = 0.0
    learning_rate: float = -1.0  # per-layer override; -1 = use global

    def to_json(self) -> Dict[str, Any]:
        # Matches Layer::exportLayer + TrainableLayer::exportLayer
        # (Layer.cpp:144-157, TrainableLayer.cu:251-255): only name/type/size,
        # plus bias on trainable layers. learningRate is NOT exported (the
        # reference drops it too). Post-output types are exported under the
        # layer's canonical type() string ("weightedsse", "wf").
        canonical = {"weighted_sse": "weightedsse", "sse_mask": "wf"}.get(self.type, self.type)
        d: Dict[str, Any] = {"name": self.name, "type": canonical, "size": self.size}
        if self.type != "input" and self.type not in ioc.POSTOUTPUT_TYPES:
            d["bias"] = self.bias
        return d


class Network:
    """Functional network with CURRENNT JSON interop."""

    def __init__(self, layers_json: List[Dict[str, Any]],
                 weights_json: Optional[Dict[str, Any]] = None,
                 input_size_override: Optional[int] = None,
                 clip_gradients: bool = True, backend: str = "auto",
                 compute_dtype: str = "float32"):
        specs: List[LayerSpec] = []
        for lc in layers_json:
            if "type" not in lc:
                raise ValueError("Missing value 'type' in layer description")
            ltype = lc["type"]
            size = int(lc["size"])
            if ltype == "input" and input_size_override and input_size_override > 0:
                size = input_size_override
            known = (
                ltype == "input"
                or ltype == "softmax"
                or ltype in ioc.FEEDFORWARD_TYPES
                or ltype in ioc.LSTM_TYPES
                or ltype in ioc.POSTOUTPUT_TYPES
            )
            if not known:
                raise ValueError(f"Unknown layer type '{ltype}'")
            trainable = ltype not in ioc.POSTOUTPUT_TYPES and ltype != "input"
            if trainable and "bias" not in lc:
                raise ValueError(f"Missing value 'bias' in layer '{lc.get('name')}'")
            if ltype == "blstm" and size % 2 != 0:
                raise ValueError("Cannot create a bidirectional layer with an odd layer size")
            specs.append(LayerSpec(
                name=lc["name"], type=ltype, size=size,
                bias=float(lc.get("bias", 0.0)),
                learning_rate=float(lc.get("learningRate", -1.0)),
            ))

        # topology validation (NeuralNetwork.cpp:96-125)
        if len(specs) < 3:
            raise ValueError("Not enough layers defined")
        if specs[0].type != "input":
            raise ValueError("The first layer is not an input layer")
        if any(s.type == "input" for s in specs[1:]):
            raise ValueError("Multiple input layers defined")
        if specs[-1].type not in ioc.POSTOUTPUT_TYPES:
            raise ValueError("The last layer is not a post output layer")
        if any(s.type in ioc.POSTOUTPUT_TYPES for s in specs[:-1]):
            raise ValueError("Multiple post output layers defined")
        names = [s.name for s in specs]
        if len(set(names)) != len(names):
            raise ValueError("Different layers have the same name")

        # post-output size check (PostOutputLayer.cpp:50-79): must match the
        # preceding (output) layer size, x2 for the interleaved-target losses.
        po, ol = specs[-1], specs[-2]
        mult = 2 if po.type in ("weighted_sse", "weightedsse", "sse_mask", "wf") else 1
        if po.type == "binary_classification" and po.size != 1:
            raise ValueError("The binary classification post output layer "
                             "cannot be used for an output layer size != 1")
        if po.type == "multiclass_classification" and po.size == 1:
            raise ValueError("The multiclass classification post output layer "
                             "cannot be used for an output layer size of 1")
        # post-output size must equal the output layer size (x2 for the
        # interleaved-target losses) — PostOutputLayer.cpp:48-58
        if po.size != ol.size * mult:
            raise ValueError(f"Size mismatch: {po.size} vs. {ol.size * mult}")

        self.specs = specs
        self.clip_gradients = clip_gradients
        self.backend = backend  # LSTM scan backend: auto|scan|pallas
        self.compute_dtype = jnp.dtype(compute_dtype)  # matmul input dtype
        # 2-D DP x TP mesh (parallel/mesh.make_mesh_2d): when set with a
        # "model" axis > 1, apply() routes LSTM layers through the
        # tensor-parallel cell (parallel/tensor.py) — cells sharded across
        # chips, batch over "data". Set by the CLI for --model_devices.
        self.mesh = None
        # gradient checkpointing over K time blocks for the scan-backend
        # LSTM (models/lstm._lstm_scan): backward activation memory ~ T/K.
        # Set by the CLI for --remat_blocks; 0 = off.
        self.remat_blocks = 0
        self.loss_fn, self.task_kind = losses_mod.LOSSES[specs[-1].type]
        self.is_classification = self.task_kind == "classification"

        # parameters: from JSON weights section or random init
        self.params: Dict[str, Any] = {}
        if weights_json:
            layers_dicts = [s.to_json() for s in specs]
            self.params = ioc.params_from_weights_section(layers_dicts, weights_json)
        # layers without stored weights get random init on demand (init_params)

    # ------------------------------------------------------------------ sizes
    @property
    def input_size(self) -> int:
        return self.specs[0].size

    @property
    def output_size(self) -> int:
        return self.specs[-2].size

    @property
    def target_size(self) -> int:
        """Size of the target vectors the post-output layer consumes."""
        return self.specs[-1].size

    def trainable_specs(self) -> List[LayerSpec]:
        return [s for s in self.specs[1:-1]]

    # ------------------------------------------------------------------- init
    def init_params(self, seed: int, dist: str = "uniform",
                    uniform_min: float = -0.1, uniform_max: float = 0.1,
                    normal_mean: float = 0.0, normal_sigma: float = 0.1,
                    init_rng: str = "numpy") -> None:
        """Randomly initialize any layer missing from the weights section
        (TrainableLayer.cu:103-125 semantics).

        init_rng "numpy" (default) matches the reference's distributions
        with an independent stream; "currennt" REPLAYS the reference's
        boost::mt19937 stream exactly — one engine seeded once, each
        layer's weights drawn sequentially in the flat
        [input|bias|internal] storage order — so same-seed runs produce
        byte-identical initial networks (utils/rng_compat.py)."""
        if init_rng == "currennt":
            from lstm_rnn_tpu.utils.rng_compat import (CurrenntInitStream,
                                                       currennt_init_flat)
            if dist != "uniform" and any(
                    s.name not in self.params for s in self.specs[1:-1]):
                # validate up front, but ONLY when some layer actually
                # needs a random draw: a fully-weighted network (resume /
                # --continue / autosave restart) never touches the normal
                # stream, and the reference accepts that combination —
                # see currennt_init_flat for why boost's normal stream
                # cannot be replayed
                currennt_init_flat(None, 0, dist, 0.0, 0.0)
            stream = CurrenntInitStream(seed)
            prev = self.specs[0].size
            for s in self.specs[1:-1]:
                need = s.name not in self.params
                if s.type in ioc.LSTM_TYPES:
                    bidir = ioc.LSTM_TYPES[s.type]
                    els = s.size // (2 if bidir else 1)
                    # size*(inputWeightsPerBlock*(prev+1) + internalPerBlock)
                    # with 4 input weights and 4*els+3 internal weights per
                    # block (TrainableLayer.cu:104, LstmLayer.hpp:36-55)
                    n = s.size * (4 * (prev + 1) + 4 * els + 3)
                    if need:
                        flat = currennt_init_flat(stream, n, dist,
                                                  uniform_min, uniform_max)
                        n_in = 4 * s.size * prev
                        n_b = 4 * s.size
                        self.params[s.name] = ioc.lstm_from_flat(
                            flat[:n_in], flat[n_in:n_in + n_b],
                            flat[n_in + n_b:], prev, s.size, bidir)
                else:
                    n = s.size * (prev + 1)
                    if need:
                        flat = currennt_init_flat(stream, n, dist,
                                                  uniform_min, uniform_max)
                        self.params[s.name] = ioc.ff_from_flat(
                            flat[:s.size * prev], flat[s.size * prev:],
                            prev, s.size)
                prev = s.size
            return

        rng = np.random.RandomState(seed & 0x7FFFFFFF)

        def draw(shape):
            if dist == "uniform":
                return rng.uniform(uniform_min, uniform_max, size=shape).astype(np.float32)
            return rng.normal(normal_mean, normal_sigma, size=shape).astype(np.float32)

        prev = self.specs[0].size
        for s in self.specs[1:-1]:
            if s.name not in self.params:
                if s.type in ioc.LSTM_TYPES:
                    d = 2 if ioc.LSTM_TYPES[s.type] else 1
                    h = s.size // d
                    self.params[s.name] = {
                        "W_in": draw((d, prev, 4, h)),
                        "W_rec": draw((d, h, 4, h)),
                        "b": draw((d, 4, h)),
                        "peep": draw((d, 3, h)),
                    }
                else:
                    self.params[s.name] = {"W": draw((prev, s.size)), "b": draw((s.size,))}
            prev = s.size

    # ---------------------------------------------------------------- forward
    def apply(self, params, inputs, pattypes):
        """Forward pass to the output layer's activations.

        inputs: [T, B, input_size]; pattypes: [T, B] int8.
        Returns [T, B, output_size].
        """
        return self.apply_layer_range(params, inputs, pattypes, 0,
                                      len(self.specs) - 2)

    def apply_layer_range(self, params, x, pattypes, lo: int, hi: int):
        """Apply hidden layers [lo, hi) (0-indexed into specs[1:-1]) — the
        building block for pipeline-parallel stage execution
        (parallel/pipeline.py) and the full apply()."""
        for s in self.specs[1 + lo:1 + hi]:
            p = params[s.name]
            if s.type in ioc.LSTM_TYPES:
                if self._tp_axis_size() > 1:
                    from lstm_rnn_tpu.parallel.tensor import lstm_forward_tp
                    batch_axis = ("data" if "data" in self.mesh.axis_names
                                  else None)
                    x = lstm_forward_tp(
                        p, x, pattypes, s.bias, ioc.LSTM_TYPES[s.type],
                        self.mesh, clip_gradients=self.clip_gradients,
                        batch_axis=batch_axis)
                else:
                    x = lstm_forward(p, x, pattypes, s.bias,
                                     ioc.LSTM_TYPES[s.type],
                                     clip_gradients=self.clip_gradients,
                                     backend=self.backend,
                                     compute_dtype=self.compute_dtype,
                                     need_dx=s is not self.specs[1],
                                     remat_blocks=self.remat_blocks)
            elif s.type == "softmax":
                x = softmax_forward(p, x, s.bias, self.compute_dtype)
            else:
                x = feedforward_forward(p, x, ioc.FEEDFORWARD_TYPES[s.type],
                                        s.bias, self.compute_dtype)
        return x

    def _tp_axis_size(self) -> int:
        if self.mesh is None or "model" not in self.mesh.axis_names:
            return 1
        return int(self.mesh.shape["model"])

    def validate_tp(self) -> None:
        """Every LSTM layer's per-direction cell count must divide the
        model axis (parallel/tensor.py shards the cell axis evenly)."""
        n = self._tp_axis_size()
        if n <= 1:
            return
        for s in self.specs[1:-1]:
            if s.type in ioc.LSTM_TYPES:
                d = 2 if ioc.LSTM_TYPES[s.type] else 1
                if (s.size // d) % n:
                    raise ValueError(
                        f"model_devices={n} must divide layer '{s.name}' "
                        f"cells per direction ({s.size // d})")

    def loss(self, params, inputs, targets, pattypes):
        """Total error over the fraction (reference calculateError sum)."""
        y = self.apply(params, inputs, pattypes)
        return self.loss_fn(y, targets, pattypes)

    # ------------------------------------------------- streaming inference
    #
    # Online serving for UNIDIRECTIONAL stacks (no reference analogue —
    # CURRENNT's forward pass consumes whole sequences): feed the input in
    # time chunks, carrying each LSTM layer's (h, c) across calls. Chained
    # chunks produce exactly apply() on the concatenation (tested).
    # Bidirectional layers cannot stream (the backward half needs the
    # future) and are rejected up front.

    def init_stream_state(self, batch: int):
        """Zero (h, c) per LSTM layer for apply_streaming."""
        state = {}
        for s in self.specs[1:-1]:
            if s.type in ioc.LSTM_TYPES:
                if ioc.LSTM_TYPES[s.type]:
                    raise ValueError(
                        f"layer '{s.name}' is bidirectional — blstm nets "
                        "cannot stream (the backward half consumes the "
                        "future); use the whole-sequence forward mode")
                # carry dtype must match what _lstm_scan's step emits:
                # f32-accumulated acts promoted by the raw bias dtype
                # (f64 under jax_enable_x64 — hardcoding f32 here would
                # die with a scan carry dtype mismatch on chunk 1)
                dt = jnp.result_type(jnp.float32, self.params[s.name]["b"])
                z = jnp.zeros((1, batch, s.size), dt)
                state[s.name] = (z, z)
        return state

    def apply_streaming(self, params, x, pattypes, state):
        """One chunk's forward pass: x [Tc, B, input_size], pattypes
        [Tc, B], state from init_stream_state / the previous chunk.
        Returns (y [Tc, B, output_size], new_state)."""
        new_state = {}
        for s in self.specs[1:-1]:
            p = params[s.name]
            if s.type in ioc.LSTM_TYPES:
                x, new_state[s.name] = lstm_forward_streaming(
                    p, x, pattypes, s.bias, state[s.name],
                    clip_gradients=self.clip_gradients,
                    compute_dtype=self.compute_dtype,
                    backend=self.backend)
            elif s.type == "softmax":
                x = softmax_forward(p, x, s.bias, self.compute_dtype)
            else:
                x = feedforward_forward(p, x, ioc.FEEDFORWARD_TYPES[s.type],
                                        s.bias, self.compute_dtype)
        return x, new_state

    def correct_count(self, y, targets, pattypes):
        if self.specs[-1].type == "binary_classification":
            return losses_mod.binary_correct_count(y, targets, pattypes)
        if self.specs[-1].type == "multiclass_classification":
            return losses_mod.multiclass_correct_count(y, targets, pattypes)
        return jnp.zeros((), dtype=jnp.int32)

    # ------------------------------------------------- padded training view
    #
    # TPU kernels want H % 128 == 0. Rather than padding weights inside
    # every training step (profiling showed the per-step pads/slices/copies
    # costing ~3ms on the flagship), the TRAINING STATE itself is held in a
    # zero-padded layout: LSTM cells padded to Hp = roundup(H, 128), the next
    # layer's weight rows zero-filled at the pad positions, feedforward/
    # softmax output widths exact. Padded entries have exactly zero weights,
    # receive exactly zero gradients, and therefore stay zero through
    # momentum SGD — training on the padded view is numerically identical.

    def _pad_plan(self):
        """Per trainable layer: (kind, prev_real_idx, prev_pad_width, hp).

        For LSTM layers prev_pad_width is additionally rounded up to a 128
        multiple: the fused kernel computes the input projection in-kernel
        and needs 128-aligned W_in rows (zero rows are numerically inert;
        apply_padded pads the activations to match)."""
        from lstm_rnn_tpu.ops.lstm_cell import round_up
        plan = []
        prev_idx = np.arange(self.specs[0].size)  # input layer: exact
        prev_width = self.specs[0].size
        for s in self.specs[1:-1]:
            if s.type in ioc.LSTM_TYPES:
                d = 2 if ioc.LSTM_TYPES[s.type] else 1
                h = s.size // d
                hp = round_up(h, 128)
                plan.append(("lstm", prev_idx, round_up(prev_width, 128), hp))
                prev_idx = np.concatenate([np.arange(h) + i * hp
                                           for i in range(d)])
                prev_width = d * hp
            else:
                plan.append(("ff", prev_idx, prev_width, None))
                prev_idx = np.arange(s.size)
                prev_width = s.size
        return plan

    def pad_params(self, params):
        """Exact params -> padded training view (numpy or jax arrays).

        LSTM W_in/b are stored with the gate axis FLATTENED ([D, P, 4*Hp] /
        [D, 4*Hp]) so the projection einsum produces the kernel's layout
        directly (profiling showed the 5D->4D reshape materializing)."""
        plan = self._pad_plan()
        out = {}
        for s, (kind, prev_idx, prev_w, hp) in zip(self.specs[1:-1], plan):
            p = params[s.name]
            if kind == "lstm":
                d, P, _, h = p["W_in"].shape
                w_in = jnp.zeros((d, prev_w, 4, hp), jnp.float32)
                w_in = w_in.at[:, prev_idx, :, :h].set(p["W_in"])
                w_rec = jnp.zeros((d, hp, 4, hp), jnp.float32)
                w_rec = w_rec.at[:, :h, :, :h].set(p["W_rec"])
                b = jnp.zeros((d, 4, hp), jnp.float32).at[:, :, :h].set(p["b"])
                peep = jnp.zeros((d, 3, hp), jnp.float32).at[:, :, :h].set(p["peep"])
                out[s.name] = {"W_in": w_in.reshape(d, prev_w, 4 * hp),
                               "W_rec": w_rec, "b": b.reshape(d, 4 * hp),
                               "peep": peep}
            else:
                W = jnp.zeros((prev_w, s.size), jnp.float32)
                W = W.at[prev_idx, :].set(p["W"])
                out[s.name] = {"W": W, "b": jnp.asarray(p["b"])}
        return out

    def unpad_params(self, padded):
        """Padded training view -> exact params."""
        plan = self._pad_plan()
        out = {}
        for s, (kind, prev_idx, prev_w, hp) in zip(self.specs[1:-1], plan):
            p = padded[s.name]
            if kind == "lstm":
                d = 2 if ioc.LSTM_TYPES[s.type] else 1
                h = s.size // d
                w_in = jnp.reshape(p["W_in"], (d, prev_w, 4, hp))
                b = jnp.reshape(p["b"], (d, 4, hp))
                out[s.name] = {
                    "W_in": w_in[:, prev_idx, :, :h],
                    "W_rec": p["W_rec"][:, :h, :, :h],
                    "b": b[:, :, :h],
                    "peep": p["peep"][:, :, :h],
                }
            else:
                out[s.name] = {"W": p["W"][prev_idx, :], "b": p["b"]}
        return out

    def pad_mask(self):
        """Pytree of 1.0 at real parameter positions, 0.0 at padding (for
        masking weight noise so padded entries stay exactly zero)."""
        ones = jax.tree_util.tree_map(np.ones_like, self.params)
        return self.pad_params(ones)

    def apply_padded(self, padded_params, inputs, pattypes):
        """Forward pass over the padded training view. `inputs` must carry
        the input layer's exact width; inter-layer activations stay padded.
        The final (output-layer) activations are exact because the output
        layer is feedforward/softmax in every reference topology; an LSTM
        output layer gets sliced."""
        x = self.apply_padded_layer_range(padded_params, inputs, pattypes,
                                          0, len(self.specs) - 2)
        return self.slice_padded_output(x)

    def apply_padded_layer_range(self, padded_params, x, pattypes,
                                 lo: int, hi: int):
        """Padded-view twin of apply_layer_range: hidden layers [lo, hi)
        over the padded parameters, activations staying padded between
        layers (pipeline stages pass them as-is)."""
        for s, (kind, prev_idx, prev_w, hp) in zip(
                self.specs[1 + lo:1 + hi], self._pad_plan()[lo:hi]):
            p = padded_params[s.name]
            if kind == "lstm":
                x = lstm_forward(p, x, pattypes, s.bias, ioc.LSTM_TYPES[s.type],
                                 clip_gradients=self.clip_gradients,
                                 backend=self.backend,
                                 compute_dtype=self.compute_dtype,
                                 pre_padded=True,
                                 need_dx=s is not self.specs[1])
            elif s.type == "softmax":
                x = softmax_forward(p, x, s.bias, self.compute_dtype)
            else:
                x = feedforward_forward(p, x, ioc.FEEDFORWARD_TYPES[s.type],
                                        s.bias, self.compute_dtype)
        return x

    def slice_padded_output(self, x):
        """Exact output activations from the padded view's last hidden
        layer (an LSTM output layer emits [fw_pad | bw_pad])."""
        if self.specs[-2].type in ioc.LSTM_TYPES:
            d = 2 if ioc.LSTM_TYPES[self.specs[-2].type] else 1
            h = self.specs[-2].size // d
            hp = self._pad_plan()[-1][3]
            idx = np.concatenate([np.arange(h) + i * hp for i in range(d)])
            x = x[..., idx]
        return x

    def loss_padded(self, padded_params, inputs, targets, pattypes):
        y = self.apply_padded(padded_params, inputs, pattypes)
        return self.loss_fn(y, targets, pattypes)

    # --------------------------------------------- fused classification tail
    def supports_fused_tail(self) -> bool:
        """True when the net ends softmax -> multiclass_classification, the
        shape every ASR recipe uses — the whole tail (CURRENNT softmax,
        -log p[target] loss, argmax counter, Jacobian backward) then runs
        as one Pallas kernel pair (ops/softmax_ce.py) instead of several
        XLA passes over the [T,B,S] probability tensor."""
        return (self.specs[-2].type == "softmax"
                and self.specs[-1].type == "multiclass_classification")

    def logits_for_fused_tail(self, params, inputs, pattypes,
                              padded: bool = False):
        """Forward pass up to the final softmax layer's PRE-normalization
        activations (its feedforward-identity part). Requires
        supports_fused_tail()."""
        x = self._fused_tail_hidden(params, inputs, pattypes, padded)
        s = self.specs[-2]
        return feedforward_forward(params[s.name], x, "identity", s.bias,
                                   self.compute_dtype)

    def _fused_tail_hidden(self, params, inputs, pattypes, padded):
        """Hidden activations feeding the final softmax layer."""
        x = inputs
        for s in self.specs[1:-2]:
            p = params[s.name]
            if s.type in ioc.LSTM_TYPES:
                if not padded and self._tp_axis_size() > 1:
                    from lstm_rnn_tpu.parallel.tensor import lstm_forward_tp
                    batch_axis = ("data" if "data" in self.mesh.axis_names
                                  else None)
                    x = lstm_forward_tp(
                        p, x, pattypes, s.bias, ioc.LSTM_TYPES[s.type],
                        self.mesh, clip_gradients=self.clip_gradients,
                        batch_axis=batch_axis)
                else:
                    x = lstm_forward(p, x, pattypes, s.bias,
                                     ioc.LSTM_TYPES[s.type],
                                     clip_gradients=self.clip_gradients,
                                     backend=self.backend,
                                     compute_dtype=self.compute_dtype,
                                     pre_padded=padded,
                                     need_dx=s is not self.specs[1])
            elif s.type == "softmax":
                x = softmax_forward(p, x, s.bias, self.compute_dtype)
            else:
                x = feedforward_forward(p, x, ioc.FEEDFORWARD_TYPES[s.type],
                                        s.bias, self.compute_dtype)
        return x

    def loss_and_count_fused(self, params, inputs, targets, pattypes,
                             padded: bool = False,
                             interpret: bool = False):
        """(total error, correct count) through the fused softmax+CE tail —
        numerically the CURRENNT tail (same offset/safeExp/clamps), with
        the probability tensor living only in VMEM + one residual write.
        When the hidden width is lane-aligned (always true on the padded
        pipeline) the softmax layer's OWN matmul also runs in-kernel
        (softmax_ce_proj_fused): the logits never exist in HBM and dW/db
        accumulate inside the backward kernel."""
        from lstm_rnn_tpu.ops.lstm_cell import _storage, round_up
        from lstm_rnn_tpu.ops.softmax_ce import (prefer_proj_tail,
                                                 proj_tail_fits,
                                                 softmax_ce_fused,
                                                 softmax_ce_proj_fused,
                                                 softmax_ce_wide_fused,
                                                 wide_plan)
        s = self.specs[-2]
        s_dim = s.size
        sp = round_up(s_dim, 128)
        x = self._fused_tail_hidden(params, inputs, pattypes, padded)
        t, b, p_dim = x.shape
        tc2 = targets.astype(jnp.int32).reshape(t * b, 1)
        # wide softmax layers (LVCSR-scale state counts) exceed the proj
        # kernels' scoped-VMEM budget ([P, Sp] W + dW accumulator blocks) —
        # those route to the WIDE variant (Sp-column-blocked backward, tiny
        # per-row residuals, ops/softmax_ce.py) instead of the materialized
        # logits + plain-tail fallback, which paid three extra [N, Sp] HBM
        # streams per step
        if p_dim % 128 == 0:
            w = params[s.name]["W"]
            bb = params[s.name]["b"]
            if (proj_tail_fits(t * b, p_dim, sp, self.compute_dtype)
                    and prefer_proj_tail(t * b, p_dim, sp, s_dim,
                                         self.compute_dtype)):
                w_pad = jnp.pad(w, ((0, 0), (0, sp - s_dim)))
                b_pad = jnp.pad(bb, (0, sp - s_dim))
                return softmax_ce_proj_fused(
                    x.reshape(t * b, p_dim), w_pad, b_pad, tc2, s_dim,
                    float(s.bias), interpret, jnp.dtype(self.compute_dtype))
            import os
            try:
                if os.environ.get("LSTM_RNN_TPU_DISABLE_WIDE_TAIL"):
                    raise ValueError("wide tail disabled by env")
                spw, _sb, _rows = wide_plan(t * b, p_dim, s_dim,
                                            self.compute_dtype)
            except ValueError:
                spw = None
            if spw is not None:
                w_pad = jnp.pad(w, ((0, 0), (0, spw - s_dim)))
                b_pad = jnp.pad(bb, (0, spw - s_dim))
                return softmax_ce_wide_fused(
                    x.reshape(t * b, p_dim), w_pad, b_pad, tc2, s_dim,
                    float(s.bias), interpret, jnp.dtype(self.compute_dtype))
        a = feedforward_forward(params[s.name], x, "identity", s.bias,
                                self.compute_dtype)
        a2 = jnp.pad(a, ((0, 0), (0, 0), (0, sp - s_dim)))
        a2 = a2.reshape(t * b, sp)
        return softmax_ce_fused(a2, tc2, s_dim, interpret,
                                _storage(self.compute_dtype))

    def get_outputs(self, y, seq_info) -> tuple:
        """Segment padded activations back into per-sequence outputs
        (NeuralNetwork::getOutputs, NeuralNetwork.cpp:238-262).

        y: [T, B, out]; seq_info: the Fraction's per-sequence metadata.
        Returns (tags, [np.ndarray [len_i, out]]).
        """
        y = np.asarray(y)
        tags, outs = [], []
        for i, info in enumerate(seq_info):
            tags.append(info["tag"])
            outs.append(y[: info["length"], i, :])
        return tags, outs

    # ------------------------------------------------------------------- JSON
    @classmethod
    def from_json_file(cls, path: str, input_size_override: Optional[int] = None,
                       clip_gradients: bool = True) -> "Network":
        doc = ioc.load_network_json(path)
        if "layers" not in doc:
            raise ValueError("Missing section 'layers'")
        return cls(doc["layers"], doc.get("weights"),
                   input_size_override=input_size_override,
                   clip_gradients=clip_gradients)

    def layers_json(self) -> List[Dict[str, Any]]:
        return [s.to_json() for s in self.specs]

    def save(self, path: str, extra: Optional[Dict[str, Any]] = None) -> None:
        params_np = jax.tree_util.tree_map(np.asarray, self.params)
        ioc.save_network_json(path, self.layers_json(), params_np, extra=extra)
