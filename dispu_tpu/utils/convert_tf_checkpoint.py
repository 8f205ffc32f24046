"""TF1 checkpoint → dispu_tpu params converter (gated on TensorFlow).

The reference ships a pretrained TF1 checkpoint (ref:README.md:40, Google
Drive).  This converter maps its variable scopes onto the flax param tree
so the released weights can be loaded for CD-parity runs (BASELINE.md
north star).  TensorFlow is not part of this environment, so only the
checkpoint *reader* is gated on it: the name mapping (``map_tf_name``),
the layout conversion (``convert_value``), the tree assembly
(``convert_variables``) and the expected-name-set generator
(``expected_tf_names``) are all TF-free and tested with a synthetic
TF-shaped tensor round-trip (tests/test_extras.py).

The full mapping is VERIFIED against the real reference graph by
``scripts/tf_parity.py`` (tests/test_tf_parity.py): the reference
generator built under tf.compat.v1 has exactly the 70 variables this
module predicts (names and shapes), and a genuine TF1 checkpoint
converted here reproduces the reference graph's (coarse, fine) outputs
through our DisPUGenerator to max|Δ| ≈ 3e-7 (and the discriminator graph likewise, Δ ≈ 1e-7).  The only thing the
BASELINE.md north star still needs is the released artifact itself.

Scope mapping (reference graph → flax tree), established from
ref:DisPU/generator.py:45-81 and the op implementations:

  generator/generator/feature_extraction_coarse/layer0/weights
      → params/feature_extraction_coarse/layer0/dense/kernel  (squeeze HW)
  .../layer{k}/l{i}/weights            → .../layer{k}/l{i}/dense/kernel
  .../layer{k}_prep/weights            → .../layer{k}_prep/dense/kernel
  generator/generator/upshuffle_0/conv{1,2}/weights
      → params/upshuffle_0/conv{1,2}/dense/kernel
  generator/generator/coarse_coordinate_regressor/fc_layer{i}/weights
      → params/coarse_coordinate_regressor/fc_layer{i}/dense/kernel
  generator/refine/PointShuffle/{conv0,conv1,skip,after_conv,aggregation}
      → params/PointShuffle/...
  generator/refine/PointShuffle/PointShuffle/conv_kv|conv_query|conv_back_project
      → params/PointShuffle/nonlocal/...   (the NL cell re-opens a
                                            'PointShuffle' scope)
  generator/refine/PointShuffle/weight_net/wconv0/{weights,bn/*}
      → params/PointShuffle/weight_net/wconv0/{dense/kernel,bn/*}
  generator/refine/fine_coordinate_regressor/fc_layer{i}/...

Weight layout notes:
  * TF 1×1 conv2d kernels are (1, 1, Cin, Cout); conv1d sites (the
    ``*_prep`` compressions, both coordinate regressors' fc_layers, the
    refiner's skip/aggregation) store (1, Cin, Cout) — flatten the
    spatial dims → flax Dense kernel (Cin, Cout).
  * The refiner's 'after_conv' is a TF conv with kernel (1, C', S, Cout)
    consuming the (C', S) plane; flax flattens (C', S) C'-major, so the TF
    kernel reshapes to (C'*S, Cout) with the same ordering — no permute.
  * BN: gamma/beta/moving_mean/moving_variance → scale/bias/mean/var.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _tf_available() -> bool:
    try:
        import tensorflow  # noqa: F401

        return True
    except ImportError:
        return False


# (tf scope regex with groups) -> (flax path template)
_RULES = [
    (r"generator/generator/(feature_extraction_coarse)/(layer\d+(?:_prep)?)/weights",
     r"\1/\2/dense/kernel"),
    (r"generator/generator/(feature_extraction_coarse)/(layer\d+(?:_prep)?)/biases",
     r"\1/\2/dense/bias"),
    (r"generator/generator/(feature_extraction_coarse)/(layer\d+)/(l\d+)/weights",
     r"\1/\2/\3/dense/kernel"),
    (r"generator/generator/(feature_extraction_coarse)/(layer\d+)/(l\d+)/biases",
     r"\1/\2/\3/dense/bias"),
    (r"generator/generator/(upshuffle_\d+)/(conv\d)/weights", r"\1/\2/dense/kernel"),
    (r"generator/generator/(upshuffle_\d+)/(conv\d)/biases", r"\1/\2/dense/bias"),
    (r"generator/generator/(coarse_coordinate_regressor)/(fc_layer\d)/weights",
     r"\1/\2/dense/kernel"),
    (r"generator/generator/(coarse_coordinate_regressor)/(fc_layer\d)/biases",
     r"\1/\2/dense/bias"),
    # the non-local cell opens its own 'PointShuffle' scope inside the
    # refiner's (doubled path) — verified against the real reference graph
    # by scripts/tf_parity.py
    (r"generator/refine/PointShuffle/PointShuffle/(conv_kv|conv_query|conv_back_project)/weights",
     r"PointShuffle/nonlocal/\1/dense/kernel"),
    (r"generator/refine/PointShuffle/PointShuffle/(conv_kv|conv_query|conv_back_project)/biases",
     r"PointShuffle/nonlocal/\1/dense/bias"),
    (r"generator/refine/PointShuffle/(conv\d|skip|after_conv|aggregation)/weights",
     r"PointShuffle/\1/dense/kernel"),
    (r"generator/refine/PointShuffle/(conv\d|skip|after_conv|aggregation)/biases",
     r"PointShuffle/\1/dense/bias"),
    (r"generator/refine/PointShuffle/weight_net/(wconv\d)/weights",
     r"PointShuffle/weight_net/\1/dense/kernel"),
    (r"generator/refine/PointShuffle/weight_net/(wconv\d)/biases",
     r"PointShuffle/weight_net/\1/dense/bias"),
    (r"generator/refine/PointShuffle/weight_net/(wconv\d)/bn/gamma",
     r"PointShuffle/weight_net/\1/bn/scale"),
    (r"generator/refine/PointShuffle/weight_net/(wconv\d)/bn/beta",
     r"PointShuffle/weight_net/\1/bn/bias"),
    (r"generator/refine/(fine_coordinate_regressor)/(fc_layer\d)/weights",
     r"\1/\2/dense/kernel"),
    (r"generator/refine/(fine_coordinate_regressor)/(fc_layer\d)/biases",
     r"\1/\2/dense/bias"),
]

_BN_STATS = [
    (r"generator/refine/PointShuffle/weight_net/(wconv\d)/bn/moving_mean",
     r"PointShuffle/weight_net/\1/bn/mean"),
    (r"generator/refine/PointShuffle/weight_net/(wconv\d)/bn/moving_variance",
     r"PointShuffle/weight_net/\1/bn/var"),
]


def map_tf_name(tf_name: str):
    """Map one TF variable name to (collection, flax_path) or None."""
    tf_name = tf_name.split(":")[0]
    for pat, repl in _RULES:
        m = re.fullmatch(pat, tf_name)
        if m:
            return "params", m.expand(repl)
    for pat, repl in _BN_STATS:
        m = re.fullmatch(pat, tf_name)
        if m:
            return "batch_stats", m.expand(repl)
    return None


def convert_value(tf_name: str, value: np.ndarray) -> np.ndarray:
    """Reshape a TF kernel to the flax Dense layout (see module docstring)."""
    if tf_name.endswith("weights") and value.ndim >= 3:
        # (1, 1, Cin, Cout) or (K, W, Cin, Cout) → flatten leading dims
        return value.reshape(-1, value.shape[-1])
    if tf_name.endswith("weights") and value.ndim == 3:
        return value.reshape(-1, value.shape[-1])
    return value


def convert_variables(tensors: Dict[str, np.ndarray]) -> Dict[str, Dict]:
    """Convert a {tf_name: array} dict to nested {params, batch_stats} dicts.

    The TF-free core of the converter: applies the name mapping and the
    kernel-layout reshape, skips optimizer/bookkeeping slots, and raises on
    any reference variable it does not recognize.
    """
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    unmapped = []
    for name, value in tensors.items():
        mapped = map_tf_name(name)
        if mapped is None:
            if not any(s in name for s in ("Adam", "global_step", "epoch",
                                           "beta1_power", "beta2_power")):
                unmapped.append(name)
            continue
        collection, path = mapped
        value = convert_value(name, value)
        node = out[collection]
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(value, np.float32)
    if unmapped:
        raise ValueError(f"unmapped reference variables: {sorted(unmapped)}")
    return out


def expected_tf_names(variables, refine_nsample: int) -> Dict[str, tuple]:
    """The full TF variable name set (with TF shapes) for a flax tree.

    Inverts the scope mapping: walk a model's ``variables`` pytree and
    emit, for every leaf, the reference graph's variable name
    (ref:DisPU/generator.py:45-81 scopes) and the shape the TF1 checkpoint
    stores it with — 1×1 conv kernels as ``(1, 1, Cin, Cout)``, the
    refiner's after_conv as ``(1, Cin/S, S, Cout)`` (it consumes the
    (C', S) plane, ref:Common/ops.py:1064-1072), BN params/stats by their
    TF names.  Used to synthesize checkpoint-shaped tensors for the
    round-trip test and to validate real checkpoints for completeness.
    """
    import flax.traverse_util

    out: Dict[str, tuple] = {}
    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    refine_tops = ("PointShuffle", "fine_coordinate_regressor")
    for path, leaf in flat.items():
        collection, rest = path.split("/", 1)
        parts = rest.split("/")
        prefix = (
            "generator/refine/" if parts[0] in refine_tops
            else "generator/generator/"
        )
        if "nonlocal" in parts:
            # the non-local cell re-opens a 'PointShuffle' variable scope
            # inside the refiner's (verified by scripts/tf_parity.py)
            parts[parts.index("nonlocal")] = "PointShuffle"
        shape = tuple(leaf.shape)
        if parts[-2:] == ["dense", "kernel"]:
            cin, cout = shape
            layer = parts[-3]
            # conv1d sites store 3-D kernels (1, Cin, Cout); conv2d sites
            # 4-D (1, 1, Cin, Cout) — verified against the real graph
            is_conv1d = (
                layer.endswith("_prep")
                or layer.startswith("fc_layer")
                or layer in ("skip", "aggregation")
            )
            if parts[-3] == "after_conv":
                tf_shape = (1, cin // refine_nsample, refine_nsample, cout)
            elif is_conv1d:
                tf_shape = (1, cin, cout)
            else:
                tf_shape = (1, 1, cin, cout)
            name = "/".join(parts[:-2]) + "/weights"
        elif parts[-2:] == ["dense", "bias"]:
            name = "/".join(parts[:-2]) + "/biases"
            tf_shape = shape
        elif parts[-2] == "bn":
            tf_leaf = {
                "scale": "gamma", "bias": "beta",
                "mean": "moving_mean", "var": "moving_variance",
            }[parts[-1]]
            name = "/".join(parts[:-1]) + "/" + tf_leaf
            tf_shape = shape
        else:
            raise ValueError(f"unrecognized flax leaf: {path}")
        out[prefix + name] = tf_shape
    return out


def convert_checkpoint(ckpt_path: str) -> Dict[str, Dict]:
    """Read a TF1 checkpoint and emit nested {params, batch_stats} dicts.

    Requires TensorFlow (any version with ``tf.train.load_checkpoint``).
    """
    if not _tf_available():
        raise ImportError(
            "TensorFlow is required to read TF1 checkpoints; this "
            "environment does not ship it. Run the converter wherever the "
            "reference's TF environment is available and save the result "
            "with dispu_tpu.utils.checkpoint.save_checkpoint."
        )
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    tensors = {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }
    return convert_variables(tensors)
