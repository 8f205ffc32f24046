"""Reference-graph forward parity harness (CPU, TF + JAX in one process).

The BASELINE.md north star — CD parity against the *released pretrained
checkpoint* — is blocked on the Google-Drive artifact (zero egress).
This harness proves everything that claim needs EXCEPT the artifact:

  1. it builds the REFERENCE's own generator graph (ref:DisPU/generator.py
     executed verbatim from /root/reference) under ``tf.compat.v1``, with
     only the unbuildable custom-op shims replaced at the module level:
       * the nanoflann host kNN (``tf.py_func`` → nanoflann, ref:Common/
         ops.py:110-118,165) is served by scipy's cKDTree — both are
         exact kNN, identical results away from distance ties;
       * ``tf_grouping``'s pure-TF helpers (knn_point_2 etc.,
         ref:tf_ops/grouping/tf_grouping.py:60-141) are executed from the
         reference source with the ``load_op_library`` line stubbed —
         those functions never touch the CUDA module;
       * ``tf_sampling`` / ``tf_interpolate`` custom ops are registered
         but unreachable from the generator forward (raisers);
  2. random-initializes it, runs (coarse, fine) on fixed inputs, and
     saves a GENUINE TF1 checkpoint with ``tf.compat.v1.train.Saver``;
  3. asserts the graph's variable set equals
     ``convert_tf_checkpoint.expected_tf_names`` for our flax tree
     (names AND shapes — checkpoint compatibility, both directions);
  4. converts the checkpoint with ``convert_checkpoint`` and runs OUR
     ``DisPUGenerator`` on the same inputs — (coarse, fine) must match
     the reference graph numerically.

When the released checkpoint becomes available, CD parity reduces to
re-running step 4 on it.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        PYTHONPATH=/root/repo python -u scripts/tf_parity.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"


def install_reference_shims():
    """Register the shim modules the reference imports, then make
    ``import tensorflow`` resolve to the v1-compat API for reference code."""
    import tensorflow.compat.v1 as tf1

    tf1.disable_v2_behavior()
    tf1.disable_eager_execution()
    # reference code (and the exec'd tf_grouping below) must see the v1
    # API when it does `import tensorflow as tf`
    sys.modules["tensorflow"] = tf1

    # --- nanoflann host kNN -> scipy cKDTree (both exact) ---------------
    def knn_batch(support_pts, query_pts, k, omp=False):
        from scipy.spatial import cKDTree

        support = np.asarray(support_pts)
        query = np.asarray(query_pts)
        out = np.empty(query.shape[:2] + (k,), np.int64)
        for b in range(support.shape[0]):
            _, idx = cKDTree(support[b]).query(query[b], k=k)
            out[b] = idx.reshape(query.shape[1], k)
        return out.astype(np.int32)

    nn_mod = types.ModuleType(
        "libs.nearest_neighbors.lib.python.nearest_neighbors"
    )
    nn_mod.knn_batch = knn_batch
    for name in (
        "libs",
        "libs.nearest_neighbors",
        "libs.nearest_neighbors.lib",
        "libs.nearest_neighbors.lib.python",
    ):
        pkg = types.ModuleType(name)
        pkg.__path__ = []
        sys.modules.setdefault(name, pkg)
    sys.modules[
        "libs.nearest_neighbors.lib.python.nearest_neighbors"
    ] = nn_mod

    # --- tf_grouping: execute the reference source minus load_op_library
    src = open(os.path.join(REF, "tf_ops/grouping/tf_grouping.py")).read()
    lines = []
    for line in src.splitlines():
        if "load_op_library" in line:
            lines.append("grouping_module = None  # CUDA .so not built")
        else:
            lines.append(line)
    grouping = types.ModuleType("tf_grouping")
    grouping.__dict__["__name__"] = "tf_grouping"
    grouping.__dict__["__file__"] = "<reference tf_grouping, shimmed>"
    exec(  # reference code, executed for verification — not vendored
        compile("\n".join(lines), "<ref tf_grouping>", "exec"),
        grouping.__dict__,
    )
    sys.modules["tf_grouping"] = grouping

    # --- tf_sampling / tf_interpolate: present but unreachable ----------
    def _unreachable(*a, **k):
        raise NotImplementedError(
            "custom CUDA op reached from the generator forward — "
            "the parity harness assumes it is not"
        )

    sampling = types.ModuleType("tf_sampling")
    sampling.farthest_point_sample = _unreachable
    sampling.gather_point = _unreachable
    sampling.prob_sample = _unreachable
    sys.modules["tf_sampling"] = sampling

    interpolate = types.ModuleType("tf_interpolate")
    interpolate.three_nn = _unreachable
    interpolate.three_interpolate = _unreachable
    sys.modules["tf_interpolate"] = interpolate

    # --- tf.contrib shim: only what the generator path touches ----------
    # xavier_initializer IS glorot-uniform (same fan-avg uniform bound);
    # l2_regularizer only feeds the (unused-at-forward) REG collection
    def _l2_regularizer(scale):
        if not scale:
            return None
        return lambda w: scale * tf1.nn.l2_loss(w)

    def _batch_norm(inputs, center=True, scale=True, is_training=True,
                    decay=0.999, updates_collections=None, scope=None,
                    data_format="NHWC", epsilon=0.001):
        # contrib.layers.batch_norm, inference path only (the harness
        # builds is_training=False graphs); variable names/shapes match
        # contrib's ({scope}/{gamma,beta,moving_mean,moving_variance})
        assert is_training is False, "harness shim is inference-only"
        assert data_format == "NHWC"
        ch = int(inputs.shape[-1])
        with tf1.variable_scope(scope or "BatchNorm"):
            beta = (
                tf1.get_variable("beta", [ch],
                                 initializer=tf1.zeros_initializer())
                if center else tf1.constant(0.0)
            )
            gamma = (
                tf1.get_variable("gamma", [ch],
                                 initializer=tf1.ones_initializer())
                if scale else tf1.constant(1.0)
            )
            mm = tf1.get_variable(
                "moving_mean", [ch],
                initializer=tf1.zeros_initializer(), trainable=False,
            )
            mv = tf1.get_variable(
                "moving_variance", [ch],
                initializer=tf1.ones_initializer(), trainable=False,
            )
            return tf1.nn.batch_normalization(
                inputs, mm, mv, beta, gamma, epsilon
            )

    contrib = types.SimpleNamespace(
        layers=types.SimpleNamespace(
            xavier_initializer=tf1.glorot_uniform_initializer,
            l2_regularizer=_l2_regularizer,
            batch_norm=_batch_norm,
            fully_connected=_unreachable,
            conv2d=_unreachable,
        )
    )
    try:
        tf1.contrib = contrib
    except Exception:  # module wrapper refuses setattr: wrap in a proxy
        class _Proxy(types.ModuleType):
            def __getattr__(self, name):
                if name == "contrib":
                    return contrib
                return getattr(tf1, name)

        proxy = _Proxy("tensorflow")
        sys.modules["tensorflow"] = proxy
        sys.path.insert(0, REF)
        return tf1

    # --- reference code sees the v1 API as `tensorflow` -----------------
    sys.modules["tensorflow"] = tf1
    sys.path.insert(0, REF)
    return tf1


def build_reference_graph(tf1, batch=2, n=256):
    from DisPU.generator import Generator

    opts = types.SimpleNamespace(patch_num_point=n, up_ratio=4)
    inputs = tf1.placeholder(tf1.float32, (batch, n, 3), name="inputs")
    gen = Generator(opts, is_training=False, name="generator")
    coarse, fine = gen(inputs)
    return inputs, coarse, fine


def main():
    tf1 = install_reference_shims()

    rng = np.random.RandomState(0)
    batch, n = 2, 256
    x = rng.randn(batch, n, 3).astype(np.float32) * 0.5

    inputs, coarse_t, fine_t = build_reference_graph(tf1, batch, n)

    tf_vars = tf1.global_variables()
    print(f"reference graph: {len(tf_vars)} variables", flush=True)

    ckpt_dir = "/tmp/tf_parity_ckpt"
    os.makedirs(ckpt_dir, exist_ok=True)
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        coarse_ref, fine_ref = sess.run(
            [coarse_t, fine_t], feed_dict={inputs: x}
        )
        path = tf1.train.Saver().save(
            sess, os.path.join(ckpt_dir, "model"), global_step=0
        )
    print("reference forward:", coarse_ref.shape, fine_ref.shape,
          "ckpt:", path, flush=True)

    # ---- name/shape set parity -----------------------------------------
    import jax

    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.utils.convert_tf_checkpoint import (
        convert_checkpoint,
        expected_tf_names,
    )

    cfg = GeneratorConfig()
    model = DisPUGenerator(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, n, 3), np.float32), train=False
    )
    expected = expected_tf_names(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        refine_nsample=cfg.refine_nsample,
    )

    got = {}
    for v in tf_vars:
        name = v.name.split(":")[0]
        got[name] = tuple(v.shape.as_list())

    missing = sorted(set(expected) - set(got))
    extra = sorted(set(got) - set(expected))
    shape_mismatch = sorted(
        k for k in set(expected) & set(got) if expected[k] != got[k]
    )
    print(f"name-set: {len(expected)} expected, {len(got)} in graph; "
          f"missing={len(missing)} extra={len(extra)} "
          f"shape-mismatch={len(shape_mismatch)}", flush=True)
    for k in missing[:20]:
        print("  MISSING from graph:", k, expected[k], flush=True)
    for k in extra[:20]:
        print("  EXTRA in graph:   ", k, got[k], flush=True)
    for k in shape_mismatch[:20]:
        print("  SHAPE:", k, "expected", expected[k], "got", got[k],
              flush=True)

    # ---- convert + run ours --------------------------------------------
    converted = convert_checkpoint(path)
    restored = {
        "params": converted["params"],
        "batch_stats": converted.get("batch_stats", {}),
    }
    coarse_j, fine_j = model.apply(restored, np.asarray(x), train=False)
    coarse_j = np.asarray(coarse_j)
    fine_j = np.asarray(fine_j)

    dc = np.abs(coarse_j - coarse_ref).max()
    df = np.abs(fine_j - fine_ref).max()
    sc = np.abs(coarse_ref).max()
    print(f"coarse max|Δ| = {dc:.3e} (scale {sc:.3f})", flush=True)
    print(f"fine   max|Δ| = {df:.3e}", flush=True)
    ok = (
        not missing and not extra and not shape_mismatch
        and dc < 1e-4 and df < 1e-4
    )
    print("PARITY:", "OK" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
