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
    # API when it does `import tensorflow as tf`; a proxy module lets us
    # override attributes the module wrapper refuses to take (contrib,
    # layers.max_pooling2d)
    _overrides: dict = {}

    class _TFProxy(types.ModuleType):
        def __getattr__(self, name):
            if name in _overrides:
                return _overrides[name]
            return getattr(tf1, name)

    sys.modules["tensorflow"] = _TFProxy("tensorflow")

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

    # the CUDA group_point is a plain batched gather
    # (ref:tf_ops/grouping/tf_grouping_g.cu:38-60) — replace the
    # grouping_module-backed wrapper with the equivalent TF gather
    def _group_point(points, idx):
        return tf1.gather(points, idx, batch_dims=1)

    grouping.group_point = _group_point
    sys.modules["tf_grouping"] = grouping

    # --- tf_sampling: the CUDA FPS/gather served by exact host code -----
    def _np_fps(npoint, pts):
        """CUDA FPS semantics (ref:tf_sampling_g.cu:105-170): seed index
        0, running min squared distance (init 1e38), greedy argmax."""
        pts = np.asarray(pts)
        b, n, _ = pts.shape
        out = np.zeros((b, int(npoint)), np.int32)
        for i in range(b):
            mind = np.full(n, 1e38, np.float32)
            last = 0
            for j in range(1, int(npoint)):
                d = np.sum((pts[i] - pts[i, last]) ** 2, axis=-1)
                mind = np.minimum(mind, d)
                last = int(np.argmax(mind))
                out[i, j] = last
        return out

    def farthest_point_sample(npoint, inp):
        idx = tf1.py_func(
            lambda p: _np_fps(npoint, p), [inp], tf1.int32
        )
        idx.set_shape([inp.shape[0], npoint])
        return idx

    def gather_point(inp, idx):
        return tf1.gather(inp, idx, batch_dims=1)

    def _unreachable(*a, **k):
        raise NotImplementedError(
            "custom CUDA op reached from a path the parity harness "
            "assumes is dead"
        )

    sampling = types.ModuleType("tf_sampling")
    sampling.farthest_point_sample = farthest_point_sample
    sampling.gather_point = gather_point
    sampling.prob_sample = _unreachable
    sys.modules["tf_sampling"] = sampling

    interpolate = types.ModuleType("tf_interpolate")
    interpolate.three_nn = _unreachable
    interpolate.three_interpolate = _unreachable
    sys.modules["tf_interpolate"] = interpolate

    # --- tf_nndistance: exact numpy NN distance (for loss parity) -------
    def _np_nnd(a, b):
        d = np.sum(
            (a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1
        )
        i1 = np.argmin(d, axis=2).astype(np.int32)
        i2 = np.argmin(d, axis=1).astype(np.int32)
        d1 = np.min(d, axis=2).astype(np.float32)
        d2 = np.min(d, axis=1).astype(np.float32)
        return d1, i1, d2, i2

    def nn_distance(xyz1, xyz2):
        d1, i1, d2, i2 = tf1.py_func(
            _np_nnd, [xyz1, xyz2],
            [tf1.float32, tf1.int32, tf1.float32, tf1.int32],
        )
        for t, ref_t in ((d1, xyz1), (i1, xyz1), (d2, xyz2), (i2, xyz2)):
            t.set_shape(ref_t.shape[:2])
        return d1, i1, d2, i2

    nnd = types.ModuleType("tf_nndistance")
    nnd.nn_distance = nn_distance
    sys.modules["tf_nndistance"] = nnd

    # --- Common.Const: missing in the reference checkout (the GAN path's
    # latent breakage, SURVEY P4) — any string works, it only feeds
    # sys.path suffixes
    const = types.ModuleType("Common.Const")
    const.GPU = ""
    sys.modules["Common.Const"] = const

    # --- tf_approxmatch: imported by loss_utils, not exercised here -----
    am = types.ModuleType("tf_approxmatch")
    am.approx_match = _unreachable
    am.match_cost = _unreachable
    sys.modules["tf_approxmatch"] = am

    # --- absent visualization deps of Common.pc_util --------------------
    for name in ("open3d", "plyfile"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            sys.modules[name] = stub

    # --- CUDA ball query (ref:tf_grouping_g.cu:1-36) as exact numpy -----
    def _np_ball(radius, nsample, xyz, new_xyz):
        xyz = np.asarray(xyz)
        q = np.asarray(new_xyz)
        b, n, _ = xyz.shape
        m = q.shape[1]
        ns = int(nsample)
        idx = np.zeros((b, m, ns), np.int32)
        cnt = np.zeros((b, m), np.int32)
        r = float(radius)
        for i in range(b):
            d = np.sqrt(
                np.sum((q[i][:, None] - xyz[i][None]) ** 2, axis=-1)
            )
            hit = np.maximum(d, 1e-20) < r  # CUDA's max(sqrt, 1e-20) test
            for j in range(m):
                hits = np.nonzero(hit[j])[0][:ns]
                c = len(hits)
                if c:
                    idx[i, j, :] = hits[0]  # pad = first hit
                    idx[i, j, :c] = hits
                cnt[i, j] = c
        return idx, cnt

    def query_ball_point(radius, nsample, xyz, new_xyz):
        idx, cnt = tf1.py_func(
            lambda x, q: _np_ball(radius, nsample, x, q),
            [xyz, new_xyz],
            [tf1.int32, tf1.int32],
        )
        idx.set_shape([new_xyz.shape[0], new_xyz.shape[1], nsample])
        cnt.set_shape([new_xyz.shape[0], new_xyz.shape[1]])
        return idx, cnt

    grouping.query_ball_point = query_ball_point

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

    def _contrib_conv2d(inputs, num_outputs, kernel_size, stride=1,
                        padding="SAME", activation_fn=tf1.nn.relu,
                        normalizer_fn=None, normalizer_params=None,
                        weights_initializer=None, weights_regularizer=None,
                        biases_regularizer=None, scope=None, reuse=None):
        # contrib.layers.conv2d: variables '{scope or Conv}/weights' +
        # '/biases', xavier default init — the discriminator path's conv
        # (ref:Common/tf_util2.py:92-112,47-62)
        if isinstance(kernel_size, int):
            kernel_size = [kernel_size, kernel_size]
        if isinstance(stride, int):
            stride = [stride, stride]
        cin = int(inputs.shape[-1])
        init = weights_initializer or tf1.glorot_uniform_initializer()
        with tf1.variable_scope(
            scope, default_name="Conv", reuse=reuse
        ):
            w = tf1.get_variable(
                "weights", list(kernel_size) + [cin, num_outputs],
                initializer=init,
            )
            b = tf1.get_variable(
                "biases", [num_outputs],
                initializer=tf1.zeros_initializer(),
            )
            out = tf1.nn.conv2d(
                inputs, w, strides=[1] + list(stride) + [1], padding=padding
            ) + b
            if normalizer_fn is not None:
                out = normalizer_fn(out, **(normalizer_params or {}))
            if activation_fn is not None:
                out = activation_fn(out)
            return out

    contrib = types.SimpleNamespace(
        layers=types.SimpleNamespace(
            xavier_initializer=tf1.glorot_uniform_initializer,
            l2_regularizer=_l2_regularizer,
            batch_norm=_batch_norm,
            fully_connected=_unreachable,
            conv2d=_contrib_conv2d,
            conv1d=_unreachable,
        )
    )
    # tf.layers.max_pooling2d was removed with Keras 3 — provide the thin
    # nn.max_pool2d equivalent the discriminator needs
    def _max_pooling2d(inputs, pool_size, strides, padding="valid",
                       name=None):
        if isinstance(pool_size, int):
            pool_size = [pool_size, pool_size]
        if isinstance(strides, int):
            strides = [strides, strides]
        return tf1.nn.max_pool2d(
            inputs,
            ksize=[1] + list(pool_size) + [1],
            strides=[1] + list(strides) + [1],
            padding=padding.upper(),
            name=name,
        )

    class _LayersProxy:
        def __getattr__(self, name):
            if name == "max_pooling2d":
                return _max_pooling2d
            return getattr(tf1.layers, name)

    _overrides["contrib"] = contrib
    _overrides["layers"] = _LayersProxy()
    sys.path.insert(0, REF)
    return tf1


def build_reference_graph(tf1, batch=2, n=256):
    from DisPU.generator import Generator

    tf1.set_random_seed(0)  # deterministic xavier draws run to run
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

    d_ok = run_discriminator_parity(tf1)
    l_ok = run_loss_parity(tf1)
    e_ok = run_emd_parity(tf1)
    n_ok = run_nnd_parity(tf1)
    i_ok = run_interp_parity(tf1)

    # fine's tolerance is looser than coarse's: the refiner re-groups the
    # COARSE positions by kNN, and the ~1e-7 coarse deltas between the
    # frameworks can flip near-tied 16th-neighbor selections, which shows
    # up as sparse ~1e-4 local differences in fine (weight-dependent;
    # both selections are valid kNN of their own inputs)
    ok = (
        not missing and not extra and not shape_mismatch
        and dc < 1e-5 and df < 1e-3 and d_ok and l_ok and e_ok
        and n_ok and i_ok
    )
    print("PARITY:", "OK" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


def run_emd_parity(tf1) -> bool:
    """EMD parity against the reference's OWN C++ CPU kernels
    (ref:tf_ops/approxmatch/tf_approxmatch.cpp:23-143), compiled here
    against the installed TF and loaded as a real custom op.

    Layout note (reference defect, documented): the CPU ApproxMatch
    kernel fills its output in (n, m) row-major order while the tensor is
    declared (b, m, n) (``weight[k*m+l]`` with k over xyz1's n,
    ref:tf_approxmatch.cpp:28-80 vs ``TensorShape{b,m,n}`` at :195) — its
    own MatchCost consumes the same layout so the costs are right, but
    any other consumer of a non-square match would misread it.  The
    in-reference training EMD is square (1024×1024), where the layouts
    coincide.  Our ``approx_match`` produces the properly-labeled
    (b, m, n) plan; the comparison below reinterprets the CPU buffer.
    """
    import subprocess
    import tempfile

    import jax

    so_path = "/tmp/tf_parity_approxmatch_cpu.so"
    if not os.path.exists(so_path):
        import tensorflow as _tf_real  # the proxy forwards sysconfig

        inc = _tf_real.sysconfig.get_include()
        lib = _tf_real.sysconfig.get_lib()
        stubs = os.path.join(tempfile.gettempdir(), "tfp_cuda_stubs.cpp")
        with open(stubs, "w") as f:
            f.write(
                "#include <cstdlib>\n"
                "void approxmatchLauncher(int,int,int,const float*,"
                "const float*,float*,float*){abort();}\n"
                "void matchcostLauncher(int,int,int,const float*,"
                "const float*,const float*,float*){abort();}\n"
                "void matchcostgradLauncher(int,int,int,const float*,"
                "const float*,const float*,float*,float*){abort();}\n"
            )
        cmd = [
            "g++", "-shared", "-fPIC", "-O2", "-w",
            os.path.join(REF, "tf_ops/approxmatch/tf_approxmatch.cpp"),
            stubs, "-o", so_path,
            f"-I{inc}", "-D_GLIBCXX_USE_CXX11_ABI=1", "--std=c++17",
            f"-L{lib}", "-l:libtensorflow_framework.so.2",
        ]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print("emd: reference CPU op failed to compile — skipping "
                  "(non-fatal):", r.stderr[-300:], flush=True)
            return True
    mod = tf1.load_op_library(so_path)

    from dispu_tpu.ops.emd import approx_match, match_cost

    ok = True
    rng = np.random.RandomState(5)
    for n, m in ((256, 256), (512, 128)):
        xyz1 = rng.randn(2, n, 3).astype(np.float32) * 0.5
        xyz2 = rng.randn(2, m, 3).astype(np.float32) * 0.5
        tf1.reset_default_graph()
        p1 = tf1.placeholder(tf1.float32, (2, n, 3))
        p2 = tf1.placeholder(tf1.float32, (2, m, 3))
        match_t = mod.approx_match(p1, p2)
        cost_t = mod.match_cost(p1, p2, match_t)
        with tf1.Session() as sess:
            match_ref, cost_ref = sess.run(
                [match_t, cost_t], {p1: xyz1, p2: xyz2}
            )
        # reinterpret the CPU buffer's (n, m) layout as the labeled (m, n)
        match_ref_mn = match_ref.reshape(2, n, m).transpose(0, 2, 1)

        ours = np.asarray(approx_match(xyz1, xyz2))       # (b, m, n)
        cost_ours = np.asarray(match_cost(xyz1, xyz2, ours))
        rel = np.abs(cost_ours - cost_ref).max() / np.abs(cost_ref).max()
        # transport-plan quality: evaluate each plan under the exact cost
        d = np.sqrt(
            ((xyz2[:, :, None, :] - xyz1[:, None, :, :]) ** 2).sum(-1)
        )
        c_ref_plan = (match_ref_mn * d).sum((1, 2))
        c_our_plan = (ours * d).sum((1, 2))
        plan_rel = np.abs(c_our_plan - c_ref_plan).max() / np.abs(
            c_ref_plan
        ).max()
        # cost gradient w.r.t. both clouds, reference plan held fixed
        g1_j, g2_j = jax.grad(
            lambda a, b_: jnp_sum_match_cost(a, b_, ours), argnums=(0, 1)
        )(xyz1, xyz2)
        # the CPU grad uses ITS plan; ours uses ours — compare with each
        # fixed to the same (ours) plan via the TF graph
        tf1.reset_default_graph()
        p1 = tf1.placeholder(tf1.float32, (2, n, 3))
        p2 = tf1.placeholder(tf1.float32, (2, m, 3))
        pm = tf1.placeholder(tf1.float32, ours.shape)
        grad_t = mod.match_cost_grad(p1, p2, pm)
        with tf1.Session() as sess:
            g1_ref, g2_ref = sess.run(
                grad_t,
                {p1: xyz1, p2: xyz2,
                 # feed our plan in the CPU kernel's (n, m) layout
                 pm: ours.transpose(0, 2, 1).reshape(ours.shape)},
            )
        # REFERENCE DEFECT (found by this harness): matchcostgrad_cpu only
        # zeroes grad1's x components (``grad1[j*3+0]=0``,
        # ref:tf_approxmatch.cpp:108-109) — its y/z channels accumulate
        # into uninitialized memory and come back NaN/garbage.  The CUDA
        # kernel (the path the reference trains on) initializes all three.
        # Compare grad1 on the x channel only; grad2 fully.
        g1_rel = np.abs(
            np.asarray(g1_j)[..., 0] - g1_ref[..., 0]
        ).max() / max(np.abs(g1_ref[..., 0]).max(), 1e-9)
        g2_rel = np.abs(np.asarray(g2_j) - g2_ref).max() / max(
            np.abs(g2_ref).max(), 1e-9
        )
        line_ok = rel < 1e-4 and plan_rel < 1e-3 and g1_rel < 1e-4 \
            and g2_rel < 1e-4
        ok = ok and line_ok
        print(f"emd n={n} m={m}: cost rel={rel:.2e} plan rel={plan_rel:.2e} "
              f"grad rel=({g1_rel:.2e},{g2_rel:.2e}) "
              f"{'ok' if line_ok else 'MISMATCH'}", flush=True)
    return ok


def jnp_sum_match_cost(xyz1, xyz2, match):
    from dispu_tpu.ops.emd import match_cost

    import jax.numpy as jnp

    return jnp.sum(match_cost(xyz1, xyz2, match))


def _compile_ref_op(tf1, src_rel, so_name, cuda_stub_src="",
                    source_subs=()):
    """Compile a reference custom-op .cpp against the installed TF.

    ``source_subs``: (old, new) textual substitutions applied to a copy of
    the source before compiling — for TF-API renames only (e.g.
    ``Status::OK()`` → ``OkStatus()``), never behavior changes.
    """
    import subprocess
    import tempfile

    so_path = os.path.join(tempfile.gettempdir(), so_name)
    if not os.path.exists(so_path):
        import tensorflow as _tf_real

        inc = _tf_real.sysconfig.get_include()
        lib = _tf_real.sysconfig.get_lib()
        src_path = os.path.join(REF, src_rel)
        if source_subs:
            text = open(src_path).read()
            for old, new in source_subs:
                text = text.replace(old, new)
            src_path = os.path.join(
                tempfile.gettempdir(), so_name + "_src.cpp"
            )
            with open(src_path, "w") as f:
                f.write(text)
        srcs = [src_path]
        if cuda_stub_src:
            stub = os.path.join(
                tempfile.gettempdir(), so_name + "_stubs.cpp"
            )
            with open(stub, "w") as f:
                f.write("#include <cstdlib>\n" + cuda_stub_src)
            srcs.append(stub)
        cmd = [
            "g++", "-shared", "-fPIC", "-O2", "-w", *srcs, "-o", so_path,
            f"-I{inc}", "-D_GLIBCXX_USE_CXX11_ABI=1", "--std=c++17",
            f"-L{lib}", "-l:libtensorflow_framework.so.2",
        ]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"{so_name}: compile failed — skipping (non-fatal):",
                  r.stderr[-300:], flush=True)
            return None
    return tf1.load_op_library(so_path)


def run_nnd_parity(tf1) -> bool:
    """ops.chamfer.nn_distance (fwd + custom VJP) vs the reference's OWN
    compiled C++ CPU kernels (ref:tf_ops/nn_distance/tf_nndistance.cpp
    CPU registrations at :83,:166)."""
    import jax
    import jax.numpy as jnp

    mod = _compile_ref_op(
        tf1, "tf_ops/nn_distance/tf_nndistance.cpp",
        "tf_parity_nndistance_cpu.so",
        "void NmDistanceKernelLauncher(int,int,const float*,int,"
        "const float*,float*,int*,float*,int*){abort();}\n"
        "void NmDistanceGradKernelLauncher(int,int,const float*,int,"
        "const float*,const float*,const int*,const float*,const int*,"
        "float*,float*){abort();}\n",
    )
    if mod is None:
        return True

    from dispu_tpu.ops.chamfer import nn_distance

    rng = np.random.RandomState(7)
    xyz1 = rng.randn(2, 300, 3).astype(np.float32) * 0.5
    xyz2 = rng.randn(2, 200, 3).astype(np.float32) * 0.5
    g1 = rng.rand(2, 300).astype(np.float32)
    g2 = rng.rand(2, 200).astype(np.float32)

    tf1.reset_default_graph()
    p1 = tf1.placeholder(tf1.float32, xyz1.shape)
    p2 = tf1.placeholder(tf1.float32, xyz2.shape)
    d1_t, i1_t, d2_t, i2_t = mod.nn_distance(p1, p2)
    gd1 = tf1.placeholder(tf1.float32, g1.shape)
    gd2 = tf1.placeholder(tf1.float32, g2.shape)
    gx1_t, gx2_t = mod.nn_distance_grad(p1, p2, gd1, i1_t, gd2, i2_t)
    with tf1.Session() as sess:
        d1r, i1r, d2r, i2r, gx1r, gx2r = sess.run(
            [d1_t, i1_t, d2_t, i2_t, gx1_t, gx2_t],
            {p1: xyz1, p2: xyz2, gd1: g1, gd2: g2},
        )

    d1j, i1j, d2j, i2j = nn_distance(xyz1, xyz2)
    gx1j, gx2j = jax.vjp(nn_distance, xyz1, xyz2)[1](
        (jnp.asarray(g1), jnp.zeros_like(i1j),
         jnp.asarray(g2), jnp.zeros_like(i2j))
    )
    idx_ok = np.array_equal(np.asarray(i1j), i1r) and np.array_equal(
        np.asarray(i2j), i2r
    )
    d_rel = max(
        np.abs(np.asarray(d1j) - d1r).max(),
        np.abs(np.asarray(d2j) - d2r).max(),
    ) / max(d1r.max(), d2r.max())
    g_rel = max(
        np.abs(np.asarray(gx1j) - gx1r).max() / max(np.abs(gx1r).max(), 1e-9),
        np.abs(np.asarray(gx2j) - gx2r).max() / max(np.abs(gx2r).max(), 1e-9),
    )
    ok = idx_ok and d_rel < 1e-5 and g_rel < 1e-5
    print(f"nn_distance: idx {'bit-equal' if idx_ok else 'MISMATCH'}, "
          f"dist rel={d_rel:.2e} grad rel={g_rel:.2e} "
          f"{'ok' if ok else 'MISMATCH'}", flush=True)
    return ok


def run_interp_parity(tf1) -> bool:
    """ops/interpolate.py vs the reference's compiled CPU ThreeNN /
    ThreeInterpolate(+Grad) kernels (ref:tf_ops/interpolation/
    tf_interpolate.cpp — CPU-only in the reference build too)."""
    import jax
    import jax.numpy as jnp

    mod = _compile_ref_op(
        tf1, "tf_ops/interpolation/tf_interpolate.cpp",
        "tf_parity_interpolate_cpu.so",
        source_subs=(("Status::OK()", "::tensorflow::OkStatus()"),),
    )
    if mod is None:
        return True

    from dispu_tpu.ops.interpolate import three_interpolate, three_nn

    rng = np.random.RandomState(9)
    xyz1 = rng.randn(2, 128, 3).astype(np.float32)  # queries
    xyz2 = rng.randn(2, 64, 3).astype(np.float32)   # known points
    feats = rng.randn(2, 64, 7).astype(np.float32)
    gout = rng.rand(2, 128, 7).astype(np.float32)

    tf1.reset_default_graph()
    p1 = tf1.placeholder(tf1.float32, xyz1.shape)
    p2 = tf1.placeholder(tf1.float32, xyz2.shape)
    pf = tf1.placeholder(tf1.float32, feats.shape)
    dist_t, idx_t = mod.three_nn(p1, p2)
    # reference usage computes weights in python (ref:Common/
    # pointnet_util.py:204-209): 1/d normalized over the 3 neighbors
    dist_c = tf1.maximum(dist_t, 1e-10)
    norm = tf1.reduce_sum(1.0 / dist_c, axis=2, keepdims=True)
    w_t = (1.0 / dist_c) / norm
    out_t = mod.three_interpolate(pf, idx_t, w_t)
    pg = tf1.placeholder(tf1.float32, gout.shape)
    gpts_t = mod.three_interpolate_grad(pf, idx_t, w_t, pg)
    with tf1.Session() as sess:
        dr, ir, wr, outr, gr = sess.run(
            [dist_t, idx_t, w_t, out_t, gpts_t],
            {p1: xyz1, p2: xyz2, pf: feats, pg: gout},
        )

    dj, ij = three_nn(xyz1, xyz2)
    idx_ok = np.array_equal(np.asarray(ij), ir)
    outj = three_interpolate(feats, np.asarray(ij), wr)
    out_rel = np.abs(np.asarray(outj) - outr).max() / max(
        np.abs(outr).max(), 1e-9
    )
    gj = jax.vjp(
        lambda f: three_interpolate(f, np.asarray(ij), wr), feats
    )[1](jnp.asarray(gout))[0]
    g_rel = np.abs(np.asarray(gj) - gr).max() / max(np.abs(gr).max(), 1e-9)
    # ThreeNN returns SQUARED distances in the reference CPU kernel
    d_rel = np.abs(np.asarray(dj) - dr).max() / max(np.abs(dr).max(), 1e-9)
    ok = idx_ok and out_rel < 1e-5 and g_rel < 1e-5 and d_rel < 1e-4
    print(f"three_nn/interpolate: idx {'bit-equal' if idx_ok else 'MISMATCH'}"
          f", dist rel={d_rel:.2e} out rel={out_rel:.2e} "
          f"grad rel={g_rel:.2e} {'ok' if ok else 'MISMATCH'}", flush=True)
    return ok


def run_loss_parity(tf1) -> bool:
    """Reference loss graphs (ref:Common/loss_utils.py composed from the
    shimmed custom ops) vs dispu_tpu.losses on the same arrays."""
    tf1.reset_default_graph()
    import Common.loss_utils as LU

    from dispu_tpu import losses as L

    rng = np.random.RandomState(3)
    pred_np = (rng.rand(2, 1024, 3).astype(np.float32) - 0.5) * 0.6
    gt_np = (rng.rand(2, 1024, 3).astype(np.float32) - 0.5) * 0.6

    pred_t = tf1.placeholder(tf1.float32, (2, 1024, 3))
    gt_t = tf1.placeholder(tf1.float32, (2, 1024, 3))

    graphs = {
        "chamfer": LU.chamfer(pred_t, gt_t, radius=1.0),
        "chamfer_thresh": LU.chamfer(pred_t, gt_t, threshold=2.0),
        "hausdorff": LU.hausdorff_loss(pred_t, gt_t),
        "repulsion_ball": LU.get_repulsion_loss(pred_t),
        "repulsion_l1": LU.get_repulsion_loss(pred_t, use_l1=True),
        "uniform": LU.get_uniform_loss(pred_t),
    }
    with tf1.Session() as sess:
        ref = sess.run(graphs, feed_dict={pred_t: pred_np, gt_t: gt_np})

    ours = {
        "chamfer": L.chamfer(pred_np, gt_np, radius=1.0),
        "chamfer_thresh": L.chamfer(pred_np, gt_np, threshold=2.0),
        "hausdorff": L.hausdorff(pred_np, gt_np),
        "repulsion_ball": L.repulsion(pred_np),
        "repulsion_l1": L.repulsion(pred_np, use_l1=True),
        "uniform": L.uniform(pred_np),
    }
    ok = True
    for k in graphs:
        r, o = float(ref[k]), float(ours[k])
        rel = abs(r - o) / max(abs(r), 1e-12)
        line_ok = rel < 1e-4
        ok = ok and line_ok
        print(f"loss {k:16s} ref={r:.8f} ours={o:.8f} rel={rel:.2e} "
              f"{'ok' if line_ok else 'MISMATCH'}", flush=True)
    return ok


def run_discriminator_parity(tf1) -> bool:
    """Reference Discriminator (ref:DisPU/discriminator.py +
    tf_util2.pointnet_sa_module_msg3) vs our PatchDiscriminator, weights
    transferred graph→flax directly (no released D checkpoint exists, so
    the mapping lives here, not in the converter)."""
    import re

    import jax

    tf1.reset_default_graph()
    from DisPU.discriminator import Discriminator

    rng = np.random.RandomState(1)
    batch, n = 2, 1024
    pred_np = rng.randn(batch, n, 3).astype(np.float32) * 0.5
    gt_np = rng.randn(batch, n, 3).astype(np.float32) * 0.5

    opts = types.SimpleNamespace()
    pred_t = tf1.placeholder(tf1.float32, (batch, n, 3))
    gt_t = tf1.placeholder(tf1.float32, (batch, n, 3))
    disc = Discriminator(opts, is_training=False, name="discriminator")
    values_t = disc(pred_t, gt=gt_t)

    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        values_ref = sess.run(
            values_t, feed_dict={pred_t: pred_np, gt_t: gt_np}
        )
        weights = {
            v.name.split(":")[0]: sess.run(v)
            for v in tf1.global_variables()
        }
    print(f"discriminator graph: {len(weights)} variables, "
          f"values {values_ref.shape}", flush=True)

    # graph name → our flax path
    params: dict = {}
    unmapped = []
    for name, val in weights.items():
        m = re.fullmatch(
            r"discriminator/layer1/(conv\d_\d)/Conv/(weights|biases)", name
        )
        if m:
            layer, kind = m.group(1), m.group(2)
            node = params.setdefault("layer1", {}).setdefault(
                layer, {}
            ).setdefault("dense", {})
        else:
            m = re.fullmatch(
                r"discriminator/patch/conv_0/(weights|biases)", name
            )
            if not m:
                unmapped.append(name)
                continue
            kind = m.group(1)
            node = params.setdefault("patch", {}).setdefault("dense", {})
        if kind == "weights":
            node["kernel"] = val.reshape(-1, val.shape[-1])
        else:
            node["bias"] = val
    if unmapped:
        print("  unmapped D variables:", unmapped, flush=True)
        return False

    from dispu_tpu.config import DiscriminatorConfig
    from dispu_tpu.models.discriminator import PatchDiscriminator

    model = PatchDiscriminator(cfg=DiscriminatorConfig())
    template = model.init(
        jax.random.PRNGKey(0), np.zeros((1, n, 3), np.float32),
        np.zeros((1, n, 3), np.float32),
    )
    import flax.traverse_util as tu

    t_flat = tu.flatten_dict(template["params"], sep="/")
    p_flat = tu.flatten_dict(params, sep="/")
    if set(t_flat) != set(p_flat):
        print("  D param tree mismatch:",
              sorted(set(t_flat) ^ set(p_flat))[:10], flush=True)
        return False
    shape_bad = [
        k for k in t_flat if t_flat[k].shape != p_flat[k].shape
    ]
    if shape_bad:
        print("  D shape mismatch:", shape_bad[:10], flush=True)
        return False

    values_j = np.asarray(
        model.apply({"params": params}, pred_np, gt_np)
    )
    # ref: (b, np, 2, 1) via strided max-pool over the concat axis;
    # ours: (b, np, 2, 1) stacked [gt-pool, pred-pool]
    dv = np.abs(values_j - values_ref.reshape(values_j.shape)).max()
    print(f"discriminator values max|Δ| = {dv:.3e} "
          f"(scale {np.abs(values_ref).max():.3f})", flush=True)
    return bool(dv < 1e-4)


if __name__ == "__main__":
    sys.exit(main())
