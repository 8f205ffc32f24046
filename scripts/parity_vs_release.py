"""One-command parity verdict against a released reference checkpoint.

The BASELINE.md north star — CD parity vs the reference's *released
pretrained checkpoint* (ref:README.md:40, a Google-Drive artifact this
zero-egress container cannot fetch) — reduces, the day anyone supplies
the artifact, to:

    python -u scripts/parity_vs_release.py <ckpt_dir_or_prefix>

which performs, in one process (CPU: TF + JAX):

  1. variable-set validation — the checkpoint's generator scope must
     carry exactly the 70 names+shapes ``expected_tf_names`` predicts
     (Adam slots / bookkeeping / a GAN run's discriminator scope are
     tolerated and reported, ref:DisPU/model.py:188-194 saves them all);
  2. conversion via ``convert_tf_checkpoint.convert_variables``;
  3. forward parity — the reference's OWN generator graph (built verbatim
     from /root/reference by the tf_parity shims) restored from the
     checkpoint vs our ``DisPUGenerator`` on the converted weights, same
     probe patches, reporting max|Δ| on (coarse, fine);
  4. whole-cloud X4 upsampling of the shipped test clouds
     (ref:data/test/*.xyz) through our ``PatchUpsampler``, scored with
     the reference's own evaluation pairing (ref:evaluate.py matches
     pred '<name>_X4.xyz' to gt '<name>.xyz' — the 2048-point cloud
     itself for the shipped folder, which ships no denser gt).  A
     pipeline sanity sweep; the parity verdict is stage 3's.

Self-test (no artifact needed):

    python -u scripts/parity_vs_release.py --self_test

random-initializes the reference graph, saves a GENUINE TF1 checkpoint
with ``tf.compat.v1.train.Saver`` (exactly what the release is), and
runs the full harness against it — proving the pipeline end-to-end.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

PROBE_BATCH, PROBE_N = 2, 256


def resolve_ckpt(path: str) -> str:
    """Accept a TF1 checkpoint prefix or a directory containing one."""
    import tensorflow.compat.v1 as tf1

    if os.path.isdir(path):
        latest = tf1.train.latest_checkpoint(path)
        if latest is None:
            # no 'checkpoint' state file: fall back to newest .index
            idx = sorted(
                (os.path.getmtime(os.path.join(path, f)),
                 os.path.join(path, f[: -len(".index")]))
                for f in os.listdir(path) if f.endswith(".index")
            )
            if not idx:
                raise SystemExit(f"no TF checkpoint found under {path}")
            latest = idx[-1][1]
        return latest
    return path


def validate_variable_set(ckpt_prefix: str):
    """Compare the checkpoint's generator scope to the expected mapping.

    Returns (generator_tensors, ok, n_extra_scopes)."""
    import jax
    import tensorflow.compat.v1 as tf1

    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator
    from dispu_tpu.utils.convert_tf_checkpoint import expected_tf_names

    reader = tf1.train.load_checkpoint(ckpt_prefix)
    shape_map = reader.get_variable_to_shape_map()

    cfg = GeneratorConfig()
    model = DisPUGenerator(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, PROBE_N, 3), np.float32),
        train=False,
    )
    expected = expected_tf_names(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        refine_nsample=cfg.refine_nsample,
    )

    def is_bookkeeping(name: str) -> bool:
        return any(s in name for s in (
            "Adam", "global_step", "epoch", "beta1_power", "beta2_power",
        ))

    gen_names = {
        n for n in shape_map
        if n.startswith("generator/") and not is_bookkeeping(n)
    }
    other = sorted(
        n for n in shape_map
        if not n.startswith("generator/") and not is_bookkeeping(n)
    )
    missing = sorted(set(expected) - gen_names)
    extra = sorted(gen_names - set(expected))
    shape_mismatch = sorted(
        n for n in gen_names & set(expected)
        if tuple(shape_map[n]) != tuple(expected[n])
    )
    print(f"variable set: {len(expected)} expected generator vars, "
          f"{len(gen_names)} in checkpoint; missing={len(missing)} "
          f"extra={len(extra)} shape-mismatch={len(shape_mismatch)}; "
          f"{len(other)} non-generator vars tolerated "
          f"(e.g. a GAN run's discriminator scope)", flush=True)
    for n in missing[:20]:
        print("  MISSING:", n, expected[n], flush=True)
    for n in extra[:20]:
        print("  EXTRA:  ", n, shape_map[n], flush=True)
    for n in shape_mismatch[:20]:
        print("  SHAPE:  ", n, "expected", expected[n],
              "got", tuple(shape_map[n]), flush=True)

    tensors = {n: reader.get_tensor(n) for n in gen_names}
    ok = not missing and not extra and not shape_mismatch
    return tensors, ok


def forward_parity(tf1, ckpt_prefix: str, converted):
    """Reference graph restored from the checkpoint vs our generator on
    the converted weights, same probe patches → (dc, df, coarse scale)."""
    import tf_parity

    rng = np.random.RandomState(0)
    x = rng.randn(PROBE_BATCH, PROBE_N, 3).astype(np.float32) * 0.5

    inputs, coarse_t, fine_t = tf_parity.build_reference_graph(
        tf1, PROBE_BATCH, PROBE_N
    )
    gen_vars = [
        v for v in tf1.global_variables()
        if v.name.startswith("generator/")
    ]
    with tf1.Session() as sess:
        tf1.train.Saver(var_list=gen_vars).restore(sess, ckpt_prefix)
        coarse_ref, fine_ref = sess.run(
            [coarse_t, fine_t], feed_dict={inputs: x}
        )

    from dispu_tpu.config import GeneratorConfig
    from dispu_tpu.models.generator import DisPUGenerator

    model = DisPUGenerator(cfg=GeneratorConfig())
    coarse_j, fine_j = model.apply(converted, x, train=False)
    dc = float(np.abs(np.asarray(coarse_j) - coarse_ref).max())
    df = float(np.abs(np.asarray(fine_j) - fine_ref).max())
    print(f"forward parity: coarse max|Δ| = {dc:.3e} "
          f"(scale {np.abs(coarse_ref).max():.3f}), "
          f"fine max|Δ| = {df:.3e}", flush=True)
    return dc, df


def whole_cloud_cd(converted, test_glob: str, out_dir: str):
    """X4-upsample the shipped clouds with the converted weights; CD/HD
    per the reference's evaluate pairing — pred '<name>_X4.xyz' scored
    against gt '<name>.xyz', which for the shipped test folder IS the
    2048-point input cloud (ref:evaluate.py pairs by name; the repo
    ships no denser gt).  This stage is a sanity sweep of the full
    inference pipeline on the release weights; the parity VERDICT
    itself comes from the forward-parity stage."""
    from glob import glob

    import jax.numpy as jnp

    from dispu_tpu.config import GeneratorConfig, InferenceConfig
    from dispu_tpu.evaluation.meshio import read_xyz, write_xyz
    from dispu_tpu.evaluation.metrics import cd_hd
    from dispu_tpu.inference import PatchUpsampler

    files = sorted(glob(test_glob))
    if not files:
        print(f"no test clouds match {test_glob}; skipping the CD table",
              flush=True)
        return []
    os.makedirs(out_dir, exist_ok=True)
    upsampler = PatchUpsampler(
        converted, gen_cfg=GeneratorConfig(),
        inf_cfg=InferenceConfig(final_ratio=4),
    )
    rows = []
    for path in files:
        pc = read_xyz(path)[:, :3]
        out = upsampler.upsample(pc)
        name = os.path.basename(path)[:-4]
        write_xyz(os.path.join(out_dir, f"{name}_X4.xyz"), out)
        cd, hd = cd_hd(jnp.asarray(out), jnp.asarray(pc))
        rows.append((name, float(cd), float(hd)))
        print(f"  {name}: {len(pc)} -> {len(out)} points, "
              f"CD={rows[-1][1]:.6f} HD={rows[-1][2]:.6f}", flush=True)
    return rows


def make_synthetic_release(tf1) -> str:
    """Random-init the reference graph and save a genuine TF1 checkpoint
    (Saver format — exactly the artifact layout the release uses)."""
    import tf_parity

    inputs, coarse_t, fine_t = tf_parity.build_reference_graph(
        tf1, PROBE_BATCH, PROBE_N
    )
    ckpt_dir = "/tmp/parity_release_selftest"
    os.makedirs(ckpt_dir, exist_ok=True)
    with tf1.Session() as sess:
        sess.run(tf1.global_variables_initializer())
        path = tf1.train.Saver().save(
            sess, os.path.join(ckpt_dir, "model"), global_step=0
        )
    tf1.reset_default_graph()
    print("self-test checkpoint written:", path, flush=True)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default=None,
                    help="TF1 checkpoint prefix or directory")
    ap.add_argument("--self_test", action="store_true",
                    help="generate a synthetic release checkpoint from the "
                         "reference's own graph and run against it")
    ap.add_argument("--test_data", default="/root/reference/data/test/*.xyz")
    ap.add_argument("--out_dir", default="/tmp/parity_release_outputs")
    ap.add_argument("--skip_clouds", action="store_true",
                    help="skip the whole-cloud X4 stage (variable set + "
                         "forward parity only)")
    args = ap.parse_args()

    import tf_parity

    tf1 = tf_parity.install_reference_shims()

    if args.self_test:
        ckpt_prefix = make_synthetic_release(tf1)
    elif args.ckpt:
        ckpt_prefix = resolve_ckpt(args.ckpt)
    else:
        raise SystemExit("pass a checkpoint path or --self_test")
    print("checkpoint:", ckpt_prefix, flush=True)

    tensors, names_ok = validate_variable_set(ckpt_prefix)

    from dispu_tpu.utils.convert_tf_checkpoint import convert_variables

    converted = convert_variables(tensors)
    converted = {
        "params": converted["params"],
        "batch_stats": converted.get("batch_stats", {}),
    }

    dc, df = forward_parity(tf1, ckpt_prefix, converted)
    # same bounds as scripts/tf_parity.py: fine's tolerance is looser —
    # ~1e-7 coarse deltas can flip near-tied refiner kNN selections
    fwd_ok = dc < 1e-5 and df < 1e-3

    if not args.skip_clouds:
        rows = whole_cloud_cd(converted, args.test_data, args.out_dir)
        if rows:
            mean_cd = float(np.mean([r[1] for r in rows]))
            print(f"whole-cloud X4 mean CD (reference evaluate pairing — "
                  f"gt '<name>.xyz' is the 2048-point cloud): {mean_cd:.6f}",
                  flush=True)

    ok = names_ok and fwd_ok
    print("RELEASE PARITY:", "OK" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
