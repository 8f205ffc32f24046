"""Round-3 session Q: close out the turbo-config decision space.

After r3o (kernel-level unroll/packed) and r3p (in-context fast_knn,
shared-geometry GAN, bf16 pass-2), this measures every candidate turbo
configuration at the two protocols that matter:

* the BENCH headline protocol (b=64 4x scan loop, best of 3) for the
  2x2x(fast_knn, bf16) grid on top of the bf16-gather turbo flags, plus
  the exact path as a sanity anchor;
* whole-cloud 4x / 16x min/median (6 reps, bucketed merge) for the
  current turbo and the best candidate combo.

Run on the TPU (one process — chip grants are slow):
    cd /root/repo && PYTHONPATH=/root/repo:/root/.axon_site \
        python -u scripts/profile_r3q.py
"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
from dispu_tpu.inference import PatchUpsampler
from dispu_tpu.models.generator import DisPUGenerator
from dispu_tpu.train.state import create_generator_state
from dispu_tpu.utils.checkpoint import restore_checkpoint

R = np.random.RandomState(0)


def headline(tag, model, variables, batch=64, iters=20):
    """The bench.py protocol: scan-chained forwards, host-fetch bounded."""
    x = jnp.asarray(R.randn(batch, model.cfg.num_points, 3), jnp.float32)

    @jax.jit
    def fwd_many(v, x0):
        def body(carry, _):
            _, fine = model.apply(v, carry, train=False)
            return fine[:, : model.cfg.num_points, :], jnp.sum(fine)
        _, sums = jax.lax.scan(body, x0, None, length=iters)
        return jnp.sum(sums)

    float(fwd_many(variables, x))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        assert np.isfinite(float(fwd_many(variables, x)))
        dt = min(dt, time.perf_counter() - t0)
    print(f"A {tag}: {batch * iters / dt:.1f} patches/sec", flush=True)


def rep(tag, up, pts, n=6):
    up.upsample(pts)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = up.upsample(pts)
        ts.append((time.perf_counter() - t0) * 1000)
    ts = np.asarray(ts)
    print(f"B {tag}: min {ts.min():.1f}  median {np.median(ts):.1f} ms  "
          f"({np.asarray(out).shape})", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    gen_cfg = GeneratorConfig()
    tmpl = create_generator_state(
        jax.random.PRNGKey(0), gen_cfg, TrainConfig())
    state = restore_checkpoint("demo/log/model-280.msgpack", tmpl)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # A: headline grid (r3 records: turbo 2440.9, exact 2252.3 p/s)
    headline("exact path (r3: 2252)", DisPUGenerator(cfg=gen_cfg), variables)
    for fast_knn in (False, True):
        for bf16 in (False, True):
            cfg = dataclasses.replace(
                gen_cfg, fast_gather=True, fast_gather_backbone=True,
                fast_knn=fast_knn)
            model = DisPUGenerator(
                cfg=cfg,
                dtype=jnp.bfloat16 if bf16 else jnp.float32)
            headline(
                f"turbo fast_knn={fast_knn} bf16={bf16} (r3: 2441 at F/F)",
                model, variables)

    # B: whole-cloud e2e for current turbo vs best candidates
    pts = np.asarray(R.randn(5000, 3) * 0.5, np.float32)
    for ratio, note in ((4, "r3 min 83.4"), (16, "r3 min 307.6")):
        for fast_knn, bf16 in ((False, False), (True, False), (True, True)):
            up = PatchUpsampler(
                variables,
                gen_cfg=dataclasses.replace(gen_cfg, fast_gather=True,
                                            fast_gather_backbone=True,
                                            fast_knn=fast_knn),
                inf_cfg=InferenceConfig(
                    final_ratio=ratio, merge_fps="bucketed",
                    compute_dtype="bfloat16" if bf16 else "float32"),
            )
            rep(f"{ratio}x turbo fast_knn={fast_knn} bf16={bf16} ({note})",
                up, pts)

    print("done", flush=True)


if __name__ == "__main__":
    main()
