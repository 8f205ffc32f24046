"""On-chip serving latency: the deployment story, measured (round 4).

VERDICT r3 item 4: the `--phase export` artifact and the jit serving
path carried CPU tests but no on-chip numbers.  This script measures,
in THIS process (run it fresh — cold-start numbers are only meaningful
from a new process):

  --mode export   load a `dispu.py --phase export` artifact with
                  ServedUpsampler: artifact-load time, warmup()
                  (AOT-compile) time, first-call latency with and
                  without prior warmup being the difference, then
                  p50/p99 end-to-end latency over --calls requests.
  --mode jit      the plain PatchUpsampler path (trace+compile on first
                  call): first-call latency, then p50/p99.  Pass
                  --compile_cache DIR twice (cold dir / warm dir) to
                  measure the persistent-cache restart win.

End-to-end latency = numpy in → numpy out, including host<->device
transfer through the tunnel — what a serving frontend would see.

Usage (one process per leg; chip grants serialize):
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/serve_bench.py \
        --mode export --path /tmp/serve_artifact --calls 100
"""

import argparse
import json
import time

import numpy as np


def pctl(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["export", "jit"], required=True)
    ap.add_argument("--path", default="/tmp/serve_artifact",
                    help="artifact dir (--mode export) or checkpoint "
                    "msgpack (--mode jit; blank = random init)")
    ap.add_argument("--cloud", default="/root/reference/data/test/"
                    "Icosahedron.xyz")
    ap.add_argument("--calls", type=int, default=100)
    ap.add_argument("--final_ratio", type=int, default=4)
    ap.add_argument("--compile_cache", default=None)
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip warmup() so the first call pays compile "
                    "(the cold-start control)")
    args = ap.parse_args()

    t_imp0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    pc = np.loadtxt(args.cloud).astype(np.float32)[:, :3]
    print(f"backend: {jax.default_backend()}  cloud: {pc.shape} "
          f"(import+backend {time.perf_counter() - t_imp0:.1f}s)",
          flush=True)

    if args.mode == "export":
        from dispu_tpu.serving import ServedUpsampler

        t0 = time.perf_counter()
        srv = ServedUpsampler(args.path)
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        if not args.no_warmup:
            srv.warmup([pc.shape[0]])
        t_warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = srv.upsample(pc)
        t_first = time.perf_counter() - t0
        call = srv.upsample
    else:
        from dispu_tpu.config import GeneratorConfig, InferenceConfig
        from dispu_tpu.inference import PatchUpsampler
        from dispu_tpu.models.generator import DisPUGenerator

        gcfg = GeneratorConfig()
        t0 = time.perf_counter()
        if args.path and args.path.endswith(".msgpack"):
            from dispu_tpu.config import ExperimentConfig
            from dispu_tpu.train.state import create_generator_state
            from dispu_tpu.utils.checkpoint import restore_checkpoint

            ecfg = ExperimentConfig()
            template = create_generator_state(
                jax.random.PRNGKey(0), ecfg.generator, ecfg.train)
            state = restore_checkpoint(args.path, template)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        else:
            variables = DisPUGenerator(cfg=gcfg).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 256, 3), jnp.float32),
                train=False)
        ups = PatchUpsampler(
            variables, gcfg, InferenceConfig(final_ratio=args.final_ratio))
        t_load = time.perf_counter() - t0
        t_warm = 0.0
        t0 = time.perf_counter()
        out = ups.upsample(pc)
        t_first = time.perf_counter() - t0
        call = ups.upsample

    assert np.isfinite(out).all() and out.shape[0] == (
        pc.shape[0] * args.final_ratio)
    lat = []
    for _ in range(args.calls):
        t0 = time.perf_counter()
        out = call(pc)
        lat.append(time.perf_counter() - t0)
    assert np.isfinite(out).all()
    print(json.dumps({
        "mode": args.mode,
        "compile_cache": bool(args.compile_cache),
        "warmup": not args.no_warmup,
        "load_s": round(t_load, 3),
        "warmup_s": round(t_warm, 3),
        "first_call_s": round(t_first, 3),
        "p50_ms": round(pctl(lat, 50) * 1e3, 1),
        "p99_ms": round(pctl(lat, 99) * 1e3, 1),
        "calls": args.calls,
        "points": int(pc.shape[0]),
        "final_ratio": args.final_ratio,
    }), flush=True)


if __name__ == "__main__":
    main()
