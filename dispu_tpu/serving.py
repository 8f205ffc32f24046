"""Ahead-of-time export / serving of the whole-cloud upsampler.

The reference has no deployment story — serving it means shipping the
training repo, a TF1 session, compiled CUDA ops, and a sklearn patcher,
then re-tracing the graph on every host (ref:DisPU/model.py:343-381).
This module packages the ENTIRE upsampling computation — normalize →
FPS seeds → kNN patches → chunked generator → merge FPS → un-normalize,
i.e. :class:`dispu_tpu.inference.PatchUpsampler`'s fused single-jit
pipeline — as a serialized, versioned XLA artifact via ``jax.export``:

* weights are baked in as constants (one self-contained artifact per
  checkpoint; XLA constant-folds and lays them out at load time);
* shapes are static per entry — the TPU-native design (dynamic shapes
  defeat MXU tiling); an artifact holds one compiled entry per declared
  input size, mirroring how the jit cache works in live inference;
* the serialized form is StableHLO with versioned custom-call contracts
  (jax guarantees ≥ 1 month backward / 1 week forward compatibility),
  loadable in a process with NO dispu_tpu, flax, or checkpoint code —
  ``ServedUpsampler`` needs jax only.

Platform note: kernel dispatch (Pallas vs XLA fallback) happens at trace
time by backend, so an artifact is exported FOR the platform that traces
it — export on TPU to serve on TPU (Pallas kernels are embedded as
Mosaic custom calls), export on CPU for a CPU-fallback artifact.  The
artifact records its lowering platforms and ``jax.export`` enforces them
at call time.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from dispu_tpu.config import GeneratorConfig, InferenceConfig
from dispu_tpu.inference import PatchUpsampler, plan_counts
from dispu_tpu.ops.geometry import normalize_point_cloud

_MANIFEST = "manifest.json"
_FORMAT_VERSION = 1


def _full_upsample_fn(ups: PatchUpsampler, n: int):
    """The complete (n, 3) → (n·final_ratio, 3) serving function.

    Everything ``PatchUpsampler.upsample`` does for a fixed input size,
    as one pure jittable function of the cloud alone (variables closed
    over — they serialize as constants).
    """
    inf = ups.inf_cfg
    seed_num, out_num = plan_counts(n, inf)
    bs = inf.patch_batch
    if ups.mesh_fused:
        n_dev = ups.mesh.shape["data"]
        bs = ((bs + n_dev - 1) // n_dev) * n_dev

    def fn(pc: jnp.ndarray) -> jnp.ndarray:
        pc_n, centroid, furthest = normalize_point_cloud(pc)
        out = ups._pipeline_impl(
            pc_n, seed_num=seed_num, out_num=out_num, bs=bs
        )
        return out * furthest[0] + centroid[0]

    return fn


def export_upsampler(
    variables,
    sizes: Sequence[int],
    path: str,
    gen_cfg: GeneratorConfig = GeneratorConfig(),
    inf_cfg: InferenceConfig = InferenceConfig(),
    mesh=None,
) -> Dict[str, object]:
    """Serialize the upsampler for the given input sizes into ``path``.

    Args:
      variables: trained generator variables ({'params', 'batch_stats'}).
      sizes: input point counts to compile entries for (one static-shape
        entry each; serving an undeclared size raises at load time).
      path: directory to create (manifest.json + entry_<n>.bin blobs).
      gen_cfg / inf_cfg: architecture + pipeline configuration; recorded
        in the manifest for provenance.
      mesh: optional ``jax.sharding.Mesh`` — exports the SPMD form of the
        pipeline (patch chunks sharded over the mesh's ``data`` axis;
        XLA partitions the generator and inserts the collectives).  The
        artifact then requires the same device count to load/call
        (recorded in the manifest as ``nr_devices``).

    Returns the manifest dict.
    """
    ups = PatchUpsampler(
        variables, gen_cfg=gen_cfg, inf_cfg=inf_cfg,
        mesh=mesh, mesh_fused=mesh is not None,
    )
    os.makedirs(path, exist_ok=True)
    entries = []
    for n in sorted(set(int(s) for s in sizes)):
        fn = jax.jit(_full_upsample_fn(ups, n))
        if mesh is not None:
            from dispu_tpu.parallel.mesh import replicated_sharding

            # replicated in/out; internal constraints shard the chunks
            fn = jax.jit(
                _full_upsample_fn(ups, n),
                in_shardings=replicated_sharding(mesh),
                out_shardings=replicated_sharding(mesh),
            )
        exp = jax_export.export(fn)(
            jax.ShapeDtypeStruct((n, 3), jnp.float32)
        )
        blob = exp.serialize()
        fname = f"entry_{n}.bin"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(blob)
        entries.append(
            {
                "n": n,
                "out_n": n * inf_cfg.final_ratio,
                "file": fname,
                "platforms": list(exp.platforms),
                "nr_devices": exp.nr_devices,
            }
        )
    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "dispu_tpu.upsampler",
        "final_ratio": inf_cfg.final_ratio,
        "generator_config": {
            f.name: getattr(gen_cfg, f.name)
            for f in gen_cfg.__dataclass_fields__.values()
        },
        "inference_config": {
            f.name: getattr(inf_cfg, f.name)
            for f in inf_cfg.__dataclass_fields__.values()
        },
        "entries": entries,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServedUpsampler:
    """Loaded serving artifact: deserialize once, call per cloud.

    Needs only jax at runtime (no flax / model / checkpoint code): the
    exported entries carry the weights and the whole pipeline.
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("kind") != "dispu_tpu.upsampler":
            raise ValueError(f"{path} is not an upsampler artifact")
        if self.manifest["format_version"] > _FORMAT_VERSION:
            raise ValueError(
                "artifact format %s is newer than this loader (%s)"
                % (self.manifest["format_version"], _FORMAT_VERSION)
            )
        self._path = path
        self._entries = {e["n"]: e for e in self.manifest["entries"]}
        self._calls: Dict[int, object] = {}

    @property
    def sizes(self):
        return sorted(self._entries)

    def _call_for(self, n: int):
        if n not in self._calls:
            if n not in self._entries:
                raise ValueError(
                    f"no exported entry for n={n}; artifact has "
                    f"{self.sizes} (re-export with this size included)"
                )
            with open(
                os.path.join(self._path, self._entries[n]["file"]), "rb"
            ) as f:
                exp = jax_export.deserialize(f.read())
            # jit the call so repeat invocations hit the C++ dispatch path
            nr = int(self._entries[n].get("nr_devices", 1))
            if nr > 1:
                # SPMD entry: the call must run in a matching multi-device
                # context — replicate in/out over the first nr devices
                # (needs jax only, no dispu_tpu mesh code)
                devs = jax.devices()
                if len(devs) < nr:
                    raise ValueError(
                        f"entry n={n} was exported for {nr} devices; "
                        f"only {len(devs)} visible"
                    )
                mesh = jax.sharding.Mesh(
                    np.asarray(devs[:nr]), ("data",)
                )
                rep = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                )
                self._calls[n] = jax.jit(
                    exp.call, in_shardings=rep, out_shardings=rep
                )
            else:
                self._calls[n] = jax.jit(exp.call)
        return self._calls[n]

    def warmup(self, sizes=None):
        """Deserialize + compile entries ahead of traffic (cold-start
        control; pairs with the persistent compilation cache).  Compiles
        via AOT lowering — no data moves."""
        for n in sizes if sizes is not None else self.sizes:
            self._call_for(n).lower(
                jax.ShapeDtypeStruct((n, 3), jnp.float32)
            ).compile()

    def upsample(self, pc: np.ndarray) -> np.ndarray:
        """(n, 3) cloud → (n·final_ratio, 3); n must be an exported size."""
        pc = np.asarray(pc, np.float32)[:, :3]
        return np.asarray(self._call_for(pc.shape[0])(jnp.asarray(pc)))
