"""AOT export / serving artifact tests (dispu_tpu/serving.py).

The exported entry must reproduce the live ``PatchUpsampler.upsample``
pipeline through a full serialize → write → read → deserialize round
trip, enforce its static-size contract, and carry a provenance manifest.
"""

import json
import os

import jax
import numpy as np
import pytest

from dispu_tpu.config import GeneratorConfig, InferenceConfig, TrainConfig
from dispu_tpu.inference import PatchUpsampler
from dispu_tpu.serving import ServedUpsampler, export_upsampler
from dispu_tpu.train.state import create_generator_state

GEN = GeneratorConfig(num_points=64, knn=8, refine_nsample=8)
INF = InferenceConfig(final_ratio=4, patch_num_point=64, patch_batch=4)


@pytest.fixture(scope="module")
def variables():
    state = create_generator_state(jax.random.PRNGKey(0), GEN, TrainConfig())
    return {"params": state.params, "batch_stats": state.batch_stats}


@pytest.fixture(scope="module")
def artifact(variables, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serving") / "upsampler")
    manifest = export_upsampler(
        variables, sizes=[128, 200], path=path, gen_cfg=GEN, inf_cfg=INF
    )
    return path, manifest


class TestExportedUpsampler:
    def test_round_trip_matches_live_pipeline(self, rng, variables, artifact):
        path, _ = artifact
        served = ServedUpsampler(path)
        live = PatchUpsampler(variables, gen_cfg=GEN, inf_cfg=INF)
        for n in (128, 200):
            pc = rng.randn(n, 3).astype(np.float32)
            out = served.upsample(pc)
            ref = live.upsample(pc)
            assert out.shape == (n * 4, 3)
            # same XLA computation, but the exported entry fuses the
            # normalize stage into the pipeline jit — reductions may
            # associate differently, so value-equal within float noise
            np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_manifest_provenance(self, artifact):
        path, manifest = artifact
        on_disk = json.load(open(os.path.join(path, "manifest.json")))
        # JSON round-trips config tuples to lists; normalize before comparing
        assert on_disk == json.loads(json.dumps(manifest))
        assert on_disk["kind"] == "dispu_tpu.upsampler"
        assert on_disk["generator_config"]["num_points"] == 64
        assert on_disk["inference_config"]["patch_batch"] == 4
        assert sorted(e["n"] for e in on_disk["entries"]) == [128, 200]
        for e in on_disk["entries"]:
            assert e["out_n"] == e["n"] * 4
            assert os.path.exists(os.path.join(path, e["file"]))

    def test_undeclared_size_raises(self, rng, artifact):
        path, _ = artifact
        served = ServedUpsampler(path)
        with pytest.raises(ValueError, match="no exported entry for n=77"):
            served.upsample(rng.randn(77, 3).astype(np.float32))

    def test_warmup_precompiles(self, rng, artifact):
        path, _ = artifact
        served = ServedUpsampler(path)
        served.warmup()  # all entries; must not raise and must cache
        assert sorted(served._calls) == [128, 200]
        out = served.upsample(rng.randn(128, 3).astype(np.float32))
        assert out.shape == (512, 3)

    def test_repeat_calls_reuse_deserialized_entry(self, rng, artifact):
        path, _ = artifact
        served = ServedUpsampler(path)
        pc = rng.randn(128, 3).astype(np.float32)
        a = served.upsample(pc)
        b = served.upsample(pc)  # cached jit of the deserialized call
        np.testing.assert_array_equal(a, b)
        assert len(served._calls) == 1

    def test_cli_export_phase(self, monkeypatch, tmp_path, rng):
        """`dispu.py --phase export` restores the newest checkpoint and
        writes a loadable artifact with entries for the test-glob sizes."""
        import sys

        import dispu
        from dispu_tpu.evaluation.meshio import write_xyz
        from dispu_tpu.train.state import create_generator_state
        from dispu_tpu.utils.checkpoint import save_checkpoint

        log_dir = str(tmp_path / "log")
        out = str(tmp_path / "artifact")
        monkeypatch.setattr(
            sys, "argv",
            ["dispu.py", "--phase", "export", "--log_dir", log_dir,
             "--patch_num_point", "64", "--patch_batch", "4",
             "--test_data", str(tmp_path / "*.xyz"),
             "--out_folder", out],
        )
        args = dispu.parse_args()
        cfg = dispu.build_config(args)
        state = create_generator_state(
            jax.random.PRNGKey(0), cfg.generator, cfg.train
        )
        save_checkpoint(log_dir, state, 5)
        write_xyz(str(tmp_path / "cloud.xyz"),
                  rng.randn(160, 3).astype(np.float32))

        dispu.run_export(args, cfg)
        served = ServedUpsampler(out)
        assert served.sizes == [160]
        res = served.upsample(rng.randn(160, 3).astype(np.float32))
        assert res.shape == (640, 3)
        assert np.isfinite(res).all()

    def test_spmd_export_round_trip(self, rng, variables, tmp_path):
        """Exporting with a mesh serializes the SPMD pipeline (patch
        chunks sharded over 'data'); the loaded artifact must match the
        single-device pipeline's values and record nr_devices."""
        from dispu_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        path = str(tmp_path / "spmd")
        manifest = export_upsampler(
            variables, sizes=[160], path=path,
            gen_cfg=GEN, inf_cfg=INF, mesh=mesh,
        )
        assert manifest["entries"][0]["nr_devices"] == mesh.devices.size
        served = ServedUpsampler(path)
        pc = rng.randn(160, 3).astype(np.float32)
        out = served.upsample(pc)
        ref = PatchUpsampler(variables, gen_cfg=GEN, inf_cfg=INF).upsample(pc)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def test_compile_cache_populates(self, tmp_path):
        """`--compile_cache DIR` must wire the persistent XLA cache: a
        fresh jit compile writes an entry into the directory."""
        import jax
        import jax.numpy as jnp

        import dispu

        cache = str(tmp_path / "xla_cache")
        dispu.enable_compile_cache(cache)
        try:
            # a compile unlikely to collide with other tests' cache keys
            jax.jit(lambda x: jnp.cumsum(x * 3.5) - x[::-1])(
                jnp.arange(97, dtype=jnp.float32)
            ).block_until_ready()
            assert os.listdir(cache), "no cache entry written"
        finally:
            jax.config.update("jax_compilation_cache_dir", None)

    def test_wrong_kind_rejected(self, tmp_path):
        os.makedirs(tmp_path / "bogus", exist_ok=True)
        with open(tmp_path / "bogus" / "manifest.json", "w") as f:
            json.dump({"kind": "something_else", "format_version": 1}, f)
        with pytest.raises(ValueError, match="not an upsampler artifact"):
            ServedUpsampler(str(tmp_path / "bogus"))
