"""CLI entry + visualization tests."""

import os
import sys

import jax
import numpy as np
import pytest


class TestVisu:
    def test_three_views_shape_and_range(self, rng):
        from dispu_tpu.utils.visu import point_cloud_three_views

        pts = rng.randn(200, 3).astype(np.float32)
        img = point_cloud_three_views(pts, canvas_size=100)
        assert img.shape == (100, 300)
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert img.max() > 0  # something was drawn

    def test_plot_three_views_writes_png(self, rng, tmp_path):
        from dispu_tpu.utils.visu import plot_pcd_three_views

        pcds = [rng.randn(50, 3).astype(np.float32) * 0.2 for _ in range(3)]
        path = str(tmp_path / "views.png")
        plot_pcd_three_views(path, pcds, ["a", "b", "c"])
        assert os.path.isfile(path) and os.path.getsize(path) > 1000

    def test_euler_rotation_orthonormal(self):
        from dispu_tpu.utils.visu import euler_rotation

        r = euler_rotation(0.3, -0.7, 1.2)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-10)


class TestCLI:
    def test_build_config_roundtrip(self, monkeypatch):
        import dispu

        monkeypatch.setattr(
            sys, "argv",
            ["dispu.py", "--phase", "train", "--batch_size", "4",
             "--up_ratio", "4", "--use_gan", "true", "--patch_num_point", "64"],
        )
        args = dispu.parse_args()
        cfg = dispu.build_config(args)
        assert cfg.train.batch_size == 4
        assert cfg.use_gan is True
        assert cfg.generator.num_points == 64
        assert cfg.data.h5_path.endswith("PUGAN_poisson_64_poisson_256.h5")

    def test_phase_test_end_to_end(self, monkeypatch, tmp_path, rng):
        """Restore a checkpoint and upsample a glob of xyz files via the CLI
        path (parity with ref --phase test)."""
        import dispu
        from dispu_tpu.train.state import create_generator_state
        from dispu_tpu.utils.checkpoint import save_checkpoint
        from dispu_tpu.evaluation.meshio import write_xyz

        log_dir = str(tmp_path / "log")
        monkeypatch.setattr(
            sys, "argv",
            ["dispu.py", "--phase", "test", "--log_dir", log_dir,
             "--patch_num_point", "64", "--patch_batch", "4",
             "--test_data", str(tmp_path / "*.xyz"),
             "--out_folder", str(tmp_path / "out")],
        )
        args = dispu.parse_args()
        cfg = dispu.build_config(args)

        state = create_generator_state(
            jax.random.PRNGKey(0), cfg.generator, cfg.train
        )
        save_checkpoint(log_dir, state, 5)
        write_xyz(str(tmp_path / "cloud.xyz"),
                  rng.randn(256, 3).astype(np.float32))

        dispu.run_test(args, cfg)
        out_file = str(tmp_path / "out" / "cloud_X4.xyz")
        assert os.path.isfile(out_file)
        out = np.loadtxt(out_file)
        assert out.shape == (256 * 4, 3)
