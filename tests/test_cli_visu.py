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

    def test_reference_flag_surface(self, monkeypatch):
        """Every flag the reference declares (ref:DisPU/configs.py:9-44)
        parses here, and the ones with live config destinations land."""
        import dispu

        ref_flags = {
            "--phase": "train", "--log_dir": "log", "--data_dir": "data",
            "--augment": "true", "--more_up": "0",
            "--training_epoch": "401", "--batch_size": "28",
            "--random": "true", "--jitter": "false",
            "--jitter_sigma": "0.01", "--jitter_max": "0.03",
            "--up_ratio": "4", "--final_ratio": "4",
            "--patch_num_point": "256", "--patch_num_ratio": "3",
            "--base_lr_d": "0.0001", "--base_lr_g": "0.001",
            "--beta": "0.9", "--lr_decay": "true", "--decay_step": "30",
            "--start_decay_step": "40", "--lr_decay_steps": "40",
            "--lr_decay_rate": "0.7", "--lr_clip": "1e-6",
            "--steps_per_print": "50", "--visulize": "true",
            "--steps_per_visu": "7", "--epoch_per_save": "20",
            "--use_repulse": "true", "--repulsion_w": "1.0",
            "--fidelity_w": "55.0", "--uniform_w": "11.0",
            "--gan_w": "2.5", "--gen_update": "2",
        }
        argv = ["dispu.py"]
        for name, val in ref_flags.items():
            argv += [name, val]
        monkeypatch.setattr(sys, "argv", argv)
        args = dispu.parse_args()  # unknown flag would SystemExit here
        cfg = dispu.build_config(args)
        assert cfg.train.visualize is True
        assert cfg.train.steps_per_visu == 7
        assert cfg.loss.fidelity_w == 55.0
        assert cfg.loss.uniform_w == 11.0
        assert cfg.loss.gan_w == 2.5

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

    def test_phase_test_stream_batch(self, monkeypatch, tmp_path, rng):
        """--stream_batch groups same-size clouds through upsample_many
        (the round-5 streaming surface); odd sizes fall back per-cloud."""
        import dispu
        from dispu_tpu.train.state import create_generator_state
        from dispu_tpu.utils.checkpoint import save_checkpoint
        from dispu_tpu.evaluation.meshio import write_xyz

        log_dir = str(tmp_path / "log")
        for name, n in (("a", 256), ("b", 256), ("c", 200)):
            write_xyz(str(tmp_path / f"{name}.xyz"),
                      rng.randn(n, 3).astype(np.float32))
        monkeypatch.setattr(
            sys, "argv",
            ["dispu.py", "--phase", "test", "--log_dir", log_dir,
             "--patch_num_point", "64", "--patch_batch", "4",
             "--stream_batch", "2",
             "--test_data", str(tmp_path / "*.xyz"),
             "--out_folder", str(tmp_path / "out")],
        )
        args = dispu.parse_args()
        cfg = dispu.build_config(args)
        state = create_generator_state(
            jax.random.PRNGKey(0), cfg.generator, cfg.train
        )
        save_checkpoint(log_dir, state, 5)
        dispu.run_test(args, cfg)
        for name, n in (("a", 256), ("b", 256), ("c", 200)):
            out = np.loadtxt(str(tmp_path / "out" / f"{name}_X4.xyz"))
            assert out.shape == (n * 4, 3), name
            assert np.isfinite(out).all()
