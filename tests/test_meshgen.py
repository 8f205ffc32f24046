"""Tests for the procedural mesh corpus + Poisson-disk dataset builder
(dispu_tpu.data.meshgen) — the self-built replacement for the reference's
missing PUGAN h5 (ref:DisPU/dataset.py:52-75)."""

import numpy as np
import pytest

from dispu_tpu.data.meshgen import (
    _round_corners,
    build_h5_dataset,
    cad_revolution,
    convex_polyhedron,
    deformed_box,
    fps_numpy,
    grid_mesh,
    harmonic_sphere,
    make_corpus,
    mesh_patch_pairs,
    normalize_mesh,
    poisson_disk_sample,
    revolution_surface,
    superellipsoid,
    thin_plate,
    thin_shell,
    torus_knot_tube,
)
from dispu_tpu.evaluation.meshio import mesh_face_areas


def _check_mesh(verts, faces):
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert np.isfinite(verts).all()
    assert faces.ndim == 2 and faces.shape[1] == 3
    assert faces.min() >= 0 and faces.max() < len(verts)
    areas = mesh_face_areas(verts, faces)
    assert (areas > 1e-12).all(), "degenerate faces must be filtered"
    # every returned vertex referenced (grid_mesh compacts)
    return areas.sum()


class TestMeshBuilders:
    def test_grid_mesh_plane(self):
        lin = np.linspace(0, 1, 5)
        g = np.stack(
            list(np.meshgrid(lin, lin, indexing="ij")) + [np.zeros((5, 5))], -1
        )
        verts, faces = grid_mesh(g)
        assert len(verts) == 25
        assert len(faces) == 2 * 4 * 4
        area = mesh_face_areas(verts, faces).sum()
        np.testing.assert_allclose(area, 1.0, rtol=1e-6)

    def test_grid_mesh_wrap_closes_torus(self):
        u = np.linspace(0, 2 * np.pi, 32, endpoint=False)
        v = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        uu, vv = np.meshgrid(u, v, indexing="ij")
        R, r = 1.0, 0.3
        g = np.stack(
            [(R + r * np.cos(vv)) * np.cos(uu),
             (R + r * np.cos(vv)) * np.sin(uu),
             r * np.sin(vv)], -1)
        verts, faces = grid_mesh(g, wrap_u=True, wrap_v=True)
        area = _check_mesh(verts, faces)
        # torus area = 4 pi^2 R r (mesh slightly under, it's inscribed)
        assert abs(area - 4 * np.pi**2 * R * r) / (4 * np.pi**2 * R * r) < 0.05
        # closed mesh: every edge shared by exactly 2 faces
        edges = np.sort(
            np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]]), axis=1)
        _, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).all()

    @pytest.mark.parametrize("mesh_fn", [
        lambda: superellipsoid(0.3, 0.3, nu=48, nv=64),
        lambda: superellipsoid(1.4, 0.8, nu=48, nv=64),
        lambda: torus_knot_tube(2, 3, nu=128, nv=16),
        lambda: deformed_box(n=24, twist=1.0, taper=0.6),
        lambda: harmonic_sphere([(2, 3, 0.15), (1, 0, 0.1)], nu=48, nv=64),
        lambda: revolution_surface(
            np.array([1e-4, 0.5, 0.5, 0.8, 0.8, 0.3, 1e-4]),
            np.array([0.0, 0.0, 0.4, 0.4001, 0.8, 1.0, 1.0]), nv=48),
    ])
    def test_families_valid(self, mesh_fn):
        verts, faces = mesh_fn()
        _check_mesh(verts, faces)

    def test_normalize_mesh(self):
        verts, _ = superellipsoid(1.0, 1.0, radii=(3.0, 2.0, 1.0),
                                  nu=24, nv=32)
        nv_ = normalize_mesh(verts)
        assert abs(np.linalg.norm(nv_ - nv_.mean(0), axis=-1).max() - 1.0) < 1e-5

    def test_corpus_deterministic_and_diverse(self):
        c1 = make_corpus(5, seed=3)
        c2 = make_corpus(5, seed=3)
        assert [n for n, _ in c1] == [n for n, _ in c2]
        for (_, (v1, f1)), (_, (v2, f2)) in zip(c1, c2):
            np.testing.assert_array_equal(v1, v2)
            np.testing.assert_array_equal(f1, f2)
        # all five families appear
        prefixes = {n.split("_")[0] for n, _ in c1}
        assert len(prefixes) == 5
        for _, (v, f) in c1:
            _check_mesh(v, f)


class TestV2Families:
    """Round-5 corpus classes: flat-faceted polyhedra, CAD fillet/chamfer
    revolutions, thin plates, thin-walled shells (VERDICT r4 item 1)."""

    @pytest.mark.parametrize("mesh_fn", [
        lambda: convex_polyhedron(8, rng=np.random.RandomState(2)),
        lambda: convex_polyhedron(16, rng=np.random.RandomState(3)),
        lambda: cad_revolution(rng=np.random.RandomState(4), nv=64),
        lambda: thin_plate(rng=np.random.RandomState(5), n=24),
        lambda: thin_shell(rng=np.random.RandomState(6), nv=64),
    ])
    def test_new_families_valid(self, mesh_fn):
        verts, faces = mesh_fn()
        _check_mesh(verts, faces)

    def test_polyhedron_is_convex_with_flat_facets(self):
        verts, faces = convex_polyhedron(10, rng=np.random.RandomState(0))
        centroid = verts.mean(0)
        tri = verts[faces]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        # outward orientation, and every vertex on/behind every facet plane
        out = np.einsum("fc,fc->f", n, tri.mean(1) - centroid)
        assert (out > 0).all()
        d = verts @ n.T - np.einsum("fc,fc->f", n, tri[:, 0])[None]
        assert d.max() < 1e-5  # convexity: no vertex outside any facet

    def test_thin_plate_is_thin(self):
        verts, _ = thin_plate(rng=np.random.RandomState(1), n=24)
        verts = normalize_mesh(verts)
        # PCA: smallest extent well below the others
        c = verts - verts.mean(0)
        s = np.linalg.svd(c, compute_uv=False) / np.sqrt(len(verts))
        assert s[2] < 0.15 * s[0], s

    def test_thin_shell_has_two_walls(self):
        """A z-midheight slice crosses 2 walls: radial spread shows both
        the inner and outer surface."""
        verts, _ = thin_shell(rng=np.random.RandomState(2), nv=64)
        z = verts[:, 2]
        mid = (z > np.percentile(z, 40)) & (z < np.percentile(z, 60))
        r = np.linalg.norm(verts[mid][:, :2], axis=-1)
        wall = r.max() - r.min()
        assert 0.0 < wall < 0.25 * r.max() * 2  # thin, but two radii present
        # two distinct radius modes
        assert np.std(r) > 0.005

    def test_round_corners_modes(self):
        poly = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        sharp = _round_corners(poly, ["sharp"])
        np.testing.assert_allclose(sharp, poly)
        cham = _round_corners(poly, ["chamfer"], trim=0.1)
        assert len(cham) == 4  # corner replaced by two setback points
        np.testing.assert_allclose(cham[1], [0.9, 0.0])
        np.testing.assert_allclose(cham[2], [1.0, 0.1])
        fil = _round_corners(poly, ["fillet"], trim=0.1, arc_pts=9)
        assert len(fil) == 11
        # tangent-continuous: first/last arc points are the setbacks
        np.testing.assert_allclose(fil[1], [0.9, 0.0])
        np.testing.assert_allclose(fil[-2], [1.0, 0.1])
        # interior of the arc stays inside the corner
        assert (fil[2:-2, 0] < 1.0).all() and (fil[2:-2, 1] > 0.0).all()

    def test_round_corners_degenerate_edge_falls_back_sharp(self):
        poly = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 0.0], [2.0, 1.0]])
        out = _round_corners(poly, ["fillet", "fillet"], trim=0.1)
        assert np.isfinite(out).all()

    def test_v2_corpus_deterministic_and_has_new_classes(self):
        c1 = make_corpus(13, seed=0, families="v2")
        c2 = make_corpus(13, seed=0, families="v2")
        assert [n for n, _ in c1] == [n for n, _ in c2]
        for (_, (v1, f1)), (_, (v2, f2)) in zip(c1, c2):
            np.testing.assert_array_equal(v1, v2)
        prefixes = {n.split("_")[0].rstrip("0123456789") for n, _ in c1}
        assert {"poly", "fillet", "plate", "shell"} <= prefixes
        for _, (v, f) in c1:
            _check_mesh(v, f)

    def test_v1_stream_unchanged_by_v2_additions(self):
        """The held-out builder depends on v1 bit-stability."""
        c = make_corpus(5, seed=3, families="v1")
        assert [n for n, _ in c] == [
            "superell_00", "knot32_01", "revolve_02", "box_03", "blob_04"
        ]

    def test_unknown_family_set_raises(self):
        with pytest.raises(ValueError):
            make_corpus(1, families="v3")


class TestOffRoundtrip:
    def test_write_read_off(self, tmp_path):
        from dispu_tpu.evaluation.meshio import read_off, write_off

        verts, faces = superellipsoid(0.8, 0.8, nu=16, nv=24)
        p = str(tmp_path / "m.off")
        write_off(p, verts, faces)
        v2, f2 = read_off(p)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)


class TestPoissonDisk:
    def test_count_and_spacing(self):
        verts, faces = harmonic_sphere([(2, 2, 0.1)], nu=48, nv=64)
        n = 512
        pts = poisson_disk_sample(verts, faces, n, seed=0)
        assert pts.shape == (n, 3)
        area = mesh_face_areas(verts, faces).sum()
        # the sampler's own starting radius estimate; accepted sets are
        # spaced at >= the (possibly shrunk) dart radius
        d0 = np.sqrt(area * 0.54 * 4 / (np.pi * 1.15 * n))
        dmat = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(dmat, np.inf)
        min_spacing = dmat.min()
        assert min_spacing > 0.3 * d0, (min_spacing, d0)
        # blue noise beats iid uniform sampling's min spacing by a lot
        from dispu_tpu.evaluation.meshio import sample_mesh_surface
        rand = sample_mesh_surface(verts, faces, n, seed=5)
        rmat = np.linalg.norm(rand[:, None] - rand[None], axis=-1)
        np.fill_diagonal(rmat, np.inf)
        assert min_spacing > 4 * rmat.min()

    def test_deterministic(self):
        verts, faces = superellipsoid(0.5, 0.5, nu=32, nv=48)
        a = poisson_disk_sample(verts, faces, 256, seed=9)
        b = poisson_disk_sample(verts, faces, 256, seed=9)
        np.testing.assert_array_equal(a, b)

    def test_fps_numpy_seed0(self):
        pts = np.random.RandomState(0).randn(128, 3).astype(np.float32)
        idx = fps_numpy(pts, 16)
        assert idx[0] == 0  # seed semantics, ref:tf_sampling_g.cu:114-116
        assert len(np.unique(idx)) == 16


class TestPatchPairs:
    def test_shapes_and_radii(self):
        verts, faces = harmonic_sphere([(1, 2, 0.12)], nu=48, nv=64)
        verts = normalize_mesh(verts)
        pin, pgt = mesh_patch_pairs(
            verts, faces, patches=6, num_point=64, up_ratio=4,
            coverage=1.0 / 12.0, seed=0)
        assert pin.shape == (6, 64, 3)
        assert pgt.shape == (6, 256, 3)
        for k in range(6):
            c = pgt[k].mean(0)
            r_gt = np.linalg.norm(pgt[k] - c, axis=-1).max()
            r_in = np.linalg.norm(pin[k] - c, axis=-1).max()
            # input and gt patches cover the same surface radius (input is
            # an independent quarter-density sampling)
            assert 0.6 < r_in / r_gt < 1.6
            # patch is local: much smaller than the unit shape
            assert r_gt < 0.9

    def test_h5_roundtrip_with_loader(self, tmp_path):
        pytest.importorskip("h5py")
        meshes = make_corpus(2, seed=1)
        out = str(tmp_path / "PUGAN_poisson_64_poisson_256.h5")
        total, names = build_h5_dataset(
            out, meshes, patches_per_mesh=4, num_point=64, up_ratio=4,
            coverage=1.0 / 8.0, seed=0, verbose=False)
        assert total == 8 and len(names) == 2
        from dispu_tpu.data.dataset import PatchDataset

        ds = PatchDataset(h5_path=out, num_point=64, up_ratio=4,
                          random_input=True)
        assert len(ds) == 8
        assert ds.gt.shape == (8, 256, 3)
        # loader normalization: per-patch unit sphere
        r = np.linalg.norm(ds.gt - ds.gt.mean(1, keepdims=True),
                           axis=-1).max(1)
        np.testing.assert_allclose(r, 1.0, rtol=1e-5)
        ds2 = PatchDataset(h5_path=out, num_point=64, up_ratio=4,
                           random_input=False)
        assert ds2.inputs.shape == (8, 64, 3)
        # non-random mode ships the independent 64-point column
        assert not np.allclose(ds2.inputs[:, :64], ds2.gt[:, :64])
