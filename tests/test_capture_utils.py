"""COLMAP database / PLY / mesh-extraction / mask-label utilities
(reference lib/utils/colmap/{database,plyfile}.py, lib/utils/mesh_utils.py,
lib/utils/mask_utils.py equivalents)."""

import numpy as np
import pytest

from boostmvsnerfs_tpu.utils import masks
from boostmvsnerfs_tpu.utils.colmap_db import (
    ColmapDB,
    pair_id,
    unpack_pair_id,
)
from boostmvsnerfs_tpu.utils.mesh import (
    extract_mesh,
    marching_tetrahedra,
    query_density_grid,
)
from boostmvsnerfs_tpu.utils.ply import read_ply, write_ply


def test_colmap_db_roundtrip(tmp_path, rng):
    path = str(tmp_path / "database.db")
    kp1 = rng.uniform(0, 640, size=(50, 2)).astype(np.float32)
    kp2 = rng.uniform(0, 640, size=(40, 2)).astype(np.float32)
    m = np.stack(
        [rng.integers(0, 50, 30), rng.integers(0, 40, 30)], 1
    ).astype(np.uint32)
    with ColmapDB.create(path) as db:
        cam = db.add_camera("PINHOLE", 640, 480,
                            [500.0, 500.0, 320.0, 240.0], prior_focal=True)
        i1 = db.add_image("a.jpg", cam)
        i2 = db.add_image("b.jpg", cam)
        db.add_keypoints(i1, kp1)
        db.add_keypoints(i2, kp2)
        db.add_matches(i1, i2, m)
        db.add_two_view_geometry(i1, i2, m)

    with ColmapDB.open(path) as db:
        cams = db.cameras()
        assert cams[cam]["model"] == 1  # PINHOLE
        assert cams[cam]["width"] == 640 and cams[cam]["prior_focal"]
        np.testing.assert_allclose(cams[cam]["params"],
                                   [500.0, 500.0, 320.0, 240.0])
        imgs = db.images()
        assert {v["name"] for v in imgs.values()} == {"a.jpg", "b.jpg"}
        np.testing.assert_array_equal(db.keypoints(i1), kp1)
        (got_i1, got_i2, got_m), = list(db.matches())
        assert (got_i1, got_i2) == (min(i1, i2), max(i1, i2))
        np.testing.assert_array_equal(got_m, m)


def test_colmap_db_pair_id_symmetric():
    assert pair_id(3, 7) == pair_id(7, 3)
    assert unpack_pair_id(pair_id(3, 7)) == (3, 7)
    # match row order flips with the id order so indices stay per-image
    assert pair_id(1, 2) != pair_id(1, 3)


def test_colmap_db_matches_flip_when_ids_reversed(tmp_path):
    path = str(tmp_path / "db.db")
    m = np.array([[0, 5], [1, 6]], np.uint32)
    with ColmapDB.create(path) as db:
        cam = db.add_camera(1, 64, 48, [50, 50, 32, 24])
        i1 = db.add_image("x.jpg", cam)
        i2 = db.add_image("y.jpg", cam)
        # store with reversed id order: columns must flip so that column 0
        # always indexes the lower image id
        db.add_matches(i2, i1, m)
    with ColmapDB.open(path) as db:
        (_, _, got), = list(db.matches())
    np.testing.assert_array_equal(got, m[:, ::-1])


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, rng, binary):
    path = str(tmp_path / "mesh.ply")
    v = rng.standard_normal((17, 3)).astype(np.float32)
    f = rng.integers(0, 17, size=(9, 3)).astype(np.int32)
    c = rng.integers(0, 256, size=(17, 3)).astype(np.uint8)
    write_ply(path, v, faces=f, colors=c, binary=binary)
    out = read_ply(path)
    got_v = np.stack(
        [out["vertex"]["x"], out["vertex"]["y"], out["vertex"]["z"]], 1
    )
    np.testing.assert_allclose(got_v, v, rtol=1e-6)
    np.testing.assert_array_equal(out["face"], f)
    got_c = np.stack(
        [out["vertex"]["red"], out["vertex"]["green"], out["vertex"]["blue"]],
        1,
    )
    np.testing.assert_array_equal(got_c, c)


def test_marching_tetrahedra_sphere():
    # signed field: inside-sphere positive; isosurface at 0 = radius 0.6
    n = 33
    ax = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = 0.6 - np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
    spacing = np.full(3, 2.0 / (n - 1), np.float32)
    verts, faces = marching_tetrahedra(vol, 0.0, spacing, (-1.0, -1.0, -1.0))
    assert len(verts) > 200 and len(faces) > 200
    r = np.linalg.norm(verts, axis=1)
    # all isosurface vertices sit near the sphere; linear interp error is
    # bounded by grid curvature
    assert abs(r.mean() - 0.6) < 0.01
    assert np.abs(r - 0.6).max() < 0.05
    assert faces.min() >= 0 and faces.max() < len(verts)
    # surface area of the triangle soup ~ 4*pi*r^2
    p = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=1
    ).sum()
    assert abs(area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.05


def test_marching_tetrahedra_empty():
    vol = np.zeros((4, 4, 4), np.float32)
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_extract_mesh_end_to_end(tmp_path):
    # density query fn mimicking the NeRF sigma head (batched points -> (M,1))
    def queryfn(pts):
        return (0.5 - np.linalg.norm(pts, axis=-1, keepdims=True))

    path = str(tmp_path / "sphere.ply")
    verts, faces = extract_mesh(
        queryfn, level=0.0, bbox=[[-1, -1, -1], [1, 1, 1]],
        output_path=path, N=24, batch=1000,
    )
    assert len(verts) > 50
    out = read_ply(path)
    assert len(out["vertex"]) == len(verts)
    np.testing.assert_array_equal(out["face"], faces)
    r = np.linalg.norm(verts, axis=1)
    assert abs(r.mean() - 0.5) < 0.02


def test_query_density_grid_layout():
    # volume[i,j,k] must correspond to (x_i, y_j, z_k) with linspace axes
    def queryfn(pts):
        return pts[:, :1]  # density = x

    vol, spacing, origin = query_density_grid(
        queryfn, [[0, 0, 0], [1, 2, 3]], N=5, batch=17
    )
    np.testing.assert_allclose(vol[:, 0, 0], np.linspace(0, 1, 5), atol=1e-6)
    np.testing.assert_allclose(vol[0], vol[0, 0, 0])
    np.testing.assert_allclose(spacing, [0.25, 0.5, 0.75])
    np.testing.assert_allclose(origin, [0, 0, 0])


def test_mask_labels():
    assert len(masks.ADE20K_LABELS) == 150
    assert masks.get_class_ids_from_labels(["person", "sky"]) == [12, 2]
    assert masks.get_label_id_mapping(use_human_mask=True) == {
        "non_person": 0, "person": 1
    }
    lm = np.array([[2, 12], [0, 2]])
    np.testing.assert_array_equal(
        masks.mask_from_labels(lm, ["sky"]),
        [[True, False], [False, True]],
    )
    np.testing.assert_array_equal(
        masks.mask_from_labels(lm, [12]), [[False, True], [False, False]]
    )
