"""Data layer tests over synthetic on-disk fixtures."""

import os

import imageio.v2 as imageio
import numpy as np
import pytest

from boostmvsnerfs_tpu.data.base import collate
from boostmvsnerfs_tpu.data.formats import (
    parse_poses_bounds,
    read_mvsnet_cam,
    read_pfm,
    write_pfm,
)
from boostmvsnerfs_tpu.data.free import FreeDataset
from boostmvsnerfs_tpu.data.loader import Loader
from boostmvsnerfs_tpu.data.scannet import ScanNetDataset
from boostmvsnerfs_tpu.models.enerf import CascadeConfig

CAS = CascadeConfig(volume_planes=(16, 8))

H_IMG, W_IMG = 64, 96


def _write_free_scene(root, scene, n=16):
    rng = np.random.default_rng(11)
    os.makedirs(os.path.join(root, scene, "images_2"), exist_ok=True)
    pb = np.zeros((n, 17), np.float64)
    for i in range(n):
        # 3x5 pose block: [down | right | -fwd | t | hwf]
        angle = 0.2 * i
        c2w = np.eye(4)
        c2w[:3, 3] = [3 * np.sin(angle), 0.1, 3 * np.cos(angle)]
        m = np.zeros((3, 5))
        m[:3, 1] = c2w[:3, 0]
        m[:3, 0] = c2w[:3, 1]
        m[:3, 2] = -c2w[:3, 2]
        m[:3, 3] = c2w[:3, 3]
        m[0, 4], m[1, 4], m[2, 4] = H_IMG * 2, W_IMG * 2, 100.0
        pb[i, :15] = m.reshape(-1)
        pb[i, 15:] = [2.0, 8.0]
        img = rng.integers(0, 255, (H_IMG, W_IMG, 3), dtype=np.uint8)
        imageio.imwrite(os.path.join(root, scene, "images_2", f"{i:04d}.png"), img)
    np.save(os.path.join(root, scene, "poses_bounds.npy"), pb)


@pytest.fixture(scope="module")
def free_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("free"))
    _write_free_scene(root, "grass")
    return root


def test_parse_poses_bounds_roundtrip(free_root):
    c2ws, ixts, dr = parse_poses_bounds(
        os.path.join(free_root, "grass", "poses_bounds.npy")
    )
    assert c2ws.shape == (16, 4, 4) and ixts.shape == (16, 3, 3)
    np.testing.assert_allclose(dr[0], [2.0, 8.0])
    # rotation part orthonormal
    R = c2ws[3, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # focal halved for images_2
    assert ixts[0, 0, 0] == 50.0


def test_free_dataset_split_and_sample(free_root):
    test_ds = FreeDataset(free_root, "test", CAS, input_h_w=(H_IMG, W_IMG), scenes=["grass"])
    train_ds = FreeDataset(free_root, "train", CAS, input_h_w=(H_IMG, W_IMG), scenes=["grass"])
    # every 8th frame is test: ids 0 and 8 of 16
    assert len(test_ds) == 2
    assert len(train_ds) == 14
    s = test_ds.get_sample(0)
    assert s["src_inps"].shape == (3, H_IMG, W_IMG, 3)
    assert s["src_inps"].min() >= -1.0 and s["src_inps"].max() <= 1.0
    assert s["tar_ext"].shape == (4, 4)
    assert s["ray_idx_1"].shape == (H_IMG * W_IMG,)
    assert s["rgb_1"].shape == (H_IMG * W_IMG, 3)
    # source views must exclude the target and be train frames
    scene, tar, srcs = test_ds.metas[0]
    assert tar not in srcs
    assert all(v % 8 != 0 for v in srcs)


def test_free_train_ray_subsampling(free_root):
    cas = CascadeConfig(
        volume_planes=(16, 8), train_img=(False, False), num_rays=(64, 128)
    )
    ds = FreeDataset(free_root, "train", cas, input_h_w=(H_IMG, W_IMG), scenes=["grass"])
    s = ds.get_sample(0, rng=np.random.default_rng(0))
    assert s["ray_idx_0"].shape == (64,)
    assert s["ray_idx_1"].shape == (128,)
    assert s["rgb_1"].shape == (128, 3)


def test_loader_sharding_and_epochs(free_root):
    ds = FreeDataset(free_root, "train", CAS, input_h_w=(H_IMG, W_IMG), scenes=["grass"])
    l0 = Loader(ds, batch_size=1, shuffle=True, num_processes=2, process_index=0)
    l1 = Loader(ds, batch_size=1, shuffle=True, num_processes=2, process_index=1)
    assert len(l0) == 7 and len(l1) == 7
    i0 = l0._indices()
    i1 = l1._indices()
    assert set(i0).isdisjoint(set(i1))
    # epoch-seeded shuffle changes order
    l0.set_epoch(1)
    assert not np.array_equal(i0, l0._indices())

    # ep_iter wraparound
    le = Loader(ds, batch_size=1, ep_iter=20)
    batches = list(le)
    assert len(batches) == 20
    assert batches[0]["src_inps"].shape == (1, 3, H_IMG, W_IMG, 3)


def test_loader_view_count_sampling(free_root):
    ds = FreeDataset(
        free_root, "train", CAS, input_h_w=(H_IMG, W_IMG), scenes=["grass"], n_train_views=4
    )
    loader = Loader(
        ds, batch_size=1, input_views_num=[2, 3], input_views_prob=[0.5, 0.5],
        seed=3,
    )
    counts = {b["src_inps"].shape[1] for b in loader}
    assert counts <= {2, 3} and len(counts) == 2


def test_loader_pool_order_and_determinism(free_root):
    """The thread-pool loader yields batches strictly in plan order with a
    deterministic random stream regardless of worker count."""
    ds = FreeDataset(
        free_root, "train", CAS, input_h_w=(H_IMG, W_IMG), scenes=["grass"],
        n_train_views=4,
    )

    def run(workers):
        loader = Loader(
            ds, batch_size=1, shuffle=True, seed=5, num_workers=workers,
            input_views_num=[2, 3], input_views_prob=[0.5, 0.5],
        )
        return list(loader)

    a, b = run(1), run(4)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x["src_inps"].shape == y["src_inps"].shape
        np.testing.assert_array_equal(x["ray_idx_0"], y["ray_idx_0"])
        np.testing.assert_allclose(x["src_inps"], y["src_inps"])


def test_loader_image_size_sampling(free_root):
    """Per-batch random target resolution (ImageSizeBatchSampler semantics:
    sizes rounded up to the next multiple of 32, intrinsics rescaled)."""
    ds = FreeDataset(free_root, "train", CAS, input_h_w=(H_IMG, W_IMG), scenes=["grass"])
    loader = Loader(
        ds, batch_size=1, seed=1,
        image_size_meta={"strategy": "range", "min_hw": [40, 70],
                         "max_hw": [90, 120]},
    )
    sizes = set()
    base = ds.get_sample(0)
    for batch in loader:
        h, w = batch["src_inps"].shape[2], batch["src_inps"].shape[3]
        assert h % 32 == 0 and w % 32 == 0
        assert 64 <= h <= 128 and 96 <= w <= 160
        sizes.add((h, w))
        # intrinsics rescale with the resize
        s = batch["src_inps"].shape[3] / base["src_inps"].shape[2]
        np.testing.assert_allclose(
            batch["src_ixts"][0, 0, 0, 0],
            base["src_ixts"][0][0, 0] * s, rtol=1e-5,
        )
        # ray grids follow the sampled size
        assert batch["ray_idx_1"].shape[1] == h * w
    # 'origin' strategy keeps the dataset size
    loader0 = Loader(
        ds, batch_size=1,
        image_size_meta={"strategy": "origin", "min_hw": [40, 70],
                         "max_hw": [90, 120]},
    )
    b0 = next(iter(loader0))
    assert b0["src_inps"].shape[2:4] == (H_IMG, W_IMG)


def test_pfm_roundtrip(tmp_path):
    data = np.random.default_rng(0).standard_normal((8, 10)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, data)
    back, _ = read_pfm(p)
    np.testing.assert_allclose(back, data, rtol=1e-6)


def test_mvsnet_cam_file(tmp_path):
    p = str(tmp_path / "cam.txt")
    ext = np.arange(16, dtype=np.float32).reshape(4, 4)
    ixt = np.arange(9, dtype=np.float32).reshape(3, 3)
    lines = ["extrinsic"]
    lines += [" ".join(str(x) for x in row) for row in ext]
    lines += ["", "intrinsic"]
    lines += [" ".join(str(x) for x in row) for row in ixt]
    lines += ["", "425.0 2.5"]
    with open(p, "w") as f:
        f.write("\n".join(lines))
    got_ixt, got_ext, dmin = read_mvsnet_cam(p)
    np.testing.assert_allclose(got_ext, ext)
    np.testing.assert_allclose(got_ixt, ixt)
    assert dmin == 425.0


def test_scannet_dataset(tmp_path):
    root = str(tmp_path / "scannet")
    scene = "scene0000_01"
    rng = np.random.default_rng(2)
    os.makedirs(os.path.join(root, scene, "exported", "color"), exist_ok=True)
    os.makedirs(os.path.join(root, scene, "exported", "pose"), exist_ok=True)
    os.makedirs(os.path.join(root, scene, "exported", "intrinsic"), exist_ok=True)
    os.makedirs(os.path.join(root, "splits", scene), exist_ok=True)
    n = 6
    for i in range(n):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        imageio.imwrite(os.path.join(root, scene, "exported", "color", f"{i}.jpg"), img)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, 0, 2.0]
        np.savetxt(os.path.join(root, scene, "exported", "pose", f"{i}.txt"), c2w)
    np.savetxt(
        os.path.join(root, scene, "exported", "intrinsic", "intrinsic_color.txt"),
        np.array([[60.0, 0, 32, 0], [0, 60, 24, 0], [0, 0, 1, 0], [0, 0, 0, 1]]),
    )
    with open(os.path.join(root, "splits", scene, "train.txt"), "w") as f:
        f.write("\n".join(f"{i}.jpg" for i in [0, 1, 2, 4]))
    with open(os.path.join(root, "splits", scene, "test.txt"), "w") as f:
        f.write("\n".join(f"{i}.jpg" for i in [3, 5]))

    ds = ScanNetDataset(root, "test", CAS, input_h_w=(H_IMG, W_IMG),
                        scenes=[scene], split_root=os.path.join(root, "splits"))
    assert len(ds) == 2
    s = ds.get_sample(0)
    # principal point recentered
    np.testing.assert_allclose(s["tar_ixt"][0, 2], W_IMG / 2)
    np.testing.assert_allclose(s["near_far"], [0.25, 6.0])
    b = collate([s])
    assert b["src_inps"].shape == (1, 3, H_IMG, W_IMG, 3)


# ---------------------------------------------------------------------------
# train-time ray sampling (reference lib/datasets/enerf_utils.py:5-51)
# ---------------------------------------------------------------------------


def test_sample_train_pixels_uniform():
    from boostmvsnerfs_tpu.data.base import sample_train_pixels

    rng = np.random.default_rng(0)
    H, W, n = 24, 32, 100
    idx = sample_train_pixels(rng, H, W, n, np.ones((H, W), bool))
    assert idx.shape == (n,) and idx.dtype == np.int32
    assert idx.min() >= 0 and idx.max() < H * W


def test_sample_train_pixels_mask_weighted():
    """sample_on_mask: 75% of the budget (capped at 95% of the foreground)
    comes from mask pixels; the total stays num_rays (reference
    enerf_utils.py:35-45)."""
    from boostmvsnerfs_tpu.data.base import sample_train_pixels

    rng = np.random.default_rng(1)
    H, W, n = 24, 32, 100
    msk = np.zeros((H, W), bool)
    msk[5:15, 8:20] = True  # 120 fg pixels
    idx = sample_train_pixels(rng, H, W, n, msk, sample_on_mask=True)
    assert idx.shape == (n,)
    num_fg_expected = int(min(n * 0.75, msk.sum() * 0.95))  # 75
    in_mask = msk.reshape(-1)[idx]
    # the guaranteed fg draws land in-mask; uniform draws may add more
    assert in_mask.sum() >= num_fg_expected
    # tiny mask: fg capped at 95% of foreground
    msk2 = np.zeros((H, W), bool)
    msk2[0, :10] = True
    idx2 = sample_train_pixels(rng, H, W, n, msk2, sample_on_mask=True)
    assert idx2.shape == (n,)
    assert msk2.reshape(-1)[idx2].sum() >= int(10 * 0.95)


def test_sample_patch_pixels_contiguous():
    """Patches are full patch_size^2 grids, in-frame, fg-centered when the
    mask is non-empty (reference enerf_utils.py:5-23)."""
    from boostmvsnerfs_tpu.data.base import sample_patch_pixels

    rng = np.random.default_rng(2)
    H, W, np_, ps = 40, 48, 3, 8
    msk = np.zeros((H, W), bool)
    msk[10:30, 12:36] = True
    X, Y = sample_patch_pixels(rng, np_, ps, H, W, msk)
    assert X.shape == (np_ * ps * ps,)
    assert X.min() >= 0 and X.max() < W and Y.min() >= 0 and Y.max() < H
    for p in range(np_):
        xs = X[p * ps * ps:(p + 1) * ps * ps].reshape(ps, ps)
        ys = Y[p * ps * ps:(p + 1) * ps * ps].reshape(ps, ps)
        # contiguous grid rows/cols
        assert (np.diff(xs, axis=1) == 1).all()
        assert (np.diff(ys, axis=0) == 1).all()
        # center drawn from the (clipped) foreground
        cx, cy = int(xs[ps // 2, ps // 2]), int(ys[ps // 2, ps // 2])
        assert msk[np.clip(cy, 10, 29), np.clip(cx, 12, 35)]


def test_sample_train_pixels_with_patches_static_count():
    from boostmvsnerfs_tpu.data.base import sample_train_pixels

    rng = np.random.default_rng(3)
    H, W, n = 40, 48, 64
    idx = sample_train_pixels(
        rng, H, W, n, np.zeros((H, W), bool), num_patchs=2, patch_size=4
    )
    assert idx.shape == (n + 2 * 16,)
    assert idx.min() >= 0 and idx.max() < H * W
