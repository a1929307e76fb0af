"""Per-scene window auto-tuning (utils/autotune.py): endpoint-bound windows
must be exact for the scene's cameras at any depth inside [near, far]."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
from boostmvsnerfs_tpu.utils.autotune import (
    tune_cascade_windows,
    tune_img_window,
    tune_warp_window,
)
from tests.helpers import make_batch
import pytest

pytestmark = pytest.mark.slow

CAS = CascadeConfig(
    volume_planes=(16, 8), num_samples=(4, 2),
    warp_mode="windowed", eval_sampling="structured",
)


def _np_batch(rng):
    return {k: np.asarray(v) for k, v in
            make_batch(rng, full_image=True).items()}


def test_tuned_windows_cover_interior_depths(rng):
    """Windows tuned from the two depth ENDPOINTS must cover samples at
    arbitrary interior depths (projection of a segment is a segment)."""
    from boostmvsnerfs_tpu.ops import geometry, sampling

    batch = _np_batch(rng)
    w = tune_img_window(batch, CAS, 1)
    H, W = batch["src_inps"].shape[2:4]
    nf = batch["near_far"][0]
    idx = jnp.arange(H * W, dtype=jnp.int32)[None]
    xy = geometry.flat_idx_to_xy(idx, W)
    ray_o, ray_d = geometry.rays_from_pixels(
        jnp.asarray(batch["tar_ixt"]), jnp.asarray(batch["tar_ext"]), xy
    )
    # 7 interior depths, including endpoints
    zs = np.linspace(nf[0], nf[1], 7).astype(np.float32)
    pts = (ray_o[..., None, :] + ray_d[..., None, :] * zs[None, None, :, None]
           ).reshape(1, H * W * len(zs), 3)
    for s in range(batch["src_inps"].shape[1]):
        sxy, _ = geometry.project_points(
            pts, jnp.asarray(batch["src_exts"][:, s]),
            jnp.asarray(batch["src_ixts"][:, s]),
        )
        miss = sampling.sample_window_coverage(
            (H, W), sxy.reshape(H, W * len(zs), 2), w, W,
            padding_mode="border",
        )
        assert float(miss) == 0.0, (s, w)


def test_tune_cascade_windows_model_equivalence(rng):
    """The re-tuned config renders identically to generous windows."""
    batch = {k: jnp.asarray(v) for k, v in _np_batch(rng).items()}
    tuned = tune_cascade_windows(
        {k: np.asarray(v) for k, v in batch.items()}, CAS
    )
    assert tuned.pallas_window_h != CAS.pallas_window_h or (
        tuned.pallas_img_window_h != CAS.pallas_img_window_h
    ) or True  # tuning may land on the defaults for easy geometry

    model_a = ENeRF(cas=CAS)
    variables = model_a.init(jax.random.PRNGKey(0), batch, False)
    want = model_a.apply(variables, batch, False)

    model_b = ENeRF(cas=dataclasses.replace(
        tuned, warp_mode="windowed", eval_sampling="structured"
    ))
    got = model_b.apply(variables, batch, False)
    np.testing.assert_allclose(
        np.asarray(got["rgb_level1"]), np.asarray(want["rgb_level1"]),
        rtol=1e-4, atol=1e-5,
    )


def test_tune_warp_window_returns_candidate(rng):
    batch = _np_batch(rng)
    w = tune_warp_window(batch, CAS, 0)
    assert w in (8, 12, 16, 24, 32, 48, 64, 96, 128)


def test_tune_mvsnerf_windows_sound_and_monotone():
    """The MVSNeRF tuner returns candidate windows whose coverage the
    kernels' own checkers certify (margin=0 windows are already exact, so
    the margined defaults can only be larger), for every selected combo."""
    from boostmvsnerfs_tpu.models.mvsnerf import MVSNeRFConfig
    from boostmvsnerfs_tpu.utils.autotune import tune_mvsnerf_windows
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    cfg = MVSNeRFConfig(pad=8, num_samples=8, k_best=2)
    np_batch = make_scene_batch(
        B=1, n_views=4, H=64, W=96, boost=True, k_best=2, seed=0,
        render_scales=(1.0,),
    )
    np_batch["depth_ranges"] = np.tile(
        np.asarray(np_batch["near_far"], np.float32)[:, None, :], (1, 4, 1)
    )
    t0 = tune_mvsnerf_windows(np_batch, cfg, margin=0)
    t1 = tune_mvsnerf_windows(np_batch, cfg, margin=2)
    hp = 64 // 4 + 2 * cfg.pad
    assert 1 <= t0.pallas_vol_window_h <= hp
    assert 1 <= t0.pallas_vol_window_z <= cfg.num_samples
    assert t0.pallas_img_window_h >= 1
    # margin only grows windows (clamped to the volume extents)
    assert t1.pallas_vol_window_h >= min(t0.pallas_vol_window_h + 2, hp)
    assert t1.pallas_img_window_h == t0.pallas_img_window_h + 2
    # other knobs untouched
    assert t0.num_samples == cfg.num_samples
    assert t0.pad == cfg.pad


def test_calibrated_windows_render_identically():
    """Depth-calibrated sampler windows (tune_cascade_windows_calibrated)
    must not change the render: the tuned model's output equals the
    endpoint-safe model's output bit-for-bit, and the calibrated windows
    are never larger than the endpoint-safe ones."""
    from boostmvsnerfs_tpu.models.boost_enerf import BoostENeRF
    from boostmvsnerfs_tpu.utils.autotune import (
        tune_cascade_windows_calibrated,
    )
    from boostmvsnerfs_tpu.utils.init_utils import init_variables
    from boostmvsnerfs_tpu.utils.synthetic import make_scene_batch

    cas = CascadeConfig(k_best=2, volume_planes=(16, 8))
    np_batch = make_scene_batch(
        B=1, n_views=4, H=64, W=96, boost=True, k_best=2, seed=0
    )
    model = BoostENeRF(cas=cas)
    variables = init_variables(model, np_batch)
    safe = tune_cascade_windows(np_batch, cas)
    tuned = tune_cascade_windows_calibrated(np_batch, cas, variables)
    for i in range(cas.num):
        assert tuned.pallas_img_window_h[i] <= safe.pallas_img_window_h[i]

    batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
    kw = dict(eval_sampling="structured", warp_dtype="float32")
    a = BoostENeRF(cas=dataclasses.replace(safe, **kw)).apply(
        variables, batch, False
    )
    b = BoostENeRF(cas=dataclasses.replace(tuned, **kw)).apply(
        variables, batch, False
    )
    for k in ("rgb_level0", "rgb_level1"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
