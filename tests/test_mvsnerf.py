"""Smoke + semantics tests for the MVSNeRF backbone and its boost variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.models.boost_enerf import view_combinations
from boostmvsnerfs_tpu.models.boost_mvsnerf import BoostMVSNeRF
from boostmvsnerfs_tpu.models.mvsnerf import (
    MVSNeRF,
    MVSNeRFConfig,
    ndc_coords,
    positional_encoding,
    mvs_proj_mats,
)
from tests.helpers import make_batch

pytestmark = pytest.mark.slow

CFG = MVSNeRFConfig(pad=8, num_samples=8, k_best=2)

H, W = 64, 96


def _mvs_batch(rng, n_views=4, num_rays=64):
    b = make_batch(rng, S=n_views, H=H, W=W, full_image=False, num_rays=(8, num_rays))
    b["all_src_inps"] = b["src_inps"]
    b["all_src_exts"] = b["src_exts"]
    b["all_src_ixts"] = b["src_ixts"]
    b["depth_ranges"] = np.tile(
        np.array([1.5, 5.0], np.float32), (1, n_views, 1)
    )
    b["ray_idx_0"] = rng.integers(0, H * W, (1, num_rays)).astype(np.int32)
    b["rgb_0"] = rng.uniform(0, 1, (1, num_rays, 3)).astype(np.float32)
    combos = view_combinations(n_views, 3)
    b["combos"] = combos
    b["k_best"] = np.array([[0, 1]], dtype=np.int32)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_positional_encoding_shape_and_values():
    x = jnp.asarray([[0.5, 0.25, 1.0]])
    enc = positional_encoding(x, 10)
    assert enc.shape == (1, 3 + 3 * 2 * 10)
    np.testing.assert_allclose(np.asarray(enc[0, :3]), [0.5, 0.25, 1.0])
    # first sin block is sin(x * 2^0)
    np.testing.assert_allclose(
        np.asarray(enc[0, 3:6]), np.sin([0.5, 0.25, 1.0]), rtol=1e-6
    )


def test_ndc_coords_identity_camera():
    w2c = jnp.eye(4)[None]
    ixt = jnp.asarray([[10.0, 0, 5.0], [0, 10.0, 5.0], [0, 0, 1.0]])[None]
    pts = jnp.asarray([[[0.0, 0.0, 2.0], [0.0, 0.0, 6.0]]])  # on optical axis
    inv_scale = jnp.asarray([10.0, 10.0])
    uvd = ndc_coords(w2c, ixt, pts, inv_scale, 2.0, 6.0, pad=0, feat_hw=(4, 4))
    np.testing.assert_allclose(np.asarray(uvd[0, 0]), [0.5, 0.5, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(uvd[0, 1]), [0.5, 0.5, 1.0], atol=1e-6)
    # pad maps [0,1] into the interior of the padded frame
    uvd_p = ndc_coords(w2c, ixt, pts, inv_scale, 2.0, 6.0, pad=2, feat_hw=(4, 4))
    np.testing.assert_allclose(np.asarray(uvd_p[0, 0, 0]), (0.5 * 4 + 2) / 8,
                               atol=1e-6)


def test_mvs_proj_mats_identity_for_ref_view(rng):
    from tests.helpers import look_at_ext

    exts = np.stack(
        [look_at_ext(np.array([0.5 * s, 0.1, 3.0])) for s in range(3)]
    )[None]
    ixt = np.tile(
        np.array([[100.0, 0, 48], [0, 100.0, 32], [0, 0, 1]], np.float32),
        (1, 3, 1, 1),
    )
    pm = mvs_proj_mats(jnp.asarray(ixt), jnp.asarray(exts))
    np.testing.assert_allclose(
        np.asarray(pm[0, 0]), np.eye(4)[:3], atol=1e-5
    )


@pytest.fixture(scope="module")
def mvs_setup():
    rng = np.random.default_rng(9)
    batch = _mvs_batch(rng)
    model = MVSNeRF(cfg=CFG)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    return model, variables, batch


def test_mvsnerf_forward(mvs_setup):
    model, variables, batch = mvs_setup
    out = model.apply(variables, batch, False)
    N = batch["ray_idx_0"].shape[1]
    assert out["rgb_level0"].shape == (1, N, 3)
    assert out["depth_level0"].shape == (1, N)
    rgb = np.asarray(out["rgb_level0"])
    assert np.isfinite(rgb).all()
    assert rgb.min() >= 0 and rgb.max() <= 1.0


def test_boost_mvsnerf_forward(mvs_setup):
    _, _, batch = mvs_setup
    model = BoostMVSNeRF(cfg=CFG)
    variables = model.init(jax.random.PRNGKey(1), batch, False)
    out = model.apply(variables, batch, False)
    N = batch["ray_idx_0"].shape[1]
    assert out["rgb_level0"].shape == (1, N, 3)
    assert np.isfinite(np.asarray(out["rgb_level0"])).all()


def test_boost_mvsnerf_view_selection_masks(mvs_setup):
    _, _, batch = mvs_setup
    model = BoostMVSNeRF(cfg=CFG)
    variables = model.init(jax.random.PRNGKey(1), batch, False)
    full = dict(batch)
    full["ray_idx_0"] = jnp.arange(H * W, dtype=jnp.int32)[None]
    masks = model.apply(
        variables, full, batch["combos"][:2],
        method=BoostMVSNeRF.forward_view_selection,
    )
    assert masks.shape == (2, 1, H, W)
    m = np.asarray(masks)
    assert np.isfinite(m).all() and m.min() >= -1e-5 and m.max() <= 1 + 1e-5


def test_staged_mvsnerf_matches_monolithic(mvs_setup):
    """Row-block staged executor (parallel/staged.StagedMVSNeRF) must equal
    the monolithic forward for plain AND boost models, including when the
    full raster splits into multiple row blocks."""
    from boostmvsnerfs_tpu.parallel.staged import StagedMVSNeRF

    model, variables, batch = mvs_setup
    full = dict(batch)
    full["ray_idx_0"] = jnp.arange(H * W, dtype=jnp.int32)[None]
    want = model.apply(variables, full, False)
    got = StagedMVSNeRF(model, row_chunk=16)(variables, full)
    for k in want:
        # staged vs monolithic differ only by XLA fusion rounding
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-3, atol=1e-4,
            err_msg=k,
        )

    bmodel = BoostMVSNeRF(cfg=CFG)
    bvars = bmodel.init(jax.random.PRNGKey(1), full, False)
    bwant = bmodel.apply(bvars, full, False)
    bgot = StagedMVSNeRF(bmodel, row_chunk=16)(bvars, full)
    for k in bwant:
        np.testing.assert_allclose(
            np.asarray(bgot[k]), np.asarray(bwant[k]), rtol=1e-3,
            atol=1e-4, err_msg=k,
        )


def test_pallas_grouped_rows_match_gather(monkeypatch):
    """The fused-sampler eval path with depth-grouped rows
    (pallas_depth_group > 1: rows carry G*W columns) must reproduce the
    gather path — interpret-mode kernels on CPU."""
    import dataclasses

    monkeypatch.setenv("BOOST_PALLAS_FORCE", "1")
    rng = np.random.default_rng(7)
    batch = _mvs_batch(rng)
    full = dict(batch)
    full["ray_idx_0"] = jnp.arange(H * W, dtype=jnp.int32)[None]

    gather_cfg = dataclasses.replace(CFG, eval_sampling="gather")
    model = MVSNeRF(cfg=gather_cfg)
    variables = model.init(jax.random.PRNGKey(0), full, False)
    want = model.apply(variables, full, False)

    for g in (1, 4):
        # full-extent windows: the kernels are exact regardless of row
        # grouping, so this isolates the grouped-row INDEXING (coverage
        # tuning per G is tune_mvsnerf_windows' job, tested separately)
        cfg_g = dataclasses.replace(
            CFG, eval_sampling="pallas", pallas_depth_group=g,
            pallas_vol_window_h=64 // 4 + 2 * CFG.pad,
            pallas_vol_window_z=CFG.num_samples,
            pallas_img_window_h=64,
        )
        got = MVSNeRF(cfg=cfg_g).apply(variables, full, False)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]),
                rtol=2e-2, atol=2e-2, err_msg=f"{k} G={g}",
            )

    # the boost variant additionally exercises the fused path's blend
    # mask (visibility fraction reused from the sampler projections
    # instead of render.mask_viewport's re-projection) through the
    # cross-K blend of the final rgb
    bmodel = BoostMVSNeRF(cfg=dataclasses.replace(gather_cfg, k_best=2))
    bvars = bmodel.init(jax.random.PRNGKey(1), full, False)
    bwant = bmodel.apply(bvars, full, False)
    bcfg = dataclasses.replace(
        CFG, k_best=2, eval_sampling="pallas",
        pallas_vol_window_h=64 // 4 + 2 * CFG.pad,
        pallas_vol_window_z=CFG.num_samples,
        pallas_img_window_h=64,
    )
    bgot = BoostMVSNeRF(cfg=bcfg).apply(bvars, full, False)
    for k in bwant:
        np.testing.assert_allclose(
            np.asarray(bgot[k]), np.asarray(bwant[k]),
            rtol=2e-2, atol=2e-2, err_msg=f"boost {k}",
        )
