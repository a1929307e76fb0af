"""Fused Pallas row-band image sampler vs the gather-based reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boostmvsnerfs_tpu.ops import sampling
from boostmvsnerfs_tpu.ops.pallas.img_sample import fused_row_sample

INTERPRET = jax.devices()[0].platform != "tpu"


def _setup(rng, V=2, H=24, W=32, C=5, R=6, T=40):
    imgs = rng.standard_normal((V, H, W, C)).astype(np.float32)
    xs = np.linspace(-3, W + 2, T)[None, None] + rng.normal(
        0, 0.3, (V, R, T)
    )
    ys = (np.arange(R) * 3.0)[None, :, None] + rng.normal(0, 1.0, (V, R, T))
    return jnp.asarray(imgs), jnp.asarray(xs.astype(np.float32)), jnp.asarray(
        ys.astype(np.float32)
    )


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_fused_row_sample_matches_gather(rng, padding_mode):
    imgs, x, y = _setup(rng)
    got = fused_row_sample(
        imgs, x, y, window_h=8, padding_mode=padding_mode,
        compute_dtype=jnp.float32, interpret=INTERPRET,
    )
    V, R, T = x.shape
    xy = jnp.stack([x, y], axis=-1).reshape(V, R * T, 2)
    want = jax.vmap(
        lambda im, c: sampling.grid_sample_2d(im, c, padding_mode)
    )(imgs, xy).reshape(V, R, T, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_row_sample_dma_band_mode(rng):
    """Images too large for VMEM residency take the HBM band-DMA path and
    must stay exact."""
    V, H, W, C, R, T = 1, 512, 640, 16, 8, 64
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    base = 100.0 + 20.0 * np.arange(R)
    xs = base[None, :, None] + np.linspace(0, 50, T)[None, None]
    ys = 40.0 + 30.0 * np.arange(R)[None, :, None] + rng.normal(
        0, 1.0, (V, R, T)
    )
    x = jnp.asarray(xs.astype(np.float32))
    y = jnp.asarray(ys.astype(np.float32))
    got = fused_row_sample(
        imgs, x, y, window_h=8, padding_mode="border",
        compute_dtype=jnp.float32, interpret=INTERPRET,
    )
    xy = jnp.stack([x, y], axis=-1).reshape(V, R * T, 2)
    want = jax.vmap(
        lambda im, c: sampling.grid_sample_2d(im, c, "border")
    )(imgs, xy).reshape(V, R, T, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_row_sample_bf16_close(rng):
    imgs, x, y = _setup(rng)
    got = fused_row_sample(
        imgs, x, y, window_h=8, padding_mode="border", interpret=INTERPRET
    )
    V, R, T = x.shape
    xc = jnp.clip(x, 0, imgs.shape[2] - 1)
    yc = jnp.clip(y, 0, imgs.shape[1] - 1)
    xy = jnp.stack([xc, yc], axis=-1).reshape(V, R * T, 2)
    want = jax.vmap(
        lambda im, c: sampling.grid_sample_2d(im, c, "border")
    )(imgs, xy).reshape(V, R, T, -1)
    err = np.abs(np.asarray(got) - np.asarray(want))
    assert err.mean() < 0.02


def test_fused_row_sample_x_window_resident(rng):
    """Per-chunk x-windows (resident mode): exact when the coverage checker
    reports zero missed taps."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import row_sample_coverage

    V, H, W, C, R, T = 2, 48, 512, 5, 6, 128
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    # rows hover around different x bands, each spanning < 100 columns
    base = 140.0 + 37.0 * np.arange(R) % 250
    xs = base[None, :, None] + np.linspace(0, 90, T)[None, None] + rng.normal(
        0, 0.5, (V, R, T)
    )
    ys = 3.0 * np.arange(R)[None, :, None] + rng.normal(0, 0.3, (V, R, T))
    x = jnp.asarray(xs.astype(np.float32))
    y = jnp.asarray(ys.astype(np.float32))
    # the 128-lane-aligned origin can start up to 127 columns before the
    # span, so the window must cover span + alignment slack
    miss = row_sample_coverage((H, W, C), x, y, 8, 256, "border")
    assert float(miss) == 0.0
    got = fused_row_sample(
        imgs, x, y, window_h=8, padding_mode="border",
        compute_dtype=jnp.float32, interpret=INTERPRET, window_w=256,
    )
    xy = jnp.stack([x, y], axis=-1).reshape(V, R * T, 2)
    want = jax.vmap(
        lambda im, c: sampling.grid_sample_2d(im, c, "border")
    )(imgs, xy).reshape(V, R, T, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_row_sample_x_window_dma(rng):
    """x-windows compose with the HBM band-DMA mode."""
    V, H, W, C, R, T = 1, 512, 640, 16, 8, 64
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    base = 100.0 + 20.0 * np.arange(R)
    xs = base[None, :, None] + np.linspace(0, 50, T)[None, None]
    ys = 40.0 + 30.0 * np.arange(R)[None, :, None] + rng.normal(
        0, 1.0, (V, R, T)
    )
    x = jnp.asarray(xs.astype(np.float32))
    y = jnp.asarray(ys.astype(np.float32))
    got = fused_row_sample(
        imgs, x, y, window_h=8, padding_mode="border",
        compute_dtype=jnp.float32, interpret=INTERPRET, window_w=256,
    )
    xy = jnp.stack([x, y], axis=-1).reshape(V, R * T, 2)
    want = jax.vmap(
        lambda im, c: sampling.grid_sample_2d(im, c, "border")
    )(imgs, xy).reshape(V, R, T, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_row_sample_coverage_flags_narrow_x_window(rng):
    """Coverage must report misses when the x span exceeds the window (the
    aligned origin can also end the window early — checked implicitly)."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import row_sample_coverage

    H, W, C, R, T = 48, 512, 5, 4, 128
    xs = 100.0 + np.linspace(0, 300, T)[None, None] * np.ones((1, R, 1))
    ys = 3.0 * np.arange(R)[None, :, None] * np.ones((1, 1, T))
    x = jnp.asarray(xs.astype(np.float32))
    y = jnp.asarray(ys.astype(np.float32))
    assert float(row_sample_coverage((H, W, C), x, y, 8, 128, "border")) > 0
    assert float(row_sample_coverage((H, W, C), x, y, 8, 0, "border")) == 0.0


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_fused_row_sample_diff_grads_match_gather(rng, padding_mode):
    """Custom-VJP backward kernel vs autodiff through the gather oracle:
    gradients to the images AND to the projected coordinates must agree."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import fused_row_sample_diff

    imgs, x, y = _setup(rng)
    # keep coordinates off integer lattice points (the triangle-weight kink)
    x = x + 0.17
    y = y + 0.23
    V, R, T = x.shape
    w = jnp.asarray(
        np.random.default_rng(7).standard_normal((V, R, T, imgs.shape[-1])),
        jnp.float32,
    )

    def loss_fused(im, xx, yy):
        out = fused_row_sample_diff(
            im, xx, yy, 8, padding_mode, INTERPRET, 0
        )
        return jnp.sum(out * w)

    def loss_oracle(im, xx, yy):
        xy = jnp.stack([xx, yy], axis=-1).reshape(V, R * T, 2)
        out = jax.vmap(
            lambda i, c: sampling.grid_sample_2d(i, c, padding_mode)
        )(im, xy).reshape(V, R, T, -1)
        return jnp.sum(out * w)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(imgs, x, y)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(imgs, x, y)
    for a, b, name in zip(g_f, g_o, ("d_imgs", "d_x", "d_y")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_fused_row_sample_diff_grads_bwd_chunk_not_dividing_fwd(rng):
    """Regression (r3 advisor, high): the backward's smaller VMEM budget
    used to pick a column chunk (384) that did not divide the forward's
    (640). With window_w active, a backward chunk straddling a forward
    chunk boundary computed its x-window origin over a wider coordinate
    range and silently dropped valid taps, corrupting d_imgs. The backward
    chunk must be a divisor of the forward chunk so each backward chunk is
    a sub-range of one coverage-validated forward chunk.

    Geometry: C=3 -> Cp=4, window_h=57 -> window_k=60, whC=240, T=1920:
    fwd budget 2**20//960=1092 -> Tc_f=640; bwd budget 546 -> the buggy
    independent pick was 384. Per-fwd-chunk x bases jump (300, 60, 300) so
    the straddling [384,768) chunk's min-x window misses the x~300 taps.
    """
    from boostmvsnerfs_tpu.ops.pallas.img_sample import (
        fused_row_sample_diff,
        row_sample_coverage,
    )

    V, H, W, C, R, T = 1, 128, 512, 3, 4, 1920
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    bases = np.repeat(np.array([300.0, 60.0, 300.0]), 640)  # per fwd chunk
    xs = bases[None, None, :] + rng.normal(0, 0.4, (V, R, T))
    ys = 20.0 + 8.0 * np.arange(R)[None, :, None] + rng.normal(
        0, 0.5, (V, R, T)
    )
    x = jnp.asarray(xs.astype(np.float32)) + 0.17
    y = jnp.asarray(ys.astype(np.float32)) + 0.23
    # forward-chunk coverage must be clean — the bug is bwd-only
    assert float(
        row_sample_coverage((H, W, C), x, y, 57, 256, "border")
    ) == 0.0
    w = jnp.asarray(
        np.random.default_rng(11).standard_normal((V, R, T, C)), jnp.float32
    )

    def loss_fused(im, xx, yy):
        out = fused_row_sample_diff(im, xx, yy, 57, "border", INTERPRET, 256)
        return jnp.sum(out * w)

    def loss_oracle(im, xx, yy):
        xy = jnp.stack([xx, yy], axis=-1).reshape(V, R * T, 2)
        out = jax.vmap(
            lambda i, c: sampling.grid_sample_2d(i, c, "border")
        )(im, xy).reshape(V, R, T, -1)
        return jnp.sum(out * w)

    np.testing.assert_allclose(
        np.asarray(loss_fused(imgs, x, y)),
        np.asarray(loss_oracle(imgs, x, y)),
        rtol=1e-4,
    )
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(imgs, x, y)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(imgs, x, y)
    for a, b, name in zip(g_f, g_o, ("d_imgs", "d_x", "d_y")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_fused_row_sample_diff_grads_x_window(rng):
    """Gradient parity with the per-chunk x-window active (dynamic-lane
    scatter into the gradient band)."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import (
        fused_row_sample_diff,
        row_sample_coverage,
    )

    V, H, W, C, R, T = 1, 64, 512, 5, 4, 128
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    xs = 90.0 + np.linspace(0, 60, T)[None, None] + rng.normal(
        0, 0.2, (V, R, T)
    )
    ys = 10.0 + 4.0 * np.arange(R)[None, :, None] + rng.normal(
        0, 0.5, (V, R, T)
    )
    x = jnp.asarray(xs.astype(np.float32)) + 0.17
    y = jnp.asarray(ys.astype(np.float32)) + 0.23
    assert float(
        row_sample_coverage((H, W, C), x, y, 16, 256, "border")
    ) == 0.0
    w = jnp.asarray(
        np.random.default_rng(3).standard_normal((V, R, T, C)), jnp.float32
    )

    def loss_fused(im, xx, yy):
        out = fused_row_sample_diff(im, xx, yy, 16, "border", INTERPRET, 256)
        return jnp.sum(out * w)

    def loss_oracle(im, xx, yy):
        xy = jnp.stack([xx, yy], axis=-1).reshape(V, R * T, 2)
        out = jax.vmap(
            lambda i, c: sampling.grid_sample_2d(i, c, "border")
        )(im, xy).reshape(V, R, T, -1)
        return jnp.sum(out * w)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(imgs, x, y)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(imgs, x, y)
    for a, b, name in zip(g_f, g_o, ("d_imgs", "d_x", "d_y")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_fused_row_sample_chunked_band_tight_y_window(rng):
    """Chunked-band DMA mode (non-resident image + x-window): per-chunk y
    origins admit a y-window that row-level banding could NOT cover —
    each canonical chunk's y-span is small while the whole row's span is
    large. Exact when row_sample_coverage (per-chunk aware) reports 0."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import row_sample_coverage

    V, H, W, C, R, T = 1, 512, 640, 16, 6, 512
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    # x drifts slowly; y advances steeply ACROSS the row: per-(128-col)
    # chunk y-span ~12 rows, whole-row span ~200 rows
    xs = 90.0 + np.linspace(0, 60, T)[None, None] + rng.normal(
        0, 0.3, (V, R, T)
    )
    ys = (
        60.0
        + 20.0 * np.arange(R)[None, :, None]
        + np.linspace(0, 200, T)[None, None]
        + rng.normal(0, 0.5, (V, R, T))
    )
    x = jnp.asarray(xs.astype(np.float32))
    y = jnp.asarray(ys.astype(np.float32))
    # whC = 16*16=256 -> canonical Tc = 512: spans ~100 y rows/chunk; use
    # Tc-sized window 128 (fits), whole row (~200) would not fit 128
    wh = 128
    assert float(row_sample_coverage(
        (H, W, C), x, y, wh, 256, "border", chunk_bands=True
    )) == 0.0
    got = fused_row_sample(
        imgs, x, y, window_h=wh, padding_mode="border",
        compute_dtype=jnp.float32, interpret=INTERPRET, window_w=256,
        chunk_bands=True,
    )
    xy = jnp.stack([x, y], axis=-1).reshape(V, R * T, 2)
    want = jax.vmap(
        lambda im, c: sampling.grid_sample_2d(im, c, "border")
    )(imgs, xy).reshape(V, R, T, -1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_fused_row_sample_diff_grads_chunked_band(rng):
    """Gradient parity in the chunked-band mode (f32 non-resident image +
    x-window): the backward's per-chunk band RMW must reproduce the
    gather-path gradients."""
    from boostmvsnerfs_tpu.ops.pallas.img_sample import (
        fused_row_sample_diff,
        row_sample_coverage,
    )

    V, H, W, C, R, T = 1, 512, 640, 16, 3, 256
    imgs = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    xs = 120.0 + np.linspace(0, 50, T)[None, None] + rng.normal(
        0, 0.3, (V, R, T)
    )
    ys = (
        80.0
        + 30.0 * np.arange(R)[None, :, None]
        + np.linspace(0, 40, T)[None, None]
        + rng.normal(0, 0.4, (V, R, T))
    )
    x = jnp.asarray(xs.astype(np.float32)) + 0.17
    y = jnp.asarray(ys.astype(np.float32)) + 0.23
    wh = 64
    assert float(row_sample_coverage(
        (H, W, C), x, y, wh, 256, "border", chunk_bands=True
    )) == 0.0
    w = jnp.asarray(
        np.random.default_rng(5).standard_normal((V, R, T, C)), jnp.float32
    )

    def loss_fused(im, xx, yy):
        out = fused_row_sample_diff(
            im, xx, yy, wh, "border", INTERPRET, 256, True
        )
        return jnp.sum(out * w)

    def loss_oracle(im, xx, yy):
        xy = jnp.stack([xx, yy], axis=-1).reshape(V, R * T, 2)
        out = jax.vmap(
            lambda i, c: sampling.grid_sample_2d(i, c, "border")
        )(im, xy).reshape(V, R, T, -1)
        return jnp.sum(out * w)

    np.testing.assert_allclose(
        np.asarray(loss_fused(imgs, x, y)),
        np.asarray(loss_oracle(imgs, x, y)),
        rtol=1e-4,
    )
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(imgs, x, y)
    g_o = jax.grad(loss_oracle, argnums=(0, 1, 2))(imgs, x, y)
    for a, b, name in zip(g_f, g_o, ("d_imgs", "d_x", "d_y")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )
