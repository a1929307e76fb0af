"""MVSNeRF backbone: single padded cost volume + NDC-space NeRF MLP.

TPU-native re-design of reference lib/networks/mvsnerf/network.py:
* ``MVSFeatureNet`` — single-scale 32ch@1/4 FPN trunk with BN+LeakyReLU
  (the reference's InPlaceABN is a memory trick irrelevant under XLA;
  numerics match its default leaky_relu(0.01) activation) — reference
  network.py:695-732.
* ``MVSCostRegNet`` — 3D U-Net to an 8ch neural encoding volume
  (network.py:735-779).
* ``build_volume`` — variance cost volume over 3 views with padding and
  concatenated warped source RGB (9+32 channels), per-pixel valid-view
  counts (network.py:887-942 ``build_volume_costvar_img``).
* NDC parameterization against the reference (first) source view with
  pad-aware coordinates (lib/networks/mvsnerf/utils.py:112-146).
* ``RendererMLP`` — D=6/W=128 MLP with positional encoding (63ch),
  ``pts_bias`` feature modulation, viewdir branch (network.py:150-229
  ``Renderer_ours`` + :24-75 ``Embedder``).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from boostmvsnerfs_tpu.models.nerf_head import _DenseParams as DenseParams
from boostmvsnerfs_tpu.ops import geometry, render, sampling

kaiming = nn.initializers.kaiming_normal()


@dataclasses.dataclass(frozen=True)
class MVSNeRFConfig:
    pad: int = 24
    feat_dim: int = 8  # neural encoding volume channels
    mlp_width: int = 128
    mlp_depth: int = 6
    skips: tuple = (4,)
    pos_freqs: int = 10
    num_samples: int = 32  # depth planes AND samples per ray
    n_views: int = 3
    # renderer head: 'v0' = Renderer_ours trunk (reference default),
    # 'v2' = Renderer_linear (additive pts_bias), 'v1'/'attention' =
    # Renderer_attention, 'color_fusion' = Renderer_color_fusion
    # (reference network.py:548-567 net_type)
    net_type: str = "v0"
    near_far_scale: tuple = (0.8, 1.2)
    k_best: int = 4
    cost_volume_input_views: int = 3
    # full-raster eval sampling: 'pallas' routes the per-view color lookups
    # through the fused VMEM row-band sampler (rows ordered (h, sample, w)
    # so each row-chunk's y-band stays tight); 'gather' = XLA gathers
    eval_sampling: str = "pallas"
    pallas_img_window_h: int = 16
    # (y, z) windows of the fused trilinear volume sampler; validate per
    # camera setup with ops.pallas.tri_sample.tri_window_coverage
    pallas_vol_window_h: int = 16
    pallas_vol_window_z: int = 6
    # depth samples grouped per sampler row: rows ordered (h, d-group)
    # carry G*W columns instead of W, cutting the kernels' per-row
    # DMA/loop iterations by G at the cost of a y-window wide enough for
    # G consecutive samples' projected span (autotuned:
    # utils/autotune.tune_mvsnerf_windows searches G jointly with the
    # windows using the kernels' own coverage checkers)
    pallas_depth_group: int = 1

    @staticmethod
    def from_cfg(cfg) -> "MVSNeRFConfig":
        mv = cfg.get("mvsnerf", {}) if hasattr(cfg, "get") else {}
        cas = cfg["enerf"]["cas_config"]
        kw = {}
        if mv:
            for k in (
                "pad", "feat_dim", "mlp_width", "mlp_depth", "pos_freqs",
                "net_type",
            ):
                if k in mv:
                    kw[k] = mv[k]
            if "near_far_scale" in mv:
                kw["near_far_scale"] = tuple(mv["near_far_scale"])
        kw["num_samples"] = int(cas["num_samples"][0])
        if "k_best" in cas:
            kw["k_best"] = int(cas["k_best"])
        if "cost_volume_input_views" in cfg["enerf"]:
            kw["cost_volume_input_views"] = int(cfg["enerf"]["cost_volume_input_views"])
        return MVSNeRFConfig(**kw)


class ConvBnLeaky(nn.Module):
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = self.strides or (1,) * len(self.kernel_size)
        pad = tuple((k // 2, k // 2) for k in self.kernel_size)
        x = nn.Conv(self.features, self.kernel_size, strides,
                    padding=pad, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.leaky_relu(x, 0.01)


class DeconvBnLeaky(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features, (3, 3, 3), strides=(2, 2, 2),
                             padding=((1, 2),) * 3, transpose_kernel=True,
                             use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.leaky_relu(x, 0.01)


class MVSFeatureNet(nn.Module):
    """(N, H, W, 3) -> (N, H/4, W/4, 32)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnLeaky(8)(x, train)
        x = ConvBnLeaky(8)(x, train)
        x = ConvBnLeaky(16, (5, 5), (2, 2))(x, train)
        x = ConvBnLeaky(16)(x, train)
        x = ConvBnLeaky(16)(x, train)
        x = ConvBnLeaky(32, (5, 5), (2, 2))(x, train)
        x = ConvBnLeaky(32)(x, train)
        x = ConvBnLeaky(32)(x, train)
        return nn.Conv(32, (1, 1), name="toplayer")(x)


class MVSCostRegNet(nn.Module):
    """(B, D, H, W, C) -> (B, D, H, W, 8) neural encoding volume."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        k3 = (3, 3, 3)
        s2 = (2, 2, 2)
        conv0 = ConvBnLeaky(8, k3)(x, train)
        conv2 = ConvBnLeaky(16, k3, s2)(conv0, train)
        conv2 = ConvBnLeaky(16, k3)(conv2, train)
        conv4 = ConvBnLeaky(32, k3, s2)(conv2, train)
        conv4 = ConvBnLeaky(32, k3)(conv4, train)
        x = ConvBnLeaky(64, k3, s2)(conv4, train)
        x = ConvBnLeaky(64, k3)(x, train)
        x = conv4 + DeconvBnLeaky(32)(x, train)
        x = conv2 + DeconvBnLeaky(16)(x, train)
        x = conv0 + DeconvBnLeaky(8)(x, train)
        return x


def positional_encoding(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """[x, sin(2^k x), cos(2^k x)] for k in 0..n_freqs-1 (reference
    network.py:24-75, include_input=True, log sampling).

    Computed without any small-trailing-dim intermediate: the naive
    ``(..., F, d)`` broadcast tiles d=3 onto the 128-lane axis (125/128
    wasted per tile on TPU). Tiling x to width F*d and multiplying by the
    d-repeated frequency vector yields the identical f-major/d-minor
    element order in one wide elementwise op."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    d = x.shape[-1]
    xs = jnp.tile(x, (1,) * (x.ndim - 1) + (n_freqs,)) * jnp.repeat(freqs, d)
    return jnp.concatenate([x, jnp.sin(xs), jnp.cos(xs)], axis=-1)


class RendererMLP(nn.Module):
    """Renderer_ours (reference network.py:152-229): feature-modulated trunk
    with skip, relu alpha head, sigmoid rgb head on a viewdir branch.

    ``additive_bias=True`` selects the Renderer_linear trunk instead
    (reference network.py:471-544, net_type='v2'): identical parameter tree
    and skip concats, but each trunk layer ADDS the feature bias rather than
    multiplying by it.

    ``use_pallas=True`` routes the whole MLP through the fused VMEM kernel
    (ops/pallas/mlp.py) — same parameter tree, bf16 matmul numerics."""

    cfg: MVSNeRFConfig
    additive_bias: bool = False

    @nn.compact
    def __call__(self, pts_enc, feat, viewdirs, use_pallas: bool = False,
                 encode_in_kernel: int = 0, rows_layout: bool = False):
        W = self.cfg.mlp_width
        if use_pallas and self.additive_bias:
            use_pallas = False  # fused kernel implements the v0 trunk only
        if encode_in_kernel and not use_pallas:
            # caller shipped raw coords for in-kernel encoding but this
            # trunk runs under XLA: encode here instead
            pts_enc = positional_encoding(pts_enc, encode_in_kernel)
        if use_pallas:
            from boostmvsnerfs_tpu.ops.pallas import pallas_interpret
            from boostmvsnerfs_tpu.ops.pallas.mlp import (
                _param_list,
                fused_renderer_mlp,
                fused_renderer_mlp_rows,
            )

            depth = self.cfg.mlp_depth
            if rows_layout:
                # feat = (vox (B, R, Cv, T), col (B, V, R, Cc, T)) in the
                # channels-in-sublanes rows layout (sampler raw outputs)
                vox_rows, col_rows = feat
                P = pts_enc.shape[2] * (1 + 2 * encode_in_kernel)
                F = vox_rows.shape[2] + col_rows.shape[1] * col_rows.shape[3]
            else:
                P = (
                    pts_enc.shape[-1] * (1 + 2 * encode_in_kernel)
                    if encode_in_kernel
                    else pts_enc.shape[-1]
                )
                F = feat.shape[-1]
            dims = {"pts_bias": (F, W)}
            in_d = P
            for i in range(depth):
                dims[f"pts_{i}"] = (in_d, W)
                in_d = W + (P if i in self.cfg.skips else 0)
            dims["alpha"] = (in_d, 1)
            dims["feature"] = (in_d, W)
            dims["views_0"] = (W + 3, W // 2)
            dims["rgb"] = (W // 2, 3)
            names, _ = _param_list(
                {"params": {n: {"kernel": 0, "bias": 0} for n in dims}},
                depth,
            )
            params = {
                "params": {
                    n: dict(
                        zip(
                            ("kernel", "bias"),
                            DenseParams(dims[n][1], dims[n][0], name=n)(),
                        )
                    )
                    for n in names
                }
            }
            if rows_layout:
                return fused_renderer_mlp_rows(
                    params, pts_enc, vox_rows, col_rows, viewdirs,
                    depth=depth, skips=tuple(self.cfg.skips),
                    interpret=pallas_interpret(),
                    encode_freqs=encode_in_kernel,
                )
            return fused_renderer_mlp(
                params, pts_enc, feat, viewdirs,
                depth=depth, skips=tuple(self.cfg.skips),
                interpret=pallas_interpret(),
                encode_freqs=encode_in_kernel,
            )
        h = pts_enc
        bias = nn.Dense(W, kernel_init=kaiming, name="pts_bias")(feat)
        for i in range(self.cfg.mlp_depth):
            h = nn.Dense(W, kernel_init=kaiming, name=f"pts_{i}")(h)
            h = h + bias if self.additive_bias else h * bias
            h = nn.relu(h)
            if i in self.cfg.skips:
                h = jnp.concatenate([pts_enc, h], axis=-1)
        alpha = nn.relu(nn.Dense(1, kernel_init=kaiming, name="alpha")(h))
        feature = nn.Dense(W, kernel_init=kaiming, name="feature")(h)
        h = jnp.concatenate([feature, viewdirs], axis=-1)
        h = nn.relu(nn.Dense(W // 2, kernel_init=kaiming, name="views_0")(h))
        rgb = nn.sigmoid(nn.Dense(3, kernel_init=kaiming, name="rgb")(h))
        return jnp.concatenate([rgb, alpha], axis=-1)


class MultiHeadAttention(nn.Module):
    """Per-sample multi-head attention over the source views (reference
    lib/networks/mvsnerf/network.py:77-148): bias-free q/k/v projections,
    scaled dot-product softmax, output projection, residual + LayerNorm."""

    n_head: int
    d_model: int
    d_k: int
    d_v: int

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        nh, dk, dv = self.n_head, self.d_k, self.d_v
        B, Lq = q.shape[0], q.shape[1]
        residual = q
        qp = nn.Dense(nh * dk, use_bias=False, name="w_qs")(q)
        kp = nn.Dense(nh * dk, use_bias=False, name="w_ks")(k)
        vp = nn.Dense(nh * dv, use_bias=False, name="w_vs")(v)
        qp = jnp.swapaxes(qp.reshape(B, Lq, nh, dk), 1, 2)  # (B, nh, Lq, dk)
        kp = jnp.swapaxes(kp.reshape(B, k.shape[1], nh, dk), 1, 2)
        vp = jnp.swapaxes(vp.reshape(B, v.shape[1], nh, dv), 1, 2)
        attn = jnp.einsum("bhqd,bhkd->bhqk", qp / (dk ** 0.5), kp)
        if mask is not None:
            attn = jnp.where(mask[:, None] == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = jnp.swapaxes(out, 1, 2).reshape(B, Lq, nh * dv)
        out = nn.Dense(self.d_model, use_bias=False, name="fc")(out)
        out = nn.LayerNorm(epsilon=1e-6, name="layer_norm")(out + residual)
        return out, attn


class RendererAttention(nn.Module):
    """Renderer_attention (reference network.py:391-469, net_type='v1'):
    per-view (rgb, mask) tokens fused by view attention into a blended
    color, which also modulates the trunk bias; the trunk ADDS the bias
    (Renderer_ours multiplies) and has no skip concat. The reference
    appends its fused ``colors`` to the output twice; its compositing
    reads only raw[..., :4] (renderer.py:65-92), so only (rgb, alpha)
    are returned here."""

    cfg: MVSNeRFConfig

    @nn.compact
    def __call__(self, pts_enc, feat, viewdirs, use_pallas: bool = False,
                 encode_in_kernel: int = 0):
        del use_pallas  # fused-MLP kernel covers the v0 trunk only
        if encode_in_kernel:
            pts_enc = positional_encoding(pts_enc, encode_in_kernel)
        W = self.cfg.mlp_width
        B, N = feat.shape[0], feat.shape[1]
        feats8 = feat[..., :8]
        V = (feat.shape[-1] - 8) // 4
        colors4 = feat[..., 8:].reshape(B * N, V, 4)
        tok = jnp.concatenate(
            [
                colors4,
                jnp.broadcast_to(
                    feats8.reshape(B * N, 1, 8), (B * N, V, 8)
                ),
            ],
            axis=-1,
        )  # (B*N, V, 12) — attension_dim = 4 + 8
        tok, _ = MultiHeadAttention(4, 12, 4, 4, name="color_attention")(
            tok, tok, tok
        )
        colors = jnp.sum(
            nn.sigmoid(nn.Dense(3, name="weight_out")(tok)), axis=-2
        ).reshape(B, N, 3)

        bias = nn.Dense(W, kernel_init=kaiming, name="pts_bias")(
            jnp.concatenate([feats8, colors], axis=-1)  # 11 channels
        )
        h = pts_enc
        for i in range(self.cfg.mlp_depth):
            h = nn.Dense(W, kernel_init=kaiming, name=f"pts_{i}")(h) + bias
            h = nn.relu(h)
        alpha = nn.relu(nn.Dense(1, kernel_init=kaiming, name="alpha")(h))
        feature = nn.Dense(W, kernel_init=kaiming, name="feature")(h)
        h = jnp.concatenate([feature, viewdirs], axis=-1)
        h = nn.relu(nn.Dense(W // 2, kernel_init=kaiming, name="views_0")(h))
        rgb = nn.sigmoid(nn.Dense(3, kernel_init=kaiming, name="rgb")(h))
        return jnp.concatenate([rgb, alpha], axis=-1)


class RendererColorFusion(nn.Module):
    """Renderer_color_fusion (reference network.py:231-311): Renderer_ours
    trunk (multiplicative bias + skip), then a per-view token of
    (16-d trunk feature, per-view angle scalar, per-view rgb) fused by
    masked view attention; the per-view sigmoid colors sum to the output
    rgb."""

    cfg: MVSNeRFConfig

    @nn.compact
    def __call__(self, pts_enc, feat, viewdirs, use_pallas: bool = False,
                 encode_in_kernel: int = 0):
        del use_pallas
        if encode_in_kernel:
            pts_enc = positional_encoding(pts_enc, encode_in_kernel)
        W = self.cfg.mlp_width
        B, N = feat.shape[0], feat.shape[1]
        feats8 = feat[..., :8]
        V = (feat.shape[-1] - 8) // 4
        colors4 = feat[..., 8:].reshape(B * N, V, 4)

        bias = nn.Dense(W, kernel_init=kaiming, name="pts_bias")(feat)
        h = pts_enc
        for i in range(self.cfg.mlp_depth):
            h = nn.Dense(W, kernel_init=kaiming, name=f"pts_{i}")(h) * bias
            h = nn.relu(h)
            if i in self.cfg.skips:
                h = jnp.concatenate([pts_enc, h], axis=-1)
        alpha = nn.relu(nn.Dense(1, kernel_init=kaiming, name="alpha")(h))
        feature = nn.relu(
            nn.Dense(16, kernel_init=kaiming, name="feature")(h)
        )  # (B, N, 16)

        # per-view tokens: trunk feature + angle component + view rgb.
        # The reference reshapes the 3-d viewdir to (V, 3//V) — one direction
        # component per view token (network.py:296).
        views = viewdirs.reshape(B * N, V, -1)
        tok = jnp.concatenate(
            [
                jnp.broadcast_to(
                    feature.reshape(B * N, 1, 16), (B * N, V, 16)
                ),
                views,
                colors4[..., :3],
            ],
            axis=-1,
        )  # (B*N, V, 16 + 3//V + 3)
        tok, _ = MultiHeadAttention(
            4, tok.shape[-1], 4, 4, name="ray_attention"
        )(tok, tok, tok, mask=colors4[..., -1:])
        rgb = jnp.sum(
            nn.sigmoid(nn.Dense(3, name="rgb_out")(tok)), axis=-2
        ).reshape(B, N, 3)
        return jnp.concatenate([rgb, alpha], axis=-1)


def mvs_proj_mats(src_ixts, src_exts, feat_scale: float = 0.25) -> jnp.ndarray:
    """Source-view projections relative to the reference (first) view,
    (B, V, 3, 4) with identity for view 0 (reference network.py:1092-1114)."""
    ixts = geometry.scale_ixt(src_ixts, feat_scale)
    proj = jnp.zeros(src_exts.shape[:2] + (4, 4))
    proj = proj.at[..., 3, 3].set(1.0)
    proj = proj.at[..., :3, :].set(ixts @ src_exts[..., :3, :])
    ref_inv = jnp.linalg.inv(proj[:, :1])
    rel = proj @ ref_inv
    eye = jnp.broadcast_to(jnp.eye(4), rel[:, :1].shape)
    rel = jnp.concatenate([eye, rel[:, 1:]], axis=1)
    return rel[..., :3, :]


def ndc_coords(
    w2c_ref, ixt_ref, pts, inv_scale, near, far, pad: int, feat_hw
) -> jnp.ndarray:
    """Pad-aware NDC coordinates in the reference view, components in [0,1]
    (reference lib/networks/mvsnerf/utils.py:112-146)."""
    R = w2c_ref[..., :3, :3]
    T = w2c_ref[..., :3, 3]
    cam = pts @ jnp.swapaxes(R, -1, -2) + T[..., None, :]
    pix = cam @ jnp.swapaxes(ixt_ref, -1, -2)
    xy = pix[..., :2] / pix[..., 2:3] / inv_scale
    z = (pix[..., 2:3] - near) / (far - near)
    uvd = jnp.concatenate([xy, z], axis=-1)
    if pad > 0:
        Hf, Wf = feat_hw
        scale = jnp.asarray(
            [Wf / (Wf + 2 * pad), Hf / (Hf + 2 * pad), 1.0], jnp.float32
        )
        off = jnp.asarray(
            [pad / (Wf + 2 * pad), pad / (Hf + 2 * pad), 0.0], jnp.float32
        )
        uvd = uvd * scale + off
    return uvd


class MVSNeRF(nn.Module):
    """Single-cost-volume MVSNeRF forward (reference network.py:1092-1126)."""

    cfg: MVSNeRFConfig = MVSNeRFConfig()

    def setup(self):
        self.feature = MVSFeatureNet()
        self.cost_reg = MVSCostRegNet()
        # reference net_type dispatch (network.py:548-567): 'v0' =
        # Renderer_ours (multiplicative pts_bias), 'v2' = Renderer_linear
        # (additive pts_bias, same trunk/skips), 'v1' the view-attention
        # renderer, plus the color-fusion variant (selected explicitly in
        # the reference code)
        self.renderer = {
            "v0": lambda: RendererMLP(self.cfg),
            "v2": lambda: RendererMLP(self.cfg, additive_bias=True),
            "v1": lambda: RendererAttention(self.cfg),
            "attention": lambda: RendererAttention(self.cfg),
            "color_fusion": lambda: RendererColorFusion(self.cfg),
        }[self.cfg.net_type]()

    def extract_features(self, all_src_inps, train: bool):
        B, V, H, W, C = all_src_inps.shape
        f = self.feature(all_src_inps.reshape(B * V, H, W, C), train)
        return f.reshape(B, V, *f.shape[1:])  # (B, V, H/4, W/4, 32)

    def build_volume(self, src_inps, feats, proj_mats, depth_values, train):
        """Padded variance+RGB cost volume -> regularized 8ch volume.

        src_inps (B,V,H,W,3) in [-1,1]; feats (B,V,h,w,32);
        depth_values (B,D). Returns (B, D, h+2p, w+2p, 8).
        Reference network.py:887-942: channels = [ref RGB, warped src RGBs,
        per-pixel-count-normalized variance of features]. The RGB channels
        stay in the preprocessed [-1,1] range — the reference's
        build_volume_costvar_img warps ``batch['src_inps']`` directly
        (network.py:905-908); only the per-view color features of the
        render stage unpreprocess (network.py:990).
        """
        cfg = self.cfg
        B, V, h, w, C = feats.shape
        D = depth_values.shape[1]
        p = cfg.pad
        hp, wp = h + 2 * p, w + 2 * p

        # resize images to feature res (align_corners=False bilinear to
        # match the reference's F.interpolate default, network.py:905)
        imgs = jax.image.resize(
            src_inps, (B, V, h, w, 3), method="bilinear"
        )

        # target grid (padded): pixel coords from -pad .. h+pad-1
        grid = geometry.pixel_grid(hp, wp) - p  # (hp, wp, 2)
        ones = jnp.ones_like(grid[..., :1])
        g = jnp.concatenate([grid, ones], axis=-1)  # (hp, wp, 3)

        ref_feat = jnp.pad(feats[:, 0], ((0, 0), (p, p), (p, p), (0, 0)))
        vol_sum = jnp.broadcast_to(ref_feat[:, None], (B, D, hp, wp, C))
        vol_sq = vol_sum**2
        counts = jnp.ones((B, 1, hp, wp, 1))  # valid-view count per voxel
        counts = jnp.broadcast_to(counts, (B, D, hp, wp, 1))

        rgb_ref = jnp.pad(imgs[:, 0], ((0, 0), (p, p), (p, p), (0, 0)))
        rgb_chans = [jnp.broadcast_to(rgb_ref[:, None], (B, D, hp, wp, 3))]

        for v in range(1, V):
            pm = proj_mats[:, v]  # (B, 3, 4)
            base = jnp.einsum("hwc,brc->bhwr", g, pm[:, :, :3])
            src = base[:, None] + pm[:, None, None, None, :, 3] / depth_values[
                :, :, None, None, None
            ]  # (B, D, hp, wp, 3)
            xy = src[..., :2] / src[..., 2:3]

            from boostmvsnerfs_tpu.ops.cost_volume import (
                windowed_warp_from_coords,
            )

            def samp(img, coords):
                # windowed MXU warp (row tiles of the padded target grid)
                return windowed_warp_from_coords(
                    img,
                    coords[..., 0].reshape(D, hp, wp),
                    coords[..., 1].reshape(D, hp, wp),
                    window_h=32,
                    window_w=img.shape[1],
                ).reshape(D, hp, wp, -1)

            wf = jax.vmap(samp)(feats[:, v], xy)
            wrgb = jax.vmap(samp)(imgs[:, v], xy)
            valid = (
                (xy[..., 0] >= 0) & (xy[..., 0] <= w - 1)
                & (xy[..., 1] >= 0) & (xy[..., 1] <= h - 1)
            )[..., None].astype(jnp.float32)
            vol_sum = vol_sum + wf
            vol_sq = vol_sq + wf * wf
            counts = counts + valid
            rgb_chans.append(wrgb)

        inv_c = 1.0 / counts
        var = vol_sq * inv_c - (vol_sum * inv_c) ** 2
        volume = jnp.concatenate(rgb_chans + [var], axis=-1)  # (B,D,hp,wp,9+32)
        return self.cost_reg(volume, train)

    def _render_volume_rows(
        self, batch, volume, ray_idx, near, far, with_mask, H_rows
    ):
        """Rows-layout eval render: channels in SUBLANES end to end.

        Every per-sample tensor between ray generation and the raw
        radiance keeps the (B, R=(h, d/G), C, T=(g, w)) layout the fused
        samplers natively emit (``raw_layout``) and the rows MLP kernel
        consumes (ops/pallas/mlp.fused_renderer_mlp_rows) — no tensor
        with a small TRAILING dim is materialized in HBM, where TPU
        tiling pads it up to 128 lanes (16-40x physical waste on the
        3-20 channel glue of the flat layout; PROFILE_r05 second-flagship
        levers). Geometry (reference lib/networks/mvsnerf/utils.py:112-146
        NDC + network.py:979-1040 render_rays) matches render_volume's
        flat path: plain-division NDC, eps-clamped per-view projection,
        in-[0, W-1]x[0, H-1] color masks, visibility-fraction blend mask.
        """
        cfg = self.cfg
        B, V, H, W, _ = batch["src_inps"].shape
        D = cfg.num_samples
        h, w = H // 4, W // 4
        G = cfg.pallas_depth_group if D % cfg.pallas_depth_group == 0 else 1
        Dg, Tg = D // G, G * W
        Rr = H_rows * Dg
        N_rays = ray_idx.shape[1]

        from boostmvsnerfs_tpu.ops.pallas import pallas_interpret
        from boostmvsnerfs_tpu.ops.pallas.img_sample import fused_row_sample
        from boostmvsnerfs_tpu.ops.pallas.tri_sample import fused_tri_sample

        xy = geometry.flat_idx_to_xy(ray_idx, W)
        ray_o, ray_d = geometry.rays_from_pixels(
            batch["tar_ixt"], batch["tar_ext"], xy
        )
        t = jnp.linspace(0.0, 1.0, D)
        z_line = near[:, None] * (1.0 - t) + far[:, None] * t  # (B, D)
        z_vals = jnp.broadcast_to(z_line[:, None, :], (B, N_rays, D))

        # world samples directly in rows layout: the per-RAY origins and
        # directions transpose once ((N, 3) — tiny), the per-SAMPLE world
        # positions broadcast for free
        ro_r = jnp.swapaxes(ray_o.reshape(B, H_rows, W, 3), 2, 3)
        rd_r = jnp.swapaxes(ray_d.reshape(B, H_rows, W, 3), 2, 3)
        world_rows = (
            ro_r.reshape(B, H_rows, 1, 3, 1, W)
            + rd_r.reshape(B, H_rows, 1, 3, 1, W)
            * z_line.reshape(B, 1, Dg, 1, G, 1)
        ).reshape(B, Rr, 3, Tg)

        def cam_rows(ext, ixt):
            # camera + intrinsics matmuls contract the 3ch sublane axis
            Rm = ext[..., :3, :3]
            tm = ext[..., :3, 3]
            cam = (
                jnp.einsum("bij,brjt->brit", Rm, world_rows)
                + tm[:, None, :, None]
            )
            return jnp.einsum("bij,brjt->brit", ixt, cam)

        inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)
        pix = cam_rows(batch["src_exts"][:, 0], batch["src_ixts"][:, 0])
        # ndc_coords semantics: plain division (no depth clamp)
        xyn = pix[:, :, :2] / pix[:, :, 2:3] / inv_scale[None, None, :, None]
        nearc = near.reshape(B, 1, 1, 1)
        farc = far.reshape(B, 1, 1, 1)
        zn = (pix[:, :, 2:3] - nearc) / (farc - nearc)
        uvd_rows = jnp.concatenate([xyn, zn], axis=2)  # (B, R, 3, T)
        if cfg.pad > 0:
            p = cfg.pad
            sc = jnp.asarray(
                [w / (w + 2 * p), h / (h + 2 * p), 1.0], jnp.float32
            )
            off = jnp.asarray(
                [p / (w + 2 * p), p / (h + 2 * p), 0.0], jnp.float32
            )
            uvd_rows = (
                uvd_rows * sc[None, None, :, None] + off[None, None, :, None]
            )

        Dp, hp, wp = volume.shape[1:4]
        vox = uvd_rows * jnp.asarray(
            [wp - 1, hp - 1, Dp - 1], jnp.float32
        )[None, None, :, None]
        vox_rows = fused_tri_sample(
            volume, vox[:, :, 0], vox[:, :, 1], vox[:, :, 2],
            window_h=cfg.pallas_vol_window_h,
            window_z=cfg.pallas_vol_window_z,
            interpret=pallas_interpret(),
            raw_layout=True,
        )[..., :Tg]  # (B, R, Cv, T)

        rgbs = render.unpreprocess(batch["src_inps"])
        xs, ys, masks = [], [], []
        vis_acc = jnp.zeros((B, Rr, Tg), jnp.float32)
        for v in range(V):
            pix_v = cam_rows(batch["src_exts"][:, v], batch["src_ixts"][:, v])
            depth_v = pix_v[:, :, 2]
            xy_v = pix_v[:, :, :2] / jnp.maximum(pix_v[:, :, 2:3], 1e-6)
            xv, yv = xy_v[:, :, 0], xy_v[:, :, 1]
            in_b = (xv >= 0) & (xv <= W - 1) & (yv >= 0) & (yv <= H - 1)
            masks.append(in_b.astype(jnp.float32))
            vis_acc = vis_acc + (in_b & (depth_v > 0)).astype(jnp.float32)
            xs.append(xv)
            ys.append(yv)
        x_all = jnp.stack(xs, 1).reshape(B * V, Rr, Tg)
        y_all = jnp.stack(ys, 1).reshape(B * V, Rr, Tg)
        col = fused_row_sample(
            rgbs.reshape(B * V, H, W, 3), x_all, y_all,
            window_h=cfg.pallas_img_window_h,
            padding_mode="border",
            interpret=pallas_interpret(),
            raw_layout=True,
        )[..., :Tg].reshape(B, V, Rr, -1, Tg)
        # the sampler's zero pad channel gives way to the in-view mask:
        # feat = [vox8, rgb3+mask1 per view] matches the flat path's
        # input_feat channel order exactly
        col_rows = jnp.concatenate(
            [col[:, :, :, :3], jnp.stack(masks, 1)[:, :, :, None, :]],
            axis=3,
        )

        dirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        R_ref = batch["src_exts"][:, 0, :3, :3]
        dirs_ref = dirs @ jnp.swapaxes(R_ref, -1, -2)  # (B, N, 3)
        dirs_hw = jnp.swapaxes(
            dirs_ref.reshape(B, H_rows, W, 3), 2, 3
        )  # (B, H, 3, W) — per-ray, tiny
        dirs_rows = jnp.broadcast_to(
            dirs_hw.reshape(B, H_rows, 1, 3, 1, W),
            (B, H_rows, Dg, 3, G, W),
        ).reshape(B, Rr, 3, Tg)

        raw_rows = self.renderer(
            uvd_rows, (vox_rows, col_rows), dirs_rows, use_pallas=True,
            encode_in_kernel=cfg.pos_freqs, rows_layout=True,
        )  # (B, R, 4, T)
        raw = jnp.transpose(
            raw_rows.reshape(B, H_rows, Dg, 4, G, W), (0, 1, 5, 2, 4, 3)
        ).reshape(B, N_rays, D, 4)
        out = {"net_output": raw, "z_vals": z_vals}
        if with_mask:
            m = vis_acc.reshape(B, H_rows, Dg, G, W) / V
            out["mask"] = jax.lax.stop_gradient(
                jnp.transpose(m, (0, 1, 4, 2, 3)).reshape(B, N_rays, D)
            )
        return out

    def render_volume(
        self, batch, volume, ray_idx, near, far, train, with_mask: bool = True
    ):
        """Ray march + NDC sampling + MLP; returns raw per-sample outputs.

        Reference network.py:979-1000 ``rendering`` + :1002-1040
        ``render_rays``; no serial chunking — rays shard over the mesh.
        """
        cfg = self.cfg
        B, V, H, W, _ = batch["src_inps"].shape
        D = cfg.num_samples
        h, w = H // 4, W // 4

        xy = geometry.flat_idx_to_xy(ray_idx, W)
        ray_o, ray_d = geometry.rays_from_pixels(
            batch["tar_ixt"], batch["tar_ext"], xy
        )
        N_rays = ray_idx.shape[1]
        from boostmvsnerfs_tpu.ops import pallas as pallas_ops

        # whole raster ROWS (a row-block chunk of a full-image render, or
        # the full image) keep the row-band sampler applicable; the ray
        # pixel ids carry global coordinates so any contiguous row block
        # works (parallel/staged.StagedMVSNeRF chunks this way)
        H_rows = N_rays // W if N_rays % W == 0 else 0
        use_pallas = (
            not train
            and self.cfg.eval_sampling == "pallas"
            and H_rows > 0
            # non-TPU backends take the XLA structured/gather fallback
            # instead of Pallas interpret mode
            and pallas_ops.pallas_supported()
        )
        if use_pallas and cfg.net_type == "v0":
            # the rows pipeline covers the default head; other heads keep
            # the flat layout below (their MLPs run under XLA anyway)
            return self._render_volume_rows(
                batch, volume, ray_idx, near, far, with_mask, H_rows
            )
        G = cfg.pallas_depth_group if D % cfg.pallas_depth_group == 0 else 1

        t = jnp.linspace(0.0, 1.0, D)
        z_line = near[:, None] * (1.0 - t) + far[:, None] * t  # (B, D)
        z_vals = jnp.broadcast_to(z_line[:, None, :], (B, N_rays, D))
        inv_scale = jnp.asarray([W - 1, H - 1], jnp.float32)
        if use_pallas:
            # (h, d, w) sample order end to end: every per-sample op from
            # here to the raw radiance is pointwise, and the row samplers
            # natively consume rows=(h, d/G), cols=(g, w) — generating the
            # samples depth-major (a free broadcast) eliminates the six
            # lane-wasteful (..., D, C<=8)-trailing transposes the ray-major
            # order needs (PROFILE_r05 second-flagship levers). Only the
            # final (B, N*D, 4) raw transposes back, once.
            world_xyz = None
            pts = (
                ray_o.reshape(B, H_rows, 1, W, 3)
                + ray_d.reshape(B, H_rows, 1, W, 3)
                * z_line[:, None, :, None, None]
            ).reshape(B, N_rays * D, 3)
        else:
            world_xyz = (
                ray_o[..., None, :] + ray_d[..., None, :] * z_vals[..., None]
            )
            pts = world_xyz.reshape(B, -1, 3)

        uvd = ndc_coords(
            batch["src_exts"][:, 0],
            batch["src_ixts"][:, 0],
            pts,
            inv_scale,
            near.reshape(B, 1, 1),
            far.reshape(B, 1, 1),
            cfg.pad,
            (h, w),
        )  # (B, N*D, 3) in [0,1]

        # trilinear volume features (align-corners over padded volume)
        Dp, hp, wp = volume.shape[1:4]
        vox_xyz = uvd * jnp.asarray([wp - 1, hp - 1, Dp - 1], jnp.float32)
        if use_pallas:
            from boostmvsnerfs_tpu.ops.pallas import pallas_interpret
            from boostmvsnerfs_tpu.ops.pallas.tri_sample import (
                fused_tri_sample,
            )

            # (h, d-group, [g, w])-ordered rows keep each row's (y, z)
            # bands tight while packing G depth samples per kernel row
            # (G*W columns -> G-fold fewer per-row DMA/loop iterations);
            # vox_xyz is already (h, d, w)-ordered, so the row split is a
            # pure reshape
            c = vox_xyz.reshape(B, H_rows, D, W, 3)
            R = H_rows * (D // G)
            ray_feats = fused_tri_sample(
                volume,
                c[..., 0].reshape(B, R, G * W),
                c[..., 1].reshape(B, R, G * W),
                c[..., 2].reshape(B, R, G * W),
                window_h=cfg.pallas_vol_window_h,
                window_z=cfg.pallas_vol_window_z,
                interpret=pallas_interpret(),
            )  # (B, R, G*W, 8) — (h, d, w) order, used as-is
            ray_feats = ray_feats.reshape(B, N_rays * D, -1)
        else:
            ray_feats = jax.vmap(
                lambda vol, pts: sampling.grid_sample_3d(vol, pts, "zeros")
            )(volume, vox_xyz)  # (B, N*D, 8)

        # per-view colors + in-mask (build_color_volume, utils.py:300-332)
        rgbs = render.unpreprocess(batch["src_inps"])
        color_feats = []
        vis_acc = None
        if use_pallas:
            from boostmvsnerfs_tpu.ops.pallas import pallas_interpret
            from boostmvsnerfs_tpu.ops.pallas.img_sample import fused_row_sample

            # rows ordered (target row, sample index): the projected y-band
            # of one (h, d) row is tight, unlike (h, w*D) rows whose D
            # samples sweep the whole depth range. The per-view projection
            # is computed once and reused for the in-viewport masks (both
            # the color in-mask and, with depth > 0, the blend mask —
            # mask_viewport re-projected from scratch before).
            xs, ys, in_masks = [], [], []
            vis_acc = jnp.zeros(pts.shape[:2], jnp.float32)
            for v in range(V):
                xy_v, depth_v = geometry.project_points(
                    pts, batch["src_exts"][:, v], batch["src_ixts"][:, v],
                )
                in_b = (
                    (xy_v[..., 0] >= 0) & (xy_v[..., 0] <= W - 1)
                    & (xy_v[..., 1] >= 0) & (xy_v[..., 1] <= H - 1)
                )
                in_masks.append(in_b.astype(jnp.float32)[..., None])
                vis_acc = vis_acc + (
                    in_b & (depth_v[..., 0] > 0)
                ).astype(jnp.float32)
                c = xy_v.reshape(B, H_rows, D, W, 2)  # hdw: pure reshape
                xs.append(c[..., 0].reshape(B, H_rows * D // G, G * W))
                ys.append(c[..., 1].reshape(B, H_rows * D // G, G * W))
            x_all = jnp.stack(xs, 1).reshape(B * V, H_rows * D // G, G * W)
            y_all = jnp.stack(ys, 1).reshape(B * V, H_rows * D // G, G * W)
            imgs = rgbs.reshape(B * V, H, W, 3)
            col = fused_row_sample(
                imgs, x_all, y_all,
                window_h=self.cfg.pallas_img_window_h,
                padding_mode="border",
                interpret=pallas_interpret(),
            )  # (B*V, H_rows*D/G, G*W, 3) — (h, d, w) order, used as-is
            col = col.reshape(B, V, N_rays * D, 3)
            for v in range(V):
                color_feats.append(
                    jnp.concatenate([col[:, v], in_masks[v]], axis=-1)
                )
        else:
            for v in range(V):
                xy_v, depth_v = geometry.project_points(
                    pts, batch["src_exts"][:, v], batch["src_ixts"][:, v],
                )
                col = jax.vmap(
                    lambda img, c: sampling.grid_sample_2d(img, c, "border")
                )(rgbs[:, v], xy_v)
                in_mask = (
                    (xy_v[..., 0] >= 0) & (xy_v[..., 0] <= W - 1)
                    & (xy_v[..., 1] >= 0) & (xy_v[..., 1] <= H - 1)
                ).astype(jnp.float32)[..., None]
                color_feats.append(jnp.concatenate([col, in_mask], axis=-1))
        input_feat = jnp.concatenate([ray_feats] + color_feats, axis=-1)  # 8+4V

        # view directions in the reference camera frame (gen_dir_feature)
        dirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
        R_ref = batch["src_exts"][:, 0, :3, :3]
        dirs_ref = dirs @ jnp.swapaxes(R_ref, -1, -2)  # (B, N, 3)
        if use_pallas:
            dirs_ref = jnp.broadcast_to(
                dirs_ref.reshape(B, H_rows, 1, W, 3),
                (B, H_rows, D, W, 3),
            ).reshape(B, -1, 3)
        else:
            dirs_ref = jnp.broadcast_to(
                dirs_ref[:, :, None, :], world_xyz.shape
            ).reshape(B, -1, 3)

        if use_pallas:
            # raw uvd coords: the 63ch positional encoding is computed
            # inside the fused MLP kernel's VMEM block (ops/pallas/mlp.py
            # encode_freqs) — a samples x 63 float32 HBM round-trip gone
            raw = self.renderer(
                uvd, input_feat, dirs_ref, use_pallas=True,
                encode_in_kernel=cfg.pos_freqs,
            )
        else:
            pts_enc = positional_encoding(uvd, cfg.pos_freqs)  # (B, N*D, 63)
            raw = self.renderer(pts_enc, input_feat, dirs_ref)
        if use_pallas:
            # the one transpose back from (h, d, w) to ray-major (h, w, d)
            raw = jnp.swapaxes(
                raw.reshape(B, H_rows, D, W, 4), 2, 3
            ).reshape(B, N_rays, D, 4)
        else:
            raw = raw.reshape(B, -1, D, 4)

        out = {"net_output": raw, "z_vals": z_vals}
        if with_mask:
            if use_pallas:
                # visibility fraction from the projections computed above
                # (identical to render.mask_viewport: in-[0,1]^2 with
                # positive depth), transposed back to ray-major order
                out["mask"] = jax.lax.stop_gradient(
                    jnp.swapaxes(
                        (vis_acc / V).reshape(B, H_rows, D, W), 2, 3
                    ).reshape(B, N_rays, D)
                )
            else:
                out["mask"] = jax.lax.stop_gradient(
                    render.mask_viewport(
                        world_xyz, batch["src_exts"], batch["src_ixts"],
                        jnp.broadcast_to(inv_scale[None], (B, 2)),
                    )
                )
        return out

    def __call__(self, batch: dict, train: bool = False) -> dict:
        cfg = self.cfg
        V = cfg.n_views
        feats = self.extract_features(batch["all_src_inps"], train)

        sub = dict(batch)
        sub["src_inps"] = batch["all_src_inps"][:, :V]
        sub["src_exts"] = batch["all_src_exts"][:, :V]
        sub["src_ixts"] = batch["all_src_ixts"][:, :V]

        dr = batch["depth_ranges"][:, :V]  # (B, V, 2)
        near = jnp.min(dr[..., 0], axis=1) * cfg.near_far_scale[0]  # (B,)
        far = jnp.max(dr[..., 1], axis=1) * cfg.near_far_scale[1]

        t = jnp.linspace(0.0, 1.0, cfg.num_samples)
        depth_values = near[:, None] * (1 - t) + far[:, None] * t  # (B, D)

        pm = mvs_proj_mats(sub["src_ixts"], sub["src_exts"])
        volume = self.build_volume(
            sub["src_inps"], feats[:, :V], pm, depth_values, train
        )
        raw_out = self.render_volume(
            sub, volume, batch["ray_idx_0"], near, far, train, with_mask=False
        )
        # the reference's mvsnerf forward composits with the ENeRF
        # raw2outputs (network.py:1123-1126 imports it), whose depth map
        # softmax-normalizes the weights — not the mvsnerf renderer's raw
        # sum(weights * z) (renderer.py:85-88, an unused code path there)
        out = render.composite(
            raw_out["net_output"], raw_out["z_vals"], softmax_depth=True
        )
        return {f"{k}_level0": v for k, v in out.items()}
