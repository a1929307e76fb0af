"""Numerical parity of ported torch weights: torch oracle modules (standard
ENeRF architecture, eval mode) vs our flax modules must agree to float
precision. This validates both the name mapping and the conv/padding
semantics (symmetric padding, transposed-conv alignment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from boostmvsnerfs_tpu.models.cost_reg_net import MinCostRegNet
from boostmvsnerfs_tpu.models.feature_net import FeatureNet
from boostmvsnerfs_tpu.models.nerf_head import NeRFHead
from boostmvsnerfs_tpu.utils import port_weights as pw


class TorchCBR(nn.Module):
    def __init__(self, cin, cout, k=3, s=1, p=1, conv=nn.Conv2d, bn=nn.BatchNorm2d):
        super().__init__()
        self.conv = conv(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = bn(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TorchFeatureNet(nn.Module):
    """Oracle: ENeRF FPN (standard architecture)."""

    def __init__(self):
        super().__init__()
        self.conv0 = nn.Sequential(TorchCBR(3, 8), TorchCBR(8, 8))
        self.conv1 = nn.Sequential(TorchCBR(8, 16, 5, 2, 2), TorchCBR(16, 16))
        self.conv2 = nn.Sequential(TorchCBR(16, 32, 5, 2, 2), TorchCBR(32, 32))
        self.toplayer = nn.Conv2d(32, 32, 1)
        self.lat1 = nn.Conv2d(16, 32, 1)
        self.lat0 = nn.Conv2d(8, 32, 1)
        self.smooth1 = nn.Conv2d(32, 16, 3, padding=1)
        self.smooth0 = nn.Conv2d(32, 8, 3, padding=1)

    def up_add(self, x, y):
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=True) + y

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        f2 = self.toplayer(c2)
        f1 = self.up_add(f2, self.lat1(c1))
        f0 = self.up_add(f1, self.lat0(c0))
        return f2, self.smooth1(f1), self.smooth0(f0)


class TorchMinCostReg(nn.Module):
    def __init__(self, cin):
        super().__init__()
        cbr = lambda i, o, s=1: TorchCBR(i, o, 3, s, 1, nn.Conv3d, nn.BatchNorm3d)
        self.conv0 = cbr(cin, 8)
        self.conv1 = cbr(8, 16, 2)
        self.conv2 = cbr(16, 16)
        self.conv3 = cbr(16, 32, 2)
        self.conv4 = cbr(32, 32)
        self.conv9 = nn.Sequential(
            nn.ConvTranspose3d(32, 16, 3, padding=1, output_padding=1,
                               stride=2, bias=False), nn.BatchNorm3d(16))
        self.conv11 = nn.Sequential(
            nn.ConvTranspose3d(16, 8, 3, padding=1, output_padding=1,
                               stride=2, bias=False), nn.BatchNorm3d(8))
        self.depth_conv = nn.Sequential(nn.Conv3d(8, 1, 3, padding=1, bias=False))
        self.feat_conv = nn.Sequential(nn.Conv3d(8, 8, 3, padding=1, bias=False))

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        x = c2 + self.conv9(c4)
        x = c0 + self.conv11(x)
        return self.feat_conv(x), self.depth_conv(x).squeeze(1)


class TorchAgg(nn.Module):
    def __init__(self, feat_ch):
        super().__init__()
        self.feat_ch = feat_ch
        self.view_fc = nn.Sequential(nn.Linear(4, feat_ch), nn.ReLU())
        self.global_fc = nn.Sequential(nn.Linear(feat_ch * 3, 32), nn.ReLU())
        self.agg_w_fc = nn.Sequential(nn.Linear(32, 1), nn.ReLU())
        self.fc = nn.Sequential(nn.Linear(32, 16), nn.ReLU())

    def forward(self, x):
        view_feat = self.view_fc(x[..., -4:])
        feat = x[..., :-4] + view_feat
        var = torch.var(feat, dim=-2, unbiased=False, keepdim=True).expand_as(feat)
        avg = torch.mean(feat, dim=-2, keepdim=True).expand_as(feat)
        g = self.global_fc(torch.cat([feat, var, avg], dim=-1))
        w = torch.softmax(self.agg_w_fc(g), dim=-2)
        return self.fc((g * w).sum(dim=-2))


class TorchNeRFHead(nn.Module):
    def __init__(self, feat_ch, hid=64):
        super().__init__()
        self.agg = TorchAgg(feat_ch)
        self.lr0 = nn.Sequential(nn.Linear(24, hid), nn.ReLU())
        self.sigma = nn.Sequential(nn.Linear(hid, 1), nn.Softplus())
        self.color = nn.Sequential(
            nn.Linear(64 + 24 + feat_ch + 4, hid), nn.ReLU(),
            nn.Linear(hid, 1), nn.ReLU(),
        )

    def forward(self, vox_feat, ifrd):
        img_feat = self.agg(ifrd)
        vi = torch.cat([vox_feat, img_feat], dim=-1)
        x = self.lr0(vi)
        sigma = self.sigma(x)
        x = torch.cat([x, vi], dim=-1)
        S = ifrd.shape[-2]
        x = x.unsqueeze(-2).expand(-1, -1, S, -1)
        x = torch.cat([x, ifrd], dim=-1)
        w = torch.softmax(self.color(x), dim=-2)
        color = (ifrd[..., -7:-4] * w).sum(dim=-2)
        return torch.cat([color, sigma], dim=-1)


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(42)


def test_feature_net_parity(rng_mod):
    tnet = TorchFeatureNet().eval()
    sd = {f"feature_net.{k}": v for k, v in tnet.state_dict().items()}
    params, stats = {}, {}
    pw.port_feature_net(sd, params, stats)

    x = rng_mod.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        t2, t1, t0 = tnet(torch.from_numpy(x))

    fnet = FeatureNet()
    variables = {"params": params["feature_net"],
                 "batch_stats": stats["feature_net"]}
    out = fnet.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(
        np.asarray(out["level_0"]), t2.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["level_1"]), t1.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["level_2"]), t0.numpy().transpose(0, 2, 3, 1),
        atol=1e-4, rtol=1e-4)


def test_min_cost_reg_parity(rng_mod):
    tnet = TorchMinCostReg(32).eval()
    sd = {f"cost_reg_0.{k}": v for k, v in tnet.state_dict().items()}
    params, stats = {}, {}
    pw.port_cost_reg(sd, params, stats, "cost_reg_0", "reg", minimal=True)

    x = rng_mod.standard_normal((1, 32, 8, 12, 16)).astype(np.float32)
    with torch.no_grad():
        tf, td = tnet(torch.from_numpy(x))

    fnet = MinCostRegNet()
    variables = {"params": params["reg"], "batch_stats": stats["reg"]}
    feat, depth = fnet.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), False
    )
    np.testing.assert_allclose(
        np.asarray(feat), tf.numpy().transpose(0, 2, 3, 4, 1),
        atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), td.numpy(), atol=2e-4,
                               rtol=1e-3)


def test_nerf_head_parity(rng_mod):
    feat_ch = 35
    tnet = TorchNeRFHead(feat_ch).eval()
    sd = {f"nerf_0.{k}": v for k, v in tnet.state_dict().items()}
    params = {}
    pw.port_nerf_head(sd, params, "nerf_0", "head")

    vox = rng_mod.standard_normal((2, 50, 8)).astype(np.float32)
    ifrd = rng_mod.standard_normal((2, 50, 3, feat_ch + 4)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(vox), torch.from_numpy(ifrd)).numpy()

    head = NeRFHead(feat_ch=feat_ch)
    out = head.apply({"params": params["head"]}, jnp.asarray(vox),
                     jnp.asarray(ifrd))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-4)


class TorchCostReg(nn.Module):
    """Full 3-down/3-up cost regularizer oracle (level >= 1)."""

    def __init__(self, cin):
        super().__init__()
        cbr = lambda i, o, s=1: TorchCBR(i, o, 3, s, 1, nn.Conv3d, nn.BatchNorm3d)
        self.conv0 = cbr(cin, 8)
        self.conv1 = cbr(8, 16, 2)
        self.conv2 = cbr(16, 16)
        self.conv3 = cbr(16, 32, 2)
        self.conv4 = cbr(32, 32)
        self.conv5 = cbr(32, 64, 2)
        self.conv6 = cbr(64, 64)
        mk_up = lambda i, o: nn.Sequential(
            nn.ConvTranspose3d(i, o, 3, padding=1, output_padding=1, stride=2,
                               bias=False), nn.BatchNorm3d(o))
        self.conv7 = mk_up(64, 32)
        self.conv9 = mk_up(32, 16)
        self.conv11 = mk_up(16, 8)
        self.depth_conv = nn.Sequential(nn.Conv3d(8, 1, 3, padding=1, bias=False))
        self.feat_conv = nn.Sequential(nn.Conv3d(8, 8, 3, padding=1, bias=False))


def test_full_enerf_port_structure():
    """Ported full-checkpoint tree must exactly match ENeRF.init's tree."""
    import jax
    from boostmvsnerfs_tpu.models.enerf import CascadeConfig, ENeRF
    from tests.helpers import make_batch

    sd = {}
    sd.update({f"feature_net.{k}": v for k, v in
               TorchFeatureNet().state_dict().items()})
    sd.update({f"cost_reg_0.{k}": v for k, v in
               TorchMinCostReg(32).state_dict().items()})
    sd.update({f"cost_reg_1.{k}": v for k, v in
               TorchCostReg(16).state_dict().items()})
    sd.update({f"nerf_0.{k}": v for k, v in
               TorchNeRFHead(35).state_dict().items()})
    sd.update({f"nerf_1.{k}": v for k, v in
               TorchNeRFHead(11).state_dict().items()})
    ported = pw.port_enerf(sd, num_levels=2)

    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in
             make_batch(rng, full_image=False, num_rays=(16, 16)).items()}
    model = ENeRF(cas=CascadeConfig(volume_planes=(16, 8)))
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    want_p = jax.tree_util.tree_structure(variables["params"])
    got_p = jax.tree_util.tree_structure(ported["params"])
    assert want_p == got_p, f"params structure mismatch:\n{want_p}\nvs\n{got_p}"
    want_s = jax.tree_util.tree_structure(variables["batch_stats"])
    got_s = jax.tree_util.tree_structure(ported["batch_stats"])
    assert want_s == got_s
    # shapes too
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(variables["params"]),
        jax.tree_util.tree_leaves_with_path(ported["params"]),
    ):
        assert a.shape == b.shape, (kp, a.shape, b.shape)

    # ported weights drive a full forward without shape errors
    out = model.apply(ported, batch, False)
    assert np.isfinite(np.asarray(out["rgb_level1"])).all()
