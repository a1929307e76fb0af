"""MVSNeRF weight-porting parity: torch oracles vs flax modules."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from boostmvsnerfs_tpu.models.mvsnerf import (
    MVSCostRegNet,
    MVSFeatureNet,
    MVSNeRFConfig,
    RendererMLP,
    positional_encoding,
)
from boostmvsnerfs_tpu.utils import port_weights as pw


class TorchCBL(nn.Module):
    """Conv + BN + leaky_relu(0.01): InPlaceABN numerics, out-of-place."""

    def __init__(self, cin, cout, k=3, s=1, p=1, conv=nn.Conv2d,
                 bn=nn.BatchNorm2d):
        super().__init__()
        self.conv = conv(cin, cout, k, stride=s, padding=p, bias=False)
        self.bn = bn(cout)

    def forward(self, x):
        return F.leaky_relu(self.bn(self.conv(x)), 0.01)


class TorchMVSFeature(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = nn.Sequential(TorchCBL(3, 8), TorchCBL(8, 8))
        self.conv1 = nn.Sequential(
            TorchCBL(8, 16, 5, 2, 2), TorchCBL(16, 16), TorchCBL(16, 16))
        self.conv2 = nn.Sequential(
            TorchCBL(16, 32, 5, 2, 2), TorchCBL(32, 32), TorchCBL(32, 32))
        self.toplayer = nn.Conv2d(32, 32, 1)

    def forward(self, x):
        return self.toplayer(self.conv2(self.conv1(self.conv0(x))))


class TorchMVSCostReg(nn.Module):
    def __init__(self, cin):
        super().__init__()
        cbl = lambda i, o, s=1: TorchCBL(i, o, 3, s, 1, nn.Conv3d, nn.BatchNorm3d)
        self.conv0 = cbl(cin, 8)
        self.conv1 = cbl(8, 16, 2)
        self.conv2 = cbl(16, 16)
        self.conv3 = cbl(16, 32, 2)
        self.conv4 = cbl(32, 32)
        self.conv5 = cbl(32, 64, 2)
        self.conv6 = cbl(64, 64)
        up = lambda i, o: nn.Sequential(
            nn.ConvTranspose3d(i, o, 3, padding=1, output_padding=1, stride=2,
                               bias=False), nn.BatchNorm3d(o))
        self.conv7 = up(64, 32)
        self.conv9 = up(32, 16)
        self.conv11 = up(16, 8)

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        x = self.conv6(self.conv5(c4))
        x = c4 + F.leaky_relu(self.conv7[1](self.conv7[0](x)), 0.01)
        x = c2 + F.leaky_relu(self.conv9[1](self.conv9[0](x)), 0.01)
        x = c0 + F.leaky_relu(self.conv11[1](self.conv11[0](x)), 0.01)
        return x


class TorchRenderer(nn.Module):
    """Renderer_ours oracle (standard MVSNeRF MLP)."""

    def __init__(self, D=6, W=128, in_pts=63, in_views=3, in_feat=20,
                 skips=(4,)):
        super().__init__()
        self.skips = skips
        self.in_pts = in_pts
        self.pts_linears = nn.ModuleList(
            [nn.Linear(in_pts, W)]
            + [nn.Linear(W, W) if i not in skips else nn.Linear(W + in_pts, W)
               for i in range(D - 1)]
        )
        self.pts_bias = nn.Linear(in_feat, W)
        self.views_linears = nn.ModuleList([nn.Linear(in_views + W, W // 2)])
        self.feature_linear = nn.Linear(W, W)
        self.alpha_linear = nn.Linear(W, 1)
        self.rgb_linear = nn.Linear(W // 2, 3)

    def forward(self, pts, feats, views):
        h = pts
        bias = self.pts_bias(feats)
        for i, l in enumerate(self.pts_linears):
            h = F.relu(l(h) * bias)
            if i in self.skips:
                h = torch.cat([pts, h], -1)
        alpha = torch.relu(self.alpha_linear(h))
        feature = self.feature_linear(h)
        h = torch.cat([feature, views], -1)
        h = F.relu(self.views_linears[0](h))
        rgb = torch.sigmoid(self.rgb_linear(h))
        return torch.cat([rgb, alpha], -1)


def test_mvs_feature_parity(rng):
    tnet = TorchMVSFeature().eval()
    sd = {f"feature.{k}": v for k, v in tnet.state_dict().items()}
    ported = pw.port_mvsnerf({**sd})
    x = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    fnet = MVSFeatureNet()
    variables = {"params": ported["params"]["feature"],
                 "batch_stats": ported["batch_stats"]["feature"]}
    got = fnet.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=1e-4, rtol=1e-3)


def test_mvs_cost_reg_parity(rng):
    tnet = TorchMVSCostReg(41).eval()
    sd = {f"cost_reg_2.{k}": v for k, v in tnet.state_dict().items()}
    ported = pw.port_mvsnerf(sd)
    x = rng.standard_normal((1, 41, 8, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    fnet = MVSCostRegNet()
    variables = {"params": ported["params"]["cost_reg"],
                 "batch_stats": ported["batch_stats"]["cost_reg"]}
    got = fnet.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), False)
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 4, 1), atol=2e-4, rtol=1e-3)


def test_renderer_parity(rng):
    tnet = TorchRenderer().eval()
    sd = {f"nerf.nerf.{k}": v for k, v in tnet.state_dict().items()}
    ported = pw.port_mvsnerf(sd)
    pts = rng.uniform(0, 1, (40, 3)).astype(np.float32)
    pts_enc = np.asarray(positional_encoding(jnp.asarray(pts), 10))
    feats = rng.standard_normal((40, 20)).astype(np.float32)
    views = rng.standard_normal((40, 3)).astype(np.float32)
    with torch.no_grad():
        want = tnet(
            torch.from_numpy(pts_enc), torch.from_numpy(feats),
            torch.from_numpy(views),
        ).numpy()
    mlp = RendererMLP(MVSNeRFConfig())
    got = mlp.apply({"params": ported["params"]["renderer"]},
                    jnp.asarray(pts_enc), jnp.asarray(feats),
                    jnp.asarray(views))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)
