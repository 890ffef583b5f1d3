"""Hand-written torch RAFT (Teed & Deng, ECCV 2020) used as a test oracle.

Written from the published architecture with state-dict names matching the
official repository's checkpoints, so the same porting path exercised here
applies to raft-sintel.pth. No official code is vendored.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)

        def make_norm():
            if norm_fn == "instance":
                return nn.InstanceNorm2d(planes)
            return nn.BatchNorm2d(planes)

        self.norm1 = make_norm()
        self.norm2 = make_norm()
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            norm3 = (nn.InstanceNorm2d(planes) if norm_fn == "instance"
                     else nn.BatchNorm2d(planes))
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), norm3
            )

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        x = x if self.downsample is None else self.downsample(x)
        return self.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, output_dim=256, norm_fn="instance"):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.norm1 = (nn.InstanceNorm2d(64) if norm_fn == "instance"
                      else nn.BatchNorm2d(64))
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64, norm_fn, 1),
                                    ResidualBlock(64, 64, norm_fn, 1))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, norm_fn, 2),
                                    ResidualBlock(96, 96, norm_fn, 1))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, norm_fn, 2),
                                    ResidualBlock(128, 128, norm_fn, 1))
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_channels=4 * 81):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_channels, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        c = F.relu(self.convc2(c))
        f = F.relu(self.convf1(flow))
        f = F.relu(self.convf2(f))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class SepConvGRU(nn.Module):
    def __init__(self, hidden_dim=128, input_dim=128 + 128):
        super().__init__()
        hd, total = hidden_dim, hidden_dim + input_dim
        self.convz1 = nn.Conv2d(total, hd, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(total, hd, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(total, hd, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(total, hd, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(total, hd, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(total, hd, (5, 1), padding=(2, 0))

    def _pass(self, h, x, convz, convr, convq):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(convz(hx))
        r = torch.sigmoid(convr(hx))
        q = torch.tanh(convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q

    def forward(self, h, x):
        h = self._pass(h, x, self.convz1, self.convr1, self.convq1)
        h = self._pass(h, x, self.convz2, self.convr2, self.convq2)
        return h


class FlowHead(nn.Module):
    def __init__(self, input_dim=128, hidden_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)

    def forward(self, x):
        return self.conv2(F.relu(self.conv1(x)))


class BasicUpdateBlock(nn.Module):
    def __init__(self, hidden_dim=128):
        super().__init__()
        self.encoder = BasicMotionEncoder()
        self.gru = SepConvGRU(hidden_dim, input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, 256)
        self.mask = nn.Sequential(
            nn.Conv2d(hidden_dim, 256, 3, padding=1),
            nn.ReLU(inplace=True),
            nn.Conv2d(256, 64 * 9, 1),
        )

    def forward(self, net, inp, corr, flow):
        motion = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, motion], dim=1))
        delta = self.flow_head(net)
        mask = 0.25 * self.mask(net)
        return net, mask, delta


def torch_corr_pyramid(fmap1, fmap2, num_levels=4):
    b, c, h, w = fmap1.shape
    f1 = fmap1.reshape(b, c, h * w)
    f2 = fmap2.reshape(b, c, h * w)
    corr = torch.matmul(f1.transpose(1, 2), f2) / (c ** 0.5)
    corr = corr.reshape(b * h * w, 1, h, w)
    pyr = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyr.append(corr)
    return pyr


def torch_lookup(pyr, coords, radius=4):
    """coords [B, 2, H, W] (x, y). Returns [B, levels*(2r+1)^2, H, W]."""
    b, _, h, w = coords.shape
    r = radius
    out = []
    coords = coords.permute(0, 2, 3, 1)
    for lvl, corr in enumerate(pyr):
        _, _, hl, wl = corr.shape
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij")[::-1], dim=-1)
        centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** lvl
        coords_lvl = centroid + delta.reshape(1, 2 * r + 1, 2 * r + 1, 2)
        # normalize to [-1, 1] for grid_sample (align_corners=True)
        xg = 2 * coords_lvl[..., 0] / (wl - 1) - 1
        yg = 2 * coords_lvl[..., 1] / (hl - 1) - 1
        grid = torch.stack([xg, yg], dim=-1)
        sampled = F.grid_sample(corr, grid, align_corners=True,
                                padding_mode="border")
        out.append(sampled.reshape(b, h, w, -1))
    return torch.cat(out, dim=-1).permute(0, 3, 1, 2)


class RAFT(nn.Module):
    def __init__(self, hidden_dim=128, context_dim=128):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.context_dim = context_dim
        self.fnet = BasicEncoder(256, "instance")
        self.cnet = BasicEncoder(hidden_dim + context_dim, "batch")
        self.update_block = BasicUpdateBlock(hidden_dim)

    def upsample_flow(self, flow, mask):
        b, _, h, w = flow.shape
        mask = mask.view(b, 1, 9, 8, 8, h, w)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1)
        up = up.view(b, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(b, 2, 8 * h, 8 * w)

    def forward(self, image1, image2, iters=12):
        image1 = 2 * (image1 / 255.0) - 1.0
        image2 = 2 * (image2 / 255.0) - 1.0
        fmaps = self.fnet(torch.cat([image1, image2], dim=0))
        b = image1.shape[0]
        fmap1, fmap2 = fmaps[:b], fmaps[b:]
        pyr = torch_corr_pyramid(fmap1, fmap2)

        cnet = self.cnet(image1)
        net = torch.tanh(cnet[:, :self.hidden_dim])
        inp = torch.relu(cnet[:, self.hidden_dim:])

        _, _, h8, w8 = fmap1.shape
        ys, xs = torch.meshgrid(torch.arange(h8).float(),
                                torch.arange(w8).float(), indexing="ij")
        coords0 = torch.stack([xs, ys])[None].repeat(b, 1, 1, 1)
        coords1 = coords0.clone()

        flow_up = None
        for _ in range(iters):
            corr = torch_lookup(pyr, coords1)
            flow = coords1 - coords0
            net, mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = self.upsample_flow(coords1 - coords0, mask)
        return coords1 - coords0, flow_up
