"""Independent torch implementation of the public YOLOv8 architecture.

Test-only oracle: validates the Flax model + weight port against torch
conv/BN/pool semantics with random weights, standing in for the reference's
trained ultralytics checkpoint (a git-LFS blob absent from the mount).
Parameter names intentionally follow ultralytics' ``model.{i}.*`` layout so
``port_state_dict`` consumes this state dict directly.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn

SCALES = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
}


def _chn(c, width, max_ch):
    return int(math.ceil(min(c, max_ch) * width / 8) * 8)


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3)
        self.cv2 = Conv(c2, c2, 3)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(Bottleneck(self.c, self.c, shortcut) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c_ * 4, c2, 1)
        self.pool = nn.MaxPool2d(k, 1, k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.pool(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Detect(nn.Module):
    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        self.nc, self.reg_max = nc, reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(c, c2, 3), Conv(c2, c2, 3), nn.Conv2d(c2, 4 * reg_max, 1)) for c in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(c, c3, 3), Conv(c3, c3, 3), nn.Conv2d(c3, nc, 1)) for c in ch
        )

    def forward(self, feats):
        return [c(f) for c, f in zip(self.cv2, feats)], [c(f) for c, f in zip(self.cv3, feats)]


class TorchYoloV8(nn.Module):
    """Backbone + PAN + head, indexed like ultralytics DetectionModel.model."""

    def __init__(self, nc=1, scale="n"):
        super().__init__()
        depth, width, max_ch = SCALES[scale]

        def C(c):
            return _chn(c, width, max_ch)

        def R(n):
            return max(round(n * depth), 1)

        layers = [
            Conv(3, C(64), 3, 2),  # 0
            Conv(C(64), C(128), 3, 2),  # 1
            C2f(C(128), C(128), R(3), True),  # 2
            Conv(C(128), C(256), 3, 2),  # 3
            C2f(C(256), C(256), R(6), True),  # 4
            Conv(C(256), C(512), 3, 2),  # 5
            C2f(C(512), C(512), R(6), True),  # 6
            Conv(C(512), C(1024), 3, 2),  # 7
            C2f(C(1024), C(1024), R(3), True),  # 8
            SPPF(C(1024), C(1024)),  # 9
            nn.Upsample(scale_factor=2, mode="nearest"),  # 10
            nn.Identity(),  # 11 (concat)
            C2f(C(1024) + C(512), C(512), R(3)),  # 12
            nn.Upsample(scale_factor=2, mode="nearest"),  # 13
            nn.Identity(),  # 14 (concat)
            C2f(C(512) + C(256), C(256), R(3)),  # 15
            Conv(C(256), C(256), 3, 2),  # 16
            nn.Identity(),  # 17 (concat)
            C2f(C(256) + C(512), C(512), R(3)),  # 18
            Conv(C(512), C(512), 3, 2),  # 19
            nn.Identity(),  # 20 (concat)
            C2f(C(512) + C(1024), C(1024), R(3)),  # 21
            Detect(nc, (C(256), C(512), C(1024))),  # 22
        ]
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        x = m[1](m[0](x))
        x = m[2](x)
        p3 = m[4](m[3](x))
        p4 = m[6](m[5](p3))
        p5 = m[9](m[8](m[7](p4)))

        x = m[12](torch.cat([m[10](p5), p4], 1))
        n3 = m[15](torch.cat([m[13](x), p3], 1))
        n4 = m[18](torch.cat([m[16](n3), x], 1))
        n5 = m[21](torch.cat([m[19](n4), p5], 1))
        return m[22]([n3, n4, n5])
