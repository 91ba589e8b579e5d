"""Measure the reference-equivalent PyTorch CPU eval throughput.

The reference publishes no throughput numbers (SURVEY §6); BASELINE.md calls
for measuring its CPU speed at build time to anchor the per-chip target. This
script re-implements the reference's flagship architecture
(JointAutoregressiveHierarchical, M=128, K=3 — Models.py:10-106 wiring,
Components.py 5x5 transforms, ContextModels.py masked conv,
ParametersModels.py entropy params, EntropyModels.py GMM likelihood) in plain
torch (NCHW) and times the eval forward (training=False) on Kodak-shaped
768x512 input — exactly the computation the reference's Evaluator runs per
image (Evaluator.py:62-64; there is no bitstream codec, §3.2).

Writes BASELINE_MEASURED.json consumed by bench.py for `vs_baseline`.
"""

import json
import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

M = 128
K = 3


class TorchGDN(nn.Module):
    def __init__(self, ch, inverse=False):
        super().__init__()
        self.inverse = inverse
        self.beta = nn.Parameter(torch.ones(ch))
        self.gamma = nn.Parameter(0.1 * torch.eye(ch))

    def forward(self, x):
        c = x.shape[1]
        norm = F.conv2d(x * x, self.gamma.view(c, c, 1, 1), self.beta)
        return x * torch.sqrt(norm) if self.inverse else x * torch.rsqrt(norm)


def encoder():
    layers = []
    in_ch = 3
    for i in range(3):
        layers += [nn.Conv2d(in_ch, M, 5, 2, 2), TorchGDN(M)]
        in_ch = M
    layers += [nn.Conv2d(M, M, 5, 2, 2)]
    return nn.Sequential(*layers)


def decoder():
    layers = []
    for i in range(3):
        layers += [nn.ConvTranspose2d(M, M, 5, 2, 2, output_padding=1),
                   TorchGDN(M, inverse=True)]
    layers += [nn.ConvTranspose2d(M, 3, 5, 2, 2, output_padding=1)]
    return nn.Sequential(*layers)


def hyper_encoder():
    return nn.Sequential(
        nn.Conv2d(M, M, 3, 1, 1), nn.LeakyReLU(),
        nn.Conv2d(M, M, 5, 2, 2), nn.LeakyReLU(),
        nn.Conv2d(M, M, 5, 2, 2))


def hyper_decoder():
    return nn.Sequential(
        nn.ConvTranspose2d(M, M, 5, 2, 2, output_padding=1), nn.LeakyReLU(),
        nn.ConvTranspose2d(M, int(1.5 * M), 5, 2, 2, output_padding=1), nn.LeakyReLU(),
        nn.Conv2d(int(1.5 * M), 2 * M, 3, 1, 1))


class Flagship(nn.Module):
    def __init__(self):
        super().__init__()
        self.enc = encoder()
        self.dec = decoder()
        self.henc = hyper_encoder()
        self.hdec = hyper_decoder()
        self.ctx = nn.Conv2d(M, 2 * M, 5, 1, 2)  # masked conv (mask is free at eval)
        self.ep = nn.Sequential(
            nn.Conv2d(4 * M, 640, 1), nn.LeakyReLU(),
            nn.Conv2d(640, 640, 1), nn.LeakyReLU(),
            nn.Conv2d(640, 3 * K * M, 1))
        # factorized bottleneck params (C, out, in) chain, filters (3,3,3)
        self.fb = nn.ParameterList()
        dims = [1, 3, 3, 3, 1]
        for i in range(4):
            self.fb.append(nn.Parameter(torch.randn(M, dims[i + 1], dims[i]) * 0.1))
            self.fb.append(nn.Parameter(torch.randn(M, dims[i + 1], 1) * 0.1))
            self.fb.append(nn.Parameter(torch.zeros(M, dims[i + 1], 1)))

    def fb_logits(self, x):  # x: (C,1,N)
        for i in range(4):
            m = F.softplus(self.fb[3 * i])
            x = torch.matmul(m, x) + self.fb[3 * i + 1]
            if i < 3:
                x = x + torch.tanh(self.fb[3 * i + 2]) * torch.tanh(x)
        return x

    def forward(self, x):
        y = self.enc(x)
        z = self.henc(y)
        y_q = torch.round(y)
        z_q = torch.round(z)
        psi = self.hdec(z_q)
        phi = self.ctx(y_q)
        params = self.ep(torch.cat([phi, psi], 1))
        w, mu, sig = params.chunk(3, 1)
        B, _, H, W = w.shape
        w = F.softmax(w.view(B, K, M, H, W), dim=1)
        mu = mu.view(B, K, M, H, W)
        sig = F.softplus(sig.view(B, K, M, H, W)) + 1e-6
        yq = y_q.unsqueeze(1)
        up = 0.5 * (1 + torch.erf((yq + 0.5 - mu) / sig / math.sqrt(2)))
        lo = 0.5 * (1 + torch.erf((yq - 0.5 - mu) / sig / math.sqrt(2)))
        p_y = (w * (up - lo)).sum(1).clamp_min(1e-9)
        flat = z_q.permute(1, 0, 2, 3).reshape(M, 1, -1)
        lu = torch.sigmoid(self.fb_logits(flat + 0.5))
        ll = torch.sigmoid(self.fb_logits(flat - 0.5))
        p_z = (lu - ll).abs().clamp_min(1e-9)
        x_hat = self.dec(y_q)
        bpp = (-(p_y.log().sum() + p_z.log().sum()) / math.log(2) /
               (x.shape[2] * x.shape[3]))
        return x_hat, bpp


def main():
    torch.set_grad_enabled(False)
    model = Flagship().eval()
    x = torch.rand(1, 3, 512, 768)
    # warmup
    for _ in range(2):
        model(x)
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        xh, bpp = model(x)
    dt = (time.perf_counter() - t0) / n
    result = {
        "torch_cpu_images_per_sec": 1.0 / dt,
        "seconds_per_image": dt,
        "config": "JointAutoregressiveHierarchical M=128 K=3, Kodak 768x512, eval forward",
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(result))
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
