"""Torch-side replica of the reference's FULL metric pipeline, built from
torch public API only (no reference imports, no lpips/torchmetrics/pytorch-fid
packages — none are installed here).

Semantics mirrored, with reference citations:
  * compute_evaluation_metric flow     — models/model_utils.py:431-561
  * lpips.LPIPS(net='vgg') forward     — richzhang/PerceptualSimilarity v0.1
    (scaling layer, VGG16 taps, unit-normalize, 1x1 lin heads, spatial mean)
  * SIFID                              — models/sifid.py:46-233 +
    models/inception.py:61-69,120-144 (block 0 WITHOUT maxpool,
    resize_input=False, normalize_input 2x-1)
  * touch LPIPS                        — models/tactile_patch_fid.py:157-198
  * normal + angle error               — models/model_utils.py:408-428,
    models/normal_losses.py:10-54
  * PSNR / SSIM                        — torchmetrics defaults (global-MSE
    PSNR; gaussian-11/1.5 SSIM over the valid region)

Weights are injected (our deterministic fallback params exported to torch),
so torch and JAX run the SAME weights — the test pins the *pipeline*.
"""

import numpy as np
import torch
import torch.nn.functional as F
from scipy import linalg

# ---------------------------------------------------------------- LPIPS

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
_VGG_POOL_AFTER = {1, 3, 6, 9}          # conv idx followed by maxpool
_VGG_TAPS = (1, 3, 6, 9, 12)


def _torch_conv_params(lpips_params):
    out = []
    for p in lpips_params["conv"]:
        w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(p["b"]).copy())
        out.append((w, b))
    return out


def torch_lpips(lpips_params, in0, in1):
    """in0/in1: NCHW in [-1,1], 1 or 3 channels → per-sample distances (N,)."""
    convs = _torch_conv_params(lpips_params)
    lins = [torch.from_numpy(np.asarray(l).copy()) for l in lpips_params["lin"]]

    def taps(x):
        h = (x - _SHIFT) / _SCALE       # 1-ch input broadcasts to 3 like torch
        feats = []
        for i, (w, b) in enumerate(convs):
            h = F.relu(F.conv2d(h, w, b, padding=1))
            if i in _VGG_TAPS:
                feats.append(h)
            if i in _VGG_POOL_AFTER:
                h = F.max_pool2d(h, 2, 2)
        return feats

    f0, f1 = taps(in0), taps(in1)
    total = torch.zeros(in0.shape[0])
    for a, b, lin in zip(f0, f1, lins):
        na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        val = (d * lin.view(1, -1, 1, 1)).sum(dim=1)   # 1x1 conv head
        total = total + val.mean(dim=(1, 2))
    return total


# --------------------------------------------------------------- SIFID

_BLOCK0 = [("Conv2d_1a_3x3", 2, 0), ("Conv2d_2a_3x3", 1, 0), ("Conv2d_2b_3x3", 1, 1)]
_BN_EPS = 1e-3


def torch_inception_block0(inception_params, x, normalize_input=True):
    """x: NCHW → block-0 features (reference inception.py:61-69,120-144 —
    native resolution, no maxpool)."""
    if normalize_input:
        x = 2 * x - 1
    for name, stride, pad in _BLOCK0:
        p = inception_params[name]
        w = torch.from_numpy(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
        x = F.conv2d(x, w, stride=stride, padding=pad)
        mean = torch.from_numpy(np.asarray(p["mean"]).copy()).view(1, -1, 1, 1)
        var = torch.from_numpy(np.asarray(p["var"]).copy()).view(1, -1, 1, 1)
        scale = torch.from_numpy(np.asarray(p["scale"]).copy()).view(1, -1, 1, 1)
        bias = torch.from_numpy(np.asarray(p["bias"]).copy()).view(1, -1, 1, 1)
        x = F.relu((x - mean) / torch.sqrt(var + _BN_EPS) * scale + bias)
    return x


def _frechet(mu1, s1, mu2, s2, eps=1e-6):
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        off = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + off).dot(s2 + off))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def torch_sifid(inception_params, arr1, arr2, normalize_input=True):
    """arr1/arr2: NCHW tensors; per-pair single-image FID list
    (reference sifid.py:46-99,205-233)."""
    vals = []
    for a, b in zip(arr1, arr2):
        stats = []
        for img in (a, b):
            f = torch_inception_block0(inception_params, img[None], normalize_input)
            feat = f.detach().numpy().transpose(0, 2, 3, 1).reshape(-1, f.shape[1])
            stats.append((np.mean(feat, axis=0), np.cov(feat, rowvar=False)))
        vals.append(_frechet(stats[0][0], stats[0][1], stats[1][0], stats[1][1]))
    return vals


# ------------------------------------------------------- PSNR / SSIM / AE


def torch_psnr(x, y, data_range=1.0):
    mse = torch.mean((x - y) ** 2)
    return float(10 * torch.log10(data_range ** 2 / mse))


def torch_ssim(x, y, data_range=1.0, kernel_size=11, sigma=1.5):
    ax = torch.arange(kernel_size, dtype=torch.float32) - (kernel_size - 1) / 2
    g = torch.exp(-0.5 * (ax / sigma) ** 2)
    g = g / g.sum()
    k2d = torch.outer(g, g)
    c = x.shape[1]
    kern = k2d.expand(c, 1, kernel_size, kernel_size)

    def filt(img):
        return F.conv2d(img, kern, groups=c)

    mu_x, mu_y = filt(x), filt(y)
    var_x = filt(x * x) - mu_x ** 2
    var_y = filt(y * y) - mu_y ** 2
    cov = filt(x * y) - mu_x * mu_y
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)
    return float((num / den).mean())


def torch_compute_normal(t, scale_nz=1.0):
    gx, gy = t[:, 0:1], t[:, 1:2]
    n = torch.cat([gx, gy, scale_nz * torch.ones_like(gx)], dim=1)
    return F.normalize(n, dim=1)


def torch_angle_error(real_n, fake_n):
    cos = torch.cosine_similarity(fake_n, real_n, dim=1, eps=1e-6)
    cos = torch.clamp(cos, -1.0, 1.0)
    return torch.acos(cos) * 180.0 / np.pi


# --------------------------------------------- full metric pipeline oracle


def torch_compute_evaluation_metric(lpips_params, inception_params,
                                    real_I, fake_I, real_T, fake_T,
                                    prefix=""):
    """NCHW mirror of reference models/model_utils.py:431-561."""
    md = {}
    md[f"metric_{prefix}I_LPIPS"] = float(
        torch_lpips(lpips_params, real_I, fake_I).mean())

    i_min, i_max = real_I.min(), real_I.max()
    real_In = (real_I - i_min) / (i_max - i_min)
    fake_In = torch.clamp((fake_I - i_min) / (i_max - i_min), 0, 1)

    sif = torch_sifid(inception_params, real_In, fake_In, normalize_input=True)
    md[f"metric_{prefix}I_SIFID"] = sif[0] if len(sif) == 1 else float(np.mean(sif))
    md[f"metric_{prefix}I_PSNR"] = torch_psnr(real_In, fake_In)
    md[f"metric_{prefix}I_SSIM"] = torch_ssim(real_In, fake_In)

    fake_Tc = torch.clamp(fake_T, 0, 1)

    r224 = F.interpolate(real_T, (224, 224))      # default nearest
    f224 = F.interpolate(fake_Tc, (224, 224))
    gx = torch_lpips(lpips_params, f224[:, 0:1], r224[:, 0:1]).mean()
    gy = torch_lpips(lpips_params, f224[:, 1:2], r224[:, 1:2]).mean()
    md[f"metric_{prefix}T_LPIPS"] = float(gx + gy)

    fn = torch_compute_normal(fake_Tc, 1.0)
    rn = torch_compute_normal(real_T, 1.0)
    md[f"metric_{prefix}T_AE"] = float(torch_angle_error(rn, fn).mean())

    r299 = F.interpolate(real_T, (299, 299))
    f299 = F.interpolate(fake_Tc, (299, 299))
    tile3 = lambda t, c: t[:, c : c + 1].expand(-1, 3, -1, -1)
    # convert2tensor(vmin=-1,vmax=1) ∘ normalize_input ≡ identity (see
    # sifid.py:180-203, inception.py:134-135) → feed raw, no normalization
    gxs = torch_sifid(inception_params, tile3(r299, 0), tile3(f299, 0),
                      normalize_input=False)
    gys = torch_sifid(inception_params, tile3(r299, 1), tile3(f299, 1),
                      normalize_input=False)
    md[f"metric_{prefix}T_SIFID"] = float(
        np.mean((np.array(gxs) + np.array(gys)) / 2))

    md[f"metric_{prefix}T_MSE"] = float(torch.mean((real_T - fake_Tc) ** 2))
    return md
