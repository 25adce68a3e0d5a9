"""Cross-validate the jnp SSIM against an independent torch implementation
of the reference's metric (reference metrics.py:15-20: kornia.losses.ssim
with window 3, mapped to [-1, 1] via 1 - 2*dssim).

kornia's SSIM (v0.5 kornia/losses/ssim.py, the version the reference pins):
  * 2-D gaussian window, size 3, sigma 1.5, normalized to sum 1;
  * per-channel 'same' conv2d (padding = window//2) for the local moments;
  * C1 = (0.01*max_val)^2, C2 = (0.03*max_val)^2;
  * loss map = clamp((1 - ssim_map)/2, 0, 1), reduced by mean.
The torch code below re-derives that from the published formula, so the two
implementations share no code; agreement on random + structured golden
vectors validates the jnp version end-to-end.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from nerf_pl_tpu.training.metrics import ssim as jnp_ssim


def _torch_gaussian_kernel2d(window: int, sigma: float) -> torch.Tensor:
    ax = torch.arange(window, dtype=torch.float64) - (window - 1) / 2.0
    g = torch.exp(-0.5 * (ax / sigma) ** 2)
    g = g / g.sum()
    return torch.outer(g, g)


def torch_ssim_reference(pred: torch.Tensor, gt: torch.Tensor,
                         window: int = 3, sigma: float = 1.5,
                         max_val: float = 1.0) -> float:
    """kornia-semantics SSIM in [-1, 1] for (1, C, H, W) inputs."""
    C = pred.shape[1]
    k = _torch_gaussian_kernel2d(window, sigma).to(pred.dtype)
    k = k.expand(C, 1, window, window).contiguous()
    pad = window // 2

    def blur(x):
        return F.conv2d(x, k, padding=pad, groups=C)

    C1 = (0.01 * max_val) ** 2
    C2 = (0.03 * max_val) ** 2
    mu_p, mu_g = blur(pred), blur(gt)
    s_pp = blur(pred * pred) - mu_p ** 2
    s_gg = blur(gt * gt) - mu_g ** 2
    s_pg = blur(pred * gt) - mu_p * mu_g
    smap = ((2 * mu_p * mu_g + C1) * (2 * s_pg + C2)) / (
        (mu_p ** 2 + mu_g ** 2 + C1) * (s_pp + s_gg + C2))
    dssim = torch.clamp((1 - smap) / 2, 0, 1).mean()
    return float(1 - 2 * dssim)


def _pair(seed, H=24, W=31, noise=0.1):
    rng = np.random.default_rng(seed)
    gt = rng.random((1, 3, H, W)).astype(np.float32)
    pred = np.clip(gt + noise * rng.standard_normal(gt.shape), 0, 1)
    return pred.astype(np.float32), gt


class TestSSIMGolden:
    @pytest.mark.parametrize("seed,noise", [(0, 0.0), (1, 0.02), (2, 0.1),
                                            (3, 0.5), (4, 1.0)])
    def test_matches_torch_reference_random(self, seed, noise):
        pred, gt = _pair(seed, noise=noise)
        ours = float(jnp_ssim(jnp.asarray(pred), jnp.asarray(gt)))
        golden = torch_ssim_reference(torch.from_numpy(pred),
                                      torch.from_numpy(gt))
        assert abs(ours - golden) < 1e-5, (ours, golden)

    def test_structured_images(self):
        # gradient vs shifted gradient: exercises structure, not just noise
        H, W = 32, 32
        x = np.linspace(0, 1, W, dtype=np.float32)
        gt = np.broadcast_to(x, (1, 3, H, W)).copy()
        pred = np.roll(gt, 2, axis=-1)
        ours = float(jnp_ssim(jnp.asarray(pred), jnp.asarray(gt)))
        golden = torch_ssim_reference(torch.from_numpy(pred),
                                      torch.from_numpy(gt))
        assert abs(ours - golden) < 1e-5, (ours, golden)

    def test_identical_images_give_one(self):
        _, gt = _pair(7)
        assert float(jnp_ssim(jnp.asarray(gt), jnp.asarray(gt))) == \
            pytest.approx(1.0, abs=1e-6)

    def test_accepts_chw(self):
        pred, gt = _pair(8, noise=0.05)
        a = float(jnp_ssim(jnp.asarray(pred), jnp.asarray(gt)))
        b = float(jnp_ssim(jnp.asarray(pred[0]), jnp.asarray(gt[0])))
        assert a == pytest.approx(b, abs=1e-7)

    def test_conv_precision_pinned_highest(self):
        # Regression guard for the round-4 TPU bias: XLA runs convs with
        # bf16 inputs by default on TPU, and ssim's variance terms
        # E[x^2]-mu^2 cancel catastrophically there (measured 0.9125
        # on-chip vs 0.9738 exact on a 33.9 dB render). _blur must pin
        # precision=HIGHEST; the CPU mesh can't reproduce the bias, so
        # pin it at the jaxpr level.
        import jax
        pred, gt = _pair(9, noise=0.05)
        jaxpr = jax.make_jaxpr(jnp_ssim)(jnp.asarray(pred), jnp.asarray(gt))
        convs = [e for e in jaxpr.jaxpr.eqns
                 if e.primitive.name == "conv_general_dilated"]
        assert len(convs) >= 10  # 5 blurs x 2 separable passes
        for e in convs:
            p = e.params["precision"]
            assert p is not None and jax.lax.Precision.HIGHEST in (
                p if isinstance(p, tuple) else (p,)), e.params
