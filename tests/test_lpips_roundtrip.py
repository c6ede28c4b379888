"""LPIPS weight-path validation end-to-end WITHOUT real weights (VERDICT r2 #6).

The zero-egress image has no lpips-0.1.4/torchvision weights, so numeric
parity of a *pretrained* LPIPS is unverifiable here. What IS verifiable is the
whole path the real weights will take the day they land: a torch-side
lpips-0.1.4 computation graph (rebuilt faithfully below from the upstream
structure: ScalingLayer → VGG16 taps at relu{1_2,2_2,3_3,4_3,5_3} →
normalize_tensor → 1×1 lin heads → spatial average → sum; the ``lpips``
package itself is not installed) is initialized with RANDOM weights, those
weights are exported in the exact .npz layout tools/export_lpips_weights.py
produces and the .pth layout ``_params_from_torch`` converts, loaded through
``models/lpips.py::load_lpips_params``, and the JAX forward must agree with
the torch forward to f32 tolerance. Reference usage: vqganVqvaeWorker.py:107
(construction) and :187 (applied inside the VQ loss).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vq_vae_gan_diffusion_tpu.models.lpips import (LPIPS, _SCALE, _SHIFT,
                                                   _VGG16_STAGES,
                                                   load_lpips_params)

# ---------------------------------------------------------------------------
# torch-side lpips-0.1.4 graph (upstream lpips/lpips.py + pretrained_networks)
# ---------------------------------------------------------------------------


class _TorchVGG16Taps(torch.nn.Module):
    """VGG16 conv trunk with the five LPIPS tap activations."""

    def __init__(self):
        super().__init__()
        layers = []
        in_ch = 3
        self.tap_idx = []
        for ch, n_convs in _VGG16_STAGES:
            for _ in range(n_convs):
                layers.append(torch.nn.Conv2d(in_ch, ch, 3, padding=1))
                layers.append(torch.nn.ReLU())
                in_ch = ch
            self.tap_idx.append(len(layers) - 1)
            layers.append(torch.nn.MaxPool2d(2, 2))
        layers.pop()  # no pool after the last stage
        self.features = torch.nn.Sequential(*layers)

    def forward(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.tap_idx:
                taps.append(x)
        return taps


def _torch_lpips(vgg, lins, x, y):
    """Upstream lpips.LPIPS.forward with spatial average (the default)."""
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    fx = vgg((x - shift) / scale)
    fy = vgg((y - shift) / scale)
    total = 0.0
    for a, b, w in zip(fx, fy, lins):
        # upstream normalize_tensor: eps OUTSIDE the sqrt
        na = a / (torch.sqrt((a ** 2).sum(dim=1, keepdim=True)) + 1e-10)
        nb = b / (torch.sqrt((b ** 2).sum(dim=1, keepdim=True)) + 1e-10)
        diff = (na - nb) ** 2
        lin = torch.nn.functional.conv2d(diff, w.view(-1, diff.shape[1], 1, 1))
        total = total + lin.mean(dim=(2, 3), keepdim=True)
    return total  # [B,1,1,1]


@pytest.fixture(scope="module")
def torch_graph():
    torch.manual_seed(9)
    vgg = _TorchVGG16Taps().eval()
    # shrink conv magnitudes so deep activations stay O(1) under random init
    with torch.no_grad():
        for m in vgg.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight *= 0.2
                m.bias *= 0.1
    # upstream lin weights are non-negative (our loader applies |w|) — draw
    # them non-negative so both graphs share one weight convention
    lins = [torch.rand(ch) * 0.5 + 0.01 for ch, _ in _VGG16_STAGES]
    return vgg, lins


def _export_npz(vgg, lins, path):
    """Mirror tools/export_lpips_weights.py's key layout exactly."""
    convs = [m for m in vgg.modules() if isinstance(m, torch.nn.Conv2d)]
    names = [f"conv{s}_{i}" for s, (_, n) in enumerate(_VGG16_STAGES)
             for i in range(n)]
    assert len(convs) == len(names)
    out = {}
    for name, conv in zip(names, convs):
        out[f"vgg/{name}/kernel"] = np.transpose(
            conv.weight.detach().numpy(), (2, 3, 1, 0))
        out[f"vgg/{name}/bias"] = conv.bias.detach().numpy()
    for i, w in enumerate(lins):
        out[f"lin{i}"] = w.numpy().reshape(-1)
    np.savez(path, **out)


def test_lpips_npz_roundtrip(torch_graph, tmp_path):
    vgg, lins = torch_graph
    npz = tmp_path / "lpips_vgg.npz"
    _export_npz(vgg, lins, npz)

    params = load_lpips_params(str(npz))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips(vgg, lins, torch.from_numpy(x),
                           torch.from_numpy(y)).numpy()

    got = LPIPS().apply({"params": params},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got).reshape(-1), ref.reshape(-1),
                               rtol=1e-4, atol=1e-6)
    # sanity: identical inputs → zero distance
    zero = LPIPS().apply({"params": params},
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert float(np.abs(np.asarray(zero)).max()) < 1e-6


def test_lpips_pth_roundtrip(torch_graph, tmp_path):
    """The .pth branch of load_lpips_params: a VGG16-style state dict with
    numeric layer keys plus lin weights converts OIHW → HWIO correctly."""
    vgg, lins = torch_graph
    sd = {}
    for i, layer in enumerate(vgg.features):
        if isinstance(layer, torch.nn.Conv2d):
            sd[f"features.{i}.weight"] = layer.weight.detach()
            sd[f"features.{i}.bias"] = layer.bias.detach()
    for i, w in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = w.view(1, -1, 1, 1)
    pth = tmp_path / "lpips_vgg.pth"
    torch.save(sd, pth)

    params = load_lpips_params(str(pth))
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips(vgg, lins, torch.from_numpy(x),
                           torch.from_numpy(y)).numpy()
    got = LPIPS().apply({"params": params},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got).reshape(-1), ref.reshape(-1),
                               rtol=1e-4, atol=1e-6)


def test_lpips_grayscale_path(torch_graph, tmp_path):
    """MNIST path: 1-channel inputs repeat to RGB before the graph
    (vqganVqvaeWorker feeds grayscale batches directly)."""
    vgg, lins = torch_graph
    npz = tmp_path / "lpips_vgg.npz"
    _export_npz(vgg, lins, npz)
    params = load_lpips_params(str(npz))

    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, size=(2, 1, 16, 16)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips(vgg, lins,
                           torch.from_numpy(x).repeat(1, 3, 1, 1),
                           torch.from_numpy(y).repeat(1, 3, 1, 1)).numpy()
    got = LPIPS().apply({"params": params},
                        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                        jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(got).reshape(-1), ref.reshape(-1),
                               rtol=1e-4, atol=1e-6)


def test_lpips_gradient_parity(torch_graph, tmp_path):
    """∂LPIPS/∂input parity torch-vs-jax with identical injected weights
    (VERDICT r3 #9 — the roundtrip above is forward-only, but the VQGAN step
    BACKPROPS through the perceptual term: vqganVqvaeWorker.py:187-200).
    Matches the worker's usage: loss = mean(lpips(x, dec)), gradient taken
    w.r.t. the decoded image."""
    vgg, lins = torch_graph
    npz = tmp_path / "lpips_vgg.npz"
    _export_npz(vgg, lins, npz)
    params = load_lpips_params(str(npz))

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)
    d = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)

    # torch: d requires grad, backprop mean lpips
    dt = torch.from_numpy(d).requires_grad_(True)
    loss_t = _torch_lpips(vgg, lins, torch.from_numpy(x), dt).mean()
    loss_t.backward()
    g_ref = dt.grad.numpy()                      # [B,3,H,W]

    # jax: same loss, grad w.r.t. the NHWC decoded image
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def loss_j(dec):
        return jnp.mean(LPIPS().apply({"params": params}, x_j, dec))

    g_jax = jax.grad(loss_j)(jnp.asarray(np.transpose(d, (0, 2, 3, 1))))
    g_jax = np.transpose(np.asarray(g_jax), (0, 3, 1, 2))

    assert np.isfinite(g_ref).all() and np.isfinite(g_jax).all()
    scale = np.abs(g_ref).max()
    assert scale > 0
    np.testing.assert_allclose(g_jax, g_ref, rtol=2e-3, atol=2e-5 * scale)


def test_lpips_gradient_parity_grayscale(torch_graph, tmp_path):
    """Same gradient check through the 1-channel repeat-to-RGB path (the
    mnist training configuration): the repeat's transpose must SUM the three
    RGB gradient contributions back into the single channel identically."""
    vgg, lins = torch_graph
    npz = tmp_path / "lpips_vgg.npz"
    _export_npz(vgg, lins, npz)
    params = load_lpips_params(str(npz))

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=(2, 1, 16, 16)).astype(np.float32)
    d = rng.uniform(-1, 1, size=(2, 1, 16, 16)).astype(np.float32)

    dt = torch.from_numpy(d).requires_grad_(True)
    loss_t = _torch_lpips(vgg, lins,
                          torch.from_numpy(x).repeat(1, 3, 1, 1),
                          dt.repeat(1, 3, 1, 1)).mean()
    loss_t.backward()
    g_ref = dt.grad.numpy()

    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

    def loss_j(dec):
        return jnp.mean(LPIPS().apply({"params": params}, x_j, dec))

    g_jax = jax.grad(loss_j)(jnp.asarray(np.transpose(d, (0, 2, 3, 1))))
    g_jax = np.transpose(np.asarray(g_jax), (0, 3, 1, 2))
    scale = np.abs(g_ref).max()
    assert scale > 0
    np.testing.assert_allclose(g_jax, g_ref, rtol=2e-3, atol=2e-5 * scale)
