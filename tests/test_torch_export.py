"""flax → torch export (utils/torch_export.py): exact round-trips and
strict ``load_state_dict`` into the live reference modules.

Each family asserts two things:
1. export(import(sd)) reproduces the original ``state_dict`` bit-exactly
   (key set AND values — transposes are lossless), modulo synthesized
   buffers (``num_batches_tracked``).
2. A *fresh* reference module ``load_state_dict(exported, strict=True)``'s
   forward matches the donor module — the contract a migrating user needs.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not mounted", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)

from vq_vae_gan_diffusion_tpu.utils import torch_export as te
from vq_vae_gan_diffusion_tpu.utils import torch_import as ti

from tests.test_torch_import import GEO, _ref_cfg, _sd, _warm_shuffle_unet

torch.manual_seed(0)

SYNTH_BUFFERS = ("num_batches_tracked",)


def _assert_roundtrip(sd0, sd1):
    assert set(sd0) == set(sd1), (
        f"key drift: only-in-torch {sorted(set(sd0) - set(sd1))[:4]}, "
        f"only-in-export {sorted(set(sd1) - set(sd0))[:4]}")
    for k in sd0:
        if k.endswith(SYNTH_BUFFERS):
            assert sd1[k].shape == np.asarray(sd0[k]).shape
            continue
        np.testing.assert_array_equal(np.asarray(sd1[k]), sd0[k], err_msg=k)


def _load_strict(module, sd):
    module.load_state_dict(
        {k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    return module.eval()


def test_export_vqvae_roundtrip():
    from network.vqvae.vqvae import VQVAE as TorchVQVAE

    donor = TorchVQVAE(config=_ref_cfg()).eval()
    sd0 = _sd(donor)
    sd1 = te.export_vqvae(ti.convert_vqvae(sd0, **GEO), **GEO)
    _assert_roundtrip(sd0, sd1)

    torch.manual_seed(99)
    fresh = _load_strict(TorchVQVAE(config=_ref_cfg()), sd1)
    x = torch.randn(2, 3, GEO["img_size"], GEO["img_size"])
    with torch.no_grad():
        np.testing.assert_allclose(fresh(x)[0].numpy(), donor(x)[0].numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_export_vae_roundtrip():
    from network.vae.vae import VAE as TorchVAE

    donor = TorchVAE(config=_ref_cfg("vae")).eval()
    sd0 = _sd(donor)
    sd1 = te.export_vae(ti.convert_vae(sd0, **GEO), **GEO)
    _assert_roundtrip(sd0, sd1)


def test_export_discriminator_roundtrip():
    from network.vqgan.discriminator import Discriminator as TorchDisc

    donor = TorchDisc(image_channels=3).eval()
    sd0 = _sd(donor)
    sd1 = te.export_discriminator(*ti.convert_discriminator(sd0))
    _assert_roundtrip(sd0, sd1)

    torch.manual_seed(98)
    fresh = _load_strict(TorchDisc(image_channels=3), sd1)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        np.testing.assert_allclose(fresh(x).numpy(), donor(x).numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_export_gpt_roundtrip():
    from network.vqTransformer.submodule.mingpt import GPT as TorchGPT

    donor = TorchGPT(vocab_size=64, block_size=32, n_layer=2, n_head=4,
                     n_embd=32).eval()
    sd0 = _sd(donor)
    sd1 = te.export_gpt(ti.convert_gpt(sd0))
    _assert_roundtrip(sd0, sd1)  # incl. the regenerated causal-mask buffer

    torch.manual_seed(97)
    fresh = _load_strict(TorchGPT(vocab_size=64, block_size=32, n_layer=2,
                                  n_head=4, n_embd=32), sd1)
    idx = torch.randint(0, 64, (2, 16))
    with torch.no_grad():
        np.testing.assert_allclose(fresh(idx)[0].numpy(),
                                   donor(idx)[0].numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_export_shuffle_unet_roundtrip():
    from network.vqDiffusion.submodule.unet3d import Unet3D as RefUnet3D

    donor = _warm_shuffle_unet()  # non-trivial BN running stats
    sd0 = _sd(donor)
    sd1 = te.export_shuffle_unet(*ti.convert_shuffle_unet(sd0))
    _assert_roundtrip(sd0, sd1)

    torch.manual_seed(96)
    fresh = _load_strict(RefUnet3D(timesteps=10, time_embedding_dim=32,
                                   in_channels=1, out_channels=1, base_dim=16,
                                   dim_mults=[1, 2]), sd1)
    x = torch.randn(2, 1, 32, 16)
    t = torch.tensor([3, 7])
    with torch.no_grad():
        np.testing.assert_allclose(fresh(x, None, t).numpy(),
                                   donor(x, None, t).numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_export_unet1d_roundtrip():
    from network.vqDiffusion.submodule.unet2d import Unet2D as RefUnet2D

    donor = RefUnet2D(dim=16, dim_mults=(1, 2), channels=8, out_dim=8).eval()
    sd0 = _sd(donor)
    sd1 = te.export_unet1d(ti.convert_unet1d(sd0))
    _assert_roundtrip(sd0, sd1)

    torch.manual_seed(95)
    fresh = _load_strict(RefUnet2D(dim=16, dim_mults=(1, 2), channels=8,
                                   out_dim=8), sd1)
    x = torch.randn(2, 8, 32)
    tt = torch.tensor([3, 7])
    with torch.no_grad():
        np.testing.assert_allclose(fresh(x, None, tt).numpy(),
                                   donor(x, None, tt).numpy(),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_export_cli_end_to_end(tiny_config, tmp_path):
    """Orbax ckpt → export CLI → .pth a fresh reference VQVAE strict-loads,
    closing the loop with the import CLI (shared tmp checkpoint)."""
    import yaml

    from network.vqvae.vqvae import VQVAE as TorchVQVAE
    from tools.export_torch_checkpoint import main as export_main
    from tools.import_torch_checkpoint import main as import_main

    from tests.test_torch_import import (ATTN, INTERM, LATENT_CH,
                                         LATENT_SIZE, N_CODES)

    cfg = tiny_config
    for path, val in [("architecture.model_name", "vqvae"),
                      ("architecture.vqvae.latent_channels", LATENT_CH),
                      ("architecture.vqvae.latent_size", LATENT_SIZE),
                      ("architecture.vqvae.intermediate_channels", list(INTERM)),
                      ("architecture.vqvae.attention_resolution", list(ATTN)),
                      ("architecture.vqvae.num_codebook_vectors", N_CODES),
                      ("trainer.vqvae.perceptual_loss_factor", 0.0),
                      ("trainer.log_dir", str(tmp_path / "logs"))]:
        cfg = cfg.replace_path(path, val)
    cfg_path = tmp_path / "config.yml"
    cfg_path.write_text(yaml.safe_dump(cfg.to_dict()))

    torch.manual_seed(4)
    donor = TorchVQVAE(config=_ref_cfg()).eval()
    pth_in = tmp_path / "in.pth"
    torch.save(donor.state_dict(), str(pth_in))

    ckpt = tmp_path / "ckpt"
    assert import_main(["--config", str(cfg_path), "--pth", str(pth_in),
                        "--out", str(ckpt)]) == 0
    pth_out = tmp_path / "out.pth"
    assert export_main(["--config", str(cfg_path), "--ckpt", str(ckpt),
                        "--out", str(pth_out)]) == 0

    torch.manual_seed(94)
    fresh = TorchVQVAE(config=_ref_cfg())
    fresh.load_state_dict(torch.load(str(pth_out), weights_only=True),
                          strict=True)
    fresh.eval()
    x = torch.randn(2, 3, GEO["img_size"], GEO["img_size"])
    with torch.no_grad():
        np.testing.assert_allclose(fresh(x)[0].numpy(), donor(x)[0].numpy(),
                                   rtol=1e-5, atol=1e-6)
