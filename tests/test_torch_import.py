"""Key-driven torch-checkpoint import (utils/torch_import.py + the
tools/import_torch_checkpoint.py CLI).

Unlike test_torch_parity.py (which walks *instantiated* torch modules), these
tests exercise the migration path a reference user actually has: a bare
``state_dict`` on disk. Each converter is validated by building the live
reference module, converting ``module.state_dict()`` through the key-driven
mapper, and asserting forward agreement — plus one end-to-end CLI test that
lands in a restore-able Orbax checkpoint.
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

import jax.numpy as jnp

from vq_vae_gan_diffusion_tpu.utils import torch_import as ti

torch.manual_seed(0)

# tiny geometry shared with the dynamics harness (channels ≥32 everywhere:
# the reference GroupNorm hardcodes 32 groups)
IMG, CH = 32, 3
INTERM = [32, 64]
LATENT_CH, LATENT_SIZE = 32, 16
N_CODES = 32
ATTN = [16]
GEO = dict(img_size=IMG, latent_size=LATENT_SIZE,
           intermediate_channels=INTERM, n_res_encoder=1, n_res_decoder=1,
           attn_res=ATTN)


def _sd(module):
    """module → the plain numpy dict a .pth load would produce."""
    return {k: v.numpy() for k, v in module.state_dict().items()}


def _nchw(x):
    return jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))


def _ref_cfg(arch_key="vqvae"):
    geo = {"latent_channels": LATENT_CH, "latent_size": LATENT_SIZE,
           "intermediate_channels": list(INTERM),
           "num_residual_blocks_encoder": 1,
           "num_residual_blocks_decoder": 1,
           "dropout": 0.0, "attention_resolution": list(ATTN),
           "num_codebook_vectors": N_CODES,
           "resume_path": None, "train_model": True,
           "freeze_weights": False}
    return {"dataset": {"dataset_name": "synthetic",
                        "img_size": {"synthetic": IMG},
                        "img_channels": {"synthetic": CH}},
            "architecture": {arch_key: geo}}


def test_import_vqvae_forward():
    from network.vqvae.vqvae import VQVAE as TorchVQVAE

    from vq_vae_gan_diffusion_tpu.models.vqvae import VQVAE

    tvq = TorchVQVAE(config=_ref_cfg()).eval()
    x = torch.randn(2, CH, IMG, IMG)
    with torch.no_grad():
        dec_ref, idx_ref, _ = tvq(x)

    params = ti.convert_vqvae(_sd(tvq), **GEO)
    jvq = VQVAE(img_size=IMG, img_channels=CH, latent_channels=LATENT_CH,
                latent_size=LATENT_SIZE, intermediate_channels=tuple(INTERM),
                num_residual_blocks_encoder=1, num_residual_blocks_decoder=1,
                dropout=0.0, attention_resolution=tuple(ATTN),
                num_codebook_vectors=N_CODES)
    dec, idx, _ = jvq.apply({"params": params}, _nchw(x))
    np.testing.assert_array_equal(np.asarray(idx).ravel(),
                                  idx_ref.numpy().ravel())
    np.testing.assert_allclose(np.transpose(np.asarray(dec), (0, 3, 1, 2)),
                               dec_ref.numpy(), rtol=1e-3, atol=1e-4)


def test_import_vae_encode():
    from network.vae.vae import VAE as TorchVAE

    from vq_vae_gan_diffusion_tpu.models.vae import VAE

    tvae = TorchVAE(config=_ref_cfg("vae")).eval()
    x = torch.randn(2, CH, IMG, IMG)
    with torch.no_grad():
        enc = tvae.encoder(x)
        mu_ref, logvar_ref = tvae.fc_mu(enc), tvae.fc_logvar(enc)

    params = ti.convert_vae(_sd(tvae), **GEO)
    jvae = VAE(img_size=IMG, img_channels=CH, latent_channels=LATENT_CH,
               latent_size=LATENT_SIZE, intermediate_channels=tuple(INTERM),
               num_residual_blocks_encoder=1, num_residual_blocks_decoder=1,
               dropout=0.0, attention_resolution=tuple(ATTN))
    mu, logvar = jvae.apply({"params": params}, _nchw(x), method=VAE.encode)
    np.testing.assert_allclose(np.transpose(np.asarray(mu), (0, 3, 1, 2)),
                               mu_ref.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.transpose(np.asarray(logvar), (0, 3, 1, 2)),
                               logvar_ref.numpy(), rtol=1e-3, atol=1e-4)


def test_import_discriminator():
    from network.vqgan.discriminator import Discriminator as TorchDisc

    from vq_vae_gan_diffusion_tpu.models.discriminator import Discriminator

    td = TorchDisc(image_channels=CH).eval()
    x = torch.randn(2, CH, 64, 64)
    with torch.no_grad():
        ref = td(x).numpy()

    params, stats = ti.convert_discriminator(_sd(td))
    out = Discriminator().apply({"params": params, "batch_stats": stats},
                                _nchw(x), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-3, atol=1e-4)


def test_import_gpt_logits():
    from network.vqTransformer.submodule.mingpt import GPT as TorchGPT

    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT

    tg = TorchGPT(vocab_size=64, block_size=32, n_layer=2, n_head=4,
                  n_embd=32).eval()
    idx = torch.randint(0, 64, (2, 16))
    with torch.no_grad():
        ref, _ = tg(idx)

    params = ti.convert_gpt(_sd(tg))
    jg = GPT(vocab_size=64, block_size=32, n_layer=2, n_head=4, n_embd=32)
    out = np.asarray(jg.apply({"params": params}, jnp.asarray(idx.numpy())))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-3, atol=1e-4)


def _warm_shuffle_unet():
    from network.vqDiffusion.submodule.unet3d import Unet3D as RefUnet3D
    tm = RefUnet3D(timesteps=10, time_embedding_dim=32, in_channels=1,
                   out_channels=1, base_dim=16, dim_mults=[1, 2])
    tm.train()
    with torch.no_grad():  # non-trivial BN running stats
        for _ in range(3):
            tm(torch.randn(2, 1, 32, 16), None, torch.randint(0, 10, (2,)))
    return tm.eval()


def test_import_shuffle_unet():
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    tm = _warm_shuffle_unet()
    x = torch.randn(2, 1, 32, 16)
    t = torch.tensor([3, 7])
    with torch.no_grad():
        ref = tm(x, None, t).numpy()

    params, stats = ti.convert_shuffle_unet(_sd(tm))
    ju = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                     out_channels=1, base_dim=16, dim_mults=(1, 2))
    out = ju.apply({"params": params, "batch_stats": stats}, _nchw(x), None,
                   jnp.asarray(t.numpy()), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-3, atol=1e-4)


def test_import_unet1d():
    from network.vqDiffusion.submodule.unet2d import Unet2D as RefUnet2D

    from vq_vae_gan_diffusion_tpu.models.unet1d import Unet1D

    tm = RefUnet2D(dim=16, dim_mults=(1, 2), channels=8, out_dim=8).eval()
    x = torch.randn(2, 8, 32)
    tt = torch.tensor([3, 7])
    with torch.no_grad():
        ref = tm(x, None, tt).numpy()

    params = ti.convert_unet1d(_sd(tm))
    ju = Unet1D(dim=16, dim_mults=(1, 2), channels=8, out_dim=8)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 1)))
    out = ju.apply({"params": params}, xj, None, jnp.asarray(tt.numpy()))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 2, 1)),
                               ref, rtol=1e-3, atol=1e-4)


def test_import_discrete_diffusion_ckpt():
    """The vqdiffusionWorker.py:243 checkpoint flavor: denoiser under
    ``model.`` + schedule/Lt registered buffers."""
    from network.vqDiffusion.submodule.diffusion_vq_official import \
        Diffusion_VQ_Official

    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    tm = _warm_shuffle_unet()
    if not hasattr(tm, "input_dim"):
        tm.input_dim = 4  # Diffusion_VQ_Official reads it (line 128)
    tdiff = Diffusion_VQ_Official(model=tm, vocab_size=8, seq_len=16,
                                  diffusion_step=10)
    with torch.no_grad():  # non-trivial Lt telemetry to carry over
        tdiff.Lt_history.add_(torch.rand(10))
        tdiff.Lt_count.add_(torch.ones(10))

    params, stats, lt_hist, lt_count = ti.convert_discrete_diffusion(_sd(tdiff))
    np.testing.assert_allclose(lt_hist, tdiff.Lt_history.numpy())
    np.testing.assert_allclose(lt_count, tdiff.Lt_count.numpy())

    x = torch.randn(2, 1, 32, 16)
    t = torch.tensor([3, 7])
    with torch.no_grad():
        ref = tm(x, None, t).numpy()
    ju = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                     out_channels=1, base_dim=16, dim_mults=(1, 2))
    out = ju.apply({"params": params, "batch_stats": stats}, _nchw(x), None,
                   jnp.asarray(t.numpy()), train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, rtol=1e-3, atol=1e-4)


def test_import_unconsumed_keys_raise():
    """Mapping drift must fail loudly, not silently drop weights."""
    from network.vqTransformer.submodule.mingpt import GPT as TorchGPT

    tg = TorchGPT(vocab_size=16, block_size=8, n_layer=1, n_head=2, n_embd=8)
    sd = _sd(tg)
    sd["blocks.0.attn.extra_weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconverted"):
        ti.convert_gpt(sd)


@pytest.mark.slow
def test_import_cli_end_to_end(tiny_config, tmp_path):
    """.pth on disk → CLI → restore-able Orbax checkpoint whose params
    reproduce the torch forward (the real migration flow)."""
    import yaml

    from tools.import_torch_checkpoint import main as import_main
    from network.vqvae.vqvae import VQVAE as TorchVQVAE

    from vq_vae_gan_diffusion_tpu.models.vqvae import VQVAE
    from vq_vae_gan_diffusion_tpu.utils import restore_checkpoint

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

    torch.manual_seed(5)
    tvq = TorchVQVAE(config=_ref_cfg()).eval()
    pth = tmp_path / "vqvae.pth"
    torch.save(tvq.state_dict(), str(pth))

    out = tmp_path / "imported"
    rc = import_main(["--config", str(cfg_path), "--pth", str(pth),
                      "--out", str(out), "--step", "7"])
    assert rc == 0

    tree = restore_checkpoint(str(out))
    assert int(tree["step"]) == 7
    params = tree["state"]["vqvae_params"]

    x = torch.randn(2, CH, IMG, IMG)
    with torch.no_grad():
        dec_ref, idx_ref, _ = tvq(x)
    jvq = VQVAE(img_size=IMG, img_channels=CH, latent_channels=LATENT_CH,
                latent_size=LATENT_SIZE, intermediate_channels=tuple(INTERM),
                num_residual_blocks_encoder=1, num_residual_blocks_decoder=1,
                dropout=0.0, attention_resolution=tuple(ATTN),
                num_codebook_vectors=N_CODES)
    dec, idx, _ = jvq.apply({"params": params}, _nchw(x))
    np.testing.assert_array_equal(np.asarray(idx).ravel(),
                                  idx_ref.numpy().ravel())
    np.testing.assert_allclose(np.transpose(np.asarray(dec), (0, 3, 1, 2)),
                               dec_ref.numpy(), rtol=1e-3, atol=1e-4)
