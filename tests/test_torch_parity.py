"""Numerical parity vs the reference PyTorch implementation.

Imports the reference modules READ-ONLY from /root/reference (skipped when the
mount or torch is absent), copies torch weights into the JAX modules, and
compares forward outputs. This is the strongest form of the golden-value
testing planned in SURVEY §4(b): conv padding asymmetry, GroupNorm epsilon,
attention scaling, codebook loss semantics and GPT logits are all covered
end-to-end.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, REF)

import jax
import jax.numpy as jnp

torch.manual_seed(0)


def t2j(x):
    return jnp.asarray(x.detach().numpy())


def conv_w(tconv):
    """torch OIHW → flax HWIO kernel + bias."""
    w = tconv.weight.detach().numpy()
    out = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if tconv.bias is not None:
        out["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    return out


def gn_w(tgn):
    # our GroupNorm wrapper nests the flax GroupNorm one level deeper
    return {"GroupNorm_0": {"scale": t2j(tgn.group_norm.weight),
                            "bias": t2j(tgn.group_norm.bias)}}


@pytest.fixture(scope="module")
def ref_blocks():
    from network.common import blocks
    return blocks


def test_residual_block_parity(ref_blocks):
    from vq_vae_gan_diffusion_tpu.models.blocks import ResidualBlock
    tb = ref_blocks.ResidualBlock(32, 64).eval()
    x = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        ref = tb(x).numpy()

    params = {
        "GroupNorm_0": gn_w(tb.block[0]),
        "conv1": conv_w(tb.block[2]),
        "GroupNorm_1": gn_w(tb.block[3]),
        "conv2": conv_w(tb.block[6]),
        "shortcut": conv_w(tb.conv_shortcut),
    }
    jb = ResidualBlock(out_channels=64)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = jb.apply({"params": params}, xj)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_downsample_parity(ref_blocks):
    """The (0,1,0,1) asymmetric pad must match bit-for-bit semantics."""
    from vq_vae_gan_diffusion_tpu.models.blocks import DownsampleBlock
    tb = ref_blocks.DownsampleBlock(8).eval()
    x = torch.randn(1, 8, 9, 9)  # odd size exercises the pad asymmetry
    with torch.no_grad():
        ref = tb(x).numpy()
    params = {"conv": conv_w(tb.conv)}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = DownsampleBlock().apply({"params": params}, xj)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_upsample_parity(ref_blocks):
    from vq_vae_gan_diffusion_tpu.models.blocks import UpsampleBlock
    tb = ref_blocks.UpsampleBlock(8).eval()
    x = torch.randn(1, 8, 5, 5)
    with torch.no_grad():
        ref = tb(x).numpy()
    params = {"conv": conv_w(tb.conv)}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = UpsampleBlock().apply({"params": params}, xj)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_nonlocal_block_parity(ref_blocks):
    """Includes the normalized-residual quirk (blocks.py:165,193)."""
    from vq_vae_gan_diffusion_tpu.models.blocks import NonLocalBlock
    tb = ref_blocks.NonLocalBlock(32).eval()
    x = torch.randn(2, 32, 8, 8)
    with torch.no_grad():
        ref = tb(x).numpy()
    params = {
        "GroupNorm_0": gn_w(tb.norm),
        "q": conv_w(tb.q), "k": conv_w(tb.k), "v": conv_w(tb.v),
        "proj_out": conv_w(tb.project_out),
    }
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = NonLocalBlock().apply({"params": params}, xj)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_codebook_parity():
    """Distance-argmin, straight-through and loss semantics vs codebook.py."""
    from network.vqvae.submodule.codebook import CodeBook as TorchCodeBook

    from vq_vae_gan_diffusion_tpu.models.codebook import quantize

    tcb = TorchCodeBook(num_codebook_vectors=64, latent_dim=16).eval()
    z = torch.randn(2, 16, 4, 4)
    with torch.no_grad():
        zq_ref, idx_ref, loss_ref = tcb(z)

    cb = t2j(tcb.codebook.weight)
    zj = jnp.asarray(np.transpose(z.numpy(), (0, 2, 3, 1)))
    zq, idx, loss = quantize(zj, cb, beta=0.25)
    np.testing.assert_array_equal(np.asarray(idx).ravel(),
                                  idx_ref.numpy().ravel())
    np.testing.assert_allclose(np.transpose(np.asarray(zq), (0, 3, 1, 2)),
                               zq_ref.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_discriminator_parity():
    from network.vqgan.discriminator import Discriminator as TorchDisc

    from vq_vae_gan_diffusion_tpu.models.discriminator import Discriminator

    td = TorchDisc(image_channels=3).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = td(x).numpy()

    # layer order: conv0, LeakyReLU, [conv,bn,lrelu]×3, conv_out
    seq = td.model
    params = {"conv0": conv_w(seq[0]), "conv_out": conv_w(seq[11])}
    stats = {}
    for i, base in enumerate((2, 5, 8), start=1):
        params[f"conv{i}"] = conv_w(seq[base])
        bn = seq[base + 1]
        params[f"bn{i}"] = {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}
        stats[f"bn{i}"] = {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = Discriminator().apply({"params": params, "batch_stats": stats}, xj,
                                train=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_mingpt_parity():
    from network.vqTransformer.submodule.mingpt import GPT as TorchGPT

    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT

    tg = TorchGPT(vocab_size=64, block_size=32, n_layer=2, n_head=4,
                  n_embd=32).eval()
    idx = torch.randint(0, 64, (2, 16))
    with torch.no_grad():
        ref, _ = tg(idx)
    ref = ref.numpy()

    def dense_w(lin):
        out = {"kernel": t2j(lin.weight).T}
        if lin.bias is not None:
            out["bias"] = t2j(lin.bias)
        return out

    def ln_w(ln):
        return {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}

    params = {
        "tok_emb": {"embedding": t2j(tg.tok_emb.weight)},
        "pos_emb": t2j(tg.pos_emb),
        "ln_f": ln_w(tg.ln_f),
        "head": {"kernel": t2j(tg.head.weight).T},
    }
    for i, blk in enumerate(tg.blocks):
        params[f"block{i}"] = {
            "ln1": ln_w(blk.ln1), "ln2": ln_w(blk.ln2),
            "attn": {"query": dense_w(blk.attn.query),
                     "key": dense_w(blk.attn.key),
                     "value": dense_w(blk.attn.value),
                     "proj": dense_w(blk.attn.proj)},
            "fc1": dense_w(blk.mlp[0]), "fc2": dense_w(blk.mlp[2]),
        }
    jg = GPT(vocab_size=64, block_size=32, n_layer=2, n_head=4, n_embd=32)
    out = np.asarray(jg.apply({"params": params}, jnp.asarray(idx.numpy())))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_discrete_schedule_parity():
    """alpha_schedule golden values vs diffusion_vq_official.py:65-78."""
    from network.vqDiffusion.submodule.diffusion_vq_official import \
        alpha_schedule as ref_alpha

    from vq_vae_gan_diffusion_tpu.diffusion.schedules import \
        discrete_alpha_schedule

    ref = ref_alpha(100, N=1023)
    ours = discrete_alpha_schedule(100, N=1023)
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(o, r, rtol=1e-12)


def test_cosine_schedule_parity():
    from network.vqDiffusion.submodule.diffusion_gaussian2d import \
        cosine_beta_schedule

    from vq_vae_gan_diffusion_tpu.diffusion.schedules import cosine_betas

    ref = cosine_beta_schedule(1000).numpy()
    ours = cosine_betas(1000)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)
