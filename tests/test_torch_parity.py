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
# append, not insert(0): the reference repo has top-level train.py /
# generate.py / vq_diffusion.py that would shadow this repo's CLI modules
# for every test collected after this one (only `network.*` is needed here,
# which has no repo-root counterpart)
sys.path.append(REF)

import jax
import jax.numpy as jnp

torch.manual_seed(0)


def t2j(x):
    # COPY is load-bearing: jnp.asarray over a torch-backed numpy view is
    # zero-copy on CPU; the dynamics harness reuses these transplants while
    # torch opt.step() mutates the source tensors in place.
    return jnp.asarray(np.array(x.detach().numpy(), copy=True))


def conv_w(tconv):
    """torch OIHW → flax HWIO kernel + bias."""
    w = tconv.weight.detach().numpy()
    out = {"kernel": jnp.asarray(np.array(np.transpose(w, (2, 3, 1, 0)),
                                          copy=True))}
    if tconv.bias is not None:
        out["bias"] = t2j(tconv.bias)
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


# --- ShuffleNet U-Net ("Unet3D") parity --------------------------------------

def _bn_w(tbn):
    return ({"scale": t2j(tbn.weight), "bias": t2j(tbn.bias)},
            {"mean": t2j(tbn.running_mean), "var": t2j(tbn.running_var)})


def _convbnsilu_w(tmod):
    """reference ConvBnSiLu.module = [Conv2d, BatchNorm2d, SiLU]."""
    bn_p, bn_s = _bn_w(tmod.module[1])
    return ({"conv": conv_w(tmod.module[0]), "bn": bn_p}, {"bn": bn_s})


def _bottleneck_w(tmod):
    """reference ResidualBottleneck → our param/stat subtrees."""
    p, s = {}, {}
    p["b1_dw"] = conv_w(tmod.branch1[0])
    p["b1_bn"], s["b1_bn"] = _bn_w(tmod.branch1[1])
    p["b1_pw"], s["b1_pw"] = _convbnsilu_w(tmod.branch1[2])
    p["b2_pw1"], s["b2_pw1"] = _convbnsilu_w(tmod.branch2[0])
    p["b2_dw"] = conv_w(tmod.branch2[1])
    p["b2_bn"], s["b2_bn"] = _bn_w(tmod.branch2[2])
    p["b2_pw2"], s["b2_pw2"] = _convbnsilu_w(tmod.branch2[3])
    return p, s


def _downsample_w(tmod):
    return _bottleneck_w(tmod)  # same five-submodule layout


def _lin_w(lin):
    return {"kernel": t2j(lin.weight).T, "bias": t2j(lin.bias)}


def _time_mlp_w(tmod):
    return {"fc1": _lin_w(tmod.mlp[0]), "fc2": _lin_w(tmod.mlp[2])}


def transplant_shuffle_unet(tm):
    """Full reference Unet3D → (params, batch_stats) for our ShuffleUNet.
    Shared with the training-dynamics harness."""
    params, stats = {}, {}
    ip, is_ = _convbnsilu_w(tm.init_conv)
    params["init_conv"], stats["init_conv"] = ip, is_
    params["time_embedding"] = {"embedding": t2j(tm.time_embedding.weight)}
    for i, eb in enumerate(tm.encoder_blocks):
        ep, es = {}, {}
        for k in range(4):
            ep[f"bn{k}"], es[f"bn{k}"] = _bottleneck_w(eb.conv0[k])
        ep["time_mlp"] = _time_mlp_w(eb.time_mlp)
        ep["down"], es["down"] = _downsample_w(eb.conv1)
        params[f"enc{i}"], stats[f"enc{i}"] = ep, es
    for i in range(3):
        params[f"mid{i}"], stats[f"mid{i}"] = _bottleneck_w(tm.mid_block[i])
    for i, db in enumerate(tm.decoder_blocks):
        dp, ds = {}, {}
        for k in range(4):
            dp[f"bn{k}"], ds[f"bn{k}"] = _bottleneck_w(db.conv0[k])
        dp["time_mlp"] = _time_mlp_w(db.time_mlp)
        dp["bn4"], ds["bn4"] = _bottleneck_w(db.conv1)
        params[f"dec{i}"], stats[f"dec{i}"] = dp, ds
    params["final_conv"] = conv_w(tm.final_conv)
    return params, stats


def test_shuffle_unet3d_parity():
    """Full reference Unet3D vs our ShuffleUNet, weights transplanted,
    non-trivial BN running stats (unet3d.py:127-163)."""
    from network.vqDiffusion.submodule.unet3d import Unet3D as RefUnet3D

    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    tm = RefUnet3D(timesteps=10, time_embedding_dim=32, in_channels=1,
                   out_channels=1, base_dim=16, dim_mults=[1, 2])
    # accumulate non-trivial BN running stats, then freeze
    tm.train()
    with torch.no_grad():
        for i in range(3):
            tm(torch.randn(2, 1, 32, 16), None, torch.randint(0, 10, (2,)))
    tm.eval()

    x = torch.randn(2, 1, 32, 16)
    t = torch.tensor([3, 7])
    with torch.no_grad():
        ref = tm(x, None, t).numpy()

    params, stats = transplant_shuffle_unet(tm)

    ju = ShuffleUNet(timesteps=10, time_embedding_dim=32, in_channels=1,
                     out_channels=1, base_dim=16, dim_mults=(1, 2))
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out = ju.apply({"params": params, "batch_stats": stats}, xj, None,
                   jnp.asarray(t.numpy()), train=False)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)

    # and the BN-folded fused-inference path used by the sampling chain
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    folded = fold_unet({"params": params, "batch_stats": stats},
                       dtype=jnp.float32)
    out2 = apply_folded(folded, xj, jnp.asarray(t.numpy()), use_pallas=False,
                        dtype=jnp.float32)
    out2 = np.transpose(np.asarray(out2), (0, 3, 1, 2))
    np.testing.assert_allclose(out2, ref, rtol=1e-3, atol=1e-4)


# --- Conv1d U-Net ("Unet2D") parity ------------------------------------------

def _c1d_w(tconv):
    """torch Conv1d [O, I, K] → flax [K, I, O]."""
    out = {"kernel": jnp.asarray(np.array(
        np.transpose(tconv.weight.detach().numpy(), (2, 1, 0)), copy=True))}
    if tconv.bias is not None:
        out["bias"] = t2j(tconv.bias)
    return out


def _rms_w(tnorm):
    return {"g": t2j(tnorm.g).reshape(-1)}


def _resnet1d_w(tb):
    p = {
        "time_proj": _lin_w(tb.mlp[1]),
        "block1": {"proj": _c1d_w(tb.block1.proj),
                   "RMSNorm_0": _rms_w(tb.block1.norm)},
        "block2": {"proj": _c1d_w(tb.block2.proj),
                   "RMSNorm_0": _rms_w(tb.block2.norm)},
    }
    if not isinstance(tb.res_conv, torch.nn.Identity):
        p["res_conv"] = _c1d_w(tb.res_conv)
    return p


def _attn1d_w(tattn):
    """reference LinearAttention/Attention (to_qkv + to_out[+norm])."""
    if isinstance(tattn.to_out, torch.nn.Sequential):
        return {"to_qkv": _c1d_w(tattn.to_qkv),
                "to_out": _c1d_w(tattn.to_out[0]),
                "out_norm": _rms_w(tattn.to_out[1])}
    return {"to_qkv": _c1d_w(tattn.to_qkv), "to_out": _c1d_w(tattn.to_out)}


def transplant_unet1d(tm):
    """Reference Conv1d U-Net → params for our Unet1D. Shared with the
    training-dynamics harness."""
    params = {
        "init_conv": _c1d_w(tm.init_conv),
        "time_fc1": _lin_w(tm.time_mlp[1]),
        "time_fc2": _lin_w(tm.time_mlp[3]),
        "final_res": _resnet1d_w(tm.final_res_block),
        "final_conv": _c1d_w(tm.final_conv),
    }
    n_lin = 0
    for i, (r1, r2, attn, down) in enumerate(tm.downs):
        params[f"down{i}_res1"] = _resnet1d_w(r1)
        params[f"down{i}_res2"] = _resnet1d_w(r2)
        params[f"down{i}_attn"] = {"RMSNorm_0": _rms_w(attn.fn.norm)}
        params[f"LinearAttention1D_{n_lin}"] = _attn1d_w(attn.fn.fn)
        n_lin += 1
        params[f"down{i}_down"] = _c1d_w(
            down if isinstance(down, torch.nn.Conv1d) else down)
    params["mid_res1"] = _resnet1d_w(tm.mid_block1)
    params["mid_attn"] = {"RMSNorm_0": _rms_w(tm.mid_attn.fn.norm)}
    params["Attention1D_0"] = _attn1d_w(tm.mid_attn.fn.fn)
    params["mid_res2"] = _resnet1d_w(tm.mid_block2)
    for i, (r1, r2, attn, up) in enumerate(tm.ups):
        params[f"up{i}_res1"] = _resnet1d_w(r1)
        params[f"up{i}_res2"] = _resnet1d_w(r2)
        params[f"up{i}_attn"] = {"RMSNorm_0": _rms_w(attn.fn.norm)}
        params[f"LinearAttention1D_{n_lin}"] = _attn1d_w(attn.fn.fn)
        n_lin += 1
        params[f"up{i}_up"] = _c1d_w(
            up if isinstance(up, torch.nn.Conv1d) else up[1])
    return params


def test_unet1d_parity():
    """Reference Conv1d U-Net (unet2d.py:215-357) vs our Unet1D with
    transplanted weights: RMSNorm, FiLM scale-shift ResnetBlocks, linear+full
    attention, down/upsample convs, sinusoidal time embedding."""
    from network.vqDiffusion.submodule.unet2d import Unet2D as RefUnet2D

    from vq_vae_gan_diffusion_tpu.models.unet1d import Unet1D

    tm = RefUnet2D(dim=16, dim_mults=(1, 2), channels=8, out_dim=8).eval()
    x = torch.randn(2, 8, 32)      # [B, C, N]
    tt = torch.tensor([3, 7])
    with torch.no_grad():
        ref = tm(x, None, tt).numpy()

    params = transplant_unet1d(tm)
    ju = Unet1D(dim=16, dim_mults=(1, 2), channels=8, out_dim=8)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 1)))  # [B, N, C]
    out = ju.apply({"params": params}, xj, None, jnp.asarray(tt.numpy()))
    out = np.transpose(np.asarray(out), (0, 2, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)
