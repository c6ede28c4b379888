"""Cross-framework TRAINING-DYNAMICS parity (VERDICT r2, next-step #3).

Per-module forward parity (test_torch_parity.py) pins the models; this file
pins the *training dynamics*: the reference's actual torch train step and our
jitted JAX step run side-by-side for dozens of steps on identical synthetic
batches with transplanted initial weights, and the full loss trajectories must
agree. Optimizer semantics (torch.optim.Adam vs optax.adam), the adaptive-λ
double-VJP, the retain_graph gradient-accumulation quirk, discriminator BN
batch-stats, codebook straight-through gradients and the discrete-diffusion
LtState telemetry only show up here.

Covered:
- VQGAN: the reference step sequence (worker/vqganVqvaeWorker.py:163-254) —
  forward, L1 reconstruction, hinge GAN, adaptive λ (vqvae.py:155-180),
  ``vq_loss.backward(retain_graph=True)`` + ``gan_loss.backward()`` gradient
  flow, two Adams — vs train/vqgan_worker.py's single jitted step.
  (perceptual factor 0: the zero-egress image has no LPIPS weights; the LPIPS
  graph itself is validated separately in test_lpips_roundtrip.py.)
- Discrete VQ-diffusion: the reference multinomial loss
  (diffusion_vq_official.py:336-406) incl. Lt_history/Lt_count buffer dynamics
  vs diffusion/discrete.py::train_loss, with shared injected t and gumbel
  uniforms so both frameworks follow the same sample path.
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

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# torch → flax weight transplant (full VQVAE + discriminator)
# ---------------------------------------------------------------------------


def t2j(x):
    # COPY is load-bearing: jnp.asarray over a torch-backed numpy view is
    # zero-copy on CPU, so without it the "transplanted" jax params would
    # alias torch storage and silently track every torch opt.step() in-place
    # mutation during the side-by-side run.
    return jnp.asarray(np.array(x.detach().numpy(), copy=True))


def _conv_w(tconv):
    w = tconv.weight.detach().numpy()
    out = {"kernel": jnp.asarray(np.array(np.transpose(w, (2, 3, 1, 0)),
                                          copy=True))}
    if tconv.bias is not None:
        out["bias"] = t2j(tconv.bias)
    return out


def _gn_w(tgn):
    return {"GroupNorm_0": {"scale": t2j(tgn.group_norm.weight),
                            "bias": t2j(tgn.group_norm.bias)}}


def _res_w(tb):
    # torch ResidualBlock.block: [GN, Swish, conv, GN, Swish, Dropout, conv]
    out = {"GroupNorm_0": _gn_w(tb.block[0]), "conv1": _conv_w(tb.block[2]),
           "GroupNorm_1": _gn_w(tb.block[3]), "conv2": _conv_w(tb.block[6])}
    if tb.in_channels != tb.out_channels:
        out["shortcut"] = _conv_w(tb.conv_shortcut)
    return out


def _attn_w(tb):
    return {"GroupNorm_0": _gn_w(tb.norm), "q": _conv_w(tb.q),
            "k": _conv_w(tb.k), "v": _conv_w(tb.v),
            "proj_out": _conv_w(tb.project_out)}


def transplant_encoder(tenc, *, img_size, interm, n_res, attn_res):
    """Walk the torch Sequential in construction order (encoder.py:43-97),
    emitting our flax Encoder's names (models/encoder.py:43-63)."""
    it = iter(tenc.model)
    params = {"conv_in": _conv_w(next(it))}
    channels = [interm[0], *interm]
    size = img_size
    for n in range(len(channels) - 1):
        for i in range(n_res):
            params[f"stage{n}_res{i}"] = _res_w(next(it))
            if size in attn_res:
                params[f"stage{n}_attn{i}"] = _attn_w(next(it))
        if n != len(channels) - 2:
            params[f"stage{n}_down"] = {"conv": _conv_w(next(it).conv)}
            size //= 2
    params["mid_res1"] = _res_w(next(it))
    params["mid_attn"] = _attn_w(next(it))
    params["mid_res2"] = _res_w(next(it))
    params["norm_out"] = _gn_w(next(it))
    next(it)  # Swish (no params)
    params["conv_out"] = _conv_w(next(it))
    return params


def transplant_decoder(tdec, *, latent_size, interm, n_res, attn_res):
    """decoder.py:50-99 construction order → models/decoder.py:45-65 names."""
    it = iter(tdec.model)
    params = {"conv_in": _conv_w(next(it)),
              "mid_res1": _res_w(next(it)),
              "mid_attn": _attn_w(next(it)),
              "mid_res2": _res_w(next(it))}
    channels = list(interm)[::-1]
    size = latent_size
    for n in range(len(channels)):
        for i in range(n_res):
            params[f"stage{n}_res{i}"] = _res_w(next(it))
            if size in attn_res:
                params[f"stage{n}_attn{i}"] = _attn_w(next(it))
        if n != 0:
            params[f"stage{n}_up"] = {"conv": _conv_w(next(it).conv)}
            size *= 2
    params["norm_out"] = _gn_w(next(it))
    next(it)  # Swish
    params["conv_out"] = _conv_w(next(it))
    return params


def transplant_vqvae(tvq, *, img_size, interm, n_res_enc, n_res_dec, attn_res,
                     latent_size):
    return {
        "encoder": transplant_encoder(tvq.encoder, img_size=img_size,
                                      interm=interm, n_res=n_res_enc,
                                      attn_res=attn_res),
        "decoder": transplant_decoder(tvq.decoder, latent_size=latent_size,
                                      interm=interm, n_res=n_res_dec,
                                      attn_res=attn_res),
        "codebook": {"embedding": t2j(tvq.codebook.codebook.weight)},
        "quant_conv": _conv_w(tvq.quant_conv),
        "post_quant_conv": _conv_w(tvq.post_quant_conv),
    }


def transplant_discriminator(tdisc):
    seq = tdisc.model
    params = {"conv0": _conv_w(seq[0]), "conv_out": _conv_w(seq[11])}
    stats = {}
    for i, base in enumerate((2, 5, 8), start=1):
        params[f"conv{i}"] = _conv_w(seq[base])
        bn = seq[base + 1]
        params[f"bn{i}"] = {"scale": t2j(bn.weight), "bias": t2j(bn.bias)}
        stats[f"bn{i}"] = {"mean": t2j(bn.running_mean),
                           "var": t2j(bn.running_var)}
    return params, stats


# ---------------------------------------------------------------------------
# 1. VQGAN train-step dynamics
# ---------------------------------------------------------------------------

IMG, CH, B = 32, 3, 4
INTERM = [32, 64]          # reference GroupNorm hardcodes 32 groups
LATENT_CH, LATENT_SIZE = 32, 16
N_CODES = 32
ATTN = [16]
LR, B1, B2 = 2.25e-4, 0.5, 0.9
STEPS = 24


def _torch_ref_config():
    return {
        "dataset": {"dataset_name": "synthetic",
                    "img_size": {"synthetic": IMG},
                    "img_channels": {"synthetic": CH}},
        "architecture": {"vqvae": {
            "latent_channels": LATENT_CH, "latent_size": LATENT_SIZE,
            "intermediate_channels": list(INTERM),
            "num_residual_blocks_encoder": 1,
            "num_residual_blocks_decoder": 1,
            "dropout": 0.0, "attention_resolution": list(ATTN),
            "num_codebook_vectors": N_CODES,
            "resume_path": None, "train_model": True,
            "freeze_weights": False}},
    }


def _jax_config(tiny_config):
    cfg = tiny_config
    for path, val in [
        ("architecture.model_name", "vqgan"),
        ("architecture.vqvae.latent_channels", LATENT_CH),
        ("architecture.vqvae.latent_size", LATENT_SIZE),
        ("architecture.vqvae.intermediate_channels", list(INTERM)),
        ("architecture.vqvae.attention_resolution", list(ATTN)),
        ("architecture.vqvae.num_codebook_vectors", N_CODES),
        ("trainer.vqvae.learning_rate", LR),
        ("trainer.vqvae.beta1", B1),
        ("trainer.vqvae.beta2", B2),
        ("trainer.vqvae.perceptual_loss_factor", 0.0),
        ("trainer.vqvae.rec_loss_factor", 1.0),
        ("trainer.descriminator.disc_factor", 1.0),
        ("trainer.descriminator.disc_start", 0),
    ]:
        cfg = cfg.replace_path(path, val)
    return cfg


@pytest.mark.slow
def test_vqvae_train_dynamics(tiny_config, tmp_path):
    """Pure VQVAE (no GAN): deterministic dynamics, so the trajectories must
    track tightly for the whole run — the strictest cross-framework statement
    available (reference step without the discriminator branch,
    vqganVqvaeWorker.py:222-226)."""
    from network.vqvae.vqvae import VQVAE as TorchVQVAE

    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    torch.manual_seed(2)
    tvq = TorchVQVAE(config=_torch_ref_config())
    opt_v = torch.optim.Adam(
        list(tvq.encoder.parameters()) + list(tvq.decoder.parameters())
        + list(tvq.codebook.parameters()) + list(tvq.quant_conv.parameters())
        + list(tvq.post_quant_conv.parameters()),
        lr=LR, eps=1e-8, betas=(B1, B2))

    cfg = _jax_config(tiny_config).replace_path("architecture.model_name",
                                                "vqvae")
    worker = VQGANVQVAEWorker(cfg, str(tmp_path / "run"), debug=True)
    state = worker.init_state()
    vq_params = transplant_vqvae(tvq, img_size=IMG, interm=INTERM,
                                 n_res_enc=1, n_res_dec=1, attn_res=set(ATTN),
                                 latent_size=LATENT_SIZE)
    state = state.replace(vqvae_params=vq_params,
                          opt_state_g=worker.opt_g.init(vq_params))

    rng = np.random.default_rng(5)
    batches = rng.standard_normal((STEPS, B, IMG, IMG, CH)).astype(np.float32) * 0.5
    key = jax.random.PRNGKey(0)
    traj_t, traj_j = [], []
    for s in range(STEPS):
        imgs_t = torch.from_numpy(np.transpose(batches[s], (0, 3, 1, 2)))
        decoded, _, q_loss = tvq(imgs_t)
        prl = (imgs_t - decoded).abs().mean()
        vq_loss = prl + q_loss
        opt_v.zero_grad()
        vq_loss.backward()
        opt_v.step()
        traj_t.append([float(vq_loss), float(q_loss), float(prl)])

        state, m = worker.train_step(state, jnp.asarray(batches[s]), key)
        traj_j.append([float(m["vq_loss"]), float(m["q_loss"]),
                       float(m["perceptual_rec_loss"])])

    np.testing.assert_allclose(np.asarray(traj_j), np.asarray(traj_t),
                               rtol=2e-3, atol=2e-4,
                               err_msg="vqvae loss trajectories diverged")
    cb_j = np.asarray(state.vqvae_params["codebook"]["embedding"])
    cb_t = tvq.codebook.codebook.weight.detach().numpy()
    np.testing.assert_allclose(cb_j, cb_t, rtol=1e-2, atol=3e-4)


@pytest.mark.slow
def test_vqgan_train_dynamics(tiny_config, tmp_path):
    from network.vqgan.discriminator import Discriminator as TorchDisc
    from network.vqvae.vqvae import VQVAE as TorchVQVAE

    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    torch.manual_seed(1)
    tvq = TorchVQVAE(config=_torch_ref_config())
    tdisc = TorchDisc(image_channels=CH)
    # reference step hyperparameters (vqganVqvaeWorker.py:137-160)
    opt_v = torch.optim.Adam(
        list(tvq.encoder.parameters()) + list(tvq.decoder.parameters())
        + list(tvq.codebook.parameters()) + list(tvq.quant_conv.parameters())
        + list(tvq.post_quant_conv.parameters()),
        lr=LR, eps=1e-8, betas=(B1, B2))
    opt_d = torch.optim.Adam(tdisc.parameters(), lr=LR, eps=1e-8, betas=(B1, B2))

    # --- JAX side with transplanted weights --------------------------------
    cfg = _jax_config(tiny_config)
    worker = VQGANVQVAEWorker(cfg, str(tmp_path / "run"), debug=True)
    state = worker.init_state()
    vq_params = transplant_vqvae(tvq, img_size=IMG, interm=INTERM,
                                 n_res_enc=1, n_res_dec=1, attn_res=set(ATTN),
                                 latent_size=LATENT_SIZE)
    disc_params, disc_stats = transplant_discriminator(tdisc)
    # shape sanity: transplanted tree must match the initialized tree exactly
    jax.tree_util.tree_map(lambda a, b: None if a.shape == b.shape else
                           (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
                           state.vqvae_params, vq_params)
    state = state.replace(
        vqvae_params=vq_params, disc_params=disc_params,
        disc_batch_stats=disc_stats,
        opt_state_g=worker.opt_g.init(vq_params),
        opt_state_d=worker.opt_d.init(disc_params))

    rng = np.random.default_rng(7)
    batches = rng.standard_normal((STEPS, B, IMG, IMG, CH)).astype(np.float32) * 0.5

    traj_t, traj_j = [], []
    key = jax.random.PRNGKey(0)
    for s in range(STEPS):
        imgs_t = torch.from_numpy(np.transpose(batches[s], (0, 3, 1, 2)))

        # ---- reference step (vqganVqvaeWorker.py:163-254) ----
        decoded, _, q_loss = tvq(imgs_t)
        prl = (imgs_t - decoded).abs().mean()         # rec_factor=1, lpips off
        disc_real = tdisc(imgs_t)
        disc_fake = tdisc(decoded)
        df = tvq.adopt_weight(1.0, s, threshold=0)
        g_loss = -disc_fake.mean()
        lam = tvq.calculate_lambda(prl, g_loss)
        vq_loss = prl + q_loss + df * lam * g_loss
        d_loss_real = torch.relu(1.0 - disc_real).mean()
        d_loss_fake = torch.relu(1.0 + disc_fake).mean()
        gan_loss = df * 0.5 * (d_loss_real + d_loss_fake)
        opt_v.zero_grad()
        vq_loss.backward(retain_graph=True)
        opt_d.zero_grad()
        gan_loss.backward()
        opt_d.step()
        opt_v.step()
        traj_t.append([float(vq_loss), float(gan_loss), float(q_loss),
                       float(prl), float(lam)])

        # ---- our jitted step ----
        state, m = worker.train_step(state, jnp.asarray(batches[s]), key)
        traj_j.append([float(m["vq_loss"]), float(m["gan_loss"]),
                       float(m["q_loss"]), float(m["perceptual_rec_loss"]),
                       float(m["lambda"])])

    traj_t = np.asarray(traj_t)
    traj_j = np.asarray(traj_j)
    # Adversarial dynamics are chaotic: hinge-relu kinks and the λ gradient-
    # norm ratio amplify f32 noise exponentially, so exact tracking is only
    # meaningful early. Assert (a) tight agreement for the first 5 steps —
    # this is where a wrong gradient flow (e.g. a missing retain_graph
    # accumulation or a non-stop-gradiented D) shows up immediately — and
    # (b) the same loss *level* over the whole window.
    np.testing.assert_allclose(traj_j[:5, :4], traj_t[:5, :4],
                               rtol=2e-2, atol=2e-3,
                               err_msg="early loss trajectories diverged")
    np.testing.assert_allclose(traj_j[:5, 4], traj_t[:5, 4], rtol=5e-2,
                               atol=2e-3, err_msg="adaptive λ diverged")
    mean_j, mean_t = traj_j.mean(axis=0), traj_t.mean(axis=0)
    np.testing.assert_allclose(mean_j[[0, 2, 3]], mean_t[[0, 2, 3]],
                               rtol=0.1, err_msg="window-mean loss levels")


# ---------------------------------------------------------------------------
# 2. Discrete VQ-diffusion loss dynamics (incl. Lt buffers)
# ---------------------------------------------------------------------------

K, N, T, H, DB = 16, 16, 8, 32, 8
D_STEPS = 20
D_LR = 1e-3


class _TinyTorchDenoiser(torch.nn.Module):
    """Minimal denoiser with the reference's model contract
    (diffusion_vq_official.py:211-236): takes log-onehot [B,1,K,N], returns
    logits [B,K-1,N]; ``input_dim`` consumed by the wrapper's constructor."""
    input_dim = 3

    def __init__(self):
        super().__init__()
        self.l1 = torch.nn.Linear(K, H)
        self.l2 = torch.nn.Linear(H, K - 1)
        self.temb = torch.nn.Parameter(torch.randn(T, H) * 0.1)

    def forward(self, log_x_t, cond_emb, t):
        x = log_x_t.squeeze(1).permute(0, 2, 1).exp()          # [B,N,K]
        h = torch.tanh(self.l1(x) + self.temb[t][:, None, :])
        return self.l2(h).permute(0, 2, 1)                     # [B,K-1,N]


def _tiny_jax_apply(p, log_x, t):
    x = jnp.exp(log_x)                                          # [B,N,K]
    h = jnp.tanh(x @ p["w1"] + p["b1"] + p["temb"][t][:, None, :])
    return h @ p["w2"] + p["b2"]                                # [B,N,K-1]


@pytest.mark.slow
def test_discrete_vq_diffusion_train_dynamics():
    import optax
    from network.vqDiffusion.submodule.diffusion_vq_official import (
        Diffusion_VQ_Official, index_to_log_onehot)

    from vq_vae_gan_diffusion_tpu.diffusion.discrete import (DiscreteDiffusion,
                                                             LtState)

    torch.manual_seed(3)
    tmodel = _TinyTorchDenoiser()
    tdiff = Diffusion_VQ_Official(
        model=tmodel, vocab_size=K, seq_len=N, diffusion_step=T,
        auxiliary_loss_weight=5e-4, adaptive_auxiliary_loss=True)
    opt_t = torch.optim.Adam(tmodel.parameters(), lr=D_LR)

    params = {"w1": t2j(tmodel.l1.weight).T, "b1": t2j(tmodel.l1.bias),
              "w2": t2j(tmodel.l2.weight).T, "b2": t2j(tmodel.l2.bias),
              "temb": t2j(tmodel.temb)}
    jdiff = DiscreteDiffusion(num_classes=K, seq_len=N, timesteps=T,
                              auxiliary_loss_weight=5e-4,
                              adaptive_auxiliary_loss=True)
    opt_j = optax.adam(D_LR)
    opt_state = opt_j.init(params)
    lt = LtState.init(T)

    rng = np.random.default_rng(11)
    key = jax.random.PRNGKey(0)
    losses_t, losses_j = [], []
    for s in range(D_STEPS):
        # shared sample path: t a permutation (unique ⇒ scatter order can't
        # differ) and one gumbel-uniform tensor for the x_t draw
        t_np = rng.permutation(T).astype(np.int64)
        u_np = rng.random((DB, K, N)).astype(np.float32)        # torch layout
        x0_np = rng.integers(0, K - 1, size=(DB, N))

        # ---- reference loss (diffusion_vq_official.py:336-406) ----
        tdiff.sample_time = lambda b, device, method: (
            torch.from_numpy(t_np), torch.full((b,), 1.0 / T))

        def _t_sample(logits, _u=torch.from_numpy(u_np)):
            g = -torch.log(-torch.log(_u + 1e-30) + 1e-30)
            return index_to_log_onehot((g + logits).argmax(dim=1), K)

        tdiff.log_sample_categorical = _t_sample
        out = tdiff(torch.from_numpy(x0_np))
        opt_t.zero_grad()
        out["loss"].backward()
        opt_t.step()
        losses_t.append(float(out["loss"]))

        # ---- our loss with the same injected noise ----
        g_j = jnp.asarray(
            -np.log(-np.log(u_np + np.float32(1e-30)) + np.float32(1e-30))
            .transpose(0, 2, 1))                                # [B,N,K]
        jdiff.sample_time = lambda rng, b, lt_, _t=t_np: (
            jnp.asarray(_t), jnp.full((b,), 1.0 / T, jnp.float32))
        jdiff._gumbel = lambda rng, shape: g_j

        def loss_fn(p, lt_):
            jdiff.model_fn = lambda log_x, t: _tiny_jax_apply(p, log_x, t)
            loss, _, new_lt = jdiff.train_loss(key, jnp.asarray(x0_np), lt_)
            return loss, new_lt

        (loss, lt), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, lt)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss))

        # Lt buffer dynamics must track the reference's registered buffers
        np.testing.assert_allclose(np.asarray(lt.Lt_history),
                                   tdiff.Lt_history.numpy(),
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lt.Lt_count),
                                   tdiff.Lt_count.numpy())

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=1e-4,
                               err_msg="discrete loss trajectories diverged")
    # Adam normalizes by sqrt(v̂)+ε, so for near-zero gradients the update is
    # ±lr regardless of magnitude — sub-ULP cross-framework gradient noise in
    # those coordinates grows to O(lr · steps); assert against that envelope
    np.testing.assert_allclose(np.asarray(params["w2"]),
                               tmodel.l2.weight.detach().numpy().T,
                               rtol=1e-2, atol=3e-4)


# ---------------------------------------------------------------------------
# 3. GPT stage-2 dynamics (AdamW decay/no-decay split, minGPT CE)
# ---------------------------------------------------------------------------

G_VOCAB, G_BLOCK, G_LAYER, G_HEAD, G_EMBD = 64, 32, 2, 4, 32
G_LR, G_B1, G_B2, G_WD = 4.5e-4, 0.9, 0.95, 0.01
G_STEPS, G_B = 20, 8


def _ref_adamw(tg):
    """The reference's decay/no-decay bucketing (mingpt configure_optimizers
    via vqTransformerWorker.py:94-133) applied to the bare GPT."""
    decay, no_decay = set(), set()
    for mn, m in tg.named_modules():
        for pn, _ in m.named_parameters(recurse=False):
            fpn = f"{mn}.{pn}" if mn else pn
            if pn.endswith("bias"):
                no_decay.add(fpn)
            elif pn.endswith("weight") and isinstance(m, torch.nn.Linear):
                decay.add(fpn)
            elif pn.endswith("weight") and isinstance(
                    m, (torch.nn.LayerNorm, torch.nn.Embedding)):
                no_decay.add(fpn)
    no_decay.add("pos_emb")
    pd = dict(tg.named_parameters())
    groups = [
        {"params": [pd[n] for n in sorted(decay)], "weight_decay": G_WD},
        {"params": [pd[n] for n in sorted(no_decay)], "weight_decay": 0.0},
    ]
    assert len(decay) + len(no_decay) == len(pd)
    return torch.optim.AdamW(groups, lr=G_LR, betas=(G_B1, G_B2))


@pytest.mark.slow
def test_gpt_train_dynamics():
    """minGPT CE training: the optax.adamw(mask=mingpt_decay_mask) update must
    reproduce torch AdamW with the reference's decay/no-decay groups — the
    masked-weight-decay semantics only show up across steps. Dropout is off on
    both sides (the reference's pkeep corruption and dropout draw from torch's
    RNG; corruption-free CE isolates optimizer+gradient parity)."""
    import optax
    from network.vqTransformer.submodule.mingpt import GPT as TorchGPT

    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT
    from vq_vae_gan_diffusion_tpu.train.vq_transformer_worker import \
        mingpt_decay_mask

    torch.manual_seed(4)
    tg = TorchGPT(vocab_size=G_VOCAB, block_size=G_BLOCK, n_layer=G_LAYER,
                  n_head=G_HEAD, n_embd=G_EMBD).eval()  # eval = dropout off
    opt_t = _ref_adamw(tg)

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
    jg = GPT(vocab_size=G_VOCAB, block_size=G_BLOCK, n_layer=G_LAYER,
             n_head=G_HEAD, n_embd=G_EMBD)
    opt_j = optax.adamw(G_LR, b1=G_B1, b2=G_B2, weight_decay=G_WD,
                        mask=mingpt_decay_mask)
    opt_state = opt_j.init(params)

    rng = np.random.default_rng(13)
    losses_t, losses_j = [], []
    for s in range(G_STEPS):
        toks = rng.integers(0, G_VOCAB, size=(G_B, G_BLOCK))
        inp, tgt = toks[:, :-1], toks[:, 1:]

        logits, _ = tg(torch.from_numpy(inp))
        loss_t = torch.nn.functional.cross_entropy(
            logits.reshape(-1, logits.size(-1)),
            torch.from_numpy(tgt).reshape(-1))
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t))

        def loss_fn(p):
            lg = jg.apply({"params": p}, jnp.asarray(inp))
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, jnp.asarray(tgt)).mean()

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4,
                               err_msg="GPT CE loss trajectories diverged")
    # weight-decay semantics: a DECAY param (linear kernel) and a NO-DECAY
    # param (LayerNorm scale) both still agree after 20 steps
    np.testing.assert_allclose(
        np.asarray(params["block0"]["attn"]["query"]["kernel"]),
        tg.blocks[0].attn.query.weight.detach().numpy().T,
        rtol=1e-2, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(params["ln_f"]["scale"]),
        tg.ln_f.weight.detach().numpy(), rtol=1e-2, atol=3e-4)


# ---------------------------------------------------------------------------
# 4. VAE train dynamics (MSE + KLD, shared reparameterization noise)
# ---------------------------------------------------------------------------

V_STEPS, V_KLDW = 20, 0.1


@pytest.mark.slow
def test_vae_train_dynamics():
    """vaeWorker step (worker/vaeWorker.py:114-140): MSE + kld_weight · KLD
    under Adam, with the SAME injected reparameterization noise on both sides
    (the loss formula here mirrors train/vae_worker.py:54-61 exactly — the
    worker's jitted step draws ε from jax.random, which cannot match torch's
    stream)."""
    import optax
    from network.vae.vae import VAE as TorchVAE

    from vq_vae_gan_diffusion_tpu.models.vae import VAE

    cfg = {
        "dataset": {"dataset_name": "synthetic",
                    "img_size": {"synthetic": IMG},
                    "img_channels": {"synthetic": CH}},
        "architecture": {"vae": {
            "latent_channels": LATENT_CH, "latent_size": LATENT_SIZE,
            "intermediate_channels": list(INTERM),
            "num_residual_blocks_encoder": 1,
            "num_residual_blocks_decoder": 1,
            "dropout": 0.0, "attention_resolution": list(ATTN)}},
    }
    torch.manual_seed(6)
    tvae = TorchVAE(config=cfg)
    opt_t = torch.optim.Adam(
        list(tvae.encoder.parameters()) + list(tvae.decoder.parameters())
        + list(tvae.fc_mu.parameters()) + list(tvae.fc_logvar.parameters()),
        lr=LR, eps=1e-8, betas=(B1, B2))

    params = {
        "encoder": transplant_encoder(tvae.encoder, img_size=IMG,
                                      interm=INTERM, n_res=1,
                                      attn_res=set(ATTN)),
        "decoder": transplant_decoder(tvae.decoder, latent_size=LATENT_SIZE,
                                      interm=INTERM, n_res=1,
                                      attn_res=set(ATTN)),
        "fc_mu": _conv_w(tvae.fc_mu),
        "fc_logvar": _conv_w(tvae.fc_logvar),
    }
    jvae = VAE(img_size=IMG, img_channels=CH, latent_channels=LATENT_CH,
               latent_size=LATENT_SIZE, intermediate_channels=tuple(INTERM),
               num_residual_blocks_encoder=1, num_residual_blocks_decoder=1,
               dropout=0.0, attention_resolution=tuple(ATTN))
    opt_j = optax.adam(LR, b1=B1, b2=B2, eps=1e-8)
    opt_state = opt_j.init(params)

    rng = np.random.default_rng(17)
    losses_t, losses_j = [], []
    for s in range(V_STEPS):
        x = rng.standard_normal((B, IMG, IMG, CH)).astype(np.float32) * 0.5
        eps = rng.standard_normal(
            (B, LATENT_SIZE, LATENT_SIZE, LATENT_CH)).astype(np.float32)
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        eps_t = torch.from_numpy(np.transpose(eps, (0, 3, 1, 2)))

        # ---- reference step with injected ε ----
        enc = tvae.encoder(xt)
        mu, logvar = tvae.fc_mu(enc), tvae.fc_logvar(enc)
        z = mu + eps_t * torch.exp(0.5 * logvar)      # vae.py:61-65
        dec = tvae.decoder(z)
        recon = torch.nn.functional.mse_loss(dec, xt)
        kld = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()) \
            / xt.numel()
        loss_t = recon + V_KLDW * kld                 # vaeWorker.py:127-130
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t))

        # ---- our model, same ε, loss formula of train/vae_worker.py ----
        xj, ej = jnp.asarray(x), jnp.asarray(eps)

        def loss_fn(p):
            mu_j, lv_j = jvae.apply({"params": p}, xj, method=VAE.encode)
            z_j = mu_j + ej * jnp.exp(0.5 * lv_j)
            dec_j = jvae.apply({"params": p}, z_j, method=VAE.decode)
            recon_j = jnp.mean((dec_j - xj) ** 2)
            kld_j = -0.5 * jnp.sum(1 + lv_j - mu_j ** 2 - jnp.exp(lv_j)) \
                / xj.size
            return recon_j + V_KLDW * kld_j

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4,
                               err_msg="VAE loss trajectories diverged")
    np.testing.assert_allclose(
        np.asarray(params["fc_mu"]["kernel"])[0, 0],
        tvae.fc_mu.weight.detach().numpy()[:, :, 0, 0].T,
        rtol=1e-2, atol=3e-4)


# ---------------------------------------------------------------------------
# 5+6. Gaussian diffusion dynamics: the full AdamW + OneCycleLR stack
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_gaussian3d_train_dynamics():
    """Pixel DDPM (ShuffleNet U-Net) with the reference's FULL optimizer stack:
    AdamW + OneCycleLR(pct_start=0.25, cos) whose default momentum cycling
    drives β₁ 0.95↔0.85 (gaussianDiffusion3DWorker.py:94-97). Pins our
    torch_onecycle_schedules + inject_hyperparams(adamw) against torch over
    24 steps with shared injected t/noise (loss: diffusion_gaussian3d.py
    forward :435-443)."""
    import optax
    from network.vqDiffusion.submodule.diffusion_gaussian3d import \
        GaussianDiffusion3D as RefG3D

    from tests.test_torch_parity import transplant_shuffle_unet
    from vq_vae_gan_diffusion_tpu.diffusion.gaussian3d import GaussianDiffusion3D
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet
    from vq_vae_gan_diffusion_tpu.utils.schedules import torch_onecycle_schedules

    T, TOTAL, GB = 10, 24, 4
    torch.manual_seed(8)
    tdiff = RefG3D(image_sizes=(32, 16), in_channels=1, time_embedding_dim=32,
                   timesteps=T, sampling_timesteps=T, base_dim=16,
                   dim_mults=[1, 2], sample_method="ddpm")
    tm = tdiff.model.train()
    opt_t = torch.optim.AdamW(tm.parameters(), lr=1e-3)
    sch_t = torch.optim.lr_scheduler.OneCycleLR(
        opt_t, 1e-3, total_steps=TOTAL, pct_start=0.25, anneal_strategy="cos")

    params, stats = transplant_shuffle_unet(tm)
    ju = ShuffleUNet(T, 32, 1, 1, 16, (1, 2))
    jd = GaussianDiffusion3D((32, 16), 1, T, T, None, "noise_mse", "ddpm")
    lr_fn, b1_fn = torch_onecycle_schedules(TOTAL, 1e-3)
    opt_j = optax.inject_hyperparams(optax.adamw)(learning_rate=lr_fn,
                                                  b1=b1_fn, weight_decay=0.01)
    opt_state = opt_j.init(params)

    rng = np.random.default_rng(23)
    losses_t, losses_j = [], []
    for s in range(TOTAL):
        x = rng.standard_normal((GB, 32, 16, 1)).astype(np.float32) * 0.5
        t_np = rng.integers(0, T, size=(GB,))
        noise = rng.standard_normal((GB, 32, 16, 1)).astype(np.float32)
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        nt = torch.from_numpy(np.transpose(noise, (0, 3, 1, 2)))
        tt = torch.from_numpy(t_np)

        # reference forward :435-443 with injected t/noise
        x_t = tdiff._forward_diffusion(xt, tt, nt)
        pred = tm(x_t, None, tt)
        loss_t = torch.nn.functional.mse_loss(pred, nt)
        opt_t.zero_grad()
        loss_t.backward()
        opt_t.step()
        sch_t.step()
        losses_t.append(float(loss_t))

        def loss_fn(p, st):
            x_t_j = jd.forward_diffusion(jnp.asarray(x), jnp.asarray(t_np),
                                         jnp.asarray(noise))
            pred_j, upd = ju.apply({"params": p, "batch_stats": st}, x_t_j,
                                   None, jnp.asarray(t_np), train=True,
                                   mutable=["batch_stats"])
            loss = jnp.mean((pred_j.astype(jnp.float32) - jnp.asarray(noise)) ** 2)
            return loss, upd["batch_stats"]

        (loss_j, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4,
                               err_msg="gaussian3d loss trajectories diverged")
    np.testing.assert_allclose(
        np.asarray(params["final_conv"]["kernel"]),
        np.transpose(tm.final_conv.weight.detach().numpy(), (2, 3, 1, 0)),
        rtol=1e-2, atol=3e-4)


@pytest.mark.slow
def test_gaussian2d_train_dynamics():
    """Conv1d U-Net gaussian diffusion: reference p_losses with injected
    t/noise (diffusion_gaussian2d.py:557-585, loss_weight≡1 for pred_noise)
    vs our q_sample+mse under plain Adam(clip 1.0) — the 2D worker's stack
    (gaussianDiffusion2DWorker; the reference's Accelerator was never
    prepared, so bare Adam is the effective reference optimizer)."""
    import optax
    from network.vqDiffusion.submodule.diffusion_gaussian2d import \
        GaussianDiffusion2D as RefG2D
    from network.vqDiffusion.submodule.unet2d import Unet2D as RefUnet2D

    from tests.test_torch_parity import transplant_unet1d
    from vq_vae_gan_diffusion_tpu.diffusion.gaussian import q_sample
    from vq_vae_gan_diffusion_tpu.diffusion.gaussian2d import (
        GaussianDiffusion2D, GaussianDiffusion2DConfig)
    from vq_vae_gan_diffusion_tpu.models.unet1d import Unet1D

    T, TOTAL, GB, C, N = 10, 20, 4, 8, 32
    torch.manual_seed(12)
    tm = RefUnet2D(dim=16, dim_mults=(1, 2), channels=C, out_dim=C).eval()
    tdiff = RefG2D(tm, seq_length=N, timesteps=T, sampling_timesteps=T,
                   objective="pred_noise",
                   diffusion_type="gaussiandiffusion2d")
    opt_t = torch.optim.Adam(tm.parameters(), lr=1e-3, betas=(0.9, 0.99))

    params = transplant_unet1d(tm)
    ju = Unet1D(dim=16, dim_mults=(1, 2), channels=C, out_dim=C)
    jd = GaussianDiffusion2D(GaussianDiffusion2DConfig(
        seq_length=N, timesteps=T, sampling_timesteps=T,
        diffusion_type="gaussiandiffusion2d"), model_fn=None)
    opt_j = optax.chain(optax.clip_by_global_norm(1.0),
                        optax.adam(1e-3, b1=0.9, b2=0.99))
    opt_state = opt_j.init(params)

    rng = np.random.default_rng(29)
    losses_t, losses_j = [], []
    for s in range(TOTAL):
        x = rng.standard_normal((GB, C, N)).astype(np.float32) * 0.5  # [B,C,N]
        t_np = rng.integers(0, T, size=(GB,))
        noise = rng.standard_normal((GB, C, N)).astype(np.float32)

        loss_t = tdiff.p_losses(torch.from_numpy(x), torch.from_numpy(t_np),
                                noise=torch.from_numpy(noise))
        opt_t.zero_grad()
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 1.0)
        opt_t.step()
        losses_t.append(float(loss_t))

        def loss_fn(p):
            x_t = q_sample(jd.sched, jnp.asarray(x), jnp.asarray(t_np),
                           jnp.asarray(noise))
            # model layout: torch Conv1d [B,C,N] ↔ flax [B,N,C]
            out = ju.apply({"params": p}, jnp.swapaxes(x_t, 1, 2), None,
                           jnp.asarray(t_np))
            out = jnp.swapaxes(out, 1, 2)
            per = jnp.mean((out.astype(jnp.float32) - jnp.asarray(noise)) ** 2,
                           axis=(1, 2))
            return jnp.mean(per)

        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-3, atol=2e-4,
                               err_msg="gaussian2d loss trajectories diverged")
