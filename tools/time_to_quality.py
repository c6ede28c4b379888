#!/usr/bin/env python
"""Time-to-quality: wall-clock until MNIST-class reconstruction hits a PSNR bar.

The reference's only quality-speed claim is "good reconstruction in ~2-3
minutes" on a GTX 1660 Ti (reference README.md:184-191; BASELINE.md headline).
This harness makes that claim measurable on both sides under ONE protocol:

  train a VQVAE from scratch (same geometry, batch size, optimizer, and data
  on both sides) and report seconds until the held-out reconstruction PSNR
  first crosses ``--psnr-target``.

Sides:
  default   this framework (TPU or ``--platform cpu``), device-side
            ``steps_per_dispatch``-step dispatch loop;
  --torch   the reference's own torch modules imported read-only from
            /root/reference (CPU — the image has no GPU), per-step loop as in
            worker/vqganVqvaeWorker.py.

Both sides train pure L1 + codebook loss (``perceptual_loss_factor`` forced
to 0 here): the reference's LPIPS weights cannot exist in this zero-egress
image, so a perceptual term would train against *different* losses per side.
Data comes from this repo's pipeline (real MNIST when present, deterministic
synthetic fallback otherwise) and is fed to torch as the same NCHW arrays.

Writes ``baselines/time_to_quality_<side>.json`` and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# measurement process: no TensorBoard writer (tensorboardX pulls torch + a
# multiprocessing thread that flakily SIGSEGVs next to XLA:CPU — see
# utils/experiment.py MetricWriter)
os.environ.setdefault("VQGD_NO_TB", "1")

import numpy as np


def load_data(cfg, n_train_batches: int):
    """Materialize [K, B, H, W, C] train batches + one val batch (normalized)."""
    from vq_vae_gan_diffusion_tpu.data.pipeline import load_dataloader
    train_loader, _ = load_dataloader("mnist", "train", config=cfg)
    val_loader, _ = load_dataloader("mnist", "val", config=cfg)
    batches = []
    while len(batches) < n_train_batches:
        for b in train_loader:
            batches.append(np.asarray(b))
            if len(batches) >= n_train_batches:
                break
    val = np.asarray(next(iter(val_loader)))
    return np.stack(batches), val


def run_jax(args) -> dict:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    from vq_vae_gan_diffusion_tpu.utils.eval_metrics import psnr

    enable_compilation_cache()
    cfg = load_config(args.config)
    cfg = cfg.replace_path("architecture.model_name", "vqvae")
    cfg = cfg.replace_path("trainer.vqvae.perceptual_loss_factor", 0.0)
    cfg = cfg.replace_path("trainer.log_dir", "/tmp/ttq")
    if args.batch:
        cfg = cfg.replace_path("dataset.batch_size.vqvae.mnist", args.batch)
    k = int(cfg.trainer.get("steps_per_dispatch", 8) or 8)

    w = VQGANVQVAEWorker(cfg, "/tmp/ttq/run", dtype=jnp.bfloat16
                         if args.bf16 else jnp.float32)
    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))
    state = w.init_state()
    dev = jax.devices()[0]
    val = jax.device_put(val_np, dev)
    # all train data lives on device once (MNIST-class: a few MB) — the loop
    # never does a host->device transfer after this point
    train_dev = jax.device_put(jnp.asarray(train_np), dev)

    # Device-side scalar PSNR: recon + denormalize + MSE + log all on chip,
    # ONE f32 scalar crosses the tunnel per eval. Round-3's version fetched
    # the full recon array per eval and computed PSNR on the host — at the
    # tunnel's bandwidth that (plus the first-eval compile landing inside the
    # timed region) dominated the measurement (VERDICT r3 "What's weak" #4).
    @jax.jit
    def eval_psnr_dev(params):
        rec = w.model.apply({"params": params}, val)[0]
        a = jnp.clip(rec.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
        b = jnp.clip(val.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
        mse = jnp.mean((a - b) ** 2)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    rng = jax.random.PRNGKey(args.seed)
    n = len(train_np)

    # --- compile phase (excluded from the timed region) ---------------------
    # One throwaway dispatch + one eval compile both programs; run each twice
    # (jit recompiles once when args go uncommitted->committed, CLAUDE.md).
    tc0 = time.perf_counter()
    warm_rngs = jax.random.split(jax.random.PRNGKey(10 ** 6), k)
    warm_st = state  # multi_step donates its input: thread the returned state
    for _ in range(2):
        warm_st, m = w.train_multi_step(warm_st, train_dev[:k], warm_rngs)
        float(np.asarray(m["vq_loss"]))
        float(np.asarray(eval_psnr_dev(warm_st.vqvae_params)))
    del warm_st
    state = w.init_state()  # restart from a pristine (seeded) init
    compile_seconds = time.perf_counter() - tc0

    # --- timed region --------------------------------------------------------
    t0 = time.perf_counter()
    curve, hit, steps, cursor = [], None, 0, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        # eval_every dispatches back-to-back (they pipeline on the tunnel:
        # ~0.5 ms/call async vs ~30 ms/sync), then ONE scalar readback.
        for _ in range(args.eval_every):
            if cursor + k <= n:
                chunk = jax.lax.dynamic_slice_in_dim(train_dev, cursor, k)
            else:  # wrap the epoch
                chunk = jnp.concatenate(
                    [train_dev[cursor:], train_dev[:k - (n - cursor)]])
            cursor = (cursor + k) % n
            rng, sub = jax.random.split(rng)
            state, m = w.train_multi_step(state, chunk,
                                          jax.random.split(sub, k))
            steps += k
        p = float(np.asarray(eval_psnr_dev(state.vqvae_params)))
        el = time.perf_counter() - t0
        curve.append({"step": steps, "seconds": round(el, 2),
                      "psnr": round(p, 2)})
        if args.verbose:
            print(f"  step {steps} t={el:.1f}s psnr={p:.2f}",
                  file=sys.stderr, flush=True)
        if hit is None and p >= args.psnr_target:
            hit = {"seconds_to_target": round(el + compile_seconds, 2),
                   "seconds_excl_compile": round(el, 2),
                   "steps": steps}
            break
    import jax as _j
    return {"side": "jax", "backend": _j.default_backend(),
            "psnr_target": args.psnr_target, "batch": int(train_np.shape[1]),
            "compile_seconds": round(compile_seconds, 2),
            **(hit or {"seconds_to_target": None,
                       "final_psnr": curve[-1]["psnr"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


def run_torch(args) -> dict:
    """Reference torch modules (read-only import), same protocol/geometry."""
    REF = "/root/reference"
    if not os.path.isdir(REF):
        raise SystemExit("reference not mounted")
    sys.path.insert(0, REF)
    import torch

    from network.common.decoder import Decoder        # reference modules
    from network.common.encoder import Encoder
    from network.vqvae.submodule.codebook import CodeBook

    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.utils.eval_metrics import psnr

    cfg = load_config(args.config)
    cfg = cfg.replace_path("architecture.model_name", "vqvae")
    if args.batch:
        cfg = cfg.replace_path("dataset.batch_size.vqvae.mnist", args.batch)
    a = cfg.architecture.vqvae
    tr = cfg.trainer.vqvae
    img = int(cfg.dataset.img_size["mnist"])
    ch = int(cfg.dataset.img_channels["mnist"])
    torch.manual_seed(args.seed)
    enc = Encoder(img_channels=ch, image_size=img,
                  latent_channels=int(a.latent_channels),
                  intermediate_channels=list(a.intermediate_channels),
                  num_residual_blocks=int(a.num_residual_blocks_encoder),
                  attention_resolution=list(a.attention_resolution))
    dec = Decoder(img_channels=ch, latent_channels=int(a.latent_channels),
                  latent_size=int(a.latent_size),
                  intermediate_channels=list(a.intermediate_channels),
                  num_residual_blocks=int(a.num_residual_blocks_decoder),
                  attention_resolution=list(a.attention_resolution))
    cb = CodeBook(num_codebook_vectors=int(a.num_codebook_vectors),
                  latent_dim=int(a.latent_channels))
    quant = torch.nn.Conv2d(int(a.latent_channels), int(a.latent_channels), 1)
    post = torch.nn.Conv2d(int(a.latent_channels), int(a.latent_channels), 1)
    params = (list(enc.parameters()) + list(dec.parameters()) +
              list(cb.parameters()) + list(quant.parameters()) +
              list(post.parameters()))
    opt = torch.optim.Adam(params, lr=float(tr.learning_rate),
                           betas=(float(tr.beta1), float(tr.beta2)), eps=1e-8)

    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))
    # NHWC -> NCHW for torch
    train_t = torch.from_numpy(np.transpose(train_np, (0, 1, 4, 2, 3)))
    val_t = torch.from_numpy(np.transpose(val_np, (0, 3, 1, 2)))
    rec_factor = float(tr.rec_loss_factor)

    def eval_psnr():
        with torch.no_grad():
            rec = dec(post(cb(quant(enc(val_t)))[0]))
        a_ = np.clip(rec.numpy() * 0.5 + 0.5, 0, 1)
        b_ = np.clip(val_t.numpy() * 0.5 + 0.5, 0, 1)
        return psnr(a_, b_)

    k = int(cfg.trainer.get("steps_per_dispatch", 8) or 8)
    t0 = time.perf_counter()
    curve, hit, steps = [], None, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        imgs = train_t[steps % len(train_t)]
        z, _, q_loss = cb(quant(enc(imgs)))
        decoded = dec(post(z))
        loss = rec_factor * torch.abs(imgs - decoded).mean() + q_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        steps += 1
        if steps % (args.eval_every * k) == 0:
            p = eval_psnr()
            el = time.perf_counter() - t0
            curve.append({"step": steps, "seconds": round(el, 2),
                          "psnr": round(p, 2)})
            if args.verbose:
                print(f"  step {steps} t={el:.1f}s psnr={p:.2f}",
                      file=sys.stderr, flush=True)
            if hit is None and p >= args.psnr_target:
                hit = {"seconds_to_target": round(el, 2),
                       "seconds_excl_compile": round(el, 2), "steps": steps}
                break
    return {"side": "torch_reference_cpu", "backend": "cpu",
            "psnr_target": args.psnr_target, "batch": int(train_np.shape[1]),
            "compile_seconds": 0.0,
            **(hit or {"seconds_to_target": None,
                       "final_psnr": curve[-1]["psnr"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


# ---------------------------------------------------------------------------
# Stage-2 families (VERDICT r3 #3): the reference's actual product is samples
# from TRAINED stage-2 priors — the GPT prior (worker/vqTransformerWorker.py:
# 135-148: CE on pkeep-corrupted token streams, AdamW decay/no-decay) and the
# gaussian diffusion prior (worker/gaussianDiffusion3DWorker.py:96-121: MSE,
# AdamW + OneCycleLR). One protocol, both sides:
#
#   gpt        train a minGPT (4L/8H/256) on IDENTICAL precomputed token
#              sequences (16×16 grids of 256-level pixel bins from the same
#              image pipeline — spatially structured, learnable, and framework-
#              independent, unlike tokens from each side's own random-init
#              VQ encoder which would differ); wall-clock until held-out clean
#              next-token NLL (nats) first drops below --nll-target.
#   gaussian3d train the ShuffleNet U-Net DDPM (base 32, mults (2,4), the
#              reference's AdamW+OneCycle recipe) on the same images;
#              wall-clock until the fixed-seed val noise-MSE < --mse-target.
# ---------------------------------------------------------------------------

GPT_GEOM = dict(n_layer=4, n_head=8, n_embd=256)
GPT_LR, GPT_BETAS, GPT_WD, PKEEP = 4.5e-4, (0.9, 0.95), 0.01, 0.5
GRID, VOCAB = 16, 256


def make_tokens(args):
    """[K, B, L] train + [Bv, L] val int tokens, identical for both sides."""
    from vq_vae_gan_diffusion_tpu.config import load_config
    cfg = load_config(args.config)
    if args.batch:
        cfg = cfg.replace_path("dataset.batch_size.vqvae.mnist", args.batch)
    cfg = cfg.replace_path("architecture.model_name", "vqvae")
    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))

    def tok(imgs):  # [..., H, W, 1] normalized → [..., GRID*GRID] ints
        h = imgs.shape[-3]
        g = (np.arange(GRID) * h) // GRID
        sub = imgs[..., g[:, None], g[None, :], 0]
        lv = np.clip((sub * 0.5 + 0.5) * (VOCAB - 1), 0, VOCAB - 1)
        return np.rint(lv).astype(np.int32).reshape(*imgs.shape[:-3], -1)

    return tok(train_np), tok(val_np)


def run_jax_gpt(args, capture=None) -> dict:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT
    from vq_vae_gan_diffusion_tpu.train.vq_transformer_worker import (
        mingpt_decay_mask)
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    train_tok, val_tok = make_tokens(args)
    L = train_tok.shape[-1]
    gpt = GPT(vocab_size=VOCAB, block_size=L, **GPT_GEOM)
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params = gpt.init(jax.random.PRNGKey(args.seed),
                          jnp.zeros((1, L), jnp.int32))["params"]
    params = jax.device_put(params, dev)
    opt = optax.adamw(GPT_LR, b1=GPT_BETAS[0], b2=GPT_BETAS[1],
                      weight_decay=GPT_WD, mask=mingpt_decay_mask)
    with jax.default_device(jax.devices("cpu")[0]):
        opt_state = opt.init(jax.device_get(params))
    opt_state = jax.device_put(opt_state, dev)
    train_dev = jax.device_put(jnp.asarray(train_tok), dev)
    val_dev = jax.device_put(jnp.asarray(val_tok), dev)
    k = args.dispatch

    def one_step(carry, xs):
        params, opt_state = carry
        tokens, rng = xs
        r_mask, r_rand = jax.random.split(rng)
        keep = jax.random.bernoulli(r_mask, PKEEP, tokens.shape)
        rand = jax.random.randint(r_rand, tokens.shape, 0, VOCAB)
        corrupted = jnp.where(keep, tokens, rand)
        sos = jnp.zeros((tokens.shape[0], 1), tokens.dtype)
        inp = jnp.concatenate([sos, corrupted], 1)[:, :-1]

        def loss_fn(p):
            logits = gpt.apply({"params": p}, inp)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tokens).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def multi_step(params, opt_state, toks, rngs):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), (toks, rngs))
        return params, opt_state, losses[-1]

    @jax.jit
    def val_nll(params):
        sos = jnp.zeros((val_dev.shape[0], 1), val_dev.dtype)
        inp = jnp.concatenate([sos, val_dev], 1)[:, :-1]
        logits = gpt.apply({"params": params}, inp)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, val_dev).mean()

    rng = jax.random.PRNGKey(args.seed + 1)
    n = len(train_tok)

    tc0 = time.perf_counter()
    for _ in range(2):  # compile + committed-arg recompile, outside the clock
        p2, o2, l = multi_step(params, opt_state, train_dev[:k],
                               jax.random.split(jax.random.PRNGKey(9), k))
        float(np.asarray(l)), float(np.asarray(val_nll(p2)))
    del p2, o2
    compile_seconds = time.perf_counter() - tc0

    t0 = time.perf_counter()
    curve, hit, steps, cursor = [], None, 0, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        for _ in range(args.eval_every):
            sl = train_dev[cursor:cursor + k] if cursor + k <= n else \
                jnp.concatenate([train_dev[cursor:], train_dev[:k - (n - cursor)]])
            cursor = (cursor + k) % n
            rng, sub = jax.random.split(rng)
            params, opt_state, _ = multi_step(params, opt_state, sl,
                                              jax.random.split(sub, k))
            steps += k
        nll = float(np.asarray(val_nll(params)))
        el = time.perf_counter() - t0
        curve.append({"step": steps, "seconds": round(el, 2),
                      "nll": round(nll, 4)})
        if args.verbose:
            print(f"  step {steps} t={el:.1f}s nll={nll:.4f}",
                  file=sys.stderr, flush=True)
        if hit is None and nll <= args.nll_target:
            hit = {"seconds_to_target": round(el + compile_seconds, 2),
                   "seconds_excl_compile": round(el, 2), "steps": steps}
            break
    if capture is not None:
        capture.update(gpt=gpt, params=params, vocab=VOCAB, seq_len=L,
                       train_tok=train_tok, val_tok=val_tok)
    import jax as _j
    return {"side": "jax", "family": "gpt", "backend": _j.default_backend(),
            "nll_target": args.nll_target, "batch": int(train_tok.shape[1]),
            "compile_seconds": round(compile_seconds, 2),
            **(hit or {"seconds_to_target": None,
                       "final_nll": curve[-1]["nll"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


def run_torch_gpt(args, capture=None) -> dict:
    """Reference minGPT (read-only import), same protocol / token data."""
    REF = "/root/reference"
    sys.path.insert(0, REF)
    import torch
    import torch.nn.functional as F

    from network.vqTransformer.submodule.mingpt import GPT

    train_tok, val_tok = make_tokens(args)
    L = train_tok.shape[-1]
    torch.manual_seed(args.seed)
    gpt = GPT(vocab_size=VOCAB, block_size=L, **GPT_GEOM)

    # the reference worker's AdamW decay/no-decay split
    # (worker/vqTransformerWorker.py:93-131), applied to the bare GPT
    decay, no_decay = set(), set()
    wl = (torch.nn.Linear,)
    bl = (torch.nn.LayerNorm, torch.nn.Embedding)
    for mn, m in gpt.named_modules():
        for pn, _ in m.named_parameters():
            fpn = f"{mn}.{pn}" if mn else pn
            if pn.endswith("bias"):
                no_decay.add(fpn)
            elif pn.endswith("weight") and isinstance(m, wl):
                decay.add(fpn)
            elif pn.endswith("weight") and isinstance(m, bl):
                no_decay.add(fpn)
    no_decay.add("pos_emb")
    pd = dict(gpt.named_parameters())
    opt = torch.optim.AdamW(
        [{"params": [pd[p] for p in sorted(decay)], "weight_decay": GPT_WD},
         {"params": [pd[p] for p in sorted(no_decay)], "weight_decay": 0.0}],
        lr=GPT_LR, betas=GPT_BETAS)

    train_t = torch.from_numpy(train_tok.astype(np.int64))
    val_t = torch.from_numpy(val_tok.astype(np.int64))
    val_inp = torch.cat([torch.zeros(len(val_t), 1, dtype=torch.long),
                         val_t], 1)[:, :-1]

    def val_nll():
        with torch.no_grad():
            logits, _ = gpt(val_inp)
            return float(F.cross_entropy(
                logits.reshape(-1, VOCAB), val_t.reshape(-1)))

    t0 = time.perf_counter()
    curve, hit, steps = [], None, 0
    gen = torch.Generator().manual_seed(args.seed + 1)
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        tokens = train_t[steps % len(train_t)]
        keep = torch.bernoulli(torch.full(tokens.shape, PKEEP), generator=gen)
        rand = torch.randint(0, VOCAB, tokens.shape, generator=gen)
        corrupted = torch.where(keep.bool(), tokens, rand)
        inp = torch.cat([torch.zeros(len(tokens), 1, dtype=torch.long),
                         corrupted], 1)[:, :-1]
        logits, _ = gpt(inp)
        loss = F.cross_entropy(logits.reshape(-1, VOCAB), tokens.reshape(-1))
        opt.zero_grad()
        loss.backward()
        opt.step()
        steps += 1
        if steps % (args.eval_every * args.dispatch) == 0:
            nll = val_nll()
            el = time.perf_counter() - t0
            curve.append({"step": steps, "seconds": round(el, 2),
                          "nll": round(nll, 4)})
            if args.verbose:
                print(f"  step {steps} t={el:.1f}s nll={nll:.4f}",
                      file=sys.stderr, flush=True)
            if hit is None and nll <= args.nll_target:
                hit = {"seconds_to_target": round(el, 2),
                       "seconds_excl_compile": round(el, 2), "steps": steps}
                break
    if capture is not None:
        capture.update(gpt=gpt, vocab=VOCAB, seq_len=L,
                       train_tok=train_tok, val_tok=val_tok)
    return {"side": "torch_reference_cpu", "family": "gpt", "backend": "cpu",
            "nll_target": args.nll_target, "batch": int(train_tok.shape[1]),
            "compile_seconds": 0.0,
            **(hit or {"seconds_to_target": None,
                       "final_nll": curve[-1]["nll"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


G3D_BASE_DIM = 32
G3D_EVAL_SEEDS = 4


def make_g3d_eval(val_np, timesteps: int):
    """Deterministic eval set SHARED by both sides: stratified t grid + fixed
    numpy noise.

    Round-4's eval drew t/noise from each side's own RNG stream
    (torch.manual_seed(12345) vs PRNGKey(1000+i)): the noise-MSE depends
    strongly on WHICH t values are sampled, so the two sides were measured
    against different effective bars — the recorded 704-vs-544 step gap to
    MSE 0.35 (VERDICT r4 weak-4) is dominated by that asymmetry, not
    training dynamics (step updates are bit-parity-tested in
    tests/test_train_dynamics_parity.py). Identical [S,B] t and [S,*val] noise
    arrays remove it."""
    b = val_np.shape[0]
    rng = np.random.default_rng(12345)
    ts = np.stack([
        ((np.arange(b) * timesteps) // b + (i * timesteps) // (b * G3D_EVAL_SEEDS))
        % timesteps
        for i in range(G3D_EVAL_SEEDS)]).astype(np.int32)
    noise = rng.standard_normal((G3D_EVAL_SEEDS,) + val_np.shape).astype(np.float32)
    return ts, noise


def load_g3d_cfg(args):
    from vq_vae_gan_diffusion_tpu.config import load_config
    cfg = load_config(args.config)
    cfg = cfg.replace_path("architecture.model_name", "gaussiandiffusion3d")
    cfg = cfg.replace_path("architecture.gaussiandiffusion3d.model_base_dim",
                           G3D_BASE_DIM)
    cfg = cfg.replace_path("trainer.log_dir", "/tmp/ttq_g3d")
    if args.batch:
        cfg = cfg.replace_path(
            "dataset.batch_size.gaussiandiffusion3d.mnist", args.batch)
    return cfg


def run_jax_g3d(args, capture=None) -> dict:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.train.gaussian_diffusion_workers import (
        GaussianDiffusion3DWorker)
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_g3d_cfg(args)
    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))
    k = args.dispatch
    w = GaussianDiffusion3DWorker(cfg, "/tmp/ttq_g3d/run",
                                  num_iters_per_epoch=max(
                                      args.max_steps // max(
                                          int(cfg.trainer.num_epochs), 1), 1))
    state = w.init_state()
    dev = jax.devices()[0]
    train_dev = jax.device_put(jnp.asarray(train_np), dev)
    val = jax.device_put(jnp.asarray(val_np), dev)
    unet, proc = w.unet, w.process

    eval_ts, eval_noise = make_g3d_eval(val_np, proc.timesteps)
    eval_ts = jax.device_put(jnp.asarray(eval_ts), dev)
    eval_noise = jax.device_put(jnp.asarray(eval_noise), dev)

    @jax.jit
    def eval_mse(params, stats):
        def pred_fn(x, t):
            return unet.apply({"params": params, "batch_stats": stats},
                              x, None, t, train=False)
        losses = []
        for i in range(G3D_EVAL_SEEDS):
            x_t = proc.forward_diffusion(val, eval_ts[i], eval_noise[i])
            pred = pred_fn(x_t, eval_ts[i])
            losses.append(jnp.mean(
                (pred.astype(jnp.float32) - eval_noise[i]) ** 2))
        return jnp.mean(jnp.stack(losses))

    # --dispatch 1 → per-step calls, no scan. XLA:CPU segfaults EXECUTING a
    # lax.scan over this worker's grad (ShuffleUNet+BN; compiles fine, dies
    # in the runtime — reproduced minimally 2026-08-20, upstream bug); the
    # TPU backend runs the scan normally. CPU validation uses --dispatch 1.
    def run_chunk(state, chunk, rngs):
        if k == 1 or args.dispatch == 1:
            for i in range(chunk.shape[0]):
                state, m = w.train_step(state, chunk[i], rngs[i])
            return state, m
        return w.train_multi_step(state, chunk, rngs)

    rng = jax.random.PRNGKey(args.seed)
    n = len(train_np)
    tc0 = time.perf_counter()
    st2 = state
    for _ in range(2):
        st2, m = run_chunk(st2, train_dev[:k],
                           jax.random.split(jax.random.PRNGKey(9), k))
        float(np.asarray(m["loss"]))
        float(np.asarray(eval_mse(st2.params, st2.batch_stats)))
    state = w.init_state()  # multi_step donates: restart from a pristine init
    compile_seconds = time.perf_counter() - tc0

    t0 = time.perf_counter()
    curve, hit, steps, cursor = [], None, 0, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        for _ in range(args.eval_every):
            sl = train_dev[cursor:cursor + k] if cursor + k <= n else \
                jnp.concatenate([train_dev[cursor:],
                                 train_dev[:k - (n - cursor)]])
            cursor = (cursor + k) % n
            rng, sub = jax.random.split(rng)
            state, m = run_chunk(state, sl, jax.random.split(sub, k))
            steps += k
        mse = float(np.asarray(eval_mse(state.params, state.batch_stats)))
        el = time.perf_counter() - t0
        curve.append({"step": steps, "seconds": round(el, 2),
                      "mse": round(mse, 4)})
        if args.verbose:
            print(f"  step {steps} t={el:.1f}s mse={mse:.4f}",
                  file=sys.stderr, flush=True)
        if hit is None and mse <= args.mse_target:
            hit = {"seconds_to_target": round(el + compile_seconds, 2),
                   "seconds_excl_compile": round(el, 2), "steps": steps}
            break
    if capture is not None:
        capture.update(worker=w, state=state, train_np=train_np, val_np=val_np)
    import jax as _j
    return {"side": "jax", "family": "gaussian3d",
            "backend": _j.default_backend(),
            "mse_target": args.mse_target, "batch": int(train_np.shape[1]),
            "compile_seconds": round(compile_seconds, 2),
            **(hit or {"seconds_to_target": None,
                       "final_mse": curve[-1]["mse"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


def run_torch_g3d(args, capture=None) -> dict:
    """Reference GaussianDiffusion3D + ShuffleUNet (read-only import), the
    reference worker's AdamW + OneCycleLR recipe, same data."""
    REF = "/root/reference"
    sys.path.insert(0, REF)
    import torch

    from network.vqDiffusion.submodule.diffusion_gaussian3d import (
        GaussianDiffusion3D)

    cfg = load_g3d_cfg(args)
    img = int(cfg.dataset.img_size["mnist"])
    lr = float(cfg.trainer.gaussiandiffusion3d.learning_rate)
    torch.manual_seed(args.seed)
    model = GaussianDiffusion3D(image_sizes=[img, img], timesteps=1000,
                                in_channels=1, sampling_timesteps=1000,
                                base_dim=G3D_BASE_DIM, dim_mults=[2, 4],
                                device="cpu")
    opt = torch.optim.AdamW(model.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, lr, total_steps=max(args.max_steps, 10), pct_start=0.25,
        anneal_strategy="cos")

    train_np, val_np = load_data(cfg, n_train_batches=min(args.max_steps, 48))
    train_t = torch.from_numpy(np.transpose(train_np, (0, 1, 4, 2, 3)))
    val_t = torch.from_numpy(np.transpose(val_np, (0, 3, 1, 2)))

    eval_ts, eval_noise = make_g3d_eval(val_np, 1000)
    eval_noise_t = torch.from_numpy(np.transpose(eval_noise, (0, 1, 4, 2, 3)))

    def eval_mse():
        with torch.no_grad():
            model.eval()
            losses = []
            for i in range(G3D_EVAL_SEEDS):
                t = torch.from_numpy(eval_ts[i].astype(np.int64))
                nz = eval_noise_t[i]
                x_t = model._forward_diffusion(val_t, t, nz)
                pred = model.model(x_t, t=t)
                losses.append(float(torch.nn.functional.mse_loss(pred, nz)))
            model.train()
            return float(np.mean(losses))

    t0 = time.perf_counter()
    curve, hit, steps = [], None, 0
    while steps < args.max_steps and time.perf_counter() - t0 < args.max_seconds:
        imgs = train_t[steps % len(train_t)]
        loss = model(imgs)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if steps + 1 < sched.total_steps:
            sched.step()
        steps += 1
        if steps % (args.eval_every * args.dispatch) == 0:
            mse = eval_mse()
            el = time.perf_counter() - t0
            curve.append({"step": steps, "seconds": round(el, 2),
                          "mse": round(mse, 4)})
            if args.verbose:
                print(f"  step {steps} t={el:.1f}s mse={mse:.4f}",
                      file=sys.stderr, flush=True)
            if hit is None and mse <= args.mse_target:
                hit = {"seconds_to_target": round(el, 2),
                       "seconds_excl_compile": round(el, 2), "steps": steps}
                break
    if capture is not None:
        capture.update(model=model, train_np=train_np, val_np=val_np)
    return {"side": "torch_reference_cpu", "family": "gaussian3d",
            "backend": "cpu", "mse_target": args.mse_target,
            "batch": int(train_np.shape[1]), "compile_seconds": 0.0,
            **(hit or {"seconds_to_target": None,
                       "final_mse": curve[-1]["mse"] if curve else None,
                       "steps": steps}),
            "curve_tail": curve[-3:]}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="configs/training_config_mnist.yml")
    ap.add_argument("--psnr-target", type=float, default=20.0)
    ap.add_argument("--max-seconds", type=float, default=900.0)
    ap.add_argument("--max-steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=4,
                    help="evaluate every N dispatches (N*steps_per_dispatch steps)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=None,
                    help="override the config batch size (CPU smokes)")
    ap.add_argument("--torch", action="store_true",
                    help="run the reference's torch modules instead")
    ap.add_argument("--platform", choices=["cpu", "tpu"], default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--family", choices=["vqvae", "gpt", "gaussian3d"],
                    default="vqvae",
                    help="stage-1 VQVAE (PSNR), stage-2 GPT prior (token "
                         "NLL), or stage-2 gaussian diffusion prior (MSE)")
    ap.add_argument("--nll-target", type=float, default=3.0,
                    help="gpt: held-out clean next-token NLL bar (nats)")
    ap.add_argument("--mse-target", type=float, default=0.35,
                    help="gaussian3d: fixed-seed val noise-MSE bar")
    ap.add_argument("--dispatch", type=int, default=8,
                    help="steps per device dispatch (jax side)")
    args = ap.parse_args()

    runners = {
        ("vqvae", False): run_jax, ("vqvae", True): run_torch,
        ("gpt", False): run_jax_gpt, ("gpt", True): run_torch_gpt,
        ("gaussian3d", False): run_jax_g3d,
        ("gaussian3d", True): run_torch_g3d,
    }
    res = runners[(args.family, bool(args.torch))](args)
    os.makedirs("baselines", exist_ok=True)
    sfx = "" if args.family == "vqvae" else f"_{args.family}"
    out = f"baselines/time_to_quality_{res['side']}{sfx}.json"
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
