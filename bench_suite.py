#!/usr/bin/env python
"""Extended benchmark suite (BASELINE.md north-star metrics).

``bench.py`` is the driver's single-line flagship metric; this suite measures
the full set and writes BENCHMARKS.md:

1. VQGAN train step, mnist-scale (batch 200 @ 28²·1, bf16) — images/s/chip
2. VQGAN train step, Oxford-scale (batch 20 @ 256²·3, bf16) — images/s/chip
3. 1000-step DDPM reverse chain (ShuffleNet U-Net, device-resident scan)
   — denoise steps/s
3b. discrete VQ-diffusion (mask-and-replace) sampling chain — denoise steps/s
4. KV-cached AR sampling, 256 tokens, GPT 12L/16H/1024 — tokens/s
5. Pallas vs XLA codebook nearest-neighbour — µs per 8192×1024×256 search

All timings synchronize via host readback (block_until_ready does not fence on
the axon backend).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def readback(x):
    import jax
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        readback(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    readback(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import jax
    import jax.numpy as jnp

    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    results = {}

    # 1+2: VQGAN train steps -------------------------------------------------
    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.train.vqgan_worker import VQGANVQVAEWorker

    for tag, cfg_path, batch, img, ch in [
        ("vqgan_mnist28_b200", "configs/training_config_mnist.yml", 200, 28, 1),
        ("vqgan_oxford256_b20", "configs/training_config_small.yml", 20, 256, 3),
    ]:
        cfg = load_config(cfg_path)
        cfg = cfg.replace_path("architecture.model_name", "vqgan")
        cfg = cfg.replace_path("trainer.log_dir", "/tmp/vqgd_bench")
        w = VQGANVQVAEWorker(cfg, f"/tmp/vqgd_bench/{tag}", debug=True,
                             dtype=jnp.bfloat16)
        state = w.init_state()
        imgs = jax.random.normal(jax.random.PRNGKey(0), (batch, img, img, ch))
        rng = jax.random.PRNGKey(1)

        # warmup both compile variants
        state, m = w.train_step(state, imgs, jax.random.fold_in(rng, 0))
        readback(m["vq_loss"])
        state, m = w.train_step(state, imgs, jax.random.fold_in(rng, 1))
        readback(m["vq_loss"])
        # measured path: device-side multi-step loop (train_multi_step) — the
        # per-dispatch host overhead scales with state leaf count, so per-step
        # dispatch would measure the tunnel, not the chip
        iters = 50 if img <= 64 else 10
        batches = jnp.broadcast_to(imgs, (iters,) + imgs.shape)
        rngs = jax.random.split(rng, iters)
        state, m = w.train_multi_step(state, batches, rngs)
        readback(m["vq_loss"])
        t0 = time.perf_counter()
        state, m = w.train_multi_step(state, batches, rngs)
        readback(m["vq_loss"])
        dt = (time.perf_counter() - t0) / iters
        results[tag] = {"ms_per_step": round(dt * 1e3, 2),
                        "images_per_sec": round(batch / dt, 1)}
        print(tag, results[tag], flush=True)

    # 3: DDPM 1000-step reverse scan ------------------------------------------
    from vq_vae_gan_diffusion_tpu.diffusion.gaussian3d import GaussianDiffusion3D
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet

    T = 1000
    unet = ShuffleUNet(T, 256, 1, 1, 64, (1, 2, 4, 8), dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = unet.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 256, 96, 1)), None,
                              jnp.zeros((1,), jnp.int32), train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    # BN-folded shift-add inference forward (models/shuffle_infer.py) — the
    # production sampling path (trainer.fused_sampler, default on)
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)
    folded = fold_unet(variables, dtype=jnp.bfloat16)
    proc = GaussianDiffusion3D((256, 96), 1, T, T,
                               lambda x, c, t: apply_folded(
                                   folded, x, t, use_pallas=False,
                                   dtype=jnp.bfloat16).astype(x.dtype),
                               "noise_mse", "ddpm")
    sample16 = jax.jit(lambda rng: proc.ddpm_sample(rng, 16, False, True))
    dt = timeit(sample16, jax.random.PRNGKey(0), iters=2, warmup=1)
    results["ddpm_1000step_sampling_b16"] = {
        "seconds_per_chain": round(dt, 2),
        "denoise_steps_per_sec": round(T / dt, 1)}
    print("ddpm", results["ddpm_1000step_sampling_b16"], flush=True)

    # same chain through the batch-packed whole-unit kernel
    # (fused_sampler: packed)
    proc_p = GaussianDiffusion3D((256, 96), 1, T, T,
                                 lambda x, c, t: apply_folded(
                                     folded, x, t, use_pallas="packed",
                                     dtype=jnp.bfloat16).astype(x.dtype),
                                 "noise_mse", "ddpm")
    sample16p = jax.jit(lambda rng: proc_p.ddpm_sample(rng, 16, False, True))
    dt = timeit(sample16p, jax.random.PRNGKey(0), iters=2, warmup=1)
    results["ddpm_1000step_sampling_b16_packed"] = {
        "seconds_per_chain": round(dt, 2),
        "denoise_steps_per_sec": round(T / dt, 1)}
    print("ddpm packed", results["ddpm_1000step_sampling_b16_packed"],
          flush=True)

    # (the v3 whole-chain / auto kernel family was deleted in round 4 after
    # three healthy-window compile crashes + a measured loss where it did
    # compile — see BENCHMARKS.md "Kernel decisions"; packed is the winner
    # and the production default)

    # 3b: discrete VQ-diffusion (mask-and-replace) sampling chain --------------
    # Reference Diffusion_VQ_Official.sample (diffusion_vq_official.py:515-577):
    # full reverse loop, ShuffleNet U-Net over the [K, N] log-onehot image.
    from vq_vae_gan_diffusion_tpu.models.vq_diffusion_composite import (
        VQDiffusionComposite)
    cfg6 = load_config("configs/training_config_mnist.yml")
    cfg6 = cfg6.replace_path("architecture.model_name", "vqdiffusion")
    cfg6 = cfg6.replace_path("architecture.vqdiffusion.diffusion_type",
                             "VQ_Official")
    comp = VQDiffusionComposite(cfg6, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        uvars = comp.unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, comp.prior.num_classes, comp.seq_len, 1)), None,
            jnp.zeros((1,), jnp.int32), train=False)
    uvars = jax.device_put(uvars, jax.devices()[0])
    Td = comp.prior.sampling_timesteps
    # rows: posterior off/on at the default (BN-folded spec) U-Net forward,
    # then the batch-packed Pallas U-Net (the measured winner on the pixel
    # DDPM chain, previously unmeasured on THIS prior's narrow [K,N,1]
    # shapes — VERDICT r4 weak-3)
    for sampler, fused, suffix in ((True, False, ""),
                                   (True, True, "_fusedpost"),
                                   ("packed", True, "_packed_fusedpost")):
        try:
            comp.fused_sampler = sampler
            comp.prior.fused_posterior = fused
            sample_disc = jax.jit(lambda rng: comp.sample(
                uvars["params"], uvars.get("batch_stats", {}), rng, 16))
            dt = timeit(sample_disc, jax.random.PRNGKey(0), iters=1, warmup=1)
            results[f"vq_official_discrete_sampling_b16{suffix}"] = {
                "seconds_per_chain": round(dt, 2),
                "denoise_steps_per_sec": round(Td / dt, 1)}
            print("discrete", suffix or "xla",
                  results[f"vq_official_discrete_sampling_b16{suffix}"],
                  flush=True)
        except Exception as e:  # noqa: BLE001 — surface lowering failures
            results[f"vq_official_discrete_sampling_b16{suffix}"] = {
                "error": f"{type(e).__name__}: {e}"[:300]}
            print("discrete", suffix, "FAILED:",
                  results[f"vq_official_discrete_sampling_b16{suffix}"][
                      "error"], flush=True)
    comp.fused_sampler = True

    # 3c: continuous latent diffusion (Conv1d U-Net, DDIM) ---------------------
    # Reference GaussianDiffusion2D.sample (diffusion_gaussian2d.py:522-526,
    # always-DDIM): sampling_timesteps-step reverse loop over the [B, D, N]
    # lookup-table embedding of the token sequence.
    cfg7 = load_config("configs/training_config_mnist.yml")
    cfg7 = cfg7.replace_path("architecture.model_name", "vqdiffusion")
    cfg7 = cfg7.replace_path("architecture.vqdiffusion.diffusion_type",
                             "gaussiandiffusion2d")
    comp2 = VQDiffusionComposite(cfg7, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        # distribute_dim=-1 lookup_table: channels-last ch=N, length=D
        # (train/vq_diffusion_worker.py init_state's 1d branch)
        uvars2 = comp2.unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, comp2.gaussian_dim, comp2.seq_len)), None,
            jnp.zeros((1,), jnp.int32))
    uvars2 = jax.device_put(uvars2, jax.devices()[0])
    Tg = comp2.prior.cfg.sampling_timesteps
    sample_g2 = jax.jit(lambda rng: comp2.sample(
        uvars2["params"], uvars2.get("batch_stats", {}), rng, 16))
    dt = timeit(sample_g2, jax.random.PRNGKey(0), iters=2, warmup=1)
    results["gaussian2d_ddim_sampling_b16"] = {
        "seconds_per_chain": round(dt, 2),
        "denoise_steps_per_sec": round(Tg / dt, 1)}
    print("gaussian2d", results["gaussian2d_ddim_sampling_b16"], flush=True)

    # 3d: transformer-predictor discrete diffusion sampling chain --------------
    # Reference network/vq_diffusion/vq_diffusion.py (AdaLN transformer prior).
    # The denoiser is tiny, so the [B, N, K] log-space posterior chains set the
    # chain's roofline; measured XLA vs the fused per-step Pallas kernel
    # (ops/discrete_posterior_pallas.py), which is token-identical.
    from vq_vae_gan_diffusion_tpu.models.transformer_vq_diffusion import (
        TransformerVQDiffusion)
    tvq = TransformerVQDiffusion(codebook_size=1024, seq_len=256,
                                 diffusion_steps=100, embedding_dim=512,
                                 num_layers=4, num_heads=8,
                                 dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        tp = tvq.predictor.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 256), jnp.int32),
                                jnp.zeros((1,), jnp.int32))["params"]
    tp = jax.device_put(tp, jax.devices()[0])
    for fused, label in ((False, "xla"), (True, "fused"), ("prng", "prng")):
        try:
            tvq.diffusion.fused_posterior = fused
            fn = jax.jit(lambda rng: tvq.sample(tp, rng, 16))
            dt = timeit(fn, jax.random.PRNGKey(0), iters=2, warmup=1)
            results[f"transformer_vqdiff_sampling_b16_{label}"] = {
                "seconds_per_chain": round(dt, 3),
                "denoise_steps_per_sec": round(100 / dt, 1)}
            print("tvq", label,
                  results[f"transformer_vqdiff_sampling_b16_{label}"],
                  flush=True)
        except Exception as e:  # noqa: BLE001 — surface lowering failures
            results[f"transformer_vqdiff_sampling_b16_{label}"] = {
                "error": f"{type(e).__name__}: {e}"[:300]}
            print("tvq", label, "FAILED:",
                  results[f"transformer_vqdiff_sampling_b16_{label}"]["error"],
                  flush=True)

    # 4: KV-cached AR sampling -------------------------------------------------
    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT, sample_tokens

    gpt = GPT(vocab_size=1024, block_size=512, n_layer=12, n_head=16,
              n_embd=1024, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        gp = gpt.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 257), jnp.int32))["params"]
    gp = jax.device_put(gp, jax.devices()[0])
    B, steps = 16, 256
    sos = jnp.zeros((B, 1), jnp.int32)
    sample_fn = jax.jit(lambda p, rng: sample_tokens(gpt, p, rng, sos, 1, steps))
    dt = timeit(sample_fn, gp, jax.random.PRNGKey(0), iters=3, warmup=1)
    results["gpt_ar_sampling_256tok_b16"] = {
        "seconds": round(dt, 3),
        "tokens_per_sec": round(B * steps / dt, 1)}
    print("ar", results["gpt_ar_sampling_256tok_b16"], flush=True)

    # 5: codebook argmin (XLA; the Pallas kernel was deleted round 4 — its
    # bf16 mode tied XLA-bf16 within 3%: 707.7 vs 727.6 µs, BENCHMARKS.md)
    from vq_vae_gan_diffusion_tpu.models.codebook import nearest_codebook_indices

    z = jax.random.normal(jax.random.PRNGKey(0), (8192, 256))
    cb = jax.random.normal(jax.random.PRNGKey(1), (1024, 256))

    # at ~1 ms/op the tunnel's per-dispatch jitter (~0.5 ms) swamps the
    # device time, so chain K data-dependent iterations inside ONE dispatch
    K = 100

    def chained(fn):
        def run(zz, cbk):
            def body(_, acc):
                idx = fn(acc, cbk)
                return acc + 1e-9 * idx[:, None].astype(acc.dtype)
            return jax.lax.fori_loop(0, K, body, zz)
        return jax.jit(run)

    dt_xla = timeit(chained(nearest_codebook_indices), z, cb,
                    iters=3, warmup=2) / K
    dt_xla16 = timeit(chained(
        lambda zz, cbk: nearest_codebook_indices(zz, cbk, "bf16")), z, cb,
        iters=3, warmup=2) / K
    results["codebook_argmin_8192x1024x256"] = {
        "xla_exact_f32_us": round(dt_xla * 1e6, 1),
        "xla_bf16_scores_us": round(dt_xla16 * 1e6, 1)}
    print("codebook", results["codebook_argmin_8192x1024x256"], flush=True)

    # report ---------------------------------------------------------------------
    lines = ["# BENCHMARKS — measured on 1× TPU v5e (axon)", "",
             f"date: {time.strftime('%Y-%m-%d %H:%M')}",
             f"jax: {jax.__version__}, backend: {jax.default_backend()}", "",
             "| metric | value |", "|---|---|"]
    for k, v in results.items():
        lines.append(f"| {k} | {json.dumps(v)} |")
    lines.append("")
    lines.append("Reference baseline (same VQGAN step via the reference's torch "
                 "modules on this host's CPU): 10.9 images/s "
                 "(`baselines/torch_cpu_reference.json`).")
    # preserve the hand-written analysis section across regenerations
    try:
        with open("BENCHMARKS.md") as f:
            old = f.read()
        idx = old.find("## MFU")
        if idx < 0:
            idx = old.find("## Notes")
        if idx >= 0:
            lines.extend(["", old[idx:].rstrip()])
    except FileNotFoundError:
        pass
    with open("BENCHMARKS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
