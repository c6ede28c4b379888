#!/usr/bin/env python
"""Device-free TPU lowering sweep over every Pallas kernel path.

``jax.jit(f).trace(...).lower(lowering_platforms=("tpu",))`` runs the full
Pallas→Mosaic dialect conversion WITHOUT a TPU attached — it catches the
launch-blocking error class (unsupported casts, misaligned block shapes,
unsupported strided slices) that interpret-mode tests structurally cannot
(they never leave the CPU emulator). Run after any kernel change while the
tunnel is down; actual compilation/perf still needs hardware.

Found on first run (both previously only interpret-tested):
  - [1,16] SMEM coef row blocks violate the (8,128)|full-dim block rule
    (both discrete-posterior kernels — launch-blocking);
  - Mosaic has no u32→f32 cast (prng gumbel transform).
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(name, build):
    """build() -> (fn, args); lowers fn(*args) for the tpu platform."""
    try:
        fn, args = build()
        jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
        print(f"  OK   {name}", flush=True)
    except Exception as e:  # noqa: BLE001
        FAILURES.append(name)
        msg = f"{type(e).__name__}: {e}"
        print(f"  FAIL {name}: {msg[:500]}", flush=True)
        if os.environ.get("LOWERING_TRACE"):
            traceback.print_exc()


def main() -> int:
    # -- discrete posterior kernels -----------------------------------------
    from vq_vae_gan_diffusion_tpu.diffusion.discrete import DiscreteDiffusion
    from vq_vae_gan_diffusion_tpu.ops.discrete_posterior_pallas import (
        fused_posterior_sample, fused_posterior_sample_prng,
        gather_posterior_coefs)

    b, n, k, T = 16, 256, 1025, 100
    d = DiscreteDiffusion(num_classes=k, seq_len=n, timesteps=T)
    logits = jnp.zeros((b, n, k - 1), jnp.float32)
    x_t = jnp.zeros((b, n), jnp.int32)
    coefs = gather_posterior_coefs(d.sched, jnp.full((b,), 3, jnp.int32), T)
    seeds = jnp.zeros((b, 2), jnp.int32)
    gumbel = jnp.zeros((b, n, k), jnp.float32)
    print("discrete posterior:")
    for tk, sfx in ((0, ""), (881, "_trunc")):
        check(f"posterior_gumbel{sfx}",
              lambda tk=tk: (lambda *a: fused_posterior_sample(*a, trunc_k=tk),
                             (logits, x_t, coefs, gumbel)))
        check(f"posterior_prng{sfx}",
              lambda tk=tk: (
                  lambda *a: fused_posterior_sample_prng(*a, trunc_k=tk),
                  (logits, x_t, coefs, seeds)))

    # -- ShuffleNet U-Net fused samplers (DDPM mnist bench shape) -----------
    from vq_vae_gan_diffusion_tpu.models.unet_shuffle import ShuffleUNet
    from vq_vae_gan_diffusion_tpu.models.shuffle_infer import (apply_folded,
                                                               fold_unet)

    print("shuffle U-Net (mnist bench shape, base_dim 64):")
    unet = ShuffleUNet(timesteps=1000, time_embedding_dim=256, in_channels=1,
                       out_channels=1, base_dim=64, dim_mults=(2, 4))
    xs = jnp.zeros((16, 28, 28, 1), jnp.bfloat16)
    ts = jnp.zeros((16,), jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = unet.init(jax.random.PRNGKey(0), xs.astype(jnp.float32),
                              None, ts, train=False)
    folded = fold_unet(variables, dtype=jnp.bfloat16)
    for mode in ("pallas", "packed"):
        check(f"shuffle_{mode}",
              lambda mode=mode: (
                  lambda x, t: apply_folded(folded, x, t, use_pallas=mode),
                  (xs, ts)))
    # odd-grid downsample fallbacks inside packed mode (14→7 stage)
    unet_odd = ShuffleUNet(timesteps=1000, time_embedding_dim=256,
                           in_channels=1, out_channels=1, base_dim=64,
                           dim_mults=(2, 4, 8))
    xo = jnp.zeros((8, 28, 28, 1), jnp.bfloat16)
    to = jnp.zeros((8,), jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        v_odd = unet_odd.init(jax.random.PRNGKey(0), xo.astype(jnp.float32),
                              None, to, train=False)
    folded_odd = fold_unet(v_odd, dtype=jnp.bfloat16)
    check("shuffle_packed_odd_grid",
          lambda: (lambda x, t: apply_folded(folded_odd, x, t,
                                             use_pallas="packed"), (xo, to)))

    # -- GPT decode-stack kernels (flagship prior shape) ---------------------
    from vq_vae_gan_diffusion_tpu.models.mingpt import GPT, sample_tokens

    print("gpt decode stack (C=1024, L=12, B=16):")
    gpt = GPT(vocab_size=1024, block_size=512, n_layer=12, n_head=16,
              n_embd=1024, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        gp = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))
        gp = gp["params"]
    prefix = jnp.zeros((16, 1), jnp.int32)
    for quant in (None, "int8", "int8kv", "int4", "int4kv"):
        check(f"gpt_decode_{quant or 'bf16'}",
              lambda quant=quant: (
                  lambda params, rng, pfx: sample_tokens(
                      gpt, params, rng, pfx, prefix_len=1, steps=8,
                      fused=True, quant=quant),
                  (gp, jax.random.PRNGKey(0), prefix)))
    # whole-layer-resident variant (small prior shape)
    gpt_s = GPT(vocab_size=1024, block_size=512, n_layer=4, n_head=8,
                n_embd=256, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        gps = gpt_s.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 2), jnp.int32))["params"]
    check("gpt_decode_small_resident",
          lambda: (lambda params, rng, pfx: sample_tokens(
              gpt_s, params, rng, pfx, prefix_len=1, steps=8, fused=True),
              (gps, jax.random.PRNGKey(0), prefix)))

    # -- codebook nearest-neighbour (XLA; the Pallas kernel was deleted in
    # round 4 — see BENCHMARKS.md "Kernel decisions") --------------------------
    from vq_vae_gan_diffusion_tpu.models.codebook import nearest_codebook_indices

    print("codebook:")
    z = jnp.zeros((4096, 256), jnp.float32)
    book = jnp.zeros((1024, 256), jnp.float32)
    check("codebook_argmin_exact",
          lambda: (nearest_codebook_indices, (z, book)))
    check("codebook_argmin_bf16",
          lambda: (lambda a, b: nearest_codebook_indices(a, b, "bf16"),
                   (z, book)))

    print()
    if FAILURES:
        print(f"{len(FAILURES)} FAILURES: {FAILURES}")
        return 1
    print("all kernel paths lower for TPU")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
