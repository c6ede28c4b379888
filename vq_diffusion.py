#!/usr/bin/env python
"""Self-contained educational VQ-Diffusion (reference root ``vq_diffusion.py``).

The reference ships a standalone Microsoft-style VQ-Diffusion with an AdaLN
transformer predictor and optional CLIP text conditioning behind
``USE_TEXT_CONDITION = False`` — not wired to any entry point (its __main__ is
``pass``, vq_diffusion.py:430-431). Here the same capability lives in
:mod:`vq_vae_gan_diffusion_tpu.models.transformer_vq_diffusion`; this script
is the runnable demo the reference never had::

    python vq_diffusion.py --steps 50        # train on random token data
    python vq_diffusion.py --use-text-condition   # needs CLIP weights on disk
"""

from __future__ import annotations

import argparse
import sys

USE_TEXT_CONDITION = False  # reference flag (vq_diffusion.py:13)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--codebook-size", type=int, default=64)
    parser.add_argument("--seq-len", type=int, default=64)
    parser.add_argument("--diffusion-steps", type=int, default=20)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--use-text-condition", action="store_true",
                        default=USE_TEXT_CONDITION)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="force a JAX backend (the axon TPU plugin ignores "
                             "JAX_PLATFORMS; set before the first device op)")
    args = parser.parse_args(argv)

    if args.platform is not None:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vq_vae_gan_diffusion_tpu.diffusion.discrete import LtState
    from vq_vae_gan_diffusion_tpu.models.transformer_vq_diffusion import \
        TransformerVQDiffusion
    from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    m = TransformerVQDiffusion(
        codebook_size=args.codebook_size, seq_len=args.seq_len,
        diffusion_steps=args.diffusion_steps,
        use_text_condition=args.use_text_condition)
    rng = jax.random.PRNGKey(args.seed)
    dummy_idx = jnp.zeros((1, args.seq_len), jnp.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        params = m.predictor.init(rng, dummy_idx, jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    lt = LtState.init(args.diffusion_steps)

    # toy structured token data: ramps with noise
    def make_batch(key):
        base = jnp.arange(args.seq_len)[None, :] % args.codebook_size
        shift = jax.random.randint(key, (args.batch_size, 1), 0, args.codebook_size)
        return ((base + shift) % args.codebook_size).astype(jnp.int32)

    @jax.jit
    def step(params, opt_state, lt, rng):
        rng, kb, kl = jax.random.split(rng, 3)
        x0 = make_batch(kb)

        def loss_fn(p):
            loss, metrics, new_lt = m.loss(p, x0, kl, lt)
            return loss, new_lt

        (loss, new_lt), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, new_lt, rng, loss

    first = None
    for i in range(args.steps):
        params, opt_state, lt, rng, loss = step(params, opt_state, lt, rng)
        loss = float(np.asarray(loss))
        first = first if first is not None else loss
        if i % max(args.steps // 10, 1) == 0:
            print(f"step {i}: loss {loss:.4f}")
    print(f"loss {first:.4f} -> {loss:.4f}")

    samples = m.sample(params, rng, 4)
    print("samples:", np.asarray(samples).shape, "max token",
          int(np.asarray(samples).max()))
    fast = m.fast_sample(params, rng, 4, skip_step=4)
    print("fast samples:", np.asarray(fast).shape)
    return 0


if __name__ == "__main__":
    sys.exit(main())
