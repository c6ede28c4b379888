"""Ablation timings for the discrete VQ-diffusion sampling chains.

Attributes chain time between the denoiser forward and the [B, N, K]
log-space posterior+sample math (ROUND2_NOTES round-3 priority 4:
"profile, then either XLA-level layout fixes or a fused log-space posterior
kernel"), and measures the fused kernel (ops/discrete_posterior_pallas.py)
against the XLA path. Scan carries thread the sampled indices so nothing is
loop-invariant; one final host readback fences (block_until_ready does not
fence on axon).

Variants per prior (transformer K=1025 / ShuffleNet VQ_Official):
  full_xla     model + structured posterior + gumbel sample (index carry)
  model_only   model + argmax over logits (no posterior/gumbel)
  post_only    posterior+sample on frozen logits (no model in the loop)
  full_fused   model + fused posterior kernel
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # noqa: E402,E702
import time

import numpy as np
import jax
import jax.numpy as jnp

from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from vq_vae_gan_diffusion_tpu.diffusion.discrete import DiscreteDiffusion
from vq_vae_gan_diffusion_tpu.models.transformer_vq_diffusion import (
    TransformerVQDiffusion)

STEPS = 100
B = 16


def timeit(tag, build_body, z0, n_iters=STEPS, reps=3, aux=None):
    """build_body(z, sub, i[, aux]) -> z'. ``aux`` (e.g. frozen logits) is
    threaded as a jit ARGUMENT — closing over a large array would inline it
    as an XLA constant (CLAUDE.md gotcha: bloats programs, defeats caching)."""
    def chain(aux_arg):
        def body(carry, i):
            z, rng = carry
            rng, sub = jax.random.split(rng)
            args = (z, sub, i) if aux_arg is None else (z, sub, i, aux_arg)
            return (build_body(*args), rng), None
        (z, _), _ = jax.lax.scan(
            body, (z0, jax.random.PRNGKey(1)),
            jnp.arange(n_iters - 1, -1, -1, dtype=jnp.int32))
        return z
    f = jax.jit(chain)
    np.asarray(f(aux))  # compile + warm
    np.asarray(f(aux))  # second warm (committed-sharding recompile)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(aux)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:>12}: {dt*1e3:8.1f} ms/chain  "
          f"{n_iters/dt:7.1f} steps/s", flush=True)
    return dt


def run_transformer(codebook_size=1024, seq_len=256, embedding_dim=512,
                    num_layers=4, num_heads=8, dtype=jnp.bfloat16,
                    fused_mode=True):
    print(f"== transformer prior (K={codebook_size + 1}, N={seq_len}, "
          f"B={B}) ==", flush=True)
    tvq = TransformerVQDiffusion(codebook_size=codebook_size,
                                 seq_len=seq_len, diffusion_steps=STEPS,
                                 embedding_dim=embedding_dim,
                                 num_layers=num_layers, num_heads=num_heads,
                                 dtype=dtype)
    with jax.default_device(jax.devices("cpu")[0]):
        params = tvq.predictor.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, seq_len), jnp.int32),
                                    jnp.zeros((1,), jnp.int32))["params"]
    params = jax.device_put(params, jax.devices()[0])
    d = tvq.diffusion
    # _bind sets d.model_fn_idx and RETURNS the dense model_fn
    d.model_fn = tvq._bind(params)
    z0 = jnp.zeros((B, seq_len), jnp.int32)

    def t_of(i):
        return jnp.full((B,), i, jnp.int32)

    timeit("full_xla", lambda z, sub, i: d._step_idx(sub, z, t_of(i), t_of(i)),
           z0)
    timeit("model_only",
           lambda z, sub, i: jnp.argmax(
               d._raw_logits_idx(z, t_of(i)), -1).astype(jnp.int32), z0)

    frozen = d._raw_logits_idx(z0, t_of(0))

    def post_only(z, sub, i, logits):
        # perturb by the carry so XLA can't hoist the posterior out of the scan
        log_x0 = d._log_pred_from_logits(
            logits + 1e-20 * z[:, :1, None].astype(jnp.float32))
        ev = d.q_posterior_idx(log_x0, z, t_of(i))
        return d.sample_categorical_idx(sub, ev)

    timeit("post_only", post_only, z0, aux=frozen)

    d.fused_posterior = fused_mode
    timeit("full_fused",
           lambda z, sub, i: d._step_idx(sub, z, t_of(i), t_of(i)), z0)
    if jax.devices()[0].platform == "tpu":
        # in-kernel hardware-PRNG gumbel (no [B,N,K] gumbel HBM round trip;
        # TPU-only: pltpu.prng_* has no CPU lowering)
        d.fused_posterior = "prng"
        timeit("full_prng",
               lambda z, sub, i: d._step_idx(sub, z, t_of(i), t_of(i)), z0)
    d.fused_posterior = False


def run_vq_official(fused_sampler="on", fused_mode=True):
    """ShuffleNet-prior chain (mnist config shape: K=1024 classes over the
    [K, N=49] log-onehot image). The U-Net consumes the dense one-hot, so
    model_only includes that materialization."""
    from vq_vae_gan_diffusion_tpu.config import load_config
    from vq_vae_gan_diffusion_tpu.models.vq_diffusion_composite import (
        VQDiffusionComposite)
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "training_config_mnist.yml"))
    cfg = cfg.replace_path("architecture.model_name", "vqdiffusion")
    cfg = cfg.replace_path("architecture.vqdiffusion.diffusion_type",
                           "VQ_Official")
    cfg = cfg.replace_path("architecture.vqdiffusion.fused_sampler",
                           {"on": True, "off": False}.get(fused_sampler,
                                                          fused_sampler))
    comp = VQDiffusionComposite(cfg, dtype=jnp.bfloat16)
    print(f"== VQ_Official ShuffleNet prior (K={comp.prior.num_classes}, "
          f"N={comp.seq_len}, B={B}, fused_sampler={fused_sampler}) ==",
          flush=True)
    with jax.default_device(jax.devices("cpu")[0]):
        uvars = comp.unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, comp.prior.num_classes, comp.seq_len, 1)), None,
            jnp.zeros((1,), jnp.int32), train=False)
    uvars = jax.device_put(uvars, jax.devices()[0])
    d = comp.prior
    d.model_fn = comp._bind(uvars["params"], uvars.get("batch_stats", {}),
                            train=False)
    z0 = jnp.zeros((B, comp.seq_len), jnp.int32)

    def t_of(i):
        return jnp.full((B,), i, jnp.int32)

    n_steps = min(STEPS, d.sampling_timesteps)
    timeit("full_xla", lambda z, sub, i: d._step_idx(sub, z, t_of(i), t_of(i)),
           z0, n_iters=n_steps, reps=1)
    timeit("model_only",
           lambda z, sub, i: jnp.argmax(
               d._raw_logits_idx(z, t_of(i)), -1).astype(jnp.int32),
           z0, n_iters=n_steps, reps=1)
    d.fused_posterior = fused_mode
    timeit("full_fused",
           lambda z, sub, i: d._step_idx(sub, z, t_of(i), t_of(i)), z0,
           n_iters=n_steps, reps=1)
    d.fused_posterior = False


if __name__ == "__main__":
    run_transformer()
    run_vq_official()
