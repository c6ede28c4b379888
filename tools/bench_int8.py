import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np
import jax, jax.numpy as jnp
from vq_vae_gan_diffusion_tpu.utils import enable_compilation_cache
enable_compilation_cache()
from vq_vae_gan_diffusion_tpu.models.mingpt import GPT, sample_tokens

gpt = GPT(vocab_size=1024, block_size=512, n_layer=12, n_head=16,
          n_embd=1024, dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    gp = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 257), jnp.int32))["params"]
gp = jax.device_put(gp, jax.devices()[0])
B, steps = 16, 256
sos = jnp.zeros((B, 1), jnp.int32)

def timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        float(np.asarray(fn(*args)).sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(out).sum())
    return (time.perf_counter() - t0) / iters

for tag, q in [("bf16", None), ("int8", "int8"), ("int8kv", "int8kv"),
               ("int4", "int4"), ("int4kv", "int4kv")]:
    f = jax.jit(lambda p, rng, q=q: sample_tokens(gpt, p, rng, sos, 1, steps, quant=q))
    dt = timeit(f, gp, jax.random.PRNGKey(0))
    print(tag, json.dumps({"seconds": round(dt, 3),
                           "us_per_token": round(dt / steps * 1e6, 1),
                           "tokens_per_sec": round(B * steps / dt, 1)}), flush=True)
