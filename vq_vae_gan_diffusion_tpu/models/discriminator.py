"""PatchGAN discriminator (NHWC).

Parity with reference ``network/vqgan/discriminator.py:34-63``: 4×4 convs,
channels 64→128→256→512 (last conv-block stride 1), BatchNorm + LeakyReLU(0.2),
final 4×4 conv to 1 logit map. Conv biases disabled on BatchNorm'd layers, as
in the reference.

The reference initializes conv weights N(0, 0.02) and BatchNorm scale
N(1, 0.02) via ``utils.weights_init`` (utils.py:28-48, applied at
vqganVqvaeWorker.py:96); we bake that into the module's initializers.

BatchNorm note (SURVEY §7 hard-part 6): under jit-based data parallelism the
batch axis is a sharded logical axis, so XLA computes *global* batch statistics
(sync-BN semantics) automatically — no axis_name plumbing required. Running
averages live in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _normal_init(stddev: float = 0.02, mean: float = 0.0):
    def init(rng, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(rng, shape, dtype)
    return init


class Discriminator(nn.Module):
    num_filters_last: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = True) -> jax.Array:
        h = nn.Conv(self.num_filters_last, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    kernel_init=_normal_init(), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv0")(x)
        h = nn.leaky_relu(h, negative_slope=0.2)

        mult = 1
        for i in range(1, self.n_layers + 1):
            mult = min(2 ** i, 8)
            stride = 2 if i < self.n_layers else 1
            h = nn.Conv(self.num_filters_last * mult, (4, 4), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        kernel_init=_normal_init(), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             scale_init=_normal_init(mean=1.0), dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"bn{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)

        h = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    kernel_init=_normal_init(), dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_out")(h)
        return h
