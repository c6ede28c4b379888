"""Pallas codebook kernel vs XLA reference (SURVEY §7 step 3: kernel validated
against the XLA implementation; both kept, kernel behind a flag).

Runs in interpreter mode on the CPU test mesh; the real-TPU validation +
benchmark lives in the kernel docstring (measured numbers) and bench runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vq_vae_gan_diffusion_tpu.models.codebook import nearest_codebook_indices
from vq_vae_gan_diffusion_tpu.ops.codebook_pallas import nearest_indices_pallas


@pytest.mark.parametrize("n,k,d", [(100, 64, 16), (2048, 128, 32)])
def test_pallas_matches_xla(rng, n, k, d):
    z = jax.random.normal(rng, (n, d))
    cb = jax.random.normal(jax.random.PRNGKey(1), (k, d))
    with pltpu.force_tpu_interpret_mode():
        a = np.asarray(nearest_indices_pallas(z, cb))
    b = np.asarray(nearest_codebook_indices(z, cb))
    np.testing.assert_array_equal(a, b)
