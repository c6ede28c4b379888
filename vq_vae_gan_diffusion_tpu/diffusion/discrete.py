"""Microsoft-style discrete VQ-Diffusion (mask-and-replace) in log space.

Parity with reference ``network/vqDiffusion/submodule/diffusion_vq_official.py``:

- (αt, βt, γt) keep/uniform/mask schedule (:65-78 via
  :func:`.schedules.discrete_alpha_schedule`), log-space buffers (:135-164);
- ``q_pred`` / ``q_pred_one_timestep`` (:175-208), ``predict_start`` with the
  −70 mask-logit pad (:210-246), ``q_posterior`` (:248-280);
- Gumbel categorical sampling (:299-304);
- importance-sampled timesteps with Lt_history/Lt_count (:313-334, 383-387) —
  the reference mutates registered buffers; here they are explicit state
  threaded through the jitted loss (returned as ``new_history``);
- train loss = reweighted KL + decoder NLL at t=0 + optional auxiliary x0-KL
  (:336-406), final normalization sum/(B·N) (:503);
- per-t accuracy telemetry: the reference updates Python lists with a
  ``.cpu()`` sync per *sample* per step (:154-155, 361-366 — SURVEY §3 flags
  this as a device-sync hazard); here it's an on-device scatter EMA;
- ``sample`` (full reverse loop, :515-577) and ``sample_fast`` (skip-step,
  :581-651) as ``lax.scan``. The reference initializes the chain from
  ``log(U(0,1))`` noise (its constructed mask-onehot is unused, :560-563) —
  reproduced.

Numerics: the reference upcasts log_softmax to float64 (:237); TPU f64 is
emulated and slow, so we keep f32 with the same [−70, 0] clamping — tolerance
covered by tests (SURVEY §7 hard-part 3).

Internal layout is class-LAST ``[B, N, K]`` (TPU-friendly); the model adapter
transposes at the U-Net boundary.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import discrete_alpha_schedule

LOG_EPS = -70.0


def index_to_log_onehot(x: jax.Array, num_classes: int) -> jax.Array:
    """int [B, N] → log-onehot [B, N, K] (reference :50-60, class-last here)."""
    oh = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(oh, 1e-30, None))


def log_onehot_to_index(log_x: jax.Array) -> jax.Array:
    return jnp.argmax(log_x, axis=-1)


def log_add_exp(a: jax.Array, b: jax.Array) -> jax.Array:
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


def log_1_min_a(a: jax.Array) -> jax.Array:
    return jnp.log(1 - jnp.exp(a) + 1e-40)


class DiscreteSchedule(NamedTuple):
    log_at: jax.Array
    log_bt: jax.Array
    log_ct: jax.Array
    log_cumprod_at: jax.Array
    log_cumprod_bt: jax.Array
    log_cumprod_ct: jax.Array
    log_1_min_ct: jax.Array
    log_1_min_cumprod_ct: jax.Array


class LtState(NamedTuple):
    """Importance-sampling history (reference registered buffers :154-155)."""
    Lt_history: jax.Array   # [T]
    Lt_count: jax.Array     # [T]
    acc_ema: jax.Array      # [T] diffusion_acc_list
    keep_ema: jax.Array     # [T] diffusion_keep_list

    @classmethod
    def init(cls, timesteps: int) -> "LtState":
        z = jnp.zeros((timesteps,), jnp.float32)
        return cls(z, z, z, z)


def make_discrete_schedule(timesteps: int, num_classes: int,
                           ctt_T: float = 0.99999) -> DiscreteSchedule:
    at, bt, ct, att, btt, ctt = discrete_alpha_schedule(timesteps,
                                                        N=num_classes - 1,
                                                        ctt_T=ctt_T)
    f = lambda x: jnp.asarray(np.log(np.clip(x, 1e-30, None)), jnp.float32)
    log_ct = f(ct)
    log_cumprod_ct = f(ctt)
    return DiscreteSchedule(
        log_at=f(at), log_bt=f(bt), log_ct=log_ct,
        log_cumprod_at=f(att), log_cumprod_bt=f(btt),
        log_cumprod_ct=log_cumprod_ct,
        log_1_min_ct=log_1_min_a(log_ct),
        log_1_min_cumprod_ct=log_1_min_a(log_cumprod_ct),
    )


def _ex(arr: jax.Array, t: jax.Array) -> jax.Array:
    """[T] gathered at t [B] → [B, 1, 1] for class-last broadcasting."""
    return arr[t][:, None, None]


class DiscreteDiffusion:
    """Functional Diffusion_VQ_Official. model_fn maps log-onehot → logits.

    ``model_fn(log_x_t [B,N,K], t [B]) -> logits [B, N, K-1]`` (the adapter in
    :mod:`.vq_diffusion_composite` handles the conv U-Net reshapes).
    """

    def __init__(self, num_classes: int, seq_len: int, timesteps: int = 100,
                 sampling_timesteps: Optional[int] = None,
                 model_fn: Optional[Callable] = None,
                 auxiliary_loss_weight: float = 0.0,
                 adaptive_auxiliary_loss: bool = False,
                 mask_weight: Tuple[float, float] = (1.0, 1.0),
                 ctt_T: float = 0.99999,
                 mask_logit_pad: float = LOG_EPS,
                 chain_init: str = "uniform_rand",
                 use_importance_sampling: bool = True,
                 truncation_rate: Optional[float] = None):
        self.num_classes = num_classes  # includes the mask class (last)
        self.seq_len = seq_len
        self.num_timesteps = timesteps
        self.sampling_timesteps = sampling_timesteps or timesteps
        self.model_fn = model_fn
        self.model_fn_idx = None        # optional indices→logits binding
        # False | True | "interpret": fuse posterior+gumbel-sample into one
        # Pallas launch per reverse step (ops/discrete_posterior_pallas.py);
        # token-identical to the XLA path (same rng stream)
        self.fused_posterior = False
        self.auxiliary_loss_weight = auxiliary_loss_weight
        self.adaptive_auxiliary_loss = adaptive_auxiliary_loss
        self.mask_weight = mask_weight
        self.mask_logit_pad = mask_logit_pad
        self.chain_init = chain_init      # 'uniform_rand' (vq_official quirk) | 'prior'
        self.use_importance_sampling = use_importance_sampling
        self.truncation_rate = truncation_rate
        self.sched = make_discrete_schedule(timesteps, num_classes, ctt_T)

    # -- forward process ------------------------------------------------------
    def q_pred_one_timestep(self, log_x_t: jax.Array, t: jax.Array) -> jax.Array:
        s = self.sched
        probs_nonmask = log_add_exp(log_x_t[..., :-1] + _ex(s.log_at, t),
                                    _ex(s.log_bt, t))
        probs_mask = log_add_exp(log_x_t[..., -1:] + _ex(s.log_1_min_ct, t),
                                 _ex(s.log_ct, t))
        return jnp.concatenate([probs_nonmask, probs_mask], axis=-1)

    def q_pred(self, log_x_start: jax.Array, t: jax.Array) -> jax.Array:
        s = self.sched
        t = (t + self.num_timesteps + 1) % (self.num_timesteps + 1)
        probs_nonmask = log_add_exp(
            log_x_start[..., :-1] + _ex(s.log_cumprod_at, t),
            _ex(s.log_cumprod_bt, t))
        probs_mask = log_add_exp(
            log_x_start[..., -1:] + _ex(s.log_1_min_cumprod_ct, t),
            _ex(s.log_cumprod_ct, t))
        return jnp.concatenate([probs_nonmask, probs_mask], axis=-1)

    # -- model wrapper ---------------------------------------------------------
    def _log_pred_from_logits(self, out: jax.Array) -> jax.Array:
        """model logits [B, N, K-1] → clamped log-probs with mask pad."""
        log_pred = jax.nn.log_softmax(out.astype(jnp.float32), axis=-1)
        pad = jnp.full(log_pred.shape[:-1] + (1,), self.mask_logit_pad, jnp.float32)
        log_pred = jnp.concatenate([log_pred, pad], axis=-1)
        return jnp.clip(log_pred, LOG_EPS, 0.0)

    def predict_start(self, log_x_t: jax.Array, t: jax.Array) -> jax.Array:
        """p(x0|xt): model logits → clamped log-probs with −70 mask pad."""
        return self._log_pred_from_logits(self.model_fn(log_x_t, t))

    def predict_start_idx(self, x_idx: jax.Array, t: jax.Array) -> jax.Array:
        """:meth:`predict_start` from an index carry. Uses ``model_fn_idx``
        (indices → logits) when bound — e.g. the TransformerPredictor embeds
        indices, so the dense one-hot round trip is pure waste — otherwise
        materializes the log-onehot once for dense-input models (conv U-Nets
        consume log_x_t itself, reference diffusion_vq_official.py:223)."""
        if self.model_fn_idx is not None:
            return self._log_pred_from_logits(self.model_fn_idx(x_idx, t))
        log_x = index_to_log_onehot(x_idx, self.num_classes)
        return self.predict_start(log_x, t)

    def q_posterior(self, log_x_start: jax.Array, log_x_t: jax.Array,
                    t: jax.Array) -> jax.Array:
        """p_θ(x_{t-1}|x_t) = Σ q(x_{t-1}|x_t, x0')·p(x0') (reference :248-280)."""
        s = self.sched
        b, n, k = log_x_start.shape
        x_t_idx = log_onehot_to_index(log_x_t)
        mask = (x_t_idx == self.num_classes - 1)[..., None]          # [B, N, 1]
        log_zero = jnp.full((b, n, 1), jnp.log(1e-30), jnp.float32)

        log_qt = self.q_pred(log_x_t, t)[..., :-1]                    # [B, N, K-1]
        ct_cumprod = jnp.broadcast_to(_ex(s.log_cumprod_ct, t), (b, n, k - 1))
        log_qt = jnp.where(mask, ct_cumprod, log_qt)

        log_qt_one = self.q_pred_one_timestep(log_x_t, t)
        log_qt_one = jnp.concatenate([log_qt_one[..., :-1], log_zero], axis=-1)
        ct = jnp.broadcast_to(_ex(s.log_ct, t), (b, n, k - 1))
        ct_vec = jnp.concatenate([ct, jnp.zeros((b, n, 1), jnp.float32)], axis=-1)
        log_qt_one = jnp.where(mask, ct_vec, log_qt_one)

        q = log_x_start[..., :-1] - log_qt
        q = jnp.concatenate([q, log_zero], axis=-1)
        q_log_sum_exp = jax.scipy.special.logsumexp(q, axis=-1, keepdims=True)
        q = q - q_log_sum_exp
        log_ev = self.q_pred(q, t - 1) + log_qt_one + q_log_sum_exp
        return jnp.clip(log_ev, LOG_EPS, 0.0)

    def q_posterior_idx(self, log_x_start: jax.Array, x_t_idx: jax.Array,
                        t: jax.Array) -> jax.Array:
        """:meth:`q_posterior` specialized to a one-hot x_t given by indices.

        Log-equivalent to ``q_posterior(log_x_start,
        index_to_log_onehot(x_t_idx), t)`` up to the 1e-30 one-hot floor
        (relative error ~1e-21, far below f32 resolution): on a one-hot
        carry, ``q_pred`` / ``q_pred_one_timestep`` collapse to two scalars
        per row plus a column correction at x_t, so the dense [B, N, K]
        log_add_exp chains become broadcasted selects (~8 fewer K-wide
        memory passes per reverse step). The reference itself notes the
        precondition ("notice that log_x_t is onehot",
        diffusion_vq_official.py:249) but still does the dense math; only
        the chain-init noise step violates it, which :meth:`sample` runs
        through the dense path.
        """
        s = self.sched
        b, n = x_t_idx.shape
        k = self.num_classes
        mask = (x_t_idx == k - 1)[..., None]                  # [B, N, 1]
        at_col = (jnp.arange(k - 1)[None, None, :] == x_t_idx[..., None]) & ~mask

        log_att, log_btt = _ex(s.log_cumprod_at, t), _ex(s.log_cumprod_bt, t)
        log_ctt = _ex(s.log_cumprod_ct, t)
        log_at, log_bt, log_ct = (_ex(s.log_at, t), _ex(s.log_bt, t),
                                  _ex(s.log_ct, t))
        log_att_btt = jnp.logaddexp(log_att, log_btt)
        log_at_bt = jnp.logaddexp(log_at, log_bt)

        # q_pred(onehot x_t, t)[..., :-1], masked rows := log ctt̄
        log_qt = jnp.where(at_col, log_att_btt, jnp.where(mask, log_ctt, log_btt))

        log_zero = jnp.full((b, n, 1), jnp.log(1e-30), jnp.float32)
        q = jnp.concatenate([log_x_start[..., :-1] - log_qt, log_zero], axis=-1)
        q_log_sum_exp = jax.scipy.special.logsumexp(q, axis=-1, keepdims=True)
        q = q - q_log_sum_exp

        # q_pred_one_timestep(onehot x_t, t) with last col := log 1e-30,
        # masked rows := [log ct, ..., log ct, 0]
        nonmask = jnp.where(at_col, log_at_bt, jnp.where(mask, log_ct, log_bt))
        last = jnp.where(mask, 0.0, jnp.log(1e-30)).astype(jnp.float32)
        log_qt_one = jnp.concatenate([nonmask, last], axis=-1)

        log_ev = self.q_pred(q, t - 1) + log_qt_one + q_log_sum_exp
        return jnp.clip(log_ev, LOG_EPS, 0.0)

    def p_pred(self, log_x: jax.Array, t: jax.Array) -> jax.Array:
        log_x_recon = self.predict_start(log_x, t)
        return self.q_posterior(log_x_recon, log_x, t)

    def p_pred_idx(self, x_idx: jax.Array, t: jax.Array) -> jax.Array:
        """:meth:`p_pred` on an index carry (reverse-sampler steps ≥ 1)."""
        return self.q_posterior_idx(self.predict_start_idx(x_idx, t), x_idx, t)

    def _raw_logits_idx(self, x_idx: jax.Array, t: jax.Array) -> jax.Array:
        """Denoiser logits [B, N, K-1] from an index carry (pre-softmax)."""
        if self.model_fn_idx is not None:
            return self.model_fn_idx(x_idx, t)
        return self.model_fn(index_to_log_onehot(x_idx, self.num_classes), t)

    def _step_idx(self, rng: jax.Array, z_idx: jax.Array, t: jax.Array,
                  t_post: jax.Array, truncated: bool = False) -> jax.Array:
        """One structured reverse step: p_pred at (t → posterior t_post) +
        categorical sample (plain gumbel, or truncated top-r when
        ``truncated``). Routes to the fused Pallas kernel when
        ``fused_posterior`` is set (token-identical, same rng stream)."""
        if self.fused_posterior:
            from ..ops.discrete_posterior_pallas import (
                fits_vmem, fused_posterior_sample, fused_posterior_sample_prng,
                gather_posterior_coefs)
            b, n = z_idx.shape
            if fits_vmem(n, self.num_classes):
                trunc_k = (max(int(self.num_classes *
                                   (self.truncation_rate or 0.86)), 1)
                           if truncated else 0)
                logits = self._raw_logits_idx(z_idx, t)
                coefs = gather_posterior_coefs(self.sched, t_post,
                                               self.num_timesteps)
                if self.fused_posterior == "prng":
                    # in-kernel hardware-PRNG gumbel: same distribution,
                    # different stream (TPU-only; no gumbel HBM round trip)
                    if jax.devices()[0].platform != "tpu":
                        raise ValueError(
                            "fused_posterior='prng' is TPU-only "
                            "(pltpu.prng_* has no CPU/interpret lowering)")
                    seeds = jax.random.bits(rng, (b, 2), jnp.uint32)
                    return fused_posterior_sample_prng(
                        logits, z_idx, coefs, seeds, trunc_k=trunc_k)
                gumbel = self._gumbel(rng, (b, n, self.num_classes))
                # on CPU the kernel can only run interpreted (token-identical
                # either way) — keeps `--fused-posterior on --platform cpu`
                # drivable, e.g. during TPU tunnel outages
                interp = (self.fused_posterior == "interpret"
                          or jax.devices()[0].platform == "cpu")
                return fused_posterior_sample(
                    logits, z_idx, coefs, gumbel,
                    interpret=interp, trunc_k=trunc_k)
            # row tile too large for VMEM → XLA path (static shape check)
        log_x_recon = self.predict_start_idx(z_idx, t)
        prob = self.q_posterior_idx(log_x_recon, z_idx, t_post)
        if truncated:
            return self.sample_categorical_truncated_idx(rng, prob)
        return self.sample_categorical_idx(rng, prob)

    # -- sampling helpers ------------------------------------------------------
    @staticmethod
    def _gumbel(rng: jax.Array, shape) -> jax.Array:
        """Gumbel noise (reference :299-304). Single definition: the fused
        kernel's token-identical guarantee depends on bit-exact agreement
        between the XLA and fused sampling paths."""
        uniform = jax.random.uniform(rng, shape)
        return -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)

    def sample_categorical_idx(self, rng: jax.Array, logits: jax.Array) -> jax.Array:
        """Gumbel-argmax sample, returned as indices (reference :299-304)."""
        return jnp.argmax(self._gumbel(rng, logits.shape) + logits, axis=-1)

    def log_sample_categorical(self, rng: jax.Array, logits: jax.Array) -> jax.Array:
        sample = self.sample_categorical_idx(rng, logits)
        return index_to_log_onehot(sample, self.num_classes)

    def sample_categorical_truncated_idx(self, rng: jax.Array,
                                         logits: jax.Array) -> jax.Array:
        """Truncated (top-r) Gumbel sampling (reference vq_diffusion.py:291-304)."""
        r = self.truncation_rate or 0.86
        k = max(int(self.num_classes * r), 1)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jnp.argmax(self._gumbel(rng, logits.shape) + logits, axis=-1)

    def log_sample_categorical_truncated(self, rng: jax.Array,
                                         logits: jax.Array) -> jax.Array:
        sample = self.sample_categorical_truncated_idx(rng, logits)
        return index_to_log_onehot(sample, self.num_classes)

    def q_sample(self, rng: jax.Array, log_x_start: jax.Array,
                 t: jax.Array) -> jax.Array:
        return self.log_sample_categorical(rng, self.q_pred(log_x_start, t))

    def sample_time(self, rng: jax.Array, b: int, lt: LtState
                    ) -> Tuple[jax.Array, jax.Array]:
        """Importance sampling of t once history is warm (:313-334)."""
        rng_u, rng_i = jax.random.split(rng)
        t_uniform = jax.random.randint(rng_u, (b,), 0, self.num_timesteps)
        pt_uniform = jnp.full((b,), 1.0 / self.num_timesteps, jnp.float32)
        if not self.use_importance_sampling:
            return t_uniform, pt_uniform

        Lt_sqrt = jnp.sqrt(lt.Lt_history + 1e-10) + 1e-4
        Lt_sqrt = Lt_sqrt.at[0].set(Lt_sqrt[1])
        pt_all = Lt_sqrt / jnp.sum(Lt_sqrt)
        t_imp = jax.random.categorical(rng_i, jnp.log(pt_all), shape=(b,))
        pt_imp = pt_all[t_imp]

        warm = jnp.all(lt.Lt_count > 10)
        t = jnp.where(warm, t_imp, t_uniform)
        pt = jnp.where(warm, pt_imp, pt_uniform)
        return t, pt

    # -- training loss --------------------------------------------------------
    def train_loss(self, rng: jax.Array, x0: jax.Array, lt: LtState
                   ) -> Tuple[jax.Array, dict, LtState]:
        """Returns (scalar loss, metrics, new LtState). x0: int [B, N]."""
        b, n = x0.shape
        rng_t, rng_q = jax.random.split(rng)
        t, pt = self.sample_time(rng_t, b, lt)

        log_x_start = index_to_log_onehot(x0, self.num_classes)
        xt = self.sample_categorical_idx(rng_q, self.q_pred(log_x_start, t))

        log_x0_recon = self.predict_start_idx(xt, t)
        # xt is an exact one-hot sample → structured posterior
        log_model_prob = self.q_posterior_idx(log_x0_recon, xt, t)

        # telemetry EMAs (on-device scatter; replaces Python-list .cpu() loop)
        x0_recon = log_onehot_to_index(log_x0_recon)
        xt1_recon = log_onehot_to_index(log_model_prob)
        same0 = jnp.mean((x0_recon == x0).astype(jnp.float32), axis=1)
        samek = jnp.mean((xt1_recon == xt).astype(jnp.float32), axis=1)
        acc_ema = lt.acc_ema.at[t].set(0.1 * same0 + 0.9 * lt.acc_ema[t])
        keep_ema = lt.keep_ema.at[t].set(0.1 * samek + 0.9 * lt.keep_ema[t])

        log_true_prob = self.q_posterior_idx(log_x_start, xt, t)
        kl = jnp.sum(jnp.exp(log_true_prob) * (log_true_prob - log_model_prob),
                     axis=-1)                                        # [B, N]
        mask_region = (xt == self.num_classes - 1).astype(jnp.float32)
        mask_w = mask_region * self.mask_weight[0] + (1 - mask_region) * self.mask_weight[1]
        kl = jnp.sum(kl * mask_w, axis=1)                            # [B]

        decoder_nll = -jnp.sum(jnp.exp(log_x_start) * log_model_prob, axis=-1)
        decoder_nll = jnp.sum(decoder_nll, axis=1)

        is_t0 = (t == 0).astype(jnp.float32)
        kl_loss = is_t0 * decoder_nll + (1 - is_t0) * kl

        Lt2 = jax.lax.stop_gradient(kl_loss ** 2)
        new_history = lt.Lt_history.at[t].set(0.1 * Lt2 + 0.9 * lt.Lt_history[t])
        new_count = lt.Lt_count.at[t].add(1.0)

        vb_loss = kl_loss / pt
        if self.auxiliary_loss_weight != 0:
            kl_aux = jnp.sum(jnp.exp(log_x_start[..., :-1]) *
                             (log_x_start[..., :-1] - log_x0_recon[..., :-1]),
                             axis=-1)
            kl_aux = jnp.sum(kl_aux * mask_w, axis=1)
            kl_aux_loss = is_t0 * decoder_nll + (1 - is_t0) * kl_aux
            if self.adaptive_auxiliary_loss:
                add_w = (1 - t / self.num_timesteps) + 1.0
            else:
                add_w = 1.0
            vb_loss = vb_loss + add_w * self.auxiliary_loss_weight * kl_aux_loss / pt

        loss = jnp.sum(vb_loss) / (b * n)                            # :503
        metrics = {"vb_loss": loss, "kl": jnp.mean(kl),
                   "decoder_nll": jnp.mean(decoder_nll)}
        return loss, metrics, LtState(new_history, new_count, acc_ema, keep_ema)

    # -- sampling --------------------------------------------------------------
    def _chain_init(self, rng: jax.Array, batch_size: int) -> jax.Array:
        if self.chain_init == "prior":
            # proper q(x_T) prior (reference vq_diffusion.py:373-379)
            log_x = jnp.full((batch_size, self.seq_len, self.num_classes),
                             self.sched.log_cumprod_bt[-1], jnp.float32)
            log_x = log_x.at[..., -1].set(self.sched.log_cumprod_ct[-1])
            return jnp.clip(log_x, LOG_EPS, 0.0)
        # Diffusion_VQ_Official starts from log(U(0,1)) noise, :560-566
        u = jax.random.uniform(rng, (batch_size, self.seq_len, self.num_classes))
        return jnp.log(u)

    def sample(self, rng: jax.Array, batch_size: int = 16,
               return_all_timesteps: bool = False) -> jax.Array:
        rng_init, rng_loop = jax.random.split(rng)
        log_z = self._chain_init(rng_init, batch_size)
        start = self.sampling_timesteps

        # Step t = start-1 consumes the dense chain-init noise (NOT a
        # one-hot — the reference's log(U(0,1)) quirk, :560-566), so it runs
        # the dense posterior; every later step's carry is an exact one-hot
        # index and takes the structured path (q_posterior_idx).
        rng_loop, sub0 = jax.random.split(rng_loop)
        t0 = jnp.full((batch_size,), start - 1, jnp.int32)
        z_idx = self.sample_categorical_idx(sub0, self.p_pred(log_z, t0))

        def body(carry, i):
            z_idx, rng = carry
            rng, sub = jax.random.split(rng)
            t = jnp.full((batch_size,), i, jnp.int32)
            z_idx = self._step_idx(sub, z_idx, t, t)
            return (z_idx, rng), (z_idx if return_all_timesteps else None)

        first_frame = z_idx
        (z_idx, _), frames = jax.lax.scan(body, (z_idx, rng_loop),
                                          jnp.arange(start - 2, -1, -1))
        if return_all_timesteps:
            # one frame per reverse step (t = start-1 .. 0), as before
            frames = jnp.concatenate([first_frame[None], frames], axis=0)
            return z_idx, jnp.swapaxes(frames, 0, 1)
        return z_idx

    def sample_fast(self, rng: jax.Array, batch_size: int = 16,
                    skip_step: int = 1) -> jax.Array:
        rng_init, rng_loop = jax.random.split(rng)
        log_z = self._chain_init(rng_init, batch_size)
        start = self.sampling_timesteps
        steps = list(range(start - 1, -1, -1 - skip_step))
        if steps[-1] != 0:
            steps.append(0)

        def post_sample(log_z_or_idx, rng, i, dense: bool):
            sub = rng
            t = jnp.full((batch_size,), i, jnp.int32)
            t_post = jnp.where(i > skip_step, t - skip_step, t)
            if dense:
                log_x_recon = self.predict_start(log_z_or_idx, t)
                prob = self.q_posterior(log_x_recon, log_z_or_idx, t_post)
                return self.sample_categorical_idx(sub, prob)
            return self._step_idx(sub, log_z_or_idx, t, t_post)

        # dense chain-init step, then structured one-hot steps (see sample())
        rng_loop, sub0 = jax.random.split(rng_loop)
        z_idx = post_sample(log_z, sub0, jnp.int32(steps[0]), dense=True)

        def body(carry, i):
            z_idx, rng = carry
            rng, sub = jax.random.split(rng)
            return (post_sample(z_idx, sub, i, dense=False), rng), None

        (z_idx, _), _ = jax.lax.scan(body, (z_idx, rng_loop),
                                     jnp.asarray(steps[1:], jnp.int32))
        return z_idx
