"""The jitted SPMD train step — the TPU-native heart of the framework.

Replaces the reference's per-minibatch Python orchestration
(reference: train.py:201-252: DataParallel scatter/gather, 4-term loss on the
main device, ``.backward()``, ``optimizer.step()``) with ONE compiled XLA
program: forward (VAE + regression), 4-term loss, grads, Adam update and all
monitoring metrics, data-parallel over a ``data`` mesh axis. Gradient
reduction is GSPMD-inserted ``psum`` over ICI — no manual collectives.

Loss terms (reference wiring train.py:222-248):
  total = recons + beta * latent + flow_input_reg + controls
with
  - recons: MSE (normalized) or batch-averaged L2 (train.py:103-106),
  - latent: Dkl (BasicVAE) or flow-ELBO (FlowVAE), beta-warmup scaled
    (train.py:225-227),
  - flow_input_reg: 0.1 * beta_final * Dkl(z0 mu/logvar) when a latent flow
    is trained with 'dkl' input regularization (train.py:235-239),
  - controls: SynthParamsLoss(v_out, v_in) (forward) or FlowParamsLoss
    pulled back through both flows (train.py:240-243).

Monitoring metrics (QLoss / Accuracy / MSE; train.py:229-233) are computed
inside the same jit under ``stop_gradient`` — they ride along for free
instead of being separate host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import ModelConfig, TrainConfig
from ..data.preset import PresetIndexesHelper
from ..losses.synth_params import (
    CategoricalParamsAccuracy,
    QuantizedNumericalParamsLoss,
    SynthParamsLoss,
)
from ..losses.vae_losses import (
    GaussianDkl,
    L2Loss,
    flow_vae_latent_loss,
    latent_dkl_loss,
)
from ..ops.probability import gaussian_log_probability


class TrainState(struct.PyTreeNode):
    """Carried training state: replicated across the mesh."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_optimizer(train_config: TrainConfig) -> optax.GradientTransformation:
    """Adam with torch-style coupled weight decay (grad += wd * w before the
    moment updates — reference: train.py:171-173 uses torch.optim.Adam with
    ``weight_decay``, which is coupled L2, not AdamW). The learning rate is
    an ``inject_hyperparams`` leaf so the host-side warmup / plateau
    schedulers can set it between epochs without recompiling."""
    if train_config.optimizer != "Adam":
        raise NotImplementedError(f"Optimizer '{train_config.optimizer}'")

    def _make(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(train_config.weight_decay),
            optax.adam(
                learning_rate,
                b1=train_config.adam_betas[0],
                b2=train_config.adam_betas[1],
            ),
        )

    return optax.inject_hyperparams(_make)(
        learning_rate=train_config.initial_learning_rate
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR override (warmup epochs & plateau scheduler,
    reference: train.py:195-197, 296)."""
    opt_state = state.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyper))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def create_train_state(model, variables, train_config: TrainConfig) -> TrainState:
    tx = make_optimizer(train_config)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


# ----------------------------------------------------------------------------
# Criterion construction (reference: train.py:100-128)
# ----------------------------------------------------------------------------


def build_criteria(
    model_config: ModelConfig,
    train_config: TrainConfig,
    idx_helper: PresetIndexesHelper,
) -> Dict[str, Any]:
    crits: Dict[str, Any] = {}
    if model_config.forward_controls_loss:
        if train_config.params_cat_bceloss:
            assert not model_config.params_reg_softmax
        crits["controls"] = SynthParamsLoss(
            idx_helper,
            train_config.normalize_losses,
            cat_bce=train_config.params_cat_bceloss,
            cat_softmax=(
                not model_config.params_reg_softmax
                and not train_config.params_cat_bceloss
            ),
            cat_softmax_t=train_config.params_cat_softmax_temperature,
        )
    else:
        crits["controls"] = None  # FlowParamsLoss computed in-step (needs apply)
    crits["qloss"] = QuantizedNumericalParamsLoss(idx_helper, loss="mse")
    crits["accuracy"] = CategoricalParamsAccuracy(
        idx_helper, reduce=True, percentage_output=True
    )
    crits["flow_input_dkl"] = GaussianDkl(normalize=train_config.normalize_losses)
    return crits


# FlowParamsLoss numerical guard. At init, pulling the target preset back
# through 12 inverse coupling layers can amplify magnitudes geometrically
# (each inverse multiplies deviations by up to 1/s_min = 1e3), until the
# Gaussian log-prob overflows f32 — measured on the flagship (dim_z=610,
# realnvp_6l300): per-item log-densities of -1e30 ('train' BN mode) and
# -inf -> NaN divergence ('eval' mode). The reference's formula
# (loss.py:318-346) has the same pathology; it just never NaN-checked this
# config at scale. Guard: clip the pulled-back values and floor the
# per-item log-density — items in the sane range keep exact reference
# semantics AND gradients; catastrophic items contribute a bounded constant
# (zero gradient) instead of inf. Deviation documented in PARITY.md.
_PULLBACK_CLIP = 1e4
_FLOW_LOSS_FLOOR = -1e8


def _flow_controls_loss(model, variables, v_in, z0_mu_logvar, train_mode,
                        rng_pair=None):
    """The FlowParamsLoss 'cont' term (reference loss.py:318-346), shared by
    the train- and eval-step builders. When ``train_mode`` the inverse
    passes run batch-stat BN + dropout and the chained batch_stats mutations
    are returned (reference nflows train-mode semantics); else running-stat
    eval mode. Returns (cont, new_batch_stats_or_None)."""
    new_bs = None
    if train_mode:
        k_u, k_t = rng_pair
        (zK_t, logdet_U), mut1 = model.apply(
            variables, v_in, train=True,
            method=model.regression_flow_inverse,
            rngs={"dropout": k_u}, mutable=["batch_stats"],
        )
        zK_t = jnp.clip(zK_t, -_PULLBACK_CLIP, _PULLBACK_CLIP)
        vars2 = {"params": variables["params"],
                 "batch_stats": mut1["batch_stats"]}
        (z0_t, logdet_T), mut2 = model.apply(
            vars2, zK_t, train=True,
            method=model.latent_flow_inverse,
            rngs={"dropout": k_t}, mutable=["batch_stats"],
        )
        new_bs = mut2["batch_stats"]
    else:
        zK_t, logdet_U = model.apply(
            variables, v_in, train=False,
            method=model.regression_flow_inverse,
        )
        zK_t = jnp.clip(zK_t, -_PULLBACK_CLIP, _PULLBACK_CLIP)
        z0_t, logdet_T = model.apply(
            variables, zK_t, train=False, method=model.latent_flow_inverse,
        )
    z0_t = jnp.clip(z0_t, -_PULLBACK_CLIP, _PULLBACK_CLIP)
    logp = gaussian_log_probability(
        z0_t, z0_mu_logvar[:, 0, :], z0_mu_logvar[:, 1, :]
    )
    per_item = jnp.maximum(logp + logdet_T + logdet_U, _FLOW_LOSS_FLOOR)
    return -jnp.mean(per_item) / 1000.0, new_bs


def _recons_loss(x_out, x_in, normalize: bool):
    if normalize:
        return jnp.mean(jnp.square(x_out - x_in))
    return L2Loss()(x_out, x_in)


def _latent_loss(model_config, train_config, z0_mu_logvar, z0, zK, logdet):
    if model_config.latent_flow_arch is not None:
        return flow_vae_latent_loss(
            z0_mu_logvar, z0, zK, logdet, train_config.normalize_losses
        )
    return latent_dkl_loss(z0_mu_logvar, train_config.normalize_losses)


# ----------------------------------------------------------------------------
# Step factories
# ----------------------------------------------------------------------------


def make_train_step(
    model,
    model_config: ModelConfig,
    train_config: TrainConfig,
    idx_helper: PresetIndexesHelper,
):
    """Returns ``train_step(state, x_in, v_in, sample_info, rng_key, beta)
    -> (state, metrics)``, ready for ``jax.jit``.

    All config branches resolve at trace time (static Python conditionals) —
    the compiled program contains no data-dependent control flow.
    """
    criteria = build_criteria(model_config, train_config, idx_helper)
    has_latent_flow = model_config.latent_flow_arch is not None
    dkl_flow_reg = (
        has_latent_flow
        and train_config.latent_flow_input_regularization.lower() == "dkl"
    )
    forward_controls = model_config.forward_controls_loss
    flow_loss_train_bn = (
        getattr(train_config, "flow_loss_bn_mode", "train") == "train"
    )

    def _forward(params, batch_stats, x_in, sample_info, k_samp, k_drop):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(
            variables,
            x_in,
            sample_info,
            train=True,
            method=model.forward_full,
            rngs={"sampling": k_samp, "dropout": k_drop},
            mutable=["batch_stats"],
        )

    if getattr(train_config, "remat", False):
        # trade FLOPs for HBM: recompute the forward during backward
        # (jax.checkpoint; enables much larger per-chip batches)
        _forward = jax.checkpoint(_forward)

    def loss_fn(params, batch_stats, x_in, v_in, sample_info, rng_key, beta):
        k_samp, k_drop = jax.random.split(rng_key)
        variables = {"params": params, "batch_stats": batch_stats}
        outs, mutated = _forward(
            params, batch_stats, x_in, sample_info, k_samp, k_drop
        )
        z0_mu_logvar, z0, zK, logdet, x_out, v_out = outs
        # mutable cell: the FlowParamsLoss train-mode inverse chains further
        # batch_stats updates off the forward's (reference semantics)
        aux_batch_stats_ref = {"bs": mutated["batch_stats"]}

        recons = _recons_loss(x_out, x_in, train_config.normalize_losses)
        lat = _latent_loss(model_config, train_config, z0_mu_logvar, z0, zK, logdet)

        flow_in_reg = jnp.asarray(0.0, dtype=recons.dtype)
        if dkl_flow_reg:  # train.py:235-239
            flow_in_reg = 0.1 * train_config.beta * criteria["flow_input_dkl"](
                z0_mu_logvar[:, 0, :], z0_mu_logvar[:, 1, :]
            )

        if forward_controls:
            cont = criteria["controls"](v_out, v_in)
        else:
            # FlowParamsLoss (reference: loss.py:318-346): pull the target
            # preset back through reg flow then latent flow; score under
            # q(z0).
            #
            # flow_loss_bn_mode selects the inverse-pass BN semantics:
            #  - "train" (reference parity): conditioner BN uses batch
            #    statistics, dropout is active, and the flows' running
            #    stats update a second time after the forward pass —
            #    exactly what the reference's train-mode nflows inverse
            #    does. The mutations chain off the forward's batch_stats.
            #  - "eval": running statistics, no dropout. The flows are only
            #    strictly invertible in this mode (VAE.py:122 note).
            # The measured comparison behind the default is documented in
            # PARITY.md.
            if flow_loss_train_bn:
                vars1 = {"params": params,
                         "batch_stats": aux_batch_stats_ref["bs"]}
                cont, new_bs = _flow_controls_loss(
                    model, vars1, v_in, z0_mu_logvar, train_mode=True,
                    rng_pair=jax.random.split(jax.random.fold_in(k_drop, 1)),
                )
                aux_batch_stats_ref["bs"] = new_bs
            else:
                cont, _ = _flow_controls_loss(
                    model, variables, v_in, z0_mu_logvar, train_mode=False,
                )

        aux = {
            "outs": outs,
            "batch_stats": aux_batch_stats_ref["bs"],
            "recons": recons,
            "lat": lat,
            "flow_in_reg": flow_in_reg,
            "cont": cont,
        }
        return recons + lat * beta + flow_in_reg + cont, aux

    def train_step(state: TrainState, x_in, v_in, sample_info, rng_key, beta):
        rng_key = jax.random.fold_in(rng_key, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, aux), grads = grad_fn(
            state.params, state.batch_stats, x_in, v_in, sample_info, rng_key, beta
        )
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt_state,
        )
        metrics = _metrics_from_aux(
            aux, x_in, v_in, criteria, train_config, total=total
        )
        return new_state, metrics

    return train_step


def _metrics_from_aux(aux, x_in, v_in, criteria, train_config, total=None):
    """Monitoring scalars (reference: train.py:229-233, 131-152), plus the
    z0 stats the LatentMetric consumes host-side (train.py:213)."""
    z0_mu_logvar, z0, zK, logdet, x_out, v_out = [
        jax.lax.stop_gradient(o) for o in aux["outs"]
    ]
    m = {
        "ReconsLoss/Backprop": aux["recons"],
        "LatLoss": aux["lat"],
        "Controls/BackpropLoss": aux["cont"],
        "FlowInputReg": aux["flow_in_reg"],
        "ReconsLoss/MSE": (
            aux["recons"]
            if train_config.normalize_losses
            else jnp.mean(jnp.square(x_out - x_in))
        ),
        "Controls/QLoss": criteria["qloss"](v_out, v_in),
        "Controls/Accuracy": criteria["accuracy"](v_out, v_in),
        # latents nested so the host can skip fetching these (B, dim_z)
        # arrays when it only needs scalars (device->host bandwidth is the
        # scarce resource on tunneled accelerators)
        "latents": {"z0_mu": z0_mu_logvar[:, 0, :], "z0": z0, "zK": zK},
    }
    if total is not None:
        m["TotalLoss"] = jax.lax.stop_gradient(total)
    return m


def make_eval_step(
    model,
    model_config: ModelConfig,
    train_config: TrainConfig,
    idx_helper: PresetIndexesHelper,
    return_outputs: bool = False,
):
    """Validation / inference step (reference: train.py:261-293): eval-mode
    forward (z0 = mu, running BN stats), same losses and monitors, no grads.
    ``return_outputs`` additionally returns (x_out, v_out) for figures and
    the eval pipeline."""
    criteria = build_criteria(model_config, train_config, idx_helper)
    forward_controls = model_config.forward_controls_loss

    def eval_step(state: TrainState, x_in, v_in, sample_info):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outs = model.apply(
            variables, x_in, sample_info, train=False, method=model.forward_full
        )
        z0_mu_logvar, z0, zK, logdet, x_out, v_out = outs
        recons = _recons_loss(x_out, x_in, train_config.normalize_losses)
        lat = _latent_loss(model_config, train_config, z0_mu_logvar, z0, zK, logdet)
        if forward_controls:
            cont = criteria["controls"](v_out, v_in)
        else:
            cont, _ = _flow_controls_loss(
                model, variables, v_in, z0_mu_logvar, train_mode=False,
            )
        aux = {
            "outs": outs,
            "recons": recons,
            "lat": lat,
            "flow_in_reg": jnp.asarray(0.0),
            "cont": cont,
        }
        metrics = _metrics_from_aux(aux, x_in, v_in, criteria, train_config)
        if return_outputs:
            metrics["x_out"] = x_out
            metrics["v_out"] = v_out
        return metrics

    return eval_step
