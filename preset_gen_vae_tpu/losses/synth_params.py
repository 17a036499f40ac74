"""Synth-parameter losses and monitoring criteria, fully vectorized.

Replaces the reference's per-row / per-group Python loops
(reference: model/loss.py:73-346) with precomputed index matrices and masked
reductions — the whole loss jit-compiles into the train step. The reference
explicitly flags these loops as a CPU hot spot (SynthParamsLoss per-row
useless-param search, loss.py:120-177).

Numerical parity notes (vs reference semantics):
  - useless (zero-volume Dexed operator) numerical params contribute 0 error
    but still count in the normalizing denominator — the reference zeroes
    both tensors then takes the mean (loss.py:129-136);
  - useless categorical rows are *excluded* per group, shrinking that
    group's denominator (loss.py:141-172);
  - quantized-numerical loss pre-allocates a (B, P) matrix and reduces over
    all of it even with a limited param subset (loss.py:222-261);
  - categorical accuracy averages per-parameter accuracies (loss.py:307-315).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preset import PresetIndexesHelper


def _gather_groups(x, idx_matrix):
    """(B, L) -> (B, G, C) gather of padded categorical groups."""
    return x[:, np.maximum(idx_matrix, 0)]


class SynthParamsLoss:
    """Hybrid numerical MSE + categorical CE loss with useless-param masking
    (reference: model/loss.py:73-183)."""

    def __init__(
        self,
        idx_helper: PresetIndexesHelper,
        normalize_losses: bool,
        categorical_loss_factor: float = 0.2,
        prevent_useless_params_loss: bool = True,
        cat_bce: bool = True,
        cat_softmax: bool = False,
        cat_softmax_t: float = 0.1,
    ):
        if cat_bce and cat_softmax:
            raise ValueError("cat_bce and cat_softmax cannot both be True")
        self.h = idx_helper
        self.normalize_losses = normalize_losses
        self.cat_loss_factor = categorical_loss_factor
        self.prevent_useless = prevent_useless_params_loss
        self.cat_bce = cat_bce
        self.cat_softmax = cat_softmax
        self.cat_softmax_t = cat_softmax_t
        self.num_idx = idx_helper.num_learn_idx  # (Ln,)
        self.G = idx_helper.n_cat_groups

    def __call__(self, v_out: jnp.ndarray, v_in: jnp.ndarray) -> jnp.ndarray:
        h = self.h
        B = v_in.shape[0]
        if self.prevent_useless:
            num_useless, cat_useless = h.useless_masks_batch(v_in)  # (B,L), (B,G)
        else:
            num_useless = jnp.zeros_like(v_in, dtype=bool)
            cat_useless = jnp.zeros((B, max(self.G, 1)), dtype=bool)

        # ---- numerical part (loss.py:127-136)
        num_loss = jnp.asarray(0.0, dtype=v_in.dtype)
        if len(self.num_idx) > 0:
            err = (v_out[:, self.num_idx] - v_in[:, self.num_idx])
            useful = 1.0 - num_useless[:, self.num_idx].astype(err.dtype)
            sq = jnp.square(err * useful)
            if self.normalize_losses:
                num_loss = jnp.mean(sq)  # zeroed entries stay in denominator
            else:
                num_loss = jnp.sum(sq) / B

        # ---- categorical part (loss.py:137-181)
        cat_loss = jnp.asarray(0.0, dtype=v_in.dtype)
        if self.G > 0:
            idx_m, pad = h.cat_group_idx_matrix, h.cat_group_mask
            q = _gather_groups(v_out, idx_m)  # (B, G, C)
            t = _gather_groups(v_in, idx_m)  # one-hot targets
            useful = 1.0 - cat_useless[:, : self.G].astype(q.dtype)  # (B, G)
            n_useful = jnp.maximum(jnp.sum(useful, axis=0), 1.0)  # (G,)
            if not self.cat_bce:  # ---- categorical cross-entropy
                if self.cat_softmax:
                    logits = jnp.where(pad[None], q / self.cat_softmax_t, -jnp.inf)
                    q = jax.nn.softmax(logits, axis=-1)
                # select the single target-class probability per group
                q_sel = jnp.sum(q * t * pad[None].astype(q.dtype), axis=-1)
                per_group = -jnp.sum(
                    jnp.log(jnp.maximum(q_sel, 1e-38)) * useful, axis=0
                ) / n_useful
            else:  # ---- binary cross-entropy, /8 factor (loss.py:173-175)
                qc = jnp.clip(q, 1e-7, 1.0 - 1e-7)
                bce = -(t * jnp.log(qc) + (1.0 - t) * jnp.log(1.0 - qc))
                bce = bce * pad[None].astype(q.dtype)
                cards = h.cat_group_card.astype(np.float32)  # (G,)
                # mean over useful rows x group width, then /8
                per_group = (
                    jnp.sum(bce * useful[:, :, None], axis=(0, 2))
                    / (n_useful * cards)
                ) / 8.0
            cat_loss = jnp.sum(per_group)
            if self.normalize_losses:  # (loss.py:180-181)
                cat_loss = cat_loss / self.G
        return num_loss + cat_loss * self.cat_loss_factor


class QuantizedNumericalParamsLoss:
    """Quantized numerical-params loss — monitoring only, non-differentiable
    (reference: model/loss.py:187-261)."""

    def __init__(
        self,
        idx_helper: PresetIndexesHelper,
        loss: str = "mse",  # 'mse' | 'mae'
        limited_vst_params_indexes: Optional[Sequence[int]] = None,
    ):
        h = idx_helper
        self.loss = loss
        # numerical VST params learned as numerical (ordered by vst idx)
        nn_pairs = sorted(h.num_idx_learned_as_num.items())
        self.nn_learn_idx = np.array([li for _, li in nn_pairs], dtype=np.int64)
        self.nn_card = np.array(
            [h.spec.cardinalities[v] for v, _ in nn_pairs], dtype=np.int64
        )
        nn_vst = np.array([v for v, _ in nn_pairs], dtype=np.int64)
        # numerical VST params learned as categorical -> their group ids
        vst_to_group = {int(v): g for g, v in enumerate(h.cat_group_vst_idx)}
        nc_vst = sorted(h.num_idx_learned_as_cat.keys())
        self.nc_groups = np.array([vst_to_group[v] for v in nc_vst], dtype=np.int64)
        self.nc_card = h.cat_group_card[self.nc_groups] if len(nc_vst) else np.zeros(
            (0,), dtype=np.int64
        )
        self.h = h
        self.num_params_count = len(nn_pairs) + len(nc_vst)
        # limited-subset column masks (loss.py:226-247)
        if limited_vst_params_indexes is not None:
            lim = set(int(i) for i in limited_vst_params_indexes)
            self.nn_include = np.array([v in lim for v in nn_vst], dtype=bool)
            self.nc_include = np.array([v in lim for v in nc_vst], dtype=bool)
        else:
            self.nn_include = np.ones((len(nn_pairs),), dtype=bool)
            self.nc_include = np.ones((len(nc_vst),), dtype=bool)

    def __call__(self, v_out: jnp.ndarray, v_in: jnp.ndarray) -> jnp.ndarray:
        h = self.h
        errs = []
        if len(self.nn_learn_idx) > 0:
            u_in = v_in[:, self.nn_learn_idx]
            u_out = v_out[:, self.nn_learn_idx]
            card = self.nn_card[None, :].astype(v_out.dtype)
            quantize = (self.nn_card > 0)[None, :]
            u_out_q = jnp.where(
                quantize,
                jnp.rint(u_out * (card - 1.0)) / jnp.maximum(card - 1.0, 1.0),
                u_out,
            )
            err = (u_out_q - u_in) * self.nn_include[None, :].astype(v_out.dtype)
            errs.append(err)
        if len(self.nc_groups) > 0:
            idx_m = h.cat_group_idx_matrix[self.nc_groups]
            pad = h.cat_group_mask[self.nc_groups]
            gi = _gather_groups(v_in, idx_m)
            go = _gather_groups(v_out, idx_m)
            neg = jnp.asarray(-jnp.inf, dtype=v_in.dtype)
            in_cls = jnp.argmax(jnp.where(pad[None], gi, neg), axis=-1)
            out_cls = jnp.argmax(jnp.where(pad[None], go, neg), axis=-1)
            denom = jnp.maximum(self.nc_card[None, :].astype(v_in.dtype) - 1.0, 1.0)
            err = (out_cls - in_cls).astype(v_in.dtype) / denom
            errs.append(err * self.nc_include[None, :].astype(v_in.dtype))
        if not errs:
            return jnp.asarray(0.0)
        err = jnp.concatenate(errs, axis=1)  # (B, P)
        if self.loss == "mse":
            return jnp.mean(jnp.square(err))
        return jnp.mean(jnp.abs(err))

    def per_item(self, v_out: jnp.ndarray, v_in: jnp.ndarray) -> jnp.ndarray:
        """(B,) per-item loss — used by the eval pipeline's dataframe
        (reference computes these with minibatch=1, eval.py:161-176)."""
        saved = self.loss
        errs = []
        if len(self.nn_learn_idx) > 0:
            u_in = v_in[:, self.nn_learn_idx]
            u_out = v_out[:, self.nn_learn_idx]
            card = self.nn_card[None, :].astype(v_out.dtype)
            quantize = (self.nn_card > 0)[None, :]
            u_out_q = jnp.where(
                quantize,
                jnp.rint(u_out * (card - 1.0)) / jnp.maximum(card - 1.0, 1.0),
                u_out,
            )
            errs.append((u_out_q - u_in) * self.nn_include[None, :].astype(v_out.dtype))
        if len(self.nc_groups) > 0:
            h = self.h
            idx_m = h.cat_group_idx_matrix[self.nc_groups]
            pad = h.cat_group_mask[self.nc_groups]
            gi, go = _gather_groups(v_in, idx_m), _gather_groups(v_out, idx_m)
            neg = jnp.asarray(-jnp.inf, dtype=v_in.dtype)
            in_cls = jnp.argmax(jnp.where(pad[None], gi, neg), axis=-1)
            out_cls = jnp.argmax(jnp.where(pad[None], go, neg), axis=-1)
            denom = jnp.maximum(self.nc_card[None, :].astype(v_in.dtype) - 1.0, 1.0)
            errs.append(
                (out_cls - in_cls).astype(v_in.dtype) / denom
                * self.nc_include[None, :].astype(v_in.dtype)
            )
        err = jnp.concatenate(errs, axis=1)
        if saved == "mse":
            return jnp.mean(jnp.square(err), axis=1)
        return jnp.mean(jnp.abs(err), axis=1)


class CategoricalParamsAccuracy:
    """Categorical params accuracy, averaged over params
    (reference: model/loss.py:265-315)."""

    def __init__(
        self,
        idx_helper: PresetIndexesHelper,
        reduce: bool = True,
        percentage_output: bool = True,
        limited_vst_params_indexes: Optional[Sequence[int]] = None,
    ):
        h = idx_helper
        self.h = h
        self.reduce = reduce
        self.percentage_output = percentage_output
        lim = (
            set(int(i) for i in limited_vst_params_indexes)
            if limited_vst_params_indexes is not None
            else None
        )
        # categorical VST learned as numerical
        cn_pairs = sorted(h.cat_idx_learned_as_num.items())
        if lim is not None:
            cn_pairs = [(v, li) for v, li in cn_pairs if v in lim]
        self.cn_vst = np.array([v for v, _ in cn_pairs], dtype=np.int64)
        self.cn_learn_idx = np.array([li for _, li in cn_pairs], dtype=np.int64)
        self.cn_card = np.array(
            [h.spec.cardinalities[v] for v, _ in cn_pairs], dtype=np.int64
        )
        # categorical VST learned as categorical -> group ids
        vst_to_group = {int(v): g for g, v in enumerate(h.cat_group_vst_idx)}
        cc_vst = sorted(h.cat_idx_learned_as_cat.keys())
        if lim is not None:
            cc_vst = [v for v in cc_vst if v in lim]
        self.cc_vst = np.array(cc_vst, dtype=np.int64)
        self.cc_groups = np.array([vst_to_group[v] for v in cc_vst], dtype=np.int64)

    def _per_param_accuracies(self, v_out, v_in):
        h = self.h
        accs = []
        if len(self.cn_learn_idx) > 0:
            card = self.cn_card[None, :].astype(v_in.dtype)
            t_cls = jnp.rint(v_in[:, self.cn_learn_idx] * (card - 1.0)).astype(jnp.int32)
            o_cls = jnp.rint(v_out[:, self.cn_learn_idx] * (card - 1.0)).astype(jnp.int32)
            accs.append(jnp.mean((t_cls == o_cls).astype(jnp.float32), axis=0))
        if len(self.cc_groups) > 0:
            idx_m = h.cat_group_idx_matrix[self.cc_groups]
            pad = h.cat_group_mask[self.cc_groups]
            neg = jnp.asarray(-jnp.inf, dtype=v_in.dtype)
            t_cls = jnp.argmax(jnp.where(pad[None], _gather_groups(v_in, idx_m), neg), axis=-1)
            o_cls = jnp.argmax(jnp.where(pad[None], _gather_groups(v_out, idx_m), neg), axis=-1)
            accs.append(jnp.mean((t_cls == o_cls).astype(jnp.float32), axis=0))
        if not accs:
            return jnp.zeros((0,))
        return jnp.concatenate(accs)

    def per_item(self, v_out, v_in) -> jnp.ndarray:
        """(B,) per-item accuracy over all categorical params."""
        h = self.h
        oks = []
        if len(self.cn_learn_idx) > 0:
            card = self.cn_card[None, :].astype(v_in.dtype)
            t = jnp.rint(v_in[:, self.cn_learn_idx] * (card - 1.0)).astype(jnp.int32)
            o = jnp.rint(v_out[:, self.cn_learn_idx] * (card - 1.0)).astype(jnp.int32)
            oks.append((t == o).astype(jnp.float32))
        if len(self.cc_groups) > 0:
            idx_m = h.cat_group_idx_matrix[self.cc_groups]
            pad = h.cat_group_mask[self.cc_groups]
            neg = jnp.asarray(-jnp.inf, dtype=v_in.dtype)
            t = jnp.argmax(jnp.where(pad[None], _gather_groups(v_in, idx_m), neg), axis=-1)
            o = jnp.argmax(jnp.where(pad[None], _gather_groups(v_out, idx_m), neg), axis=-1)
            oks.append((t == o).astype(jnp.float32))
        if not oks:
            return jnp.zeros((v_in.shape[0],))
        acc = jnp.mean(jnp.concatenate(oks, axis=1), axis=1)
        return acc * 100.0 if self.percentage_output else acc

    def __call__(self, v_out, v_in):
        accs = self._per_param_accuracies(v_out, v_in)
        if self.percentage_output:
            accs = accs * 100.0
        if self.reduce:
            return jnp.mean(accs) if accs.shape[0] else jnp.asarray(0.0)
        # dict output (host-side convenience, reference: loss.py:271-272)
        vst_order = list(self.cn_vst) + list(self.cc_vst)
        return {int(v): float(a) for v, a in zip(vst_order, np.asarray(accs))}


class FlowParamsLoss:
    """Inverse-flow Dkl-style params loss (reference: model/loss.py:318-346):
    v_target is pulled back through the regression flow then the latent flow,
    and scored under the encoder's q_Z0 Gaussian.

    ``latent_flow_inverse`` / ``reg_flow_inverse`` are functions
    ``x -> (y, log|det J^-1|)`` — bind them from the model's apply methods.
    """

    def __init__(self, idx_helper, latent_flow_inverse, reg_flow_inverse):
        self.latent_flow_inverse = latent_flow_inverse
        self.reg_flow_inverse = reg_flow_inverse

    def __call__(self, z_0_mu_logvar, v_target):
        from ..ops.probability import gaussian_log_probability

        z_K, logdet_U = self.reg_flow_inverse(v_target)
        z_0, logdet_T = self.latent_flow_inverse(z_K)
        z_0_log_prob = gaussian_log_probability(
            z_0, z_0_mu_logvar[:, 0, :], z_0_mu_logvar[:, 1, :]
        )
        # reference applies an empirical 1e-3 factor (loss.py:346)
        return -jnp.mean(z_0_log_prob + logdet_T + logdet_U) / 1000.0
