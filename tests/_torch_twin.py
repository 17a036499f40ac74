"""Torch twin of the flax model zoo, built by WEIGHT TRANSPLANT from a flax
variables dict — the vehicle for the end-to-end numerical parity proof.

The north star requires the models to match "the PyTorch reference within
numerical tolerance". The reference implementation itself cannot run here
(its nflows/librenderman deps are absent), so this module re-creates the
reference's architecture *in torch, from the reference's documented
semantics* (model/VAE.py:137-181, model/encoder.py:233-259,
model/decoder.py:108-140, model/flows.py:42-90, model/regression.py:20-189,
model/loss.py:15-346) and loads OUR trained/initialized parameters into it.
``tests/test_torch_parity.py`` then pins the two frameworks' full forwards
and every loss term against each other.

Every torch parameter records its flax path + transform in
``TorchTwin.param_map`` so gradients can be compared leaf-by-leaf.

This file is test infrastructure: torch-CPU only, never imported by the
package.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn as tnn

from preset_gen_vae_tpu.models.decoder import decoder_tconv_specs
from preset_gen_vae_tpu.models.encoder import encoder_conv_specs
from preset_gen_vae_tpu.models.flows import checkerboard_mask, parse_flow_arch

_LOG_2_PI = float(np.log(2.0 * np.pi))


def _t(a) -> torch.Tensor:
    return torch.tensor(np.asarray(a, dtype=np.float32))


class _Transplant:
    """Records (torch module param -> flax path, transform) while loading."""

    def __init__(self):
        self.map: List[Tuple[str, Tuple[str, ...], str]] = []

    def linear(self, lin: tnn.Linear, sub: Dict, path):
        # flax Dense kernel (in, out) -> torch Linear weight (out, in)
        with torch.no_grad():
            lin.weight.copy_(_t(sub["kernel"]).T)
            lin.bias.copy_(_t(sub["bias"]))
        self.map.append((id(lin.weight), path + ("kernel",), "dense_T"))
        self.map.append((id(lin.bias), path + ("bias",), "direct"))

    def conv(self, conv: tnn.Conv2d, sub: Dict, path):
        # flax Conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
        with torch.no_grad():
            conv.weight.copy_(_t(np.transpose(sub["kernel"], (3, 2, 0, 1))))
            conv.bias.copy_(_t(sub["bias"]))
        self.map.append((id(conv.weight), path + ("kernel",), "conv_OIHW"))
        self.map.append((id(conv.bias), path + ("bias",), "direct"))

    def tconv(self, tconv: tnn.ConvTranspose2d, sub: Dict, path):
        # flax TorchConvTranspose2d kernel (kh, kw, in, out) -> torch
        # ConvTranspose2d weight (in, out, kh, kw) — the proven mapping from
        # tests/test_models.py::test_tconv_matches_torch_geometry_and_values
        with torch.no_grad():
            tconv.weight.copy_(_t(np.transpose(sub["kernel"], (2, 3, 0, 1))))
            tconv.bias.copy_(_t(sub["bias"]))
        self.map.append((id(tconv.weight), path + ("kernel",), "tconv_IOHW"))
        self.map.append((id(tconv.bias), path + ("bias",), "direct"))

    def bn(self, bn, p_sub: Dict, s_sub: Dict, path):
        with torch.no_grad():
            bn.weight.copy_(_t(p_sub["scale"]))
            bn.bias.copy_(_t(p_sub["bias"]))
            bn.running_mean.copy_(_t(s_sub["mean"]))
            bn.running_var.copy_(_t(s_sub["var"]))
        self.map.append((id(bn.weight), path + ("scale",), "direct"))
        self.map.append((id(bn.bias), path + ("bias",), "direct"))

    def raw(self, param: tnn.Parameter, leaf, path):
        with torch.no_grad():
            param.copy_(_t(leaf))
        self.map.append((id(param), path, "direct"))


def _lrelu(x):
    return torch.nn.functional.leaky_relu(x, 0.1)


class ConvBlock(tnn.Module):
    """Conv2DBlock twin: conv + optional BN('after') + LeakyReLU(0.1)
    (flax: models/layers.py Conv2DBlock; reference: model/layer.py:10-26)."""

    def __init__(self, tp: _Transplant, spec, in_ch, p_sub, s_sub, path):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, spec.out_ch, spec.kernel, spec.stride,
                               spec.pad, spec.dilation)
        tp.conv(self.conv, p_sub["Conv_0"], path + ("Conv_0",))
        self.bn = None
        if spec.bn is not None:
            assert spec.bn == "after"
            self.bn = tnn.BatchNorm2d(spec.out_ch, eps=1e-5, momentum=0.1)
            tp.bn(self.bn, p_sub["BatchNorm_0"], s_sub["BatchNorm_0"],
                  path + ("BatchNorm_0",))

    def forward(self, x):
        y = _lrelu(self.conv(x))
        return self.bn(y) if self.bn is not None else y


class TConvBlock(tnn.Module):
    """TConv2DBlock twin (flax: models/layers.py; reference layer.py:29-46)."""

    def __init__(self, tp: _Transplant, spec, in_ch, p_sub, s_sub, path,
                 plain=False):
        super().__init__()
        self.tconv = tnn.ConvTranspose2d(
            in_ch, spec.out_ch, spec.kernel, spec.stride, spec.pad,
            spec.out_pad, dilation=spec.dilation,
        )
        self.plain = plain
        if plain:  # bare output tconv (no BN/act), flax names params directly
            tp.tconv(self.tconv, p_sub, path)
            self.bn = None
            return
        tp.tconv(self.tconv, p_sub["TorchConvTranspose2d_0"],
                 path + ("TorchConvTranspose2d_0",))
        self.bn = None
        if spec.bn is not None:
            self.bn = tnn.BatchNorm2d(spec.out_ch, eps=1e-5, momentum=0.1)
            tp.bn(self.bn, p_sub["BatchNorm_0"], s_sub["BatchNorm_0"],
                  path + ("BatchNorm_0",))

    def forward(self, x):
        y = self.tconv(x)
        if self.plain:
            return y
        y = _lrelu(y)
        return self.bn(y) if self.bn is not None else y


class EncoderTwin(tnn.Module):
    """speccnn8l1_bn single-channel encoder with the 4x4+1x1 feature mixers
    (flax: models/encoder.py:161-218; reference: encoder.py:23-108)."""

    def __init__(self, tp, model_c, train_c, enc_z_length, p, s):
        super().__init__()
        assert model_c.encoder_architecture == "speccnn8l1_bn"
        assert not model_c.stack_specs_deepest_features_mix, (
            "twin implements the default deepest_features_mix=False path"
        )
        specs = encoder_conv_specs("speccnn8l1_bn")[:-2]  # last 2 removed
        blocks, in_ch = [], 1
        cnn_p, cnn_s = p["single_ch_cnn"], s.get("single_ch_cnn", {})
        for i, sp in enumerate(specs):
            name = f"enc{i + 1}"
            blocks.append(ConvBlock(tp, sp, in_ch, cnn_p[name],
                                    cnn_s.get(name, {}),
                                    ("ae_model", "encoder", "single_ch_cnn",
                                     name)))
            in_ch = sp.out_ch
        self.cnn = tnn.ModuleList(blocks)
        from preset_gen_vae_tpu.models.encoder import ConvSpec  # noqa: F401

        mix7_spec = type(specs[0])(512, (4, 4), (2, 2), (2, 2), (1, 1),
                                   "after", "lrelu")
        self.mix7 = ConvBlock(tp, mix7_spec, in_ch, p["mix7"], s["mix7"],
                              ("ae_model", "encoder", "mix7"))
        mix8_spec = type(specs[0])(2048, (1, 1), (1, 1), (0, 0), (1, 1),
                                   None, "lrelu")
        self.mix8 = ConvBlock(tp, mix8_spec, 512, p["mix8"], {},
                              ("ae_model", "encoder", "mix8"))
        self.dropout = tnn.Dropout(train_c.fc_dropout)
        n_flat = int(np.asarray(p["mlp_out"]["kernel"]).shape[0])
        self.mlp_out = tnn.Linear(n_flat, 2 * enc_z_length)
        tp.linear(self.mlp_out, p["mlp_out"], ("ae_model", "encoder",
                                               "mlp_out"))
        self.out_bn = None
        if "lat_in_regularization" in p:
            self.out_bn = tnn.BatchNorm1d(2 * enc_z_length, eps=1e-5,
                                          momentum=0.1)
            tp.bn(self.out_bn, p["lat_in_regularization"],
                  s["lat_in_regularization"],
                  ("ae_model", "encoder", "lat_in_regularization"))
        self.enc_z_length = enc_z_length

    def forward(self, x):  # x: (B, 1, H, W)
        h = x
        for b in self.cnn:
            h = b(h)
        h = self.mix7(h)
        h = self.mix8(h)
        # flax flattens NHWC order (encoder.py:204): permute before flatten
        h = h.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        h = self.dropout(h)
        h = self.mlp_out(h)
        if self.out_bn is not None:
            h = self.out_bn(h)
        return h.reshape(x.shape[0], 2, self.enc_z_length)


class DecoderTwin(tnn.Module):
    """speccnn8l1_bn decoder (flax: models/decoder.py:165-208; reference:
    decoder.py:9-92)."""

    def __init__(self, tp, model_c, train_c, p, s):
        super().__init__()
        dim_z = int(np.asarray(p["mlp"]["kernel"]).shape[0])
        self.mlp = tnn.Linear(dim_z, 2048 * 3 * 4)
        tp.linear(self.mlp, p["mlp"], ("ae_model", "decoder", "mlp"))
        self.dropout = tnn.Dropout(train_c.fc_dropout)
        unmix_spec = type(decoder_tconv_specs("speccnn8l1_bn")[0])(
            512, (1, 1), (1, 1), (0, 0), (0, 0), (1, 1), "after", "lrelu"
        )
        self.unmix1 = TConvBlock(tp, unmix_spec, 2048, p["unmix1"],
                                 s["unmix1"], ("ae_model", "decoder",
                                               "unmix1"))
        specs = decoder_tconv_specs("speccnn8l1_bn")
        blocks, in_ch = [], 512
        cnn_p, cnn_s = p["single_ch_cnn"], s.get("single_ch_cnn", {})
        for i, sp in enumerate(specs):
            name = f"dec{i + 1}"
            blocks.append(TConvBlock(
                tp, sp, in_ch, cnn_p[name], cnn_s.get(name, {}),
                ("ae_model", "decoder", "single_ch_cnn", name),
                plain=(sp.act == "none"),
            ))
            in_ch = sp.out_ch
        self.cnn = tnn.ModuleList(blocks)

    def forward(self, z):
        h = self.dropout(self.mlp(z))
        # flax reshapes flat -> (B, 3, 4, 2048) NHWC (decoder.py:190)
        h = h.reshape(-1, 3, 4, 2048).permute(0, 3, 1, 2)
        h = self.unmix1(h)
        for b in self.cnn:
            h = b(h)
        return torch.clamp(h, -1.0, 1.0)  # Hardtanh (decoder.py:160-161)


class ResidualMLPTwin(tnn.Module):
    """flax ResidualMLP twin (models/flows.py:45-74): Dense-in, 2 two-layer
    residual blocks with BN before each ReLU, Dense-out."""

    def __init__(self, tp, p, s, path, dropout_p=0.0, use_bn=True,
                 num_blocks=2):
        super().__init__()
        in_f = int(np.asarray(p["initial"]["kernel"]).shape[0])
        hidden = int(np.asarray(p["initial"]["kernel"]).shape[1])
        out_f = int(np.asarray(p["final"]["kernel"]).shape[1])
        self.initial = tnn.Linear(in_f, hidden)
        tp.linear(self.initial, p["initial"], path + ("initial",))
        self.blocks = tnn.ModuleList()
        self.use_bn = use_bn
        self.dropout = tnn.Dropout(dropout_p)
        for b in range(num_blocks):
            mod = tnn.ModuleDict()
            if use_bn:
                for half in (0, 1):
                    bn = tnn.BatchNorm1d(hidden, eps=1e-5, momentum=0.1)
                    tp.bn(bn, p[f"bn{b}_{half}"], s[f"bn{b}_{half}"],
                          path + (f"bn{b}_{half}",))
                    mod[f"bn{half}"] = bn
            for half in (0, 1):
                fc = tnn.Linear(hidden, hidden)
                tp.linear(fc, p[f"fc{b}_{half}"], path + (f"fc{b}_{half}",))
                mod[f"fc{half}"] = fc
            self.blocks.append(mod)
        self.final = tnn.Linear(hidden, out_f)
        tp.linear(self.final, p["final"], path + ("final",))

    def forward(self, x):
        h = self.initial(x)
        for mod in self.blocks:
            res = h
            if self.use_bn:
                res = mod["bn0"](res)
            res = torch.relu(res)
            res = mod["fc0"](res)
            if self.use_bn:
                res = mod["bn1"](res)
            res = torch.relu(res)
            res = self.dropout(res)
            res = mod["fc1"](res)
            h = h + res
        return self.final(h)


class CouplingTwin(tnn.Module):
    """AffineCouplingLayer twin (flax: models/flows.py:77-128; reference
    coupling rules: flows.py:63-88)."""

    def __init__(self, tp, features, even_transformed, p, s, path,
                 dropout_p=0.0):
        super().__init__()
        mask = checkerboard_mask(features, even_transformed)
        self.register_buffer("idx_tr",
                             torch.from_numpy(np.where(mask)[0].copy()))
        self.register_buffer("idx_id",
                             torch.from_numpy(np.where(~mask)[0].copy()))
        self.features = features
        self.conditioner = ResidualMLPTwin(
            tp, p["conditioner"], s.get("conditioner", {}),
            path + ("conditioner",), dropout_p=dropout_p, use_bn=True,
        )

    def _params(self, x_id):
        raw = self.conditioner(x_id)
        raw_s, t = raw.chunk(2, dim=-1)
        s = torch.sigmoid(raw_s + 2.0) + 1e-3
        return s, t

    def _scatter(self, x_id, x_tr):
        out = x_id.new_zeros((x_id.shape[0], self.features))
        out[:, self.idx_id] = x_id
        out[:, self.idx_tr] = x_tr
        return out

    def fwd(self, x):
        x_id, x_tr = x[:, self.idx_id], x[:, self.idx_tr]
        s, t = self._params(x_id)
        return self._scatter(x_id, x_tr * s + t), torch.log(s).sum(-1)

    def inv(self, y):
        y_id, y_tr = y[:, self.idx_id], y[:, self.idx_tr]
        s, t = self._params(y_id)
        return self._scatter(y_id, (y_tr - t) / s), -torch.log(s).sum(-1)


class BatchNormFlowTwin(tnn.Module):
    """flax BatchNormFlow twin (models/flows.py:131-170)."""

    def __init__(self, tp, p, s, path, eps=1e-5):
        super().__init__()
        n = int(np.asarray(p["log_gamma"]).shape[0])
        self.log_gamma = tnn.Parameter(torch.zeros(n))
        self.beta = tnn.Parameter(torch.zeros(n))
        tp.raw(self.log_gamma, p["log_gamma"], path + ("log_gamma",))
        tp.raw(self.beta, p["beta"], path + ("beta",))
        self.register_buffer("ra_mean", _t(s["mean"]))
        self.register_buffer("ra_var", _t(s["var"]))
        self.eps = eps

    def fwd(self, x):
        if self.training:
            mean = x.mean(0)
            var = x.var(0, unbiased=False)
        else:
            mean, var = self.ra_mean, self.ra_var
        y = (torch.exp(self.log_gamma) * (x - mean)
             * torch.rsqrt(var + self.eps) + self.beta)
        ld = (self.log_gamma - 0.5 * torch.log(var + self.eps)).sum()
        return y, ld.expand(x.shape[0])

    def inv(self, y):
        mean, var = self.ra_mean, self.ra_var
        x = ((y - self.beta) * torch.exp(-self.log_gamma)
             * torch.sqrt(var + self.eps) + mean)
        ld = -(self.log_gamma - 0.5 * torch.log(var + self.eps)).sum()
        return x, ld.expand(y.shape[0])


class FlowSequenceTwin(tnn.Module):
    """Walks a flax FlowSequence params subtree (layers_i children are
    couplings or BatchNorm flows, distinguished by their keys) and mirrors
    forward/inverse composition (flax: models/flows.py:273-294)."""

    def __init__(self, tp, features, p, s, path, dropout_p=0.0):
        super().__init__()
        names = sorted(p.keys(), key=lambda k: int(k.split("_")[1]))
        layers, n_coupling = [], 0
        for name in names:
            sub_p, sub_s = p[name], s.get(name, {})
            if "conditioner" in sub_p:
                layers.append(CouplingTwin(
                    tp, features, n_coupling % 2 == 0, sub_p, sub_s,
                    path + (name,), dropout_p=dropout_p,
                ))
                n_coupling += 1
            else:
                layers.append(BatchNormFlowTwin(tp, sub_p, sub_s,
                                                path + (name,)))
        self.layers = tnn.ModuleList(layers)

    def fwd(self, x):
        logdet = x.new_zeros(x.shape[0])
        for l in self.layers:
            x, ld = l.fwd(x)
            logdet = logdet + ld
        return x, logdet

    def inv(self, y):
        logdet = y.new_zeros(y.shape[0])
        for l in reversed(self.layers):
            y, ld = l.inv(y)
            logdet = logdet + ld
        return y, logdet


class MLPRegressionTwin(tnn.Module):
    """MLPRegression twin (flax: models/regression.py:62-89; reference:
    regression.py:61-102)."""

    def __init__(self, tp, arch, helper, train_c, p, s):
        super().__init__()
        n_layers, n_neurons = (int(v) for v in arch.split("l"))
        self.n_layers = n_layers
        self.fcs = tnn.ModuleList()
        self.bns = tnn.ModuleList()
        self.dropout = tnn.Dropout(train_c.reg_fc_dropout)
        for l in range(n_layers):
            fc = tnn.Linear(
                int(np.asarray(p[f"fc{l + 1}"]["kernel"]).shape[0]), n_neurons
            )
            tp.linear(fc, p[f"fc{l + 1}"], ("reg_model", f"fc{l + 1}"))
            self.fcs.append(fc)
            if l < n_layers - 1:
                bn = tnn.BatchNorm1d(n_neurons, eps=1e-5, momentum=0.1)
                tp.bn(bn, p[f"bn{l + 1}"], s[f"bn{l + 1}"],
                      ("reg_model", f"bn{l + 1}"))
                self.bns.append(bn)
        out = tnn.Linear(n_neurons, helper.learnable_preset_size)
        tp.linear(out, p[f"fc{n_layers + 1}"],
                  ("reg_model", f"fc{n_layers + 1}"))
        self.out = out
        self.helper = helper

    def forward(self, z):
        h = z
        for l, fc in enumerate(self.fcs):
            h = fc(h)
            if l < self.n_layers - 1:
                h = self.bns[l](h)
                h = self.dropout(h)
            h = torch.relu(h)
        return self.out(h)


def preset_activation_twin(x, helper, cat_softmax: bool):
    """(flax: models/regression.py:43-59; reference: regression.py:20-53)"""
    if not cat_softmax:
        return torch.clamp(x, 0.0, 1.0)
    num_idx = helper.num_learn_idx
    out = x.clone()
    if len(num_idx):
        out[:, num_idx] = torch.clamp(x[:, num_idx], 0.0, 1.0)
    idx_m, mask = helper.cat_group_idx_matrix, helper.cat_group_mask
    if idx_m.size:
        gathered = out[:, np.maximum(idx_m, 0)]
        gathered = torch.where(torch.from_numpy(mask)[None], gathered,
                               torch.tensor(-np.inf))
        probs = torch.softmax(gathered, dim=-1)
        out[:, idx_m[mask]] = probs[:, torch.from_numpy(mask)]
    return out


class TorchTwin(tnn.Module):
    """Full ExtendedAE twin. ``forward_full(x, eps)`` mirrors
    ExtendedAE.forward_full (flax: models/extended_ae.py:36-43; reference
    5-tuple contract: VAE.py:137-181 + regression head).

    ``eps``: explicit standard-normal draw for the reparameterization trick
    in train mode (RNGs are not portable across frameworks; the parity test
    recovers eps from the jax forward's outputs and injects it here)."""

    def __init__(self, model_c, train_c, helper, variables):
        super().__init__()
        tp = _Transplant()
        p = variables["params"]
        s = variables.get("batch_stats", {})
        enc_z = (model_c.dim_z - 2 if model_c.concat_midi_to_z
                 else model_c.dim_z)
        assert not model_c.concat_midi_to_z, "twin: single-note configs only"
        self.encoder = EncoderTwin(tp, model_c, train_c, enc_z,
                                   p["ae_model"]["encoder"],
                                   s["ae_model"]["encoder"])
        self.decoder = DecoderTwin(tp, model_c, train_c,
                                   p["ae_model"]["decoder"],
                                   s["ae_model"]["decoder"])
        self.dim_z = model_c.dim_z
        self.has_latent_flow = model_c.latent_flow_arch is not None
        if self.has_latent_flow:
            self.lat_flow = FlowSequenceTwin(
                tp, model_c.dim_z, p["ae_model"]["flow"]["flow"],
                s.get("ae_model", {}).get("flow", {}).get("flow", {}),
                ("ae_model", "flow", "flow"), dropout_p=0.0,
            )
        arch = model_c.params_regression_architecture
        self.is_flow_reg = arch.startswith("flow_")
        self.cat_softmax_act = model_c.params_reg_softmax
        if self.is_flow_reg:
            self.reg_flow = FlowSequenceTwin(
                tp, model_c.dim_z, p["reg_model"]["flow"]["flow"],
                s.get("reg_model", {}).get("flow", {}).get("flow", {}),
                ("reg_model", "flow", "flow"),
                dropout_p=train_c.reg_fc_dropout,
            )
            self.fast_forward_flow = model_c.forward_controls_loss
        else:
            self.reg_mlp = MLPRegressionTwin(
                tp, arch.replace("mlp_", ""), helper, train_c,
                p["reg_model"], s.get("reg_model", {}),
            )
        self.helper = helper
        self.param_map = tp.map

    # ---- forward (reference: VAE.py:137-181 + extendedAE/regression) ----
    def forward_full(self, x, eps=None):
        z_mu_logvar = self.encoder(x)
        mu = z_mu_logvar[:, 0, :]
        if self.training:
            assert eps is not None, "train mode needs an explicit eps draw"
            sigma = torch.exp(z_mu_logvar[:, 1, :] / 2.0)
            z0 = mu + sigma * eps
        else:
            z0 = mu
        if self.has_latent_flow:
            zK, logdet = self.lat_flow.fwd(z0)
        else:
            zK, logdet = z0, z0.new_zeros(z0.shape[0])
        x_out = self.decoder(zK)
        if self.is_flow_reg:
            v_raw, _ = (self.reg_flow.fwd(zK) if self.fast_forward_flow
                        else self.reg_flow.inv(zK))
            v_out = preset_activation_twin(v_raw, self.helper,
                                           self.cat_softmax_act)
        else:
            v_out = preset_activation_twin(self.reg_mlp(zK), self.helper,
                                           self.cat_softmax_act)
        return z_mu_logvar, z0, zK, logdet, x_out, v_out

    def latent_flow_inverse(self, zK):
        return self.lat_flow.inv(zK)

    def regression_flow_inverse(self, v):
        return (self.reg_flow.inv(v) if self.fast_forward_flow
                else self.reg_flow.fwd(v))

    def grad_pairs(self, jax_grads) -> List[Tuple[str, np.ndarray, np.ndarray]]:
        """[(path, torch_grad, jax_grad_transformed)] for every parameter —
        the leaf-by-leaf gradient comparison for the parity test."""
        by_id = {pid: (path, tf) for pid, path, tf in self.param_map}
        out = []
        for name, param in self.named_parameters():
            path, tf = by_id[id(param)]
            leaf = jax_grads
            for k in path:
                leaf = leaf[k]
            g = np.asarray(leaf, dtype=np.float32)
            if tf == "dense_T":
                g = g.T
            elif tf == "conv_OIHW":
                g = np.transpose(g, (3, 2, 0, 1))
            elif tf == "tconv_IOHW":
                g = np.transpose(g, (2, 3, 0, 1))
            tg = (param.grad.detach().numpy() if param.grad is not None
                  else np.zeros_like(g))
            out.append(("/".join(path), tg, g))
        return out


# ---------------------------------------------------------------------------
# Loss twins (reference: model/loss.py, model/VAE.py:183-193, train wiring
# train.py:222-248) — formulas mirrored in torch, index tables shared.
# ---------------------------------------------------------------------------


def gaussian_logp(samples, mu, log_var):
    return -0.5 * (samples.shape[1] * _LOG_2_PI
                   + (log_var + (samples - mu) ** 2
                      / torch.exp(log_var)).sum(1))


def standard_gaussian_logp(samples):
    return -0.5 * (samples.shape[1] * _LOG_2_PI + (samples ** 2).sum(1))


def recons_loss_twin(x_out, x_in, normalize=True):
    if normalize:
        return torch.mean((x_out - x_in) ** 2)
    return ((x_out - x_in) ** 2).sum() / x_in.shape[0]


def latent_loss_twin(z_mu_logvar, z0, zK, logdet, has_flow, normalize=True):
    """Flow-ELBO (VAE.py:183-193) or Dkl (VAE.py:63-66)."""
    mu, logvar = z_mu_logvar[:, 0, :], z_mu_logvar[:, 1, :]
    if has_flow:
        loss = -(standard_gaussian_logp(zK) - gaussian_logp(z0, mu, logvar)
                 + logdet).mean()
    else:
        loss = 0.5 * (torch.exp(logvar) + mu ** 2 - logvar - 1.0).sum() \
            / mu.shape[0]
    return loss / mu.shape[1] if normalize else loss


def synth_params_loss_twin(v_out, v_in, helper, normalize=True,
                           cat_softmax=True, cat_softmax_t=0.2,
                           cat_loss_factor=0.2):
    """SynthParamsLoss twin (reference: model/loss.py:73-183; flax:
    losses/synth_params.py:36-112). Index tables + useless masks come from
    the shared helper (integer bookkeeping); all float math is torch."""
    num_useless_np, cat_useless_np = helper.useless_masks_batch(
        v_in.detach().numpy()
    )
    num_useless = torch.from_numpy(num_useless_np)
    cat_useless = torch.from_numpy(cat_useless_np)
    B = v_in.shape[0]
    num_idx = helper.num_learn_idx
    num_loss = v_in.new_zeros(())
    if len(num_idx):
        err = v_out[:, num_idx] - v_in[:, num_idx]
        useful = 1.0 - num_useless[:, num_idx].float()
        sq = (err * useful) ** 2
        num_loss = sq.mean() if normalize else sq.sum() / B
    G = helper.n_cat_groups
    cat_loss = v_in.new_zeros(())
    if G > 0:
        idx_m, pad = helper.cat_group_idx_matrix, helper.cat_group_mask
        pad_t = torch.from_numpy(pad)
        q = v_out[:, np.maximum(idx_m, 0)]
        t = v_in[:, np.maximum(idx_m, 0)]
        useful = 1.0 - cat_useless[:, :G].float()
        n_useful = useful.sum(0).clamp(min=1.0)
        if cat_softmax:
            logits = torch.where(pad_t[None], q / cat_softmax_t,
                                 torch.tensor(-np.inf))
            q = torch.softmax(logits, dim=-1)
        q_sel = (q * t * pad_t[None].float()).sum(-1)
        per_group = -(torch.log(q_sel.clamp(min=1e-38)) * useful).sum(0) \
            / n_useful
        cat_loss = per_group.sum()
        if normalize:
            cat_loss = cat_loss / G
    return num_loss + cat_loss * cat_loss_factor


def flow_params_loss_twin(twin: TorchTwin, v_in, z_mu_logvar,
                          pullback_clip=1e4, floor=-1e8):
    """FlowParamsLoss twin, eval-BN mode (reference: loss.py:318-346; flax:
    training/train_step.py:_flow_controls_loss train_mode=False, including
    its documented clip/floor overflow guard)."""
    zK_t, logdet_U = twin.regression_flow_inverse(v_in)
    zK_t = torch.clamp(zK_t, -pullback_clip, pullback_clip)
    z0_t, logdet_T = twin.latent_flow_inverse(zK_t)
    z0_t = torch.clamp(z0_t, -pullback_clip, pullback_clip)
    logp = gaussian_logp(z0_t, z_mu_logvar[:, 0, :], z_mu_logvar[:, 1, :])
    per_item = torch.clamp(logp + logdet_T + logdet_U, min=floor)
    return -per_item.mean() / 1000.0


def flow_input_dkl_twin(z_mu_logvar, beta_final, normalize=True):
    """0.1 * beta * Dkl flow-input regularizer (train.py:235-239)."""
    mu, logvar = z_mu_logvar[:, 0, :], z_mu_logvar[:, 1, :]
    dkl = 0.5 * (torch.exp(logvar) + mu ** 2 - logvar - 1.0).sum() \
        / mu.shape[0]
    if normalize:
        dkl = dkl / mu.shape[1]
    return 0.1 * beta_final * dkl
