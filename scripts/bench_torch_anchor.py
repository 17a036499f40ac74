"""Measured same-hardware baseline anchor (VERDICT r1 item 7).

The reference publishes no throughput numbers, and no reference GPU exists
in this environment — so bench.py's `vs_baseline` denominator was an
estimate. This script replaces guesswork with a measurement: the SAME
flagship FlVAE2 architecture (speccnn8l1_bn encoder/decoder, RealNVP-6l300
latent flow, RealNVP-6l300 regression flow, dim_z=610, 257x347 inputs),
written independently in torch (the reference's framework, reference
model/encoder.py:233-259, decoder.py:108-140, VAE.py:100-127,
regression.py:139-164), stepped on the SAME host CPU as our JAX train step
on the CPU backend. The ratio is a framework-vs-framework comparison with
identical hardware, shapes and parameter counts — no cross-hardware scaling
assumptions.

The torch model is built from our declarative spec tables
(preset_gen_vae_tpu/models/{encoder,decoder}.py), not copied from the
reference. Loss structure: recon MSE + beta*Dkl + flow logdets + param MSE
(the conv/dense FLOPs dominate; categorical-softmax loss details are
throughput-negligible).

Prints ONE JSON line with both measurements and the ratio.
Run: python scripts/bench_torch_anchor.py  [B=8 STEPS=3 via env]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Force the CPU backend BEFORE any jax backend init (same-host comparison).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("BENCH_ANCHOR_BATCH", "8"))
N_STEPS = int(os.environ.get("BENCH_ANCHOR_STEPS", "3"))
DIM_Z = 610
H, W = 257, 347


# ---------------------------------------------------------------------------
# our JAX step on the CPU backend
# ---------------------------------------------------------------------------


def measure_jax_cpu() -> float:
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_configs
    from preset_gen_vae_tpu.models import build as mbuild
    from preset_gen_vae_tpu.training import create_train_state, make_train_step

    model_c, train_c, helper = _flagship_configs()
    # f32 on CPU: bf16 is emulated (slow) on the host backend, and the torch
    # anchor runs f32 — keep the same arithmetic on both sides
    train_c = dataclasses.replace(train_c, compute_dtype="float32")
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
    variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
    state = create_train_state(ext, variables, train_c)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1, H, W)), dtype=jnp.float32)
    v = jnp.asarray(
        helper.full_to_learnable_batch(
            rng.random((B, helper.full_preset_size)).astype(np.float32)
        )
    )
    info = jnp.asarray(np.tile(np.array([[0, 60, 85]], dtype=np.int32), (B, 1)))
    key = jax.random.PRNGKey(0)
    beta = jnp.float32(0.2)

    step = jax.jit(make_train_step(ext, model_c, train_c, helper),
                   donate_argnums=(0,))
    state, metrics = step(state, x, v, info, key, beta)  # warmup/compile
    jax.block_until_ready(metrics["TotalLoss"])
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, metrics = step(state, x, v, info, key, beta)
    jax.block_until_ready(metrics["TotalLoss"])
    return B * N_STEPS / (time.perf_counter() - t0)


# ---------------------------------------------------------------------------
# the same architecture in torch (reference framework), CPU
# ---------------------------------------------------------------------------


def build_torch_model():
    import torch
    import torch.nn as tnn

    from preset_gen_vae_tpu.models.decoder import decoder_tconv_specs
    from preset_gen_vae_tpu.models.encoder import encoder_conv_specs

    class Coupling(tnn.Module):
        """RealNVP affine coupling with a 2-block residual conditioner
        (BN inside), mirroring models/flows.py:45-129."""

        def __init__(self, features, hidden, even):
            super().__init__()
            import numpy as np

            mask = np.zeros(features, dtype=bool)
            mask[::2] = even
            mask[1::2] = not even
            self.register_buffer("idx_tr",
                                 torch.from_numpy(np.where(mask)[0]))
            self.register_buffer("idx_id",
                                 torch.from_numpy(np.where(~mask)[0]))
            n_tr, n_id = len(self.idx_tr), len(self.idx_id)
            self.initial = tnn.Linear(n_id, hidden)
            self.blocks = tnn.ModuleList([
                tnn.ModuleDict(dict(
                    bn0=tnn.BatchNorm1d(hidden), fc0=tnn.Linear(hidden, hidden),
                    bn1=tnn.BatchNorm1d(hidden), fc1=tnn.Linear(hidden, hidden),
                )) for _ in range(2)
            ])
            self.final = tnn.Linear(hidden, 2 * n_tr)
            self.features = features

        def forward(self, x):
            x_id, x_tr = x[:, self.idx_id], x[:, self.idx_tr]
            h = self.initial(x_id)
            for b in self.blocks:
                r = b["fc0"](torch.relu(b["bn0"](h)))
                r = b["fc1"](torch.relu(b["bn1"](r)))
                h = h + r
            raw = self.final(h)
            raw_s, t = raw.chunk(2, dim=-1)
            s = torch.sigmoid(raw_s + 2.0) + 1e-3
            y = x.new_zeros(x.shape)
            y[:, self.idx_id] = x_id
            y[:, self.idx_tr] = x_tr * s + t
            return y, torch.log(s).sum(-1)

    class Flagship(tnn.Module):
        def __init__(self):
            super().__init__()
            # encoder: speccnn8l1_bn minus its deepest layer + 1x1 mixer
            # (models/encoder.py:161-178, deepest_features_mix)
            specs = encoder_conv_specs("speccnn8l1_bn")[:-1]
            layers, in_ch = [], 1
            for s in specs:
                layers.append(tnn.Conv2d(in_ch, s.out_ch, s.kernel, s.stride,
                                         s.pad, s.dilation))
                if s.bn:
                    layers.append(tnn.BatchNorm2d(s.out_ch))
                layers.append(tnn.LeakyReLU(0.1))
                in_ch = s.out_ch
            layers.append(tnn.Conv2d(in_ch, 2048, 1))
            layers.append(tnn.LeakyReLU(0.1))
            self.enc_cnn = tnn.Sequential(*layers)
            with torch.no_grad():
                n_flat = self.enc_cnn(torch.zeros(1, 1, H, W)).numel()
            self.enc_fc = tnn.Sequential(
                tnn.Dropout(0.3), tnn.Linear(n_flat, 2 * DIM_Z),
                tnn.BatchNorm1d(2 * DIM_Z),  # flow-input 'bn' regularization
            )
            self.lat_flow = tnn.ModuleList(
                [Coupling(DIM_Z, 300, l % 2 == 0) for l in range(6)]
            )
            self.reg_flow = tnn.ModuleList(
                [Coupling(DIM_Z, 300, l % 2 == 0) for l in range(6)]
            )
            # decoder (models/decoder.py:166-209)
            self.dec_fc = tnn.Sequential(tnn.Linear(DIM_Z, 2048 * 3 * 4),
                                         tnn.Dropout(0.3))
            dspecs = decoder_tconv_specs("speccnn8l1_bn")
            dl = [tnn.ConvTranspose2d(2048, 512, 1), tnn.BatchNorm2d(512),
                  tnn.LeakyReLU(0.1)]
            in_ch = 512
            for s in dspecs:
                dl.append(tnn.ConvTranspose2d(in_ch, s.out_ch, s.kernel,
                                              s.stride, s.pad, s.out_pad))
                if s.act != "none":
                    if s.bn:
                        dl.append(tnn.BatchNorm2d(s.out_ch))
                    dl.append(tnn.LeakyReLU(0.1))
                in_ch = s.out_ch
            dl.append(tnn.Hardtanh())
            self.dec_cnn = tnn.Sequential(*dl)

        def forward(self, x):
            h = self.enc_cnn(x)
            h = self.enc_fc(h.flatten(1))
            mu, logvar = h[:, :DIM_Z], h[:, DIM_Z:]
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            logdet = z.new_zeros(z.shape[0])
            zk = z
            for c in self.lat_flow:
                zk, ld = c(zk)
                logdet = logdet + ld
            v = zk
            for c in self.reg_flow:
                v, ld = c(v)
                logdet = logdet + ld
            x_out = self.dec_cnn(
                self.dec_fc(zk).reshape(-1, 2048, 3, 4)
            )
            return x_out, mu, logvar, zk, v, logdet

    return Flagship()


def measure_torch_cpu() -> float:
    import torch

    model = build_torch_model().train()
    opt = torch.optim.Adam(model.parameters(), lr=2e-4, weight_decay=1e-4)
    x = torch.randn(B, 1, H, W)
    v_target = torch.rand(B, DIM_Z)

    def one_step():
        opt.zero_grad()
        x_out, mu, logvar, zk, v, logdet = model(x)
        dkl = -0.5 * torch.mean(1 + logvar - mu**2, )
        loss = (
            torch.nn.functional.mse_loss(x_out[:, 0], x[:, 0])
            + 0.2 * (dkl - logdet.mean() / DIM_Z)
            + torch.nn.functional.mse_loss(v, v_target)
        )
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        one_step()
    return B * N_STEPS / (time.perf_counter() - t0)


if __name__ == "__main__":
    jax_rate = measure_jax_cpu()
    torch_rate = measure_torch_cpu()
    print(json.dumps({
        "metric": "flagship_train_specs_per_sec_same_host_cpu",
        "batch": B, "steps": N_STEPS,
        "jax_cpu": round(jax_rate, 3),
        "torch_cpu": round(torch_rate, 3),
        "jax_over_torch": round(jax_rate / torch_rate, 2),
    }))
