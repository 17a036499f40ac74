"""Shape contracts for every encoder/decoder architecture in the zoo
(reference list: model/encoder.py:8-20) and a TensorBoard writer smoke
test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from preset_gen_vae_tpu.models.decoder import SpectrogramDecoder
from preset_gen_vae_tpu.models.encoder import (
    SpectrogramEncoder,
    available_architectures,
)

DIM_Z = 16


@pytest.mark.parametrize("arch", available_architectures())
@pytest.mark.slow
def test_encoder_decoder_shapes(arch):
    B, H, W = 1, 257, 347
    enc = SpectrogramEncoder(
        architecture=arch, dim_z=DIM_Z, spectrogram_channels=1,
        fc_dropout=0.0, dtype=jnp.float32,
    )
    x = jnp.zeros((B, 1, H, W), dtype=jnp.float32)
    ev = enc.init(jax.random.PRNGKey(0), x, train=False)
    out = enc.apply(ev, x, train=False)
    assert out.shape == (B, 2, DIM_Z), arch
    dec = SpectrogramDecoder(
        architecture=arch, dim_z=DIM_Z, output_size=(H, W),
        spectrogram_channels=1, fc_dropout=0.0, dtype=jnp.float32,
    )
    z = jnp.zeros((B, DIM_Z), dtype=jnp.float32)
    if "speccnn8l1" not in arch:
        # reference parity: the decoder supports the speccnn8l1 family only
        # (reference: decoder.py:34-36 raises NotImplementedError for the
        # wavenet/flow_synth decoders too)
        with pytest.raises(NotImplementedError):
            dec.init(jax.random.PRNGKey(0), z, train=False)
        return
    dv = dec.init(jax.random.PRNGKey(0), z, train=False)
    y = dec.apply(dv, z, train=False)
    assert y.shape == (B, 1, H, W), arch
    # Hardtanh output bound (reference: decoder.py:87-92)
    assert float(jnp.abs(y).max()) <= 1.0


def test_tensorboard_writer_smoke(tmp_path):
    from preset_gen_vae_tpu import config as cfg
    from preset_gen_vae_tpu.logs.tbwriter import TensorboardSummaryWriter

    m, t = cfg.resolve(cfg.ModelConfig(), cfg.TrainConfig())
    w = TensorboardSummaryWriter(tmp_path / "tb", m, t)
    w.init_hparams_and_metrics({"ReconsLoss/MSE/Valid_": 0.0, "epochs": 0})
    w.add_scalar("test/scalar", 1.0, 0)
    w.update_metrics({"ReconsLoss/MSE/Valid_": 0.5, "epochs": 1})
    w.flush()
    w.close()
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(events) >= 1
    assert events[0].stat().st_size > 0
