"""Decisive check on the implausible scan16 wall rate: block_until_ready
vs an actual device round-trip (device_get of the post-chain step counter
and a param-derived scalar, which cannot complete before the computation).

If block_until_ready returns early on this backend, the device_get-timed
rate is the real one and bench's plausibility gate is doing its job.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from __graft_entry__ import _flagship_configs
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.training import create_train_state, make_train_step

model_c, train_c, helper = _flagship_configs()
_, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
state = create_train_state(ext, variables, train_c)
B = 160; K = 16
H, W = model_c.spectrogram_size
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, 1, H, W)), jnp.bfloat16)
v = jnp.asarray(helper.full_to_learnable_batch(
    rng.random((B, helper.full_preset_size)).astype(np.float32)))
info = jnp.asarray(np.tile(np.array([[0, 60, 85]], np.int32), (B, 1)))
key = jax.random.PRNGKey(0); beta = jnp.float32(0.2)

step_fn = make_train_step(ext, model_c, train_c, helper)
xk = jnp.tile(x[None], (K, 1, 1, 1, 1))
vk = jnp.tile(v[None], (K, 1, 1))
ik = jnp.tile(info[None], (K, 1, 1))

def _scan_step(st, xs, vs, infos, key, beta):
    def body(s, xvi):
        xb, vb, ib = xvi
        return step_fn(s, xb, vb, ib, key, beta)
    return jax.lax.scan(body, st, (xs, vs, infos))
scan16 = jax.jit(_scan_step, donate_argnums=(0,))

state, ms = scan16(state, xk, vk, ik, key, beta)
jax.block_until_ready(ms["TotalLoss"])
print("warm; baseline device_get RTT:", flush=True)
t0 = time.perf_counter()
_ = jax.device_get(ms["TotalLoss"])
print(f"  device_get (16,) f32: {1e3*(time.perf_counter()-t0):.1f} ms",
      flush=True)

for mode in ("block", "get"):
    for n_calls in (1, 4):
        t0 = time.perf_counter()
        for _ in range(n_calls):
            state, ms = scan16(state, xk, vk, ik, key, beta)
        if mode == "block":
            jax.block_until_ready(ms["TotalLoss"])
        else:
            # a real round trip that DEPENDS on the full chain: the loss
            # values of the final call
            vals = np.asarray(jax.device_get(ms["TotalLoss"]))
        dt = time.perf_counter() - t0
        extra = f" last={vals[-1]:.4f}" if mode == "get" else ""
        print(f"scan16 x{n_calls} [{mode}]: {dt*1e3:.1f} ms = "
              f"{dt*1e3/(n_calls*K):.3f} ms/step = "
              f"{B*K*n_calls/dt:.0f} specs/s{extra}", flush=True)

# same comparison for the per-step dispatch pattern
step = jax.jit(step_fn, donate_argnums=(0,))
state, m = step(state, x, v, info, key, beta)
jax.block_until_ready(m["TotalLoss"])
for mode in ("block", "get"):
    t0 = time.perf_counter()
    for _ in range(16):
        state, m = step(state, x, v, info, key, beta)
    if mode == "block":
        jax.block_until_ready(m["TotalLoss"])
    else:
        val = float(jax.device_get(m["TotalLoss"]))
    dt = time.perf_counter() - t0
    extra = f" last={val:.4f}" if mode == "get" else ""
    print(f"per-step x16 [{mode}]: {dt*1e3:.1f} ms = {dt*1e3/16:.3f} ms/step"
          f" = {B*16/dt:.0f} specs/s{extra}", flush=True)
