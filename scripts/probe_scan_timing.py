"""Is the bench scan16 rate real or a block_until_ready artifact?

Times 1 vs 4 consecutive scan16 calls (if a single call's wall time is an
ack artifact, 4 calls stay ~flat; if real, 4x), compares against the
per-step dispatch pattern, and cross-checks the scan's final TotalLoss
value against 16 sequential per-step calls on the same inputs.
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
step = jax.jit(step_fn, donate_argnums=(0,))
xk = jnp.tile(x[None], (K, 1, 1, 1, 1))
vk = jnp.tile(v[None], (K, 1, 1))
ik = jnp.tile(info[None], (K, 1, 1))

def _scan_step(st, xs, vs, infos, key, beta):
    def body(s, xvi):
        xb, vb, ib = xvi
        return step_fn(s, xb, vb, ib, key, beta)
    return jax.lax.scan(body, st, (xs, vs, infos))
scan16 = jax.jit(_scan_step, donate_argnums=(0,))

# warmup both
state, m = step(state, x, v, info, key, beta)
jax.block_until_ready(m["TotalLoss"])
state, ms = scan16(state, xk, vk, ik, key, beta)
jax.block_until_ready(ms["TotalLoss"])
print("warm", flush=True)

for n_calls in (1, 2, 4):
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, ms = scan16(state, xk, vk, ik, key, beta)
    jax.block_until_ready(ms["TotalLoss"])
    dt = time.perf_counter() - t0
    print(f"scan16 x{n_calls}: {dt*1e3:.1f} ms total = "
          f"{dt*1e3/(n_calls*K):.3f} ms/step = {B*K*n_calls/dt:.0f} specs/s",
          flush=True)

t0 = time.perf_counter()
for _ in range(16):
    state, m = step(state, x, v, info, key, beta)
jax.block_until_ready(m["TotalLoss"])
dt = time.perf_counter() - t0
print(f"per-step x16:  {dt*1e3:.1f} ms total = {dt*1e3/16:.3f} ms/step = "
      f"{B*16/dt:.0f} specs/s", flush=True)

# correctness cross-check: scan final loss vs 16 sequential per-step calls
state2 = create_train_state(ext, variables, train_c)
state3 = create_train_state(ext, variables, train_c)
_, ms = scan16(state2, xk, vk, ik, key, beta)
losses_scan = np.asarray(ms["TotalLoss"], dtype=np.float64)
ls = []
for i in range(K):
    state3, m = step(state3, x, v, info, key, beta)
    ls.append(float(m["TotalLoss"]))
print("scan TotalLoss[0,7,15]:", losses_scan[[0, 7, 15]], flush=True)
print("seq  TotalLoss[0,7,15]:", [ls[0], ls[7], ls[15]], flush=True)
print("max |scan-seq|:", float(np.max(np.abs(losses_scan - np.asarray(ls)))),
      flush=True)
