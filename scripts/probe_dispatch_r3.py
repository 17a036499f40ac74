"""Round-3 decisive probe: characterize the tunnel + scan vs dispatch,
all in ONE process with interleaved repetitions (run-to-run variance on
this tunneled chip is 3-5x, so cross-process comparisons are meaningless).

Jitted functions mirror training/loop.py's signatures EXACTLY so the
persistent compile cache is shared with the real loop runs.

Measures:
  T0: tunnel no-op dispatch rate + device_get RTT
  A:  per-step indexed dispatch (loop's train_step_e)     x3 interleaved
  B:  16-step scan (loop's train_step_k shape)            x3 interleaved
  C:  122-step whole-epoch scan (steps_per_dispatch=-1)   x3 interleaved
  U:  16-step scan with unroll=4                          x3 interleaved
  D:  loop-faithful epochs (acc path + eval scan + fresh uploads)
  P:  profiler trace of one A window + one B dispatch
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from __graft_entry__ import _flagship_configs
from preset_gen_vae_tpu.models import build as mbuild
from preset_gen_vae_tpu.training import create_train_state, make_train_step
from preset_gen_vae_tpu.training.train_step import make_eval_step
from preset_gen_vae_tpu.parallel import make_mesh, replicated_sharding

model_c, train_c, helper = _flagship_configs()
_, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, helper)
variables = mbuild.init_extended_ae(ext, 0, model_c.input_tensor_size)
state = create_train_state(ext, variables, train_c)
B = 160; H, W = model_c.spectrogram_size
rng = np.random.default_rng(0)
mesh = make_mesh(1); repl = replicated_sharding(mesh)
state = jax.device_put(state, repl)
batch_spec = NamedSharding(mesh, P("data"))
base = make_train_step(ext, model_c, train_c, helper)
base_eval_nout = make_eval_step(ext, model_c, train_c, helper,
                                return_outputs=False)
key = jax.random.PRNGKey(0); beta = jnp.float32(0.2)

NB = 122; N_C = NB * B
gx = jax.device_put(jnp.asarray(rng.standard_normal((64, 1, H, W)), jnp.bfloat16), repl)
cx = jax.jit(lambda g: jnp.tile(g, (N_C // 64 + 1, 1, 1, 1))[:N_C])(gx)
cv = jax.device_put(jnp.asarray(rng.random((N_C, helper.learnable_preset_size)), jnp.float32), repl)
ci = jax.device_put(jnp.zeros((N_C, 3), jnp.int32), repl)
corpus = (cx, cv, ci)
jax.block_until_ready(cx)
idx_np = rng.permutation(N_C).reshape(NB, B).astype(np.int32)
idx_all = jax.device_put(jnp.asarray(idx_np), repl)
rows = [jnp.int32(i) for i in range(NB)]
print("corpus ready", flush=True)

# ---- T0: tunnel characterization
tiny = jax.jit(lambda a: a + 1)
a0 = jnp.float32(0.0)
a0 = tiny(a0); jax.block_until_ready(a0)
t0 = time.perf_counter()
for _ in range(100):
    a0 = tiny(a0)
jax.block_until_ready(a0)
print(f"T0 tiny-dispatch x100 pipelined: {1e3*(time.perf_counter()-t0)/100:.3f} ms/call", flush=True)
t0 = time.perf_counter()
for _ in range(20):
    a0 = tiny(a0)
    jax.block_until_ready(a0)
print(f"T0 tiny-dispatch x20 sync:      {1e3*(time.perf_counter()-t0)/20:.3f} ms/call", flush=True)
t0 = time.perf_counter()
for _ in range(20):
    _ = jax.device_get(a0)
print(f"T0 device_get scalar x20:       {1e3*(time.perf_counter()-t0)/20:.3f} ms/call", flush=True)

# ---- loop-identical jitted functions (training/loop.py:248-345)
TRAIN_SCALARS = ("ReconsLoss/Backprop", "ReconsLoss/MSE",
                 "Controls/BackpropLoss", "Controls/QLoss",
                 "Controls/Accuracy", "LatLoss")
FLUSH_KEYS = TRAIN_SCALARS + ("FlowInputReg",)

def _gather(cx, cv, ci, idx):
    x = jax.lax.with_sharding_constraint(cx[idx], batch_spec)
    v = jax.lax.with_sharding_constraint(cv[idx].astype(jnp.float32), batch_spec)
    info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
    return x, v, info

def _train_gather(state, cx, cv, ci, idx, key, beta):
    x, v, info = _gather(cx, cv, ci, idx)
    return base(state, x, v, info, key, beta)

def _train_epoch_indexed(state, cx, cv, ci, idx_all, i, key, beta):
    idx = jax.lax.dynamic_index_in_dim(idx_all, i, axis=0, keepdims=False)
    x, v, info = _gather(cx, cv, ci, idx)
    return base(state, x, v, info, key, beta)
train_step_e = jax.jit(_train_epoch_indexed, donate_argnums=(0,))

def _train_epoch_acc(state, cx, cv, ci, idx_all, i, key, beta, acc):
    idx = jax.lax.dynamic_index_in_dim(idx_all, i, axis=0, keepdims=False)
    x, v, info = _gather(cx, cv, ci, idx)
    state, m = base(state, x, v, info, key, beta)
    row = jnp.stack([m[k].astype(jnp.float32) for k in FLUSH_KEYS])
    acc = jax.lax.dynamic_update_index_in_dim(acc, row, i, axis=0)
    return state, acc
train_step_acc = jax.jit(_train_epoch_acc, donate_argnums=(0, 8))

def _train_scan(state, cx, cv, ci, idx_k, key, beta):
    def body(st, idx):
        st, m = _train_gather(st, cx, cv, ci, idx, key, beta)
        return st, m
    return jax.lax.scan(body, state, idx_k)
train_step_k = jax.jit(_train_scan, donate_argnums=(0,))

def _train_scan_u4(state, cx, cv, ci, idx_k, key, beta):
    def body(st, idx):
        st, m = _train_gather(st, cx, cv, ci, idx, key, beta)
        return st, m
    return jax.lax.scan(body, state, idx_k, unroll=4)
train_step_u4 = jax.jit(_train_scan_u4, donate_argnums=(0,))

def _eval_scan(state, cx, cv, ci, idx_all):
    def body(_, idx):
        x, v, info = _gather(cx, cv, ci, idx)
        m = base_eval_nout(state, x, v, info)
        lat = jax.tree_util.tree_map(lambda a: a.astype(jnp.float16),
                                     m["latents"])
        return 0, ({k: m[k] for k in TRAIN_SCALARS}, lat)
    _, out = jax.lax.scan(body, 0, idx_all)
    return out
eval_scan = jax.jit(_eval_scan)
val_idx_np = rng.permutation(N_C)[: 24 * B].reshape(24, B).astype(np.int32)

# ---- warmups (pay compiles; each prints its wall so compile cost is known)
def warm(name, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[-1])
    print(f"{name} compiled+ran in {time.perf_counter()-t0:.1f}s", flush=True)
    return out

state, _m = warm("A train_step_e", lambda: train_step_e(state, *corpus, idx_all, rows[0], key, beta))
state, _s = warm("B train_step_k16", lambda: train_step_k(state, *corpus, idx_all[:16], key, beta))
state, _s = warm("C train_step_k122", lambda: train_step_k(state, *corpus, idx_all, key, beta))
state, _s = warm("U train_step_u4", lambda: train_step_u4(state, *corpus, idx_all[:16], key, beta))

def timeA(n=32):
    global state
    t0 = time.perf_counter()
    for i in range(n):
        state, m = train_step_e(state, *corpus, idx_all, rows[i % NB], key, beta)
    jax.block_until_ready(m["TotalLoss"])
    return 1e3 * (time.perf_counter() - t0) / n

def timeB(n=4):
    global state
    t0 = time.perf_counter()
    for i in range(n):
        state, s = train_step_k(state, *corpus, idx_all[:16], key, beta)
    jax.block_until_ready(s["TotalLoss"])
    return 1e3 * (time.perf_counter() - t0) / (n * 16)

def timeC():
    global state
    t0 = time.perf_counter()
    state, s = train_step_k(state, *corpus, idx_all, key, beta)
    jax.block_until_ready(s["TotalLoss"])
    return 1e3 * (time.perf_counter() - t0) / NB

def timeU(n=4):
    global state
    t0 = time.perf_counter()
    for i in range(n):
        state, s = train_step_u4(state, *corpus, idx_all[:16], key, beta)
    jax.block_until_ready(s["TotalLoss"])
    return 1e3 * (time.perf_counter() - t0) / (n * 16)

for r in range(3):
    a = timeA(); b = timeB(); c = timeC(); uu = timeU()
    print(f"round {r}: A step {a:.2f} | B scan16 {b:.2f} | C scan122 {c:.2f} "
          f"| U scan16u4 {uu:.2f}  ms/step", flush=True)

# ---- D: loop-faithful epochs (acc path + eval scan, fresh uploads)
acc0 = jnp.zeros((NB, len(FLUSH_KEYS)), jnp.float32)
state, acc0 = train_step_acc(state, *corpus, idx_all, rows[0], key, beta, acc0)
jax.block_until_ready(acc0)
for epoch in range(4):
    idx_e = jnp.asarray(idx_np[rng.permutation(NB)])
    beta_e = jnp.float32(0.2)
    acc = jnp.zeros((NB, len(FLUSH_KEYS)), jnp.float32)
    t0 = time.perf_counter()
    for i in range(NB):
        state, acc = train_step_acc(state, *corpus, idx_e, rows[i], key, beta_e, acc)
    t_disp = time.perf_counter() - t0
    t1 = time.perf_counter()
    acc_h = np.asarray(jax.device_get(acc))
    t_fetch = time.perf_counter() - t1
    t2 = time.perf_counter()
    sc, lat = eval_scan(state, *corpus, jnp.asarray(val_idx_np))
    sc_h = jax.device_get(sc); lat_h = jax.device_get(lat)
    t_val = time.perf_counter() - t2
    print(f"D epoch {epoch}: disp={t_disp:.3f}s fetch={t_fetch:.3f}s "
          f"val={t_val:.3f}s  ({1e3*(t_disp+t_fetch)/NB:.2f} ms/step)",
          flush=True)

# ---- profiler capture
import pathlib
trace_dir = "/tmp/r3trace"
pathlib.Path(trace_dir).mkdir(exist_ok=True)
with jax.profiler.trace(trace_dir):
    for i in range(8):
        state, m = train_step_e(state, *corpus, idx_all, rows[i], key, beta)
    jax.block_until_ready(m["TotalLoss"])
    state, s = train_step_k(state, *corpus, idx_all[:16], key, beta)
    jax.block_until_ready(s["TotalLoss"])
print("trace captured ->", trace_dir, flush=True)
