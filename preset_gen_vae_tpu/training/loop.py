"""Full training orchestration — the reference ``train_config()`` flow
(reference: train.py:37-342) rebuilt around one jitted SPMD step.

Epoch structure, loss wiring, warmup/plateau scheduling, early stop, NaN
divergence detection, TensorBoard logging and checkpoint cadence all follow
the reference semantics; the per-minibatch Python (DataParallel calls,
backward, host-side monitoring losses) is replaced by the compiled
train/eval steps from ``train_step.py`` running over a data mesh.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..data import build as data_build
from ..logs import metrics as logmetrics
from ..logs.logger import RunLogger, load_checkpoint
from ..models import build as mbuild
from ..parallel import make_mesh, replicated_sharding, shard_batch
from ..utils.exception import check_nan_values
from ..utils.hparams import LinearDynamicParam
from .schedulers import ReduceLROnPlateau
from .train_step import (
    create_train_state,
    get_learning_rate,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)

TRAIN_SCALARS = (
    "ReconsLoss/Backprop",
    "ReconsLoss/MSE",
    "Controls/BackpropLoss",
    "Controls/QLoss",
    "Controls/Accuracy",
    "LatLoss",
)

# scalars the train flush reads back (TRAIN_SCALARS + the NaN-check reg term)
FLUSH_KEYS = TRAIN_SCALARS + ("FlowInputReg",)


@jax.jit
def _stack_scalars(ms):
    """Packs a list of per-step metric dicts into ONE device buffer of
    shape (n_steps, n_keys[, K]) so the host fetch is a single transfer
    (re-traced per distinct list length; lengths repeat, so cached)."""
    return jnp.stack([jnp.stack([m[k] for k in FLUSH_KEYS]) for m in ms])


def train_config(
    model_config: Optional[cfg.ModelConfig] = None,
    train_config_: Optional[cfg.TrainConfig] = None,
    dataset=None,
    dataset_kwargs: Optional[Dict] = None,
    use_tensorboard: bool = True,
) -> Dict:
    """Trains one run to completion; returns a summary dict of final
    metrics (reference entry point: train.py:37)."""
    model_c = model_config or cfg.ModelConfig()
    train_c = train_config_ or cfg.TrainConfig()
    model_c, train_c = cfg.resolve(model_c, train_c)

    # ---- dataset + loaders (train.py:48-52)
    if dataset is None:
        dataset = data_build.get_dataset(model_c, train_c, **(dataset_kwargs or {}))
    model_c, train_c = cfg.resolve_with_dataset(model_c, train_c, dataset)
    model_c = dataclasses.replace(
        model_c,
        input_tensor_size=(
            train_c.minibatch_size,
            model_c.input_tensor_size[1],
            *dataset.get_spectrogram_tensor_size()[1:],
        ),
        spectrogram_size=dataset.get_spectrogram_tensor_size()[1:],
    )
    loaders = data_build.get_split_dataloaders(train_c, dataset)
    # ---- multi-host (pod) data path: each host keeps only its corpus
    # shard and serves batch/process_count items; the global batch is
    # assembled device-side with make_global_batch (SURVEY.md §2.10;
    # the reference is strictly single-process).
    multihost = jax.process_count() > 1 or train_c.force_multihost_data
    if multihost:
        from ..parallel.multihost import (
            make_global_batch,
            shard_loaders_for_host,
        )

        loaders = shard_loaders_for_host(
            loaders, force=train_c.force_multihost_data
        )
    idx_helper = dataset.preset_indexes_helper

    # ---- resume consistency (train.py:56-62, model/build.py:90-122)
    start_checkpoint = None
    if train_c.start_epoch > 0:
        from ..logs.logger import get_run_dir
        import json

        with open(get_run_dir(model_c) / "config.json") as f:
            prev = json.load(f)
        cfg.check_configs_on_resume_from_checkpoint(model_c, train_c, prev)
        start_checkpoint = load_checkpoint(model_c, train_c.start_epoch - 1)

    logger = RunLogger(
        model_c, train_c,
        restart_from_checkpoint=(start_checkpoint is not None),
        use_tensorboard=use_tensorboard,
    )

    # ---- model + state (train.py:66-76)
    _, _, _, ext = mbuild.build_extended_ae_model(model_c, train_c, idx_helper)
    variables = mbuild.init_extended_ae(
        ext, train_c.seed, model_c.input_tensor_size
    )
    if train_c.verbosity >= 1:
        logger.init_with_model(ext, model_c.input_tensor_size,
                               variables=variables)
    state = create_train_state(ext, variables, train_c)
    scheduler = ReduceLROnPlateau(
        train_c.initial_learning_rate,
        factor=train_c.scheduler_lr_factor,
        patience=train_c.scheduler_patience,
        cooldown=train_c.scheduler_cooldown,
        threshold=train_c.scheduler_threshold,
    )
    if start_checkpoint is not None:
        tree = start_checkpoint["state_tree"]
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state.opt_state),
                jax.tree_util.tree_leaves(tree["opt_state"]),
            ),
            step=jnp.asarray(tree["step"], dtype=jnp.int32),
        )
        scheduler.load_state_dict(start_checkpoint["scheduler"])

    # ---- mesh + sharded, jitted steps (replaces DataParallel, train.py:77-97)
    # the data axis must divide the batch: use the largest device count that
    # does (reference DataParallel silently handled any batch; under SPMD
    # the split is explicit)
    import math

    n_model = max(1, train_c.model_parallel_devices)
    n_avail = (
        train_c.data_parallel_devices
        if train_c.data_parallel_devices > 0
        else len(jax.devices()) // n_model
    )
    tp_report = None
    if n_model > 1:
        # 2-D (data, model) mesh: batch shards over 'data', the large dense
        # kernels AND their Adam moments shard over 'model' (the size-driven
        # rules in parallel/sharding_rules.py); GSPMD inserts the
        # all-gather / reduce-scatter pairs over ICI. The HBM-resident
        # corpus stays replicated — it is activation-sized data, not params.
        from ..parallel.sharding_rules import (
            count_sharded,
            make_2d_mesh,
            shard_params,
        )

        n_data = math.gcd(train_c.minibatch_size, n_avail)
        if n_data * n_model > len(jax.devices()):
            raise ValueError(
                f"mesh ({n_data} data x {n_model} model) needs "
                f"{n_data * n_model} devices, have {len(jax.devices())}"
            )
        mesh = make_2d_mesh(n_data, n_model)
        state = shard_params(state, mesh, min_elements=train_c.tp_min_elements)
        tp_report = count_sharded(
            state.params, mesh, min_elements=train_c.tp_min_elements
        )
        logger.log(
            f"[tp] mesh (data={n_data}, model={n_model}): "
            f"{tp_report[0]} kernels sharded "
            f"({tp_report[1]}/{tp_report[2]} elements)",
            level=1,
        )
    else:
        mesh = make_mesh(math.gcd(train_c.minibatch_size, n_avail))
        state = jax.device_put(state, replicated_sharding(mesh))
    base_train_step = make_train_step(ext, model_c, train_c, idx_helper)
    base_eval_step = make_eval_step(
        ext, model_c, train_c, idx_helper, return_outputs=True
    )

    # ---- device-resident corpus (train_c.dataset_cache_device): the whole
    # normalized spectrogram corpus lives in HBM (bf16 when training in
    # bf16); a training batch is an on-device gather from an index vector —
    # zero per-step host->device batch traffic (the reference paid a
    # blocking .to(device) copy per minibatch, train.py:207).
    # under multihost each host holds only its corpus shard, so the
    # device-resident whole-corpus gather does not apply — hosts feed
    # their local batch shards instead (make_global_batch)
    device_resident = (
        bool(getattr(train_c, "dataset_cache_device", True)) and not multihost
    )
    if multihost and (
        getattr(dataset, "corpus_cache_policy", "disk") == "device"
    ):
        # checked on the DATASET, not the loaders' tensors: by this point
        # shard_loaders_for_host already re-materialized the tensors as
        # host numpy shards, so an isinstance check on them can never
        # fire (round-4 advisor medium finding) — and each host would
        # silently render the full corpus on its accelerator and fetch
        # it entirely to host. shard_loaders_for_host itself also raises
        # (parallel/multihost.py) as defense in depth.
        raise ValueError(
            "corpus_cache_policy='device' is a single-host path (multihost "
            "hosts feed their local batch shards from host memory); build "
            "the dataset with corpus_cache_policy='disk' for pod runs"
        )
    K = int(getattr(train_c, "steps_per_dispatch", 1))
    if K == -1:
        # whole-epoch dispatch: one lax.scan covers every train batch of an
        # epoch (K batches > len(loader) would silently fall through to the
        # single-step remainder path, so K is pinned to the exact count)
        K = len(loaders["train"])
    # K above the epoch's batch count would never fill a scan group and
    # degrade to per-step dispatches — cap it
    K = max(1, min(K, max(1, len(loaders["train"]))))
    if multihost:
        def place_batch(batch):
            return make_global_batch(mesh, batch)
    else:
        def place_batch(batch):
            return shard_batch(mesh, batch)
    if device_resident:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..data.corpus_device import (
            ChunkedDeviceCorpus,
            from_device_array,
            from_host_array,
        )

        tensors = loaders["train"].tensors
        repl = replicated_sharding(mesh)
        # corpus rows shard over the data axis when the mesh has one
        # (VERDICT r4 #3): per-device HBM holds ~P/n_data corpus rows, so
        # the corpus ceiling scales linearly with chips instead of
        # replicating HBM's scarcest resource. The in-scan gather with
        # replicated indices partitions as local-gather + mask + psum
        # over ICI (GSPMD's embedding-lookup pattern: ~B x row bytes of
        # all-reduce per step, never a corpus-sized all-gather — pinned
        # by tests/test_corpus_sharded.py's HLO check). On the
        # single-chip production mesh n_data == 1 and this is exactly
        # the replicated placement.
        n_data_ax = int(mesh.shape.get("data", 1))
        from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

        x_place = (
            _NS(mesh, _P("data", None))
            if n_data_ax > 1
            and bool(getattr(train_c, "corpus_rows_sharded", True))
            else repl
        )
        want = (
            jnp.bfloat16
            if train_c.compute_dtype == "bfloat16"
            else jnp.float32
        )
        xt = tensors["x"]
        if isinstance(xt, ChunkedDeviceCorpus):
            # corpus_cache_policy='device': x arrives already chunked on
            # device in the compute dtype straight from the on-device
            # render pass (data/pipeline.py) — no host cast, no
            # re-upload. device_put onto the same placement is a no-op.
            corpus_x = xt.placed(
                lambda a: jax.device_put(a, x_place), dtype=want
            )
        elif isinstance(xt, jax.Array):
            # legacy raw 4-D device corpus (small/test paths only):
            # re-layout on device — transiently ~2x the corpus in HBM,
            # which the production paths above/below never pay
            corpus_x = from_device_array(
                xt.astype(want), put=lambda a: jax.device_put(a, x_place)
            )
        else:
            # disk-policy host corpus: chunk + cast + upload ONE column
            # chunk at a time (corpus_device.from_host_array). The bf16
            # cast happens ON HOST via the vectorized bit-twiddle
            # (utils/fast_cast — ml_dtypes' astype runs <10 MB/s and took
            # ~20 min on the 30k corpus); casting on device would
            # transiently hold 1.5x the corpus in HBM (the 30k Dexed
            # corpus is 10.9 GB f32 — that alone OOMs a 16 GB chip).
            corpus_x = from_host_array(
                np.asarray(xt), dtype=np.dtype(want),
                put=lambda a: jax.device_put(a, x_place),
            )
        corpus = (
            corpus_x.chunks,
            jax.device_put(np.asarray(tensors["v"], dtype=np.float32), repl),
            jax.device_put(np.asarray(tensors["info"]), repl),
        )
        batch_spec = NamedSharding(mesh, P("data"))

        def _gather(cx, cv, ci, idx):
            # the spectrogram batch stays in the corpus dtype (bf16 when
            # training in bf16): the encoder's first conv consumes bf16
            # anyway, and the f32 loss/metric consumers upcast bf16->f32
            # EXACTLY — while an eager astype(f32) here materialized +
            # retiled a 35 MB tensor every step (profiled as one of the
            # largest single fusions in the train step).
            # cx is the corpus's chunk tuple (column-chunked 2-D rows —
            # the layout that keeps the in-scan gather free of
            # corpus-scale temps; data/corpus_device.py, measured in
            # saved/r5_gather_probe.log); corpus_x carries only static
            # layout metadata into the trace.
            x = jax.lax.with_sharding_constraint(
                corpus_x.device_gather(cx, idx), batch_spec
            )
            v = jax.lax.with_sharding_constraint(
                cv[idx].astype(jnp.float32), batch_spec
            )
            info = jax.lax.with_sharding_constraint(ci[idx], batch_spec)
            return x, v, info

        def _train_gather(state, cx, cv, ci, idx, key, beta):
            x, v, info = _gather(cx, cv, ci, idx)
            return base_train_step(state, x, v, info, key, beta)

        def _eval_gather(state, cx, cv, ci, idx):
            x, v, info = _gather(cx, cv, ci, idx)
            return base_eval_step(state, x, v, info), v

        train_step = jax.jit(_train_gather, donate_argnums=(0,))
        eval_step_g = jax.jit(_eval_gather)

        # Indexed-epoch path (K == 1, the default): the epoch's shuffled
        # index matrix is uploaded ONCE; each step receives its batch-row
        # NUMBER as a pre-uploaded device scalar and gathers its batch on
        # device — zero per-step host->device data traffic, and the async
        # dispatch queue pipelines steps near the device's sustained rate.
        # Measured on the v5e (BENCH.md round 3, B=160 flagship):
        #   - this path pipelines at ~5.1 ms/step;
        #   - deriving the row from the carried state.step instead makes
        #     the SAME gather degrade to ~18 ms/step (the data-dependent
        #     index defeats the runtime's pipelining);
        #   - lax.scan serializes iterations to ~16 ms/step even with
        #     contiguous slices;
        #   - a per-epoch shuffled corpus copy + contiguous slices hits
        #     ~4.5 ms/step but costs a 2nd corpus-sized HBM buffer (OOM
        #     at the 30k corpus: 5.5 GB x-corpus + 4.4 GB shuffled view).
        n_train_batches = max(1, len(loaders["train"]))
        # device-resident batch-row scalars, shared across epochs
        _row_scalars = [jnp.int32(i) for i in range(n_train_batches)]

        def _train_epoch_indexed(state, cx, cv, ci, idx_all, i, key, beta):
            idx = jax.lax.dynamic_index_in_dim(idx_all, i, axis=0,
                                               keepdims=False)
            x, v, info = _gather(cx, cv, ci, idx)
            return base_train_step(state, x, v, info, key, beta)

        train_step_e = jax.jit(_train_epoch_indexed, donate_argnums=(0,))

        # Accumulator variant (non-plot epochs): the step's scalar metrics
        # are written into row ``i`` of a carried (n_batches, n_keys)
        # device buffer instead of being returned to the host. The host
        # fetches the buffer ONCE per epoch — returning per-step scalars
        # and syncing on them every FLUSH_EVERY steps measured ~320 ms per
        # flush on the tunneled v5e (3.2 s of a 5.5 s epoch; BENCH.md
        # round 3) even though the packed fetch itself is one round trip:
        # the sync breaks the async dispatch pipeline. All non-scalar step
        # outputs (latents) are dead code here and get DCE'd by XLA.
        def _train_epoch_acc(state, cx, cv, ci, idx_all, i, key, beta, acc):
            idx = jax.lax.dynamic_index_in_dim(idx_all, i, axis=0,
                                               keepdims=False)
            x, v, info = _gather(cx, cv, ci, idx)
            state, m = base_train_step(state, x, v, info, key, beta)
            row = jnp.stack(
                [m[k].astype(jnp.float32) for k in FLUSH_KEYS]
            )
            acc = jax.lax.dynamic_update_index_in_dim(acc, row, i, axis=0)
            return state, acc

        train_step_acc = jax.jit(_train_epoch_acc, donate_argnums=(0, 8))

        # K-step dispatch: scan K index batches through the train step in
        # one device call. Same math and PRNG stream as K dispatches (the
        # step folds rng from state.step); cuts per-step host dispatch —
        # the measured bottleneck on 1-core hosts (BENCH.md).
        if K > 1:
            scan_unroll = max(1, int(getattr(train_c, "scan_unroll", 1)))

            def _train_scan(state, cx, cv, ci, idx_k, key, beta):
                def body(st, idx):
                    st, m = _train_gather(st, cx, cv, ci, idx, key, beta)
                    return st, m
                return jax.lax.scan(body, state, idx_k, unroll=scan_unroll)

            train_step_k = jax.jit(_train_scan, donate_argnums=(0,))

        # whole-validation scan (non-plot epochs, any K): every eval batch
        # in ONE dispatch, scalars + f16 latents stacked on device
        base_eval_nout = make_eval_step(
            ext, model_c, train_c, idx_helper, return_outputs=False
        )

        def _eval_scan(state, cx, cv, ci, idx_all):
            def body(_, idx):
                x, v, info = _gather(cx, cv, ci, idx)
                m = base_eval_nout(state, x, v, info)
                lat = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float16), m["latents"]
                )
                return 0, ({k: m[k] for k in TRAIN_SCALARS}, lat)

            _, out = jax.lax.scan(body, 0, idx_all)
            return out

        eval_scan = jax.jit(_eval_scan)
    else:
        train_step = jax.jit(base_train_step, donate_argnums=(0,))
    eval_step = jax.jit(base_eval_step)

    # ---- scalars / metrics (train.py:131-160)
    scalars: Dict[str, object] = {}
    for name in TRAIN_SCALARS:
        scalars[name + "/Train"] = logmetrics.EpochMetric()
        scalars[name + "/Valid"] = logmetrics.EpochMetric()
    scalars["LatCorr/Train"] = logmetrics.LatentMetric(model_c.dim_z)
    scalars["LatCorr/Valid"] = logmetrics.LatentMetric(model_c.dim_z)
    scalars["Sched/LR"] = logmetrics.SimpleMetric(train_c.initial_learning_rate)
    lr_warmup = LinearDynamicParam(
        train_c.lr_warmup_start_factor, 1.0,
        end_epoch=train_c.lr_warmup_epochs,
        current_epoch=train_c.start_epoch,
    )
    beta_warmup = LinearDynamicParam(
        train_c.beta_start_value, train_c.beta,
        end_epoch=train_c.beta_warmup_epochs,
        current_epoch=train_c.start_epoch,
    )
    metrics = {
        "ReconsLoss/MSE/Valid_": logmetrics.BufferedMetric(),
        "LatLoss/Valid_": logmetrics.BufferedMetric(),
        "LatCorr/Valid_": logmetrics.BufferedMetric(),
        "Controls/QLoss/Valid_": logmetrics.BufferedMetric(),
        "Controls/Accuracy/Valid_": logmetrics.BufferedMetric(),
        "epochs": train_c.start_epoch,
    }
    if logger.tensorboard is not None:
        logger.tensorboard.init_hparams_and_metrics(metrics)

    rng_key = jax.random.PRNGKey(train_c.seed)
    from ..utils.profile import get_optional_profiler

    profiler = get_optional_profiler(
        train_c.profiler_args, str(logger.run_dir / "profile")
    )
    profiling = profiler.enabled
    early_stop = False
    epoch = train_c.start_epoch

    for epoch in range(train_c.start_epoch, train_c.n_epochs):
        for s in scalars.values():
            s.on_new_epoch()
        # ---- LR warmup override (train.py:195-197)
        if epoch <= train_c.lr_warmup_epochs:
            lr = lr_warmup.get(epoch) * train_c.initial_learning_rate
            scheduler.lr = lr
        else:
            lr = scheduler.lr
        state = set_learning_rate(state, lr)
        beta = float(beta_warmup.get(epoch))

        # profile a handful of steady-state minibatches, not the whole epoch
        # (a full-epoch device trace of the flagship is ~400 MB)
        PROFILE_STEPS = 5
        trace_active = False
        if profiling and epoch == train_c.start_epoch:
            profiler.start()
            trace_active = True

        # ---- train minibatches (train.py:201-252)
        # Dispatch is async: metric values are NOT fetched per step (that
        # would sync host and device every minibatch); pending device
        # metrics are flushed every FLUSH_EVERY steps, letting the host
        # run ahead with the next batch's gather + device_put while the
        # device executes. NaN divergence is detected at each flush
        # (reference checked per minibatch, train.py:245).
        FLUSH_EVERY = 16
        pending = []
        deferred = []  # device-resident scalar stacks awaiting the epoch's one fetch
        # PGV_EPOCH_TIMING=1: print a per-epoch train/val/rest wall-time
        # breakdown (observability for the dispatch-bound-host analysis,
        # BENCH.md round 3)
        _sec_timing = os.environ.get("PGV_EPOCH_TIMING") == "1"
        _t_sec = time.time()
        # train-split latent correlations are only *plotted* (train.py:213,
        # figures every plot_period); skip their device->host fetch on
        # non-plot epochs — on tunneled accelerators the readback would
        # otherwise dominate the step time
        # per-item device arrays (latents, v_out) are batch-sharded across
        # ALL hosts' devices — fetching them is only possible when this
        # process addresses every shard (process_count == 1)
        single_process = jax.process_count() == 1
        collect_train_latents = (
            epoch % train_c.plot_period == 0
            and logger.tensorboard is not None
            and single_process
        )

        def _ingest_scalar_rows(arr):
            # arr: (n_steps, n_keys) chronological f32 scalar rows
            vals = {k: arr[:, j].reshape(-1)
                    for j, k in enumerate(FLUSH_KEYS)}
            for j in range(len(vals["ReconsLoss/Backprop"])):
                for name in TRAIN_SCALARS:
                    scalars[name + "/Train"].append(vals[name][j])
                check_nan_values(
                    epoch, vals["ReconsLoss/Backprop"][j],
                    vals["LatLoss"][j], vals["FlowInputReg"][j],
                    vals["Controls/BackpropLoss"][j],
                )

        def _ingest_stacked(arr):
            # row-major reshape keeps chronological step order for both
            # per-step (n,) and K-stacked (n, K) layouts
            arr = np.asarray(arr)
            if arr.ndim == 3:  # K-stacked (n, keys, K) -> (n*K, keys)
                arr = np.moveaxis(arr, 2, 1).reshape(-1, arr.shape[1])
            _ingest_scalar_rows(arr)

        def _flush(defer=False):
            # ONE jitted stack + ONE device_get per flush: each scalar
            # leaf fetch is a full round trip on tunneled chips (~3-4 ms
            # typical, 17.7 SECONDS in one measured window — BENCH.md
            # round-3 probe; latency is per CALL, not per byte); fetching
            # the 7 scalars of every pending step individually measured
            # ~25 ms/step and dominated the epoch — packing them into a
            # single (n, 7[, K]) buffer makes the flush ~one round trip.
            # ``defer=True`` keeps the packed buffer device-resident so it
            # rides the SAME device_get as the validation fetch:
            # steady-state epochs then cost exactly ONE fetch total.
            if not pending:
                return
            groups = {}  # partition by rank: K-group (K,) vs remainder ()
            for m in pending:
                groups.setdefault(jnp.ndim(m[FLUSH_KEYS[0]]), []).append(m)
            for ms in groups.values():
                stacked = _stack_scalars(
                    [{k: m[k] for k in FLUSH_KEYS} for m in ms]
                )
                if defer:
                    deferred.append(stacked)
                else:
                    _ingest_stacked(jax.device_get(stacked))
            if collect_train_latents:
                for m_dev in pending:
                    lat = jax.device_get(m_dev["latents"])
                    z0_mu, z0 = np.asarray(lat["z0_mu"]), np.asarray(lat["z0"])
                    if z0_mu.ndim == 3:  # (K, B, z) -> (K*B, z)
                        z0_mu = z0_mu.reshape(-1, z0_mu.shape[-1])
                        z0 = z0.reshape(-1, z0.shape[-1])
                    scalars["LatCorr/Train"].append(z0_mu, z0)
            pending.clear()

        def _drain_deferred(val_out=None):
            """The epoch's ONE host fetch: deferred train-scalar stacks
            and (optionally) the whole-validation scan output in a single
            ``device_get`` call. Returns the fetched ``val_out``."""
            if val_out is None and not deferred:
                return None
            host_def, val_host = jax.device_get((deferred, val_out))
            for arr in host_def:
                _ingest_stacked(arr)
            deferred.clear()
            return val_host

        # defer the train-metric fetch to ride the validation fetch except
        # on plot/profile epochs (those need per-step device dicts anyway)
        _can_defer = not collect_train_latents and not profiling

        if device_resident and K > 1 and not profiling:
            # K-step dispatch path: identical math to the per-step path
            # (verified by test_steps_per_dispatch_matches); host dispatch
            # count drops by K. Measured full scale on the tunneled v5e
            # (BENCH.md round 3): K=16 steady epoch 3.3 s vs 5.5-6.7 s for
            # the per-step paths below — per-step dispatch costs ~5 ms of
            # pure host time on the 1,072-leaf state no matter what the
            # device does, so fewer dispatches win on weak hosts.
            beta_j = jnp.float32(beta)
            buf, i = [], -1
            flush_groups = max(1, FLUSH_EVERY // K)
            for batch in loaders["train"].epoch_index_batches(epoch):
                buf.append(batch)
                if len(buf) == K:
                    state, m = train_step_k(
                        state, *corpus, jnp.asarray(np.stack(buf)),
                        rng_key, beta_j,
                    )
                    buf = []
                    pending.append(m)
                    i += K
                    if len(pending) >= flush_groups:
                        _flush(defer=_can_defer)
                    logger.on_minibatch_finished(i)
            for batch in buf:  # remainder: single-step dispatches
                state, m = train_step(
                    state, *corpus, jnp.asarray(batch), rng_key, beta_j
                )
                pending.append(m)
                i += 1
                logger.on_minibatch_finished(i)
            _flush(defer=_can_defer)
        elif device_resident and not profiling:
            # indexed-epoch path (default): ONE index-matrix upload per
            # epoch; per-step args are all device-resident (the batch-row
            # scalar comes from the shared _row_scalars list) -> fully
            # pipelined async dispatch
            beta_j = jnp.float32(beta)
            idx_batches = list(loaders["train"].epoch_index_batches(epoch))
            if not idx_batches:
                raise ValueError(
                    "train split smaller than one (drop_last) minibatch"
                )
            idx_all_dev = jnp.asarray(np.stack(idx_batches))
            if collect_train_latents:
                # plot epochs (rare): per-step metric dicts so the z0
                # latents can be fetched for the correlation figures
                for i in range(len(idx_batches)):
                    state, m = train_step_e(
                        state, *corpus, idx_all_dev, _row_scalars[i],
                        rng_key, beta_j
                    )
                    pending.append(m)
                    if len(pending) >= FLUSH_EVERY:
                        _flush()
                    logger.on_minibatch_finished(i)
                _flush()
            else:
                # steady-state epochs: zero host syncs inside the loop —
                # scalars accumulate on device and the fetch is DEFERRED:
                # the accumulator rides the validation device_get
                # (_drain_deferred). NaN divergence is still checked per
                # minibatch row, but only once that fetch lands — i.e.
                # after this epoch's train dispatches AND its validation
                # scan (vs the reference's immediate per-minibatch check,
                # train.py:245). After a divergence, up to one epoch of
                # train + validation work (plus, in pathological tunnel
                # windows, one multi-second downlink RTT) is wasted
                # before the abort fires; the abort itself and the math
                # are unchanged.
                _t_disp = time.perf_counter()
                acc = jnp.zeros(
                    (len(idx_batches), len(FLUSH_KEYS)), jnp.float32
                )
                for i in range(len(idx_batches)):
                    state, acc = train_step_acc(
                        state, *corpus, idx_all_dev, _row_scalars[i],
                        rng_key, beta_j, acc
                    )
                    logger.on_minibatch_finished(i)
                _t_disp = time.perf_counter() - _t_disp
                # no fetch here: the (n_batches, keys) accumulator rides
                # the validation device_get (_drain_deferred)
                deferred.append(acc)
                if _sec_timing:
                    print(f"[epoch {epoch}] disp={_t_disp:.3f}s "
                          f"(scalar fetch deferred to validation)",
                          flush=True)
        else:
          for i, batch in enumerate(
            loaders["train"].epoch_index_batches(epoch)
            if device_resident
            else loaders["train"].epoch_batches(epoch)
          ):
            if device_resident:
                state, m = train_step(
                    state, *corpus, jnp.asarray(batch), rng_key,
                    jnp.float32(beta),
                )
            else:
                xb, vb, ib = place_batch(batch)
                state, m = train_step(
                    state, xb, vb, ib, rng_key, jnp.float32(beta)
                )
            pending.append(m)
            if len(pending) >= FLUSH_EVERY:
                _flush()
            logger.on_minibatch_finished(i)
            if trace_active and i + 1 >= PROFILE_STEPS:
                _flush()  # force the traced steps to completion
                profiler.stop()
                trace_active = False
                logger.save_profiler_results(str(logger.run_dir / "profile"))
            if profiling and train_c.profiler_full_trace and i == 2:
                break
        _flush()
        if trace_active:  # epoch shorter than PROFILE_STEPS
            profiler.stop()
            trace_active = False
            logger.save_profiler_results(str(logger.run_dir / "profile"))
        if profiling and train_c.profiler_full_trace and epoch == train_c.start_epoch:
            break

        if _sec_timing:
            _t_train, _t_sec = time.time() - _t_sec, time.time()

        # (VAELoss/Train is computed after the validation fetch: under
        # deferred flushing the train scalars land on the host as part of
        # the validation device_get)

        # ---- validation (train.py:261-293)
        should_plot = (
            epoch % train_c.plot_period == 0
            and logger.tensorboard is not None
            and single_process
        )
        v_errors, first_batch_plot = [], None
        if device_resident:
            val_iter = enumerate(loaders["validation"].epoch_index_batches(epoch))
        else:
            val_iter = enumerate(loaders["validation"].epoch_batches(epoch))
        val_loader = loaders["validation"]
        bs = val_loader.batch_size
        # All dispatch is async; NOTHING is fetched inside the loop — the
        # per-batch scalar reads and latent pulls were the epoch bottleneck
        # on tunneled chips (each float(jax_scalar) is a blocking
        # round-trip, and the latent matrices ride the slow device->host
        # direction; BENCH.md "Notes"). Device references accumulate and
        # ONE bulk device_get runs after the loop; latents transfer as f16
        # (rank statistics are unaffected by the cast).
        val_scal_dev, val_lat_dev = [], []
        if device_resident and not should_plot:
            # whole-validation scan: one dispatch + one bulk fetch
            idx_all = np.stack(
                list(loaders["validation"].epoch_index_batches(epoch))
            )
            # the epoch's ONE device_get: deferred train scalars + the
            # whole-validation scan output in a single round trip
            scal_st, lat_st = _drain_deferred(
                eval_scan(state, *corpus, jnp.asarray(idx_all))
            )
            for i in range(idx_all.shape[0]):
                n_real = min(bs, val_loader.n_items - i * bs)
                w = val_loader.batch_weight(i)
                for name in TRAIN_SCALARS:
                    scalars[name + "/Valid"].append(scal_st[name][i], weight=w)
                scalars["LatCorr/Valid"].append(
                    np.asarray(lat_st["z0_mu"][i], dtype=np.float32)[:n_real],
                    np.asarray(lat_st["z0"][i], dtype=np.float32)[:n_real],
                )
            val_iter = ()
        for i, batch in val_iter:
            if device_resident:
                m, v = eval_step_g(state, *corpus, jnp.asarray(batch))
                x = info = None
            else:
                x, v, info = batch
                xb, vb, ib = place_batch((x, v, info))
                m = eval_step(state, xb, vb, ib)
            val_scal_dev.append({k: m[k] for k in TRAIN_SCALARS})
            if single_process:
                val_lat_dev.append(jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float16), m["latents"]
                ))
            if should_plot:
                v_errors.append(
                    (np.asarray(m["v_out"]) - np.asarray(v))[:min(
                        bs, val_loader.n_items - i * bs)]
                )
                if i == 0:
                    if x is None:
                        sel = loaders["validation"].tensors
                        bsel = next(iter(
                            loaders["validation"].epoch_index_batches(epoch)
                        ))
                        x, info = sel["x"][bsel], sel["info"][bsel]
                    first_batch_plot = (x, np.asarray(m["x_out"]), info)
        val_scal = jax.device_get(val_scal_dev)
        val_lat = jax.device_get(val_lat_dev) if val_lat_dev else []
        for i, mh in enumerate(val_scal):
            # the final batch is cyclically padded to the static batch
            # shape; weight its (padded-)mean by the real item count and
            # drop padded rows from latent stats so validation means match
            # the reference's exact per-item means (train.py:261-293).
            # batch_weight() uses GLOBAL real counts under multi-host.
            w = val_loader.batch_weight(i)
            for name in TRAIN_SCALARS:
                scalars[name + "/Valid"].append(mh[name], weight=w)
        for i, lh in enumerate(val_lat):
            n_real = min(bs, val_loader.n_items - i * bs)
            scalars["LatCorr/Valid"].append(
                np.asarray(lh["z0_mu"], dtype=np.float32)[:n_real],
                np.asarray(lh["z0"], dtype=np.float32)[:n_real],
            )
        _drain_deferred()  # no-op unless a branch left scalars deferred
        scalars["VAELoss/Train"] = logmetrics.SimpleMetric(
            scalars["ReconsLoss/Backprop/Train"].get()
            + scalars["LatLoss/Train"].get()
        )
        scalars["VAELoss/Valid"] = logmetrics.SimpleMetric(
            scalars["ReconsLoss/Backprop/Valid"].get()
            + scalars["LatLoss/Valid"].get()
        )
        if _sec_timing:
            _t_val, _t_sec = time.time() - _t_sec, time.time()

        # ---- plateau scheduler + early stop (train.py:296-299)
        if epoch > train_c.lr_warmup_epochs:
            sched_loss = sum(
                scalars[f"{n}/Valid"].get() for n in train_c.scheduler_loss
            )
            scheduler.step(sched_loss)
            state = set_learning_rate(state, scheduler.lr)
        scalars["Sched/LR"] = logmetrics.SimpleMetric(get_learning_rate(state))
        early_stop = get_learning_rate(state) < train_c.early_stop_lr_threshold

        # ---- TB figures (train.py:286-313)
        if (should_plot or early_stop) and logger.tensorboard is not None:
            import matplotlib.pyplot as plt

            from ..utils import figures

            if first_batch_plot is not None:
                fig, _ = figures.plot_train_spectrograms(
                    first_batch_plot[0], first_batch_plot[1], first_batch_plot[2]
                )
                logger.tensorboard.add_figure("Spectrogram", fig, epoch)
            fig, _ = figures.plot_latent_distributions_stats(scalars["LatCorr/Valid"])
            logger.tensorboard.add_figure("LatentMu", fig, epoch)
            fig, _ = figures.plot_spearman_correlation(scalars["LatCorr/Valid"])
            logger.tensorboard.add_figure("LatentEntanglement", fig, epoch)
            if v_errors:
                fig, _ = figures.plot_synth_preset_error(
                    np.concatenate(v_errors), idx_helper
                )
                logger.tensorboard.add_figure("SynthControlsError", fig, epoch)
            plt.close("all")

        # ---- TB scalars + metrics (train.py:303-320)
        if logger.tensorboard is not None:
            for k, s in scalars.items():
                # LatCorr is only accumulated on plot epochs (and never on
                # multi-host jobs); every other scalar must have data — an
                # empty one is a metric-collection regression, so no blanket
                # exception guard here
                if not getattr(s, "has_data", True):
                    continue
                logger.tensorboard.add_scalar(k, s.get(), epoch)
            metrics["epochs"] = epoch + 1
            for k_m, k_s in (
                ("ReconsLoss/MSE/Valid_", "ReconsLoss/MSE/Valid"),
                ("LatLoss/Valid_", "LatLoss/Valid"),
                ("LatCorr/Valid_", "LatCorr/Valid"),
                ("Controls/QLoss/Valid_", "Controls/QLoss/Valid"),
                ("Controls/Accuracy/Valid_", "Controls/Accuracy/Valid"),
            ):
                if not getattr(scalars[k_s], "has_data", True):
                    continue
                metrics[k_m].append(scalars[k_s].get())
            logger.tensorboard.update_metrics(metrics)

        # ---- checkpoints (train.py:323-325)
        if (
            (epoch > 0 and epoch % train_c.save_period == 0)
            or epoch == train_c.n_epochs - 1
            or early_stop
        ):
            logger.save_checkpoint(epoch, state, scheduler)
        if _sec_timing:
            print(f"[epoch {epoch}] train={_t_train:.3f}s val={_t_val:.3f}s "
                  f"rest={time.time() - _t_sec:.3f}s", flush=True)
        logger.on_epoch_finished(epoch)
        if early_stop:
            logger.log("Training stopped early (loss plateau)", level=1)
            break

    logger.on_training_finished()
    summary = {
        "epochs_trained": epoch + 1,
        "early_stop": early_stop,
        "final_lr": get_learning_rate(state),
    }
    if tp_report is not None:
        summary["tp_kernels_sharded"] = tp_report[0]
    for name in TRAIN_SCALARS:
        # same explicit emptiness guard as the TB block above (no blanket
        # exception catch that could mask a metric-collection regression)
        if getattr(scalars[name + "/Valid"], "has_data", True):
            summary[name + "/Valid"] = scalars[name + "/Valid"].get()
    return summary
