"""Run logger: run-dir lifecycle, config freeze, checkpoints, timing.

Role of the reference ``RunLogger`` (logs/logger.py:79-226):
``saved/<model_name>/<run_name>/`` with ``config.json``, ``tensorboard/``
events and ``checkpoints/``. Checkpoints carry the full jittable train
state ({params, batch_stats, opt_state}) via Orbax plus a JSON sidecar with
{epoch, scheduler state} — the exact analog of the reference's .tar dicts
{epoch, model/optimizer/scheduler state_dict} (logger.py:199-202, 30-55).
"""

from __future__ import annotations

import json
import pathlib
import shutil
import time
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .. import config as cfg
from .tbwriter import TensorboardSummaryWriter


def get_run_dir(model_config: cfg.ModelConfig) -> pathlib.Path:
    root = pathlib.Path(model_config.logs_root_dir)
    if not root.is_absolute():
        root = pathlib.Path("/root/repo") / root
    return root / model_config.name / model_config.run_name


def get_checkpoints_dir(model_config: cfg.ModelConfig) -> pathlib.Path:
    return get_run_dir(model_config) / "checkpoints"


def list_checkpoint_epochs(model_config: cfg.ModelConfig):
    d = get_checkpoints_dir(model_config)
    if not d.exists():
        return []
    return sorted(int(p.name) for p in d.iterdir() if p.name.isdigit())


def load_checkpoint(model_config: cfg.ModelConfig, epoch: int = -1) -> Dict:
    """Loads {state, epoch, scheduler}; epoch=-1 -> latest
    (reference: logger.py:30-55 get_model_checkpoint/_last_checkpoint)."""
    epochs = list_checkpoint_epochs(model_config)
    if not epochs:
        raise FileNotFoundError(
            f"No checkpoints under {get_checkpoints_dir(model_config)}"
        )
    epoch = epochs[-1] if epoch < 0 else epoch
    d = get_checkpoints_dir(model_config) / str(epoch)
    state = ocp.PyTreeCheckpointer().restore(str(d / "state"))
    with open(d / "meta.json") as f:
        meta = json.load(f)
    return {"state_tree": state, "epoch": meta["epoch"], "scheduler": meta["scheduler"]}


class RunLogger:
    def __init__(
        self,
        model_config: cfg.ModelConfig,
        train_config: cfg.TrainConfig,
        eval_config: Optional[cfg.EvalConfig] = None,
        restart_from_checkpoint: bool = False,
        use_tensorboard: bool = True,
    ):
        self.model_config = model_config
        self.train_config = train_config
        self.verbosity = train_config.verbosity
        self.restart = restart_from_checkpoint
        self.run_dir = get_run_dir(model_config)

        if not restart_from_checkpoint and self.run_dir.exists():
            if not model_config.allow_erase_run:
                raise RuntimeError(
                    f"Run dir {self.run_dir} exists and allow_erase_run=False"
                )
            if train_config.init_security_pause > 0:  # logger.py:99-106
                print(
                    f"[RunLogger] Erasing {self.run_dir} in "
                    f"{train_config.init_security_pause:.1f}s..."
                )
                time.sleep(train_config.init_security_pause)
            shutil.rmtree(self.run_dir)
        (self.run_dir / "checkpoints").mkdir(parents=True, exist_ok=True)

        # frozen config sidecar (reference: logger.py:158-162)
        cfg.save_config(
            self.run_dir / "config.json", model_config, train_config, eval_config
        )
        self.tensorboard = (
            TensorboardSummaryWriter(
                self.run_dir / "tensorboard", model_config, train_config
            )
            if use_tensorboard
            else None
        )
        # timing (reference: logger.py:179-188, 204-217)
        self._epoch_t0 = time.time()
        self._minibatch_times = []
        self._epoch_durations = []

    # ------------------------------------------------------------------
    def init_with_model(self, model, input_tensor_size, seed: int = 0,
                        variables=None, tabulate_max_params: int = 10_000_000
                        ) -> None:
        """Writes a parameter-table summary of the model to the run dir and
        to TensorBoard (reference: logger.py:155-172 — torchinfo summary +
        TB graph). For very large models nn.tabulate's eager traced forward
        takes minutes on slow hosts; above ``tabulate_max_params`` only the
        parameter count is recorded."""
        try:
            import jax.numpy as jnp
            from flax import linen as nn

            if variables is not None:
                n_params = sum(
                    int(np.prod(p.shape))
                    for p in jax.tree_util.tree_leaves(variables.get("params", {}))
                )
                if n_params > tabulate_max_params:
                    msg = (f"{model.__class__.__name__}: {n_params:,} parameters "
                           f"(> {tabulate_max_params:,}; layer table skipped)")
                    with open(self.run_dir / "model_summary.txt", "w") as f:
                        f.write(msg + "\n")
                    self.log(msg, level=1)
                    return

            _, c, h, w = input_tensor_size
            x = jnp.zeros((2, c, h, w), dtype=jnp.float32)
            info = jnp.zeros((2, 3), dtype=jnp.int32)
            table = nn.tabulate(
                model,
                {
                    "params": jax.random.PRNGKey(seed),
                    "sampling": jax.random.PRNGKey(seed + 1),
                    "dropout": jax.random.PRNGKey(seed + 2),
                },
                depth=2,
            )(x, info, train=True, method=model.forward_full)
            with open(self.run_dir / "model_summary.txt", "w") as f:
                f.write(table)
            if self.tensorboard is not None:
                self.tensorboard.add_text("ModelSummary",
                                          f"```\n{table}\n```")
        except Exception as e:  # summaries must never kill a run
            self.log(f"model summary failed: {e}", level=1)

    def log(self, msg: str, level: int = 1):
        if self.verbosity >= level:
            print(f"[RunLogger] {msg}")

    def on_minibatch_finished(self, minibatch_idx: int):
        self._minibatch_times.append(time.time())
        if self.verbosity >= 3 and len(self._minibatch_times) >= 2:
            dt = np.diff(self._minibatch_times[-10:]).mean()
            print(f"[RunLogger] minibatch {minibatch_idx}: avg {dt*1e3:.1f} ms")

    def on_epoch_finished(self, epoch: int):
        dur = time.time() - self._epoch_t0
        self._epoch_durations.append(dur)
        self._epoch_t0 = time.time()
        self._minibatch_times = []
        remaining = self.train_config.n_epochs - epoch - 1
        eta_s = remaining * float(np.mean(self._epoch_durations[-10:]))
        self.log(
            f"epoch {epoch} done in {dur:.1f}s — ETA {eta_s/60.0:.1f} min",
            level=2,
        )

    def on_training_finished(self):
        if self.tensorboard is not None:
            self.tensorboard.flush()
            self.tensorboard.close()
        total = sum(self._epoch_durations)
        self.log(f"training finished in {total/60.0:.1f} min", level=1)

    # ------------------------------------------------------------------
    def save_checkpoint(self, epoch: int, state, scheduler) -> None:
        """(reference: logger.py:199-202). ``state`` is the TrainState;
        ``scheduler`` the host-side ReduceLROnPlateau."""
        d = self.run_dir / "checkpoints" / str(epoch)
        if d.exists():
            shutil.rmtree(d)
        d.mkdir(parents=True)
        tree = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
        }
        ocp.PyTreeCheckpointer().save(str((d / "state").resolve()), tree)
        with open(d / "meta.json", "w") as f:
            json.dump(
                {"epoch": epoch, "scheduler": scheduler.state_dict()}, f
            )
        self.log(f"checkpoint saved at epoch {epoch}", level=2)

    def save_profiler_results(self, trace_dir: str):
        self.log(f"profiler trace in {trace_dir}", level=1)


def erase_run(model_config: cfg.ModelConfig):
    """clean_logs.py equivalent: removes a run's saved dir."""
    d = get_run_dir(model_config)
    if d.exists():
        shutil.rmtree(d)
