"""Optional profiling wrapper (reference: utils/profile.py:6-37).

Same compile-out pattern: ``get_optional_profiler`` returns a real profiler
or a no-op with an identical interface, so the train loop stays free of
conditionals. TPU backend: ``jax.profiler`` traces viewable in TensorBoard's
profile plugin; stage annotation via ``jax.profiler.TraceAnnotation``
replaces torch's ``record_function`` (reference stages: DATA_LOAD /
BACKPROP / OPTIM_STEP, train.py:205-247)."""

from __future__ import annotations

import contextlib
from typing import Dict, Optional


class NoProfiler:
    """No-op, same interface (reference: utils/profile.py:28-37)."""

    enabled = False

    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return False

    def start(self):
        pass

    def stop(self):
        pass

    def record_function(self, name: str):
        return contextlib.nullcontext()


class ActualProfiler:
    """jax.profiler trace over the scoped region
    (reference: utils/profile.py:17-25). Usable as a context manager or via
    explicit ``start()``/``stop()`` (the train loop bounds its trace to a
    few steady-state minibatches rather than a lexical scope)."""

    enabled = True

    def __init__(self, log_dir: str, args: Optional[Dict] = None):
        self.log_dir = str(log_dir)
        self.args = args or {}

    def start(self):
        import jax

        jax.profiler.start_trace(self.log_dir)

    def stop(self):
        import jax

        jax.profiler.stop_trace()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()
        return False

    def record_function(self, name: str):
        import jax

        return jax.profiler.TraceAnnotation(name)


def get_optional_profiler(profiler_args: Optional[Dict], log_dir: str = "/tmp/jax_profile"):
    """(reference: utils/profile.py:6-14)"""
    if profiler_args and profiler_args.get("enabled", False):
        return ActualProfiler(log_dir, profiler_args)
    return NoProfiler()
