"""Profiling / tracing.

Reference (SURVEY §5): TF profiler ``trace.Trace('TraceContext', ...)``
contexts wrapping each train/test batch (reference
examples/style_based_gan/style_based_gan.py:742-746 — with ``trace`` not
even imported in gan.py:411-415, a latent bug), TensorBoard imported but
never instantiated. TPU-native equivalents:

- :func:`trace` — named ``jax.profiler.TraceAnnotation`` context.
- :func:`step_trace` — ``StepTraceAnnotation`` carrying the step number.
- :func:`start_profile` / :func:`stop_profile` — capture a TensorBoard
  profile (HLO timelines, memory viewer) to a logdir.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(name: str = "TraceContext", **kwargs):
    """Annotate a region in the device profile (reference's TraceContext
    pattern, style_based_gan.py:742-746)."""
    with jax.profiler.TraceAnnotation(name, **kwargs):
        yield


@contextlib.contextmanager
def step_trace(name: str, step_num: int):
    with jax.profiler.StepTraceAnnotation(name, step_num=step_num):
        yield


def start_profile(logdir: str):
    """Begin a TensorBoard profile capture."""
    jax.profiler.start_trace(logdir)


def stop_profile():
    jax.profiler.stop_trace()
