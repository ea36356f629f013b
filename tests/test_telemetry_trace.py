"""jax.profiler tracing integration (SURVEY §5.1): a capture around engine
frames must produce a trace on disk and annotate host spans."""

import glob
import os

import jax
import jax.numpy as jnp

from scx.telemetry import trace


def test_trace_captures_device_work(tmp_path):
    logdir = str(tmp_path / "tr")
    trace.start_trace(logdir)
    assert trace.tracing_active()
    with trace.annotate("System/TestSpan"):
        x = jax.jit(lambda a: (a @ a).sum())(jnp.ones((64, 64)))
        jax.block_until_ready(x)
    trace.stop_trace()
    assert not trace.tracing_active()
    files = glob.glob(os.path.join(logdir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), "no trace artifacts written"


def test_annotate_is_noop_without_trace():
    with trace.annotate("nope"):
        pass  # must not raise nor require an active profiler
