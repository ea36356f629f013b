"""Tagged memory telemetry (scx.core.memtrack), mirror of sc_memtrack.h:6-25."""

import numpy as np

from scx.core import memtrack


def setup_function(_):
    memtrack.reset()


def test_track_untrack_counters():
    memtrack.track(memtrack.TAG_PHYSICS, 1024, "contacts")
    memtrack.track(memtrack.TAG_PHYSICS, 2048, "bodies")
    memtrack.untrack(memtrack.TAG_PHYSICS, 1024)
    snap = memtrack.snapshot()
    c = snap[memtrack.TAG_PHYSICS]
    assert c.alloc_count == 2
    assert c.free_count == 1
    assert c.live_bytes == 2048
    assert c.peak_bytes == 3072
    assert memtrack.total_live_bytes() == 2048


def test_debug_ring_keeps_recent():
    for i in range(memtrack.RING_CAPACITY + 10):
        memtrack.track(memtrack.TAG_CORE, i, f"a{i}")
    recent = memtrack.recent_allocs(4)
    assert [r.label for r in recent] == [
        f"a{i}" for i in range(memtrack.RING_CAPACITY + 6, memtrack.RING_CAPACITY + 10)
    ]


def test_track_array_pytree():
    import jax.numpy as jnp

    tree = {"a": jnp.zeros((8, 4), jnp.float32), "b": jnp.zeros((3,), jnp.int32)}
    n = memtrack.track_array(memtrack.TAG_STATE, tree)
    assert n == 8 * 4 * 4 + 3 * 4
    assert memtrack.snapshot()[memtrack.TAG_STATE].live_bytes == n
    memtrack.retrack_array(memtrack.TAG_STATE, tree, tree["a"])
    assert memtrack.snapshot()[memtrack.TAG_STATE].live_bytes == 8 * 4 * 4


def test_entity_state_alloc_is_tracked():
    from scx.state.entity import alloc_entity_state

    state = alloc_entity_state(64)
    snap = memtrack.snapshot()
    assert memtrack.TAG_STATE in snap
    assert snap[memtrack.TAG_STATE].live_bytes > 64 * 3 * 4


def test_host_and_device_sources():
    assert memtrack.host_rss_bytes() > 1 << 20  # a real process RSS
    # device stats may be empty on some backends but must not raise
    stats = memtrack.device_memory_stats()
    assert isinstance(stats, dict)
    memtrack.track(memtrack.TAG_RENDERER, 123456, "fb")
    text = memtrack.format_snapshot()
    assert "Renderer" in text and "MiB" in text
