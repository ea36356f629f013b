"""Entity SoA state: spawn/destroy/free-slot semantics under jit."""

import jax
import jax.numpy as jnp
import numpy as np

from scx import state as st


def test_alloc_defaults():
    s = st.alloc_entity_state(16)
    assert s.capacity == 16
    assert int(st.entity_count(s)) == 0
    np.testing.assert_allclose(np.asarray(s.transform.rot[:, 0]), 1.0)
    assert np.all(np.asarray(s.body.body_type) == st.BODY_NONE)


def test_spawn_and_destroy():
    s = st.alloc_entity_state(8)
    slots = st.compact_free_slots(s, 3)
    np.testing.assert_array_equal(np.asarray(slots), [0, 1, 2])
    valid = jnp.ones(3, bool)
    s = st.spawn_entities(
        s,
        slots,
        valid,
        **{
            "transform.pos": jnp.asarray([[0.0, 1, 0], [1, 1, 0], [2, 1, 0]]),
            "body.body_type": jnp.full(3, st.BODY_DYNAMIC, jnp.int32),
        },
    )
    assert int(st.entity_count(s)) == 3
    np.testing.assert_allclose(np.asarray(s.transform.pos[1]), [1, 1, 0])
    assert int(s.body.body_type[2]) == st.BODY_DYNAMIC

    # destroy the middle one; its slot becomes free again, generation bumps
    kill = jnp.zeros(8, bool).at[1].set(True)
    gen_before = int(s.generation[1])
    s = st.destroy_entities(s, kill)
    assert int(st.entity_count(s)) == 2
    assert int(s.generation[1]) == gen_before + 1
    assert int(s.body.body_type[1]) == st.BODY_NONE
    slots = st.compact_free_slots(s, 1)
    assert int(slots[0]) == 1  # lowest free slot reused first


def test_spawn_overflow_drops():
    s = st.alloc_entity_state(4)
    slots = st.compact_free_slots(s, 6)
    # only 4 real slots; the rest are == capacity and must drop
    valid = slots < s.capacity
    assert int(valid.sum()) == 4
    s = st.spawn_entities(s, slots, valid)
    assert int(st.entity_count(s)) == 4


def test_spawn_under_jit_and_vmap():
    def spawn_two(s, xs):
        slots = st.compact_free_slots(s, 2)
        return st.spawn_entities(
            s, slots, slots < s.capacity, **{"transform.pos": xs}
        )

    batch = jax.vmap(st.alloc_entity_state, axis_size=5, in_axes=None)(8)
    xs = jnp.tile(jnp.asarray([[0.0, 2, 0], [1, 2, 0]]), (5, 1, 1))
    out = jax.jit(jax.vmap(spawn_two))(batch, xs)
    assert out.alive.shape == (5, 8)
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(st.entity_count)(out)), np.full(5, 2)
    )
