"""Phase scheduler: ordering, deps, fixed-step clock, composed jit tick."""

import jax
import jax.numpy as jnp
import pytest

from scx.state.scheduler import FixedStepClock, Phase, Scheduler


def test_topological_order_with_deps():
    order = []

    def mk(name):
        def fn(state, ctx):
            order.append(name)
            return state

        return fn

    s = Scheduler()
    s.add_system("c", Phase.SIMULATION, mk("c"), deps=("b",))
    s.add_system("a", Phase.SIMULATION, mk("a"))
    s.add_system("b", Phase.SIMULATION, mk("b"), deps=("a",))
    s.finalize()
    names = [d.name for d in s.phase_systems(Phase.SIMULATION)]
    assert names.index("a") < names.index("b") < names.index("c")


def test_unsatisfiable_deps_fall_back():
    s = Scheduler()
    s.add_system("x", Phase.SIMULATION, lambda st, c: st, deps=("y",))
    s.add_system("y", Phase.SIMULATION, lambda st, c: st, deps=("x",))
    s.finalize()  # warns, falls back to insertion order
    assert [d.name for d in s.phase_systems(Phase.SIMULATION)] == ["x", "y"]


def test_duplicate_name_rejected():
    s = Scheduler()
    s.add_system("x", Phase.INPUT, lambda st, c: st)
    with pytest.raises(ValueError):
        s.add_system("x", Phase.INPUT, lambda st, c: st)


def test_fixed_step_clock():
    clk = FixedStepClock(fixed_dt=1 / 60, max_substeps=4)
    assert clk.advance(1 / 60) == 1
    assert clk.advance(3 / 60) == 3
    # huge frame clamps to max substeps (main.cpp:269-270 semantics)
    assert clk.advance(1.0) == 4
    # paused -> one zero-dt step
    clk.paused = True
    assert clk.advance(1 / 60) == 1


def test_compose_tick_jits():
    s = Scheduler()
    s.add_system(
        "accumulate", Phase.FIXED_UPDATE,
        lambda st, ctx: st + ctx["dt"],
    )
    s.add_system("double", Phase.RENDER_PREP, lambda st, ctx: st * 2.0)
    s.finalize()
    tick = jax.jit(s.compose_tick(max_fixed_steps=4))
    out = tick(
        jnp.asarray(0.0),
        {"dt": 0.0, "fixed_dt": jnp.asarray(0.25), "n_fixed_steps": jnp.int32(2)},
    )
    # two active substeps of +0.25 then doubled
    assert float(out) == 1.0
