"""Micro-bench the planar Pallas kernels in isolation (chained scans,
host-read-verified — CLAUDE.md quirks 10/12).

Times, at the headline fleet shape (1024 envs x 64 bodies, P=128):
  * the fleet SAT narrowphase kernel vs the vmapped XLA reference,
  * the fleet solve-iteration kernel vs the vmapped XLA loop,
with a trivial per-step perturbation so XLA cannot hoist the body out of
the scan. Pallas kernels compile in seconds (CLAUDE.md quirk 3), so this
gives stage truth minutes after a planar.py edit instead of the ~30 min
full-step compile round.

Usage: python scripts/bench_planar_kernels.py [--envs 1024] [--iters 20]
       [--cpu] [--sat] [--solve]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--bodies", type=int, default=64)
    ap.add_argument("--pairs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--solve-iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sat", action="store_true", help="SAT benches only")
    ap.add_argument("--solve", action="store_true", help="solve benches only")
    ap.add_argument("--mid", action="store_true",
                    help="fused middle kernel bench only")
    ap.add_argument("--quiet-wait", type=float, default=45.0)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from scx.physics import planar as pp

    interp = jax.default_backend() == "cpu"

    E, NB, P, N = args.envs, args.bodies, args.pairs, args.iters
    both = not (args.sat or args.solve or args.mid)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)

    runs = []

    if args.sat or both:
        # plausible box-pair operands: positions near origin, unit quats
        def mk_g(k):
            g = jax.random.normal(k, (E, 14, P), jnp.float32)
            g = g.at[:, 3, :].set(1.0)     # quat w
            g = g.at[:, 7, :].set(0.0)     # shape=box
            g = g.at[:, 8:11, :].set(0.5)  # size
            return g

        ga, gb = mk_g(ks[0]), mk_g(ks[1])
        pvf = jnp.ones((E, P), jnp.float32)

        def chain_sat_kernel(ga, gb, pvf):
            def body(c, _):
                ga, gb, pvf = c
                out = pp._sat_fleet_pallas(ga, gb, pvf, kinds=("box",),
                                           interpret=interp)
                # feed a scalar of the output back so steps chain
                d = jnp.sum(out[6][:, :1, :1]) * 1e-12
                return (ga + d, gb, pvf), None
            return jax.lax.scan(body, (ga, gb, pvf), None, length=N)[0]

        def chain_sat_ref(ga, gb, pvf):
            ref = jax.vmap(lambda *a: pp._sat_ref(*a, kinds=("box",)))

            def body(c, _):
                ga, gb, pvf = c
                out = ref(ga, gb, pvf)
                d = jnp.sum(out[6][:, :1, :1]) * 1e-12
                return (ga + d, gb, pvf), None
            return jax.lax.scan(body, (ga, gb, pvf), None, length=N)[0]

        runs.append(("sat_kernel", jax.jit(chain_sat_kernel), (ga, gb, pvf)))
        runs.append(("sat_xla", jax.jit(chain_sat_ref), (ga, gb, pvf)))

    if args.solve or both:
        R = pp._SOLVE_R
        jac = jax.random.normal(ks[2], (E, R, P), jnp.float32) * 0.1
        ia = jax.random.randint(ks[3], (E, P), 0, NB)
        ib = jax.random.randint(ks[4], (E, P), 0, NB)
        oh_a = jax.vmap(lambda i: pp._onehot(i, NB))(ia)
        oh_b = jax.vmap(lambda i: pp._onehot(i, NB))(ib)
        vw0 = jax.random.normal(ks[5], (E, 6, NB), jnp.float32)
        it = args.solve_iters

        def chain_solve_kernel(jac, oa, ob, vw):
            def body(c, _):
                jac, vw = c
                vw2, lam = pp._solve_fleet_pallas(
                    jac, oa, ob, vw, iterations=it, interpret=interp
                )
                return (jac + jnp.sum(lam) * 1e-12, vw2 * 0.5), None
            return jax.lax.scan(body, (jac, vw), None, length=N)[0]

        def chain_solve_xla(jac, oa, ob, vw):
            core = jax.vmap(
                lambda *a: pp._solve_iter_core(*a, iterations=it)
            )

            def body(c, _):
                jac, vw = c
                vw2, lam = core(jac, oa, ob, vw)
                return (jac + jnp.sum(lam) * 1e-12, vw2 * 0.5), None
            return jax.lax.scan(body, (jac, vw), None, length=N)[0]

        sargs = (jac, oh_a, oh_b, vw0)
        runs.append(("solve_kernel", jax.jit(chain_solve_kernel), sargs))
        runs.append(("solve_xla", jax.jit(chain_solve_xla), sargs))

    if args.mid:
        from scx import physics as ph

        params = ph.SolverParams(
            max_pairs=P, iterations=args.solve_iters, shape_kinds=("box",)
        )
        import bench as bench_mod

        batch = jax.vmap(pp.planar_from_rigid)(bench_mod.build_batch(E, NB))
        rows = jax.vmap(pp._middle_rows)(batch)
        ia = jax.random.randint(ks[6], (E, P), 0, NB)
        ib = jax.random.randint(ks[7], (E, P), 0, NB)
        pvf = jnp.ones((E, P), jnp.float32)
        prev = jnp.zeros((E, 4 * pp._K, P), jnp.float32)
        vw0 = jax.random.normal(ks[8], (E, 6, NB), jnp.float32) * 0.1

        def chain_mid(rows, ia, ib, pvf, prev, vw0):
            def body(c, _):
                rows, vw0 = c
                out = pp._middle_fleet_pallas(
                    rows, ia, ib, pvf, prev, vw0,
                    params=params, kinds=("box",), interpret=interp,
                )
                d = jnp.sum(out[0][:, :1, :1]) * 1e-12
                return (rows + d, out[0][:, :6, :]), None
            return jax.lax.scan(body, (rows, vw0), None, length=N)[0]

        runs.append(("mid_kernel", jax.jit(chain_mid),
                     (rows, ia, ib, pvf, prev, vw0)))

    def force(out):
        return float(sum(jnp.sum(jnp.asarray(o)) for o in jax.tree.leaves(out)))

    compiled = {}
    for name, fn, arg in runs:
        t0 = time.time()
        out = fn(*arg)
        force(out)
        compiled[name] = (fn, arg)
        print(f"compiled+first {name} in {time.time()-t0:.1f}s", flush=True)

    if jax.default_backend() != "cpu":
        print(f"quiet wait {args.quiet_wait:.0f}s...", flush=True)
        time.sleep(args.quiet_wait)

    for name, (fn, arg) in compiled.items():
        t0 = time.time()
        out = fn(*arg)
        force(out)
        dt_ms = (time.time() - t0) / N * 1e3
        print(f"{name:>14}: {dt_ms:8.3f} ms/fleet-step", flush=True)


if __name__ == "__main__":
    main()
