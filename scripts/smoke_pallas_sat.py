"""On-chip smoke of the Pallas fleet SAT kernel: Mosaic lowering + A/B vs
the vmapped XLA reference on a small mixed fleet. Bounded by the caller's
timeout; ends with HOST READS (CLAUDE.md quirk 12).

Usage: timeout 600 python scripts/smoke_pallas_sat.py [--envs 64]
"""
import argparse, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    args = ap.parse_args()
    from scx.physics import planar as pp
    from test_physics_planar import _fleet_sat_inputs

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    print("probe _kernel_supported:", pp._kernel_supported(),
          f"({time.time()-t0:.1f}s)", flush=True)
    ga, gb, pvf = _fleet_sat_inputs(args.envs)
    t0 = time.time()
    ker = jax.jit(pp._sat_fleet_pallas)(ga, gb, pvf)
    ks = float(jnp.sum(ker[6])) + float(jnp.sum(ker[7]))
    print(f"kernel compiled+ran in {time.time()-t0:.1f}s (checksum {ks:.3f})",
          flush=True)
    t0 = time.time()
    ref = jax.jit(jax.vmap(pp._sat_ref))(ga, gb, pvf)
    rs = float(jnp.sum(ref[6])) + float(jnp.sum(ref[7]))
    print(f"xla ref compiled+ran in {time.time()-t0:.1f}s (checksum {rs:.3f})",
          flush=True)
    vr = np.asarray(ref[7]) > 0.5
    vk = np.asarray(ker[7]) > 0.5
    dis = vr != vk
    if dis.any():
        graze = np.abs(np.where(vr, np.asarray(ref[6]), np.asarray(ker[6])))[dis].max()
        print(f"validity disagreements: {int(dis.sum())} max|depth| {graze:.2e}")
        assert graze < 1e-5, "non-graze disagreement ON CHIP"
    both = vr & vk
    for i, nm in enumerate("ptx pty ptz nmx nmy nmz depth".split()):
        d = np.abs(np.asarray(ref[i]) - np.asarray(ker[i]))[both].max()
        assert d < 1e-4, (nm, d)
        print(f"{nm}: max|diff| on {int(both.sum())} common-valid = {d:.2e}")
    cid = (np.asarray(ref[8]) != np.asarray(ker[8])) & both
    assert cid.sum() == 0, "cand id mismatch on chip"
    print("ON-CHIP SMOKE PASS", flush=True)


if __name__ == "__main__":
    main()
