"""Round-3 probe: carried-factor chord Newton vs exact Newton on TPU.

The warm 3D Newton iteration at the shipped L_50_R_5 mesh (N=3,679)
spends asm 450 + factor 217 + equil 61 of ~800 ms rebuilding the slab
factorization (probe_r3_v).  LinearConfig.refresh='carried' carries the
factorization across time steps and refreshes lazily (non-convergence or
> refresh_iters Newton iterations).  This probe times the 8-step bench
window for refresh='iter' (the round-2 headline protocol) vs 'carried',
and checks the final states agree.

Usage: python probes/probe_r3_ad.py [cpu] [rxn_diff]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses
import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.solve.timeloop import make_carried_step, make_implicit_step

N_STEPS = 8
REPS = 3


def main():
    physics = "rxn_diff" if "rxn_diff" in sys.argv[1:] else "GMPNP"
    if "cpu" in sys.argv[1:]:
        os.environ.pop("GMPNP_UTILITIES", None)
        cfg0 = pore_3d.Pore3DConfig(physics=physics, L=50e-9, R=5e-9,
                                    mesh_resolution=(2, 11))
    else:
        cfg0 = pore_3d.Pore3DConfig(physics=physics, L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg0)
    nf, ns = cfg0.n_fields, len(cfg0.species)
    N = prog.space.num_vertices
    print(f"device: {jax.devices()[0]}  N={N}  physics={physics}", flush=True)
    u0 = jnp.ones((N, nf))
    if physics == "GMPNP":
        u0 = u0.at[:, ns].set(0.0)

    results = {}
    for mode in ("iter", "carried"):
        lin = dataclasses.replace(cfg0.linear, refresh=mode)
        if mode == "carried":
            step, prep_init = make_carried_step(
                prog.space, prog.form, cfg0.newton, lin,
                bc_of_theta=prog._bc_of_theta)

            def run(u0):
                th0 = prog._theta_of_carry((u0, jnp.asarray(0.0)),
                                           jnp.asarray(0))
                prep0 = prep_init(u0, th0)

                def body(carry, i):
                    u, extra, prep = carry
                    th = prog._theta_of_carry((u, extra), i)
                    u_new, st, prep = step(u, th, prep)
                    return (u_new, extra, prep), st.newton_iters

                (u, _, _), iters = jax.lax.scan(
                    body, (u0, jnp.asarray(0.0), prep0),
                    jnp.arange(N_STEPS))
                return u, iters
        else:
            step = make_implicit_step(prog.space, prog.form, cfg0.newton,
                                      lin, bc_of_theta=prog._bc_of_theta)

            def run(u0):
                def body(carry, i):
                    u, extra = carry
                    th = prog._theta_of_carry((u, extra), i)
                    u_new, st = step(u, th)
                    return (u_new, extra), st.newton_iters

                (u, _), iters = jax.lax.scan(
                    body, (u0, jnp.asarray(0.0)), jnp.arange(N_STEPS))
                return u, iters

        t0 = time.perf_counter()
        compiled = jax.jit(run).lower(u0).compile()
        t_compile = time.perf_counter() - t0
        out, iters = compiled(u0)
        chk = float(jnp.abs(out).sum())
        assert np.isfinite(chk), f"non-finite result in mode={mode}"
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out, iters = compiled(u0)
            float(jnp.abs(out).sum())
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        results[mode] = (np.asarray(out), t)
        print(f"{mode:8s} compile {t_compile:6.1f}s  "
              f"{t / N_STEPS * 1e3:8.1f} ms/step  "
              f"newton iters/step {np.asarray(iters)}", flush=True)

    a, ta = results["iter"]
    b, tb = results["carried"]
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    print(f"final-state rel-L2 iter vs carried: {rel:.3e}", flush=True)
    print(f"speedup: {ta / tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
