"""Round-3 probe: mixed-precision 1D direct solver (tridiag_mp_solve).

The 1D EDL single-config bench is the one headline still below 1x vs one
CPU core (BENCH_r02 edl1d.vs_baseline=0.835).  The all-f64 cyclic
reduction pays the TPU f64-emulation tax (~10x) on every level of batched
7x7 inverses; this probe measures the slab_direct recipe applied in 1D
(f32 CR factorization + f64 GMRES polish, linear.tridiag_mp_solve):

  part A (cpu):  8-step EDL dry-run window, f64-CR vs mixed — final-state
                 rel-L2 and Newton iteration counts must match.
  part B (tpu):  100-step EDL dry-run transient, ms/step f64-CR vs mixed
                 (AOT-compiled, median of 3).

Usage: python probes/probe_r3_u.py {cpu|tpu}
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

import jax

if sys.argv[1:] and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import edl_1d
from gmpnp_tpu.solve.timeloop import LinearConfig, make_implicit_step


def build_run(linear: LinearConfig, n_steps: int):
    cfg = edl_1d.EDL1DConfig(L_n=1.0e-6, dry_run=True, linear=linear)
    prog = edl_1d.build(cfg)
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=lambda theta: prog.bc)

    def run(u0):
        def body(carry, i):
            u, chf = carry
            th = prog._theta_of_carry((u, chf), i)
            u_new, st = step(u, th)
            chf = prog._update_carry(chf, u_new, i)
            return (u_new, chf), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, jnp.asarray(0.001 if cfg.H_OHP is not None else 0.0)),
            jnp.arange(n_steps))
        return u, iters

    N = prog.space.num_vertices
    u0 = jnp.concatenate([jnp.ones((N, 6)), jnp.zeros((N, 1))], axis=1)
    return run, u0


def timed(run, u0, reps=3):
    dev = jax.devices()[0]
    u0d = jax.device_put(u0, dev)
    t0 = time.perf_counter()
    cc = jax.jit(run).lower(u0d).compile()
    t_comp = time.perf_counter() - t0
    u, iters = cc(u0d)
    assert np.isfinite(float(jnp.abs(u).sum()))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        u, iters = cc(u0d)
        float(jnp.abs(u).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), t_comp, int(np.asarray(iters).sum()), u


def main():
    mode = sys.argv[1] if sys.argv[1:] else "cpu"
    f64 = LinearConfig(kind="tridiag_cr")
    mp = LinearConfig(kind="tridiag_cr", solve_dtype="f32")
    print("device:", jax.devices()[0], flush=True)

    if mode == "cpu":
        n = 8
        run_a, u0 = build_run(f64, n)
        run_b, _ = build_run(mp, n)
        ua, ia = jax.jit(run_a)(u0)
        ub, ib = jax.jit(run_b)(u0)
        rel = float(jnp.linalg.norm(ua - ub) / jnp.linalg.norm(ua))
        print(f"8-step final-state rel-L2 f64 vs mp: {rel:.3e}")
        print("newton iters f64:", np.asarray(ia))
        print("newton iters mp: ", np.asarray(ib))
        return

    n = 100
    for name, lin in (("f64-cr", f64), ("mp-f32cr", mp)):
        run, u0 = build_run(lin, n)
        t, t_comp, iters, u = timed(run, u0)
        print(f"{name}: {t/n*1e3:8.2f} ms/step  compile {t_comp:6.1f}s  "
              f"newton_iters {iters}", flush=True)


if __name__ == "__main__":
    main()
