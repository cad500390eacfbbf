"""Round-5 probe C: carried-chord mode for the 1D rxn-diff schedule.

The exact-Newton TPU record for BASELINE config 1 is 793 ms/step
(0.21x one CPU core) — 1D is launch-latency-bound and the schedule
averages 6.4 iterations/step against the emulated-f64 stagnation floor.
The carried-factor chord mode (timeloop.make_carried_step, the 1D
variant that carries the f64 CR factorization) should collapse warm
steps to ~1 residual evaluation: the transient settles, the chord
predictor starts near the solution, and acceptance (now including the
stagnation exit) certifies immediately.  Measure ms/step + parity vs
the exact path on TPU.
"""
import os
import sys
import time

os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import dataclasses

from gmpnp_tpu.models import rxn_diff_1d
from gmpnp_tpu.solve.timeloop import make_carried_step, make_implicit_step

cfg = rxn_diff_1d.RxnDiff1DConfig(L_n=50.0e-6)
prog = rxn_diff_1d.build(cfg)
N = prog.space.num_vertices
n = prog.num_steps
CHUNK = 20

lin_c = dataclasses.replace(cfg.linear, refresh="carried")
step_c, prep_init = make_carried_step(prog.space, prog.form, cfg.newton,
                                      lin_c, bc_of_theta=lambda th: prog.bc)
step_e = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                            bc_of_theta=lambda theta: prog.bc)

accel = jax.devices()[0]
u0 = jax.device_put(jnp.ones((N, 5)), accel)


def chunk_carried(carry):
    def body(c, i):
        u, prep = c
        u2, st, prep = step_c(u, prog.theta, prep)
        return (u2, prep), (st.newton_iters, st.converged)

    return jax.lax.scan(body, carry, jnp.arange(CHUNK))


def chunk_exact(u):
    def body(u, i):
        u2, st = step_e(u, prog.theta)
        return u2, (st.newton_iters, st.converged)

    return jax.lax.scan(body, u, jnp.arange(CHUNK))


def run_carried():
    prep0 = jax.jit(prep_init)(u0, prog.theta)
    rc = jax.jit(chunk_carried).lower((u0, prep0)).compile()
    carry = (u0, prep0)
    t0 = time.time()
    iters = nc = 0
    for _ in range(n // CHUNK):
        carry, (it, cv) = rc(carry)
        iters += int(np.asarray(it).sum())
        nc += int((~np.asarray(cv)).sum())
    u_fin = carry[0]
    jax.block_until_ready(u_fin)
    return np.asarray(u_fin), time.time() - t0, iters, nc


def run_exact():
    re = jax.jit(chunk_exact).lower(u0).compile()
    u = u0
    t0 = time.time()
    iters = nc = 0
    for _ in range(n // CHUNK):
        u, (it, cv) = re(u)
        iters += int(np.asarray(it).sum())
        nc += int((~np.asarray(cv)).sum())
    jax.block_until_ready(u)
    return np.asarray(u), time.time() - t0, iters, nc


u_c, t_c, it_c, nc_c = run_carried()
print(f"carried: {t_c:.1f}s = {t_c / n * 1e3:.1f} ms/step, "
      f"{it_c} iters, nonconv={nc_c}", flush=True)
u_e, t_e, it_e, nc_e = run_exact()
print(f"exact:   {t_e:.1f}s = {t_e / n * 1e3:.1f} ms/step, "
      f"{it_e} iters, nonconv={nc_e}", flush=True)
rel = np.linalg.norm(u_c - u_e) / np.linalg.norm(u_e)
print(f"carried-vs-exact final-state rel-L2 = {rel:.3e}", flush=True)
