"""probe O: V=-12.5 cold-start convergence (VERDICT r2 item 3).

The 1D EDL run at voltage_multiplier=-12.5 (the hardest published config:
steric denominator stress, SURVEY.md 7) diverges from the FIRST step at
the reference dt=1e-5 (50/50 Newton iters, |r| -> NaN).  This probe asks
what rescues the cold start on CPU:
  a) plain damped Newton (reference semantics)   -- expected FAIL
  b) Armijo backtracking (NewtonConfig.backtracking=4)
  c) dt cuts (make_recovering_step, retries 3/6)
  d) backtracking + retries together
Run: python probes/probe_r3_o.py
"""
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import edl_1d
from gmpnp_tpu.solve.timeloop import (
    make_implicit_step,
    make_recovering_step,
    run_transient,
)

N_STEPS = 6


def attempt(label, backtracking=0, retries=0, dt_mult=1.0):
    cfg = edl_1d.EDL1DConfig(
        voltage_multiplier=-12.5, L_n=1.0e-6, dry_run=True)
    cfg = dataclasses.replace(cfg, newton=dataclasses.replace(
        cfg.newton, backtracking=backtracking))
    prog = edl_1d.build(cfg)
    if retries > 0:
        step = make_recovering_step(
            prog.space, prog.form, cfg.newton, cfg.linear,
            bc_of_theta=lambda theta: prog.bc, max_retries=retries)
    else:
        step = make_implicit_step(
            prog.space, prog.form, cfg.newton, cfg.linear,
            bc_of_theta=lambda theta: prog.bc)
    u0 = jnp.concatenate(
        [jnp.ones((prog.space.num_vertices, 6)),
         jnp.zeros((prog.space.num_vertices, 1))], axis=1)

    def theta_of_carry(carry, i):
        th = prog._theta_of_carry(carry, i)
        th["dt"] = th["dt"] * dt_mult
        return th

    (_, _), (u_hist, stats) = run_transient(
        step, (u0, jnp.asarray(0.0)), N_STEPS,
        theta_of_carry=theta_of_carry,
        update_carry=prog._update_carry)
    conv = np.asarray(stats.converged)
    iters = np.asarray(stats.newton_iters)
    rn = np.asarray(stats.residual_norm)
    scale = np.asarray(stats.dt_scale)
    fin = np.isfinite(np.asarray(u_hist[-1])).all()
    print(f"[{label}] conv={conv.tolist()} iters={iters.tolist()} "
          f"dt_scale={scale.tolist() if scale.ndim else scale} "
          f"|r|={rn[-1]:.2e} finite={fin}", flush=True)


if __name__ == "__main__":
    attempt("plain")
    attempt("bt4", backtracking=4)
    attempt("retry3", retries=3)
    attempt("bt4+retry3", backtracking=4, retries=3)
    attempt("dt/10", dt_mult=0.1)
    attempt("dt/100", dt_mult=0.01)
