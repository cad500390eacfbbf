"""Probe: sharded slab_direct + GMRES at n_dev=2 — inspect Newton
trajectory (iters, resnorm, Krylov counts) to see whether GMRES converges
per solve and where the step diverges from the reference."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.parallel.shard import ZShardPlan, make_sharded_step
from gmpnp_tpu.solve.timeloop import (LinearConfig, NewtonConfig,
                                      make_implicit_step)

n_dev = 2
cfg = pore_3d.Pore3DConfig(
    physics="GMPNP", mesh_resolution=(2, 16),
    newton=NewtonConfig(max_iter=50, rtol=1e-10, atol=1e-10,
                        relaxation=0.9),
    linear=LinearConfig(kind="bicgstab", tol=1e-10, maxiter=4000,
                        precond="block_jacobi"))
prog = pore_3d.build(cfg)
nf = cfg.n_fields
ns = len(cfg.species)
N = prog.space.num_vertices
theta = {"dt": jnp.asarray(prog.dt_scaled),
         "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}
bc = prog._bc_of_theta(theta)
u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)

step1 = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                           bc_of_theta=lambda th: bc)
u_ref, stats_ref = step1(u0, theta)
print(f"ref: conv={bool(stats_ref.converged)} "
      f"iters={int(stats_ref.newton_iters)}")

mask = np.asarray(bc.mask)
vals = np.asarray(bc.values)
plan = ZShardPlan.build(prog.mesh, nf, n_dev, mask, vals,
                        quad_degree=cfg.quad_degree)
for max_newton in (1, 2, 3, 50):
    step_sh, dev_mesh, u_shd = make_sharded_step(
        plan, prog.form, jax.devices()[:n_dev],
        newton_max_iter=max_newton, newton_rtol=1e-10, newton_atol=1e-10,
        relaxation=0.9, krylov_tol=1e-10, krylov_maxiter=600,
        linear="slab_direct")
    N_pad = plan.n_dev * plan.N_p
    u0_pad = jnp.zeros((N_pad, nf)).at[:N].set(u0)
    u0_sh = jax.device_put(u0_pad, u_shd)
    u_new, (iters, conv, rn, lin) = step_sh(u0_sh, u0_sh, theta)
    err = (np.linalg.norm(np.asarray(u_new)[:N] - np.asarray(u_ref))
           / np.linalg.norm(np.asarray(u_ref)))
    print(f"maxN={max_newton}: iters={int(iters)} conv={bool(conv)} "
          f"|r|={float(rn):.3e} lin={int(lin)} err_vs_ref={err:.3e}")
