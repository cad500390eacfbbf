"""Probe: sharded slab_direct preconditioner — isolate non-convergence.

Runs the test_sharded_pore_step_matches_single_device scenario at
n_dev=1 (precond should be near-exact -> few iters) and n_dev=2.
CPU virtual mesh.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")  # jax is pre-imported; env var is too late
import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.parallel.shard import ZShardPlan, SlabPrecondPlan, \
    make_sharded_step
from gmpnp_tpu.solve.timeloop import LinearConfig, NewtonConfig, \
    make_implicit_step

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
mask = np.asarray(bc.mask)
vals = np.asarray(bc.values)

step1 = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                           bc_of_theta=lambda th: bc)
u_ref, stats_ref = step1(u0, theta)
print("single-device ref: conv", bool(stats_ref.converged),
      "iters", int(stats_ref.newton_iters),
      "lin", int(stats_ref.linear_iters))

devices = jax.devices()
for n_dev in (1, 2):
    plan = ZShardPlan.build(prog.mesh, nf, n_dev, mask, vals,
                            quad_degree=cfg.quad_degree)
    pp = SlabPrecondPlan.build(plan)
    print(f"n_dev={n_dev}: N_p={plan.N_p} H={plan.H} S={pp.S} m_v={pp.m_v}"
          f" m={pp.m} cover_frac={pp.cover.mean(axis=1)}")
    step_sh, dev_mesh, u_shd = make_sharded_step(
        plan, prog.form, devices[:n_dev],
        newton_max_iter=50, newton_rtol=1e-10, newton_atol=1e-10,
        relaxation=0.9, krylov_tol=1e-10, krylov_maxiter=4000,
        linear="slab_direct")
    N_pad = plan.n_dev * plan.N_p
    u0_pad = jnp.zeros((N_pad, nf)).at[:N].set(u0)
    u0_sh = jax.device_put(u0_pad, u_shd)
    u_new, (iters, conv, rn, lin) = step_sh(u0_sh, u0_sh, theta)
    err = np.linalg.norm(np.asarray(u_new)[:N] - np.asarray(u_ref)) / \
        np.linalg.norm(np.asarray(u_ref))
    print(f"  conv={bool(conv)} iters={int(iters)} lin={int(lin)}"
          f" rn={float(rn):.3e} err={err:.3e}")
