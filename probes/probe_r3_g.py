"""Probe: n_dev=2 slab-precond divergence bisection on the REAL system.

One Newton iteration (newton_max_iter=1) at n_dev=2, comparing
linear='slab_direct' vs 'bicgstab_jacobi' du and Krylov counts, with
per-iteration resolution: if slab's BiCGStab hits maxiter its x is junk
(quality/consistency issue); if lin is small but du differs from the
jacobi reference, the apply is inconsistent inside shard_map.
"""
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
from gmpnp_tpu.parallel.shard import ZShardPlan, SlabPrecondPlan, \
    make_sharded_step

cfg = pore_3d.Pore3DConfig(physics="GMPNP", mesh_resolution=(2, 16))
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

devices = jax.devices()
n_dev = 2
plan = ZShardPlan.build(prog.mesh, nf, n_dev, mask, vals,
                        quad_degree=cfg.quad_degree)
pp = SlabPrecondPlan.build(plan)
print(f"n_dev={n_dev}: N_p={plan.N_p} H={plan.H} S={pp.S} m_v={pp.m_v} "
      f"m={pp.m} cover_frac={pp.cover.mean(axis=1)}")
N_pad = plan.n_dev * plan.N_p
u0_pad = jnp.zeros((N_pad, nf)).at[:N].set(u0)

for kmax in (4000, 400):
    for lin_kind in ("bicgstab_jacobi", "slab_direct"):
        step_sh, dev_mesh, u_shd = make_sharded_step(
            plan, prog.form, devices[:n_dev],
            newton_max_iter=1, newton_rtol=1e-10, newton_atol=1e-10,
            relaxation=0.9, krylov_tol=1e-10, krylov_maxiter=kmax,
            linear=lin_kind)
        u0_sh = jax.device_put(u0_pad, u_shd)
        u_new, (iters, conv, rn, lin) = step_sh(u0_sh, u0_sh, theta)
        du = np.asarray(u_new)[:N] - np.asarray(u0_pad)[:N]
        print(f"kmax={kmax} {lin_kind}: lin={int(lin)} rn={float(rn):.3e} "
              f"|du|={np.linalg.norm(du):.6e} "
              f"finite={np.isfinite(du).all()}")
