"""Probe: is 2-block non-overlapping additive Schwarz (exact local
solves) a sound preconditioner for the REAL first-iteration GMPNP
Jacobian — in exact arithmetic?

Takes the single-device BlockELL Jacobian at u0 (row-replaced), builds
M = blockdiag(A11, A22) with exact dense local solves, runs scipy
BiCGStab and GMRES with/without M.  If BiCGStab breaks down here too,
the sharded divergence is a Krylov-method/math issue, not an
implementation bug.
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
import scipy.sparse.linalg as spla

from gmpnp_tpu.models import pore_3d

cfg = pore_3d.Pore3DConfig(physics="GMPNP", mesh_resolution=(2, 16))
prog = pore_3d.build(cfg)
nf = cfg.n_fields
ns = len(cfg.species)
N = prog.space.num_vertices
theta = {"dt": jnp.asarray(prog.dt_scaled),
         "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}
bc = prog._bc_of_theta(theta)
u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
u0 = bc.project(u0)

J = prog.space.jacobian(prog.form, u0, u0, theta)
J = bc.apply_to_jacobian(J)
A = np.asarray(J.to_dense()).reshape(N * nf, N * nf)
r = np.asarray(bc.apply_to_residual(
    prog.space.residual(prog.form, u0, u0, theta), u0)).reshape(-1)
print(f"N={N} n={A.shape[0]} |r0|={np.linalg.norm(r):.3e} "
      f"cond-ish diag range {np.abs(np.diag(A)).min():.2e}"
      f"..{np.abs(np.diag(A)).max():.2e}")

x_direct = np.linalg.solve(A, r)
print("direct |x|:", np.linalg.norm(x_direct))

half = (N // 2) * nf
A11 = A[:half, :half]
A22 = A[half:, half:]
lu1 = spla.splu(__import__("scipy.sparse", fromlist=["csc_matrix"])
                .csc_matrix(A11))
lu2 = spla.splu(__import__("scipy.sparse", fromlist=["csc_matrix"])
                .csc_matrix(A22))


def M_apply(v):
    return np.concatenate([lu1.solve(v[:half]), lu2.solve(v[half:])])


M = spla.LinearOperator(A.shape, matvec=M_apply)

for name, fn in (("bicgstab", spla.bicgstab), ("gmres", spla.gmres)):
    kw = dict(rtol=1e-10, maxiter=2000)
    if name == "gmres":
        kw["restart"] = 100
    xs, info = fn(spla.aslinearoperator(A), r, M=M, **kw)
    rel = np.linalg.norm(xs - x_direct) / np.linalg.norm(x_direct)
    print(f"{name}+schwarz2: info={info} err={rel:.3e}")

# reference without precond
xs, info = spla.bicgstab(spla.aslinearoperator(A), r, rtol=1e-10,
                         maxiter=5000)
rel = np.linalg.norm(xs - x_direct) / np.linalg.norm(x_direct)
print(f"bicgstab bare: info={info} err={rel:.3e}")
