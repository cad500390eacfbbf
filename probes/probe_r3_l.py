"""Probe: replicate bicgstab_sharded (TINY guards + health horizon)
in numpy on the real global system with the exact 2-block Schwarz
preconditioner (f64 dense local solves) — if THIS breaks down where
scipy.bicgstab converged (probe_r3_i info=0), our algorithm variant is
the problem (e.g. residual spike tripping the 1e12 horizon)."""
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
from scipy.sparse import csc_matrix

from gmpnp_tpu.models import pore_3d

cfg = pore_3d.Pore3DConfig(physics="GMPNP", mesh_resolution=(2, 16))
prog = pore_3d.build(cfg)
nf = cfg.n_fields
ns = len(cfg.species)
N = prog.space.num_vertices
theta = {"dt": jnp.asarray(prog.dt_scaled),
         "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}
bc = prog._bc_of_theta(theta)
u0 = bc.project(jnp.ones((N, nf)).at[:, ns].set(0.0))
A = np.asarray(bc.apply_to_jacobian(
    prog.space.jacobian(prog.form, u0, u0, theta)).to_dense())
A = A.reshape(N * nf, N * nf)
r0 = np.asarray(bc.apply_to_residual(
    prog.space.residual(prog.form, u0, u0, theta), u0)).reshape(-1)
x_direct = np.linalg.solve(A, r0)

half = (N // 2) * nf
lu1 = spla.splu(csc_matrix(A[:half, :half]))
lu2 = spla.splu(csc_matrix(A[half:, half:]))


def Minv(v):
    return np.concatenate([lu1.solve(v[:half]), lu2.solve(v[half:])])


def bicgstab_ours(matvec, Minv, b, tol, maxiter, horizon=1e12):
    TINY = 1e-30
    guard = lambda x: TINY if abs(x) < TINY else x
    x = np.zeros_like(b)
    r = b - matvec(x)
    rhat = r.copy()
    target = max(tol * np.linalg.norm(b), TINY)
    p_ = np.zeros_like(b)
    v = np.zeros_like(b)
    rho = alpha = omega = 1.0
    spike_max = 0.0
    for it in range(maxiter):
        rn = np.linalg.norm(r)
        spike_max = max(spike_max, rn)
        healthy = (np.isfinite(rn) and np.isfinite(rho)
                   and np.isfinite(omega) and abs(rho) > TINY
                   and abs(omega) > TINY and rn < horizon)
        if rn <= target or not healthy:
            return x, it, rn, healthy, spike_max
        rho_new = rhat @ r
        beta = (rho_new / guard(rho)) * (alpha / guard(omega))
        p_ = r + beta * (p_ - omega * v)
        phat = Minv(p_)
        v = matvec(phat)
        alpha = rho_new / guard(rhat @ v)
        s = r - alpha * v
        shat = Minv(s)
        t = matvec(shat)
        omega = (t @ s) / guard(t @ t)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        rho = rho_new
    return x, maxiter, np.linalg.norm(r), True, spike_max


x, it, rn, healthy, spike = bicgstab_ours(
    lambda v: A @ v, Minv, r0, 1e-10, 2000)
rel = np.linalg.norm(x - x_direct) / np.linalg.norm(x_direct)
print(f"ours: it={it} rn={rn:.3e} healthy={healthy} spike_max={spike:.3e} "
      f"err={rel:.3e} |b|={np.linalg.norm(r0):.3e}")
