"""Probe: scipy BiCGStab on the real global Jacobian, preconditioned by
the per-device F32 banded applies (exactly the sharded precond chain) —
separates 'f32 apply breaks BiCGStab' from 'our bicgstab_sharded is the
problem'."""
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
from gmpnp_tpu.parallel.shard import ZShardPlan, SlabPrecondPlan
from gmpnp_tpu.solve.slab import slab_factor, slab_solve

cfg = pore_3d.Pore3DConfig(physics="GMPNP", mesh_resolution=(2, 16))
prog = pore_3d.build(cfg)
nf = cfg.n_fields
ns = len(cfg.species)
N = prog.space.num_vertices
theta = {"dt": jnp.asarray(prog.dt_scaled),
         "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}
bc = prog._bc_of_theta(theta)
u0 = bc.project(jnp.ones((N, nf)).at[:, ns].set(0.0))
A4 = np.asarray(bc.apply_to_jacobian(
    prog.space.jacobian(prog.form, u0, u0, theta)).to_dense())
A = A4.reshape(N * nf, N * nf)
r = np.asarray(bc.apply_to_residual(
    prog.space.residual(prog.form, u0, u0, theta), u0)).reshape(-1)
x_direct = np.linalg.solve(A, r)

plan = ZShardPlan.build(prog.mesh, nf, 2, np.asarray(bc.mask),
                        np.asarray(bc.values), quad_degree=cfg.quad_degree)
pp = SlabPrecondPlan.build(plan)
N_p = plan.N_p
S, m_v, m = pp.S, pp.m_v, pp.m
pad = S * m_v - N_p
eye = np.eye(nf)
print(f"N={N} N_p={N_p} S={S} m_v={m_v} pad={pad}")

A4v = A4.reshape(N, nf, N, nf)
applies = []
for p in range(2):
    lo, hi = p * N_p, min((p + 1) * N_p, N)
    n_own = hi - lo
    ident = np.asarray(plan.bc_mask[p]) | (~np.asarray(plan.valid[p]))[:, None]
    Dblk = np.zeros((N_p, nf, nf))
    for i in range(n_own):
        Dblk[i] = A4v[lo + i, :, lo + i, :]
    for i in range(N_p):
        for fld in range(nf):
            if ident[i, fld] or i >= n_own:
                Dblk[i, fld, :] = 0.0
                Dblk[i, fld, fld] = 1.0
    Dinv = np.linalg.inv(Dblk)
    B4 = np.zeros((S, m_v, 3 * m_v, nf, nf))
    for i in range(n_own):
        s_r, i_r = divmod(i, m_v)
        for j in range(max(0, i - m_v), min(n_own, i + m_v + 1)):
            s_q, i_q = divmod(j, m_v)
            band = s_q - s_r
            if abs(band) <= 1:
                B4[s_r, i_r, (band + 1) * m_v + i_q] = A4v[lo + i, :, lo + j]
    identp = ident.copy()
    identp[n_own:] = True
    if pad:
        identp = np.concatenate([identp, np.ones((pad, nf), bool)], 0)
    identp4 = identp.reshape(S, m_v, nf)
    donehot = np.zeros((m_v, 3 * m_v))
    donehot[np.arange(m_v), m_v + np.arange(m_v)] = 1.0
    B4r = np.where(identp4[:, :, None, :, None], 0.0, B4)
    B4r = B4r + (identp4[:, :, None, :, None]
                 * donehot[None, :, :, None, None] * eye[None, None, None])
    Dvp = Dinv
    if pad:
        Dvp = np.concatenate([Dinv, np.broadcast_to(eye, (pad, nf, nf))], 0)
    B4e = np.einsum("sirt,sijtg->sijrg", Dvp.reshape(S, m_v, nf, nf), B4r)
    B = B4e.transpose(0, 1, 3, 2, 4).reshape(S, m, 3 * m)
    fac = slab_factor(jnp.asarray(B[:, :, :m], jnp.float32),
                      jnp.asarray(B[:, :, m:2 * m], jnp.float32),
                      jnp.asarray(B[:, :, 2 * m:], jnp.float32))

    def make_apply(fac, Dinv, n_own):
        def apply(rr):
            b = np.einsum("nfg,ng->nf", Dinv, rr)
            if pad:
                b = np.concatenate([b, np.zeros((pad, nf))], 0)
            x = np.asarray(slab_solve(
                fac, jnp.asarray(b.reshape(S, m), jnp.float32)))
            return x.reshape(S * m_v, nf)[:N_p].astype(np.float64)
        return apply

    applies.append(make_apply(fac, Dinv, n_own))


def M_apply(v):
    v2 = np.zeros((2 * N_p, nf))
    v2[:N] = v.reshape(N, nf)
    out = np.concatenate([applies[0](v2[:N_p]), applies[1](v2[N_p:])])
    return out[:N].reshape(-1)


M = spla.LinearOperator(A.shape, matvec=M_apply)
for rtol in (1e-6, 1e-10):
    xs, info = spla.bicgstab(spla.aslinearoperator(A), r, M=M, rtol=rtol,
                             maxiter=600)
    rel = np.linalg.norm(xs - x_direct) / np.linalg.norm(x_direct)
    print(f"scipy bicgstab + f32-band precond rtol={rtol}: info={info} "
          f"err={rel:.3e}")
xs, info = spla.gmres(spla.aslinearoperator(A), r, M=M, rtol=1e-10,
                      restart=100, maxiter=600)
rel = np.linalg.norm(xs - x_direct) / np.linalg.norm(x_direct)
print(f"scipy gmres + f32-band precond: info={info} err={rel:.3e}")
