"""Probe: bisect the slab-precond apply error (probe_r3_d: band == dense
to 8e-11 but apply vs dense solve rel err 0.77).

Builds the same equilibrated band as probe_r3_d, then compares
  (1) dense f64 solve of the block-tridiagonal band system
  (2) slab_factor/slab_solve in f64
  (3) slab_factor/slab_solve in f32 (the precond's configuration)
against the dense row-replaced reference solve.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
# jax is pre-imported at interpreter startup in this environment, so
# JAX_PLATFORMS env assignment is too late; the config update works until
# a backend initializes (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.parallel.shard import ZShardPlan, SlabPrecondPlan
from gmpnp_tpu.fem.assembly import _segment_reduce
from gmpnp_tpu.solve.slab import slab_factor, slab_solve

cfg = pore_3d.Pore3DConfig(physics="GMPNP", mesh_resolution=(2, 16))
prog = pore_3d.build(cfg)
nf = cfg.n_fields
N = prog.space.num_vertices
theta = {"dt": jnp.asarray(prog.dt_scaled),
         "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}
bc = prog._bc_of_theta(theta)
mask = np.asarray(bc.mask)
vals = np.asarray(bc.values)

plan = ZShardPlan.build(prog.mesh, nf, 1, mask, vals,
                        quad_degree=cfg.quad_degree)
pp = SlabPrecondPlan.build(plan)
N_p, H = plan.N_p, plan.H
S, m_v, m = pp.S, pp.m_v, pp.m
print(f"N={N} N_p={N_p} H={H} S={S} m_v={m_v} m={m}")

cells = np.asarray(plan.cells_l[0])
vols = np.asarray(plan.vols[0])
C_p, nv = cells.shape
rng = np.random.default_rng(0)
J_e = rng.normal(size=(C_p, nv, nv, nf, nf)) * 0.1
for a in range(nv):
    J_e[:, a, a] += np.eye(nf) * 3.0
J_e *= (vols > 0)[:, None, None, None, None]

Next = N_p + H
A = np.zeros((Next, nf, Next, nf))
for c in range(C_p):
    for a in range(nv):
        for b in range(nv):
            A[cells[c, a], :, cells[c, b], :] += J_e[c, a, b]
A_own = A[:N_p][:, :, :N_p]

ident = np.asarray(plan.bc_mask[0]) | (~np.asarray(plan.valid[0]))[:, None]

Dblk = np.zeros((N_p, nf, nf))
for i in range(N_p):
    Dblk[i] = A_own[i, :, i, :]
for i in range(N_p):
    for fld in range(nf):
        if ident[i, fld]:
            Dblk[i, fld, :] = 0.0
            Dblk[i, fld, fld] = 1.0
Dinv = np.linalg.inv(Dblk)

order_t = jnp.asarray(pp.order[0])
start_t = jnp.asarray(pp.start[0])
end_t = jnp.asarray(pp.end[0])
cover_t = np.asarray(pp.cover[0])

vals_flat = jnp.asarray(J_e.reshape(-1, nf * nf))
bsum = np.asarray(_segment_reduce(vals_flat, order_t, start_t, end_t))
B4 = bsum.reshape(S, m_v, 3 * m_v, nf, nf)

pad = S * m_v - N_p
eye = np.eye(nf)
Dv = np.concatenate([Dinv, np.broadcast_to(eye, (pad, nf, nf))], 0) \
    if pad else Dinv
identm = ident | (~cover_t)[:, None]
if pad:
    identm = np.concatenate([identm, np.ones((pad, nf), bool)], 0)
Dv4 = Dv.reshape(S, m_v, nf, nf)
B4e = np.einsum("sirt,sijtg->sijrg", Dv4, B4)
B = B4e.transpose(0, 1, 3, 2, 4).reshape(S, m, 3 * m)
eye_band = np.concatenate(
    [np.zeros((m, m)), np.eye(m), np.zeros((m, m))], axis=1)
B = np.where(identm.reshape(S, m)[:, :, None], eye_band[None], B)

rr = rng.normal(size=(N_p, nf))
b = np.einsum("nfg,ng->nf", Dinv, rr)
if pad:
    b = np.concatenate([b, np.zeros((pad, nf))], 0)
bS = b.reshape(S, m)

# dense reference on the ORIGINAL row-replaced system
A_rr = A_own.reshape(N_p * nf, N_p * nf).copy()
for i in range(N_p):
    for fld in range(nf):
        if ident[i, fld]:
            A_rr[i * nf + fld, :] = 0.0
            A_rr[i * nf + fld, i * nf + fld] = 1.0
x_dense = np.linalg.solve(A_rr, rr.reshape(-1)).reshape(N_p, nf)

# (1) dense f64 solve of the BAND system itself
Afull = np.zeros((S * m, S * m))
for s in range(S):
    lo, di, up = B[s, :, :m], B[s, :, m:2 * m], B[s, :, 2 * m:]
    Afull[s * m:(s + 1) * m, s * m:(s + 1) * m] = di
    if s > 0:
        Afull[s * m:(s + 1) * m, (s - 1) * m:s * m] = lo
    if s < S - 1:
        Afull[s * m:(s + 1) * m, (s + 1) * m:(s + 2) * m] = up
x1 = np.linalg.solve(Afull, bS.reshape(-1)).reshape(S * m_v, nf)[:N_p]
print("band-system dense f64 vs reference:",
      np.linalg.norm(x1 - x_dense) / np.linalg.norm(x_dense))

# first-slab lower band should be zero
print("slab0 lower max:", np.abs(B[0, :, :m]).max(),
      " last-slab upper max:", np.abs(B[-1, :, 2 * m:]).max())

# (2) block-Thomas in f64
f64 = slab_factor(jnp.asarray(B[:, :, :m]), jnp.asarray(B[:, :, m:2 * m]),
                  jnp.asarray(B[:, :, 2 * m:]))
x2 = np.asarray(slab_solve(f64, jnp.asarray(bS)))
x2 = x2.reshape(S * m_v, nf)[:N_p]
print("block-Thomas f64 vs reference:",
      np.linalg.norm(x2 - x_dense) / np.linalg.norm(x_dense))

# (3) block-Thomas in f32 (precond configuration)
f32 = slab_factor(jnp.asarray(B[:, :, :m], jnp.float32),
                  jnp.asarray(B[:, :, m:2 * m], jnp.float32),
                  jnp.asarray(B[:, :, 2 * m:], jnp.float32))
x3 = np.asarray(slab_solve(f32, jnp.asarray(bS, jnp.float32)))
x3 = x3.reshape(S * m_v, nf)[:N_p]
print("block-Thomas f32 vs reference:",
      np.linalg.norm(x3 - x_dense) / np.linalg.norm(x_dense))

# (4) FIXED ordering: row-replace ident rows in the band BEFORE
# equilibration.  Hypothesis: the current code equilibrates the raw band
# with Dinv of the ROW-REPLACED diagonal, so non-ident rows mix in the
# ORIGINAL ident rows of A (which the reference system replaced) — an
# inconsistent system.
identp = ident.copy()
if pad:
    identp = np.concatenate([identp, np.ones((pad, nf), bool)], 0)
identp4 = identp.reshape(S, m_v, nf)
diag_onehot = np.zeros((m_v, 3 * m_v))
diag_onehot[np.arange(m_v), m_v + np.arange(m_v)] = 1.0
B4rr = np.where(identp4[:, :, None, :, None], 0.0, B4)
B4rr = B4rr + (identp4[:, :, None, :, None]
               * diag_onehot[None, :, :, None, None]
               * eye[None, None, None])
B4f = np.einsum("sirt,sijtg->sijrg", Dv4, B4rr)
Bf = B4f.transpose(0, 1, 3, 2, 4).reshape(S, m, 3 * m)
# whole-row fallback only for rows outside owned coverage / padding
fallb = ((~cover_t) | ~np.asarray(plan.valid[0]))
if pad:
    fallb = np.concatenate([fallb, np.ones(pad, bool)], 0)
fallm = np.repeat(fallb.reshape(S, m_v), nf, axis=1).reshape(S, m)
Bf = np.where(fallm[:, :, None], eye_band[None], Bf)
x4d = np.zeros((S * m, ))
Afull2 = np.zeros((S * m, S * m))
for s in range(S):
    lo, di, up = Bf[s, :, :m], Bf[s, :, m:2 * m], Bf[s, :, 2 * m:]
    Afull2[s * m:(s + 1) * m, s * m:(s + 1) * m] = di
    if s > 0:
        Afull2[s * m:(s + 1) * m, (s - 1) * m:s * m] = lo
    if s < S - 1:
        Afull2[s * m:(s + 1) * m, (s + 1) * m:(s + 2) * m] = up
x4 = np.linalg.solve(Afull2, bS.reshape(-1)).reshape(S * m_v, nf)[:N_p]
print("FIXED band-system dense f64 vs reference:",
      np.linalg.norm(x4 - x_dense) / np.linalg.norm(x_dense))

f32b = slab_factor(jnp.asarray(Bf[:, :, :m], jnp.float32),
                   jnp.asarray(Bf[:, :, m:2 * m], jnp.float32),
                   jnp.asarray(Bf[:, :, 2 * m:], jnp.float32))
x5 = np.asarray(slab_solve(f32b, jnp.asarray(bS, jnp.float32)))
x5 = x5.reshape(S * m_v, nf)[:N_p]
print("FIXED block-Thomas f32 vs reference:",
      np.linalg.norm(x5 - x_dense) / np.linalg.norm(x_dense))
