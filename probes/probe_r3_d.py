"""Probe: validate SlabPrecondPlan band assembly against dense assembly.

Synthetic random element blocks -> band via the plan tables vs dense
scatter assembly; then the full precond apply vs dense solve.  CPU only,
no shard_map.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax
jax.config.update("jax_platforms", "cpu")  # jax pre-imported; env too late
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.parallel.shard import ZShardPlan, SlabPrecondPlan
from gmpnp_tpu.fem.assembly import _segment_reduce
from gmpnp_tpu.solve.slab import slab_factor, slab_solve
from gmpnp_tpu.solve.smallblock import block_inv

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

cells = np.asarray(plan.cells_l[0])       # (C_p, nv)
vols = np.asarray(plan.vols[0])
C_p, nv = cells.shape
rng = np.random.default_rng(0)
# synthetic diagonally-dominant-ish element blocks, zero for padding cells
J_e = rng.normal(size=(C_p, nv, nv, nf, nf)) * 0.1
for a in range(nv):
    J_e[:, a, a] += np.eye(nf) * 3.0
J_e *= (vols > 0)[:, None, None, None, None]

# dense extended assembly then spill-reduce (n_dev=1: spill wraps nowhere,
# but H may be >0 with valid=False rows)
Next = N_p + H
A = np.zeros((Next, nf, Next, nf))
for c in range(C_p):
    for a in range(nv):
        for b in range(nv):
            A[cells[c, a], :, cells[c, b], :] += J_e[c, a, b]
A_own = A[:N_p][:, :, :N_p]            # owned rows, owned cols

ident = np.asarray(plan.bc_mask[0]) | (~np.asarray(plan.valid[0]))[:, None]

# exact owned diagonal blocks
D = np.einsum("ifif->if...", np.zeros(0)) if False else None
Dblk = np.zeros((N_p, nf, nf))
for i in range(N_p):
    Dblk[i] = A_own[i, :, i, :]
eye = np.eye(nf)
Dblk[ident.any(axis=1)] = 0  # will fix per-field below
for i in range(N_p):
    Dblk[i] = A_own[i, :, i, :]
    for fld in range(nf):
        if ident[i, fld]:
            Dblk[i, fld, :] = eye[fld]
            Dblk[i, :, fld] = eye[:, fld] * 1.0  # not exactly prod code; see below

# replicate diag_blocks_reduced semantics exactly:
Dblk = np.zeros((N_p, nf, nf))
for i in range(N_p):
    Dblk[i] = A_own[i, :, i, :]
for i in range(N_p):
    for fld in range(nf):
        if ident[i, fld]:
            Dblk[i, fld, :] = 0.0
            Dblk[i, fld, fld] = 1.0
Dinv = np.linalg.inv(Dblk)

# ---- the precond band via the plan tables (device 0)
order_t = jnp.asarray(pp.order[0])
start_t = jnp.asarray(pp.start[0])
end_t = jnp.asarray(pp.end[0])
cover_t = jnp.asarray(pp.cover[0])

vals_flat = jnp.asarray(J_e.reshape(-1, nf * nf))
bsum = np.asarray(_segment_reduce(vals_flat, order_t, start_t, end_t))
B4 = bsum.reshape(S, m_v, 3 * m_v, nf, nf)

# check band == dense owned-owned couplings
maxerr = 0.0
for i in range(N_p):
    s_r, i_r = divmod(i, m_v)
    for j in range(N_p):
        s_q, i_q = divmod(j, m_v)
        band = s_q - s_r
        if abs(band) <= 1:
            got = B4[s_r, i_r, (band + 1) * m_v + i_q]
            maxerr = max(maxerr, np.abs(got - A_own[i, :, j, :]).max())
        else:
            if np.abs(A_own[i, :, j, :]).max() > 0:
                print(f"coupling outside band! rows {i},{j}")
print("band vs dense max err:", maxerr)

# ---- full precond apply vs dense solve of the equilibrated band system
pad = S * m_v - N_p
Dv = np.concatenate([Dinv, np.broadcast_to(eye, (pad, nf, nf))], 0) \
    if pad else Dinv
identm = ident | (~np.asarray(cover_t))[:, None]
if pad:
    identm = np.concatenate([identm, np.ones((pad, nf), bool)], 0)
Dv4 = Dv.reshape(S, m_v, nf, nf)
B4e = np.einsum("sirt,sijtg->sijrg", Dv4, B4)
B = B4e.transpose(0, 1, 3, 2, 4).reshape(S, m, 3 * m)
eye_band = np.concatenate(
    [np.zeros((m, m)), np.eye(m), np.zeros((m, m))], axis=1)
B = np.where(identm.reshape(S, m)[:, :, None], eye_band[None], B)

factors = slab_factor(jnp.asarray(B[:, :, :m], jnp.float32),
                      jnp.asarray(B[:, :, m:2 * m], jnp.float32),
                      jnp.asarray(B[:, :, 2 * m:], jnp.float32))
rr = rng.normal(size=(N_p, nf))
b = np.einsum("nfg,ng->nf", Dinv, rr)
if pad:
    b = np.concatenate([b, np.zeros((pad, nf))], 0)
x = np.asarray(slab_solve(factors, jnp.asarray(
    b.reshape(S, m), jnp.float32)))
x = x.reshape(S * m_v, nf)[:N_p]

# dense reference: solve (row-replaced A_own) x = rr with identity rows
A_rr = A_own.reshape(N_p * nf, N_p * nf).copy()
for i in range(N_p):
    for fld in range(nf):
        if ident[i, fld]:
            A_rr[i * nf + fld, :] = 0.0
            A_rr[i * nf + fld, i * nf + fld] = 1.0
x_dense = np.linalg.solve(A_rr, rr.reshape(-1)).reshape(N_p, nf)
rel = np.linalg.norm(x - x_dense) / np.linalg.norm(x_dense)
print("precond apply vs dense solve rel err:", rel)
print("x finite:", np.isfinite(x).all())
