"""Probe: validate the per-device slab precond at n_dev=2 in pure numpy.

probe_r3_c after the equilibration-order fix: n_dev=1 converges (6
Krylov/Newton) but n_dev=2 still diverges.  This checks, per device,
that the precond apply equals a dense solve of the INTENDED local
operator (owned-owned band couplings from the device's own real cells,
identity rows for ident/uncovered), i.e. that the implementation matches
its own spec — separating implementation bugs from precond-quality
issues.
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
from gmpnp_tpu.parallel.shard import ZShardPlan, SlabPrecondPlan
from gmpnp_tpu.fem.assembly import _segment_reduce
from gmpnp_tpu.solve.slab import slab_factor, slab_solve

N_DEV = 2
cfg = pore_3d.Pore3DConfig(physics="GMPNP", mesh_resolution=(2, 16))
prog = pore_3d.build(cfg)
nf = cfg.n_fields
theta = {"dt": jnp.asarray(prog.dt_scaled),
         "co2_s1": jnp.asarray(prog.eq_conc["CO2"] / prog.bulk_conc["CO2"])}
bc = prog._bc_of_theta(theta)
plan = ZShardPlan.build(prog.mesh, nf, N_DEV, np.asarray(bc.mask),
                        np.asarray(bc.values), quad_degree=cfg.quad_degree)
pp = SlabPrecondPlan.build(plan)
N_p, H = plan.N_p, plan.H
S, m_v, m = pp.S, pp.m_v, pp.m
print(f"N_p={N_p} H={H} S={S} m_v={m_v} m={m} "
      f"cover={pp.cover.mean(axis=1)}")

rng = np.random.default_rng(0)
eye = np.eye(nf)

for p in range(N_DEV):
    cells = np.asarray(plan.cells_l[p])
    vols = np.asarray(plan.vols[p])
    C_p, nv = cells.shape
    J_e = rng.normal(size=(C_p, nv, nv, nf, nf)) * 0.1
    for a in range(nv):
        J_e[:, a, a] += np.eye(nf) * 3.0
    J_e *= (vols > 0)[:, None, None, None, None]

    # intended local operator: owned-owned couplings from OWN real cells
    A_own = np.zeros((N_p, nf, N_p, nf))
    for c in range(C_p):
        for a in range(nv):
            r = cells[c, a]
            if r >= N_p:
                continue
            for b_ in range(nv):
                q = cells[c, b_]
                if q >= N_p:
                    continue
                A_own[r, :, q, :] += J_e[c, a, b_]

    ident = np.asarray(plan.bc_mask[p]) | (~np.asarray(plan.valid[p]))[:, None]
    cover = pp.cover[p]
    # replicate diag_blocks_reduced (exact = spill-reduced); here the probe
    # has no cross-device spill, so exact == local diagonal
    Dblk = np.zeros((N_p, nf, nf))
    for i in range(N_p):
        Dblk[i] = A_own[i, :, i, :]
    for i in range(N_p):
        for fld in range(nf):
            if ident[i, fld]:
                Dblk[i, fld, :] = 0.0
                Dblk[i, fld, fld] = 1.0
    # rows with no local element coverage have zero diagonal rows here
    # (the real path's diag_blocks_reduced psums the spill, making them
    # exact); stand in with identity rows for the probe
    for i in range(N_p):
        for fld in range(nf):
            if np.abs(Dblk[i, fld]).max() == 0.0:
                Dblk[i, fld, fld] = 1.0
    Dinv = np.linalg.inv(Dblk)

    # intended operator: row-replaced + uncovered rows identity
    A_int = A_own.reshape(N_p * nf, N_p * nf).copy()
    for i in range(N_p):
        for fld in range(nf):
            if ident[i, fld] or not cover[i]:
                A_int[i * nf + fld, :] = 0.0
                A_int[i * nf + fld, i * nf + fld] = 1.0
    rr = rng.normal(size=(N_p, nf))
    rhs = rr.reshape(-1).copy()
    # uncovered rows solve x = Dinv rr (block-Jacobi fallback)
    for i in range(N_p):
        if not cover[i]:
            rhs[i * nf:(i + 1) * nf] = Dinv[i] @ rr[i]
    x_int = np.linalg.solve(A_int, rhs).reshape(N_p, nf)

    # ---- replicate make_local_slab_precond (with the r3 fix)
    pad = S * m_v - N_p
    vals_flat = jnp.asarray(J_e.reshape(-1, nf * nf))
    bsum = np.asarray(_segment_reduce(vals_flat, jnp.asarray(pp.order[p]),
                                      jnp.asarray(pp.start[p]),
                                      jnp.asarray(pp.end[p])))
    B4 = bsum.reshape(S, m_v, 3 * m_v, nf, nf)
    identm = ident | (~cover)[:, None]
    identp = ident.copy()
    Dv = Dinv
    if pad:
        Dv = np.concatenate([Dinv, np.broadcast_to(eye, (pad, nf, nf))], 0)
        identm = np.concatenate([identm, np.ones((pad, nf), bool)], 0)
        identp = np.concatenate([identp, np.ones((pad, nf), bool)], 0)
    identp4 = identp.reshape(S, m_v, nf)
    diag_onehot = np.zeros((m_v, 3 * m_v))
    diag_onehot[np.arange(m_v), m_v + np.arange(m_v)] = 1.0
    B4 = np.where(identp4[:, :, None, :, None], 0.0, B4)
    B4 = B4 + (identp4[:, :, None, :, None]
               * diag_onehot[None, :, :, None, None]
               * eye[None, None, None])
    Dv4 = Dv.reshape(S, m_v, nf, nf)
    B4 = np.einsum("sirt,sijtg->sijrg", Dv4, B4)
    B = B4.transpose(0, 1, 3, 2, 4).reshape(S, m, 3 * m)
    eye_band = np.concatenate(
        [np.zeros((m, m)), np.eye(m), np.zeros((m, m))], axis=1)
    B = np.where(identm.reshape(S, m)[:, :, None], eye_band[None], B)

    factors = slab_factor(jnp.asarray(B[:, :, :m], jnp.float32),
                          jnp.asarray(B[:, :, m:2 * m], jnp.float32),
                          jnp.asarray(B[:, :, 2 * m:], jnp.float32))
    b = np.einsum("nfg,ng->nf", Dinv, rr)
    if pad:
        b = np.concatenate([b, np.zeros((pad, nf))], 0)
    x = np.asarray(slab_solve(factors, jnp.asarray(
        b.reshape(S, m), jnp.float32)))
    x = x.reshape(S * m_v, nf)[:N_p]

    rel = np.linalg.norm(x - x_int) / np.linalg.norm(x_int)
    print(f"dev {p}: apply vs intended-operator solve rel err: {rel:.3e} "
          f"finite={np.isfinite(x).all()}")
