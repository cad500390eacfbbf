"""Probe: replicate the slab-precond apply chain on the REAL Jacobian
(dense side), per device at n_dev=2, and compare against the exact local
Schwarz solve in f64 and f32.

Separates: band restriction (element-only, facet terms dropped) vs f32
block-Thomas conditioning vs the equilibrated formulation.
"""
import os
import sys
import dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

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

# full Jacobian (with facets) and element-only Jacobian
J_full = prog.space.jacobian(prog.form, u0, u0, theta)
from gmpnp_tpu.fem.forms import WeakForm
form_vol = WeakForm(prog.form.n_fields, prog.form.volume, boundary={},
                    n_aux=prog.form.n_aux)
J_vol = prog.space.jacobian(form_vol, u0, u0, theta)
A_full = np.asarray(J_full.to_dense()).reshape(N, nf, N, nf)
A_vol = np.asarray(J_vol.to_dense()).reshape(N, nf, N, nf)

plan = ZShardPlan.build(prog.mesh, nf, 2, np.asarray(bc.mask),
                        np.asarray(bc.values), quad_degree=cfg.quad_degree)
pp = SlabPrecondPlan.build(plan)
N_p = plan.N_p
S, m_v, m = pp.S, pp.m_v, pp.m
print(f"N={N} N_p={N_p} S={S} m_v={m_v} m={m}")
eye = np.eye(nf)
rng = np.random.default_rng(1)

for p in range(2):
    lo, hi = p * N_p, min((p + 1) * N_p, N)
    n_own = hi - lo
    ident = np.asarray(plan.bc_mask[p]) | (~np.asarray(plan.valid[p]))[:, None]

    # exact local Schwarz block (FULL matrix incl. facets), row-replaced
    A_loc = np.zeros((N_p, nf, N_p, nf))
    A_loc[:n_own, :, :n_own, :] = A_full[lo:hi, :, lo:hi, :]
    A_rr = A_loc.reshape(N_p * nf, N_p * nf).copy()
    for i in range(N_p):
        for fld in range(nf):
            if ident[i, fld] or i >= n_own:
                A_rr[i * nf + fld, :] = 0.0
                A_rr[i * nf + fld, i * nf + fld] = 1.0
    rr = rng.normal(size=(N_p, nf))
    x_exact = np.linalg.solve(A_rr, rr.reshape(-1)).reshape(N_p, nf)

    # Dinv as diag_blocks_reduced: FULL diag blocks, ident rows replaced
    Dblk = np.zeros((N_p, nf, nf))
    for i in range(n_own):
        Dblk[i] = A_full[lo + i, :, lo + i, :]
    for i in range(N_p):
        for fld in range(nf):
            if ident[i, fld] or i >= n_own:
                Dblk[i, fld, :] = 0.0
                Dblk[i, fld, fld] = 1.0
    Dinv = np.linalg.inv(Dblk)

    # band from the ELEMENT-ONLY matrix (what the precond assembles)
    def build_band(A_src):
        B4 = np.zeros((S, m_v, 3 * m_v, nf, nf))
        for i in range(n_own):
            s_r, i_r = divmod(i, m_v)
            j0, j1 = max(0, i - m_v), min(n_own, i + m_v + 1)
            for j in range(j0, j1):
                s_q, i_q = divmod(j, m_v)
                band = s_q - s_r
                if abs(band) <= 1:
                    B4[s_r, i_r, (band + 1) * m_v + i_q] = \
                        A_src[lo + i, :, lo + j, :]
        return B4

    for label, A_src in (("volband", A_vol), ("fullband", A_full)):
        B4 = build_band(A_src)
        identp = ident.copy()
        identp[n_own:] = True
        pad = S * m_v - N_p
        if pad:
            identp = np.concatenate([identp, np.ones((pad, nf), bool)], 0)
        identp4 = identp.reshape(S, m_v, nf)
        donehot = np.zeros((m_v, 3 * m_v))
        donehot[np.arange(m_v), m_v + np.arange(m_v)] = 1.0
        B4r = np.where(identp4[:, :, None, :, None], 0.0, B4)
        B4r = B4r + (identp4[:, :, None, :, None]
                     * donehot[None, :, :, None, None]
                     * eye[None, None, None])
        Dvp = Dinv
        if pad:
            Dvp = np.concatenate(
                [Dinv, np.broadcast_to(eye, (pad, nf, nf))], 0)
        Dv4 = Dvp.reshape(S, m_v, nf, nf)
        B4e = np.einsum("sirt,sijtg->sijrg", Dv4, B4r)
        B = B4e.transpose(0, 1, 3, 2, 4).reshape(S, m, 3 * m)

        b = np.einsum("nfg,ng->nf", Dinv, rr)
        if pad:
            b = np.concatenate([b, np.zeros((pad, nf))], 0)
        bS = b.reshape(S, m)

        # dense f64 solve of the band system (separates band construction
        # from block-Thomas recurrence stability)
        Afull2 = np.zeros((S * m, S * m))
        for s in range(S):
            Afull2[s * m:(s + 1) * m, s * m:(s + 1) * m] = B[s, :, m:2 * m]
            if s > 0:
                Afull2[s * m:(s + 1) * m, (s - 1) * m:s * m] = B[s, :, :m]
            if s < S - 1:
                Afull2[s * m:(s + 1) * m,
                       (s + 1) * m:(s + 2) * m] = B[s, :, 2 * m:]
        xb = np.linalg.solve(Afull2, bS.reshape(-1))
        xb = xb.reshape(S * m_v, nf)[:N_p]
        relb = np.linalg.norm(xb - x_exact) / np.linalg.norm(x_exact)
        print(f"dev {p} {label} DENSE-band: vs exact-local rel {relb:.3e}")
        for dt_lbl, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
            fac = slab_factor(jnp.asarray(B[:, :, :m], dt),
                              jnp.asarray(B[:, :, m:2 * m], dt),
                              jnp.asarray(B[:, :, 2 * m:], dt))
            x = np.asarray(slab_solve(fac, jnp.asarray(bS, dt)))
            x = x.reshape(S * m_v, nf)[:N_p]
            rel = np.linalg.norm(x - x_exact) / np.linalg.norm(x_exact)
            print(f"dev {p} {label} {dt_lbl}: apply vs exact-local rel "
                  f"{rel:.3e} finite={np.isfinite(x).all()}")
