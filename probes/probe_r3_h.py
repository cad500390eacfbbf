"""Probe: validate the spill-transfer band at n_dev=2 against the GLOBAL
dense assembly (band rows of device p must equal the global owned-owned
couplings of its rows once the left neighbor's spill band is added)."""
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
N = prog.space.num_vertices
print(f"N={N} N_p={N_p} H={H} S={S} m_v={m_v}")

rng = np.random.default_rng(0)

# synthetic per-device element blocks + GLOBAL assembly for reference
J_es = []
A_glob = np.zeros((N_DEV * N_p, nf, N_DEV * N_p, nf))
for p in range(N_DEV):
    cells = np.asarray(plan.cells_l[p])
    vols = np.asarray(plan.vols[p])
    C_p, nv = cells.shape
    J_e = rng.normal(size=(C_p, nv, nv, nf, nf)) * 0.1
    for a in range(nv):
        J_e[:, a, a] += np.eye(nf) * 3.0
    J_e *= (vols > 0)[:, None, None, None, None]
    J_es.append(J_e)
    for c in range(C_p):
        for a in range(nv):
            gr = p * N_p + cells[c, a]          # extended index -> global
            for b_ in range(nv):
                gq = p * N_p + cells[c, b_]
                if gr < N_DEV * N_p and gq < N_DEV * N_p:
                    A_glob[gr, :, gq, :] += J_e[c, a, b_]

# per-device band with spill transfer emulated
spills = []
bands = []
for p in range(N_DEV):
    vals_flat = jnp.asarray(J_es[p].reshape(-1, nf * nf))
    b1 = np.asarray(_segment_reduce(vals_flat, jnp.asarray(pp.order[p]),
                                    jnp.asarray(pp.start[p]),
                                    jnp.asarray(pp.end[p])))
    b2 = np.asarray(_segment_reduce(vals_flat, jnp.asarray(pp.order2[p]),
                                    jnp.asarray(pp.start2[p]),
                                    jnp.asarray(pp.end2[p])))
    bands.append(b1.reshape(S, m_v, 3 * m_v, nf, nf))
    spills.append(b2.reshape(S, m_v, 3 * m_v, nf, nf))
for p in range(N_DEV):
    recv = spills[p - 1] if p >= 1 else np.zeros_like(spills[0])
    B4 = bands[p] + recv
    # compare every in-band owned-owned entry with the global assembly
    maxerr = 0.0
    for i in range(N_p):
        s_r, i_r = divmod(i, m_v)
        for j in range(N_p):
            s_q, i_q = divmod(j, m_v)
            band = s_q - s_r
            if abs(band) <= 1:
                got = B4[s_r, i_r, (band + 1) * m_v + i_q]
                want = A_glob[p * N_p + i, :, p * N_p + j, :]
                maxerr = max(maxerr, np.abs(got - want).max())
    print(f"dev {p}: band(with spill) vs global dense max err: {maxerr:.3e}")
