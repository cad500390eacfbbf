"""Round-3 hardware probe S: aggregation AMG on TPU.

Validates the new solve.amg preconditioner on real hardware (it is
CPU-proven in tests/test_amg.py): builds the f=9 GMPNP Jacobian of a
small generated pore mesh, runs amg-GMRES and block-Jacobi-GMRES to
1e-9, and reports iterations + median-of-3 solve times.  The AMG cycle
composes segment_sum + batched matvecs + f32 LU — all primitives the
production paths already exercise on TPU, but the composition (notably
jax.scipy.linalg.lu_factor/lu_solve on TPU) is what this probe checks.

Run: python probes/probe_r3_s.py > /tmp/probe_r3_s.log 2>&1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def main():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve import gmres
    from gmpnp_tpu.solve.amg import AMGPlan, amg_preconditioner
    from gmpnp_tpu.solve.linear import block_jacobi_preconditioner

    print("device:", jax.devices()[0], flush=True)

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=100e-9, R=10e-9,
                               mesh_resolution=(2, 11))
    prog = pore_3d.build(cfg)
    sp, ns = prog.space, len(cfg.species)
    u = jnp.ones((sp.num_vertices, cfg.n_fields)).at[:, ns].set(0.0)
    th = prog._theta_of_carry((u, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    aux = th.get("_aux")
    ell = bc.apply_to_jacobian(sp.jacobian(prog.form, u, u, th, aux=aux))
    r = bc.apply_to_residual(sp.residual(prog.form, u, u, th, aux=aux), u)
    print(f"N={sp.num_vertices} f={cfg.n_fields}", flush=True)

    plan = AMGPlan.build(np.asarray(sp.adj), cfg.n_fields, coarsest_dofs=600)
    print("levels:", [l.nagg for l in plan.levels], flush=True)

    for name, pc_of in (("amg", lambda e: amg_preconditioner(e, plan)),
                        ("block_jacobi", block_jacobi_preconditioner)):
        def solve(e, rr):
            res = gmres(e.matvec, rr, Minv=pc_of(e), tol=1e-9,
                        restart=40, maxiter=600)
            return res.x, res.iters, res.converged
        cc = jax.jit(solve).lower(ell, r).compile()
        x, it, conv = cc(ell, r)
        chk = float(jnp.abs(x).sum())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            x, it, conv = cc(ell, r)
            float(jnp.abs(x).sum())
            ts.append(time.perf_counter() - t0)
        print(f"{name}: iters={int(it)} converged={bool(conv)} "
              f"finite={np.isfinite(chk)} median_ms={np.median(ts)*1e3:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
