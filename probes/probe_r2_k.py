"""Round-2 hardware probe K: isolate the component that kernel-faults
vmapped execution at the SHIPPED N=3679 mesh (probe_r2_j: even 2 lanes
crash, while 4 lanes at N=925 run fine).

Components probed independently under 2-lane vmap at N=3679, safest
first; each in its own try block so the first fault identifies the
culprit (later probes may die collaterally if the worker stays down).

Run: python probes/probe_r2_k.py > /tmp/probe_k.log 2>&1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.slab import (SlabPlan, slab_apply, slab_prepare)

    log(f"device: {jax.devices()[0]}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N = space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"]
                                   / prog.bulk_conc["CO2"])}
    bc = prog._bc_of_theta(theta)
    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot))
    u0v = jnp.stack([u0, u0 * 1.001])
    log(f"mesh N={N} (shipped={N == 3679}); 2-lane vmap per component")

    def try_component(name, fn, *args):
        try:
            t0 = time.perf_counter()
            cc = jax.jit(fn).lower(*args).compile()
            tc = time.perf_counter() - t0
            out = cc(*args)
            chk = float(abs(jax.tree.leaves(out)[0]).sum())
            assert chk == chk
            t0 = time.perf_counter()
            cc(*args)
            dt = time.perf_counter() - t0
            log(f"{name}: OK compile {tc:.0f}s exec {dt*1e3:.0f} ms")
            return True
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return False

    # (a) residual assembly
    try_component(
        "vmap residual",
        lambda uv: jax.vmap(
            lambda u: space.residual(form, u, u, theta))(uv), u0v)

    # (b) jacobian assembly (f64)
    try_component(
        "vmap jacobian",
        lambda uv: jax.vmap(
            lambda u: space.jacobian(form, u, u, theta).flat)(uv), u0v)

    # (c) prepare (equilibrate + fused band factor)
    def prep_only(u):
        ell = bc.apply_to_jacobian(space.jacobian(form, u, u, theta))
        p = slab_prepare(ell, plan)
        return p.factors.Dinv.sum()

    try_component("vmap prepare", lambda uv: jax.vmap(prep_only)(uv), u0v)

    # (d) full linear solve (prepare + GMRES apply)
    def solve_only(u):
        ell = bc.apply_to_jacobian(space.jacobian(form, u, u, theta))
        p = slab_prepare(ell, plan)
        r = jnp.ones((N, nf))
        res = slab_apply(p, r, plan, tol=cfg.linear.tol,
                         max_refine=cfg.linear.max_refine)
        return res.x

    try_component("vmap prepare+apply", lambda uv: jax.vmap(solve_only)(uv),
                  u0v)

    log("done")


if __name__ == "__main__":
    main()
