"""Round-3 probe: phase breakdown of the 3D production Newton step.

The headline bench is 823 ms/step (~1 warm Newton iter/step) at the
shipped L_50_R_5 mesh (N=3,679).  Before optimizing anything, measure
where a Newton iteration actually spends its time on the TPU:

  asm      residual + Jacobian assembly + BC application
  equil    f64 block_inv of the diagonal blocks + row scaling
  factor   band relayout + f32 block-Thomas factorization (lax.scan)
  apply32  ONE f32 banded solve (to_slabs + slab_solve + from_slabs)
  matvec64 ONE f64 BlockELL matvec (GMRES inner cost)
  polish   full slab_apply (f64 GMRES polished to 1e-8)
  newton1  one full Newton iteration via the production path

Each phase is its own jitted program, AOT-compiled, median of 5 reps
(dispatch-latency dominated phases show up honestly this way: the
production step fuses them, so the sum here is an upper bound).

Usage: python probes/probe_r3_v.py [cpu]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

import jax

if sys.argv[1:] and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.solve.slab import (SlabPlan, slab_apply, slab_factor_fused,
                                  slab_prepare, slab_solve)
from gmpnp_tpu.solve.smallblock import block_inv
from gmpnp_tpu.solve.timeloop import make_implicit_step


def timed(fn, *args, reps=5, label=""):
    cc = jax.jit(fn).lower(*args).compile()
    out = cc(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = cc(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{label:10s} {ms:9.2f} ms", flush=True)
    return out, ms


def main():
    if sys.argv[1:] and sys.argv[1] == "cpu":
        # smoke-test the probe itself on a small generated mesh (shipped
        # meshes take priority whenever GMPNP_UTILITIES is set)
        os.environ.pop("GMPNP_UTILITIES", None)
        cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9,
                                   mesh_resolution=(2, 11))
    else:
        cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N, nf, ns = space.num_vertices, cfg.n_fields, len(cfg.species)
    print(f"device: {jax.devices()[0]}  N={N}", flush=True)

    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot),
                          max_slabs=cfg.linear.max_slabs)
    print(f"slabs S={plan.S} m_v={plan.m_v} m={plan.m} "
          f"bandwidth={plan.bandwidth}", flush=True)

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    th = prog._theta_of_carry((u0, jnp.asarray(0.0)), jnp.asarray(0))
    bc = prog._bc_of_theta(th)
    u = bc.project(u0)

    def asm(u):
        ell = bc.apply_to_jacobian(space.jacobian(form, u, u0, th))
        r = bc.apply_to_residual(space.residual(form, u, u0, th), u)
        return ell, r

    (ell, r), _ = timed(asm, u, label="asm")

    def equil(ell):
        Dinv0 = block_inv(ell.diag_blocks())
        return ell.scale_rows(Dinv0), Dinv0

    (ell_eq, Dinv0), _ = timed(equil, ell, label="equil")

    def factor(ell_eq):
        return slab_factor_fused(ell_eq, plan)

    factors, _ = timed(factor, ell_eq, label="factor")

    b = jnp.einsum("nfg,ng->nf", Dinv0, r)

    # NB: factors/ell must be ARGUMENTS of the jitted fns — captured as
    # closure constants they are baked into the program (~600 MB at this
    # mesh) and blow the tunneled remote-compile request (HTTP 413)

    def apply32(factors, b):
        ds = plan.to_slabs(b.astype(jnp.float32))
        xs = slab_solve(factors, ds)
        return plan.from_slabs(xs)

    timed(apply32, factors, b, label="apply32")

    def matvec64(ell_eq, x):
        return ell_eq.matvec(x)

    timed(matvec64, ell_eq, b, label="matvec64")

    def polish(ell, r):
        prep = slab_prepare(ell, plan)
        res = slab_apply(prep, r, plan, tol=cfg.linear.tol,
                         max_refine=cfg.linear.max_refine)
        return res.x, res.iters

    (_, iters), _ = timed(polish, ell, r, label="prep+pol")
    print(f"  polish GMRES iters: {int(iters)}", flush=True)

    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

    def one_step(u):
        u_new, st = step(u, th)
        return u_new, st.newton_iters

    (_, ni), _ = timed(one_step, u0, reps=3, label="step")
    print(f"  step newton iters: {int(ni)}", flush=True)


if __name__ == "__main__":
    main()
