# NOTE: gmpnp_tpu.ops.block_gj was REMOVED in round 4 (the kernel
# never compiled on hardware; VERDICT r3 item 7).  This historical
# round-2 probe can no longer run as-is; kept for the record.
raise SystemExit("probe retired: ops.block_gj removed in round 4 (docs/TPU_NOTES.md)")
"""Round-2 hardware probe G: after the f64-jac revert + carry_residual +
while-loop sweep Newton (commit bbaf5e0).

  1. Pallas kernels (K-loop ELL contraction; block GJ inverse)
  2. slab_direct_solve internals: f64 equilibration block_inv cost,
     tol=1e-6 vs 1e-4 wall time
  3. one implicit step + 8-step transient with the new pore defaults
  4. vmapped 2-lane slab step with loop='while' Newton

Run: python probes/probe_r2_g.py > /tmp/probe_g.log 2>&1
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def timed(compiled, args, fetch, reps=5):
    chk = fetch(compiled(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chk = fetch(compiled(*args))
        ts.append(time.perf_counter() - t0)
    assert chk == chk, "non-finite"
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")

    # ---- 1. Pallas kernels -------------------------------------------------
    try:
        from gmpnp_tpu.ops.ell_spmv import ell_block_contract_pallas

        key = jax.random.PRNGKey(0)
        N, K, f = 3679, 32, 9
        blocks = jax.random.normal(key, (N, K, f, f), jnp.float32)
        xg = jax.random.normal(key, (N, K, f), jnp.float32)
        y = ell_block_contract_pallas(blocks, xg)
        y.block_until_ready()
        ref = jnp.einsum("nkfg,nkg->nf", blocks, xg)
        err = float(jnp.abs(y - ref).max())
        cc = jax.jit(lambda b, x: ell_block_contract_pallas(b, x)
                     ).lower(blocks, xg).compile()
        dt = timed(cc, [blocks, xg], lambda o: float(abs(o).sum()))
        ccx = jax.jit(lambda b, x: jnp.einsum("nkfg,nkg->nf", b, x)
                      ).lower(blocks, xg).compile()
        dtx = timed(ccx, [blocks, xg], lambda o: float(abs(o).sum()))
        log(f"pallas ell_contract: OK maxerr={err:.2e} "
            f"steady {dt*1e3:.2f} ms vs XLA einsum {dtx*1e3:.2f} ms")
    except Exception as e:
        log(f"pallas ell_contract FAILED: {type(e).__name__}: {str(e)[:250]}")

    try:
        from gmpnp_tpu.ops.block_gj import block_inv_pallas
        from gmpnp_tpu.solve.smallblock import block_inv

        A = (jax.random.normal(jax.random.PRNGKey(1), (3679, 9, 9),
                               jnp.float32)
             + 10 * jnp.eye(9, dtype=jnp.float32))
        Ai = block_inv_pallas(A)
        Ai.block_until_ready()
        err = float(jnp.abs(jnp.einsum("nfg,ngh->nfh", A, Ai)
                            - jnp.eye(9, dtype=jnp.float32)).max())
        cc = jax.jit(lambda a: block_inv_pallas(a)).lower(A).compile()
        dt = timed(cc, [A], lambda o: float(abs(o).sum()))
        ccx = jax.jit(block_inv).lower(A).compile()
        dtx = timed(ccx, [A], lambda o: float(abs(o).sum()))
        log(f"pallas block_inv f32: OK maxerr={err:.2e} "
            f"steady {dt*1e3:.2f} ms vs XLA GJ {dtx*1e3:.2f} ms")
    except Exception as e:
        log(f"pallas block_inv FAILED: {type(e).__name__}: {str(e)[:250]}")

    # ---- 2. slab internals at shipped mesh --------------------------------
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.slab import SlabPlan, slab_direct_solve
    from gmpnp_tpu.solve.smallblock import block_inv as binv
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N = space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"]
                                   / prog.bulk_conc["CO2"])}
    log(f"mesh N={N} (shipped={N == 3679}); defaults: "
        f"jac={cfg.linear.jac_dtype} tol={cfg.linear.tol}")

    ell = jax.jit(lambda u: space.jacobian(form, u, u, theta))(u0)
    bc = prog._bc_of_theta(theta)
    ellbc = bc.apply_to_jacobian(ell)
    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot))

    try:
        D = ellbc.diag_blocks()
        cc = jax.jit(binv).lower(D).compile()
        dt = timed(cc, [D], lambda o: float(abs(o).sum()))
        log(f"equilibration block_inv f64 (N,9,9): {dt*1e3:.1f} ms")
    except Exception as e:
        log(f"equilibration timing FAILED: {type(e).__name__}: {str(e)[:200]}")

    r = jnp.ones((N, nf))
    for tol in (1e-6, 1e-4):
        try:
            cc = jax.jit(lambda e, rr, t=tol: slab_direct_solve(
                e, rr, plan, tol=t, max_refine=40)).lower(ellbc, r).compile()
            out = cc(ellbc, r)
            dt = timed(cc, [ellbc, r], lambda o: float(abs(o.x).sum()))
            log(f"slab_direct_solve tol={tol:g}: {dt*1e3:.1f} ms "
                f"gmres_iters={int(out.iters)} "
                f"resnorm={float(out.resnorm):.2e}")
        except Exception as e:
            log(f"slab tol={tol:g} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # ---- 3. step + 8-step transient, new defaults -------------------------
    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    cc = jax.jit(step).lower(u0, theta).compile()
    dt = timed(cc, [u0, theta], lambda o: float(abs(o[0]).sum()))
    _, st = cc(u0, theta)
    log(f"one implicit step (f64 jac, carry_r): {dt*1e3:.0f} ms "
        f"newton={int(st.newton_iters)} lin={int(st.linear_iters)} "
        f"conv={bool(st.converged)}")

    def run8(u0):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st = step(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, jnp.asarray(0.0)), jnp.arange(8))
        return u, iters

    t0 = time.perf_counter()
    cc8 = jax.jit(run8).lower(u0).compile()
    tc = time.perf_counter() - t0
    dt = timed(cc8, [u0], lambda o: float(abs(o[0]).sum()))
    _, iters = cc8(u0)
    log(f"8-step transient: compile {tc:.0f}s {dt/8*1e3:.0f} ms/step "
        f"iters={np.asarray(iters)} (f32-jac bench was 2973)")

    # ---- 4. vmapped 2-lane with while-loop Newton -------------------------
    try:
        cfgB = pore_3d.Pore3DConfig(
            physics="GMPNP", L=100e-9, R=10e-9, mesh_resolution=(3, 24))
        progB = pore_3d.build(cfgB)
        nfB, nsB = cfgB.n_fields, len(cfgB.species)
        import dataclasses as _dc
        newtonW = _dc.replace(cfgB.newton, loop="while")
        stepB = make_implicit_step(progB.space, progB.form, newtonW,
                                   cfgB.linear,
                                   bc_of_theta=progB._bc_of_theta)
        u0B = jnp.ones((progB.space.num_vertices, nfB)).at[:, nsB].set(0.0)
        thetaB = {"dt": jnp.asarray(progB.dt_scaled),
                  "co2_s1": jnp.asarray(progB.eq_conc["CO2"]
                                        / progB.bulk_conc["CO2"])}

        def two(u0v):
            u, st = jax.vmap(lambda u: stepB(u, thetaB))(u0v)
            return u, st.newton_iters

        u0v = jnp.stack([u0B, u0B * 1.001])
        t0 = time.perf_counter()
        ccv = jax.jit(two).lower(u0v).compile()
        tc = time.perf_counter() - t0
        dt = timed(ccv, [u0v], lambda o: float(abs(o[0]).sum()), reps=3)
        _, it = ccv(u0v)
        log(f"vmap 2-lane while-Newton step: OK compile {tc:.0f}s "
            f"{dt*1e3:.0f} ms (fori+cond was 33254) iters={np.asarray(it)}")
    except Exception as e:
        log(f"vmap 2-lane while FAILED: {type(e).__name__}: {str(e)[:250]}")

    log("done")


if __name__ == "__main__":
    main()
