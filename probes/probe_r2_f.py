# NOTE: gmpnp_tpu.ops.block_gj was REMOVED in round 4 (the kernel
# never compiled on hardware; VERDICT r3 item 7).  This historical
# round-2 probe can no longer run as-is; kept for the record.
raise SystemExit("probe retired: ops.block_gj removed in round 4 (docs/TPU_NOTES.md)")
"""Round-2 hardware probe F: (1) Mosaic-fixed Pallas kernels, (2) slab-step
cost breakdown at the shipped L_50_R_5 mesh (N=3679) to locate the gap
between the probe_r2_d 983 ms/step and the bench's 2973 ms/step.

Run: python probes/probe_r2_f.py > /tmp/probe_f.log 2>&1
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

    # ---- 1. Pallas kernels (fixed) ----------------------------------------
    try:
        from gmpnp_tpu.ops.ell_spmv import ell_block_contract_pallas

        key = jax.random.PRNGKey(0)
        N, K, f = 3679, 32, 9
        blocks = jax.random.normal(key, (N, K, f, f), jnp.float32)
        xg = jax.random.normal(key, (N, K, f), jnp.float32)
        t0 = time.perf_counter()
        y = ell_block_contract_pallas(blocks, xg)
        y.block_until_ready()
        tc = time.perf_counter() - t0
        ref = jnp.einsum("nkfg,nkg->nf", blocks, xg)
        err = float(jnp.abs(y - ref).max())
        cc = jax.jit(lambda b, x: ell_block_contract_pallas(b, x)
                     ).lower(blocks, xg).compile()
        dt = timed(cc, [blocks, xg], lambda o: float(abs(o).sum()))
        ccx = jax.jit(lambda b, x: jnp.einsum("nkfg,nkg->nf", b, x)
                      ).lower(blocks, xg).compile()
        dtx = timed(ccx, [blocks, xg], lambda o: float(abs(o).sum()))
        log(f"pallas ell_contract: OK first {tc:.1f}s maxerr={err:.2e} "
            f"steady {dt*1e3:.2f} ms vs XLA einsum {dtx*1e3:.2f} ms")
    except Exception as e:
        log(f"pallas ell_contract FAILED: {type(e).__name__}: {str(e)[:300]}")

    try:
        from gmpnp_tpu.ops.block_gj import block_inv_pallas
        from gmpnp_tpu.solve.smallblock import block_inv

        A = jax.random.normal(jax.random.PRNGKey(1), (3679, 9, 9),
                              jnp.float32) + 10 * jnp.eye(9, jnp.float32)
        t0 = time.perf_counter()
        Ai = block_inv_pallas(A)
        Ai.block_until_ready()
        tc = time.perf_counter() - t0
        err = float(jnp.abs(jnp.einsum("nfg,ngh->nfh", A, Ai)
                            - jnp.eye(9, jnp.float32)).max())
        cc = jax.jit(lambda a: block_inv_pallas(a)).lower(A).compile()
        dt = timed(cc, [A], lambda o: float(abs(o).sum()))
        ccx = jax.jit(block_inv).lower(A).compile()
        dtx = timed(ccx, [A], lambda o: float(abs(o).sum()))
        log(f"pallas block_inv: OK first {tc:.1f}s maxerr={err:.2e} "
            f"steady {dt*1e3:.2f} ms vs XLA GJ {dtx*1e3:.2f} ms")
    except Exception as e:
        log(f"pallas block_inv FAILED: {type(e).__name__}: {str(e)[:300]}")

    # ---- 2. slab step breakdown at shipped mesh ---------------------------
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.slab import SlabPlan, slab_factor, slab_solve
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
    log(f"mesh N={N} C={space.cells.shape[0]} (shipped={N==3679})")

    cc = jax.jit(lambda u: space.residual(form, u, u, theta)
                 ).lower(u0).compile()
    dt = timed(cc, [u0], lambda o: float(abs(o).sum()))
    log(f"residual assembly: {dt*1e3:.1f} ms")

    jdt = jnp.float32
    cc = jax.jit(lambda u: space.jacobian(form, u, u, theta, dtype=jdt).flat
                 ).lower(u0).compile()
    dt = timed(cc, [u0], lambda o: float(abs(o).sum()))
    log(f"jacobian assembly (f32): {dt*1e3:.1f} ms")

    ell = jax.jit(
        lambda u: space.jacobian(form, u, u, theta, dtype=jdt))(u0)
    bc = prog._bc_of_theta(theta)
    ellbc = bc.apply_to_jacobian(ell)
    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot))
    log(f"slab plan: S={plan.S} m_v={plan.m_v} m={plan.m} bw={plan.bandwidth}")

    def bands_factor(e):
        lo, di, up = plan.bands(e, dtype=jnp.float32)
        return slab_factor(lo, di, up)

    try:
        cc = jax.jit(bands_factor).lower(ellbc).compile()
        dt = timed(cc, [ellbc], lambda o: float(abs(o.Dinv).sum()))
        log(f"bands relayout + factor: {dt*1e3:.1f} ms")
    except Exception as e:
        log(f"bands+factor FAILED: {type(e).__name__}: {str(e)[:200]}")

    try:
        from gmpnp_tpu.solve.slab import slab_direct_solve

        r = jnp.ones((N, nf))
        cc = jax.jit(lambda e, rr: slab_direct_solve(
            e, rr, plan, tol=cfg.linear.tol,
            max_refine=cfg.linear.max_refine).x).lower(ellbc, r).compile()
        dt = timed(cc, [ellbc, r], lambda o: float(abs(o).sum()))
        log(f"slab_direct_solve total: {dt*1e3:.1f} ms")
    except Exception as e:
        log(f"slab_direct_solve FAILED: {type(e).__name__}: {str(e)[:200]}")

    # full implicit step (the bench inner op)
    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    cc = jax.jit(step).lower(u0, theta).compile()
    dt = timed(cc, [u0, theta], lambda o: float(abs(o[0]).sum()), reps=5)
    _, st = cc(u0, theta)
    log(f"one implicit step: {dt*1e3:.0f} ms newton={int(st.newton_iters)} "
        f"lin={int(st.linear_iters)} conv={bool(st.converged)}")

    # 8-step transient (bench program)
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
    cc = jax.jit(run8).lower(u0).compile()
    tc = time.perf_counter() - t0
    dt = timed(cc, [u0], lambda o: float(abs(o[0]).sum()), reps=5)
    _, iters = cc(u0)
    log(f"8-step transient: compile {tc:.0f}s {dt/8*1e3:.0f} ms/step "
        f"iters={np.asarray(iters)} (bench measured 2973; probe_d 983)")

    log("done")


if __name__ == "__main__":
    main()
