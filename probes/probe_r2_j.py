# NOTE: gmpnp_tpu.ops.block_gj was REMOVED in round 4 (the kernel
# never compiled on hardware; VERDICT r3 item 7).  This historical
# round-2 probe can no longer run as-is; kept for the record.
raise SystemExit("probe retired: ops.block_gj removed in round 4 (docs/TPU_NOTES.md)")
"""Round-2 hardware probe J: (1) Mosaic-restructured Pallas kernels
(3D refs, int32 GJ); (2) vmapped sweep at the SHIPPED N=3679 mesh with
the fused factor scan — 2 lanes, then 4 (4-lane crashed the worker in
the bench; risky, last).

Run: python probes/probe_r2_j.py > /tmp/probe_j.log 2>&1
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def timed(compiled, args, fetch, reps=3):
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

    # ---- 2. sweep at shipped mesh: 2 lanes, then 4 ------------------------
    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    N = prog.space.num_vertices
    log(f"mesh N={N} (shipped={N == 3679})")
    s2 = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    def bc_of_theta(theta):
        bc = prog.bc.set_value(prog.s1_verts, prog.idx["CO2"],
                               theta["co2_s1"])
        return bc.set_value(s2, ns, theta["voltage"])

    newton = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    def make_run(n_steps):
        def run(u0v, voltages):
            def single(u0_l, voltage):
                def body(carry, i):
                    u, extra = carry
                    th = prog._theta_of_carry((u, extra), i)
                    th["voltage"] = voltage
                    u_new, st = step(u, th)
                    return (u_new, extra), st.newton_iters

                (u, _), iters = jax.lax.scan(
                    body, (u0_l, jnp.asarray(0.0)), jnp.arange(n_steps))
                return u, iters

            return jax.vmap(single)(u0v, voltages)

        return run

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    for lanes in (2, 4):
        try:
            u0v = jnp.stack([u0] * lanes)
            volts = jnp.asarray(np.linspace(-1.0, -2.5, lanes))
            run = make_run(8)
            t0 = time.perf_counter()
            cc = jax.jit(run).lower(u0v, volts).compile()
            tc = time.perf_counter() - t0
            dt = timed(cc, [u0v, volts],
                       lambda o: float(abs(o[0]).sum()), reps=3)
            _, iters = cc(u0v, volts)
            log(f"sweep {lanes}-lane 8-step shipped mesh: compile {tc:.0f}s "
                f"{dt/(8*lanes)*1e3:.0f} ms/lane-step "
                f"iters={np.asarray(iters).sum(axis=1)}")
        except Exception as e:
            log(f"sweep {lanes}-lane FAILED: {type(e).__name__}: "
                f"{str(e)[:250]}")
            break

    log("done")


if __name__ == "__main__":
    main()
