"""Round-2 hardware probe I: CGS2-Arnoldi effect (commit 038ddc2) on the
slab solve and the transient; f64 jacobian assembly cost; 4-lane vmapped
sweep refresh='iter' vs 'step'.

Run: python probes/probe_r2_i.py > /tmp/probe_i.log 2>&1
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

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.slab import SlabPlan, slab_direct_solve
    from gmpnp_tpu.solve.timeloop import make_implicit_step

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
    log(f"mesh N={N} (shipped={N == 3679})")

    cc = jax.jit(lambda u: space.jacobian(form, u, u, theta).flat
                 ).lower(u0).compile()
    dt = timed(cc, [u0], lambda o: float(abs(o).sum()))
    log(f"jacobian assembly f64: {dt*1e3:.1f} ms (f32 was 116)")

    ell = jax.jit(lambda u: space.jacobian(form, u, u, theta))(u0)
    bc = prog._bc_of_theta(theta)
    ellbc = bc.apply_to_jacobian(ell)
    plan = SlabPlan.build(np.asarray(space.adj),
                          np.asarray(space.points)[:, -1], nf,
                          np.asarray(space.diag_slot))
    r = jnp.ones((N, nf))
    cc = jax.jit(lambda e, rr: slab_direct_solve(
        e, rr, plan, tol=1e-6, max_refine=40)).lower(ellbc, r).compile()
    out = cc(ellbc, r)
    dt = timed(cc, [ellbc, r], lambda o: float(abs(o.x).sum()))
    log(f"slab_direct_solve tol=1e-6 (CGS2): {dt*1e3:.1f} ms "
        f"iters={int(out.iters)} (MGS was 1103.5/40)")

    step = make_implicit_step(space, form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

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
    log(f"8-step transient (CGS2): compile {tc:.0f}s {dt/8*1e3:.0f} ms/step "
        f"iters={np.asarray(iters)} (MGS was 936)")

    # ---- 4-lane vmapped sweep, refresh=iter vs step (bench mesh) ----------
    cfgB = pore_3d.Pore3DConfig(
        physics="GMPNP", L=100e-9, R=10e-9, mesh_resolution=(3, 24))
    progB = pore_3d.build(cfgB)
    nfB, nsB = cfgB.n_fields, len(cfgB.species)
    u0B = jnp.ones((progB.space.num_vertices, nfB)).at[:, nsB].set(0.0)
    thetaB = {"dt": jnp.asarray(progB.dt_scaled),
              "co2_s1": jnp.asarray(progB.eq_conc["CO2"]
                                    / progB.bulk_conc["CO2"])}
    newtonW = dataclasses.replace(cfgB.newton, loop="while")
    for refresh in ("iter", "step"):
        try:
            linB = dataclasses.replace(cfgB.linear, refresh=refresh)
            stepB = make_implicit_step(progB.space, progB.form, newtonW,
                                       linB, bc_of_theta=progB._bc_of_theta)

            def batched(u0v):
                u, st = jax.vmap(lambda u: stepB(u, thetaB))(u0v)
                return u, st.newton_iters

            u0v = jnp.stack([u0B * (1.0 + 0.001 * i) for i in range(4)])
            t0 = time.perf_counter()
            ccv = jax.jit(batched).lower(u0v).compile()
            tc = time.perf_counter() - t0
            dt = timed(ccv, [u0v], lambda o: float(abs(o[0]).sum()), reps=3)
            _, it = ccv(u0v)
            log(f"vmap 4-lane refresh={refresh}: compile {tc:.0f}s "
                f"{dt*1e3:.0f} ms ({dt/4*1e3:.0f} ms/lane) "
                f"iters={np.asarray(it)}")
        except Exception as e:
            log(f"vmap 4-lane refresh={refresh} FAILED: "
                f"{type(e).__name__}: {str(e)[:250]}")

    log("done")


if __name__ == "__main__":
    main()
