"""Round-2 hardware probe H: frozen-factorization modified Newton
(LinearConfig.refresh='step') at the shipped L_50_R_5 mesh, and the
4-lane vmapped sweep with while-loop Newton (risky, last).

Run: python probes/probe_r2_h.py > /tmp/probe_h.log 2>&1
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
    from gmpnp_tpu.solve.timeloop import LinearConfig, make_implicit_step

    log(f"device: {jax.devices()[0]}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    space, form = prog.space, prog.form
    N = space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    log(f"mesh N={N} (shipped={N == 3679})")

    lin_frozen = dataclasses.replace(cfg.linear, refresh="step")
    step_f = make_implicit_step(space, form, cfg.newton, lin_frozen,
                                bc_of_theta=prog._bc_of_theta)

    def run8(u0):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st = step_f(u, th)
            return (u_new, extra), (st.newton_iters, st.linear_iters,
                                    st.converged)

        (u, _), ys = jax.lax.scan(
            body, (u0, jnp.asarray(0.0)), jnp.arange(8))
        return u, ys

    t0 = time.perf_counter()
    cc = jax.jit(run8).lower(u0).compile()
    tc = time.perf_counter() - t0
    dt = timed(cc, [u0], lambda o: float(abs(o[0]).sum()))
    _, (iters, lins, conv) = cc(u0)
    log(f"8-step transient refresh=step: compile {tc:.0f}s "
        f"{dt/8*1e3:.0f} ms/step (refresh=iter was 936) "
        f"newton={np.asarray(iters)} gmres={np.asarray(lins)} "
        f"conv={np.asarray(conv)}")

    # ---- 4-lane vmapped sweep with while-Newton (bench mesh) --------------
    try:
        cfgB = pore_3d.Pore3DConfig(
            physics="GMPNP", L=100e-9, R=10e-9, mesh_resolution=(3, 24))
        progB = pore_3d.build(cfgB)
        nfB, nsB = cfgB.n_fields, len(cfgB.species)
        newtonW = dataclasses.replace(cfgB.newton, loop="while")
        linB = dataclasses.replace(cfgB.linear, refresh="step")
        stepB = make_implicit_step(progB.space, progB.form, newtonW, linB,
                                   bc_of_theta=progB._bc_of_theta)
        u0B = jnp.ones((progB.space.num_vertices, nfB)).at[:, nsB].set(0.0)
        thetaB = {"dt": jnp.asarray(progB.dt_scaled),
                  "co2_s1": jnp.asarray(progB.eq_conc["CO2"]
                                        / progB.bulk_conc["CO2"])}

        def batched(u0v):
            u, st = jax.vmap(lambda u: stepB(u, thetaB))(u0v)
            return u, st.newton_iters

        for lanes in (4, 8):
            u0v = jnp.stack([u0B * (1.0 + 0.001 * i) for i in range(lanes)])
            t0 = time.perf_counter()
            ccv = jax.jit(batched).lower(u0v).compile()
            tc = time.perf_counter() - t0
            dt = timed(ccv, [u0v], lambda o: float(abs(o[0]).sum()), reps=3)
            _, it = ccv(u0v)
            log(f"vmap {lanes}-lane while+frozen step: OK compile {tc:.0f}s "
                f"{dt*1e3:.0f} ms ({dt/lanes*1e3:.0f} ms/lane) "
                f"iters={np.asarray(it)}")
    except Exception as e:
        log(f"vmap lanes FAILED: {type(e).__name__}: {str(e)[:250]}")

    log("done")


if __name__ == "__main__":
    main()
