"""Round-2 hardware probe D: the new scatter-free assembly and the slab
direct solver on the TPU, at bench size and at reference size (shipped
L_50_R_5 mesh when GMPNP_UTILITIES is set).

Probes (riskiest last):
  1. residual + jacobian assembly timing (new segment-reduction path)
  2. one implicit GMPNP step with slab_direct at gen L_50_R_5 size
  3. 8-step transient at bench config (3,24) with slab_direct
  4. 8-step transient at SHIPPED L_50_R_5 (N=3679) — VERDICT item 2
  5. vmapped 2-lane step with slab_direct (fault re-check, new path)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def timed(compiled, args, fetch=lambda out: float(abs(out).sum()),
          reps: int = 3):
    chk = fetch(compiled(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chk = fetch(compiled(*args))
        ts.append(time.perf_counter() - t0)
    assert chk == chk, "non-finite"
    return float(np.median(ts)), chk


def build(cfg_kw, lin=None):
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", **cfg_kw)
    if lin is not None:
        object.__setattr__(cfg, "linear", lin)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"]
                                   / prog.bulk_conc["CO2"])}
    return cfg, prog, step, u0, theta


def main():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.solve.timeloop import LinearConfig

    log(f"device: {jax.devices()[0]}")
    slab_lin = LinearConfig(kind="slab_direct", tol=1e-6, max_refine=40)

    # ---- probe 1: assembly timings at gen L_50_R_5 size --------------------
    cfg, prog, step, u0, theta = build(dict(L=50e-9, R=5e-9), slab_lin)
    space, form = prog.space, prog.form
    N = space.num_vertices
    log(f"gen mesh N={N} C={space.cells.shape[0]}")

    cc = jax.jit(
        lambda u: space.residual(form, u, u, theta)).lower(u0).compile()
    dt, _ = timed(cc, [u0])
    log(f"probe1 residual assembly: {dt*1e3:.1f} ms (was 69.9)")

    cc = jax.jit(
        lambda u: space.jacobian(form, u, u, theta).flat).lower(u0).compile()
    dt, _ = timed(cc, [u0])
    log(f"probe1 jacobian assembly: {dt*1e3:.1f} ms (was 2445)")

    # ---- probe 2: one implicit step, slab_direct, gen size -----------------
    try:
        t0 = time.perf_counter()
        cc = jax.jit(step).lower(u0, theta).compile()
        tc = time.perf_counter() - t0
        dt, _ = timed(cc, [u0, theta],
                      fetch=lambda o: float(abs(o[0]).sum()), reps=2)
        _, st = cc(u0, theta)
        log(f"probe2 slab_direct step (N={N}): compile {tc:.0f}s exec "
            f"{dt*1e3:.0f} ms newton={int(st.newton_iters)} "
            f"gmres={int(st.linear_iters)} conv={bool(st.converged)}")
    except Exception as e:
        log(f"probe2 FAILED: {type(e).__name__}: {e}")

    # ---- probe 3: 8-step transient at bench config -------------------------
    cfgB, progB, stepB, u0B, thetaB = build(
        dict(L=100e-9, R=10e-9, mesh_resolution=(3, 24)), slab_lin)

    def run8(u0):
        def body(carry, i):
            u, extra = carry
            th = progB._theta_of_carry((u, extra), i)
            u_new, st = stepB(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, jnp.asarray(0.0)), jnp.arange(8))
        return u, iters

    try:
        t0 = time.perf_counter()
        cc = jax.jit(run8).lower(u0B).compile()
        tc = time.perf_counter() - t0
        dt, _ = timed(cc, [u0B], fetch=lambda o: float(abs(o[0]).sum()),
                      reps=3)
        _, iters = cc(u0B)
        log(f"probe3 8-step transient (3,24): compile {tc:.0f}s "
            f"{dt/8*1e3:.0f} ms/step (round-1 bench: 13673) "
            f"iters={np.asarray(iters)}")
    except Exception as e:
        log(f"probe3 FAILED: {type(e).__name__}: {e}")

    # ---- probe 4: 8-step transient at SHIPPED L_50_R_5 ---------------------
    try:
        cfgS, progS, stepS, u0S, thetaS = build(
            dict(L=50e-9, R=5e-9), slab_lin)
        NS = progS.space.num_vertices
        log(f"probe4 shipped-mesh N={NS} "
            f"(expected 3679 if GMPNP_UTILITIES found)")

        def run8S(u0):
            def body(carry, i):
                u, extra = carry
                th = progS._theta_of_carry((u, extra), i)
                u_new, st = stepS(u, th)
                return (u_new, extra), st.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0, jnp.asarray(0.0)), jnp.arange(8))
            return u, iters

        t0 = time.perf_counter()
        cc = jax.jit(run8S).lower(u0S).compile()
        tc = time.perf_counter() - t0
        dt, _ = timed(cc, [u0S], fetch=lambda o: float(abs(o[0]).sum()),
                      reps=3)
        _, iters = cc(u0S)
        log(f"probe4 8-step transient shipped L_50_R_5 (N={NS}): "
            f"compile {tc:.0f}s {dt/8*1e3:.0f} ms/step "
            f"iters={np.asarray(iters)}")
    except Exception as e:
        log(f"probe4 FAILED: {type(e).__name__}: {e}")

    # ---- probe 5: vmapped 2-lane slab_direct step (riskiest) ---------------
    try:
        def two(u0):
            u, st = jax.vmap(lambda u: stepB(u, thetaB))(u0)
            return u, st.newton_iters

        u0v = jnp.stack([u0B, u0B * 1.001])
        t0 = time.perf_counter()
        cc = jax.jit(two).lower(u0v).compile()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, it = cc(u0v)
        chk = float(abs(u).sum())
        dt = time.perf_counter() - t0
        log(f"probe5 vmapped 2-lane slab step: OK compile {tc:.0f}s "
            f"exec {dt*1e3:.0f} ms iters={np.asarray(it)}")
    except Exception as e:
        log(f"probe5 vmap FAILED: {type(e).__name__}: {e}")

    log("done")


if __name__ == "__main__":
    main()
