"""Round-2 hardware probe L: the N=3679 vmap fault is NOT in any single
component (probe_r2_k: residual, jacobian, prepare, prepare+apply all
pass under 2-lane vmap).  Narrow by composition: full implicit step
(Newton while-loop), then 2-step scan, then 8-step scan (probe_r2_j's
failing shape).

Run: python probes/probe_r2_l.py > /tmp/probe_l.log 2>&1
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


def main():
    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    N = prog.space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    theta = {"dt": jnp.asarray(prog.dt_scaled),
             "co2_s1": jnp.asarray(prog.eq_conc["CO2"]
                                   / prog.bulk_conc["CO2"])}
    newtonW = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newtonW, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)
    u0v = jnp.stack([u0, u0 * 1.001])
    log(f"mesh N={N} (shipped={N == 3679})")

    def attempt(name, fn, *args):
        try:
            t0 = time.perf_counter()
            cc = jax.jit(fn).lower(*args).compile()
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = cc(*args)
            chk = float(abs(jax.tree.leaves(out)[0]).sum())
            dt = time.perf_counter() - t0
            assert chk == chk
            log(f"{name}: OK compile {tc:.0f}s exec+fetch {dt*1e3:.0f} ms")
            return True
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return False

    # (a) single implicit step under vmap
    ok = attempt("vmap single step",
                 lambda uv: jax.vmap(lambda u: step(u, theta)[0])(uv), u0v)

    # (b) 2-step scan under vmap
    def scan_n(n):
        def run(uv):
            def single(u0_l):
                def body(carry, i):
                    u, extra = carry
                    th = prog._theta_of_carry((u, extra), i)
                    u_new, st = step(u, th)
                    return (u_new, extra), st.newton_iters

                (u, _), iters = jax.lax.scan(
                    body, (u0_l, jnp.asarray(0.0)), jnp.arange(n))
                return u, iters

            return jax.vmap(single)(uv)

        return run

    if ok:
        ok = attempt("vmap 2-step scan", scan_n(2), u0v)
    if ok:
        attempt("vmap 8-step scan", scan_n(8), u0v)

    log("done")


if __name__ == "__main__":
    main()
