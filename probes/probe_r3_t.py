"""Round-3 probe T: deep 3D voltages via a staged first step.

The 3D cold start at the reference dt=1e-3 s exceeds backward Euler's
convergence basin beyond ~V=-1.5 on the shipped L_50_R_5 mesh for every
Newton globalization tried (bench.py _build_pore_sweep docstring; the
reference would die identically).  The 1D reference handles its own
version of this with a staged dt schedule (1D/MPNP_CO2ER_EDL.py:270-290:
dt=1e-5 s until t=0.1 s, then 1e-3 s); this probe applies the same idea
to the 3D model: take the FIRST step at dt/2^k (k from the measured
basin: dt/8 converges V=-2.5, dt/32 converges V=-1.5), then continue at
the full reference dt.

Checks V in {-1.5, -2.0, -2.5} on the shipped mesh: staged window of
1 small step + 7 full-dt steps, every step must converge finite.

Run: python probes/probe_r3_t.py > /tmp/probe_r3_t.log 2>&1
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.parallel.sweep import _sweep_newton
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    print("device:", jax.devices()[0], flush=True)

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    nf, ns = cfg.n_fields, len(cfg.species)
    s2 = np.unique(prog.mesh.facets[
        prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    def bc_of_theta(theta):
        bc = prog.bc.arith()
        bc = bc.set_value_arith(prog.s1_verts, prog.idx["CO2"],
                                theta["co2_s1"])
        return bc.set_value_arith(s2, ns, theta["voltage"])

    newton = _sweep_newton(cfg.newton)
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    def staged(u0_l, voltage, k_first):
        # dt scale per step index: dt/2^k for step 0, full dt after
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            th["voltage"] = voltage
            scale = jnp.where(i == 0, 0.5 ** k_first, 1.0)
            th["dt"] = jnp.asarray(th["dt"]) * scale
            u_new, st = step(u, th)
            return (u_new, extra), (st.newton_iters, st.converged)

        (u, _), (it, cv) = jax.lax.scan(
            body, (u0_l, jnp.asarray(0.0)), jnp.arange(8))
        return u, it, cv

    u0 = jnp.ones((prog.space.num_vertices, nf)).at[:, ns].set(0.0)
    cc = jax.jit(staged).lower(u0, jnp.asarray(-2.5),
                               jnp.asarray(5.0)).compile()
    for v, k in ((-1.5, 5.0), (-2.0, 5.0), (-2.5, 3.0)):
        u, it, cv = cc(u0, jnp.asarray(float(v)), jnp.asarray(k))
        fin = bool(jnp.isfinite(u).all())
        print(f"V={v} first-step dt/2^{int(k)}: finite={fin} "
              f"all_conv={bool(np.asarray(cv).all())} "
              f"iters={np.asarray(it)}", flush=True)


if __name__ == "__main__":
    main()
