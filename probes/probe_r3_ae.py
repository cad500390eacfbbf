"""Round-3 probe: chord-direction dtype + extrapolation predictor on TPU.

probe_r3_ad measured refresh='carried' at 534.0 ms/step (GMPNP) /
1,421.9 (rxn_diff) vs exact Newton's 745.8 / 2,228.1 at the shipped
L_50_R_5 mesh.  The remaining warm-path costs are (a) the f64 chord
GMRES — an emulated-f64 BlockELL matvec + f64 Arnoldi per inner
iteration — and (b) ~2 chord iterations/step of f64 residual assembly
(~107 ms each).  This probe times the four knob combinations:

  chord_dtype  'f64' | 'f32'  (f32 = slab_apply_f32: f32 banded solve +
                               the Pallas block-ELL contraction on TPU)
  chord_predict False | True  (extrapolated start iterate; atol=1e-4
                               acceptance can converge warm steps at
                               entry with ONE residual evaluation)

against exact Newton (refresh='iter'), with final-state parity checks.

Usage: python probes/probe_r3_ae.py [cpu] [rxn_diff]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses
import jax.numpy as jnp
import numpy as np

from gmpnp_tpu.models import pore_3d
from gmpnp_tpu.solve.timeloop import make_carried_step, make_implicit_step

N_STEPS = 8
REPS = 3


def build_run(prog, cfg0, lin):
    if lin.refresh == "carried":
        step, prep_init = make_carried_step(
            prog.space, prog.form, cfg0.newton, lin,
            bc_of_theta=prog._bc_of_theta)

        def run(u0):
            th0 = prog._theta_of_carry((u0, jnp.asarray(0.0)),
                                       jnp.asarray(0))
            prep0 = prep_init(u0, th0)

            def body(carry, i):
                u, extra, prep = carry
                th = prog._theta_of_carry((u, extra), i)
                u_new, st, prep = step(u, th, prep)
                return (u_new, extra, prep), st.newton_iters

            (u, _, _), iters = jax.lax.scan(
                body, (u0, jnp.asarray(0.0), prep0), jnp.arange(N_STEPS))
            return u, iters

        return run

    step = make_implicit_step(prog.space, prog.form, cfg0.newton,
                              lin, bc_of_theta=prog._bc_of_theta)

    def run(u0):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st = step(u, th)
            return (u_new, extra), st.newton_iters

        (u, _), iters = jax.lax.scan(
            body, (u0, jnp.asarray(0.0)), jnp.arange(N_STEPS))
        return u, iters

    return run


def main():
    physics = "rxn_diff" if "rxn_diff" in sys.argv[1:] else "GMPNP"
    if "cpu" in sys.argv[1:]:
        os.environ.pop("GMPNP_UTILITIES", None)
        cfg0 = pore_3d.Pore3DConfig(physics=physics, L=50e-9, R=5e-9,
                                    mesh_resolution=(2, 11))
    else:
        cfg0 = pore_3d.Pore3DConfig(physics=physics, L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg0)
    nf, ns = cfg0.n_fields, len(cfg0.species)
    N = prog.space.num_vertices
    print(f"device: {jax.devices()[0]}  N={N}  physics={physics}",
          flush=True)
    u0 = jnp.ones((N, nf))
    if physics == "GMPNP":
        u0 = u0.at[:, ns].set(0.0)

    cases = [
        ("iter", dict(refresh="iter")),
        ("carried-f64", dict(refresh="carried", chord_dtype="f64",
                             chord_predict=False)),
        ("carried-f64-pred", dict(refresh="carried", chord_dtype="f64",
                                  chord_predict=True)),
        ("carried-f32", dict(refresh="carried", chord_dtype="f32",
                             chord_predict=False)),
        ("carried-f32-pred", dict(refresh="carried", chord_dtype="f32",
                                  chord_predict=True)),
    ]
    results = {}
    for name, kw in cases:
        lin = dataclasses.replace(cfg0.linear, **kw)
        run = build_run(prog, cfg0, lin)
        t0 = time.perf_counter()
        compiled = jax.jit(run).lower(u0).compile()
        t_compile = time.perf_counter() - t0
        out, iters = compiled(u0)
        chk = float(jnp.abs(out).sum())
        assert np.isfinite(chk), f"non-finite result in {name}"
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out, iters = compiled(u0)
            float(jnp.abs(out).sum())
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        results[name] = (np.asarray(out), t)
        print(f"{name:18s} compile {t_compile:6.1f}s  "
              f"{t / N_STEPS * 1e3:8.1f} ms/step  "
              f"newton iters/step {np.asarray(iters)}", flush=True)

    a, ta = results["iter"]
    for name, (b, tb) in results.items():
        if name == "iter":
            continue
        rel = np.linalg.norm(a - b) / np.linalg.norm(a)
        print(f"{name:18s} vs iter: rel-L2 {rel:.3e}  "
              f"speedup {ta / tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
