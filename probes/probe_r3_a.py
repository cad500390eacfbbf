"""Round-3 hardware probe A: the per-lane-Dirichlet vmap fault at the
shipped N=3679 mesh (VERDICT r2 item 1 — the last blocker for BASELINE
config-5 sweeps at reference scale).

Round-2 state (probes j/k/l): every component and the full step pass
under 2-lane vmap with lane-CONSTANT BC values; the worker faults exactly
when a PER-LANE Dirichlet value (the swept wall voltage) enters the fused
step at this mesh size.  Suspect: a fused select/scatter composition.

This probe retests the failing shape on the current backend and compares
BC-application formulations, each case in its OWN SUBPROCESS so a worker
crash cannot take down later cases:

  masked : DirichletBC.set_value_masked (jnp.where blend) — the bench path
  arith  : ArithDirichletBC (multiply-add only; no select, no scatter
           touches the batched value) — the candidate fix

Run: python probes/probe_r3_a.py driver > /tmp/probe_r3_a.log 2>&1
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")


def log(msg):
    print(f"[probe] {msg}", flush=True)


def run_case(variant: str, lanes: int, steps: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}  case: {variant} lanes={lanes} "
        f"steps={steps}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    prog = pore_3d.build(cfg)
    N = prog.space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    s2 = np.unique(
        prog.mesh.facets[prog.mesh.facet_markers == pore_3d.S2].reshape(-1))

    if variant == "masked":
        def bc_of_theta(theta):
            bc = prog.bc.set_value_masked(prog.s1_verts, prog.idx["CO2"],
                                          theta["co2_s1"])
            return bc.set_value_masked(s2, ns, theta["voltage"])
    elif variant == "arith":
        def bc_of_theta(theta):
            bc = prog.bc.arith()
            bc = bc.set_value_arith(prog.s1_verts, prog.idx["CO2"],
                                    theta["co2_s1"])
            return bc.set_value_arith(s2, ns, theta["voltage"])
    else:
        raise SystemExit(f"unknown variant {variant}")

    newton = dataclasses.replace(cfg.newton, loop="while")
    step = make_implicit_step(prog.space, prog.form, newton, cfg.linear,
                              bc_of_theta=bc_of_theta)

    def run(u0v, voltages):
        def single(u0_l, voltage):
            def body(carry, i):
                u, extra = carry
                th = prog._theta_of_carry((u, extra), i)
                th["voltage"] = voltage
                u_new, st = step(u, th)
                return (u_new, extra), st.newton_iters

            (u, _), iters = jax.lax.scan(
                body, (u0_l, jnp.asarray(0.0)), jnp.arange(steps))
            return u, iters

        return jax.vmap(single)(u0v, voltages)

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    u0v = jnp.stack([u0] * lanes)
    volts = jnp.asarray(np.linspace(-1.0, -2.5, lanes))

    t0 = time.perf_counter()
    cc = jax.jit(run).lower(u0v, volts).compile()
    t_compile = time.perf_counter() - t0

    # warm-up execution, then median-of-3
    u, iters = cc(u0v, volts)
    chk = float(jnp.abs(u).sum())
    assert chk == chk, "non-finite"
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, iters = cc(u0v, volts)
        float(jnp.abs(u).sum())
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    res = {
        "variant": variant, "lanes": lanes, "steps": steps, "N": N,
        "compile_s": round(t_compile, 1),
        "ms_per_lane_step": round(dt / (lanes * steps) * 1e3, 1),
        "total_s": round(dt, 2),
        "newton_iters": np.asarray(iters).sum(axis=1).tolist(),
    }
    print("RESULT " + json.dumps(res), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}

    def spawn(variant, lanes, steps=8, timeout=3000):
        key = f"{variant}-{lanes}"
        log(f"=== spawning {key} ===")
        try:
            p = subprocess.run(
                [sys.executable, here, variant, str(lanes), str(steps)],
                capture_output=True, text=True, timeout=timeout)
            out = p.stdout + p.stderr
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[key] = json.loads(line[len("RESULT "):])
                    log(f"{key}: {results[key]}")
                    return True
            tail = "\n".join(out.splitlines()[-15:])
            log(f"{key}: FAILED rc={p.returncode}\n{tail}")
            results[key] = {"error": f"rc={p.returncode}", "tail": tail[-800:]}
        except subprocess.TimeoutExpired:
            log(f"{key}: TIMEOUT")
            results[key] = {"error": "timeout"}
        return False

    ok_masked = spawn("masked", 2)
    ok_arith = spawn("arith", 2)
    best = "arith" if ok_arith else ("masked" if ok_masked else None)
    if ok_masked and not ok_arith:
        best = "masked"
    if best:
        if spawn(best, 4):
            spawn(best, 8)
    with open("/tmp/probe_r3_a_results.json", "w") as f:
        json.dump(results, f, indent=1)
    log("driver done")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
