"""Round-3 hardware probe R: cheaper Jacobians on the headline config.

The per-iteration assemble+equilibrate+relayout+factor pipeline is ~500
ms of a ~1000 ms Newton iteration at N=3679 (probe_r2_g), and the slab
factorization is f32 ANYWAY — the f64 element-Jacobian assembly feeds a
mixed-precision solve.  LinearConfig already exposes the two levers:

  f32jac  : jac_dtype='f32'  — element Jacobians assembled in f32
            (inexact Newton; residual + convergence checks stay f64).
  f32step : jac_dtype='f32' + refresh='step' — additionally factor ONCE
            per time step (modified Newton).
  base    : production default (f64 exact Newton), re-measured in the
            same session for a clean comparison.

Each case: shipped L_50_R_5 (N=3679), 8-step scan, median-of-3; own
subprocess.  Checks: all steps converged AND the final state matches the
base case to inexact-Newton tolerance.

Run: python probes/probe_r3_r.py driver > /tmp/probe_r3_r.log 2>&1
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("GMPNP_UTILITIES", "/root/reference/utilities")

STEPS = 8
OUT = "/tmp/probe_r3_r_results.json"


def log(msg):
    print(f"[probe] {msg}", flush=True)


def run_case(variant: str):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gmpnp_tpu.models import pore_3d
    from gmpnp_tpu.solve.timeloop import make_implicit_step

    log(f"device: {jax.devices()[0]}  case: {variant}")

    cfg = pore_3d.Pore3DConfig(physics="GMPNP", L=50e-9, R=5e-9)
    lin = cfg.linear
    if variant == "f32jac":
        lin = dataclasses.replace(lin, jac_dtype="f32")
    elif variant == "f32step":
        lin = dataclasses.replace(lin, jac_dtype="f32", refresh="step")
    elif variant != "base":
        raise ValueError(variant)
    cfg = dataclasses.replace(cfg, linear=lin)
    prog = pore_3d.build(cfg)
    N = prog.space.num_vertices
    nf, ns = cfg.n_fields, len(cfg.species)
    step = make_implicit_step(prog.space, prog.form, cfg.newton, cfg.linear,
                              bc_of_theta=prog._bc_of_theta)

    def run(u0):
        def body(carry, i):
            u, extra = carry
            th = prog._theta_of_carry((u, extra), i)
            u_new, st = step(u, th)
            return (u_new, extra), (st.newton_iters, st.converged)

        (u, _), (iters, conv) = jax.lax.scan(
            body, (u0, jnp.asarray(0.0)), jnp.arange(STEPS))
        return u, iters, conv

    u0 = jnp.ones((N, nf)).at[:, ns].set(0.0)
    t0 = time.perf_counter()
    cc = jax.jit(run).lower(u0).compile()
    t_compile = time.perf_counter() - t0
    u, iters, conv = cc(u0)
    assert np.isfinite(float(jnp.abs(u).sum()))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        u, iters, conv = cc(u0)
        float(jnp.abs(u).sum())
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    res = {
        "variant": variant, "N": N, "steps": STEPS,
        "compile_s": round(t_compile, 1),
        "ms_per_step": round(dt / STEPS * 1e3, 1),
        "newton_iters": int(np.asarray(iters).sum()),
        "all_converged": bool(np.asarray(conv).all()),
        "u_sum": float(jnp.abs(u).sum()),
        "u_fingerprint": float(jnp.sum(u * u)),
    }
    print("RESULT " + json.dumps(res), flush=True)


def driver():
    here = os.path.abspath(__file__)
    results = {}
    if os.path.exists(OUT):
        try:
            results = json.load(open(OUT))
        except Exception:
            results = {}

    def spawn(variant, timeout=3000):
        if variant in results and "error" not in results[variant]:
            log(f"{variant}: cached")
            return
        log(f"=== spawning {variant} ===")
        try:
            p = subprocess.run([sys.executable, here, variant],
                               capture_output=True, text=True,
                               timeout=timeout)
            out = p.stdout + p.stderr
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    results[variant] = json.loads(line[len("RESULT "):])
                    log(f"{variant}: {results[variant]}")
                    return
            tail = "\n".join(out.splitlines()[-12:])
            log(f"{variant}: FAILED rc={p.returncode}\n{tail}")
            results[variant] = {"error": f"rc={p.returncode}",
                                "tail": tail[-800:]}
        except subprocess.TimeoutExpired:
            log(f"{variant}: TIMEOUT")
            results[variant] = {"error": "timeout"}
        finally:
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)

    spawn("base")
    spawn("f32jac")
    spawn("f32step")
    # relative drift of the cheap variants vs base (inexact Newton should
    # land the same converged states to ~Newton tolerance)
    try:
        b = results["base"]["u_fingerprint"]
        for v in ("f32jac", "f32step"):
            if v in results and "u_fingerprint" in results[v]:
                d = abs(results[v]["u_fingerprint"] - b) / abs(b)
                log(f"{v}: fingerprint rel drift vs base = {d:.3e}")
    except Exception as e:
        log(f"drift check skipped: {e}")
    log("driver done")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "driver":
        driver()
    else:
        run_case(sys.argv[1])
